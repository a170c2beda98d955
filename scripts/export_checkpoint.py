"""Convert checkpoints between this framework's .npz and the reference's
torch .pth format (same {suffix}_net_{NAME} naming).

Export (ours -> reference):
  python scripts/export_checkpoint.py --mode export --arch unet_deconv \
      --src /ckpt/iter_11000_net_G_A.npz --dst /ckpt/iter_11000_net_G_A.pth
Import (reference -> ours):
  python scripts/export_checkpoint.py --mode import --arch unet_deconv \
      --src /ref_ckpt/latest_net_G_A.pth --dst /ckpt/latest_net_G_A.npz

Supported arch: unet_deconv | deep_linear_gen | basic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # conversion needs no accelerator

import numpy as np

from neuroclear_tpu.nn.core import flatten_params, unflatten_params
from neuroclear_tpu.utils import torch_export as tx

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["export", "import"], required=True)
    ap.add_argument("--arch", choices=sorted(tx.NET_MAPS), required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()

    if args.mode == "export":
        data = np.load(args.src)
        params = unflatten_params({k: data[k] for k in data.files})
        tx.export_pth(params, args.arch, args.dst)
    else:
        params = tx.import_pth(args.src, args.arch)
        np.savez(args.dst, **flatten_params(params))
    print(f"{args.mode}ed {args.src} -> {args.dst}")
