"""Checkpoint interchange with the PyTorch reference.

Converts between this framework's npz param trees and the reference's
``{suffix}_net_{NAME}.pth`` torch state_dicts (models/base_model.py:146-201),
with the reference's exact key names and tensor layouts, for the production
networks:

  * unet_deconv      (networks.py:478-538)
  * deep_linear_gen  (networks.py:893-917)
  * basic PatchGAN   (networks.py:1009-1067)

Layout notes: our conv kernels are (*k, I, O) channels-last; torch uses
(O, I, *k) and ConvTranspose (I, O, *k).  Our stored transpose kernels
already follow torch's orientation (the spatial flip happens in apply), so
conversion is a pure axis permutation.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


def _t_conv(w):  # (*k, I, O) -> (O, I, *k)
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def _f_conv(w):  # (O, I, *k) -> (*k, I, O)
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _t_convT(w):  # (*k, I, O) -> (I, O, *k)
    nd = w.ndim
    return np.transpose(w, (nd - 2, nd - 1) + tuple(range(nd - 2)))


def _f_convT(w):  # (I, O, *k) -> (*k, I, O)
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (0, 1))


# (our param path, torch key prefix, kind)
UNET_DECONV_MAP = [
    ("double_conv1.conv0", "double_conv1.convolution.0", "conv"),
    ("double_conv1.conv1", "double_conv1.convolution.3", "conv"),
    ("double_conv2.conv0", "double_conv2.convolution.0", "conv"),
    ("double_conv2.conv1", "double_conv2.convolution.3", "conv"),
    ("bottom_layer.conv0", "bottom_layer.convolution.0", "conv"),
    ("bottom_layer.conv1", "bottom_layer.convolution.3", "conv"),
    ("bottom_layer.conv2", "bottom_layer.convolution.6", "conv"),
    ("t_conv2", "t_conv2", "convT"),
    ("ex_double_conv2.conv0", "ex_double_conv2.convolution.0", "conv"),
    ("ex_double_conv2.conv1", "ex_double_conv2.convolution.3", "conv"),
    ("t_conv1", "t_conv1", "convT"),
    ("ex_conv1_1.conv0", "ex_conv1_1.convolution.0", "conv"),
    ("one_by_one", "one_by_one", "conv"),
    ("one_by_one_2", "one_by_one_2", "conv"),
]

DEEP_LINEAR_MAP = [
    ("first_layer", "first_layer", "conv"),
    ("feat0", "feature_block.0", "conv"),
    ("feat1", "feature_block.1", "conv"),
    ("feat2", "feature_block.2", "conv"),
    ("feat3", "feature_block.3", "conv"),
    ("final_layer", "final_layer", "conv"),
]

# basic PatchGAN, n_layers=3, instance norm (paramless modules occupy
# Sequential slots 1,3,4,6,7,9,10)
PATCHGAN_MAP = [
    ("conv0", "model.0", "conv"),
    ("conv1", "model.2", "conv"),
    ("conv2", "model.5", "conv"),
    ("conv3", "model.8", "conv"),
    ("conv_out", "model.11", "conv"),
]

NET_MAPS = {
    "unet_deconv": UNET_DECONV_MAP,
    "deep_linear_gen": DEEP_LINEAR_MAP,
    "basic": PATCHGAN_MAP,
}


def _get(tree, dotted):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _set(tree, dotted, value):
    node = tree
    parts = dotted.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def params_to_state_dict(params, arch: str) -> "OrderedDict[str, np.ndarray]":
    """Nested param dict -> reference-keyed numpy state dict."""
    out = OrderedDict()
    for ours, theirs, kind in NET_MAPS[arch]:
        leaf = _get(params, ours)
        w = np.asarray(leaf["w"], np.float32)
        out[theirs + ".weight"] = _t_convT(w) if kind == "convT" else _t_conv(w)
        if "b" in leaf:
            out[theirs + ".bias"] = np.asarray(leaf["b"], np.float32)
    return out


def state_dict_to_params(state_dict, arch: str):
    """Reference-keyed state dict (numpy or torch tensors) -> param tree."""
    params: dict = {}
    for ours, theirs, kind in NET_MAPS[arch]:
        w = np.asarray(state_dict[theirs + ".weight"], np.float32)
        leaf = {"w": _f_convT(w) if kind == "convT" else _f_conv(w)}
        bkey = theirs + ".bias"
        if bkey in state_dict:
            leaf["b"] = np.asarray(state_dict[bkey], np.float32)
        _set(params, ours, leaf)
    return params


def export_pth(params, arch: str, path: str) -> None:
    """Write a torch .pth loadable by the reference's load_networks."""
    import torch

    sd = OrderedDict((k, torch.tensor(v))
                     for k, v in params_to_state_dict(params, arch).items())
    torch.save(sd, path)


def import_pth(path: str, arch: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_params({k: v.numpy() for k, v in sd.items()}, arch)
