"""BaseModel — the model runtime contract (reference: models/base_model.py).

Same public surface: setup / set_input / optimize_parameters / test / eval /
get_current_visuals / get_current_losses / save_networks / load_networks /
update_learning_rate / print_networks.  The imperative torch autograd of the
reference is replaced by fused jitted train steps defined in subclasses.

Checkpoint contract: one file per network,
``<checkpoints_dir>/<name>/{suffix}_net_{NET}.npz`` (flat param tree), with
suffixes 'latest' / '{epoch}' / 'iter_{N}' — mirroring the reference's
``{suffix}_net_{name}.pth`` CLI contract (base_model.py:146-201).  Optimizer
state additionally goes to ``{suffix}_optim.npz`` (the reference silently
reset Adam moments on resume; we restore them when the file exists).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from collections import OrderedDict

import jax
import numpy as np

from ..nn.core import count_params, flatten_params, unflatten_params
from ..nn.schedulers import LRController


def _atomic_savez(path: str, arrays: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: savez won't append '.npz'
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _gather_tree(tree):
    """Fetch a pytree of device arrays with ONE device-to-host transfer.

    Per-leaf np.asarray costs a round trip per parameter tensor — minutes
    per checkpoint over a remote-device link.  Packing into a single flat
    f32 buffer on device makes the save a single bulk copy."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not any(hasattr(x, "devices") for x in leaves):
        return tree
    dtypes = [np.dtype(str(x.dtype)) for x in leaves]
    shapes = [x.shape for x in leaves]
    if any(d.itemsize != 4 for d in dtypes):
        # non-4-byte dtypes: fall back to per-leaf fetch
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(x) for x in leaves])
    packed = jax.jit(lambda ls: jnp.concatenate(
        [jax.lax.bitcast_convert_type(jnp.ravel(x), jnp.int32)
         for x in ls]))(leaves)
    flat = np.asarray(packed)
    out, pos = [], 0
    for dt, sh in zip(dtypes, shapes):
        n = int(np.prod(sh)) if sh else 1
        out.append(flat[pos:pos + n].view(dt).reshape(sh))
        pos += n
    return jax.tree_util.tree_unflatten(treedef, out)


class BaseModel(ABC):
    def __init__(self, opt):
        self.opt = opt
        self.gpu_ids = getattr(opt, "gpu_ids", [])
        self.isTrain = opt.isTrain
        self.dimension = opt.image_dimension
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        self.loss_names = []
        self.model_names = []
        self.visual_names = []
        self.image_paths = []
        self.metric = 0  # for 'plateau' lr policy
        self.lr_controllers = []
        # params: {net_name: pytree}; nets: {net_name: module with .apply}
        self.params = {}
        self.nets = {}
        # async loss scalars (device arrays); fetched lazily
        self._losses = {}
        self._visuals = {}
        seed = getattr(opt, "seed", None)
        if seed is None:
            seed = int.from_bytes(os.urandom(4), "little")
        self.rng = jax.random.PRNGKey(seed)

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    @abstractmethod
    def set_input(self, input):
        ...

    @abstractmethod
    def forward(self):
        ...

    @abstractmethod
    def optimize_parameters(self):
        ...

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ------------------------------------------------------------------ setup

    def setup(self, opt):
        if self.isTrain:
            self.lr_controllers = [LRController(opt.lr_policy, opt)
                                   for _ in range(2)]
        if not self.isTrain or getattr(opt, "continue_train", False):
            load_suffix = ("iter_%d" % opt.load_iter
                           if opt.load_iter > 0 else opt.epoch)
            self.load_networks(load_suffix)
        self.print_networks(getattr(opt, "verbose", False))

    def eval(self):
        """Switch norm layers to eval semantics.  Instance norm is stateless
        (affine=False in the reference's production configs) so this only
        changes '--norm batch' nets, which then normalise with their
        checkpointed running statistics (torch eval() parity)."""
        self._eval_mode = True

    def refresh_norm_stats(self):
        """EMA-refresh batch-norm running buffers from the current input.

        The reference's torch BatchNorm updates running stats on every train
        forward — in the generators AND in the discriminators (every D
        forward during backward_D/backward_G steps their buffers too).  Here
        one dedicated jitted pass per training step collects batch statistics
        and applies the torch EMA (momentum 0.1): the G nets chained on the
        real input (G_A -> G_B reproduces the fake/rec data flow), and each
        D net on a 2-batch of lateral slices of (real, fake) — a
        representative stand-in for the reference's per-step random slice/MIP
        D inputs.  No-op unless the model was built with --norm batch."""
        if getattr(self.opt, "norm", "instance") != "batch":
            return
        real = getattr(self, "real", None)
        if real is None:
            return
        if getattr(self, "_stats_fn", None) is None:
            from ..nn import norms

            g_names = [n for n in self.model_names
                       if n.startswith("G") and n in self.nets]
            d_names = [n for n in self.model_names
                       if n.startswith("D") and n in self.nets]

            def _collect(apply_fn, params_n, inp):
                with norms.collect_batch_stats() as stats:
                    out = apply_fn(params_n, inp)
                pairs = norms.ema_update_stats(stats)
                mapping = {id(s[0]): pair for s, pair in zip(stats, pairs)}

                def write_back(node):
                    if isinstance(node, dict):
                        res = {k: write_back(v) for k, v in node.items()}
                        if id(node) in mapping:
                            rm, rv = mapping[id(node)]
                            res["running_mean"] = rm
                            res["running_var"] = rv
                        return res
                    return node

                return write_back(params_n), out

            def _refresh(params, x):
                new = dict(params)
                inp = x
                fake = None
                for n in g_names:
                    new[n], out = _collect(self.nets[n].apply, params[n], inp)
                    if fake is None:
                        fake = out  # first G output = the fake volume
                    inp = out
                if d_names and fake is not None and x.ndim == 5:
                    # (1, Z, Y, X, C) -> 2-batch of mid lateral slices
                    mid = x.shape[1] // 2
                    import jax.numpy as jnp

                    d_in = jnp.concatenate([x[:, mid], fake[:, mid]], axis=0)
                    for n in d_names:
                        new[n], _ = _collect(self.nets[n].apply, params[n],
                                             d_in)
                return new

            self._stats_fn = jax.jit(_refresh)
            self._stats_names = g_names + d_names
        updated = self._stats_fn(
            {n: self.params[n] for n in self._stats_names}, real)
        self.params.update(updated)

    def test(self):
        self.forward()
        self.compute_visuals()

    def compute_visuals(self):
        pass

    def get_image_paths(self):
        return self.image_paths

    def update_learning_rate(self):
        for c in self.lr_controllers:
            c.step(self.metric if self.opt.lr_policy == "plateau" else 0.0)

    @property
    def lr_scale(self) -> float:
        return self.lr_controllers[0].scale if self.lr_controllers else 1.0

    # ------------------------------------------------------------- accessors

    def get_current_visuals(self):
        out = OrderedDict()
        for name in self.visual_names:
            if name in self._visuals:
                out[name] = self._visuals[name]
        return out

    def get_current_losses(self):
        out = OrderedDict()
        for name in self.loss_names:
            if name in self._losses:
                out[name] = float(self._losses[name])
        return out

    # ----------------------------------------------------------- checkpoints

    def save_networks(self, epoch):
        """Atomic per-network checkpoints (write tmp + rename), so a
        preemption mid-save never corrupts the resume point — the idiomatic
        TPU upgrade over the reference's direct torch.save
        (base_model.py:146-162)."""
        os.makedirs(self.save_dir, exist_ok=True)
        host_params = _gather_tree({n: self.params[n] for n in self.model_names})
        for name in self.model_names:
            path = os.path.join(self.save_dir, f"{epoch}_net_{name}.npz")
            _atomic_savez(path, flatten_params(host_params[name]))
        self._save_optim(epoch)

    def _save_optim(self, epoch):
        state = getattr(self, "opt_state", None)
        if state is None:
            return
        flat, _ = jax.tree_util.tree_flatten(_gather_tree(state))
        arrays = {str(i): np.asarray(x) for i, x in enumerate(flat)}
        # LR-schedule position travels with the optimizer state (the
        # reference rebuilt schedulers from --epoch_count/--load_iter only,
        # resetting linear decay and losing plateau state on resume)
        for i, c in enumerate(self.lr_controllers):
            arrays[f"__lr{i}__"] = np.asarray(c.state(), np.float64)
        _atomic_savez(os.path.join(self.save_dir, f"{epoch}_optim.npz"), arrays)

    def _load_optim(self, epoch):
        path = os.path.join(self.save_dir, f"{epoch}_optim.npz")
        state = getattr(self, "opt_state", None)
        if state is None or not os.path.exists(path):
            return
        data = np.load(path)
        for i, c in enumerate(self.lr_controllers):
            key = f"__lr{i}__"
            if key in data.files:
                c.restore(data[key])
        files = [f for f in data.files if not f.startswith("__lr")]
        flat, treedef = jax.tree_util.tree_flatten(state)
        if len(files) != len(flat):
            print(f"optimizer state at {path} does not match; skipping")
            return
        new_flat = [jax.numpy.asarray(data[str(i)]) for i in range(len(flat))]
        self.opt_state = jax.tree_util.tree_unflatten(treedef, new_flat)
        print(f"restored optimizer state from {path}")

    def load_networks(self, epoch):
        for name in self.model_names:
            path = os.path.join(self.save_dir, f"{epoch}_net_{name}.npz")
            print(f"loading the model from {path}")
            data = np.load(path)
            self.params[name] = unflatten_params({k: data[k] for k in data.files})
        if self.isTrain:
            self._load_optim(epoch)

    def print_networks(self, verbose):
        print("---------- Networks initialized -------------")
        for name in self.model_names:
            n = count_params(self.params.get(name, {}))
            if verbose and name in self.nets:
                print(self.nets[name])
            print("[Network %s] Total number of parameters : %.3f M"
                  % (name, n / 1e6))
        print("-----------------------------------------------")
