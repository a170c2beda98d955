"""Athena — artifact-correction variant for OT-LSM stacks.

Parity target: /root/reference/models/axial_to_lateral_gan_athena_model.py.
Six discriminators (D_{A,B}_{xy,xz,yz}); every comparison is slice-vs-slice
and iter_f applies the discriminator to EVERY slice of the cube
(athena_model.py:286-296) — here that loop becomes one batched 2D conv over
the slice axis (ops/sampling.all_slices), which is exactly what the MXU
wants.  --conversion_plane maps source/target/remaining planes to slice axes.

The reference imports ImagePool and declares --pool_size but never uses them
(athena_model.py:5,65); we keep the flag for CLI parity only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base_model import BaseModel
from . import gan_common as gc
from ..nn import factory
from ..nn.losses import l1_loss
from .axial_to_lateral_gan_apollo_model import _fwd_pair, _to_ndhwc

PLANE_TO_AXIS = {"xy": 0, "xz": 1, "yz": 2}


class AxialToLateralGANAthenaModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="strength of the A->B->A reconstruction (cycle) term")
            parser.add_argument("--pool_size", type=int, default=50,
                                help="history-buffer capacity for generated slices (declared for flag "
                                     "parity; unused — the reference imports ImagePool but never calls it)")
            parser.add_argument("--gan_mode", type=str, default="vanilla",
                                help="adversarial objective: vanilla | lsgan | wgangp")
        parser.add_argument("--conversion_plane", type=str, nargs="+",
                            default=["yz", "xy"],
                            help="slicing planes of the conversion: <source> <target>, e.g. yz xy")
        parser.add_argument("--lambda_plane", type=int, nargs="+", default=[1, 1, 1],
                            help="relative weights of the source- / target- / remaining-plane "
                                 "adversarial terms")
        parser.add_argument("--netG_B", type=str, default="deep_linear_gen",
                            help="generator architecture for the backward (B->A) path")
        return parser

    def __init__(self, opt):
        BaseModel.__init__(self, opt)
        self.loss_names = ["D_A_xy", "D_A_xz", "D_A_yz", "G_A", "G_A_xy", "G_A_xz",
                           "G_A_yz", "cycle_A", "D_B_xy", "D_B_xz", "D_B_yz",
                           "G_B", "G_B_xy", "G_B_xz", "G_B_yz"]
        self.visual_names = ["real", "fake", "rec"]
        d_names = ["D_A_xy", "D_A_xz", "D_A_yz", "D_B_xy", "D_B_xz", "D_B_yz"]
        self.model_names = (["G_A", "G_B"] + d_names) if self.isTrain else ["G_A", "G_B"]

        src, tgt = opt.conversion_plane
        remain = [p for p in PLANE_TO_AXIS if p not in (src, tgt)][0]
        print(f"source plane is {src}")
        print(f"target plane is {tgt}")
        print(f"remaining plane is {remain}")
        self.source_axis = PLANE_TO_AXIS[src]
        self.target_axis = PLANE_TO_AXIS[tgt]
        self.remain_axis = PLANE_TO_AXIS[remain]

        gen_dim, dis_dim = 3, 2
        self.nets["G_A"] = factory.define_G(opt.input_nc, opt.output_nc, opt.ngf,
                                            opt.netG, opt.norm, dimension=gen_dim)
        self.nets["G_B"] = factory.define_G(opt.output_nc, opt.input_nc, opt.ngf,
                                            opt.netG_B, opt.norm, dimension=gen_dim)
        if self.isTrain:
            for d in d_names:
                nc = opt.output_nc if d.startswith("D_A") else opt.input_nc
                self.nets[d] = factory.define_D(nc, opt.ndf, opt.netD, opt.n_layers_D,
                                                opt.norm, dimension=dis_dim)
        for name in self.model_names:
            self.params[name] = self.nets[name].init(
                self.next_rng(), opt.init_type, opt.init_gain)

        if self.isTrain:
            self.cfg = gc.GanStepConfig(gan_mode=opt.gan_mode, lambda_A=opt.lambda_A,
                                        lambda_plane=tuple(opt.lambda_plane),
                                        beta1=opt.beta1,
                                        precision=getattr(opt, "precision", "float32"),
                                        remat=getattr(opt, "remat", False),
                                        grad_accum=getattr(opt, "grad_accum", 1))
            self.base_lr = opt.lr
            self.optim = gc.make_adam(opt.beta1)
            self.opt_state = {
                "G": self.optim.init({k: self.params[k] for k in ("G_A", "G_B")}),
                "D": self.optim.init({k: self.params[k] for k in d_names}),
            }
            self._step = make_athena_step(
                self.nets, self.optim, self.cfg,
                (self.target_axis, self.source_axis, self.remain_axis))
        self._fwd = jax.jit(lambda pa, pb, x: _fwd_pair(self.nets, pa, pb, x))

    def set_input(self, input):
        AtoB = self.opt.direction == "AtoB"
        self.real = _to_ndhwc(input["A" if AtoB else "B"])
        self.image_paths = input.get("A_paths" if AtoB else "B_paths", "")
        self._visuals["real"] = self.real

    def forward(self):
        self.fake, self.rec = self._fwd(self.params["G_A"], self.params["G_B"],
                                        self.real)
        self._visuals["fake"] = self.fake
        self._visuals["rec"] = self.rec

    def optimize_parameters(self):
        lr = jnp.float32(self.base_lr * self.lr_scale)
        d_names = self.model_names[2:]
        g_params = {k: self.params[k] for k in ("G_A", "G_B")}
        d_params = {k: self.params[k] for k in d_names}
        g_params, d_params, self.opt_state, losses, fake, rec = self._step(
            g_params, d_params, self.opt_state, self.real, lr)
        self.params.update(g_params)
        self.params.update(d_params)
        self._losses = losses
        self._visuals.update({"fake": fake, "rec": rec})
        self.fake, self.rec = fake, rec
        self.refresh_norm_stats()


def make_athena_step(nets, optim, cfg, axes):
    """Fused step.  Athena needs no per-step RNG: every probe scans all
    slices (athena_model.py:286-296)."""
    target_ax, source_ax, remain_ax = axes
    lam_t, lam_s, lam_r = cfg.lambda_norm

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(g_params, d_params, opt_state, real, lr):
        real = real.astype(cfg.compute_dtype)
        d_frozen = {k: (lambda k_: lambda x: nets[k_].apply(
            jax.lax.stop_gradient(d_params[k_]), x))(k) for k in d_params}

        # ---- G step (backward_G, athena_model.py:240-260) -----------------
        ga_apply = gc.maybe_remat(nets["G_A"].apply, cfg, nets["G_A"])
        gb_apply = gc.maybe_remat(nets["G_B"].apply, cfg, nets["G_B"])

        def g_loss_fn(gp, real):
            fake = ga_apply(gp["G_A"], real)
            rec = gb_apply(gp["G_B"], fake)
            g_a_xy = gc.g_gan(gc.probe_all_slices(fake, target_ax, d_frozen["D_A_xy"]),
                              cfg) * lam_t
            g_a_yz = gc.g_gan(gc.probe_all_slices(fake, source_ax, d_frozen["D_A_yz"]),
                              cfg) * lam_s
            g_a_xz = gc.g_gan(gc.probe_all_slices(fake, remain_ax, d_frozen["D_A_xz"]),
                              cfg) * lam_r
            g_a = g_a_xy + g_a_yz + g_a_xz
            g_b_xy = gc.g_gan(gc.probe_all_slices(rec, target_ax, d_frozen["D_B_xy"]),
                              cfg) * (1 / 3)
            g_b_yz = gc.g_gan(gc.probe_all_slices(rec, source_ax, d_frozen["D_B_yz"]),
                              cfg) * (1 / 3)
            g_b_xz = gc.g_gan(gc.probe_all_slices(rec, remain_ax, d_frozen["D_B_xz"]),
                              cfg) * (1 / 3)
            g_b = g_b_xy + g_b_yz + g_b_xz
            cycle = l1_loss(rec, real) * cfg.lambda_A
            total = g_a + g_b + cycle
            aux = {"G_A": g_a, "G_A_xy": g_a_xy, "G_A_yz": g_a_yz, "G_A_xz": g_a_xz,
                   "G_B": g_b, "G_B_xy": g_b_xy, "G_B_yz": g_b_yz, "G_B_xz": g_b_xz,
                   "cycle_A": cycle, "fake": fake, "rec": rec}
            return total, aux

        # ---- D step (backward_D_*, athena_model.py:219-238) ---------------
        # probes fake/rec from *before* the G update (reference ordering).
        def d_loss_fn(dp, real, fake, rec):
            def ap(k):
                return lambda x: nets[k].apply(dp[k], x)

            d_a_xy = gc.d_pair(gc.probe_all_slices(real, target_ax, ap("D_A_xy")),
                               gc.probe_all_slices(fake, target_ax, ap("D_A_xy")), cfg)
            d_a_yz = gc.d_pair(gc.probe_all_slices(real, target_ax, ap("D_A_yz")),
                               gc.probe_all_slices(fake, source_ax, ap("D_A_yz")), cfg)
            d_a_xz = gc.d_pair(gc.probe_all_slices(real, target_ax, ap("D_A_xz")),
                               gc.probe_all_slices(fake, remain_ax, ap("D_A_xz")), cfg)
            d_b_xy = gc.d_pair(gc.probe_all_slices(real, target_ax, ap("D_B_xy")),
                               gc.probe_all_slices(rec, target_ax, ap("D_B_xy")), cfg)
            d_b_yz = gc.d_pair(gc.probe_all_slices(real, source_ax, ap("D_B_yz")),
                               gc.probe_all_slices(rec, source_ax, ap("D_B_yz")), cfg)
            d_b_xz = gc.d_pair(gc.probe_all_slices(real, remain_ax, ap("D_B_xz")),
                               gc.probe_all_slices(rec, remain_ax, ap("D_B_xz")), cfg)
            total = d_a_xy + d_a_yz + d_a_xz + d_b_xy + d_b_yz + d_b_xz
            aux = {"D_A_xy": d_a_xy, "D_A_yz": d_a_yz, "D_A_xz": d_a_xz,
                   "D_B_xy": d_b_xy, "D_B_yz": d_b_yz, "D_B_xz": d_b_xz}
            return total, aux

        if cfg.grad_accum <= 1:
            (_, g_aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params, real)
            g_updates, og = optim.update(g_grads, opt_state["G"])
            g_params = gc.apply_updates(g_params, g_updates, lr)
            fake = jax.lax.stop_gradient(g_aux.pop("fake"))
            rec = jax.lax.stop_gradient(g_aux.pop("rec"))
            (_, d_aux), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params, real, fake, rec)
            d_updates, od = optim.update(d_grads, opt_state["D"])
            d_params = gc.apply_updates(d_params, d_updates, lr)
            losses = {**g_aux, **d_aux}
            return g_params, d_params, {"G": og, "D": od}, losses, fake, rec

        # batch-N DP-step math on one chip (gan_common.grad_accum_scan)
        n = cfg.grad_accum
        g_grads, d_grads, (fake, rec), auxs = gc.grad_accum_scan(
            g_loss_fn, d_loss_fn, g_params, d_params, real,
            ("fake", "rec"), cfg.compute_dtype)
        g_updates, og = optim.update(
            jax.tree.map(lambda g: g / n, g_grads), opt_state["G"])
        g_params = gc.apply_updates(g_params, g_updates, lr)
        d_updates, od = optim.update(
            jax.tree.map(lambda g: g / n, d_grads), opt_state["D"])
        d_params = gc.apply_updates(d_params, d_updates, lr)
        losses = jax.tree.map(lambda x: x.mean(0), auxs)
        return g_params, d_params, {"G": og, "D": od}, losses, fake, rec

    return step
