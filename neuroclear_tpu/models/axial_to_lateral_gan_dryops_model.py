"""Dryops — Apollo ablation with no backward path (no G_B / cycle / D_B).

Parity target: /root/reference/models/axial_to_lateral_gan_dryops_model.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base_model import BaseModel
from . import gan_common as gc
from ..nn import factory
from .axial_to_lateral_gan_apollo_model import LAT, AX1, AX2, _to_ndhwc


class AxialToLateralGANDryopsModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="strength of the (unused in this ablation) cycle term; kept for flag parity")
            parser.add_argument("--gan_mode", type=str, default="vanilla",
                                help="adversarial objective: vanilla | lsgan | wgangp")
            parser.add_argument("--lambda_plane", type=int, nargs="+", default=[1, 1, 1],
                                help="relative weights of the lateral / axial adversarial terms")
            parser.add_argument("--randomize_projection_depth", action="store_true",
                                help="sample a fresh MIP window depth every iteration")
            parser.add_argument("--projection_depth", type=int, default=10,
                                help="window depth (slices) used for intensity projections; the "
                                     "upper bound when the depth is randomized")
            parser.add_argument("--min_projection_depth", type=int, default=2,
                                help="lower bound of the sampled projection window depth")
        return parser

    def __init__(self, opt):
        BaseModel.__init__(self, opt)
        self.loss_names = ["D_A_lateral", "D_A_axial", "G_A", "G_A_lateral",
                           "G_A_axial"]
        self.visual_names = ["real", "fake"]
        self.model_names = (["G_A", "D_A_lateral", "D_A_axial"]
                            if self.isTrain else ["G_A"])

        self.nets["G_A"] = factory.define_G(opt.input_nc, opt.output_nc, opt.ngf,
                                            opt.netG, opt.norm, dimension=3)
        if self.isTrain:
            for d in ["D_A_lateral", "D_A_axial"]:
                self.nets[d] = factory.define_D(opt.output_nc, opt.ndf, opt.netD,
                                                opt.n_layers_D, opt.norm, dimension=2)
        for name in self.model_names:
            self.params[name] = self.nets[name].init(
                self.next_rng(), opt.init_type, opt.init_gain)

        if self.isTrain:
            self.cfg = gc.GanStepConfig(
                gan_mode=opt.gan_mode, lambda_A=opt.lambda_A,
                lambda_plane=tuple(opt.lambda_plane),
                randomize_projection_depth=opt.randomize_projection_depth,
                projection_depth=opt.projection_depth,
                min_projection_depth=opt.min_projection_depth, beta1=opt.beta1,
                precision=getattr(opt, "precision", "float32"),
                remat=getattr(opt, "remat", False),
                grad_accum=getattr(opt, "grad_accum", 1))
            self.base_lr = opt.lr
            self.optim = gc.make_adam(opt.beta1)
            self.opt_state = {
                "G": self.optim.init({"G_A": self.params["G_A"]}),
                "D": self.optim.init({k: self.params[k]
                                      for k in ("D_A_lateral", "D_A_axial")}),
            }
            self._step = make_dryops_step(self.nets, self.optim, self.cfg)
        self._fwd = jax.jit(lambda pa, x: self.nets["G_A"].apply(pa, x))

    def set_input(self, input):
        AtoB = self.opt.direction == "AtoB"
        self.real = _to_ndhwc(input["A" if AtoB else "B"])
        self.image_paths = input.get("A_paths" if AtoB else "B_paths", "")
        self._visuals["real"] = self.real

    def forward(self):
        self.fake = self._fwd(self.params["G_A"], self.real)
        self._visuals["fake"] = self.fake

    def optimize_parameters(self):
        lr = jnp.float32(self.base_lr * self.lr_scale)
        g_params = {"G_A": self.params["G_A"]}
        d_params = {k: self.params[k] for k in ("D_A_lateral", "D_A_axial")}
        g_params, d_params, self.opt_state, losses, fake = self._step(
            g_params, d_params, self.opt_state, self.next_rng(), self.real, lr)
        self.params.update(g_params)
        self.params.update(d_params)
        self._losses = losses
        self._visuals["fake"] = fake
        self.fake = fake
        self.refresh_norm_stats()


def make_dryops_step(nets, optim, cfg):
    lam_t, lam_s, _ = cfg.lambda_norm

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(g_params, d_params, opt_state, rng, real, lr):
        k_depth, k_g, k_d = jax.random.split(rng, 3)
        depth = gc.sample_projection_depth(k_depth, cfg)
        kg = jax.random.split(k_g, 3)
        kd = jax.random.split(k_d, 6)
        real = real.astype(cfg.compute_dtype)

        d_frozen = {k: (lambda k_: lambda x: nets[k_].apply(
            jax.lax.stop_gradient(d_params[k_]), x))(k) for k in d_params}

        ga_apply = gc.maybe_remat(nets["G_A"].apply, cfg, nets["G_A"])

        def g_loss_fn(gp, real):
            fake = ga_apply(gp["G_A"], real)
            g_a_lat = gc.g_gan(gc.probe_proj(kg[0], fake, LAT, depth,
                                             d_frozen["D_A_lateral"]), cfg) * lam_t
            g_a_ax = (gc.g_gan(gc.probe_proj(kg[1], fake, AX1, depth,
                                             d_frozen["D_A_axial"]), cfg) * lam_s
                      + gc.g_gan(gc.probe_proj(kg[2], fake, AX2, depth,
                                               d_frozen["D_A_axial"]), cfg) * lam_s)
            g_a = g_a_lat + g_a_ax * 0.5
            return g_a, {"G_A": g_a, "G_A_lateral": g_a_lat, "G_A_axial": g_a_ax,
                         "fake": fake}

        # D probes the fake from *before* the G update (reference ordering).
        def d_loss_fn(dp, real, fake):
            def ap(k):
                return lambda x: nets[k].apply(dp[k], x)

            d_a_lat = gc.d_pair(
                gc.probe_slice(kd[0], real, LAT, ap("D_A_lateral")),
                gc.probe_proj(kd[1], fake, LAT, depth, ap("D_A_lateral")), cfg)
            d_a_ax1 = gc.d_pair(
                gc.probe_slice(kd[2], real, LAT, ap("D_A_axial")),
                gc.probe_proj(kd[3], fake, AX1, depth, ap("D_A_axial")), cfg)
            d_a_ax2 = gc.d_pair(
                gc.probe_slice(kd[4], real, LAT, ap("D_A_axial")),
                gc.probe_proj(kd[5], fake, AX2, depth, ap("D_A_axial")), cfg)
            total = d_a_lat + d_a_ax1 + d_a_ax2
            return total, {"D_A_lateral": d_a_lat,
                           "D_A_axial": (d_a_ax1 + d_a_ax2) * 0.5}

        if cfg.grad_accum <= 1:
            (_, g_aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params, real)
            g_updates, og = optim.update(g_grads, opt_state["G"])
            g_params = gc.apply_updates(g_params, g_updates, lr)
            fake = jax.lax.stop_gradient(g_aux.pop("fake"))
            (_, d_aux), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params, real, fake)
            d_updates, od = optim.update(d_grads, opt_state["D"])
            d_params = gc.apply_updates(d_params, d_updates, lr)
            losses = {**g_aux, **d_aux}
            return g_params, d_params, {"G": og, "D": od}, losses, fake

        # batch-N DP-step math on one chip (gan_common.grad_accum_scan)
        n = cfg.grad_accum
        g_grads, d_grads, (fake,), auxs = gc.grad_accum_scan(
            g_loss_fn, d_loss_fn, g_params, d_params, real,
            ("fake",), cfg.compute_dtype)
        g_updates, og = optim.update(
            jax.tree.map(lambda g: g / n, g_grads), opt_state["G"])
        g_params = gc.apply_updates(g_params, g_updates, lr)
        d_updates, od = optim.update(
            jax.tree.map(lambda g: g / n, d_grads), opt_state["D"])
        d_params = gc.apply_updates(d_params, d_updates, lr)
        losses = jax.tree.map(lambda x: x.mean(0), auxs)
        return g_params, d_params, {"G": og, "D": od}, losses, fake

    return step
