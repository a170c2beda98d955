"""Apollo — the production axial-to-lateral CycleGAN.

Parity target: /root/reference/models/axial_to_lateral_gan_apollo_model.py.
3D generators (G_A: unet_deconv, G_B: deep_linear_gen), four 2D
discriminators; D_A compares a random real XY *slice* against random-depth
*MIPs* of the fake volume from each axis; D_B compares slices of real vs
reconstruction; forward-cycle L1 only.

TPU-native: `optimize_parameters` is ONE fused jitted program — G forward,
six G-side probes + grad + Adam, twelve D-side probes + grad + Adam — with
all randomness from explicit PRNG splits (fresh per probe, like the
reference's per-call np.random) and a traced MIP depth under
--randomize_projection_depth (masked-max keeps shapes static).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base_model import BaseModel
from . import gan_common as gc
from ..nn import factory
from ..nn.losses import l1_loss

LAT, AX1, AX2 = 0, 1, 2  # XY, XZ, YZ (apollo_model.py:86-88)


class AxialToLateralGANApolloModel(BaseModel):
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="strength of the A->B->A reconstruction (cycle) term")
            parser.add_argument("--gan_mode", type=str, default="vanilla",
                                help="adversarial objective: vanilla | lsgan | wgangp")
            parser.add_argument("--lambda_plane", type=int, nargs="+", default=[1, 1, 1],
                                help="relative weights of the lateral / axial-XZ / axial-YZ "
                                     "adversarial terms (normalised to fractions internally)")
            parser.add_argument("--randomize_projection_depth", action="store_true",
                                help="sample a fresh MIP window depth every iteration")
            parser.add_argument("--projection_depth", type=int, default=10,
                                help="window depth (slices) used for intensity projections; the "
                                     "upper bound when the depth is randomized")
            parser.add_argument("--min_projection_depth", type=int, default=2,
                                help="lower bound of the sampled projection window depth")
        parser.add_argument("--netG_B", type=str, default="deep_linear_gen",
                            help="generator architecture for the backward (B->A) path")
        return parser

    def __init__(self, opt):
        BaseModel.__init__(self, opt)
        self.loss_names = ["D_A_lateral", "D_A_axial", "G_A", "G_A_lateral",
                           "G_A_axial", "cycle", "D_B_lateral", "D_B_axial",
                           "G_B", "G_B_lateral", "G_B_axial"]
        self.visual_names = ["real", "fake", "rec"]
        if self.isTrain:
            self.model_names = ["G_A", "G_B", "D_A_lateral", "D_A_axial",
                                "D_B_lateral", "D_B_axial"]
        else:
            self.model_names = ["G_A", "G_B"]

        gen_dim, dis_dim = 3, 2
        self.nets["G_A"] = factory.define_G(opt.input_nc, opt.output_nc, opt.ngf,
                                            opt.netG, opt.norm, dimension=gen_dim)
        self.nets["G_B"] = factory.define_G(opt.output_nc, opt.input_nc, opt.ngf,
                                            opt.netG_B, opt.norm, dimension=gen_dim)
        if self.isTrain:
            for d in ["D_A_lateral", "D_A_axial", "D_B_lateral", "D_B_axial"]:
                nc = opt.output_nc if "A" in d.split("_")[1] else opt.input_nc
                self.nets[d] = factory.define_D(nc, opt.ndf, opt.netD,
                                                opt.n_layers_D, opt.norm,
                                                dimension=dis_dim)
        for name in self.model_names:
            self.params[name] = self.nets[name].init(
                self.next_rng(), opt.init_type, opt.init_gain)

        if self.isTrain:
            self.cfg = gc.GanStepConfig(
                gan_mode=opt.gan_mode, lambda_A=opt.lambda_A,
                lambda_plane=tuple(opt.lambda_plane),
                randomize_projection_depth=opt.randomize_projection_depth,
                projection_depth=opt.projection_depth,
                min_projection_depth=opt.min_projection_depth,
                beta1=opt.beta1, precision=getattr(opt, "precision", "float32"),
                remat=getattr(opt, "remat", False),
                grad_accum=getattr(opt, "grad_accum", 1),
                accum_host=not getattr(opt, "fused_accum", False))
            self.base_lr = opt.lr
            self.optim = gc.make_adam(opt.beta1)
            self.opt_state = {
                "G": self.optim.init({k: self.params[k] for k in ("G_A", "G_B")}),
                "D": self.optim.init({k: self.params[k]
                                      for k in self.model_names[2:]}),
            }
            self._step = make_apollo_step(self.nets, self.optim, self.cfg)
            # host-microbatch accumulation can consume crops one at a time
            # (data side: SingleVolumeDataset.per_crop_sampler) so the
            # batch never needs to be HBM-resident
            self.supports_input_sampler = (self.cfg.grad_accum > 1
                                           and self.cfg.accum_host)
        self._fwd = jax.jit(lambda pa, pb, x: _fwd_pair(self.nets, pa, pb, x))
        self._real_sampler = None

    # ------------------------------------------------------------------ API

    def set_input(self, input):
        AtoB = self.opt.direction == "AtoB"
        self.image_paths = input.get("A_paths" if AtoB else "B_paths", "")
        self._real_sampler = input.get("A_sampler")
        if self._real_sampler is not None:
            self.real = None  # crops arrive per-microbatch inside the step
            return
        real = input["A" if AtoB else "B"]
        self.real = _to_ndhwc(real)
        self._visuals["real"] = self.real

    def forward(self):
        self.fake, self.rec = self._fwd(self.params["G_A"], self.params["G_B"],
                                        self.real)
        self._visuals["fake"] = self.fake
        self._visuals["rec"] = self.rec

    def optimize_parameters(self):
        lr = jnp.float32(self.base_lr * self.lr_scale)
        g_params = {k: self.params[k] for k in ("G_A", "G_B")}
        d_params = {k: self.params[k] for k in self.model_names[2:]}
        real = self.real
        last = {}
        if self._real_sampler is not None:
            if not getattr(self, "supports_input_sampler", False):
                raise RuntimeError("A_sampler input needs host-microbatch "
                                   "--grad_accum (accum_host)")

            def real(i):  # record the last crop for the visuals contract
                c = self._real_sampler(i)
                last["c"] = c
                return c
        g_params, d_params, self.opt_state, losses, fake, rec = self._step(
            g_params, d_params, self.opt_state, self.next_rng(), real, lr)
        if last:
            self.real = last["c"]
            self._visuals["real"] = self.real
        self.params.update(g_params)
        self.params.update(d_params)
        self._losses = losses
        self._visuals.update({"fake": fake, "rec": rec})
        self.fake, self.rec = fake, rec
        self.refresh_norm_stats()


def _to_ndhwc(x):
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 6:  # (B, 1, z, y, x, 1) from batched host chain
        x = x.reshape((-1,) + x.shape[2:])
    if x.ndim == 4:  # (z, y, x, 1) or (B, z, y, x)
        x = x[None] if x.shape[-1] == 1 else x[..., None]
    if x.ndim == 3:
        x = x[None, ..., None]
    return x


def _fwd_pair(nets, pa, pb, real):
    fake = nets["G_A"].apply(pa, real)
    rec = nets["G_B"].apply(pb, fake)
    return fake, rec


def make_apollo_step(nets, optim, cfg):
    """Build the fused train step (jitted, params/opt-state donated).

    grad_accum > 1 has two executions of the SAME math (mean-of-per-crop
    grads at the pre-update params, one Adam update — the N-chip DP step):
      * cfg.accum_host (default): a host loop of N jitted microbatch
        dispatches accumulating into donated on-device grad trees, then one
        jitted apply. Peak HBM per dispatch = the proven accum-1 fwd+bwd
        footprint + two grad trees (~150 MB) — the fused scan's
        8x148^3-batch-plus-carry program wedged the 16 GB v5e backend
        (docs/QUALITY.md round-4 session 2).
      * fused scan (--fused_accum): everything in ONE program; needs the
        full batch resident and is the mesh-DP-shaped certification path.
    """

    d_keys = ["D_A_lateral", "D_A_axial", "D_B_lateral", "D_B_axial"]
    lam_t, lam_s, _ = cfg.lambda_norm

    def build_loss_fns(d_params, rng):
        """Per-step probe keys/depth + the two loss closures; shared by the
        fused step and the host-microbatch step so the math cannot drift."""
        k_depth, k_g, k_d = jax.random.split(rng, 3)
        depth = gc.sample_projection_depth(k_depth, cfg)
        kg = jax.random.split(k_g, 6)
        kd = jax.random.split(k_d, 12)

        d_apply = {k: (lambda k_: lambda x: nets[k_].apply(
            jax.lax.stop_gradient(d_params[k_]), x))(k) for k in d_keys}

        # ---- G loss (backward_G parity, apollo_model.py:255-283) ----------
        ga_apply = gc.maybe_remat(nets["G_A"].apply, cfg, nets["G_A"])
        gb_apply = gc.maybe_remat(nets["G_B"].apply, cfg, nets["G_B"])

        def g_loss_fn(gp, real):
            fake = ga_apply(gp["G_A"], real)
            rec = gb_apply(gp["G_B"], fake)

            g_a_lat = gc.g_gan(gc.probe_proj(kg[0], fake, LAT, depth,
                                             d_apply["D_A_lateral"]), cfg) * lam_t
            g_a_ax = (gc.g_gan(gc.probe_proj(kg[1], fake, AX1, depth,
                                             d_apply["D_A_axial"]), cfg) * lam_s
                      + gc.g_gan(gc.probe_proj(kg[2], fake, AX2, depth,
                                               d_apply["D_A_axial"]), cfg) * lam_s)
            g_a = g_a_lat + g_a_ax * 0.5

            g_b_lat = gc.g_gan(gc.probe_slice(kg[3], rec, LAT,
                                              d_apply["D_B_lateral"]), cfg) * lam_t
            g_b_ax = (gc.g_gan(gc.probe_slice(kg[4], rec, AX1,
                                              d_apply["D_B_axial"]), cfg) * lam_s
                      + gc.g_gan(gc.probe_slice(kg[5], rec, AX2,
                                                d_apply["D_B_axial"]), cfg) * lam_s)
            g_b = g_b_lat + g_b_ax * 0.5

            cycle = l1_loss(rec, real) * cfg.lambda_A
            total = g_a + g_b + cycle
            aux = {"G_A": g_a, "G_A_lateral": g_a_lat, "G_A_axial": g_a_ax,
                   "G_B": g_b, "G_B_lateral": g_b_lat, "G_B_axial": g_b_ax,
                   "cycle": cycle, "fake": fake, "rec": rec}
            return total, aux

        # ---- D loss (backward_D_* parity, apollo_model.py:198-253) --------
        # uses fake/rec from *before* the G update, like the reference
        # (forward() precedes optimizer_G.step(); D re-probes detached copies).
        def d_loss_fn(dp, real, fake, rec):
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
            d_b_lat = gc.d_pair(
                gc.probe_slice(kd[6], real, LAT, ap("D_B_lateral")),
                gc.probe_slice(kd[7], rec, LAT, ap("D_B_lateral")), cfg)
            d_b_ax1 = gc.d_pair(
                gc.probe_slice(kd[8], real, AX1, ap("D_B_axial")),
                gc.probe_slice(kd[9], rec, AX1, ap("D_B_axial")), cfg)
            d_b_ax2 = gc.d_pair(
                gc.probe_slice(kd[10], real, AX2, ap("D_B_axial")),
                gc.probe_slice(kd[11], rec, AX2, ap("D_B_axial")), cfg)
            total = d_a_lat + d_a_ax1 + d_a_ax2 + d_b_lat + d_b_ax1 + d_b_ax2
            aux = {"D_A_lateral": d_a_lat,
                   "D_A_axial": (d_a_ax1 + d_a_ax2) * 0.5,
                   "D_B_lateral": d_b_lat,
                   "D_B_axial": (d_b_ax1 + d_b_ax2) * 0.5}
            return total, aux

        return g_loss_fn, d_loss_fn

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(g_params, d_params, opt_state, rng, real, lr):
        g_loss_fn, d_loss_fn = build_loss_fns(d_params, rng)
        # mixed precision: f32 master params/Adam, compute in cfg.precision
        real = real.astype(cfg.compute_dtype)

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

        # ---- sequential batch-N accumulation (cfg.grad_accum docstring) ---
        # `real` is (N, z, y, x, 1); every microbatch reuses this step's
        # probe keys/depth and the pre-update params, and grads are averaged
        # before ONE Adam update — the exact per-device math of the mesh DP
        # step, executed serially so one chip can run (and so a 1-chip run
        # certifies) the N-chip batch recipe.
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

    if cfg.grad_accum <= 1 or not cfg.accum_host:
        return step

    # ---- host-microbatch accumulation (cfg.accum_host docstring) ----------

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def micro_step(g_params, d_params, g_acc, d_acc, rng, real_i):
        g_loss_fn, d_loss_fn = build_loss_fns(d_params, rng)
        real_i = real_i.astype(cfg.compute_dtype)
        (_, g_aux), gi = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, real_i)
        fake = jax.lax.stop_gradient(g_aux.pop("fake"))
        rec = jax.lax.stop_gradient(g_aux.pop("rec"))
        (_, d_aux), di = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params, real_i, fake, rec)
        g_acc = jax.tree.map(jnp.add, g_acc, gi)
        d_acc = jax.tree.map(jnp.add, d_acc, di)
        return g_acc, d_acc, {**g_aux, **d_aux}, fake, rec

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def apply_step(g_params, d_params, opt_state, g_acc, d_acc, lr):
        n = cfg.grad_accum
        g_updates, og = optim.update(
            jax.tree.map(lambda g: g / n, g_acc), opt_state["G"])
        g_params = gc.apply_updates(g_params, g_updates, lr)
        d_updates, od = optim.update(
            jax.tree.map(lambda g: g / n, d_acc), opt_state["D"])
        d_params = gc.apply_updates(d_params, d_updates, lr)
        return g_params, d_params, {"G": og, "D": od}

    def host_step(g_params, d_params, opt_state, rng, real, lr):
        # every microbatch reuses the step's probe keys/depth and the
        # pre-update params — identical math (and grad summation order) to
        # the fused scan; only the program boundaries differ.  `real` is
        # either the (N, ...) batch or a callable i -> crop (the
        # per_crop_sampler path: the batch never becomes HBM-resident)
        crop = real if callable(real) else (lambda i: real[i:i + 1])
        g_acc = jax.tree.map(jnp.zeros_like, g_params)
        d_acc = jax.tree.map(jnp.zeros_like, d_params)
        auxs = []
        fake = rec = None
        for i in range(cfg.grad_accum):
            g_acc, d_acc, aux, fake, rec = micro_step(
                g_params, d_params, g_acc, d_acc, rng, crop(i))
            auxs.append(aux)
        g_params, d_params, opt_state = apply_step(
            g_params, d_params, opt_state, g_acc, d_acc, lr)
        losses = jax.tree.map(lambda *xs: jnp.stack(xs).mean(), *auxs)
        return g_params, d_params, opt_state, losses, fake, rec

    host_step._micro = micro_step  # exposed for AOT memory diagnostics
    host_step._apply = apply_step
    return host_step
