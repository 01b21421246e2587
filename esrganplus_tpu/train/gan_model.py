"""GAN trainers: standard SRGAN and the ESRGAN+ relativistic-average (SRRaGAN).

Functional rebuild of the reference wrappers (``codes/models/SRGAN_model.py``,
``codes/models/SRRaGAN_model.py``), data-parallel over the mesh:

  * G loss = pixel (L1/L2) + VGG-perceptual L1 (real features detached,
    ``SRRaGAN_model.py:128-130``) + GAN term — relativistic pairing for srragan
    (``SRRaGAN_model.py:133-138``), plain D(fake)-vs-real for srgan;
  * D loss = RaGAN pair / standard BCE with the fake branch detached
    (``SRRaGAN_model.py:149-154``), plus optional WGAN-GP;
  * G updates are gated by ``D_update_ratio`` / ``D_init_iters``
    (``SRGAN_model.py:65-66,119``) via ``lax.cond`` — D updates every step;
  * D is "frozen" during the G step by construction — gradients are taken wrt G
    params only (no ``requires_grad`` bookkeeping needed in a functional core).

Deviation (documented): torch updates D's BatchNorm *running* stats during every
forward, including the G-step ones. We fold in the two D-step forwards (real
then fake, sequentially merged) but not the G-step ones. Training math is
identical (train-mode BN uses batch stats); only the running stats — unused
during training — advance on a slightly different schedule.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from esrganplus_tpu.losses import gan_loss, gradient_penalty, ragan_d_loss, ragan_g_loss
from esrganplus_tpu.models.discriminator import (
    DiscriminatorVGGConfig,
    apply_state_updates,
    discriminator_forward,
    init_discriminator,
    merge_sequential_bn,
)
from esrganplus_tpu.models import generator_forward, generator_init
from esrganplus_tpu.models.rrdb import RRDBNetConfig
from esrganplus_tpu.models.vgg import VGGFeatConfig, load_vgg_feat, vgg_feat_forward
from esrganplus_tpu.parallel import data_sharding, make_mesh, replicate_tree, replicated
from esrganplus_tpu.train.schedule import multistep_lr
from esrganplus_tpu.train.sr_model import pixel_loss


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    variant: str = "srragan"  # 'srragan' (ESRGAN+) | 'srgan'
    gan_type: str = "vanilla"  # 'vanilla' | 'lsgan' | 'wgan-gp'
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    beta1_g: float = 0.9
    beta1_d: float = 0.9
    beta2: float = 0.999
    milestones: Sequence[int] = (50_000, 100_000, 200_000, 300_000)
    lr_gamma: float = 0.5
    pixel_criterion: str = "l1"
    pixel_weight: float = 1e-2
    feature_criterion: str = "l1"
    feature_weight: float = 1.0
    gan_weight: float = 5e-3
    d_update_ratio: int = 1
    d_init_iters: int = 0
    gp_weight: float = 10.0
    vgg_path: Optional[str] = None
    compute_dtype: Optional[str] = None
    # noise-site PRNG: 'rbg' (hardware RngBitGenerator, default) |
    # 'threefry' (bitwise-reproducible replay — see train/rng.py)
    noise_prng: str = "rbg"
    # prepared-trunk G masters (see SRTrainConfig.prep_trunk); None = auto
    prep_trunk: Optional[bool] = None
    init_scale_g: float = 0.1
    init_scale_d: float = 1.0


class GANTrainer:
    """Data-parallel ESRGAN+/SRGAN trainer over a device mesh."""

    def __init__(self, net_g: RRDBNetConfig, net_d: DiscriminatorVGGConfig,
                 cfg: GANTrainConfig = GANTrainConfig(), mesh=None,
                 vgg_cfg: VGGFeatConfig = VGGFeatConfig()):
        self.net_g = net_g
        self.net_d = net_d
        self.cfg = cfg
        self.vgg_cfg = vgg_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        if cfg.gan_type == "wgan-gp" and \
                getattr(net_d, "stage_kernel", "auto") == "pallas":
            # the gradient penalty differentiates THROUGH d(x) a second time;
            # custom_vjp kernels don't support forward-over-reverse autodiff
            raise ValueError(
                "gan_type='wgan-gp' needs second-order autodiff through D, "
                "which the forced plane-stage kernels (custom VJP) do not "
                "support — use stage_kernel='auto'/'xla' for the wgan-gp D")
        self._dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        from esrganplus_tpu.models.rrdb import prep_trunk_static

        self._prep_trunk = (cfg.prep_trunk if cfg.prep_trunk is not None
                            else prep_trunk_static(net_g, self._dtype))

        # lr schedules are driven off the GLOBAL step inside _step (reference
        # steps every scheduler each iteration, base_model.py:35-40) — NOT off
        # optax's update count, which freezes whenever the G update is gated.
        self.sched_g = multistep_lr(cfg.lr_g, cfg.milestones, cfg.lr_gamma)
        self.sched_d = multistep_lr(cfg.lr_d, cfg.milestones, cfg.lr_gamma)
        self.lr_schedule = self.sched_g
        self.tx_g = optax.scale_by_adam(b1=cfg.beta1_g, b2=cfg.beta2)
        self.tx_d = optax.scale_by_adam(b1=cfg.beta1_d, b2=cfg.beta2)

        self.use_feature = cfg.feature_weight > 0
        self.f_params = (load_vgg_feat(cfg.vgg_path, vgg_cfg)
                         if self.use_feature else None)

        self._resident_jits = {}
        rep = replicated(self.mesh)
        dat = data_sharding(self.mesh)
        self._jit_step = jax.jit(
            self._step,
            in_shardings=(rep, (dat, dat), rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._jit_eval = jax.jit(
            functools.partial(generator_forward, cfg=net_g, train=False),
            # batch-1 validation images can't shard across the data axis;
            # replicate instead (eval cost is negligible vs training).
            in_shardings=(rep, rep),
            out_shardings=rep,
        )

    # -- state -------------------------------------------------------------

    def init_state(self, rng) -> dict:
        kg, kd = jax.random.split(rng)
        g_params = self.ingest_params(
            generator_init(kg, self.net_g, init_scale=self.cfg.init_scale_g))
        d_params = init_discriminator(kd, self.net_d, init_scale=self.cfg.init_scale_d)
        state = {
            "g_params": g_params,
            "d_params": d_params,
            "g_opt": self.tx_g.init(g_params),
            "d_opt": self.tx_d.init(d_params),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.use_feature:
            state["f_params"] = self.f_params
        return replicate_tree(self.mesh, state)

    def ingest_params(self, params):
        """Canonical G params → the trainer's state representation (prepared
        trunk masters when the Pallas fast path is active)."""
        if self._prep_trunk and "trunk_ct" not in params:
            from esrganplus_tpu.models.rrdb import prep_trunk_ct

            return prep_trunk_ct(params, self.net_g)
        return params

    def canonical_params(self, params):
        """State G params → canonical pytree (checkpoint .pth export)."""
        if isinstance(params, dict) and "trunk_ct" in params:
            from esrganplus_tpu.models.rrdb import unprep_trunk_ct

            return unprep_trunk_ct(params, self.net_g)
        return params

    # -- loss pieces -------------------------------------------------------

    def _d_logits(self, d_params, x, train=True):
        logits, new_state = discriminator_forward(d_params, x, self.net_d,
                                                  train=train, dtype=self._dtype)
        return logits, new_state

    def _g_loss(self, g_params, d_params, f_params, lr_img, hr_img, rng,
                d_real=None):
        cfg = self.cfg
        # fake stays in compute dtype: casting to f32 here would materialise a
        # full-HR f32 tensor that every consumer (D, VGG) immediately casts
        # back down — identical values (f32(bf16(x)) is exact), wasted HBM
        # traffic. The losses upcast at their reductions.
        fake = generator_forward(g_params, lr_img, self.net_g, train=True, rng=rng,
                                 dtype=self._dtype)
        logs = {}
        total = 0.0
        if cfg.pixel_weight > 0:
            l_pix = cfg.pixel_weight * pixel_loss(fake.astype(jnp.float32), hr_img,
                                                  cfg.pixel_criterion)
            total += l_pix
            logs["l_g_pix"] = l_pix
        if self.use_feature:
            real_fea = jax.lax.stop_gradient(
                vgg_feat_forward(f_params, hr_img, self.vgg_cfg, dtype=self._dtype))
            fake_fea = vgg_feat_forward(f_params, fake, self.vgg_cfg, dtype=self._dtype)
            l_fea = cfg.feature_weight * pixel_loss(
                fake_fea.astype(jnp.float32), real_fea.astype(jnp.float32),
                cfg.feature_criterion)
            total += l_fea
            logs["l_g_fea"] = l_fea
        d_fake, _ = self._d_logits(d_params, fake)
        if cfg.variant == "srragan":
            # D(real) carries no gradient in the G phase (it is independent
            # of g_params; the reference freezes D here) — its VALUE is
            # hoisted out of the cond by _step so XLA's CSE can merge the
            # forward with the D-phase primal instead of running it twice.
            if d_real is None:
                d_real, _ = self._d_logits(d_params, hr_img)
            l_gan = cfg.gan_weight * ragan_g_loss(d_real, d_fake, cfg.gan_type)
        else:
            l_gan = cfg.gan_weight * gan_loss(d_fake, True, cfg.gan_type)
        total += l_gan
        logs["l_g_gan"] = l_gan
        return total, (fake, logs)

    def _d_loss(self, d_params, fake, hr_img, rng):
        cfg = self.cfg
        d_real, st_real = self._d_logits(d_params, hr_img)
        d_fake, st_fake = self._d_logits(d_params, fake)
        if cfg.variant == "srragan":
            loss = ragan_d_loss(d_real, d_fake, cfg.gan_type)
        else:
            loss = (gan_loss(d_real, True, cfg.gan_type)
                    + gan_loss(d_fake, False, cfg.gan_type))
        if cfg.gan_type == "wgan-gp":
            def d_apply(p, x):
                return self._d_logits(p, x)[0]
            loss = loss + cfg.gp_weight * gradient_penalty(d_apply, d_params, hr_img, fake, rng)
        logs = {"l_d_total": loss, "D_real": jnp.mean(d_real), "D_fake": jnp.mean(d_fake)}
        return loss, ((st_real, st_fake), logs)

    # -- step --------------------------------------------------------------

    def _step(self, state, batch, rng):
        cfg = self.cfg
        lr_img, hr_img = batch
        from esrganplus_tpu.train.rng import noise_key

        rng_noise, rng_gp = jax.random.split(jax.random.fold_in(rng, state["step"]))
        rng_noise = noise_key(rng_noise, self.cfg.noise_prng)
        f_params = state.get("f_params")
        # 1-based iteration number — the reference's current_step.
        gstep = state["step"] + 1
        lr_g = self.sched_g(gstep)
        lr_d = self.sched_d(gstep)

        # ---- G update (gated by d_update_ratio / d_init_iters, exactly the
        # reference formula on the 1-based counter: SRRaGAN_model.py:119) ----
        do_g = jnp.logical_and(gstep % cfg.d_update_ratio == 0,
                               gstep > cfg.d_init_iters)

        # RaGAN's G loss pairs against D(real) but takes no gradient through
        # it. Hoisting the forward out of the cond makes it an identical
        # subgraph to the D-phase primal (same d_params, same hr_img, same
        # train-mode batch-stats math), which XLA's CSE dedupes — the G
        # phase's own D(real) pass (1 of the step's 4 D forwards) disappears.
        d_real_hoisted = None
        if cfg.variant == "srragan":
            d_real_hoisted = jax.lax.stop_gradient(
                self._d_logits(state["d_params"], hr_img)[0])

        def g_update(operand):
            g_params, g_opt = operand
            (g_total, (fake, g_logs)), grads = jax.value_and_grad(
                self._g_loss, has_aux=True)(g_params, state["d_params"], f_params,
                                            lr_img, hr_img, rng_noise,
                                            d_real_hoisted)
            if self._prep_trunk:
                from esrganplus_tpu.models.rrdb import mask_trunk_ct_grads

                grads = mask_trunk_ct_grads(grads, self.net_g)
            updates, new_g_opt = self.tx_g.update(grads, g_opt, g_params)
            updates = jax.tree.map(lambda u: -lr_g * u, updates)
            new_g_params = optax.apply_updates(g_params, updates)
            g_logs = {**g_logs, "l_g_total": g_total}
            return new_g_params, new_g_opt, fake, g_logs

        def g_skip(operand):
            g_params, g_opt = operand
            fake = generator_forward(g_params, lr_img, self.net_g, train=True,
                                     rng=rng_noise, dtype=self._dtype)
            zeros = {"l_g_pix": 0.0, "l_g_fea": 0.0, "l_g_gan": 0.0, "l_g_total": 0.0}
            if cfg.pixel_weight <= 0:
                zeros.pop("l_g_pix")
            if not self.use_feature:
                zeros.pop("l_g_fea")
            zeros = {k: jnp.zeros(()) for k in zeros}
            return g_params, g_opt, fake, zeros

        if cfg.d_update_ratio == 1 and cfg.d_init_iters == 0:
            # The flagship recipe updates G every step (the gate above is
            # constant-true), so skip the lax.cond: straight-line code lets
            # XLA's CSE merge the G-phase D(fake) forward with the D-phase
            # D(fake_detached) primal (identical params + input values),
            # which a cond boundary would block. 2 of the step's 4 D
            # forwards dedupe away (the other is the hoisted D(real)).
            new_g_params, new_g_opt, fake, g_logs = g_update(
                (state["g_params"], state["g_opt"]))
        else:
            new_g_params, new_g_opt, fake, g_logs = jax.lax.cond(
                do_g, g_update, g_skip, (state["g_params"], state["g_opt"]))

        # ---- D update (every step; fake detached) ----
        fake_detached = jax.lax.stop_gradient(fake)
        (d_total, ((st_real, st_fake), d_logs)), d_grads = jax.value_and_grad(
            self._d_loss, has_aux=True)(state["d_params"], fake_detached, hr_img, rng_gp)
        d_updates, new_d_opt = self.tx_d.update(d_grads, state["d_opt"], state["d_params"])
        d_updates = jax.tree.map(lambda u: -lr_d * u, d_updates)
        new_d_params = optax.apply_updates(state["d_params"], d_updates)
        # torch updates BN running stats on BOTH D-step forwards (real then fake)
        new_d_params = merge_sequential_bn(new_d_params, st_real, st_fake, self.net_d)

        logs = {**g_logs, **d_logs, "lr": lr_g}
        new_state = {
            "g_params": new_g_params,
            "d_params": new_d_params,
            "g_opt": new_g_opt,
            "d_opt": new_d_opt,
            "step": state["step"] + 1,
        }
        if self.use_feature:
            new_state["f_params"] = f_params
        return new_state, logs

    def train_step(self, state, batch, rng):
        """One G+D step. ``batch`` = (LR NHWC, HR NHWC) float32 [0,1]."""
        return self._jit_step(state, batch, rng)

    def train_step_resident(self, state, store, rng, batch_size: int,
                            n_steps: int = 1):
        """``n_steps`` G+D steps in one dispatch, batch sampled ON DEVICE
        from a :class:`~esrganplus_tpu.data.resident.ResidentCropStore`
        (shared executor: ``train/resident_exec.py``)."""
        from esrganplus_tpu.train.resident_exec import train_step_resident

        return train_step_resident(self, state, store, rng, batch_size,
                                   n_steps, (store.lr, store.hr))

    def predict(self, g_params, lr_img):
        return self._jit_eval(g_params, lr_img)
