"""PSNR-oriented L1/L2 trainer for the RRDB/SRResNet generators.

Functional equivalent of the reference ``SRModel``
(``codes/models/SR_model.py:15-151``): pixel loss (L1 or MSE), Adam, MultiStepLR —
but data-parallel from day one: the jitted step runs SPMD over the mesh's ``data``
axis with batch-sharded inputs and replicated parameters; XLA inserts the gradient
all-reduce over ICI. The loss accepts an ``rng`` so nESRGAN+ noise sites stay
active during training exactly as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from esrganplus_tpu.models import generator_forward, generator_init
from esrganplus_tpu.models.rrdb import RRDBNetConfig
from esrganplus_tpu.parallel import data_sharding, make_mesh, replicate_tree, replicated
from esrganplus_tpu.train.schedule import multistep_lr


@dataclasses.dataclass(frozen=True)
class SRTrainConfig:
    lr: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.999
    milestones: Sequence[int] = (200_000, 400_000, 600_000, 800_000)
    lr_gamma: float = 0.5
    pixel_criterion: str = "l1"  # 'l1' | 'l2'
    pixel_weight: float = 1.0
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None
    compute_dtype: Optional[str] = None  # None (fp32) | 'bfloat16'
    init_scale: float = 0.1
    # 'rbg' (XLA hardware RngBitGenerator, default — the 69 per-step noise
    # draws cost ~5 ms of the 28 ms step through threefry) | 'threefry'
    # (bitwise-reproducible replay; see train/rng.py)
    noise_prng: str = "rbg"
    # keep the RRDB-trunk masters in the Pallas kernel layout (the per-step
    # canonical→kernel weight relayout measured ~0.7-1 ms at flagship shape;
    # models/rrdb.py prep_trunk_ct). None = auto: on whenever every step
    # takes the Pallas trunk+tail path. Checkpoint .pth exports and the
    # state.npz template both follow the active representation.
    prep_trunk: Optional[bool] = None


def pixel_loss(pred, target, criterion: str):
    if criterion == "l1":
        return jnp.mean(jnp.abs(pred - target))
    if criterion == "l2":
        return jnp.mean((pred - target) ** 2)
    raise NotImplementedError(f"pixel criterion [{criterion}]")


def make_optimizer(cfg: SRTrainConfig):
    """Adam-moment transform WITHOUT the lr scaling.

    Trainers apply ``-lr(global_step)`` themselves so MultiStepLR follows the
    global iteration (torch semantics: the reference steps every scheduler each
    iteration, ``base_model.py:35-40``) even when an optimizer's updates are
    gated — driving the schedule off optax's internal update count would shift
    milestones whenever updates are skipped. Adam's bias-correction count still
    advances per *applied* update, matching torch's per-group ``step`` counter.
    """
    sched = multistep_lr(cfg.lr, cfg.milestones, cfg.lr_gamma)
    parts = []
    if cfg.weight_decay:
        # torch Adam weight_decay = L2 added to the gradient before the update
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.grad_clip:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2))
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    return tx, sched


class SRTrainer:
    """Data-parallel PSNR pretrainer over a device mesh."""

    def __init__(self, net_cfg: RRDBNetConfig, train_cfg: SRTrainConfig = SRTrainConfig(),
                 mesh=None):
        self.net_cfg = net_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx, self.lr_schedule = make_optimizer(train_cfg)
        self._dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else None
        from esrganplus_tpu.models.rrdb import prep_trunk_static

        self._prep_trunk = (train_cfg.prep_trunk if train_cfg.prep_trunk is not None
                            else prep_trunk_static(net_cfg, self._dtype))

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
            functools.partial(generator_forward, cfg=net_cfg, train=False),
            # batch-1 validation images can't shard across the data axis;
            # replicate instead (eval cost is negligible vs training).
            in_shardings=(rep, rep),
            out_shardings=rep,
        )

    # -- state -------------------------------------------------------------

    def init_state(self, rng) -> dict:
        params = self.ingest_params(
            generator_init(rng, self.net_cfg, init_scale=self.train_cfg.init_scale))
        state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        return replicate_tree(self.mesh, state)

    def ingest_params(self, params):
        """Canonical generator params → the trainer's state representation
        (prepared-trunk masters when the Pallas fast path is active)."""
        if self._prep_trunk and "trunk_ct" not in params:
            from esrganplus_tpu.models.rrdb import prep_trunk_ct

            return prep_trunk_ct(params, self.net_cfg)
        return params

    def canonical_params(self, params):
        """State representation → canonical pytree (checkpoint .pth export)."""
        if isinstance(params, dict) and "trunk_ct" in params:
            from esrganplus_tpu.models.rrdb import unprep_trunk_ct

            return unprep_trunk_ct(params, self.net_cfg)
        return params

    # -- steps -------------------------------------------------------------

    def _loss_fn(self, params, lr_img, hr_img, rng):
        fake = generator_forward(params, lr_img, self.net_cfg, train=True, rng=rng,
                                 dtype=self._dtype)
        l_pix = self.train_cfg.pixel_weight * pixel_loss(
            fake.astype(jnp.float32), hr_img.astype(jnp.float32),
            self.train_cfg.pixel_criterion)
        return l_pix, fake

    def _step(self, state, batch, rng):
        from esrganplus_tpu.train.rng import noise_key

        lr_img, hr_img = batch
        # fresh noise every optimizer step even when the caller reuses one key
        rng = noise_key(jax.random.fold_in(rng, state["step"]),
                        self.train_cfg.noise_prng)
        # 1-based iteration number — the reference's current_step (train.py
        # increments before update_learning_rate/optimize_parameters).
        gstep = state["step"] + 1
        (loss, _), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state["params"], lr_img, hr_img, rng)
        if self._prep_trunk:
            from esrganplus_tpu.models.rrdb import mask_trunk_ct_grads

            grads = mask_trunk_ct_grads(grads, self.net_cfg)
        updates, new_opt = self.tx.update(grads, state["opt_state"], state["params"])
        lr = self.lr_schedule(gstep)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state["params"], updates)
        logs = {
            "l_pix": loss,
            "lr": lr,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = {"params": new_params, "opt_state": new_opt, "step": state["step"] + 1}
        return new_state, logs

    def train_step(self, state, batch, rng):
        """One optimizer step. ``batch`` = (LR NHWC, HR NHWC) float32 [0,1]."""
        return self._jit_step(state, batch, rng)

    def train_step_resident(self, state, store, rng, batch_size: int,
                            n_steps: int = 1):
        """``n_steps`` steps in one dispatch, batch sampled ON DEVICE from a
        :class:`~esrganplus_tpu.data.resident.ResidentCropStore` (shared
        executor: ``train/resident_exec.py``)."""
        from esrganplus_tpu.train.resident_exec import train_step_resident

        return train_step_resident(self, state, store, rng, batch_size,
                                   n_steps, (store.lr, store.hr))

    def predict(self, params, lr_img):
        return self._jit_eval(params, lr_img)
