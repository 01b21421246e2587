"""SFT-GAN trainer with the auxiliary-classifier discriminator.

Rebuild of ``codes/models/SFTGAN_ACD_model.py``: two generator optimizers —
SFT/Cond parameters at 5× lr, the rest gated until step > 20k
(``SFTGAN_ACD_model.py:81-93,148-149``); G loss = pixel + VGG-feature + vanilla
GAN + gan_weight·CE(cls, category); D loss = BCE(real/fake) + CE on both real
and fake class heads, CE with ignore_index=0 (background conflicts with real
classes, ``SFTGAN_ACD_model.py:74-76``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from esrganplus_tpu.losses import gan_loss
from esrganplus_tpu.models.sft import (
    SFTNetConfig,
    acd_apply_updates,
    acd_forward,
    acd_merge_sequential,
    init_acd,
    init_sftnet,
    sftnet_forward,
)
from esrganplus_tpu.models.vgg import VGGFeatConfig, load_vgg_feat, vgg_feat_forward
from esrganplus_tpu.parallel import data_sharding, make_mesh, replicate_tree, replicated
from esrganplus_tpu.train.schedule import multistep_lr
from esrganplus_tpu.train.sr_model import pixel_loss


@dataclasses.dataclass(frozen=True)
class SFTGANTrainConfig:
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    sft_lr_mult: float = 5.0
    other_start_iter: int = 20_000
    beta1_g: float = 0.9
    beta1_d: float = 0.9
    milestones: Sequence[int] = (50_000, 100_000, 200_000, 300_000)
    lr_gamma: float = 0.5
    pixel_criterion: str = "l1"
    pixel_weight: float = 1e-2
    feature_weight: float = 1.0
    gan_type: str = "vanilla"
    gan_weight: float = 5e-3
    d_update_ratio: int = 1
    d_init_iters: int = 0
    vgg_path: Optional[str] = None
    compute_dtype: Optional[str] = None


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         ignore_index: int = 0) -> jnp.ndarray:
    """CE over classes with torch's ignore_index semantics (mean over kept)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    keep = (labels != ignore_index).astype(jnp.float32)
    return -jnp.sum(picked * keep) / jnp.maximum(jnp.sum(keep), 1.0)


class SFTGANTrainer:
    def __init__(self, net_g: SFTNetConfig = SFTNetConfig(),
                 cfg: SFTGANTrainConfig = SFTGANTrainConfig(), mesh=None,
                 vgg_cfg: VGGFeatConfig = VGGFeatConfig()):
        self.net_g = net_g
        self.cfg = cfg
        self.vgg_cfg = vgg_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self._dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        # lr schedules run off the GLOBAL step inside _step (the reference steps
        # every scheduler each iteration, base_model.py:35-40) so the gated
        # 'other'/'sft' groups keep the reference milestones; only the Adam
        # moments/bias-correction count freeze with the gate (torch's per-group
        # step counter also advances only on applied updates).
        self.sched = multistep_lr(cfg.lr_g, cfg.milestones, cfg.lr_gamma)
        self.sched_sft = multistep_lr(cfg.lr_g * cfg.sft_lr_mult, cfg.milestones,
                                      cfg.lr_gamma)
        self.sched_d = multistep_lr(cfg.lr_d, cfg.milestones, cfg.lr_gamma)
        self.lr_schedule = self.sched

        def label_fn(params):
            def walk(tree, path):
                if isinstance(tree, dict):
                    return {k: walk(v, path + (k,)) for k, v in tree.items()}
                if isinstance(tree, (list, tuple)):
                    return type(tree)(walk(v, path + (str(i),)) for i, v in enumerate(tree))
                joined = "/".join(path).lower()
                return "sft" if ("sft" in joined or "cond" in joined) else "other"

            return walk(params, ())

        # two groups so each keeps its own frozen-while-gated Adam state
        self.tx_g = optax.multi_transform(
            {"sft": optax.scale_by_adam(b1=cfg.beta1_g),
             "other": optax.scale_by_adam(b1=cfg.beta1_g)},
            label_fn)
        self.tx_d = optax.scale_by_adam(b1=cfg.beta1_d)
        self._label_fn = label_fn

        self.use_feature = cfg.feature_weight > 0
        self.f_params = load_vgg_feat(cfg.vgg_path, vgg_cfg) if self.use_feature else None

        self._resident_jits = {}
        rep = replicated(self.mesh)
        dat = data_sharding(self.mesh)
        cat_shard = data_sharding(self.mesh, ndim=1)
        self._jit_step = jax.jit(
            self._step,
            in_shardings=(rep, (dat, dat, dat, cat_shard), rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    def init_state(self, rng) -> dict:
        kg, kd = jax.random.split(rng)
        g_params = init_sftnet(kg, self.net_g)
        d_params = init_acd(kd)
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

    def _g_loss(self, g_params, d_params, f_params, lr_img, seg, hr_img, cat):
        cfg = self.cfg
        fake = sftnet_forward(g_params, lr_img, seg, self.net_g, dtype=self._dtype)
        logs = {}
        total = 0.0
        if cfg.pixel_weight > 0:
            l_pix = cfg.pixel_weight * pixel_loss(fake, hr_img, cfg.pixel_criterion)
            total += l_pix
            logs["l_g_pix"] = l_pix
        if self.use_feature:
            real_fea = jax.lax.stop_gradient(
                vgg_feat_forward(f_params, hr_img, self.vgg_cfg, dtype=self._dtype))
            fake_fea = vgg_feat_forward(f_params, fake, self.vgg_cfg, dtype=self._dtype)
            l_fea = cfg.feature_weight * pixel_loss(
                fake_fea.astype(jnp.float32), real_fea.astype(jnp.float32), "l1")
            total += l_fea
            logs["l_g_fea"] = l_fea
        gan_logits, cls_logits, _ = acd_forward(d_params, fake, train=True, dtype=self._dtype)
        l_gan = cfg.gan_weight * gan_loss(gan_logits, True, cfg.gan_type)
        l_cls = cfg.gan_weight * masked_cross_entropy(cls_logits, cat)
        total = total + l_gan + l_cls
        logs.update({"l_g_gan": l_gan, "l_g_cls": l_cls, "l_g_total": total})
        return total, (fake, logs)

    def _d_loss(self, d_params, fake, hr_img, cat):
        cfg = self.cfg
        gan_r, cls_r, upd_r = acd_forward(d_params, hr_img, train=True, dtype=self._dtype)
        gan_f, cls_f, upd_f = acd_forward(d_params, fake, train=True, dtype=self._dtype)
        loss = (gan_loss(gan_r, True, cfg.gan_type) + masked_cross_entropy(cls_r, cat)
                + gan_loss(gan_f, False, cfg.gan_type) + masked_cross_entropy(cls_f, cat))
        logs = {"l_d_total": loss, "D_real": jnp.mean(gan_r), "D_fake": jnp.mean(gan_f)}
        return loss, ((upd_r, upd_f), logs)

    def _step(self, state, batch, rng):
        cfg = self.cfg
        lr_img, seg, hr_img, cat = batch
        f_params = state.get("f_params")
        # 1-based iteration number — the reference's current_step.
        gstep = state["step"] + 1
        lr_sft = self.sched_sft(gstep)
        lr_other = self.sched(gstep)
        lr_d = self.sched_d(gstep)

        (g_total, (fake, g_logs)), grads = jax.value_and_grad(self._g_loss, has_aux=True)(
            state["g_params"], state["d_params"], f_params, lr_img, seg, hr_img, cat)
        updates, new_g_opt = self.tx_g.update(grads, state["g_opt"], state["g_params"])

        # gate: SFT params follow D_update_ratio/D_init; 'other' waits for 20k —
        # both on the 1-based counter exactly as the reference
        # (SFTGAN_ACD_model.py:134,148-149: `step % ratio == 0 and step > N`).
        # The reference skips optimizer.step() entirely outside the gate, so
        # BOTH the params and the per-group Adam moments must stay frozen.
        do_sft = jnp.logical_and(gstep % cfg.d_update_ratio == 0,
                                 gstep > cfg.d_init_iters)
        do_other = gstep > cfg.other_start_iter
        labels = self._label_fn(state["g_params"])
        gated = jax.tree.map(
            lambda u, lab: (jnp.where(do_sft, -lr_sft * u, 0.0) if lab == "sft"
                            else jnp.where(do_other, -lr_other * u, 0.0)),
            updates, labels)
        new_g_params = optax.apply_updates(state["g_params"], gated)
        inner_new = dict(new_g_opt.inner_states)
        inner_old = state["g_opt"].inner_states
        inner_new["sft"] = jax.tree.map(
            lambda n, o: jnp.where(do_sft, n, o), inner_new["sft"], inner_old["sft"])
        inner_new["other"] = jax.tree.map(
            lambda n, o: jnp.where(do_other, n, o), inner_new["other"], inner_old["other"])
        new_g_opt = new_g_opt._replace(inner_states=inner_new)

        fake_detached = jax.lax.stop_gradient(fake)
        (d_total, ((upd_r, upd_f), d_logs)), d_grads = jax.value_and_grad(self._d_loss, has_aux=True)(
            state["d_params"], fake_detached, hr_img, cat)
        d_updates, new_d_opt = self.tx_d.update(d_grads, state["d_opt"], state["d_params"])
        d_updates = jax.tree.map(lambda u: -lr_d * u, d_updates)
        new_d_params = optax.apply_updates(state["d_params"], d_updates)
        new_d_params = acd_merge_sequential(new_d_params, upd_r, upd_f)

        logs = {**g_logs, **d_logs, "lr": lr_other}
        new_state = {**state, "g_params": new_g_params, "d_params": new_d_params,
                     "g_opt": new_g_opt, "d_opt": new_d_opt, "step": state["step"] + 1}
        return new_state, logs

    def train_step(self, state, batch, rng):
        """batch = (LR, seg_HR, HR, category[int]) NHWC float32."""
        return self._jit_step(state, batch, rng)

    def train_step_resident(self, state, store, rng, batch_size: int,
                            n_steps: int = 1):
        """``n_steps`` SFT-GAN steps in one dispatch, (LR, seg, HR, cat)
        sampled ON DEVICE from a
        :class:`~esrganplus_tpu.data.resident.ResidentSegStore` (shared
        executor: ``train/resident_exec.py``)."""
        from esrganplus_tpu.train.resident_exec import train_step_resident

        return train_step_resident(self, state, store, rng, batch_size,
                                   n_steps,
                                   (store.lr, store.seg, store.hr, store.cat))

    def predict(self, g_params, lr_img, seg):
        import functools

        if not hasattr(self, "_jit_eval"):
            self._jit_eval = jax.jit(
                functools.partial(sftnet_forward, cfg=self.net_g))
        return self._jit_eval(g_params, lr_img, seg)
