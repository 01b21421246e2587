"""VGG-style discriminators (inputs 128/96/192, plus the spectral-norm variant).

One parametric implementation covers the reference's three copies
(``codes/models/modules/architecture.py:87-270``): n stages of
[k3-s1 conv → norm → lrelu, k4-s2-pad1 conv → norm → lrelu] with channels
64,64,128,128,256,256,512,512,…; the very first conv is never normalised
(``architecture.py:93``); classifier = Linear(512·f·f → 100) → lrelu →
Linear(100 → 1) on the NCHW-ordered flatten (we keep that flatten order so torch
classifier weights convert 1:1).

BatchNorm uses full-batch statistics: under SPMD data parallelism the batch mean
runs over the *global* batch axis (XLA inserts the collective), which matches the
reference's single-process semantics rather than per-device stats.

The SN variant (``architecture.py:133-175``) uses the same topology, no norm, and
spectral normalisation by one power-iteration step per forward on every conv and
linear weight (vendored torch impl spec: ``codes/models/modules/spectral_norm.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from esrganplus_tpu.models.layers import (
    Params,
    act,
    batchnorm,
    batchnorm_init,
    conv2d,
    kaiming_conv_init,
    kaiming_linear_init,
    linear,
)


@dataclasses.dataclass(frozen=True)
class DiscriminatorVGGConfig:
    input_size: int = 128  # 96 | 128 | 192
    in_nc: int = 3
    base_nf: int = 64
    norm_type: Optional[str] = "batch"  # 'batch' | None
    act_type: str = "leakyrelu"
    act_slope: float = 0.2
    spectral_norm: bool = False
    sn_power_iters: int = 1

    @property
    def n_stages(self) -> int:
        return {96: 5, 128: 5, 192: 6}[self.input_size]

    @property
    def stage_channels(self):
        nf = self.base_nf
        chans = [nf, nf * 2, nf * 4, nf * 8, nf * 8, nf * 8]
        return chans[: self.n_stages]

    @property
    def final_spatial(self) -> int:
        return self.input_size // (2 ** self.n_stages)

    @property
    def use_bn(self) -> bool:
        return self.norm_type == "batch" and not self.spectral_norm


def init_discriminator(key, cfg: DiscriminatorVGGConfig, init_scale: float = 1.0,
                       dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 2 * cfg.n_stages + 2)
    convs = []
    bns = []
    cin = cfg.in_nc
    for i, cout in enumerate(cfg.stage_channels):
        c_a = kaiming_conv_init(keys[2 * i], 3, 3, cin, cout, init_scale, dtype=dtype)
        c_b = kaiming_conv_init(keys[2 * i + 1], 4, 4, cout, cout, init_scale, dtype=dtype)
        if cfg.spectral_norm:
            c_a["u"] = jax.random.normal(jax.random.fold_in(keys[2 * i], 1), (cout,), dtype)
            c_b["u"] = jax.random.normal(jax.random.fold_in(keys[2 * i + 1], 1), (cout,), dtype)
        convs.append({"a": c_a, "b": c_b})
        if cfg.use_bn:
            bn_a = None if i == 0 else batchnorm_init(cout, dtype)
            bns.append({"a": bn_a, "b": batchnorm_init(cout, dtype)})
        cin = cout
    f = cfg.final_spatial
    fc0 = kaiming_linear_init(keys[-2], cfg.stage_channels[-1] * f * f, 100, init_scale, dtype)
    fc1 = kaiming_linear_init(keys[-1], 100, 1, init_scale, dtype)
    if cfg.spectral_norm:
        fc0["u"] = jax.random.normal(jax.random.fold_in(keys[-2], 1), (100,), dtype)
        fc1["u"] = jax.random.normal(jax.random.fold_in(keys[-1], 1), (1,), dtype)
    params: Params = {"convs": convs, "fc0": fc0, "fc1": fc1}
    if cfg.use_bn:
        params["bn"] = bns
    return params


def _sn_weight(p: Params, n_iters: int):
    """One (or more) power-iteration steps on w reshaped to [out, -1]; returns
    (w / sigma, new_u). Matches torch spectral_norm's forward-hook semantics."""
    w = p["w"]
    out_dim = w.shape[-1]
    w2d = w.reshape(-1, out_dim).T  # [out, in*]
    # torch computes the power iteration under no_grad: only the direct
    # u^T W v term carries gradient, so u and v must be stop_gradient'd.
    w2d_ng = jax.lax.stop_gradient(w2d)
    u = p["u"]
    for _ in range(n_iters):
        v = w2d_ng.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w2d_ng @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (w2d @ v)
    return w / sigma, u


def discriminator_forward(params: Params, x: jnp.ndarray, cfg: DiscriminatorVGGConfig,
                          train: bool = False, dtype=None):
    """Returns (logits [B, 1], new_state) where new_state carries updated BN
    running stats (train mode) or SN power-iteration vectors."""
    a = lambda t: act(t, cfg.act_type, cfg.act_slope)
    new_state: Params = {}

    def apply_conv(h, p, stride, pad, name):
        if cfg.spectral_norm:
            w_bar, u = _sn_weight(p, cfg.sn_power_iters)
            new_state.setdefault("u", {})[name] = u
            p = {**p, "w": w_bar}
        return conv2d(h, p, stride=stride, pad=pad, dtype=dtype)

    h = x
    bn_updates = []
    for i, stage in enumerate(params["convs"]):
        h = apply_conv(h, stage["a"], 1, "same", f"conv{i}a")
        upd = {}
        if cfg.use_bn and params["bn"][i]["a"] is not None:
            h, upd_a = batchnorm(h, params["bn"][i]["a"], train)
            upd["a"] = upd_a
        h = a(h)
        # k4-s2 uses torch's pad=1 on both sides (get_valid_padding semantics);
        # jax "SAME" would pad (2,1) and shift the grid.
        h = apply_conv(h, stage["b"], 2, 1, f"conv{i}b")
        if cfg.use_bn:
            h, upd_b = batchnorm(h, params["bn"][i]["b"], train)
            upd["b"] = upd_b
        h = a(h)
        bn_updates.append(upd)
    if cfg.use_bn:
        new_state["bn"] = bn_updates

    # NCHW flatten order for torch classifier-weight compatibility.
    b = h.shape[0]
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)

    fc0, fc1 = params["fc0"], params["fc1"]
    if cfg.spectral_norm:
        w0, u0 = _sn_weight(fc0, cfg.sn_power_iters)
        w1, u1 = _sn_weight(fc1, cfg.sn_power_iters)
        new_state.setdefault("u", {})["fc0"] = u0
        new_state["u"]["fc1"] = u1
        fc0 = {**fc0, "w": w0}
        fc1 = {**fc1, "w": w1}
    h = a(linear(h, fc0, dtype=dtype))
    logits = linear(h, fc1, dtype=dtype)
    return logits.astype(jnp.float32), new_state


def apply_state_updates(params: Params, new_state: Params, cfg: DiscriminatorVGGConfig) -> Params:
    """Fold BN running-stat / SN u-vector updates back into the param tree."""
    out = dict(params)
    if cfg.use_bn and "bn" in new_state:
        bns = []
        for old, upd in zip(params["bn"], new_state["bn"]):
            entry = {}
            for side in ("a", "b"):
                if old[side] is None:
                    entry[side] = None
                elif side in upd:
                    entry[side] = {**old[side], **upd[side]}
                else:
                    entry[side] = old[side]
            bns.append(entry)
        out["bn"] = bns
    if cfg.spectral_norm and "u" in new_state:
        convs = []
        for i, stage in enumerate(params["convs"]):
            convs.append({
                "a": {**stage["a"], "u": new_state["u"][f"conv{i}a"]},
                "b": {**stage["b"], "u": new_state["u"][f"conv{i}b"]},
            })
        out["convs"] = convs
        out["fc0"] = {**params["fc0"], "u": new_state["u"]["fc0"]}
        out["fc1"] = {**params["fc1"], "u": new_state["u"]["fc1"]}
    return out


def merge_sequential_bn(params: Params, st_first: Params, st_second: Params,
                        cfg: DiscriminatorVGGConfig, momentum: float = 0.9) -> Params:
    """Fold two train-forward BN updates as if applied sequentially.

    Torch updates running stats on every forward: after D(real) then D(fake),
    new = m·(m·old + (1−m)·real) + (1−m)·fake. Both our updates were computed
    against the SAME old stats (u_i = m·old + (1−m)·batch_i), so the sequential
    result is m·u1 + (u2 − m·old)."""
    if not (cfg.use_bn and "bn" in st_first and "bn" in st_second):
        return apply_state_updates(params, st_second, cfg)
    out = dict(params)
    bns = []
    for old, u1, u2 in zip(params["bn"], st_first["bn"], st_second["bn"]):
        entry = {}
        for side in ("a", "b"):
            if old[side] is None:
                entry[side] = None
            elif side in u1 and side in u2:
                merged = {
                    k: momentum * u1[side][k] + (u2[side][k] - momentum * old[side][k])
                    for k in ("mean", "var")
                }
                entry[side] = {**old[side], **merged}
            else:
                entry[side] = old[side]
        bns.append(entry)
    out["bn"] = bns
    if cfg.spectral_norm and "u" in st_second:
        out = apply_state_updates(out, {"u": st_second["u"]}, cfg)
    return out
