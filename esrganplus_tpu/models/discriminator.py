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
    # early-stage plane kernels (kernels/stage_ct.py) for the ≤128-channel
    # stages: 'auto' (bf16 on TPU), 'pallas' (forced; interpret on CPU), 'xla'
    stage_kernel: str = "auto"

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


def _use_pallas_stages(cfg: DiscriminatorVGGConfig, dtype, h: int,
                       w: int) -> int:
    """Number of leading D stages (conv-a + conv-b pairs) to run in the
    plane kernels. MEASURED DEAD END on v5e (round 5, NOTES_ROUND5.md):
    XLA runs the full D stack at 0.54/1.97 ms fwd / fwd+bwd (batch 16,
    128², bf16) and the plane kernels lose at every stripe size (best
    1.01/3.22) — the per-conv im-buffer/extraction VPU overhead exceeds
    the ≤128-channel lane-ceiling penalty it recovers. 'auto' therefore
    resolves to XLA; 'pallas' forces the kernels (kept for tests and for
    hardware where the tradeoff may flip). SN always stays on XLA."""
    if cfg.stage_kernel != "pallas" or cfg.spectral_norm:
        return 0
    if cfg.act_type != "leakyrelu":
        return 0  # the plane path hardcodes the lrelu gate
    if h % 4 or w % 4:
        return 0
    del dtype
    return sum(1 for c in cfg.stage_channels[:2] if c <= 128)


def _batchnorm_planes(planes, p, train: bool, momentum: float = 0.9,
                      eps: float = 1e-5):
    """Plane-layout twin of ``layers.batchnorm`` (torch semantics: biased
    var for normalisation, unbiased for the running update). Stats pool
    over all P planes (rows = channels, lanes = pixels) in f32."""
    f32 = jnp.float32
    dt = planes[0].dtype
    n = len(planes) * planes[0].shape[1]
    s1 = sum(jnp.sum(pl.astype(f32), axis=1) for pl in planes)
    if train:
        s2 = sum(jnp.sum(jnp.square(pl.astype(f32)), axis=1) for pl in planes)
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (momentum * p["mean"] + (1 - momentum) * mean).astype(p["mean"].dtype),
            "var": (momentum * p["var"] + (1 - momentum) * unbiased).astype(p["var"].dtype),
        }
    else:
        mean, var = p["mean"].astype(f32), p["var"].astype(f32)
        new_stats = {"mean": p["mean"], "var": p["var"]}
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(f32)
    shift = p["bias"].astype(f32) - mean * inv
    outs = [(pl.astype(f32) * inv[:, None] + shift[:, None]).astype(dt)
            for pl in planes]
    return outs, new_stats


def _early_stages_pallas(params: Params, x: jnp.ndarray,
                         cfg: DiscriminatorVGGConfig, n_pal: int,
                         train: bool, dtype):
    """Stages 0..n_pal-1 in the plane layout: conv-a (s1) → BN → lrelu →
    conv-b (4×4 s2 phase decimation) → BN → lrelu. Convs run the custom-VJP
    kernels (weights cross in master f32); BN/lrelu ride XLA on the plane
    arrays (train-mode BN needs the full-tensor reduction anyway). Returns
    (NHWC activations, bn update dicts)."""
    from esrganplus_tpu.kernels.stage_ct import (
        conv_s1_ct_diff, conv_s2_ct_diff, nhwc_to_planes, pad_rows_planes,
        pad_w_cin, planes_to_nhwc, prepare_conv4s2_ct, prepare_convxp_ct)

    interp = jax.default_backend() == "cpu"
    b, H, W, _ = x.shape
    P = 4
    kdt = dtype if dtype is not None else x.dtype
    slope = cfg.act_slope
    lrelu = lambda pls: [jnp.where(t >= 0, t, t * slope) for t in pls]
    planes = nhwc_to_planes(x.astype(kdt), P)
    hh, ww = H, W // P
    cin = cfg.in_nc
    bn_updates = []
    for i in range(n_pal):
        stage = params["convs"][i]
        cout = cfg.stage_channels[i]
        upd = {}
        w_conv, c_eff = stage["a"]["w"], cin
        if cin < 8:  # Mosaic needs ≥8 sublanes through the lane shifts
            planes = pad_rows_planes(planes, 8)
            w_conv, c_eff = pad_w_cin(w_conv, 8), 8
        wm, bias = prepare_convxp_ct(w_conv, stage["a"]["b"], P,
                                     dtype=jnp.float32)
        planes = conv_s1_ct_diff(planes, wm, bias, C=c_eff, CO=cout, P=P,
                                 h=hh, w=ww, n_img=b, act=None,
                                 slope=slope, interpret=interp)
        if cfg.use_bn and params["bn"][i]["a"] is not None:
            planes, upd["a"] = _batchnorm_planes(planes, params["bn"][i]["a"],
                                                 train)
        planes = lrelu(planes)
        wm2, bias2 = prepare_conv4s2_ct(stage["b"]["w"], stage["b"]["b"], P,
                                        dtype=jnp.float32)
        planes = conv_s2_ct_diff(planes, wm2, bias2, C=cout, CO=cout, P=P,
                                 h=hh, w=ww, n_img=b, act=None,
                                 slope=slope, interpret=interp)
        P, hh = P // 2, hh // 2
        if cfg.use_bn:
            planes, upd["b"] = _batchnorm_planes(planes, params["bn"][i]["b"],
                                                 train)
        planes = lrelu(planes)
        bn_updates.append(upd)
        cin = cout
    return planes_to_nhwc(planes, b, hh, ww), bn_updates


def discriminator_forward(params: Params, x: jnp.ndarray, cfg: DiscriminatorVGGConfig,
                          train: bool = False, dtype=None):
    """Returns (logits [B, 1], new_state) where new_state carries updated BN
    running stats (train mode) or SN power-iteration vectors.

    On TPU in bf16 the ≤128-channel stages 0-1 run through the plane-layout
    stage kernels (``kernels/stage_ct.py``, custom VJPs); deeper stages and
    the classifier stay on XLA (near the MXU roof there — round-5 probe,
    incl. a measured dead end: reordering the NCHW flatten saves nothing)."""
    a = lambda t: act(t, cfg.act_type, cfg.act_slope)
    new_state: Params = {}

    def apply_conv(h, p, stride, pad, name):
        if cfg.spectral_norm:
            w_bar, u = _sn_weight(p, cfg.sn_power_iters)
            new_state.setdefault("u", {})[name] = u
            p = {**p, "w": w_bar}
        return conv2d(h, p, stride=stride, pad=pad, dtype=dtype)

    n_pal = _use_pallas_stages(cfg, dtype, x.shape[1], x.shape[2])
    h = x
    bn_updates = []
    if n_pal:
        h, bn_updates = _early_stages_pallas(params, x, cfg, n_pal, train,
                                             dtype)
    for i, stage in enumerate(params["convs"][n_pal:], start=n_pal):
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
