"""RRDB generator family (ESRGAN / ESRGAN+ / nESRGAN+ / Tarsier backbone).

Graph parity with the reference (``codes/models/modules/block.py:232-291``,
``architecture.py:47-78``; test_image variant ``test_image/block.py:200-256``), but
built TPU-first:

  * NHWC activations, HWIO weights, fp32 accumulation, optional bf16 compute;
  * the 23 homogeneous RRDB blocks are parameter-stacked and run under
    ``jax.lax.scan`` — one compiled block body instead of 414 unrolled convs, which
    keeps compile time and HLO size flat in depth (set ``unroll`` >1 to trade
    compile time back for schedule freedom);
  * nESRGAN+ Gaussian noise uses explicit JAX PRNG keys, split per block inside the
    scan, so training is bitwise reproducible under pjit.

ESRGAN+ specifics mirrored exactly: the bias-free 1×1 dense shortcut into x2, the
x4 = conv4(cat) + x2 residual, β=0.2 scaling on both RDB and RRDB residuals, and
noise sites configurable per-RDB (both reference variants) and per-RRDB
(``test_image/block.py:256`` only).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from esrganplus_tpu.kernels.vmem import VMEM_GATE_BYTES
from esrganplus_tpu.models.layers import (
    Params,
    act,
    conv2d,
    gaussian_noise,
    kaiming_conv_init,
    pixel_shuffle,
    upsample_nearest,
)


@dataclasses.dataclass(frozen=True)
class RRDBNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    upscale: int = 4
    act_type: str = "leakyrelu"
    act_slope: float = 0.2
    # ESRGAN+ 1×1 dense shortcut (reference block.py:153-154,263). False gives the
    # vanilla-ESRGAN RDB graph.
    conv1x1: bool = True
    # Noise sites: per-RDB (both reference variants, block.py:268) and per-RRDB
    # (test_image/block.py:256 only).
    rdb_noise: bool = True
    rrdb_noise: bool = False
    noise_sigma: float = 0.1
    noise_relative_detach: bool = False
    res_scale: float = 0.2
    # Trunk unroll over the nb blocks. 0 = auto: TPU training through the
    # Pallas trunk fully Python-unrolls (a scanned trunk pays ~3-4 ms/step
    # in residual stack/unstack DUS copies; straight-line SSA avoids them —
    # PSNR step 23.9 → 20.8 ms on v5e, one ~2.5 min XLA compile amortised
    # by the persistent cache), everything else scans with unroll=1. An
    # explicit n ≥ nb forces the Python unroll; 1 ≤ n < nb is the lax.scan
    # unroll factor.
    unroll: int = 0
    # Fused "by-source" RDB formulation (see _rdb_forward_fused): mathematically
    # identical weight regrouping that widens conv output channels from 32 to
    # 96-224 so the MXU's 128 lanes aren't 75% idle. Parity-tested vs the naive
    # graph; disable to run the literal reference dataflow.
    fused: bool = True
    # Trunk execution path: "auto" uses the column-merged transposed Pallas
    # RDB kernel (kernels/rdb_ct.py — ~2.3x the XLA trunk on v5e; custom-VJP
    # pair for training) for bf16 on TPU when the working set fits VMEM, and
    # the XLA graph otherwise (fp32 checkpoint-parity, CPU). "xla" /
    # "pallas" force a path.
    trunk_kernel: str = "auto"
    # Upsample-tail path for inference: "auto" keeps the trunk's [C, pixels]
    # layout through up1/up2/hr0/hr1 via the column-phase-plane kernels
    # (kernels/tail_ct.py) whenever the Pallas trunk is active and the tail
    # is the standard ×2ⁿ leakyrelu topology; "xla" forces the NHWC graph.
    tail_kernel: str = "auto"
    # nESRGAN+ noise application site for the Pallas trunk:
    #  - "input" (default): XLA pre-draws the per-site noise tensor and the
    #    RDB kernel applies the relative-noise multiply in its epilogue
    #    (backward scales the cotangent at load). Same values as "xla"
    #    bit-for-bit under threefry keys (NHWC draw order kept); under rbg
    #    the draw happens directly in the kernel's [nf, M] layout (no
    #    replay contract → free to skip the gather-transpose; 0.4 ms/step
    #    faster on v5e). Works on CPU/interpret too.
    #  - "xla": out = x·(1+σn) as XLA fusions between kernel calls
    #    (bitwise-reproducible reference path).
    #  - "fused": in-kernel pltpu hardware PRNG with bit-replaying VJP —
    #    measured SLOWER (Box-Muller's log/cos on the VPU costs more than
    #    the rbg fusions, and the backward replay pays it twice; kept as
    #    validated opt-in infrastructure, see NOTES_ROUND3.md).
    noise_kernel: str = "input"

    @property
    def n_upscale_stages(self) -> int:
        if self.upscale == 3:
            return 1
        return int(round(math.log2(self.upscale))) if self.upscale > 1 else 0


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_rdb(key, cfg: RRDBNetConfig, scale: float, dtype) -> Params:
    nf, gc = cfg.nf, cfg.gc
    ks = jax.random.split(key, 6)
    p = {
        "conv1": kaiming_conv_init(ks[0], 3, 3, nf, gc, scale, dtype=dtype),
        "conv2": kaiming_conv_init(ks[1], 3, 3, nf + gc, gc, scale, dtype=dtype),
        "conv3": kaiming_conv_init(ks[2], 3, 3, nf + 2 * gc, gc, scale, dtype=dtype),
        "conv4": kaiming_conv_init(ks[3], 3, 3, nf + 3 * gc, gc, scale, dtype=dtype),
        "conv5": kaiming_conv_init(ks[4], 3, 3, nf + 4 * gc, nf, scale, dtype=dtype),
    }
    if cfg.conv1x1:
        # Bias-free 1×1, out channels = gc (shortcut lands on x2 which has gc chans).
        p["conv1x1"] = kaiming_conv_init(ks[5], 1, 1, nf, gc, scale, bias=False, dtype=dtype)
    return p


def init_rrdbnet(key, cfg: RRDBNetConfig, init_scale: float = 0.1, dtype=jnp.float32) -> Params:
    """Parameter pytree; the ``trunk`` subtree is stacked over the nb blocks."""
    n_keys = 5 + cfg.n_upscale_stages
    keys = jax.random.split(key, n_keys)
    block_keys = jax.random.split(keys[0], cfg.nb * 3).reshape(cfg.nb, 3, -1)

    def one_rrdb(ks3):
        return {
            "rdb1": _init_rdb(ks3[0], cfg, init_scale, dtype),
            "rdb2": _init_rdb(ks3[1], cfg, init_scale, dtype),
            "rdb3": _init_rdb(ks3[2], cfg, init_scale, dtype),
        }

    trunk = jax.vmap(one_rrdb)(block_keys)

    params: Params = {
        "fea_conv": kaiming_conv_init(keys[1], 3, 3, cfg.in_nc, cfg.nf, init_scale, dtype=dtype),
        "trunk": trunk,
        "trunk_conv": kaiming_conv_init(keys[2], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "hr_conv0": kaiming_conv_init(keys[3], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "hr_conv1": kaiming_conv_init(keys[4], 3, 3, cfg.nf, cfg.out_nc, init_scale, dtype=dtype),
    }
    params["upconvs"] = [
        kaiming_conv_init(keys[5 + i], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype)
        for i in range(cfg.n_upscale_stages)
    ]
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rdb_forward(x, p: Params, cfg: RRDBNetConfig, key, train: bool, dtype):
    """Residual dense block with ESRGAN+'s two extra residual paths."""
    a = lambda t: act(t, cfg.act_type, cfg.act_slope)
    x1 = a(conv2d(x, p["conv1"], dtype=dtype))
    x2 = a(conv2d(jnp.concatenate([x, x1], -1), p["conv2"], dtype=dtype))
    if cfg.conv1x1:
        x2 = x2 + conv2d(x, p["conv1x1"], dtype=dtype)
    x3 = a(conv2d(jnp.concatenate([x, x1, x2], -1), p["conv3"], dtype=dtype))
    x4 = a(conv2d(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"], dtype=dtype)) + x2
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"], dtype=dtype)
    out = x5 * cfg.res_scale + x
    if train and cfg.rdb_noise and cfg.noise_sigma > 0:
        out = gaussian_noise(out, key, cfg.noise_sigma, cfg.noise_relative_detach)
    return out


def _rdb_forward_fused(x, p: Params, cfg: RRDBNetConfig, key, train: bool, dtype):
    """By-source reformulation of the RDB — identical math, MXU-shaped.

    The naive dataflow runs five convs whose output widths are gc=32 (final one
    nf=64) against the MXU's 128 lanes: ≤25% lane utilisation. Observing that a
    conv over ``concat(a, b)`` equals ``conv(a, Wa) + conv(b, Wb)``, we regroup
    the SAME weights by *input source* instead of by *target*: each intermediate
    tensor does one wide conv producing its contributions to every later target
    (widths 224/160/128/96/64 for nf=64, gc=32), and targets are formed by
    summing contributions. The ESRGAN+ 1×1 shortcut rides along as zero-padded
    3×3 taps appended to the first conv (its lane tile was padding anyway), and
    is added after t2's activation exactly like the reference graph.
    """
    nf, gc = cfg.nf, cfg.gc
    a = lambda t: act(t, cfg.act_type, cfg.act_slope)

    # Per-source output layout, DESCENDING targets: [t5 (nf) | t4 | t3 | … | 1×1].
    # Two properties matter for the TPU: (a) the heavy five-way x5 accumulation
    # reads offset-0, 128-aligned slices everywhere; (b) target t_i sits at the
    # SAME lane offset nf+(4-i)·gc in every source's output, so the assembly
    # adds combine equal-offset tiles — no per-operand lane rotate (the profiler
    # showed those rotates costing ~1 ms per RDB). Biases ride along in the
    # first conv's bias vector (matching its layout); tail convs are bias-free.
    def off(i):  # lane offset of target t_i (i in 1..4) in any source's output
        return nf + (4 - i) * gc

    def src_w(lo, width, tail_targets):
        return jnp.concatenate(
            [p["conv5"]["w"][:, :, lo:lo + width, :]]
            + [p[f"conv{t}"]["w"][:, :, lo:lo + width, :] for t in tail_targets],
            axis=-1)

    parts = [src_w(0, nf, (4, 3, 2, 1))]
    if cfg.conv1x1:
        parts.append(jnp.pad(p["conv1x1"]["w"], ((1, 1), (1, 1), (0, 0), (0, 0))))
    w_x = jnp.concatenate(parts, axis=-1)
    b_x = jnp.concatenate(
        [p["conv5"]["b"]] + [p[f"conv{t}"]["b"] for t in (4, 3, 2, 1)]
        + ([jnp.zeros((gc,), p["conv5"]["b"].dtype)] if cfg.conv1x1 else []))

    def tail_w(src_idx):
        lo = nf + (src_idx - 1) * gc
        return src_w(lo, gc, tuple(range(4, src_idx, -1)))

    cx = conv2d(x, {"w": w_x, "b": b_x}, dtype=dtype)
    x1 = a(cx[..., off(1):off(1) + gc])
    cx1 = conv2d(x1, {"w": tail_w(1)}, dtype=dtype)
    x2 = a(cx[..., off(2):off(2) + gc] + cx1[..., off(2):off(2) + gc])
    if cfg.conv1x1:
        x2 = x2 + cx[..., nf + 4 * gc:]
    cx2 = conv2d(x2, {"w": tail_w(2)}, dtype=dtype)
    x3 = a(cx[..., off(3):off(3) + gc] + cx1[..., off(3):off(3) + gc]
           + cx2[..., off(3):off(3) + gc])
    cx3 = conv2d(x3, {"w": tail_w(3)}, dtype=dtype)
    x4 = a(cx[..., off(4):off(4) + gc] + cx1[..., off(4):off(4) + gc]
           + cx2[..., off(4):off(4) + gc] + cx3[..., off(4):off(4) + gc]) + x2
    cx4 = conv2d(x4, {"w": tail_w(4)}, dtype=dtype)
    x5 = cx[..., :nf] + cx1[..., :nf] + cx2[..., :nf] + cx3[..., :nf] + cx4
    out = x5 * cfg.res_scale + x
    if train and cfg.rdb_noise and cfg.noise_sigma > 0:
        out = gaussian_noise(out, key, cfg.noise_sigma, cfg.noise_relative_detach)
    return out


def _rrdb_forward(x, p: Params, cfg: RRDBNetConfig, key, train: bool, dtype):
    rdb = _rdb_forward_fused if cfg.fused else _rdb_forward
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = rdb(x, p["rdb1"], cfg, k1, train, dtype)
    h = rdb(h, p["rdb2"], cfg, k2, train, dtype)
    h = rdb(h, p["rdb3"], cfg, k3, train, dtype)
    out = h * cfg.res_scale + x
    if train and cfg.rrdb_noise and cfg.noise_sigma > 0:
        out = gaussian_noise(out, key=k4, sigma=cfg.noise_sigma,
                             relative_detach=cfg.noise_relative_detach)
    return out


def _use_pallas_trunk(cfg: RRDBNetConfig, train: bool, dtype, h: int, w: int) -> bool:
    if cfg.trunk_kernel == "xla":
        return False
    if cfg.trunk_kernel == "pallas":
        return True
    # auto: bf16 on a real TPU backend, working set within VMEM. Both paths
    # run the column-merged kernel (kernels/rdb_ct.py); training's custom-VJP
    # backward additionally holds the f32 dIM3 scratch (2+4 bytes per IM3
    # element). The largest f32 transient either way is a [3·nf, M] partial.
    if dtype != jnp.bfloat16 or jax.default_backend() == "cpu":
        return False
    per_el = 6 if train else 2
    im3_bytes = (3 * (cfg.nf + 4 * cfg.gc) * h * w * per_el
                 + 3 * cfg.nf * h * w * 4)
    return im3_bytes <= VMEM_GATE_BYTES


def _use_pallas_tail(cfg: RRDBNetConfig) -> bool:
    """Gate for the transposed-layout tail (inference, after a Pallas trunk):
    ×2ⁿ nearest-upconv topology with leakyrelu — the standard RRDBNet tail."""
    if cfg.tail_kernel == "xla":
        return False
    return cfg.upscale in (2, 4) and cfg.act_type == "leakyrelu"


# ---------------------------------------------------------------------------
# prepared-trunk master format ("trunk_ct")
# ---------------------------------------------------------------------------
#
# Training through the Pallas trunk re-derives the kernel-layout weight
# matrices from the canonical HWIO pytree EVERY step (slice/transpose/concat
# per conv, traced into the jit), and autodiff pays the transposed chain again
# to map dW back — ~0.7-1.0 ms/step of pure relayout at flagship shape
# (round-4 trace: rdb_ct.py:77-78 plus the dW un-prepare copies). Trainers can
# instead keep the f32 MASTERS in the kernel layout: `prep_trunk_ct` replaces
# the "trunk"/"trunk_conv" subtrees with the prepared matrices, the forward
# consumes them directly, Adam updates them elementwise (a permutation of the
# canonical update), and `unprep_trunk_ct` restores the canonical pytree at
# checkpoint-export/eval-fallback boundaries. The only asymmetry: the stage-2
# matrix embeds structural zeros (the 1×1-shortcut rows are only live on x's
# center-tap columns), whose kernel dW is NOT zero — `mask_trunk_ct_grads`
# zeroes them so the masked prepared update stays exactly the canonical one.


def prep_trunk_ct(params: Params, cfg: RRDBNetConfig) -> Params:
    """Canonical RRDBNet params → prepared-master params (trunk in the
    kernel's column-merged layout; see module comment above)."""
    from esrganplus_tpu.kernels.rdb_ct import (prepare_conv_ct_weights,
                                               prepare_rdb_ct_weights)

    if "trunk_ct" in params:
        return params

    def prep(rdb_p):
        return prepare_rdb_ct_weights(rdb_p, cfg.nf, cfg.gc, cfg.conv1x1,
                                      dtype=jnp.float32)

    trunk_ct: Params = {k: jax.vmap(prep)(params["trunk"][k])
                        for k in ("rdb1", "rdb2", "rdb3")}
    wm, bm = prepare_conv_ct_weights(params["trunk_conv"]["w"],
                                     params["trunk_conv"].get("b"),
                                     dtype=jnp.float32)
    trunk_ct["lr_conv"] = {"w": wm} if bm is None else {"w": wm, "b": bm}
    out = {k: v for k, v in params.items() if k not in ("trunk", "trunk_conv")}
    out["trunk_ct"] = trunk_ct
    return out


def _unprep_rdb_ct(mats, cfg: RRDBNetConfig) -> Params:
    """Exact inverse of ``prepare_rdb_ct_weights`` for one (unstacked) RDB."""
    nf, gc = cfg.nf, cfg.gc
    w1, w2, w3, w4, w5, bias = mats
    bias = bias.reshape(-1).astype(jnp.float32)
    sizes = {5: nf, 4: gc, 3: gc, 2: gc, 1: gc}   # packed (b5|b4|b3|b2|b1)
    biases, off = {}, 0
    for k in (5, 4, 3, 2, 1):
        biases[k] = bias[off:off + sizes[k]]
        off += sizes[k]
    rdb: Params = {}
    for k, m in ((1, w1), (2, w2), (3, w3), (4, w4), (5, w5)):
        s = nf if k == 5 else gc
        if k == 2:
            extra, m = m[3 * s:], m[:3 * s]
            if cfg.conv1x1:
                rdb["conv1x1"] = {
                    "w": extra[:, nf:2 * nf].T.reshape(1, 1, nf, gc)
                           .astype(jnp.float32)}
        srcs = [nf] + [gc] * (k - 1)
        blocks, coff = [], 0
        for c in srcs:
            blk = m[:, coff:coff + 3 * c].reshape(3, s, 3, c)
            blocks.append(blk.transpose(2, 0, 3, 1))        # [r, s, c, S]
            coff += 3 * c
        rdb[f"conv{k}"] = {"w": jnp.concatenate(blocks, axis=2).astype(jnp.float32),
                           "b": biases[k]}
    return rdb


def unprep_trunk_ct(params: Params, cfg: RRDBNetConfig) -> Params:
    """Prepared-master params → canonical pytree (inverse of prep_trunk_ct)."""
    if "trunk_ct" not in params:
        return params
    ct = params["trunk_ct"]
    trunk = {k: jax.vmap(lambda m: _unprep_rdb_ct(m, cfg))(ct[k])
             for k in ("rdb1", "rdb2", "rdb3")}
    wm = ct["lr_conv"]["w"]                     # [3·nf, 3·nf]
    w = wm.reshape(3, cfg.nf, 3, cfg.nf).transpose(2, 0, 3, 1).astype(jnp.float32)
    trunk_conv: Params = {"w": w}
    if "b" in ct["lr_conv"]:
        trunk_conv["b"] = ct["lr_conv"]["b"].reshape(-1).astype(jnp.float32)
    out = {k: v for k, v in params.items() if k != "trunk_ct"}
    out["trunk"] = trunk
    out["trunk_conv"] = trunk_conv
    return out


@functools.lru_cache(maxsize=8)
def _trunk_ct_w2_mask(nf: int, gc: int, conv1x1: bool):
    """Support mask for the stage-2 prepared matrix's 1×1-shortcut rows.

    Returns a HOST numpy array: a jnp constant here would be memoised across
    traces and leak the first trace's tracer into later jits."""
    import numpy as np

    mask = np.ones((3 * gc + gc, 3 * (nf + gc)), np.float32)
    mask[3 * gc:] = 0.0
    if conv1x1:
        mask[3 * gc:, nf:2 * nf] = 1.0          # x's center-tap columns
    return mask


def mask_trunk_ct_grads(grads: Params, cfg: RRDBNetConfig) -> Params:
    """Zero the structurally-dead entries of prepared-trunk gradients (the
    kernel's dW is dense over the stage-2 shortcut rows; canonical autodiff
    only ever sees their live center-tap block)."""
    if "trunk_ct" not in grads:
        return grads
    mask = _trunk_ct_w2_mask(cfg.nf, cfg.gc, cfg.conv1x1)
    ct = dict(grads["trunk_ct"])
    for k in ("rdb1", "rdb2", "rdb3"):
        mats = list(ct[k])
        mats[1] = mats[1] * mask                # w2, broadcast over nb
        ct[k] = tuple(mats)
    out = {kk: vv for kk, vv in grads.items() if kk != "trunk_ct"}
    out["trunk_ct"] = ct
    return out


def prep_trunk_static(cfg, dtype) -> bool:
    """Shape-independent half of the prepared-trunk gate: True iff every
    train/eval forward at supported sizes will take the Pallas trunk AND the
    Pallas tail (the plane path end-to-end). Oversized inputs still work via
    the unprep fallback in ``rrdbnet_forward``."""
    if not isinstance(cfg, RRDBNetConfig):
        return False
    if cfg.trunk_kernel == "xla" or not _use_pallas_tail(cfg):
        return False
    if cfg.trunk_kernel == "pallas":
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() != "cpu"


def _tail_pallas(params: Params, xt: jnp.ndarray, cfg: RRDBNetConfig, kdt,
                 b: int, h: int, w: int, train: bool = False) -> jnp.ndarray:
    """[nf, B·h·w] trunk output → NHWC f32 SR image via the column-phase
    tail kernels (kernels/tail_ct.py): fused nearest-×2+conv+lrelu stages,
    then hr_conv0+hr_conv1 in one kernel. Channels never touch the lane
    dimension, no pixel-shuffle relayouts of 64-channel HR tensors.

    ``train`` switches to the custom-VJP pairs (weights prepared in master
    f32, cast at the kernel boundary, f32 gradient accumulation) — the
    whole tail backward stays in the plane layout, eliminating hr_conv1's
    lane-padded XLA dW (0.81 ms/step) and the NHWC relayout glue."""
    from esrganplus_tpu.kernels.tail_ct import (
        conv_hr_ct,
        conv_hr_ct_diff,
        prepare_convxp_ct,
        prepare_upfold_ct,
        unphase_columns,
        upfold_ct,
        upfold_ct_diff,
    )

    interp = jax.default_backend() == "cpu"
    wdt = jnp.float32 if train else kdt
    up_fn = upfold_ct_diff if train else upfold_ct
    hr_fn = conv_hr_ct_diff if train else conv_hr_ct
    planes = [xt]                           # P=1 plane [nf, B·h·w]
    P, H, packed = 1, h, False
    for up in params["upconvs"]:
        wd, bias = prepare_upfold_ct(up["w"], up["b"], P, dtype=wdt)
        planes = up_fn(planes, wd, bias, C=cfg.nf, P=P, h=H, w=w,
                       n_img=b, slope=cfg.act_slope, packed_in=packed,
                       interpret=interp)
        P, H, packed = 2 * P, 2 * H, True   # y-phases stay row-packed
    wm0, b0 = prepare_convxp_ct(params["hr_conv0"]["w"],
                                params["hr_conv0"]["b"], P, dtype=wdt)
    wm1, b1 = prepare_convxp_ct(params["hr_conv1"]["w"],
                                params["hr_conv1"]["b"], P, dtype=wdt)
    planes = hr_fn(planes, wm0, b0, wm1, b1, C=cfg.nf, P=P,
                   CO2=cfg.out_nc, h=H, w=w, n_img=b,
                   slope=cfg.act_slope, packed_in=packed,
                   interpret=interp)
    return unphase_columns(planes, b, H, w).astype(jnp.float32)


def _trunk_pallas(trunk_params: Optional[Params], fea: jnp.ndarray,
                  cfg: RRDBNetConfig, dtype, *, train: bool = False,
                  block_keys=None, trunk_conv: Optional[Params] = None,
                  as_planes: bool = False,
                  prepped: Optional[Params] = None) -> jnp.ndarray:
    """Run the nb-RRDB trunk through the fused transposed RDB kernel.

    Training uses the custom-VJP variant (weights crossing the boundary in
    master f32 so gradients accumulate at full precision) and applies the
    nESRGAN+ noise sites between kernel calls with the SAME key schedule and
    NHWC draw order as the XLA path, so switching paths never changes the
    noise realisation."""
    from esrganplus_tpu.kernels.rdb_ct import (conv3x3_ct, conv3x3_ct_diff,
                                               prepare_conv_ct_weights,
                                               prepare_rdb_ct_weights, rdb_ct,
                                               rdb_ct_diff)

    b, h, w, nf = fea.shape
    interp = jax.default_backend() == "cpu"
    kdt = dtype if dtype is not None else fea.dtype
    wdt = jnp.float32 if train else kdt

    if prepped is not None:
        # masters already live in the kernel layout (prep_trunk_ct): f32 for
        # training (the diff kernels cast at the boundary), one contiguous
        # cast per matrix for inference — no per-step slice/transpose/concat
        def to_wdt(mats):
            *w, bias = mats
            return tuple([a if a.dtype == wdt else a.astype(wdt) for a in w]
                         + [bias])

        ws = {k: to_wdt(prepped[k]) for k in ("rdb1", "rdb2", "rdb3")}
    else:
        def prep(rdb_p):
            return prepare_rdb_ct_weights(rdb_p, cfg.nf, cfg.gc, cfg.conv1x1,
                                          dtype=wdt)

        ws = {k: jax.vmap(prep)(trunk_params[k]) for k in ("rdb1", "rdb2", "rdb3")}
    # image-major lane packing [nf, B·H·W] — the kernel groups as many images
    # per grid step as VMEM allows (whole batch at training crop sizes)
    xt = fea.astype(kdt).transpose(3, 0, 1, 2).reshape(nf, b * h * w)
    noisy = train and cfg.noise_sigma > 0
    if block_keys is None:
        block_keys = jax.random.split(jax.random.PRNGKey(0), cfg.nb)

    def apply_noise(ht, key):
        n = jax.random.normal(key, (b, h, w, nf), ht.dtype)
        nt = n.transpose(3, 0, 1, 2).reshape(nf, b * h * w)
        scale = cfg.noise_sigma * (
            jax.lax.stop_gradient(ht) if cfg.noise_relative_detach else ht)
        return ht + nt * scale

    # In-kernel hardware-RNG noise for the per-RDB sites (opt-in via
    # cfg.noise_kernel="fused" — measured slower than the XLA rbg fusions,
    # see the config field note). Only under the non-reproducible "rbg"
    # contract — threefry keys keep the XLA draw for bitwise replay — and
    # only on a real TPU (pltpu.prng has no interpret-mode lowering).
    try:
        key_impl = str(jax.random.key_impl(block_keys))
    except Exception:
        key_impl = "threefry2x32"
    fused_noise = (noisy and cfg.rdb_noise and not interp
                   and cfg.noise_kernel == "fused"
                   and not key_impl.startswith("threefry"))
    # "input" mode: XLA pre-draws the per-site noise (same key schedule and
    # NHWC draw order as the XLA path — bit-identical realisation, any key
    # impl, works in interpret mode) and the kernel applies the relative-
    # noise multiply in its epilogue; the backward scales the cotangent at
    # load. Saves the out=x·(1+σn) HBM round trip and its adjoint fusion.
    input_noise = (noisy and cfg.rdb_noise and cfg.noise_kernel == "input")

    def site_seed(key):
        kd = jax.random.key_data(key).reshape(-1)[:2]
        return jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)

    kw = dict(nf=cfg.nf, gc=cfg.gc, h=h, w=w, n_img=b, slope=cfg.act_slope,
              res_scale=cfg.res_scale, interpret=interp)
    # software-pipeline several images per grid step when the batch and VMEM
    # allow (kernels/rdb_ct.py — measured on v5e: il=4 clearly best at crop
    # shapes, il=4 ≈ il=2 at 128² bench shape; the VMEM check drops il
    # automatically as the per-image working set grows)
    im3_il1 = 3 * (cfg.nf + 4 * cfg.gc) * h * w * 2 + 3 * cfg.nf * h * w * 4
    il = 1
    for cand in (4, 2):
        if b % cand == 0 and cand * im3_il1 <= VMEM_GATE_BYTES:
            il = cand
            break

    def body(hcur, xs):
        ws3, key = xs
        h0 = hcur
        if not train:
            # inference: fold the RRDB epilogue out·β + h0 into rdb3's kernel
            hcur = rdb_ct(hcur, *ws3["rdb1"], interleave=il, **kw)
            hcur = rdb_ct(hcur, *ws3["rdb2"], interleave=il, **kw)
            return rdb_ct(hcur, *ws3["rdb3"], h0, rrdb_scale=cfg.res_scale,
                          interleave=il, alias_res=True, **kw), None
        ks = jax.random.split(key, 4)
        for i, name in enumerate(("rdb1", "rdb2", "rdb3")):
            if fused_noise:
                hcur = rdb_ct_diff(hcur, *ws3[name], fwd_interleave=il,
                                   bwd_pack=il, noise_seed=site_seed(ks[i]),
                                   noise_sigma=float(cfg.noise_sigma),
                                   noise_detach=cfg.noise_relative_detach,
                                   **kw)
                continue
            if input_noise:
                if key_impl.startswith("threefry"):
                    # reproducibility contract: same NHWC draw order as the
                    # XLA path → bit-identical realisation
                    n = jax.random.normal(ks[i], (b, h, w, nf), hcur.dtype)
                    nt = n.transpose(3, 0, 1, 2).reshape(nf, b * h * w)
                else:
                    # rbg (no replay contract): draw straight in the kernel
                    # layout — skips the gather-transpose fusion
                    nt = jax.random.normal(ks[i], (nf, b * h * w), hcur.dtype)
                hcur = rdb_ct_diff(hcur, *ws3[name], fwd_interleave=il,
                                   bwd_pack=il, noise_seed=nt,
                                   noise_sigma=float(cfg.noise_sigma),
                                   noise_detach=cfg.noise_relative_detach,
                                   noise_input=True, **kw)
                continue
            hcur = rdb_ct_diff(hcur, *ws3[name], fwd_interleave=il,
                               bwd_pack=il, **kw)
            if noisy and cfg.rdb_noise:
                hcur = apply_noise(hcur, ks[i])
        out = hcur * jnp.asarray(cfg.res_scale, kdt) + h0
        if noisy and cfg.rrdb_noise:
            out = apply_noise(out, ks[3])
        return out, None

    # unroll=0 "auto" unrolls on TPU only (interpret-mode compile cost);
    # an explicit unroll >= nb forces the Python loop everywhere so the
    # CPU suite can exercise this path too.
    full_unroll = (train and ((cfg.unroll == 0 and not interp)
                              or cfg.unroll >= cfg.nb))
    if full_unroll:
        # full Python unroll for TPU training (unroll=0 "auto" or >= nb): a
        # lax.scan'd trunk pays ~3-4 ms per step in residual stack/unstack
        # DUS copies (x, sv and noise residuals round-trip HBM through the
        # [nb, ...] stacking buffers); straight-line code keeps them as
        # plain SSA values. Measured on v5e @ batch 16 crops: PSNR step
        # 23.9 → 20.8 ms, GAN 28.2. Mosaic compiles dedupe (identical
        # shapes); XLA compile ≈ 2.5 min once, then the persistent cache.
        out = xt
        for ib in range(cfg.nb):
            ws3_ib = jax.tree.map(lambda a: a[ib], ws)
            out, _ = body(out, (ws3_ib, block_keys[ib]))
    else:
        out, _ = jax.lax.scan(body, xt, (ws, block_keys),
                              unroll=max(1, cfg.unroll))
    lrc = None
    if prepped is not None:
        wm = prepped["lr_conv"]["w"]
        lrc = (wm if wm.dtype == wdt else wm.astype(wdt),
               prepped["lr_conv"].get("b"))
    elif trunk_conv is not None:
        lrc = prepare_conv_ct_weights(trunk_conv["w"], trunk_conv.get("b"),
                                      dtype=wdt)
    if lrc is not None:
        # fold the global-residual epilogue fea + conv3x3(trunk) into one
        # more kernel call while everything is still in the [C, M] layout
        # (reference architecture.py:73: ShortcutBlock around trunk+LR_conv);
        # training takes the custom-VJP twin (master-f32 weights, f32 dW)
        wm, bm = lrc
        conv_fn = conv3x3_ct_diff if train else conv3x3_ct
        out = conv_fn(out, wm, bm, xt, cin=nf, cout=nf, h=h, w=w,
                      n_img=b, interleave=il, interpret=interp)
    if as_planes:
        return out                          # stay [nf, B·h·w] for _tail_pallas
    return out.reshape(nf, b, h, w).transpose(1, 2, 3, 0)


def rrdbnet_forward(params: Params, x: jnp.ndarray, cfg: RRDBNetConfig, *,
                    train: bool = False, rng: Optional[jax.Array] = None,
                    dtype=None) -> jnp.ndarray:
    """×``cfg.upscale`` super-resolution of NHWC RGB [0,1] input.

    ``dtype`` selects the compute precision (None = input dtype / fp32 parity
    path; jnp.bfloat16 for throughput). Noise needs ``rng`` when
    ``train=True`` and a noise site is enabled.
    """
    needs_rng = train and cfg.noise_sigma > 0 and (cfg.rdb_noise or cfg.rrdb_noise)
    if needs_rng and rng is None:
        raise ValueError("rrdbnet_forward: train-mode noise needs an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    block_keys = jax.random.split(rng, cfg.nb)

    use_pallas = _use_pallas_trunk(cfg, train, dtype, x.shape[1], x.shape[2])
    prepped = params.get("trunk_ct")
    if prepped is not None and not use_pallas:
        # prepared masters but an input too large for the kernel's VMEM gate
        # (or an explicit xla override): reconstruct the canonical trunk
        # in-graph and take the XLA path — correct, just off the fast path.
        params = unprep_trunk_ct(params, cfg)
        prepped = None

    fea = conv2d(x, params["fea_conv"], dtype=dtype)

    if use_pallas:
        trunk_p = None if prepped is not None else params["trunk"]
        lr_conv = None if prepped is not None else params["trunk_conv"]
        if train:
            tail = _use_pallas_tail(cfg)
            if tail:
                # trunk_conv + global residual folded (custom-VJP conv), then
                # the whole upsample tail — forward AND backward — stays in
                # the plane layout (kernels/tail_ct.py diff pairs).
                out_t = _trunk_pallas(trunk_p, fea, cfg, dtype,
                                      train=True, block_keys=block_keys,
                                      trunk_conv=lr_conv,
                                      as_planes=True, prepped=prepped)
                kdt = dtype if dtype is not None else fea.dtype
                b, h, w = x.shape[0], x.shape[1], x.shape[2]
                return _tail_pallas(params, out_t, cfg, kdt, b, h, w,
                                    train=True)
            if prepped is not None:
                raise ValueError(
                    "prepared-trunk params require the Pallas tail for "
                    "training (prep_trunk_static gates on it)")
            trunk = _trunk_pallas(params["trunk"], fea, cfg, dtype,
                                  train=True, block_keys=block_keys)
            fea = fea + conv2d(trunk, params["trunk_conv"], dtype=dtype)
        else:
            # trunk_conv + global residual folded into the kernel path
            tail = _use_pallas_tail(cfg)
            out_t = _trunk_pallas(trunk_p, fea, cfg, dtype,
                                  train=False, block_keys=block_keys,
                                  trunk_conv=lr_conv,
                                  as_planes=tail, prepped=prepped)
            if tail:
                kdt = dtype if dtype is not None else fea.dtype
                b, h, w = x.shape[0], x.shape[1], x.shape[2]
                return _tail_pallas(params, out_t, cfg, kdt, b, h, w)
            fea = out_t
    else:
        def body(h, xs):
            block_params, key = xs
            return _rrdb_forward(h, block_params, cfg, key, train, dtype), None

        trunk, _ = jax.lax.scan(body, fea, (params["trunk"], block_keys),
                                unroll=max(1, cfg.unroll))
        fea = fea + conv2d(trunk, params["trunk_conv"], dtype=dtype)

    factor = 3 if cfg.upscale == 3 else 2
    for up in params["upconvs"]:
        if cfg.fused:
            # Exact fold of nearest-×f upsample + 3×3 conv into one LR-resolution
            # 3×3 conv with f²-phase-packed outputs + pixel shuffle: each HR
            # output phase reads a fixed LR neighbourhood (nearest-up duplicates
            # pixels), so the HR taps collapse onto LR taps per phase. Same
            # FLOPs, but the conv runs at LR with an f²-wide (MXU-friendly)
            # output and the upsampled intermediate is never materialised.
            fea = act(pixel_shuffle(
                conv2d(fea, _fold_upconv(up, factor), dtype=dtype), factor),
                cfg.act_type, cfg.act_slope)
        else:
            fea = act(conv2d(upsample_nearest(fea, factor), up, dtype=dtype),
                      cfg.act_type, cfg.act_slope)
    fea = act(conv2d(fea, params["hr_conv0"], dtype=dtype), cfg.act_type, cfg.act_slope)
    out = conv2d(fea, params["hr_conv1"], dtype=dtype)
    return out.astype(jnp.float32)


def rrdbnet_activations(params: Params, x: jnp.ndarray, cfg: RRDBNetConfig, *,
                        dtype=None) -> dict:
    """Eval-mode forward returning every named intermediate, for parity
    localisation against a torch reference run (see
    ``tools/dump_torch_activations.py`` for the hook-based twin producing the
    same stage names from the reference net, ``test_image/architecture.py:7-38``).

    Stage names / torch module map (flattened-Sequential indices, SURVEY §2.10):
    ``fea_conv``=model.0, ``rrdb_XX``=model.1.sub.XX, ``trunk``=model.1 output
    (shortcut sum), ``upconv_K``=model.4/model.7 (post-lrelu), ``hr_conv0``=
    model.9 (post-lrelu), ``hr_conv1``=model.10. Always runs the literal XLA
    graph (``fused=False`` semantics are parity-equivalent; the Pallas trunk is
    bypassed) since the point is checkpoint/conversion debugging, not speed.
    """
    acts = {}
    block_keys = jax.random.split(jax.random.PRNGKey(0), cfg.nb)
    fea = conv2d(x, params["fea_conv"], dtype=dtype)
    acts["fea_conv"] = fea

    def body(h, xs):
        block_params, key = xs
        h2 = _rrdb_forward(h, block_params, cfg, key, False, dtype)
        return h2, h2

    trunk, per_block = jax.lax.scan(body, fea, (params["trunk"], block_keys),
                                    unroll=max(1, cfg.unroll))
    for k in range(cfg.nb):
        acts[f"rrdb_{k:02d}"] = per_block[k]
    fea = fea + conv2d(trunk, params["trunk_conv"], dtype=dtype)
    acts["trunk"] = fea
    factor = 3 if cfg.upscale == 3 else 2
    for i, up in enumerate(params["upconvs"]):
        fea = act(conv2d(upsample_nearest(fea, factor), up, dtype=dtype),
                  cfg.act_type, cfg.act_slope)
        acts[f"upconv_{i}"] = fea
    fea = act(conv2d(fea, params["hr_conv0"], dtype=dtype), cfg.act_type, cfg.act_slope)
    acts["hr_conv0"] = fea
    acts["hr_conv1"] = conv2d(fea, params["hr_conv1"], dtype=dtype).astype(jnp.float32)
    return acts


def _fold_upconv(p: Params, f: int) -> Params:
    """Fold a 3×3 HR conv (applied after nearest-×f upsampling) into a 3×3 LR
    conv with f²·Cout phase-packed outputs (pixel-shuffle channel order)."""
    w = p["w"]  # [3, 3, cin, cout]
    cin, cout = w.shape[2], w.shape[3]
    # phase_map[a, i, r] = 1 where HR tap row r (offset r-1) lands on LR row
    # offset i-1 for output phase a: floor((a + r - 1) / f) == i - 1.
    a_idx = jnp.arange(f)[:, None, None]
    i_idx = jnp.arange(3)[None, :, None]
    r_idx = jnp.arange(3)[None, None, :]
    phase_map = (jnp.floor_divide(a_idx + r_idx - 1, f) == i_idx - 1).astype(w.dtype)
    # folded[a, b, i, j, cin, cout] = Σ_{r,s} map[a,i,r]·map[b,j,s]·w[r,s].
    # HIGHEST precision: the TPU default computes fp32 einsums in bf16 passes,
    # which perturbs the folded weights enough to cost ~3 uint8 LSB of output
    # parity (measured).
    folded = jnp.einsum("air,bjs,rsco->ijcoab", phase_map, phase_map, w,
                        precision=jax.lax.Precision.HIGHEST)
    # pixel_shuffle expects channel index = cout·f² + a·f + b
    folded = folded.reshape(3, 3, cin, cout * f * f)
    out = {"w": folded}
    if "b" in p:
        out["b"] = jnp.repeat(p["b"], f * f)
    return out


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
