"""Pallas TPU kernel: whole ESRGAN+ ResidualDenseBlock_5C, transposed layout.

NOTE: the model paths now run the column-merged successor
(:mod:`esrganplus_tpu.kernels.rdb_ct`) — measured faster at every shape
tried (its dots emit 3× the output rows per MXU pass). This 9-tap variant
stays as the reference implementation of the layout (fully tested, and the
design its successor's docstring builds on).

The XLA path (``models/rrdb.py:_rdb_forward_fused``) round-trips every
intermediate through HBM and pays lane-rotate assembly around 32-channel
tensors; measured 1.26 ms/RDB on v5e (batch 8 @128²) vs a 0.32 ms MXU roofline.
This kernel computes the WHOLE dense block in VMEM in a *transposed* layout
chosen from first principles for this hardware (measured on-chip, see
NOTES_ROUND3.md):

  * activations live as ``[C, M]`` with M = n_img·H·W **pixels in the lane
    dimension** — lanes are the TPU's 128-wide axis, and pixels are the one
    dimension that never pads (channels here are 32/64, which waste 75%/50%
    of every lane tile in the NHWC layout);
  * each dense-stage conv is ONE ``[S, 9·C_prefix] @ [9·C_prefix, M]`` matmul
    against an incrementally grown im2col buffer ``IM``: stage k contracts the
    first ``9·C_k`` rows, then appends its activation's nine tap-shifted
    copies as the next ``9·gc`` rows. By-target contraction makes K land near
    128-multiples (576/864/1152/1440/1728 → ≥90% K-tile packing), the output
    streams S=32/64 rows, and M fills lanes exactly — measured ~212 TF/s on
    these shapes (vs ~65 TF/s for the by-source orientation);
  * SAME zero padding is exact *without halo*: tap copies are lane-shifts with
    zero fill at the array ends plus iota masks at image-boundary-crossing
    lanes, so every intermediate matches the reference's per-conv zero padding
    bit-for-bit in bf16;
  * **multiple images can pack into the lane axis per grid step**
    (``[nf, P·H·W]`` blocks, ``pack`` argument) with row-crossing taps masked
    per image (masks elided at P=1 where array-end zero fill suffices).
    MEASURED OUTCOME (v5e, 2026-08-16): packing does NOT pay — the default
    stays P=1. At training shapes (batch 16 of 32² crops) the full PSNR step
    ran 39.1 ms at P=1 vs 43.5 ms auto-packed (fwd 16 / bwd 4): Mosaic's
    automatic grid pipelining (DMA of step i+1 overlapped with compute of
    step i) is worth more than fewer grid launches, and per-launch overhead
    is small. The machinery stays for explicit use at other shapes;
  * weights (one RDB ≈ 0.5 MB bf16) stay resident; the only HBM traffic per
    step is the [nf, P·M_img] input/output pair (DMA'd by Mosaic's automatic
    grid pipelining).

Numerics mirror the XLA bf16 path: MXU accumulates f32, each stage output is
rounded to bf16 (as XLA's bf16-emitting convs do), β=0.2 residual scaling and
the ESRGAN+ conv1x1 shortcut (reference ``block.py:260-268``) are preserved.

Training goes through :func:`rdb_t_diff` — the same forward plus a custom VJP
whose backward is a second Pallas kernel (``_rdb_t_bwd_kernel``): it
rematerialises the im2col buffer (cheaper than saving 5 intermediates to HBM),
then runs the adjoint as the same by-target dots transposed — ``dW_k = dz_k ·
IMᵀ`` and ``dIM += W_kᵀ · dz_k`` — with the tap-append adjoint expressed as
reverse lane-shifts. dW accumulates across the grid in f32 output blocks
revisited every step, so master-precision gradients leave the kernel directly
(weights cross the custom_vjp boundary in f32 and are cast to the compute
dtype inside).
"""

from __future__ import annotations

from esrganplus_tpu.kernels.vmem import VMEM_LIMIT_BYTES

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def prepare_rdb_t_weights(p: dict, nf: int, gc: int, conv1x1: bool,
                          dtype=jnp.bfloat16):
    """RDB params → by-target K-major weight matrices for the kernel.

    Returns (w1..w5, w11, bias): w_k ``[S_k, 9·C_prefix_k]`` with K rows in
    source-major / tap-major / channel order — exactly the order the kernel
    grows its im2col buffer in; w11 ``[gc, nf]`` (zeros when conv1x1 is off);
    bias ``[nf + 4·gc, 1]`` packing (b5 | b4 | b3 | b2 | b1).
    """
    def wk(k):
        w = p[f"conv{k}"]["w"]  # [3, 3, C_prefix, S]
        cp, s = w.shape[2], w.shape[3]
        srcs = [nf] + [gc] * ((cp - nf) // gc)
        blocks, off = [], 0
        for c in srcs:
            blk = w[:, :, off:off + c, :].reshape(9 * c, s)  # (r·3+s)·C + c rows
            blocks.append(blk)
            off += c
        return jnp.concatenate(blocks, 0).T.astype(dtype)  # [S, 9·C_prefix]

    if conv1x1:
        w11 = p["conv1x1"]["w"][0, 0].T.astype(dtype)  # [gc, nf]
    else:
        w11 = jnp.zeros((gc, nf), dtype)
    bias = jnp.concatenate(
        [p["conv5"]["b"]] + [p[f"conv{t}"]["b"] for t in (4, 3, 2, 1)]
    ).astype(jnp.float32).reshape(-1, 1)
    return wk(1), wk(2), wk(3), wk(4), wk(5), w11, bias


def _lane_shift(src, shift: int):
    """Lane-shift with zero fill: out[:, m] = src[:, m + shift] (0 outside)."""
    c = src.shape[0]
    if shift > 0:
        return jnp.concatenate(
            [src[:, shift:], jnp.zeros((c, shift), src.dtype)], axis=1)
    if shift < 0:
        return jnp.concatenate(
            [jnp.zeros((c, -shift), src.dtype), src[:, :shift]], axis=1)
    return src


def _tap_masks(M: int, m_img: int, W: int, dtype, packed: bool):
    """Per-tap boundary masks, [1, M] in ``dtype`` (None = no mask needed).

    Column-crossing taps (s=0/2) always mask; row-crossing taps (r=0/2) only
    when several images share the lane axis (``packed``) — with one image per
    grid step the array-end zero fill of :func:`_lane_shift` already zeroes
    the out-of-image rows.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    pos = lane % m_img
    col = pos % W
    parts = {
        "l": col > 0,
        "r": col < W - 1,
        "t": (pos >= W) if packed else None,
        "b": (pos < m_img - W) if packed else None,
    }
    masks = {}
    for r in range(3):
        for s in range(3):
            m = None
            for key in (("t" if r == 0 else "b" if r == 2 else None),
                        ("l" if s == 0 else "r" if s == 2 else None)):
                if key is not None and parts[key] is not None:
                    m = parts[key] if m is None else (m & parts[key])
            masks[(r, s)] = None if m is None else m.astype(dtype)
    return masks


def _rdb_t_kernel(x_ref, w1, w2, w3, w4, w5, w11, b_ref, *rest,
                  nf: int, gc: int, H: int, W: int, pack: int, slope: float,
                  res_scale: float, rrdb_scale: Optional[float] = None,
                  split_dots: bool = False):
    if rrdb_scale is not None:
        res_ref, o_ref, im_ref = rest
    else:
        o_ref, im_ref = rest
    M = pack * H * W
    dt = x_ref.dtype

    masks = _tap_masks(M, H * W, W, dt, packed=pack > 1)

    def append_taps(src, row0: int, c: int):
        for r in range(3):
            for s in range(3):
                shift = (r - 1) * W + (s - 1)
                t = r * 3 + s
                v = _lane_shift(src, shift)
                if masks[(r, s)] is not None:
                    v = v * masks[(r, s)]
                im_ref[row0 + t * c: row0 + (t + 1) * c, :] = v

    def off9(k: int) -> int:  # IM row offset where source k's taps start
        return 9 * (nf + (k - 1) * gc) if k else 0

    bias = b_ref[:]  # [nf + 4·gc, 1]: [b5 | b4 | b3 | b2 | b1]

    def boff(j: int) -> int:  # bias row offset of target t_j (t5 at 0)
        return nf + (4 - j) * gc

    def stage(k: int, w_ref, srows: int):
        # f32 accumulate + bias; callers round to bf16 exactly where the XLA
        # bf16 path's conv outputs round.
        y = jnp.dot(w_ref[:], im_ref[0:off9(k), :],
                    preferred_element_type=jnp.float32)
        b = bias[boff(k):boff(k) + srows] if k < 5 else bias[0:srows]
        return y + b

    def stage_b(k: int, srows: int):
        return bias[boff(k):boff(k) + srows] if k < 5 else bias[0:srows]

    def prefix_dot(w_ref, k: int):
        # contribution of all rows already in IM BEFORE the latest source's
        # taps — independent of that source, so it can issue while the VPU
        # appends the taps (split_dots mode; measured 0.749 vs 0.810 ms/RDB
        # on v5e, hence the default). The weight K offsets are not
        # 128-lane-aligned, so slice the loaded value, not the ref.
        return jnp.dot(w_ref[:][:, 0:off9(k - 1)], im_ref[0:off9(k - 1), :],
                       preferred_element_type=jnp.float32)

    def fresh_dot(w_ref, k: int):
        return jnp.dot(w_ref[:][:, off9(k - 1):off9(k)],
                       im_ref[off9(k - 1):off9(k), :],
                       preferred_element_type=jnp.float32)

    # leakyrelu in f32 (Mosaic rejects bf16 comparisons on this target)
    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    x = x_ref[:]                                   # [nf, M]

    if split_dots:
        # Software-pipelined order: each stage's prefix dot (MXU) is issued
        # before the previous activation's tap-append (VPU) it does NOT
        # depend on, exposing MXU/VPU overlap to Mosaic's scheduler.
        append_taps(x, 0, nf)
        x1 = lrelu(stage(1, w1, gc)).astype(dt)
        y2 = prefix_dot(w2, 2)
        c11 = jnp.dot(w11[:], im_ref[4 * nf:5 * nf, :],
                      preferred_element_type=jnp.float32)
        append_taps(x1, off9(1), gc)
        x2 = (lrelu(y2 + fresh_dot(w2, 2) + stage_b(2, gc)) + c11).astype(dt)
        y3 = prefix_dot(w3, 3)
        append_taps(x2, off9(2), gc)
        x3 = lrelu(y3 + fresh_dot(w3, 3) + stage_b(3, gc)).astype(dt)
        y4 = prefix_dot(w4, 4)
        append_taps(x3, off9(3), gc)
        x4 = (lrelu(y4 + fresh_dot(w4, 4) + stage_b(4, gc))
              + x2.astype(jnp.float32)).astype(dt)
        y5 = prefix_dot(w5, 5)
        append_taps(x4, off9(4), gc)
        x5 = y5 + fresh_dot(w5, 5) + stage_b(5, nf)
    else:
        append_taps(x, 0, nf)
        x1 = lrelu(stage(1, w1, gc)).astype(dt)
        append_taps(x1, off9(1), gc)
        # ESRGAN+ 1×1 shortcut: x2 = act(conv2(cat)) + conv1x1(x); x's center
        # tap is IM rows [4·nf, 5·nf).
        c11 = jnp.dot(w11[:], im_ref[4 * nf:5 * nf, :],
                      preferred_element_type=jnp.float32)
        x2 = (lrelu(stage(2, w2, gc)) + c11).astype(dt)
        append_taps(x2, off9(2), gc)
        x3 = lrelu(stage(3, w3, gc)).astype(dt)
        append_taps(x3, off9(3), gc)
        x4 = (lrelu(stage(4, w4, gc)) + x2.astype(jnp.float32)).astype(dt)
        append_taps(x4, off9(4), gc)               # ESRGAN+ x4 += x2 residual
        x5 = stage(5, w5, nf)                      # no activation on conv5

    out = x5 * res_scale + x.astype(jnp.float32)
    if rrdb_scale is not None:
        # folded RRDB epilogue: this RDB is the third in its RRDB, so apply
        # the block-level β and residual here instead of an XLA add
        # (reference block.py:287-291) — saves an HBM round-trip per RRDB.
        out = out * rrdb_scale + res_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(dt)


@functools.partial(jax.jit, static_argnames=("nf", "gc", "h", "w", "n_img",
                                             "pack", "slope", "res_scale",
                                             "rrdb_scale", "split_dots",
                                             "interpret"))
def rdb_t(x, w1, w2, w3, w4, w5, w11, bias, res=None, *, nf: int, gc: int,
          h: int, w: int, n_img: int = 1, pack: Optional[int] = None,
          slope: float = 0.2, res_scale: float = 0.2,
          rrdb_scale: Optional[float] = None, split_dots: bool = True,
          interpret: bool = False):
    """Fused transposed RDB forward: x ``[nf, n_img·H·W]`` (image-major lanes)
    → same shape.

    Weights from :func:`prepare_rdb_t_weights`. With ``rrdb_scale``/``res``
    set, the RRDB epilogue ``out·β + res`` is folded into the kernel (use on
    the third RDB of each RRDB). ``pack`` groups several images per grid step
    (default 1 — measured best; see module docstring).
    """
    cin, mtot = x.shape
    m_img = h * w
    assert cin == nf and mtot == n_img * m_img, (x.shape, nf, n_img, h, w)
    ktot = 9 * (nf + 4 * gc)
    if pack is None:
        pack = 1  # measured best default — see module docstring
    assert n_img % pack == 0, (n_img, pack)
    kernel = functools.partial(_rdb_t_kernel, nf=nf, gc=gc, H=h, W=w,
                               pack=pack, slope=slope, res_scale=res_scale,
                               rrdb_scale=rrdb_scale, split_dots=split_dots)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec((nf, pack * m_img), lambda g: (0, g),
                               memory_space=pltpu.VMEM)
    in_specs = [
        img(),
        vfull(w1.shape), vfull(w2.shape), vfull(w3.shape),
        vfull(w4.shape), vfull(w5.shape), vfull(w11.shape),
        vfull(bias.shape),
    ]
    args = [x, w1, w2, w3, w4, w5, w11, bias]
    if res is not None:
        assert rrdb_scale is not None
        in_specs.append(img())
        args.append(res)
    else:
        assert rrdb_scale is None
    return pl.pallas_call(
        kernel,
        grid=(n_img // pack,),
        in_specs=in_specs,
        out_specs=img(),
        out_shape=jax.ShapeDtypeStruct((nf, mtot), x.dtype),
        scratch_shapes=[pltpu.VMEM((ktot, pack * m_img), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# backward (training)
# ---------------------------------------------------------------------------


def _rdb_t_bwd_kernel(x_ref, w1, w2, w3, w4, w5, w11, b_ref, g_ref,
                      dx_ref, dw1_ref, dw2_ref, dw3_ref, dw4_ref, dw5_ref,
                      dw11_ref, db_ref, im_ref, dim_ref, *,
                      nf: int, gc: int, H: int, W: int, pack: int,
                      slope: float, res_scale: float):
    """Adjoint of ``_rdb_t_kernel`` for one image group; dW/db accumulate
    across the grid (f32 output blocks revisited every step)."""
    M = pack * H * W
    dt = x_ref.dtype
    f32 = jnp.float32

    masks = _tap_masks(M, H * W, W, dt, packed=pack > 1)
    masks32 = {k: (None if v is None else v.astype(f32))
               for k, v in masks.items()}

    def append_taps(src, row0: int, c: int):
        for r in range(3):
            for s in range(3):
                shift = (r - 1) * W + (s - 1)
                t = r * 3 + s
                v = _lane_shift(src, shift)
                if masks[(r, s)] is not None:
                    v = v * masks[(r, s)]
                im_ref[row0 + t * c: row0 + (t + 1) * c, :] = v

    def untap(row0: int, c: int):
        # adjoint of append_taps: forward is mask∘shift per tap, so the
        # adjoint sums shift-back∘mask over the nine taps.
        acc = jnp.zeros((c, M), f32)
        for r in range(3):
            for s in range(3):
                shift = (r - 1) * W + (s - 1)
                t = r * 3 + s
                blk = dim_ref[row0 + t * c: row0 + (t + 1) * c, :]
                if masks32[(r, s)] is not None:
                    blk = blk * masks32[(r, s)]
                acc = acc + _lane_shift(blk, -shift)
        return acc

    def off9(k: int) -> int:
        return 9 * (nf + (k - 1) * gc) if k else 0

    bias = b_ref[:]

    def boff(j: int) -> int:
        return nf + (4 - j) * gc

    def stage(k: int, w_ref, srows: int):
        y = jnp.dot(w_ref[:], im_ref[0:off9(k), :],
                    preferred_element_type=f32)
        b = bias[boff(k):boff(k) + srows] if k < 5 else bias[0:srows]
        return y + b

    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)
    dlrelu = lambda m, t: jnp.where(m, t, t * slope)

    def prefix_dot(w_ref, k: int):
        # see _rdb_t_kernel: issued before the previous activation's
        # tap-append it does not depend on, exposing MXU/VPU overlap
        return jnp.dot(w_ref[:][:, 0:off9(k - 1)], im_ref[0:off9(k - 1), :],
                       preferred_element_type=f32)

    def fresh_dot(w_ref, k: int):
        return jnp.dot(w_ref[:][:, off9(k - 1):off9(k)],
                       im_ref[off9(k - 1):off9(k), :],
                       preferred_element_type=f32)

    def stage_b(j: int, srows: int):
        return bias[boff(j):boff(j) + srows] if j < 5 else bias[0:srows]

    # ---- forward recompute (same math as _rdb_t_kernel's split_dots order;
    # keeps the lrelu sign masks, which the saved-rounded activations would
    # also give since bf16 rounding preserves sign) ----
    x = x_ref[:]
    append_taps(x, 0, nf)
    z1 = stage(1, w1, gc)
    m1 = z1 >= 0
    x1 = lrelu(z1).astype(dt)
    y2 = prefix_dot(w2, 2)
    c11 = jnp.dot(w11[:], im_ref[4 * nf:5 * nf, :], preferred_element_type=f32)
    append_taps(x1, off9(1), gc)
    z2 = y2 + fresh_dot(w2, 2) + stage_b(2, gc)
    m2 = z2 >= 0
    x2 = (lrelu(z2) + c11).astype(dt)
    y3 = prefix_dot(w3, 3)
    append_taps(x2, off9(2), gc)
    z3 = y3 + fresh_dot(w3, 3) + stage_b(3, gc)
    m3 = z3 >= 0
    x3 = lrelu(z3).astype(dt)
    y4 = prefix_dot(w4, 4)
    append_taps(x3, off9(3), gc)
    z4 = y4 + fresh_dot(w4, 4) + stage_b(4, gc)
    m4 = z4 >= 0
    x4 = (lrelu(z4) + x2.astype(f32)).astype(dt)
    append_taps(x4, off9(4), gc)
    # (x5 / out are not needed by the adjoint)

    # ---- adjoint ----
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + val

    def dw(dzk, k):  # dW_k = dz_k · IM[0:K_k]ᵀ  — [S, M]·[M, K] on the MXU
        return jax.lax.dot_general(dzk, im_ref[0:off9(k), :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def dim_add(wref, dzk, k, assign=False):
        # dIM[0:K_k] (+)= W_kᵀ · dz_k — [K, S]·[S, M]
        v = jax.lax.dot_general(wref[:], dzk, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if assign:
            dim_ref[0:off9(k), :] = v
        else:
            dim_ref[0:off9(k), :] = dim_ref[0:off9(k), :] + v

    g = g_ref[:].astype(f32)

    # Pipelined order per stage: the dIM dot (MXU) that unblocks the NEXT
    # stage's untap issues first, the untap (VPU) follows, and the stage's
    # independent dW dot (MXU) comes last so it can overlap with that untap.

    # out = x5·β + x
    dz5 = g * res_scale
    dz5k = dz5.astype(dt)
    dim_add(w5, dz5k, 5, assign=True)
    dx4 = untap(off9(4), gc)                       # x4's taps feed conv5 only
    acc(dw5_ref, dw(dz5k, 5))

    # x4 = lrelu(z4) + x2
    dz4 = dlrelu(m4, dx4)
    dz4k = dz4.astype(dt)
    dim_add(w4, dz4k, 4)
    dx3 = untap(off9(3), gc)
    acc(dw4_ref, dw(dz4k, 4))

    # x3 = lrelu(z3)
    dz3 = dlrelu(m3, dx3)
    dz3k = dz3.astype(dt)
    dim_add(w3, dz3k, 3)
    dx2 = untap(off9(2), gc) + dx4                 # + the x4 += x2 residual
    acc(dw3_ref, dw(dz3k, 3))

    # x2 = lrelu(z2) + c11
    dz2 = dlrelu(m2, dx2)
    dz2k = dz2.astype(dt)
    dx2k = dx2.astype(dt)
    dim_add(w2, dz2k, 2)
    dx1 = untap(off9(1), gc)
    acc(dw2_ref, dw(dz2k, 2))
    # c11 = W11 · x (center tap)
    acc(dw11_ref, jax.lax.dot_general(dx2k, x, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32))
    dx_c11 = jax.lax.dot_general(w11[:], dx2k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)

    # x1 = lrelu(z1)
    dz1 = dlrelu(m1, dx1)
    dz1k = dz1.astype(dt)
    dim_add(w1, dz1k, 1)
    dx0 = untap(0, nf) + dx_c11 + g                # x: all taps + 1×1 + skip
    acc(dw1_ref, dw(dz1k, 1))

    dx_ref[:] = dx0.astype(dt)

    # bias rows pack [b5 | b4 | b3 | b2 | b1] (see prepare_rdb_t_weights)
    dbv = jnp.concatenate([
        jnp.sum(dz5, axis=1, keepdims=True),
        jnp.sum(dz4, axis=1, keepdims=True),
        jnp.sum(dz3, axis=1, keepdims=True),
        jnp.sum(dz2, axis=1, keepdims=True),
        jnp.sum(dz1, axis=1, keepdims=True),
    ], axis=0)
    acc(db_ref, dbv)


@functools.partial(jax.jit, static_argnames=("nf", "gc", "h", "w", "n_img",
                                             "pack", "slope", "res_scale",
                                             "interpret"))
def _rdb_t_bwd(x, w1, w2, w3, w4, w5, w11, bias, g, *, nf: int, gc: int,
               h: int, w: int, n_img: int, pack: Optional[int] = None,
               slope: float, res_scale: float, interpret: bool = False):
    cin, mtot = x.shape
    m_img = h * w
    ktot = 9 * (nf + 4 * gc)
    if pack is None:
        pack = 1  # measured best default — see module docstring
    assert n_img % pack == 0, (n_img, pack)
    kernel = functools.partial(_rdb_t_bwd_kernel, nf=nf, gc=gc, H=h, W=w,
                               pack=pack, slope=slope, res_scale=res_scale)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec((nf, pack * m_img), lambda g: (0, g),
                               memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((nf, mtot), x.dtype),            # dx
        jax.ShapeDtypeStruct(w1.shape, f32),
        jax.ShapeDtypeStruct(w2.shape, f32),
        jax.ShapeDtypeStruct(w3.shape, f32),
        jax.ShapeDtypeStruct(w4.shape, f32),
        jax.ShapeDtypeStruct(w5.shape, f32),
        jax.ShapeDtypeStruct(w11.shape, f32),
        jax.ShapeDtypeStruct(bias.shape, f32),
    )
    out_specs = (img(),) + tuple(vfull(s.shape) for s in out_shapes[1:])
    return pl.pallas_call(
        kernel,
        grid=(n_img // pack,),
        in_specs=[
            img(),
            vfull(w1.shape), vfull(w2.shape), vfull(w3.shape),
            vfull(w4.shape), vfull(w5.shape), vfull(w11.shape),
            vfull(bias.shape),
            img(),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((ktot, pack * m_img), x.dtype),
                        pltpu.VMEM((ktot, pack * m_img), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, w1, w2, w3, w4, w5, w11, bias, g)


@functools.lru_cache(maxsize=None)
def _make_rdb_t_diff(nf: int, gc: int, h: int, w: int, n_img: int,
                     pack, bwd_pack, slope: float, res_scale: float,
                     interpret: bool):
    @jax.custom_vjp
    def f(x, w1, w2, w3, w4, w5, w11, bias):
        kdt = x.dtype
        ws = tuple(wi.astype(kdt) for wi in (w1, w2, w3, w4, w5, w11))
        return rdb_t(x, *ws, bias, nf=nf, gc=gc, h=h, w=w, n_img=n_img,
                     pack=pack, slope=slope, res_scale=res_scale,
                     interpret=interpret)

    def fwd(x, w1, w2, w3, w4, w5, w11, bias):
        return f(x, w1, w2, w3, w4, w5, w11, bias), (
            x, w1, w2, w3, w4, w5, w11, bias)

    def bwd(res, g):
        x, w1, w2, w3, w4, w5, w11, bias = res
        kdt = x.dtype
        ws = tuple(wi.astype(kdt) for wi in (w1, w2, w3, w4, w5, w11))
        outs = _rdb_t_bwd(x, *ws, bias.astype(jnp.float32), g.astype(kdt),
                          nf=nf, gc=gc, h=h, w=w, n_img=n_img, pack=bwd_pack,
                          slope=slope, res_scale=res_scale,
                          interpret=interpret)
        # Barrier: without it XLA fuses this pallas call with lax.scan's
        # gradient-stacking dynamic-update-slice into one kCustom fusion and
        # then applies the default 16 MB scoped-vmem limit to the WHOLE
        # fusion, rejecting the kernel's (legitimate, CompilerParams-raised)
        # VMEM working set. Measured on v5e 2026-08-16; standalone compiles
        # of the same kernel are fine.
        outs = jax.lax.optimization_barrier(outs)
        dx, dw1, dw2, dw3, dw4, dw5, dw11, dbias = outs
        grads = (dw1, dw2, dw3, dw4, dw5, dw11, dbias)
        prim = (w1, w2, w3, w4, w5, w11, bias)
        return (dx,) + tuple(dg.astype(p.dtype) for dg, p in zip(grads, prim))

    f.defvjp(fwd, bwd)
    return f


def rdb_t_diff(x, w1, w2, w3, w4, w5, w11, bias, *, nf: int, gc: int, h: int,
               w: int, n_img: int = 1, pack: Optional[int] = None,
               bwd_pack: Optional[int] = None, slope: float = 0.2,
               res_scale: float = 0.2, interpret: bool = False):
    """Differentiable fused RDB: forward = :func:`rdb_t`, backward = a second
    Pallas kernel. Pass weights in the master (f32) dtype — they are cast to
    ``x.dtype`` for compute inside, and gradients come back in the master
    dtype (f32 batch accumulation happens inside the kernel).

    ``pack``/``bwd_pack`` override the per-grid-step image packing of the
    forward/backward kernels (None = auto)."""
    fn = _make_rdb_t_diff(nf, gc, h, w, n_img, pack, bwd_pack, slope,
                          res_scale, interpret)
    return fn(x, w1, w2, w3, w4, w5, w11, bias)
