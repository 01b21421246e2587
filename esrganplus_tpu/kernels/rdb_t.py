"""Pallas TPU kernel: whole ESRGAN+ ResidualDenseBlock_5C, transposed layout.

The XLA path (``models/rrdb.py:_rdb_forward_fused``) round-trips every
intermediate through HBM and pays lane-rotate assembly around 32-channel
tensors; measured 1.26 ms/RDB on v5e (batch 8 @128²) vs a 0.32 ms MXU roofline.
This kernel computes the WHOLE dense block in VMEM in a *transposed* layout
chosen from first principles for this hardware (measured on-chip, see
NOTES_ROUND2.md):

  * activations live as ``[C, M]`` with M = H·W **pixels in the lane
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
    zero fill at the array ends (row overflow) and an iota mask on the two
    column-crossing taps (column overflow), so every intermediate matches the
    reference's per-conv zero padding bit-for-bit in bf16;
  * grid = batch; weights (one RDB ≈ 0.5 MB bf16) stay resident; the only HBM
    traffic per image is the [nf, M] input/output pair (DMA'd by Mosaic's
    automatic grid pipelining).

Numerics mirror the XLA bf16 path: MXU accumulates f32, each stage output is
rounded to bf16 (as XLA's bf16-emitting convs do), β=0.2 residual scaling and
the ESRGAN+ conv1x1 shortcut (reference ``block.py:260-268``) are preserved.
Inference-only (no custom VJP); training uses the XLA path.
"""

from __future__ import annotations

import functools

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


def _shifted(src, shift: int, mask_l, mask_r, s: int):
    """Lane-shift with zero fill: out[:, m] = src[:, m + shift] (0 outside),
    masked at row-crossing columns for the s=0 / s=2 taps."""
    c = src.shape[0]
    if shift > 0:
        out = jnp.concatenate(
            [src[:, shift:], jnp.zeros((c, shift), src.dtype)], axis=1)
    elif shift < 0:
        out = jnp.concatenate(
            [jnp.zeros((c, -shift), src.dtype), src[:, :shift]], axis=1)
    else:
        out = src
    if s == 0:
        out = out * mask_l
    elif s == 2:
        out = out * mask_r
    return out


def _rdb_t_kernel(x_ref, w1, w2, w3, w4, w5, w11, b_ref, o_ref, im_ref, *,
                  nf: int, gc: int, H: int, W: int, slope: float,
                  res_scale: float):
    M = H * W
    dt = x_ref.dtype

    # column masks, built once: tap s=0 reads j-1 (invalid at j=0), s=2 reads
    # j+1 (invalid at j=W-1). Lane index = i·W + j.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1) % W
    mask_l = (col > 0).astype(dt)
    mask_r = (col < W - 1).astype(dt)

    def append_taps(src, row0: int, c: int):
        for r in range(3):
            for s in range(3):
                shift = (r - 1) * W + (s - 1)
                t = r * 3 + s
                im_ref[row0 + t * c: row0 + (t + 1) * c, :] = _shifted(
                    src, shift, mask_l, mask_r, s)

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

    # leakyrelu in f32 (Mosaic rejects bf16 comparisons on this target)
    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    x = x_ref[0]                                   # [nf, M]
    append_taps(x, 0, nf)

    x1 = lrelu(stage(1, w1, gc)).astype(dt)
    append_taps(x1, off9(1), gc)

    # ESRGAN+ 1×1 shortcut: x2 = act(conv2(cat)) + conv1x1(x); x's center tap
    # is IM rows [4·nf, 5·nf).
    c11 = jnp.dot(w11[:], im_ref[4 * nf:5 * nf, :],
                  preferred_element_type=jnp.float32)
    x2 = (lrelu(stage(2, w2, gc)) + c11).astype(dt)
    append_taps(x2, off9(2), gc)

    x3 = lrelu(stage(3, w3, gc)).astype(dt)
    append_taps(x3, off9(3), gc)

    x4 = (lrelu(stage(4, w4, gc)) + x2.astype(jnp.float32)).astype(dt)
    append_taps(x4, off9(4), gc)                   # ESRGAN+ x4 += x2 residual

    x5 = stage(5, w5, nf)                          # no activation on conv5
    o_ref[0] = (x5 * res_scale + x.astype(jnp.float32)).astype(dt)


@functools.partial(jax.jit, static_argnames=("nf", "gc", "h", "w", "slope",
                                             "res_scale", "interpret"))
def rdb_t(x, w1, w2, w3, w4, w5, w11, bias, *, nf: int, gc: int, h: int,
          w: int, slope: float = 0.2, res_scale: float = 0.2,
          interpret: bool = False):
    """Fused transposed RDB forward: x ``[B, nf, H·W]`` bf16 → same shape.

    Weights from :func:`prepare_rdb_t_weights`.
    """
    bsz, cin, m = x.shape
    assert cin == nf and m == h * w, (x.shape, nf, h, w)
    ktot = 9 * (nf + 4 * gc)
    kernel = functools.partial(_rdb_t_kernel, nf=nf, gc=gc, H=h, W=w,
                               slope=slope, res_scale=res_scale)
    vfull = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, nf, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vfull(w1.shape), vfull(w2.shape), vfull(w3.shape),
            vfull(w4.shape), vfull(w5.shape), vfull(w11.shape),
            vfull(bias.shape),
        ],
        out_specs=pl.BlockSpec((1, nf, m), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nf, m), x.dtype),
        scratch_shapes=[pltpu.VMEM((ktot, m), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, w2, w3, w4, w5, w11, bias)
