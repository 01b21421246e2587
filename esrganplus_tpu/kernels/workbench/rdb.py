"""Pallas TPU kernel: one fused ESRGAN+ ResidualDenseBlock_5C per spatial tile.

The XLA path runs the five by-source convs with every intermediate round-tripping
HBM; profiling shows ~half the forward time in those elementwise/conv streaming
fusions. This kernel computes the WHOLE dense block in VMEM:

  * the input tile (halo 5 — one pixel per chained conv) is DMA'd once;
  * each stage is an implicit GEMM with the three U-axis taps lane-concatenated
    (K = 3·C per MXU issue instead of C) and the three V-axis taps accumulated
    via sublane-shifted adds;
  * per-source outputs use the descending target layout [t5 | t4 | t3 | t2 | t1]
    so the hot five-way t5 accumulation reads offset-0 lane slices;
  * x1…x4 and all contribution tensors live in VMEM; only the block output is
    written back;
  * boundary tiles re-zero each intermediate's halo ring outside the image,
    reproducing the reference's per-conv SAME zero padding exactly.

Margins: x carries halo 5; x_i (i=1..4) halo 5−i; contributions c_i halo 4−i;
the output is the halo-0 core. Same weights as the reference, regrouped by
:func:`prepare_rdb_weights`. Inference-only (no custom VJP yet) — training uses
the XLA path.

STATUS (measured on v5e, batch 16 @128²): correct to the bf16 floor (~9e-3 max
abs, same as the XLA bf16 path), but SLOWER than XLA — 9.4 ms/RDB at tile 32 vs
~3.1 ms for the XLA by-source graph; tile 64 exceeds Mosaic's 16 MB VMEM stack
accounting. XLA's "EmitAllBatchInSublanes" conv emitter plus its fusion wins on
these shapes; the kernel is kept as a workbench for future Mosaic improvements
(per-target accumulator restructuring and DMA double-buffering are the known
next steps). Not wired into the model path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def prepare_rdb_weights(p: dict, nf: int, gc: int, conv1x1: bool, dtype=jnp.bfloat16):
    """RDB params → per-stage K-packed weights + bias vector.

    Returns (w0…w4, bias): w_i [3(dv), 3·C_i (du-major), width_i] with lane
    order [t5 (nf) | t4 | t3 | t2 | t1 | (1×1, i=0 only)]; bias [nf+4·gc] in
    the same (1×1-less) order.
    """
    def src_w(lo, width, tail_targets, extra=None):
        parts = [p["conv5"]["w"][:, :, lo:lo + width, :]] + [
            p[f"conv{t}"]["w"][:, :, lo:lo + width, :] for t in tail_targets]
        if extra is not None:
            parts.append(extra)
        w = jnp.concatenate(parts, axis=-1)  # [3(kh), 3(kw), width_src, n]
        # kernel: the lane-concat shifts along H (kh) and the shifted-accumulate
        # loop walks W (kw) → rows = kw, K order = [kh, c]
        return jnp.transpose(w, (1, 0, 2, 3)).reshape(3, 3 * w.shape[2], w.shape[3])

    extra = None
    if conv1x1:
        extra = jnp.pad(p["conv1x1"]["w"], ((1, 1), (1, 1), (0, 0), (0, 0)))
    ws = [src_w(0, nf, (4, 3, 2, 1), extra)]
    for i in range(1, 5):
        lo = nf + (i - 1) * gc
        ws.append(src_w(lo, gc, tuple(range(4, i, -1))))
    bias = jnp.concatenate(
        [p["conv5"]["b"]] + [p[f"conv{t}"]["b"] for t in (4, 3, 2, 1)])
    return tuple(w.astype(dtype) for w in ws) + (bias.astype(jnp.float32).reshape(1, -1),)


def _conv_stage(src, w_dy, r_u: int, r_v: int, cin: int, width: int):
    """src [r_u, r_v, cin] → valid-conv contributions [r_u−2, r_v−2, width]."""
    a = jnp.concatenate([src[0:r_u - 2], src[1:r_u - 1], src[2:r_u]], axis=-1)
    am = a.reshape((r_u - 2) * r_v, 3 * cin)
    acc = jnp.zeros((r_u - 2, r_v - 2, width), jnp.float32)
    for dv in range(3):
        prod = jnp.dot(am, w_dy[dv], preferred_element_type=jnp.float32)
        acc = acc + prod.reshape(r_u - 2, r_v, width)[:, dv:dv + r_v - 2, :]
    # bf16 storage matches the XLA path's precision (its conv outputs are cast
    # to bf16 before the assembly adds) and halves VMEM pressure.
    return acc.astype(src.dtype)


def _rdb_kernel(x_ref, w0, w1, w2, w3, w4, b_ref, out_ref, xwin, sem, *,
                tu, tv, nf, gc, cin_pad, conv1x1, slope, res_scale, nh, nw,
                img_h, img_w):
    ij = pl.program_id(0)
    b = ij // (nh * nw)
    ui = (ij // nw) % nh
    vi = ij % nw

    # window [tu+10, tv+16, cin_pad]: V extent rounded to a multiple of 8 for
    # the DMA tiling; C padded to 128. x is pre-padded (5, 5/11) spatially.
    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(ui * tu, tu + 10), pl.ds(vi * tv, tv + 16), :],
        xwin, sem)
    copy.start()
    copy.wait()
    xw = xwin[:, 0:tv + 10, 0:nf]  # [tu+10, tv+10, nf]

    def off(j):  # lane offset of target t_j (j in 1..4); t5 at 0
        return nf + (4 - j) * gc

    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    def crop(t, d):
        return t if d == 0 else t[d:-d, d:-d, :]

    def mask_ring(t, margin, ru, rv):
        u0 = ui * tu - margin
        v0 = vi * tv - margin
        uu = jax.lax.broadcasted_iota(jnp.int32, (ru, rv), 0) + u0
        vv = jax.lax.broadcasted_iota(jnp.int32, (ru, rv), 1) + v0
        ok = (uu >= 0) & (uu < img_h) & (vv >= 0) & (vv < img_w)
        # minor-dim insertion is only lowerable for 32-bit types → f32 multiply
        return t * ok.astype(jnp.float32)[:, :, None]

    bias = b_ref[0]

    def tgt(c, d, j):
        return crop(c, d)[:, :, off(j):off(j) + gc]

    w0_width = nf + 4 * gc + (gc if conv1x1 else 0)
    c0 = _conv_stage(xw, w0, tu + 10, tv + 10, nf, w0_width)            # halo 4
    x1 = lrelu(tgt(c0, 0, 1).astype(jnp.float32) + bias[off(1):off(1) + gc])
    x1 = mask_ring(x1, 4, tu + 8, tv + 8).astype(xw.dtype)

    c1 = _conv_stage(x1, w1, tu + 8, tv + 8, gc, nf + 3 * gc)           # halo 3
    x2 = lrelu(tgt(c0, 1, 2).astype(jnp.float32) + tgt(c1, 0, 2) + bias[off(2):off(2) + gc])
    if conv1x1:
        x2 = x2 + crop(c0, 1)[:, :, nf + 4 * gc:].astype(jnp.float32)
    x2 = mask_ring(x2, 3, tu + 6, tv + 6).astype(xw.dtype)

    c2 = _conv_stage(x2, w2, tu + 6, tv + 6, gc, nf + 2 * gc)           # halo 2
    x3 = lrelu(tgt(c0, 2, 3).astype(jnp.float32) + tgt(c1, 1, 3) + tgt(c2, 0, 3)
               + bias[off(3):off(3) + gc])
    x3 = mask_ring(x3, 2, tu + 4, tv + 4).astype(xw.dtype)

    c3 = _conv_stage(x3, w3, tu + 4, tv + 4, gc, nf + gc)               # halo 1
    x4 = lrelu(tgt(c0, 3, 4).astype(jnp.float32) + tgt(c1, 2, 4) + tgt(c2, 1, 4)
               + tgt(c3, 0, 4) + bias[off(4):off(4) + gc]) \
        + crop(x2, 2).astype(jnp.float32)
    x4 = mask_ring(x4, 1, tu + 2, tv + 2).astype(xw.dtype)

    c4 = _conv_stage(x4, w4, tu + 2, tv + 2, gc, nf)                    # halo 0
    x5 = (crop(c0, 4)[:, :, 0:nf].astype(jnp.float32) + crop(c1, 3)[:, :, 0:nf]
          + crop(c2, 2)[:, :, 0:nf] + crop(c3, 1)[:, :, 0:nf] + c4 + bias[0:nf])
    out = x5 * res_scale + crop(xw, 5).astype(jnp.float32)
    out_ref[...] = out.reshape(1, tu, tv, nf).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nf", "gc", "conv1x1", "slope",
                                             "res_scale", "tile"))
def rdb_fused(x: jnp.ndarray, w0, w1, w2, w3, w4, bias, *, nf: int, gc: int,
              conv1x1: bool = True, slope: float = 0.2, res_scale: float = 0.2,
              tile: int = 64) -> jnp.ndarray:
    """Fused RDB forward: x [B, H, W, nf] (bf16 recommended) → same shape.

    H and W must be divisible by ``tile``. Weights from
    :func:`prepare_rdb_weights`.
    """
    bsz, h, w, _ = x.shape
    assert h % tile == 0 and w % tile == 0, (h, w, tile)
    tu = tv = tile
    nh, nw = h // tu, w // tv
    cpad = -nf % 128
    xp = jnp.pad(x, ((0, 0), (5, 5), (5, 11), (0, cpad)))

    kernel = functools.partial(
        _rdb_kernel, tu=tu, tv=tv, nf=nf, gc=gc, cin_pad=nf + cpad,
        conv1x1=conv1x1, slope=slope, res_scale=res_scale, nh=nh, nw=nw,
        img_h=h, img_w=w)

    def out_index(ij):
        return (ij // (nh * nw), (ij // nw) % nh, ij % nw, 0)

    vspec = lambda shape: pl.BlockSpec(shape, lambda ij: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz * nh * nw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            vspec(w0.shape), vspec(w1.shape), vspec(w2.shape),
            vspec(w3.shape), vspec(w4.shape), vspec(bias.shape),
        ],
        out_specs=pl.BlockSpec((1, tu, tv, nf), out_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tu + 10, tv + 16, nf + cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w0, w1, w2, w3, w4, bias)
