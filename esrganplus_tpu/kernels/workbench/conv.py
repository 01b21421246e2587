"""Pallas TPU kernel: implicit-GEMM 3×3 stride-1 convolution (NHWC).

Why: XLA's conv lowering for this model's shapes (Cin 32-192, Cout 32-224) runs
at 10-37 TFLOPS on v5e — the 128×128 MXU is starved because the contraction is
decomposed per-tap (K = Cin ≤ 192) and the output lanes are mostly idle for
Cout < 128 (measured: a 64→224 conv takes the same 1.8 ms as 64→64 at batch 16,
128²). This kernel rebuilds the conv as one wide GEMM per spatial tile:

  * the input tile (with a 1-px halo) is DMA'd to VMEM once and reused by all
    nine taps — zero im2col materialisation in HBM;
  * per output row-block, the three dx-shifted views are concatenated on the
    lane axis so each MXU issue contracts K = 3·Cin (and the dy taps accumulate
    into the same f32 scratch), i.e. K ∈ {96·3, 192·3, …} instead of Cin;
  * Cout stays the GEMM N dimension — callers should batch narrow convs into
    wide ones (see models/rrdb.py's fused-by-source formulation) so N ≥ 128.

Correctness contract: zero 'SAME' padding, stride 1, bias add, optional fused
LeakyReLU, f32 accumulation, bf16 (or f32) in/out. Grid is (B·nh, nw) over
spatial tiles; input arrives pre-padded by 1 px so every window is in bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_ref, w_ref, b_ref, out_ref, xwin, sem, *, th, tw, cin, cout,
                    act_slope, nh, nw):
    """One (batch, h-tile, w-tile) grid step."""
    ij = pl.program_id(0)
    b = ij // (nh * nw)
    hi = (ij // nw) % nh
    wi = ij % nw

    # Input window [th+2, tw+8, cin] — the W extent is 8-aligned (Mosaic DMA
    # tiling constraint), so we over-fetch 6 columns; x is pre-padded to keep
    # every window in bounds.
    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(hi * th, th + 2), pl.ds(wi * tw, tw + 8), :],
        xwin,
        sem,
    )
    copy.start()
    copy.wait()

    # Implicit GEMM, one matmul per (dy, dx) tap. The dy shift rides the outer
    # dim (free slice + merge-reshape at offset 0); the dx shift is applied to
    # the matmul OUTPUT instead of the input — accumulating a sublane-offset
    # slice is a plain elementwise add (a relayout Mosaic supports), unlike
    # reshapes/concats/rolls of offset slices which it rejects.
    acc = jnp.zeros((th, tw, cout), jnp.float32)
    for dy in range(3):
        a = xwin[dy:dy + th].reshape(th * (tw + 8), cin)
        for dx in range(3):
            p = jnp.dot(a, w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = acc + p.reshape(th, tw + 8, cout)[:, dx:dx + tw, :]
    acc = acc + b_ref[0].astype(jnp.float32)
    if act_slope is not None:
        acc = jnp.where(acc >= 0, acc, acc * act_slope)
    out_ref[...] = acc.reshape(1, th, tw, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act_slope", "tile"))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
            act_slope=None, tile: int | None = None) -> jnp.ndarray:
    """3×3 stride-1 SAME conv via the Pallas implicit-GEMM kernel.

    x: [B, H, W, Cin] (bf16/f32) · w: [3, 3, Cin, Cout] · b: [Cout].
    ``act_slope``: None for linear, 0.0 for ReLU, e.g. 0.2 for LeakyReLU.
    H and W must be divisible by the spatial tile (chosen automatically).
    """
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    if b is None:
        b = jnp.zeros((cout,), x.dtype)

    if tile is None:
        # Pick the largest tile dividing H (and W) from a VMEM-friendly set.
        for cand in (64, 32, 16, 8):
            if h % cand == 0 and wdt % cand == 0:
                tile = cand
                break
        else:
            raise ValueError(f"H={h}, W={wdt} not tileable; pad spatially first")
    th = tw = tile
    nh, nw = h // th, wdt // tw

    # Mosaic requires manually-DMA'd windows to have a 128-aligned minor dim;
    # pad channels up (zero taps contribute nothing; K-tile is partly idle but
    # a ≤128 contraction costs one MXU pass either way).
    cpad = -cin % 128
    cin_p = cin + cpad
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, cpad)))
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, cpad), (0, 0)))  # [3, 3, cin_p, cout]

    grid = (bsz * nh * nw,)
    kernel = functools.partial(
        _conv3x3_kernel, th=th, tw=tw, cin=cin_p, cout=cout,
        act_slope=act_slope, nh=nh, nw=nw)

    def out_index(ij):
        b_ = ij // (nh * nw)
        hi = (ij // nw) % nh
        wi = ij % nw
        return (b_, hi, wi, 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM; manual DMA
            pl.BlockSpec((3, 3, cin_p, cout), lambda ij: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda ij: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cout), out_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 8, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wk.astype(x.dtype), b.reshape(1, cout).astype(x.dtype))
