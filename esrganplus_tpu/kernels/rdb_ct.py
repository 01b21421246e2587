"""Pallas TPU kernel: ESRGAN+ ResidualDenseBlock_5C, column-merged variant.

Same transposed ``[C, pixels-in-lanes]`` layout as :mod:`rdb_t`, but the 3×3
conv is decomposed differently to fix the MXU's *output-row* utilisation:

  * :mod:`rdb_t` materialises all nine tap-shifted copies in the im2col
    buffer and runs one ``[S, 9·C] @ [9·C, M]`` dot per stage. K packs ≥90%
    of its 128-tiles, but the output row count S is the dense-stage width —
    32 (64 for conv5) — so 75% (50%) of every MXU output tile is padding
    (probed: a mutant skipping 8/9 tap writes timed the same as the full
    kernel, so the VPU was NOT the bottleneck — the dots were).
  * here the im2col buffer holds only the three ROW-shifted copies of each
    source (``3·C`` rows instead of ``9·C``), and the three COLUMN taps move
    to the output side: stage k computes ``Y = W' @ IM3`` with
    ``W' = [W(s=0); W(s=1); W(s=2)]`` stacked along the output rows —
    ``S' = 3·S`` (96 / 192) — then combines ``y = Σ_s shift(Y_s, s-1)·mask_s``
    with two lane-shifts and two boundary masks on S-row tensors (cheap VPU
    work). Lane shifts commute with the channel contraction, and the
    post-shift column masks reproduce the reference's SAME zero padding
    exactly, as in rdb_t.
  * the ESRGAN+ 1×1 shortcut rides free: stage 2's output rows grow from 96
    to exactly 128 (one full MXU tile) with ``gc`` extra rows that hold W11
    against the x-center-row K columns — the 1×1 conv costs zero extra MXU
    passes.

Measured (v5e, batch 16 of 128², bf16): 1.07 ms/RDB (two-image interleaved
pipe kernel) vs rdb_t's 1.39 and ~2.5 for the best XLA graph — forward bench
38.9 → 48.8 MPix/s/chip. At training crops (batch 16 of 32²): 0.066 vs
0.094 ms/RDB. The modeled dot floor of this decomposition is ~0.93 ms/RDB
at bench shape (FLOP-weighted ~69% MXU tile utilisation from the remaining
S/K padding; a by-source repartition models to the same 0.69 — the S and K
constraints just swap sides).

Numerics: identical contraction sets as rdb_t, accumulated in f32 on the MXU
and rounded to bf16 at each stage output exactly where the XLA bf16 path
rounds; the only difference is the order the three column-tap partial sums
enter the f32 accumulation (within bf16-parity tolerances; tests in
tests/test_kernels.py).

Reference graph: ``codes/models/modules/block.py:232-268`` (RDB_5C; the
β=0.2 residual, 1×1 shortcut and x4+=x2 are preserved bit-for-bit in
structure); RRDB epilogue fold per ``block.py:287-291``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esrganplus_tpu.kernels.rdb_t import _lane_shift

from esrganplus_tpu.kernels.vmem import VMEM_LIMIT_BYTES


def prepare_rdb_ct_weights(p: dict, nf: int, gc: int, conv1x1: bool,
                           dtype=jnp.bfloat16):
    """RDB params → per-stage column-merged weight matrices.

    Returns (w1..w5, bias): w_k ``[3·S_k (+gc for k=2), 3·C_prefix_k]`` with
    output rows in column-tap-major / target-channel order and K columns in
    source-major / row-tap-major / channel order (the order the kernel grows
    its IM3 buffer in); stage 2 carries ``gc`` extra rows holding the 1×1
    shortcut weights against x's center-row columns (zeros when ``conv1x1``
    is off — the rows pad the MXU tile either way). bias ``[nf + 4·gc, 1]``
    packs (b5 | b4 | b3 | b2 | b1) as in :func:`rdb_t.prepare_rdb_t_weights`.
    """
    def wk(k):
        w = p[f"conv{k}"]["w"]  # [3, 3, C_prefix, S]
        cp, s = w.shape[2], w.shape[3]
        srcs = [nf] + [gc] * ((cp - nf) // gc)
        blocks, off = [], 0
        for c in srcs:
            blk = w[:, :, off:off + c, :]          # [r, s, c, S]
            blk = blk.transpose(1, 3, 0, 2)        # [s, S, r, c]
            blocks.append(blk.reshape(3 * s, 3 * c))
            off += c
        out = jnp.concatenate(blocks, 1)           # [3·S, 3·C_prefix]
        if k == 2:
            # 1×1 shortcut rows: nonzero only at x's center-row columns.
            extra = jnp.zeros((gc, out.shape[1]), out.dtype)
            if conv1x1:
                w11 = p["conv1x1"]["w"][0, 0].T    # [gc, nf]
                extra = jax.lax.dynamic_update_slice(extra, w11, (0, nf))
            out = jnp.concatenate([out, extra], 0)  # [3·gc + gc, ·]
        return out.astype(dtype)

    bias = jnp.concatenate(
        [p["conv5"]["b"]] + [p[f"conv{t}"]["b"] for t in (4, 3, 2, 1)]
    ).astype(jnp.float32).reshape(-1, 1)
    return wk(1), wk(2), wk(3), wk(4), wk(5), bias


def _seed_prng(seed_ref):
    """Seed the core PRNG from the 2-word site seed + grid step (Mosaic
    accepts at most 2 seed values — fold program_id into word 1 with a
    Knuth-hash odd multiplier). Must be called identically by the forward
    and backward kernels so the noise bits replay."""
    gid = pl.program_id(0) * jnp.int32(-1640531527)  # 2654435761 as int32
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ gid)


def _kernel_normal(shape):
    """Standard normals from the TPU core's hardware PRNG (Box-Muller on two
    24-bit uniforms). Deterministic per (pltpu.prng_seed(...), draw order) —
    the custom-VJP backward replays the same bits instead of saving the
    noise. Not available in interpret mode (prng_seed has no CPU lowering),
    so callers gate on a real TPU backend."""
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    s8 = jnp.int32(8)
    u1 = (jax.lax.shift_right_logical(b1, s8).astype(jnp.float32)
          * (1.0 / (1 << 24)) + (0.5 / (1 << 24)))
    u2 = (jax.lax.shift_right_logical(b2, s8).astype(jnp.float32)
          * (1.0 / (1 << 24)))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(6.283185307179586 * u2)


def _col_masks(M: int, W: int, dtype):
    """Post-shift column-boundary masks [1, M]: l = output col > 0 (for the
    s=0 tap), r = output col < W-1 (for the s=2 tap)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    col = lane % W
    return (col > 0).astype(dtype), (col < W - 1).astype(dtype)


def _row_masks(M: int, m_img: int, W: int, dtype, packed: bool):
    """Pre-write row-boundary masks for the IM3 row taps (packed mode only —
    at one image per grid step the array-end zero fill suffices)."""
    if not packed:
        return {0: None, 1: None, 2: None}
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    pos = lane % m_img
    return {
        0: (pos >= W).astype(dtype),          # r=0 reads src[m−W]: needs a row above
        1: None,
        2: (pos < m_img - W).astype(dtype),   # r=2 reads src[m+W]: needs a row below
    }


def _rdb_ct_kernel(x_ref, w1, w2, w3, w4, w5, b_ref, *rest,
                   nf: int, gc: int, H: int, W: int, pack: int, slope: float,
                   res_scale: float, rrdb_scale: Optional[float] = None,
                   split_dots: bool = True, save: bool = False,
                   noise_sigma: Optional[float] = None,
                   noise_input: bool = False):
    rest = list(rest)
    res_ref = rest.pop(0) if rrdb_scale is not None else None
    seed_ref = rest.pop(0) if noise_sigma is not None else None
    o_ref = rest.pop(0)
    sv_ref = rest.pop(0) if save else None
    (im_ref,) = rest
    nz = None
    if noise_sigma is not None and not noise_input:
        # draw before any compute so the backward replays identical bits
        _seed_prng(seed_ref)
        nz = _kernel_normal((nf, pack * H * W))
    M = pack * H * W
    dt = x_ref.dtype
    f32 = jnp.float32

    maskl, maskr = _col_masks(M, W, f32)
    # IM3 row taps: tap r holds lane_shift(src, (r-1)·W) = source pixel one
    # row below (r=2) / same (r=1) / one row above (r=0)… n.b. shift>0 pulls
    # from HIGHER lane index. Row-crossing validity in packed mode:
    rmask = _row_masks(M, H * W, W, dt, packed=pack > 1)

    def append3(src, row0: int, c: int):
        for r in range(3):
            v = _lane_shift(src, (r - 1) * W)
            if rmask[r] is not None:
                v = v * rmask[r]
            im_ref[row0 + r * c: row0 + (r + 1) * c, :] = v

    def off3(k: int) -> int:
        return 3 * (nf + (k - 1) * gc) if k else 0

    bias = b_ref[:]

    def boff(j: int) -> int:
        return nf + (4 - j) * gc

    def stage_b(j: int, srows: int):
        return bias[boff(j):boff(j) + srows] if j < 5 else bias[0:srows]

    def combine(Y, s_out: int):
        # y = shift(Y0,-1)·l + Y1 + shift(Y2,+1)·r  (post-shift masks)
        return (_lane_shift(Y[0:s_out], -1) * maskl
                + Y[s_out:2 * s_out]
                + _lane_shift(Y[2 * s_out:3 * s_out], 1) * maskr)

    def full_dot(w_ref, k: int):
        return jnp.dot(w_ref[:], im_ref[0:off3(k), :],
                       preferred_element_type=f32)

    def prefix_dot(w_ref, k: int):
        # rows already in IM3 before the latest source's taps — independent
        # of that source, so it can issue while the VPU appends (split_dots).
        return jnp.dot(w_ref[:][:, 0:off3(k - 1)], im_ref[0:off3(k - 1), :],
                       preferred_element_type=f32)

    def fresh_dot(w_ref, k: int):
        return jnp.dot(w_ref[:][:, off3(k - 1):off3(k)],
                       im_ref[off3(k - 1):off3(k), :],
                       preferred_element_type=f32)

    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    x = x_ref[:]  # [nf, M]

    if split_dots:
        append3(x, 0, nf)
        x1 = lrelu(combine(full_dot(w1, 1), gc) + stage_b(1, gc)).astype(dt)
        y2 = prefix_dot(w2, 2)
        append3(x1, off3(1), gc)
        Y2 = y2 + fresh_dot(w2, 2)
        x2 = (lrelu(combine(Y2, gc) + stage_b(2, gc))
              + Y2[3 * gc:4 * gc]).astype(dt)
        y3 = prefix_dot(w3, 3)
        append3(x2, off3(2), gc)
        x3 = lrelu(combine(y3 + fresh_dot(w3, 3), gc)
                   + stage_b(3, gc)).astype(dt)
        y4 = prefix_dot(w4, 4)
        append3(x3, off3(3), gc)
        x4 = (lrelu(combine(y4 + fresh_dot(w4, 4), gc) + stage_b(4, gc))
              + x2.astype(f32)).astype(dt)
        y5 = prefix_dot(w5, 5)
        append3(x4, off3(4), gc)
        x5 = combine(y5 + fresh_dot(w5, 5), nf) + stage_b(5, nf)
    else:
        append3(x, 0, nf)
        x1 = lrelu(combine(full_dot(w1, 1), gc) + stage_b(1, gc)).astype(dt)
        append3(x1, off3(1), gc)
        Y2 = full_dot(w2, 2)                       # [4·gc, M]: 3 taps + c11
        l2 = lrelu(combine(Y2, gc) + stage_b(2, gc))
        x2 = (l2 + Y2[3 * gc:4 * gc]).astype(dt)
        append3(x2, off3(2), gc)
        x3 = lrelu(combine(full_dot(w3, 3), gc) + stage_b(3, gc)).astype(dt)
        append3(x3, off3(3), gc)
        l4 = lrelu(combine(full_dot(w4, 4), gc) + stage_b(4, gc))
        x4 = (l4 + x2.astype(f32)).astype(dt)
        append3(x4, off3(4), gc)
        x5 = combine(full_dot(w5, 5), nf) + stage_b(5, nf)
        if save:
            # training residuals: stage outputs (bit-exact IM3 rebuild in the
            # backward) + the pre-residual lrelu outputs l2/l4 (sign ⇒ mask)
            sv_ref[0 * gc:1 * gc, :] = x1
            sv_ref[1 * gc:2 * gc, :] = l2.astype(dt)
            sv_ref[2 * gc:3 * gc, :] = x2
            sv_ref[3 * gc:4 * gc, :] = x3
            sv_ref[4 * gc:5 * gc, :] = l4.astype(dt)
            sv_ref[5 * gc:6 * gc, :] = x4

    out = x5 * res_scale + x.astype(f32)
    if rrdb_scale is not None:
        out = out * rrdb_scale + res_ref[:].astype(f32)
    if noise_sigma is not None and not noise_input:
        # nESRGAN+ relative noise on the block output: out·(1 + σn). The
        # forward is identical for the detach variant (detach only changes
        # the adjoint); realisation contract is "rbg" (hardware RNG).
        out = out * (1.0 + noise_sigma * nz)
    outd = out.astype(dt)
    if noise_sigma is not None and noise_input:
        # pre-drawn noise rides in through seed_ref ([nf, M] VMEM); the
        # arithmetic matches the XLA path's ht + n·(σ·ht) in the kernel
        # dtype bit-for-bit, so switching noise_kernel never changes values.
        outd = outd + seed_ref[:] * (noise_sigma * outd)
    o_ref[:] = outd


def _rdb_ct_pipe_kernel(x_ref, w1, w2, w3, w4, w5, b_ref, *rest,
                        nf: int, gc: int, H: int, W: int, il: int,
                        slope: float, res_scale: float,
                        rrdb_scale: Optional[float] = None,
                        save: bool = False,
                        noise_sigma: Optional[float] = None,
                        noise_input: bool = False):
    """``il``-image software-pipelined variant: each grid step holds ``il``
    independent images; every stage emits ALL images' dots (MXU) before any
    image's combine/append (VPU), so Mosaic's scheduler can run image B's
    stage-k dot while image A's stage-k tap-append is still on the VPU. This
    is where part of the serial-dependency stall of the one-image kernel
    goes (measured v5e, batch 16 of 128²: 1.15 → 1.07 ms/RDB at il=2;
    at 32² crops: 0.078 → 0.066 at il=4)."""
    rest = list(rest)
    res_ref = rest.pop(0) if rrdb_scale is not None else None
    seed_ref = rest.pop(0) if noise_sigma is not None else None
    o_ref = rest.pop(0)
    sv_ref = rest.pop(0) if save else None
    (im_ref,) = rest
    m = H * W
    dt = x_ref.dtype
    f32 = jnp.float32
    nz = None
    if noise_sigma is not None and not noise_input:
        _seed_prng(seed_ref)
        nz = _kernel_normal((nf, il * m))

    maskl, maskr = _col_masks(m, W, f32)

    def im(i):  # this image's IM3 lane window
        return slice(i * m, (i + 1) * m)

    def append3(i, src, row0: int, c: int):
        for r in range(3):
            v = _lane_shift(src, (r - 1) * W)
            im_ref[row0 + r * c: row0 + (r + 1) * c, im(i)] = v

    def off3(k: int) -> int:
        return 3 * (nf + (k - 1) * gc) if k else 0

    bias = b_ref[:]

    def boff(j: int) -> int:
        return nf + (4 - j) * gc

    def stage_b(j: int, srows: int):
        return bias[boff(j):boff(j) + srows] if j < 5 else bias[0:srows]

    def combine(Y, s_out: int):
        return (_lane_shift(Y[0:s_out], -1) * maskl
                + Y[s_out:2 * s_out]
                + _lane_shift(Y[2 * s_out:3 * s_out], 1) * maskr)

    def dot(i, w_ref, k: int):
        return jnp.dot(w_ref[:], im_ref[0:off3(k), im(i)],
                       preferred_element_type=f32)

    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    R = range(il)
    xs = [x_ref[:, im(i)] for i in R]
    ws = (w1, w2, w3, w4, w5)

    def vpu_stage(i, k, Yk, x2_i):
        # combine + activation + tap-append for image i's stage k; returns
        # the stage output (and threads the x2 residual for stage 4).
        if k == 5:
            return combine(Yk, nf) + stage_b(5, nf)
        y = combine(Yk, gc) + stage_b(k, gc)
        lk = lrelu(y)
        xk = lk
        if k == 2:
            xk = xk + Yk[3 * gc:4 * gc]
        elif k == 4:
            xk = xk + x2_i.astype(f32)
        xk = xk.astype(dt)
        append3(i, xk, off3(k), gc)
        if save:
            # rows [x1; l2; x2; x3; l4; x4] — see the plain kernel's `save`
            xrow = {1: 0, 2: 2, 3: 3, 4: 5}[k]
            sv_ref[xrow * gc:(xrow + 1) * gc, im(i)] = xk
            if k in (2, 4):
                lrow = {2: 1, 4: 4}[k]
                sv_ref[lrow * gc:(lrow + 1) * gc, im(i)] = lk.astype(dt)
        return xk

    def emit_out(i, x5):
        out = x5 * res_scale + xs[i].astype(f32)
        if rrdb_scale is not None:
            out = out * rrdb_scale + res_ref[:, im(i)].astype(f32)
        if noise_sigma is not None and not noise_input:
            out = out * (1.0 + noise_sigma * nz[:, im(i)])
        outd = out.astype(dt)
        if noise_sigma is not None and noise_input:
            # pre-drawn noise input (see _rdb_ct_kernel): bit-matches the
            # XLA path's ht + n·(σ·ht) in the kernel dtype.
            outd = outd + seed_ref[:, im(i)] * (noise_sigma * outd)
        o_ref[:, im(i)] = outd

    # Stage-synchronous emission: all images' stage-k dots (MXU), then all
    # images' stage-k combine/append (VPU). A fully SKEWED order (dotA1,
    # dotB1, vpuA1, dotA2, vpuB1, …) was measured IDENTICAL (1.073 vs 1.066
    # ms/RDB, v5e 2026-08-17) — Mosaic's scheduler already extracts the
    # available cross-image overlap from the dependency graph; the remaining
    # gap to the ~0.93 ms dot floor is not an ordering artifact.
    x2s = [None, None, None, None][:il]
    last = list(x2s)
    Y = list(x2s)
    for i in R:
        append3(i, xs[i], 0, nf)
    for k in range(1, 6):
        for i in R:
            Y[i] = dot(i, ws[k - 1], k)
        for i in R:
            last[i] = vpu_stage(i, k, Y[i], x2s[i])
            if k == 2:
                x2s[i] = last[i]
    for i in R:
        emit_out(i, last[i])


@functools.partial(jax.jit, static_argnames=("nf", "gc", "h", "w", "n_img",
                                             "pack", "slope", "res_scale",
                                             "rrdb_scale", "split_dots",
                                             "interleave", "save_residuals",
                                             "noise_sigma", "noise_input",
                                             "alias_res", "interpret"))
def rdb_ct(x, w1, w2, w3, w4, w5, bias, res=None, noise_seed=None, *,
           nf: int, gc: int,
           h: int, w: int, n_img: int = 1, pack: Optional[int] = None,
           slope: float = 0.2, res_scale: float = 0.2,
           rrdb_scale: Optional[float] = None, split_dots: bool = True,
           interleave: Optional[int] = None, save_residuals: bool = False,
           noise_sigma: Optional[float] = None, noise_input: bool = False,
           alias_res: bool = False,
           interpret: bool = False):
    """Column-merged fused RDB forward: x ``[nf, n_img·H·W]`` → same shape.

    Weights from :func:`prepare_rdb_ct_weights`. ``interleave`` > 1 selects
    the software-pipelined multi-image kernel (``_rdb_ct_pipe_kernel``) —
    mutually exclusive with ``pack`` > 1. Other args as :func:`rdb_t.rdb_t`.
    ``save_residuals`` additionally returns the training residuals
    ``[6·gc, M]`` (rows x1|l2|x2|x3|l4|x4) that let ``_rdb_ct_bwd`` skip the
    stage-1..4 forward recompute (12 of its 56 MXU pass-tiles); requires
    ``split_dots=False`` (the VJP path always uses that or the pipe kernel).
    """
    cin, mtot = x.shape
    m_img = h * w
    assert cin == nf and mtot == n_img * m_img, (x.shape, nf, n_img, h, w)
    ktot = 3 * (nf + 4 * gc)
    if pack is None:
        pack = 1
    if interleave is None:
        interleave = 1
    assert pack == 1 or interleave == 1, (pack, interleave)
    assert n_img % (pack * interleave) == 0, (n_img, pack, interleave)
    if max(pack, interleave) > 8:
        # Measured: pack=16 makes Mosaic emit an executable too large to
        # compile (each packed image unrolls the full stage chain); reject
        # up front with an actionable error instead of a backend ICE.
        raise ValueError(
            f"pack/interleave > 8 is unsupported (got pack={pack}, "
            f"interleave={interleave}): the per-image unroll makes the "
            "Mosaic executable exceed its size limit. Use <= 8 and let the "
            "grid cover the batch.")
    if interleave > 1:
        kernel = functools.partial(_rdb_ct_pipe_kernel, nf=nf, gc=gc, H=h,
                                   W=w, il=interleave, slope=slope,
                                   res_scale=res_scale,
                                   rrdb_scale=rrdb_scale,
                                   save=save_residuals,
                                   noise_sigma=noise_sigma,
                                   noise_input=noise_input)
        pack = interleave  # block/grid sizing below is shared
    else:
        assert not (save_residuals and split_dots)
        kernel = functools.partial(_rdb_ct_kernel, nf=nf, gc=gc, H=h, W=w,
                                   pack=pack, slope=slope,
                                   res_scale=res_scale,
                                   rrdb_scale=rrdb_scale,
                                   split_dots=split_dots,
                                   save=save_residuals,
                                   noise_sigma=noise_sigma,
                                   noise_input=noise_input)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    img = lambda rows=None: pl.BlockSpec((rows or nf, pack * m_img),
                                         lambda g: (0, g),
                                         memory_space=pltpu.VMEM)
    in_specs = [
        img(),
        vfull(w1.shape), vfull(w2.shape), vfull(w3.shape),
        vfull(w4.shape), vfull(w5.shape), vfull(bias.shape),
    ]
    args = [x, w1, w2, w3, w4, w5, bias]
    if res is not None:
        assert rrdb_scale is not None
        in_specs.append(img())
        args.append(res)
    else:
        assert rrdb_scale is None
    if noise_sigma is not None:
        # noise_input: noise_seed is the pre-drawn [nf, mtot] noise tensor
        # (VMEM, per-image blocks); otherwise the 2-word PRNG seed (SMEM).
        in_specs.append(img() if noise_input
                        else pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(noise_seed)
    out_specs = img()
    out_shape = jax.ShapeDtypeStruct((nf, mtot), x.dtype)
    if save_residuals:
        out_specs = (out_specs, img(6 * gc))
        out_shape = (out_shape, jax.ShapeDtypeStruct((6 * gc, mtot), x.dtype))
    # alias_res: the RRDB-epilogue call's res input (the block input h0, dead
    # after this call) donates its buffer to the output — inside lax.scan the
    # new carry then lands IN the old carry's buffer and XLA's per-iteration
    # [nf, B·h·w] carry copy disappears (measured 4.7 ms/forward at batch 32).
    aliases = {7: 0} if (alias_res and res is not None) else {}  # res -> out
    return pl.pallas_call(
        kernel,
        grid=(n_img // pack,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ktot, pack * m_img), x.dtype)],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# generic column-merged 3×3 conv (tail/epilogue use)
# ---------------------------------------------------------------------------


def prepare_conv_ct_weights(w, b=None, dtype=jnp.bfloat16):
    """``[3, 3, Cin, Cout]`` HWIO conv weights → ``[3·Cout, 3·Cin]``
    column-merged matrix (+ ``[Cout, 1]`` f32 bias or None)."""
    cin, cout = w.shape[2], w.shape[3]
    wm = w.transpose(1, 3, 0, 2).reshape(3 * cout, 3 * cin).astype(dtype)
    bm = None if b is None else b.astype(jnp.float32).reshape(-1, 1)
    return wm, bm


def _conv_ct_kernel(x_ref, w_ref, *rest, cin: int, cout: int, H: int, W: int,
                    il: int, slope: Optional[float], res_first: bool):
    """y = conv3x3(x) (+ res) [+ leaky-relu]; ``il`` images per grid step in
    the stage-synchronous order of ``_rdb_ct_pipe_kernel``."""
    have_bias = len(rest) == (4 if res_first else 3)
    if res_first:
        if have_bias:
            b_ref, res_ref, o_ref, im_ref = rest
        else:
            res_ref, o_ref, im_ref = rest
    else:
        if have_bias:
            b_ref, o_ref, im_ref = rest
        else:
            o_ref, im_ref = rest
    m = H * W
    f32 = jnp.float32
    dt = x_ref.dtype
    maskl, maskr = _col_masks(m, W, f32)

    def im(i):
        return slice(i * m, (i + 1) * m)

    def append3(i, src):
        for r in range(3):
            im_ref[r * cin:(r + 1) * cin, im(i)] = _lane_shift(src, (r - 1) * W)

    def combine(Y):
        return (_lane_shift(Y[0:cout], -1) * maskl
                + Y[cout:2 * cout]
                + _lane_shift(Y[2 * cout:3 * cout], 1) * maskr)

    R = range(il)
    for i in R:
        append3(i, x_ref[:, im(i)])
    Ys = [jnp.dot(w_ref[:], im_ref[:, im(i)], preferred_element_type=f32)
          for i in R]
    for i in R:
        y = combine(Ys[i])
        if have_bias:
            y = y + b_ref[:]
        if res_first:
            y = y + res_ref[:, im(i)].astype(f32)
        if slope is not None:
            y = jnp.where(y >= 0, y, y * slope)
        o_ref[:, im(i)] = y.astype(dt)


@functools.partial(jax.jit, static_argnames=("cin", "cout", "h", "w", "n_img",
                                             "interleave", "slope",
                                             "interpret"))
def conv3x3_ct(x, wm, bias=None, res=None, *, cin: int, cout: int, h: int,
               w: int, n_img: int = 1, interleave: int = 1,
               slope: Optional[float] = None, interpret: bool = False):
    """Column-merged SAME 3×3 conv on ``[Cin, n_img·H·W]`` transposed-layout
    input → ``[Cout, n_img·H·W]``. ``wm``/``bias`` from
    :func:`prepare_conv_ct_weights`; ``res`` is an optional residual added
    before the (optional leaky-relu) activation."""
    m_img = h * w
    assert x.shape == (cin, n_img * m_img), (x.shape, cin, n_img, h, w)
    il = interleave if n_img % interleave == 0 else 1
    kernel = functools.partial(_conv_ct_kernel, cin=cin, cout=cout, H=h, W=w,
                               il=il, slope=slope, res_first=res is not None)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((c, il * m_img), lambda g: (0, g),
                                 memory_space=pltpu.VMEM)
    in_specs = [blk(cin), vfull(wm.shape)]
    args = [x, wm]
    if bias is not None:
        in_specs.append(vfull(bias.shape))
        args.append(bias)
    if res is not None:
        in_specs.append(blk(cout))
        args.append(res)
    return pl.pallas_call(
        kernel,
        grid=(n_img // il,),
        in_specs=in_specs,
        out_specs=blk(cout),
        out_shape=jax.ShapeDtypeStruct((cout, n_img * m_img), x.dtype),
        scratch_shapes=[pltpu.VMEM((3 * cin, il * m_img), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# generic 3×3 conv backward + custom VJP (training tail/epilogue use)
# ---------------------------------------------------------------------------


def _conv3x3_ct_bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, db_ref,
                           im_ref, *, cin: int, cout: int, H: int, W: int,
                           il: int):
    """Adjoint of ``_conv_ct_kernel`` (bias, residual, no activation):
    dW' = combine_adj(g) · IM3ᵀ, dx = untap3(W'ᵀ · combine_adj(g)),
    db = Σ g. dW/db accumulate across the grid (f32 blocks revisited)."""
    m = H * W
    f32 = jnp.float32
    dt = x_ref.dtype
    maskl, maskr = _col_masks(m, W, f32)

    def im(i):
        return slice(i * m, (i + 1) * m)

    def combine_adj(dy):
        return jnp.concatenate([
            _lane_shift(dy * maskl, 1), dy, _lane_shift(dy * maskr, -1)], 0)

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + val

    dw_acc = None
    db_acc = None
    for i in range(il):
        for r in range(3):
            im_ref[r * cin:(r + 1) * cin, im(i)] = \
                _lane_shift(x_ref[:, im(i)], (r - 1) * W)
        g = g_ref[:, im(i)].astype(f32)
        dY = combine_adj(g).astype(dt)
        dwi = jax.lax.dot_general(dY, im_ref[:, im(i)],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        dbi = jnp.sum(g, axis=1, keepdims=True)
        dw_acc = dwi if dw_acc is None else dw_acc + dwi
        db_acc = dbi if db_acc is None else db_acc + dbi
        dim = jax.lax.dot_general(w_ref[:], dY, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        dx = (_lane_shift(dim[0:cin], W)
              + dim[cin:2 * cin]
              + _lane_shift(dim[2 * cin:3 * cin], -W))
        dx_ref[:, im(i)] = dx.astype(dt)
    acc(dw_ref, dw_acc)
    acc(db_ref, db_acc)


@functools.partial(jax.jit, static_argnames=("cin", "cout", "h", "w", "n_img",
                                             "interleave", "interpret"))
def _conv3x3_ct_bwd(x, wm, g, *, cin: int, cout: int, h: int, w: int,
                    n_img: int, interleave: int = 1,
                    interpret: bool = False):
    m_img = h * w
    il = interleave if n_img % interleave == 0 else 1
    kernel = functools.partial(_conv3x3_ct_bwd_kernel, cin=cin, cout=cout,
                               H=h, W=w, il=il)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda c: pl.BlockSpec((c, il * m_img), lambda g_: (0, g_),
                                 memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(n_img // il,),
        in_specs=[blk(cin), vfull(wm.shape), blk(cout)],
        out_specs=(blk(cin), vfull(wm.shape), vfull((cout, 1))),
        out_shape=(jax.ShapeDtypeStruct((cin, n_img * m_img), x.dtype),
                   jax.ShapeDtypeStruct(wm.shape, f32),
                   jax.ShapeDtypeStruct((cout, 1), f32)),
        scratch_shapes=[pltpu.VMEM((3 * cin, il * m_img), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, wm, g)


@functools.lru_cache(maxsize=None)
def _make_conv3x3_ct_diff(cin: int, cout: int, h: int, w: int, n_img: int,
                          interleave: int, interpret: bool):
    @jax.custom_vjp
    def f(x, wm, bias, res):
        return conv3x3_ct(x, wm.astype(x.dtype), bias, res, cin=cin,
                          cout=cout, h=h, w=w, n_img=n_img,
                          interleave=interleave, interpret=interpret)

    def fwd(x, wm, bias, res):
        return f(x, wm, bias, res), (x, wm)

    def bwd(saved, g):
        x, wm = saved
        dx, dwm, db = _conv3x3_ct_bwd(x, wm.astype(x.dtype), g.astype(x.dtype),
                                      cin=cin, cout=cout, h=h, w=w,
                                      n_img=n_img, interleave=interleave,
                                      interpret=interpret)
        dx, dwm, db = jax.lax.optimization_barrier((dx, dwm, db))
        return dx, dwm.astype(wm.dtype), db, g

    f.defvjp(fwd, bwd)
    return f


def conv3x3_ct_diff(x, wm, bias, res, *, cin: int, cout: int, h: int, w: int,
                    n_img: int = 1, interleave: int = 1,
                    interpret: bool = False):
    """Differentiable :func:`conv3x3_ct` (bias + residual, no activation) —
    the training twin of the inference trunk-conv/global-residual fold.
    Pass ``wm`` in the master (f32) dtype; it is cast to ``x.dtype`` for
    compute and ``dwm`` comes back f32 (in-kernel batch accumulation).
    ``dres`` is the output cotangent unchanged (identity residual path)."""
    assert bias is not None and res is not None
    fn = _make_conv3x3_ct_diff(cin, cout, h, w, n_img, interleave, interpret)
    return fn(x, wm, bias, res)


# ---------------------------------------------------------------------------
# backward (training)
# ---------------------------------------------------------------------------


def _rdb_ct_bwd_kernel(x_ref, w1, w2, w3, w4, w5, b_ref, g_ref, sv_ref,
                       *rest,
                       nf: int, gc: int, H: int, W: int, pack: int,
                       slope: float, res_scale: float,
                       noise_sigma: Optional[float] = None,
                       noise_detach: bool = False,
                       noise_input: bool = False):
    """Adjoint of ``_rdb_ct_kernel`` for one image group; dW/db accumulate
    across the grid (f32 output blocks revisited every step). Same structure
    as ``rdb_t._rdb_t_bwd_kernel`` but in the column-merged decomposition:
    the combine's adjoint scatters the cotangent into the three column-tap
    row groups (two masked lane-shifts), ``dW'_k = dY'_k · IM3ᵀ`` emits
    3·S rows per MXU pass instead of S, and the tap-append adjoint sums
    three reverse row-shifts instead of nine. The stage-1..4 forward is NOT
    recomputed: the forward's ``save_residuals`` output (``sv_ref``, rows
    x1|l2|x2|x3|l4|x4) rebuilds IM3 bit-exactly with VPU tap-appends only,
    and the lrelu masks come from the saved pre-residual activations' signs
    (lrelu preserves sign) — 12 of the 56 MXU pass-tiles gone.

    With ``noise_sigma`` the forward applied in-kernel hardware-RNG noise
    y = out·(1+σn); the adjoint re-seeds the PRNG identically and scales the
    incoming cotangent by (1+σn) up front (detach variant: no scaling)."""
    rest = list(rest)
    seed_ref = rest.pop(0) if noise_sigma is not None else None
    (dx_ref, dw1_ref, dw2_ref, dw3_ref, dw4_ref, dw5_ref, db_ref,
     im_ref, dim_ref) = rest
    M = pack * H * W
    dt = x_ref.dtype
    f32 = jnp.float32
    if noise_sigma is not None and not noise_detach:
        if noise_input:
            noise_fac = 1.0 + noise_sigma * seed_ref[:].astype(f32)
        else:
            _seed_prng(seed_ref)
            noise_fac = 1.0 + noise_sigma * _kernel_normal((nf, M))

    maskl, maskr = _col_masks(M, W, f32)
    rmask = _row_masks(M, H * W, W, dt, packed=pack > 1)
    rmask32 = {k: (None if v is None else v.astype(f32))
               for k, v in rmask.items()}

    def append3(src, row0: int, c: int):
        for r in range(3):
            v = _lane_shift(src, (r - 1) * W)
            if rmask[r] is not None:
                v = v * rmask[r]
            im_ref[row0 + r * c: row0 + (r + 1) * c, :] = v

    def untap3(row0: int, c: int):
        acc = jnp.zeros((c, M), f32)
        for r in range(3):
            blk = dim_ref[row0 + r * c: row0 + (r + 1) * c, :]
            if rmask32[r] is not None:
                blk = blk * rmask32[r]
            acc = acc + _lane_shift(blk, -(r - 1) * W)
        return acc

    def off3(k: int) -> int:
        return 3 * (nf + (k - 1) * gc) if k else 0

    bias = b_ref[:]

    def boff(j: int) -> int:
        return nf + (4 - j) * gc

    def stage_b(j: int, srows: int):
        return bias[boff(j):boff(j) + srows] if j < 5 else bias[0:srows]

    def combine(Y, s_out: int):
        return (_lane_shift(Y[0:s_out], -1) * maskl
                + Y[s_out:2 * s_out]
                + _lane_shift(Y[2 * s_out:3 * s_out], 1) * maskr)

    def combine_adj(dy):
        # y = shift(Y0,-1)·l + Y1 + shift(Y2,+1)·r  ⇒
        # dY0 = shift(dy·l, +1), dY1 = dy, dY2 = shift(dy·r, −1)
        return jnp.concatenate([
            _lane_shift(dy * maskl, 1), dy, _lane_shift(dy * maskr, -1)], 0)

    dlrelu = lambda m, t: jnp.where(m, t, t * slope)

    # ---- IM3 rebuild from the forward's saved residuals (VPU only) ----
    x = x_ref[:]
    # bf16 compares unsupported on TPU → cast to f32 first. Known edge: a
    # pre-activation z ∈ (-2⁻¹³³·5, 0) makes l = 0.2·z underflow to -0.0 in
    # the bf16 residual, and (-0.0 >= 0) puts the mask on the slope-1 side
    # where the true derivative is 0.2 — a measure-zero set (subnormal
    # pre-activations do not occur at trained scales); the f32-recompute
    # path this replaced was exact there.
    sgn = lambda v: v.astype(f32) >= 0
    append3(x, 0, nf)
    x1 = sv_ref[0 * gc:1 * gc, :]
    m1 = sgn(x1)
    append3(x1, off3(1), gc)
    x2 = sv_ref[2 * gc:3 * gc, :]
    m2 = sgn(sv_ref[1 * gc:2 * gc, :])     # sign of l2 = lrelu(z2)
    append3(x2, off3(2), gc)
    x3 = sv_ref[3 * gc:4 * gc, :]
    m3 = sgn(x3)
    append3(x3, off3(3), gc)
    x4 = sv_ref[5 * gc:6 * gc, :]
    m4 = sgn(sv_ref[4 * gc:5 * gc, :])     # sign of l4 = lrelu(z4)
    append3(x4, off3(4), gc)
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

    def dw(dYk, k):  # dW'_k = dY'_k · IM3[0:K_k]ᵀ — [3S, M]·[M, K]
        return jax.lax.dot_general(dYk, im_ref[0:off3(k), :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def dim_add(wref, dYk, k, assign=False):
        # dIM3[0:K_k] (+)= W'_kᵀ · dY'_k — [K, 3S]·[3S, M]
        v = jax.lax.dot_general(wref[:], dYk, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if assign:
            dim_ref[0:off3(k), :] = v
        else:
            dim_ref[0:off3(k), :] = dim_ref[0:off3(k), :] + v

    g = g_ref[:].astype(f32)
    if noise_sigma is not None and not noise_detach:
        g = g * noise_fac

    # out = x5·β + x; x5 = combine(Y5) + b5
    dz5 = g * res_scale
    dY5 = combine_adj(dz5).astype(dt)
    dim_add(w5, dY5, 5, assign=True)
    dx4 = untap3(off3(4), gc)
    acc(dw5_ref, dw(dY5, 5))

    # x4 = lrelu(z4) + x2
    dz4 = dlrelu(m4, dx4)
    dY4 = combine_adj(dz4).astype(dt)
    dim_add(w4, dY4, 4)
    dx3 = untap3(off3(3), gc)
    acc(dw4_ref, dw(dY4, 4))

    # x3 = lrelu(z3)
    dz3 = dlrelu(m3, dx3)
    dY3 = combine_adj(dz3).astype(dt)
    dim_add(w3, dY3, 3)
    dx2 = untap3(off3(2), gc) + dx4            # + the x4 += x2 residual
    acc(dw3_ref, dw(dY3, 3))

    # x2 = lrelu(z2) + c11; the c11 rows of W2' route dIM3 into x's
    # center-row block, so untap3 recovers the 1×1 path without extra dots.
    dz2 = dlrelu(m2, dx2)
    dY2 = jnp.concatenate([combine_adj(dz2), dx2], 0).astype(dt)
    dim_add(w2, dY2, 2)
    dx1 = untap3(off3(1), gc)
    acc(dw2_ref, dw(dY2, 2))

    # x1 = lrelu(z1)
    dz1 = dlrelu(m1, dx1)
    dY1 = combine_adj(dz1).astype(dt)
    dim_add(w1, dY1, 1)
    dx0 = untap3(0, nf) + g                    # x: row taps (+c11 inside) + skip
    acc(dw1_ref, dw(dY1, 1))

    dx_ref[:] = dx0.astype(dt)

    # bias is added post-combine: db_k = Σ_m dz_k; rows [b5|b4|b3|b2|b1]
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
                                             "noise_sigma", "noise_detach",
                                             "noise_input", "interpret"))
def _rdb_ct_bwd(x, w1, w2, w3, w4, w5, bias, g, sv, noise_seed=None, *,
                nf: int, gc: int,
                h: int, w: int, n_img: int, pack: Optional[int] = None,
                slope: float, res_scale: float,
                noise_sigma: Optional[float] = None,
                noise_detach: bool = False, noise_input: bool = False,
                interpret: bool = False):
    cin, mtot = x.shape
    m_img = h * w
    ktot = 3 * (nf + 4 * gc)
    if pack is None:
        pack = 1
    assert n_img % pack == 0, (n_img, pack)
    kernel = functools.partial(_rdb_ct_bwd_kernel, nf=nf, gc=gc, H=h, W=w,
                               pack=pack, slope=slope, res_scale=res_scale,
                               noise_sigma=noise_sigma,
                               noise_detach=noise_detach,
                               noise_input=noise_input)
    vfull = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    img = lambda rows=None: pl.BlockSpec((rows or nf, pack * m_img),
                                         lambda g: (0, g),
                                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((nf, mtot), x.dtype),            # dx
        jax.ShapeDtypeStruct(w1.shape, f32),
        jax.ShapeDtypeStruct(w2.shape, f32),
        jax.ShapeDtypeStruct(w3.shape, f32),
        jax.ShapeDtypeStruct(w4.shape, f32),
        jax.ShapeDtypeStruct(w5.shape, f32),
        jax.ShapeDtypeStruct(bias.shape, f32),
    )
    out_specs = (img(),) + tuple(vfull(s.shape) for s in out_shapes[1:])
    return pl.pallas_call(
        kernel,
        grid=(n_img // pack,),
        in_specs=[
            img(),
            vfull(w1.shape), vfull(w2.shape), vfull(w3.shape),
            vfull(w4.shape), vfull(w5.shape), vfull(bias.shape),
            img(),
            img(6 * gc),
        ] + ([img() if noise_input else pl.BlockSpec(memory_space=pltpu.SMEM)]
             if noise_sigma is not None else []),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((ktot, pack * m_img), x.dtype),
                        pltpu.VMEM((ktot, pack * m_img), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(x, w1, w2, w3, w4, w5, bias, g, sv,
      *([] if noise_sigma is None else [noise_seed]))


@functools.lru_cache(maxsize=None)
def _make_rdb_ct_diff(nf: int, gc: int, h: int, w: int, n_img: int,
                      fwd_interleave, bwd_pack, slope: float,
                      res_scale: float, noise_sigma, noise_detach: bool,
                      noise_input: bool, interpret: bool):
    nkw = dict(noise_sigma=noise_sigma, noise_input=noise_input)
    # detach noise: the adjoint is the identity, so the backward kernel
    # doesn't need the noise at all — don't DMA the [nf, M] tensor into it.
    bwd_nkw = (dict(noise_sigma=None, noise_input=False)
               if (noise_input and noise_detach) else nkw)

    @jax.custom_vjp
    def f(x, w1, w2, w3, w4, w5, bias, seed):
        kdt = x.dtype
        ws = tuple(wi.astype(kdt) for wi in (w1, w2, w3, w4, w5))
        return rdb_ct(x, *ws, bias, noise_seed=seed, nf=nf, gc=gc, h=h, w=w,
                      n_img=n_img, interleave=fwd_interleave, slope=slope,
                      res_scale=res_scale, split_dots=False,
                      interpret=interpret, **nkw)

    def fwd(x, w1, w2, w3, w4, w5, bias, seed):
        kdt = x.dtype
        ws = tuple(wi.astype(kdt) for wi in (w1, w2, w3, w4, w5))
        out, sv = rdb_ct(x, *ws, bias, noise_seed=seed, nf=nf, gc=gc, h=h,
                         w=w, n_img=n_img, interleave=fwd_interleave,
                         slope=slope, res_scale=res_scale, split_dots=False,
                         save_residuals=True, interpret=interpret, **nkw)
        return out, (x, sv, w1, w2, w3, w4, w5, bias, seed)

    def bwd(res, g):
        x, sv, w1, w2, w3, w4, w5, bias, seed = res
        kdt = x.dtype
        ws = tuple(wi.astype(kdt) for wi in (w1, w2, w3, w4, w5))
        outs = _rdb_ct_bwd(x, *ws, bias.astype(jnp.float32), g.astype(kdt),
                           sv, seed, nf=nf, gc=gc, h=h, w=w, n_img=n_img,
                           pack=bwd_pack, slope=slope, res_scale=res_scale,
                           noise_detach=noise_detach, interpret=interpret,
                           **bwd_nkw)
        # Same scoped-vmem fusion trap as rdb_t (see rdb_t._make_rdb_t_diff):
        # keep the pallas call out of lax.scan's gradient-stacking fusion.
        outs = jax.lax.optimization_barrier(outs)
        dx, dw1, dw2, dw3, dw4, dw5, dbias = outs
        grads = (dw1, dw2, dw3, dw4, dw5, dbias)
        prim = (w1, w2, w3, w4, w5, bias)
        import numpy as np

        if seed is None:
            seed_ct = None
        elif noise_input:
            # tensor-valued noise input: symbolic zero cotangent (the noise
            # draw has no differentiable inputs upstream — XLA DCEs this)
            seed_ct = jnp.zeros_like(seed)
        else:
            seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
        return (dx,) + tuple(dg.astype(p.dtype)
                             for dg, p in zip(grads, prim)) + (seed_ct,)

    f.defvjp(fwd, bwd)
    return f


def rdb_ct_diff(x, w1, w2, w3, w4, w5, bias, *, nf: int, gc: int, h: int,
                w: int, n_img: int = 1, fwd_interleave: Optional[int] = None,
                bwd_pack: Optional[int] = None, slope: float = 0.2,
                res_scale: float = 0.2, noise_seed=None,
                noise_sigma: Optional[float] = None,
                noise_detach: bool = False, noise_input: bool = False,
                interpret: bool = False):
    """Differentiable column-merged RDB: forward = :func:`rdb_ct`, backward =
    ``_rdb_ct_bwd``. Pass weights in the master (f32) dtype — they are cast
    to ``x.dtype`` for compute inside, and gradients come back in the master
    dtype (f32 batch accumulation inside the kernel). ``noise_sigma`` +
    ``noise_seed`` apply the nESRGAN+ relative noise in-kernel: with
    ``noise_input=False`` the seed is a 2-word PRNG seed and the hardware
    RNG draws the bits (TPU only; the backward replays them); with
    ``noise_input=True`` the seed IS the pre-drawn ``[nf, n_img·h·w]``
    noise tensor in ``x.dtype`` — the epilogue multiply and the cotangent
    scale ride inside the kernels (works in interpret mode too)."""
    fn = _make_rdb_ct_diff(nf, gc, h, w, n_img, fwd_interleave, bwd_pack,
                           slope, res_scale, noise_sigma, noise_detach,
                           noise_input, interpret)
    return fn(x, w1, w2, w3, w4, w5, bias, noise_seed)
