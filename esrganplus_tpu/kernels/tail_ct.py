"""Pallas TPU kernels: the transposed-layout upsample tail (inference).

The XLA tail was 37.4 ms of the 162 ms batch-32 flagship forward (trace,
NOTES_ROUND3.md): hr_conv0 ran at 39% efficiency (64 channels fill half the
128-lane tile in NHWC), hr_conv1 at ~7%, and the two pixel-shuffle/relayout
copy groups moved >1 GB of HBM. This module keeps the trunk kernel's
``[C, pixels-in-lanes]`` layout through up1/up2/HR convs so channels never
touch the lane dimension, and represents the growing x-resolution as
**column-phase planes** (plane ``p`` of ``P`` holds image columns
``X ≡ p (mod P)``), which keeps every conv a lane-shift + dot on the same
128-lane row-major geometry:

  * ``upfold_ct`` — nearest-×2-upsample + 3×3 conv + lrelu in one kernel
    (reference ``block.py:315-322`` upconv_blcok). The nearest-up duplicates
    pixels, so the 9 HR taps collapse onto a 2×2 grid of distinct source
    taps (cf. the XLA-path fold at ``models/rrdb.py:388``, which pays 9 LR
    taps with structural zeros — here the fold is dense). Output y-phases
    pack into channels (d·C+c), output x-phases into 2P planes. Per source
    plane the whole conv is two fully-dense ``[4C, 2C] @ [2C, M]`` dots
    (d=0/d=1 row-tap windows of a 3-copy im buffer) — for C=64 both dims
    are exact multiples of the 128 MXU tile: zero padding waste, ~2.1×
    fewer MACs than the XLA fold.
  * ``conv_hr_ct`` — hr_conv0 (+lrelu) and hr_conv1 fused in one kernel on
    P=4-phase planes; hr_conv0's output never round-trips HBM, and
    hr_conv1's 3-row output (2.3% lane utilisation under XLA) becomes a
    small extra dot on rows.

Both kernels run a ``(image, row-stripe)`` grid: row taps only need a
±halo-row window, which arrives as small XLA-prepared edge tensors
(``stripe_edges``) rather than overlapping blocks, so VMEM stays flat in
image size and batch (no compile cliff, no whole-image VMEM gate).

Phase algebra (derivation in the docstrings below): with input planes
``p ∈ [0,P)`` and a 3×3 tap offset ``s ∈ {0,1,2}``, the source column of
output plane ``q`` is ``t = q+s-1`` (plain conv) or ``t = ⌊(q+s-1)/2⌋``
(after nearest-×2), living in plane ``t mod P`` at lane shift ``⌊t/P⌋``
— always ∈ {-1, 0, +1}, handled exactly like the trunk kernel's column
taps (post-dot lane shift + boundary mask).
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


# ---------------------------------------------------------------------------
# static phase-group metadata
# ---------------------------------------------------------------------------


def upfold_groups(P: int):
    """Per source plane: the (q, t) pairs it feeds after a nearest-×2 fold.

    Output plane q's two distinct source columns are t ∈ {⌊(q-1)/2⌋,
    ⌊(q+1)/2⌋}; each lives in source plane ``t mod P`` with lane shift
    ``⌊t/P⌋``. Every plane gets exactly 4 pairs (2·2P / P · 2 = 4)."""
    groups = {p: [] for p in range(P)}
    for q in range(2 * P):
        for t in sorted({(q + s - 1) // 2 for s in range(3)}):
            groups[t % P].append((q, t // P, t))
    assert all(len(g) == 4 for g in groups.values()), groups
    return groups


def conv_groups(P: int):
    """Per source plane: (q, s) pairs for a plain (non-upsampling) 3×3 conv
    on P column-phase planes. Exactly 3 per plane."""
    groups = {p: [] for p in range(P)}
    for q in range(P):
        for s in range(3):
            t = q + s - 1
            groups[t % P].append((q, s, t // P))
    assert all(len(g) == 3 for g in groups.values()), groups
    return groups


# ---------------------------------------------------------------------------
# weight preparation (host/jit-traced jnp; static indexing only)
# ---------------------------------------------------------------------------


def prepare_upfold_ct(w, b, P: int, dtype=jnp.bfloat16):
    """Upconv weights ``[3, 3, C, CO]`` (HWIO) → per-(plane, d) dense dot
    blocks ``[P, 2, 4·CO, 2·C]``.

    Row layout: group-major (the plane's 4 (q,t) pairs in upfold_groups
    order) then c_out. Column layout: jr ∈ {0,1} (row-tap window offset;
    actual row shift ρ = d-1+jr) then c_in. Entry = Σ of w[r, s] over the
    HR taps (r, s) that collapse onto (ρ, t) — the dense 2×2 fold."""
    C, CO = w.shape[2], w.shape[3]
    groups = upfold_groups(P)
    planes = []
    for p in range(P):
        per_d = []
        for d in (0, 1):
            rows = []
            for (q, sig, t) in groups[p]:
                blk = jnp.zeros((2, C, CO), w.dtype)
                for jr in (0, 1):
                    rho = d - 1 + jr
                    acc = jnp.zeros((C, CO), w.dtype)
                    for r in range(3):
                        if (d + r - 1) // 2 != rho:
                            continue
                        for s in range(3):
                            if (q + s - 1) // 2 == t:
                                acc = acc + w[r, s]
                    blk = blk.at[jr].set(acc)
                # [CO, 2, C] -> [CO, 2C]
                rows.append(blk.transpose(2, 0, 1).reshape(CO, 2 * C))
            per_d.append(jnp.concatenate(rows, 0))        # [4·CO, 2C]
        planes.append(jnp.stack(per_d))
    wd = jnp.stack(planes).astype(dtype)                  # [P, 2, 4CO, 2C]
    # zeros (not None) for a bias-less conv: the kernels unconditionally
    # take a VMEM bias operand, and a [CO, 1] zeros block costs nothing
    bias = (jnp.zeros((w.shape[-1], 1), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(-1, 1))
    return wd, bias


def prepare_convxp_ct(w, b, P: int, dtype=jnp.bfloat16):
    """Plain 3×3 conv weights ``[3, 3, C, CO]`` → per-plane column-merged
    blocks ``[P, 3·gs, 3·C]`` (rows: the plane's 3 (q,s) groups × c_out,
    each group zero-padded to ``gs = ⌈CO/8⌉·8`` rows so every in-kernel row
    slice is sublane-aligned — Mosaic rejects misaligned slices; cols:
    row-tap ρ ∈ {-1,0,1} × c_in)."""
    C, CO = w.shape[2], w.shape[3]
    gs = -(-CO // 8) * 8
    groups = conv_groups(P)
    planes = []
    for p in range(P):
        rows = []
        for (q, s, sig) in groups[p]:
            # w[:, s] : [3(r), C, CO] -> [CO, 3C] (ρ-major columns)
            blk = w[:, s].transpose(2, 0, 1).reshape(CO, 3 * C)
            if gs != CO:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((gs - CO, 3 * C), w.dtype)], 0)
            rows.append(blk)
        planes.append(jnp.concatenate(rows, 0))           # [3·gs, 3C]
    wm = jnp.stack(planes).astype(dtype)
    # zeros (not None) for a bias-less conv: the kernels unconditionally
    # take a VMEM bias operand, and a [CO, 1] zeros block costs nothing
    bias = (jnp.zeros((w.shape[-1], 1), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(-1, 1))
    return wm, bias


# ---------------------------------------------------------------------------
# stripe-halo edge preparation (XLA side)
# ---------------------------------------------------------------------------


def stripe_edges(xp, n_img: int, H: int, W: int, R: int, halo: int):
    """``xp [C, B·H·W]`` → ``[B·(H/R), C, 2·halo·W]``: for each row-stripe,
    the ``halo`` rows above and below it (zeros beyond the image edge) —
    the kernel's substitute for overlapping blocks. Only the 2·halo·n_str
    edge rows are touched (never pad/copy the whole plane — that cost more
    than the kernels it fed)."""
    C = xp.shape[0]
    x = xp.reshape(C, n_img, H, W)
    n_str = H // R
    zrows = jnp.zeros((C, n_img, halo, W), xp.dtype)
    rows = lambda a, b: x[:, :, a:b]
    tops = [zrows] + [rows(g * R - halo, g * R) for g in range(1, n_str)]
    bots = [rows((g + 1) * R, (g + 1) * R + halo)
            for g in range(n_str - 1)] + [zrows]
    # [n_str, C, B, 2h, W] -> [B, n_str, C, 2h·W]
    e = jnp.stack([jnp.concatenate([t, bo], 2) for t, bo in zip(tops, bots)])
    return e.transpose(2, 0, 1, 3, 4).reshape(n_img * n_str, C, 2 * halo * W)


def stripe_edges_packed(xp, C: int, n_img: int, H: int, W: int, R: int,
                        halo: int):
    """Edge rows for a y-phase-packed plane ``[2C, B·(H/2)·W]`` (rows [0:C]
    = even logical rows, [C:2C] = odd): → ``[B·(H/R), C, 2·halo·W]`` in
    logical-row order, zeros beyond the image."""
    halves = (xp[0:C].reshape(C, n_img, H // 2, W),
              xp[C:2 * C].reshape(C, n_img, H // 2, W))
    n_str = H // R
    zrow = jnp.zeros((C, n_img, 1, W), xp.dtype)

    def lrow(y):
        if y < 0 or y >= H:
            return zrow
        return halves[y % 2][:, :, y // 2:y // 2 + 1]

    es = []
    for g in range(n_str):
        rows = ([lrow(g * R - halo + j) for j in range(halo)]
                + [lrow((g + 1) * R + j) for j in range(halo)])
        es.append(jnp.concatenate(rows, 2))
    e = jnp.stack(es)
    return e.transpose(2, 0, 1, 3, 4).reshape(n_img * n_str, C, 2 * halo * W)


def _fill_window(win_ref, x_ref, e_ref, R: int, W: int, halo: int,
                 packed: bool):
    """Assemble a (R + 2·halo)-logical-row window in VMEM from the stripe
    block(s) and the gathered edge rows. Packed mode interleaves the two
    y-phase halves row by row — this is where the doubled height
    materialises, VMEM-only (the HBM interleave copy it replaces cost more
    than the conv kernels themselves)."""
    C = win_ref.shape[0]
    for j in range(halo):
        win_ref[:, j * W:(j + 1) * W] = e_ref[0, :, j * W:(j + 1) * W]
    base = halo * W
    if not packed:
        win_ref[:, base:base + R * W] = x_ref[:, :]
    else:
        for j in range(R // 2):
            win_ref[:, base + 2 * j * W:base + (2 * j + 1) * W] = \
                x_ref[0:C, j * W:(j + 1) * W]
            win_ref[:, base + (2 * j + 1) * W:base + (2 * j + 2) * W] = \
                x_ref[C:2 * C, j * W:(j + 1) * W]
    for j in range(halo):
        win_ref[:, base + R * W + j * W:base + R * W + (j + 1) * W] = \
            e_ref[0, :, (halo + j) * W:(halo + j + 1) * W]


# ---------------------------------------------------------------------------
# upfold kernel
# ---------------------------------------------------------------------------


def _upfold_kernel(*refs, C: int, P: int, W: int, R: int, slope: float,
                   packed: bool):
    """Grid step = one (image, stripe). Inputs: P stripe blocks [C, R·W]
    (packed: 2P half-stripe blocks [C, (R/2)·W]), P edge blocks [1, C, 2W]
    (1 halo row above + 1 below), wd [P, 2, 4CO, 2C], bias; outputs: 2P
    planes [2·CO, R·W] (rows d·CO+c, the y-phase-packed format the next
    stage consumes directly); scratch: the haloed window [C, (R+2)W] and
    its 3-copy im buffer [3C, (R+2)W]."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wd_ref, b_ref = refs[2 * P:2 * P + 2]
    outs = refs[2 * P + 2:2 * P + 2 + 2 * P]
    win_ref, im_ref = refs[2 * P + 2 + 2 * P:]
    CO = wd_ref.shape[2] // 4
    Mo = R * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = upfold_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)
    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    acc = {}  # (q, d) -> f32 [CO, Mo]
    for p in range(P):
        # assemble the haloed window and its 3 row-shifted copies
        _fill_window(win_ref, xs[p], es[p], R, W, 1, packed)
        win = win_ref[:, :]
        for r in range(3):
            im_ref[r * C:(r + 1) * C, :] = _lane_shift(win, (r - 1) * W)
        for d in (0, 1):
            # rows [d·C : d·C+2C] of the im buffer = the ρ ∈ {d-1, d} copies
            y = jax.lax.dot_general(
                wd_ref[p, d], im_ref[d * C:d * C + 2 * C, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            for gi, (q, sig, _t) in enumerate(groups[p]):
                # core rows of the window; σ lane-shift is safe post-slice
                # because the shifted-in column is masked at row boundaries
                v = y[gi * CO:(gi + 1) * CO, W:W + Mo]
                if sig == -1:
                    v = _lane_shift(v, -1) * maskl
                elif sig == 1:
                    v = _lane_shift(v, 1) * maskr
                acc[(q, d)] = v if (q, d) not in acc else acc[(q, d)] + v
    for q in range(2 * P):
        for d in (0, 1):
            outs[q][d * CO:(d + 1) * CO, :] = \
                lrelu(acc[(q, d)] + b_ref[:]).astype(dt)


def _col_masks(shape, W: int, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    col = lane % W
    return (col > 0).astype(dtype), (col < W - 1).astype(dtype)


def _pick_R(h: int, R: Optional[int], packed: bool) -> int:
    R = R or min(h, 32)
    while h % R or (packed and R % 2):
        R -= 1
    return R


def upfold_ct(planes, wd, bias, *, C: int, P: int, h: int, w: int,
              n_img: int, R: Optional[int] = None, slope: float = 0.2,
              packed_in: bool = False, interpret: bool = False):
    """Fused nearest-×2 + 3×3 conv + lrelu on column-phase planes.

    planes: list of P ``[C, n_img·h·w]`` (``packed_in``: P y-phase-packed
    ``[2C, n_img·(h/2)·w]``, h = logical height) → list of 2P y-phase-packed
    ``[2·CO, n_img·h·w]``. The packed format chains stages without ever
    materialising the row interleave in HBM; planes travel as separate
    arrays end to end (a stacked [P, ...] array costs a full copy)."""
    CO = wd.shape[2] // 4
    R = _pick_R(h, R, packed_in)
    n_str = h // R
    M = n_img * h * w
    if packed_in:
        edges = [stripe_edges_packed(p, C, n_img, h, w, R, 1) for p in planes]
    else:
        edges = [stripe_edges(p, n_img, h, w, R, 1) for p in planes]

    stripe = lambda c: pl.BlockSpec((c, R * w), lambda i, g: (0, i * n_str + g),
                                    memory_space=pltpu.VMEM)
    pstripe = lambda: pl.BlockSpec((2 * C, (R // 2) * w),
                                   lambda i, g: (0, i * n_str + g),
                                   memory_space=pltpu.VMEM)
    edge = lambda: pl.BlockSpec((1, C, 2 * w), lambda i, g: (i * n_str + g, 0, 0),
                                memory_space=pltpu.VMEM)
    vfull = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_upfold_kernel, C=C, P=P, W=w, R=R, slope=slope,
                               packed=packed_in)
    dt = planes[0].dtype
    x_specs = [pstripe() if packed_in else stripe(C)] * P
    args = list(planes) + edges + [wd, bias]
    in_specs = x_specs + [edge()] * P + [vfull(wd.shape), vfull(bias.shape)]
    out = pl.pallas_call(
        kernel,
        grid=(n_img, n_str),
        in_specs=in_specs,
        out_specs=tuple(stripe(2 * CO) for _ in range(2 * P)),
        out_shape=tuple(jax.ShapeDtypeStruct((2 * CO, M), dt)
                        for _ in range(2 * P)),
        scratch_shapes=[pltpu.VMEM((C, (R + 2) * w), dt),
                        pltpu.VMEM((3 * C, (R + 2) * w), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    return list(out)


def interleave_rows(planes, CO: int, n_img: int, h: int, w: int):
    """Per plane: [2·CO, n_img·h·w] (y-phase d packed in rows) →
    [CO, n_img·2h·w], materialising the doubled row count. One transpose
    per plane; the minor w lanes move as whole rows (tile-friendly copy)."""
    def one(p):
        x = p.reshape(2, CO, n_img, h, w)
        return x.transpose(1, 2, 3, 0, 4).reshape(CO, n_img * 2 * h * w)

    return [one(p) for p in planes]


# ---------------------------------------------------------------------------
# fused hr_conv0 + hr_conv1 kernel
# ---------------------------------------------------------------------------


def _conv_hr_kernel(*refs, C: int, P: int, CO2: int, W: int, R: int,
                    slope: float, packed: bool):
    """Grid step = one (image, stripe): conv0 (+lrelu) on a (R+2)-row window
    from a (R+4)-row haloed input, then conv1 on the R-row core — conv0's
    output never leaves VMEM. Outputs: P planes [CO2, R·W] (logical rows:
    packed inputs are interleaved during window assembly)."""
    xs = refs[:P]
    es = refs[P:2 * P]
    w0_ref, b0_ref, w1_ref, b1_ref = refs[2 * P:2 * P + 4]
    outs = refs[2 * P + 4:2 * P + 4 + P]
    im_ref, win_ref = refs[2 * P + 4 + P:]
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = conv_groups(P)
    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)

    def conv_pass(read_plane, w_ref, b_ref, nwin, CO_, act, write):
        # one plain-conv pass over all planes: read_plane(p) -> [C, nwin·W]
        # window; emits CO_ rows for the (nwin-2)-row core via write(q, val).
        # Row groups run at the sublane-padded stride gs (zero weight rows);
        # the pad rows are dropped at write time.
        gs = w_ref.shape[1] // 3
        Mo = (nwin - 2) * W
        maskl, maskr = _col_masks((1, Mo), W, f32)
        acc = {}
        for p in range(P):
            win = read_plane(p)
            for r in range(3):
                im_ref[r * C:(r + 1) * C, 0:nwin * W] = \
                    _lane_shift(win, (r - 1) * W)
            y = jax.lax.dot_general(
                w_ref[p], im_ref[0:3 * C, 0:nwin * W],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            for gi, (q, s, sig) in enumerate(groups[p]):
                v = y[gi * gs:(gi + 1) * gs, W:W + Mo]
                if sig == -1:
                    v = _lane_shift(v, -1) * maskl
                elif sig == 1:
                    v = _lane_shift(v, 1) * maskr
                acc[q] = v if q not in acc else acc[q] + v
        for q in range(P):
            v = acc[q][0:CO_] + b_ref[:]
            write(q, lrelu(v) if act else v)

    # pass 1: (R+4)-row haloed window -> (R+2)-row conv0 output, VMEM-only
    def read1(p):
        _fill_window(win_ref, xs[p], es[p], R, W, 2, packed)
        return win_ref[:, :]

    hid = {}
    # conv1's SAME padding zero-pads conv0's OUTPUT at image edges — the
    # pass-1 halo rows must be zeroed when they fall outside the image
    # (conv0 evaluated over padding is NOT zero: bias + row-0 taps).
    g = pl.program_id(1)
    n_str = pl.num_programs(1)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, (R + 2) * W), 1) // W
    glob_row = g * R - 1 + lane_row
    rowmask = jnp.logical_and(glob_row >= 0,
                              glob_row < n_str * R).astype(dt)

    def write1(q, v):
        hid[q] = v.astype(dt) * rowmask

    conv_pass(read1, w0_ref, b0_ref, R + 4, C, True, write1)

    # pass 2 over the (R+2)-row conv0 outputs held in registers/VMEM values
    conv_pass(lambda p: hid[p], w1_ref, b1_ref, R + 2, CO2, False,
              lambda q, v: outs[q].__setitem__((slice(None), slice(None)),
                                               v.astype(dt)))


def conv_hr_ct(planes, w0, b0, w1, b1, *, C: int, P: int, CO2: int, h: int,
               w: int, n_img: int, R: Optional[int] = None,
               slope: float = 0.2, packed_in: bool = False,
               interpret: bool = False):
    """hr_conv0 (+lrelu) fused with hr_conv1 on P column-phase planes:
    list of P ``[C, n_img·h·w]`` (``packed_in``: y-phase-packed
    ``[2C, n_img·(h/2)·w]``) → list of P ``[CO2, n_img·h·w]`` logical rows."""
    R = _pick_R(h, R, packed_in)
    n_str = h // R
    M = n_img * h * w
    if packed_in:
        edges = [stripe_edges_packed(p, C, n_img, h, w, R, 2) for p in planes]
    else:
        edges = [stripe_edges(p, n_img, h, w, R, 2) for p in planes]

    stripe = lambda c: pl.BlockSpec((c, R * w), lambda i, g: (0, i * n_str + g),
                                    memory_space=pltpu.VMEM)
    pstripe = lambda: pl.BlockSpec((2 * C, (R // 2) * w),
                                   lambda i, g: (0, i * n_str + g),
                                   memory_space=pltpu.VMEM)
    edge = lambda: pl.BlockSpec((1, C, 4 * w), lambda i, g: (i * n_str + g, 0, 0),
                                memory_space=pltpu.VMEM)
    vfull = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_conv_hr_kernel, C=C, P=P, CO2=CO2, W=w, R=R,
                               slope=slope, packed=packed_in)
    dt = planes[0].dtype
    x_specs = [pstripe() if packed_in else stripe(C)] * P
    args = list(planes) + edges + [w0, b0, w1, b1]
    out = pl.pallas_call(
        kernel,
        grid=(n_img, n_str),
        in_specs=(x_specs + [edge()] * P
                  + [vfull(w0.shape), vfull(b0.shape),
                     vfull(w1.shape), vfull(b1.shape)]),
        out_specs=tuple(stripe(CO2) for _ in range(P)),
        out_shape=tuple(jax.ShapeDtypeStruct((CO2, M), dt)
                        for _ in range(P)),
        scratch_shapes=[pltpu.VMEM((3 * C, (R + 4) * w), dt),
                        pltpu.VMEM((C, (R + 4) * w), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    return list(out)


# ---------------------------------------------------------------------------
# backward (training): custom-VJP pairs for the tail kernels
#
# Round-3 training still ran the XLA tail: hr_conv1's dW alone cost 0.81 ms
# per step (bf16[3]-channel output lane-padded to the 128 tile) plus ~2 ms of
# NHWC↔planes relayout/cast glue. These adjoints keep the whole tail —
# forward AND backward — in the column-phase-plane layout. Structure mirrors
# rdb_ct's backward: combine's adjoint scatters the cotangent into the
# column-tap row groups (masked reverse lane-shifts), dW = dY·IM3ᵀ rides the
# same stripe grid with f32 accumulation across grid steps, and the window
# assembly's adjoint splits into the stripe core (→ dx blocks) plus the halo
# rows (→ d_edge blocks, scattered back into the planes by the XLA transpose
# of the stripe_edges gather — see the _diff wrappers).
# ---------------------------------------------------------------------------


def _acc_slice(first, ref, idx, val):
    """Accumulate ``val`` into ``ref[idx]`` across grid revisits."""
    @pl.when(first)
    def _():
        ref[idx] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[idx] = ref[idx] + val


def _pad_core(v, W: int, pad_rows: int, f32):
    """[S, Mo] core-lane tensor → [S+pad_rows, Mo+2W] (zeros on the halo
    lanes and on the sublane-pad rows)."""
    S, Mo = v.shape
    z = jnp.zeros((S, W), f32)
    out = jnp.concatenate([z, v, z], 1)
    if pad_rows:
        out = jnp.concatenate(
            [out, jnp.zeros((pad_rows, Mo + 2 * W), f32)], 0)
    return out


def _scatter_window_adj(dwin, dx_ref, de_ref, C: int, W: int, R: int,
                        halo: int, packed: bool, dt):
    """Adjoint of ``_fill_window``: core rows → the stripe's dx block
    (de-interleaved for packed inputs), halo rows → the d_edge block."""
    base = halo * W
    if not packed:
        dx_ref[:, :] = dwin[:, base:base + R * W].astype(dt)
    else:
        for j in range(R // 2):
            dx_ref[0:C, j * W:(j + 1) * W] = \
                dwin[:, base + 2 * j * W:base + (2 * j + 1) * W].astype(dt)
            dx_ref[C:2 * C, j * W:(j + 1) * W] = \
                dwin[:, base + (2 * j + 1) * W:base + (2 * j + 2) * W].astype(dt)
    de_ref[0, :, 0:halo * W] = dwin[:, 0:halo * W].astype(dt)
    de_ref[0, :, halo * W:2 * halo * W] = \
        dwin[:, base + R * W:base + (R + halo) * W].astype(dt)


def _upfold_bwd_kernel(*refs, C: int, P: int, W: int, R: int, slope: float,
                       packed: bool):
    """Adjoint of ``_upfold_kernel``. Inputs: the forward's inputs (stripe
    blocks, edges, wd), the forward OUTPUTS (lrelu masks come from their
    signs — no extra residuals), and the output cotangents. Emits dx stripe
    blocks + d_edge blocks (dt) and grid-accumulated dwd/dbias (f32)."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wd_ref = refs[2 * P]
    outs = refs[2 * P + 1:4 * P + 1]
    gs = refs[4 * P + 1:6 * P + 1]
    dxs = refs[6 * P + 1:7 * P + 1]
    des = refs[7 * P + 1:8 * P + 1]
    dwd_ref, db_ref = refs[8 * P + 1:8 * P + 3]
    win_ref, im_ref, dim_ref = refs[8 * P + 3:]
    CO = wd_ref.shape[2] // 4
    Mo = R * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = upfold_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    # dz per (q, d): cotangent through the lrelu (mask = sign of the saved
    # forward output; lrelu preserves sign)
    dacc = {}
    db = None
    for q in range(2 * P):
        g = gs[q][:, :].astype(f32)
        mask = outs[q][:, :].astype(f32) >= 0
        dz = jnp.where(mask, g, g * slope)
        for d in (0, 1):
            dacc[(q, d)] = dz[d * CO:(d + 1) * CO]
        s = jnp.sum(dz[0:CO], axis=1, keepdims=True) \
            + jnp.sum(dz[CO:2 * CO], axis=1, keepdims=True)
        db = s if db is None else db + s
    _acc_slice(first, db_ref, (slice(None), slice(None)), db)

    def adj_sig(v, sig):
        if sig == -1:
            return _lane_shift(v * maskl, 1)
        if sig == 1:
            return _lane_shift(v * maskr, -1)
        return v

    for p in range(P):
        _fill_window(win_ref, xs[p], es[p], R, W, 1, packed)
        win = win_ref[:, :]
        for r in range(3):
            im_ref[r * C:(r + 1) * C, :] = _lane_shift(win, (r - 1) * W)
        for d in (0, 1):
            rows = [_pad_core(adj_sig(dacc[(q, d)], sig), W, 0, f32)
                    for (q, sig, _t) in groups[p]]
            dy = jnp.concatenate(rows, 0).astype(dt)       # [4CO, (R+2)W]
            dwv = jax.lax.dot_general(
                dy, im_ref[d * C:d * C + 2 * C, :],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            _acc_slice(first, dwd_ref, (p, d), dwv)
            dimv = jax.lax.dot_general(
                wd_ref[p, d], dy, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                 # [2C, (R+2)W]
            if d == 0:
                dim_ref[0:2 * C, :] = dimv
            else:
                dim_ref[C:2 * C, :] = dim_ref[C:2 * C, :] + dimv[0:C]
                dim_ref[2 * C:3 * C, :] = dimv[C:2 * C]
        dwin = (_lane_shift(dim_ref[0:C, :], W)
                + dim_ref[C:2 * C, :]
                + _lane_shift(dim_ref[2 * C:3 * C, :], -W))
        _scatter_window_adj(dwin, dxs[p], des[p], C, W, R, 1, packed, dt)


def _conv_hr_bwd_kernel(*refs, C: int, P: int, CO2: int, W: int, R: int,
                        slope: float, packed: bool):
    """Adjoint of ``_conv_hr_kernel``. Pass 1 (conv0 + lrelu + rowmask) is
    recomputed per stripe — conv0's output never left VMEM in the forward,
    so there is nothing to save; the recompute is one extra dot per plane,
    exactly the forward's. Then conv1's adjoint (dw1, dhid), the lrelu/
    rowmask gate, and conv0's adjoint (dw0, dx + d_edges)."""
    xs = refs[:P]
    es = refs[P:2 * P]
    w0_ref, b0_ref, w1_ref = refs[2 * P:2 * P + 3]
    gs = refs[2 * P + 3:3 * P + 3]
    dxs = refs[3 * P + 3:4 * P + 3]
    des = refs[4 * P + 3:5 * P + 3]
    dw0_ref, db0_ref, dw1_ref, db1_ref = refs[5 * P + 3:5 * P + 7]
    win_ref, im_ref, dim_ref = refs[5 * P + 7:]
    gs0 = w0_ref.shape[1] // 3
    gs1 = w1_ref.shape[1] // 3
    Mo = R * W                 # conv1 core
    M1 = (R + 2) * W           # conv0 core = conv1 window
    Mw = (R + 4) * W           # conv0 window
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = conv_groups(P)
    maskl1, maskr1 = _col_masks((1, M1), W, f32)
    maskl0, maskr0 = _col_masks((1, Mo), W, f32)
    lrelu = lambda t: jnp.where(t >= 0, t, t * slope)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    # the forward's outside-image rowmask on the pass-1 halo rows
    g_id = pl.program_id(1)
    n_str = pl.num_programs(1)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, M1), 1) // W
    glob_row = g_id * R - 1 + lane_row
    inside = jnp.logical_and(glob_row >= 0, glob_row < n_str * R)
    rowmask_dt = inside.astype(dt)
    rowmask32 = inside.astype(f32)

    def adj_sig(v, sig, ml, mr):
        if sig == -1:
            return _lane_shift(v * ml, 1)
        if sig == 1:
            return _lane_shift(v * mr, -1)
        return v

    def rebuild_im(p):
        _fill_window(win_ref, xs[p], es[p], R, W, 2, packed)
        for r in range(3):
            im_ref[r * C:(r + 1) * C, :] = _lane_shift(win_ref[:, :],
                                                       (r - 1) * W)

    # ---- recompute pass 1 (bit-identical to the forward) ----
    z0 = {}
    for p in range(P):
        rebuild_im(p)
        y = jax.lax.dot_general(w0_ref[p], im_ref[:, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        for gi, (q, s, sig) in enumerate(groups[p]):
            v = y[gi * gs0:(gi + 1) * gs0, W:W + M1]
            v = (_lane_shift(v, -1) * maskl1 if sig == -1 else
                 _lane_shift(v, 1) * maskr1 if sig == 1 else v)
            z0[q] = v if q not in z0 else z0[q] + v
    z0 = {q: z0[q][0:C] + b0_ref[:] for q in range(P)}
    hid = {q: lrelu(z0[q]).astype(dt) * rowmask_dt for q in range(P)}

    # ---- pass-2 (conv1) adjoint ----
    dacc2 = {q: gs[q][:, :].astype(f32) for q in range(P)}
    db1 = None
    for q in range(P):
        s = jnp.sum(dacc2[q], axis=1, keepdims=True)
        db1 = s if db1 is None else db1 + s
    _acc_slice(first, db1_ref, (slice(None), slice(None)), db1)

    dhid = {}
    for p in range(P):
        for r in range(3):
            im_ref[r * C:(r + 1) * C, 0:M1] = _lane_shift(hid[p], (r - 1) * W)
        rows = [_pad_core(adj_sig(dacc2[q], sig, maskl0, maskr0), W,
                          gs1 - CO2, f32)
                for (q, s, sig) in groups[p]]
        dy1 = jnp.concatenate(rows, 0).astype(dt)          # [3·gs1, M1]
        dwv = jax.lax.dot_general(dy1, im_ref[0:3 * C, 0:M1],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        _acc_slice(first, dw1_ref, (p,), dwv)
        dimv = jax.lax.dot_general(w1_ref[p], dy1, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        dhid[p] = (_lane_shift(dimv[0:C], W)
                   + dimv[C:2 * C]
                   + _lane_shift(dimv[2 * C:3 * C], -W))   # [C, M1] f32

    # ---- lrelu / rowmask gate ----
    dz0 = {q: jnp.where(z0[q] >= 0, dhid[q], dhid[q] * slope) * rowmask32
           for q in range(P)}
    db0 = None
    for q in range(P):
        s = jnp.sum(dz0[q], axis=1, keepdims=True)
        db0 = s if db0 is None else db0 + s
    _acc_slice(first, db0_ref, (slice(None), slice(None)), db0)

    # ---- pass-1 (conv0) adjoint ----
    for p in range(P):
        rebuild_im(p)
        rows = [_pad_core(adj_sig(dz0[q], sig, maskl1, maskr1), W,
                          gs0 - C, f32)
                for (q, s, sig) in groups[p]]
        dy0 = jnp.concatenate(rows, 0).astype(dt)          # [3·gs0, Mw]
        dwv = jax.lax.dot_general(dy0, im_ref[:, :],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        _acc_slice(first, dw0_ref, (p,), dwv)
        dimv = jax.lax.dot_general(w0_ref[p], dy0, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        dim_ref[:, :] = dimv
        dwin = (_lane_shift(dim_ref[0:C, :], W)
                + dim_ref[C:2 * C, :]
                + _lane_shift(dim_ref[2 * C:3 * C, :], -W))  # [C, Mw]
        _scatter_window_adj(dwin, dxs[p], des[p], C, W, R, 2, packed, dt)


def _edge_fn(packed_in: bool, C: int, n_img: int, h: int, w: int, R: int,
             halo: int):
    if packed_in:
        return lambda xp: stripe_edges_packed(xp, C, n_img, h, w, R, halo)
    return lambda xp: stripe_edges(xp, n_img, h, w, R, halo)


def _plane_grads(planes, dxs, des, efn):
    """dx stripe blocks + d_edge scatter (the XLA transpose of the
    stripe_edges gather) → per-plane input cotangents."""
    out = []
    for p, dx, de in zip(planes, dxs, des):
        _, pullback = jax.vjp(efn, p)
        (dpe,) = pullback(de)
        out.append(dx + dpe)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _make_upfold_ct_diff(C: int, P: int, h: int, w: int, n_img: int,
                         R: Optional[int], slope: float, packed_in: bool,
                         interpret: bool):
    Rv = _pick_R(h, R, packed_in)
    n_str = h // Rv
    M = n_img * h * w
    efn = _edge_fn(packed_in, C, n_img, h, w, Rv, 1)

    @jax.custom_vjp
    def f(wd, bias, *planes):
        wdt = wd.astype(planes[0].dtype)
        return tuple(upfold_ct(list(planes), wdt, bias, C=C, P=P, h=h, w=w,
                               n_img=n_img, R=Rv, slope=slope,
                               packed_in=packed_in, interpret=interpret))

    def fwd(wd, bias, *planes):
        outs = f(wd, bias, *planes)
        return outs, (wd, planes, outs)

    def bwd(saved, gs):
        wd, planes, outs = saved
        dt = planes[0].dtype
        CO = wd.shape[2] // 4
        edges = [efn(p) for p in planes]
        kernel = functools.partial(_upfold_bwd_kernel, C=C, P=P, W=w, R=Rv,
                                   slope=slope, packed=packed_in)
        stripe = lambda c: pl.BlockSpec((c, Rv * w),
                                        lambda i, g: (0, i * n_str + g),
                                        memory_space=pltpu.VMEM)
        pstripe = lambda: pl.BlockSpec((2 * C, (Rv // 2) * w),
                                       lambda i, g: (0, i * n_str + g),
                                       memory_space=pltpu.VMEM)
        edge = lambda: pl.BlockSpec((1, C, 2 * w),
                                    lambda i, g: (i * n_str + g, 0, 0),
                                    memory_space=pltpu.VMEM)
        vfull = lambda shape: pl.BlockSpec(shape,
                                           lambda i, g: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)
        x_spec = pstripe() if packed_in else stripe(C)
        x_shape = ((2 * C, M // 2) if packed_in else (C, M))
        f32 = jnp.float32
        res = pl.pallas_call(
            kernel,
            grid=(n_img, n_str),
            in_specs=([x_spec] * P + [edge()] * P + [vfull(wd.shape)]
                      + [stripe(2 * CO)] * (2 * P) * 2),
            out_specs=tuple([x_spec] * P + [edge()] * P
                            + [vfull(wd.shape), vfull((CO, 1))]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct(x_shape, dt)] * P
                + [jax.ShapeDtypeStruct((n_img * n_str, C, 2 * w), dt)] * P
                + [jax.ShapeDtypeStruct(wd.shape, f32),
                   jax.ShapeDtypeStruct((CO, 1), f32)]),
            scratch_shapes=[pltpu.VMEM((C, (Rv + 2) * w), dt),
                            pltpu.VMEM((3 * C, (Rv + 2) * w), dt),
                            pltpu.VMEM((3 * C, (Rv + 2) * w), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*(list(planes) + edges + [wd.astype(dt)] + list(outs) + list(gs)))
        res = jax.lax.optimization_barrier(res)
        dxs, des = res[:P], res[P:2 * P]
        dwd, db = res[2 * P], res[2 * P + 1]
        return (dwd.astype(wd.dtype), db) + _plane_grads(planes, dxs, des, efn)

    f.defvjp(fwd, bwd)
    return f


def upfold_ct_diff(planes, wd, bias, *, C: int, P: int, h: int, w: int,
                   n_img: int, R: Optional[int] = None, slope: float = 0.2,
                   packed_in: bool = False, interpret: bool = False):
    """Differentiable :func:`upfold_ct`. Pass ``wd`` in the master (f32)
    dtype; gradients come back f32 (in-kernel grid accumulation). Input
    cotangents = dx stripe blocks + the stripe_edges transpose scatter."""
    fn = _make_upfold_ct_diff(C, P, h, w, n_img, R, slope, packed_in,
                              interpret)
    return list(fn(wd, bias, *planes))


@functools.lru_cache(maxsize=None)
def _make_conv_hr_ct_diff(C: int, P: int, CO2: int, h: int, w: int,
                          n_img: int, R: Optional[int], slope: float,
                          packed_in: bool, interpret: bool):
    Rv = _pick_R(h, R, packed_in)
    n_str = h // Rv
    M = n_img * h * w
    efn = _edge_fn(packed_in, C, n_img, h, w, Rv, 2)

    @jax.custom_vjp
    def f(w0, b0, w1, b1, *planes):
        dt = planes[0].dtype
        return tuple(conv_hr_ct(list(planes), w0.astype(dt), b0,
                                w1.astype(dt), b1, C=C, P=P, CO2=CO2, h=h,
                                w=w, n_img=n_img, R=Rv, slope=slope,
                                packed_in=packed_in, interpret=interpret))

    def fwd(w0, b0, w1, b1, *planes):
        return f(w0, b0, w1, b1, *planes), (w0, b0, w1, planes)

    def bwd(saved, gs):
        w0, b0, w1, planes = saved
        dt = planes[0].dtype
        gs0 = w0.shape[1] // 3
        gs1 = w1.shape[1] // 3
        edges = [efn(p) for p in planes]
        kernel = functools.partial(_conv_hr_bwd_kernel, C=C, P=P, CO2=CO2,
                                   W=w, R=Rv, slope=slope, packed=packed_in)
        stripe = lambda c: pl.BlockSpec((c, Rv * w),
                                        lambda i, g: (0, i * n_str + g),
                                        memory_space=pltpu.VMEM)
        pstripe = lambda: pl.BlockSpec((2 * C, (Rv // 2) * w),
                                       lambda i, g: (0, i * n_str + g),
                                       memory_space=pltpu.VMEM)
        edge = lambda: pl.BlockSpec((1, C, 4 * w),
                                    lambda i, g: (i * n_str + g, 0, 0),
                                    memory_space=pltpu.VMEM)
        vfull = lambda shape: pl.BlockSpec(shape,
                                           lambda i, g: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)
        x_spec = pstripe() if packed_in else stripe(C)
        x_shape = ((2 * C, M // 2) if packed_in else (C, M))
        f32 = jnp.float32
        res = pl.pallas_call(
            kernel,
            grid=(n_img, n_str),
            in_specs=([x_spec] * P + [edge()] * P
                      + [vfull(w0.shape), vfull(b0.shape), vfull(w1.shape)]
                      + [stripe(CO2)] * P),
            out_specs=tuple([x_spec] * P + [edge()] * P
                            + [vfull(w0.shape), vfull((C, 1)),
                               vfull(w1.shape), vfull((CO2, 1))]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct(x_shape, dt)] * P
                + [jax.ShapeDtypeStruct((n_img * n_str, C, 4 * w), dt)] * P
                + [jax.ShapeDtypeStruct(w0.shape, f32),
                   jax.ShapeDtypeStruct((C, 1), f32),
                   jax.ShapeDtypeStruct(w1.shape, f32),
                   jax.ShapeDtypeStruct((CO2, 1), f32)]),
            scratch_shapes=[pltpu.VMEM((C, (Rv + 4) * w), dt),
                            pltpu.VMEM((3 * C, (Rv + 4) * w), dt),
                            pltpu.VMEM((3 * C, (Rv + 4) * w), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*(list(planes) + edges
            + [w0.astype(dt), b0, w1.astype(dt)] + list(gs)))
        res = jax.lax.optimization_barrier(res)
        dxs, des = res[:P], res[P:2 * P]
        dw0, db0, dw1, db1 = res[2 * P:2 * P + 4]
        return ((dw0.astype(w0.dtype), db0, dw1.astype(w1.dtype), db1)
                + _plane_grads(planes, dxs, des, efn))

    f.defvjp(fwd, bwd)
    return f


def conv_hr_ct_diff(planes, w0, b0, w1, b1, *, C: int, P: int, CO2: int,
                    h: int, w: int, n_img: int, R: Optional[int] = None,
                    slope: float = 0.2, packed_in: bool = False,
                    interpret: bool = False):
    """Differentiable :func:`conv_hr_ct`. conv0's output never left VMEM in
    the forward, so the backward recomputes pass 1 per stripe (one extra dot
    per plane) instead of saving it; weights cross in master f32."""
    fn = _make_conv_hr_ct_diff(C, P, CO2, h, w, n_img, R, slope, packed_in,
                               interpret)
    return list(fn(w0, b0, w1, b1, *planes))


def unphase_columns(planes, n_img: int, h: int, w: int):
    """List of P ``[C, n_img·h·w]`` column-phase planes → NHWC
    [n_img, h, P·w, C] (cheap: only the C-channel final output)."""
    Pn, C = len(planes), planes[0].shape[0]
    x = jnp.stack(planes).reshape(Pn, C, n_img, h, w)
    return x.transpose(2, 3, 4, 0, 1).reshape(n_img, h, w * Pn, C)
