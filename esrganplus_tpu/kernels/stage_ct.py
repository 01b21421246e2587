"""Pallas TPU kernels: plane-layout early stages for the D/VGG stacks.

Round-4 trace: the GAN+VGG step spends ~7.6 ms/step in the D_VGG_128 and
VGG19 conv fusions under XLA NHWC, where the ≤64/128-channel early stages
half-fill the 128-lane tile (the "N=64 lane ceiling" — reference graphs
``codes/models/modules/architecture.py:87-129`` D, ``:279-307`` VGG F).
These kernels run those stages in the trunk/tail kernels' transposed
``[C, pixels-in-lanes]`` layout, where the lane dimension is pixels (always
full) and channels/taps land on the MXU's S/K dims:

  * ``conv_s1_ct`` — plain 3×3 stride-1 conv (+ optional fused relu/lrelu)
    on P column-phase planes. Dot per plane: ``[3·CO, 3·C] @ [3C, R·W]`` —
    for C=CO=128 every dim is an exact multiple of the 128 MXU tile.
  * ``conv_s2_ct`` — the discriminator's 4×4 stride-2 conv as column-phase
    DECIMATION (P planes → P/2 planes, lane count unchanged — the inverse
    of ``tail_ct``'s upfold phase growth). Row decimation assembles parity
    (even/odd row) buffers from the haloed window, so the 4 row taps are
    contiguous lane slices, never strided gathers. Dot per plane:
    ``[2·CO, 4·C] @ [4C, R'·W]`` — full tiles at C=CO=64 and beyond.

Both carry custom-VJP pairs (same structure as ``tail_ct``): dW = dY·IMᵀ
accumulated f32 across the (image, stripe) grid, dx via the transposed
combine (masked reverse lane shifts) + window-assembly adjoint, weights
crossing the boundary in master f32.

The 2×2 maxpool (VGG) and BatchNorm (D) run XLA-side on the plane arrays —
pooling is an elementwise max of plane pairs plus a row-pair max on the
lane dim (``pool2_planes``), and train-mode BN needs a full-tensor
reduction anyway (``models/discriminator.py`` wires it).

Column-phase convention matches tail_ct: plane p of P holds image columns
X ≡ p (mod P) at lane ⌊X/P⌋.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esrganplus_tpu.kernels.rdb_t import _lane_shift
from esrganplus_tpu.kernels.tail_ct import (
    _acc_slice,
    _col_masks,
    _fill_window,
    _pad_core,
    _pick_R,
    _scatter_window_adj,
    conv_groups,
    prepare_convxp_ct,
    stripe_edges,
)
from esrganplus_tpu.kernels.vmem import VMEM_LIMIT_BYTES

__all__ = [
    "conv_s1_ct", "conv_s1_ct_diff", "conv_s2_ct", "conv_s2_ct_diff",
    "prepare_conv4s2_ct", "prepare_convxp_ct", "nhwc_to_planes",
    "planes_to_nhwc", "pool2_planes", "s2_groups",
]


# ---------------------------------------------------------------------------
# layout converters / XLA-side plane ops
# ---------------------------------------------------------------------------


def nhwc_to_planes(x: jnp.ndarray, P: int):
    """NHWC ``[B, H, W, C]`` → list of P column-phase planes
    ``[C, B·H·(W/P)]`` (plane p holds columns X ≡ p mod P)."""
    b, h, w, c = x.shape
    assert w % P == 0
    xs = x.reshape(b, h, w // P, P, c).transpose(4, 0, 1, 2, 3)
    return [xs[..., p].reshape(c, b * h * (w // P)) for p in range(P)]


def planes_to_nhwc(planes, n_img: int, h: int, w: int):
    """Inverse of :func:`nhwc_to_planes` (same math as tail_ct's
    ``unphase_columns``, kept here for locality)."""
    P, C = len(planes), planes[0].shape[0]
    x = jnp.stack(planes).reshape(P, C, n_img, h, w)
    return x.transpose(2, 3, 4, 0, 1).reshape(n_img, h, w * P, C)


def pad_rows_planes(planes, c_to: int):
    """Zero-pad each plane's channel rows up to ``c_to``. Mosaic cannot
    relayout <8-sublane vectors through the kernels' lane shifts (measured:
    'result/input offset mismatch on non-concat dimension' at C=3), so the
    3-channel entry convs run at C=8 with zero rows; pad the weights' input-
    channel dim to match (``pad_w_cin``). The pad is XLA-side and its VJP
    slices the cotangent back automatically."""
    out = []
    for p in planes:
        if p.shape[0] < c_to:
            p = jnp.concatenate(
                [p, jnp.zeros((c_to - p.shape[0], p.shape[1]), p.dtype)], 0)
        out.append(p)
    return out


def pad_w_cin(w, c_to: int):
    """Zero-pad conv weights' input-channel dim (HWIO axis 2) to ``c_to``."""
    if w.shape[2] >= c_to:
        return w
    pad = jnp.zeros(w.shape[:2] + (c_to - w.shape[2],) + w.shape[3:], w.dtype)
    return jnp.concatenate([w, pad], 2)


def pool2_planes(planes, n_img: int, h: int, w: int):
    """2×2 max pool, stride 2, on P column-phase planes → P/2 planes at
    (h/2, w). Columns: output plane π pools input planes (2π, 2π+1)
    elementwise (phase algebra: output col X' = (P/2)·u + π reads input
    cols 2X', 2X'+1 which live at lane u of exactly those two planes).
    Rows: a free reshape exposes row pairs on a size-2 axis (the minor
    w-lane dim is untouched). XLA-side on purpose: its backward is an
    elementwise select, and pooling is bandwidth- not MXU-bound."""
    P, C = len(planes), planes[0].shape[0]
    assert P % 2 == 0 and h % 2 == 0
    outs = []
    for pi in range(P // 2):
        m = jnp.maximum(planes[2 * pi], planes[2 * pi + 1])
        m = m.reshape(C, n_img, h // 2, 2, w).max(axis=3)
        outs.append(m.reshape(C, n_img * (h // 2) * w))
    return outs


# ---------------------------------------------------------------------------
# stride-2 (k=4, pad=1) phase-decimation metadata + weight prep
# ---------------------------------------------------------------------------


def s2_groups(P: int):
    """Per source plane: (q', s, σ) triples for a 4×4 stride-2 pad-1 conv
    from P column-phase planes to P/2 output planes (lane count unchanged).

    Output col X' = (P/2)·u + q' reads input col t = 2X'+s−1 = P·u +
    (2q'+s−1), i.e. source plane (2q'+s−1) mod P at lane shift
    ⌊(2q'+s−1)/P⌋ ∈ {−1, 0, +1}. Exactly 2 pairs land on each source
    plane (4·(P/2) taps / P planes)."""
    assert P % 2 == 0
    groups = {p: [] for p in range(P)}
    for q in range(P // 2):
        for s in range(4):
            t = 2 * q + s - 1
            groups[t % P].append((q, s, t // P))
    assert all(len(g) == 2 for g in groups.values()), groups
    return groups


def prepare_conv4s2_ct(w, b, P: int, dtype=jnp.bfloat16):
    """4×4 conv weights ``[4, 4, C, CO]`` (HWIO) → per-plane blocks
    ``[P, 2·gs, 4·C]`` (rows: the plane's 2 (q', s) groups × c_out padded
    to ``gs = ⌈CO/8⌉·8``; columns: row tap rt ∈ 0..3 × c_in, matching the
    kernel's parity-assembled im buffer)."""
    C, CO = w.shape[2], w.shape[3]
    gs = -(-CO // 8) * 8
    groups = s2_groups(P)
    planes = []
    for p in range(P):
        rows = []
        for (q, s, sig) in groups[p]:
            blk = w[:, s].transpose(2, 0, 1).reshape(CO, 4 * C)  # [CO, rt·C]
            if gs != CO:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((gs - CO, 4 * C), w.dtype)], 0)
            rows.append(blk)
        planes.append(jnp.concatenate(rows, 0))                  # [2·gs, 4C]
    wm = jnp.stack(planes).astype(dtype)
    bias = (jnp.zeros((w.shape[-1], 1), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(-1, 1))
    return wm, bias


def _apply_act(v, act: Optional[str], slope: float):
    if act == "relu":
        return jnp.maximum(v, 0)
    if act == "lrelu":
        return jnp.where(v >= 0, v, v * slope)
    assert act is None, act
    return v


def _act_adj(g, ref, act: Optional[str], slope: float):
    """Cotangent through the activation; ``ref`` = saved forward OUTPUT
    (relu/lrelu preserve sign, so the output's sign is the gate)."""
    if act == "relu":
        return g * (ref > 0)
    if act == "lrelu":
        return jnp.where(ref >= 0, g, g * slope)
    return g


# ---------------------------------------------------------------------------
# stride-1 3×3 conv kernel (forward)
# ---------------------------------------------------------------------------


def _conv_s1_kernel(*refs, C: int, CO: int, P: int, W: int, R: int,
                    act: Optional[str], slope: float):
    """Grid step = one (image, stripe). Inputs: P stripe blocks [C, R·W],
    P edge blocks [1, C, 2W], wm [P, 3·gs, 3C], bias [CO, 1]; outputs:
    P planes [CO, R·W]; scratch: window [C, (R+2)W], im [3C, (R+2)W]."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wm_ref, b_ref = refs[2 * P:2 * P + 2]
    outs = refs[2 * P + 2:3 * P + 2]
    win_ref, im_ref = refs[3 * P + 2:]
    gs = wm_ref.shape[1] // 3
    Mo = R * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = conv_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)

    acc = {}
    for p in range(P):
        _fill_window(win_ref, xs[p], es[p], R, W, 1, False)
        win = win_ref[:, :]
        for r in range(3):
            im_ref[r * C:(r + 1) * C, :] = _lane_shift(win, (r - 1) * W)
        y = jax.lax.dot_general(
            wm_ref[p], im_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        for gi, (q, s, sig) in enumerate(groups[p]):
            v = y[gi * gs:(gi + 1) * gs, W:W + Mo]
            if sig == -1:
                v = _lane_shift(v, -1) * maskl
            elif sig == 1:
                v = _lane_shift(v, 1) * maskr
            acc[q] = v if q not in acc else acc[q] + v
    for q in range(P):
        v = acc[q][0:CO] + b_ref[:]
        outs[q][:, :] = _apply_act(v, act, slope).astype(dt)


def conv_s1_ct(planes, wm, bias, *, C: int, CO: int, P: int, h: int, w: int,
               n_img: int, R: Optional[int] = None, act: Optional[str] = None,
               slope: float = 0.2, interpret: bool = False):
    """3×3 stride-1 SAME conv (+ optional fused act) on P column-phase
    planes: list of P ``[C, n_img·h·w]`` → list of P ``[CO, n_img·h·w]``.
    ``wm, bias`` from :func:`tail_ct.prepare_convxp_ct`."""
    R = _pick_R(h, R, False)
    n_str = h // R
    M = n_img * h * w
    edges = [stripe_edges(p, n_img, h, w, R, 1) for p in planes]
    stripe = lambda c: pl.BlockSpec((c, R * w), lambda i, g: (0, i * n_str + g),
                                    memory_space=pltpu.VMEM)
    edge = lambda: pl.BlockSpec((1, C, 2 * w), lambda i, g: (i * n_str + g, 0, 0),
                                memory_space=pltpu.VMEM)
    vfull = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_conv_s1_kernel, C=C, CO=CO, P=P, W=w, R=R,
                               act=act, slope=slope)
    dt = planes[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(n_img, n_str),
        in_specs=([stripe(C)] * P + [edge()] * P
                  + [vfull(wm.shape), vfull(bias.shape)]),
        out_specs=tuple(stripe(CO) for _ in range(P)),
        out_shape=tuple(jax.ShapeDtypeStruct((CO, M), dt) for _ in range(P)),
        scratch_shapes=[pltpu.VMEM((C, (R + 2) * w), dt),
                        pltpu.VMEM((3 * C, (R + 2) * w), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*(list(planes) + edges + [wm, bias]))
    return list(out)


# ---------------------------------------------------------------------------
# stride-1 backward
# ---------------------------------------------------------------------------


def _conv_s1_bwd_kernel(*refs, C: int, CO: int, P: int, W: int, R: int,
                        act: Optional[str], slope: float):
    """Adjoint of ``_conv_s1_kernel``: dz through the act gate (saved
    outputs), db/dwm grid-accumulated f32, dx via the transposed combine +
    window-assembly adjoint."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wm_ref = refs[2 * P]
    outs = refs[2 * P + 1:3 * P + 1]
    gs_refs = refs[3 * P + 1:4 * P + 1]
    dxs = refs[4 * P + 1:5 * P + 1]
    des = refs[5 * P + 1:6 * P + 1]
    dwm_ref, db_ref = refs[6 * P + 1:6 * P + 3]
    win_ref, im_ref = refs[6 * P + 3:]
    gs = wm_ref.shape[1] // 3
    Mo = R * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = conv_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    dz = {}
    db = None
    for q in range(P):
        g = gs_refs[q][:, :].astype(f32)
        dz[q] = _act_adj(g, outs[q][:, :].astype(f32), act, slope)
        s = jnp.sum(dz[q], axis=1, keepdims=True)
        db = s if db is None else db + s
    _acc_slice(first, db_ref, (slice(None), slice(None)), db)

    def adj_sig(v, sig):
        if sig == -1:
            return _lane_shift(v * maskl, 1)
        if sig == 1:
            return _lane_shift(v * maskr, -1)
        return v

    for p in range(P):
        _fill_window(win_ref, xs[p], es[p], R, W, 1, False)
        win = win_ref[:, :]
        for r in range(3):
            im_ref[r * C:(r + 1) * C, :] = _lane_shift(win, (r - 1) * W)
        rows = [_pad_core(adj_sig(dz[q], sig), W, gs - CO, f32)
                for (q, s, sig) in groups[p]]
        dy = jnp.concatenate(rows, 0).astype(dt)            # [3·gs, (R+2)W]
        dwv = jax.lax.dot_general(dy, im_ref[:, :], (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        _acc_slice(first, dwm_ref, (p,), dwv)
        dimv = jax.lax.dot_general(wm_ref[p], dy, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        dwin = (_lane_shift(dimv[0:C], W)
                + dimv[C:2 * C]
                + _lane_shift(dimv[2 * C:3 * C], -W))       # [C, (R+2)W]
        _scatter_window_adj(dwin, dxs[p], des[p], C, W, R, 1, False, dt)


def _edge_fn_s(n_img, h, w, R, halo):
    return lambda xp: stripe_edges(xp, n_img, h, w, R, halo)


def _plane_grads(planes, dxs, des, efn):
    out = []
    for p, dx, de in zip(planes, dxs, des):
        _, pullback = jax.vjp(efn, p)
        (dpe,) = pullback(de)
        out.append(dx + dpe)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _make_conv_s1_ct_diff(C: int, CO: int, P: int, h: int, w: int,
                          n_img: int, R: Optional[int], act: Optional[str],
                          slope: float, interpret: bool):
    Rv = _pick_R(h, R, False)
    n_str = h // Rv
    M = n_img * h * w
    efn = _edge_fn_s(n_img, h, w, Rv, 1)

    @jax.custom_vjp
    def f(wm, bias, *planes):
        return tuple(conv_s1_ct(list(planes), wm.astype(planes[0].dtype),
                                bias, C=C, CO=CO, P=P, h=h, w=w, n_img=n_img,
                                R=Rv, act=act, slope=slope,
                                interpret=interpret))

    def fwd(wm, bias, *planes):
        outs = f(wm, bias, *planes)
        return outs, (wm, planes, outs)

    def bwd(saved, gs_in):
        wm, planes, outs = saved
        dt = planes[0].dtype
        edges = [efn(p) for p in planes]
        kernel = functools.partial(_conv_s1_bwd_kernel, C=C, CO=CO, P=P,
                                   W=w, R=Rv, act=act, slope=slope)
        stripe = lambda c: pl.BlockSpec((c, Rv * w),
                                        lambda i, g: (0, i * n_str + g),
                                        memory_space=pltpu.VMEM)
        edge = lambda: pl.BlockSpec((1, C, 2 * w),
                                    lambda i, g: (i * n_str + g, 0, 0),
                                    memory_space=pltpu.VMEM)
        vfull = lambda shape: pl.BlockSpec(shape,
                                           lambda i, g: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)
        f32 = jnp.float32
        res = pl.pallas_call(
            kernel,
            grid=(n_img, n_str),
            in_specs=([stripe(C)] * P + [edge()] * P + [vfull(wm.shape)]
                      + [stripe(CO)] * (2 * P)),
            out_specs=tuple([stripe(C)] * P + [edge()] * P
                            + [vfull(wm.shape), vfull((CO, 1))]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((C, M), dt)] * P
                + [jax.ShapeDtypeStruct((n_img * n_str, C, 2 * w), dt)] * P
                + [jax.ShapeDtypeStruct(wm.shape, f32),
                   jax.ShapeDtypeStruct((CO, 1), f32)]),
            scratch_shapes=[pltpu.VMEM((C, (Rv + 2) * w), dt),
                            pltpu.VMEM((3 * C, (Rv + 2) * w), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*(list(planes) + edges + [wm.astype(dt)] + list(outs)
            + list(gs_in)))
        res = jax.lax.optimization_barrier(res)
        dxs, des = res[:P], res[P:2 * P]
        dwm, db = res[2 * P], res[2 * P + 1]
        return (dwm.astype(wm.dtype), db) + _plane_grads(planes, dxs, des,
                                                         efn)

    f.defvjp(fwd, bwd)
    return f


def conv_s1_ct_diff(planes, wm, bias, *, C: int, CO: int, P: int, h: int,
                    w: int, n_img: int, R: Optional[int] = None,
                    act: Optional[str] = None, slope: float = 0.2,
                    interpret: bool = False):
    """Differentiable :func:`conv_s1_ct` (wm in master f32; f32 grid-
    accumulated dwm/db; act gates from the saved outputs)."""
    fn = _make_conv_s1_ct_diff(C, CO, P, h, w, n_img, R, act, slope,
                               interpret)
    return list(fn(wm, bias, *planes))


# ---------------------------------------------------------------------------
# stride-2 4×4 conv kernel (forward)
# ---------------------------------------------------------------------------


def _fill_parity(pe_ref, po_ref, win_ref, C: int, W: int, Rh: int):
    """Split a (2·Rh)-row haloed window ``[C, (2Rh)·W]`` into even/odd row
    buffers ``[C, Rh·W]``. Ref-to-ref copies on purpose: slicing a
    materialised window VALUE at sub-128 lane offsets miscompiles on
    Mosaic (silent wrong numbers at plane width 8, measured round 5);
    ref-indexed load/stores lower as memory copies and stay exact."""
    for j in range(Rh):
        pe_ref[:, j * W:(j + 1) * W] = win_ref[:, (2 * j) * W:(2 * j + 1) * W]
        po_ref[:, j * W:(j + 1) * W] = win_ref[:, (2 * j + 1) * W:(2 * j + 2) * W]


def _conv_s2_kernel(*refs, C: int, CO: int, P: int, W: int, R: int,
                    act: Optional[str], slope: float):
    """Grid step = one (image, input-stripe of R rows → R/2 output rows).
    The haloed window spans input rows [gR−1, (g+1)R] (R+2 rows); parity
    buffers expose the 4 k4s2 row taps as contiguous lane slices:
    rt=0 → even[j'], rt=1 → odd[j'], rt=2 → even[j'+1], rt=3 → odd[j'+1]
    (window row of input row 2j'+rt−1 is 2j'+rt, parity rt mod 2)."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wm_ref, b_ref = refs[2 * P:2 * P + 2]
    outs = refs[2 * P + 2:2 * P + 2 + P // 2]
    win_ref, pe_ref, po_ref, im_ref = refs[2 * P + 2 + P // 2:]
    gs = wm_ref.shape[1] // 2
    Rh = R // 2
    Mo = Rh * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = s2_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)

    acc = {}
    for p in range(P):
        _fill_window(win_ref, xs[p], es[p], R, W, 1, False)
        _fill_parity(pe_ref, po_ref, win_ref, C, W, Rh + 1)
        im_ref[0 * C:1 * C, :] = pe_ref[:, 0:Mo]
        im_ref[1 * C:2 * C, :] = po_ref[:, 0:Mo]
        im_ref[2 * C:3 * C, :] = pe_ref[:, W:Mo + W]
        im_ref[3 * C:4 * C, :] = po_ref[:, W:Mo + W]
        y = jax.lax.dot_general(
            wm_ref[p], im_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        for gi, (q, s, sig) in enumerate(groups[p]):
            v = y[gi * gs:(gi + 1) * gs, :]
            if sig == -1:
                v = _lane_shift(v, -1) * maskl
            elif sig == 1:
                v = _lane_shift(v, 1) * maskr
            acc[q] = v if q not in acc else acc[q] + v
    for q in range(P // 2):
        v = acc[q][0:CO] + b_ref[:]
        outs[q][:, :] = _apply_act(v, act, slope).astype(dt)


def conv_s2_ct(planes, wm, bias, *, C: int, CO: int, P: int, h: int, w: int,
               n_img: int, R: Optional[int] = None, act: Optional[str] = None,
               slope: float = 0.2, interpret: bool = False):
    """4×4 stride-2 pad-1 conv (+ optional act) with column-phase
    decimation: P planes ``[C, n_img·h·w]`` → P/2 planes
    ``[CO, n_img·(h/2)·w]`` (lane count per plane unchanged).
    ``wm, bias`` from :func:`prepare_conv4s2_ct`."""
    assert P % 2 == 0 and h % 2 == 0
    R = _pick_R(h, R, True)  # even stripe rows
    n_str = h // R
    Mo_total = n_img * (h // 2) * w
    edges = [stripe_edges(p, n_img, h, w, R, 1) for p in planes]
    stripe_in = lambda: pl.BlockSpec((C, R * w),
                                     lambda i, g: (0, i * n_str + g),
                                     memory_space=pltpu.VMEM)
    stripe_out = lambda: pl.BlockSpec((CO, (R // 2) * w),
                                      lambda i, g: (0, i * n_str + g),
                                      memory_space=pltpu.VMEM)
    edge = lambda: pl.BlockSpec((1, C, 2 * w), lambda i, g: (i * n_str + g, 0, 0),
                                memory_space=pltpu.VMEM)
    vfull = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_conv_s2_kernel, C=C, CO=CO, P=P, W=w, R=R,
                               act=act, slope=slope)
    dt = planes[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(n_img, n_str),
        in_specs=([stripe_in()] * P + [edge()] * P
                  + [vfull(wm.shape), vfull(bias.shape)]),
        out_specs=tuple(stripe_out() for _ in range(P // 2)),
        out_shape=tuple(jax.ShapeDtypeStruct((CO, Mo_total), dt)
                        for _ in range(P // 2)),
        scratch_shapes=[pltpu.VMEM((C, (R + 2) * w), dt),
                        pltpu.VMEM((C, (R // 2 + 1) * w), dt),
                        pltpu.VMEM((C, (R // 2 + 1) * w), dt),
                        pltpu.VMEM((4 * C, (R // 2) * w), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*(list(planes) + edges + [wm, bias]))
    return list(out)


# ---------------------------------------------------------------------------
# stride-2 backward
# ---------------------------------------------------------------------------


def _conv_s2_bwd_kernel(*refs, C: int, CO: int, P: int, W: int, R: int,
                        act: Optional[str], slope: float):
    """Adjoint of ``_conv_s2_kernel``: act gate from saved outputs, db/dwm
    f32 grid-accumulated, dx via the im-assembly adjoint run through the
    parity buffers (f32 accumulation — lane ranges overlap) and the window
    scatter."""
    xs = refs[:P]
    es = refs[P:2 * P]
    wm_ref = refs[2 * P]
    outs = refs[2 * P + 1:2 * P + 1 + P // 2]
    gs_refs = refs[2 * P + 1 + P // 2:2 * P + 1 + P]
    dxs = refs[2 * P + 1 + P:3 * P + 1 + P]
    des = refs[3 * P + 1 + P:4 * P + 1 + P]
    dwm_ref, db_ref = refs[4 * P + 1 + P:4 * P + 3 + P]
    (win_ref, pe_ref, po_ref, im_ref, dpe_ref, dpo_ref,
     dwin_ref) = refs[4 * P + 3 + P:]
    gs = wm_ref.shape[1] // 2
    Rh = R // 2
    Mo = Rh * W
    f32 = jnp.float32
    dt = win_ref.dtype
    groups = s2_groups(P)
    maskl, maskr = _col_masks((1, Mo), W, f32)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    dz = {}
    db = None
    for q in range(P // 2):
        g = gs_refs[q][:, :].astype(f32)
        dz[q] = _act_adj(g, outs[q][:, :].astype(f32), act, slope)
        s = jnp.sum(dz[q], axis=1, keepdims=True)
        db = s if db is None else db + s
    _acc_slice(first, db_ref, (slice(None), slice(None)), db)

    def adj_sig(v, sig):
        if sig == -1:
            return _lane_shift(v * maskl, 1)
        if sig == 1:
            return _lane_shift(v * maskr, -1)
        return v

    for p in range(P):
        _fill_window(win_ref, xs[p], es[p], R, W, 1, False)
        _fill_parity(pe_ref, po_ref, win_ref, C, W, Rh + 1)
        im_ref[0 * C:1 * C, :] = pe_ref[:, 0:Mo]
        im_ref[1 * C:2 * C, :] = po_ref[:, 0:Mo]
        im_ref[2 * C:3 * C, :] = pe_ref[:, W:Mo + W]
        im_ref[3 * C:4 * C, :] = po_ref[:, W:Mo + W]
        rows = []
        for (q, s, sig) in groups[p]:
            v = adj_sig(dz[q], sig)
            if gs != CO:
                v = jnp.concatenate([v, jnp.zeros((gs - CO, Mo), f32)], 0)
            rows.append(v)
        dy = jnp.concatenate(rows, 0).astype(dt)            # [2·gs, Mo]
        dwv = jax.lax.dot_general(dy, im_ref[:, :], (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        _acc_slice(first, dwm_ref, (p,), dwv)
        dim = jax.lax.dot_general(wm_ref[p], dy, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)  # [4C, Mo]
        # im-assembly adjoint through the parity buffers (overlapping lane
        # ranges -> f32 accumulation buffers)
        dpe_ref[:, :] = jnp.zeros((C, (Rh + 1) * W), f32)
        dpo_ref[:, :] = jnp.zeros((C, (Rh + 1) * W), f32)
        dpe_ref[:, 0:Mo] = dim[0:C]
        dpo_ref[:, 0:Mo] = dim[C:2 * C]
        dpe_ref[:, W:Mo + W] = dpe_ref[:, W:Mo + W] + dim[2 * C:3 * C]
        dpo_ref[:, W:Mo + W] = dpo_ref[:, W:Mo + W] + dim[3 * C:4 * C]
        # parity-split adjoint: interleave back into window rows via scratch
        # ref writes (an incremental lane-dim concatenate trips Mosaic's
        # offset relayout)
        for j in range(Rh + 1):
            dwin_ref[:, (2 * j) * W:(2 * j + 1) * W] = \
                dpe_ref[:, j * W:(j + 1) * W]
            dwin_ref[:, (2 * j + 1) * W:(2 * j + 2) * W] = \
                dpo_ref[:, j * W:(j + 1) * W]
        _scatter_window_adj(dwin_ref[:, :], dxs[p], des[p], C, W, R, 1,
                            False, dt)


@functools.lru_cache(maxsize=None)
def _make_conv_s2_ct_diff(C: int, CO: int, P: int, h: int, w: int,
                          n_img: int, R: Optional[int], act: Optional[str],
                          slope: float, interpret: bool):
    Rv = _pick_R(h, R, True)
    n_str = h // Rv
    M = n_img * h * w
    efn = _edge_fn_s(n_img, h, w, Rv, 1)

    @jax.custom_vjp
    def f(wm, bias, *planes):
        return tuple(conv_s2_ct(list(planes), wm.astype(planes[0].dtype),
                                bias, C=C, CO=CO, P=P, h=h, w=w, n_img=n_img,
                                R=Rv, act=act, slope=slope,
                                interpret=interpret))

    def fwd(wm, bias, *planes):
        outs = f(wm, bias, *planes)
        return outs, (wm, planes, outs)

    def bwd(saved, gs_in):
        wm, planes, outs = saved
        dt = planes[0].dtype
        edges = [efn(p) for p in planes]
        kernel = functools.partial(_conv_s2_bwd_kernel, C=C, CO=CO, P=P,
                                   W=w, R=Rv, act=act, slope=slope)
        stripe_in = lambda: pl.BlockSpec((C, Rv * w),
                                         lambda i, g: (0, i * n_str + g),
                                         memory_space=pltpu.VMEM)
        stripe_out = lambda: pl.BlockSpec((CO, (Rv // 2) * w),
                                          lambda i, g: (0, i * n_str + g),
                                          memory_space=pltpu.VMEM)
        edge = lambda: pl.BlockSpec((1, C, 2 * w),
                                    lambda i, g: (i * n_str + g, 0, 0),
                                    memory_space=pltpu.VMEM)
        vfull = lambda shape: pl.BlockSpec(shape,
                                           lambda i, g: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)
        f32 = jnp.float32
        Rh = Rv // 2
        res = pl.pallas_call(
            kernel,
            grid=(n_img, n_str),
            in_specs=([stripe_in()] * P + [edge()] * P + [vfull(wm.shape)]
                      + [stripe_out()] * P),
            out_specs=tuple([stripe_in()] * P + [edge()] * P
                            + [vfull(wm.shape), vfull((CO, 1))]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((C, M), dt)] * P
                + [jax.ShapeDtypeStruct((n_img * n_str, C, 2 * w), dt)] * P
                + [jax.ShapeDtypeStruct(wm.shape, f32),
                   jax.ShapeDtypeStruct((CO, 1), f32)]),
            scratch_shapes=[pltpu.VMEM((C, (Rv + 2) * w), dt),
                            pltpu.VMEM((C, (Rh + 1) * w), dt),
                            pltpu.VMEM((C, (Rh + 1) * w), dt),
                            pltpu.VMEM((4 * C, Rh * w), dt),
                            pltpu.VMEM((C, (Rh + 1) * w), f32),
                            pltpu.VMEM((C, (Rh + 1) * w), f32),
                            pltpu.VMEM((C, (Rv + 2) * w), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )(*(list(planes) + edges + [wm.astype(dt)] + list(outs)
            + list(gs_in)))
        res = jax.lax.optimization_barrier(res)
        dxs, des = res[:P], res[P:2 * P]
        dwm, db = res[2 * P], res[2 * P + 1]
        return (dwm.astype(wm.dtype), db) + _plane_grads(planes, dxs, des,
                                                         efn)

    f.defvjp(fwd, bwd)
    return f


def conv_s2_ct_diff(planes, wm, bias, *, C: int, CO: int, P: int, h: int,
                    w: int, n_img: int, R: Optional[int] = None,
                    act: Optional[str] = None, slope: float = 0.2,
                    interpret: bool = False):
    """Differentiable :func:`conv_s2_ct` (wm in master f32; f32 grid-
    accumulated dwm/db)."""
    fn = _make_conv_s2_ct_diff(C, CO, P, h, w, n_img, R, act, slope,
                               interpret)
    return list(fn(wm, bias, *planes))
