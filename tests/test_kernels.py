"""Interpret-mode correctness tests for the experimental Pallas kernels."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import esrganplus_tpu.kernels.workbench.conv as conv_mod
import esrganplus_tpu.kernels.workbench.rdb as rdb_mod
from esrganplus_tpu.models.layers import kaiming_conv_init
from esrganplus_tpu.models.rrdb import RRDBNetConfig, _rdb_forward


@pytest.fixture()
def interpret_mode(monkeypatch):
    patched = functools.partial(pl.pallas_call, interpret=True)
    monkeypatch.setattr(conv_mod.pl, "pallas_call", patched)
    monkeypatch.setattr(rdb_mod.pl, "pallas_call", patched)


def test_conv3x3_kernel_interpret(interpret_mode):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 24)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (24,)) * 0.1
    got = conv_mod.conv3x3(x, w, b, act_slope=0.2, tile=8)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b
    want = jnp.where(want >= 0, want, want * 0.2)
    assert float(jnp.abs(got - want).max()) < 1e-5


def _rand_rdb_params(nf, gc, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    p = {
        "conv1": kaiming_conv_init(ks[0], 3, 3, nf, gc, 1.0),
        "conv2": kaiming_conv_init(ks[1], 3, 3, nf + gc, gc, 1.0),
        "conv3": kaiming_conv_init(ks[2], 3, 3, nf + 2 * gc, gc, 1.0),
        "conv4": kaiming_conv_init(ks[3], 3, 3, nf + 3 * gc, gc, 1.0),
        "conv5": kaiming_conv_init(ks[4], 3, 3, nf + 4 * gc, nf, 1.0),
        "conv1x1": kaiming_conv_init(ks[5], 1, 1, nf, gc, 1.0, bias=False),
    }
    for c in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        p[c]["b"] = jax.random.normal(jax.random.fold_in(ks[0], hash(c) % 97),
                                      p[c]["b"].shape) * 0.1
    return p


@pytest.mark.parametrize("pack", [1, 2])
def test_rdb_t_kernel_matches_xla_rdb(pack):
    # the production transposed RDB kernel (kernels/rdb_t.py): exact zero-pad
    # semantics incl. row/column edges — H != W catches axis mixups. pack=2
    # packs both images into ONE grid step (exercising the inter-image
    # boundary masks); pack=1 the per-image grid (array-end zero fill).
    from esrganplus_tpu.kernels.rdb_t import prepare_rdb_t_weights, rdb_t

    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _rand_rdb_params(nf, gc, key=5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
    ws = prepare_rdb_t_weights(p, nf, gc, True, dtype=jnp.float32)
    xt = x.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
    out = rdb_t(xt, *ws, nf=nf, gc=gc, h=H, w=W, n_img=B, pack=pack,
                interpret=True)
    out = out.reshape(nf, B, H, W).transpose(1, 2, 3, 0)
    assert float(jnp.abs(out - ref).max()) < 1e-4


@pytest.mark.parametrize("mode", [("pack", 1), ("pack", 2),
                                  ("interleave", 2), ("nosplit", 1)])
def test_rdb_ct_kernel_matches_xla_rdb(mode):
    # the column-merged RDB kernel (kernels/rdb_ct.py): 3 row taps in IM3,
    # column taps merged into the dot's output rows and combined with
    # post-shift masks. Covers the packed row-boundary masks (pack=2), the
    # software-pipelined multi-image variant (interleave=2), and both dot
    # orders. H != W catches axis mixups.
    from esrganplus_tpu.kernels.rdb_ct import prepare_rdb_ct_weights, rdb_ct

    kind, val = mode
    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _rand_rdb_params(nf, gc, key=5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
    ws = prepare_rdb_ct_weights(p, nf, gc, True, dtype=jnp.float32)
    xt = x.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
    kw = dict(nf=nf, gc=gc, h=H, w=W, n_img=B, interpret=True)
    if kind == "pack":
        out = rdb_ct(xt, *ws, pack=val, **kw)
    elif kind == "interleave":
        out = rdb_ct(xt, *ws, interleave=val, **kw)
    else:
        out = rdb_ct(xt, *ws, split_dots=False, **kw)
    out = out.reshape(nf, B, H, W).transpose(1, 2, 3, 0)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_rdb_ct_epilogue_fold():
    # rrdb_scale/res fold (RRDB out·β + h0, reference block.py:287-291) in the
    # interleaved kernel — the combination the inference trunk actually runs.
    from esrganplus_tpu.kernels.rdb_ct import prepare_rdb_ct_weights, rdb_ct

    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _rand_rdb_params(nf, gc, key=9)
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, nf), jnp.float32)
    res = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None) * 0.2 + res
    ws = prepare_rdb_ct_weights(p, nf, gc, True, dtype=jnp.float32)
    tr = lambda a: a.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
    out = rdb_ct(tr(x), *ws, tr(res), nf=nf, gc=gc, h=H, w=W, n_img=B,
                 rrdb_scale=0.2, interleave=2, interpret=True)
    out = out.reshape(nf, B, H, W).transpose(1, 2, 3, 0)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_rdb_ct_no_conv1x1():
    # vanilla-ESRGAN RDB graph: the 1×1 shortcut rows are zeros (MXU tile
    # padding either way) and x2 must come out without the shortcut term.
    import dataclasses

    from esrganplus_tpu.kernels.rdb_ct import prepare_rdb_ct_weights, rdb_ct

    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc, conv1x1=False)
    p = _rand_rdb_params(nf, gc, key=11)
    p = {k: v for k, v in p.items() if k != "conv1x1"}
    x = jax.random.uniform(jax.random.PRNGKey(5), (B, H, W, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
    ws = prepare_rdb_ct_weights(p, nf, gc, False, dtype=jnp.float32)
    xt = x.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
    out = rdb_ct(xt, *ws, nf=nf, gc=gc, h=H, w=W, n_img=B, interpret=True)
    out = out.reshape(nf, B, H, W).transpose(1, 2, 3, 0)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_conv3x3_ct_matches_xla():
    # generic column-merged 3×3 conv kernel (epilogue/tail use): bias,
    # residual and leaky-relu epilogues, multi-image interleave.
    from esrganplus_tpu.kernels.rdb_ct import (conv3x3_ct,
                                               prepare_conv_ct_weights)
    from esrganplus_tpu.models.layers import conv2d

    cin, cout, B, H, W = 16, 24, 2, 10, 14
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, cin, cout)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(1), (cout,)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, cin), jnp.float32)
    res = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, cout), jnp.float32)
    tr = lambda a, c: a.transpose(3, 0, 1, 2).reshape(c, B * H * W)
    untr = lambda a, c: a.reshape(c, B, H, W).transpose(1, 2, 3, 0)
    wm, bm = prepare_conv_ct_weights(w, b, dtype=jnp.float32)
    for use_res, slope, il in ((False, None, 1), (True, 0.2, 2)):
        want = conv2d(x, {"w": w, "b": b})
        if use_res:
            want = want + res
        if slope is not None:
            want = jnp.where(want >= 0, want, want * slope)
        got = conv3x3_ct(tr(x, cin), wm, bm,
                         tr(res, cout) if use_res else None,
                         cin=cin, cout=cout, h=H, w=W, n_img=B,
                         interleave=il, slope=slope, interpret=True)
        assert float(jnp.abs(untr(got, cout) - want).max()) < 1e-4, (use_res,)


def test_conv3x3_ct_diff_grads_match_xla():
    # custom-VJP generic conv (the training trunk-conv/global-residual fold):
    # grads wrt raw HWIO weights, bias, input and residual vs XLA autodiff.
    from esrganplus_tpu.kernels.rdb_ct import (conv3x3_ct_diff,
                                               prepare_conv_ct_weights)
    from esrganplus_tpu.models.layers import conv2d

    cin, cout, B, H, W = 16, 8, 2, 6, 10
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, cin, cout)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(5), (cout,)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, cin), jnp.float32)
    res = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, cout), jnp.float32)
    tr = lambda a, c: a.transpose(3, 0, 1, 2).reshape(c, B * H * W)

    def loss_p(w, b, x, res):
        wm, bm = prepare_conv_ct_weights(w, b, dtype=jnp.float32)
        out = conv3x3_ct_diff(tr(x, cin), wm, bm, tr(res, cout), cin=cin,
                              cout=cout, h=H, w=W, n_img=B, interleave=2,
                              interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_x(w, b, x, res):
        return jnp.sum(jnp.sin(conv2d(x, {"w": w, "b": b}) + res))

    vp, gp = jax.value_and_grad(loss_p, argnums=(0, 1, 2, 3))(w, b, x, res)
    vx, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3))(w, b, x, res)
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    for name, a, bb in zip(("dw", "db", "dx", "dres"), gp, gx):
        err = float(jnp.abs(a - bb).max())
        scale = float(jnp.abs(bb).max()) + 1e-6
        assert err / scale < 1e-4, (name, err, scale)


def test_rdb_ct_diff_grads_match_xla():
    # column-merged custom-VJP pair: grads wrt the raw param dict and the
    # input must match the XLA reference graph (f32, interpret mode). The
    # combine adjoint (masked reverse lane-shifts) and the free-riding 1×1
    # path through the IM3 center rows are the novel adjoint pieces.
    from esrganplus_tpu.kernels.rdb_ct import (prepare_rdb_ct_weights,
                                               rdb_ct_diff)

    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _rand_rdb_params(nf, gc, key=7)
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, nf), jnp.float32)

    def loss_pallas(p, x):
        ws = prepare_rdb_ct_weights(p, nf, gc, True, dtype=jnp.float32)
        xt = x.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
        out = rdb_ct_diff(xt, *ws, nf=nf, gc=gc, h=H, w=W, n_img=B,
                          interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(p, x):
        out = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
        return jnp.sum(jnp.sin(out))

    (vp, gp) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(p, x)
    (vx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1))(p, x)
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    for (path, a), (_, b) in zip(flat_p, flat_x):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < 1e-4, (path, err, scale)


def test_rdb_t_diff_grads_match_xla():
    # custom-VJP kernel pair: grads wrt the raw param dict and the input must
    # match the XLA reference graph (f32, interpret mode; nonuniform cotangent
    # via sin so every adjoint path is exercised).
    from esrganplus_tpu.kernels.rdb_t import prepare_rdb_t_weights, rdb_t_diff

    nf, gc, B, H, W = 16, 8, 2, 10, 14
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _rand_rdb_params(nf, gc, key=7)
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, nf), jnp.float32)

    def loss_pallas(p, x):
        ws = prepare_rdb_t_weights(p, nf, gc, True, dtype=jnp.float32)
        xt = x.transpose(3, 0, 1, 2).reshape(nf, B * H * W)
        out = rdb_t_diff(xt, *ws, nf=nf, gc=gc, h=H, w=W, n_img=B,
                         interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(p, x):
        out = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
        return jnp.sum(jnp.sin(out))

    (vp, gp) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(p, x)
    (vx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1))(p, x)
    # the loss is a sum over 4480 elements — compare relatively
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    for (path, a), (_, b) in zip(flat_p, flat_x):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < 1e-4, (path, err, scale)


@pytest.mark.slow
def test_rrdbnet_pallas_train_grads_match_xla():
    # full train-mode model: pallas trunk (custom VJP + noise between kernel
    # calls) vs the XLA trunk — same noise keys, so values AND grads agree.
    import dataclasses

    from esrganplus_tpu.models import init_rrdbnet, rrdbnet_forward

    cfg_p = RRDBNetConfig(nf=16, nb=2, gc=8, trunk_kernel="pallas",
                          noise_sigma=0.1)
    cfg_x = dataclasses.replace(cfg_p, trunk_kernel="xla", fused=False)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg_p)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    rng = jax.random.PRNGKey(3)

    def loss(params, cfg):
        out = rrdbnet_forward(params, x, cfg, train=True, rng=rng)
        return jnp.mean(jnp.abs(out - 0.5))

    vp, gp = jax.value_and_grad(loss)(params, cfg_p)
    vx, gx = jax.value_and_grad(loss)(params, cfg_x)
    assert abs(float(vp - vx)) < 1e-5
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < 1e-3, (err, scale)


@pytest.mark.parametrize("detach", [False, True])
def test_rrdbnet_input_noise_matches_xla(detach):
    # noise_kernel="input": XLA pre-draws the per-site noise (same keys and
    # NHWC draw order as the XLA path) and the kernel epilogue applies the
    # relative-noise multiply; the backward scales the cotangent at load
    # (detach: identity — the backward never touches the noise). Values and
    # grads must match the plain XLA trunk.
    import dataclasses

    from esrganplus_tpu.models import init_rrdbnet, rrdbnet_forward

    cfg_p = RRDBNetConfig(nf=16, nb=2, gc=8, trunk_kernel="pallas",
                          noise_sigma=0.1, noise_kernel="input",
                          noise_relative_detach=detach)
    cfg_x = dataclasses.replace(cfg_p, trunk_kernel="xla", fused=False,
                                noise_kernel="xla")
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg_p)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    rng = jax.random.PRNGKey(3)

    def loss(params, cfg):
        out = rrdbnet_forward(params, x, cfg, train=True, rng=rng)
        return jnp.mean(jnp.abs(out - 0.5))

    vp, gp = jax.value_and_grad(loss)(params, cfg_p)
    vx, gx = jax.value_and_grad(loss)(params, cfg_x)
    assert abs(float(vp - vx)) < 1e-5
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < 1e-3, (err, scale)


@pytest.mark.slow
def test_rrdbnet_unrolled_trunk_matches_scan():
    # the fully Python-unrolled training trunk (unroll >= nb forces it even
    # in interpret mode; unroll=0 "auto" takes it on TPU) must produce the
    # same values and grads as the lax.scan trunk.
    import dataclasses

    from esrganplus_tpu.models import init_rrdbnet, rrdbnet_forward

    cfg_u = RRDBNetConfig(nf=16, nb=2, gc=8, trunk_kernel="pallas",
                          noise_sigma=0.1, unroll=2)
    cfg_s = dataclasses.replace(cfg_u, unroll=1)
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg_u)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    rng = jax.random.PRNGKey(3)

    def loss(params, cfg):
        out = rrdbnet_forward(params, x, cfg, train=True, rng=rng)
        return jnp.mean(jnp.abs(out - 0.5))

    vu, gu = jax.value_and_grad(loss)(params, cfg_u)
    vs, gs = jax.value_and_grad(loss)(params, cfg_s)
    assert abs(float(vu - vs)) < 1e-6
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gs)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_rrdbnet_pallas_trunk_matches_xla():
    # full-model integration: trunk_kernel='pallas' (interpret on CPU) must
    # reproduce the XLA trunk including RRDB residuals and the upconv tail.
    import dataclasses

    from esrganplus_tpu.models import init_rrdbnet, rrdbnet_forward

    cfg_p = RRDBNetConfig(nf=16, nb=2, gc=8, trunk_kernel="pallas")
    cfg_x = dataclasses.replace(cfg_p, trunk_kernel="xla")
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg_p)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 9, 12, 3), jnp.float32)
    out_p = rrdbnet_forward(params, x, cfg_p, train=False)
    out_x = rrdbnet_forward(params, x, cfg_x, train=False)
    assert float(jnp.abs(out_p - out_x).max()) < 1e-4


def test_rdb_fused_kernel_interpret(interpret_mode):
    nf, gc = 16, 8
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    p = {
        "conv1": kaiming_conv_init(ks[0], 3, 3, nf, gc, 1.0),
        "conv2": kaiming_conv_init(ks[1], 3, 3, nf + gc, gc, 1.0),
        "conv3": kaiming_conv_init(ks[2], 3, 3, nf + 2 * gc, gc, 1.0),
        "conv4": kaiming_conv_init(ks[3], 3, 3, nf + 3 * gc, gc, 1.0),
        "conv5": kaiming_conv_init(ks[4], 3, 3, nf + 4 * gc, nf, 1.0),
        "conv1x1": kaiming_conv_init(ks[5], 1, 1, nf, gc, 1.0, bias=False),
    }
    for c in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        p[c]["b"] = jax.random.normal(jax.random.fold_in(ks[0], hash(c) % 97),
                                      p[c]["b"].shape) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
    wts = rdb_mod.prepare_rdb_weights(p, nf, gc, True, dtype=jnp.float32)
    got = rdb_mod.rdb_fused(x, *wts, nf=nf, gc=gc, conv1x1=True, tile=32)
    # f32 kernel vs f32 reference: tight tolerance; exercises border masks too
    assert float(jnp.abs(got - ref).max()) < 1e-4
