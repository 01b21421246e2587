"""Numerics for the D/VGG plane-layout stage kernels (kernels/stage_ct.py):
forward parity vs XLA NHWC convs and custom-VJP gradients vs XLA autodiff,
all in interpret mode on CPU (the on-chip contract is covered by
verify_tpu.py / tests/test_tpu_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.kernels.stage_ct import (
    conv_s1_ct,
    conv_s1_ct_diff,
    conv_s2_ct,
    conv_s2_ct_diff,
    nhwc_to_planes,
    planes_to_nhwc,
    pool2_planes,
    prepare_conv4s2_ct,
    prepare_convxp_ct,
    s2_groups,
)
from esrganplus_tpu.models.layers import conv2d

B, H, W = 2, 16, 16


def _mk(key, c, co, k):
    kw, kb, kx = jax.random.split(key, 3)
    w = jax.random.normal(kw, (k, k, c, co), jnp.float32) * 0.2
    b = jax.random.normal(kb, (co,), jnp.float32) * 0.1
    x = jax.random.normal(kx, (B, H, W, c), jnp.float32)
    return w, b, x


def test_nhwc_planes_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 5))
    for P in (1, 2, 4):
        planes = nhwc_to_planes(x, P)
        assert len(planes) == P and planes[0].shape == (5, B * H * (W // P))
        np.testing.assert_array_equal(np.asarray(planes_to_nhwc(planes, B, H, W // P)),
                                      np.asarray(x))


def test_s2_groups_cover_all_taps():
    for P in (2, 4, 8):
        g = s2_groups(P)
        taps = [t for p in g for t in g[p]]
        assert len(taps) == 2 * P
        assert {(q, s) for q, s, _ in taps} == {(q, s) for q in range(P // 2)
                                                for s in range(4)}
        assert all(sig in (-1, 0, 1) for _, _, sig in taps)


@pytest.mark.parametrize("P,c,co,act", [(1, 8, 8, None), (2, 8, 16, "relu"),
                                        (4, 3, 8, "lrelu")])
def test_conv_s1_ct_matches_xla(P, c, co, act):
    w, b, x = _mk(jax.random.PRNGKey(1), c, co, 3)
    want = conv2d(x, {"w": w, "b": b}, stride=1, pad="same")
    if act == "relu":
        want = jax.nn.relu(want)
    elif act == "lrelu":
        want = jnp.where(want >= 0, want, want * 0.2)
    wm, bias = prepare_convxp_ct(w, b, P, dtype=jnp.float32)
    planes = nhwc_to_planes(x, P)
    out = conv_s1_ct(planes, wm, bias, C=c, CO=co, P=P, h=H, w=W // P,
                     n_img=B, act=act, interpret=True)
    got = planes_to_nhwc(out, B, H, W // P)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("P,c,co,act", [(2, 8, 8, None), (4, 8, 16, "lrelu"),
                                        (4, 3, 8, None)])
def test_conv_s2_ct_matches_xla(P, c, co, act):
    w, b, x = _mk(jax.random.PRNGKey(2), c, co, 4)
    want = conv2d(x, {"w": w, "b": b}, stride=2, pad=1)
    if act == "lrelu":
        want = jnp.where(want >= 0, want, want * 0.2)
    wm, bias = prepare_conv4s2_ct(w, b, P, dtype=jnp.float32)
    planes = nhwc_to_planes(x, P)
    out = conv_s2_ct(planes, wm, bias, C=c, CO=co, P=P, h=H, w=W // P,
                     n_img=B, act=act, interpret=True)
    got = planes_to_nhwc(out, B, H // 2, W // P)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pool2_planes_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, 8))
    want = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    for P in (2, 4):
        planes = nhwc_to_planes(x, P)
        out = pool2_planes(planes, B, H, W // P)
        got = planes_to_nhwc(out, B, H // 2, W // P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("P,c,co,act", [(2, 8, 8, "relu"), (4, 8, 16, None)])
def test_conv_s1_ct_diff_grads_match_xla(P, c, co, act):
    w, b, x = _mk(jax.random.PRNGKey(4), c, co, 3)

    def loss_ref(w_, b_, x_):
        y = conv2d(x_, {"w": w_, "b": b_}, stride=1, pad="same")
        if act == "relu":
            y = jax.nn.relu(y)
        return jnp.sum(jnp.sin(y))

    def loss_kern(w_, b_, x_):
        wm, bias = prepare_convxp_ct(w_, b_, P, dtype=jnp.float32)
        planes = nhwc_to_planes(x_, P)
        out = conv_s1_ct_diff(planes, wm, bias, C=c, CO=co, P=P, h=H,
                              w=W // P, n_img=B, act=act, interpret=True)
        return jnp.sum(jnp.sin(planes_to_nhwc(out, B, H, W // P)))

    gw, gb, gx = jax.grad(loss_ref, argnums=(0, 1, 2))(w, b, x)
    kw, kb, kx = jax.grad(loss_kern, argnums=(0, 1, 2))(w, b, x)
    np.testing.assert_allclose(np.asarray(kx), np.asarray(gx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(gb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kw), np.asarray(gw), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("P,c,co,act", [(2, 8, 8, None), (4, 8, 16, "lrelu")])
def test_conv_s2_ct_diff_grads_match_xla(P, c, co, act):
    w, b, x = _mk(jax.random.PRNGKey(5), c, co, 4)

    def loss_ref(w_, b_, x_):
        y = conv2d(x_, {"w": w_, "b": b_}, stride=2, pad=1)
        if act == "lrelu":
            y = jnp.where(y >= 0, y, y * 0.2)
        return jnp.sum(jnp.sin(y))

    def loss_kern(w_, b_, x_):
        wm, bias = prepare_conv4s2_ct(w_, b_, P, dtype=jnp.float32)
        planes = nhwc_to_planes(x_, P)
        out = conv_s2_ct_diff(planes, wm, bias, C=c, CO=co, P=P, h=H,
                              w=W // P, n_img=B, act=act, interpret=True)
        return jnp.sum(jnp.sin(planes_to_nhwc(out, B, H // 2, W // P)))

    gw, gb, gx = jax.grad(loss_ref, argnums=(0, 1, 2))(w, b, x)
    kw, kb, kx = jax.grad(loss_kern, argnums=(0, 1, 2))(w, b, x)
    np.testing.assert_allclose(np.asarray(kx), np.asarray(gx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(gb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kw), np.asarray(gw), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# model-level integration: D and VGG forward parity + grads, pallas vs xla
# ---------------------------------------------------------------------------


def _d_cfgs(**kw):
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig

    kw.setdefault("input_size", 96)
    kw.setdefault("base_nf", 8)
    return (DiscriminatorVGGConfig(stage_kernel="pallas", **kw),
            DiscriminatorVGGConfig(stage_kernel="xla", **kw))


@pytest.mark.parametrize("train", [False, True])
def test_discriminator_pallas_stages_match_xla(train):
    from esrganplus_tpu.models.discriminator import (
        discriminator_forward, init_discriminator)

    cfg_p, cfg_x = _d_cfgs()
    params = init_discriminator(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3), jnp.float32)
    lp, sp = discriminator_forward(params, x, cfg_p, train=train)
    lx, sx = discriminator_forward(params, x, cfg_x, train=train)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)
    if train:
        for a, b in zip(jax.tree.leaves(sp["bn"]), jax.tree.leaves(sx["bn"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_discriminator_pallas_stages_grads_match_xla():
    from esrganplus_tpu.models.discriminator import (
        discriminator_forward, init_discriminator)

    cfg_p, cfg_x = _d_cfgs()
    params = init_discriminator(jax.random.PRNGKey(0), cfg_x)
    # batch 1: the interpret-mode kernels are the suite's slow path and the
    # grad math is batch-size-independent (suite-runtime guard)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3), jnp.float32)

    def loss(cfg):
        def f(p, x_):
            logits, _ = discriminator_forward(p, x_, cfg, train=True)
            return jnp.sum(jnp.sin(logits))
        return f

    gp = jax.grad(loss(cfg_p), argnums=(0, 1))(params, x)
    gx = jax.grad(loss(cfg_x), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vgg_pallas_stages_match_xla_and_grads():
    from esrganplus_tpu.models.vgg import (
        VGGFeatConfig, init_vgg_feat, vgg_feat_forward)

    layout = (8, 8, "M", 16, 16, "M", 32)
    cfg_p = VGGFeatConfig(feature_layer=12, layout=layout, stage_kernel="pallas")
    cfg_x = VGGFeatConfig(feature_layer=12, layout=layout, stage_kernel="xla")
    params = init_vgg_feat(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(vgg_feat_forward(params, x, cfg_p)),
        np.asarray(vgg_feat_forward(params, x, cfg_x)),
        rtol=1e-4, atol=1e-4)

    def loss(cfg):
        return lambda x_: jnp.sum(jnp.sin(vgg_feat_forward(params, x_, cfg)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss(cfg_p))(x)),
        np.asarray(jax.grad(loss(cfg_x))(x)),
        rtol=2e-4, atol=2e-4)


def test_vgg_pallas_truncation_mid_block():
    # feature_layer cutting at a conv WITHOUT its relu (the reference's l34
    # semantics) must run the trailing conv with act=None in the plane path
    from esrganplus_tpu.models.vgg import (
        VGGFeatConfig, init_vgg_feat, vgg_feat_forward)

    layout = (8, 8, "M", 16)
    cfg_p = VGGFeatConfig(feature_layer=5, layout=layout, stage_kernel="pallas")
    cfg_x = VGGFeatConfig(feature_layer=5, layout=layout, stage_kernel="xla")
    params = init_vgg_feat(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3), jnp.float32)
    a = vgg_feat_forward(params, x, cfg_p)
    b = vgg_feat_forward(params, x, cfg_x)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_stage_kernel_auto_resolves_to_xla():
    # round-5 measured dead end: 'auto' must NOT take the plane kernels
    # (they lose to XLA at these stacks on v5e — NOTES_ROUND5.md)
    from esrganplus_tpu.models.discriminator import (
        DiscriminatorVGGConfig, _use_pallas_stages as d_gate)
    from esrganplus_tpu.models.vgg import (
        VGGFeatConfig, _use_pallas_stages as v_gate)

    assert d_gate(DiscriminatorVGGConfig(input_size=128), jnp.bfloat16,
                  128, 128) == 0
    assert not v_gate(VGGFeatConfig(), jnp.bfloat16, 128, 128)
    assert d_gate(DiscriminatorVGGConfig(input_size=128,
                                         stage_kernel="pallas"),
                  jnp.bfloat16, 128, 128) == 2
    assert v_gate(VGGFeatConfig(stage_kernel="pallas"), jnp.bfloat16,
                  128, 128)
    # the plane path hardcodes the lrelu gate — any other act must fall back
    # to XLA even when forced, or the kernel D computes a different function
    assert d_gate(DiscriminatorVGGConfig(input_size=128, act_type="relu",
                                         stage_kernel="pallas"),
                  jnp.bfloat16, 128, 128) == 0


def test_wgan_gp_rejects_forced_stage_kernels():
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
    from esrganplus_tpu.models.rrdb import RRDBNetConfig
    from esrganplus_tpu.train.gan_model import GANTrainConfig, GANTrainer

    with pytest.raises(ValueError, match="second-order"):
        GANTrainer(RRDBNetConfig(nf=8, nb=1, gc=4),
                   DiscriminatorVGGConfig(input_size=96, base_nf=8,
                                          stage_kernel="pallas"),
                   GANTrainConfig(gan_type="wgan-gp", feature_weight=0.0))
