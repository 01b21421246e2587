"""Transposed-layout tail kernels (kernels/tail_ct.py) vs the XLA reference
ops, interpret mode. Reference: upconv = nearest-×2 + 3×3 conv + lrelu
(``block.py:315-322``), HR tail = conv3×3+lrelu, conv3×3
(``architecture.py:73-77``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.kernels.tail_ct import (
    conv_hr_ct,
    interleave_rows,
    prepare_convxp_ct,
    prepare_upfold_ct,
    unphase_columns,
    upfold_ct,
)
from esrganplus_tpu.models.layers import act, conv2d, upsample_nearest


def nhwc_to_planes(x, P):
    # [B, H, Wimg, C] -> list of P [C, B·H·(Wimg/P)]: plane p holds X ≡ p (mod P)
    B, H, Wi, C = x.shape
    return [x[:, :, p::P, :].transpose(3, 0, 1, 2).reshape(C, -1)
            for p in range(P)]


def planes_to_nhwc(planes, n_img, h, w):
    return unphase_columns(planes, n_img, h, w)


@pytest.mark.parametrize("P", [1, 2])
def test_upfold_matches_reference(P):
    B, H, Wi, C, CO = 2, 8, 8 * P, 8, 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, H, Wi, C), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, C, CO), jnp.float32) * 0.3
    b = jax.random.normal(k3, (CO,), jnp.float32)

    ref = act(conv2d(upsample_nearest(x, 2), {"w": wt, "b": b}), "leakyrelu", 0.2)

    planes = nhwc_to_planes(x, P)
    wd, bias = prepare_upfold_ct(wt, b, P, dtype=jnp.float32)
    out = upfold_ct(planes, wd, bias, C=C, P=P, h=H, w=Wi // P, n_img=B,
                    R=4, interpret=True)
    out = interleave_rows(out, CO, B, H, Wi // P)
    got = planes_to_nhwc(out, B, 2 * H, Wi // P)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_upfold_biasless():
    # b=None must run (zeros bias block), matching a bias-free conv
    B, H, Wi, C, CO = 1, 8, 8, 8, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(k1, (B, H, Wi, C), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, C, CO), jnp.float32) * 0.3
    ref = act(conv2d(upsample_nearest(x, 2), {"w": wt}), "leakyrelu", 0.2)
    planes = nhwc_to_planes(x, 1)
    wd, bias = prepare_upfold_ct(wt, None, 1, dtype=jnp.float32)
    out = upfold_ct(planes, wd, bias, C=C, P=1, h=H, w=Wi, n_img=B,
                    R=4, interpret=True)
    out = interleave_rows(out, CO, B, H, Wi)
    got = planes_to_nhwc(out, B, 2 * H, Wi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("P", [2, 4])
def test_conv_hr_matches_reference(P):
    B, H, Wi, C, CO2 = 2, 8, 8 * P, 8, 3
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (B, H, Wi, C), jnp.float32)
    w0 = jax.random.normal(k2, (3, 3, C, C), jnp.float32) * 0.3
    b0 = jax.random.normal(k3, (C,), jnp.float32)
    w1 = jax.random.normal(k4, (3, 3, C, CO2), jnp.float32) * 0.3
    b1 = jax.random.normal(k5, (CO2,), jnp.float32)

    mid = act(conv2d(x, {"w": w0, "b": b0}), "leakyrelu", 0.2)
    ref = conv2d(mid, {"w": w1, "b": b1})

    planes = nhwc_to_planes(x, P)
    wm0, bb0 = prepare_convxp_ct(w0, b0, P, dtype=jnp.float32)
    wm1, bb1 = prepare_convxp_ct(w1, b1, P, dtype=jnp.float32)
    out = conv_hr_ct(planes, wm0, bb0, wm1, bb1, C=C, P=P, CO2=CO2,
                     h=H, w=Wi // P, n_img=B, R=4, interpret=True)
    got = planes_to_nhwc(out, B, H, Wi // P)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def _tail_params(C, CO2, key=2):
    ks = jax.random.split(jax.random.PRNGKey(key), 9)
    return {
        "up1": {"w": jax.random.normal(ks[1], (3, 3, C, C)) * 0.3,
                "b": jax.random.normal(ks[2], (C,))},
        "up2": {"w": jax.random.normal(ks[3], (3, 3, C, C)) * 0.3,
                "b": jax.random.normal(ks[4], (C,))},
        "hr0": {"w": jax.random.normal(ks[5], (3, 3, C, C)) * 0.3,
                "b": jax.random.normal(ks[6], (C,))},
        "hr1": {"w": jax.random.normal(ks[7], (3, 3, C, CO2)) * 0.3,
                "b": jax.random.normal(ks[8], (CO2,))},
    }


def _assert_grads_close(gp, gx, tol=1e-4):
    import jax.tree_util as tu

    flat_p, _ = tu.tree_flatten_with_path(gp)
    flat_x, _ = tu.tree_flatten_with_path(gx)
    assert len(flat_p) == len(flat_x)
    for (path, a), (_, b) in zip(flat_p, flat_x):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < tol, (tu.keystr(path), err, scale)


@pytest.mark.parametrize("P", [1, 2])
def test_upfold_diff_grads_match_xla(P):
    """Custom-VJP upfold (nearest-×2+conv+lrelu): grads wrt raw HWIO params
    and the input must match XLA autodiff. P=2 exercises the packed-input
    de-interleave adjoint; R=4 < h exercises the d_edge scatter (the XLA
    transpose of the stripe_edges gather)."""
    from esrganplus_tpu.kernels.tail_ct import interleave_rows, upfold_ct_diff

    B, H, Wi, C, CO = 2, 8, 8 * P, 8, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (B, H, Wi, C), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, C, CO), jnp.float32) * 0.3
    b = jax.random.normal(k3, (CO,), jnp.float32)

    def loss_x(wt, b, x):
        out = act(conv2d(upsample_nearest(x, 2), {"w": wt, "b": b}),
                  "leakyrelu", 0.2)
        return jnp.sum(jnp.sin(out))

    def loss_p(wt, b, x):
        if P == 1:
            planes = nhwc_to_planes(x, 1)
            packed = False
        else:
            # packed y-phase input: rows [0:C] even logical rows, [C:2C] odd
            planes = [jnp.concatenate(
                [x[:, 0::2, q::P, :].transpose(3, 0, 1, 2).reshape(C, -1),
                 x[:, 1::2, q::P, :].transpose(3, 0, 1, 2).reshape(C, -1)], 0)
                for q in range(P)]
            packed = True
        wd, bias = prepare_upfold_ct(wt, b, P, dtype=jnp.float32)
        out = upfold_ct_diff(planes, wd, bias, C=C, P=P, h=H, w=Wi // P,
                             n_img=B, R=4, packed_in=packed, interpret=True)
        out = interleave_rows(out, CO, B, H, Wi // P)
        return jnp.sum(jnp.sin(unphase_columns(out, B, 2 * H, Wi // P)))

    vx, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(wt, b, x)
    vp, gp = jax.value_and_grad(loss_p, argnums=(0, 1, 2))(wt, b, x)
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    _assert_grads_close(gp, gx)


def test_conv_hr_diff_grads_match_xla():
    """Custom-VJP fused hr0+hr1: the backward recomputes the VMEM-only conv0
    pass per stripe; dw0/db0/dw1/db1 and the input grad must match XLA."""
    from esrganplus_tpu.kernels.tail_ct import conv_hr_ct_diff

    P, B, H, C, CO2 = 2, 2, 8, 8, 3
    Wi = 8 * P
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (B, H, Wi, C), jnp.float32)
    w0 = jax.random.normal(ks[1], (3, 3, C, C), jnp.float32) * 0.3
    b0 = jax.random.normal(ks[2], (C,), jnp.float32)
    w1 = jax.random.normal(ks[3], (3, 3, C, CO2), jnp.float32) * 0.3
    b1 = jax.random.normal(ks[4], (CO2,), jnp.float32)

    def loss_x(w0, b0, w1, b1, x):
        mid = act(conv2d(x, {"w": w0, "b": b0}), "leakyrelu", 0.2)
        return jnp.sum(jnp.sin(conv2d(mid, {"w": w1, "b": b1})))

    def loss_p(w0, b0, w1, b1, x):
        planes = nhwc_to_planes(x, P)
        wm0, bb0 = prepare_convxp_ct(w0, b0, P, dtype=jnp.float32)
        wm1, bb1 = prepare_convxp_ct(w1, b1, P, dtype=jnp.float32)
        out = conv_hr_ct_diff(planes, wm0, bb0, wm1, bb1, C=C, P=P, CO2=CO2,
                              h=H, w=Wi // P, n_img=B, R=4, interpret=True)
        return jnp.sum(jnp.sin(unphase_columns(out, B, H, Wi // P)))

    args = (w0, b0, w1, b1, x)
    vx, gx = jax.value_and_grad(loss_x, argnums=tuple(range(5)))(*args)
    vp, gp = jax.value_and_grad(loss_p, argnums=tuple(range(5)))(*args)
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    _assert_grads_close(gp, gx)


def test_full_tail_diff_chain_grads_match_xla():
    """trunk-out → up1 → up2 → hr0+hr1 through the custom-VJP plane kernels:
    value and every gradient must match the straight XLA tail graph (the
    training tail path of models/rrdb.py at toy width)."""
    from esrganplus_tpu.kernels.tail_ct import conv_hr_ct_diff, upfold_ct_diff

    B, H, C, CO2 = 2, 8, 8, 3
    p = _tail_params(C, CO2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.float32)

    def loss_x(p, x):
        r = act(conv2d(upsample_nearest(x, 2), p["up1"]), "leakyrelu", 0.2)
        r = act(conv2d(upsample_nearest(r, 2), p["up2"]), "leakyrelu", 0.2)
        r = act(conv2d(r, p["hr0"]), "leakyrelu", 0.2)
        return jnp.sum(jnp.sin(conv2d(r, p["hr1"])))

    def loss_p(p, x):
        planes = nhwc_to_planes(x, 1)
        wd1, bb1 = prepare_upfold_ct(p["up1"]["w"], p["up1"]["b"], 1,
                                     jnp.float32)
        t = upfold_ct_diff(planes, wd1, bb1, C=C, P=1, h=H, w=H, n_img=B,
                           R=4, interpret=True)
        wd2, bb2 = prepare_upfold_ct(p["up2"]["w"], p["up2"]["b"], 2,
                                     jnp.float32)
        t = upfold_ct_diff(t, wd2, bb2, C=C, P=2, h=2 * H, w=H, n_img=B,
                           R=4, packed_in=True, interpret=True)
        wm0, cb0 = prepare_convxp_ct(p["hr0"]["w"], p["hr0"]["b"], 4,
                                     jnp.float32)
        wm1, cb1 = prepare_convxp_ct(p["hr1"]["w"], p["hr1"]["b"], 4,
                                     jnp.float32)
        t = conv_hr_ct_diff(t, wm0, cb0, wm1, cb1, C=C, P=4, CO2=CO2,
                            h=4 * H, w=H, n_img=B, R=4, packed_in=True,
                            interpret=True)
        return jnp.sum(jnp.sin(unphase_columns(t, B, 4 * H, H)))

    vx, gx = jax.value_and_grad(loss_x, argnums=(0, 1))(p, x)
    vp, gp = jax.value_and_grad(loss_p, argnums=(0, 1))(p, x)
    assert abs(float(vp - vx)) / abs(float(vx)) < 1e-5
    _assert_grads_close(gp, gx)


def test_full_tail_chain_matches_reference():
    """trunk-out -> up1 -> up2 -> hr0 -> hr1 through the plane kernels vs the
    straight XLA graph (the flagship tail topology at toy width)."""
    B, H, C, CO2 = 2, 8, 8, 3
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (B, H, H, C), jnp.float32)
    up1 = {"w": jax.random.normal(ks[1], (3, 3, C, C)) * 0.3,
           "b": jax.random.normal(ks[2], (C,))}
    up2 = {"w": jax.random.normal(ks[3], (3, 3, C, C)) * 0.3,
           "b": jax.random.normal(ks[4], (C,))}
    hr0 = {"w": jax.random.normal(ks[5], (3, 3, C, C)) * 0.3,
           "b": jax.random.normal(ks[6], (C,))}
    hr1 = {"w": jax.random.normal(ks[7], (3, 3, C, CO2)) * 0.3,
           "b": jax.random.normal(ks[8], (CO2,))}

    r = act(conv2d(upsample_nearest(x, 2), up1), "leakyrelu", 0.2)
    r = act(conv2d(upsample_nearest(r, 2), up2), "leakyrelu", 0.2)
    r = act(conv2d(r, hr0), "leakyrelu", 0.2)
    ref = conv2d(r, hr1)

    planes = nhwc_to_planes(x, 1)
    wd1, bb1 = prepare_upfold_ct(up1["w"], up1["b"], 1, jnp.float32)
    t = upfold_ct(planes, wd1, bb1, C=C, P=1, h=H, w=H, n_img=B, R=4,
                  interpret=True)
    # outputs stay y-phase-packed end to end (no HBM row interleave)
    wd2, bb2 = prepare_upfold_ct(up2["w"], up2["b"], 2, jnp.float32)
    t = upfold_ct(t, wd2, bb2, C=C, P=2, h=2 * H, w=H, n_img=B, R=4,
                  packed_in=True, interpret=True)
    wm0, cb0 = prepare_convxp_ct(hr0["w"], hr0["b"], 4, jnp.float32)
    wm1, cb1 = prepare_convxp_ct(hr1["w"], hr1["b"], 4, jnp.float32)
    t = conv_hr_ct(t, wm0, cb0, wm1, cb1, C=C, P=4, CO2=CO2, h=4 * H, w=H,
                   n_img=B, R=4, packed_in=True, interpret=True)
    got = planes_to_nhwc(t, B, 4 * H, H)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
