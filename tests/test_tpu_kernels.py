"""Real-TPU-only kernel validations (skipped on the CPU CI mesh).

The in-kernel hardware-RNG noise path (kernels/rdb_ct.py `noise_sigma`) has
no interpret-mode lowering (pltpu.prng_seed is TPU-only), so its contracts
are pinned here and run whenever the suite executes against a real chip:

    JAX_REAL_TPU=1 python -m pytest tests/test_tpu_kernels.py -q

(tests/conftest.py forces the 8-virtual-CPU mesh by default; the env var
opts out for this module.) Each test was also executed on the v5e chip when
the feature landed — see NOTES_ROUND3.md for the measured numbers.
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("JAX_REAL_TPU"),
    reason="needs the real TPU backend (set JAX_REAL_TPU=1; conftest forces CPU)")


@requires_tpu
def test_kernel_normal_stats_and_determinism():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from esrganplus_tpu.kernels.rdb_ct import _kernel_normal

    def k(o_ref):
        pltpu.prng_seed(7, 3 ^ (pl.program_id(0) * jnp.int32(-1640531527)))
        o_ref[...] = _kernel_normal((64, 1024))

    f = pl.pallas_call(
        k, grid=(4,),
        out_specs=pl.BlockSpec((64, 1024), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 4096), jnp.float32))
    a = np.asarray(jax.jit(f)())
    assert abs(a.mean()) < 0.02 and abs(a.std() - 1.0) < 0.02
    b = np.asarray(jax.jit(f)())
    assert (a == b).all()                       # replayable given the seed
    assert (a[:, :1024] != a[:, 1024:2048]).any()  # distinct per grid step


@requires_tpu
def test_fused_noise_vjp_identities():
    """y = out·(1+σn) with replayed bits ⇒ (a) the detach variant's grads
    equal the noise-free grads exactly; (b) the non-detach dx equals the
    noise-free VJP applied to cotangent·(1+σn), where (1+σn) is recovered
    from the two forwards' ratio. Run in f32 so the identities are tight."""
    import jax
    import jax.numpy as jnp

    from esrganplus_tpu.kernels.rdb_ct import (prepare_rdb_ct_weights,
                                               rdb_ct_diff)
    from esrganplus_tpu.models.rrdb import RRDBNetConfig, _init_rdb

    nf, gc, h, w, B = 64, 32, 16, 16, 4
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    p = _init_rdb(jax.random.PRNGKey(0), cfg, 0.1, jnp.float32)
    ws = prepare_rdb_ct_weights(p, nf, gc, True, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (nf, B * h * w), jnp.float32)
    seed = jnp.array([123, 456], jnp.int32)
    kw = dict(nf=nf, gc=gc, h=h, w=w, n_img=B, fwd_interleave=2, bwd_pack=2)

    clean = lambda x_: rdb_ct_diff(x_, *ws, **kw)
    noisy = lambda x_: rdb_ct_diff(x_, *ws, noise_seed=seed,
                                   noise_sigma=0.1, **kw)
    noisy_det = lambda x_: rdb_ct_diff(x_, *ws, noise_seed=seed,
                                       noise_sigma=0.1, noise_detach=True,
                                       **kw)
    yc, yn, yd = clean(x), noisy(x), noisy_det(x)
    assert float(jnp.abs(yn - yd).max()) == 0.0  # fwd identical
    r = np.asarray(yn) / np.asarray(yc)
    assert abs(r.std() - 0.1) < 0.01             # σ=0.1 relative noise

    c = jax.random.normal(jax.random.PRNGKey(2), yc.shape, jnp.float32)
    _, vjp_n = jax.vjp(noisy, x)
    _, vjp_c = jax.vjp(clean, x)
    gx_n, = vjp_n(c)
    gx_ref, = vjp_c(c * jnp.asarray(r))
    rel = float(jnp.abs(gx_n - gx_ref).max() / jnp.abs(gx_ref).max())
    assert rel < 1e-5, rel
    _, vjp_d = jax.vjp(noisy_det, x)
    gx_d, = vjp_d(c)
    gx_c, = vjp_c(c)
    assert float(jnp.abs(gx_d - gx_c).max()) == 0.0


@requires_tpu
def test_stage_kernels_compiled_parity():
    """conv_s1_ct / conv_s2_ct COMPILED on the chip (not interpret) match
    the XLA NHWC convs in bf16 to dtype tolerance, and their custom-VJP
    input grads agree. These kernels are off the default path (measured
    dead end, NOTES_ROUND5.md) but stay forceable via stage_kernel='pallas';
    this pins that the compiled Mosaic lowering stays correct."""
    import jax
    import jax.numpy as jnp

    from esrganplus_tpu.kernels.stage_ct import (
        conv_s1_ct_diff, conv_s2_ct_diff, nhwc_to_planes, planes_to_nhwc,
        prepare_conv4s2_ct, prepare_convxp_ct)
    from esrganplus_tpu.models.layers import conv2d

    B, H, W, C, CO, P = 2, 32, 32, 16, 16, 4
    dt = jnp.bfloat16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    w3 = jax.random.normal(k1, (3, 3, C, CO), jnp.float32) * 0.2
    w4 = jax.random.normal(k2, (4, 4, C, CO), jnp.float32) * 0.2
    b = jnp.zeros((CO,), jnp.float32)
    x = jax.random.normal(k3, (B, H, W, C), jnp.float32)

    def kern_s1(x_):
        planes = nhwc_to_planes(x_.astype(dt), P)
        wm, bias = prepare_convxp_ct(w3, b, P, dtype=jnp.float32)
        out = conv_s1_ct_diff(planes, wm, bias, C=C, CO=CO, P=P, h=H,
                              w=W // P, n_img=B, act="lrelu")
        return planes_to_nhwc(out, B, H, W // P).astype(jnp.float32)

    def xla_s1(x_):
        y = conv2d(x_, {"w": w3, "b": b}, stride=1, pad="same", dtype=dt)
        return jnp.where(y >= 0, y, y * 0.2).astype(jnp.float32)

    def kern_s2(x_):
        planes = nhwc_to_planes(x_.astype(dt), P)
        wm, bias = prepare_conv4s2_ct(w4, b, P, dtype=jnp.float32)
        out = conv_s2_ct_diff(planes, wm, bias, C=C, CO=CO, P=P, h=H,
                              w=W // P, n_img=B, act=None)
        return planes_to_nhwc(out, B, H // 2, W // P).astype(jnp.float32)

    def xla_s2(x_):
        return conv2d(x_, {"w": w4, "b": b}, stride=2, pad=1,
                      dtype=dt).astype(jnp.float32)

    for kern, ref in ((kern_s1, xla_s1), (kern_s2, xla_s2)):
        a = np.asarray(jax.jit(kern)(x))
        r = np.asarray(jax.jit(ref)(x))
        scale = np.abs(r).max()
        assert np.abs(a - r).max() <= 0.03 * scale, (kern, np.abs(a - r).max())
        ga = np.asarray(jax.jit(jax.grad(lambda t: jnp.sum(kern(t))))(x))
        gr = np.asarray(jax.jit(jax.grad(lambda t: jnp.sum(ref(t))))(x))
        gs = np.abs(gr).max()
        assert np.abs(ga - gr).max() <= 0.05 * gs, (kern, np.abs(ga - gr).max())
