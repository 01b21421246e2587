import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.convert import (
    infer_rrdbnet_config,
    load_state_dict,
    rrdbnet_from_state_dict,
    rrdbnet_to_state_dict,
)
from esrganplus_tpu.models import RRDBNetConfig, count_params, init_rrdbnet, rrdbnet_forward

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_parity_x4_against_torch_golden():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    params, cfg, info = rrdbnet_from_state_dict(sd)
    assert cfg.nb == 3 and cfg.nf == 32 and cfg.gc == 32 and cfg.upscale == 4
    assert cfg.conv1x1 and not info["missing_conv1x1_blocks"]
    io = np.load(os.path.join(GOLDEN, "rrdb_small_x4_io.npz"))
    y = rrdbnet_forward(params, jnp.asarray(_nchw_to_nhwc(io["x"])), cfg)
    want = _nchw_to_nhwc(io["y"])
    assert y.shape == want.shape
    assert float(np.abs(np.asarray(y) - want).max()) < 1e-5


def test_parity_x2_against_torch_golden():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x2.pth"))
    params, cfg, _ = rrdbnet_from_state_dict(sd)
    assert cfg.upscale == 2 and cfg.nb == 2
    io = np.load(os.path.join(GOLDEN, "rrdb_small_x2_io.npz"))
    y = rrdbnet_forward(params, jnp.asarray(_nchw_to_nhwc(io["x"])), cfg)
    assert float(np.abs(np.asarray(y) - _nchw_to_nhwc(io["y"])).max()) < 1e-5


def test_vanilla_checkpoint_missing_conv1x1_zeros():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4_vanilla.pth"))
    inferred = infer_rrdbnet_config(sd)
    assert not inferred.conv1x1
    # Request the ESRGAN+ graph: missing 1x1s are filled with zeros → identical
    # to the vanilla graph output.
    cfg = RRDBNetConfig(nf=32, nb=3, gc=32, upscale=4, conv1x1=True)
    params, cfg, info = rrdbnet_from_state_dict(sd, cfg)
    assert len(info["missing_conv1x1_blocks"]) == 3 * 3
    io = np.load(os.path.join(GOLDEN, "rrdb_small_x4_vanilla_io.npz"))
    y = rrdbnet_forward(params, jnp.asarray(_nchw_to_nhwc(io["x"])), cfg)
    assert float(np.abs(np.asarray(y) - _nchw_to_nhwc(io["y"])).max()) < 1e-5


def test_missing_conv1x1_error_mode():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4_vanilla.pth"))
    cfg = RRDBNetConfig(nf=32, nb=3, gc=32, upscale=4, conv1x1=True)
    with pytest.raises(ValueError):
        rrdbnet_from_state_dict(sd, cfg, missing_conv1x1="error")


def test_state_dict_roundtrip():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    params, cfg, _ = rrdbnet_from_state_dict(sd)
    sd2 = rrdbnet_to_state_dict(params, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-7, err_msg=k)


def test_init_param_count_matches_flagship():
    # ESRGAN+ flagship: nb=23, nf=64, gc=32, ×4 with conv1x1 shortcuts.
    cfg = RRDBNetConfig()
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    # RRDB param count: known 16.7M class of model; exact value pinned here.
    rdb = (3 * 3 * 64 * 32 + 32) + (3 * 3 * 96 * 32 + 32) + (3 * 3 * 128 * 32 + 32) \
        + (3 * 3 * 160 * 32 + 32) + (3 * 3 * 192 * 64 + 64) + 64 * 32
    expect = (3 * 3 * 3 * 64 + 64) + 23 * 3 * rdb + 3 * (3 * 3 * 64 * 64 + 64) \
        + (3 * 3 * 64 * 64 + 64) + (3 * 3 * 64 * 3 + 3)
    assert n == expect


def test_train_noise_changes_output_and_is_reproducible():
    cfg = RRDBNetConfig(nf=16, nb=2, gc=8, upscale=2)
    params = init_rrdbnet(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
    y_eval = rrdbnet_forward(params, x, cfg, train=False)
    k = jax.random.PRNGKey(3)
    y_tr1 = rrdbnet_forward(params, x, cfg, train=True, rng=k)
    y_tr2 = rrdbnet_forward(params, x, cfg, train=True, rng=k)
    y_tr3 = rrdbnet_forward(params, x, cfg, train=True, rng=jax.random.PRNGKey(4))
    assert not np.allclose(y_eval, y_tr1)
    np.testing.assert_array_equal(np.asarray(y_tr1), np.asarray(y_tr2))
    assert not np.allclose(y_tr1, y_tr3)


def test_noise_disabled_sites():
    cfg = RRDBNetConfig(nf=16, nb=2, gc=8, upscale=2, rdb_noise=False, rrdb_noise=False)
    params = init_rrdbnet(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
    y1 = rrdbnet_forward(params, x, cfg, train=True, rng=jax.random.PRNGKey(5))
    y2 = rrdbnet_forward(params, x, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_scale3_single_stage():
    cfg = RRDBNetConfig(nf=16, nb=1, gc=8, upscale=3)
    params = init_rrdbnet(jax.random.PRNGKey(1), cfg)
    x = jnp.zeros((1, 7, 5, 3))
    y = rrdbnet_forward(params, x, cfg)
    assert y.shape == (1, 21, 15, 3)


def test_bf16_compute_close_to_fp32():
    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    params, cfg, _ = rrdbnet_from_state_dict(sd)
    io = np.load(os.path.join(GOLDEN, "rrdb_small_x4_io.npz"))
    x = jnp.asarray(_nchw_to_nhwc(io["x"]))
    y32 = rrdbnet_forward(params, x, cfg)
    y16 = rrdbnet_forward(params, x, cfg, dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32
    assert float(np.abs(np.asarray(y16) - np.asarray(y32)).max()) < 0.05
