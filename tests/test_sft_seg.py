import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import make_goldens
from esrganplus_tpu.convert.pth import load_state_dict
from esrganplus_tpu.models.seg import SegConfig, init_seg, seg_forward, seg_from_state_dict
from esrganplus_tpu.models.sft import (
    SFTNetConfig,
    acd_apply_updates,
    acd_forward,
    init_acd,
    init_sftnet,
    sftnet_forward,
    sftnet_from_state_dict,
)

CACHE = make_goldens.CACHE


def _nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def sft_fixture():
    if not make_goldens.ensure_sft_goldens():
        pytest.skip("reference unavailable")
    return (load_state_dict(os.path.join(CACHE, "sft_net.pth")),
            np.load(os.path.join(CACHE, "sft_io.npz")),
            load_state_dict(os.path.join(CACHE, "acd.pth")),
            np.load(os.path.join(CACHE, "acd_io.npz")))


def test_sftnet_parity(sft_fixture):
    sd, io, _, _ = sft_fixture
    params, _ = sftnet_from_state_dict(sd)
    out = sftnet_forward(params, jnp.asarray(_nchw(io["img"])), jnp.asarray(_nchw(io["seg"])))
    want = _nchw(io["out"])
    assert out.shape == want.shape
    assert float(np.abs(np.asarray(out) - want).max()) < 2e-5


def test_sftnet_init_and_shapes():
    cfg = SFTNetConfig(nb=2)
    params = init_sftnet(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((2, 12, 10, 3))
    seg = jnp.zeros((2, 48, 40, 8))
    out = sftnet_forward(params, img, seg, cfg)
    assert out.shape == (2, 48, 40, 3)


def test_acd_parity(sft_fixture):
    _, _, sd, io = sft_fixture
    from esrganplus_tpu.models.sft import acd_from_state_dict

    params = acd_from_state_dict(sd)

    x = jnp.asarray(_nchw(io["x"]))
    gan_e, cls_e, _ = acd_forward(params, x, train=False)
    np.testing.assert_allclose(np.asarray(gan_e), io["gan_e"], atol=3e-4)
    np.testing.assert_allclose(np.asarray(cls_e), io["cls_e"], atol=3e-4)
    gan_t, cls_t, upd = acd_forward(params, x, train=True)
    np.testing.assert_allclose(np.asarray(gan_t), io["gan_t"], atol=3e-4)
    np.testing.assert_allclose(np.asarray(cls_t), io["cls_t"], atol=3e-4)
    p2 = acd_apply_updates(params, upd)
    assert not np.allclose(np.asarray(p2["bn"][1]["mean"]), np.asarray(params["bn"][1]["mean"]))


def test_acd_state_dict_roundtrip():
    """ACD .pth converters invert each other (reference-free); the exported
    key set matches the torch module's exact layout (strict=True loadable)."""
    from esrganplus_tpu.models.sft import acd_from_state_dict, acd_to_state_dict

    params = init_acd(jax.random.PRNGKey(3))
    sd = acd_to_state_dict(params)
    # exact reference key layout: conv at feature.0 then conv/BN pairs every
    # 3 indices; gan/cls Linear heads at .0/.2 (sft_arch.py:87-142)
    conv_idx = [0, 2, 5, 8, 11, 14, 17, 20]
    bn_idx = [3, 6, 9, 12, 15, 18, 21]
    want = set()
    for i in conv_idx:
        want |= {f"feature.{i}.weight", f"feature.{i}.bias"}
    for i in bn_idx:
        want |= {f"feature.{i}.{s}" for s in
                 ("weight", "bias", "running_mean", "running_var",
                  "num_batches_tracked")}
    for head in ("gan", "cls"):
        want |= {f"{head}.0.weight", f"{head}.0.bias",
                 f"{head}.2.weight", f"{head}.2.bias"}
    assert set(sd) == want
    back = acd_from_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_seg_parity():
    if not make_goldens.ensure_seg_goldens():
        pytest.skip("reference unavailable")
    sd = load_state_dict(os.path.join(CACHE, "seg.pth"))
    io = np.load(os.path.join(CACHE, "seg_io.npz"))
    params = seg_from_state_dict(sd)
    out = seg_forward(params, jnp.asarray(_nchw(io["x"])))
    want = _nchw(io["out"])
    assert out.shape == want.shape
    assert float(np.abs(np.asarray(out) - want).max()) < 1e-4
    # softmax output: rows sum to 1
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
