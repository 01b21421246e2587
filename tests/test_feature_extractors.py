import os

import jax.numpy as jnp
import numpy as np
import pytest

import make_goldens
from esrganplus_tpu.convert.pth import load_state_dict
from esrganplus_tpu.models.feature_extractors import (
    minc_forward,
    minc_from_state_dict,
    resnet101_feat_forward,
    resnet101_from_state_dict,
)

CACHE = make_goldens.CACHE


def _nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def featex():
    if not make_goldens.ensure_featex_goldens():
        pytest.skip("reference unavailable")
    return True


def test_minc_parity(featex):
    sd = load_state_dict(os.path.join(CACHE, "minc.pth"))
    io = np.load(os.path.join(CACHE, "minc_io.npz"))
    params = minc_from_state_dict(sd)
    out = minc_forward(params, jnp.asarray(_nchw(io["x"])))
    want = _nchw(io["out"])
    assert out.shape == want.shape  # ceil-mode pools on odd sizes
    assert float(np.abs(np.asarray(out) - want).max()) < 2e-5


def test_resnet_feat_parity(featex):
    sd = load_state_dict(os.path.join(CACHE, "resnet_mini.pth"))
    io = np.load(os.path.join(CACHE, "resnet_mini_io.npz"))
    params = resnet101_from_state_dict(sd)
    out = resnet101_feat_forward(params, jnp.asarray(_nchw(io["x"])))
    want = _nchw(io["out"])
    assert out.shape == want.shape
    assert float(np.abs(np.asarray(out) - want).max()) < 2e-4
