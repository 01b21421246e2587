import os

import numpy as np
import pytest

from esrganplus_tpu.ops.resize import imresize, imresize_np, resize_matrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def bicubic_golden():
    return np.load(os.path.join(GOLDEN, "bicubic.npz"))


def test_matches_reference_imresize_np(bicubic_golden):
    g = bicubic_golden
    for i in range(int(g["n"])):
        inp, scale, want = g[f"in_{i}"], float(g[f"scale_{i}"]), g[f"out_{i}"]
        got = imresize_np(inp, scale)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=f"case {i} scale {scale}")


def test_jax_variant_matches_numpy(bicubic_golden):
    g = bicubic_golden
    inp, scale = g["in_0"], float(g["scale_0"])
    got = np.asarray(imresize(inp, scale))
    np.testing.assert_allclose(got, imresize_np(inp, scale), atol=1e-5)


def test_no_antialias_golden():
    g = np.load(os.path.join(GOLDEN, "bicubic_noaa.npz"))
    got = imresize_np(g["inp"], 0.25, antialiasing=False)
    np.testing.assert_allclose(got, g["out"], atol=2e-5)


def test_batched_jax_resize():
    rng = np.random.RandomState(1)
    batch = rng.rand(2, 32, 40, 3).astype(np.float32)
    out = np.asarray(imresize(batch, 0.25))
    assert out.shape == (2, 8, 10, 3)
    np.testing.assert_allclose(out[1], imresize_np(batch[1], 0.25), atol=1e-5)


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(64, 16, 0.25, True)
    np.testing.assert_allclose(m.sum(axis=1), np.ones(16), atol=1e-6)


def test_roundtrip_identity_scale():
    # scale=1 should be (near-)identity
    m = resize_matrix(32, 32, 1.0, True)
    np.testing.assert_allclose(m, np.eye(32, dtype=np.float32), atol=1e-6)
