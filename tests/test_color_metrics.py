import os

import numpy as np
import pytest

from esrganplus_tpu.ops.color import bgr2ycbcr, modcrop, rgb2ycbcr, y_channel_jax, ycbcr2rgb
from esrganplus_tpu.ops.metrics import calculate_psnr, calculate_ssim, psnr_jax, ssim_jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def color_golden():
    return np.load(os.path.join(GOLDEN, "color.npz"))


@pytest.fixture(scope="module")
def metrics_golden():
    return np.load(os.path.join(GOLDEN, "metrics.npz"))


def test_rgb2ycbcr_float(color_golden):
    g = color_golden
    np.testing.assert_allclose(rgb2ycbcr(g["imgf"], True), g["rgb2y_f"], atol=1e-6)
    np.testing.assert_allclose(rgb2ycbcr(g["imgf"], False), g["rgb2ycc_f"], atol=1e-6)


def test_rgb2ycbcr_uint8(color_golden):
    g = color_golden
    assert rgb2ycbcr(g["imgu"], True).dtype == np.uint8
    np.testing.assert_array_equal(rgb2ycbcr(g["imgu"], True), g["rgb2y_u"])


def test_bgr2ycbcr(color_golden):
    g = color_golden
    np.testing.assert_allclose(bgr2ycbcr(g["imgf"], True), g["bgr2y_f"], atol=1e-6)
    np.testing.assert_array_equal(bgr2ycbcr(g["imgu"], False), g["bgr2ycc_u"])


def test_ycbcr2rgb(color_golden):
    g = color_golden
    np.testing.assert_allclose(ycbcr2rgb(g["imgf"]), g["ycbcr2rgb_f"], atol=1e-6)
    np.testing.assert_array_equal(ycbcr2rgb(g["imgu"]), g["ycbcr2rgb_u"])


def test_color_no_input_mutation():
    rng = np.random.RandomState(3)
    img = rng.rand(8, 8, 3).astype(np.float32)
    keep = img.copy()
    rgb2ycbcr(img, True)
    bgr2ycbcr(img, False)
    ycbcr2rgb(img)
    np.testing.assert_array_equal(img, keep)


def test_y_channel_jax_matches_numpy(color_golden):
    g = color_golden
    got = np.asarray(y_channel_jax(g["imgf"], "rgb"))
    np.testing.assert_allclose(got, rgb2ycbcr(g["imgf"], True), atol=1e-5)


def test_modcrop():
    img = np.zeros((37, 53, 3))
    assert modcrop(img, 4).shape == (36, 52, 3)
    assert modcrop(img[:, :, 0], 8).shape == (32, 48)


def test_psnr_golden(metrics_golden):
    g = metrics_golden
    assert abs(calculate_psnr(g["a"], g["b"]) - float(g["psnr"])) < 1e-9
    assert abs(calculate_psnr(g["a"][:, :, 0], g["b"][:, :, 0]) - float(g["psnr_gray"])) < 1e-9


def test_psnr_identical_is_inf():
    a = np.ones((8, 8)) * 100
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_golden(metrics_golden):
    g = metrics_golden
    assert abs(calculate_ssim(g["a"], g["b"]) - float(g["ssim_rgb"])) < 1e-8
    assert abs(calculate_ssim(g["a"][:, :, 0], g["b"][:, :, 0]) - float(g["ssim_gray"])) < 1e-8


def test_jax_metrics_close_to_host(metrics_golden):
    g = metrics_golden
    assert abs(float(psnr_jax(g["a"], g["b"])) - float(g["psnr"])) < 1e-3
    assert abs(float(ssim_jax(g["a"], g["b"])) - float(g["ssim_rgb"])) < 1e-4
