"""Iterative back-projection / reverse-filter post-processing.

Reference surface: ``codes/scripts/back_projection/{backprojection.m,
main_bp.m, main_reverse_filter.m}`` (MATLAB, offline). Two refinement loops
over an SR estimate, both using the canonical MATLAB-bicubic kernel; both run
20 iterations upstream and improve distortion metrics (PSNR) at slight
perceptual cost.

* ``back_projection`` (``backprojection.m:1-20``): the residual
  ``up(lr − down(sr))`` is smoothed with a SQUARED, renormalised 5×5 σ=1
  Gaussian (``p = fspecial('gaussian',5,1); p = p.^2; p = p/sum(p)``) before
  being added — easy to miss, but it is in the shipped script.
* ``reverse_filter`` (``main_reverse_filter.m:18-23``): fixed target
  ``J = up(lr)``; each step adds ``J − up(down(sr))`` (both resizes at the
  full scale factor, no filtering).
"""

from __future__ import annotations

import numpy as np

from esrganplus_tpu.ops.resize import imresize_np


def _fspecial_gaussian_sq(size: int = 5, sigma: float = 1.0) -> np.ndarray:
    """1-D factor of MATLAB's fspecial('gaussian')² kernel (separable)."""
    r = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(r ** 2) / (2 * sigma ** 2))
    g = g / g.sum()          # fspecial normalises the 2-D kernel; separably equal
    g2 = g ** 2              # p = p.^2 stays separable: (gx·gy)² = gx²·gy²
    return g2 / g2.sum()     # renormalise (2-D renorm = product of 1-D renorms)


def _conv2_same(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable 2-D 'same' convolution with zero padding (MATLAB conv2)."""
    pad = len(k1d) // 2
    out = np.zeros_like(img, dtype=np.float64)
    tmp = np.pad(img.astype(np.float64), ((pad, pad), (0, 0), (0, 0)))
    acc = np.zeros_like(img, dtype=np.float64)
    for i, kv in enumerate(k1d):
        acc += kv * tmp[i:i + img.shape[0]]
    tmp = np.pad(acc, ((0, 0), (pad, pad), (0, 0)))
    out = np.zeros_like(acc)
    for j, kv in enumerate(k1d):
        out += kv * tmp[:, j:j + img.shape[1]]
    return out


def back_projection(sr: np.ndarray, lr: np.ndarray, scale: int, iters: int = 20) -> np.ndarray:
    """``backprojection.m``: sr += gauss²⊛ up(lr − down(sr)); HWC [0,1] in,
    clipped float32 out."""
    sr = np.asarray(sr, np.float64).copy()
    lr = np.asarray(lr, np.float64)
    k1d = _fspecial_gaussian_sq()
    h, w = sr.shape[0], sr.shape[1]
    for _ in range(iters):
        down = imresize_np(sr.astype(np.float32), 1.0 / scale).astype(np.float64)
        diff = imresize_np((lr - down).astype(np.float32), float(scale)).astype(np.float64)
        sr = sr + _conv2_same(diff[:h, :w], k1d)
    return np.clip(sr, 0.0, 1.0).astype(np.float32)


def reverse_filter(sr: np.ndarray, lr: np.ndarray, scale: int, iters: int = 20) -> np.ndarray:
    """``main_reverse_filter.m:18-23``: sr += up(lr) − up(down(sr)); HWC [0,1]
    in, clipped float32 out."""
    sr = np.asarray(sr, np.float32).copy()
    j = imresize_np(np.asarray(lr, np.float32), float(scale))
    h, w = sr.shape[0], sr.shape[1]
    for _ in range(iters):
        down = imresize_np(sr, 1.0 / scale)
        sr = sr + (j[:h, :w] - imresize_np(down, float(scale))[:h, :w])
    return np.clip(sr, 0.0, 1.0).astype(np.float32)
