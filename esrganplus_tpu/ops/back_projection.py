"""Iterative back-projection post-processing.

Reference surface: ``metrics/back_projection/backprojection.m`` /
``main_bp.m`` (MATLAB, offline): refine an SR estimate so its bicubic
downscale matches the LR input:

    sr ← sr + imresize(lr − imresize(sr, 1/s), s)

run for ``iters`` rounds with the canonical MATLAB-bicubic kernel. Improves
distortion metrics (PSNR) at slight perceptual cost.
"""

from __future__ import annotations

import numpy as np

from esrganplus_tpu.ops.resize import imresize_np


def back_projection(sr: np.ndarray, lr: np.ndarray, scale: int, iters: int = 10) -> np.ndarray:
    """HWC [0,1] images; returns the refined SR (clipped)."""
    sr = np.asarray(sr, np.float32).copy()
    for _ in range(iters):
        down = imresize_np(sr, 1.0 / scale)
        sr = sr + imresize_np(lr - down, float(scale))
    return np.clip(sr, 0.0, 1.0)
