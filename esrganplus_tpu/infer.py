"""One-shot super-resolution inference (the reference's ``test_image/test.py`` surface).

Loads reference ``.pth`` checkpoints through the converter and runs the RRDB
generator under ``jit``. Shapes are static under XLA, so the forward is compiled
per input shape and cached; ``pad_multiple`` optionally right/bottom-pads inputs
(edge mode) to a bucket size to bound the number of compilations, trading exact
border parity for fewer recompiles.

Reference behaviour mirrored (``test_image/test.py:26-40``): BGR uint8 on disk →
RGB [0,1] → forward → clamp(0,1) → BGR ×255 rounded PNG named ``<base>_rlt.png``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.convert import load_state_dict, rrdbnet_from_state_dict
from esrganplus_tpu.models import RRDBNetConfig, rrdbnet_forward
from esrganplus_tpu.ops.image_io import img2tensor, tensor2img


def load_generator(path: str, cfg: Optional[RRDBNetConfig] = None,
                   missing_conv1x1: str = "zeros"):
    """Load a reference RRDBNet ``.pth`` → (params, cfg, info)."""
    sd = load_state_dict(path)
    return rrdbnet_from_state_dict(sd, cfg, missing_conv1x1=missing_conv1x1)


class SRInferencer:
    """jit-compiled ×scale SR on arbitrary-size images.

    ``dtype=None`` is the fp32 parity path; ``jnp.bfloat16`` the throughput path.
    """

    def __init__(self, params, cfg: RRDBNetConfig, dtype=None, pad_multiple: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.dtype = dtype
        self.pad_multiple = pad_multiple
        self._fwd = jax.jit(
            functools.partial(rrdbnet_forward, cfg=cfg, train=False, dtype=dtype)
        )

    def upscale(self, img_rgb: np.ndarray) -> np.ndarray:
        """HWC (or NHWC) RGB [0,1] float → upscaled float32 RGB, clipped to [0,1]."""
        x = jnp.asarray(img_rgb, jnp.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        h, w = x.shape[1], x.shape[2]
        ph = pw = 0
        if self.pad_multiple:
            m = self.pad_multiple
            ph, pw = (-h) % m, (-w) % m
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        y = self._fwd(self.params, x)
        s = self.cfg.upscale
        y = y[:, : h * s, : w * s, :]
        y = jnp.clip(y, 0.0, 1.0)
        out = np.asarray(y, np.float32)
        return out[0] if squeeze else out

    def upscale_bgr_to_png(self, img_bgr01: np.ndarray) -> np.ndarray:
        """HWC BGR [0,1] → HWC BGR uint8 result (file-format ready)."""
        rgb = img2tensor(img_bgr01)
        out = self.upscale(rgb)
        return tensor2img(out)
