"""Outdoor-scene segmentation network (SFT-GAN's conditioning front-end).

Rebuild of ``codes/models/modules/seg_arch.py``: a dilated ResNet-101-style
backbone of Res131 bottlenecks (1×1-BN-relu → 3×3-BN-relu (dilated) → 1×1-BN,
projection shortcut on channel change, relu after the residual add), a 512-ch
head, an 8-class 1×1 classifier, a grouped 16×16 stride-8 transposed conv for
×8 upsampling, and a softmax (``seg_arch.py:8-70``). Used offline to produce
the 8-class seg maps SFT-GAN consumes (reference ``codes/test_seg.py``).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.layers import Params, act, batchnorm, batchnorm_init, conv2d, kaiming_conv_init

# Backbone plan: ('conv', cin, cout, k, stride) | ('pool',) | ('res', in, mid, out, dilation, stride)
_PLAN: List[tuple] = (
    [("conv", 3, 64, 3, 2), ("conv", 64, 64, 3, 1), ("conv", 64, 128, 3, 1), ("pool",)]
    + [("res", 128, 64, 256, 1, 1)] + [("res", 256, 64, 256, 1, 1)] * 2
    + [("res", 256, 128, 512, 1, 2)] + [("res", 512, 128, 512, 1, 1)] * 3
    + [("res", 512, 256, 1024, 2, 1)] + [("res", 1024, 256, 1024, 2, 1)] * 22
    + [("res", 1024, 512, 2048, 4, 1)] + [("res", 2048, 512, 2048, 4, 1)] * 2
    + [("conv", 2048, 512, 3, 1)]
)


@dataclasses.dataclass(frozen=True)
class SegConfig:
    n_classes: int = 8
    deconv_kernel: int = 16
    deconv_stride: int = 8
    deconv_pad: int = 4


def _init_bn_conv(key, cin, cout, k, dtype):
    return {
        "conv": kaiming_conv_init(key, k, k, cin, cout, bias=False, dtype=dtype),
        "bn": batchnorm_init(cout, dtype),
    }


def init_seg(key, cfg: SegConfig = SegConfig(), dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 4 * len(_PLAN) + 4))
    layers = []
    for entry in _PLAN:
        if entry[0] == "conv":
            _, cin, cout, k, s = entry
            layers.append(_init_bn_conv(next(keys), cin, cout, k, dtype))
        elif entry[0] == "pool":
            layers.append(None)
        else:
            _, cin, mid, cout, dil, s = entry
            blk = {
                "c0": _init_bn_conv(next(keys), cin, mid, 1, dtype),
                "c1": _init_bn_conv(next(keys), mid, mid, 3, dtype),
                "c2": _init_bn_conv(next(keys), mid, cout, 1, dtype),
            }
            if cin != cout:
                blk["proj"] = _init_bn_conv(next(keys), cin, cout, 1, dtype)
            layers.append(blk)
    return {
        "layers": layers,
        "classifier": kaiming_conv_init(next(keys), 1, 1, 512, cfg.n_classes, dtype=dtype),
        # grouped transposed conv: per-class [k, k] kernel
        "deconv_w": jnp.zeros((cfg.deconv_kernel, cfg.deconv_kernel, 1, cfg.n_classes), dtype),
    }


def _maxpool_ceil(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """MaxPool(k, s, pad 0, ceil_mode=True): pad right/bottom so the last
    partial window counts (torch ceil_mode semantics)."""
    h, w = x.shape[1], x.shape[2]
    oh = -(-(h - k) // s) + 1
    ow = -(-(w - k) // s) + 1
    ph = max(0, (oh - 1) * s + k - h)
    pw = max(0, (ow - 1) * s + k - w)
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _bn_conv(x, p, stride=1, dilation=1, relu=True, dtype=None):
    x = conv2d(x, p["conv"], stride=stride, dilation=dilation, dtype=dtype)
    x, _ = batchnorm(x, p["bn"], train=False)
    return act(x, "relu") if relu else x


def seg_forward(params: Params, x: jnp.ndarray, cfg: SegConfig = SegConfig(),
                dtype=None) -> jnp.ndarray:
    """[B, H, W, 3] image (reference feeds BGR [0,255]-scaled inputs) →
    [B, H, W, 8] softmax class probabilities. Eval-mode (frozen BN, no dropout)."""
    h = x
    for entry, p in zip(_PLAN, params["layers"]):
        if entry[0] == "conv":
            h = _bn_conv(h, p, stride=entry[4], dtype=dtype)
        elif entry[0] == "pool":
            h = _maxpool_ceil(h)
        else:
            _, cin, mid, cout, dil, s = entry
            res = _bn_conv(h, p["c0"], dtype=dtype)
            res = _bn_conv(res, p["c1"], stride=s, dilation=dil, dtype=dtype)
            res = _bn_conv(res, p["c2"], relu=False, dtype=dtype)
            shortcut = _bn_conv(h, p["proj"], stride=s, relu=False, dtype=dtype) \
                if "proj" in p else h
            h = act(shortcut + res, "relu")
    h = conv2d(h, params["classifier"], dtype=dtype)

    # grouped ConvTranspose2d(8, 8, 16, stride 8, pad 4, groups=8, no bias):
    # equivalent to lhs-dilated depthwise conv with the kernel flipped.
    k, s, p_ = cfg.deconv_kernel, cfg.deconv_stride, cfg.deconv_pad
    w = params["deconv_w"][::-1, ::-1, :, :]
    pad = k - 1 - p_
    dn = jax.lax.conv_dimension_numbers(h.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        h, w, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(s, s), dimension_numbers=dn,
        feature_group_count=cfg.n_classes, preferred_element_type=jnp.float32)
    return jax.nn.softmax(h, axis=-1)


# ---------------------------------------------------------------------------
# torch .pth conversion — flattened `feature.{i}` indices: conv_blocks emit
# [conv, bn, act]; Res131 is a single module with res.{0,1,3,4,6,7} conv/bn
# pairs (act slots collapse inside its own sequential) and optional proj.
# ---------------------------------------------------------------------------


def seg_from_state_dict(sd, cfg: SegConfig = SegConfig(), dtype=jnp.float32) -> Params:
    def conv_w(prefix, bias=False):
        p = {"w": jnp.asarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)), dtype)}
        if bias:
            p["b"] = jnp.asarray(sd[prefix + ".bias"], dtype)
        return p

    def bn_w(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"], dtype),
            "bias": jnp.asarray(sd[prefix + ".bias"], dtype),
            "mean": jnp.asarray(sd[prefix + ".running_mean"], dtype),
            "var": jnp.asarray(sd[prefix + ".running_var"], dtype),
        }

    # Build index map by replaying the reference's flattening.
    layers = []
    idx = 0
    for entry in _PLAN:
        if entry[0] == "conv":
            layers.append({"conv": conv_w(f"feature.{idx}"), "bn": bn_w(f"feature.{idx + 1}")})
            idx += 3  # conv, bn, act
        elif entry[0] == "pool":
            layers.append(None)
            idx += 1
        else:
            base = f"feature.{idx}"
            blk = {
                "c0": {"conv": conv_w(base + ".res.0"), "bn": bn_w(base + ".res.1")},
                "c1": {"conv": conv_w(base + ".res.3"), "bn": bn_w(base + ".res.4")},
                "c2": {"conv": conv_w(base + ".res.6"), "bn": bn_w(base + ".res.7")},
            }
            if f"{base}.proj.0.weight" in sd:
                blk["proj"] = {"conv": conv_w(base + ".proj.0"), "bn": bn_w(base + ".proj.1")}
            layers.append(blk)
            idx += 1
    # trailing: dropout slot then 1×1 classifier
    idx += 1
    params = {
        "layers": layers,
        "classifier": conv_w(f"feature.{idx}", bias=True),
        # torch ConvTranspose2d weight [in=8, out/groups=1, k, k] → [k, k, 1, 8]
        "deconv_w": jnp.asarray(
            np.transpose(sd["deconv.weight"], (2, 3, 1, 0)), dtype),
    }
    return params
