"""Alternative perceptual-loss feature extractors (netF variants).

  * :func:`minc_forward` — MINC material-classification VGG-16 variant
    (reference ``codes/models/modules/architecture.py:335-394``): 13 convs with
    relu, 2×2 ceil-mode maxpools, final conv un-activated; weights from the
    reference's ``VGG16minc_53.pth`` layout (``conv11.weight``…``conv53.bias``).
  * :func:`resnet101_feat_forward` — truncated torchvision ResNet-101
    (children[:8] = everything through layer4, reference
    ``architecture.py:311-332``), ImageNet-normalised [0,1] input, frozen.
    Weights convert from a torchvision resnet101 state dict.

Both were alternative/disabled netF choices upstream (ResNet101 commented out at
``networks.py:151``, MINC referenced only by experiment name); provided here for
full capability parity.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.layers import Params, batchnorm, conv2d, kaiming_conv_init

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# ---------------------------------------------------------------------------
# MINC
# ---------------------------------------------------------------------------

_MINC_PLAN = [  # (name, cin, cout) per stage; 'M' = 2×2 ceil maxpool
    ("conv11", 3, 64), ("conv12", 64, 64), "M",
    ("conv21", 64, 128), ("conv22", 128, 128), "M",
    ("conv31", 128, 256), ("conv32", 256, 256), ("conv33", 256, 256), "M",
    ("conv41", 256, 512), ("conv42", 512, 512), ("conv43", 512, 512), "M",
    ("conv51", 512, 512), ("conv52", 512, 512), ("conv53", 512, 512),
]


def _maxpool2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def init_minc(key, dtype=jnp.float32) -> Params:
    params = {}
    k = key
    for entry in _MINC_PLAN:
        if entry == "M":
            continue
        name, cin, cout = entry
        k, sub = jax.random.split(k)
        params[name] = kaiming_conv_init(sub, 3, 3, cin, cout, dtype=dtype)
    return params


def minc_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    params = {}
    for entry in _MINC_PLAN:
        if entry == "M":
            continue
        name, _, _ = entry
        params[name] = {
            "w": jnp.asarray(np.transpose(sd[name + ".weight"], (2, 3, 1, 0)), dtype),
            "b": jnp.asarray(sd[name + ".bias"], dtype),
        }
    return params


def minc_forward(params: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """[B, H, W, 3] RGB [0,1] (no input norm upstream) → [B, H/16, W/16, 512]."""
    h = x
    last = _MINC_PLAN[-1][0]
    for entry in _MINC_PLAN:
        if entry == "M":
            h = _maxpool2_ceil(h)
            continue
        name = entry[0]
        h = conv2d(h, params[name], dtype=dtype)
        if name != last:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# ResNet-101 (torchvision layout)
# ---------------------------------------------------------------------------


def resnet101_from_state_dict(sd: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    """Convert a torchvision resnet101 state dict (children[:8] slice)."""
    def conv(prefix):
        return {"w": jnp.asarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)), dtype)}

    def bn(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"], dtype),
            "bias": jnp.asarray(sd[prefix + ".bias"], dtype),
            "mean": jnp.asarray(sd[prefix + ".running_mean"], dtype),
            "var": jnp.asarray(sd[prefix + ".running_var"], dtype),
        }

    layers = {"stem_conv": conv("conv1"), "stem_bn": bn("bn1"), "blocks": []}
    # infer per-stage depth from the keys (resnet101 = 3/4/23/3)
    depths = {
        stage: 1 + max(int(k.split(".")[1]) for k in sd if k.startswith(f"layer{stage}."))
        for stage in (1, 2, 3, 4)
    }
    for stage, depth in depths.items():
        for i in range(depth):
            base = f"layer{stage}.{i}"
            blk = {
                "c1": conv(base + ".conv1"), "b1": bn(base + ".bn1"),
                "c2": conv(base + ".conv2"), "b2": bn(base + ".bn2"),
                "c3": conv(base + ".conv3"), "b3": bn(base + ".bn3"),
                "stride": 1 if (i > 0 or stage == 1) else 2,
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["proj"] = conv(base + ".downsample.0")
                blk["proj_bn"] = bn(base + ".downsample.1")
            layers["blocks"].append(blk)
    return layers


def resnet101_feat_forward(params: Params, x: jnp.ndarray, use_input_norm: bool = True,
                           dtype=None) -> jnp.ndarray:
    """[B, H, W, 3] RGB [0,1] → layer4 features [B, H/32, W/32, 2048]."""
    if use_input_norm:
        x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(_IMAGENET_STD, x.dtype)
    h = conv2d(x, params["stem_conv"], stride=2, pad=3, dtype=dtype)
    h, _ = batchnorm(h, params["stem_bn"], train=False)
    h = jax.nn.relu(h)
    # 3×3 stride-2 maxpool, pad 1 (torch resnet stem)
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for blk in params["blocks"]:
        s = blk["stride"]
        r = conv2d(h, blk["c1"], dtype=dtype)
        r, _ = batchnorm(r, blk["b1"], train=False)
        r = jax.nn.relu(r)
        r = conv2d(r, blk["c2"], stride=s, dtype=dtype)
        r, _ = batchnorm(r, blk["b2"], train=False)
        r = jax.nn.relu(r)
        r = conv2d(r, blk["c3"], dtype=dtype)
        r, _ = batchnorm(r, blk["b3"], train=False)
        if "proj" in blk:
            sc = conv2d(h, blk["proj"], stride=s, dtype=dtype)
            sc, _ = batchnorm(sc, blk["proj_bn"], train=False)
        else:
            sc = h
        h = jax.nn.relu(sc + r)
    return h
