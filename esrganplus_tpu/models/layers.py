"""Primitive NN layers as pure functions over parameter pytrees (NHWC / HWIO).

TPU-first conventions: activations are NHWC (channels-last maps to the TPU lane
dimension), conv weights are HWIO, and everything here is jit/vmap/scan-friendly —
no module objects, just ``init_*`` functions producing pytrees and ``apply``
functions consuming them.

Behavioural spec for init comes from the reference's Kaiming scheme
(``codes/models/networks.py:30-45``): He-normal fan-in (gain √2), weight scaled by
``scale`` (0.1 for generators), zero bias.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def kaiming_conv_init(key, kh: int, kw: int, cin: int, cout: int, scale: float = 1.0,
                      bias: bool = True, dtype=jnp.float32) -> Params:
    """He-normal (fan_in, gain √2) conv weight [kh, kw, cin, cout], scaled."""
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * (std * scale)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def kaiming_linear_init(key, cin: int, cout: int, scale: float = 1.0, dtype=jnp.float32) -> Params:
    std = math.sqrt(2.0 / cin)
    return {
        "w": jax.random.normal(key, (cin, cout), dtype) * (std * scale),
        "b": jnp.zeros((cout,), dtype),
    }


def normal_conv_init(key, kh, kw, cin, cout, std: float = 0.02, bias: bool = True, dtype=jnp.float32) -> Params:
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def batchnorm_init(c: int, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def conv2d(x: jnp.ndarray, p: Params, stride: int = 1, dilation: int = 1,
           groups: int = 1, pad: str | int = "same", dtype=None,
           precision=None) -> jnp.ndarray:
    """2-D convolution, NHWC × HWIO → NHWC.

    ``pad``: "same" (zero), "valid", or an explicit symmetric int. ``dtype``
    optionally casts input and weights (bf16 compute policy) while keeping fp32
    accumulation via ``preferred_element_type``. When computing in fp32
    (``dtype=None``) the default precision is HIGHEST — the TPU MXU otherwise
    decomposes fp32 into bf16 passes, which breaks ≤1e-3 checkpoint parity.
    """
    w = p["w"]
    preferred = jnp.float32
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
        # Let the conv emit `dtype` directly: the MXU accumulates in fp32
        # internally either way, and a f32 preferred_element_type breaks the
        # conv's transpose (backward) rule under mixed dtypes in this JAX
        # version.
        preferred = None
    elif precision is None:
        precision = jax.lax.Precision.HIGHEST
    if pad == "same":
        k_eff_h = (w.shape[0] - 1) * dilation + 1
        k_eff_w = (w.shape[1] - 1) * dilation + 1
        padding = ((k_eff_h // 2, (k_eff_h - 1) // 2), (k_eff_w // 2, (k_eff_w - 1) // 2))
    elif pad == "valid":
        padding = ((0, 0), (0, 0))
    else:
        padding = ((pad, pad), (pad, pad))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=preferred,
        precision=precision,
    )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out if dtype is None else out.astype(dtype)


def linear(x: jnp.ndarray, p: Params, dtype=None) -> jnp.ndarray:
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"].astype(jnp.float32)
    return out if dtype is None else out.astype(dtype)


def pad_spatial(x: jnp.ndarray, amount: int, mode: str) -> jnp.ndarray:
    """Explicit spatial padding for reflect/replicate pad types (reference
    ``block.py:40-52``); zero padding is folded into the conv itself."""
    if amount == 0 or mode in (None, "zero"):
        return x
    jmode = {"reflect": "reflect", "replicate": "edge"}[mode]
    return jnp.pad(x, ((0, 0), (amount, amount), (amount, amount), (0, 0)), mode=jmode)


def act(x: jnp.ndarray, kind: Optional[str], slope: float = 0.2) -> jnp.ndarray:
    """relu / leakyrelu(slope) / none (reference act factory ``block.py:12-25``)."""
    if kind is None:
        return x
    if kind == "relu":
        return jax.nn.relu(x)
    if kind in ("leakyrelu", "lrelu"):
        return jnp.where(x >= 0, x, x * slope)
    raise NotImplementedError(f"activation [{kind}]")


def batchnorm(x: jnp.ndarray, p: Params, train: bool, momentum: float = 0.9, eps: float = 1e-5):
    """BatchNorm over NHW; returns (y, updated_stats). Torch-compatible semantics:
    batch statistics in train mode (biased var for normalisation, unbiased for the
    running update), running statistics in eval."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": momentum * p["mean"] + (1 - momentum) * mean,
            "var": momentum * p["var"] + (1 - momentum) * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * p["scale"] + p["bias"]
    return y, new_stats


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour spatial upsampling of NHWC by an integer factor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space matching torch.nn.PixelShuffle given NCHW→NHWC converted
    weights: channel index factors as (c_out, r, r)."""
    b, h, w, c = x.shape
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, cout)


def gaussian_noise(x: jnp.ndarray, key, sigma: float, relative_detach: bool = False) -> jnp.ndarray:
    """nESRGAN+ noise injection (reference ``block.py:110-122``): additive noise
    with per-element scale ``sigma * x``. Train-time only — callers gate on the
    train flag. With ``relative_detach`` the scale is cut out of the gradient."""
    scale = sigma * (jax.lax.stop_gradient(x) if relative_detach else x)
    return x + jax.random.normal(key, x.shape, x.dtype) * scale


def minibatch_std_concat(x: jnp.ndarray, averaging: str = "all") -> jnp.ndarray:
    """PGGAN-style minibatch-stddev feature concat (reference
    ``block.py:158-191``), NHWC.

    Upstream this layer is dead code (never referenced by any network) and two
    of its modes contain latent bugs (``flat`` calls a bare ``mean``; ``group``
    reads the nonexistent ``self.shape``); implemented here for inventory
    completeness with the four modes that actually work, using the reference's
    ``sqrt(var + 1e-8)`` adjusted std over the batch axis.
    """
    averaging = averaging.lower()
    std = jnp.sqrt(jnp.mean(
        (x - jnp.mean(x, axis=0, keepdims=True)) ** 2, axis=0, keepdims=True)
        + 1e-8)
    n = x.shape[0]
    if averaging == "all":
        vals = jnp.mean(std, axis=-1, keepdims=True)          # [1, H, W, 1]
    elif averaging == "spatial":
        vals = jnp.mean(std, axis=(1, 2), keepdims=True)      # [1, 1, 1, C]
    elif averaging == "none":
        vals = std                                            # [1, H, W, C]
    elif averaging == "gpool":
        vals = jnp.mean(x, axis=(0, 1, 2), keepdims=True)     # [1, 1, 1, C]
    else:
        raise NotImplementedError(
            f"minibatch_std averaging [{averaging}] (reference 'flat'/'group' "
            "modes are broken upstream and intentionally unsupported)")
    vals = jnp.broadcast_to(vals, (n,) + vals.shape[1:3] + (vals.shape[3],))
    vals = jnp.broadcast_to(vals, (n, x.shape[1], x.shape[2], vals.shape[3]))
    return jnp.concatenate([x, vals], axis=-1)


def orthogonal_conv_init(key, kh: int, kw: int, cin: int, cout: int, gain: float = 1.0,
                         bias: bool = True, dtype=jnp.float32) -> Params:
    """Orthogonal conv init (reference ``networks.py:47-59`` variant): the
    [cout, kh·kw·cin] matrix is orthogonalised, zero bias."""
    flat = jax.nn.initializers.orthogonal(scale=gain, column_axis=0)(
        key, (cout, kh * kw * cin), dtype)
    w = jnp.transpose(flat.reshape(cout, kh, kw, cin), (1, 2, 3, 0))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p
