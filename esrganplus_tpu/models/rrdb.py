"""RRDB generator family (ESRGAN / ESRGAN+ / nESRGAN+ / Tarsier backbone).

Graph parity with the reference (``codes/models/modules/block.py:232-291``,
``architecture.py:47-78``; test_image variant ``test_image/block.py:200-256``), but
built TPU-first:

  * NHWC activations, HWIO weights, fp32 accumulation, optional bf16 compute;
  * the 23 homogeneous RRDB blocks are parameter-stacked and run under
    ``jax.lax.scan`` — one compiled block body instead of 414 unrolled convs, which
    keeps compile time and HLO size flat in depth (set ``unroll`` >1 to trade
    compile time back for schedule freedom);
  * nESRGAN+ Gaussian noise uses explicit JAX PRNG keys, split per block inside the
    scan, so training is bitwise reproducible under pjit.

ESRGAN+ specifics mirrored exactly: the bias-free 1×1 dense shortcut into x2, the
x4 = conv4(cat) + x2 residual, β=0.2 scaling on both RDB and RRDB residuals, and
noise sites configurable per-RDB (both reference variants) and per-RRDB
(``test_image/block.py:256`` only).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from esrganplus_tpu.models.layers import (
    Params,
    act,
    conv2d,
    gaussian_noise,
    kaiming_conv_init,
    upsample_nearest,
)


@dataclasses.dataclass(frozen=True)
class RRDBNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    upscale: int = 4
    act_type: str = "leakyrelu"
    act_slope: float = 0.2
    # ESRGAN+ 1×1 dense shortcut (reference block.py:153-154,263). False gives the
    # vanilla-ESRGAN RDB graph.
    conv1x1: bool = True
    # Noise sites: per-RDB (both reference variants, block.py:268) and per-RRDB
    # (test_image/block.py:256 only).
    rdb_noise: bool = True
    rrdb_noise: bool = False
    noise_sigma: float = 0.1
    noise_relative_detach: bool = False
    res_scale: float = 0.2
    # lax.scan unroll factor over the nb blocks.
    unroll: int = 1

    @property
    def n_upscale_stages(self) -> int:
        if self.upscale == 3:
            return 1
        return int(round(math.log2(self.upscale))) if self.upscale > 1 else 0


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_rdb(key, cfg: RRDBNetConfig, scale: float, dtype) -> Params:
    nf, gc = cfg.nf, cfg.gc
    ks = jax.random.split(key, 6)
    p = {
        "conv1": kaiming_conv_init(ks[0], 3, 3, nf, gc, scale, dtype=dtype),
        "conv2": kaiming_conv_init(ks[1], 3, 3, nf + gc, gc, scale, dtype=dtype),
        "conv3": kaiming_conv_init(ks[2], 3, 3, nf + 2 * gc, gc, scale, dtype=dtype),
        "conv4": kaiming_conv_init(ks[3], 3, 3, nf + 3 * gc, gc, scale, dtype=dtype),
        "conv5": kaiming_conv_init(ks[4], 3, 3, nf + 4 * gc, nf, scale, dtype=dtype),
    }
    if cfg.conv1x1:
        # Bias-free 1×1, out channels = gc (shortcut lands on x2 which has gc chans).
        p["conv1x1"] = kaiming_conv_init(ks[5], 1, 1, nf, gc, scale, bias=False, dtype=dtype)
    return p


def init_rrdbnet(key, cfg: RRDBNetConfig, init_scale: float = 0.1, dtype=jnp.float32) -> Params:
    """Parameter pytree; the ``trunk`` subtree is stacked over the nb blocks."""
    n_keys = 5 + cfg.n_upscale_stages
    keys = jax.random.split(key, n_keys)
    block_keys = jax.random.split(keys[0], cfg.nb * 3).reshape(cfg.nb, 3, -1)

    def one_rrdb(ks3):
        return {
            "rdb1": _init_rdb(ks3[0], cfg, init_scale, dtype),
            "rdb2": _init_rdb(ks3[1], cfg, init_scale, dtype),
            "rdb3": _init_rdb(ks3[2], cfg, init_scale, dtype),
        }

    trunk = jax.vmap(one_rrdb)(block_keys)

    params: Params = {
        "fea_conv": kaiming_conv_init(keys[1], 3, 3, cfg.in_nc, cfg.nf, init_scale, dtype=dtype),
        "trunk": trunk,
        "trunk_conv": kaiming_conv_init(keys[2], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "hr_conv0": kaiming_conv_init(keys[3], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype),
        "hr_conv1": kaiming_conv_init(keys[4], 3, 3, cfg.nf, cfg.out_nc, init_scale, dtype=dtype),
    }
    params["upconvs"] = [
        kaiming_conv_init(keys[5 + i], 3, 3, cfg.nf, cfg.nf, init_scale, dtype=dtype)
        for i in range(cfg.n_upscale_stages)
    ]
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rdb_forward(x, p: Params, cfg: RRDBNetConfig, key, train: bool, dtype):
    """Residual dense block with ESRGAN+'s two extra residual paths."""
    a = lambda t: act(t, cfg.act_type, cfg.act_slope)
    x1 = a(conv2d(x, p["conv1"], dtype=dtype))
    x2 = a(conv2d(jnp.concatenate([x, x1], -1), p["conv2"], dtype=dtype))
    if cfg.conv1x1:
        x2 = x2 + conv2d(x, p["conv1x1"], dtype=dtype)
    x3 = a(conv2d(jnp.concatenate([x, x1, x2], -1), p["conv3"], dtype=dtype))
    x4 = a(conv2d(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"], dtype=dtype)) + x2
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"], dtype=dtype)
    out = x5 * cfg.res_scale + x
    if train and cfg.rdb_noise and cfg.noise_sigma > 0:
        out = gaussian_noise(out, key, cfg.noise_sigma, cfg.noise_relative_detach)
    return out


def _rrdb_forward(x, p: Params, cfg: RRDBNetConfig, key, train: bool, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = _rdb_forward(x, p["rdb1"], cfg, k1, train, dtype)
    h = _rdb_forward(h, p["rdb2"], cfg, k2, train, dtype)
    h = _rdb_forward(h, p["rdb3"], cfg, k3, train, dtype)
    out = h * cfg.res_scale + x
    if train and cfg.rrdb_noise and cfg.noise_sigma > 0:
        out = gaussian_noise(out, key=k4, sigma=cfg.noise_sigma,
                             relative_detach=cfg.noise_relative_detach)
    return out


def rrdbnet_forward(params: Params, x: jnp.ndarray, cfg: RRDBNetConfig, *,
                    train: bool = False, rng: Optional[jax.Array] = None,
                    dtype=None) -> jnp.ndarray:
    """×``cfg.upscale`` super-resolution of NHWC RGB [0,1] input.

    ``dtype`` selects the compute precision (None = input dtype / fp32 parity
    path; jnp.bfloat16 for throughput). Noise needs ``rng`` when
    ``train=True`` and a noise site is enabled.
    """
    needs_rng = train and cfg.noise_sigma > 0 and (cfg.rdb_noise or cfg.rrdb_noise)
    if needs_rng and rng is None:
        raise ValueError("rrdbnet_forward: train-mode noise needs an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    block_keys = jax.random.split(rng, cfg.nb)

    fea = conv2d(x, params["fea_conv"], dtype=dtype)

    def body(h, xs):
        block_params, key = xs
        return _rrdb_forward(h, block_params, cfg, key, train, dtype), None

    trunk, _ = jax.lax.scan(body, fea, (params["trunk"], block_keys), unroll=cfg.unroll)
    fea = fea + conv2d(trunk, params["trunk_conv"], dtype=dtype)

    factor = 3 if cfg.upscale == 3 else 2
    for up in params["upconvs"]:
        fea = act(conv2d(upsample_nearest(fea, factor), up, dtype=dtype), cfg.act_type, cfg.act_slope)
    fea = act(conv2d(fea, params["hr_conv0"], dtype=dtype), cfg.act_type, cfg.act_slope)
    out = conv2d(fea, params["hr_conv1"], dtype=dtype)
    return out.astype(jnp.float32)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
