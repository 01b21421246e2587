"""Noise-PRNG selection for the nESRGAN+ noise sites.

The reference's noise is ``torch.normal_`` per step (``block.py:120``) — no
bitwise reproducibility contract, so the DEFAULT here is ``"rbg"``: XLA's
hardware RngBitGenerator, deterministic per (key, shape) on a fixed
compiler/backend but not guaranteed stable across XLA versions. The
flagship recipe draws 69 × [16,32,32,64] normals per step; through threefry
that costs ~5 ms of the 28 ms PSNR step (v5e, 2026-08-17). Set
``train.noise_prng: "threefry"`` for bitwise-reproducible replay (keys are
threefry either way — only the sampling impl changes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def noise_key(rng, impl: str = "threefry"):
    """Re-wrap a (folded) threefry key for the requested sampling impl."""
    if impl in ("threefry", None):
        return rng
    data = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    reps = -(-4 // max(1, data.shape[0]))  # rbg keys take 4 uint32 words
    return jax.random.wrap_key_data(jnp.tile(data, reps)[:4], impl=impl)
