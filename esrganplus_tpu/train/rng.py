"""Noise-PRNG selection for the nESRGAN+ noise sites.

The reference's noise is ``torch.normal_`` per step (``block.py:120``) — no
bitwise reproducibility contract. Our default threefry keys ARE bitwise
reproducible, but threefry costs real step time on TPU: the flagship recipe
draws 69 × [16,32,32,64] normals per step, measured 6.3 ms of a 40 ms PSNR
step (v5e, 2026-08-16). ``impl="rbg"`` routes the same per-step key through
XLA's hardware RngBitGenerator — deterministic per (key, shape) on a fixed
compiler/backend, but not guaranteed stable across XLA versions. Opt in via
``train.noise_prng: "rbg"`` when throughput matters more than bit-replay.
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
