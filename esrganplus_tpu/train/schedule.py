"""Learning-rate schedules.

The reference uses torch ``MultiStepLR`` (``codes/models/SR_model.py:50-55``):
lr multiplied by ``gamma`` at each milestone step. Expressed here as an optax
schedule over the optimizer step count.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.5):
    """lr(step) = base_lr * gamma^(number of milestones passed)."""
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        n = jnp.sum(step >= ms)
        return base_lr * (gamma ** n.astype(jnp.float32))

    return schedule
