"""Converter fuzz: random generator configs must round-trip exactly through the
reference .pth layout and preserve the forward function."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.convert.pth import (
    generator_from_state_dict,
    generator_to_state_dict,
)
from esrganplus_tpu.models import (
    RRDBNetConfig,
    SRResNetConfig,
    generator_forward,
    generator_init,
)

CASES = [
    RRDBNetConfig(nf=16, nb=1, gc=8, upscale=2),
    RRDBNetConfig(nf=24, nb=3, gc=8, upscale=4),
    RRDBNetConfig(nf=16, nb=2, gc=16, upscale=8),   # three upconv stages
    RRDBNetConfig(nf=16, nb=2, gc=8, upscale=4, conv1x1=False),  # vanilla graph
    SRResNetConfig(nf=16, nb=2, upscale=2),
    SRResNetConfig(nf=8, nb=4, upscale=4),
]


@pytest.mark.parametrize("cfg", CASES, ids=lambda c: f"{type(c).__name__}-nb{c.nb}-x{c.upscale}")
def test_roundtrip_preserves_forward(cfg):
    params = generator_init(jax.random.PRNGKey(0), cfg, init_scale=1.0)
    sd = generator_to_state_dict(params, cfg)
    params2, cfg2, _ = generator_from_state_dict(sd)
    assert type(cfg2) is type(cfg)
    assert (cfg2.nb, cfg2.nf, cfg2.upscale) == (cfg.nb, cfg.nf, cfg.upscale)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 6, 3))
    y1 = generator_forward(params, x, cfg)
    y2 = generator_forward(params2, x, cfg2)
    assert y1.shape == (1, 8 * cfg.upscale, 6 * cfg.upscale, 3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
