from esrganplus_tpu.models.rrdb import RRDBNetConfig, init_rrdbnet, rrdbnet_forward, count_params
from esrganplus_tpu.models.srresnet import SRResNetConfig, init_srresnet, srresnet_forward

__all__ = [
    "RRDBNetConfig",
    "init_rrdbnet",
    "rrdbnet_forward",
    "SRResNetConfig",
    "init_srresnet",
    "srresnet_forward",
    "count_params",
    "generator_forward",
    "generator_init",
]


def generator_forward(params, x, cfg, *, train=False, rng=None, dtype=None):
    """Dispatch on the generator config type (RRDBNet / SRResNet)."""
    if isinstance(cfg, RRDBNetConfig):
        return rrdbnet_forward(params, x, cfg, train=train, rng=rng, dtype=dtype)
    if isinstance(cfg, SRResNetConfig):
        return srresnet_forward(params, x, cfg, dtype=dtype)
    raise NotImplementedError(f"unknown generator config {type(cfg)}")


def generator_init(key, cfg, init_scale: float = 0.1, dtype=None):
    import jax.numpy as jnp

    dt = dtype or jnp.float32
    if isinstance(cfg, RRDBNetConfig):
        return init_rrdbnet(key, cfg, init_scale=init_scale, dtype=dt)
    if isinstance(cfg, SRResNetConfig):
        return init_srresnet(key, cfg, init_scale=init_scale, dtype=dt)
    raise NotImplementedError(f"unknown generator config {type(cfg)}")
