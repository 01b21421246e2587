"""Test configuration: force an 8-device virtual CPU mesh before any test runs.

Multi-chip sharding is validated on host CPU devices (no multi-chip TPU hardware in
CI); bench.py and the CLIs run outside pytest and use the real TPU. Note the env
var JAX_PLATFORMS alone is not enough here — the environment pre-registers a TPU
platform at interpreter startup, so we also force the platform through jax.config.
"""

import os

if not os.environ.get("JAX_REAL_TPU"):
    # JAX_REAL_TPU=1 opts out (tests/test_tpu_kernels.py — real-chip-only
    # validations of the pltpu.prng noise path, which has no CPU lowering).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not os.environ.get("JAX_REAL_TPU"):
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip recompilation. The dir
# is keyed by a host-CPU fingerprint (utils.misc.host_fingerprint) — this
# sandbox migrates between VMs with different CPU features, and XLA:CPU's
# cached AOT executables SIGILL when loaded on a host missing the features
# they were compiled for.
from esrganplus_tpu.utils.misc import enable_compile_cache  # noqa: E402

enable_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
