"""Wrapper for the two-process CLI-train test: force the CPU platform and
per-process device/collective config BEFORE the CLI touches the backend
(this sandbox pre-registers a TPU platform at interpreter startup, so the
JAX_PLATFORMS env var alone is not honoured — see tests/conftest.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from esrganplus_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
