"""Misc runtime utilities: loggers, experiment-dir archival, seeding.

Mirrors the reference's ``codes/utils/util.py:16-63``: timestamped dual
file+console loggers, ``mkdir_and_rename`` archiving a stale experiment dir
instead of clobbering it, and global seeding (numpy/random/JAX keys are explicit
in this framework, so seeding covers the host-side generators).
"""

from __future__ import annotations

import logging
import os
import random
import sys
import time

import numpy as np


def timestamp() -> str:
    return time.strftime("%y%m%d-%H%M%S")


def host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU caches AOT-compiled executables whose machine features are NOT
    part of the persistent-cache key; loading an artifact compiled on a
    host with different features (e.g. AMX/AVX-512 present vs absent after
    a VM migration) warns and can SIGILL. Keying the cache directory by the
    feature set makes stale artifacts unreachable instead of fatal."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h = hashlib.md5(line.encode()).hexdigest()[:10]
                    return f"{platform.machine()}-{h}"
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable_compile_cache() -> str:
    """Point JAX's persistent compilation cache at a stable directory.

    TPU/Mosaic compiles of the flagship step take minutes (the fully
    unrolled training trunk alone is ~2.5 min); the persistent cache makes
    every rerun start in seconds. Resolution order: ``$ESRGANPLUS_JAX_CACHE``
    (used verbatim), else ``.jax_cache/<host-fingerprint>/`` next to the
    package (the repo checkout; see :func:`host_fingerprint` for why the
    default is keyed per host). Called by every CLI entry point,
    ``bench.py`` and the test suite."""
    import jax

    cache = os.environ.get("ESRGANPLUS_JAX_CACHE")
    if not cache:
        import esrganplus_tpu

        pkg = os.path.dirname(os.path.abspath(esrganplus_tpu.__file__))
        cache = os.path.join(os.path.dirname(pkg), ".jax_cache",
                             host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", cache)
    return cache


def mkdir_and_rename(path: str) -> None:
    if os.path.exists(path):
        new_name = path + "_archived_" + timestamp()
        print(f"Path already exists. Renaming it to {new_name}")
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(name: str, root: str, phase: str, level=logging.INFO,
                 screen: bool = False) -> logging.Logger:
    lg = logging.getLogger(name)
    for h in list(lg.handlers):  # fresh handlers per run (tests / repeated CLIs)
        lg.removeHandler(h)
        h.close()
    formatter = logging.Formatter("%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
                                  datefmt="%y-%m-%d %H:%M:%S")
    lg.setLevel(level)
    os.makedirs(root, exist_ok=True)
    fh = logging.FileHandler(os.path.join(root, f"{phase}_{timestamp()}.log"), mode="w")
    fh.setFormatter(formatter)
    lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(formatter)
        lg.addHandler(sh)
    return lg
