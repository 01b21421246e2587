"""Measured-dead-end kernel workbench — NOT on any production path.

``conv.py`` (per-conv implicit GEMM) and ``rdb.py`` (9-tap by-source RDB) are
earlier Pallas designs that measured slower than the production column-merged
kernels in ``esrganplus_tpu/kernels/rdb_ct.py`` (see NOTES_ROUND3.md "Measured
dead ends"). They are kept, with interpret-mode tests, as executable
documentation of why the production design looks the way it does.
"""
