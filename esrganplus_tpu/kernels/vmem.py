"""Single source of truth for the TPU VMEM budget.

Derivation (measured on v5e, rounds 2-4):

- The physical VMEM per v5e core is 128 MiB. Mosaic's default *scoped*
  budget is only 16 MiB, so every kernel raises it explicitly via
  ``CompilerParams(vmem_limit_bytes=...)``.
- ``VMEM_LIMIT_BYTES`` (112 MiB) is what the kernels request: the physical
  128 MiB minus 16 MiB of headroom for Mosaic's own semaphores, pipeline
  double-buffering of the small operand blocks, and compiler slop. 120 MiB
  also compiled in round-3 probes, but 112 left margin across shapes.
- ``VMEM_GATE_BYTES`` (96 MiB) is what *model-side* gates compare working
  sets against before choosing the Pallas path: the 112 MiB request minus
  another 16 MiB because the gate's estimate counts only the dominant IM3 /
  dIM3 / partial-sum arrays, not the weight blocks, tap scratch, and
  grid-step double buffers the kernel also holds.

A new TPU generation (or a kernel-side scratch change) should move these
here, once. Gates live in ``models/rrdb.py``; requests in
``kernels/{rdb_ct,rdb_t,tail_ct}.py``.
"""

VMEM_LIMIT_BYTES = 112 * 1024 * 1024
VMEM_GATE_BYTES = 96 * 1024 * 1024
