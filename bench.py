"""Benchmark: ×4 SR throughput of the flagship ESRGAN+ generator on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: RRDBNet nb=23 nf=64 gc=32 (16.8M params, the ESRGAN+ flagship), bf16
compute / fp32 accumulation, batched 128×128 LR inputs → 512×512 outputs, steady
state after warmup. Metric is output megapixels per second per chip.

Baseline: the reference repo publishes no numbers (BASELINE.md), so the A100
PyTorch figure is estimated analytically and pinned here: the generator costs
~2.4 TFLOP per output MPix (2 × 16.4M weight-FLOPs at LR resolution + upsample
tail); A100 PyTorch fp32/TF32 at a generous ~40% MXU efficiency sustains
~15 TFLOPS on these narrow (64/32-channel) convs → ~6 MPix/s. vs_baseline is
measured/6.0; the north-star target is ≥5× (≥30 MPix/s, BASELINE.json).
"""

from __future__ import annotations

import json
import time

A100_PYTORCH_BASELINE_MPIX_S = 6.0


def main():
    import jax
    import jax.numpy as jnp

    from esrganplus_tpu.models import RRDBNetConfig, init_rrdbnet, rrdbnet_forward

    cfg = RRDBNetConfig()
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)

    batch, lr_size, iters = 16, 128, 10
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, lr_size, lr_size, 3), jnp.float32)

    import functools

    import numpy as np

    fwd = jax.jit(functools.partial(rrdbnet_forward, cfg=cfg, train=False, dtype=jnp.bfloat16))

    # Timing note: each iteration consumes the previous output (cropped back to
    # LR size) so the chain cannot be reordered/overlapped, and a single host
    # transfer at the end forces completion. block_until_ready alone is not a
    # reliable fence on remotely-attached TPU runtimes.
    def chain(x0):
        acc = x0
        for _ in range(iters):
            acc = fwd(params, acc)[:, :lr_size, :lr_size, :] * 0.5
        return acc

    _ = np.asarray(chain(x)[0, 0, 0])  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(x)[0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]  # median of 3 for tunnel-latency stability

    out_mpix = batch * (lr_size * cfg.upscale) ** 2 / 1e6
    mpix_s = out_mpix * iters / dt
    print(json.dumps({
        "metric": "x4_sr_throughput_rrdb23_bf16",
        "value": round(mpix_s, 3),
        "unit": "MPix/s/chip (output)",
        "vs_baseline": round(mpix_s / A100_PYTORCH_BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
