"""Benchmark: ×4 SR throughput of the flagship ESRGAN+ generator on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: RRDBNet nb=23 nf=64 gc=32 (16.8M params, the ESRGAN+ flagship), bf16
compute / fp32 MXU accumulation, batched 128×128 LR inputs → 512×512 outputs,
steady state after warmup. Metric is output megapixels per second per chip.
Batch 128 (round-5 sweep: 16 → 53.4, 32 → 56.2, 64 → 58.4, 128 → 59.1,
256 → 59.3 MPix/s — the knee is at 128; the old batch-64 compile cliff died
with the XLA tail — the stripe-grid tail kernels are VMEM/compile-flat in
batch). The trunk runs the column-merged
transposed-layout Pallas RDB kernel (esrganplus_tpu/kernels/rdb_ct.py, two
images software-pipelined per grid step, scan-carry aliased); the upsample
tail runs the column-phase-plane kernels (kernels/tail_ct.py) end to end in
the trunk's [C, pixels] layout.

Reliability: the TPU here is attached through a remote tunnel that can flap;
a dead tunnel makes backend init hang forever and poisons the process-global
JAX backend, so in-process retry is useless. The benchmark body therefore
runs in a supervised WORKER subprocess: the worker keeps a 180 s backend-init
watchdog (fast exit 3 instead of a wedge), and the supervisor retries the
whole worker up to 3 times with backoff before giving up. Round 3 lost its
driver bench artifact to exactly one un-retried tunnel flap.

Baseline (A100 PyTorch, pinned 6.0 MPix/s) — measured anchor + derivation:

  * The generator costs ~2.42 TFLOP per output MPix (241,664 MAC/LR-pixel in
    the 69 dense blocks + upsample tail, ×2 FLOP/MAC, ÷16 LR→HR pixel ratio).
  * Measured on this host (2026-08-16): the reference's own inference net
    (``/root/reference/test_image/architecture.py:7-38`` RRDB_Net, torch CPU,
    1 thread — all this box exposes) runs 0.0476 MPix/s @96² ⇒ 0.115
    effective TFLOP/s ≈ 60-75% of the core's fp32 AVX peak. This validates
    the FLOP model; the remaining step is hardware scaling, not software.
  * The reference's shipped inference path (``test_image/test.py:26-40``)
    processes images one at a time (batch 1). For batch-1 torch eager on
    A100: the forward issues ~414 conv + several hundred elementwise kernels;
    with TF32 convs at the 5-15% sustained efficiency typical of 32-64-channel
    3×3 convs (launch- and memory-bound at batch 1), 156 TFLOP/s peak gives
    ~3.2-9.7 MPix/s; public V100 fp32 reports for RRDB ×4 (~1-2 MPix/s) scaled
    by the usual 2.5-3.5× V100→A100-TF32 factor give the same 3-7 band.
  * Pinned at 6.0 MPix/s, the middle of both bands (unchanged from round 1's
    analytic estimate, which the measurement chain now corroborates).

vs_baseline is measured/6.0; the north-star target is ≥5× (≥30 MPix/s,
BASELINE.json).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

A100_PYTORCH_BASELINE_MPIX_S = 6.0

# When set, this process IS the worker: run the benchmark body directly.
WORKER_ENV = "ESRGANPLUS_BENCH_WORKER"


def _parse_args(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of one timed chain "
                         "into DIR (view: tensorboard --logdir DIR)")
    ap.add_argument("--batch", type=int, default=128,
                    help="LR batch size (sweep with e.g. "
                         "'for b in 32 64 128; do python bench.py --batch $b; done')")
    ap.add_argument("--attempts", type=int, default=3,
                    help="supervisor: total worker attempts before exit 3")
    ap.add_argument("--attempt-timeout", type=float, default=1500.0,
                    help="supervisor: seconds per attempt before the worker "
                         "is killed (generous: covers a cold-cache compile)")
    return ap.parse_args(argv)


# Per-phase time budgets (seconds). The worker announces phase transitions
# on stdout ("# bench-phase: <name>"); the supervisor resets its kill
# deadline at each transition, so a slow-but-alive compile is distinguished
# from a dead tunnel: init hangs get killed in 240 s instead of eating the
# whole attempt budget, while a cold-cache compile legitimately gets 900 s.
# Phases without an entry fall back to the --attempt-timeout cap.
PHASE_BUDGETS = {"init": 240.0, "compile": 900.0, "measure": 300.0}
PHASE_MARKER = "# bench-phase: "


def _run_phase_aware(worker_cmd, env, attempt_timeout, phase_budgets):
    """Popen the worker, watching stdout for phase markers; kill when the
    CURRENT phase exceeds its budget. Returns (rc, stdout_text, diagnosis)."""
    import threading

    # bufsize=1 (line-buffered text mode): the default block buffering makes
    # readline() hold a flushed marker line until the NEXT write fills the
    # buffer, defeating prompt phase delivery (measured)
    proc = subprocess.Popen(worker_cmd, env=env, stdout=subprocess.PIPE,
                            text=True, bufsize=1)
    lines = []
    state = {"phase": "init", "since": time.monotonic()}
    lock = threading.Lock()

    def reader():
        # NOT `for line in proc.stdout`: file iteration read-ahead holds
        # lines until the buffer fills, which defeats prompt marker delivery
        while True:
            line = proc.stdout.readline()
            if not line:
                break
            line = line.rstrip("\n")
            if line.startswith(PHASE_MARKER):
                with lock:
                    state["phase"] = line[len(PHASE_MARKER):].strip()
                    state["since"] = time.monotonic()
                print(f"[worker] {line}", file=sys.stderr, flush=True)
            else:
                with lock:
                    lines.append(line)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    diagnosis = None
    while True:
        try:
            rc = proc.wait(timeout=1.0)
            break
        except subprocess.TimeoutExpired:
            with lock:
                phase, since = state["phase"], state["since"]
            # attempt_timeout stays the hard cap for any single phase
            budget = min(phase_budgets.get(phase, attempt_timeout),
                         attempt_timeout)
            if time.monotonic() - since > budget:
                proc.kill()
                proc.wait()
                rc = -1
                diagnosis = (f"killed in phase '{phase}' after "
                             f"{budget:.0f} s (phase budget exceeded)")
                break
    t.join(timeout=5.0)
    with lock:
        return rc, "\n".join(lines), diagnosis


def supervise(argv, *, worker_cmd=None, attempts=3, attempt_timeout=1500.0,
              backoffs=(30.0, 120.0), sleep=time.sleep,
              phase_budgets=PHASE_BUDGETS):
    """Run the benchmark worker in a subprocess with bounded retry.

    A dead remote-TPU tunnel poisons JAX's process-global backend (init hangs,
    and a failed init cannot be retried in-process), so each attempt is a
    fresh process. Retries on any nonzero exit (incl. the worker's exit-3
    init watchdog) or on a phase-budget kill. The kill deadline is per PHASE
    (init/compile/measure, announced by the worker), not per attempt — a
    cold-cache compile no longer looks like a dead tunnel, and a dead tunnel
    is diagnosed (and retried) in 240 s instead of 1500. Returns the final
    exit code (0 on success) and prints the worker's JSON line to stdout on
    success.

    ``worker_cmd``/``backoffs``/``sleep`` are injectable for unit tests.
    """
    if worker_cmd is None:
        worker_cmd = [sys.executable, os.path.abspath(__file__)] + list(argv)
    env = dict(os.environ, **{WORKER_ENV: "1"})
    for attempt in range(1, attempts + 1):
        print(f"bench.py supervisor: attempt {attempt}/{attempts}: "
              f"{' '.join(worker_cmd)}", file=sys.stderr, flush=True)
        rc, out, diagnosis = _run_phase_aware(worker_cmd, env, attempt_timeout,
                                              phase_budgets)
        if diagnosis:
            print(f"bench.py supervisor: attempt {attempt} {diagnosis}",
                  file=sys.stderr, flush=True)
        result_line = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    continue
                if "metric" in parsed and "value" in parsed:
                    result_line = line
            elif line:
                print(f"[worker] {line}", file=sys.stderr, flush=True)
        if rc == 0 and result_line is not None:
            print(result_line, flush=True)
            return 0
        print(f"bench.py supervisor: attempt {attempt} failed "
              f"(rc={rc}, json={'yes' if result_line else 'no'})",
              file=sys.stderr, flush=True)
        if attempt < attempts:
            wait = backoffs[min(attempt - 1, len(backoffs) - 1)]
            print(f"bench.py supervisor: backing off {wait:.0f} s before retry",
                  file=sys.stderr, flush=True)
            sleep(wait)
    print(f"bench.py supervisor: all {attempts} attempts failed — giving up",
          file=sys.stderr, flush=True)
    return 3


def run_bench(args):
    """The benchmark body (runs in the worker process)."""
    import jax

    from esrganplus_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    # backend-init watchdog: on a remote-attached runtime a dead tunnel makes
    # jax.devices() hang forever — fail fast so the supervisor can retry with
    # a fresh process. 180 s >> the healthy first-init.
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(180):
            print("bench.py: device backend failed to initialise within "
                  "180 s (remote runtime unreachable?) — aborting attempt",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    devs = jax.devices()
    init_done.set()
    print(f"# devices: {devs}", file=sys.stderr)
    # phase markers feed the supervisor's per-phase kill deadline (stdout;
    # filtered out of the one-line JSON contract by the supervisor)
    print(f"{PHASE_MARKER}compile", flush=True)

    import jax.numpy as jnp

    from esrganplus_tpu.models import RRDBNetConfig, init_rrdbnet, rrdbnet_forward

    cfg = RRDBNetConfig()
    params = init_rrdbnet(jax.random.PRNGKey(0), cfg)
    from esrganplus_tpu.models.rrdb import prep_trunk_ct, prep_trunk_static

    if prep_trunk_static(cfg, jnp.bfloat16):
        # kernel-layout trunk masters: the in-jit canonical->kernel weight
        # relayout (~0.7 ms/fwd) happens once here instead of every forward
        params = prep_trunk_ct(params, cfg)

    batch, lr_size, iters = args.batch, 128, 6
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, lr_size, lr_size, 3), jnp.float32)

    import functools

    import numpy as np

    fwd = jax.jit(functools.partial(rrdbnet_forward, cfg=cfg, train=False, dtype=jnp.bfloat16))

    # Timing note: each iteration consumes the previous output (cropped back to
    # LR size) so the chain cannot be reordered/overlapped, and a single host
    # transfer at the end forces completion. block_until_ready alone is not a
    # reliable fence on remotely-attached TPU runtimes, and transferring more
    # than a scalar pays the tunnel's full-array cost (~100 ms).
    def chain(x0):
        acc = x0
        for _ in range(iters):
            acc = fwd(params, acc)[:, :lr_size, :lr_size, :] * 0.5
        return acc

    _ = np.asarray(chain(x)[0, 0, 0])  # compile + warmup
    print(f"{PHASE_MARKER}measure", flush=True)
    if args.profile:
        with jax.profiler.trace(args.profile):
            _ = np.asarray(chain(x)[0, 0, 0])
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


def main(argv=None):
    args = _parse_args(argv)
    if os.environ.get(WORKER_ENV):
        run_bench(args)
        return 0
    return supervise(sys.argv[1:] if argv is None else list(argv),
                     attempts=args.attempts, attempt_timeout=args.attempt_timeout)


if __name__ == "__main__":
    sys.exit(main())
