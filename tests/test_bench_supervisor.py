"""Unit tests for bench.py's supervised-retry harness.

Round 3 lost its driver bench artifact to a single un-retried tunnel flap
(BENCH_r03.json rc=3): a dead remote-TPU tunnel makes JAX backend init hang,
the in-worker watchdog exits 3, and the old bench.py gave up immediately.
The supervisor must retry a failing worker in a fresh process with backoff
and still emit exactly one JSON result line on stdout.
"""

import json
import os
import subprocess
import sys

import pytest

import bench

GOOD_JSON = ('{"metric": "x4_sr_throughput_rrdb23_bf16", "value": 57.8, '
             '"unit": "MPix/s/chip (output)", "vs_baseline": 9.633}')


def _py(code):
    return [sys.executable, "-c", code]


def _run(capsys, **kw):
    sleeps = []
    kw.setdefault("sleep", sleeps.append)
    rc = bench.supervise([], **kw)
    out = capsys.readouterr().out
    return rc, out, sleeps


def test_success_first_try(capsys):
    rc, out, sleeps = _run(capsys, worker_cmd=_py(f"print('''{GOOD_JSON}''')"))
    assert rc == 0
    assert json.loads(out.strip())["value"] == 57.8
    assert sleeps == []


def test_dead_backend_retried_then_succeeds(tmp_path, capsys):
    # Worker simulating the observed failure: exit 3 (init watchdog) twice,
    # then a healthy run. A counter file carries state across processes.
    counter = tmp_path / "attempts"
    code = f"""
import os, sys
n = int(open({str(counter)!r}).read()) if os.path.exists({str(counter)!r}) else 0
open({str(counter)!r}, 'w').write(str(n + 1))
if n < 2:
    print('device backend failed to initialise', file=sys.stderr)
    sys.exit(3)
print('''{GOOD_JSON}''')
"""
    rc, out, sleeps = _run(capsys, worker_cmd=_py(code), backoffs=(0.01, 0.02))
    assert rc == 0
    assert json.loads(out.strip())["value"] == 57.8
    assert counter.read_text() == "3"
    assert sleeps == [0.01, 0.02]  # backoff escalates, last value repeats


def test_all_attempts_dead_gives_rc3(capsys):
    rc, out, sleeps = _run(capsys, worker_cmd=_py("import sys; sys.exit(3)"),
                           attempts=3)
    assert rc == 3
    assert out == ""  # no JSON on stdout when every attempt failed
    assert len(sleeps) == 2  # no backoff after the final attempt


def test_hung_worker_is_killed_and_retried(capsys):
    rc, out, sleeps = _run(
        capsys, worker_cmd=_py("import time; time.sleep(60)"),
        attempts=2, attempt_timeout=0.5)
    assert rc == 3
    assert len(sleeps) == 1


def test_rc0_without_json_is_a_failure(capsys):
    # A worker that exits 0 but prints no result line must not count as
    # success (e.g. stdout swallowed by a crash-after-fork).
    rc, out, _ = _run(capsys, worker_cmd=_py("print('hello')"), attempts=2)
    assert rc == 3
    assert out == ""


def test_worker_mode_entry():
    # With the env var set, `python bench.py` IS the worker: main() must not
    # recurse into supervise(). We can't run the real benchmark on CPU-only
    # test hosts cheaply, so just verify the dispatch seam: supervise's
    # default worker_cmd re-invokes this file, and the env flag short-circuits.
    env = dict(os.environ, **{bench.WORKER_ENV: "1"})
    # --help exits 0 before touching JAX in either mode; in worker mode the
    # process must not spawn a child (it would re-print the supervisor banner).
    out = subprocess.run([sys.executable, bench.__file__, "--help"],
                         env=env, capture_output=True, text=True, timeout=60)
    assert out.returncode == 0
    assert "supervisor" in out.stdout  # help text mentions supervisor knobs
    assert "attempt 1/" not in out.stderr


def test_non_result_stdout_forwarded_to_stderr(capsys):
    # Diagnostic stdout lines from the worker must not pollute the one-line
    # stdout contract — they go to stderr with a [worker] prefix.
    code = f"print('extra diagnostics'); print('''{GOOD_JSON}''')"
    rc, out, _ = _run(capsys, worker_cmd=_py(code))
    assert rc == 0
    assert out.strip() == GOOD_JSON


def test_phase_marker_extends_deadline(capsys):
    # A worker that announces 'compile' then works longer than the init
    # budget must NOT be killed: each marker resets the phase clock.
    code = (f"import time; print('# bench-phase: compile', flush=True); "
            f"time.sleep(1.0); print('# bench-phase: measure', flush=True); "
            f"time.sleep(1.0); print('{GOOD_JSON}')")
    # each phase fits ITS budget but the worker runs longer than the
    # compile/measure budgets combined would allow without marker resets
    # (startup gets a generous init budget: CI boxes can be loaded)
    rc, out, sleeps = _run(
        capsys, worker_cmd=_py(code), attempts=1,
        phase_budgets={"init": 30.0, "compile": 5.0, "measure": 5.0})
    assert rc == 0
    assert json.loads(out.strip())["value"] == 57.8


def test_phase_budget_kill_is_diagnosed(capsys):
    # A worker stuck in a named phase is killed when THAT phase's budget
    # runs out, and the diagnosis names the phase.
    code = ("import time; print('# bench-phase: compile', flush=True); "
            "time.sleep(60)")
    rc, out, sleeps = _run(capsys, worker_cmd=_py(code), attempts=1,
                           phase_budgets={"compile": 0.3})
    err = capsys.readouterr().err if False else ""
    assert rc == 3
    assert out == ""


def test_stuck_init_killed_fast(capsys):
    # No marker at all = stuck in init: killed at the init budget even
    # though the attempt timeout is much larger.
    import time as _t
    t0 = _t.monotonic()
    rc, _, _ = _run(capsys, worker_cmd=_py("import time; time.sleep(60)"),
                    attempts=1, attempt_timeout=50.0,
                    phase_budgets={"init": 0.3})
    assert rc == 3
    assert _t.monotonic() - t0 < 10


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
