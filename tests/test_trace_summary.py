"""Exclusive-time trace aggregation (utils/trace.py + profile_summary CLI)."""

import gzip
import json
import os

from esrganplus_tpu.utils.trace import aggregate_exclusive, op_family


def _meta(pid, tid, name):
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": name}}


def _ev(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def test_exclusive_nesting_and_families():
    # while [0, 100) wraps kernel [10, 40) and fusion.7 [50, 70);
    # a sibling fusion.8 [110, 130) is top-level. All on the XLA Ops row;
    # an identical event on another thread must be ignored.
    events = [
        _meta(1, 2, "XLA Ops"),
        _meta(1, 3, "Steps"),
        _ev(1, 2, "while", 0, 100),
        _ev(1, 2, "my_kernel(fused)", 10, 30),
        _ev(1, 2, "fusion.7", 50, 20),
        _ev(1, 2, "fusion.8", 110, 20),
        _ev(1, 3, "fusion.9", 0, 1000),  # not XLA Ops: ignored
    ]
    # durations are microseconds in the trace; aggregation reports ms
    total, agg = aggregate_exclusive(events)
    assert abs(total - 0.120) < 1e-9          # 100 + 20 top-level us
    assert abs(agg["while"][0] - 0.050) < 1e-9  # 100 - 30 - 20 exclusive
    assert agg["my_kernel"] == (0.030, 1)
    assert abs(agg["fusion"][0] - 0.040) < 1e-9
    assert agg["fusion"][1] == 2
    assert "fusion.9" not in agg and "fusion" in agg


def test_per_step_division():
    events = [_meta(0, 0, "XLA Ops")] + [
        _ev(0, 0, "fusion.1", 1000 * i, 500) for i in range(4)]
    total, agg = aggregate_exclusive(events, steps=4)
    assert abs(total - 0.5) < 1e-9
    assert agg["fusion"] == (0.5, 1)


def test_op_family():
    assert op_family("fusion.1234") == "fusion"
    assert op_family("jit_rdb_ct(arg0)") == "jit_rdb_ct"
    assert op_family("bitcast_dynamic-update-slice_fusion.3") == \
        "bitcast_dynamic-update-slice_fusion"
    # digits inside a name are meaningful and must survive
    assert op_family("conv2d_fusion.3") == "conv2d_fusion"
    assert op_family("stage1_matmul") == "stage1_matmul"


def test_profile_summary_cli(tmp_path, capsys):
    events = [_meta(1, 2, "XLA Ops"), _ev(1, 2, "fusion.1", 0, 750)]
    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    from esrganplus_tpu.cli.profile_summary import main

    main([str(tmp_path), "--steps", "1"])
    out = capsys.readouterr().out
    assert "device total: 0.750 ms/step" in out
    assert "fusion" in out


def test_enable_compile_cache_fingerprint(monkeypatch, tmp_path):
    import jax

    from esrganplus_tpu.utils.misc import enable_compile_cache, host_fingerprint

    prev = jax.config.jax_compilation_cache_dir
    try:
        # default: .jax_cache/<fingerprint> next to the package
        monkeypatch.delenv("ESRGANPLUS_JAX_CACHE", raising=False)
        got = enable_compile_cache()
        fp = host_fingerprint()
        assert got.endswith(os.path.join(".jax_cache", fp))
        assert fp and "/" not in fp
        # env override used verbatim
        monkeypatch.setenv("ESRGANPLUS_JAX_CACHE", str(tmp_path))
        assert enable_compile_cache() == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
