"""Device-trace analysis: exclusive-time aggregation of XLA op events.

Consumes the ``*.trace.json.gz`` written by ``jax.profiler.trace`` (the
``--profile`` flag of ``bench.py`` / ``cli/train.py``) and aggregates the
"XLA Ops" rows into a per-op-family budget table — the tool behind the step
budgets in NOTES_ROUND3.md. "Exclusive" means nested events (e.g. kernels
inside a ``while`` loop row) are charged to themselves, not their parent,
so the table sums to the device-busy total.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Tuple


def find_trace_file(trace_dir: str) -> str:
    """Newest ``*.trace.json.gz`` under ``trace_dir`` (recursive)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return paths[-1]


def load_trace_events(path: str) -> List[dict]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)["traceEvents"]


def _xla_ops_tids(events) -> set:
    tids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and "XLA Ops" in e["args"].get("name", "")):
            tids.add((e["pid"], e["tid"]))
    return tids


def op_family(name: str) -> str:
    """Collapse ``fusion.1234`` / ``rdb_ct(...)`` → ``fusion`` / ``rdb_ct``.

    Only trailing ``.NNN`` instance suffixes (and trailing separator
    clutter) are stripped — digits INSIDE a name (``conv2d_fusion``) are
    meaningful and must survive."""
    fam = name.split("(")[0]
    head, dot, tail = fam.rpartition(".")
    if dot and tail.isdigit():
        fam = head
    return fam.rstrip("._-")


def aggregate_exclusive(events, steps: int = 1,
                        family=op_family) -> Tuple[float, Dict[str, Tuple[float, int]]]:
    """→ (device_total_ms_per_step, {family: (excl_ms_per_step, count_per_step)}).

    Events on each XLA-Ops thread are treated as a properly nested interval
    forest (sorted by start, ties broken longest-first); a child's full span
    is subtracted from its innermost enclosing ancestor's exclusive time.
    """
    tids = _xla_ops_tids(events)
    per_tid: Dict[tuple, list] = {}
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in tids:
            per_tid.setdefault((e["pid"], e["tid"]), []).append(e)

    agg: Dict[str, Tuple[float, int]] = {}
    total = 0.0
    for evs in per_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack: List[Tuple[float, str]] = []  # (end_ts, family)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            fam = family(e["name"])
            excl = dur / 1e3  # ms
            if stack:
                pfam = stack[-1][1]
                d, c = agg[pfam]
                agg[pfam] = (d - excl, c)
            else:
                total += excl
            d, c = agg.get(fam, (0.0, 0))
            agg[fam] = (d + excl, c + 1)
            stack.append((ts + dur, fam))
    return (total / steps,
            {k: (d / steps, c // steps) for k, (d, c) in agg.items()})


def format_table(total_ms: float, agg: Dict[str, Tuple[float, int]],
                 top: int = 25, min_ms: float = 0.0) -> str:
    lines = [f"device total: {total_ms:.3f} ms/step"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    for fam, (dur, cnt) in rows:
        if dur < min_ms:
            break
        lines.append(f"{dur:9.3f} ms  x{cnt:<5d} {fam}")
    return "\n".join(lines)
