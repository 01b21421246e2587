"""Summarise a jax.profiler trace into a per-op device-time budget table.

Workflow (SURVEY §5.1 profiling):

    python -m esrganplus_tpu.cli.train -opt <opt.json> --profile /tmp/tr --profile-steps 10
    python -m esrganplus_tpu.cli.profile_summary /tmp/tr --steps 10

prints the exclusive-time aggregation of the trace's "XLA Ops" row (the
same analysis behind NOTES_ROUND3.md's step budgets); full visual timelines
remain available via ``tensorboard --logdir <dir>``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from esrganplus_tpu.utils.trace import (
        aggregate_exclusive,
        find_trace_file,
        format_table,
        load_trace_events,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", help="directory passed to --profile")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of steps captured in the trace; per-step "
                         "numbers are totals divided by this")
    ap.add_argument("--top", type=int, default=25, help="rows to print")
    ap.add_argument("--min-ms", type=float, default=0.0,
                    help="stop printing below this per-step time")
    args = ap.parse_args(argv)

    path = find_trace_file(args.trace_dir)
    total, agg = aggregate_exclusive(load_trace_events(path), steps=args.steps)
    print(f"trace: {path}")
    print(format_table(total, agg, top=args.top, min_ms=args.min_ms))


if __name__ == "__main__":
    main()
