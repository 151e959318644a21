"""Cut-by-cut A/B of q87's lazy-checkpoint chain (round-7 verdict item 3).

q87 composes nine stages with (up to) eight ``localCheckpoint(eager=False)``
boundaries; each materialization is a synchronization point plus a
scheduling floor, so a cut is only worth keeping if re-executing its
frame's lineage for every consumer would cost MORE than the
materialization. This script measures that per cut at sf0.1:

* ``explore`` mode (default): one warm session, every config (all-cuts
  baseline, leave-one-out per cut, no-cuts) timed ``--reps`` times,
  report min+median — ranks the cut candidates cheaply.
* ``confirm`` mode: each named config runs in its OWN subprocess session
  (the round-7 median-of-N/fresh-sessions protocol) so the winner's
  number is judge-comparable.

Usage:
    python scripts/ab_q87_cuts.py explore [--reps 3]
    python scripts/ab_q87_cuts.py confirm all s1,s2,lm,s4,s5,cutdocs,chosen [--reps 5]
    python scripts/ab_q87_cuts.py one <comma-cuts|all|none>   (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALL_CUTS = ("s1", "s2", "lm", "s3", "s4", "s5", "cutdocs", "chosen")


def _parse(spec: str) -> frozenset[str]:
    """'all', 'none', a comma list of cuts to KEEP, or '-a,b' = all
    cuts EXCEPT the listed ones (leave-out form)."""
    if spec == "all":
        return frozenset(ALL_CUTS)
    if spec == "none":
        return frozenset()
    if spec.startswith("-"):
        drop = set(spec[1:].split(","))
        return frozenset(x for x in ALL_CUTS if x not in drop)
    return frozenset(x for x in spec.split(",") if x)


def _run_once(spark, cuts: frozenset[str]) -> float:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.northstar_queries import (
        q87_pretrain_capstone,
    )

    t0 = time.monotonic()
    n = q87_pretrain_capstone(spark, SF_DIR, cuts=cuts).count()
    dt = time.monotonic() - t0
    assert n > 0, "q87 returned no rows"
    return dt


def explore(reps: int, specs: list[str] | None = None) -> None:
    """Round-robin (time-major) measurement: every config is timed once
    per sweep, so session-level drift (JIT warm-up, GC state — the first
    sequential run of this script showed a monotone ~30% downward trend
    that confounded config with order) hits all configs equally."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

    spark = get_spark()
    if specs:
        configs = [(s, _parse(s)) for s in specs]
    else:
        configs = [
            ("all", frozenset(ALL_CUTS)),
            *[
                (f"-{c}", frozenset(x for x in ALL_CUTS if x != c))
                for c in ALL_CUTS
            ],
            ("none", frozenset()),
        ]
    _run_once(spark, frozenset(ALL_CUTS))  # warm the session once
    times: dict[str, list[float]] = {label: [] for label, _ in configs}
    for _ in range(reps):
        for label, cuts in configs:
            times[label].append(_run_once(spark, cuts))
    for label, ts in times.items():
        print(
            json.dumps(
                {
                    "config": label,
                    "min": round(min(ts), 3),
                    "median": round(statistics.median(ts), 3),
                    "times": [round(t, 3) for t in ts],
                }
            ),
            flush=True,
        )
    spark.stop()


def confirm(specs: list[str], reps: int) -> None:
    for spec in specs:
        times = []
        for _ in range(reps):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "one", spec],
                capture_output=True,
                text=True,
                check=True,
            )
            times.append(float(out.stdout.strip().splitlines()[-1]))
        print(
            json.dumps(
                {
                    "config": spec,
                    "median": round(statistics.median(times), 3),
                    "times": [round(t, 3) for t in times],
                }
            ),
            flush=True,
        )


def one(spec: str) -> None:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

    spark = get_spark()
    dt = _run_once(spark, _parse(spec))
    print(dt)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "explore"
    if mode == "explore":
        reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3
        specs = [
            a
            for i, a in enumerate(sys.argv[2:], start=2)
            if not a.startswith("--") and sys.argv[i - 1] != "--reps"
        ]
        explore(reps, specs or None)
    elif mode == "confirm":
        args = [a for a in sys.argv[2:] if not a.startswith("--")]
        reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
        confirm(args, reps)
    elif mode == "one":
        one(sys.argv[2])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
