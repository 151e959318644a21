"""Scaling trend for the round-10 additions (q102 span corruption, q104
epoch repeat, q105 bin manifest, q106 FFD packing): sf0.1 vs the
.bench_scale replicated fixtures (2x / 5x rows, written as 8 files each
vs the single-row-group 1x fixture — see gen_scale_bench.py and the
PERF.md capstone-scaling section for why the 1x point is a single-task
floor, not a plan cost).

Time-major (round-robin) order so session drift hits every (query,
scale) point equally.

Usage: python scripts/scale_objectives.py [--reps 3] [qname ...]

Positional query names override the default round-10 list (used in
round 11 for the q107/q108 recipe-v2 scaling line — both read only the
``documents`` table the .bench_scale fixtures replicate).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("2x", os.path.join(REPO, ".bench_scale/sf0.2")),
    ("5x", os.path.join(REPO, ".bench_scale/sf0.5")),
]
QUERY_NAMES = [
    "q102_span_corruption",
    "q104_epoch_repeat_mix",
    "q105_bin_manifest",
    "q106_ffd_packing",
]


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv or QUERY_NAMES
    import __spark_entry__ as entry_mod
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import (
        get_spark,
    )

    queries = entry_mod.queries()
    spark = get_spark()
    for name in names:  # warm JIT on the 1x point
        queries[name](spark, SCALES[0][1]).count()
    times: dict[tuple[str, str], list[float]] = {
        (n, label): [] for n in names for label, _ in SCALES
    }
    rows: dict[tuple[str, str], int] = {}
    for _ in range(reps):
        for label, sf_dir in SCALES:
            for name in names:
                t0 = time.monotonic()
                rows[(name, label)] = queries[name](spark, sf_dir).count()
                times[(name, label)].append(time.monotonic() - t0)
    for name in names:
        print(
            json.dumps(
                {
                    "query": name,
                    "medians": {
                        label: round(
                            statistics.median(times[(name, label)]), 3
                        )
                        for label, _ in SCALES
                    },
                    "out_rows": {
                        label: rows[(name, label)] for label, _ in SCALES
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
