"""Scaling trend for the q87 pretrain capstone (round-7 verdict item 4):
run the composed pipeline on sf0.1 and the .bench_scale replicated
fixtures (2x and 5x rows with super-linear duplicate DENSITY — the pair
space of its dedup core grows ~copies², see gen_scale_bench.py), and
report medians so a hidden super-linear stage shows as a curve bend.

Time-major (round-robin) order so session drift hits every scale point
equally.

Usage: python scripts/scale_q87.py [--reps 3]
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
    ("sf0.1 (1x)", "/root/testdata/sf0.1"),
    ("sf0.2 (2x)", os.path.join(REPO, ".bench_scale/sf0.2")),
    ("sf0.5 (5x)", os.path.join(REPO, ".bench_scale/sf0.5")),
]


def main() -> None:
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 3
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.northstar_queries import (
        q87_pretrain_capstone,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

    spark = get_spark()
    q87_pretrain_capstone(spark, SCALES[0][1]).count()  # warm
    times: dict[str, list[float]] = {label: [] for label, _ in SCALES}
    rows: dict[str, int] = {}
    for _ in range(reps):
        for label, sf_dir in SCALES:
            t0 = time.monotonic()
            rows[label] = q87_pretrain_capstone(spark, sf_dir).count()
            times[label].append(time.monotonic() - t0)
    for label, ts in times.items():
        print(
            json.dumps(
                {
                    "scale": label,
                    "median": round(statistics.median(ts), 3),
                    "times": [round(t, 3) for t in ts],
                    "out_rows": rows[label],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
