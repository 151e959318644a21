"""q60 incremental-dedup checkpoint A/B (round-7 verdict item 5 support):
time the registered q60 with its two internal lazy checkpoints (surv,
attached) ON vs monkeypatched OFF, interleaved so session drift hits
both equally. Completes the fuse-vs-adjudicate evidence: if OFF is not
faster, the two materializations are load-bearing (each frame feeds two
consumers) and the remaining gap to the oracle is stage floor, not
structure.

Usage: python scripts/ab_q60_checkpoints.py [--reps 4]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 4
    )
    from pyspark.sql import DataFrame

    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.northstar_queries import (
        q60_incremental_dedup,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

    spark = get_spark()
    real_ckpt = DataFrame.localCheckpoint

    def run(ckpt_on: bool) -> float:
        DataFrame.localCheckpoint = (
            real_ckpt if ckpt_on else (lambda self, eager=True: self)
        )
        try:
            t0 = time.monotonic()
            q60_incremental_dedup(spark, SF_DIR).count()
            return time.monotonic() - t0
        finally:
            DataFrame.localCheckpoint = real_ckpt

    run(True)  # warm
    times: dict[str, list[float]] = {"ckpt-on": [], "ckpt-off": []}
    for _ in range(reps):
        times["ckpt-on"].append(run(True))
        times["ckpt-off"].append(run(False))
    for label, ts in times.items():
        print(
            json.dumps(
                {
                    "config": label,
                    "median": round(statistics.median(ts), 3),
                    "times": [round(t, 3) for t in ts],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
