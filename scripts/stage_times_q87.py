"""Stage-time decomposition of the q87 pretrain capstone: count() each
lazy-checkpointed stage boundary in pipeline order, so each increment ≈
that stage's first-materialization cost (checkpointed predecessors are
reused). The final count() is the full query; the sum of increments
approximates it because every boundary is cached after first compute.

Usage: python scripts/stage_times_q87.py [--reps 2]
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
        else 2
    )
    from pyspark.sql import functions as F

    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans import (
        northstar_queries as nq,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.pretrain import (
        pretrain_corpus,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

    spark = get_spark()
    # warm once end to end
    nq.q87_pretrain_capstone(spark, SF_DIR).count()

    per_stage: dict[str, list[float]] = {}
    totals = []
    for _ in range(reps):
        docs = nq._t(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
        injected = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(".\ntoo short.\n" + nq._Q83_TAIL),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.lit("\nthis page uses javascript for menus."),
                ).otherwise(F.lit("")),
                F.when(F.col("doc_id") % 17 == 0, F.lit("\nlorem ipsum")).otherwise(
                    F.lit("")
                ),
                F.when(F.col("doc_id") % 19 == 0, F.lit("\nfunction() {")).otherwise(
                    F.lit("")
                ),
            ).alias("text"),
        )
        ev = docs.where(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.trim(F.col("text")), r"\s+"), 4, 30), " "
            ).alias("text"),
        )
        target_ids = docs.where(F.col("lang") == "en").select("doc_id")
        stages: dict = {}
        t_start = time.monotonic()
        out = pretrain_corpus(injected, ev, target_ids, stages=stages)
        prev = time.monotonic()
        # pretrain_corpus construction is NOT lazy end to end: the
        # near-dedup size gate runs a driver-side count during plan
        # construction, so this increment carries real cluster work
        per_stage.setdefault("construct(incl. eager gates)", []).append(
            prev - t_start
        )
        for name, frame in stages.items():
            frame.count()
            now = time.monotonic()
            per_stage.setdefault(name, []).append(now - prev)
            prev = now
        out.count()
        now = time.monotonic()
        per_stage.setdefault("final", []).append(now - prev)
        totals.append(now - t_start)
    for name, ts in per_stage.items():
        print(
            json.dumps(
                {
                    "stage": name,
                    "median": round(statistics.median(ts), 3),
                    "times": [round(t, 3) for t in ts],
                }
            ),
            flush=True,
        )
    print(json.dumps({"stage": "TOTAL", "times": [round(t, 3) for t in totals]}))
    spark.stop()


if __name__ == "__main__":
    main()
