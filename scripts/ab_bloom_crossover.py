#!/usr/bin/env python
"""Bloom-prefilter crossover measurement (round-8 verdict item 6 /
round-9 item 4): ``dedup_incremental(bloom_prefilter=True/False)`` at
corpus:batch ratios of 10x/20x/50x, the daily-ingest shape where the
sketch's case lives (a small batch landing against ever-larger standing
corpus state).

Fixture: batch = the sf0.1 ``doc_id % 10 == 0`` slice (500 docs; odd ids
get a doc_id suffix appended to the text so ~half the batch is genuinely
NEW — Bloom misses that bypass the confirm join — and half are exact
dups the hit slice must confirm). Corpus = sf0.1 (10x), .bench_scale
sf0.2 (20x), sf0.5 (50x; generate with scripts/gen_scale_bench.py).

Protocol: one session per scale, configs interleaved time-major
(False/True alternating, 3 sweeps each) per the round-8 A/B rule —
sequential config order reads JIT/GC warm-up drift as a fake win for
whichever ran last. Prints one JSON line per scale; PERF.md records the
table and the default-flip note.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark import get_spark
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.dedup import (
    dedup_incremental,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("10x", "/root/testdata/sf0.1/documents.parquet"),
    ("20x", os.path.join(REPO, ".bench_scale/sf0.2/documents.parquet")),
    ("50x", os.path.join(REPO, ".bench_scale/sf0.5/documents.parquet")),
]
SWEEPS = 3


def main() -> None:
    spark = get_spark(app_name="ab_bloom_crossover", shuffle_partitions=32)
    batch = (
        spark.read.parquet(SCALES[0][1])
        .where(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 1,
                F.concat(F.col("text"), F.lit(" uniq"), F.col("doc_id")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .localCheckpoint()  # eager: exclude batch prep from every timing
    )
    n_batch = batch.count()
    for label, path in SCALES:
        corpus = spark.read.parquet(path).select("doc_id", "text")
        n_corpus = corpus.count()  # warm the scan cache outside the timings
        times: dict[bool, list[float]] = {False: [], True: []}
        for _ in range(SWEEPS):
            for flag in (False, True):  # interleaved, never sequential
                t0 = time.monotonic()
                dedup_incremental(
                    corpus, batch, bloom_prefilter=flag
                ).count()
                times[flag].append(time.monotonic() - t0)
        print(
            json.dumps(
                {
                    "scale": label,
                    "n_corpus": n_corpus,
                    "n_batch": n_batch,
                    "plain_med": round(statistics.median(times[False]), 3),
                    "bloom_med": round(statistics.median(times[True]), 3),
                    "plain_all": [round(t, 3) for t in times[False]],
                    "bloom_all": [round(t, 3) for t in times[True]],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
