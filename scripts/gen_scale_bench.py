#!/usr/bin/env python
"""Generate the scaling-trend fixtures: sf0.1 documents replicated with
re-keyed ids into .bench_scale/sf0.2 and .bench_scale/sf0.5.

Verbatim replication is deliberate (and is the construction the round-4
review prescribed): every doc gains copies-1 exact replicas, so duplicate
and near-duplicate DENSITY rises with scale — the candidate-pair space
grows ~copies² while rows grow ~copies. That makes these fixtures a
STRESS instance for the dedup family, not just a bigger one: a plan with
a hidden all-pairs or unguarded-fanout stage blows up super-linearly
here; a bucketed plan should track the pair count. PERF.md records the
measured curve.

Usage: python scripts/gen_scale_bench.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark import get_spark

SRC = "/root/testdata/sf0.1/documents.parquet"
EMB_SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scale")


def main() -> None:
    spark = get_spark(app_name="gen_scale_bench", shuffle_partitions=32)
    docs = spark.read.parquet(SRC)
    emb = spark.read.parquet(EMB_SRC)
    for copies, name in [(2, "sf0.2"), (5, "sf0.5")]:
        parts = [
            docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            for i in range(copies)
        ]
        out = functools.reduce(lambda a, b: a.unionAll(b), parts)
        dest = f"{OUT}/{name}/documents.parquet"
        out.repartition(8).write.mode("overwrite").parquet(dest)
        print(name, spark.read.parquet(dest).count(), "docs ->", dest)
        # embeddings replicate the same way (re-keyed exact copies): the
        # clustering/semdedup family's stress instance — within-cluster
        # pair density grows ~copies^2 while rows grow ~copies
        eparts = [
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(copies)
        ]
        eout = functools.reduce(lambda a, b: a.unionAll(b), eparts)
        edest = f"{OUT}/{name}/embeddings.parquet"
        eout.repartition(8).write.mode("overwrite").parquet(edest)
        print(name, spark.read.parquet(edest).count(), "vecs ->", edest)
        # events replicate with re-keyed event ids but the SAME user ids:
        # every key's load grows x copies uniformly, so skew FACTOR holds
        # while the hot key's absolute row count scales — the stress
        # instance for the skew/salting family (q155/q162) and the
        # windowed-aggregate events queries. The customer dim passes
        # through verbatim: a 100 TB fact scales, its dims don't.
        evs = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        vparts = [
            evs.select(
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                *[c for c in evs.columns if c != "event_id"],
            )
            for i in range(copies)
        ]
        vout = functools.reduce(lambda a, b: a.unionAll(b), vparts)
        vdest = f"{OUT}/{name}/events.parquet"
        vout.repartition(8).write.mode("overwrite").parquet(vdest)
        print(name, spark.read.parquet(vdest).count(), "events ->", vdest)
        spark.read.parquet("/root/testdata/sf0.1/customer.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{name}/customer.parquet")


if __name__ == "__main__":
    main()
