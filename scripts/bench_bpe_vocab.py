#!/usr/bin/env python
"""Exercise train_bpe's driver merge loop at a REALISTIC vocabulary size.

The registered q84 runs over the synthetic fixture corpus, whose shared
tech vocabulary collapses to ~31 distinct words — it proves the plumbing,
not the gate. This script synthesizes a corpus whose DISTINCT-word count
is in the 100k range (Heaps-law territory for a multi-GB crawl shard),
runs the distributed word count + incremental merge loop end to end, and
prints one JSON line with the timings that back the `max_vocab_rows`
gate claim (PERF.md records the result).

Usage: python scripts/bench_bpe_vocab.py [n_words] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark import get_spark
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.bpe import (
    train_bpe,
    word_counts,
)


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    spark = get_spark(app_name="bench_bpe_vocab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # Zipf-ish synthetic corpus: word w_i appears ~n_words/i times; words
    # are md5-hex fragments of varying length so pair statistics are
    # non-degenerate. Built fully distributed (no driver materialization).
    ids = spark.range(n_words).select(
        F.col("id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, (F.col("id") % 12 + 4).cast("int")).alias("w"),
        (F.lit(n_words) / (F.col("id") + 1)).cast("long").alias("freq"),
    )
    docs = (
        ids.select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.array_repeat(F.col("w"), F.greatest(F.col("freq"), F.lit(1)).cast("int")),
                " ",
            ).alias("text"),
        )
    )

    t0 = time.perf_counter()
    vocab_rows = word_counts(docs).count()
    t_count = time.perf_counter() - t0

    t0 = time.perf_counter()
    merges = train_bpe(docs, n_merges=n_merges, min_pair_count=2)
    n_out = merges.count()
    t_train = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "distinct_words": vocab_rows,
                "n_merges_requested": n_merges,
                "n_merges_learned": n_out,
                "word_count_sec": round(t_count, 2),
                "train_total_sec": round(t_train, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
