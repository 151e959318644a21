#!/usr/bin/env python
"""Same-machine A/B for the shingle/signature family (q26/q27/q29/q60):
Spark isolated min-of-N vs the identical DuckDB oracle SQL, one JSON line.

Usage: python scripts/ab_shingle.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

QUERIES_AB = sys.argv[3].split(",") if len(sys.argv) > 3 else [
    "q26_jaccard_pairs",
    "q27_minhash_lsh_pairs",
    "q29_simhash_near_pairs",
    "q60_incremental_dedup",
]

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import duckdb

    from dbda_big_data_walmart_stores_analysis_prediction_spark import get_spark
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans import (
        ORACLE_SQL,
        QUERIES,
    )

    spark = get_spark(app_name="ab_shingle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    out = {}
    for name in QUERIES_AB:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        s_best = float("inf")
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_best = min(s_best, time.perf_counter() - t0)
        sql = ORACLE_SQL[name]
        con.execute(sql).fetchall()
        d_best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_best = min(d_best, time.perf_counter() - t0)
        out[name] = {
            "spark": round(s_best, 3),
            "duckdb": round(d_best, 3),
            "ratio": round(s_best / d_best, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
