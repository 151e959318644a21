#!/usr/bin/env python
"""Exercise connected_components' DISTRIBUTED path at above-gate scale.

The ≤1M-edge driver union-find gate carries five pipelines; this script
proves the distributed min-label fallback is live, not decorative: a
synthetic 1.2M-edge graph (above the default gate) runs through BOTH
paths — the default call (gate declines -> distributed loop) and a
raised-gate call (driver union-find) — asserts the label sets are
identical, and prints one JSON line with both timings.

Graph shape: 1.5M nodes in 300k five-node star clusters (the shallow
dense-cluster shape dedup actually produces) plus one 60-node chain
stitched across cluster minima (diameter > the default 20-round budget on
its own subgraph), so the run also traverses the star-contraction escape
hatch if the loop's budget ever regresses.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dbda_big_data_walmart_stores_analysis_prediction_spark import (  # noqa: E402
    get_spark,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.dedup import (  # noqa: E402
    connected_components,
)


def main() -> None:
    n = int(os.environ.get("CC_BENCH_NODES", "1500000"))
    spark = get_spark(app_name="cc_fallback_bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # 5-node star clusters: (i -> i - i%5) for i%5 != 0  => n*4/5 edges
    clusters = (
        spark.range(n)
        .where(F.col("id") % 5 != 0)
        .select(
            F.col("id").alias("doc_a"),
            (F.col("id") - F.col("id") % 5).alias("doc_b"),
        )
    )
    # one 60-link chain across cluster minima: (5k*5) - ((5k+1)*5)
    chain = (
        spark.range(60)
        .select(
            (F.col("id") * 25).alias("doc_a"),
            ((F.col("id") + 1) * 25).alias("doc_b"),
        )
    )
    edges = clusters.unionByName(chain).localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.perf_counter()
    dist = connected_components(edges)  # gate declines: n_edges > 1M
    n_dist = dist.count()
    t_dist = time.perf_counter() - t0

    t0 = time.perf_counter()
    uf = connected_components(edges, driver_edge_bound=2 * n_edges)
    n_uf = uf.count()
    t_uf = time.perf_counter() - t0

    mismatch = (
        dist.withColumnRenamed("component", "c1")
        .join(uf.withColumnRenamed("component", "c2"), "id", "full")
        .where(
            F.col("c1").isNull()
            | F.col("c2").isNull()
            | (F.col("c1") != F.col("c2"))
        )
        .count()
    )
    print(
        json.dumps(
            {
                "edges": n_edges,
                "nodes_labeled": n_dist,
                "distributed_sec": round(t_dist, 2),
                "union_find_sec": round(t_uf, 2),
                "labels_identical": mismatch == 0 and n_dist == n_uf,
            }
        )
    )
    assert mismatch == 0 and n_dist == n_uf, "paths disagree"


if __name__ == "__main__":
    main()
