"""Dataset maintenance operators — the snapshot/refresh surface a
training-data pipeline needs around the analytics core (north-star; the
reference's only maintenance is full-overwrite parquet writes,
``Scripts/etl.py:123``).

Plain-files lakes (no Delta/Iceberg in this environment) can't do
transactional row-level MERGE; the scalable pattern is snapshot merge:
read current, combine with updates, write a new snapshot directory and
swap pointers. These operators build the combined frame; `sources/io`
writes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame, updates: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Upsert semantics: rows from ``updates`` win on key collision,
    unmatched ``current`` rows survive, new keys insert.

    Plan: one LEFT ANTI join of current against update keys (shuffle or
    broadcast by update size — Catalyst decides; typical refresh batches
    are small vs the snapshot, so this is usually a broadcast anti join
    that never shuffles the big side) + a union. Schemas must match by
    name (``unionByName``).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    survivors = current.join(
        updates.select(*key_list).distinct(), key_list, "left_anti"
    )
    return updates.unionByName(survivors)


def delete_keys(
    current: DataFrame, tombstones: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Delete-by-key: anti join against the tombstone set — same
    broadcast-anti shape as ``merge_upsert``'s survivor side."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return current.join(
        tombstones.select(*key_list).distinct(), key_list, "left_anti"
    )


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the small-file compaction every long-lived lake table needs (a 100 TB
    table accreting 10k tiny files per refresh turns scans into metadata
    storms and starves scan parallelism).

    File count = ceil(total_bytes / target). Unpartitioned output uses
    ``repartition(n)`` (round-robin — even file sizes); partitioned output
    repartitions BY the partition columns so each output directory is
    written by the tasks owning that partition's rows, avoiding the
    classic one-file-per-task-per-partition explosion. Writes a NEW
    snapshot directory (plain-files lakes swap pointers, same contract as
    ``merge_upsert``). Returns the target file count.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        writer = (
            df.repartition(n, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n).write.mode("overwrite")
    writer.parquet(out_path)
    return n
