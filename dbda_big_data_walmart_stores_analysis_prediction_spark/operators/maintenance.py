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
