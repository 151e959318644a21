"""Join operators (SURVEY.md §2.3 J1-J3).

The reference's two joins (fact x 45-row dim on ``Store``; fact x 8,190-row
dim on ``Store, Date`` — ``Scripts/etl.py:35-36``) both fit under the
broadcast threshold, and the same is true of every dim in the driver star
schema. We broadcast explicitly: at 100 TB the fact side is thousands of
partitions and an accidental sort-merge join on it is the single most
expensive mistake available, so determinism beats relying on
``autoBroadcastJoinThreshold`` statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, list[str] | str]],
    how: str = "left",
    broadcast_dims: bool = True,
    drop_ambiguous: bool = True,
) -> DataFrame:
    """Join a fact table against small dimensions.

    ``dims`` is ``[(dim_df, join_keys), ...]``. USING-style keys (list/str)
    dedupe the key columns automatically; ``drop_ambiguous`` additionally
    drops non-key dim columns that collide with fact columns BEFORE joining
    (the reference handles one such collision by hand-dropping
    ``features.IsHoliday`` at ``Scripts/etl.py:108-109``).
    """
    out = fact
    for dim, keys in dims:
        key_list = [keys] if isinstance(keys, str) else list(keys)
        if drop_ambiguous:
            collide = [
                c for c in dim.columns if c in out.columns and c not in key_list
            ]
            if collide:
                dim = dim.drop(*collide)
        if broadcast_dims:
            dim = F.broadcast(dim)
        out = out.join(dim, on=key_list, how=how)
    return out
