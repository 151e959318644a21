"""Sentinel cleaning (SURVEY.md §2.2 P4).

Reference: ``when(col == "NA", None).otherwise(col).cast(FloatType())`` in a
per-column ``withColumn`` loop (``Scripts/etl.py:96-106``). Preferred path is
the reader's ``nullValue="NA"`` option (sources/io.py), which never
materializes the strings; this function exists for frames that arrive dirty
(e.g. from an upstream system), and does all columns in one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, FloatType


def clean_na_sentinels(
    df: DataFrame,
    columns: list[str],
    sentinel: str = "NA",
    cast_to: DataType | str = FloatType(),
) -> DataFrame:
    """Map ``sentinel`` strings to NULL and cast, all columns in one select.

    ``try_cast``, not ``cast``: this operator exists for frames that
    arrive DIRTY, and this session runs Spark's ANSI mode, where a plain
    cast of any non-sentinel unparseable value ("n/a", "1,5", "-")
    throws CAST_INVALID_INPUT mid-scan — at 100 TB that is one bad cell
    killing the job hours in. Unparseable values become NULL, the same
    fate as the declared sentinel."""
    cleaned = {
        c: F.when(F.col(c) == sentinel, None)
        .otherwise(F.col(c))
        .try_cast(cast_to)
        .alias(c)
        for c in columns
    }
    return df.select(
        *(cleaned.get(c, F.col(c)) for c in df.columns)
    )
