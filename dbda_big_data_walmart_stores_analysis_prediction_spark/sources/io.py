"""Readers and writers (SURVEY.md §2.1 S1-S4).

Scale posture:

* CSV reads take an explicit schema and a ``nullValue`` sentinel — one scan,
  deterministic types (replaces reference ``Scripts/etl.py:86-89``).
* Parquet writes never ``coalesce(1)`` (reference ``Scripts/etl.py:123,126``
  funnels the whole upstream plan through one task); instead callers choose
  ``partition_by`` for pruning or leave natural parallelism alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    null_value: str | None = "NA",
) -> DataFrame:
    """CSV scan with explicit schema (S1). ``null_value`` maps the sentinel
    string straight to typed NULLs at scan time."""
    reader = spark.read.schema(schema).option("header", header)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (S2). Column pruning + predicate pushdown are free as
    long as callers keep filters/projections declarative."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (S3/S4) at natural parallelism.

    ``partition_by`` gives directory-level partition pruning for downstream
    readers (e.g. ``Year`` for the Walmart pipeline). ``max_records_per_file``
    bounds file sizes without a repartition shuffle.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (parquet): rows are hash-partitioned
    into ``n_buckets`` files per partition BY WRITE, so later equi-joins
    and aggregations on ``bucket_cols`` between co-bucketed tables need no
    Exchange at read time — the pre-shuffle is paid once at write. This is
    the 100 TB idiom for fact tables joined repeatedly on the same key
    (e.g. bucket lineitem and orders by orderkey; every downstream join is
    then shuffle-free on both sides).

    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``.parquet(path)`` writes can't record bucket metadata.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_json(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines scan with explicit schema — never schema inference, which
    at scale re-reads the dataset once just to guess types (and guesses
    differently across dirty partitions)."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange format; ~3-5x larger than parquet at
    rest — use for handoff to non-columnar consumers, not storage)."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet;
    exists for interop with Hive-era lakes."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    null_value: str = "NA",
) -> None:
    """CSV sink, mirroring ``read_csv``'s sentinel convention so a
    write→read round-trip is lossless for null-bearing columns. Complex
    types (arrays/structs) are not CSV-representable — project them out
    first."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("nullValue", null_value)
        .csv(path)
    )
