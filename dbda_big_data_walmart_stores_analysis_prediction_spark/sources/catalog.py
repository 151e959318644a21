"""Star-schema catalog over the driver's synthetic test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to always broadcast — at any scale factor the
# TPC-H-ish dims stay orders of magnitude under the fact tables.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "customer", "part"})


def load_star_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in STAR_TABLES:
        raise KeyError(f"unknown star table {name!r}; have {STAR_TABLES}")
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS); callers may hand us a vanilla
        # session (the correctness driver does), so set the legacy conf here —
        # it is runtime-settable — rather than relying on our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is TIMESTAMP(NANOS) on disk, surfaced as int64 nanos via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros exactly as
        # DuckDB does so oracle comparisons agree.
        from pyspark.sql import functions as F  # noqa: F401

        # integer `div` — a float division would shave precision off ~1e18 ns
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_star_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    return {name: load_star_table(spark, sf_dir, name) for name in names}
