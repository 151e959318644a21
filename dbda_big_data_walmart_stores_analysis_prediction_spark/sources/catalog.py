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

# Tables whose downstream pipelines are CPU-heavy per row (shingling, md5,
# token explodes, embedding arithmetic) rather than scan-bound. When such a
# table arrives in fewer splits than the cluster has cores — the small-file
# regime, e.g. one 600 KB parquet at bench scale = ONE scan task carrying
# the whole explode+hash stage single-threaded — fan the scan out to
# default parallelism before any consumer. One cheap narrow-ish shuffle of
# the raw rows unlocks all cores for the expensive projections (measured:
# the whole shingle family was serialized behind the 1-task scan at sf0.1).
# At real scale splits >> cores, the condition never fires, and the
# repartition never appears in the plan.
CPU_HEAVY_TABLES = frozenset({"documents", "embeddings"})


def load_star_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in STAR_TABLES:
        raise KeyError(f"unknown star table {name!r}; have {STAR_TABLES}")
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS); callers may hand us a vanilla
        # session (the correctness driver does), so set the legacy conf here —
        # it is runtime-settable — rather than relying on our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F  # noqa: F401

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # events.ts as TIMESTAMP(NANOS) on disk, surfaced as int64 nanos
            # via spark.sql.legacy.parquet.nanosAsLong; truncate to micros
            # exactly as DuckDB does so oracle comparisons agree. Integer
            # `div` — float division would shave precision off ~1e18 ns.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # events.ts as plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
            # infers as TIMESTAMP_NTZ under Spark 4's default
            # inferTimestampNTZ. Every event operator (unix_micros gaps,
            # window alignment) and every oracle comparison was written for
            # TIMESTAMP_LTZ in a UTC session, where the wall-clock values
            # DuckDB sees and the instants Spark sees coincide — so
            # normalize here, at the single load point, not per-operator.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name in CPU_HEAVY_TABLES:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def load_star_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    return {name: load_star_table(spark, sf_dir, name) for name in names}
