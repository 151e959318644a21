"""SparkSession factory with scale-sane defaults.

The reference configures almost nothing (``Scripts/etl.py:82`` uses a bare
``getOrCreate``; only the model stage sets memory, ``Scripts/model.py:55-60``).
We centralize session construction so every entry point gets AQE, Arrow,
and a shuffle-partition count sized to the environment instead of Spark's
200-partition default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "dbda-big-data-walmart-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults are chosen for correctness-at-scale:

    * AQE on (runtime shuffle-partition coalescing + skew-join splitting),
      so plans written for sf0.01 survive a 100x scale-up without retuning.
    * ``spark.sql.shuffle.partitions`` matched to local cores for tests;
      on a real cluster callers pass ~2-3x total executor cores.
    * Arrow on, so any ``toPandas``/pandas-UDF boundary is columnar batch
      transfer rather than row pickling.
    * Timezone pinned to UTC so date-part functions (``Scripts/etl.py:49-52``
      equivalents) are machine-independent and oracle-comparable.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd for every parquet sink (snapshots, artifacts, bucketed
        # tables): markedly better ratio than snappy at similar read
        # speed — at lake scale the write/read byte saving compounds
        # across every snapshot version. Read-side behavior and values
        # are unchanged (DuckDB oracles read zstd parquet natively).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Parquet TIMESTAMP(NANOS) is illegal in vanilla Spark; read the
        # physical int64 and let the catalog convert ns -> timestamp
        # (sources/catalog.py), matching DuckDB's nanos->micros truncation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
