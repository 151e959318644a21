"""Deterministic sampling operators.

The engine's probabilistic samplers (seeded Bernoulli ``df.sample``,
``randomSplit`` — SURVEY §2 M1/M2) are RNG-specific by nature, so the
driver can only rows-check them. This module holds the DETERMINISTIC
counterparts: hash-ordered selection, reproducible bit-for-bit across
engines and runs, which is what a training-data pipeline wants when a
corpus mix must be auditable ("the same 50% of English docs every rerun,
no matter the cluster size or task order").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbda_big_data_walmart_stores_analysis_prediction_spark.functions.hashing import (
    md5_int64,
)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum.

    Rows are ranked inside their stratum by ``md5(salt:id)`` — a
    pseudo-random but reproducible order — and the first
    ``ceil(fraction * stratum_size)`` survive (so any stratum with a
    positive fraction keeps at least one row). Strata missing from
    ``fractions`` fall back to ``default_fraction``; 0.0 drops them.

    This is the corpus-mixing primitive ("50% en, 25% de, 10% of the
    rest"): unlike ``sampleBy`` the kept set is a pure function of the
    data, so reruns, retries, and differently-partitioned clusters all
    produce the identical corpus, and a SQL oracle can replicate it
    row-for-row.

    Plan: one shuffle on the stratum; both window functions (rank and
    stratum count) reuse the same partitioning. The in-stratum sort is the
    cost at scale — for strata of billions of rows where an approximate
    share is acceptable, ``df.sampleBy`` is the cheaper shuffle-free
    alternative; this operator's niche is exactness + reproducibility.
    """
    h = md5_int64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    frac = F.lit(float(default_fraction))
    for value, share in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(share))).otherwise(
            frac
        )
    by_stratum = Window.partitionBy(strata_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(by_stratum.orderBy("__h", id_col)))
        .withColumn("__cnt", F.count("*").over(by_stratum))
        .where(F.col("__rn") <= F.ceil(F.col("__cnt") * frac))
        .drop("__h", "__rn", "__cnt")
    )
