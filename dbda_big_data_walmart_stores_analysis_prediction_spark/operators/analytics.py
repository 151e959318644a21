"""EDA/analytics operators, full-data Spark-side (SURVEY.md §2.4 A5-A10).

The reference computes these on a 10% driver-local pandas sample
(``Scripts/eda.py:61-63`` and everything after) — approximate answers and an
unbounded ``toPandas``. Every operator here aggregates on the cluster and
returns a tiny DataFrame; only that aggregate ever reaches the driver.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe_plus(df: DataFrame, columns: list[str]) -> DataFrame:
    """A5/A6: count / mean / stddev / min / max / exact quartiles per column,
    one aggregate job for all columns (vs ``df.describe()`` + a separate
    pandas quantile pass in the reference, ``Scripts/eda.py:58,77-81``).

    Output: one row per column — (column, n, mean, stddev, min, q1, median,
    q3, max). Uses exact ``percentile``; swap to ``percentile_approx`` when
    the column cardinality is huge.
    """
    stats = ("n", "mean", "stddev", "min", "q1", "median", "q3", "max")
    aggs = []
    for c in columns:
        aggs.extend(
            [
                F.count(c).cast("bigint").alias(f"{c}__n"),
                F.avg(c).cast("double").alias(f"{c}__mean"),
                F.stddev(c).cast("double").alias(f"{c}__stddev"),
                F.min(c).cast("double").alias(f"{c}__min"),
                F.expr(f"percentile(`{c}`, 0.25)").alias(f"{c}__q1"),
                F.expr(f"percentile(`{c}`, 0.5)").alias(f"{c}__median"),
                F.expr(f"percentile(`{c}`, 0.75)").alias(f"{c}__q3"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs).collect()[0]  # single row: the reshape is driver-side
    rows = [
        tuple([c] + [wide[f"{c}__{s}"] for s in stats]) for c in columns
    ]
    schema = (
        "column string, n bigint, mean double, stddev double, min double, "
        "q1 double, median double, q3 double, max double"
    )
    return df.sparkSession.createDataFrame(rows, schema)


def correlations(df: DataFrame, columns: list[str], target: str | None = None) -> DataFrame:
    """A7: Pearson correlations, one aggregate job for all pairs.

    If ``target`` is given, correlates every column against it (the
    reference's ``corr()["Weekly_Sales"]`` at ``Scripts/eda.py:88``);
    otherwise the full upper-triangle matrix. Uses ``corr`` as a plain
    aggregate expression so N pairs still cost ONE pass.
    """
    if target is not None:
        pairs = [(c, target) for c in columns if c != target]
    else:
        pairs = list(combinations(columns, 2))
    aggs = [
        F.corr(a, b).cast("double").alias(f"{a}__{b}") for a, b in pairs
    ]
    wide = df.agg(*aggs).collect()[0]
    rows = [(a, b, wide[f"{a}__{b}"]) for a, b in pairs]
    return df.sparkSession.createDataFrame(rows, "col_a string, col_b string, pearson double")


def histogram(
    df: DataFrame, col: str, n_bins: int = 50, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """A10: fixed-width histogram as a groupBy on the bin index — a single
    partial+final hash aggregate (the reference histograms a pandas sample,
    ``Scripts/eda.py:67``). Bounds default to the column min/max (one extra
    tiny agg job). Values == hi land in the last bin."""
    if lo is None or hi is None:
        bounds = df.agg(F.min(col).cast("double"), F.max(col).cast("double")).first()
        lo = bounds[0] if lo is None else lo
        hi = bounds[1] if hi is None else hi
    width = (hi - lo) / n_bins or 1.0
    bin_idx = F.least(
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(n_bins - 1),
    ).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_idx.alias("bin"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            "cnt",
        )
        .orderBy("bin")
    )


def group_quartiles(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """A9: per-group five-number summary (the stats behind the reference's
    seaborn boxplots, ``Scripts/eda.py:103-146``), exact percentiles."""
    return df.groupBy(group_col).agg(
        F.min(value_col).cast("double").alias("min"),
        F.expr(f"percentile(`{value_col}`, 0.25)").alias("q1"),
        F.expr(f"percentile(`{value_col}`, 0.5)").alias("median"),
        F.expr(f"percentile(`{value_col}`, 0.75)").alias("q3"),
        F.max(value_col).cast("double").alias("max"),
    )


def outlier_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """A6/P10: IQR outlier fence (reference computes it on the pandas sample,
    ``Scripts/eda.py:77-84``). Returns (lo, hi); filter Spark-side with
    ``df.where((c < lo) | (c > hi))``."""
    q1, q3 = df.agg(
        F.expr(f"percentile(`{col}`, 0.25)"), F.expr(f"percentile(`{col}`, 0.75)")
    ).first()
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr
