"""EDA/analytics operators, full-data Spark-side (SURVEY.md §2.4 A5-A10).

The reference computes these on a 10% driver-local pandas sample
(``Scripts/eda.py:61-63`` and everything after) — approximate answers and an
unbounded ``toPandas``. Every operator here aggregates on the cluster and
returns a tiny DataFrame; only that aggregate ever reaches the driver.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame, col: str, probs: list[float], n_ranges: int = 16
) -> list[float]:
    """Exact linear-interpolated quantiles (``quantile_cont`` semantics) via
    distributed rank selection — NOT the builtin ``percentile`` aggregate.

    Spark's ``percentile`` is a TypedImperativeAggregate that buffers an
    OpenHashMap of every distinct value per partial buffer; on a
    600k-distinct double column this is a multi-second GC bomb whose heap
    pressure degrades the whole session afterwards (measured: 10-60s for the
    agg, then 10-30x slowdowns on unrelated follow-up queries). It is also
    the wrong shape at 100 TB — all values funnel into one final buffer.

    This operator instead:
      1. range-partitions the column into ``n_ranges`` sorted slices,
      2. computes per-slice row counts (tiny job) and prefix-sums them on
         the driver to turn target global ranks into (slice, local-rank),
      3. selects the ~2|probs| needed rows with a partition-local
         ``row_number`` filter — no single-task sort, no value buffering.
    Memory per task is bounded by the slice size regardless of total rows.
    """
    return exact_quantiles_multi(df, [col], probs, n_ranges)[col]


def exact_quantiles_multi(
    df: DataFrame, columns: list[str], probs: list[float], n_ranges: int = 16
) -> dict[str, list[float]]:
    """Exact quantiles for SEVERAL columns in two jobs total.

    Melts the columns into (name, value) pairs with ``stack`` (one scan),
    range-partitions by (name, value) so each slice is sorted and
    column-contiguous, then does the same prefix-sum rank selection as
    ``exact_quantiles`` with (name, pid) bookkeeping.
    """
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as double)" for c in columns)
    vals = (
        df.selectExpr(f"stack({len(columns)}, {stack_expr}) as (name, v)")
        .where(F.col("v").isNotNull())
        .repartitionByRange(n_ranges, "name", "v")
        .withColumn("pid", F.spark_partition_id())
        # MUST persist: RangePartitioner picks boundaries by sampling with a
        # per-RDD seed, so re-executing the shuffle in the second job would
        # place rows differently than the sizes computed in the first.
        .persist()
    )
    sizes: dict[str, dict[int, int]] = {c: {} for c in columns}
    for r in vals.groupBy("name", "pid").agg(F.count("*").alias("cnt")).collect():
        sizes[r["name"]][r["pid"]] = r["cnt"]

    offsets: dict[str, dict[int, int]] = {}
    totals: dict[str, int] = {}
    for c in columns:
        acc = 0
        offsets[c] = {}
        for pid in sorted(sizes[c]):
            offsets[c][pid] = acc
            acc += sizes[c][pid]
        totals[c] = acc

    def locate(c: str, rank: int) -> tuple[int, int]:
        for pid in sorted(sizes[c]):
            if rank < offsets[c][pid] + sizes[c][pid]:
                return pid, rank - offsets[c][pid] + 1  # row_number is 1-based
        last = max(sizes[c])
        return last, sizes[c][last]

    # Partition-local row numbers (below) count ALL rows in a slice; when a
    # boundary slice holds several columns' rows (sorted name-contiguously),
    # a column's first row sits after every lexicographically-smaller
    # column's rows — shift the wanted local rank by that intra-slice offset.
    def intra_offset(c: str, pid: int) -> int:
        return sum(
            sizes[c2].get(pid, 0) for c2 in columns if c2 < c
        )

    cond = None
    for c in columns:
        n = totals[c]
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            r = (n - 1) * p
            ranks.add(math.floor(r))
            ranks.add(math.ceil(r))
        for pid, local in (locate(c, r) for r in sorted(ranks)):
            term = (
                (F.col("name") == c)
                & (F.col("pid") == pid)
                & (F.col("rn") == local + intra_offset(c, pid))
            )
            cond = term if cond is None else (cond | term)

    out: dict[str, list[float]] = {c: [None] * len(probs) for c in columns}
    if cond is None:
        vals.unpersist()
        return out
    # Partition-local row numbers WITHOUT a window (a window over (name,pid)
    # would hash-shuffle all rows again): sort within the already-range-
    # partitioned slices, then decode monotonically_increasing_id, which is
    # (partition_id << 33) | per-partition-sequence by construction.
    picked = (
        vals.sortWithinPartitions("name", "v")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("rn", (F.col("mid") % F.lit(1 << 33) + 1).cast("int"))
        .where(cond)
        .select("name", "pid", "rn", "v")
        .collect()
    )
    vals.unpersist()
    by_rank: dict[str, dict[int, float]] = {c: {} for c in columns}
    for row in picked:
        c = row["name"]
        local = row["rn"] - intra_offset(c, row["pid"])
        by_rank[c][offsets[c][row["pid"]] + local - 1] = row["v"]
    for c in columns:
        if totals[c] == 0:
            continue
        n = totals[c]
        res = []
        for p in probs:
            r = (n - 1) * p
            lo, hi = math.floor(r), math.ceil(r)
            g = r - lo
            res.append(by_rank[c][lo] + (by_rank[c][hi] - by_rank[c][lo]) * g)
        out[c] = res
    return out


def describe_plus(df: DataFrame, columns: list[str]) -> DataFrame:
    """A5/A6: count / mean / stddev / min / max / exact quartiles per column,
    one aggregate job for all columns (vs ``df.describe()`` + a separate
    pandas quantile pass in the reference, ``Scripts/eda.py:58,77-81``).

    Output: one row per column — (column, n, mean, stddev, min, q1, median,
    q3, max). Uses exact ``percentile``; swap to ``percentile_approx`` when
    the column cardinality is huge.
    """
    # Two-phase plan: (1) all codegen-able stats for every column in ONE
    # whole-stage-codegen hash aggregate; (2) exact quantiles per column via
    # the distributed rank-selection operator (see exact_quantiles — the
    # builtin percentile() aggregate is a session-degrading GC bomb on
    # high-cardinality columns and a single-buffer funnel at scale).
    basic = []
    for c in columns:
        basic.extend(
            [
                F.count(c).cast("bigint").alias(f"{c}__n"),
                F.avg(c).cast("double").alias(f"{c}__mean"),
                F.stddev(c).cast("double").alias(f"{c}__stddev"),
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*basic).collect()[0]
    quartiles = exact_quantiles_multi(df, columns, [0.25, 0.5, 0.75])
    rows = []
    for c in columns:
        q1, median, q3 = quartiles[c]
        rows.append(
            (
                c,
                wide[f"{c}__n"],
                wide[f"{c}__mean"],
                wide[f"{c}__stddev"],
                wide[f"{c}__min"],
                q1,
                median,
                q3,
                wide[f"{c}__max"],
            )
        )
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
    # covar/(sd*sd) with try_divide instead of corr(): under ANSI mode
    # (Spark 4 default) corr() THROWS on a zero-variance column; a constant
    # feature should yield NULL (pandas/DuckDB behavior), not kill the job.
    aggs = [
        F.expr(
            f"try_divide(covar_samp(`{a}`, `{b}`), "
            f"stddev_samp(`{a}`) * stddev_samp(`{b}`))"
        )
        .cast("double")
        .alias(f"{a}__{b}")
        for a, b in pairs
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
    return (
        df.groupBy(group_col)
        .agg(
            F.min(value_col).cast("double").alias("min"),
            # one shared percentile buffer per group (see describe_plus)
            F.expr(f"percentile(`{value_col}`, array(0.25, 0.5, 0.75))").alias("q"),
            F.max(value_col).cast("double").alias("max"),
        )
        .select(
            group_col,
            "min",
            F.col("q")[0].alias("q1"),
            F.col("q")[1].alias("median"),
            F.col("q")[2].alias("q3"),
            "max",
        )
    )


def outlier_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """A6/P10: IQR outlier fence (reference computes it on the pandas sample,
    ``Scripts/eda.py:77-84``). Returns (lo, hi); filter Spark-side with
    ``df.where((c < lo) | (c > hi))``."""
    q1, q3 = exact_quantiles(df, col, [0.25, 0.75])
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr
