"""EDA/analytics operators, full-data Spark-side (SURVEY.md §2.4 A5-A10).

The reference computes these on a 10% driver-local pandas sample
(``Scripts/eda.py:61-63`` and everything after) — approximate answers and an
unbounded ``toPandas``. Every operator here aggregates on the cluster and
returns a tiny DataFrame; only that aggregate ever reaches the driver.
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _refine_ranks(
    melted: DataFrame,
    pending: list[dict],
    bins: int,
    collect_limit: int,
    max_depth: int,
) -> dict:
    """Shared histogram-refinement engine over a melted ``(name, v)`` frame.

    ``pending`` brackets are dicts with ``key`` (result key), ``cond`` (a
    Column predicate over the melted frame selecting the bracket's rows),
    ``lo``/``hi`` (value range for bucket arithmetic), ``below`` (global
    rank offset), ``count`` and ``ranks`` (0-based global ranks to
    resolve). Returns ``{key: {rank: value}}``. See
    ``exact_quantiles_multi`` for the algorithm and scale rationale.
    """
    resolved: dict = {}
    for b in pending:
        resolved.setdefault(b["key"], {})

    def bucket_of(lo: float, hi: float):
        raw = F.floor((F.col("v") - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * bins)
        return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))

    finals: list[dict] = []
    depth = 0
    while pending:
        big: list[dict] = []
        for b in pending:
            # an infinite span (values straddling ±~1e308) would turn the
            # child bounds into inf*0 = NaN — such a bracket goes straight
            # to the final collect instead of subdividing
            span = b["hi"] - b["lo"]
            splittable = (
                b["hi"] > b["lo"] and math.isfinite(span) and span / bins > 0
            )
            if b["count"] <= collect_limit or not splittable or depth >= max_depth:
                finals.append(b)
            else:
                big.append(b)
        pending = []
        if not big:
            break
        sel_bid = None
        sel_bucket = None
        for i, b in enumerate(big):
            expr = bucket_of(b["lo"], b["hi"])
            sel_bid = F.when(b["cond"], i) if sel_bid is None else sel_bid.when(b["cond"], i)
            sel_bucket = (
                F.when(b["cond"], expr) if sel_bucket is None else sel_bucket.when(b["cond"], expr)
            )
        hist_rows = (
            melted.select(sel_bid.alias("bid"), sel_bucket.alias("bucket"))
            .where(F.col("bid").isNotNull())
            .groupBy("bid", "bucket")
            .count()
            .collect()
        )
        counts: dict[int, dict[int, int]] = {}
        for r in hist_rows:
            counts.setdefault(r["bid"], {})[r["bucket"]] = r["count"]
        for i, b in enumerate(big):
            span = b["hi"] - b["lo"]
            cnts = counts.get(i, {})
            cum = b["below"]
            children: dict[int, dict] = {}
            kranks = sorted(b["ranks"])
            ki = 0
            for k in sorted(cnts):
                cnt = cnts[k]
                while ki < len(kranks) and cum <= kranks[ki] < cum + cnt:
                    child = children.get(k)
                    if child is None:
                        child = children[k] = {
                            "key": b["key"],
                            "cond": b["cond"] & (bucket_of(b["lo"], b["hi"]) == k),
                            "lo": b["lo"] + span * k / bins,
                            "hi": b["lo"] + span * (k + 1) / bins,
                            "below": cum,
                            "count": cnt,
                            "ranks": set(),
                        }
                    child["ranks"].add(kranks[ki])
                    ki += 1
                cum += cnt
            if ki != len(kranks):
                raise RuntimeError(
                    f"histogram pass lost ranks for {b['key']}: {kranks[ki:]}"
                )
            pending.extend(children.values())
        depth += 1

    if finals:
        sel_fid = None
        for i, b in enumerate(finals):
            sel_fid = F.when(b["cond"], i) if sel_fid is None else sel_fid.when(b["cond"], i)
        val_rows = (
            melted.select(sel_fid.alias("fid"), "v")
            .where(F.col("fid").isNotNull())
            .groupBy("fid", "v")
            .count()
            .collect()
        )
        groups: dict[int, list[tuple[float, int]]] = {}
        for r in val_rows:
            groups.setdefault(r["fid"], []).append((r["v"], r["count"]))
        for i, b in enumerate(finals):
            cum = b["below"]
            kranks = sorted(b["ranks"])
            ki = 0
            for v, cnt in sorted(groups.get(i, [])):
                while ki < len(kranks) and cum <= kranks[ki] < cum + cnt:
                    resolved[b["key"]][kranks[ki]] = v
                    ki += 1
                cum += cnt
            if ki != len(kranks):
                raise RuntimeError(
                    f"final pass lost ranks for {b['key']}: {kranks[ki:]}"
                )
    return resolved



def exact_quantiles(
    df: DataFrame, col: str, probs: list[float], n_ranges: int = 16
) -> list[float]:
    """Exact linear-interpolated quantiles (``quantile_cont`` semantics) via
    distributed histogram refinement — NOT the builtin ``percentile``
    aggregate.

    Spark's ``percentile`` is a TypedImperativeAggregate that buffers an
    OpenHashMap of every distinct value per partial buffer; on a
    600k-distinct double column this is a multi-second GC bomb whose heap
    pressure degrades the whole session afterwards (measured: 10-60s for the
    agg, then 10-30x slowdowns on unrelated follow-up queries). It is also
    the wrong shape at 100 TB — all values funnel into one final buffer.

    See ``exact_quantiles_multi`` for the algorithm. ``n_ranges`` is kept
    for API compatibility with the earlier range-partition implementation
    and is ignored.
    """
    return exact_quantiles_multi(df, [col], probs, n_ranges)[col]


def exact_quantiles_multi(
    df: DataFrame,
    columns: list[str],
    probs: list[float],
    n_ranges: int = 16,
    return_stats: bool = False,
    bins: int = 1024,
    collect_limit: int = 65536,
    max_depth: int = 6,
):
    """Exact quantiles for SEVERAL columns by iterative histogram
    refinement — never shuffles or caches the data rows.

    1. ONE whole-stage-codegen wide aggregate computes count / sum / sum² /
       min / max for every column (no melt, no shuffle).
    2. Target ranks ``floor/ceil((n-1)·p)`` are bracketed by histogram
       passes: the columns are melted with ``stack`` (a projection, not a
       shuffle), each active bracket buckets its value range into ``bins``
       uniform cells, and ``groupBy(bracket, bucket).count()`` — map-side
       combined, ≤ brackets·bins result rows — tells the driver which cell
       each rank falls in. A cell with more than ``collect_limit`` rows
       becomes the next round's bracket (depth ≤ ``max_depth``; each round
       divides the bracket population by up to ``bins``, so even 10^12-row
       columns resolve in 2-3 rounds).
    3. A final pass collects ``(value, count)`` for the surviving bracket
       cells only and reads the exact rank values off the sorted runs.

    Bucket membership is re-derived from the same deterministic value
    expression in every pass, so no persist() is needed for cross-job
    consistency (unlike range-partitioning, whose sampled boundaries are
    per-execution). NaNs are excluded (count, mean, quantiles) — matching
    SQL ``quantile_cont`` semantics.

    With ``return_stats=True`` also returns per-column
    ``(n, mean, stddev, min, max)`` assembled from step 1's moments —
    ``describe``-style stats then cost zero extra scans. Returns
    ``quantiles`` or ``(quantiles, stats)``. ``n_ranges`` is accepted for
    API compatibility and ignored.
    """
    aggs = []
    for c in columns:
        vc = F.col(c).cast("double")
        vc = F.when(~F.isnan(vc), vc)
        aggs.extend(
            [
                F.count(vc).alias(f"{c}__n"),
                F.sum(vc).alias(f"{c}__s"),
                F.sum(vc * vc).alias(f"{c}__s2"),
                F.min(vc).alias(f"{c}__mn"),
                F.max(vc).alias(f"{c}__mx"),
            ]
        )
    wide = df.agg(*aggs).collect()[0]
    totals = {c: wide[f"{c}__n"] for c in columns}
    moments = {
        c: (wide[f"{c}__s"], wide[f"{c}__s2"], wide[f"{c}__mn"], wide[f"{c}__mx"])
        for c in columns
    }

    resolved: dict[str, dict[int, float]] = {c: {} for c in columns}
    pending: list[dict] = []
    for c in columns:
        n = totals[c]
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            r = (n - 1) * p
            ranks.add(math.floor(r))
            ranks.add(math.ceil(r))
        mn, mx = moments[c][2], moments[c][3]
        if mn == mx:
            for r in ranks:
                resolved[c][r] = mn
            continue
        pending.append(
            {
                "key": c,
                "cond": F.col("name") == c,
                "lo": mn,
                "hi": mx,
                "below": 0,
                "count": n,
                "ranks": ranks,
            }
        )

    stack_expr = ", ".join(f"'{c}', cast(`{c}` as double)" for c in columns)
    melted = df.selectExpr(
        f"stack({len(columns)}, {stack_expr}) as (name, v)"
    ).where(F.col("v").isNotNull() & ~F.isnan("v"))

    resolved.update(
        _refine_ranks(melted, pending, bins, collect_limit, max_depth)
    )

    def assemble_stats() -> dict[str, tuple]:
        stats: dict[str, tuple] = {}
        for c in columns:
            n = totals[c]
            if n == 0:
                stats[c] = (0, None, None, None, None)
                continue
            s, s2, mn, mx = moments[c]
            mean = s / n
            # sample stddev from raw moments; the tiny catastrophic-
            # cancellation risk is irrelevant at the 4dp describe rounds
            var = max((s2 - s * s / n) / (n - 1), 0.0) if n > 1 else None
            stats[c] = (n, mean, math.sqrt(var) if var is not None else None, mn, mx)
        return stats

    out: dict[str, list[float]] = {c: [None] * len(probs) for c in columns}
    for c in columns:
        n = totals[c]
        if n == 0:
            continue
        res = []
        for p in probs:
            r = (n - 1) * p
            lo, hi = math.floor(r), math.ceil(r)
            g = r - lo
            vlo, vhi = resolved[c][lo], resolved[c][hi]
            res.append(vlo + (vhi - vlo) * g)
        out[c] = res
    return (out, assemble_stats()) if return_stats else out


def describe_plus(df: DataFrame, columns: list[str]) -> DataFrame:
    """A5/A6: count / mean / stddev / min / max / exact quartiles per column,
    one aggregate job for all columns (vs ``df.describe()`` + a separate
    pandas quantile pass in the reference, ``Scripts/eda.py:58,77-81``).

    Output: one row per column — (column, n, mean, stddev, min, q1, median,
    q3, max). Uses exact ``percentile``; swap to ``percentile_approx`` when
    the column cardinality is huge.
    """
    # ONE melted scan serves everything: the rank-selection quantile pass
    # (see exact_quantiles — the builtin percentile() aggregate is a
    # session-degrading GC bomb on high-cardinality columns and a
    # single-buffer funnel at scale) already aggregates per range slice, so
    # count/mean/stddev/min/max ride along as extra moments in that same
    # aggregate — no separate wide-stats job, no second table scan.
    quartiles, stats = exact_quantiles_multi(
        df, columns, [0.25, 0.5, 0.75], return_stats=True
    )
    rows = []
    for c in columns:
        q1, median, q3 = quartiles[c]
        n, mean, stddev, mn, mx = stats[c]
        rows.append((c, n, mean, stddev, mn, q1, median, q3, mx))
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


def group_quartiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 1024,
    collect_limit: int = 65536,
    max_depth: int = 6,
) -> DataFrame:
    """A9: per-group five-number summary (the stats behind the reference's
    seaborn boxplots, ``Scripts/eda.py:103-146``), exact interpolated
    quartiles via the shared histogram-refinement engine.

    The earlier form used the builtin ``percentile`` aggregate — per-GROUP
    buffers of every distinct value, i.e. the same GC bomb as the global
    case whenever one group is large (and at 100 TB some group always is).
    Here per-group memory is bounded by ``bins`` histogram cells per
    refinement round regardless of group size. Driver state is one
    (count, min, max) row per GROUP, so this operator's contract is
    bounded group cardinality (boxplot/EDA scale — thousands, not
    millions, of groups); value rows per group are unbounded.
    """
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    meta_rows = (
        df.groupBy(group_col)
        .agg(
            F.count(v).alias("n"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )
        .collect()
    )
    melted = df.select(
        F.col(group_col).alias("name"), v.alias("v")
    ).where(F.col("v").isNotNull())

    probs = [0.25, 0.5, 0.75]
    pending: list[dict] = []
    resolved: dict = {}
    metas: list[tuple] = []
    for r in meta_rows:
        g, n, mn, mx = r[0], r["n"], r["mn"], r["mx"]
        metas.append((g, n, mn, mx))
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            rk = (n - 1) * p
            ranks.add(math.floor(rk))
            ranks.add(math.ceil(rk))
        if mn == mx:
            resolved[g] = {rk: mn for rk in ranks}
            continue
        cond = F.col("name").isNull() if g is None else F.col("name") == F.lit(g)
        pending.append(
            {"key": g, "cond": cond, "lo": mn, "hi": mx, "below": 0, "count": n, "ranks": ranks}
        )
    resolved.update(_refine_ranks(melted, pending, bins, collect_limit, max_depth))

    out_rows = []
    for g, n, mn, mx in metas:
        if n == 0:
            out_rows.append((g, None, None, None, None, None))
            continue
        qs = []
        for p in probs:
            rk = (n - 1) * p
            lo, hi = math.floor(rk), math.ceil(rk)
            frac = rk - lo
            vlo, vhi = resolved[g][lo], resolved[g][hi]
            qs.append(vlo + (vhi - vlo) * frac)
        out_rows.append((g, mn, qs[0], qs[1], qs[2], mx))
    gtype = df.schema[group_col].dataType
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [StructField(group_col, gtype, True)]
        + [StructField(c, DoubleType(), True) for c in ("min", "q1", "median", "q3", "max")]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


def outlier_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """A6/P10: IQR outlier fence (reference computes it on the pandas sample,
    ``Scripts/eda.py:77-84``). Returns (lo, hi); filter Spark-side with
    ``df.where((c < lo) | (c > hi))``."""
    q1, q3 = exact_quantiles(df, col, [0.25, 0.75])
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr
