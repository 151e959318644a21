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
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


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
        # Arrow toPandas, not collect(): these results can run to tens of
        # thousands of rows and Row-object materialization was measured at
        # ~30k rows/s vs ~ms for an Arrow batch
        hist_rows = (
            melted.select(sel_bid.alias("bid"), sel_bucket.alias("bucket"))
            .where(F.col("bid").isNotNull())
            .groupBy("bid", "bucket")
            .count()
            .toPandas()
        )
        counts: dict[int, dict[int, int]] = {}
        for bid, bucket, cnt in hist_rows.itertuples(index=False):
            counts.setdefault(int(bid), {})[int(bucket)] = int(cnt)
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
            .toPandas()
        )
        groups: dict[int, list[tuple[float, int]]] = {}
        for fid, v, cnt in val_rows.itertuples(index=False):
            groups.setdefault(int(fid), []).append((float(v), int(cnt)))
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


def _log_bucket(v, sub_buckets: int):
    """Data-independent, deterministic magnitude bucketing of a double:
    (sign, binary exponent, ``sub_buckets`` mantissa slices) → one integer
    code. Pure codegen arithmetic (abs/log2/pow/floor), no data-dependent
    bounds, so a histogram over it needs NO prior min/max pass.

    Near powers of two a faithfully-rounded ``log2`` can land the exponent
    one off; the clamps below keep the code well-defined there, and
    ``_grouped_quantile_scan`` never assumes code order matches value
    order — cells are re-ordered and merged by their EXACT per-cell
    (min, max) spans, so a boundary slip costs at most a merged cell,
    never a wrong answer. ±inf saturates the mantissa clamp; 0 is its own
    bucket; NaN/null in → null out (callers exclude them from counts).
    """
    av = F.abs(v)
    e = F.floor(F.least(F.greatest(F.log2(av), F.lit(-1100.0)), F.lit(1099.0)))
    m = av / F.pow(F.lit(2.0), e)
    sub = F.floor(
        F.least(
            F.greatest((m - F.lit(1.0)) * sub_buckets, F.lit(0.0)),
            F.lit(float(sub_buckets - 1)),
        )
    )
    code = e * sub_buckets + sub + F.lit(1101 * sub_buckets)
    return F.when(v == 0, F.lit(0)).otherwise(
        (F.signum(v) * code).cast("long")
    )


def _grouped_quantile_scan(
    melted: DataFrame,
    bins: int,
    collect_limit: int,
    max_depth: int,
    sub_buckets: int = 16,
) -> tuple[dict, dict]:
    """ONE whole-stage-codegen hash aggregate over
    ``(name, _log_bucket(v))`` yields, per key, exact moments (count / sum
    / sum² / min / max folded from the cells on the driver) AND a
    histogram whose cells carry their exact value spans — so the
    moments pass and the first histogram pass of the old design collapse
    into a single job, and the common case (every rank cell under
    ``collect_limit``) finishes in ONE more job (``_refine_ranks``' final
    collect). Cells with min == max (duplicate spikes) resolve with no
    second job at all.

    Driver state is one row per (key, active bucket) — ≤ ~2k buckets per
    key for doubles spanning a typical data range (the bucketing is
    log-spaced: exponents × ``sub_buckets``), so the caller's contract is
    bounded key cardinality, value rows unbounded. Returns
    ``(stats, resolve)`` where ``stats[key] = (n, sum, sum2, min, max)``
    and ``resolve(ranks_by_key)`` resolves the requested 0-based global
    ranks (keys are the melted frame's ``name`` values).
    """
    # the bucket code feeds ONLY this one aggregate: the refinement/final
    # pass re-selects bracket rows on the UN-bucketed melted frame by
    # name + exact value span (resolve() below), so the code is never
    # recomputed downstream — and keeping the span predicates off the
    # computed column avoids Catalyst's project-collapse inlining the
    # log2/pow chain into every bracket branch (measured ~10x the cost
    # of the plain value comparisons)
    bucketed = melted.select(
        "name", F.col("v"), _log_bucket(F.col("v"), sub_buckets).alias("b")
    )
    cell_df = bucketed.groupBy("name", "b").agg(
        F.count("v").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    # toArrow, not collect(): group_quartiles can produce (groups x active
    # cells) result rows, and Row materialization runs ~30k rows/s.
    # toArrow (not toPandas) because pandas floats nullable int columns —
    # group KEYS must come back type-exact. Arrow may be unavailable for
    # exotic key types; Rows and to_pylist dicts share the r["col"] access
    # pattern, so the fallback is drop-in.
    try:
        rows = cell_df.toArrow().to_pylist()
    except Exception:
        rows = cell_df.collect()
    cells: dict = {}
    stats: dict = {}
    for r in rows:
        k = r["name"]
        zn, zs, zs2, zmn, zmx = stats.get(k, (0, 0.0, 0.0, None, None))
        if r["n"]:
            zn += r["n"]
            zs += r["s"]
            zs2 += r["s2"]
            zmn = r["mn"] if zmn is None else min(zmn, r["mn"])
            zmx = r["mx"] if zmx is None else max(zmx, r["mx"])
            cells.setdefault(k, []).append((r["b"], r["n"], r["mn"], r["mx"]))
        stats[k] = (zn, zs, zs2, zmn, zmx)

    def resolve(ranks_by_key: dict) -> dict:
        resolved: dict = {k: {} for k in ranks_by_key}
        pending: list[dict] = []
        for k, ranks in ranks_by_key.items():
            kranks = sorted(ranks)
            ki = 0
            # order and merge cells by their EXACT value spans (code order
            # is only approximate near power-of-two boundaries)
            merged: list[list] = []  # [n, mn, mx]
            for _code, n, mn, mx in sorted(
                cells.get(k, []), key=lambda c: (c[2], c[3])
            ):
                if merged and mn <= merged[-1][2]:
                    merged[-1][0] += n
                    merged[-1][2] = max(merged[-1][2], mx)
                else:
                    merged.append([n, mn, mx])
            cum = 0
            for n, mn, mx in merged:
                take: set[int] = set()
                while ki < len(kranks) and cum <= kranks[ki] < cum + n:
                    take.add(kranks[ki])
                    ki += 1
                if take:
                    if mn == mx:
                        for rk in take:
                            resolved[k][rk] = mn
                    else:
                        # membership by VALUE SPAN, not bucket codes: after
                        # merging, no other cell's span overlaps [mn, mx],
                        # so `name matches AND v between mn and mx` selects
                        # exactly this group's rows
                        pending.append(
                            {
                                "key": k,
                                "lo": mn,
                                "hi": mx,
                                "below": cum,
                                "count": n,
                                "ranks": take,
                            }
                        )
                cum += n
            if ki != len(kranks):
                raise RuntimeError(
                    f"bucket scan lost ranks for {k}: {kranks[ki:]} (n={cum})"
                )

        # membership predicates are plain comparisons — a broadcast-join
        # lookup-table form (plan-stable, codegen-cached) was built and
        # measured too: the broadcast build job cost more than the ~0.4 s
        # of literal-when-chain recompilation it saved
        for b in pending:
            b["cond"] = (
                (
                    F.col("name").isNull()
                    if b["key"] is None
                    else F.col("name") == F.lit(b["key"])
                )
                & (F.col("v") >= F.lit(float(b["lo"])))
                & (F.col("v") <= F.lit(float(b["hi"])))
            )
        for k, d in _refine_ranks(
            melted, pending, bins, collect_limit, max_depth
        ).items():
            resolved[k].update(d)
        return resolved

    return stats, resolve


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
    sub_buckets: int = 16,
):
    """Exact quantiles for SEVERAL columns, never shuffling or caching the
    data rows — typically TWO jobs total regardless of column count.

    1. The columns are melted with ``stack`` (a projection, not a shuffle)
       and ONE whole-stage-codegen hash aggregate over
       ``(column, _log_bucket(v))`` computes count / sum / sum² / min /
       max per magnitude cell. The driver folds the cells into exact
       per-column moments AND already knows which cell every target rank
       ``floor/ceil((n-1)·p)`` falls in — the separate moments pass and
       first histogram pass of the earlier design were fused away (a
       ``percentile_approx`` rider was measured first and REJECTED: the
       ObjectHashAggregate it forces evicts the moments from codegen and
       costs more than the job it saves).
    2. Rank cells with min == max (duplicate spikes) resolve immediately.
       The rest go to ``_refine_ranks`` with their exact (min, max) spans:
       a final ``(value, count)`` collect when the cell holds ≤
       ``collect_limit`` rows (the common case — log-bucketing keeps cells
       ~n/(active buckets)), else uniform ``bins``-way subdivision rounds
       (each round divides the population by up to ``bins``, so even
       10^12-row columns resolve in 2-3 extra rounds).

    Bucket membership is re-derived from the same deterministic value
    expression in every pass, so no persist() is needed for cross-job
    consistency. NaNs are excluded (count, mean, quantiles) — matching
    SQL ``quantile_cont`` semantics.

    With ``return_stats=True`` also returns per-column
    ``(n, mean, stddev, min, max)`` assembled from step 1's moments —
    ``describe``-style stats then cost zero extra scans. Returns
    ``quantiles`` or ``(quantiles, stats)``. ``n_ranges`` is accepted for
    API compatibility and ignored.
    """
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as double)" for c in columns)
    melted = df.selectExpr(
        f"stack({len(columns)}, {stack_expr}) as (name, raw)"
    ).select("name", F.when(~F.isnan("raw"), F.col("raw")).alias("v"))

    cell_stats, resolve = _grouped_quantile_scan(
        melted, bins, collect_limit, max_depth, sub_buckets
    )
    totals = {c: cell_stats.get(c, (0,))[0] for c in columns}

    resolved: dict[str, dict[int, float]] = {c: {} for c in columns}
    ranks_by_key: dict = {}
    for c in columns:
        n = totals[c]
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            r = (n - 1) * p
            ranks.add(math.floor(r))
            ranks.add(math.ceil(r))
        ranks_by_key[c] = ranks
    for k, d in resolve(ranks_by_key).items():
        resolved[k].update(d)

    def assemble_stats() -> dict[str, tuple]:
        stats: dict[str, tuple] = {}
        for c in columns:
            n = totals[c]
            if n == 0:
                stats[c] = (0, None, None, None, None)
                continue
            _, s, s2, mn, mx = cell_stats[c]
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
    sub_buckets: int = 16,
) -> DataFrame:
    """A9: per-group five-number summary (the stats behind the reference's
    seaborn boxplots, ``Scripts/eda.py:103-146``), exact interpolated
    quartiles via the shared log-bucket scan + refinement engine
    (``_grouped_quantile_scan`` — see ``exact_quantiles_multi``): ONE
    codegen hash aggregate replaces the old separate per-group meta job
    and first histogram pass, so the common case is two jobs total.

    The earliest form used the builtin ``percentile`` aggregate — per-GROUP
    buffers of every distinct value, i.e. a GC bomb whenever one group is
    large (and at 100 TB some group always is). Here per-group executor
    memory is bounded by the log-bucket cell count (exponents ×
    ``sub_buckets``) and, in refinement rounds, ``bins`` cells. Driver
    state is one row per (group, active magnitude cell), so this
    operator's contract is bounded group cardinality (boxplot/EDA scale —
    thousands, not millions, of groups); value rows per group are
    unbounded. Null values keep their group visible (n=0 cells), so empty
    groups still emit a null row.
    """
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    melted = df.select(F.col(group_col).alias("name"), v.alias("v"))

    probs = [0.25, 0.5, 0.75]
    cell_stats, resolve = _grouped_quantile_scan(
        melted, bins, collect_limit, max_depth, sub_buckets
    )
    ranks_by_key: dict = {}
    metas: list[tuple] = []
    for g, (n, _, _, mn, mx) in cell_stats.items():
        metas.append((g, n, mn, mx))
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            rk = (n - 1) * p
            ranks.add(math.floor(rk))
            ranks.add(math.ceil(rk))
        ranks_by_key[g] = ranks
    resolved = resolve(ranks_by_key)

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
    schema = StructType(
        [StructField(group_col, gtype, True)]
        + [StructField(c, DoubleType(), True) for c in ("min", "q1", "median", "q3", "max")]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


def _group_medians(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int,
    collect_limit: int,
    max_depth: int,
) -> dict:
    """Exact per-group medians off ONE grouped log-bucket scan (the
    shared engine; same bounded-group contract as ``group_quartiles``).
    Groups with no non-null values are absent from the result."""
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    melted = df.select(F.col(group_col).alias("name"), v.alias("v"))
    cell_stats, resolve = _grouped_quantile_scan(
        melted, bins, collect_limit, max_depth
    )
    ranks_by_key: dict = {}
    for g, (n, _, _, _mn, _mx) in cell_stats.items():
        if n == 0:
            continue
        rk = (n - 1) * 0.5
        ranks_by_key[g] = {math.floor(rk), math.ceil(rk)}
    resolved = resolve(ranks_by_key)
    meds: dict = {}
    for g, (n, _, _, _mn, _mx) in cell_stats.items():
        if n == 0:
            continue
        rk = (n - 1) * 0.5
        lo, hi = math.floor(rk), math.ceil(rk)
        vlo, vhi = resolved[g][lo], resolved[g][hi]
        meds[g] = vlo + (vhi - vlo) * (rk - lo)
    return meds


def group_mad_outlier_bounds(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    bins: int = 1024,
    collect_limit: int = 65536,
    max_depth: int = 6,
) -> DataFrame:
    """PER-GROUP robust (median ± k·1.4826·MAD) outlier fences —
    ``mad_outlier_bounds`` keyed, the per-domain cleaning rule a mixed
    corpus actually needs (one global fence lets a long-document domain
    define "outlier" for a short-document one).

    Two grouped passes of the shared exact-quantile engine (per-group
    medians, then per-group medians of |x − med_g| with the median
    table broadcast into the deviation projection — the data rows never
    shuffle). Same bounded-group-cardinality contract as
    ``group_quartiles``. Returns ``(group, lo, hi, median, mad)`` as
    exact doubles; groups with no non-null values are absent (left-join
    to reattach them as nulls).
    """
    meds = _group_medians(df, group_col, value_col, bins, collect_limit, max_depth)
    gtype = df.schema[group_col].dataType
    if not meds:
        return df.sparkSession.createDataFrame(
            [],
            StructType(
                [StructField(group_col, gtype, True)]
                + [
                    StructField(c, DoubleType(), True)
                    for c in ("lo", "hi", "median", "mad")
                ]
            ),
        )
    med_tab = df.sparkSession.createDataFrame(
        [(g, float(m)) for g, m in meds.items()],
        StructType(
            [StructField("__g", gtype, True), StructField("__med", DoubleType(), False)]
        ),
    )
    dev = (
        df.join(
            F.broadcast(med_tab), df[group_col].eqNullSafe(med_tab["__g"])
        )
        .select(
            F.col("__g").alias(group_col),
            F.abs(F.col(value_col).cast("double") - F.col("__med")).alias(
                "__dev"
            ),
        )
    )
    mads = _group_medians(dev, group_col, "__dev", bins, collect_limit, max_depth)
    rows = []
    for g, med in meds.items():
        mad = mads[g]
        half = k * 1.4826 * mad
        rows.append((g, med - half, med + half, med, mad))
    return df.sparkSession.createDataFrame(
        rows,
        StructType(
            [StructField(group_col, gtype, True)]
            + [
                StructField(c, DoubleType(), True)
                for c in ("lo", "hi", "median", "mad")
            ]
        ),
    )


def quantile_cells(
    df: DataFrame, col: str, sub_buckets: int = 16
) -> DataFrame:
    """The log-bucket engine's cell table as a VALUE: one codegen hash
    aggregate over ``_log_bucket(v)`` → ``(b, n, s, s2, mn, mx)`` rows
    (≤ ~2k active cells for doubles spanning a typical range). The cell
    table is a MERGEABLE quantile/moments sketch: cells of two disjoint
    batches merge cellwise (sum n/s/s2, min mn, max mx), and the merge
    of batch cells equals the one-shot cells over the union — the
    streaming fold's state (see ``streaming/stats.py::
    streaming_quantile_ingest``). Read estimates with
    ``cells_quantile_estimate``; NaN/null values are excluded, exactly
    like ``exact_quantiles``."""
    v = F.col(col).cast("double")
    v = F.when(~F.isnan(v), v)
    return (
        df.select(v.alias("v"))
        .where(F.col("v").isNotNull())
        .select("v", _log_bucket(F.col("v"), sub_buckets).alias("b"))
        .groupBy("b")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )


def quantile_cells_by(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    sub_buckets: int = 16,
) -> DataFrame:
    """``quantile_cells`` KEYED: one codegen hash aggregate over
    ``(groups..., _log_bucket(v))`` → per-group mergeable quantile/
    moments state at groups × ≤~2k rows — per-segment latency
    quantiles for an unbounded value stream, the keyed complement of
    the global cell sketch exactly as ``hll_registers_by`` keys
    ``hll_registers``. Cells of disjoint batches merge per (group,
    cell) (sum n/s/s2, min mn, max mx) == the one-shot cells over the
    union; fold it live with ``streaming/stats.py::
    streaming_quantile_by_ingest`` and read per-group bounded-error
    estimates with ``cells_quantile_estimate_by``. NaN/null values are
    excluded; null group keys are a group like any other."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    _check_cell_group_names(groups, "quantile_cells_by")
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    return (
        df.select(*groups, v.alias("__v"))
        .where(F.col("__v").isNotNull())
        .select(
            *groups, "__v", _log_bucket(F.col("__v"), sub_buckets).alias("b")
        )
        .groupBy(*groups, "b")
        .agg(
            F.count("__v").alias("n"),
            F.sum("__v").alias("s"),
            F.sum(F.col("__v") * F.col("__v")).alias("s2"),
            F.min("__v").alias("mn"),
            F.max("__v").alias("mx"),
        )
    )


def _check_cell_group_names(groups: list[str], op: str) -> None:
    """The keyed cell tables' OUTPUT schema owns the cell column names —
    a group column sharing one is inherently ambiguous (the global
    operators had no group columns, so the names were safe there)."""
    reserved = {"b", "n", "s", "s2", "mn", "mx"} & set(groups)
    if reserved:
        raise ValueError(
            f"{op}: group column(s) {sorted(reserved)} collide with the "
            "cell-table schema (b, n, s, s2, mn, mx) — rename them before "
            "keying the sketch"
        )


def cells_quantile_estimate_by(
    cells: DataFrame,
    group_cols: list[str] | str,
    probs: list[float],
) -> DataFrame:
    """``cells_quantile_estimate`` DISTRIBUTED over unbounded group
    cardinality: per-group bounded-error quantiles read off a
    ``quantile_cells_by`` table (or any cellwise merge of them) with NO
    driver state — the global reader collects its ≤~2k cells; a
    per-segment table at millions of groups cannot.

    Same algorithm, window form: per group the cells sort by their
    exact value spans and overlapping spans merge into ISLANDS (a
    running max of span ends over the sort; an island starts where a
    span's mn exceeds it — identical to the driver reader's span-merge,
    so correctness never assumes bucket-code order matches value
    order), a cumulative count locates each target rank's island, and
    the estimate interpolates inside the island's exact (mn, mx) span.
    Fractional ranks interpolate FLOOR and CEIL ranks separately
    (bimodal-gap rule, same as the driver reader). One exchange on the
    group key; everything after reuses its partitioning.

    Output: ``(groups..., n, p<pct>, p<pct>_lo, p<pct>_hi, ...)`` with
    the per-answer guarantee ``p<pct>_lo <= true quantile_cont <=
    p<pct>_hi``; groups with no cells are absent (they had no values).
    """
    if not probs:
        raise ValueError("cells_quantile_estimate_by: probs must be non-empty")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    _check_cell_group_names(groups, "cells_quantile_estimate_by")
    names = [f"p{round(p * 100)}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"cells_quantile_estimate_by: probs {probs} collide after "
            f"percent naming ({names}); use more-separated probs"
        )
    w_ord = Window.partitionBy(*groups).orderBy("mn", "mx", "b")
    prev_end = F.max("mx").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = cells.select(
        *groups,
        "b",
        "n",
        "mn",
        "mx",
        F.when(prev_end.isNull() | (F.col("mn") > prev_end), 1)
        .otherwise(0)
        .alias("__new"),
    ).withColumn(
        "__island",
        F.sum("__new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = marked.groupBy(*groups, "__island").agg(
        F.sum("n").alias("__n"),
        F.min("mn").alias("__mn"),
        F.max("mx").alias("__mx"),
    )
    w2 = Window.partitionBy(*groups).orderBy("__mn")
    wp = Window.partitionBy(*groups)
    loc = islands.select(
        *groups,
        "__n",
        "__mn",
        "__mx",
        F.coalesce(
            F.sum("__n").over(w2.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__cum"),
        F.sum("__n").over(wp).alias("__tot"),
    )

    def pick(rank):
        """Per-island conditional (est, lo, hi) for one integer rank
        column; exactly one island satisfies the containment, so the
        group-level min() collapses to it."""
        contains = (F.col("__cum") <= rank) & (rank < F.col("__cum") + F.col("__n"))
        est = F.col("__mn") + (F.col("__mx") - F.col("__mn")) * (
            (rank - F.col("__cum")) / F.col("__n")
        )
        return (
            F.min(F.when(contains, est)),
            F.min(F.when(contains, F.col("__mn"))),
            F.min(F.when(contains, F.col("__mx"))),
        )

    aggs = [F.max("__tot").alias("n")]
    for i, p in enumerate(probs):
        rk = F.lit(float(p)) * (F.col("__tot") - 1)
        lo_r, hi_r = F.floor(rk), F.ceil(rk)
        for tag, r in (("lo", lo_r), ("hi", hi_r)):
            e, l, h = pick(r)
            aggs += [
                e.alias(f"__e_{tag}{i}"),
                l.alias(f"__l_{tag}{i}"),
                h.alias(f"__h_{tag}{i}"),
            ]
    agg = loc.groupBy(*groups).agg(*aggs)
    outs = []
    for i, (p, name) in enumerate(zip(probs, names)):
        rk = F.lit(float(p)) * (F.col("n") - 1)
        frac = rk - F.floor(rk)
        for part, col in (("", "__e"), ("_lo", "__l"), ("_hi", "__h")):
            a, b2 = F.col(f"{col}_lo{i}"), F.col(f"{col}_hi{i}")
            outs.append((a + (b2 - a) * frac).alias(f"{name}{part}"))
    return agg.select(*groups, F.col("n").cast("bigint").alias("n"), *outs)


def cells_quantile_estimate(
    cells: DataFrame, probs: list[float]
) -> list[tuple[float, float, float]]:
    """Bounded-error quantiles off a ``quantile_cells`` table (or any
    cellwise merge of them): for each prob, the rank's cell is located
    by cumulative count and the estimate interpolates inside the cell's
    exact (mn, mx) span — so every answer carries its own guarantee,
    ``lo <= true quantile <= hi``. A fractional rank interpolates the
    FLOOR and CEIL integer ranks separately (they can land in different
    cells — a bimodal gap between them would otherwise put the true
    ``quantile_cont`` value outside a single cell's span), and the
    bounds interpolate the two cells' spans with the same weights, so
    the guarantee holds for any distribution. Returns
    ``[(estimate, lo, hi), ...]``; empty state → all
    ``(None, None, None)``. Driver cost: one bounded collect (the cell
    table), never the values."""
    rows = [tuple(r) for r in cells.select("b", "n", "mn", "mx").collect()]
    merged: list[list] = []
    for _b, n, mn, mx in sorted(rows, key=lambda c: (c[2], c[3])):
        if merged and mn <= merged[-1][2]:
            merged[-1][0] += n
            merged[-1][2] = max(merged[-1][2], mx)
        else:
            merged.append([n, mn, mx])
    total = sum(m[0] for m in merged)

    def locate(rank: int) -> tuple[float, float, float]:
        """(estimate, lo, hi) for one INTEGER rank: its cell's span is
        the bound; the estimate places the rank uniformly inside."""
        cum = 0
        for n, mn, mx in merged:
            if cum <= rank < cum + n:
                frac_in = (rank - cum) / n
                return (mn + (mx - mn) * frac_in, mn, mx)
            cum += n
        n, mn, mx = merged[-1]
        return (mx, mn, mx)

    out: list[tuple] = []
    for p in probs:
        if total == 0:
            out.append((None, None, None))
            continue
        rk = (total - 1) * p
        lo_r, hi_r = math.floor(rk), math.ceil(rk)
        frac = rk - lo_r
        e1, l1, h1 = locate(lo_r)
        e2, l2, h2 = locate(hi_r)
        out.append(
            (
                e1 + (e2 - e1) * frac,
                l1 + (l2 - l1) * frac,
                h1 + (h2 - h1) * frac,
            )
        )
    return out


def _check_fence_alert_args(
    group_cols: list[str] | str,
    breach_num: int,
    breach_den: int,
    op: str,
) -> list[str]:
    """Shared fail-fast validation for the fence-alert family — also
    called by ``streaming/stats.py::streaming_fence_monitor_ingest`` at
    SETUP, so a bad group name or breach rate raises before the query
    starts instead of wrapped in a StreamingQueryException after the
    first batch's offsets are written. Returns the normalized group
    list. ``batch_version`` is reserved for the streaming monitor's
    history tag."""
    if breach_num < 0 or breach_den <= 0:
        raise ValueError(
            f"{op}: breach rate must have breach_num >= 0 "
            f"and breach_den > 0 (got {breach_num}/{breach_den})"
        )
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    _check_cell_group_names(groups, op)
    reserved = (
        {
            "n_baseline", "fence_lo", "fence_hi", "n_batch",
            "n_above_hi", "n_above_lo", "status", "batch_version", "__v",
        }
        | {f"__fg{i}" for i in range(len(groups))}
    ) & set(groups)
    if reserved:
        raise ValueError(
            f"{op}: group column(s) {sorted(reserved)} "
            "collide with the output schema — rename them first"
        )
    return groups


def quantile_fence_alerts(
    cells: DataFrame,
    batch: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    prob: float = 0.99,
    breach_num: int = 1,
    breach_den: int = 100,
) -> DataFrame:
    """The monitor composition over the streaming quantile state: classify
    a fresh batch's per-group values against the STANDING fence a folded
    ``quantile_cells_by`` table (``streaming/stats.py::
    streaming_quantile_by_ingest``'s state) defines — "alert when this
    hour's values breach the baseline p99" without ever re-scanning the
    baseline. The fence comes from ``cells_quantile_estimate_by``, whose
    per-answer guarantee (``fence_lo <= true quantile <= fence_hi``)
    makes the classification sound despite the bounded error:

      ``n_above_hi <= (count of batch values above the TRUE baseline
      quantile) <= n_above_lo``

    so ``status`` is ``'alert'`` only when even the DEFINITE breaches
    (``n_above_hi``) exceed the ``breach_num/breach_den`` rate,
    ``'clear'`` only when even the POSSIBLE breaches (``n_above_lo``)
    don't, and ``'margin'`` when the cell span straddles the decision
    (tighten with more ``sub_buckets`` at fold time). Batch groups with
    no folded baseline report ``'no_baseline'`` (fences null); baseline
    groups absent from the batch emit nothing (nothing to alert on).
    Null/NaN batch values are excluded, like the fold itself.

    Scale shape: the fence table is groups-sized (the estimator's single
    group-keyed exchange over the cell state); the batch joins it on the
    group key (null-safe — a null group is a group) and the rollup
    reuses the join's partitioning — ONE exchange over the batch, no
    driver state at any group cardinality. Rate decisions are integer
    cross-multiplications (``n*den > num*total``), never float division.
    """
    groups = _check_fence_alert_args(
        group_cols, breach_num, breach_den, "quantile_fence_alerts"
    )
    name = f"p{round(prob * 100)}"
    fences = cells_quantile_estimate_by(cells, groups, [prob]).select(
        *[F.col(g).alias(f"__fg{i}") for i, g in enumerate(groups)],
        F.col("n").alias("n_baseline"),
        F.col(f"{name}_lo").alias("fence_lo"),
        F.col(f"{name}_hi").alias("fence_hi"),
    )
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    b = batch.select(*groups, v.alias("__v")).where(F.col("__v").isNotNull())
    cond = None
    for i, g in enumerate(groups):
        c = F.col(g).eqNullSafe(F.col(f"__fg{i}"))
        cond = c if cond is None else (cond & c)
    j = b.join(fences, cond, "left")
    num, den = F.lit(breach_num), F.lit(breach_den)
    agg = j.groupBy(*groups).agg(
        F.first("n_baseline").alias("n_baseline"),
        F.first("fence_lo").alias("fence_lo"),
        F.first("fence_hi").alias("fence_hi"),
        F.count("__v").cast("bigint").alias("n_batch"),
        F.sum(F.when(F.col("__v") > F.col("fence_hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above_hi"),
        F.sum(F.when(F.col("__v") > F.col("fence_lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above_lo"),
    )
    status = (
        F.when(F.col("fence_lo").isNull(), F.lit("no_baseline"))
        .when(
            F.col("n_above_hi") * den > num * F.col("n_batch"), F.lit("alert")
        )
        .when(
            F.col("n_above_lo") * den <= num * F.col("n_batch"),
            F.lit("clear"),
        )
        .otherwise(F.lit("margin"))
    )
    return agg.select(
        *groups,
        "n_baseline",
        "fence_lo",
        "fence_hi",
        "n_batch",
        "n_above_hi",
        "n_above_lo",
        status.alias("status"),
    )


def group_median_highcard(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact per-group median for UNBOUNDED group cardinality — the
    complement of the log-bucket engine's shapes. ``group_quartiles`` /
    ``group_mad_outlier_bounds`` hold one driver row per (group, active
    cell), so their contract is thousands of groups; per-user / per-URL
    medians at 100 TB have millions, and the right plan flips: ONE
    shuffle on the group key + ONE within-partition sort, rank
    arithmetic over ``row_number`` (the two middle ranks average to
    ``quantile_cont(0.5)``), nothing buffered per group and no driver
    state at all. The group-keyed aggregate after the window reuses the
    window's hash partitioning, so the whole plan carries exactly one
    exchange (plan-audited).

    Returns ``(group, n, median)`` — ``n`` the non-null (non-NaN) value
    count; groups with no such values are absent. Null groups are a
    group like any other.
    """
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    base = df.select(F.col(group_col).alias("__g"), v.alias("__v")).where(
        F.col("__v").isNotNull()
    )
    w = Window.partitionBy("__g").orderBy("__v")
    wp = Window.partitionBy("__g")
    ranked = base.select(
        "__g",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wp).alias("__n"),
    )
    lo_rn = F.expr("(__n + 1) div 2")
    hi_rn = F.expr("__n div 2 + 1")
    mid = ranked.where((F.col("__rn") == lo_rn) | (F.col("__rn") == hi_rn))
    # interpolation form, NOT avg: (lo+hi)/2 overflows to inf on two
    # near-max doubles and can differ from quantile_cont's
    # lo + (hi-lo)*0.5 in the last ulp — both engines (and the
    # group_quantiles_highcard sibling) use the interpolation form
    return (
        mid.groupBy("__g")
        .agg(
            F.first("__n").alias("n"),
            F.min(F.when(F.col("__rn") == lo_rn, F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__rn") == hi_rn, F.col("__v"))).alias("__vhi"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n",
            (
                F.col("__vlo") + (F.col("__vhi") - F.col("__vlo")) * F.lit(0.5)
            ).alias("median"),
        )
    )


def group_quantiles_highcard(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float],
) -> DataFrame:
    """``group_median_highcard`` generalized: exact linear-interpolated
    quantiles (``quantile_cont`` semantics) at UNBOUNDED group
    cardinality, still ONE exchange + ONE shared sort. Every target's
    floor/ceil rank rows survive one filter, and a single conditional
    aggregate picks all of them per group (``min(when(rn == lo_i, v))``
    — at most 2·len(probs) surviving rows per group, so the aggregate
    is tiny); interpolation is a projection.

    Output: ``(group, n, p<percent>...)`` — e.g. ``probs=[0.25, 0.5]``
    → columns ``p25, p50``. Dyadic probs (quarters, eighths) are
    recommended for cross-engine oracle exactness of the rank
    arithmetic; groups with no non-null (non-NaN) values are absent.
    """
    if not probs:
        raise ValueError("group_quantiles_highcard: probs must be non-empty")
    names = [f"p{round(p * 100)}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"group_quantiles_highcard: probs {probs} collide after "
            f"percent naming ({names}); use more-separated probs"
        )
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    base = df.select(F.col(group_col).alias("__g"), v.alias("__v")).where(
        F.col("__v").isNotNull()
    )
    w = Window.partitionBy("__g").orderBy("__v")
    wp = Window.partitionBy("__g")
    ranked = base.select(
        "__g",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wp).alias("__n"),
    )
    rk = [F.lit(float(p)) * (F.col("__n") - 1) for p in probs]
    lo = [(F.floor(r) + 1).cast("long") for r in rk]
    hi = [(F.ceil(r) + 1).cast("long") for r in rk]
    keep = None
    for l, h in zip(lo, hi):
        cond = (F.col("__rn") == l) | (F.col("__rn") == h)
        keep = cond if keep is None else (keep | cond)
    aggs = [F.first("__n").alias("n")]
    for i, (l, h) in enumerate(zip(lo, hi)):
        aggs.append(F.min(F.when(F.col("__rn") == l, F.col("__v"))).alias(f"__lo{i}"))
        aggs.append(F.min(F.when(F.col("__rn") == h, F.col("__v"))).alias(f"__hi{i}"))
    agg = ranked.where(keep).groupBy("__g").agg(*aggs)
    outs = []
    for i, (p, name) in enumerate(zip(probs, names)):
        r = F.lit(float(p)) * (F.col("n") - 1)
        frac = r - F.floor(r)
        outs.append(
            (F.col(f"__lo{i}") + (F.col(f"__hi{i}") - F.col(f"__lo{i}")) * frac).alias(name)
        )
    return agg.select(F.col("__g").alias(group_col), "n", *outs)


def group_mad_outlier_bounds_highcard(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """``group_mad_outlier_bounds`` at UNBOUNDED group cardinality —
    the per-domain robust fence (median ± k·1.4826·MAD) when the
    domains are per-user/per-URL millions, where the log-bucket
    engine's one-driver-row-per-(group, cell) contract breaks.

    No joins and no driver state: STACKED windows over one group-keyed
    exchange. Window 1 (ordered by value) ranks rows; window 2 (same
    partitioning, unordered frame) resolves the two middle-rank values
    into a per-row group median — so the deviation ``|x − med_g|`` is a
    projection, not a broadcast join; window 3 (ordered by deviation)
    ranks deviations; the final group-keyed aggregate picks the MAD's
    middle ranks and reuses the windows' partitioning. Physical shape:
    ONE Exchange + TWO within-partition sorts (value, deviation),
    plan-audited. Median/MAD use the same two-middle-ranks
    interpolation as ``group_median_highcard`` (== ``quantile_cont``'s
    even-n form, overflow-safe).

    Returns ``(group, n, lo, hi, median, mad)`` — exact doubles;
    groups with no non-null (non-NaN) values are absent; null groups
    are a group like any other.
    """
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    base = df.select(F.col(group_col).alias("__g"), v.alias("__v")).where(
        F.col("__v").isNotNull()
    )
    w1 = Window.partitionBy("__g").orderBy("__v")
    wp = Window.partitionBy("__g")
    lo_rn = F.expr("(__n + 1) div 2")
    hi_rn = F.expr("__n div 2 + 1")
    ranked = base.select(
        "__g",
        "__v",
        F.row_number().over(w1).alias("__rn"),
        F.count("*").over(wp).alias("__n"),
    )
    with_med = ranked.select(
        "__g",
        "__v",
        "__n",
        F.min(F.when(F.col("__rn") == lo_rn, F.col("__v"))).over(wp).alias("__vlo"),
        F.min(F.when(F.col("__rn") == hi_rn, F.col("__v"))).over(wp).alias("__vhi"),
    ).select(
        "__g",
        "__n",
        (F.col("__vlo") + (F.col("__vhi") - F.col("__vlo")) * F.lit(0.5)).alias(
            "__med"
        ),
        "__v",
    )
    w2 = Window.partitionBy("__g").orderBy("__dev")
    devs = with_med.withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    ).select(
        "__g",
        "__n",
        "__med",
        "__dev",
        F.row_number().over(w2).alias("__rn2"),
    )
    scale = float(k) * 1.4826
    mad = F.col("__dlo") + (F.col("__dhi") - F.col("__dlo")) * F.lit(0.5)
    return (
        devs.groupBy("__g")
        .agg(
            F.first("__n").alias("n"),
            F.first("__med").alias("median"),
            F.min(F.when(F.col("__rn2") == lo_rn, F.col("__dev"))).alias("__dlo"),
            F.min(F.when(F.col("__rn2") == hi_rn, F.col("__dev"))).alias("__dhi"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n",
            (F.col("median") - F.lit(scale) * mad).alias("lo"),
            (F.col("median") + F.lit(scale) * mad).alias("hi"),
            "median",
            mad.alias("mad"),
        )
    )


def _require_values(col: str, op: str, qs: list) -> None:
    """Contract guard shared by the quantile-engine consumers: the engine
    returns ``None`` quantiles for an empty/all-null column, and every
    downstream formula would otherwise die on ``float(None)`` — raise the
    eager, named error instead."""
    if any(q is None for q in qs):
        raise ValueError(
            f"{op}: column '{col}' has no non-null (non-NaN) values — "
            "a quantile-based fence/binning is undefined on empty input"
        )


def outlier_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """A6/P10: IQR outlier fence (reference computes it on the pandas sample,
    ``Scripts/eda.py:77-84``). Returns (lo, hi); filter Spark-side with
    ``df.where((c < lo) | (c > hi))``."""
    qs = exact_quantiles(df, col, [0.25, 0.75])
    _require_values(col, "outlier_bounds", qs)
    q1, q3 = qs
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr


def mad_outlier_bounds(
    df: DataFrame, col: str, k: float = 3.0
) -> tuple[float, float, float, float]:
    """Robust (median ± k·1.4826·MAD) outlier fence — the IQR fence's
    (``outlier_bounds``) heavier-tailed sibling: MAD = median(|x −
    median|) resists up to 50% contamination where quartiles break at
    25%. 1.4826 rescales MAD to σ under normality, so ``k`` reads in
    sigma units.

    Two calls into the shared exact-quantile engine (4 driver rounds
    total, no value ever buffered): the median, then the median of the
    derived absolute deviations — the deviation column is a projection,
    so the second call scans once more but still never shuffles data
    rows. Returns ``(lo, hi, median, mad)``.
    """
    med = exact_quantiles(df, col, [0.5])[0]
    _require_values(col, "mad_outlier_bounds", [med])
    dev = df.select(
        F.abs(F.col(col).cast("double") - F.lit(float(med))).alias("__dev")
    )
    mad = exact_quantiles(dev, "__dev", [0.5])[0]
    half = k * 1.4826 * mad
    return med - half, med + half, med, mad


def quantile_bins(
    df: DataFrame, col: str, n_bins: int = 4, out_col: str = "bin"
) -> tuple[DataFrame, list[float]]:
    """Quantile discretization WITHOUT a global sort: exact interior
    quantile boundaries from the shared engine, then bin assignment is a
    pure comparison projection (``bin = 1 + Σ_i [v > bound_i]``,
    codegen, pushdown-friendly) — the scale-correct replacement for
    ``ntile``, whose single global sort is the one shape that cannot
    parallelize. Semantics are VALUE-based: ties share a bin (ntile
    splits equal values by row position — nondeterministic under
    parallel scan, so ntile on data columns is banned here anyway).

    Returns ``(df_with_bin, boundaries)`` where ``out_col`` (default
    ``bin``, 1-based) is APPENDED — a pre-existing column of that name is
    a caller error (silently overwriting a feature column corrupts it),
    so it raises."""
    if out_col in df.columns:
        raise ValueError(
            f"quantile_bins: output column '{out_col}' already exists in "
            f"the frame ({df.columns}); pass a different out_col"
        )
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = exact_quantiles(df, col, probs)
    _require_values(col, "quantile_bins", bounds)
    v = F.col(col).cast("double")
    v = F.when(~F.isnan(v), v)
    bin_expr = F.lit(1)
    for bnd in bounds:
        bin_expr = bin_expr + F.when(v > F.lit(float(bnd)), 1).otherwise(0)
    return (
        df.withColumn(out_col, F.when(v.isNotNull(), bin_expr)),
        bounds,
    )


def group_quantile_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 4,
    bins: int = 1024,
    collect_limit: int = 65536,
    max_depth: int = 6,
    out_col: str = "bin",
) -> DataFrame:
    """PER-GROUP quantile discretization (``quantile_bins`` within each
    group): exact per-group interior boundaries from the shared log-bucket
    scan, then assignment as a broadcast join on the group plus an array
    comparison (``bin = 1 + size(filter(bounds, b -> v > b))``) — no
    ntile, no per-group sort, one corpus scan for the boundaries and one
    for the assignment. The per-domain length-stratification recipe a
    curriculum mix runs at 100 TB.

    Same bounded-group-cardinality contract as ``group_quartiles``
    (driver state is one row per (group, active magnitude cell)). Rows
    with null/NaN values — and rows of groups with no non-null values —
    get a null ``out_col`` (default ``bin``; a pre-existing column of
    that name raises, matching ``quantile_bins``). Value ties share a
    bin (deterministic under parallel scan; see ``quantile_bins`` on why
    ntile is banned here).
    """
    if out_col in df.columns:
        raise ValueError(
            f"group_quantile_bins: output column '{out_col}' already "
            f"exists in the frame ({df.columns}); pass a different out_col"
        )
    v = F.col(value_col).cast("double")
    v = F.when(~F.isnan(v), v)
    melted = df.select(F.col(group_col).alias("name"), v.alias("v"))
    cell_stats, resolve = _grouped_quantile_scan(
        melted, bins, collect_limit, max_depth
    )
    probs = [i / n_bins for i in range(1, n_bins)]
    ranks_by_key: dict = {}
    for g, (n, _, _, _mn, _mx) in cell_stats.items():
        if n == 0:
            continue
        ranks: set[int] = set()
        for p in probs:
            rk = (n - 1) * p
            ranks.add(math.floor(rk))
            ranks.add(math.ceil(rk))
        ranks_by_key[g] = ranks
    resolved = resolve(ranks_by_key)

    gtype = df.schema[group_col].dataType
    btab_rows = []
    for g, (n, _, _, _mn, _mx) in cell_stats.items():
        if n == 0:
            continue
        bounds = []
        for p in probs:
            rk = (n - 1) * p
            lo, hi = math.floor(rk), math.ceil(rk)
            frac = rk - lo
            vlo, vhi = resolved[g][lo], resolved[g][hi]
            bounds.append(vlo + (vhi - vlo) * frac)
        btab_rows.append((g, bounds))
    btab = df.sparkSession.createDataFrame(
        btab_rows,
        StructType(
            [
                StructField("__g", gtype, True),
                StructField("__bounds", ArrayType(DoubleType(), False), False),
            ]
        ),
    )
    joined = df.join(
        F.broadcast(btab), df[group_col].eqNullSafe(btab["__g"]), "left"
    )
    vv = F.col(value_col).cast("double")
    vv = F.when(~F.isnan(vv), vv)
    bin_expr = F.lit(1) + F.size(
        F.filter(F.col("__bounds"), lambda b: vv > b)
    )
    return joined.select(
        *[df[c] for c in df.columns],
        F.when(
            vv.isNotNull() & F.col("__bounds").isNotNull(), bin_expr
        ).alias(out_col),
    )
