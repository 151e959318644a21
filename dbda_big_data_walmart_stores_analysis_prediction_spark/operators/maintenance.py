"""Dataset maintenance operators — the snapshot/refresh surface a
training-data pipeline needs around the analytics core (north-star; the
reference's only maintenance is full-overwrite parquet writes,
``Scripts/etl.py:123``).

Plain-files lakes (no Delta/Iceberg in this environment) can't do
transactional row-level MERGE; the scalable pattern is snapshot merge:
read current, combine with updates, write a new snapshot directory and
swap pointers. These operators build the combined frame; `sources/io`
writes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame, updates: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Upsert semantics: rows from ``updates`` win on key collision,
    unmatched ``current`` rows survive, new keys insert.

    Plan: one LEFT ANTI join of current against update keys (shuffle or
    broadcast by update size — Catalyst decides; typical refresh batches
    are small vs the snapshot, so this is usually a broadcast anti join
    that never shuffles the big side) + a union. Schemas must match by
    name (``unionByName``).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    survivors = current.join(
        updates.select(*key_list).distinct(), key_list, "left_anti"
    )
    return updates.unionByName(survivors)


def merge_upsert_partitioned(
    spark,
    snapshot_dir: str,
    updates: DataFrame,
    keys: list[str] | str,
    partition_col: str,
    max_touched_partitions: int = 4096,
) -> list:
    """``merge_upsert`` with partition-pruned IO — the 100 TB refresh
    shape: only the partitions the update batch touches are read, merged,
    and rewritten; every other partition's files are never opened and
    survive byte-identical. A full-snapshot rewrite per refresh (the
    plain ``merge_upsert`` + overwrite path, still the right default for
    small snapshots) is corpus-sized work for a batch-sized change.

    Contract: ``partition_col`` must be STABLE per key — a key never
    moves between partitions (the date/source-partitioned lake norm). A
    refresh that relocates keys would need its old partitions rewritten
    too; use the full-rewrite path for that. ``updates`` must carry
    ``partition_col`` and the full snapshot schema.

    Mechanics: the touched partition values (bounded driver list, capped
    at ``max_touched_partitions``) prune the snapshot scan STATICALLY
    (an ``isin`` on the partition column — visible as PartitionFilters
    in the plan); the merged slice is written COMPLETELY to a staging
    directory first (a sibling of the snapshot — the job never deletes a
    file it might still read), then each touched partition directory is
    swapped in with atomic renames (old dir aside → staging dir in →
    drop the old). Crash safety on plain files: a failure before any
    swap leaves the snapshot untouched (the leftover staging dir is
    overwritten by the next run); a failure mid-swap leaves every
    partition wholly old or wholly new — never torn files — with the
    not-yet-swapped merged slices still intact in staging for re-run.
    (The write-staging-then-swap discipline replaces the earlier
    in-place dynamic partition overwrite, whose mid-write crash left
    partially rewritten partitions with no recovery copy.) Returns the
    sorted touched partition values.
    """
    import os
    import shutil

    key_list = [keys] if isinstance(keys, str) else list(keys)
    if partition_col not in updates.columns:
        raise ValueError(
            f"merge_upsert_partitioned: updates are missing the partition "
            f"column '{partition_col}' (has {updates.columns})"
        )
    touched_rows = (
        updates.select(partition_col).distinct().limit(
            max_touched_partitions + 1
        ).collect()
    )
    if len(touched_rows) > max_touched_partitions:
        raise ValueError(
            "merge_upsert_partitioned: update batch touches more than "
            f"max_touched_partitions={max_touched_partitions} partitions — "
            "at that width a full rewrite is cheaper; use merge_upsert"
        )
    touched = [r[0] for r in touched_rows]
    if not touched:
        return []
    if any(v is None for v in touched):
        raise ValueError(
            "merge_upsert_partitioned: updates carry a NULL partition "
            f"value in '{partition_col}' — null partitions "
            "(__HIVE_DEFAULT_PARTITION__) are not safely overwritable; "
            "route null-partition rows through the full-rewrite path"
        )
    if "://" in snapshot_dir:
        raise ValueError(
            "merge_upsert_partitioned: the staging-swap commit uses local "
            f"filesystem renames; '{snapshot_dir}' has a URI scheme. For "
            "object stores / HDFS use the full-rewrite merge_upsert path "
            "or a table format with transactional partition overwrite."
        )
    staging = snapshot_dir.rstrip("/") + ".staging-merge"
    # crash repair BEFORE any read or overwrite: a previous run that died
    # mid-swap left some partition absent from the snapshot with its
    # copies in staging — restore the merged slice (preferred; sorted()
    # puts `<part>` before `<part>.old`) or the old dir, or the staging
    # overwrite below would destroy the only remaining copies and the
    # merge would then run against an empty slice, silently dropping the
    # partition's non-updated rows
    # old copies live under a NAMESPACE directory (staging/.merge-old/<d>),
    # never as a suffix on the partition dir name — a partition VALUE that
    # itself ends in '.old' must not be mistaken for a recovery copy of a
    # different partition
    if os.path.isdir(staging):
        for d in os.listdir(staging):  # merged slices first — preferred
            if d.startswith(f"{partition_col}=") and not os.path.isdir(
                os.path.join(snapshot_dir, d)
            ):
                os.rename(os.path.join(staging, d), os.path.join(snapshot_dir, d))
        old_ns = os.path.join(staging, ".merge-old")
        if os.path.isdir(old_ns):
            for d in os.listdir(old_ns):
                if d.startswith(f"{partition_col}=") and not os.path.isdir(
                    os.path.join(snapshot_dir, d)
                ):
                    os.rename(os.path.join(old_ns, d), os.path.join(snapshot_dir, d))
    current = spark.read.parquet(snapshot_dir)
    cur_touched = current.where(F.col(partition_col).isin(touched))
    merged = merge_upsert(cur_touched, updates.select(*current.columns), key_list)
    # stage the full merged slice BEFORE touching the snapshot — the
    # write reads the live partition files, which is safe because no
    # snapshot file moves until the staging write has fully committed
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    # swap each staged partition dir in with atomic renames; reuse the
    # writer's own directory names so partition-value path escaping
    # never needs reimplementing
    part_dirs = [
        d
        for d in os.listdir(staging)
        if d.startswith(f"{partition_col}=")
        and os.path.isdir(os.path.join(staging, d))
    ]
    old_ns = os.path.join(staging, ".merge-old")
    os.makedirs(old_ns, exist_ok=True)
    for d in part_dirs:
        dst = os.path.join(snapshot_dir, d)
        # the old dir moves INTO staging's .merge-old namespace (not
        # renamed in place) so a mid-swap crash never leaves a bogus
        # directory for snapshot readers to discover as a partition
        # value; worst case the partition is briefly absent with both
        # copies in staging, which the repair pass above restores
        if os.path.isdir(dst):
            os.rename(dst, os.path.join(old_ns, d))
        os.rename(os.path.join(staging, d), dst)
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(touched)


def delete_keys(
    current: DataFrame, tombstones: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Delete-by-key: anti join against the tombstone set — same
    broadcast-anti shape as ``merge_upsert``'s survivor side."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return current.join(
        tombstones.select(*key_list).distinct(), key_list, "left_anti"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str = "doc_id",
    content_cols: list[str] | str | None = None,
) -> DataFrame:
    """Content diff between two corpus snapshots — the audit step an
    incremental pipeline runs after every refresh (what did this crawl
    delivery actually change?) and the input to incremental downstream
    work (re-embed / re-tokenize only ``changed`` + ``added``).

    Returns one row per key present in EITHER snapshot:
    ``(*keys, status)`` with ``status`` in ``added`` (key only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (both, content
    fingerprint differs), ``unchanged``. Content identity is a hash of
    PER-COLUMN fixed-width digests — EXACT bytes after the string cast
    (deliberately not the dedup family's normalized hash: a
    whitespace-only edit IS a change to a snapshot auditor) and
    injective in the cell tuple (no delimiter-in-value or null-sentinel
    collisions across column boundaries). ``content_cols`` defaults to
    every non-key column shared by both frames; all-null contents
    compare null-safely (null == null is ``unchanged``, the ``<=>``
    rule).

    Scale shape: ONE co-partitioned shuffle — both sides hash-partition
    on the key for the full outer join, and the fingerprints are
    computed map-side before the exchange so the join carries
    ``(key, 16-byte hash)``, never the document bodies.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if content_cols is None:
        shared = [
            c for c in old.columns if c in set(new.columns) and c not in key_list
        ]
        if not shared:
            raise ValueError(
                "snapshot_diff: no shared non-key columns to fingerprint "
                f"(old has {old.columns}, new has {new.columns}); pass "
                "content_cols explicitly"
            )
        content_cols = shared
    elif isinstance(content_cols, str):
        content_cols = [content_cols]
    for side, frame in (("old", old), ("new", new)):
        missing = [c for c in [*key_list, *content_cols] if c not in frame.columns]
        if missing:
            raise ValueError(
                f"snapshot_diff: {side} snapshot is missing columns "
                f"{missing} (has {frame.columns})"
            )

    def fingered(df: DataFrame, tag: str) -> DataFrame:
        # Hash PER COLUMN, then hash the fixed-width digests: a raw
        # concat is ambiguous at the boundaries — a delimiter character
        # INSIDE a value would collide ('a\\x1fb','c') with ('a','b\\x1fc'),
        # and any null sentinel string could collide with a real value
        # equal to it. Fixed-width cells ('v'+32-hex digest, 'n' for
        # null) make the combined string injective in the cell tuple.
        # An all-null content row fingerprints as null and pairs
        # null-safely.
        cells = [
            F.when(
                F.col(c).isNotNull(),
                F.concat(F.lit("v"), F.md5(F.col(c).cast("string"))),
            ).otherwise(F.lit("n"))
            for c in content_cols
        ]
        has_any = (
            F.greatest(*[F.col(c).isNotNull() for c in content_cols])
            if len(content_cols) > 1
            else F.col(content_cols[0]).isNotNull()
        )
        return df.select(
            *key_list,
            F.when(has_any, F.md5(F.concat(*cells))).alias(f"__h_{tag}"),
            F.lit(True).alias(f"__in_{tag}"),
        )

    o = fingered(old, "old")
    n = fingered(new, "new")
    joined = o.join(n, key_list, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old").eqNullSafe(F.col("__h_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_list, status.alias("status"))


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the small-file compaction every long-lived lake table needs (a 100 TB
    table accreting 10k tiny files per refresh turns scans into metadata
    storms and starves scan parallelism).

    File count = ceil(total_bytes / target). Unpartitioned output uses
    ``repartition(n)`` (round-robin — even file sizes); partitioned output
    repartitions BY the partition columns so each output directory is
    written by the tasks owning that partition's rows, avoiding the
    classic one-file-per-task-per-partition explosion. Writes a NEW
    snapshot directory (plain-files lakes swap pointers, same contract as
    ``merge_upsert``). Returns the target file count.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        writer = (
            df.repartition(n, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n).write.mode("overwrite")
    writer.parquet(out_path)
    return n


def word_distribution_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    vocab_cap: int = 100_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus drift monitor: compare two snapshots' word distributions —
    the re-train/re-mix trigger a living corpus runs per refresh ("did
    this month's crawl change the language enough to care"). Emits ONE
    row: symmetric KL divergences, Jensen–Shannon divergence, and total
    variation distance between additive-smoothed unigram distributions
    over the union of both sides' `word_counts` heads (cap
    ``vocab_cap``, smoothing ``alpha`` — 0.5 = Jeffreys — so a word
    absent from one side contributes finitely).

    Everything is arithmetic over the joined ≤ 2·cap-row vocabulary
    frame: two `word_counts` heaps (the corpus-scale work, map-side
    combinable), one full-outer join on the word, two 1-row total
    aggregates broadcast back, and a final 1-row aggregate. Values are
    rounded to 6 dp; summation-order float drift lives ~1e-12 below
    that (terms are O(p·log p) over a bounded vocabulary), the same
    firewall every sketch estimate here uses.

    Output: ``(vocab_union, kl_ab, kl_ba, js_divergence, tvd)``; two
    empty corpora are identical by definition (all zeros)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.bpe import (
        word_counts,
    )

    wa = word_counts(a, text_col, vocab_cap).withColumnRenamed("n", "na")
    wb = word_counts(b, text_col, vocab_cap).withColumnRenamed("n", "nb")
    j = (
        wa.join(wb, "word", "full_outer")
        .select(
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    totals = j.agg(
        F.sum("na").cast("double").alias("ta"),
        F.sum("nb").cast("double").alias("tb"),
        F.count("*").cast("double").alias("v"),
    )
    al = F.lit(float(alpha))
    pa = (F.col("na") + al) / (F.col("ta") + al * F.col("v"))
    pb = (F.col("nb") + al) / (F.col("tb") + al * F.col("v"))
    m = (pa + pb) / F.lit(2.0)
    return (
        j.crossJoin(F.broadcast(totals))
        .agg(
            F.count("*").cast("bigint").alias("vocab_union"),
            # coalesce: two empty corpora join to zero rows, and the
            # drift of nothing against nothing is zero, not NULL
            F.round(
                F.coalesce(F.sum(pa * F.log(pa / pb)), F.lit(0.0)), 6
            ).alias("kl_ab"),
            F.round(
                F.coalesce(F.sum(pb * F.log(pb / pa)), F.lit(0.0)), 6
            ).alias("kl_ba"),
            F.round(
                F.coalesce(
                    (
                        F.sum(pa * F.log(pa / m))
                        + F.sum(pb * F.log(pb / m))
                    )
                    / F.lit(2.0),
                    F.lit(0.0),
                ),
                6,
            ).alias("js_divergence"),
            F.round(
                F.coalesce(F.sum(F.abs(pa - pb)) / F.lit(2.0), F.lit(0.0)),
                6,
            ).alias("tvd"),
        )
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    by_col: str = "label",
    vec_col: str = "embedding",
    dp: int = 6,
) -> DataFrame:
    """Per-group embedding-distribution drift between two snapshots —
    `word_distribution_drift`'s sibling for the vector axis, and the
    re-embed / re-fit trigger behind the serving index
    (`streaming_index_ingest` grows the index under a FROZEN cell model;
    this is the monitor that says when that stops being sound): for each
    ``by_col`` group, the cosine between the snapshots' mean vectors and
    the ratio of their norms. A direction swing (cos well below 1) means
    the group's content moved; a norm collapse (ratio toward 0) means it
    diffused.

    Output per group present in EITHER snapshot: ``(by, n_old, n_new,
    centroid_cos, norm_ratio)`` — counts are 0 (not null) for the absent
    side, and the two geometry columns are NULL when either side lacks a
    usable mean (absent group, all-null vectors, or a zero-norm mean:
    no direction to compare). Mean components round to ``dp`` before the
    cosine (the q111 avg-agreement precedent), so the report
    hash-checks cross-engine.

    Scale shape: one ``posexplode → groupBy(by, dim)`` average per
    snapshot (the q111 means stage — the only corpus-scale work, a hash
    aggregate with map-side combine), then joins and folds over
    ≤ groups × dim rows. No UDF, no window, no driver data path.
    """
    for df, name in ((old, "old"), (new, "new")):
        for c in (by_col, vec_col):
            if c not in df.columns:
                raise ValueError(
                    f"embedding_drift: {name} frame lacks column {c!r} "
                    f"(has {df.columns})"
                )

    def means(df, tag):
        return (
            df.where(F.col(vec_col).isNotNull())
            .select(F.col(by_col).alias("by"), F.posexplode(vec_col))
            .groupBy("by", "pos")
            .agg(F.round(F.avg("col"), dp).alias(f"m_{tag}"))
        )

    def counts(df, alias):
        return df.groupBy(F.col(by_col).alias("by")).agg(
            F.count("*").cast("bigint").alias(alias)
        )

    # every by-keyed join below is null-SAFE (the q144 tokenizer_ab_report
    # precedent): a NULL group present in both snapshots must pair with
    # itself — plain equi-joins would split it into (n_old, 0)/(0, n_new)
    # count rows and strand its computable geometry
    geom = (
        means(old, "a")
        .join(
            means(new, "b")
            .withColumnRenamed("by", "__by_b")
            .withColumnRenamed("pos", "__pos_b"),
            F.col("by").eqNullSafe(F.col("__by_b"))
            & (F.col("pos") == F.col("__pos_b")),
        )
        .groupBy("by")
        .agg(
            F.sum(F.col("m_a") * F.col("m_b")).alias("__ab"),
            F.sum(F.col("m_a") * F.col("m_a")).alias("__aa"),
            F.sum(F.col("m_b") * F.col("m_b")).alias("__bb"),
        )
        .select(
            "by",
            F.when(
                (F.col("__aa") > 0) & (F.col("__bb") > 0),
                F.round(
                    F.col("__ab")
                    / (F.sqrt(F.col("__aa")) * F.sqrt(F.col("__bb"))),
                    6,
                ),
            ).alias("centroid_cos"),
            F.when(
                F.col("__aa") > 0,
                F.round(F.sqrt(F.col("__bb")) / F.sqrt(F.col("__aa")), 6),
            ).alias("norm_ratio"),
        )
    )
    return (
        counts(old, "n_old")
        .join(
            counts(new, "n_new").withColumnRenamed("by", "__by_n"),
            F.col("by").eqNullSafe(F.col("__by_n")),
            "full_outer",
        )
        .select(
            F.coalesce("by", "__by_n").alias("by"), "n_old", "n_new"
        )
        .join(
            geom.withColumnRenamed("by", "__by_g"),
            F.col("by").eqNullSafe(F.col("__by_g")),
            "left",
        )
        .select(
            F.col("by").alias(by_col),
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "centroid_cos",
            "norm_ratio",
        )
    )
