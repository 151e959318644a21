"""Continuous retrieval-index statistics: the BM25 (df, N, total_tokens)
table maintained live as document batches stream in.

`operators/text.py::merge_term_stats` makes each refresh batch-sized; the
streaming problem is exactly-once application under replays. Per-operator
streaming state can't hold an unbounded vocabulary anyway, so the state
IS the stats parquet — committed as monotone versions ``v{batch_id}``
(a parquet dir with its ``_SUCCESS`` marker), which makes replay
idempotence structural: a re-delivered batch sees its own (or a newer)
version already committed and skips, so a batch can never be folded in
twice. There is deliberately only ONE write per batch — no side table of
ingested ids whose commit could tear away from the stats commit.

Contract: the input stream delivers each doc id at most once across
batches (the corpus ingest's survivor stream guarantees this); ids
duplicated WITHIN a batch are collapsed here.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame


STATS_SCHEMA = "term string, dfreq bigint, n_docs bigint, total_tokens bigint"


def stats_versions(stats_dir: str) -> list[int]:
    """Committed stats versions (``v{batch_id}`` dirs with a _SUCCESS
    marker), ascending."""
    if not os.path.isdir(stats_dir):
        return []
    out = []
    for d in os.listdir(stats_dir):
        m = re.fullmatch(r"v(\d+)", d)
        if m and os.path.exists(os.path.join(stats_dir, d, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def load_term_stats(spark, stats_dir: str) -> DataFrame:
    """The latest committed stats table (empty frame if none)."""
    vs = stats_versions(stats_dir)
    if not vs:
        return spark.createDataFrame([], STATS_SCHEMA)
    return spark.read.parquet(os.path.join(stats_dir, f"v{vs[-1]}"))


def versioned_fold_ingest(
    stream: DataFrame,
    state_dir: str,
    fold,
    state_schema: str,
    checkpoint_dir: str | None = None,
    keep_versions: int = 3,
):
    """The generic versioned-commit fold: per micro-batch, skip if a
    version >= this ``batch_id`` is already committed (replay / restart
    after a torn checkpoint), else commit ``fold(standing, batch)`` as
    ``v{batch_id}`` and prune versions older than the newest
    ``keep_versions``. ``fold`` receives the latest committed state (an
    empty ``state_schema`` frame on bootstrap) and the raw micro-batch;
    it must be ADDITIVE-merge semantics — fold(fold(s, a), b) ==
    fold(s, a ∪ b) for disjoint batches — which is exactly what makes
    the single-write version guard an exactly-once mechanism.

    Returns the ``StreamingQuery``.
    """
    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        vs = stats_versions(state_dir)
        if vs and vs[-1] >= batch_id:
            return  # already applied (replayed batch) — idempotent skip
        if vs:
            standing = spark.read.parquet(
                os.path.join(state_dir, f"v{vs[-1]}")
            )
        else:
            standing = spark.createDataFrame([], state_schema)
        fold(standing, batch).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        stale = stats_versions(state_dir)[:-keep_versions]
        for v in stale:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def streaming_term_stats_ingest(
    stream: DataFrame,
    stats_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    keep_versions: int = 3,
):
    """Fold each micro-batch into the standing BM25 stats (see module
    docstring). Cost per batch: one batch-sized tokenize + one
    |vocab|-row full-outer merge + one bounded-table write — never a
    corpus scan. Returns the ``StreamingQuery``."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.text import (
        merge_term_stats,
    )

    def fold(standing: DataFrame, batch: DataFrame) -> DataFrame:
        fresh = batch.select(id_col, text_col).dropDuplicates([id_col])
        return merge_term_stats(standing, fresh, id_col, text_col)

    return versioned_fold_ingest(
        stream, stats_dir, fold, STATS_SCHEMA, checkpoint_dir, keep_versions
    )


def streaming_cms_ingest(
    stream: DataFrame,
    sketch_dir: str,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    checkpoint_dir: str | None = None,
    keep_versions: int = 3,
):
    """Live Count-Min frequency state: each micro-batch's
    `count_min_table` merges into the standing sketch by CELLWISE SUM
    (the documented CMS rebuild property) under the versioned-commit
    guard — bounded d*w state no matter how many keys stream past, the
    heavy-hitter memory a 100 TB event stream can actually afford.
    Unlike the doc-keyed folds, duplicate EVENTS are the signal here, so
    nothing is deduped; exactly-once application of each batch is the
    version guard's job. Read with `operators.sketches.count_min_lookup`
    against the latest version."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        count_min_table,
    )
    from pyspark.sql import functions as F

    def fold(standing: DataFrame, batch: DataFrame) -> DataFrame:
        fresh = count_min_table(batch, key_col, w=w, d=d)
        return (
            standing.unionByName(fresh)
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )

    return versioned_fold_ingest(
        stream,
        sketch_dir,
        fold,
        "row int, col bigint, cnt bigint",
        checkpoint_dir,
        keep_versions,
    )


def streaming_hll_ingest(
    stream: DataFrame,
    sketch_dir: str,
    key_col: str,
    p: int = 12,
    checkpoint_dir: str | None = None,
    keep_versions: int = 3,
):
    """Live distinct-count state: each micro-batch's `hll_registers`
    merges into the standing registers by per-bucket MAX (max-merge of
    disjoint batches == the union's sketch) under the versioned-commit
    guard — 2^p rows of state for an unbounded key stream. Read the
    estimate with `operators.sketches.hll_estimate` on the latest
    version."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        hll_registers,
    )
    from pyspark.sql import functions as F

    def fold(standing: DataFrame, batch: DataFrame) -> DataFrame:
        return (
            standing.unionByName(hll_registers(batch, key_col, p))
            .groupBy("bucket")
            .agg(F.max("r").alias("r"))
        )

    return versioned_fold_ingest(
        stream,
        sketch_dir,
        fold,
        "bucket bigint, r int",
        checkpoint_dir,
        keep_versions,
    )
