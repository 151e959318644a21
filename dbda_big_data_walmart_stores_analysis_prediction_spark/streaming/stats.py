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


def streaming_term_stats_ingest(
    stream: DataFrame,
    stats_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    keep_versions: int = 3,
):
    """Start a stream folding each micro-batch into the standing stats.

    Per batch: skip if a version >= this ``batch_id`` is already
    committed (replay / restart after a torn checkpoint), else merge the
    (intra-batch-deduped) fresh docs into the latest version and commit
    ``v{batch_id}``; versions older than the newest ``keep_versions``
    are pruned after the commit. Cost per batch: one batch-sized
    tokenize + one |vocab|-row full-outer merge + one bounded-table
    write — never a corpus scan.

    Returns the ``StreamingQuery``.
    """
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.text import (
        merge_term_stats,
    )

    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        vs = stats_versions(stats_dir)
        if vs and vs[-1] >= batch_id:
            return  # already applied (replayed batch) — idempotent skip
        standing = load_term_stats(spark, stats_dir)
        fresh = batch.select(id_col, text_col).dropDuplicates([id_col])
        merged = merge_term_stats(standing, fresh, id_col, text_col)
        merged.write.mode("overwrite").parquet(
            os.path.join(stats_dir, f"v{batch_id}")
        )
        stale = stats_versions(stats_dir)[:-keep_versions]
        for v in stale:
            shutil.rmtree(os.path.join(stats_dir, f"v{v}"), ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
