"""Continuous vector-index ingest: streaming embedding arrival appended
to the q142-shaped serving index (cluster cells + int8 codes).

Same architecture argument as `streaming.corpus`: a vector store's
steady state is a stream of new embeddings landing against an
ever-growing index, per-operator streaming state cannot (and need not)
hold the index, so ``foreachBatch`` bridges each micro-batch into batch
land where `assign_clusters` + `quantize_embeddings` already implement
the right plan. The k-means model is fitted OFFLINE (`fit_kmeans`,
shipped via the S5 artifact) and broadcast into every batch — cells stay
stable while the index grows, which is exactly how IVF serving works
(re-fit + re-index is a batch maintenance job, triggered by a drift
monitor, not a per-batch concern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def streaming_index_ingest(
    stream: DataFrame,
    index_dir: str,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    bloom_dir: str | None = None,
    bloom_m_bits: int = 1 << 20,
    bloom_k: int = 7,
):
    """Start a stream appending novel vectors to the serving index at
    ``index_dir``: each micro-batch is anti-joined by id against the
    index (exactly-once: a replayed committed batch's ids already exist,
    so re-appends filter out — the index parquet is the state, no
    streaming state store grows with it), assigned to its cell at full
    precision (`assign_clusters`) and stored as int8 codes + scale
    (`quantize_embeddings`) — the q142 build/serve split, continuously.

    Index rows: ``(id, cluster, q_scale, q_vec)``. Null-id rows are
    dropped (nothing to key the idempotency on — same policy as the
    corpus ingest's null-text rule); duplicate ids WITHIN a micro-batch
    keep one row (at-least-once sources can re-deliver a record inside
    the same batch; without the dedup the cells x codes inner join would
    fan a doubled id out to 4 index rows — duplicate deliveries carry
    identical payloads, so keeping an arbitrary one is exact);
    null/malformed vectors are dropped by the assignment's cleaning
    stage, so only servable rows land.

    ``bloom_dir`` enables a STANDING Bloom prefilter over index ids
    (``operators.sketches.bloom_bitset`` word rows, append-only: bit_or
    of two bitsets is the bitset of the union). Per batch: probe ids
    against the broadcast bitset first; a FALSE is a definitive miss
    (the id cannot be in the index — skip it past the anti-join
    entirely), only the "maybe" slice anti-joins against the index for
    exact confirmation. New ids' words are appended to ``bloom_dir``
    BEFORE the index rows, so the invariant bitset ⊇ index-ids survives
    a crash between the two writes (a bloom-only id costs one spurious
    anti-join confirm later; the reverse order would let a later
    duplicate probe "definitively fresh" and corrupt the index). An
    existing index with no bitset is bootstrapped from one id scan.

    State-size flip criterion: without the bitset, every micro-batch
    re-scans the index's full id column (column-pruned parquet — fine at
    millions of rows, a per-batch corpus pass at billions). The standing
    bitset is ceil(m/62) bigint words regardless of index size (2^20
    bits = 16 KB; 10 bits/key at k=7 gives ~0.8% false-positive →
    size m ~ 10x expected index cardinality), so the anti-join's index
    scan is paid only for the maybe-slice — at a well-sized bitset,
    ~hit-rate + 1% of batch ids instead of 100%. Flip to ``bloom_dir``
    once the index id scan dominates batch wall-clock; below that the
    extra probe jobs cost more than they save (same criterion as
    ``streaming.corpus``'s per-batch-rebuild note).

    Returns the ``StreamingQuery``; callers stop it or await
    termination.
    """
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.clustering import (
        assign_clusters,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.similarity import (
        quantize_embeddings,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        bloom_bitset,
        bloom_probe,
    )

    spark = stream.sparkSession

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        b = (
            batch.select(id_col, vec_col)
            .where(F.col(id_col).isNotNull())
            .dropDuplicates([id_col])
        )
        if _has_parquet(index_dir):
            existing = spark.read.parquet(index_dir).select(id_col)
            if bloom_dir is not None:
                if not _has_parquet(bloom_dir):
                    # bootstrap: index predates the bitset — build it
                    # from the ids already there (bitset ⊇ index-ids)
                    bloom_bitset(
                        existing, id_col, bloom_m_bits, bloom_k
                    ).write.mode("append").parquet(bloom_dir)
                words = (
                    spark.read.parquet(bloom_dir)
                    .groupBy("word_idx")
                    .agg(F.bit_or("word").alias("word"))
                )
                flagged = b.join(
                    bloom_probe(
                        b.select(id_col), words, id_col, id_col,
                        bloom_m_bits, bloom_k,
                    ),
                    id_col,
                )
                novel = (
                    flagged.where(~F.col("bloom_hit"))
                    .drop("bloom_hit")
                    .unionByName(
                        flagged.where(F.col("bloom_hit"))
                        .drop("bloom_hit")
                        .join(existing, id_col, "left_anti")
                    )
                )
            else:
                novel = b.join(existing, id_col, "left_anti")
        else:
            novel = b
        novel = novel.persist()
        try:
            if bloom_dir is not None:
                # words first (see docstring: crash-safety ordering);
                # novel ids are a safe over-approximation of what lands
                # (cleaning may drop a malformed vector — its bloom bit
                # only costs a confirm if the id ever returns)
                bloom_bitset(
                    novel.select(id_col), id_col, bloom_m_bits, bloom_k
                ).write.mode("append").parquet(bloom_dir)
            cells = assign_clusters(novel, model, id_col, vec_col).select(
                id_col, "cluster"
            )
            codes = quantize_embeddings(novel, id_col, vec_col).select(
                id_col, "q_scale", "q_vec"
            )
            cells.join(codes, id_col).write.mode("append").parquet(index_dir)
        finally:
            novel.unpersist()

    writer = stream.writeStream.foreachBatch(_ingest)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
