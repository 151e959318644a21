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


def streaming_index_ingest(
    stream: DataFrame,
    index_dir: str,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
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
    corpus ingest's null-text rule); null/malformed vectors are dropped
    by the assignment's cleaning stage, so only servable rows land.

    Returns the ``StreamingQuery``; callers stop it or await
    termination.
    """
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.clustering import (
        assign_clusters,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.similarity import (
        quantize_embeddings,
    )

    spark = stream.sparkSession

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        b = batch.select(id_col, vec_col).where(F.col(id_col).isNotNull())
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        ):
            existing = spark.read.parquet(index_dir).select(id_col)
            b = b.join(existing, id_col, "left_anti")
        cells = assign_clusters(b, model, id_col, vec_col).select(
            id_col, "cluster"
        )
        codes = quantize_embeddings(b, id_col, vec_col).select(
            id_col, "q_scale", "q_vec"
        )
        cells.join(codes, id_col).write.mode("append").parquet(index_dir)

    writer = stream.writeStream.foreachBatch(_ingest)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
