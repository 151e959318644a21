"""Structured Streaming smoke tests: the streaming variants must run as real
streams (readStream → writeStream), not just share expressions with batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.events import (
    native_session_windows,
    sessionize,
    streaming_hourly_counts,
    streaming_sessionize,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.catalog import (
        load_star_table,
    )

    return load_star_table(spark, SF_SMOKE, "events")


def _run_stream(spark, events, build, name):
    """Replay the fixture through a file stream (parquet source) and collect
    the final state via a memory sink."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{d}/in")
        out = build(stream)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name).collect()


def test_streaming_hourly_matches_batch(spark):
    events = _events(spark)
    rows = _run_stream(spark, events, streaming_hourly_counts, "hourly_smoke")
    assert rows, "stream produced no windows"
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    got = {(r["window"]["start"], r["event_type"]): r["n_events"] for r in rows}
    want = {(r["window"]["start"], r["event_type"]): r["n_events"] for r in batch}
    # watermark may drop nothing in replay (single batch) → exact match
    assert got == want


def test_streaming_sessionize_runs(spark):
    events = _events(spark)
    rows = _run_stream(spark, events, streaming_sessionize, "sess_smoke")
    assert rows
    # session counts must cover every event exactly once
    assert sum(r["n_events"] for r in rows) == events.count()


def test_native_vs_islands_sessionize(spark):
    events = _events(spark)
    native = native_session_windows(events)
    islands = sessionize(events)
    # same session COUNT per user (end-bound semantics differ, grouping not)
    n = {r["user_id"]: r["cnt"] for r in native.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    i = {r["user_id"]: r["cnt"] for r in islands.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert n == i
