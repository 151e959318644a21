"""Event-time windowing — batch semantics + Structured Streaming variants.

The reference has no streaming at all (SURVEY.md §2.10); the driver's
``events`` table (event_id, ts, user_id, event_type, value, props) is the
fixture for the streaming-shaped surface. Every operator exists twice:

* a BATCH form whose semantics are portable SQL (oracle-checkable), and
* a STREAMING form over ``readStream`` with watermarks, exercised in tests
  through the rate/memory sources.

Sessionization deliberately uses the gaps-and-islands formulation (lag +
cumulative boundary sum) for batch — identical in any SQL engine — while
the streaming form uses Spark's native ``session_window`` (whose
[start, last+gap) end-semantics differ from island bounds; both are exposed,
tests pin each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame, size: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window aggregate (batch). ``window()`` keeps the
    plan shape identical to the streaming variant."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time windows (batch): each event lands in
    size/slide windows via Catalyst's window generation (an Expand — no
    self-join)."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-user sessions, gaps-and-islands form (batch, oracle-portable):

    session boundary when the gap to the previous event exceeds
    ``gap_minutes``; session id = running boundary count. One shuffle on
    user_id shared by the lag window, the cumulative sum, and the final
    aggregate (same partition key throughout — Catalyst reuses the sort).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag("ts").over(w)
    boundary = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > gap_us),
        1,
    ).otherwise(0)
    with_sess = events.select(
        "*", F.sum(boundary).over(w).alias("session_id")
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def native_session_windows(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Spark's native ``session_window`` (batch form of the streaming
    operator). End bound = last event + gap (differs from island max(ts))."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming variants
# ---------------------------------------------------------------------------


def streaming_hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """readStream → watermark → tumbling window agg. Late events beyond the
    watermark are dropped; state is bounded by watermark horizon x window
    count — the 100 TB/day streaming-safe shape."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


def streaming_sessionize(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """readStream sessionization with ``session_window`` — merging session
    state per user, closed when the watermark passes start+gap."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase is
    attributed to clicks by the same user within ``attribution_window``
    BEFORE the purchase.

    Both sides carry watermarks and the join condition bounds event time in
    BOTH directions, so Spark can size the join state buffer and evict rows
    once the watermark passes — the required shape for an unbounded
    stream-stream join (without the time bound, state grows forever).
    State is keyed by user_id; the same expression runs identically in
    batch for verification.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def streaming_user_lifetime_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime aggregate (event count, value total, latest event time) carried
    across micro-batches in explicit group state — the arbitrary-state API
    for semantics the built-in windowed aggregates can't express (running
    per-key accumulators, custom eviction, model-ish per-key state).

    State is one fixed-width tuple per user — bounded by |users|, not
    event volume, so it holds at 100 TB/day ingest; keys partition across
    executors by the groupBy hash. Emits the refreshed per-user row each
    micro-batch (``update`` output mode). For time-bounded state swap
    ``NoTimeout`` for ``GroupStateTimeout.EventTimeTimeout`` plus a
    watermark and drop keys in the timeout branch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
    )
    state_schema = "n bigint, total double, last_us bigint"

    def update(key: tuple, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                batch_last = int(pdf["ts"].astype("int64").max()) // 1000
                last_us = max(last_us, batch_last)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.to_datetime(last_us, unit="us")],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Batch exactly-once dedup on an idempotency key: keep the EARLIEST
    record per key — deterministic, unlike a bare ``dropDuplicates`` whose
    survivor is partition-order-dependent. One map-side-combinable shuffle
    on the key.

    The survivor is ONE real input record: the whole non-key record is
    aggregated as ``min(struct(ts_col, <remaining cols>))`` (struct
    ordering = earliest event time, remaining columns as the deterministic
    tiebreak), then the struct is re-expanded. Aggregating each column
    independently (``min_by(c, ts)`` per column) would, under a ts tie,
    stitch fields from DIFFERENT tied records into a row that never
    existed.

    ``ts_col`` must exist (and not be one of ``key_cols``): without it the
    struct-min would silently become a lexicographic min over whatever
    columns remain, losing the earliest-record semantics — so misuse fails
    fast instead."""
    if ts_col not in events.columns or ts_col in key_cols:
        raise ValueError(
            f"dedup_events needs a non-key event-time column {ts_col!r}; "
            f"input has {events.columns} with key_cols={list(key_cols)}. "
            "Pass ts_col= to name the event-time column."
        )
    others = [c for c in events.columns if c not in key_cols]
    order = [c for c in others if c == ts_col] + [c for c in others if c != ts_col]
    rec = F.min(F.struct(*[F.col(c) for c in order])).alias("__rec")
    return (
        events.groupBy(*key_cols)
        .agg(rec)
        .select(*key_cols, *[F.col(f"__rec.{c}").alias(c) for c in others])
        .select(*events.columns)
    )


def streaming_dedup_events(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once dedup — ``dropDuplicatesWithinWatermark`` on
    the idempotency key. State holds one entry per key seen within the
    watermark horizon and is EVICTED as event time advances past it: the
    only dedup formulation whose state is bounded on an unbounded stream
    (plain ``dropDuplicates`` on a stream retains every key forever).
    At-scale retry storms (the usual source of stream duplicates) land
    well inside any sane watermark."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
