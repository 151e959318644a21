"""Structured Streaming smoke tests: the streaming variants must run as real
streams (readStream → writeStream), not just share expressions with batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.events import (
    native_session_windows,
    sessionize,
    streaming_click_purchase_join,
    streaming_hourly_counts,
    streaming_sessionize,
    streaming_user_lifetime_stats,
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


def test_stateful_lifetime_stats_matches_batch(spark):
    """applyInPandasWithState replay: two input files -> multiple micro
    batches under availableNow; the LAST update per user must equal the
    plain batch aggregate (state accumulated correctly across batches)."""
    import tempfile

    events = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        events.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/in")
        events.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        q = (
            streaming_user_lifetime_stats(stream)
            .writeStream.format("memory")
            .queryName("lifetime_smoke")
            .outputMode("update")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("lifetime_smoke").collect()
    assert rows
    # last emitted row per user (update mode appends one row per batch)
    final = {}
    for r in rows:
        prev = final.get(r["user_id"])
        if prev is None or r["n_events"] >= prev["n_events"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert f["n_events"] == b["n_events"]
        assert abs(f["total_value"] - b["total_value"]) < 1e-6
        assert f["last_ts"] == b["last_ts"]


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream inner join: replayed result must equal the
    same join expression run in batch (inner joins emit eagerly; the
    watermark only bounds state)."""
    import tempfile

    events = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        events.coalesce(1).write.parquet(f"{d}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{d}/in")
        clicks_s = stream.where(F.col("event_type") == "click")
        purchases_s = stream.where(F.col("event_type") == "purchase")
        q = (
            streaming_click_purchase_join(clicks_s, purchases_s)
            .writeStream.format("memory")
            .queryName("attrib_smoke")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.table("attrib_smoke").collect()
        }
    batch = streaming_click_purchase_join(
        events.where(F.col("event_type") == "click"),
        events.where(F.col("event_type") == "purchase"),
    )
    want = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert want, "fixture should contain attributable purchases"
    assert got == want


def test_native_vs_islands_sessionize(spark):
    events = _events(spark)
    native = native_session_windows(events)
    islands = sessionize(events)
    # same session COUNT per user (end-bound semantics differ, grouping not)
    n = {r["user_id"]: r["cnt"] for r in native.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    i = {r["user_id"]: r["cnt"] for r in islands.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert n == i


def test_dedup_events_tie_keeps_one_real_record(spark):
    """Two records sharing (key, ts) must survive as ONE of the actual
    input records — per-column min_by would stitch user_id from one tied
    record and value from the other into a row that never existed."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.events import (
        dedup_events,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 9, "click", 5.0),
            (1, "2024-01-01 00:00:00", 2, "view", 7.0),
            (1, "2024-01-01 00:00:01", 1, "aaaa", 1.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = dedup_events(ev).collect()
    assert len(out) == 1
    r = out[0]
    # survivor = lexicographic-min record among the ts ties: (2, view, 7.0)
    assert (r["user_id"], r["event_type"], r["value"]) == (2, "view", 7.0)


def test_streaming_dedup_matches_batch(spark):
    """Replaying a doubled fixture through dropDuplicatesWithinWatermark
    must recover exactly the batch dedup's row multiset."""
    from pyspark.sql import functions as F

    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.events import (
        dedup_events,
        streaming_dedup_events,
    )

    ev = _events(spark).limit(200)
    doubled = ev.unionAll(ev)
    batch = dedup_events(doubled)
    assert batch.count() == ev.count()

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # two identical files -> the duplicate arrives in a later micro-batch
        ev.write.mode("overwrite").parquet(f"{d}/in")
        ev.write.mode("append").parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        out = streaming_dedup_events(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("dedup_stream")
        assert got.count() == ev.count()
        assert got.select(F.countDistinct("event_id")).first()[0] == ev.count()


def test_streaming_corpus_ingest_restart_and_replay_idempotent(spark, tmp_path):
    """Fault-tolerance contract of the corpus ingest: (a) a restart from
    the source checkpoint continues without re-reading committed input;
    (b) a full REPLAY (lost checkpoint — every batch re-delivered) appends
    nothing, because replayed survivors exact-match the corpus rows they
    already wrote; (c) null-text rows never reach the corpus — a null
    fingerprint would defeat the anti-join that makes (b) true — while
    EMPTY-text rows do survive (they hash to a valid fingerprint, replay
    idempotently, and the batch path ``dedup_incremental`` accepts them;
    same policy both sides)."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.corpus import (
        streaming_corpus_ingest,
    )

    inp = tmp_path / "in"
    corpus = tmp_path / "corpus"
    ckpt = tmp_path / "ckpt"

    def mkstream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    spark.createDataFrame(
        [(1, "aaa bbb ccc ddd"), (2, None), (3, "")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(inp / "b1"))
    q = streaming_corpus_ingest(
        mkstream(), str(corpus), checkpoint_dir=str(ckpt), threshold=0.5
    )
    q.awaitTermination(120)
    after1 = spark.read.parquet(str(corpus)).collect()
    assert {r["doc_id"] for r in after1} == {1, 3} and len(after1) == 2

    # stop/crash between micro-batches: new input lands, restart from the
    # SAME checkpoint — b1 must not be re-read, 11 dedups against corpus
    spark.createDataFrame(
        [(10, "fresh new words only here"), (11, "aaa bbb ccc ddd")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(inp / "b2"))
    q = streaming_corpus_ingest(
        mkstream(), str(corpus), checkpoint_dir=str(ckpt), threshold=0.5
    )
    q.awaitTermination(120)
    after2 = spark.read.parquet(str(corpus)).collect()
    assert {r["doc_id"] for r in after2} == {1, 3, 10} and len(after2) == 3

    # lost-checkpoint replay: EVERY batch re-delivered against the corpus
    # that already holds its survivors -> zero growth, no duplicate rows
    q = streaming_corpus_ingest(
        mkstream(),
        str(corpus),
        checkpoint_dir=str(tmp_path / "ckpt_fresh"),
        threshold=0.5,
    )
    q.awaitTermination(120)
    final = spark.read.parquet(str(corpus)).collect()
    assert {r["doc_id"] for r in final} == {1, 3, 10} and len(final) == 3


def test_streaming_corpus_ingest_dedups_across_batches(spark, tmp_path):
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.corpus import (
        streaming_corpus_ingest,
    )

    inp = tmp_path / "in"
    corpus = tmp_path / "corpus"
    ckpt = tmp_path / "ckpt"
    # batch 1: two novel docs; batch 2: one exact dup of batch 1, one near-dup
    # (J=2/3 >= 0.5), one novel doc. maxFilesPerTrigger=1 -> sequential batches.
    spark.createDataFrame(
        [(1, "aaa bbb ccc ddd"), (2, "xxx yyy zzz www")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(inp / "b1"))
    spark.createDataFrame(
        [(10, "aaa bbb ccc ddd"), (11, "aaa bbb ccc ddd eee"), (12, "fresh new words only here")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(inp / "b2"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*")
    )
    q = streaming_corpus_ingest(
        stream, str(corpus), checkpoint_dir=str(ckpt), threshold=0.5
    )
    q.awaitTermination(120)
    final = spark.read.parquet(str(corpus))
    kept = {r["doc_id"] for r in final.collect()}
    # whichever batch order the file source picked: the "aaa bbb ccc ddd"
    # text family keeps exactly one representative (1 or 10), the near-dup
    # 11 never survives, and the two novel docs always land
    assert len(kept) == 3, kept
    assert 11 not in kept
    assert {2, 12} <= kept
    assert len(kept & {1, 10}) == 1
    assert "fp_exact" in final.columns
    # idempotent state: every surviving text is unique post-normalization
    texts = [r["text"].lower().strip() for r in final.collect()]
    assert len(texts) == len(set(texts))


def test_streaming_corpus_ingest_bloom_prefilter_equivalent(spark, tmp_path):
    """The Bloom-prefiltered exact stage must leave streaming ingest
    byte-identical to the plain path across micro-batches (the q91
    equivalence, exercised through foreachBatch): same survivors, same
    fingerprints, dedup across batches intact."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.corpus import (
        streaming_corpus_ingest,
    )

    rows1 = [(1, "aaa bbb ccc ddd"), (2, "xxx yyy zzz www")]
    rows2 = [
        (10, "aaa bbb ccc ddd"),
        (11, "aaa bbb ccc ddd eee"),
        (12, "fresh new words only here"),
    ]
    results = {}
    for label, bloom in [("plain", False), ("bloom", True)]:
        base = tmp_path / label
        spark.createDataFrame(rows1, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(base / "in" / "b1"))
        spark.createDataFrame(rows2, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(base / "in" / "b2"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base / 'in'}/*")
        )
        q = streaming_corpus_ingest(
            stream,
            str(base / "corpus"),
            checkpoint_dir=str(base / "ckpt"),
            threshold=0.5,
            bloom_prefilter=bloom,
        )
        q.awaitTermination(120)
        results[label] = sorted(
            (r["doc_id"], r["text"], r["fp_exact"])
            for r in spark.read.parquet(str(base / "corpus")).collect()
        )
    # batch order can differ between runs (file-source pick), so compare
    # the invariants, then exact equality when the dup-family pick agrees
    for label, rows in results.items():
        ids = {r[0] for r in rows}
        assert len(rows) == 3, (label, rows)
        assert 11 not in ids and {2, 12} <= ids and len(ids & {1, 10}) == 1
    texts = lambda rows: sorted(r[1] for r in rows)  # noqa: E731
    assert texts(results["plain"]) == texts(results["bloom"])


def test_streaming_tokenize_matches_batch(spark, tmp_path):
    """The encode half of the tokenizer family over a document STREAM:
    a saved artifact (both families) applied via encode_with_artifact to
    a replayed parquet stream must produce exactly the batch encoding —
    the encoders are stateless broadcast-model projections, so lifting
    them to Structured Streaming must be a no-op semantically."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.bpe import (
        train_bpe,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.unigram import (
        train_unigram,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.wordpiece import (
        train_wordpiece,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.tokenizer import (
        encode_with_artifact,
        load_tokenizer_artifact,
        save_tokenizer_artifact,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower"),
            (2, "newest widest lower low"),
            (3, "the lowest of the low"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "in"))

    for family, train in (
        ("bpe", lambda d: train_bpe(d, n_merges=3, min_pair_count=1)),
        ("uni", lambda d: train_unigram(d, vocab_size=6, max_piece_len=3)),
        ("wp", lambda d: train_wordpiece(d, n_merges=3, min_pair_count=1)),
    ):
        save_tokenizer_artifact(train(docs), str(tmp_path / family))
        model = load_tokenizer_artifact(spark, str(tmp_path / family))
        batch = sorted(
            tuple(r) for r in encode_with_artifact(docs, model).collect()
        )
        stream = spark.readStream.schema(docs.schema).parquet(
            str(tmp_path / "in")
        )
        q = (
            encode_with_artifact(stream, model)
            .writeStream.format("memory")
            .queryName(f"tok_{family}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{family}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = sorted(
            tuple(r) for r in spark.table(f"tok_{family}").collect()
        )
        assert streamed == batch, family


def test_streaming_objectives_match_batch(spark, tmp_path):
    """Training-objective rewrites over a document STREAM must equal the
    batch result. fim_transform is a stateless projection, so it lifts to
    Structured Streaming directly; span_corruption carries a per-doc
    window (unsupported on streaming frames), but it is a pure function
    of each doc alone, so the foreachBatch lift is batch-INVARIANT: the
    union of per-microbatch outputs equals the one-shot batch output.
    Replayed with maxFilesPerTrigger=1 to force multiple microbatches."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.objectives import (
        fim_transform,
        span_corruption,
    )

    docs = spark.createDataFrame(
        [
            (i, f"tok{i} " * (5 + i % 7) + "tail words here")
            for i in range(40)
        ]
        + [(99, None)],
        "doc_id long, text string",
    )
    # several input files -> several microbatches
    docs.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "in"))
    stored = spark.read.parquet(str(tmp_path / "in"))

    batch_fim = sorted(tuple(r) for r in fim_transform(stored).collect())
    batch_span = sorted(tuple(r) for r in span_corruption(stored).collect())

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )

    q1 = (
        fim_transform(stream)
        .writeStream.format("memory")
        .queryName("fim_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fim"))
        .trigger(availableNow=True)
        .start()
    )

    out_dir = str(tmp_path / "span_out")

    def _apply_span(bdf, _bid):
        span_corruption(bdf).write.mode("append").parquet(out_dir)

    q2 = (
        stream.writeStream.foreachBatch(_apply_span)
        .option("checkpointLocation", str(tmp_path / "ckpt_span"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    got_fim = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM fim_stream").collect()
    )
    got_span = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    assert got_fim == batch_fim
    assert got_span == batch_span


def test_streaming_random_projection_matches_batch(spark, tmp_path):
    """random_projection's production Arrow path over an embedding
    STREAM: a stateless broadcast-coefficient projection (no shuffle,
    no aggregation), so lifting it to Structured Streaming must be a
    semantic no-op — the continuous re-embed/re-project path of a
    corpus refresh."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "emb"))
    batch = sorted(
        tuple(r) for r in random_projection(emb, 4, 64, salt="st").collect()
    )
    stream = spark.readStream.schema(emb.schema).parquet(
        str(tmp_path / "emb")
    )
    q = (
        random_projection(stream, 4, 64, salt="st")
        .writeStream.format("memory")
        .queryName("proj_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_proj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        tuple(r) for r in spark.table("proj_stream").collect()
    )
    assert streamed == batch


def test_streaming_index_ingest_restart_and_replay_idempotent(
    spark, tmp_path
):
    """Fault-tolerance contract of the vector-index ingest (the q142
    serving index, fed continuously): (a) restart from the checkpoint
    continues without re-reading committed input; (b) lost-checkpoint
    full replay appends nothing (the index's own ids are the anti-join
    state); (c) the appended rows equal a one-shot batch build
    (assign_clusters + quantize_embeddings) over the same vectors; null
    ids and null vectors never land."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.clustering import (
        assign_clusters,
        fit_kmeans,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.similarity import (
        quantize_embeddings,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.vectors import (
        streaming_index_ingest,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    model = fit_kmeans(emb, n_clusters=4, iters=1, salt="sidx")

    inp = tmp_path / "in"
    idx = tmp_path / "index"
    ckpt = tmp_path / "ckpt"
    b1 = emb.where(F.col("vec_id") < 40)
    # intra-batch duplicate delivery (at-least-once source): vec_id 5
    # appears twice in ONE micro-batch — must land exactly once, not
    # fan out through the cells x codes join
    b1.union(b1.where(F.col("vec_id") == 5)).union(
        spark.createDataFrame(
            [(None, [1.0] * 64), (9001, None)],
            "vec_id long, embedding array<double>",
        ).select("vec_id", F.col("embedding").cast(b1.schema["embedding"].dataType))
    ).coalesce(1).write.parquet(str(inp / "b1"))

    def mkstream():
        return (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    q = streaming_index_ingest(
        mkstream(), str(idx), model, checkpoint_dir=str(ckpt)
    )
    q.awaitTermination(120)
    after1 = spark.read.parquet(str(idx)).collect()
    assert {r["vec_id"] for r in after1} == set(range(40))
    assert len(after1) == 40  # duplicated vec_id 5 landed exactly once

    # restart from the same checkpoint with new + overlapping input:
    # committed b1 is not re-read; b2's overlap (30..39) anti-joins out
    emb.where(
        (F.col("vec_id") >= 30) & (F.col("vec_id") < 60)
    ).coalesce(1).write.parquet(str(inp / "b2"))
    q = streaming_index_ingest(
        mkstream(), str(idx), model, checkpoint_dir=str(ckpt)
    )
    q.awaitTermination(120)
    after2 = spark.read.parquet(str(idx)).collect()
    assert {r["vec_id"] for r in after2} == set(range(60))
    assert len(after2) == 60  # no duplicate rows for the overlap

    # lost checkpoint: full replay appends nothing
    q = streaming_index_ingest(
        mkstream(), str(idx), model, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    final = spark.read.parquet(str(idx)).collect()
    assert len(final) == 60

    # streamed index rows == one-shot batch build over the same vectors
    lived = emb.where(F.col("vec_id") < 60)
    batch_idx = (
        assign_clusters(lived, model)
        .select("vec_id", "cluster")
        .join(
            quantize_embeddings(lived).select("vec_id", "q_scale", "q_vec"),
            "vec_id",
        )
    )
    assert sorted(map(tuple, final)) == sorted(
        map(tuple, batch_idx.collect())
    )


def test_streaming_index_ingest_bloom_prefilter_equivalent(spark, tmp_path):
    """Ingest-with-standing-Bloom == ingest-without, across overlapping
    batches AND a lost-checkpoint full replay: identical final index
    rows. Also pins (a) the bootstrap path — ``bloom_dir`` enabled only
    AFTER the index already exists, so the bitset is built from the
    standing index ids — and (b) the crash-safety invariant
    bitset ⊇ index-ids (every index id probes bloom_hit TRUE)."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.clustering import (
        fit_kmeans,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        bloom_probe,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.vectors import (
        streaming_index_ingest,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    model = fit_kmeans(emb, n_clusters=4, iters=1, salt="sidx")

    inp = tmp_path / "in"
    b1 = emb.where(F.col("vec_id") < 30)
    # intra-batch duplicate under the bloom path too
    b1.union(b1.where(F.col("vec_id") == 7)).coalesce(1).write.parquet(
        str(inp / "b1")
    )
    emb.where(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 50)
    ).coalesce(1).write.parquet(str(inp / "b2"))

    def mkstream():
        return (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    def run(idx, ckpt, bloom):
        streaming_index_ingest(
            mkstream(),
            str(idx),
            model,
            checkpoint_dir=str(ckpt),
            bloom_dir=str(tmp_path / "bloom") if bloom else None,
        ).awaitTermination(120)

    # plain reference run (all batches + a lost-checkpoint replay)
    run(tmp_path / "idx_plain", tmp_path / "ck_p1", bloom=False)
    run(tmp_path / "idx_plain", tmp_path / "ck_p2", bloom=False)
    plain = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "idx_plain")).collect())
    )

    # bloom run: first pass WITHOUT bloom (index exists, no bitset),
    # then enable bloom_dir → bootstrap + replay must append nothing
    run(tmp_path / "idx_bloom", tmp_path / "ck_b1", bloom=False)
    run(tmp_path / "idx_bloom", tmp_path / "ck_b2", bloom=True)
    run(tmp_path / "idx_bloom", tmp_path / "ck_b3", bloom=True)
    with_bloom = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "idx_bloom")).collect())
    )
    assert with_bloom == plain
    assert len(with_bloom) == 50

    # invariant: every index id is "maybe" in the standing bitset
    words = (
        spark.read.parquet(str(tmp_path / "bloom"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    ids = spark.read.parquet(str(tmp_path / "idx_bloom")).select("vec_id")
    probed = bloom_probe(ids, words, "vec_id", "vec_id").collect()
    assert len(probed) == 50 and all(r["bloom_hit"] for r in probed)


def test_streaming_term_stats_replay_equals_batch(spark, tmp_path):
    """Streaming stats fold == one batch term_stats over all input; a
    restart continues from the checkpoint; a FULL replay (lost
    checkpoint) changes nothing — the version guard skips committed
    batch ids; intra-batch duplicate ids collapse."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.text import (
        term_stats,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        load_term_stats,
        streaming_term_stats_ingest,
    )

    inp = tmp_path / "in"
    stats = tmp_path / "stats"
    ckpt = tmp_path / "ckpt"

    def mkstream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    b1 = [(1, "alpha beta beta"), (2, "beta gamma"), (2, "beta gamma"), (3, None)]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    q = streaming_term_stats_ingest(mkstream(), str(stats), checkpoint_dir=str(ckpt))
    q.awaitTermination(120)

    b2 = [(10, "alpha delta"), (11, "delta delta epsilon")]
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    q = streaming_term_stats_ingest(mkstream(), str(stats), checkpoint_dir=str(ckpt))
    q.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma"), (3, None)] + b2,
        "doc_id long, text string",
    )
    want = snap(term_stats(all_docs))
    assert snap(load_term_stats(spark, str(stats))) == want

    # full replay: lost checkpoint, every file re-delivered — the version
    # guard must skip both batches (no double counting)
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    assert snap(load_term_stats(spark, str(stats))) == want


def test_streaming_sketch_ingests_replay_equals_batch(spark, tmp_path):
    """CMS cells and the HLL estimate folded over the stream equal the
    one-shot batch sketches over all input; a full replay (lost
    checkpoint) changes neither — duplicate EVENTS still count twice in
    CMS (they are the signal), replayed BATCHES never do."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        count_min_table,
        hll_distinct,
        hll_estimate,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        load_term_stats,  # noqa: F401  (module import sanity)
        stats_versions,
        streaming_cms_ingest,
        streaming_hll_ingest,
    )
    import os

    inp = tmp_path / "in"
    b1 = [("a",), ("a",), ("b",), (None,)]
    b2 = [("a",), ("c",), ("c",), ("d",)]
    spark.createDataFrame(b1, "k string").coalesce(1).write.parquet(str(inp / "b1"))
    spark.createDataFrame(b2, "k string").coalesce(1).write.parquet(str(inp / "b2"))

    def mkstream():
        return (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    cms_dir, hll_dir = tmp_path / "cms", tmp_path / "hll"
    q = streaming_cms_ingest(
        mkstream(), str(cms_dir), "k", w=64, d=3,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    q = streaming_hll_ingest(
        mkstream(), str(hll_dir), "k", p=6,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)

    all_rows = spark.createDataFrame(b1 + b2, "k string")
    vs_cms = stats_versions(str(cms_dir))
    got_cms = spark.read.parquet(os.path.join(str(cms_dir), f"v{vs_cms[-1]}"))
    assert snap(got_cms) == snap(count_min_table(all_rows, "k", w=64, d=3))

    vs_hll = stats_versions(str(hll_dir))
    got_est = hll_estimate(
        spark.read.parquet(os.path.join(str(hll_dir), f"v{vs_hll[-1]}")), p=6
    ).first()[0]
    assert got_est == hll_distinct(all_rows, "k", p=6).first()[0]

    # full replay with a lost checkpoint: version guard skips both batches
    q = streaming_cms_ingest(
        mkstream(), str(cms_dir), "k", w=64, d=3,
        checkpoint_dir=str(tmp_path / "ck3"),
    )
    q.awaitTermination(120)
    got_cms2 = spark.read.parquet(
        os.path.join(str(cms_dir), f"v{stats_versions(str(cms_dir))[-1]}")
    )
    assert snap(got_cms2) == snap(got_cms)


def test_streaming_fold_fresh_checkpoint_folds_only_new_files(spark, tmp_path):
    """The ADVICE-flagged hole: a LOST checkpoint restarts batch ids at 0,
    and a replay batch that ALSO contains new files must fold exactly the
    new files — a version-number guard would skip the whole batch and the
    fresh checkpoint would mark the new files consumed, silently dropping
    them forever. The manifest keys idempotence on content:
    1) pure replay under a fresh checkpoint stays a no-op,
    2) a single mixed batch (old + new files, batch_id 0) folds only the
       unseen file, and the result equals one batch fold over all input."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.text import (
        term_stats,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        load_term_stats,
        streaming_term_stats_ingest,
    )

    inp = tmp_path / "in"
    stats = tmp_path / "stats"

    def mkstream(**opts):
        s = spark.readStream.schema("doc_id long, text string")
        for k, v in opts.items():
            s = s.option(k, v)
        return s.parquet(f"{inp}/*")

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    b1 = [(1, "alpha beta beta"), (2, "beta gamma")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)
    assert snap(load_term_stats(spark, str(stats))) == snap(
        term_stats(spark.createDataFrame(b1, "doc_id long, text string"))
    )

    # checkpoint "lost" (never reused); new file arrives; the fresh run's
    # FIRST batch (batch_id 0) contains BOTH files — the mixed-batch case
    b2 = [(10, "alpha delta"), (11, "delta delta epsilon")]
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    want = snap(
        term_stats(spark.createDataFrame(b1 + b2, "doc_id long, text string"))
    )
    assert snap(load_term_stats(spark, str(stats))) == want

    # pure replay under yet another fresh checkpoint: no new files → no-op,
    # including with per-file batches (batch ids 0,1 both below committed)
    q = streaming_term_stats_ingest(
        mkstream(maxFilesPerTrigger=1),
        str(stats),
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    q.awaitTermination(120)
    assert snap(load_term_stats(spark, str(stats))) == want


def test_streaming_cms_fresh_checkpoint_counts_new_events_once(spark, tmp_path):
    """Same hole for the sketch folds, where rows are EVENTS (duplicates
    are the signal): a fresh checkpoint over old+new files must add the
    new file's events exactly once and never re-add the old file's."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        count_min_table,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_cms_ingest,
    )

    inp = tmp_path / "in"
    b1 = [("a",), ("a",), ("b",)]
    b2 = [("a",), ("c",), ("c",)]
    spark.createDataFrame(b1, "k string").coalesce(1).write.parquet(str(inp / "b1"))

    def mkstream():
        return spark.readStream.schema("k string").parquet(f"{inp}/*")

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    cms_dir = tmp_path / "cms"
    q = streaming_cms_ingest(
        mkstream(), str(cms_dir), "k", w=64, d=3,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)

    spark.createDataFrame(b2, "k string").coalesce(1).write.parquet(str(inp / "b2"))
    q = streaming_cms_ingest(
        mkstream(), str(cms_dir), "k", w=64, d=3,
        checkpoint_dir=str(tmp_path / "ck2"),  # fresh: batch 0 = b1 + b2
    )
    q.awaitTermination(120)

    got = spark.read.parquet(
        os.path.join(str(cms_dir), f"v{stats_versions(str(cms_dir))[-1]}")
    )
    want = count_min_table(spark.createDataFrame(b1 + b2, "k string"), "k", w=64, d=3)
    assert snap(got) == snap(want)


def test_streaming_hll_by_ingest_fold_equals_batch(spark, tmp_path):
    """Keyed HLL fold == the batch hll_distinct_by over all input, and a
    fresh-checkpoint mixed replay (old + new file in one batch) folds
    the new file exactly once — the per-group register state is
    max-mergeable like the global one."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sketches import (
        _hll_estimate_col,
        hll_distinct_by,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_hll_by_ingest,
    )
    from pyspark.sql import functions as F

    inp = tmp_path / "in"
    b1 = [("a", i % 17) for i in range(120)] + [("b", 1), (None, 2)]
    b2 = [("a", i % 29) for i in range(60)] + [("b", None)]
    spark.createDataFrame(b1, "g string, k int").coalesce(1).write.parquet(
        str(inp / "b1")
    )

    def mkstream():
        return spark.readStream.schema("g string, k int").parquet(f"{inp}/*")

    hdir = tmp_path / "hll"
    q = streaming_hll_by_ingest(
        mkstream(), str(hdir), "g", "k", p=8,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)

    spark.createDataFrame(b2, "g string, k int").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    # fresh checkpoint: batch 0 = b1 (already folded) + b2 (new)
    q = streaming_hll_by_ingest(
        mkstream(), str(hdir), "g", "k", p=8,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)

    regs = spark.read.parquet(
        os.path.join(str(hdir), f"v{stats_versions(str(hdir))[-1]}")
    )
    maxrank = 61 - 8
    got = {
        r["g"]: r["est"]
        for r in regs.groupBy("g")
        .agg(
            F.count("*").alias("u"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({maxrank} - r AS INT))"
                )
            ).alias("s"),
        )
        .select("g", _hll_estimate_col(F.col("u"), F.col("s"), 8).alias("est"))
        .collect()
    }
    all_rows = spark.createDataFrame(b1 + b2, "g string, k int")
    want = {
        r["g"]: r["hll_estimate"]
        for r in hll_distinct_by(all_rows, "g", "k", p=8).collect()
    }
    assert got == want


def test_streaming_quantile_ingest_fold_equals_batch_and_bounds(spark, tmp_path):
    """The log-bucket cell table is a mergeable quantile sketch: the
    streamed cellwise fold equals the one-shot quantile_cells over all
    input (exact — the bucket code is a pure value function), a fresh-
    checkpoint mixed replay folds only the new file, and the estimates
    read off the folded state honor their own cell-span bounds around
    the exact quantiles."""
    import math
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.analytics import (
        cells_quantile_estimate,
        exact_quantiles,
        quantile_cells,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_quantile_ingest,
    )

    inp = tmp_path / "in"
    b1 = [(float((i * 37) % 1009),) for i in range(400)] + [(None,)]
    b2 = [(float(i) * -3.5,) for i in range(200)] + [(float("nan"),), (1e9,)]
    spark.createDataFrame(b1, "x double").coalesce(1).write.parquet(str(inp / "b1"))

    def mkstream():
        return spark.readStream.schema("x double").parquet(f"{inp}/*")

    qdir = tmp_path / "qcells"
    q = streaming_quantile_ingest(
        mkstream(), str(qdir), "x", checkpoint_dir=str(tmp_path / "ck1")
    )
    q.awaitTermination(120)

    spark.createDataFrame(b2, "x double").coalesce(1).write.parquet(str(inp / "b2"))
    # fresh checkpoint: batch 0 = b1 (folded) + b2 (new)
    q = streaming_quantile_ingest(
        mkstream(), str(qdir), "x", checkpoint_dir=str(tmp_path / "ck2")
    )
    q.awaitTermination(120)

    state = spark.read.parquet(
        os.path.join(str(qdir), f"v{stats_versions(str(qdir))[-1]}")
    )
    all_rows = spark.createDataFrame(b1 + b2, "x double")
    want_cells = sorted(tuple(r) for r in quantile_cells(all_rows, "x").collect())
    got_cells = sorted(tuple(r) for r in state.collect())
    # n/mn/mx are exact under the fold; the double s/s2 sums are only
    # fold-order-dependent in the last ulp (the operator guarantees
    # bounded quantiles + exact moments up to fp reassociation), so
    # compare them with a relative tolerance rather than bit-exactly
    assert len(got_cells) == len(want_cells)
    for g, w in zip(got_cells, want_cells):
        b_g, n_g, s_g, s2_g, mn_g, mx_g = g
        b_w, n_w, s_w, s2_w, mn_w, mx_w = w
        assert (b_g, n_g, mn_g, mx_g) == (b_w, n_w, mn_w, mx_w), (g, w)
        assert math.isclose(s_g, s_w, rel_tol=1e-12, abs_tol=1e-9), (g, w)
        assert math.isclose(s2_g, s2_w, rel_tol=1e-12, abs_tol=1e-9), (g, w)

    probs = [0.1, 0.5, 0.9]
    est = cells_quantile_estimate(state, probs)
    exact = exact_quantiles(all_rows, "x", probs)
    for (e, lo, hi), want in zip(est, exact):
        assert lo <= want <= hi, (want, lo, hi)
        assert lo <= e <= hi

    # empty state -> None triple
    empty = spark.createDataFrame([], "b bigint, n bigint, s double, s2 double, mn double, mx double")
    assert cells_quantile_estimate(empty, [0.5]) == [(None, None, None)]


def test_streaming_fold_empty_batch_preserves_manifest(spark, tmp_path):
    """Review-pass regression: a ZERO-ROW micro-batch (empty parquet
    file) must be a no-op — committing it would write a manifest-less
    version, truncating the applied-file record so a later fresh-
    checkpoint replay re-folds (double-counts) old files."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.text import (
        term_stats,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        load_term_stats,
        streaming_term_stats_ingest,
    )

    inp = tmp_path / "in"
    b1 = [(1, "alpha beta"), (2, "beta gamma")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b1")
    )

    def mkstream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    stats = tmp_path / "stats"
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ck1")
    )
    q.awaitTermination(120)

    # an EMPTY file arrives and gets its own micro-batch
    spark.createDataFrame([], "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b_empty")
    )
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ck1")
    )
    q.awaitTermination(120)

    # fresh checkpoint over (b1, empty, b2): b1 must NOT re-fold
    b2 = [(10, "delta")]
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    q = streaming_term_stats_ingest(
        mkstream(), str(stats), checkpoint_dir=str(tmp_path / "ck2")
    )
    q.awaitTermination(120)
    want = snap(term_stats(spark.createDataFrame(b1 + b2, "doc_id long, text string")))
    assert snap(load_term_stats(spark, str(stats))) == want


def test_streaming_hll_by_ingest_keeps_int_group_type(spark, tmp_path):
    """Review-pass regression: the keyed HLL state schema derives from
    the stream's types — an int group key must come back as ints, not
    widened strings."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_hll_by_ingest,
    )

    inp = tmp_path / "in"
    rows = [(i % 3, f"k{i}") for i in range(50)]
    spark.createDataFrame(rows, "g int, k string").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    stream = spark.readStream.schema("g int, k string").parquet(f"{inp}/*")
    q = streaming_hll_by_ingest(
        stream, str(tmp_path / "hll"), "g", "k", p=6,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    state = spark.read.parquet(
        os.path.join(str(tmp_path / "hll"), f"v{stats_versions(str(tmp_path / 'hll'))[-1]}")
    )
    assert dict(state.dtypes)["g"] == "int"
    assert {r["g"] for r in state.select("g").distinct().collect()} == {0, 1, 2}


def _count_fold_ingest(stream, state_dir, checkpoint_dir, keep_versions=3):
    """Minimal versioned fold for layout tests: per-key row counts."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        versioned_fold_ingest,
    )

    def fold(standing, batch):
        return (
            standing.unionByName(
                batch.groupBy("k").agg(F.count("*").alias("n"))
            )
            .groupBy("k")
            .agg(F.sum("n").alias("n"))
        )

    return versioned_fold_ingest(
        stream, state_dir, fold, "k string, n bigint",
        checkpoint_dir=checkpoint_dir, keep_versions=keep_versions,
    )


def test_streaming_fold_delta_manifest_batch_sized_and_compacts(spark, tmp_path):
    """The delta-manifest layout's two pins: (1) a non-compaction commit
    writes a DELTA holding only that batch's files (batch-sized manifest
    IO — the cumulative-rewrite cost that grew with pipeline age is
    gone), (2) every keep_versions commits a cumulative BASE compacts
    the deltas away (and old bases/deltas are pruned), with the folded
    state exact throughout and a fresh-checkpoint mixed replay reading
    the base+delta union correctly."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
    )

    inp = tmp_path / "in"

    def mkstream():
        return (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*")
        )

    def manifest_dirs(state):
        return sorted(
            d for d in os.listdir(state)
            if d[0] in "md" and d[1:].isdigit()
            and os.path.exists(os.path.join(state, d, "_SUCCESS"))
        )

    state = str(tmp_path / "state")
    # three single-file batches at keep_versions=3: v0, v1 are delta
    # turns; v2 is the compaction turn (2 standing deltas + 1 >= 3)
    for i in range(3):
        spark.createDataFrame(
            [("a",)] * (i + 1), "k string"
        ).coalesce(1).write.parquet(str(inp / f"b{i}"))
        q = _count_fold_ingest(
            mkstream(), state, str(tmp_path / "ck1"), keep_versions=3
        )
        q.awaitTermination(120)
        if i == 0:
            assert manifest_dirs(state) == ["d0"]
            d0 = spark.read.parquet(os.path.join(state, "d0"))
            assert d0.count() == 1  # ONE file row — batch-sized
    # after the third commit: compacted base only, deltas pruned
    assert manifest_dirs(state) == ["m2"]
    base = spark.read.parquet(os.path.join(state, "m2"))
    assert base.count() == 3  # all three files, cumulative
    vs = stats_versions(state)
    got = spark.read.parquet(os.path.join(state, f"v{vs[-1]}")).collect()
    assert [(r["k"], r["n"]) for r in got] == [("a", 6)]

    # fourth file + FRESH checkpoint: batch 0 mixes 3 folded files with
    # one new file; the base+delta reader folds exactly the new one
    spark.createDataFrame([("b",)], "k string").coalesce(1).write.parquet(
        str(inp / "b3")
    )
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck_fresh"), keep_versions=3,
    )
    q.awaitTermination(120)
    vs = stats_versions(state)
    got = sorted(
        (r["k"], r["n"])
        for r in spark.read.parquet(os.path.join(state, f"v{vs[-1]}")).collect()
    )
    assert got == [("a", 6), ("b", 1)]
    assert manifest_dirs(state) == ["d3", "m2"]


def test_streaming_fold_legacy_cumulative_manifest_still_reads(spark, tmp_path):
    """Round-13 state (per-version CUMULATIVE m{n}) must keep working:
    the delta reader treats a legacy m{n} as a base with no deltas, so a
    fresh-checkpoint mixed replay still folds only the new file."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
    )

    inp = tmp_path / "in"
    spark.createDataFrame([("a",)] * 2, "k string").coalesce(1).write.parquet(
        str(inp / "b0")
    )
    state = str(tmp_path / "state")
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    # rewrite the layout as legacy: the delta becomes a cumulative m0
    os.rename(os.path.join(state, "d0"), os.path.join(state, "m0"))

    spark.createDataFrame([("b",)] * 3, "k string").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck_fresh"),
    )
    q.awaitTermination(120)
    vs = stats_versions(state)
    got = sorted(
        (r["k"], r["n"])
        for r in spark.read.parquet(os.path.join(state, f"v{vs[-1]}")).collect()
    )
    assert got == [("a", 2), ("b", 3)]


def test_streaming_fold_pre_manifest_state_raises_on_fresh_checkpoint(
    spark, tmp_path
):
    """ADVICE regression: PRE-manifest legacy state (committed versions
    with no manifest artifacts at all) under a FRESH checkpoint whose
    batch id falls below the committed version used to silently skip
    the batch — marking any NEW files in it consumed forever. It must
    now fail loudly, like the no-lineage regression path. (Equality —
    the same checkpoint crash-replaying its LAST batch, whose file set
    the offset log fixed — still skips: raising there would brick
    every legacy crash recovery.)"""
    import glob
    import os
    import shutil

    inp = tmp_path / "in"
    for i, k in enumerate(("a", "b")):
        spark.createDataFrame([(k,)], "k string").coalesce(1).write.parquet(
            str(inp / f"b{i}")
        )
    state = str(tmp_path / "state")
    # two single-file batches -> v0, v1 committed
    q = _count_fold_ingest(
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*"),
        state, str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    for d in glob.glob(os.path.join(state, "d*")) + glob.glob(
        os.path.join(state, "m*")
    ):
        shutil.rmtree(d)  # simulate pre-manifest state (v0, v1, no record)

    spark.createDataFrame([("c",)], "k string").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    # fresh checkpoint: batch 0 mixes two folded files with a new one,
    # and vs[-1]=1 > batch_id=0
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck_fresh"),
    )
    with pytest.raises(Exception, match="predates the manifest"):
        q.awaitTermination(120)
    # and the state was NOT silently advanced
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
    )

    assert stats_versions(state) == [0, 1]


def test_streaming_quantile_by_ingest_fold_equals_batch(spark, tmp_path):
    """Keyed quantile-cell fold == the batch quantile_cells_by over all
    input, through a fresh-checkpoint mixed replay (old + new file in
    one batch), with int group keys keeping their type through the
    bootstrap union. n/mn/mx compare exactly; the double s/s2 sums are
    fold-order-dependent in the last ulp, so they compare isclose (the
    ADVICE rule the global test already follows)."""
    import math
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.analytics import (
        cells_quantile_estimate_by,
        group_quantiles_highcard,
        quantile_cells_by,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_quantile_by_ingest,
    )

    inp = tmp_path / "in"
    b1 = [("a", float((i * 37) % 211)) for i in range(150)] + [
        ("b", 5.0), (None, 2.0), ("a", None)
    ]
    b2 = [("a", float(i) * -2.5) for i in range(80)] + [
        ("b", float("nan")), ("b", 1e9)
    ]
    spark.createDataFrame(b1, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b1")
    )

    def mkstream():
        return spark.readStream.schema("g string, x double").parquet(f"{inp}/*")

    qdir = tmp_path / "qc"
    q = streaming_quantile_by_ingest(
        mkstream(), str(qdir), "g", "x", checkpoint_dir=str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    spark.createDataFrame(b2, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    # fresh checkpoint: batch 0 = b1 (folded) + b2 (new)
    q = streaming_quantile_by_ingest(
        mkstream(), str(qdir), "g", "x", checkpoint_dir=str(tmp_path / "ck2")
    )
    q.awaitTermination(120)

    state = spark.read.parquet(
        os.path.join(str(qdir), f"v{stats_versions(str(qdir))[-1]}")
    )
    all_rows = spark.createDataFrame(b1 + b2, "g string, x double")
    key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    want = sorted(
        (tuple(r) for r in quantile_cells_by(all_rows, "g", "x").collect()),
        key=key,
    )
    got = sorted((tuple(r) for r in state.collect()), key=key)
    assert len(got) == len(want)
    for g_row, w_row in zip(got, want):
        assert g_row[:3] == w_row[:3], (g_row, w_row)  # g, b, n
        assert g_row[5:] == w_row[5:], (g_row, w_row)  # mn, mx
        for a, b in zip(g_row[3:5], w_row[3:5]):  # s, s2
            assert math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-9), (g_row, w_row)

    # the per-group estimates read off the FOLDED state honor their own
    # bounds around the exact per-group quantiles
    probs = [0.25, 0.5, 0.75]
    est = {
        r["g"]: r
        for r in cells_quantile_estimate_by(state, "g", probs).collect()
    }
    exact = {
        r["g"]: r
        for r in group_quantiles_highcard(all_rows, "g", "x", probs).collect()
    }
    assert set(est) == set(exact)
    for g, ex in exact.items():
        for name in ("p25", "p50", "p75"):
            lo, hi = est[g][f"{name}_lo"], est[g][f"{name}_hi"]
            assert lo <= ex[name] <= hi, (g, name, lo, ex[name], hi)
            assert lo <= est[g][name] <= hi, (g, name)
        assert est[g]["n"] == ex["n"]


def test_quantile_fence_alerts_streaming_composition(spark, tmp_path):
    """The monitor composition end to end (the q181 family's streaming
    half): fold a baseline stream into keyed quantile-cell state, then
    classify a fresh batch against the folded fence with
    quantile_fence_alerts. Pins (1) alerts off the FOLDED state ==
    alerts off the one-shot batch cells (fold==batch lifted through the
    composition — the estimator only reads n/mn/mx, which fold exactly),
    (2) the soundness guarantee n_above_hi <= exact breach count <=
    n_above_lo against the exact fence (group_quantiles_highcard),
    (3) status never contradicts the exact decision ('alert' implies
    the exact rate alerts, 'clear' implies it doesn't), (4)
    'no_baseline' for batch groups never folded, and (5) a null group
    pairs with its own fence (null-safe join), never with
    'no_baseline'."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.analytics import (
        group_quantiles_highcard,
        quantile_cells_by,
        quantile_fence_alerts,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
        streaming_quantile_by_ingest,
    )

    inp = tmp_path / "in"
    b1 = [("a", float(i % 100)) for i in range(200)] + [
        ("b", float(i % 50)) for i in range(100)
    ] + [(None, float(i)) for i in range(40)]
    b2 = [("a", float(i % 90)) for i in range(100)] + [("b", 200.0)]
    spark.createDataFrame(b1, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    spark.createDataFrame(b2, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    qdir = str(tmp_path / "qc")
    q = streaming_quantile_by_ingest(
        spark.readStream.schema("g string, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*"),
        qdir, "g", "x",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    state = spark.read.parquet(
        os.path.join(qdir, f"v{stats_versions(qdir)[-1]}")
    )

    batch = spark.createDataFrame(
        [("a", 99.5)] * 30 + [("a", 1.0)] * 10   # 75% definite breaches
        + [("b", -5.0)] * 20                     # none
        + [("c", 1.0)]                           # no folded baseline
        + [(None, 1000.0), (None, 0.5)],         # null group, 50% breach
        "g string, x double",
    )
    prob, num, den = 0.75, 1, 4
    off_fold = {
        r["g"]: r
        for r in quantile_fence_alerts(
            state, batch, "g", "x", prob, num, den
        ).collect()
    }
    baseline = spark.createDataFrame(b1 + b2, "g string, x double")
    off_batch = {
        r["g"]: r
        for r in quantile_fence_alerts(
            quantile_cells_by(baseline, "g", "x"), batch, "g", "x", prob, num, den
        ).collect()
    }
    assert off_fold == off_batch  # (1) fold==batch through the composition

    exact = {
        r["g"]: r["p75"]
        for r in group_quantiles_highcard(baseline, "g", "x", [prob]).collect()
    }
    batch_vals: dict = {}
    for r in batch.collect():
        batch_vals.setdefault(r["g"], []).append(r["x"])
    for g, row in off_fold.items():
        if g == "c":
            assert row["status"] == "no_baseline"  # (4)
            assert row["fence_lo"] is None and row["fence_hi"] is None
            continue
        n_exact = sum(1 for v in batch_vals[g] if v > exact[g])
        assert row["fence_lo"] <= exact[g] <= row["fence_hi"], (g, row)
        assert row["n_above_hi"] <= n_exact <= row["n_above_lo"], (g, row)  # (2)
        exact_alert = n_exact * den > num * row["n_batch"]
        if row["status"] == "alert":
            assert exact_alert, (g, row, n_exact)  # (3)
        elif row["status"] == "clear":
            assert not exact_alert, (g, row, n_exact)
    assert off_fold[None]["status"] != "no_baseline"  # (5)
    assert off_fold["a"]["status"] == "alert"
    assert off_fold["b"]["status"] == "clear"


def test_streaming_fence_monitor_ingest(spark, tmp_path):
    """The continuous monitor end to end: every micro-batch is classified
    against the PRE-batch folded baseline, alerts land per-version,
    exactly-once. Pins (1) cold start — the first batch reports
    no_baseline for every group; (2) the second batch's alert rows ==
    quantile_fence_alerts(cells(batch1), batch2) computed batch-side;
    (3) a crash-orphaned alerts dir for the upcoming version is
    OVERWRITTEN by the commit, not duplicated; (4) load_fence_alerts
    reads only versions at-or-below the latest committed state (a b99
    orphan is invisible)."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.analytics import (
        quantile_cells_by,
        quantile_fence_alerts,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        load_fence_alerts,
        stats_versions,
        streaming_fence_monitor_ingest,
    )

    import pytest

    inp = tmp_path / "in"
    b1 = [("a", float(i % 100)) for i in range(200)] + [("b", 3.0)] * 50
    b2 = [("a", 999.0)] * 20 + [("a", 1.0)] * 10 + [("b", -1.0)] * 5
    spark.createDataFrame(b1, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    state = str(tmp_path / "state")
    alerts = str(tmp_path / "alerts")

    # setup fail-fast: bad args raise BEFORE any checkpoint exists
    with pytest.raises(ValueError, match="breach_den > 0"):
        streaming_fence_monitor_ingest(
            spark.readStream.schema("g string, x double").parquet(f"{inp}/*"),
            state, alerts, "g", "x", breach_den=0,
        )
    with pytest.raises(ValueError, match="collide with the output schema"):
        streaming_fence_monitor_ingest(
            spark.readStream.schema("g string, x double").parquet(f"{inp}/*"),
            state, alerts, "batch_version", "x",
        )

    # a PREVIOUS state lifetime's alert dir (a number the new lifetime
    # won't immediately overwrite): the bootstrap commit must clear it
    # — version numbering restarts, so it would otherwise interleave
    # into the new history once versions pass 7
    spark.createDataFrame([("stale",)], "g string").write.parquet(
        f"{alerts}/b7"
    )

    def run():
        q = streaming_fence_monitor_ingest(
            spark.readStream.schema("g string, x double").parquet(f"{inp}/*"),
            state, alerts, "g", "x",
            prob=0.75, breach_num=1, breach_den=4,
            checkpoint_dir=str(tmp_path / "ck"),
        )
        q.awaitTermination(120)

    run()
    v1 = stats_versions(state)[-1]
    cold = spark.read.parquet(f"{alerts}/b{v1}").collect()
    assert {r["status"] for r in cold} == {"no_baseline"}  # (1)
    assert {r["g"] for r in cold} == {"a", "b"}
    assert not os.path.isdir(f"{alerts}/b7")  # stale lifetime cleared

    # crash-orphan alerts for the NEXT version: must be overwritten (3)
    spark.createDataFrame(
        [("zzz", 1, None, None, 1, 1, 1, "alert", v1 + 1)],
        "g string, n_baseline long, fence_lo double, fence_hi double, "
        "n_batch long, n_above_hi long, n_above_lo long, status string, "
        "batch_version int",
    ).write.parquet(f"{alerts}/b{v1 + 1}")
    # ... and a far-future orphan load_fence_alerts must ignore (4)
    spark.createDataFrame(
        [("orphan",)], "g string"
    ).write.parquet(f"{alerts}/b99")

    spark.createDataFrame(b2, "g string, x double").coalesce(1).write.parquet(
        str(inp / "b2")
    )
    run()
    v2 = stats_versions(state)[-1]
    assert v2 == v1 + 1
    got = {
        r["g"]: r
        for r in spark.read.parquet(f"{alerts}/b{v2}").collect()
    }
    assert "zzz" not in got  # the orphan was overwritten, not appended
    want = {
        r["g"]: r
        for r in quantile_fence_alerts(
            quantile_cells_by(
                spark.createDataFrame(b1, "g string, x double"), "g", "x"
            ),
            spark.createDataFrame(b2, "g string, x double"),
            "g", "x", 0.75, 1, 4,
        ).collect()
    }
    for g, row in want.items():  # (2) streaming alerts == batch twin
        assert tuple(got[g])[:-1] == tuple(row), (g, got[g], row)
    assert got["a"]["status"] == "alert"  # 2/3 of batch above the p75
    assert got["b"]["status"] == "clear"

    hist = load_fence_alerts(spark, state, alerts)
    assert sorted(
        (r["batch_version"], r["g"]) for r in hist.collect()
    ) == sorted([(v1, "a"), (v1, "b"), (v2, "a"), (v2, "b")])


def test_streaming_fold_orphan_base_cleared_at_commit(spark, tmp_path):
    """Review-pass regression: a crash-orphaned compaction base m{k}
    with k ABOVE the committed version sequence (batch ids run ahead of
    versions whenever empty/pure-replay batches return early) must be
    cleared by the next commit — left in place it would lie dormant
    until the version counter reaches k and then shadow the true
    applied-file record as a stale base, re-folding old files."""
    import os

    from dbda_big_data_walmart_stores_analysis_prediction_spark.streaming.stats import (
        stats_versions,
    )

    inp = tmp_path / "in"
    spark.createDataFrame([("a",)] * 2, "k string").coalesce(1).write.parquet(
        str(inp / "b0")
    )
    state = str(tmp_path / "state")
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    # plant the orphan: a STALE cumulative base numbered ahead of the
    # version sequence (as if a compaction turn crashed before its v{k})
    spark.read.parquet(os.path.join(state, "d0")).limit(0).write.parquet(
        os.path.join(state, "m7")
    )

    spark.createDataFrame([("b",)] * 3, "k string").coalesce(1).write.parquet(
        str(inp / "b1")
    )
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    assert not os.path.isdir(os.path.join(state, "m7"))  # orphan cleared

    # and a fresh-checkpoint pure replay stays a no-op (the applied-file
    # record was never shadowed by the stale base)
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(state, f"v{stats_versions(state)[-1]}")
        ).collect()
    )
    q = _count_fold_ingest(
        spark.readStream.schema("k string").parquet(f"{inp}/*"),
        state, str(tmp_path / "ck_fresh"),
    )
    q.awaitTermination(120)
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(state, f"v{stats_versions(state)[-1]}")
        ).collect()
    )
    assert after == before == [("a", 2), ("b", 3)]
