"""Round-trip fidelity for the non-parquet source/sink formats
(sources/io.py): schema and values must survive write→read."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark.sources import io as sio
from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.catalog import (
    load_star_table,
)
from tests.conftest import SF_SMOKE


def _orders(spark):
    return load_star_table(spark, SF_SMOKE, "orders")


def _assert_same(a, b, sort_key="o_orderkey"):
    assert a.schema == b.schema
    ra = [tuple(r) for r in a.orderBy(sort_key).collect()]
    rb = [tuple(r) for r in b.orderBy(sort_key).collect()]
    assert ra == rb


def test_json_roundtrip(spark):
    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        sio.write_json(orders, f"{d}/o")
        back = sio.read_json(spark, f"{d}/o", orders.schema)
        _assert_same(orders, back)


def test_orc_roundtrip(spark):
    orders = _orders(spark)
    with tempfile.TemporaryDirectory() as d:
        sio.write_orc(orders, f"{d}/o")
        back = sio.read_orc(spark, f"{d}/o")
        _assert_same(orders, back)


def test_csv_roundtrip_with_null_sentinel(spark):
    # nulls pass through the "NA" sentinel both ways
    orders = _orders(spark).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
            F.col("o_orderpriority")
        ),
    )
    assert orders.where(F.col("o_orderpriority").isNull()).count() > 0
    with tempfile.TemporaryDirectory() as d:
        sio.write_csv(orders, f"{d}/o")
        back = sio.read_csv(spark, f"{d}/o", orders.schema)
        _assert_same(orders, back)


def test_orc_partitioned_write_prunes(spark):
    orders = _orders(spark).withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    with tempfile.TemporaryDirectory() as d:
        sio.write_orc(orders, f"{d}/o", partition_by=["o_year"])
        back = sio.read_orc(spark, f"{d}/o")
        one_year = back.where(F.col("o_year") == 1995)
        plan = one_year._jdf.queryExecution().executedPlan().toString()
        assert one_year.count() == orders.where(F.col("o_year") == 1995).count()
        # partition filter must reach the scan, not a post-scan Filter
        assert "PartitionFilters: [isnotnull(o_year" in plan


def test_read_media_dir_binary_source(spark, tmp_path):
    from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.io import (
        read_media_dir,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01\x02payload-a")
    (d / "b.bin").write_bytes(b"payload-b")
    (d / "skip.txt").write_text("not media")
    df = read_media_dir(spark, str(d), glob="*.bin", media_type="video/raw")
    rows = {bytes(r["payload"]): r for r in df.collect()}
    assert set(rows) == {b"\x00\x01\x02payload-a", b"payload-b"}
    for payload, r in rows.items():
        assert r["n_bytes"] == len(payload)
        assert r["media_type"] == "video/raw"
    # the media schema feeds straight into the multimodal feature stage
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.multimodal import (
        extract_features,
    )

    feats = extract_features(df.drop("source_path")).collect()
    assert len(feats) == 2 and all(f["byte_entropy"] > 0 for f in feats)


def test_read_text_corpus_lines_and_whole(spark, tmp_path):
    from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.io import (
        read_text_corpus,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "one.txt").write_text("alpha beta\n\ngamma delta\n")
    (d / "two.txt").write_text("alpha beta\n")
    lines = read_text_corpus(spark, str(d))
    texts = [r["text"] for r in lines.collect()]
    assert sorted(texts) == ["alpha beta", "alpha beta", "gamma delta"]
    # identical lines share a doc_id (content-hash ids)
    ids = {r["text"]: set() for r in lines.collect()}
    for r in lines.collect():
        ids[r["text"]].add(r["doc_id"])
    assert all(len(v) == 1 for v in ids.values())
    whole = read_text_corpus(spark, str(d), whole_files=True)
    assert whole.count() == 2
