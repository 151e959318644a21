"""Row-level semantics for snapshot maintenance operators
(operators/maintenance.py); q52's oracle covers the aggregate view."""

from __future__ import annotations

from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
    delete_keys,
    merge_upsert,
)


def _frames(spark):
    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)],
        "k int, name string, v double",
    )
    return current, updates


def test_merge_upsert_semantics(spark):
    current, updates = _frames(spark)
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(current, updates, "k").collect()}
    assert got == {
        1: ("a", 10.0),   # untouched survivor
        2: ("b2", 99.0),  # update wins on collision
        3: ("c", 30.0),   # untouched survivor
        4: ("d", 40.0),   # new key inserted
    }


def test_delete_keys_semantics(spark):
    current, _ = _frames(spark)
    tombstones = spark.createDataFrame([(1,), (3,), (99,)], "k int")
    got = {r["k"] for r in delete_keys(current, tombstones, "k").collect()}
    assert got == {2}


def test_compact_small_files(spark, tmp_path):
    """200 tiny files compact to the computed target count with identical
    row multiset."""
    import glob

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
        compact_small_files,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    df.repartition(200).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 200

    total = sum(
        __import__("os").path.getsize(p) for p in glob.glob(f"{src}/*.parquet")
    )
    n = compact_small_files(spark, src, dst, target_file_bytes=total // 3)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n <= 4
    got = sorted(r["k"] for r in spark.read.parquet(dst).collect())
    assert got == list(range(2000))


def test_snapshot_diff_semantics(spark):
    """All four statuses on one fixture, plus the null contracts: null
    content on both sides is 'unchanged' (null-safe fingerprints), a
    null appearing or disappearing is 'changed', and with multiple
    content columns the null takes a POSITIONAL sentinel — (null,'a')
    vs ('a',null) must be 'changed', not a concat_ws collision."""
    import pytest

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None), (6, "x")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None), (6, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",
        6: "changed",
    }

    old2 = spark.createDataFrame(
        [(1, None, "a")], "doc_id long, title string, body string"
    )
    new2 = spark.createDataFrame(
        [(1, "a", None)], "doc_id long, title string, body string"
    )
    got2 = {r["doc_id"]: r["status"] for r in snapshot_diff(old2, new2).collect()}
    assert got2 == {1: "changed"}

    with pytest.raises(ValueError, match="missing columns"):
        snapshot_diff(old, new.select("doc_id"), "doc_id", "text")
    with pytest.raises(ValueError, match="no shared non-key"):
        snapshot_diff(old.select("doc_id"), new.select("doc_id"))


def test_snapshot_diff_fingerprint_injection_proof(spark):
    """Per-column fixed-width digests make the fingerprint injective in
    the cell tuple: a delimiter-looking character INSIDE a value must
    not collide across column boundaries, and a value that looks like a
    null sentinel must differ from an actual null."""
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a\x1fb", "c"), (2, None, "x"), (3, "same", "same")],
        "doc_id long, title string, body string",
    )
    new = spark.createDataFrame(
        [(1, "a", "b\x1fc"), (2, "\x00null", "x"), (3, "same", "same")],
        "doc_id long, title string, body string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}
