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


def test_merge_upsert_partitioned_prunes_and_preserves(spark, tmp_path):
    """The 100 TB refresh shape: only touched partitions are read and
    rewritten. Pins (1) pruned result == full-rewrite merge_upsert,
    (2) untouched partitions' files survive BYTE-identical, (3) the
    snapshot scan feeding the merge reads only touched partitions,
    (4) the contract errors (missing partition col, null partition,
    too-wide batch)."""
    import glob
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
        merge_upsert,
        merge_upsert_partitioned,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, f"p{i % 3}", f"body-{i}") for i in range(30)],
        "doc_id long, part string, body string",
    )
    base.repartition(2).write.partitionBy("part").parquet(snap)

    def file_digests(part):
        return {
            f: hashlib.md5(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(f"{snap}/part={part}/*.parquet"))
        }

    untouched_before = {p: file_digests(p) for p in ("p1", "p2")}

    updates = spark.createDataFrame(
        [(0, "p0", "EDITED"), (99, "p0", "NEW")],
        "doc_id long, part string, body string",
    )
    cols = ["doc_id", "part", "body"]
    want = sorted(
        tuple(r)
        for r in merge_upsert(
            spark.read.parquet(snap), updates, "doc_id"
        ).select(*cols).collect()
    )

    touched = merge_upsert_partitioned(spark, snap, updates, "doc_id", "part")
    assert touched == ["p0"]
    got = sorted(
        tuple(r) for r in spark.read.parquet(snap).select(*cols).collect()
    )
    assert got == want
    # untouched partitions: same files, same bytes
    assert {p: file_digests(p) for p in ("p1", "p2")} == untouched_before

    # the scan the merge consumed is partition-pruned (static isin
    # reaches the FileScan as a PartitionFilter)
    import re

    pruned = spark.read.parquet(snap).where(F.col("part").isin(["p0"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*part", plan), plan

    with pytest.raises(ValueError, match="missing the partition column"):
        merge_upsert_partitioned(
            spark, snap, updates.drop("part"), "doc_id", "part"
        )
    with pytest.raises(ValueError, match="NULL partition"):
        merge_upsert_partitioned(
            spark,
            snap,
            spark.createDataFrame(
                [(1, None, "x")], "doc_id long, part string, body string"
            ),
            "doc_id",
            "part",
        )
    with pytest.raises(ValueError, match="more than max_touched"):
        merge_upsert_partitioned(
            spark, snap, updates, "doc_id", "part", max_touched_partitions=0
        )
    # idempotent second apply: same updates, same result, p1/p2 untouched
    merge_upsert_partitioned(spark, snap, updates, "doc_id", "part")
    assert sorted(
        tuple(r) for r in spark.read.parquet(snap).select(*cols).collect()
    ) == want
    assert {p: file_digests(p) for p in ("p1", "p2")} == untouched_before


def test_merge_upsert_partitioned_recovers_mid_swap_crash(spark, tmp_path):
    """Review-pass regression: a crash BETWEEN the two swap renames
    leaves a partition absent from the snapshot with both copies in
    staging; the next run must restore it BEFORE its staging overwrite
    (which would otherwise destroy the only copies and silently drop
    the partition's non-updated rows). Also: URI-scheme snapshot dirs
    are rejected up front (the swap is local-rename based)."""
    import os
    import shutil

    import pytest

    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.maintenance import (
        merge_upsert_partitioned,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, f"p{i % 2}", f"body-{i}") for i in range(20)],
        "doc_id long, part string, body string",
    )
    base.repartition(2).write.partitionBy("part").parquet(snap)
    updates = spark.createDataFrame(
        [(0, "p0", "EDITED-1")], "doc_id long, part string, body string"
    )
    merge_upsert_partitioned(spark, snap, updates, "doc_id", "part")

    # simulate the mid-swap crash: partition p0 renamed ASIDE into a
    # fresh staging dir (old copy), its merged slice staged, snapshot
    # left with p0 missing — exactly the state after rename #1
    staging = snap + ".staging-merge"
    os.makedirs(staging, exist_ok=True)
    shutil.move(os.path.join(snap, "part=p0"), os.path.join(staging, "part=p0"))
    want_rows = sorted(
        tuple(r)
        for r in spark.createDataFrame(
            [(0, "p0", "EDITED-2")] + [(i, "p0", f"body-{i}") for i in range(2, 20, 2)]
            + [(i, "p1", f"body-{i}") for i in range(1, 20, 2)],
            "doc_id long, part string, body string",
        ).collect()
    )

    updates2 = spark.createDataFrame(
        [(0, "p0", "EDITED-2")], "doc_id long, part string, body string"
    )
    merge_upsert_partitioned(spark, snap, updates2, "doc_id", "part")
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(snap)
        .select("doc_id", "part", "body")
        .collect()
    )
    assert got == want_rows  # non-updated p0 rows survived the crash
    assert not os.path.isdir(staging)

    with pytest.raises(ValueError, match="URI scheme"):
        merge_upsert_partitioned(
            spark, "s3a://bucket/snap", updates, "doc_id", "part"
        )
