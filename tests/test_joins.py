"""Unit semantics for operators/joins.py::asof_join (q45's oracle parity
covers the bulk path; these pin the edge semantics DuckDB can't express as
cleanly: exact-timestamp ties, tolerance horizon, and output-name clashes)."""

from __future__ import annotations

import datetime as dt

import pytest

from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.joins import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"), (2, _ts(5), "d")],
        "k int, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(15), 20.0), (3, _ts(0), 99.0)],
        "k int, rts timestamp, rv double",
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts", right_cols=["rv"])
    got = {r["tag"]: r["rv"] for r in out.collect()}
    # exact tie at 12:00 matches (inclusive); 12:10 sees 12:00; 12:20 sees
    # 12:15; key 2 has no right rows at all -> NULL.
    assert got == {"a": 10.0, "b": 10.0, "c": 20.0, "d": None}
    assert out.count() == left.count()


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["rv"], tolerance_seconds=300,
    )
    got = {r["tag"]: r["rv"] for r in out.collect()}
    # 12:10 is 600s after 12:00 -> staler than the 300s horizon -> nulled.
    assert got == {"a": 10.0, "b": None, "c": 20.0, "d": None}


def test_asof_name_clash_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumnRenamed("tag", "rv"), right,
            on="k", left_ts="lts", right_ts="rts", right_cols=["rv"],
        )
