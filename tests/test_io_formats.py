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
