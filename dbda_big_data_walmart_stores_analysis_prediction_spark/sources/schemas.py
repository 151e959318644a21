"""Explicit schemas for every table the engine reads.

The reference reads all CSVs with ``inferSchema=True``
(``Scripts/etl.py:86-89``) — an extra full scan per file and fragile typing
(the ``"NA"`` sentinel silently turns float columns into strings). At 100 TB
inference is both a double-read and nondeterministic across dirty
partitions, so every reader here takes an explicit ``StructType``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --- Walmart-shaped tables (reference Data/Raw/*.csv; see FIXTURES.md §B) ---

WALMART_STORES_SCHEMA = StructType(
    [
        StructField("Store", IntegerType()),
        StructField("Type", StringType()),
        StructField("Size", IntegerType()),
    ]
)

# MarkDown1..5 / CPI / Unemployment carry the literal string "NA" as a null
# sentinel in the raw CSVs (reference Data/Raw/features.csv:2); readers pass
# nullValue="NA" so these land as typed-float NULLs in one pass instead of
# the reference's string-then-when/otherwise-cast detour (Scripts/etl.py:96-106).
WALMART_FEATURES_SCHEMA = StructType(
    [
        StructField("Store", IntegerType()),
        StructField("Date", DateType()),
        StructField("Temperature", DoubleType()),
        StructField("Fuel_Price", DoubleType()),
        StructField("MarkDown1", FloatType()),
        StructField("MarkDown2", FloatType()),
        StructField("MarkDown3", FloatType()),
        StructField("MarkDown4", FloatType()),
        StructField("MarkDown5", FloatType()),
        StructField("CPI", FloatType()),
        StructField("Unemployment", FloatType()),
        StructField("IsHoliday", BooleanType()),
    ]
)

WALMART_TRAIN_SCHEMA = StructType(
    [
        StructField("Store", IntegerType()),
        StructField("Dept", IntegerType()),
        StructField("Date", DateType()),
        StructField("Weekly_Sales", DoubleType()),
        StructField("IsHoliday", BooleanType()),
    ]
)

WALMART_TEST_SCHEMA = StructType(
    [
        StructField("Store", IntegerType()),
        StructField("Dept", IntegerType()),
        StructField("Date", DateType()),
        StructField("IsHoliday", BooleanType()),
    ]
)
