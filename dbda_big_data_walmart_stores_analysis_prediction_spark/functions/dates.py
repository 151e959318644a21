"""Date-part feature functions (SURVEY.md §2.8 F1-F2).

Reference semantics (``Scripts/etl.py:49-52``): Year, Month,
WeekOfYear (ISO week), DayOfWeek (Sunday=1 — Spark's convention; DuckDB's
``dayofweek`` is Sunday=0, so oracle SQL must add 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_part_columns(date_col: str | Column) -> dict[str, Column]:
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "Year": F.year(c),
        "Month": F.month(c),
        "WeekOfYear": F.weekofyear(c),
        "DayOfWeek": F.dayofweek(c),
    }


def add_date_parts(df: DataFrame, date_col: str = "Date", prefix: str = "") -> DataFrame:
    """Add Year/Month/WeekOfYear/DayOfWeek in ONE ``select`` (the reference
    chains four ``withColumn`` calls, growing the plan linearly —
    ``Scripts/etl.py:49-52``; a single projection keeps analysis O(1))."""
    parts = date_part_columns(date_col)
    return df.select(
        "*", *(col.alias(f"{prefix}{name}") for name, col in parts.items())
    )
