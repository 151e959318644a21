"""Walmart ETL pipeline — reference-parity semantics, scale-first plan.

Reproduces the reference ETL (``Scripts/etl.py:34-69,108-126``) exactly at
the semantic level:

* left-join train/test facts to ``stores`` (on Store) and ``features``
  minus its ambiguous IsHoliday (on Store, Date)  — ``Scripts/etl.py:35-36,108-109``
* median-impute numeric feature columns, mode-impute categorical/boolean —
  statistics computed POST-JOIN on the fact grain, and INDEPENDENTLY for
  train and test (a deliberate reference quirk: ``Scripts/etl.py:112-113``
  calls join_all per frame; real ML hygiene would reuse train stats —
  ``fit_stats``/``apply_stats`` expose the clean variant too)
* drop rows with NULL label (train only) — ``Scripts/etl.py:45-46``
* add Year/Month/WeekOfYear/DayOfWeek — ``Scripts/etl.py:49-52``
* lag1/lag4/trailing-roll4 of Weekly_Sales over (Store, Dept) ordered by
  Date, NULL→0 backfill — train only — ``Scripts/etl.py:56-67``

Plan differences from the reference (SURVEY.md §4 anti-patterns):
ONE approxQuantile call for all medians (not one job per column), ONE
aggregate for all modes (no global sorts), no ``coalesce(1)`` on write,
single ``select`` for derived columns (no withColumn chains).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark.functions.dates import (
    add_date_parts,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.cleaning import (
    compute_medians,
    compute_modes,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.joins import (
    star_join,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.windows import (
    add_lag_features,
    add_rolling_mean,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.io import (
    write_parquet,
)

NUMERIC_IMPUTE_COLS = [
    "Temperature",
    "Fuel_Price",
    "MarkDown1",
    "MarkDown2",
    "MarkDown3",
    "MarkDown4",
    "MarkDown5",
    "CPI",
    "Unemployment",
    # beyond the reference's list: a fact row whose Store is missing from
    # the dim leaves Size NULL after the left join, which the assembler
    # turns into a NaN feature vector the forest rejects. The reference's
    # data never hits this; real data does.
    "Size",
]
CATEGORICAL_IMPUTE_COLS = ["Type", "IsHoliday"]
LABEL = "Weekly_Sales"
LAG_COLS = ["Weekly_Sales_lag1", "Weekly_Sales_lag4", "Weekly_Sales_roll4"]


@dataclass
class ImputeStats:
    medians: dict[str, float] = field(default_factory=dict)
    modes: dict[str, Any] = field(default_factory=dict)


def fit_stats(
    joined: DataFrame, relative_error: float = 0.01
) -> ImputeStats:
    """Compute imputation statistics on a (post-join) frame: one sketch job
    for all medians + one aggregate job for all modes."""
    med_cols = [c for c in NUMERIC_IMPUTE_COLS if c in joined.columns]
    mode_cols = [c for c in CATEGORICAL_IMPUTE_COLS if c in joined.columns]
    return ImputeStats(
        medians=compute_medians(joined, med_cols, relative_error) if med_cols else {},
        modes=compute_modes(joined, mode_cols) if mode_cols else {},
    )


def apply_stats(df: DataFrame, stats: ImputeStats) -> DataFrame:
    fills = {**stats.medians, **stats.modes}
    fills = {k: v for k, v in fills.items() if k in df.columns}
    return df.fillna(fills) if fills else df


def join_and_impute(
    fact: DataFrame,
    stores: DataFrame,
    features: DataFrame,
    stats: ImputeStats | None = None,
) -> DataFrame:
    """Fact ⟕ stores ⟕ features(-IsHoliday), then impute.

    ``stats=None`` reproduces the reference's independent-stats behavior
    (compute on this frame); passing train stats gives the leak-free
    variant.
    """
    joined = star_join(
        fact,
        [(stores, "Store"), (features.drop("IsHoliday"), ["Store", "Date"])],
    )
    if stats is None:
        stats = fit_stats(joined)
    return apply_stats(joined, stats)


def add_features(df: DataFrame) -> DataFrame:
    """Date parts + (train-only) lag/rolling features, exactly the
    reference's guarded branch (``Scripts/etl.py:56-59``)."""
    out = add_date_parts(df, "Date")
    if LABEL in df.columns:
        out = out.na.drop(subset=[LABEL])
        out = add_lag_features(
            out, LABEL, ["Store", "Dept"], ["Date"], lags=(1, 4), fill=None
        )
        out = add_rolling_mean(
            out, LABEL, ["Store", "Dept"], ["Date"], n_rows=4, out_col=f"{LABEL}_roll4"
        )
        out = out.fillna({c: 0.0 for c in LAG_COLS})
    return out


def walmart_etl(
    train: DataFrame,
    test: DataFrame,
    stores: DataFrame,
    features: DataFrame,
    share_train_stats: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full reference-parity ETL for both frames.

    ``share_train_stats=True`` is the production-sane mode (impute test with
    train statistics); default False mirrors the reference.
    """
    merged_train = join_and_impute(train, stores, features, stats=None)
    if share_train_stats:
        stats = fit_stats(
            star_join(
                train,
                [(stores, "Store"), (features.drop("IsHoliday"), ["Store", "Date"])],
            )
        )
        merged_test = join_and_impute(test, stores, features, stats=stats)
    else:
        merged_test = join_and_impute(test, stores, features, stats=None)
    return add_features(merged_train), add_features(merged_test)


def run_and_write(
    train: DataFrame,
    test: DataFrame,
    stores: DataFrame,
    features: DataFrame,
    out_train: str,
    out_test: str,
) -> None:
    """ETL + partitioned parquet sinks (natural parallelism, partitioned by
    Year for downstream pruning — replaces the reference's coalesce(1))."""
    merged_train, merged_test = walmart_etl(train, test, stores, features)
    write_parquet(merged_train, out_train, partition_by=["Year"])
    write_parquet(merged_test, out_test, partition_by=["Year"])
