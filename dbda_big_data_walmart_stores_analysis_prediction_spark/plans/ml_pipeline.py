"""MLlib regression pipeline — reference parity for SURVEY.md §2.11 ML1-ML7.

Mirrors ``Scripts/model.py`` semantics with its known bug fixed and its
serial-fit anti-pattern removed:

* StringIndexer per string categorical (``handleInvalid='keep'``,
  frequencyDesc) — ``Scripts/model.py:24-25``
* VectorAssembler over the numeric + indexed features with a DEDUPED input
  list (the reference appends lag columns twice —
  ``Scripts/model.py:77``, proven by the 24-entry inputCols metadata;
  we dedupe) — ``Scripts/model.py:27-35``
* RandomForestRegressor(seed=42) + 3-fold CrossValidator over the
  {numTrees, maxDepth, minInstancesPerNode} grid with ``parallelism``
  exposed (reference leaves the default 1 ⇒ 82 serial fits) —
  ``Scripts/model.py:38,89-103``
* R² RegressionEvaluator — ``Scripts/model.py:96``
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_EXCLUDE = ("Weekly_Sales", "Date")


def feature_columns(
    df: DataFrame, label: str = "Weekly_Sales", exclude: tuple[str, ...] = DEFAULT_EXCLUDE
) -> tuple[list[str], list[str]]:
    """(numeric_cols, string_cols) for the assembler — deduped, ordered as in
    the frame (fixes the reference's duplicated lag columns,
    ``Scripts/model.py:77``)."""
    numeric, strings = [], []
    for name, dtype in df.dtypes:
        if name in exclude or name == label:
            continue
        if dtype == "string":
            strings.append(name)
        elif dtype in ("int", "bigint", "smallint", "tinyint", "double", "float", "boolean"):
            numeric.append(name)
    return numeric, strings


def build_pipeline(
    df: DataFrame,
    label: str = "Weekly_Sales",
    n_trees: int = 50,
    max_depth: int = 5,
    seed: int = 42,
) -> Pipeline:
    numeric, strings = feature_columns(df, label)
    indexers = [
        StringIndexer(
            inputCol=c,
            outputCol=f"{c}_idx",
            handleInvalid="keep",
            stringOrderType="frequencyDesc",
        )
        for c in strings
    ]
    # booleans assemble directly; cast once so the assembler sees doubles
    inputs = numeric + [f"{c}_idx" for c in strings]
    assembler = VectorAssembler(inputCols=inputs, outputCol="features", handleInvalid="keep")
    rf = RandomForestRegressor(
        labelCol=label,
        featuresCol="features",
        numTrees=n_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    return Pipeline(stages=[*indexers, assembler, rf])


def cast_booleans(df: DataFrame) -> DataFrame:
    """VectorAssembler rejects boolean columns; cast them to double in one
    projection (the reference's data sneaks through because IsHoliday gets
    mode-imputed into a boolean column that Spark 3.3 still accepted)."""
    bools = [c for c, t in df.dtypes if t == "boolean"]
    if not bools:
        return df
    return df.select(
        *[
            F.col(c).cast("double").alias(c) if c in bools else F.col(c)
            for c in df.columns
        ]
    )


@dataclass
class TunedModel:
    model: PipelineModel
    r2: float


def tune(
    train: DataFrame,
    label: str = "Weekly_Sales",
    grid_trees: tuple[int, ...] = (50, 100, 150),
    grid_depth: tuple[int, ...] = (5, 10, 15),
    grid_min_instances: tuple[int, ...] = (1, 2, 4),
    n_folds: int = 3,
    seed: int = 42,
    parallelism: int = 4,
) -> CrossValidator:
    """CV tuner over the reference's 3x3x3 grid (``Scripts/model.py:89-103``)
    with parallel fits (the reference's default parallelism=1 runs its 82
    fits serially)."""
    train = cast_booleans(train)
    pipeline = build_pipeline(train, label, seed=seed)
    rf = pipeline.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, list(grid_trees))
        .addGrid(rf.maxDepth, list(grid_depth))
        .addGrid(rf.minInstancesPerNode, list(grid_min_instances))
        .build()
    )
    evaluator = RegressionEvaluator(
        labelCol=label, predictionCol="prediction", metricName="r2"
    )
    return CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=parallelism,
    )


def fit_predict(
    train: DataFrame,
    val: DataFrame,
    label: str = "Weekly_Sales",
    seed: int = 42,
    n_trees: int = 20,
    max_depth: int = 5,
) -> tuple[TunedModel, DataFrame]:
    """Single fit + validation R² + predictions (the smoke-test path; CV
    tuning is ``tune`` for the full reference workload)."""
    train_c, val_c = cast_booleans(train), cast_booleans(val)
    model = build_pipeline(train_c, label, n_trees, max_depth, seed).fit(train_c)
    preds = model.transform(val_c)
    r2 = RegressionEvaluator(
        labelCol=label, predictionCol="prediction", metricName="r2"
    ).evaluate(preds)
    return TunedModel(model=model, r2=r2), preds.select(*val.columns, "prediction")


def feature_importances(model: PipelineModel) -> list[tuple[str, float]]:
    """(feature, importance) pairs from the fitted forest, sorted by
    importance desc with names recovered from the assembler's inputCols —
    the model-inspection surface the reference computes but never exposes
    (importances live only inside its saved model metadata)."""
    assembler = next(
        s for s in model.stages if isinstance(s, VectorAssembler)
    )
    rf = model.stages[-1]
    names = assembler.getInputCols()
    pairs = list(zip(names, (float(v) for v in rf.featureImportances)))
    return sorted(pairs, key=lambda p: (-p[1], p[0]))


def backfill_lag_columns(df: DataFrame, lag_cols: list[str]) -> DataFrame:
    """Test frames lack label-derived lag features; backfill with 0 literals
    (reference ``Scripts/model.py:123-126``)."""
    missing = [c for c in lag_cols if c not in df.columns]
    return df.select("*", *[F.lit(0.0).alias(c) for c in missing])
