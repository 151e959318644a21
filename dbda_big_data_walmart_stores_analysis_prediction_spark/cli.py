"""spark-submit style entry points mirroring the reference's three-stage
orchestration (``Scripts/airflow_dag.py``: etl → eda → model), minus the
Airflow dependency: each stage is a subcommand sharing one session factory,
chained by any scheduler or invoked standalone.

    python -m dbda_big_data_walmart_stores_analysis_prediction_spark.cli etl \
        --train t.csv --test s.csv --stores st.csv --features f.csv --out out/
    python -m ... eda   --data out/merged_train
    python -m ... model --train out/merged_train --test out/merged_test --out out/
"""

from __future__ import annotations

import argparse
import json
import sys

from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark
from dbda_big_data_walmart_stores_analysis_prediction_spark.sources import (
    WALMART_FEATURES_SCHEMA,
    WALMART_STORES_SCHEMA,
    WALMART_TEST_SCHEMA,
    WALMART_TRAIN_SCHEMA,
    read_csv,
)


def _etl(args: argparse.Namespace) -> None:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.walmart_etl import (
        run_and_write,
    )

    spark = get_spark(app_name="walmart-etl")
    run_and_write(
        read_csv(spark, args.train, WALMART_TRAIN_SCHEMA),
        read_csv(spark, args.test, WALMART_TEST_SCHEMA),
        read_csv(spark, args.stores, WALMART_STORES_SCHEMA),
        read_csv(spark, args.features, WALMART_FEATURES_SCHEMA),
        f"{args.out}/merged_train",
        f"{args.out}/merged_test",
    )


def _eda(args: argparse.Namespace) -> None:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.eda_report import (
        eda_report,
    )

    spark = get_spark(app_name="walmart-eda")
    df = spark.read.parquet(args.data)
    numeric = [c for c, t in df.dtypes if t in ("double", "float")][:8]
    facets = tuple(
        c for c in (args.facet_cols or "").split(",") if c and c in df.columns
    )
    report = eda_report(
        df,
        value_col=args.value_col,
        numeric_cols=numeric,
        group_col=args.group_col,
        facet_cols=facets,
    )
    print(json.dumps({"n_rows": report.n_rows, "outliers": report.outlier_count}))
    report.describe.show(truncate=False)
    report.top_groups.show(truncate=False)
    if getattr(args, "plots_dir", None):
        from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.viz import (
            save_plots,
        )

        try:
            written = save_plots(report, args.plots_dir)
            print(json.dumps({"plots": written}))
        except ImportError as e:
            print(json.dumps({"plots_error": str(e)}))


def _model(args: argparse.Namespace) -> None:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.ml_pipeline import (
        backfill_lag_columns,
        cast_booleans,
        fit_predict,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.walmart_etl import (
        LAG_COLS,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.io import (
        write_parquet,
    )

    spark = get_spark(app_name="walmart-model")
    train_df = spark.read.parquet(args.train)
    tr, val = train_df.randomSplit([0.8, 0.2], seed=42)
    tuned, preds = fit_predict(tr, val)
    print(json.dumps({"validation_r2": tuned.r2}))
    write_parquet(preds, f"{args.out}/validation_predictions")
    if args.test:
        test_df = backfill_lag_columns(spark.read.parquet(args.test), LAG_COLS)
        out = tuned.model.transform(cast_booleans(test_df))
        write_parquet(
            out.select(*test_df.columns, "prediction"),
            f"{args.out}/test_predictions",
        )
    tuned.model.write().overwrite().save(f"{args.out}/model")


def _corpus(args: argparse.Namespace) -> None:
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.corpus_prep import (
        corpus_summary,
        prepare_training_corpus,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.sources.io import (
        write_parquet,
    )

    spark = get_spark(app_name="corpus-prep")
    docs = spark.read.parquet(args.input)
    corpus = prepare_training_corpus(
        docs,
        min_quality=args.min_quality,
        keep_langs=tuple(args.langs.split(",")),
        near_dup_threshold=args.near_dup_threshold,
        max_doc_freq=args.max_doc_freq or None,
    )
    write_parquet(corpus, args.out)
    summary = [r.asDict() for r in corpus_summary(corpus).collect()]
    print(json.dumps({"out": args.out, "by_lang": summary}))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="dbda-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="join + impute + feature-engineer, write parquet")
    for name in ("train", "test", "stores", "features", "out"):
        etl.add_argument(f"--{name}", required=True)
    etl.set_defaults(fn=_etl)

    eda = sub.add_parser("eda", help="full-data EDA aggregates")
    eda.add_argument("--data", required=True)
    eda.add_argument("--value-col", default="Weekly_Sales")
    eda.add_argument("--group-col", default="Store")
    eda.add_argument(
        "--facet-cols",
        default="",
        help="comma-separated extra grouping columns for per-facet box summaries",
    )
    eda.add_argument(
        "--plots-dir",
        default=None,
        help="write PNG figures of the aggregate frames here (S8; needs matplotlib)",
    )
    eda.set_defaults(fn=_eda)

    model = sub.add_parser("model", help="fit, evaluate, predict, save")
    model.add_argument("--train", required=True)
    model.add_argument("--test")
    model.add_argument("--out", required=True)
    model.set_defaults(fn=_model)

    corpus = sub.add_parser(
        "corpus",
        help="filter + dedup a raw document table into a training corpus",
    )
    corpus.add_argument("--input", required=True, help="parquet with doc_id, text")
    corpus.add_argument("--out", required=True)
    corpus.add_argument("--min-quality", type=float, default=0.3)
    corpus.add_argument("--langs", default="en", help="comma-separated lang codes")
    corpus.add_argument("--near-dup-threshold", type=float, default=0.5)
    corpus.add_argument(
        "--max-doc-freq",
        type=int,
        default=10_000,
        help="stop-shingle doc-frequency cap (0 disables)",
    )
    corpus.set_defaults(fn=_corpus)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
