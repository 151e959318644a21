"""End-to-end CLI test: the reference's three-stage orchestration
(etl → eda → model, Scripts/airflow_dag.py) through our subcommands."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from dbda_big_data_walmart_stores_analysis_prediction_spark.cli import main

FRIDAYS = [dt.date(2010, 2, 5) + dt.timedelta(weeks=i) for i in range(12)]


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("walmart_raw")
    (d / "stores.csv").write_text(
        "Store,Type,Size\n1,A,150000\n2,B,90000\n3,B,40000\n"
    )
    feat = ["Store,Date,Temperature,Fuel_Price,MarkDown1,MarkDown2,MarkDown3,MarkDown4,MarkDown5,CPI,Unemployment,IsHoliday"]
    for s in (1, 2, 3):
        for i, day in enumerate(FRIDAYS):
            md = "NA" if i < 4 else f"{100 + i}"
            feat.append(
                f"{s},{day.isoformat()},{40 + i},{2.7},{md},{md},{md},{md},{md},{210 + i},{7.1},"
                + ("TRUE" if i == 0 else "FALSE")
            )
    (d / "features.csv").write_text("\n".join(feat))
    train = ["Store,Dept,Date,Weekly_Sales,IsHoliday"]
    for s in (1, 2, 3):
        for dept in (1, 2):
            for i, day in enumerate(FRIDAYS[:10]):
                sales = 1000.0 * s + 37 * dept + 13 * i
                train.append(f"{s},{dept},{day.isoformat()},{sales},FALSE")
    train.append(f"1,1,{FRIDAYS[10].isoformat()},NA,FALSE")  # NA label -> dropped
    (d / "train.csv").write_text("\n".join(train))
    test = ["Store,Dept,Date,IsHoliday"]
    for s in (1, 2):
        test.append(f"{s},1,{FRIDAYS[11].isoformat()},FALSE")
    (d / "test.csv").write_text("\n".join(test))
    return d


def test_cli_three_stage_chain(spark, raw_dir, tmp_path, capsys):
    out = tmp_path / "out"
    main(
        [
            "etl",
            "--train", str(raw_dir / "train.csv"),
            "--test", str(raw_dir / "test.csv"),
            "--stores", str(raw_dir / "stores.csv"),
            "--features", str(raw_dir / "features.csv"),
            "--out", str(out),
        ]
    )
    merged = spark.read.parquet(str(out / "merged_train"))
    assert merged.count() == 60  # 61 rows minus the NA-label row
    assert "Weekly_Sales_roll4" in merged.columns
    assert "Year" in merged.columns  # partition column survives round-trip

    main(["eda", "--data", str(out / "merged_train")])
    eda_line = next(
        line for line in capsys.readouterr().out.splitlines() if line.startswith("{")
    )
    assert json.loads(eda_line)["n_rows"] == 60

    main(
        [
            "model",
            "--train", str(out / "merged_train"),
            "--test", str(out / "merged_test"),
            "--out", str(out),
        ]
    )
    model_line = next(
        line for line in capsys.readouterr().out.splitlines() if line.startswith("{")
    )
    assert "validation_r2" in json.loads(model_line)
    preds = spark.read.parquet(str(out / "test_predictions"))
    assert preds.count() == 2
    assert "prediction" in preds.columns


def test_cli_corpus_stage(spark, tmp_path, capsys):
    out = tmp_path / "corpus"
    main(
        [
            "corpus",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--langs", "en,de",
            "--min-quality", "0.2",
        ]
    )
    line = next(
        line for line in capsys.readouterr().out.splitlines() if line.startswith("{")
    )
    summary = json.loads(line)
    assert summary["out"] == str(out)
    assert {s["lang_pred"] for s in summary["by_lang"]} <= {"en", "de"}
    written = spark.read.parquet(str(out))
    assert written.count() == sum(s["n_docs"] for s in summary["by_lang"])
    assert "quality_score" in written.columns
