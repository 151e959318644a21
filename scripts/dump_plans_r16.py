"""Dump `.explain("formatted")` for the round-16 touched queries into
plans/r16/<query>_<tag>.txt, plus exchange/node counts on stderr.

The registered query plans truncate at localCheckpoint boundaries (the
lineage above a checkpoint executes at plan construction and shows as a
LogicalRDD scan), so for the checkpoint-bearing capstones this also dumps
an UNTRUNCATED variant built with checkpoints disabled — the honest
"before" lineage VERDICT r15 item 10 demands.

Usage: python scripts/dump_plans_r16.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)

DEFAULT = [
    "q69_line_dedup",
    "q70_web_corpus_pipeline",
    "q87_pretrain_capstone",
    "q87_pretrain_capstone:nocuts",
    "q107_recipe_v2_capstone",
    "q125_corpus_funnel",
    "q56_corpus_prep",
    "q76_quality_model_scores",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from dbda_big_data_walmart_stores_analysis_prediction_spark import get_spark
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans import (
        QUERIES,
    )

    spark = get_spark(app_name=f"plans_r16_{tag}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for spec in names:
        name, _, variant = spec.partition(":")
        if variant == "nocuts":
            df = QUERIES[name](spark, SF_DIR, cuts=frozenset())
            fname = f"{name.split('_')[0]}_nocuts_{tag}.txt"
        else:
            df = QUERIES[name](spark, SF_DIR)
            fname = f"{name.split('_')[0]}_{tag}.txt"
        txt = plan_text(df)
        with open(os.path.join(OUT_DIR, fname), "w") as f:
            f.write(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        n_reuse = len(re.findall(r"ReusedExchange", txt))
        n_sort = len(re.findall(r"\bSort\b", txt))
        n_join = len(re.findall(r"Join\b", txt))
        print(
            f"{spec}: {n_ex} Exchange ({n_reuse} reused), {n_sort} Sort, "
            f"{n_join} Join nodes -> {fname}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
