"""Stage-time decomposition of the tokenizer-family capstones (q98/q99/
q100): time each composition boundary in pipeline order with the noop
sink, so each increment ≈ that stage's first-materialization cost (the
lazy-checkpointed clean corpus is reused after its first action). For
the recipe-v2 capstone (q107) use the localCheckpoint-probe pattern in
OPTIMIZATION_r16.md instead — its boundaries live inside recipe_v2.

Usage: python scripts/stage_times_tokenizer.py [q98|q99|q100] [--reps 2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "q98"
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 2
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans import (
        QUERIES,
        northstar_queries as nq,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.tokenizer import (
        tokenizer_corpus,
        tokenizer_corpus_unigram,
    )
    from dbda_big_data_walmart_stores_analysis_prediction_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name=f"stage-times-{which}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    full_name = next(n for n in QUERIES if n.startswith(which + "_"))
    # warm once end to end (JIT/codegen; worker pool)
    noop(QUERIES[full_name](spark, SF_DIR))

    per_stage: dict[str, list[float]] = {}
    for _ in range(reps):
        spark.catalog.clearCache()
        docs = nq._t(spark, SF_DIR, "documents").select("doc_id", "text")
        out: dict = {}
        if which == "q98":
            pipe = lambda: tokenizer_corpus(
                docs, n_merges=0, budget=2048, n_shards=8, salt="tokpack",
                out=out,
            )
        elif which == "q99":
            pipe = lambda: tokenizer_corpus(
                docs, n_merges=60, budget=2048, n_shards=8, salt="tokpack",
                out=out,
            )
        elif which == "q100":
            pipe = lambda: tokenizer_corpus_unigram(
                docs, max_piece_len=1, em_iters=0, budget=2048, n_shards=8,
                salt="unipack", out=out,
            )
        else:
            raise SystemExit(f"unknown target {which}")
        t0 = time.perf_counter()
        packed = pipe()
        t1 = time.perf_counter()
        per_stage.setdefault("construct (train collect inside)", []).append(
            t1 - t0
        )
        spark.sparkContext.setJobDescription(f"{which}: clean materialize")
        noop(out["clean"])
        t2 = time.perf_counter()
        per_stage.setdefault("clean (score+langid+dedup+ckpt)", []).append(
            t2 - t1
        )
        spark.sparkContext.setJobDescription(f"{which}: encode")
        # counts_only twin of what the capstone runs (same boundary)
        from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.bpe import (
            bpe_encode,
        )
        from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.unigram import (
            unigram_encode,
        )

        if which in ("q98", "q99"):
            enc = bpe_encode(
                out["clean"], out["merges"], "text", "doc_id",
                counts_only=True,
            )
        else:
            enc = unigram_encode(
                out["clean"], out["vocab"], "text", "doc_id",
                counts_only=True,
            )
        noop(enc)
        t3 = time.perf_counter()
        per_stage.setdefault("encode (over warm checkpoint)", []).append(
            t3 - t2
        )
        spark.sparkContext.setJobDescription(f"{which}: full")
        noop(packed)
        t4 = time.perf_counter()
        per_stage.setdefault("full packed (warm checkpoint)", []).append(
            t4 - t3
        )
        spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "query": which,
                "stages": {
                    k: round(statistics.median(v), 3)
                    for k, v in per_stage.items()
                },
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
