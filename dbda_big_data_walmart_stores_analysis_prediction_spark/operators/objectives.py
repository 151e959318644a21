"""Training-objective data prep: span corruption (T5-style denoising) and
fill-in-the-middle (FIM) transforms.

Pretraining pipelines don't just clean and pack text — for denoising
(T5/UL2) and infilling (FIM) objectives they rewrite each example into an
(input, target) or reordered form *before* tokenization. Done with
`Dataset.map` in a single-node library, these are pure per-document
transforms; here they are declarative Spark plans so the rewrite runs
where the data lives and reruns are byte-identical (every random choice —
span starts, FIM selection and cut points — is a salted md5 of
``(doc_id, position)``, the same oracle-portable determinism as
``pack_sequences``' shuffle order).

No reference counterpart: the reference pipeline
(``Scripts/etl.py``/``model.py``) stops at tabular features; these
operators extend the engine's LLM-corpus surface (SURVEY.md north-star
scope) alongside packing/chunking (operators/packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbda_big_data_walmart_stores_analysis_prediction_spark.functions.hashing import (
    md5_int64,
)


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 3,
    start_denom: int = 20,
    salt: str = "span",
) -> DataFrame:
    """T5-style span corruption over whitespace tokens:
    ``(id, input_text, target_text, n_tokens, n_masked, n_spans)``.

    Each token position deterministically starts a mask span when
    ``md5(salt:id:i) % start_denom == 0``; a span covers ``span_len``
    tokens and overlapping spans merge (the classic "mean span length 3,
    ~span_len/start_denom corruption rate" shape, made exactly
    reproducible). ``input_text`` replaces each merged span with a
    ``<extra_id_k>`` sentinel (k numbered per doc in order); ``target_text``
    is the dropped tokens, each span prefixed by its sentinel — exactly the
    seq2seq denoising pair T5 trains on. Docs with null text are excluded
    (the `chunk_documents` convention); docs where no span fires come
    through unmasked with ``target_text = ''``.

    Scale shape: ONE exchange total. The explicit ``repartition(id)`` is
    the window's own hash requirement moved BEFORE the tokenize+explode, so
    the shuffle carries raw text (small) and the explode runs
    cluster-parallel; the per-token window stack (covered → span-start →
    sentinel number) shares a single sort, and the final ``groupBy(id)``
    reuses the same hash partitioning — Catalyst elides its exchange
    (pinned by tests/test_plan_audit.py). Reassembly is the
    collect-struct → array_sort → array_join idiom, all codegen; no UDF.
    """
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    if start_denom < 1:
        raise ValueError(f"start_denom must be >= 1, got {start_denom}")
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .repartition("__id")
        .select("__id", F.split(F.trim(F.col("__t")), r"\s+").alias("__w"))
    )
    # Bind the array, explode an index sequence, read the token with
    # element_at — the `_shingle_rows` idiom (never transform-over-inline-
    # split; CollapseProject re-inlines the regex per element).
    start_hash = md5_int64(
        F.concat(
            F.lit(f"{salt}:"),
            F.col("__id").cast("string"),
            F.lit(":"),
            F.col("__i").cast("string"),
        )
    )
    toks = base.select(
        "__id",
        "__w",
        F.explode(F.sequence(F.lit(0), F.size("__w") - 1)).alias("__i"),
    ).select(
        "__id",
        "__i",
        F.element_at("__w", F.col("__i") + 1).alias("__tok"),
        # null id → null hash → not-a-start (coalesce), matching the
        # oracle's CASE ... ELSE 0 three-valued-logic collapse.
        F.coalesce(
            (start_hash % start_denom == 0).cast("int"), F.lit(0)
        ).alias("__start"),
    )
    w_ord = Window.partitionBy("__id").orderBy("__i")
    covered = toks.select(
        "*",
        F.max("__start")
        .over(w_ord.rowsBetween(-(span_len - 1), 0))
        .alias("__cov"),
    )
    grouped = covered.select(
        "*",
        (
            (F.col("__cov") == 1) & (F.lag("__cov", 1, 0).over(w_ord) == 0)
        )
        .cast("int")
        .alias("__gs"),
    )
    sent = grouped.select(
        "*",
        F.sum("__gs")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__sent"),
    )
    sent_tag = F.concat(
        F.lit("<extra_id_"), (F.col("__sent") - 1).cast("string"), F.lit(">")
    )
    in_piece = F.when(F.col("__gs") == 1, sent_tag).when(
        F.col("__cov") == 0, F.col("__tok")
    )
    tgt_piece = F.when(
        F.col("__gs") == 1, F.concat(sent_tag, F.lit(" "), F.col("__tok"))
    ).when(F.col("__cov") == 1, F.col("__tok"))

    def _joined(piece: F.Column) -> F.Column:
        # when() without otherwise yields null structs, which collect_list
        # drops; array_sort orders by the leading __i field — ordered
        # string reassembly without a UDF or a second window pass.
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(F.col("__i").alias("i"), piece.alias("p")),
                        )
                    )
                ),
                lambda x: x["p"],
            ),
            " ",
        )

    return sent.groupBy("__id").agg(
        _joined(in_piece).alias("input_text"),
        _joined(tgt_piece).alias("target_text"),
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("__cov").cast("bigint").alias("n_masked"),
        F.max("__sent").cast("bigint").alias("n_spans"),
    ).withColumnRenamed("__id", id_col)


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_denom: int = 2,
    min_chars: int = 40,
    salt: str = "fim",
) -> DataFrame:
    """Character-level fill-in-the-middle rewrite (PSM order):
    ``(id, fim_text, is_fim, n_middle_chars)``.

    A doc is selected when ``md5(salt:sel:id) % rate_denom == 0`` and it
    has at least ``min_chars`` characters; two cut points are two more
    salted hashes mod ``len+1``, ordered. Selected docs become
    ``<PRE>prefix<SUF>suffix<MID>middle`` — the prefix-suffix-middle form
    infilling-capable code models train on, with character-level cuts as
    in the FIM recipe's document-level transform. Unselected (and
    null-text / null-id) docs pass through verbatim with ``is_fim=false``,
    so the output is a drop-in replacement for the corpus' text column at
    the configured FIM rate.

    Scale shape: a pure stateless projection — zero shuffle, zero explode,
    whole-stage codegen end to end (pinned by tests/test_plan_audit.py);
    cost is one scan regardless of cluster size.
    """
    if rate_denom < 1:
        raise ValueError(f"rate_denom must be >= 1, got {rate_denom}")
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    text = F.col(text_col)
    n = F.length(text)
    sid = F.col(id_col).cast("string")
    sel_hash = md5_int64(F.concat(F.lit(f"{salt}:sel:"), sid))
    # null id → null hash → null predicate → when() falls through and
    # coalesce reports false, matching the oracle's coalesce(..., FALSE).
    selected = text.isNotNull() & (n >= min_chars) & (sel_hash % rate_denom == 0)
    c1 = md5_int64(F.concat(F.lit(f"{salt}:c1:"), sid)) % (n + 1)
    c2 = md5_int64(F.concat(F.lit(f"{salt}:c2:"), sid)) % (n + 1)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    fim = F.concat(
        F.lit("<PRE>"),
        text.substr(F.lit(1), lo),
        F.lit("<SUF>"),
        text.substr(hi + 1, n - hi),
        F.lit("<MID>"),
        text.substr(lo + 1, hi - lo),
    )
    return df.select(
        F.col(id_col),
        F.when(selected, fim).otherwise(text).alias("fim_text"),
        F.coalesce(selected, F.lit(False)).alias("is_fim"),
        F.when(selected, hi - lo).otherwise(F.lit(0)).cast("bigint").alias(
            "n_middle_chars"
        ),
    )
