"""Sequence packing: assign documents to fixed token-budget training bins.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 4096 tokens); the assignment of docs to sequences must be
deterministic so a rerun (or a resumed job) rebuilds byte-identical
batches. This is the distributed, reproducible version of that step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from dbda_big_data_walmart_stores_analysis_prediction_spark.functions.hashing import (
    md5_int64,
)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-token-window chunking with overlap — the RAG/pretraining
    prep step that turns long documents into model-sized pieces:
    ``(id, chunk_id, chunk_text, n_tokens)``, one row per window of
    ``size`` whitespace tokens advancing by ``size - overlap``. The last
    window is emitted as soon as it covers the tail (windows start while
    ``start < max(n - overlap, 1)``), so every token lands in ≥1 chunk,
    short docs yield exactly one chunk, and no chunk is a strict suffix
    of its predecessor.

    Shuffle-free: split once per doc, explode the window starts, build
    each chunk with ``slice`` + ``concat_ws`` — the same codegen
    generator pattern as `shingle_table`, scan-parallel at any corpus
    size.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), arr.alias("__w"), F.size(arr).alias("__n")
    )
    start = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("__n") - overlap, F.lit(1)) - 1,
            F.lit(stride),
        )
    )
    return base.select(id_col, "__w", "__n", start.alias("__s")).select(
        F.col(id_col),
        (F.col("__s") / stride).cast("bigint").alias("chunk_id"),
        F.concat_ws(" ", F.slice("__w", F.col("__s") + 1, size)).alias("chunk_text"),
        F.least(F.lit(size), F.col("__n") - F.col("__s")).cast("bigint").alias(
            "n_tokens"
        ),
    )


def _sharded_counts(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    tokens_col: str | None,
    n_shards: int,
    salt: str,
    op: str = "pack_sequences",
) -> DataFrame:
    """Shared pre-window base of the packing family:
    ``(id, n_tokens, __h, shard)`` with the eager column-contract
    validation — token counts resolved (precomputed column or inline
    whitespace count), the ``md5(salt:id)`` order key, and the hash
    shard. ``op`` names the public caller in contract errors."""
    if tokens_col is not None:
        if tokens_col not in df.columns:
            raise ValueError(
                f"{op}: tokens_col {tokens_col!r} is not a column "
                f"of the input frame (has {df.columns}); pass the frame "
                "that carries the precomputed token counts"
            )
        ntok = F.col(tokens_col)
    elif text_col is not None:
        if text_col not in df.columns:
            raise ValueError(
                f"{op}: text_col {text_col!r} is not a column of "
                f"the input frame (has {df.columns}); pass tokens_col for "
                "frames that carry counts but no text"
            )
        ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    else:
        raise ValueError(
            f"{op} needs tokens_col (precomputed counts) or "
            "text_col (inline whitespace count); both were None"
        )
    if id_col not in df.columns:
        raise ValueError(
            f"{op}: id_col {id_col!r} is not a column of the "
            f"input frame (has {df.columns})"
        )
    h = md5_int64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        h.alias("__h"),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
    )


def _packed_prior(
    df: DataFrame,
    id_col: str,
    text_col: str | None,
    tokens_col: str | None,
    budget: int,
    n_shards: int,
    salt: str,
) -> DataFrame:
    """Shared packing core: `pack_sequences`' public columns plus the
    internals its companions need — ``__h`` (the in-shard order key) and
    ``__prior`` (the cumulative token offset) — so `bin_manifest` derives
    in-bin ordering and offsets from the SAME computation instead of a
    re-implementation that could drift.

    Docs are hashed into ``n_shards`` shards, ordered within their shard by
    ``md5(salt:id)`` (reproducible shuffle), and packed by cumulative
    boundary: a doc's bin is ``floor(preceding_tokens / budget)``, i.e. the
    budget multiple its first token lands in. A doc that straddles a
    boundary stays in the bin it started (bins can exceed the budget by up
    to one doc's length) — the token-stream-chunking rule, not a
    strict-capacity bin packer. Everything is a pure function of the data,
    so reruns and differently-sized clusters produce identical bins.

    Scale shape: the only shuffle is the shard partitioning, and shards are
    the parallelism unit — each shard's window sort is independent, so
    ``n_shards`` ≳ cluster cores keeps every executor busy and bounds the
    per-task sort to ``rows / n_shards``. Packing quality loses nothing
    from sharding (bins never span shards by design — a training shard maps
    to a data-loader worker). ``tokens_col`` supplies precomputed token
    counts and makes ``text_col`` irrelevant (pass ``text_col=None`` for
    frames that carry counts but no text — e.g. the pretrain capstone's
    ``chosen ⋈ __n_clean_tokens`` join); otherwise whitespace tokens of
    ``text_col`` are counted inline. The column actually used
    (``tokens_col`` when given, else ``text_col``) is validated against
    ``df.columns`` eagerly — a dropped/renamed column fails here with the
    contract spelled out, not as a downstream AnalysisException on a
    column this function never needed.
    """
    base = _sharded_counts(df, id_col, text_col, tokens_col, n_shards, salt)
    # asc_nulls_last, not bare ASC: a null id hashes to a null __h (and a
    # null shard), and Spark's default NULLS FIRST would park it at the
    # head of the cumulative sum while the DuckDB oracles' ORDER BY
    # defaults NULLS LAST — the same cross-engine divergence class fixed
    # in sampling.hash_sample_per_group.
    in_shard = Window.partitionBy("shard").orderBy(
        F.asc_nulls_last("__h"), F.asc_nulls_last(id_col)
    )
    prior = F.coalesce(
        F.sum("n_tokens").over(in_shard.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return base.select(
        id_col,
        "shard",
        F.floor(prior / budget).alias("bin_id"),
        "n_tokens",
        "__h",
        prior.alias("__prior"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    budget: int = 512,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic contiguous packing: ``(id, shard, bin_id, n_tokens)``
    — see `_packed_prior` for the shared core; this public form drops the
    internal order/offset columns."""
    return _packed_prior(
        df, id_col, text_col, tokens_col, budget, n_shards, salt
    ).select(id_col, "shard", "bin_id", "n_tokens")


def bin_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    budget: int = 512,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Per-bin loading manifest for `pack_sequences`' assignment:
    ``(shard, bin_id, n_docs, bin_tokens, doc_ids, doc_offsets)`` with
    ``doc_ids`` the bin's documents IN CONCATENATION ORDER and
    ``doc_offsets`` each doc's token start offset within the bin — exactly
    what a data loader needs to build the packed sequence and its
    block-diagonal attention mask (document boundaries) without
    re-deriving the packing rule. Offsets are relative to the bin's first
    doc, so a bin whose opening doc straddled the previous budget boundary
    still starts at 0.

    Same parameters as `pack_sequences` and the same computation
    (`_packed_prior`), so ``zip(doc_ids, doc_offsets)`` agrees
    row-for-row with the flat assignment. Order inside the collected
    arrays is pinned by a row_number over (hash, id) with
    ``asc_nulls_last`` — the engine-portable ordering the packing family
    standardized on — collected as ``(rn, value)`` structs and
    array_sort'ed, the q58 sorted-array idiom (bare collect_list order is
    partition-dependent).

    Scale shape: ONE exchange — the packing family's shard shuffle.
    ``hashpartitioning(shard)`` already satisfies the ``(shard, bin_id)``
    clustering the manifest window and the final aggregate require (shard
    is a subset of their keys), so they add an in-partition re-sort, not
    a second shuffle (pinned by tests/test_plan_audit.py). Bins are
    budget-bounded (~one training sequence), so per-group collected state
    stays tiny at any corpus size.
    """
    p = _packed_prior(df, id_col, text_col, tokens_col, budget, n_shards, salt)
    in_bin = Window.partitionBy("shard", "bin_id")
    ordered = in_bin.orderBy(F.asc_nulls_last("__h"), F.asc_nulls_last(id_col))
    rows = p.select(
        "*",
        F.row_number().over(ordered).alias("__rn"),
        (F.col("__prior") - F.min("__prior").over(in_bin)).alias("__off"),
    )

    def _ordered_vals(col: str) -> F.Column:
        return F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__rn").alias("rn"), F.col(col).alias("v"))
                )
            ),
            lambda x: x["v"],
        )

    return rows.groupBy("shard", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        _ordered_vals(id_col).alias("doc_ids"),
        _ordered_vals("__off").alias("doc_offsets"),
    )


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    budget: int = 512,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Strict-capacity first-fit-decreasing packing:
    ``(id, shard, bin_id, n_tokens)`` where no bin exceeds ``budget``
    (a doc longer than the budget gets a bin of its own — the
    truncate-downstream case).

    `pack_sequences` is the token-stream-chunking rule: contiguous,
    window-only, but a bin can overshoot by one straddling doc and the
    stream order leaves padding when sequences must NOT cross doc
    boundaries. This is the padding-minimizing alternative training
    setups use when each bin is one fixed-length sequence: docs sort
    longest-first inside their shard and each takes the FIRST bin with
    room, the classic FFD heuristic (≤ 11/9·OPT + 6/9 bins).

    FFD is inherently stateful (open-bin residuals), so this is the
    engine's one ``applyInPandas`` operator: shards are hashed exactly
    like `pack_sequences` (same ``md5(salt:id)``), each shard's pack
    runs as one Arrow-batched group, and the result is a pure function
    of (data, salt) — the in-shard order is fully tied
    (n_tokens DESC, hash ASC, id ASC) so reruns and cluster shapes
    produce identical bins. No SQL twin exists (the sequential
    first-fit loop), so the registered query is rows-only, pinned by
    the from-scratch twin test instead.

    Scale shape: one shard exchange, then per-shard Python O(docs x
    open-bins) worst case — ``n_shards`` is the lever that bounds both
    the per-task memory (one shard's (id, count) pairs, ~16 bytes/doc)
    and the quadratic term; size it so shards hold ~1e5-1e6 docs.
    Null-text / null-count docs pack as 0 tokens LITERALLY: the count
    is coalesced to 0 before the in-shard ordering (they rank with the
    genuine 0-token docs, no NaN-last special case) and the output
    ``n_tokens`` is 0, not null. Null ids sort last within their ties
    and land in their own null shard.
    """
    base = _sharded_counts(
        df, id_col, text_col, tokens_col, n_shards, salt,
        op="pack_sequences_ffd",
    )
    id_field = next(f for f in base.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("shard", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def _ffd(pdf):
        # Null counts ARE 0 tokens, end to end: coalesce BEFORE the sort
        # (so null-count docs interleave with genuine 0-token docs under
        # one rule — count desc, hash, id — instead of a NaN-last special
        # case) and in the OUTPUT (the doc packed as 0; emitting null
        # while charging 0 would make the manifest arithmetic lie).
        pdf = pdf.assign(
            n_tokens=pdf["n_tokens"].fillna(0).astype("int64")
        ).sort_values(
            ["n_tokens", "__h", id_col],
            ascending=[False, True, True],
            na_position="last",
        )
        residual: list[int] = []
        bin_ids: list[int] = []
        for nt in pdf["n_tokens"]:
            n = int(nt)
            placed = -1
            for i, r in enumerate(residual):
                if r >= n:
                    placed = i
                    residual[i] = r - n
                    break
            if placed < 0:
                residual.append(max(budget - n, 0))
                placed = len(residual) - 1
            bin_ids.append(placed)
        out = pdf[[id_col, "shard", "n_tokens"]].copy()
        out["bin_id"] = bin_ids
        return out[[id_col, "shard", "bin_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(_ffd, out_schema)


def length_bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    boundaries: tuple[int, ...] = (64, 128, 256, 512),
    batch_size: int = 16,
    n_shards: int = 32,
    salt: str = "lbatch",
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-minimizing loader
    used when sequences must NOT be packed (SFT, reward-model training:
    one document per sequence, padded to the batch max). Docs go to the
    first length bucket that holds them (``bucket i`` ⇔ ``n_tokens <=
    boundaries[i]``, overflow bucket ``len(boundaries)`` above the last),
    are shuffled reproducibly within their (shard, bucket) by
    ``md5(salt:id)``, and grouped into fixed-size batches:
    ``(id, n_tokens, bucket, shard, batch_idx)`` — batch
    ``(shard, bucket, batch_idx)`` pads only to ITS bucket's ceiling,
    which is the whole point of bucketing.

    Deterministic for the same reason as `pack_sequences`: a pure
    function of (data, boundaries, batch_size, salt) — reruns and
    resumed jobs rebuild identical batches. Null token counts bucket as
    literal 0 (the FFD rule: nulls pack as zero-token docs, no NaN
    special case).

    Scale shape: ONE exchange. The window partitions by (shard, bucket),
    NOT bucket alone — a handful of global buckets would each become one
    executor-crushing sort task at 100 TB; sharding first keeps the
    parallelism unit ``n_shards × buckets`` and the per-task sort at
    ``rows / n_shards`` while costing nothing semantically (a training
    shard maps to a data-loader worker, exactly as in the packing
    family).
    """
    if not boundaries or any(
        b <= 0 or (i and b <= boundaries[i - 1])
        for i, b in enumerate(boundaries)
    ):
        raise ValueError(
            f"length_bucket_batches: boundaries must be positive and "
            f"strictly increasing, got {boundaries!r}"
        )
    if batch_size < 1:
        raise ValueError(
            f"length_bucket_batches: batch_size must be >= 1, got {batch_size}"
        )
    base = _sharded_counts(
        df, id_col, text_col, tokens_col, n_shards, salt,
        op="length_bucket_batches",
    )
    nt = F.coalesce(F.col("n_tokens"), F.lit(0))
    bucket = F.lit(len(boundaries))
    for i in reversed(range(len(boundaries))):
        bucket = F.when(nt <= boundaries[i], F.lit(i)).otherwise(bucket)
    in_bucket = Window.partitionBy("shard", "__bucket").orderBy(
        F.asc_nulls_last("__h"), F.asc_nulls_last(id_col)
    )
    return (
        base.select(
            F.col(id_col),
            nt.cast("bigint").alias("n_tokens"),
            bucket.cast("int").alias("__bucket"),
            "shard",
            "__h",
        )
        .select(
            id_col,
            "n_tokens",
            F.col("__bucket").alias("bucket"),
            "shard",
            F.floor((F.row_number().over(in_bucket) - 1) / batch_size).alias(
                "batch_idx"
            ),
        )
    )


def packing_budget_sweep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    budgets: tuple[int, ...] = (128, 512, 2048),
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """The sequence-length sizing report: for every candidate token
    budget, the padding and truncation cost of training at that length —
    the knee plot behind the "what max_seq_len do we train at" decision
    (`vocab_coverage_curve`'s sibling for the length axis). One row per
    budget:

    * ``n_sequences`` / ``padded_tokens`` / ``padding_fraction`` — the
      token-STREAM loader accounting (`pack_sequences`' semantics: each
      shard's stream fills ``ceil(T_shard / budget)`` fixed-length
      sequences, only the last is padded). Padding falls as budgets
      shrink.
    * ``n_docs_truncated`` / ``truncated_tokens`` — the cost of the
      boundary-respecting alternative (`pack_sequences_ffd` + truncate):
      docs longer than the budget lose their tail. Truncation falls as
      budgets grow. The knee where both are acceptable is the answer.

    Null token counts count 0 (the `pack_sequences_ffd` rule); docs are
    sharded exactly like the packers (``md5(salt:id) % n_shards``), so
    the sequence counts are the ones those packers' loaders will see.

    Scale shape: ONE exchange of (shard, count) rows — a hash aggregate
    with map-side combine carrying every per-budget conditional sum in
    the same pass — then arithmetic on a ≤ ``n_shards``-row frame. No
    window sort, no per-budget corpus pass: sweeping 20 budgets costs
    the same scan as sweeping one. All integer arithmetic (``div``, not
    double ceil), so counts are exact at any corpus size and the report
    is SQL-oracle-checkable bit-for-bit.
    """
    budgets = tuple(budgets)
    if not budgets or len(set(budgets)) != len(budgets):
        raise ValueError(
            f"budgets must be a non-empty set of distinct values, got "
            f"{budgets!r}"
        )
    if any(not isinstance(b, int) or isinstance(b, bool) for b in budgets):
        raise ValueError(
            f"budgets must be ints (the DIV arithmetic is exact-integer "
            f"by contract), got {budgets!r}"
        )
    if any(b <= 0 for b in budgets):
        raise ValueError(f"budgets must all be > 0, got {budgets!r}")
    base = _sharded_counts(
        df, id_col, text_col, tokens_col, n_shards, salt,
        op="packing_budget_sweep",
    )
    nt = F.coalesce(F.col("n_tokens"), F.lit(0))
    aggs = [
        F.sum(nt).alias("__T"),
        F.count("*").alias("__docs"),
    ]
    for i, b in enumerate(budgets):
        aggs.append(
            F.sum(F.greatest(nt - b, F.lit(0))).alias(f"__tr{i}")
        )
        aggs.append(F.sum((nt > b).cast("bigint")).alias(f"__ntr{i}"))
    per_shard = base.groupBy("shard").agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("bigint").alias("budget"),
                F.expr(f"CAST((__T + {b - 1}) DIV {b} AS BIGINT)").alias(
                    "nseq"
                ),
                F.col(f"__tr{i}").cast("bigint").alias("tr"),
                F.col(f"__ntr{i}").cast("bigint").alias("ntr"),
            )
            for i, b in enumerate(budgets)
        ]
    )
    ex = per_shard.select("__T", "__docs", F.explode(structs).alias("x"))
    out = ex.groupBy(F.col("x.budget").alias("budget")).agg(
        F.sum("x.nseq").cast("bigint").alias("n_sequences"),
        F.sum("__T").cast("bigint").alias("total_tokens"),
        F.sum("__docs").cast("bigint").alias("n_docs"),
        F.sum("x.ntr").cast("bigint").alias("n_docs_truncated"),
        F.sum("x.tr").cast("bigint").alias("truncated_tokens"),
    )
    seq_tokens = F.col("n_sequences") * F.col("budget")
    return out.select(
        "budget",
        "n_sequences",
        "total_tokens",
        (seq_tokens - F.col("total_tokens"))
        .cast("bigint")
        .alias("padded_tokens"),
        F.when(F.col("n_sequences") == 0, F.lit(0.0))
        .otherwise(
            F.round((seq_tokens - F.col("total_tokens")) / seq_tokens, 6)
        )
        .alias("padding_fraction"),
        "n_docs",
        "n_docs_truncated",
        "truncated_tokens",
    )
