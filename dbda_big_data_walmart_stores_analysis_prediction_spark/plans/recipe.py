"""Recipe v2 — the round-10 operator families composed end to end.

The q87 pretrain capstone proved the CLEANING/DEDUP families compose
(clean → near-dup collapse → mix → pack); nothing yet proved the
round-9/10 surface — decontamination, epoch-weighted upsampling, trained
tokenizers with shipped artifacts, objective transforms, strict-capacity
packing, loading manifests — survives composition. Those hand-offs are
exactly where a real user hits the first untested seam: the composite
(doc, copy) identity that upsampling introduces must flow through the
objective transform's selection hashes AND the packer's shard/order
hashes without colliding copies back together; the tokenizer must be
trained on the DECONTAMINATED corpus but encode the POST-objective text;
packing must budget on the encoder's accounting of that rewritten text.

Stage chain (`recipe_v2`):

1. **Clean** — the q56 configuration (quality ≥ ``min_quality``,
   language gate, exact dedup), shared verbatim with the tokenizer
   capstones (`plans.tokenizer._clean_corpus`), carrying the source
   stratum through for stage 3.
2. **Decontaminate** — exact 13-gram audit against the eval frame
   (`operators.dedup.ngram_overlap_pairs`, the q68 plan: raw train gram
   stream semi-joined map-side against the broadcast eval set), then an
   anti-join drops every flagged train doc. Runs BEFORE the epoch mix so
   a contaminated doc cannot leak via any of its copies, and before
   tokenizer training so eval text cannot vote merge statistics.
3. **Epoch mix** — `operators.sampling.repeat_by_weight` realizes the
   "source s at w_s epochs" recipe (floor(w) copies + md5-Bernoulli
   fractional copy, each tagged ``copy_id``). Each copy becomes its own
   unit keyed ``"<id>#<copy_id>"`` — the composite identity every
   downstream per-doc hash (FIM selection, pack shard/order) draws on,
   so copies of one doc diverge deterministically instead of packing
   into the same sequence.
4. **Objective** — `operators.objectives.fim_transform` rewrites each
   unit to ``<PRE>…<SUF>…<MID>…`` at the configured rate (selection and
   cut points hash the UNIT id: epoch copies of a doc are independently
   selected — the mixture-aware form of the FIM recipe).
5. **Tokenize** — the tokenizer is TRAINED on the decontaminated corpus
   (pre-mix, pre-objective: epochs must not double-vote and sentinel
   strings must not enter the vocabulary), optionally round-tripped
   through the S5 artifact sink/source (`save_tokenizer_artifact` /
   `load_tokenizer_artifact` — the cross-cluster ship a real pipeline
   performs), then applied to the POST-objective text via
   `encode_with_artifact(counts_only=True)`.
6. **Pack + manifest** — `pack_sequences`/`bin_manifest` (contiguous,
   SQL-replicable) or `pack_sequences_ffd` (strict-capacity) on the
   encoder's real token accounting, keyed by the composite unit id.

Scale shape at 100 TB: stages 1-2 are the audited q56/q68 plans (staged
regex projections, one dedup hash shuffle, broadcast-eval semi-join —
the corpus never shuffles on a gram); stages 3-4 are zero-shuffle
codegen projections; stage 5's training half aggregates to a bounded
vocabulary head and the encode half is a broadcast-model Arrow
projection; stage 6 shuffles once on the shard key (the manifest's
window/aggregate reuse that exchange). Two full-data shuffles end to
end — dedup's and the packer's — plus the decontam gram-stream combine.

Reference parity note: the reference pipeline
(``Scripts/etl.py``/``model.py``, 489 lines) has no tokenizer/objective
surface; this module is north-star scope (SURVEY.md §2 extensions), the
composition layer over operators the driver already oracles
individually (q68, q104, q103, q98, q105, q106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbda_big_data_walmart_stores_analysis_prediction_spark.operators import (
    dedup as dd,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.bpe import (
    train_bpe,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.objectives import (
    fim_transform,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.packing import (
    bin_manifest,
    pack_sequences,
    pack_sequences_ffd,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.sampling import (
    repeat_by_weight,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.tokenizer import (
    _clean_corpus,
    encode_with_artifact,
    load_tokenizer_artifact,
    save_tokenizer_artifact,
)

UNIT_SEP = "#"


def recipe_v2(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    *,
    weights: dict[str, float],
    default_weight: float = 1.0,
    min_quality: float = 0.3,
    keep_langs: tuple[str, ...] = ("en",),
    decontam_n: int = 13,
    max_doc_freq: int | None = 10_000,
    epoch_salt: str = "epoch",
    fim_rate_denom: int = 2,
    fim_min_chars: int = 40,
    fim_salt: str = "fim",
    n_merges: int = 0,
    min_pair_count: int = 2,
    max_vocab_rows: int = 1_000_000,
    budget: int = 2048,
    n_shards: int = 8,
    pack_salt: str = "rv2pack",
    packer: str = "contiguous",
    emit: str = "manifest",
    artifact_path: str | None = None,
    out: dict | None = None,
) -> DataFrame:
    """Run the composed recipe-v2 pipeline (module docstring has the
    stage chain). ``packer`` is ``"contiguous"`` (`pack_sequences`, the
    SQL-replicable rule) or ``"ffd"`` (strict capacity); ``emit`` is
    ``"manifest"`` (per-bin loading manifest — contiguous only, the
    data-loader contract) or ``"assignment"`` (flat
    ``(unit_id, shard, bin_id, n_tokens)``). ``artifact_path``, when
    given, round-trips the trained tokenizer through the S5 parquet
    sink/source before encoding — the cross-cluster hand-off a shipped
    tokenizer actually takes. ``out`` receives internals
    (``clean``/``safe``/``mixed``/``objective``/``model``/``counted``)
    for instrumented tests; no plan effect.

    Registered as q107 (oracled end to end at the zero-merge point — the
    q98 argument: every stage including the encoder's real accounting of
    the FIM-rewritten text replicates in SQL) and q108 (trained merges +
    artifact round-trip + FFD packing; rows-only, twin-pinned).

    Single-action assumption at ``n_merges=0``: the zero-merge trainer
    short-circuits, so the decontaminated corpus is NOT checkpointed and
    the returned frame's lineage re-runs clean+decontam on every action;
    callers issuing multiple actions on the zero-merge result should
    pass ``out={}``, which restores the checkpoint by adding consumers.
    """
    if packer not in ("contiguous", "ffd"):
        raise ValueError(f"packer must be 'contiguous' or 'ffd', got {packer!r}")
    if emit not in ("manifest", "assignment"):
        raise ValueError(f"emit must be 'manifest' or 'assignment', got {emit!r}")
    if packer == "ffd" and emit == "manifest":
        raise ValueError(
            "bin_manifest describes the contiguous packing rule; FFD bins "
            "have no concatenation-order manifest — use emit='assignment'"
        )

    # 1. clean (q56 config), source stratum riding through
    clean = _clean_corpus(
        docs, id_col, text_col, min_quality, keep_langs, keep_cols=(strata_col,)
    )
    # 2. 13-gram decontamination: flagged train docs drop entirely.
    #    The flagged sliver is tiny (matches ≤ eval-adjacent docs), so AQE
    #    plans the anti-join as a broadcast — the corpus never shuffles.
    flagged = (
        dd.ngram_overlap_pairs(
            clean.select(id_col, text_col),
            eval_docs,
            id_col,
            text_col,
            n=decontam_n,
            max_doc_freq=max_doc_freq,
        )
        .select(F.col("doc_train").alias(id_col))
        .distinct()
    )
    # two consumers (tokenizer trainer + epoch mix) — cut the clean+audit
    # lineage once, the _clean_corpus convention. At the zero-merge point
    # the trainer short-circuits before touching data, leaving ONE
    # downstream scan: checkpointing there writes the whole decontaminated
    # corpus to the block manager for nobody to re-read (skip it unless
    # the ``out`` hook adds consumers).
    safe = clean.join(flagged, id_col, "left_anti")
    if n_merges > 0 or out is not None:
        safe = safe.localCheckpoint(eager=False)
    # 3. epoch-weighted upsampling; composite unit identity per copy
    mixed = repeat_by_weight(
        safe, strata_col, weights, id_col, default_weight, salt=epoch_salt
    )
    units = mixed.select(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(UNIT_SEP),
            F.col("copy_id").cast("string"),
        ).alias("unit_id"),
        F.col(text_col),
    )
    # 4. FIM objective over units (copies select independently)
    objective = fim_transform(
        units,
        "unit_id",
        text_col,
        rate_denom=fim_rate_denom,
        min_chars=fim_min_chars,
        salt=fim_salt,
    )
    # 5. train on the decontaminated corpus; optionally ship the artifact
    #    through the S5 sink/source; encode the POST-objective text
    model = train_bpe(
        safe,
        text_col,
        n_merges=n_merges,
        min_pair_count=min_pair_count,
        max_vocab_rows=max_vocab_rows,
    )
    if artifact_path is not None:
        save_tokenizer_artifact(model, artifact_path)
        model = load_tokenizer_artifact(docs.sparkSession, artifact_path)
    counted = encode_with_artifact(
        objective.select("unit_id", "fim_text"),
        model,
        "fim_text",
        "unit_id",
        counts_only=True,
    )
    if out is not None:
        out.update(
            clean=clean,
            safe=safe,
            mixed=mixed,
            objective=objective,
            model=model,
            counted=counted,
        )
    # 6. pack on the encoder's accounting, keyed by the composite unit id
    if packer == "ffd":
        return pack_sequences_ffd(
            counted,
            "unit_id",
            text_col=None,
            tokens_col="n_subword_tokens",
            budget=budget,
            n_shards=n_shards,
            salt=pack_salt,
        )
    if emit == "assignment":
        return pack_sequences(
            counted,
            "unit_id",
            text_col=None,
            tokens_col="n_subword_tokens",
            budget=budget,
            n_shards=n_shards,
            salt=pack_salt,
        )
    return bin_manifest(
        counted,
        "unit_id",
        text_col=None,
        tokens_col="n_subword_tokens",
        budget=budget,
        n_shards=n_shards,
        salt=pack_salt,
    )
