"""Text primitives shared by the text-analysis and dedup operators.

All pure built-in expressions (codegen'd, no Python in the hot path), with
DuckDB-expressible semantics so every downstream operator stays
oracle-comparable:

* tokens:    ``split(trim(text), '\\s+')``
* shingles:  word k-grams joined by a single space
* hashes:    md5-derived int64 (functions/hashing.py)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def norm_text_col(text: Column | str) -> Column:
    """THE content-normalization every fingerprint/shingle/dedup operator
    keys on: lowercase, trim, collapse runs of whitespace to one space.
    One definition — the alignment between span offsets, fingerprints, and
    shingles across operators is structural, not copy-paste discipline.
    Splitting this on ``\\s+`` yields the same token BOUNDARIES as
    ``tokens_col`` (case differs), which is what lets `remove_token_spans`
    cut case-preserving tokens at offsets computed on normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def norm_words_col(text: Column | str) -> Column:
    """Words of the normalized text (`norm_text_col` split on its single
    spaces) with boundary empties filtered — THE word array the
    tokenizer-side operators (BPE word counts, DSIR gram builder) share.
    One definition for the same reason as `norm_text_col`: if empty-token
    or separator semantics ever change, every consumer moves together."""
    return F.filter(F.split(norm_text_col(text), " "), lambda x: x != "")


def shingles_col(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of ``text`` as an array<string>.

    Documents shorter than k words yield their full token string as the one
    shingle (so every doc has a non-empty shingle set).
    """
    w = tokens_col(text)
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, k), " "),
    )
    return F.array_distinct(grams)
