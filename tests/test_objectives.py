"""Training-objective transforms (operators/objectives.py) pinned by
from-scratch pure-Python twins.

The capstone pin-test pattern: the reference implementations below
DELIBERATELY use different machinery (hashlib md5 + Python string ops vs
the engine's SQL conv(md5) + window/aggregate plans) and assert every
output column exactly — agreement is then evidence of semantics, not of
shared code.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.objectives import (
    fim_transform,
    span_corruption,
)

# Nasty-by-construction fixture: boundary whitespace (split yields '' edge
# tokens), single token, empty text, unicode, regex metacharacters, a long
# doc so spans actually merge, and a null-text doc (must be excluded by
# span_corruption, passed through by fim_transform).
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "  leading and trailing  spaces  "),
    (3, "single"),
    (4, ""),
    (5, "café naïve résumé über alles x² tokens"),
    (6, "a (b) [c] {d} .* +? ^$ | \\ tokens with regex metacharacters here"),
    (7, " ".join(f"tok{i}" for i in range(60))),
    (8, None),
]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _naive_span_corruption(doc_id, text, span_len, denom, salt):
    toks = re.split(r"\s+", text.strip())
    starts = [
        _md5_60(f"{salt}:{doc_id}:{i}") % denom == 0 for i in range(len(toks))
    ]
    covered = [
        any(starts[max(0, i - span_len + 1) : i + 1]) for i in range(len(toks))
    ]
    in_parts, tgt_parts, n_spans = [], [], 0
    for i, tok in enumerate(toks):
        if covered[i] and (i == 0 or not covered[i - 1]):
            tag = f"<extra_id_{n_spans}>"
            n_spans += 1
            in_parts.append(tag)
            tgt_parts.append(f"{tag} {tok}")
        elif covered[i]:
            tgt_parts.append(tok)
        else:
            in_parts.append(tok)
    return {
        "input_text": " ".join(in_parts),
        "target_text": " ".join(tgt_parts),
        "n_tokens": len(toks),
        "n_masked": sum(covered),
        "n_spans": n_spans,
    }


def _naive_fim(doc_id, text, denom, min_chars, salt):
    if text is None:
        return {"fim_text": None, "is_fim": False, "n_middle_chars": 0}
    n = len(text)
    sel = n >= min_chars and _md5_60(f"{salt}:sel:{doc_id}") % denom == 0
    if not sel:
        return {"fim_text": text, "is_fim": False, "n_middle_chars": 0}
    c1 = _md5_60(f"{salt}:c1:{doc_id}") % (n + 1)
    c2 = _md5_60(f"{salt}:c2:{doc_id}") % (n + 1)
    lo, hi = min(c1, c2), max(c1, c2)
    fim = f"<PRE>{text[:lo]}<SUF>{text[hi:]}<MID>{text[lo:hi]}"
    return {"fim_text": fim, "is_fim": True, "n_middle_chars": hi - lo}


@pytest.mark.parametrize("span_len,denom", [(3, 20), (1, 1), (5, 3)])
def test_span_corruption_pinned_by_naive_reference(spark, span_len, denom):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in span_corruption(
            df, span_len=span_len, start_denom=denom, salt="pin"
        ).collect()
    }
    assert sorted(out) == [d for d, t in DOCS if t is not None]
    for doc_id, text in DOCS:
        if text is None:
            continue
        want = _naive_span_corruption(doc_id, text, span_len, denom, "pin")
        got = {k: v for k, v in out[doc_id].items() if k != "doc_id"}
        assert got == want, f"doc {doc_id}: {got} != {want}"


def test_span_corruption_denom1_masks_everything(spark):
    # denom=1 → every token starts a span → one merged span per doc:
    # input is a lone sentinel and the target replays the whole doc.
    df = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    for r in span_corruption(df, start_denom=1, salt="pin").collect():
        assert r["input_text"] == "<extra_id_0>"
        assert r["n_spans"] == 1
        assert r["n_masked"] == r["n_tokens"]


@pytest.mark.parametrize("denom,min_chars", [(2, 40), (1, 1), (3, 10)])
def test_fim_pinned_by_naive_reference(spark, denom, min_chars):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in fim_transform(
            df, rate_denom=denom, min_chars=min_chars, salt="pin"
        ).collect()
    }
    assert sorted(out) == [d for d, _ in DOCS]  # pass-through keeps all rows
    for doc_id, text in DOCS:
        want = _naive_fim(doc_id, text, denom, min_chars, "pin")
        got = {k: v for k, v in out[doc_id].items() if k != "doc_id"}
        assert got == want, f"doc {doc_id}: {got} != {want}"


def test_fim_reassembles_to_original(spark):
    # PSM is a permutation: prefix+middle+suffix recovered from the tagged
    # form must equal the source text for every selected doc.
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    src = dict(DOCS)
    for r in fim_transform(df, rate_denom=1, min_chars=1, salt="pin").collect():
        if not r["is_fim"]:
            continue
        m = re.fullmatch(
            r"<PRE>(.*)<SUF>(.*)<MID>(.*)", r["fim_text"], flags=re.DOTALL
        )
        assert m, r["fim_text"]
        assert m.group(1) + m.group(3) + m.group(2) == src[r["doc_id"]]


def test_objectives_validation():
    import pyspark.sql  # noqa: F401  (df unused — validation is eager)

    with pytest.raises(ValueError, match="span_len"):
        span_corruption(None, span_len=0)
    with pytest.raises(ValueError, match="start_denom"):
        span_corruption(None, start_denom=0)
    with pytest.raises(ValueError, match="rate_denom"):
        fim_transform(None, rate_denom=0)
    with pytest.raises(ValueError, match="min_chars"):
        fim_transform(None, min_chars=0)
