"""N-gram LM training + scoring (operators/lm.py — the CCNet-style
perplexity-proxy quality signal): hand-checked add-k math, OOV and
unseen-context paths, and a hypothesis property against an
independent Python reference. The q64 oracle branch re-derives the
same integer milli-nat scores in pure SQL."""

from __future__ import annotations

import math
import re

import pytest

from timeseries_data_provider_spark.operators import lm


def ref_score(train_texts, probe_texts, n=2, k=1.0):
    """Independent reference: dict-count train, per-token floored
    milli-nats — deliberately not the join formulation."""

    def words(t):
        return [x for x in re.split(r"\s+", t) if x]

    counts: dict = {}
    for t in train_texts.values():
        ws = words(t)
        for i in range(len(ws) - n + 1):
            key = (" ".join(ws[i : i + n - 1]), ws[i + n - 1])
            counts[key] = counts.get(key, 0) + 1
    ctx_tot: dict = {}
    for (c, _), v in counts.items():
        ctx_tot[c] = ctx_tot.get(c, 0) + v
    vocab = len({t for (_, t) in counts})
    out = {}
    for d, t in probe_texts.items():
        ws = words(t)
        total = hits = m = 0
        for i in range(len(ws) - n + 1):
            ctx = " ".join(ws[i : i + n - 1])
            tok = ws[i + n - 1]
            c = counts.get((ctx, tok), 0)
            cc = ctx_tot.get(ctx, 0)
            total += math.floor(1000 * math.log((c + k) / (cc + k * vocab)))
            hits += c > 0
            m += 1
        out[d] = (m, hits, total, math.floor(total / m) if m else None)
    return out


def spark_score(spark, train_texts, probe_texts, n=2, k=1.0):
    tdf = spark.createDataFrame(
        list(train_texts.items()), "doc_id long, text string"
    )
    pdf = spark.createDataFrame(
        list(probe_texts.items()), "doc_id long, text string"
    )
    model = lm.ngram_lm(tdf, n=n)
    return {
        r["doc_id"]: (
            r["n_ngrams"],
            r["n_hits"],
            r["logprob_milli"],
            r["avg_logprob_milli"],
        )
        for r in lm.ngram_lm_score(pdf, model, n=n, k=k).collect()
    }


def test_hand_checked_bigram_scores(spark):
    # train "a b a c": ab=1, ba=1, ac=1; ctx a=2, b=1; V=3
    # probe "a b z": (a,b) -> ln(2/5) -> -917; (b,z) OOV -> ln(1/4)
    # -> -1387; sum -2304, hits 1, avg floor(-2304/2) = -1152
    got = spark_score(spark, {0: "a b a c"}, {10: "a b z"})
    assert got[10] == (2, 1, -2304, -1152)
    assert got == {
        k: v for k, v in ref_score({0: "a b a c"}, {10: "a b z"}).items()
    }


def test_unseen_context_scores_pure_vocab_mass(spark):
    # probe bigram (q, r): context q never trained -> c=0, cc=0,
    # p = k/(k*V) = 1/V = 1/3 -> floor(1000*ln(1/3)) = -1099
    got = spark_score(spark, {0: "a b a c"}, {10: "q r"})
    assert got[10] == (1, 0, -1099, -1099)


def test_short_and_empty_docs_score_zero_ngrams(spark):
    got = spark_score(
        spark, {0: "a b c"}, {10: "solo", 11: "", 12: "a b"}
    )
    assert got[10] == (0, 0, 0, None)
    assert got[11] == (0, 0, 0, None)
    assert got[12][0] == 1  # one bigram, the (a, b) hit
    assert got[12][1] == 1


def test_unigram_model_n1(spark):
    # n=1: empty context; train "a a b": a=2, b=1; V=2; total mass 3
    # probe "a z": a -> ln(3/5) -> -511; z -> ln(1/5) -> -1610
    got = spark_score(spark, {0: "a a b"}, {10: "a z"}, n=1)
    assert got[10] == (2, 1, -511 + -1610, math.floor(-2121 / 2))
    assert got == ref_score({0: "a a b"}, {10: "a z"}, n=1)


def test_trigram_and_whitespace_runs(spark):
    train = {0: "x y z x y w", 1: "x\t y   z"}  # runs collapse
    probe = {10: "x y z", 11: "x y q"}
    assert spark_score(spark, train, probe, n=3) == ref_score(
        train, probe, n=3
    )


def test_add_k_smoothing_strength(spark):
    train = {0: "a b a b a c"}
    probe = {10: "a b"}
    weak = spark_score(spark, train, probe, k=0.1)[10]
    strong = spark_score(spark, train, probe, k=10.0)[10]
    # heavier smoothing pulls the seen bigram's probability toward
    # the uniform floor -> more negative milli-nats
    assert weak[2] > strong[2]
    assert spark_score(spark, train, probe, k=0.1) == ref_score(
        train, probe, k=0.1
    )


def test_bad_n_raises():
    import pandas as pd  # noqa: F401 — spark-independent guard

    with pytest.raises(ValueError, match="n must be"):
        lm.ngram_lm(None, n=0)


# --- property test vs the reference ----------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tok = st.sampled_from(["aa", "bb", "cc"])
_doc = st.lists(_tok, min_size=0, max_size=10).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_doc, min_size=1, max_size=3),
    st.lists(_doc, min_size=1, max_size=3),
    st.sampled_from([1, 2, 3]),
)
def test_property_scores_match_reference(spark, train, probe, n):
    train_texts = dict(enumerate(train))
    probe_texts = {100 + i: t for i, t in enumerate(probe)}
    # an empty model divides by zero vocab — the documented caller
    # error; only score when the train corpus has at least one n-gram
    if all(len(t.split()) < n for t in train_texts.values()):
        return
    assert spark_score(spark, train_texts, probe_texts, n=n) == ref_score(
        train_texts, probe_texts, n=n
    )
