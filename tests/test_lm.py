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


# ---------------------------------------------------------------------------
# Interpolated modified Kneser-Ney


def ref_kn_model(train_texts, n=3):
    """Independent reference estimator: dict counts, same public
    formulas (Chen & Goodman 1999), deliberately not the DataFrame
    formulation."""

    def words(t):
        return [x for x in re.split(r"\s+", t) if x]

    tables = {}  # order -> {(ctx, tok): cnt}
    top = {}
    for t in train_texts.values():
        ws = words(t)
        for i in range(len(ws) - n + 1):
            key = (" ".join(ws[i : i + n - 1]), ws[i + n - 1])
            top[key] = top.get(key, 0) + 1
    tables[n] = top
    for k in range(n - 1, 0, -1):
        cont: dict = {}
        for (ctx, tok) in tables[k + 1]:
            first, _, rest = ctx.partition(" ")
            cont.setdefault((rest if k > 1 else "", tok), set()).add(first)
        tables[k] = {key: len(s) for key, s in cont.items()}
    model = {"n": n, "tables": tables, "ctx": {}, "discounts": {}}
    for k in range(1, n + 1):
        stats: dict = {}
        coc: dict = {}
        for (ctx, _), c in tables[k].items():
            s = stats.setdefault(ctx, [0, 0, 0, 0])  # total,n1,n2,n3p
            s[0] += c
            s[1] += c == 1
            s[2] += c == 2
            s[3] += c >= 3
            if c <= 4:
                coc[c] = coc.get(c, 0) + 1
        model["ctx"][k] = stats
        model["discounts"][k] = lm._kn_discounts(coc)
    model["vocab"] = len({t for (_, t) in tables[1]})
    return model


def ref_kn_prob(model, context, tok):
    n = model["n"]
    ws = context.split(" ") if context else []
    p = 1.0 / (model["vocab"] + 1)
    for k in range(1, n + 1):
        ctx = " ".join(ws[len(ws) - (k - 1) :]) if k > 1 else ""
        stats = model["ctx"][k].get(ctx)
        if stats is None:
            continue
        total, n1, n2, n3p = stats
        d1, d2, d3 = model["discounts"][k]
        c = model["tables"][k].get((ctx, tok), 0)
        disc = d3 if c >= 3 else (d2 if c == 2 else (d1 if c == 1 else 0.0))
        gamma = (d1 * n1 + d2 * n2 + d3 * n3p) / total
        p = max(c - disc, 0.0) / total + gamma * p
    return p


KN_TRAIN = {
    1: "the cat sat on the mat",
    2: "the cat ate the fish on the mat",
    3: "a dog sat on a log near the mat",
    4: "the dog and the cat sat still",
}


def _kn_models(spark, n=3):
    tdf = spark.createDataFrame(
        list(KN_TRAIN.items()), "doc_id long, text string"
    )
    return lm.kneser_ney_lm(tdf, n=n), ref_kn_model(KN_TRAIN, n=n)


def test_kn_continuation_counts_hand_checked(spark):
    # corpus "a b", "c b", "a d": unigram continuation counts are the
    # DISTINCT-predecessor counts (Kneser-Ney's novel-continuation
    # statistic), not raw frequencies
    tdf = spark.createDataFrame(
        [(1, "a b"), (2, "c b"), (3, "a d")], "doc_id long, text string"
    )
    model = lm.kneser_ney_lm(tdf, n=2)
    uni = {
        r["tok"]: r["cnt"] for r in model["tables"][0].collect()
    }
    assert uni == {"b": 2, "d": 1}
    bi = {
        (r["context"], r["tok"]): r["cnt"]
        for r in model["tables"][1].collect()
    }
    assert bi == {("a", "b"): 1, ("c", "b"): 1, ("a", "d"): 1}


def test_kn_matches_reference_model(spark):
    model, ref = _kn_models(spark)
    for k in range(1, 4):
        got = {
            (r["context"], r["tok"]): r["cnt"]
            for r in model["tables"][k - 1].collect()
        }
        assert got == ref["tables"][k]
        assert model["discounts"][k - 1] == pytest.approx(
            ref["discounts"][k], abs=0.0
        )
    assert model["vocab"] == ref["vocab"]


def test_kn_prob_matches_reference_and_sums_to_one(spark):
    model, ref = _kn_models(spark)
    vocab = sorted({r["tok"] for r in model["tables"][0].collect()})
    contexts = ["the cat", "on the", "zz qq", "the zz", "sat on"]
    pairs = spark.createDataFrame(
        [(c, t) for c in contexts for t in vocab + ["__unseen__"]],
        "context string, tok string",
    )
    got = {
        (r["context"], r["tok"]): r["p"]
        for r in lm.kneser_ney_prob(pairs, model).collect()
    }
    for (c, t), p in got.items():
        assert p == pytest.approx(ref_kn_prob(ref, c, t), rel=1e-12)
        assert 0.0 < p <= 1.0
    # the distribution over V + the one implicit unseen slot sums to 1
    for c in contexts:
        s = sum(got[(c, t)] for t in vocab) + got[(c, "__unseen__")]
        assert s == pytest.approx(1.0, abs=1e-9)


def test_kn_unseen_context_backs_off(spark):
    model, ref = _kn_models(spark)
    pairs = spark.createDataFrame(
        [("zz qq", "the"), ("xx the", "cat")], "context string, tok string"
    )
    got = {
        (r["context"], r["tok"]): r["p"]
        for r in lm.kneser_ney_prob(pairs, model).collect()
    }
    # fully unseen context: trigram and bigram levels pass through,
    # so p equals the unigram-level interpolation
    assert got[("zz qq", "the")] == pytest.approx(
        ref_kn_prob(ref, "", "the"), rel=1e-12
    )
    # context whose SUFFIX "the" is a seen bigram context: the bigram
    # level contributes even though the trigram context is novel
    assert got[("xx the", "cat")] == pytest.approx(
        ref_kn_prob(ref, "xx the", "cat"), rel=1e-12
    )
    assert got[("xx the", "cat")] > got[("zz qq", "the")] * 0  # defined


def test_kn_score_matches_reference(spark):
    model, ref = _kn_models(spark)
    probe = {10: "the cat sat on the mat", 11: "zz qq", 12: ""}
    pdf = spark.createDataFrame(
        list(probe.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_ngrams"], r["logprob_milli"], r["avg_logprob_milli"]
        )
        for r in lm.kneser_ney_score(pdf, model).collect()
    }

    def words(t):
        return [x for x in re.split(r"\s+", t) if x]

    for d, t in probe.items():
        ws = words(t)
        grams = [
            (" ".join(ws[i : i + 2]), ws[i + 2])
            for i in range(len(ws) - 2)
        ]
        n_g, lp = len(grams), 0
        for c, tok in grams:
            lp += math.floor(1000 * math.log(ref_kn_prob(ref, c, tok)))
        if n_g:
            # per-token floors may straddle an integer boundary when
            # JVM and libm ln() differ in the last ulp — allow 1 per
            # token, require exact n-gram counts
            assert got[d][0] == n_g
            assert abs(got[d][1] - lp) <= n_g
        else:
            assert got[d] == (0, 0, None)


def test_kn_degenerate_corpora_guarded(spark):
    # every n-gram occurs twice: t1 = 0 at the top order — the
    # discount fallback must keep everything finite and in range
    tdf = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c a b c")],
        "doc_id long, text string",
    )
    model = lm.kneser_ney_lm(tdf, n=3)
    for d1, d2, d3 in model["discounts"]:
        assert 0.0 <= d1 <= 1.0 and 0.0 <= d2 <= 2.0 and 0.0 <= d3 <= 3.0
    pairs = spark.createDataFrame(
        [("a b", "c"), ("q q", "q")], "context string, tok string"
    )
    for r in lm.kneser_ney_prob(pairs, model).collect():
        assert 0.0 < r["p"] <= 1.0
    with pytest.raises(ValueError):
        lm.kneser_ney_lm(tdf, n=1)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(list("abcdef")), min_size=3, max_size=12
        ),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=3),
)
def test_property_kn_matches_reference(spark, docs_tokens, n):
    """Random tiny corpora: the distributed KN estimator's tables,
    discounts, and probabilities all equal the independent Python
    reference (probabilities to 1e-12 relative)."""
    train = {
        i: " ".join(ws) for i, ws in enumerate(docs_tokens)
    }
    tdf = spark.createDataFrame(
        list(train.items()), "doc_id long, text string"
    )
    model = lm.kneser_ney_lm(tdf, n=n)
    ref = ref_kn_model(train, n=n)
    for k in range(1, n + 1):
        got = {
            (r["context"], r["tok"]): r["cnt"]
            for r in model["tables"][k - 1].collect()
        }
        assert got == ref["tables"][k], (k, got)
        assert model["discounts"][k - 1] == ref["discounts"][k]
    # probe a handful of (context, tok) pairs incl. unseen ones
    vocab = sorted({t for ws in docs_tokens for t in ws}) or ["a"]
    ctxs = [
        " ".join(docs_tokens[0][: n - 1]),
        " ".join(["zz"] * (n - 1)),
    ]
    pairs = spark.createDataFrame(
        [(c, t) for c in ctxs for t in vocab[:3] + ["__unseen__"]],
        "context string, tok string",
    )
    for r in lm.kneser_ney_prob(pairs, model).collect():
        want = ref_kn_prob(ref, r["context"], r["tok"])
        assert r["p"] == pytest.approx(want, rel=1e-12), (
            r["context"], r["tok"],
        )


def test_perplexity_buckets(spark):
    scored = spark.createDataFrame(
        [(i, -100 * i) for i in range(1, 10)] + [(99, None)],
        "doc_id long, avg_logprob_milli long",
    )
    got = {
        r["doc_id"]: (r["bucket_idx"], r["bucket"])
        for r in lm.perplexity_buckets(scored).collect()
    }
    # scores -100..-900: head = highest (least negative) third
    assert got[1] == (0, "head") and got[3] == (0, "head")
    assert got[4] == (1, "middle") and got[6] == (1, "middle")
    assert got[7] == (2, "tail") and got[9] == (2, "tail")
    assert got[99] == (2, "tail")  # NULL -> last bucket, stated
    with pytest.raises(ValueError):
        lm.perplexity_buckets(scored, n_buckets=1)
    with pytest.raises(ValueError):
        lm.perplexity_buckets(scored, n_buckets=4)
