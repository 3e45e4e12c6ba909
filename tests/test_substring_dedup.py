"""Substring-level exact dedup (dedup.substring_spans /
substring_dedup_clean, VERDICT r6 item 8 — ExactSubstr design):
planted templated-paragraph detection with closed-form span
boundaries, an independent covered-set Python reference, and the
removal contract."""

from __future__ import annotations

import pytest

from timeseries_data_provider_spark.operators import dedup


def ref_spans(texts, k, cross_doc_only=True, min_count=2):
    """Independent reference: duplicated windows -> COVERED token
    positions (union of [p, p+k-1]) -> maximal contiguous covered
    runs. Deliberately not the islands formulation the operator uses."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    occ = {}
    for d, ws in toks.items():
        for p in range(1, len(ws) - k + 2):
            occ.setdefault(" ".join(ws[p - 1 : p - 1 + k]), []).append(
                (d, p)
            )
    dup = {
        w
        for w, o in occ.items()
        if (
            len({d for d, _ in o}) >= 2
            if cross_doc_only
            else len(o) >= min_count
        )
    }
    out = []
    for d, ws in toks.items():
        dup_pos = sorted(
            p
            for p in range(1, len(ws) - k + 2)
            if " ".join(ws[p - 1 : p - 1 + k]) in dup
        )
        covered = sorted(
            {t for p in dup_pos for t in range(p, p + k)}
        )
        spans = []
        for t in covered:
            if spans and t == spans[-1][1] + 1:
                spans[-1][1] = t
            else:
                spans.append([t, t])
        for sid, (a, b) in enumerate(spans, 1):
            nw = sum(1 for p in dup_pos if a <= p and p + k - 1 <= b)
            out.append((d, sid, a, b, b - a + 1, nw))
    return sorted(out)


def spark_spans(spark, texts, k, **kw):
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    return sorted(
        tuple(r)
        for r in dedup.substring_spans(df, k=k, **kw).collect()
    )


def test_planted_template_paragraph(spark):
    # the q23 plant: shared 6-token prefix (all docs), unique token,
    # class paragraph of 4+(id%5) tokens, unique tail — k=4 yields
    # exactly spans [1,6] and [8, 11+(id%5)]
    texts = {}
    for i in range(10):
        c = i % 5
        para = " ".join(f"m{c}x{j}" for j in range(4 + c))
        texts[i] = f"s0 s1 s2 s3 s4 s5 x{i} {para} y{i}"
    got = spark_spans(spark, texts, k=4)
    want = []
    for i in range(10):
        c = i % 5
        want.append((i, 1, 1, 6, 6, 3))
        want.append((i, 2, 8, 11 + c, 4 + c, c + 1))
    assert got == sorted(want)
    assert got == ref_spans(texts, 4)


def test_adjacent_intervals_merge_to_one_coverage_span(spark):
    # doc 0/1 share tokens 1-3 AND 4-6 via different partners; the
    # two k=3 windows at pos 1 and 4 are adjacent (4 == 1 + 3), so
    # coverage [1,6] is ONE span
    texts = {
        0: "a b c d e f",
        1: "a b c zzz qq rr",
        2: "ww vv uu d e f",
    }
    got = spark_spans(spark, texts, k=3)
    assert (0, 1, 1, 6, 6, 2) in got
    assert got == ref_spans(texts, 3)


def test_within_doc_repetition_needs_cross_doc_only_false(spark):
    texts = {0: "p q r s zz p q r s", 1: "unrelated words here now"}
    assert spark_spans(spark, texts, k=4) == []
    got = spark_spans(spark, texts, k=4, cross_doc_only=False)
    assert got == ref_spans(texts, 4, cross_doc_only=False)
    assert {(r[0], r[2], r[3]) for r in got} == {(0, 1, 4), (0, 6, 9)}


def test_hashed_windows_agree_on_plant(spark):
    texts = {
        i: f"t0 t1 t2 t3 t4 u{i} v{i} w{i}" for i in range(6)
    }
    assert spark_spans(spark, texts, k=3) == spark_spans(
        spark, texts, k=3, hashed=True
    )


def test_clean_removes_spans_and_passes_unique_docs(spark):
    texts = {
        0: "dup0 dup1 dup2 keepA keepB",
        1: "dup0 dup1 dup2 keepC keepD",
        2: "totally unique text here",
        3: "dup0 dup1 dup2",  # nothing but the span
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens_orig"], r["n_kept"], r["clean_text"])
        for r in dedup.substring_dedup_clean(df, k=3).collect()
    }
    assert got[0] == (5, 2, "keepA keepB")
    assert got[1] == (5, 2, "keepC keepD")
    assert got[2] == (4, 4, "totally unique text here")
    assert got[3] == (3, 0, "")


def test_min_span_tokens_filters_and_renumbers(spark):
    # the ExactSubstr >=50-token rule at miniature scale: two shared
    # regions, one of 3 tokens, one of 6 — min_span_tokens=5 keeps
    # only the long one, renumbered to span_id 1
    texts = {
        0: "a b c x1 p q r s t u y1",
        1: "a b c x2 p q r s t u y2",
    }
    all_spans = spark_spans(spark, texts, k=3)
    assert {(r[0], r[1]) for r in all_spans} == {
        (0, 1), (0, 2), (1, 1), (1, 2)
    }
    kept = spark_spans(spark, texts, k=3, min_span_tokens=5)
    assert kept == [
        (0, 1, 5, 10, 6, 4),
        (1, 1, 5, 10, 6, 4),
    ]


def test_short_docs_yield_no_windows(spark):
    texts = {0: "a b", 1: "a b", 2: ""}
    assert spark_spans(spark, texts, k=3) == []


def test_incremental_matches_full_on_batch_docs(spark):
    corpus = {
        0: "s0 s1 s2 s3 corpusonly0 a",
        1: "s0 s1 s2 s3 corpusonly1 b",
    }
    batch = {
        10: "x10 s0 s1 s2 s3 tail10",   # repeats a settled paragraph
        11: "tw0 tw1 tw2 u11",           # twin within the batch
        12: "tw0 tw1 tw2 u12",
        13: "all fresh words here",      # clean
    }
    cdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        list(batch.items()), "doc_id long, text string"
    )
    idx = dedup.substring_window_index(cdf, k=3)
    inc = sorted(
        tuple(r)
        for r in dedup.substring_spans_incremental(
            bdf, idx, k=3
        ).collect()
    )
    # full recomputation over corpus ∪ batch, batch rows only
    full = [
        r
        for r in ref_spans({**corpus, **batch}, 3)
        if r[0] >= 10
    ]
    assert inc == sorted(full)
    # the settled-copy span and the in-batch twin span are both found
    assert {(r[0], r[2], r[3]) for r in inc} == {
        (10, 2, 5), (11, 1, 3), (12, 1, 3)
    }


# --- partner attribution (VERDICT r8 item 6) -------------------------------


def ref_partner_spans(texts, k, max_docs_per_window=None):
    """Independent reference for substring_span_partners: per ordered
    (doc, partner) pair, the covered-set runs of doc positions whose
    window also occurs in partner — again deliberately not the islands
    formulation."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    occ = {}
    for d, ws in toks.items():
        for p in range(1, len(ws) - k + 2):
            occ.setdefault(" ".join(ws[p - 1 : p - 1 + k]), []).append(
                (d, p)
            )
    docs_of = {w: {d for d, _ in o} for w, o in occ.items()}
    dup = {
        w
        for w, ds in docs_of.items()
        if len(ds) >= 2
        and (max_docs_per_window is None or len(ds) <= max_docs_per_window)
    }
    out = []
    for d, ws in toks.items():
        for partner in toks:
            if partner == d:
                continue
            dup_pos = sorted(
                p
                for p in range(1, len(ws) - k + 2)
                if " ".join(ws[p - 1 : p - 1 + k]) in dup
                and partner in docs_of[" ".join(ws[p - 1 : p - 1 + k])]
            )
            covered = sorted({t for p in dup_pos for t in range(p, p + k)})
            spans = []
            for t in covered:
                if spans and t == spans[-1][1] + 1:
                    spans[-1][1] = t
                else:
                    spans.append([t, t])
            for sid, (a, b) in enumerate(spans, 1):
                nw = sum(1 for p in dup_pos if a <= p and p + k - 1 <= b)
                out.append((d, partner, sid, a, b, b - a + 1, nw))
    return sorted(out)


def spark_partner_spans(spark, texts, k, **kw):
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    return sorted(
        tuple(r)
        for r in dedup.substring_span_partners(df, k=k, **kw).collect()
    )


def test_partner_attribution_planted_pairs(spark):
    # the q23 partner plant: doc 2m and 2m+1 share a 4-token template;
    # the final odd doc is unpaired and attributes nothing
    texts = {}
    for i in range(7):
        pid = i // 2
        texts[i] = f"h{i} t{pid} u{pid} v{pid} w{pid} z{i}"
    got = spark_partner_spans(spark, texts, k=4)
    want = []
    for i in range(6):
        mate = i ^ 1
        want.append((i, mate, 1, 2, 5, 4, 1))
    assert got == sorted(want)
    assert got == ref_partner_spans(texts, 4)


def test_partner_splits_the_plain_coverage_span(spark):
    # the documented over-approximation, now measurable: doc 0's plain
    # coverage [1,6] is ONE span (adjacent windows), but the two
    # windows match DIFFERENT partners — per-partner spans are [1,3]
    # with doc 1 and [4,6] with doc 2
    texts = {
        0: "a b c d e f",
        1: "a b c zzz qq rr",
        2: "ww vv uu d e f",
    }
    assert (0, 1, 1, 6, 6, 2) in spark_spans(spark, texts, k=3)
    got = spark_partner_spans(spark, texts, k=3)
    doc0 = [r for r in got if r[0] == 0]
    assert doc0 == [
        (0, 1, 1, 1, 3, 3, 1),
        (0, 2, 1, 4, 6, 3, 1),
    ]
    assert got == ref_partner_spans(texts, 3)


def test_partner_union_covers_exactly_the_plain_spans(spark):
    # uncapped, the union over partners of covered positions equals
    # the plain operator's covered positions — the containment the
    # docstring promises
    texts = {
        0: "a b c d e f g h",
        1: "a b c zzz d e f qq",
        2: "x0 c d e f x1 x2 x3",
        3: "totally fresh words here now",
    }
    plain = spark_spans(spark, texts, k=3)
    partner = spark_partner_spans(spark, texts, k=3)

    def covered(rows, start_i, end_i, doc_i=0):
        return {
            (r[doc_i], t)
            for r in rows
            for t in range(r[start_i], r[end_i] + 1)
        }

    assert covered(partner, 3, 4) == covered(plain, 2, 3)
    assert partner == ref_partner_spans(texts, 3)


def test_partner_hot_window_cap_excludes_boilerplate(spark):
    # "b0 b1 b2" appears in all four docs; "p q r" in exactly two.
    # cap=3 drops the boilerplate window from attribution but keeps
    # the pairwise one — substring_spans still covers both
    texts = {
        0: "b0 b1 b2 p q r",
        1: "b0 b1 b2 s t u",
        2: "b0 b1 b2 v w x",
        3: "b0 b1 b2 p q r",
    }
    capped = spark_partner_spans(spark, texts, k=3, max_docs_per_window=3)
    assert capped == ref_partner_spans(texts, 3, max_docs_per_window=3)
    assert {(r[0], r[1]) for r in capped} == {(0, 3), (3, 0)}
    # docs 0 and 3 are identical, so the BRIDGING windows "b1 b2 p" /
    # "b2 p q" (2 docs each, under the cap) extend the span to [2,6];
    # only the pure-boilerplate pos-1 window is excluded
    assert all(r[3] == 2 and r[4] == 6 for r in capped)
    # uncapped: every ordered pair attributes the boilerplate
    full = spark_partner_spans(spark, texts, k=3)
    assert {(r[0], r[1]) for r in full} == {
        (a, b) for a in range(4) for b in range(4) if a != b
    }
    # plain coverage is unaffected by attribution capping
    assert {(r[0], r[2], r[3]) for r in spark_spans(spark, texts, k=3)} == {
        (0, 1, 6), (1, 1, 3), (2, 1, 3), (3, 1, 6)
    }


def test_partner_min_span_tokens_and_hashed(spark):
    texts = {
        0: "a b c x1 p q r s t u y1",
        1: "a b c x2 p q r s t u y2",
    }
    kept = spark_partner_spans(spark, texts, k=3, min_span_tokens=5)
    assert kept == [
        (0, 1, 1, 5, 10, 6, 4),
        (1, 0, 1, 5, 10, 6, 4),
    ]
    assert spark_partner_spans(spark, texts, k=3) == spark_partner_spans(
        spark, texts, k=3, hashed=True
    )


# --- property test vs the covered-set reference ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tok = st.sampled_from(["aa", "bb", "cc"])
_doc = st.lists(_tok, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=4), st.sampled_from([2, 3]))
def test_property_spans_match_reference(spark, docs, k):
    texts = dict(enumerate(docs))
    assert spark_spans(spark, texts, k=k) == ref_spans(texts, k)
    assert spark_spans(
        spark, texts, k=k, cross_doc_only=False
    ) == ref_spans(texts, k, cross_doc_only=False)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_doc, min_size=2, max_size=4),
    st.sampled_from([2, 3]),
    st.sampled_from([None, 2]),
)
def test_property_partner_spans_match_reference(spark, docs, k, cap):
    texts = dict(enumerate(docs))
    assert spark_partner_spans(
        spark, texts, k=k, max_docs_per_window=cap
    ) == ref_partner_spans(texts, k, max_docs_per_window=cap)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_doc, min_size=1, max_size=3),
    st.lists(_doc, min_size=1, max_size=3),
)
def test_property_incremental_equals_full(spark, corpus_docs, batch_docs):
    corpus = dict(enumerate(corpus_docs))
    batch = {100 + i: t for i, t in enumerate(batch_docs)}
    cdf = spark.createDataFrame(
        list(corpus.items()) or [(0, "")], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        list(batch.items()), "doc_id long, text string"
    )
    inc = sorted(
        tuple(r)
        for r in dedup.substring_spans_incremental(
            bdf, dedup.substring_window_index(cdf, k=2), k=2
        ).collect()
    )
    full = [r for r in ref_spans({**corpus, **batch}, 2) if r[0] >= 100]
    assert inc == sorted(full)
