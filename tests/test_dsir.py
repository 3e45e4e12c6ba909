"""DSIR importance resampling (operators/dsir): hashed n-gram
features, add-1-smoothed log ratios, exact-integer weights, and the
deterministic Gumbel-top-k draw — pinned against an independent
Python reference on a hand corpus."""

from __future__ import annotations

import hashlib
import math

import pytest

from timeseries_data_provider_spark.operators import dsir


def _bucket(gram: str, dim: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16) % dim


def _feats(text: str, dim: int) -> dict[int, int]:
    ws = text.split()
    grams = ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
    out: dict[int, int] = {}
    for g in grams:
        b = _bucket(g, dim)
        out[b] = out.get(b, 0) + 1
    return out


TARGET = [
    (1, "alpha beta gamma"),
    (2, "alpha beta beta"),
]
RAW = [
    (10, "alpha beta gamma delta"),
    (11, "delta delta epsilon"),
    (12, "zeta eta theta iota"),
    (13, "alpha beta"),
    (14, ""),
]
DIM = 64


def _reference_logratios() -> dict[int, int]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, t in TARGET:
        for b, c in _feats(t, DIM).items():
            tc[b] = tc.get(b, 0) + c
    for _, t in RAW:
        for b, c in _feats(t, DIM).items():
            rc[b] = rc.get(b, 0) + c
    tt, tr = sum(tc.values()), sum(rc.values())
    out = {}
    for b in range(DIM):
        lr = (
            math.log(tc.get(b, 0) + 1.0)
            - math.log(tt + float(DIM))
            - math.log(rc.get(b, 0) + 1.0)
            + math.log(tr + float(DIM))
        )
        out[b] = math.floor(1000.0 * lr)
    return out


def test_logratios_and_weights_match_reference(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir.dsir_logratios(target, raw, dim=DIM)
    got = {r["bucket"]: r["lr_milli"] for r in lr.collect()}
    want = _reference_logratios()
    assert got == want
    # full domain covered, even never-seen buckets
    assert len(got) == DIM

    weighted = dsir.dsir_weights(raw, lr, dim=DIM)
    rows = {r["doc_id"]: r for r in weighted.collect()}
    assert set(rows) == {10, 11, 12, 13, 14}
    for did, text in RAW:
        fe = _feats(text, DIM)
        want_w = sum(c * want[b] for b, c in fe.items())
        assert rows[did]["dsir_milli"] == want_w, did
        assert rows[did]["n_feats"] == sum(fe.values())
    # the empty doc keeps a zero weight instead of vanishing
    assert rows[14]["dsir_milli"] == 0 and rows[14]["n_feats"] == 0
    # target-like docs must outrank target-unlike ones
    assert rows[13]["dsir_milli"] > rows[12]["dsir_milli"]
    assert rows[10]["dsir_milli"] > rows[12]["dsir_milli"]


def test_gumbel_select_deterministic_and_exact(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir.dsir_logratios(target, raw, dim=DIM)
    weighted = dsir.dsir_weights(raw, lr, dim=DIM)
    sel = dsir.dsir_select(weighted, k=3).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]

    # replay the exact draw in Python: u from md5(id), g = -ln(-ln u)
    want_scores = {}
    wrows = {r["doc_id"]: r["dsir_milli"] for r in weighted.collect()}
    for did, w in wrows.items():
        u = (int(hashlib.md5(str(did).encode()).hexdigest()[:12], 16)
             + 0.5) / float(16**12)
        g = math.floor(1000.0 * -math.log(-math.log(u)))
        want_scores[did] = (w + g, g)
    order = sorted(
        want_scores, key=lambda d: (-want_scores[d][0], d)
    )[:3]
    assert [r["doc_id"] for r in sel] == order
    for r in sel:
        assert r["gumbel_milli"] == want_scores[r["doc_id"]][1]
    # deterministic: a second run returns the identical draw; a
    # different seed changes it (eventually — k < n here)
    again = dsir.dsir_select(weighted, k=3).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in sel]


def test_guards():
    with pytest.raises(ValueError, match="k"):
        dsir.dsir_select(None, k=0)


def test_empty_corpus_smoothing_only_not_null(spark):
    # review finding (r11): an empty/whitespace-only corpus summed
    # its total to NULL, NULLing every ln() — all importance weights
    # silently zeroed while the oracle (which coalesced) disagreed
    target = spark.createDataFrame(
        [(1, "   "), (2, "")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir.dsir_logratios(target, raw, dim=DIM)
    rows = lr.collect()
    assert len(rows) == DIM
    assert all(r["lr_milli"] is not None for r in rows)
    # smoothing-only target model: lr = ln(1/DIM) - ln((rc+1)/(tr+DIM))
    import math

    rc = {}
    for _, t in RAW:
        for b, c in _feats(t, DIM).items():
            rc[b] = rc.get(b, 0) + c
    tr = sum(rc.values())
    for r in rows:
        want = math.floor(1000.0 * (
            math.log(1.0) - math.log(0 + float(DIM))
            - math.log(rc.get(r["bucket"], 0) + 1.0)
            + math.log(tr + float(DIM))
        ))
        assert r["lr_milli"] == want


def test_precomputed_features_match_inline(spark):
    # the shared-features path (one explode serving both model fits
    # and the weighting) must equal the three-scan form exactly
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    import pyspark.sql.functions as F

    feats = dsir.ngram_bucket_features(raw, dim=DIM)
    tfeats = dsir.ngram_bucket_features(target, dim=DIM)
    lr_inline = dsir.dsir_logratios(target, raw, dim=DIM)
    lr_shared = dsir.dsir_logratios(
        target, raw, dim=DIM, target_features=tfeats, raw_features=feats
    )
    a = {r["bucket"]: r["lr_milli"] for r in lr_inline.collect()}
    b = {r["bucket"]: r["lr_milli"] for r in lr_shared.collect()}
    assert a == b
    w_inline = {
        r["doc_id"]: r["dsir_milli"]
        for r in dsir.dsir_weights(raw, lr_inline, dim=DIM).collect()
    }
    w_shared = {
        r["doc_id"]: r["dsir_milli"]
        for r in dsir.dsir_weights(
            raw, lr_shared, dim=DIM, features=feats
        ).collect()
    }
    assert w_inline == w_shared


def test_subset_fast_path_matches_two_frame_form(spark):
    # dsir_logratios_from_features (one aggregate, target = a marked
    # subset of the pool) must equal the general two-frame fit exactly
    import pyspark.sql.functions as F

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    cond = F.col("doc_id") % 2 == 0
    target = raw.filter(cond)
    feats = dsir.ngram_bucket_features(raw, dim=DIM)
    fast = {
        r["bucket"]: (r["tc"], r["rc"], r["lr_milli"])
        for r in dsir.dsir_logratios_from_features(
            feats, cond, dim=DIM
        ).collect()
    }
    slow = {
        r["bucket"]: (r["tc"], r["rc"], r["lr_milli"])
        for r in dsir.dsir_logratios(target, raw, dim=DIM).collect()
    }
    assert fast == slow


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab é\t\n", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_property_features_match_python(spark, texts):
    # Spark's n-gram featurizer (whitespace-run split, uni+bigrams,
    # md5 buckets) vs the independent Python reference on hostile
    # text: unicode, tabs/newlines, empty and whitespace-only docs
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[tuple, int] = {
        (r["doc_id"], r["bucket"]): r["c"]
        for r in dsir.ngram_bucket_features(df, dim=DIM).collect()
    }
    want: dict[tuple, int] = {}
    for i, t in rows:
        for b, c in _feats(t, DIM).items():
            want[(i, b)] = c
    assert got == want


def test_incremental_scoring_with_persisted_model(spark):
    # the lr table is a MODEL artifact: a NEW batch scores against it
    # without refitting (the signature-index append contract)
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir.dsir_logratios(target, raw, dim=DIM)
    new_batch = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "zeta eta")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["dsir_milli"]
        for r in dsir.dsir_weights(new_batch, lr, dim=DIM).collect()
    }
    lrmap = _reference_logratios()
    for did, text in [(100, "alpha beta gamma"), (101, "zeta eta")]:
        want = sum(
            c * lrmap[b] for b, c in _feats(text, DIM).items()
        )
        assert rows[did] == want
    # target-like new docs outrank target-unlike ones, as fitted
    assert rows[100] > rows[101]
