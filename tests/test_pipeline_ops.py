"""Semantic unit tests for the training-data pipeline operators
(timeseries_data_provider_spark/operators/pipeline.py) beyond the
oracle parity checks: invariants a SQL-diff can't express directly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timeseries_data_provider_spark import tables
from timeseries_data_provider_spark.operators import pipeline
from tests.conftest import SF_SMOKE, SF_T2


def _docs(spark):
    return tables.load_table(spark, SF_SMOKE, "documents")


def test_stratified_sample_sizes_and_determinism(spark):
    docs = _docs(spark)
    frac = 0.2
    sample = pipeline.stratified_sample(docs, "lang", frac)
    got = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["lang"]: math.ceil(r["n"] * frac)
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    # deterministic across recomputation and repartitioning
    a = sorted(r["doc_id"] for r in sample.collect())
    b = sorted(
        r["doc_id"]
        for r in pipeline.stratified_sample(
            docs.repartition(7), "lang", frac
        ).collect()
    )
    assert a == b


def test_chunk_documents_reassembles_exactly(spark):
    docs = _docs(spark).limit(50)
    chunks = pipeline.chunk_documents(docs, chunk_tokens=32)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_id")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            ).alias("text2"),
            F.sum("n_chunk_tokens").alias("tok2"),
        )
    )
    joined = docs.join(rebuilt, "doc_id").select(
        "doc_id",
        (F.col("text") == F.col("text2")).alias("same"),
        (F.size(F.split("text", " ")).cast("long") == F.col("tok2")).alias(
            "same_n"
        ),
    )
    bad = joined.filter(~F.col("same") | ~F.col("same_n")).count()
    assert bad == 0
    # every chunk except a doc's last is exactly chunk_tokens long
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    not_last = chunks.withColumn(
        "max_c", F.max("chunk_id").over(w)
    ).filter(F.col("chunk_id") < F.col("max_c"))
    assert not_last.filter(F.col("n_chunk_tokens") != 32).count() == 0


def test_chunk_documents_tokenizer_edge_cases(spark):
    """Whitespace-run / empty-text hardening (VERDICT r3 finding 1):
    runs of spaces, tabs, newlines, and leading/trailing whitespace
    must not create phantom empty tokens, and zero-token documents
    must produce zero chunk rows (not sequence(0,-1) garbage)."""
    docs = spark.createDataFrame(
        [
            (1, "s", "one  two   three"),  # internal runs
            (2, "s", ""),  # empty text
            (3, "s", "   "),  # whitespace-only
            (4, "s", "  lead mid trail  "),  # leading/trailing
            (5, "s", "x\ty\nz"),  # tabs/newlines
        ],
        ["doc_id", "source", "text"],
    )
    chunks = pipeline.chunk_documents(
        docs, chunk_tokens=2, keep_cols=("source",)
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunks.collect()
    }
    assert got == {
        (1, 0): ("one two", 2),
        (1, 1): ("three", 1),
        (4, 0): ("lead mid", 2),
        (4, 1): ("trail", 1),
        (5, 0): ("x y", 2),
        (5, 1): ("z", 1),
    }  # docs 2 and 3 contribute no rows at all
    # composed chunk->pack sees the same token totals (no phantoms)
    packed = pipeline.chunk_and_pack(
        docs, chunk_tokens=2, budget=4, pack_col="source"
    )
    assert packed.agg(F.sum("bin_tokens")).collect()[0][0] == 9


def test_sketch_verdict_queries_hash_scorable(spark):
    """q36/q61 verdict forms: the boolean tolerance columns must be
    deterministically TRUE (that is what lets the oracle emit literal
    TRUE and the rows hash-match), and the exact columns must equal
    the standalone exact operators."""
    from timeseries_data_provider_spark.operators import aggregates

    ev = tables.load_table(spark, SF_SMOKE, "events")
    vd = aggregates.approx_distinct_verdict(ev).collect()
    assert vd and all(r["approx_ok"] for r in vd)
    exact_users = {
        r["event_type"]: r["users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert {r["event_type"]: r["exact_users"] for r in vd} == exact_users

    vp = aggregates.approx_percentiles_verdict(ev).collect()
    assert vp and all(r["p50_ok"] and r["p90_ok"] for r in vp)
    exact_p = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in aggregates.value_percentiles(ev).collect()
    }
    assert {r["event_type"]: (r["p50"], r["p90"]) for r in vp} == exact_p


def test_pack_sequences_budget_invariant(spark):
    docs = _docs(spark)
    budget = 512
    bins = pipeline.pack_sequences(docs, budget=budget)
    # a bin only exceeds the budget by (at most) its final doc: the
    # running total *before* the last doc must be under budget, so
    # bin_tokens < budget + max single-doc tokens
    max_doc = (
        docs.select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert bins.filter(F.col("bin_tokens") >= budget + max_doc).count() == 0
    # bins are dense 0..max per source
    per_src = bins.groupBy("source").agg(
        F.count("*").alias("n"), F.max("bin_id").alias("mx")
    )
    assert per_src.filter(F.col("n") != F.col("mx") + 1).count() == 0
    # token conservation: sum over bins == sum over docs
    total_bins = bins.agg(F.sum("bin_tokens")).collect()[0][0]
    total_docs = (
        docs.select(F.size(F.split("text", " ")).cast("long").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_bins == total_docs


def test_contamination_flags_only_train_side(spark):
    docs = _docs(spark)
    out = pipeline.ngram_contamination(docs, eval_mod=97, n=3, min_common=1)
    rows = out.collect()
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all(r["n_common"] >= 1 for r in rows)


def test_approx_percentiles_within_tolerance(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import aggregates

    ev = tables.load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in aggregates.value_percentiles(ev).collect()
    }
    approx = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in aggregates.approx_value_percentiles(ev).collect()
    }
    assert exact.keys() == approx.keys()
    spread = (
        ev.agg(F.max("value") - F.min("value")).collect()[0][0] or 1.0
    )
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            # GK guarantees a rank error; value error bounded by the
            # local density — 5% of the global spread is a loose,
            # non-flaky bound at sketch accuracy 10k on sf0.001
            assert abs(e - a) <= 0.05 * spread, (k, e, a)


def test_repetition_signals_hand_checked(spark):
    from timeseries_data_provider_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            # 6 tokens, distinct=3 -> dup_frac 0.5; top bigram "a b"
            # occurs 2x -> frac 2*2/6; longest run "c c" = 2
            (1, "a b a b c c"),
            # all same word: dup 1 - 1/5; top bigram 4x; run 5
            (2, "x x x x x"),
            # no repetition at all
            (3, "p q r s"),
            # single token: no bigrams
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.repetition_signals(docs).collect()
    }
    assert got[1]["n_tokens"] == 6
    assert got[1]["dup_word_frac"] == 0.5
    assert got[1]["top_bigram_n"] == 2
    assert got[1]["top_bigram_frac"] == round(4 / 6, 6)
    assert got[1]["max_word_run"] == 2
    assert got[2]["dup_word_frac"] == 0.8
    assert got[2]["top_bigram_n"] == 4
    assert got[2]["max_word_run"] == 5
    assert got[3]["dup_word_frac"] == 0.0
    assert got[3]["top_bigram_n"] == 1
    assert got[3]["max_word_run"] == 1
    assert got[4]["n_tokens"] == 1
    assert got[4]["top_bigram_n"] == 0
    assert got[4]["top_bigram_frac"] == 0.0
    assert got[4]["max_word_run"] == 1


def test_hash_split_fractions_and_determinism(spark):
    docs = _docs(spark)
    out1 = {r["doc_id"]: r["split"] for r in pipeline.hash_split(docs).collect()}
    out2 = {r["doc_id"]: r["split"] for r in pipeline.hash_split(docs).collect()}
    assert out1 == out2  # deterministic
    n = len(out1)
    from collections import Counter

    c = Counter(out1.values())
    assert set(c) <= {"train", "val", "test"}
    # md5 is uniform: fractions within a loose tolerance of 90/5/5
    assert abs(c["train"] / n - 0.90) < 0.06
    assert abs(c["val"] / n - 0.05) < 0.04
    assert abs(c["test"] / n - 0.05) < 0.04
    # splits are a partition: every doc assigned exactly once
    assert n == docs.count()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pipeline.hash_split(docs, splits=(("a", 0.5), ("b", 0.2)))


def test_c4_line_signals_hand_checked(spark):
    from timeseries_data_provider_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            # 4 lines: terminal+long / short / bullet / ellipsis
            (1, "This is a proper sentence.\nok\n- item one here\nteaser more coming..."),
            # code page
            (2, "function f() { return 1; }"),
            # placeholder page
            (3, "Lorem Ipsum dolor sit amet."),
            # clean page, all lines kept
            (4, 'First real sentence here.\nSecond one ends with a quote."'),
            # enable-javascript interstitial
            (5, "Please enable JavaScript to view this page."),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.line_signals(docs).collect()
    }
    assert got[1]["n_lines"] == 4
    assert got[1]["frac_lines_terminal"] == 0.25  # only line 1
    assert got[1]["frac_lines_short"] == 0.25  # "ok"
    assert got[1]["frac_lines_bullet"] == 0.25
    assert got[1]["frac_lines_ellipsis"] == 0.25
    assert got[1]["kept_line_frac"] == 0.25
    assert got[2]["has_curly_brace"] and not got[1]["has_curly_brace"]
    assert got[3]["has_lorem_ipsum"]
    assert got[4]["kept_line_frac"] == 1.0  # quote after period counts
    assert got[5]["has_javascript"]

    kept = {r["doc_id"] for r in text_ops.c4_filter(docs).collect()}
    assert kept == {4}


def test_chunk_documents_property_random_whitespace(spark):
    """Property: for ANY text (including leading/trailing/repeated
    whitespace and empty strings), chunking preserves the token stream
    exactly — concatenated chunk texts == normalized tokens, token
    counts conserved, zero rows for zero-token docs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts_strategy = st.lists(
        st.text(alphabet=" \t\nabcXY.7", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts=texts_strategy)
    def check(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        chunks = pipeline.chunk_documents(docs, chunk_tokens=3).collect()
        by_doc = {}
        for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, t in enumerate(texts):
            toks = t.split()  # Python str.split == whitespace-run split
            rows = by_doc.get(i, [])
            if not toks:
                assert rows == [], (i, t, rows)
                continue
            assert " ".join(r["chunk_text"] for r in rows) == " ".join(toks)
            assert sum(r["n_chunk_tokens"] for r in rows) == len(toks)
            assert [r["chunk_id"] for r in rows] == list(range(len(rows)))

    check()


def test_bloom_contamination_equals_exact(spark):
    """The Bloom-prefiltered contamination check must be row-identical
    to the exact broadcast form (false positives are killed by the
    exact join after the prefilter), and its plan must contain the
    bloom aggregate + might_contain, not a second full join."""
    docs = _docs(spark)
    exact = {
        (r["doc_id"], r["n_common"])
        for r in pipeline.ngram_contamination(
            docs, eval_mod=97, n=3, min_common=1
        ).collect()
    }
    bloom_df = pipeline.ngram_contamination_bloom(
        docs, eval_mod=97, n=3, min_common=1, expected_items=100_000
    )
    got = {(r["doc_id"], r["n_common"]) for r in bloom_df.collect()}
    assert got == exact and exact  # non-trivial on the smoke corpus

    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert "bit_get" in plan, plan[:1500]  # the bloom probe predicate


def test_weighted_sample_matches_reference_impl(spark):
    """A-ES selection must match an independent Python reimplementation
    exactly (same md5-derived uniforms), be deterministic across
    partitionings, drop nonpositive weights, and plan as
    TakeOrderedAndProject (distributed partial top-k)."""
    import hashlib

    rows = [(i, 0.5 + (i * 7 % 13)) for i in range(200)]
    rows += [(900, 0.0), (901, -2.0)]  # excluded
    docs = spark.createDataFrame(rows, ["doc_id", "w"])

    def ref_key(doc_id, w):
        u12 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        u = (u12 + 0.5) / 16**12
        return u ** (1.0 / w)

    want = sorted(
        ((i, w) for i, w in rows if w > 0),
        key=lambda t: (-ref_key(*t), t[0]),
    )[:25]
    got = [
        (r["doc_id"], r["w"])
        for r in pipeline.weighted_sample(docs, "w", k=25).collect()
    ]
    assert got == want
    got2 = [
        (r["doc_id"], r["w"])
        for r in pipeline.weighted_sample(
            docs.repartition(7), "w", k=25
        ).collect()
    ]
    assert got2 == want  # partition-independent

    plan = (
        pipeline.weighted_sample(docs, "w", k=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_redact_pii_hand_checked(spark):
    from timeseries_data_provider_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+x@mail.example.org today"),
            (2, "call +1 555-123-4567 or (020) 7946-0958 now"),
            (3, "server at 192.168.1.250 responded"),
            (4, "card 4111 1111 1111 1111 declined"),
            (5, "plain text, no pii, year 2024 and pi 3.14159"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict() for r in text_ops.redact_pii(docs).collect()
    }
    assert got[1]["text_redacted"] == "contact me at <EMAIL> today"
    assert got[1]["n_email"] == 1
    assert got[2]["n_phone"] == 2
    assert "<PHONE>" in got[2]["text_redacted"]
    assert "555" not in got[2]["text_redacted"]
    assert got[3]["text_redacted"] == "server at <IP> responded"
    assert got[4]["n_card"] == 1 and "<CARD>" in got[4]["text_redacted"]
    # no false positives on plain numbers / decimals / years
    assert (
        got[5]["text_redacted"] == "plain text, no pii, year 2024 and pi 3.14159"
    )
    assert all(
        got[5][k] == 0 for k in ("n_email", "n_phone", "n_ip", "n_card")
    )


def test_group_split_no_leakage_and_matches_group_key_hash(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    gs = pipeline.group_split(docs, group_col="source")
    assert gs.count() == docs.count()
    # every source maps to exactly one split (the leakage guarantee)
    k = (
        gs.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k").alias("m"))
        .first()["m"]
    )
    assert k == 1
    # and the assignment equals hash_split applied to the source string
    ref = {
        r["__g"]: r["split"]
        for r in pipeline.hash_split(
            docs.select(F.col("source").alias("__g")).distinct(),
            id_col="__g",
        ).collect()
    }
    for r in gs.select("source", "split").distinct().collect():
        assert ref[r["source"]] == r["split"]


def test_mixture_sample_quotas_caps_and_determinism(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    # src0 twice the weight of src1; src2 absent from weights; quota
    # larger than a group's population must cap at the population.
    out = pipeline.mixture_sample(
        docs, {"src0": 2.0, "src1": 1.0, "src5": 5.0}, total=80
    )
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    pop = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    wsum = 8.0
    assert got["src0"] == min(int(2.0 / wsum * 80), pop["src0"])
    assert got["src1"] == min(int(1.0 / wsum * 80), pop["src1"])
    # src5's quota (50) exceeds its population -> capped at population
    assert int(5.0 / wsum * 80) > pop["src5"]
    assert got["src5"] == pop["src5"]
    assert "src2" not in got
    # deterministic: same draw twice
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in pipeline.mixture_sample(
            docs, {"src0": 2.0, "src1": 1.0, "src5": 5.0}, total=80
        ).collect()
    )
    assert a == b


def test_mixture_sample_rejects_bad_inputs(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    with _pytest.raises(ValueError, match="total"):
        pipeline.mixture_sample(docs, {"src0": 1.0}, total=-1)
    with _pytest.raises(ValueError, match="weights"):
        pipeline.mixture_sample(docs, {"src0": 0.0}, total=10)


def test_sampler_seeds_are_deterministic_and_independent(spark):
    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    base = sorted(
        r["doc_id"] for r in pipeline.stratified_sample(docs).collect()
    )
    again = sorted(
        r["doc_id"]
        for r in pipeline.stratified_sample(docs, seed="").collect()
    )
    reseeded = sorted(
        r["doc_id"]
        for r in pipeline.stratified_sample(docs, seed="epoch2").collect()
    )
    # default seed reproduces the historical draw bit-for-bit
    assert base == again
    # a different seed draws a different (same-sized) sample
    assert len(reseeded) == len(base) and reseeded != base
    # weighted: same contract
    wdocs = docs.selectExpr("doc_id", "CAST(n_chars AS DOUBLE) AS w")
    w1 = [r["doc_id"] for r in pipeline.weighted_sample(wdocs, "w", k=50).collect()]
    w2 = [
        r["doc_id"]
        for r in pipeline.weighted_sample(wdocs, "w", k=50, seed="e2").collect()
    ]
    assert w1 != w2 and len(w1) == len(w2) == 50


def test_equi_depth_histogram_invariants(spark):
    from timeseries_data_provider_spark.operators import aggregates

    ev = spark.read.parquet(SF_T2 + "/events.parquet")
    h = aggregates.equi_depth_histogram(ev, buckets=10).collect()
    by_series = {}
    for r in h:
        by_series.setdefault(r["event_type"], []).append(r)
    total = ev.count()
    assert sum(r["n"] for r in h) == total
    for series, rows in by_series.items():
        rows.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rows] == list(range(1, len(rows) + 1))
        # equi-depth: bucket sizes differ by at most 1 within a series
        sizes = [r["n"] for r in rows]
        assert max(sizes) - min(sizes) <= 1, (series, sizes)
        # boundaries are monotone across buckets
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) == 0.0


def test_budget_select_matches_naive_prefix_rule(spark):
    from pyspark.sql import Window

    from timeseries_data_provider_spark.operators import pipeline
    from timeseries_data_provider_spark.operators.text import quality_score

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    budget = 20_000
    got = pipeline.budget_select(docs, budget)
    rows = got.collect()
    assert sum(r["n_tokens"] for r in rows) <= budget
    # equivalence with the naive global-window prefix rule
    scored = quality_score(docs).select("doc_id", "score").join(
        docs.select(
            "doc_id",
            F.size(pipeline.tokens("text")).cast("long").alias("n_tokens"),
        ),
        "doc_id",
    )
    w = (
        Window.orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        scored.select("doc_id", F.sum("n_tokens").over(w).alias("cum"))
        .filter(F.col("cum") <= budget)
    )
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in naive.collect()
    )
    # maximality: no further doc fits (the next-best doc would overflow)
    # and a huge budget selects everything
    assert pipeline.budget_select(docs, 10**9).count() == docs.count()
    assert pipeline.budget_select(docs, 0).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="token_budget"):
        pipeline.budget_select(docs, -1)


def test_group_split_assigns_null_groups(spark):
    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)],
        ["doc_id", "source"],
    )
    out = pipeline.group_split(docs, group_col="source")
    rows = {r["doc_id"]: r for r in out.collect()}
    # no row vanishes; NULL-group rows all share one deterministic
    # split and keep their NULL group value
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["source"] is None and rows[4]["source"] is None
    assert rows[2]["split"] == rows[4]["split"]


def test_mixture_sample_rejects_negative_weights(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.read.parquet(SF_T2 + "/documents.parquet")
    with _pytest.raises(ValueError, match=">= 0"):
        pipeline.mixture_sample(
            docs, {"src0": 2.0, "src1": -1.0}, total=60
        )


def test_text_tokenizer_robust_and_fingerprint_edge_ws(spark):
    """_words drops phantom tokens; fingerprint normalizes edge
    tabs/newlines identically to edge-clean text (review findings)."""
    from timeseries_data_provider_spark.operators import text as t

    df = spark.createDataFrame(
        [
            (1, "hello world", 11),
            (2, "hello\nworld\t", 12),   # same content, messy whitespace
            (3, "  hello   world  ", 17),
            (4, "", 0),
        ],
        ["doc_id", "text", "n_chars"],
    )
    stats = {r["doc_id"]: r for r in t.token_stats(df).collect()}
    assert stats[1]["n_tokens"] == stats[2]["n_tokens"] == stats[3]["n_tokens"] == 2
    assert stats[4]["n_tokens"] == 0 and stats[4]["ttr"] is None
    fps = {r["doc_id"]: r["fp"] for r in t.fingerprint(df).collect()}
    assert fps[1] == fps[2] == fps[3]
    # vocab never surfaces '' as a term
    terms = {r["term"] for r in t.vocab_topk(df, k=10).collect()}
    assert "" not in terms and terms == {"hello", "world"}


def test_winnow_short_docs_emit_partial_window_fingerprint(spark):
    from timeseries_data_provider_spark.operators import text as t

    # 5 tokens, k=3 -> 3 k-grams < w=4: exactly one fingerprint (the
    # global min), and two identical short docs SHARE it
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        ["doc_id", "text"],
    )
    fp = t.winnow_fingerprints(df, k=3, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(by_doc[1]) == 1 and by_doc[1] == by_doc[2]
    assert by_doc[3] != by_doc[1]


def test_line_signals_crlf_and_top_bigram_cap(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "Read more...\r\nThis line is terminal.\r\n")],
        ["doc_id", "text"],
    )
    sig = t.line_signals(df).first()
    # the CR must not mask the ellipsis teaser or fake a terminal
    assert sig["frac_lines_ellipsis"] > 0
    rep = (
        t.repetition_signals(
            spark.createDataFrame([(1, "a a a a")], ["doc_id", "text"])
        ).first()
    )
    assert rep["top_bigram_frac"] == 1.0  # capped, not 1.5
    # c4_filter plans WITHOUT a join (single projection + filter)
    docs = spark.createDataFrame(
        [(1, "A good line here.\nAnother fine line.")],
        ["doc_id", "text"],
    )
    plan = t.c4_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_salted_join_rejects_outer_and_formats_keep_partition_types(
    spark, tmp_path
):
    import pytest as _pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from timeseries_data_provider_spark.functions import skew
    from timeseries_data_provider_spark.sources import formats

    hot = spark.createDataFrame([(1, 10), (1, 11)], ["k", "id"])
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    with _pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(hot, dim, on=["k"], salt_from=["id"], how="full")

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("year", StringType()),
        ]
    )
    src = str(tmp_path / "src.csv")
    spark.createDataFrame(
        [(1, "2024"), (2, "2025")], schema
    ).write.option("header", True).mode("overwrite").csv(src)
    out = formats.convert_to_parquet(
        spark, src, "csv", str(tmp_path / "dest"),
        schema=schema, partition_by=["year"],
    )
    # partition column keeps its DECLARED type and position
    assert [f.name for f in out.schema.fields] == ["doc_id", "year"]
    assert out.schema["year"].dataType.simpleString() == "string"


def test_corpus_diff_classifies_all_transitions(spark):
    from timeseries_data_provider_spark.operators import pipeline

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["status"]
        for r in pipeline.corpus_diff(old, new).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_budget_select_null_score_docs_excluded(spark):
    # ADVICE r5 (medium): empty/whitespace-only docs score NULL; they
    # used to crash the driver-side histogram sort. They must now be
    # silently excluded from selection.
    from timeseries_data_provider_spark.operators import pipeline

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, ""),
            (3, "   \t\n  "),
            (4, "epsilon zeta eta theta"),
        ],
        ["doc_id", "text"],
    ).withColumn("n_chars", F.length("text"))
    got = pipeline.budget_select(docs, 4)
    ids = sorted(r["doc_id"] for r in got.collect())
    assert 2 not in ids and 3 not in ids
    assert len(ids) == 1  # budget of 4 tokens fits exactly one doc
    # huge budget: every SCORABLE doc, never the null-score ones
    assert sorted(
        r["doc_id"] for r in pipeline.budget_select(docs, 10**9).collect()
    ) == [1, 4]


def test_budget_select_all_tied_scores_distributed_cut(spark):
    # VERDICT r5 #1 adversarial case: EVERY document lands in the
    # marginal score class (identical text => identical score). The
    # bucketed two-phase prefix sum must still cut row-identically to
    # the naive global rule — lowest doc_ids first, budget respected.
    from timeseries_data_provider_spark.operators import pipeline

    n = 500
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(n)],
        ["doc_id", "text"],
    ).withColumn("n_chars", F.length("text"))
    budget = 5 * 123 + 2  # 123 full docs + a 2-token remainder
    got = sorted(
        r["doc_id"] for r in pipeline.budget_select(docs, budget).collect()
    )
    assert got == list(range(123))


def test_ordered_prefix_take_matches_global_window(spark):
    from pyspark.sql import Window

    from timeseries_data_provider_spark.operators.pipeline import (
        _ordered_prefix_take,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(400)], ["id", "w"]
    )
    for budget in (0, 7, 100, 1000, 10**9):
        got = sorted(
            r["id"]
            for r in _ordered_prefix_take(df, "id", "w", budget).collect()
        )
        win = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = sorted(
            r["id"]
            for r in df.select(
                "id", F.sum("w").over(win).alias("c")
            )
            .filter(F.col("c") <= budget)
            .collect()
        )
        assert got == want, budget


def test_property_ordered_prefix_take_equivalence(spark):
    # randomized weights/budgets vs the naive global-window rule —
    # one Spark round over many (budget, frame) cases (hypothesis-style
    # coverage without per-example Spark jobs)
    from pyspark.sql import Window

    from timeseries_data_provider_spark.operators.pipeline import (
        _ordered_prefix_take,
    )

    import random

    rnd = random.Random(20260814)
    for trial, n in enumerate([7, 700]):
        # ids UNIQUE by construction: _ordered_prefix_take's
        # row-identity contract (like any cumulative cut) is only
        # well-defined for a total order — tied keys make both the
        # naive and bucketed cuts partitioning-dependent (review
        # finding: the earlier id formula could collide)
        rows = [
            (i * 3 + trial, rnd.randint(0, 9)) for i in range(n)
        ]
        df = spark.createDataFrame(rows, ["id", "w"]).repartition(8)
        total = sum(w for _, w in rows)
        for budget in {0, 1, total // 3, total, total + 5}:
            got = sorted(
                r["id"]
                for r in _ordered_prefix_take(
                    df, "id", "w", budget
                ).collect()
            )
            win = Window.orderBy("id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            want = sorted(
                r["id"]
                for r in df.select(
                    "id", F.sum("w").over(win).alias("c")
                )
                .filter(F.col("c") <= budget)
                .collect()
            )
            assert got == want, (trial, n, budget)


def test_compression_ratio(spark):
    from timeseries_data_provider_spark.operators import text as T

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 50),
        (2, "abc " * 500),  # highly redundant -> much lower ratio
        (3, None),
        (4, ""),
        (5, "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.compression_ratio(df).collect()}
    import zlib

    for rid, t in rows:
        if t is None:
            assert got[rid]["compression_ratio"] is None
            assert got[rid]["n_bytes"] is None
            continue
        raw = t.encode()
        assert got[rid]["n_bytes"] == len(raw)
        if raw:
            z = zlib.compress(raw, 6)
            assert got[rid]["n_zbytes"] == len(z)
            assert got[rid]["compression_ratio"] == round(
                len(z) / len(raw), 6
            )
        else:
            assert got[rid]["compression_ratio"] is None
    # the redundancy ordering the quality gate relies on
    assert (
        got[2]["compression_ratio"]
        < got[1]["compression_ratio"]
        < got[5]["compression_ratio"]
    )


def test_bm25_matches_reference(spark):
    """bm25_topk vs an independent Python BM25 (dict counts, same
    public formula): exact integer milli scores, exact ranking."""
    import math
    import re as _re

    from timeseries_data_provider_spark.operators import text as T

    corpus = {
        1: "hash join hash join table scan",
        2: "hash table",
        3: "scan scan scan filter",
        4: "merge sort order merge",
        5: "join",
        6: "completely unrelated words here",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    queries = ["hash join", "scan"]
    got = {
        (r["query"], r["rank"]): (
            r["doc_id"], r["n_terms_hit"], r["bm25_milli"]
        )
        for r in T.bm25_topk(df, queries, k=3).collect()
    }

    def words(t):
        return [x for x in _re.split(r"\s+", t) if x]

    n = len(corpus)
    dls = {d: len(words(t)) for d, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    dfs: dict = {}
    tfs: dict = {}
    for d, t in corpus.items():
        for w in set(words(t)):
            dfs[w] = dfs.get(w, 0) + 1
        for w in words(t):
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
    exp = {}
    for q in queries:
        scores = {}
        for d in corpus:
            s = hits = 0
            for w in sorted(set(q.split())):
                tf = tfs.get((d, w), 0)
                if not tf:
                    continue
                hits += 1
                idf = math.log(
                    1.0 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5)
                )
                s += math.floor(
                    1000.0 * idf * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * (dls[d] / avgdl)))
                )
            if hits:
                scores[d] = (hits, s)
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:3]
        for i, (d, (hits, s)) in enumerate(ranked, 1):
            exp[(q, i)] = (d, hits, s)
    assert got == exp
    # guards
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.bm25_topk(df, [])
    with _pytest.raises(ValueError):
        T.bm25_topk(df, ["   "])


def test_chunk_sentences_boundaries_and_reassembly(spark):
    from timeseries_data_provider_spark.operators import pipeline

    text = (
        "one two three. four five? six seven eight! nine. "
        "ten eleven twelve thirteen."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # budget 5: sentences have 3,2,3,1,4 tokens; cumulative starts
    # 0,3,5,8,9 -> chunks floor(start/5) = 0,0,1,1,1
    got = sorted(
        (r["chunk_idx"], r["n_sentences"], r["n_tokens"], r["chunk_text"])
        for r in pipeline.chunk_sentences(df, max_tokens=5).collect()
    )
    assert got == [
        (0, 2, 5, "one two three. four five?"),
        (1, 3, 8, "six seven eight! nine. ten eleven twelve thirteen."),
    ]
    # reassembly without overlap reproduces the sentence sequence
    joined = " ".join(t for *_, t in got)
    assert joined == text


def test_chunk_sentences_overlap(spark):
    from timeseries_data_provider_spark.operators import pipeline

    text = "a b. c d. e f. g h."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_idx"]: r
        for r in pipeline.chunk_sentences(
            df, max_tokens=4, overlap_sentences=1
        ).collect()
    }
    # base chunks: starts 0,2,4,6 -> chunk 0: (a b., c d.), chunk 1:
    # (e f., g h.); overlap repeats chunk 0's last sentence into 1
    assert got[0]["chunk_text"] == "a b. c d."
    assert got[1]["chunk_text"] == "c d. e f. g h."
    assert got[1]["n_sentences"] == 3
    # no phantom chunk past the document's last real chunk
    assert set(got) == {0, 1}


def test_chunk_sentences_edge_cases(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark.operators import pipeline

    df = spark.createDataFrame(
        [
            (1, ""),  # empty -> no rows
            (2, "single run of nine tokens without any punctuation"),
            (3, "tiny."),
        ],
        "doc_id long, text string",
    )
    rows = pipeline.chunk_sentences(df, max_tokens=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc
    # one giant sentence lands ALONE, overrunning the budget (stated)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 8
    assert by_doc[3][0]["chunk_text"] == "tiny."
    with _pytest.raises(ValueError):
        pipeline.chunk_sentences(df, max_tokens=0)
    with _pytest.raises(ValueError):
        pipeline.chunk_sentences(df, overlap_sentences=-1)


def test_chunk_sentences_overlap_survives_index_gap(spark):
    # review finding: an oversized sentence skips chunk indices
    # (start-based floor jumps several budget multiples); the overlap
    # must land in the NEXT REAL chunk, not a phantom "+1"
    text = "a b c. " + " ".join(f"w{i}" for i in range(12)) + ". x y."
    # token counts 3, 12, 2 -> starts 0, 3, 15 -> chunks 0, 0?, ...
    # with max_tokens=5: floor(0/5)=0, floor(3/5)=0, floor(15/5)=3
    from timeseries_data_provider_spark.operators import pipeline

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_idx"]: r
        for r in pipeline.chunk_sentences(
            df, max_tokens=5, overlap_sentences=1
        ).collect()
    }
    assert set(got) == {0, 3}  # the gap is real
    # chunk 0's last sentence (the giant one) overlaps into chunk 3
    assert got[3]["chunk_text"].startswith("w0 ")
    assert got[3]["chunk_text"].endswith("x y.")
    assert got[3]["n_sentences"] == 2


def test_bm25_prune_dl_identical_results(spark):
    # r11: the matched-sized dl semi-join prune is OPT-IN (it adds a
    # distinct + semi-join consumer of tf — measured slower on
    # corpus-common query terms, faster on selective queries over a
    # large pool); either way the RESULTS are identical, since dl
    # values only ever join for matched docs
    from timeseries_data_provider_spark.operators import text as T

    corpus = [
        (1, "hash join hash join table scan"),
        (2, "hash table"),
        (3, "scan scan scan filter"),
        (4, "merge sort order merge"),
        (5, "join"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    a = sorted(
        map(tuple, T.bm25_topk(df, ["hash join"], k=5).collect())
    )
    b = sorted(
        map(
            tuple,
            T.bm25_topk(df, ["hash join"], k=5, prune_dl=True).collect(),
        )
    )
    assert a == b
