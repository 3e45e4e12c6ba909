"""Dedup-operator unit tests: hot-shingle frequency cap (skew guard),
connected-components convergence guard, and the portable md5 SimHash
sketch. Reference parity for the happy paths is covered by
tests/test_oracle_parity.py; these pin the scale/robustness behaviors
the oracles can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in edges], "doc_a long, doc_b long"
    )


def test_star_cc_matches_minlabel_on_random_graphs(spark):
    """connected_components_star must produce identical labels to the
    min-label formulation (same output contract, fewer rounds)."""
    import random

    rng = random.Random(1)
    for _ in range(3):
        edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(35)]
        df = _pairs(spark, edges)
        a = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.connected_components(
                df, max_iterations=100
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.connected_components_star(df).collect()
        )
        assert a == b


def test_star_cc_chain_diameter_50_converges_fast(spark):
    """VERDICT r4 #5: the adversarial chain. Min-label propagation
    needs diameter rounds (50 — trips its default 20-round cap); the
    star formulation converges within 7 rounds (measured; cap pinned
    at 8 so a regression to per-hop propagation fails loudly)."""
    chain = _pairs(spark, [(i, i + 1) for i in range(50)])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain).collect()
    labels = dedup.connected_components_star(
        chain, max_iterations=8
    ).collect()
    assert len(labels) == 51
    assert all(r["cluster_id"] == 0 for r in labels)


def test_star_cc_handles_self_pairs_and_empty(spark):
    """Self-pairs label themselves (parity with connected_components);
    an empty edge list yields an empty result, not an error."""
    df = _pairs(spark, [(7, 7), (1, 2)])
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_star(df).collect()
    )
    assert got == [(1, 1), (2, 1), (7, 7)]
    assert dedup.connected_components_star(
        _pairs(spark, [])
    ).count() == 0


def test_hot_shingle_cap_is_the_default(spark):
    """VERDICT r4 #2: library callers at scale take the default, and
    the default must be the capped candidate join (the 64x stress row
    measured the uncapped form 15x slower on one hot shingle, zero
    recall gain). The declared oracle queries opt out explicitly."""
    import inspect

    assert inspect.signature(dedup.ngram_jaccard_pairs).parameters[
        "max_df"
    ].default == 1000
    assert inspect.signature(dedup.neardup_clusters).parameters[
        "max_df"
    ].default == 1000

    # on a corpus with no super-cap shingle the default-capped result
    # is identical to the uncapped oracle form
    rows = [(i, f"alpha beta gamma u{i}a u{i}b") for i in range(6)]
    rows.append((10, "alpha beta gamma delta epsilon zeta"))
    rows.append((11, "alpha beta gamma delta epsilon eta"))
    docs = _docs(spark, rows)
    capped = {
        (r.doc_a, r.doc_b, r.j)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, r.j)
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=None
        ).collect()
    }
    assert capped == uncapped and (10, 11) in {
        (a, b) for a, b, _ in capped
    }


def test_shingle_df_cap(spark):
    # Every doc shares one boilerplate trigram (document frequency 22 —
    # the planted hot shingle); docs 20/21 are genuine near-dups that
    # also share rare shingles.
    boiler = "lorem ipsum dolor"
    rows = [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d") for i in range(20)]
    rows.append((20, f"{boiler} alpha beta gamma delta epsilon"))
    rows.append((21, f"{boiler} alpha beta gamma delta zeta"))
    docs = _docs(spark, rows)

    full = {
        (r.doc_a, r.doc_b): r.j
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.j
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=5
        ).collect()
    }
    # the hot shingle alone can't push any pair over threshold=0.2 here,
    # so the capped result is IDENTICAL — including the exact Jaccard of
    # the true near-dup pair, which is computed over FULL shingle sets
    # (candidate generation is capped, verification is not).
    assert (20, 21) in capped
    assert capped == full

    # the cap really does drop the hot shingle from candidate generation
    ex = dedup.shingles_exploded(docs, 3)
    kept = {
        r.s for r in dedup._df_capped(ex, 5).select("s").distinct().collect()
    }
    hot = f"{boiler}"
    assert hot not in kept
    assert any("alpha beta gamma" == s for s in kept)

    # minhash signatures honor the same cap (the hot shingle carries no
    # discriminating information)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, n=3, threshold=0.2, max_df=5
        ).collect()
    }
    assert (20, 21) in pairs


def test_connected_components_raises_on_iteration_cap(spark):
    # chain 0-1-2-...-9: min-label propagation moves the label one hop
    # per round, so diameter 9 cannot converge in 2 rounds — silent
    # wrong cluster ids must be an error, not a return value (ADVICE r1)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iterations=2).collect()
    # and with room to converge the chain is one cluster labeled 0
    labels = dedup.connected_components(edges, max_iterations=20).collect()
    assert {r.cluster_id for r in labels} == {0}
    assert len(labels) == 10


def test_simhash_quarters_portable_and_partition_invariant(spark):
    rows = [(i, f"w{i} common text body shared tokens") for i in range(50)]
    docs = _docs(spark, rows)
    a = {
        r.doc_id: (r.q0, r.q1, r.q2, r.q3)
        for r in dedup.simhash(docs).collect()
    }
    b = {
        r.doc_id: (r.q0, r.q1, r.q2, r.q3)
        for r in dedup.simhash(docs.repartition(7)).collect()
    }
    assert a == b
    assert all(
        0 <= q <= 0xFFFF for quads in a.values() for q in quads
    ), "quarters must be 16-bit"


def test_minhash_lsh_incremental_planted(spark):
    from timeseries_data_provider_spark import tables
    from tests.conftest import SF_SMOKE

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    fresh = docs.filter(F.col("doc_id") % 2 == 1)
    # plant: copies of corpus docs under fresh ids (+1e6), and one
    # within-batch duplicate pair (+2e6 / +3e6 of the same corpus text)
    dup_src = corpus.filter(F.col("doc_id") % 10 == 0)
    dup_of_corpus = dup_src.withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    # deterministic twin source: limit(1) without an orderBy may pick
    # DIFFERENT rows across executions (review finding) — pin the row
    twin_src = dup_src.orderBy("doc_id").limit(1).localCheckpoint()
    twin_a = twin_src.withColumn(
        "doc_id", F.col("doc_id") + F.lit(2_000_000)
    )
    twin_b = twin_src.withColumn(
        "doc_id", F.col("doc_id") + F.lit(3_000_000)
    )
    batch = fresh.unionByName(dup_of_corpus).unionByName(twin_a).unionByName(
        twin_b
    )

    signatures = dedup.minhash_signatures(corpus)
    pairs, new_sig = dedup.minhash_lsh_incremental(batch, signatures)
    got = pairs.collect()
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    # doc_b is always a new doc: the corpus is never self-joined
    assert all(r["doc_b"] in batch_ids for r in got)
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in got}

    # every planted corpus-copy found against its source, est = 1.0
    for r in dup_src.select("doc_id").collect():
        src, cpy = r["doc_id"], r["doc_id"] + 1_000_000
        assert (src, cpy) in by_pair, f"missed corpus dup {src}->{cpy}"
        assert by_pair[(src, cpy)]["est_jaccard"] == 1.0
        assert by_pair[(src, cpy)]["source"] == "corpus"

    # the within-batch twin pair is found and tagged 'batch'
    twin_ids = sorted(
        r["doc_id"]
        for r in twin_a.unionByName(twin_b).select("doc_id").collect()
    )
    tp = (twin_ids[0], twin_ids[1])
    assert tp in by_pair and by_pair[tp]["source"] == "batch"
    assert by_pair[tp]["est_jaccard"] == 1.0

    # new_signatures covers exactly the shingled batch docs — the
    # append-to-index maintenance set
    assert {r["doc_id"] for r in new_sig.select("doc_id").collect()} <= batch_ids

    # deterministic: a second run returns the identical pair set
    pairs2, _ = dedup.minhash_lsh_incremental(
        batch.repartition(5), signatures
    )
    assert sorted((r["doc_a"], r["doc_b"]) for r in got) == sorted(
        (r["doc_a"], r["doc_b"]) for r in pairs2.collect()
    )


def test_minhash_lsh_incremental_rejects_mismatched_index(spark):
    from timeseries_data_provider_spark import tables
    from tests.conftest import SF_SMOKE

    docs = tables.load_table(spark, SF_SMOKE, "documents").limit(20)
    narrow = dedup.minhash_signatures(docs, num_hashes=8)
    with pytest.raises(ValueError, match="num_hashes=16 expects"):
        dedup.minhash_lsh_incremental(docs, narrow)  # default expects h0..h15


def test_line_dedup_planted_boilerplate(spark):
    # Three docs share a footer; each has unique content; doc 3 is ALL
    # boilerplate (must still appear, with empty clean_text); order of
    # kept lines is preserved.
    from timeseries_data_provider_spark.operators import dedup

    rows = [
        (0, "alpha content\nshared footer line\nmore alpha"),
        (1, "beta content\nshared footer line"),
        (2, "gamma content\nshared footer line\nshared footer line"),
        (3, "shared footer line"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(df, min_df=2).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == "alpha content\nmore alpha"
    assert out[1]["clean_text"] == "beta content"
    # within-doc repetition of a df>=2 line: both occurrences dropped
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 1
    # fully-boilerplate doc survives with empty text
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_line_dedup_within_doc_repeat_of_unique_line_kept(spark):
    # df counts DISTINCT documents: a line repeated inside ONE doc has
    # df=1 and both occurrences are kept (within-doc repetition is the
    # repetition_signals operator's job, not cross-doc dedup's).
    from timeseries_data_provider_spark.operators import dedup

    df = spark.createDataFrame(
        [(0, "solo line\nsolo line"), (1, "other text")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(df, min_df=2).collect()
    }
    assert out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == "solo line\nsolo line"


def test_line_df_counts_documents_not_occurrences(spark):
    from timeseries_data_provider_spark.operators import dedup

    df = spark.createDataFrame(
        [(0, "x\nx\nx"), (1, "x\ny")], ["doc_id", "text"]
    )
    occ = dedup.line_occurrences(df)
    dfreq = {r["line"]: r["df"] for r in dedup.line_df(occ).collect()}
    assert dfreq == {"x": 2, "y": 1}


def test_drop_near_dups_keeps_one_representative_per_cluster(spark):
    from timeseries_data_provider_spark.operators import dedup

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),       # dup of 0
        (2, "alpha beta gamma delta epsilon eta"),        # near-dup of 0/1
        (3, "totally different words entirely here now"),
        (4, "another unrelated document with fresh text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r["doc_id"]
        for r in dedup.drop_near_dups(df, threshold=0.5, max_df=None).collect()
    )
    # cluster {0,1,2} -> representative 0; 3 and 4 unclustered
    assert kept == [0, 3, 4]
    # original columns survive
    out = dedup.drop_near_dups(df, threshold=0.5, max_df=None)
    assert set(out.columns) == {"doc_id", "text"}


def test_line_dedup_normalizes_crlf(spark):
    from timeseries_data_provider_spark.operators import dedup

    df = spark.createDataFrame(
        [(0, "shared\r\nunique zero"), (1, "shared\nunique one")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup.line_dedup(df, min_df=2).collect()}
    # the CRLF doc's 'shared' line matches the LF doc's (df = 2, dropped)
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 1
    assert out[0]["clean_text"] == "unique zero"
    assert out[1]["clean_text"] == "unique one"


def _identical_docs(spark, n, text="the quick brown fox jumps over a lazy dog again and again"):
    return spark.createDataFrame(
        [(i, text) for i in range(n)], ["doc_id", "text"]
    )


def test_lsh_hot_bucket_cap_preserves_cluster_connectivity(spark):
    # VERDICT r5 #2: a pile of identical docs makes EVERY band bucket
    # hot. With the cap, candidates are star-paired (linear fan-out)
    # but the verified pairs must still connect the whole cluster.
    from timeseries_data_provider_spark.operators import dedup

    docs = _identical_docs(spark, 30).unionByName(
        spark.createDataFrame(
            [(100, "completely unrelated content about astrophysics"),
             (101, "another distinct document body entirely")],
            ["doc_id", "text"],
        )
    )
    capped = dedup.minhash_lsh_pairs(docs, max_bucket=8).collect()
    # star shape: 29 pairs all anchored at doc 0, J == 1.0
    assert len(capped) == 29
    assert all(r["doc_a"] == 0 and r["j"] == 1.0 for r in capped)
    assert sorted(r["doc_b"] for r in capped) == list(range(1, 30))
    # uncapped: the full quadratic 30*29/2 pair set
    uncapped = dedup.minhash_lsh_pairs(docs, max_bucket=None).collect()
    assert len(uncapped) == 435


def test_lsh_cap_no_effect_below_threshold(spark):
    # cold buckets must be byte-identical to the uncapped join
    from timeseries_data_provider_spark.operators import dedup

    docs = _identical_docs(spark, 5).unionByName(
        spark.createDataFrame(
            [(200, "some shared tokens quick brown fox here"),
             (201, "other text with no overlap whatsoever")],
            ["doc_id", "text"],
        )
    )
    a = sorted(
        (r["doc_a"], r["doc_b"], r["j"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=256).collect()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], r["j"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=None).collect()
    )
    assert a == b


def test_incremental_lsh_hot_bucket_cap(spark):
    # combined corpus+batch bucket population over the cap: each NEW
    # doc must still be found (starred against a CORPUS rep => source
    # 'corpus'), never corpus x corpus, doc_b always the new doc.
    from timeseries_data_provider_spark.operators import dedup

    corpus = _identical_docs(spark, 20)
    sig = dedup.minhash_signatures(corpus)
    batch = spark.createDataFrame(
        [(1000 + i, "the quick brown fox jumps over a lazy dog again and again")
         for i in range(10)],
        ["doc_id", "text"],
    )
    pairs, _ = dedup.minhash_lsh_incremental(
        batch, sig, min_est=1.0, max_bucket=8
    )
    rows = pairs.collect()
    assert all(r["doc_b"] >= 1000 for r in rows)
    assert all(r["doc_a"] == 0 and r["source"] == "corpus" for r in rows)
    assert sorted(r["doc_b"] for r in rows) == [1000 + i for i in range(10)]
    # all-new hot bucket: rep falls back to the batch-side min
    empty_sig = dedup.minhash_signatures(
        corpus.filter(F.col("doc_id") < 0)
    )
    pairs2, _ = dedup.minhash_lsh_incremental(
        batch, empty_sig, min_est=1.0, max_bucket=4
    )
    rows2 = pairs2.collect()
    assert all(
        r["doc_a"] == 1000 and r["source"] == "batch" for r in rows2
    )
    assert sorted(r["doc_b"] for r in rows2) == [1001 + i for i in range(9)]


def test_lsh_cap_is_opt_in_at_the_library_tier():
    # ADVICE r6: the hot-bucket cap changes which pairs are emitted,
    # so the LIBRARY default is off (like max_df); the streaming
    # ingest path opts in (operational quadratic-blow-up risk).
    import inspect

    from timeseries_data_provider_spark.operators import dedup
    from timeseries_data_provider_spark.streaming import corpus_ingest

    for fn in (dedup.minhash_lsh_pairs, dedup.minhash_lsh_incremental):
        assert (
            inspect.signature(fn).parameters["max_bucket"].default is None
        ), f"{fn.__name__} must default max_bucket=None"
    assert (
        inspect.signature(corpus_ingest.ingest_documents_stream)
        .parameters["max_bucket"]
        .default
        == 256
    )


def test_simhash_matches_aggregate_form(spark):
    """The r15 Arrow-pass simhash must reproduce the original
    explode + 64-conditional-sum groupBy sketch bit-for-bit —
    including split(" ") empty-token semantics (trailing/doubled
    spaces), the empty string, and NULL text (doc absent)."""
    from pyspark.sql import functions as F

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat  sat on the mat "),   # doubled + trailing space
        (2, ""),                            # one empty token
        (3, None),                          # absent from output
        (4, "zzz zzz zzz aaab"),
        (5, "Ünïcôdé wörds hërë"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["q0"], r["q1"], r["q2"], r["q3"])
        for r in dedup.simhash(docs).collect()
    }

    # reference: the pre-r15 aggregate formulation, inline
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).withColumn("h", F.md5("w"))
    nibbled = words.select(
        "doc_id",
        *[
            F.conv(F.substring(F.col("h"), p + 1, 1), 16, 10)
            .cast("int")
            .alias(f"n{p}")
            for p in range(16)
        ],
    )
    aggs = [
        F.sum(
            F.shiftright(F.col(f"n{j // 4}"), j % 4).bitwiseAND(
                F.lit(1)
            )
            * 2
            - 1
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sums = nibbled.groupBy("doc_id").agg(*aggs)
    quarter_cols = []
    for q in range(4):
        acc = F.lit(0)
        for k in range(16):
            j = q * 16 + k
            acc = acc + F.when(
                F.col(f"b{j}") > 0, F.lit(1 << k)
            ).otherwise(F.lit(0))
        quarter_cols.append(acc.cast("long").alias(f"q{q}"))
    want = {
        r["doc_id"]: (r["q0"], r["q1"], r["q2"], r["q3"])
        for r in sums.select("doc_id", *quarter_cols).collect()
    }
    assert got == want
    assert 3 not in got
