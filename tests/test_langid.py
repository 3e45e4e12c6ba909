"""Cavnar-Trenkle n-gram language ID (operators/langid).

Covers: profile training ranks against an independent Python
reference, classification of held-out text in planted languages,
out-of-place distance math (hand-checked), deterministic tie-breaks,
short/gramless docs -> NULL, and the broadcast plan shape."""

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import langid

# three tiny "languages" with distinct character statistics
EN = [
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine and all that",
    "never put off until tomorrow what you can do today",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund",
    "uebung macht den meister sagte der alte schmied",
    "wer zuletzt lacht lacht am besten im leben",
]
ES = [
    "el rapido zorro marron salta sobre el perro perezoso",
    "mas vale pajaro en mano que ciento volando siempre",
    "no por mucho madrugar amanece mas temprano aqui",
]


def _train_df(spark):
    rows = [(i, t, l) for i, (t, l) in enumerate(
        [(t, "en") for t in EN] + [(t, "de") for t in DE] + [(t, "es") for t in ES]
    )]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )


def _py_profile(texts, n=3, top_k=300):
    c = Counter()
    for t in texts:
        t = t.lower()
        for i in range(len(t) - n + 1):
            c[t[i : i + n]] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return {g: r + 1 for r, (g, _) in enumerate(ranked)}


def test_profiles_match_python_reference(spark):
    prof = langid.train_langid_profiles(_train_df(spark), top_k=50)
    got = {
        (r["lang"], r["gram"]): r["rank"] for r in prof.collect()
    }
    for lang, texts in (("en", EN), ("de", DE), ("es", ES)):
        ref = _py_profile(texts, top_k=50)
        mine = {g: r for (l, g), r in got.items() if l == lang}
        assert mine == ref, lang


def test_classifies_held_out_text(spark):
    prof = langid.train_langid_profiles(_train_df(spark), top_k=200)
    tests = [
        (1, "the brown dog can jump over anything today", "en"),
        (2, "der alte hund springt ueber den zaun", "de"),
        (3, "el perro viejo salta sobre la valla", "es"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(tests, columns=["doc_id", "text", "want"])
    )
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in langid.langid_classify(df, prof, top_k=200).collect()
    }
    for i, _, want in tests:
        assert out[i] == want


def test_out_of_place_distance_hand_checked(spark):
    # profile: one language, grams "abc"(rank1), "bcd"(rank2)
    prof = spark.createDataFrame(
        pd.DataFrame(
            {"lang": ["x", "x"], "gram": ["abc", "bcd"], "rank": [1, 2]}
        )
    )
    # doc "abcq": grams abc(rank1), bcq(rank2) -> |1-1| + top_k
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["abcq"]})
    )
    r = langid.langid_classify(df, prof, top_k=10).collect()[0]
    assert r["lang_pred"] == "x" and r["distance"] == 0 + 10


def test_tie_breaks_to_smallest_lang(spark):
    prof = spark.createDataFrame(
        pd.DataFrame(
            {
                "lang": ["b", "a"],
                "gram": ["zzz", "zzz"],
                "rank": [1, 1],
            }
        )
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["zzz"]})
    )
    assert (
        langid.langid_classify(df, prof).collect()[0]["lang_pred"] == "a"
    )


def test_short_doc_is_null(spark):
    prof = langid.train_langid_profiles(_train_df(spark))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["ab", "the dog"]})
    )
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in langid.langid_classify(df, prof).collect()
    }
    assert out[1] is None and out[2] is not None


def test_profile_side_broadcasts(spark):
    prof = langid.train_langid_profiles(_train_df(spark))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["the dog"]})
    )
    plan = (
        langid.langid_classify(df, prof)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_classify_matches_window_form(spark):
    """The r15 Arrow-pass + hits-only classify must reproduce the
    original explode/count/rank-window/cross-join formulation exactly
    — same ranks under (count DESC, gram ASC) ties and same
    distances (hit |Δrank| / miss top_k)."""
    from pyspark.sql import functions as F, Window

    from timeseries_data_provider_spark.operators import langid

    rows = [
        (0, "aaab aaab zzz", "en"),
        (1, "the cat sat on the mat", "en"),
        (2, "le chat est sur le tapis", "fr"),
        (3, "ab", "en"),            # shorter than a trigram: NULL
        (4, "zzzzzzzzzz aaab", "fr"),
        (5, "ababababab", "en"),    # heavy ties
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    top_k = 4
    prof = langid.train_langid_profiles(d, top_k=top_k)
    got = (
        langid.langid_classify(d, prof, top_k=top_k)
        .orderBy("doc_id")
        .collect()
    )

    # reference: the pre-r15 window/cross-join formulation, inline
    n = 3
    t = F.lower(F.col("text"))
    grams = d.select(
        F.col("doc_id"),
        F.explode(langid._grams(t, n)).alias("p"),
        t.alias("__t"),
    ).select(
        "doc_id", F.col("__t").substr(F.col("p"), F.lit(n)).alias("gram")
    )
    counts = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("gram").asc()
    )
    doc_prof = (
        counts.withColumn("drank", F.row_number().over(w))
        .filter(F.col("drank") <= top_k)
        .select("doc_id", "gram", "drank")
    )
    langs = prof.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(prof.withColumnRenamed("rank", "prank")),
            ["lang", "gram"],
            "left",
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("prank")),
                    F.lit(top_k),
                )
            ).alias("distance")
        )
    )
    pick = Window.partitionBy("doc_id").orderBy(
        F.col("distance").asc(), F.col("lang").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("lang_pred"),
            F.col("distance").cast("long").alias("distance"),
        )
    )
    want = (
        d.select("doc_id")
        .join(best, "doc_id", "left")
        .select("doc_id", "lang_pred", "distance")
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
