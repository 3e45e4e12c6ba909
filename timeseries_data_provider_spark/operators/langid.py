"""N-gram language identification (Cavnar-Trenkle) — all JVM.

Upgrades the admitted marker-word stub (text.lang_guess docstring:
"Real language ID would be a fastText-style model...") to the classic
rank-order n-gram classifier: Cavnar & Trenkle 1994, "N-Gram-Based
Text Categorization" — the algorithm behind textcat and the ancestor
of every crawl pipeline's language router. Public-knowledge basis
only; the reference (index.js) has no text surface ([EXT] SURVEY §2).

Method: a language PROFILE is its top-K most frequent character
n-grams ranked by frequency; a document is classified to the language
minimizing the out-of-place distance Σ |rank_doc(g) − rank_lang(g)|
with a K penalty for grams absent from the language profile.

Everything is deterministic built-in expressions — char n-grams via
substr over an exploded position sequence, ranks via windows with
total tie-break orders (count DESC, gram ASC; distance ties -> lang
ASC) — so a SQL oracle replays training AND classification
bit-for-bat. Zero Python.

Scale shape: training is one explode + one hash-agg + a per-language
top-K window over language-count-sized groups; the resulting profile
table is MODEL-sized (langs x K rows) and broadcast into
classification, whose cost is one explode + per-doc window + one
broadcast join + two aggregates. Docs never shuffle by language;
the explode fan-out is ~chars-per-doc, the same envelope as the
n-gram LM (lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_langid_profiles", "langid_classify"]


def _grams(text_col, n: int):
    """Exploded char n-gram positions: empty for texts shorter than n
    (Spark's sequence() counts DOWN when start > stop — the guard is
    load-bearing)."""
    length = F.length(text_col)
    return F.when(
        length >= n, F.sequence(F.lit(1), length - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def train_langid_profiles(
    documents: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """Per-language rank profiles: (lang, gram, rank) with rank in
    1..top_k by (count DESC, gram ASC) — the Cavnar-Trenkle model.
    One explode + one hash-agg + one window over language-sized
    groups; output is model-sized."""
    t = F.lower(F.col(text_col))
    grams = documents.select(
        F.col(lang_col).alias("lang"),
        F.explode(_grams(t, n)).alias("p"),
        t.alias("__t"),
    ).select("lang", F.col("__t").substr(F.col("p"), F.lit(n)).alias("gram"))
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def langid_classify(
    documents: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """Classify each document to the profile language minimizing the
    out-of-place distance (absent grams cost ``top_k``). Returns
    (id, lang_pred, distance). Deterministic: distance ties break to
    the lexically smallest language. Documents shorter than ``n``
    chars (no grams) return NULL lang_pred rather than a spurious
    winner."""
    # r15: the doc-side profile (count grams, rank top_k per doc) is
    # GROUPED BY THE ROW ITSELF, so it needs no shuffle at all — one
    # Arrow pass with a per-doc Counter replaces the 1.5M-row explode
    # + hash-agg + per-doc rank window that dominated this operator
    # (guide §2.4: remove shuffles outright). Ordering parity is
    # exact: lowercasing stays IN THE JVM (Python str.lower() differs on
    # Unicode edge cases), Python slices and Spark substr both index
    # code points, and Python str ordering == Spark's UTF8 binary
    # ordering for valid strings, so (count DESC, gram ASC) ranks are
    # identical to the window form (pinned in tests/test_langid.py).
    from timeseries_data_provider_spark.tables import widen_for_python

    lowered = documents.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__t")
    )

    def rank_grams(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids: list = []
            grams_out: list = []
            dranks: list = []
            for rid, t in zip(pdf[id_col], pdf["__t"]):
                if t is None or len(t) < n:
                    continue
                cnt = Counter(
                    t[i:i + n] for i in range(len(t) - n + 1)
                )
                top = sorted(
                    cnt.items(), key=lambda kv: (-kv[1], kv[0])
                )[:top_k]
                rid = int(rid)
                for r, (g, _c) in enumerate(top, 1):
                    ids.append(rid)
                    grams_out.append(g)
                    dranks.append(r)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "gram": pd.Series(grams_out, dtype="object"),
                    "drank": pd.Series(dranks, dtype="int64"),
                }
            )

    doc_prof = widen_for_python(lowered).mapInPandas(
        rank_grams, f"{id_col} long, gram string, drank long"
    )
    langs = profiles.select("lang").distinct()
    # r15: score from PROFILE HITS only — distance decomposes as
    # Σ_hits |Δrank| + (n_doc_grams - n_hits) · top_k, so the
    # doc-grams × all-langs cross join (miss rows carried top_k
    # each) collapses to the inner gram join plus one tiny per-doc
    # gram count; integer-exact, same distances.
    prof_b = F.broadcast(profiles.withColumnRenamed("rank", "prank"))
    per_lang = (
        doc_prof.join(prof_b, "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.abs(F.col("drank") - F.col("prank"))).alias(
                "__hitsum"
            ),
            F.count(F.lit(1)).alias("__nhits"),
        )
    )
    ngrams = doc_prof.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__ng")
    )
    scored = (
        ngrams.crossJoin(F.broadcast(langs))
        .join(per_lang, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            (
                F.coalesce(F.col("__hitsum"), F.lit(0))
                + (
                    F.col("__ng")
                    - F.coalesce(F.col("__nhits"), F.lit(0))
                )
                * top_k
            ).alias("distance"),
        )
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("lang").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("lang").alias("lang_pred"),
            F.col("distance").cast("long").alias("distance"),
        )
    )
    # short/gramless docs: present with NULL prediction
    return (
        documents.select(id_col)
        .join(best, id_col, "left")
        .select(id_col, "lang_pred", "distance")
    )
