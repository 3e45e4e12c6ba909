"""[EXT] Distributed n-gram language-model training and scoring —
the CCNet-style perplexity-proxy quality signal (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): train token-level n-gram counts on a reference corpus, score
every candidate document by its smoothed log-probability, and gate or
bucket on the score. The classic curation signal this engine's
quality tier was missing next to the Gopher repetition stats and C4
line rules.

Spark-first shape (all JVM, zero Python in either pass):

* **Train** (``ngram_lm``): one explode of (context, next-token)
  pairs + one hash-aggregate — the count table is the MODEL, a plain
  DataFrame keyed on (context, tok) that persists/broadcasts like any
  dimension. Size tracks distinct n-grams (vocabulary), not corpus
  bytes — the same scale class as the MinHash signature and substring
  window indexes.
* **Score** (``ngram_lm_score``): the candidate corpus's n-grams
  LEFT-join the model on (context, tok) and its context totals on
  context — both joins fan out exactly 1 per occurrence (the model is
  unique per key; hot contexts like "the" reduce to one model row, the
  line_dedup/hot-key shape), then one per-doc aggregate.

Numeric contract (the oracle-hashability trick): per-token add-k
log-probabilities are floored to integer MILLI-NATS
(``floor(1000·ln((c + k)/(C + k·V)))``) BEFORE summing, so every
scored column is exact integer math — order-independent, engine-
portable, no float aggregate. With ``k > 0`` every probability is
strictly below 1, so the floored value never sits on the ln(1) = 0
boundary where a last-ulp libm difference could flip it.

OOV semantics: an unseen (context, tok) pair scores with c = 0; an
entirely unseen context scores against C = 0 (pure 1/V mass). V is
the TRAINED next-token vocabulary, attached as a broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators.text import _words


def _ngrams(
    documents: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, context, tok): every n-gram of every document as
    an (n-1)-token context string + next token, 1-based positions —
    the single-space-joined context keeps the model oracle-portable
    (the substring_windows convention). Docs with fewer than n tokens
    yield no rows."""
    w = F.col("__w")
    ctx = F.concat_ws(
        " ", *[F.element_at(w, F.col("pos") + j) for j in range(n - 1)]
    )
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            _words(text_col).alias("__w"),
        )
        .filter(F.size("__w") >= n)
        .select(
            "doc_id",
            "__w",
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (n - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            ctx.alias("context"),
            F.element_at(w, F.col("pos") + (n - 1)).alias("tok"),
        )
    )


def ngram_lm(
    documents: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train an n-gram count model: (context, tok, cnt) over the
    reference corpus — one explode + one hash-aggregate. The returned
    DataFrame IS the model; persist it next to the other settled
    structures, or broadcast it when the n-gram vocabulary is small.
    ``n=1`` degenerates to a unigram model (empty context)."""
    if n < 1:
        raise ValueError(f"ngram_lm: n must be >= 1, got {n}")
    return (
        _ngrams(documents, n, text_col, id_col)
        .groupBy("context", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_score(
    documents: DataFrame,
    lm: DataFrame,
    n: int = 2,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a trained ``ngram_lm`` model with
    add-k smoothing, in exact integer milli-nats:

    per token: ``floor(1000 · ln((cnt + k) / (ctx_total + k·V)))``

    Returns (doc_id, n_ngrams, n_hits, logprob_milli,
    avg_logprob_milli) — ``n_hits`` counts n-grams the model has seen
    (the coverage signal), ``logprob_milli`` is the summed floored
    milli-nat log-probability (more negative = more surprising =
    CCNet's low-quality tail), ``avg_logprob_milli`` its per-n-gram
    floor (the length-normalized gate, a monotone proxy for
    perplexity: ppl = exp(-avg/1000)). Documents with fewer than n
    tokens score 0 n-grams and NULL averages.

    Scale shape: two fan-out-exactly-1 equi-joins (model unique per
    (context, tok); context totals unique per context) + one per-doc
    hash-aggregate. V rides a broadcast one-row cross join, the
    text.py scalar-attachment pattern."""
    grams = _ngrams(documents, n, text_col, id_col)
    ctx_totals = lm.groupBy("context").agg(
        F.sum("cnt").alias("__ctx_total")
    )
    vocab = lm.select(
        F.count_distinct("tok").cast("long").alias("__v")
    )
    scored = (
        grams.join(lm, ["context", "tok"], "left")
        .join(ctx_totals, "context", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce("cnt", F.lit(0)).alias("__c"),
            F.coalesce("__ctx_total", F.lit(0)).alias("__t"),
            "__v",
        )
        .select(
            "doc_id",
            (F.col("__c") > 0).cast("long").alias("__hit"),
            F.floor(
                F.lit(1000.0)
                * F.log(
                    (F.col("__c") + F.lit(float(k)))
                    / (F.col("__t") + F.lit(float(k)) * F.col("__v"))
                )
            ).alias("__milli"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__hit").alias("n_hits"),
            F.sum("__milli").alias("logprob_milli"),
        )
        .withColumn(
            "avg_logprob_milli",
            F.floor(
                F.col("logprob_milli").cast("double")
                / F.col("n_ngrams")
            ).cast("long"),
        )
    )
    base = documents.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.coalesce("logprob_milli", F.lit(0).cast("long")).alias(
            "logprob_milli"
        ),
        F.col("avg_logprob_milli"),
    )
