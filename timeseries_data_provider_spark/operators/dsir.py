"""[EXT] DSIR — Data Selection via Importance Resampling.

The published recipe for picking pretraining data that LOOKS LIKE a
target domain (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", NeurIPS — the public method behind many
"quality-matched" corpus cuts): fit two bag-of-hashed-n-grams
models — p̂ on a target-domain sample, q̂ on the raw pool — and
resample raw documents with probability proportional to the
importance ratio p̂(x)/q̂(x), using Gumbel top-k so the draw is a
single distributed top-k instead of sequential sampling. Reference
parity note: index.js:1-290 has no curation surface; [EXT]
LLM-pipeline scope per SURVEY §2.

Design (every piece an established repo pattern):

- FEATURES: hashed unigrams + bigrams into ``dim`` buckets via the
  engine-portable md5-prefix bucket (the classifier.hashed_buckets /
  SimHash pattern — ``CAST('0x'||substr(md5(g),1,12) AS BIGINT) %
  dim`` replays in DuckDB), bigrams through the winnowing adjacent-
  token concat. One explode per corpus, all JVM.
- MODELS: add-1-smoothed unigram-over-buckets counts; the per-bucket
  log ratio ``ln((tc+1)/(Tt+dim)) - ln((rc+1)/(Tr+dim))`` is floored
  to integer MILLI-nats per bucket (the lm.py exact-aggregation
  rule), so a document's log-weight is an order-independent exact
  integer sum — oracle-replayable with operator-for-operator float
  ordering.
- WEIGHTS: one broadcast join of the (dim-sized) log-ratio table
  into the corpus's (doc, bucket, count) features, one per-doc hash
  aggregate. Zero Python, zero driver data beyond the dim-row model.
- RESAMPLING: Gumbel-top-k — score = weight_milli + floor(1000 *
  g(u)) with g(u) = -ln(-ln(u)) and u the md5-prefix uniform of the
  doc id (the weighted_sample/A-ES determinism: reproducible across
  runs, cluster sizes, and engines; no rand()). The plan is a
  TakeOrderedAndProject: per-partition partial top-k, k rows per
  partition to the driver, no global sort.

Scale shape: two corpus scans (target is a SAMPLE — small by
construction; the raw pool scan is the one big pass), two bucket
aggregates bounded by ``dim``, one broadcast join, one top-k. At
100 TB the raw-pool features shuffle once on (doc, bucket) — compact
keys — and everything downstream is model-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_bucket_features", "dsir_logratios",
           "dsir_logratios_from_features", "dsir_weights",
           "dsir_select"]


def _words(text_col: str) -> Column:
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )


def _bucket(gram: Column, dim: int) -> Column:
    # md5-prefix bucket (12 hex chars = 48 bits, exact in a BIGINT on
    # both engines) — classifier.hashed_buckets' portable hash
    return F.conv(F.substring(F.md5(gram), 1, 12), 16, 10).cast(
        "long"
    ) % F.lit(int(dim))


def ngram_bucket_features(
    df: DataFrame,
    dim: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded hashed n-gram features: (id, bucket, c) — unigrams
    plus adjacent-token bigrams (the DSIR feature space), counted per
    document. Empty/whitespace-only docs emit no rows."""
    ws = _words(text_col)
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(ws, bigrams)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(grams).alias("__g"),
        )
        .select("doc_id", _bucket(F.col("__g"), dim).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_logratios(
    target: DataFrame,
    raw: DataFrame,
    dim: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_features: DataFrame | None = None,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """The model: (bucket, lr_milli) over the FULL bucket domain —
    floor-milli-nat log ratio of the add-1-smoothed hashed-n-gram
    models fit on ``target`` vs ``raw``. dim-sized (broadcastable by
    construction); buckets unseen in both corpora still get the
    smoothing-only ratio so scoring never hits a missing key.

    ``target_features``/``raw_features``: optional precomputed
    ``ngram_bucket_features`` frames — when the target is a subset of
    the raw pool (the common DSIR setup), compute the pool's features
    ONCE and pass a filter of the same frame as the target's; the
    explode+hash is the dominant cost at scale and must not run three
    times (review finding: q64 scanned the corpus features thrice)."""
    spark = target.sparkSession

    def counts(df: DataFrame | None, src: DataFrame, name: str):
        feats = (
            df
            if df is not None
            else ngram_bucket_features(src, dim, text_col, id_col)
        )
        return feats.groupBy("bucket").agg(F.sum("c").alias(name))

    tc = counts(target_features, target, "tc")
    rc = counts(raw_features, raw, "rc")
    # coalesce: an EMPTY (or whitespace-only) corpus sums to NULL,
    # which would NULL every ln() and silently zero all importance
    # weights downstream (review finding — the oracle's dtot already
    # coalesced; the operator now matches)
    tt = tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("__tt"))
    tr = rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("__tr"))
    domain = spark.range(int(dim)).select(F.col("id").alias("bucket"))
    joined = (
        domain.join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "bucket",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
            F.col("__tt"),
            F.col("__tr"),
        )
    )
    # operator-for-operator IEEE ordering (the KN oracle rule): the
    # SQL replay must subtract the four ln() terms in THIS order
    lr = (
        F.log(F.col("tc") + F.lit(1.0))
        - F.log(F.col("__tt") + F.lit(float(dim)))
        - F.log(F.col("rc") + F.lit(1.0))
        + F.log(F.col("__tr") + F.lit(float(dim)))
    )
    return joined.select(
        "bucket",
        "tc",
        "rc",
        F.floor(F.lit(1000.0) * lr).cast("long").alias("lr_milli"),
    )


def dsir_logratios_from_features(
    features: DataFrame,
    target_cond: Column,
    dim: int = 8192,
) -> DataFrame:
    """Subset fast path of ``dsir_logratios``: when the target domain
    is a SUBSET of the raw pool (the common DSIR setup — "docs that
    look like X" where X is a marked slice), BOTH models come out of
    ONE aggregate over one precomputed ``ngram_bucket_features``
    frame: tc = Σc where ``target_cond``, rc = Σc. Identical lr_milli
    values to the two-frame form (parity-pinned); one shuffle instead
    of two plus no second feature explode — at 5k docs this was the
    difference between an 8.5 s and a ~2 s DSIR chain (r11
    measurement), and the stage count stays flat with corpus size."""
    spark = features.sparkSession
    both = features.groupBy("bucket").agg(
        F.sum(
            F.when(target_cond, F.col("c")).otherwise(F.lit(0))
        ).alias("tc"),
        F.sum("c").alias("rc"),
    )
    tot = both.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("__tt"),
        F.coalesce(F.sum("rc"), F.lit(0)).alias("__tr"),
    )
    domain = spark.range(int(dim)).select(F.col("id").alias("bucket"))
    joined = (
        domain.join(both, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
            F.col("__tt"),
            F.col("__tr"),
        )
    )
    lr = (
        F.log(F.col("tc") + F.lit(1.0))
        - F.log(F.col("__tt") + F.lit(float(dim)))
        - F.log(F.col("rc") + F.lit(1.0))
        + F.log(F.col("__tr") + F.lit(float(dim)))
    )
    return joined.select(
        "bucket",
        "tc",
        "rc",
        F.floor(F.lit(1000.0) * lr).cast("long").alias("lr_milli"),
    )


def dsir_weights(
    corpus: DataFrame,
    logratios: DataFrame,
    dim: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance log-weight: (doc_id, n_feats,
    dsir_milli) with dsir_milli = Σ_b c_b(x)·lr_milli[b] — exact
    integer, order-independent. Docs with no features (empty text)
    keep a 0 weight rather than vanishing (curation must see every
    candidate). ``features``: optional precomputed
    ``ngram_bucket_features`` frame (see dsir_logratios)."""
    feats = (
        features
        if features is not None
        else ngram_bucket_features(corpus, dim, text_col, id_col)
    )
    scored = (
        feats.join(
            F.broadcast(logratios.select("bucket", "lr_milli")), "bucket"
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_milli")).alias("dsir_milli"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias(
                "n_feats"
            ),
            F.coalesce(
                F.col("dsir_milli"), F.lit(0).cast("long")
            ).alias("dsir_milli"),
        )
    )


def dsir_select(
    weighted: DataFrame,
    k: int,
    seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k importance resampling: score = dsir_milli +
    floor(1000·g(u)), g(u) = -ln(-ln(u)), u the md5-prefix uniform of
    (seed, id) — the A-ES determinism, so the exact draw replays from
    ids alone on any engine. Returns (doc_id, dsir_milli,
    gumbel_milli, rank), rank 1-based by (score DESC, doc_id ASC);
    the plan is a TakeOrderedAndProject (distributed partial top-k,
    no global sort)."""
    if k <= 0:
        raise ValueError(f"dsir_select: k {k!r}")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(seed), F.col(id_col).cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    gumbel = F.floor(F.lit(1000.0) * -F.log(-F.log(u))).cast("long")
    out = weighted.select(
        F.col(id_col).alias("doc_id"),
        F.col("dsir_milli"),
        gumbel.alias("gumbel_milli"),
    )
    top = (
        out.orderBy(
            (F.col("dsir_milli") + F.col("gumbel_milli")).desc(),
            F.col("doc_id").asc(),
        )
        .limit(int(k))
    )
    # rank within the materialized top-k (k rows — a window over the
    # already-limited set, not the corpus)
    from pyspark.sql import Window

    w = Window.orderBy(
        (F.col("dsir_milli") + F.col("gumbel_milli")).desc(),
        F.col("doc_id").asc(),
    )
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
