"""Learned quality classifier: hashed bag-of-words logistic regression.

The GPT-3/CCNet-style LEARNED quality gate ("does this page look like
the reference corpus?") that sits next to the heuristic signals
(text.quality_score, lm.ngram_lm_score): a fastText-shaped linear
model over hashed unigram features. Public-knowledge basis: the
hashing trick (Weinberger et al., ICML 2009), logistic regression,
and the Common Crawl filtering recipe described in the GPT-3 paper
(Brown et al. 2020, Appendix A) / CCNet (Wenzek et al. 2020).
Reference parity note: index.js has no ML surface; [EXT] SURVEY §2.

Design for 100 TB:

- SCORING is the hot path and is all-JVM: tokens explode ->
  md5-derived bucket (engine-portable, the repo's SimHash/sampling
  pattern) -> broadcast equi-join against the weight table (model-
  sized: ``dim`` rows) -> one per-doc hash aggregate. Zero Python.
  Weights are integer MILLI-units and the emitted logit is an exact
  integer sum — no float aggregate, no cross-engine drift, so a SQL
  oracle can replay scoring bit-for-bit.
- TRAINING is full-batch gradient descent with the classic scale
  split (the Lloyd's/BPE-trainer shape): the feature matrix never
  materializes on the driver; each iteration is one distributed pass
  computing per-doc sigmoids and the per-bucket gradient aggregate
  (dim-bounded collect), then a driver-side weight update. Iterations
  are driver-loop by design — outside the batch oracle, pinned in
  pytest (loss decreases, planted classes separate, the returned
  weights flow through the same JVM scorer).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "hashed_buckets",
    "score_documents",
    "train_quality_classifier",
    "seed_weights",
    "to_milli_weights",
]


def _words(text_col: str):
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )


def hashed_buckets(dim: int, text_col: str = "text"):
    """Exploded (token -> bucket) column: the hashing trick with the
    engine-portable md5 prefix (12 hex chars = 48 bits, exact in a
    BIGINT on both engines) mod ``dim``."""
    return (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 12), 16, 10).cast(
            "long"
        )
        % dim
    )


def score_documents(
    documents: DataFrame,
    weights: DataFrame,
    dim: int,
    bias_milli: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a linear model over hashed unigrams:
    logit_milli = bias + sum over token OCCURRENCES of
    w_milli[bucket(token)]. ``weights`` is (bucket long, w_milli
    long) — broadcast (model-sized). Returns (id, n_tokens,
    logit_milli, label) with label = logit_milli > 0. Exact integer
    math end to end."""
    toks = documents.select(
        id_col, F.explode(_words(text_col)).alias("__tok")
    ).withColumn("__bucket", hashed_buckets(dim))
    scored = (
        toks.join(
            F.broadcast(
                weights.select(
                    F.col("bucket").alias("__bucket"),
                    F.col("w_milli").alias("__w"),
                )
            ),
            "__bucket",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.coalesce(F.col("__w"), F.lit(0)))
                + F.lit(bias_milli)
            ).alias("logit_milli"),
        )
    )
    # empty-token docs never appear in the explode: restore them with
    # the bias-only score rather than dropping rows silently
    return (
        documents.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("logit_milli", F.lit(bias_milli)).alias(
                "logit_milli"
            ),
            (
                F.coalesce("logit_milli", F.lit(bias_milli)) > 0
            ).alias("label"),
        )
    )


def seed_weights(spark: SparkSession, dim: int, modulus: int = 201) -> DataFrame:
    """Deterministic planted weight table w_milli = bucket %
    ``modulus`` - modulus//2 — the oracle-replayable model for
    driver-scored runs (training itself is pytest-pinned)."""
    half = modulus // 2
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        (F.col("id") % modulus - half).cast("long").alias("w_milli"),
    )


def train_quality_classifier(
    documents: DataFrame,
    dim: int = 1 << 12,
    label_col: str = "y",
    text_col: str = "text",
    id_col: str = "doc_id",
    iterations: int = 20,
    lr: float = 0.5,
) -> tuple[pd.DataFrame, float, list[float]]:
    """Full-batch logistic-regression training over hashed unigram
    COUNTS. ``documents`` needs a 0/1 ``label_col``. Returns
    (weights pandas frame (bucket, w) in FLOAT units, bias, per-
    iteration mean log-loss). Convert to the scorer's integer table
    with ``to_milli_weights``.

    Each iteration: one distributed pass — per-doc logit via the
    broadcast weight join, sigmoid residual, per-bucket gradient
    hash-agg (dim-bounded collect) — then the driver updates the
    dim-sized vector. The corpus is re-read per iteration (cache it
    for small corpora; at scale this is the standard
    one-pass-per-epoch shape)."""
    spark = documents.sparkSession
    # per-doc bucket counts, computed once and reused every iteration
    feats = (
        documents.select(
            id_col,
            F.col(label_col).cast("double").alias("__y"),
            F.explode(_words(text_col)).alias("__tok"),
        )
        .withColumn("__bucket", hashed_buckets(dim))
        .groupBy(id_col, "__y", "__bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
        .localCheckpoint()
    )
    n_docs = feats.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError("classifier: no documents with tokens")
    w = np.zeros(dim, dtype=np.float64)
    bias = 0.0
    losses: list[float] = []
    for _ in range(iterations):
        wdf = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    {"__bucket": np.arange(dim, dtype=np.int64), "__w": w}
                )
            )
        )
        doc = (
            feats.join(wdf, "__bucket")
            .groupBy(id_col, "__y")
            .agg(F.sum(F.col("__cnt") * F.col("__w")).alias("__dot"))
            .select(
                id_col,
                "__y",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("__dot") + F.lit(bias))))
                ).alias("__p"),
            )
        )
        # residuals drive both the gradient and the reported loss
        resid = doc.select(
            id_col,
            (F.col("__p") - F.col("__y")).alias("__r"),
            (
                -(
                    F.col("__y") * F.log(F.greatest(F.col("__p"), F.lit(1e-12)))
                    + (1 - F.col("__y"))
                    * F.log(F.greatest(1 - F.col("__p"), F.lit(1e-12)))
                )
            ).alias("__l"),
        )
        grad_rows = (
            feats.join(resid, id_col)
            .groupBy("__bucket")
            .agg(F.sum(F.col("__cnt") * F.col("__r")).alias("__g"))
            .collect()
        )
        stats = resid.agg(
            F.sum("__r").alias("gb"), F.avg("__l").alias("loss")
        ).first()
        g = np.zeros(dim, dtype=np.float64)
        for row in grad_rows:
            g[int(row["__bucket"])] = row["__g"]
        w -= lr * g / n_docs
        bias -= lr * float(stats["gb"]) / n_docs
        losses.append(float(stats["loss"]))
    return (
        pd.DataFrame({"bucket": np.arange(dim, dtype=np.int64), "w": w}),
        bias,
        losses,
    )


def to_milli_weights(
    spark: SparkSession, weights: pd.DataFrame
) -> DataFrame:
    """Float training weights -> the scorer's exact integer table
    (floor to milli-units)."""
    pdf = pd.DataFrame(
        {
            "bucket": weights["bucket"].astype("int64"),
            "w_milli": np.floor(weights["w"] * 1000).astype("int64"),
        }
    )
    return spark.createDataFrame(pdf)
