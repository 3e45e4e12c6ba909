"""Hashed logistic-regression quality classifier (operators/classifier).

Covers: exact integer scoring against an independent Python replay of
the md5-bucket + seed-weight rule, bias-only empty docs, broadcast
plan shape, and training (loss decreases, planted classes separate,
trained weights flow through the same JVM scorer)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import classifier as C

DIM = 256


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % DIM


def _seed_w(tok: str) -> int:
    return _bucket(tok) % 201 - 100


def test_scoring_matches_python_replay(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta alpha",
                    "gamma",
                    "   ",  # whitespace-only: bias-only row
                ],
            }
        )
    )
    w = C.seed_weights(spark, DIM)
    out = {
        r["doc_id"]: r.asDict()
        for r in C.score_documents(docs, w, DIM, bias_milli=7).collect()
    }
    exp1 = 7 + 2 * _seed_w("alpha") + _seed_w("beta")
    assert out[1]["logit_milli"] == exp1
    assert out[1]["n_tokens"] == 3
    assert out[1]["label"] == (exp1 > 0)
    assert out[2]["logit_milli"] == 7 + _seed_w("gamma")
    # empty doc: present, bias-only, zero tokens
    assert out[3]["n_tokens"] == 0 and out[3]["logit_milli"] == 7


def test_scoring_plan_broadcasts_weights(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b"]})
    )
    out = C.score_documents(docs, C.seed_weights(spark, DIM), DIM)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_training_separates_planted_classes(spark):
    rows = []
    for i in range(60):
        noise = f"filler{i % 7} common words here"
        if i % 2 == 0:
            rows.append((i, f"quality prose {noise}", 1))
        else:
            rows.append((i, f"spam casino {noise}", 0))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    )
    w, bias, losses = C.train_quality_classifier(
        docs, dim=DIM, iterations=15, lr=1.0
    )
    # loss decreases and ends well below chance (ln 2)
    assert losses[-1] < losses[0]
    assert losses[-1] < 0.4
    # the trained table, floored to milli, classifies the corpus
    # through the SAME exact-integer scorer
    wdf = C.to_milli_weights(spark, w)
    scored = C.score_documents(
        docs, wdf, DIM, bias_milli=int(bias * 1000)
    )
    joined = scored.join(docs.select("doc_id", "y"), "doc_id")
    acc = joined.select(
        F.avg(
            (F.col("label") == (F.col("y") == 1)).cast("double")
        ).alias("a")
    ).first()["a"]
    assert acc >= 0.95


def test_training_is_deterministic(spark):
    rows = [(i, f"w{i % 3} common", i % 2) for i in range(20)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    )
    w1, b1, l1 = C.train_quality_classifier(docs, dim=64, iterations=3)
    w2, b2, l2 = C.train_quality_classifier(docs, dim=64, iterations=3)
    assert l1 == l2 and b1 == b2
    assert (w1["w"] == w2["w"]).all()


def test_empty_corpus_raises(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [" "], "y": [1]})
    )
    with pytest.raises(ValueError, match="no documents"):
        C.train_quality_classifier(docs, dim=16, iterations=1)
