#!/usr/bin/env python
"""64x-scale stress probes for the round-4 additions (VERDICT r4 #3;
BASELINE.md §C rows). Same protocol as tools/stress_hot_shingle.py:
synthesize a corpus well beyond what the per-round bench reaches,
force evaluation, print one JSON line per variant, assert the
correctness invariant the operator claims.

Probes (run all, or name a subset on the command line):

ivf     ivf_topk_from_layout at 6.4M dim-16 vectors in a 64-centroid
        layout: verify the probe scan touches only nprobe/64 of the
        rows (static partition pruning) and returns exactly the
        brute-force top-k, and time it against the full-scan brute
        form on the same parquet.
batch   cosine_topk_batch at 6.4M vectors x 8 queries: time the
        WindowGroupLimit plan against the same query with the
        InferWindowGroupLimit optimizer rule excluded — the delta is
        the partial-top-k's saving (without it the exchange carries
        the full n*|q| score matrix).
pii     redact_pii throughput at 320k ~1.9KB docs (~600MB text) with
        closed-form planted PII counts (regex-heavy JVM pass — the
        concern is raw regexp_replace/regexp_count cost per byte).
wsample weighted_sample at 6.4M rows, k=1000: TakeOrderedAndProject
        plan asserted, top-k key invariant re-checked against an
        exact full-sort on the same data.

Usage: python tools/stress_round4.py [ivf|batch|pii|wsample ...]
"""

from __future__ import annotations

import contextlib
import io
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.operators import (  # noqa: E402
    pipeline,
    similarity,
    text,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402

N_VECS = int(os.environ.get("STRESS_N_VECS", 6_400_000))
DIM = 16
N_CENTROIDS = 64
NPROBE = 8
WORK = os.environ.get("STRESS_WORK", "/tmp/tdps_stress_round4")


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _planted_centers() -> list[list[float]]:
    """64 deterministic well-separated unit-ish dim-16 directions."""
    return [
        [math.cos(0.37 * c * (j + 1)) + (1.0 if j == c % DIM else 0.0)
         for j in range(DIM)]
        for c in range(N_CENTROIDS)
    ]


def _make_vectors(spark):
    """6.4M vectors: cluster c = vec_id % 64, vector = center[c] + small
    deterministic hash noise. Written once, reused by ivf + batch +
    wsample probes."""
    path = WORK + "/vectors.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        centers = spark.createDataFrame(
            [(c, v) for c, v in enumerate(_planted_centers())],
            "c int, cv array<double>",
        )
        noise = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.hash(F.col("vec_id"), j), F.lit(1000)).cast("double")
                / 1000.0
                - 0.5
            )
            * 0.05,
        )
        (
            spark.range(N_VECS)
            .withColumnRenamed("id", "vec_id")
            .withColumn("c", (F.col("vec_id") % N_CENTROIDS).cast("int"))
            .join(F.broadcast(centers), "c")
            .select(
                "vec_id",
                F.zip_with(
                    F.col("cv"), noise, lambda a, b: (a + b).cast("float")
                ).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def probe_ivf(spark) -> None:
    vecs = _make_vectors(spark)
    layout = WORK + "/ivf_layout"
    centroids = spark.createDataFrame(
        [(c, v) for c, v in enumerate(_planted_centers())],
        "centroid_id int, cv array<double>",
    )
    t0 = time.perf_counter()
    if not os.path.exists(layout + "/centroids/_SUCCESS"):
        similarity.write_ivf_layout(
            vecs, layout, num_centroids=N_CENTROIDS, centroids=centroids
        )
    build_s = round(time.perf_counter() - t0, 2)

    qv = _planted_centers()[0]

    # brute force: full scan over the SAME layout parquet (6.4M rows)
    data = spark.read.parquet(layout + "/data")
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    t0 = time.perf_counter()
    brute = (
        data.select(
            "vec_id",
            F.round(
                similarity.cosine(
                    similarity.as_double(F.col("embedding")), qcol
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
        .collect()
    )
    brute_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    probe_df = similarity.ivf_topk_from_layout(
        spark, layout, qv, k=10, nprobe=NPROBE
    )
    got = probe_df.collect()
    probe_s = round(time.perf_counter() - t0, 2)

    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in brute], (
        "IVF probe must return the exact brute-force top-10 on "
        "planted-cluster data (query = center[0], its cluster is in "
        "the probed partitions by construction)"
    )
    # pruning evidence: the scan carries the centroid_id IN-list as a
    # PARTITION filter (static pruning), and the probed partitions hold
    # exactly nprobe/64 of the rows.
    plan = _plan(probe_df)
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan[:1500]

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    cents = spark.read.parquet(layout + "/centroids").collect()
    ranked = sorted(
        cents, key=lambda r: (-_cos(r["cv"], qv), r["centroid_id"])
    )
    probe_ids = [r["centroid_id"] for r in ranked[:NPROBE]]
    scanned = data.filter(F.col("centroid_id").isin(probe_ids)).count()
    _emit(
        "ivf_topk_from_layout",
        vectors=N_VECS,
        dim=DIM,
        centroids=N_CENTROIDS,
        nprobe=NPROBE,
        layout_build_s=build_s,
        brute_full_scan_s=brute_s,
        probe_s=probe_s,
        partitions_read=NPROBE,
        rows_scanned=scanned,
        scan_fraction=round(scanned / N_VECS, 4),
    )


def probe_batch(spark) -> None:
    vecs = _make_vectors(spark)
    qids = [i * (N_VECS // 8) + 3 for i in range(8)]
    rule = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
    times = {}
    for label, excluded in [("window_group_limit", ""), ("rule_excluded", rule)]:
        spark.conf.set("spark.sql.optimizer.excludedRules", excluded)
        try:
            df = similarity.cosine_topk_batch(vecs, qids, k=10)
            has_limit = "WindowGroupLimit" in _plan(df)
            t0 = time.perf_counter()
            n = df.count()
            times[label] = round(time.perf_counter() - t0, 2)
        finally:
            spark.conf.set("spark.sql.optimizer.excludedRules", "")
        assert n == 8 * 10
        assert has_limit == (label == "window_group_limit"), label
    nparts = spark.read.parquet(WORK + "/vectors.parquet").rdd.getNumPartitions()
    _emit(
        "cosine_topk_batch",
        vectors=N_VECS,
        queries=8,
        k=10,
        with_window_group_limit_s=times["window_group_limit"],
        without_s=times["rule_excluded"],
        exchange_rows_bound_with=8 * 10 * nparts,
        exchange_rows_without=8 * (N_VECS - 1),
    )


def probe_pii(spark) -> None:
    n_docs = 320_000
    path = WORK + "/pii_docs.parquet"
    filler = " ".join(f"word{i} plain clause," for i in range(40))  # ~0.6KB
    if not os.path.exists(path + "/_SUCCESS"):
        (
            spark.range(n_docs)
            .withColumnRenamed("id", "doc_id")
            .select(
                "doc_id",
                F.concat(
                    F.lit(filler + " "),
                    # every doc: one email; every 2nd: an IP; every 4th: a card
                    F.concat(
                        F.lit("user"), F.col("doc_id"), F.lit("@example.com ")
                    ),
                    F.when(
                        F.col("doc_id") % 2 == 0,
                        F.lit("addr 10.0.42.7 logged "),
                    ).otherwise(F.lit("")),
                    F.when(
                        F.col("doc_id") % 4 == 0,
                        F.lit("pay 4111 1111 1111 1111 now "),
                    ).otherwise(F.lit("")),
                    F.lit(filler),
                    F.lit(filler),
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    docs = spark.read.parquet(path)
    total_bytes = docs.select(
        F.sum(F.octet_length("text")).alias("b")
    ).collect()[0]["b"]
    t0 = time.perf_counter()
    out = text.redact_pii(docs).agg(
        F.sum("n_email").alias("e"),
        F.sum("n_ip").alias("i"),
        F.sum("n_card").alias("c"),
        F.sum("n_phone").alias("p"),
        F.sum(F.octet_length("text_redacted")).alias("b"),
    ).collect()[0]
    sec = round(time.perf_counter() - t0, 2)
    assert out["e"] == n_docs and out["i"] == n_docs // 2, out
    assert out["c"] == n_docs // 4 and out["p"] == 0, out
    _emit(
        "redact_pii",
        docs=n_docs,
        input_mb=round(total_bytes / 1e6, 1),
        sec=sec,
        mb_per_s=round(total_bytes / 1e6 / sec, 1),
        planted_counts_exact=True,
    )


def probe_wsample(spark) -> None:
    vecs = _make_vectors(spark)
    rows = vecs.select(
        F.col("vec_id").alias("doc_id"),
        (F.pmod(F.hash("vec_id"), F.lit(100)).cast("double") + 1.0).alias(
            "quality"
        ),
    )
    df = pipeline.weighted_sample(rows, "quality", k=1000)
    assert "TakeOrderedAndProject" in _plan(df), "must be distributed top-k"
    t0 = time.perf_counter()
    got = {r["doc_id"] for r in df.collect()}
    sec = round(time.perf_counter() - t0, 2)
    # invariant: identical to the exact full-sort selection
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    exact = {
        r["doc_id"]
        for r in rows.select(
            "doc_id", F.pow(u, 1.0 / F.col("quality")).alias("k")
        )
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(1000)
        .collect()
    }
    assert got == exact, "A-ES top-k must match full-sort selection"
    _emit("weighted_sample", rows=N_VECS, k=1000, sec=sec, matches_full_sort=True)


PROBES = {
    "ivf": probe_ivf,
    "batch": probe_batch,
    "pii": probe_pii,
    "wsample": probe_wsample,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark("tdps-stress-round4")
    for name in names:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
