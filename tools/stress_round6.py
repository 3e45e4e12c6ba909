#!/usr/bin/env python
"""Round-6 scale-stress probes (BASELINE.md §C rows; same protocol as
tools/stress_round4.py / stress_round5.py — each probe asserts the
operator's correctness invariant, then prints one JSON line).

hotbucket   LSH hot-band-bucket cap (VERDICT r5 #2): a pile of
            identical docs is hot in EVERY band, so the uncapped
            candidate self-join fans out quadratically in the pile
            size. Measures the uncapped form at two pile sizes (the
            quadratic trend), then the capped star-pairing form at a
            pile size the uncapped form could not afford — asserting
            the star keeps the pile fully connected at J = 1.0.
incrhot     The same hole in minhash_lsh_incremental: a hot bucket
            spanning corpus × batch. Capped run at 10k-corpus-pile ×
            1k-batch; uncapped comparison at 1k × 1k.
tiedbudget  budget_select's adversarial case (VERDICT r5 #1): EVERY
            document tied at one score, so the whole corpus lands in
            the marginal class. New bucketed two-phase prefix cut vs
            the old Window.partitionBy(lit(1)) single-task form, both
            asserted row-identical to the closed-form prefix.
aqeskew     AQE skew-join evidence: planted skewed join key (one key
            carrying ~30% of a 6.4M-row fact) through a sort-merge
            join; asserts the ADAPTIVE executed plan actually split
            the skewed partition (skew=true / skewed AQEShuffleRead),
            mirroring the scan_stats executed-plan methodology.
ivfappend   Incremental IVF-layout maintenance: 100k-vector batch
            appended into a 1.6M-vector 64-partition layout with
            frozen centroids — asserts only the batch's 4 target
            partitions gain files and the probe ranks appended data.
streamingest  The streaming corpus-ingest loop at 64x: 10 waves of
            10k docs against an index seeded with 320k docs; records
            per-wave latency vs index growth (flat-ish per-batch cost
            is the claim — settled text is never re-read).

Usage: python tools/stress_round6.py [hotbucket|incrhot|...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.operators import (  # noqa: E402
    dedup,
    pipeline,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402

WORK = os.environ.get("STRESS_WORK", "/tmp/tdps_stress_round6")
HOT_TEXT = (
    "the quick brown fox jumps over a lazy dog again and again for "
    "every copy of this exact page body"
)


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def _unique_word_docs(spark, n_docs: int, id_offset: int = 0):
    """n_docs documents of 20 globally-unique words each — zero
    cross-doc shingle overlap, so every near-dup the probes find is
    planted, never accidental."""
    return (
        spark.range(n_docs)
        .select((F.col("id") + id_offset).alias("doc_id"))
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"w{k}u"),
                        (F.col("doc_id") * 20 + k).cast("string"),
                    )
                    for k in range(20)
                ],
            ).alias("text"),
        )
    )


def _hot_docs(spark, n: int, id_offset: int):
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.lit(HOT_TEXT).alias("text"),
    )


def probe_hotbucket(spark) -> None:
    n_unique = 100_000
    base = _unique_word_docs(spark, n_unique).localCheckpoint(eager=True)

    # quadratic trend of the UNCAPPED form: pile of P identical docs
    # => P(P-1)/2 verified pairs regardless of banding
    uncapped = {}
    for pile in (2_000, 8_000):
        docs = base.unionByName(_hot_docs(spark, pile, 1_000_000))
        t0 = time.perf_counter()
        n_pairs = dedup.minhash_lsh_pairs(docs, max_bucket=None).count()
        uncapped[pile] = round(time.perf_counter() - t0, 2)
        assert n_pairs == pile * (pile - 1) // 2, (pile, n_pairs)

    # capped star-pairing at a pile size whose uncapped form would be
    # ~200M pairs: linear fan-out, full connectivity preserved
    pile = 20_000
    docs = base.unionByName(_hot_docs(spark, pile, 1_000_000))
    t0 = time.perf_counter()
    rows = dedup.minhash_lsh_pairs(docs, max_bucket=256).collect()
    capped_sec = round(time.perf_counter() - t0, 2)
    assert len(rows) == pile - 1, len(rows)
    assert all(
        r["doc_a"] == 1_000_000 and r["j"] == 1.0 for r in rows
    ), "star must anchor every pile member at the min-id rep with J=1"
    assert sorted(r["doc_b"] for r in rows) == list(
        range(1_000_001, 1_000_000 + pile)
    )
    _emit(
        "hotbucket",
        corpus_docs=n_unique,
        uncapped_sec_by_pile=uncapped,
        uncapped_pairs_by_pile={
            p: p * (p - 1) // 2 for p in uncapped
        },
        capped_pile=pile,
        capped_sec=capped_sec,
        capped_pairs=pile - 1,
        note=(
            "uncapped pairs grow ~4x per pile doubling; the capped "
            "20k pile would be 200M uncapped pairs"
        ),
    )


def probe_incrhot(spark) -> None:
    n_unique = 100_000
    batch_pile = 1_000

    def run(corpus_pile: int, max_bucket):
        corpus = _unique_word_docs(spark, n_unique).unionByName(
            _hot_docs(spark, corpus_pile, 1_000_000)
        )
        sig = dedup.minhash_signatures(corpus).localCheckpoint(
            eager=True
        )
        batch = _hot_docs(spark, batch_pile, 2_000_000)
        t0 = time.perf_counter()
        pairs, _ = dedup.minhash_lsh_incremental(
            batch, sig, min_est=1.0, max_bucket=max_bucket
        )
        rows = pairs.collect()
        sec = round(time.perf_counter() - t0, 2)
        return rows, sec

    rows, uncapped_sec = run(1_000, None)
    # every (corpus pile member, batch member) + in-batch pairs
    assert (
        len(rows)
        == 1_000 * batch_pile + batch_pile * (batch_pile - 1) // 2
    ), len(rows)

    rows, capped_sec = run(10_000, 256)
    # star: each batch member found once against the corpus-side rep
    assert len(rows) == batch_pile, len(rows)
    assert all(
        r["doc_a"] == 1_000_000
        and r["source"] == "corpus"
        and r["est_jaccard"] == 1.0
        for r in rows
    )
    _emit(
        "incrhot",
        corpus_docs=n_unique,
        uncapped={"corpus_pile": 1_000, "batch_pile": batch_pile,
                  "pairs": 1_499_500, "sec": uncapped_sec},
        capped={"corpus_pile": 10_000, "batch_pile": batch_pile,
                "pairs": batch_pile, "sec": capped_sec},
        note=(
            "capped run dedups against a 10x hotter corpus in less "
            "time; every batch doc still found at est 1.0"
        ),
    )


def probe_tiedbudget(spark) -> None:
    from pyspark.sql import Window

    n_docs = 3_200_000
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(HOT_TEXT).alias("text"),
        )
        .withColumn("n_chars", F.length("text"))
        .localCheckpoint(eager=True)
    )
    tokens_per_doc = len(HOT_TEXT.split())
    keep = 1_600_000
    budget = tokens_per_doc * keep + 3  # cut mid-corpus, partial tail

    # end-to-end: every doc ties at one score, so the ENTIRE corpus is
    # the marginal class
    t0 = time.perf_counter()
    got = pipeline.budget_select(docs, budget)
    n_sel, max_id = got.agg(
        F.count(F.lit(1)), F.max("doc_id")
    ).first()
    e2e_sec = round(time.perf_counter() - t0, 2)
    assert n_sel == keep and max_id == keep - 1, (n_sel, max_id)

    # isolate the marginal-cut step itself over one pre-materialized
    # narrow frame: bucketed two-phase prefix vs the pre-r6
    # Window.partitionBy(lit(1)) single-task form
    frame = docs.select(
        "doc_id",
        F.lit(tokens_per_doc).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    n_new = pipeline._ordered_prefix_take(
        frame, "doc_id", "n_tokens", budget
    ).count()
    new_sec = round(time.perf_counter() - t0, 2)
    assert n_new == keep, n_new

    t0 = time.perf_counter()
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_old = (
        frame.select("doc_id", F.sum("n_tokens").over(w).alias("cum"))
        .filter(F.col("cum") <= budget)
        .count()
    )
    old_sec = round(time.perf_counter() - t0, 2)
    assert n_old == keep, n_old
    _emit(
        "tiedbudget",
        n_docs=n_docs,
        all_tied=True,
        selected=n_sel,
        e2e_budget_select_sec=e2e_sec,
        marginal_cut_bucketed_sec=new_sec,
        marginal_cut_single_task_sec=old_sec,
        note=(
            "every doc in the marginal score class; the bucketed cut "
            "spreads the cumulative sum across 32 tasks instead of 1"
        ),
    )


def probe_aqeskew(spark) -> None:
    n_fact = 6_400_000
    n_keys = 100_000
    # key 0 carries ~30% of the fact; the rest is uniform
    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("grp")
    )
    confs = {
        # thresholds scaled to local data sizes — at cluster scale the
        # 256MB default plays the same role; the probe's claim is the
        # MECHANISM (AQE detects and splits the skewed partition), not
        # the threshold value
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        # both sides are fact-scale at 100 TB: force the sort-merge
        # path the skew machinery applies to
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, "k").groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
        )
        t0 = time.perf_counter()
        joined.collect()
        skew_sec = round(time.perf_counter() - t0, 2)
        plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert "skew=true" in plan, (
            "executed plan did not mark the sort-merge join as skew-"
            "handled:\n" + plan[:2000]
        )
        n_skewed = plan.count("skewed")

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.perf_counter()
        joined2 = fact.join(dim, "k").groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        joined2.collect()
        noskew_sec = round(time.perf_counter() - t0, 2)
        plan2 = (
            joined2._jdf.queryExecution().executedPlan().toString()
        )
        assert "skew=true" not in plan2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    _emit(
        "aqeskew",
        fact_rows=n_fact,
        skew_key_share=0.3,
        skew_enabled_sec=skew_sec,
        skew_disabled_sec=noskew_sec,
        skewed_plan_markers=n_skewed,
        note=(
            "AQE split the planted 30%-of-bytes partition (skew=true "
            "in the adaptive executed plan); thresholds lowered to "
            "local sizes, mechanism identical at the 256MB default"
        ),
    )


def probe_streamingest(spark) -> None:
    from timeseries_data_provider_spark.streaming.corpus_ingest import (
        ensure_signature_index,
        ingest_documents_stream,
    )

    root = WORK + "/stream"
    src = WORK + "/stream_src"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)

    # seed: 320k settled docs' signatures (the one-time index build)
    t0 = time.perf_counter()
    seed = _unique_word_docs(spark, 320_000)
    os.makedirs(root, exist_ok=True)
    dedup.minhash_signatures(seed).write.mode("overwrite").parquet(
        root + "/signatures"
    )
    seed_sec = round(time.perf_counter() - t0, 2)
    ensure_signature_index(spark, root)

    q = ingest_documents_stream(
        spark, src, root, min_est=1.0, max_df=None
    )
    waves = []
    try:
        for i in range(10):
            # each wave: 10k fresh docs, one a copy of a settled doc
            wave = _unique_word_docs(
                spark, 9_999, id_offset=1_000_000 + i * 10_000
            ).unionByName(
                seed.filter(F.col("doc_id") == i).select(
                    (F.col("doc_id") + 5_000_000 + i).alias("doc_id"),
                    "text",
                )
            )
            pdf = wave.toPandas()
            # write OUTSIDE the watched dir, then atomically rename
            # in: the running file source lists eagerly and would read
            # a half-flushed prefix of an in-place write (measured:
            # 2.6k of 10k rows landed) — the standard crawler hand-off
            # contract is rename-into-place
            tmp = f"{WORK}/tmp_wave.json"
            with open(tmp, "w") as f:
                for _, r in pdf.iterrows():
                    f.write(
                        json.dumps(
                            {"doc_id": int(r.doc_id), "text": r.text}
                        )
                        + "\n"
                    )
            os.replace(tmp, f"{src}/wave{i}.json")
            t0 = time.perf_counter()
            q.processAllAvailable()
            waves.append(round(time.perf_counter() - t0, 2))
    finally:
        q.stop()

    docs = spark.read.parquet(root + "/docs")
    dups = spark.read.parquet(root + "/dups")
    # each wave's planted settled-copy was dropped; the 9,999 fresh
    # docs accepted
    assert docs.count() == 10 * 9_999, docs.count()
    assert dups.count() == 10, dups.count()
    n_sig = spark.read.parquet(root + "/signatures").count()
    assert n_sig == 320_000 + 10 * 9_999, n_sig
    _emit(
        "streamingest",
        seeded_index_docs=320_000,
        seed_build_sec=seed_sec,
        wave_docs=10_000,
        per_wave_sec=waves,
        final_index_docs=n_sig,
        note=(
            "per-wave cost stays flat-ish as the index grows by 100k "
            "docs across the run — the settled text is never re-read; "
            "each wave's planted settled-copy detected and dropped"
        ),
    )


def probe_ivfappend(spark) -> None:
    import glob
    import math

    from timeseries_data_provider_spark.operators import similarity

    DIM, NC = 16, 64
    centers = [
        [math.cos(0.37 * c * (j + 1)) + (1.0 if j == c % DIM else 0.0)
         for j in range(DIM)]
        for c in range(NC)
    ]
    cdf = spark.createDataFrame(
        [(c, v) for c, v in enumerate(centers)], "c int, cv array<double>"
    )

    def vectors(ids, cluster_expr, noise_amp):
        noise = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                F.pmod(F.hash(F.col("vec_id"), j), F.lit(1000))
                .cast("double") / 1000.0 - 0.5
            ) * noise_amp,
        )
        return (
            ids.withColumn("c", cluster_expr.cast("int"))
            .join(F.broadcast(cdf), "c")
            .select(
                "vec_id",
                F.zip_with(
                    F.col("cv"), noise, lambda a, b: (a + b).cast("float")
                ).alias("embedding"),
            )
        )

    base = vectors(
        spark.range(1_600_000).withColumnRenamed("id", "vec_id"),
        F.col("vec_id") % NC,
        0.05,
    )
    path = WORK + "/ivf_append_layout"
    t0 = time.perf_counter()
    similarity.write_ivf_layout(base, path, num_centroids=NC)
    build_sec = round(time.perf_counter() - t0, 2)

    files_before = {
        c: set(glob.glob(f"{path}/data/centroid_id={c}/*.parquet"))
        for c in range(NC)
    }
    # 100k new vectors landing in clusters 0..3 ONLY, tighter than the
    # settled noise so the probe MUST see them to rank correctly
    batch = vectors(
        spark.range(100_000).select(
            (F.col("id") + 10_000_000).alias("vec_id")
        ),
        F.col("vec_id") % 4,
        0.005,
    )
    t0 = time.perf_counter()
    similarity.ivf_append(spark, batch, path)
    append_sec = round(time.perf_counter() - t0, 2)

    total = spark.read.parquet(path + "/data").count()
    assert total == 1_700_000, total
    touched = untouched_changed = 0
    for c in range(NC):
        after = set(glob.glob(f"{path}/data/centroid_id={c}/*.parquet"))
        if after != files_before[c]:
            touched += 1
            if c >= 4:
                untouched_changed += 1
    assert untouched_changed == 0, "append rewrote settled partitions"
    assert touched <= 4, touched

    # the probe sees the appended data: query = center 2, appended
    # members are 10x tighter, so the top-10 must be appended ids
    t0 = time.perf_counter()
    top = similarity.ivf_topk_from_layout(
        spark, path, centers[2], k=10, nprobe=4
    ).collect()
    probe_sec = round(time.perf_counter() - t0, 2)
    n_appended = sum(1 for r in top if r["vec_id"] >= 10_000_000)
    assert n_appended == 10, n_appended
    _emit(
        "ivfappend",
        settled_vectors=1_600_000,
        batch_vectors=100_000,
        build_sec=build_sec,
        append_sec=append_sec,
        probe_sec=probe_sec,
        partitions_touched=touched,
        note=(
            "append cost is batch-only (assignment + write of 4 "
            "touched partitions); the 1.6M settled vectors are never "
            "read or rewritten, and the probe ranks appended data "
            "correctly"
        ),
    )


PROBES = {
    "hotbucket": probe_hotbucket,
    "ivfappend": probe_ivfappend,
    "incrhot": probe_incrhot,
    "tiedbudget": probe_tiedbudget,
    "aqeskew": probe_aqeskew,
    "streamingest": probe_streamingest,
}


def main() -> None:
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or list(
        PROBES
    )
    spark = get_spark("tdps-stress-r6")
    os.makedirs(WORK, exist_ok=True)
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
