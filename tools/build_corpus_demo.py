#!/usr/bin/env python
"""End-to-end TRAINING-CORPUS BUILD over the real testdata — the
pipeline a user of this engine runs to turn a raw document dump into
training shards, every stage a shipped operator:

    documents (sf0.01 parquet)
      -> curate           lang + quality gate + exact dedup
      -> drop_near_dups   MinHash-era n-gram clusters -> one survivor
      -> group_split      leakage-safe split keyed on source domain
      -> budget_select    keep the best N tokens of the train split
      -> chunk_and_pack   fixed-token chunks -> token-budget bins
      -> write_training_shards   fixed-shard parquet + manifest

Run:  python tools/build_corpus_demo.py
Exit 0 and a "CORPUS BUILD: PASS" line mean every stage worked; the
captured output is checked in at tools/build_corpus_demo_output.txt.

Each stage asserts its contract (counts monotone, no split leakage,
budget respected, shard manifest equals what landed), so this doubles
as a live integration check of the operators composing end-to-end.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.01"
CHECKS = []


def ok(msg: str) -> None:
    CHECKS.append(msg)
    print(f"  [ok] {msg}")


def main() -> int:
    from timeseries_data_provider_spark.operators import dedup, pipeline
    from timeseries_data_provider_spark.session import get_spark
    from timeseries_data_provider_spark import tables

    spark = get_spark("corpus-build-demo", cpus=8, shuffle_partitions=8)
    docs = tables.load_table(spark, SF, "documents")
    n_raw = docs.count()
    print(f"raw corpus: {n_raw} docs")

    # 1. curate: language + quality + exact dedup
    kept_ids = pipeline.curate(docs, lang="en", min_score=0.5)
    curated = docs.join(kept_ids, "doc_id")
    n_cur = curated.count()
    assert 0 < n_cur <= n_raw
    ok(f"curate: {n_raw} -> {n_cur} docs (lang+quality+exact-dedup)")

    # 2. near-dup removal: one survivor per Jaccard cluster
    survivors = dedup.drop_near_dups(curated, threshold=0.3)
    n_nd = survivors.count()
    assert 0 < n_nd <= n_cur
    ok(f"drop_near_dups: {n_cur} -> {n_nd} docs")

    # 3. leakage-safe split on the source domain
    split = pipeline.group_split(survivors, group_col="source")
    leak = (
        split.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k").alias("m"))
        .first()["m"]
    )
    assert leak == 1
    train = survivors.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    n_train = train.count()
    ok(f"group_split: {n_nd} docs -> {n_train} train (no source straddles)")

    # 4. token budget: the best 5k tokens of the train split
    budget = 5_000
    sel = pipeline.budget_select(train, token_budget=budget)
    tok = sel.agg(F.sum("n_tokens").alias("t")).first()["t"]
    assert tok is not None and tok <= budget
    final = train.join(sel.select("doc_id"), "doc_id")
    n_final = final.count()
    ok(f"budget_select: {n_train} -> {n_final} docs, {tok}/{budget} tokens")

    # 5. chunk + pack into fixed-token training bins
    bins = pipeline.chunk_and_pack(final, chunk_tokens=32, budget=256)
    n_bins = bins.count()
    packed_tokens = bins.agg(F.sum("bin_tokens").alias("t")).first()["t"]
    assert packed_tokens == tok, (packed_tokens, tok)
    ok(f"chunk_and_pack: {n_bins} bins, token total conserved ({tok})")

    # 6. fixed-shard output + manifest
    with tempfile.TemporaryDirectory() as td:
        manifest = pipeline.write_training_shards(
            final.select("doc_id", "text"), td + "/shards", n_shards=8
        )
        m = {r["shard"]: r["rows"] for r in manifest.collect()}
        assert sum(m.values()) == n_final, (sum(m.values()), n_final)
        ok(
            f"write_training_shards: {n_final} docs -> {len(m)} shards, "
            "manifest matches landed rows"
        )

    spark.stop()
    print(f"\nCORPUS BUILD: PASS ({len(CHECKS)}/6 checks)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
