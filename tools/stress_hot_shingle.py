#!/usr/bin/env python
"""Planted-hot-shingle stress probe for the inverted-index join's
``max_df`` cap (operators/dedup.py::_df_capped; BASELINE.md §C row).

Inverted-index self-join fan-out is Σ df(s)² over shingles, so one
ultra-frequent ("hot") shingle dominates cost quadratically: a shingle
shared by k docs alone contributes ~k²/2 candidate pairs. The cap
generates candidates only from shingles with df ≤ max_df, bounding
per-shingle fan-out at max_df², while the Jaccard is still computed on
the FULL shingle sets for every surviving candidate — so real pairs
(which share plenty of low-df shingles) are unaffected.

Method: build a 64×-sf0.1-sized corpus (320k docs, 30 unique words
each → ~9M shingles, df=1 baseline so the probe isolates skew), then
(a) plant TRUE duplicates: every 500th doc copied under a fresh id
    (640 pairs both variants must find — proves the cap loses nothing);
(b) plant ONE hot 3-gram: the same 3-word phrase appended to every
    25th doc (~13.4k docs → ~90M candidate pairs from that single
    shingle, uncapped).

Recorded 2026-08-13 (BASELINE.md §C): uncapped 181.5 s vs max_df=64
11.98 s — 15×, both returning exactly the 640 planted pairs. At
hot_mod=100 (3.8k hot docs, ~7M extra pairs) the two variants tie
(~43 s): the fixed double-explode cost dominates until the hot
shingle's df² term does — which is precisely the regime the cap is
for.
Time ``ngram_jaccard_pairs`` uncapped vs capped at threshold 0.95;
evaluation forced by a full count of the thresholded result.

Usage: python tools/stress_hot_shingle.py [N_DOCS] [HOT_MOD] [MAX_DF]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.operators import dedup  # noqa: E402
from timeseries_data_provider_spark.session import get_spark  # noqa: E402

HOT_PHRASE = "zzzhot qqqhot xxxhot"
WORDS_PER_DOC = 30
DUP_MOD = 500


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
    hot_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    max_df = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark("tdps-stress-hot-shingle")
    base = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                    lambda j: F.concat(
                        F.lit("w"), F.col("doc_id"), F.lit("_"), j
                    ),
                ),
            ).alias("text"),
        )
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % hot_mod == 0,
                F.concat(F.col("text"), F.lit(" " + HOT_PHRASE)),
            ).otherwise(F.col("text")),
        )
    )
    dups = base.filter(F.col("doc_id") % DUP_MOD == 0).select(
        (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"), "text"
    )
    path = "/tmp/tdps_stress_hot_shingle.parquet"
    base.unionByName(dups).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n = corpus.count()
    n_hot = corpus.filter(
        F.col("text").endswith(HOT_PHRASE)
    ).count()
    want_pairs = n_docs // DUP_MOD
    print(
        f"# corpus: {n} docs ({want_pairs} planted dup pairs); hot "
        f"shingle in {n_hot} docs (~{n_hot * (n_hot - 1) // 2} uncapped "
        f"candidate pairs from it alone)",
        file=sys.stderr,
    )

    for label, cap in [("uncapped", None), (f"max_df={max_df}", max_df)]:
        t0 = time.perf_counter()
        pairs = dedup.ngram_jaccard_pairs(
            corpus, n=3, threshold=0.95, max_df=cap
        ).count()
        sec = round(time.perf_counter() - t0, 2)
        assert pairs == want_pairs, (
            f"{label}: expected {want_pairs} dup pairs, got {pairs} — "
            "the cap must not lose true pairs"
        )
        print(
            json.dumps(
                {
                    "variant": label,
                    "sec": sec,
                    "pairs": pairs,
                    "docs": n,
                    "hot_docs": n_hot,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
