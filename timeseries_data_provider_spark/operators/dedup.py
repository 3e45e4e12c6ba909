"""[EXT] Deduplication operators: exact (hash group), n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design:
- Exact dedup groups on sha256(text) — constant-width keys, one shuffle.
- The *exact* pairwise Jaccard operator is the correctness oracle; its
  all-pairs join is quadratic and only usable on small/blocked inputs.
- MinHash+LSH is the 100 TB path: per-doc signature (one shuffle over
  exploded shingles), banding, candidate pairs only within equal band
  buckets (equi-join — no cross product), then exact verification on
  the candidates. With b bands of r rows the match probability is
  1-(1-j^r)^b — b=8, r=2 gives ~0.98 recall at j=0.7 and strong
  down-weighting below 0.3.
- SimHash gives a 64-bit per-doc sketch whose Hamming distance tracks
  cosine similarity of the bag-of-words — near-dup candidates join on
  rotated bit-bands of the sketch.

All hashing is xxhash64 with fixed string seeds — deterministic across
runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(documents: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """doc_id + distinct word n-gram shingle array (empty if < n words)."""
    w = F.split(F.col(text_col), " ")
    if n == 1:
        sh = F.array_distinct(w)
    else:
        parts = [f"element_at(__w, i + {k})" for k in range(n)]
        sh = F.expr(
            "CASE WHEN size(__w) < {n} THEN array() ELSE array_distinct("
            "transform(sequence(1, size(__w) - {nm1}), "
            "i -> concat_ws(' ', {parts}))) END".format(
                n=n, nm1=n - 1, parts=", ".join(parts)
            )
        )
    return (
        documents.withColumn("__w", w)
        .select("doc_id", sh.alias("sh"))
    )


def exact_dedup_pick(documents: DataFrame) -> DataFrame:
    """Exact dedup via content hash: one row per distinct text with the
    kept (minimum) doc_id and the duplicate count. Grouping on the
    sha256 digest keeps shuffle keys constant-width regardless of doc
    size (SURVEY.md §2.1 [EXT])."""
    return (
        documents.select(F.sha2(F.col("text"), 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
    )


def _jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 2, threshold: float = 0.3
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (all pairs — the oracle).

    Quadratic: reserve for small inputs or post-LSH verification. Output
    is (doc_a, doc_b, j) with doc_a < doc_b.
    """
    sh = shingles(documents, n)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 16, n: int = 2
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min over shingles of
    xxhash64(i || shingle). One explode + one groupBy (map-side partial
    min) — shuffle carries num_hashes longs per doc."""
    sh = shingles(documents, n).filter(F.size("sh") > 0)
    exploded = sh.select("doc_id", F.explode("sh").alias("s"))
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-verified.

    banding: signature split into ``bands`` groups of r = num_hashes /
    bands; candidates = doc pairs sharing ANY band hash (equi-join on
    (band_idx, band_hash) — linear, no cross product); each candidate is
    then verified with exact Jaccard so the result has no false
    positives, only (bounded-probability) false negatives.
    """
    r = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{bi * r + k}") for k in range(r)]
                ).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", F.explode(band_structs).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    la = banded.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    lb = banded.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        la.join(lb, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh = shingles(documents, n)
    cand = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.round(_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )


def simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash sketch per document.

    bit_j(doc) = sign of sum over words of (+1 if bit j of
    xxhash64(word) else -1). Implemented as explode + one groupBy with
    64 conditional-sum aggregates (all JVM-side); the recombination is
    a bitwise OR fold. Hamming-close sketches ⇒ similar bags of words.
    """
    words = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    aggs = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sums = words.groupBy("doc_id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for j in range(64):
        bit = 1 << j if j < 63 else -(1 << 63)  # avoid signed-long overflow
        acc = acc.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.lit(bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("doc_id", acc.alias("simhash"))


def simhash_hamming_pairs(
    documents: DataFrame, max_distance: int = 8
) -> DataFrame:
    """Near-dup candidate pairs by SimHash Hamming distance ≤ k.

    Candidate generation blocks on 16-bit quarters of the sketch (two
    sketches within distance ≤ 3 of each other must agree on at least
    one quarter; for larger k this is a recall-bounded heuristic) —
    equi-join per quarter, then exact popcount verification.
    """
    sk = simhash(documents)
    quarters = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftrightunsigned(F.col("simhash"), q * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("qh"),
            )
            for q in range(4)
        ]
    )
    blocked = sk.select(
        "doc_id", "simhash", F.explode(quarters).alias("b")
    ).select(
        "doc_id", "simhash", F.col("b.q").alias("q"), F.col("b.qh").alias("qh")
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "q", "qh"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "q", "qh"
    )
    cand = (
        a.join(b, ["q", "qh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", dist.alias("hamming")
    ).filter(F.col("hamming") <= max_distance)
