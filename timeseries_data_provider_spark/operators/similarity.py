"""[EXT] Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k vs one query vector. The
  correctness baseline; linear scan, no shuffle until the final top-k
  (TakeOrderedAndProject — distributed partial top-k per partition,
  k rows per partition to the driver).
- ``embedding_neardup_pairs``: exact pairwise near-dup above a cosine
  threshold (quadratic — small/blocked inputs or oracle use).
- ``ivf_assign`` / ``ivf_topk``: the scale path — IVF-style inverted
  file: vectors are pre-assigned to their nearest centroid (one
  broadcast join at build time); a query probes only the closest
  ``nprobe`` centroid buckets, turning the 100 TB scan into a
  partition-pruned read of nprobe/m of the data.

The dot product is a strict left-to-right fold (``aggregate`` over
``zip_with``) on doubles — bit-identical to a sequential loop, which is
what the DuckDB oracle computes, so results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k against the embedding of
    ``query_vec_id`` (excluded from results). Ties broken on vec_id."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        as_double(F.col("embedding")).alias("qv")
    )
    e = embeddings.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scored = e.join(F.broadcast(q)).select(
        "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), "vec_id").limit(k)


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Exact embedding near-dup: all pairs with cosine ≥ threshold.

    Quadratic all-pairs — the oracle/verification form. The scale form
    first blocks candidates (IVF bucket or LSH band) and verifies only
    within blocks. Norms are precomputed per vector (not per pair), and
    the stream side is repartitioned so the nested-loop join
    parallelizes across cores instead of running in the single
    partition a small parquet file scans into.
    """
    e = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nsq", dot(F.col("v"), F.col("v")))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nsq").alias("nsq_a"),
    ).repartition(par)
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nsq").alias("nsq_b"),
    )
    sim = F.round(
        dot(F.col("va"), F.col("vb"))
        / F.sqrt(F.col("nsq_a") * F.col("nsq_b")),
        6,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def srp_lsh_neardup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    num_tables: int = 4,
    bits_per_table: int = 8,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed embedding near-dup: signed random projections.

    Each of ``num_tables`` hash tables assigns a vector a
    ``bits_per_table``-bit bucket: bit = sign of the dot product with a
    deterministic pseudo-random hyperplane (components derived from
    sha256(table:bit:dim) — reproducible across runs and cluster
    sizes). Candidates = pairs sharing a bucket in ANY table (equi-join
    per table — linear), verified exactly by cosine.

    Collision probability per bit is 1 - θ/π (θ = angle between
    vectors), so recall is high only for genuinely similar pairs —
    this is the scale path for high thresholds (≥0.9 near-dup mining);
    the exact ``embedding_neardup_pairs`` remains the oracle.
    """
    import hashlib

    def plane_component(t: int, b: int, d: int) -> float:
        h = hashlib.sha256(f"{t}:{b}:{d}".encode()).hexdigest()[:8]
        return int(h, 16) / 0x100000000 - 0.5

    e = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nsq", dot(F.col("v"), F.col("v")))

    bucket_cols = []
    for t in range(num_tables):
        acc = F.lit(0)
        for b in range(bits_per_table):
            plane = F.array(
                *[F.lit(plane_component(t, b, d)) for d in range(dim)]
            )
            bit = F.when(dot(F.col("v"), plane) > 0, F.lit(1 << b)).otherwise(
                F.lit(0)
            )
            acc = acc + bit
        bucket_cols.append(
            F.struct(F.lit(t).alias("t"), acc.alias("bucket"))
        )
    hashed = e.select(
        "vec_id", "v", "nsq", F.explode(F.array(*bucket_cols)).alias("h")
    ).select(
        "vec_id", "v", "nsq", F.col("h.t").alias("t"), F.col("h.bucket").alias("bucket")
    )

    a = hashed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nsq").alias("nsq_a"), "t", "bucket",
    )
    b = hashed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nsq").alias("nsq_b"), "t", "bucket",
    )
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb", "nsq_a", "nsq_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / F.sqrt(F.col("nsq_a") * F.col("nsq_b")),
        6,
    )
    return cand.select("vec_a", "vec_b", sim.alias("sim")).filter(
        F.col("sim") >= threshold
    )


def ivf_assign(
    embeddings: DataFrame, num_centroids: int = 16
) -> DataFrame:
    """Assign every vector to its nearest 'centroid'.

    Deterministic centroid choice: the ``num_centroids`` lowest vec_ids
    serve as seed centroids (a real pipeline would k-means; seeds keep
    the operator reproducible with zero iterations). Broadcast the tiny
    centroid set; one narrow pass, no shuffle.
    """
    cents = (
        embeddings.orderBy("vec_id")
        .limit(num_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double(F.col("embedding")).alias("cv"),
        )
    )
    e = embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scored = e.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        cosine(F.col("v"), F.col("cv")).alias("cs"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cs").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k via IVF probing: search only the ``nprobe`` buckets
    whose centroids are closest to the query. At scale the assignment is
    precomputed and the table is partitioned by centroid_id, so this is
    a partition-pruned scan of nprobe/num_centroids of the data."""
    assign = ivf_assign(embeddings, num_centroids)
    cents = (
        embeddings.orderBy("vec_id")
        .limit(num_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double(F.col("embedding")).alias("cv"),
        )
    )
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        as_double(F.col("embedding")).alias("qv")
    )
    probe = (
        cents.join(F.broadcast(q))
        .select(
            "centroid_id", cosine(F.col("cv"), F.col("qv")).alias("cs")
        )
        .orderBy(F.col("cs").desc(), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    bucketed = embeddings.join(assign, "vec_id").join(
        F.broadcast(probe), "centroid_id", "left_semi"
    )
    return cosine_topk(bucketed, query_vec_id, k)
