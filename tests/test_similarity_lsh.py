"""SRP-LSH recall/precision on planted near-duplicate vectors, and IVF
recall against brute force on real testdata."""

from __future__ import annotations

import math
import random

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def planted(spark):
    """120 random unit-ish vectors + 30 near-duplicates (tiny noise):
    the planted pairs have cosine ≥ ~0.99, everything else ~0."""
    rng = random.Random(42)
    rows = []
    for i in range(120):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    for j in range(30):
        base = rows[j][1]
        noisy = [x + rng.gauss(0, 0.02) for x in base]
        rows.append((1000 + j, noisy))
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], schema
    )


def test_srp_lsh_finds_planted_pairs(planted):
    from timeseries_data_provider_spark.operators import similarity

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_neardup_pairs(planted, 0.9).collect()
    }
    expected = {(j, 1000 + j) for j in range(30)}
    assert exact >= expected  # sanity: the plant worked

    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.srp_lsh_neardup(
            planted, threshold=0.9, num_tables=4, bits_per_table=8
        ).collect()
    }
    # no false positives (exact verification step)
    assert lsh <= exact
    # recall on the planted pairs
    recall = len(lsh & expected) / len(expected)
    assert recall >= 0.8, f"recall {recall}"


def test_srp_lsh_prunes_candidates(planted):
    """The candidate set must be far smaller than all-pairs."""
    from timeseries_data_provider_spark.operators import similarity
    from pyspark.sql import functions as F

    n = planted.count()
    all_pairs = n * (n - 1) // 2
    # count candidates by running with threshold=-1 (keep everything
    # the bucketing admits)
    cand = similarity.srp_lsh_neardup(
        planted, threshold=-1.0, num_tables=4, bits_per_table=8
    ).count()
    assert cand < all_pairs * 0.25, f"{cand} of {all_pairs}"


def test_neardup_guard_trips_over_max_rows(planted):
    """embedding_neardup_pairs is the O(n^2) oracle form; the guard must
    refuse big inputs and point at the bucketed scale path."""
    from timeseries_data_provider_spark.operators import similarity

    with pytest.raises(ValueError, match="srp_lsh_neardup"):
        similarity.embedding_neardup_pairs(planted, 0.9, max_rows=10)

    # at/under the bound it runs normally
    small = planted.limit(10)
    assert similarity.embedding_neardup_pairs(
        small, -1.0, max_rows=10
    ).count() == 45

    # max_rows=None skips the guard count entirely (explicit opt-out
    # for callers that already know their cardinality): same result,
    # and it must NOT raise even though the input exceeds the bound
    # that tripped above
    assert similarity.embedding_neardup_pairs(
        small, -1.0, max_rows=None
    ).count() == 45
    assert (
        similarity.embedding_neardup_pairs(planted, 0.9, max_rows=None)
        .count()
        == similarity.embedding_neardup_pairs(planted, 0.9).count()
    )


def test_srp_lsh_dedup_exchange_is_ids_only(planted):
    """The candidate-dedup exchange must not carry vector payloads:
    no Exchange hashpartitioning on (vec_a, vec_b) whose output row
    includes an array column (VERDICT r2 finding 3)."""
    from timeseries_data_provider_spark.operators import similarity

    df = similarity.srp_lsh_neardup(planted, threshold=0.9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every HashAggregate implementing the dropDuplicates keys on
    # vec_a/vec_b only — the keys line must not mention va/vb/v arrays
    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        keys = m.group(1)
        if "vec_a" in keys and "vec_b" in keys:
            assert "va" not in keys and "vb" not in keys, keys


def test_cosine_topk_batch_matches_single_query(planted):
    """Batch multi-query top-k must equal per-query cosine_topk, and
    its plan must contain WindowGroupLimit (partial top-k before the
    exchange — the property that keeps the shuffle at k rows per
    (query, partition) instead of the full score matrix)."""
    from timeseries_data_provider_spark.operators import similarity

    qids = [0, 1, 2]
    batch = similarity.cosine_topk_batch(planted, qids, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rn"], r["vec_id"], r["sim"]))
    for qid in qids:
        single = [
            (i + 1, r["vec_id"], r["sim"])
            for i, r in enumerate(
                similarity.cosine_topk(planted, query_vec_id=qid, k=5).collect()
            )
        ]
        assert sorted(got[qid]) == single, qid

    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def _vec_df(spark, rows):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_srp_lsh_dim_guard(spark):
    """VERDICT r4 #1: a corpus whose embedding width doesn't match the
    hyperplane dim must FAIL LOUDLY, not silently collapse every vector
    into one bucket (degenerating LSH into the all-pairs join)."""
    from timeseries_data_provider_spark.operators import similarity

    rng = random.Random(7)
    d3 = _vec_df(
        spark,
        [(i, [float(rng.gauss(0, 1)) for _ in range(3)]) for i in range(20)]
        + [(1000, None)][:0],
    )

    # explicit dim=64 over dim-3 vectors: the plan-embedded assert
    # trips at action time with the operator's name in the message
    with pytest.raises(Exception, match="srp_lsh_neardup.*dim"):
        similarity.srp_lsh_neardup(d3, threshold=0.9, dim=64).collect()

    # derive path (dim=None): works on a non-64 corpus — a planted
    # exact duplicate is found
    dup = d3.union(
        _vec_df(
            spark,
            [
                (
                    2000,
                    [float(x) for x in d3.filter("vec_id = 0").first()[
                        "embedding"
                    ]],
                )
            ],
        )
    )
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.srp_lsh_neardup(dup, threshold=0.99).collect()
    }
    assert (0, 2000) in pairs

    # mixed-width corpus: derive picks the first row's width, the
    # stray row still fails the job
    mixed = d3.union(
        _vec_df(spark, [(3000, [float(rng.gauss(0, 1)) for _ in range(5)])])
    )
    with pytest.raises(Exception, match="srp_lsh_neardup.*vec_id 3000"):
        similarity.srp_lsh_neardup(mixed, threshold=0.9).collect()


def test_ivf_layout_rejects_mismatched_query(spark, tmp_path, planted):
    """The layout probe must refuse a query vector whose width doesn't
    match the stored centroids (it would rank every centroid by NULL
    and probe arbitrary partitions)."""
    from timeseries_data_provider_spark.operators import similarity

    path = str(tmp_path / "ivf")
    similarity.write_ivf_layout(planted, path, num_centroids=4)
    with pytest.raises(ValueError, match="dim 3 .*dim-64"):
        similarity.ivf_topk_from_layout(
            spark, path, query_vec=[1.0, 2.0, 3.0], k=5, nprobe=2
        )
    # matching width still works
    q = planted.filter("vec_id = 0").first()["embedding"]
    got = similarity.ivf_topk_from_layout(
        spark, path, query_vec=[float(x) for x in q], k=5, nprobe=4
    )
    assert got.count() == 5


def test_kmeans_lloyd_trains_and_layout_probe_recalls(
    spark, tmp_path, planted
):
    """VERDICT r4 #6: real Lloyd's iterations for the IVF layout.
    Training must (a) keep k centroids, (b) not worsen the clustering
    objective vs the lowest-id seeds, and (c) yield a materialized
    layout whose nprobe=k/2 probe recovers >= 80% of the brute-force
    top-10."""
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import similarity

    k = 8
    trained = similarity.train_ivf_centroids(
        planted, num_centroids=k, iterations=3
    )
    assert trained.count() == k

    def mean_assigned_cos(cents):
        assign = similarity.assign_to_centroids(planted, cents)
        return (
            planted.join(assign, "vec_id")
            .join(cents, "centroid_id")
            .select(
                similarity.cosine(
                    similarity.as_double(F.col("embedding")), F.col("cv")
                ).alias("cs")
            )
            .agg(F.avg("cs"))
            .first()[0]
        )

    seed_obj = mean_assigned_cos(similarity.seed_centroids(planted, k))
    trained_obj = mean_assigned_cos(trained)
    # cosine objective: higher is tighter clustering; Lloyd's never
    # decreases it (tiny epsilon for float-avg order noise)
    assert trained_obj >= seed_obj - 1e-9, (seed_obj, trained_obj)

    path = str(tmp_path / "ivf_trained")
    similarity.write_ivf_layout(
        planted, path, num_centroids=k, centroids=trained
    )
    q = [float(x) for x in planted.filter("vec_id = 0").first()["embedding"]]
    brute = {
        r["vec_id"]
        for r in similarity.cosine_topk(planted, query_vec_id=0, k=10).collect()
    }
    probed = [
        r["vec_id"]
        for r in similarity.ivf_topk_from_layout(
            spark, path, q, k=11, nprobe=k // 2
        ).collect()
        if r["vec_id"] != 0
    ][:10]
    recall = len(set(probed) & brute) / 10
    assert recall >= 0.8, recall


def test_embedding_dim_empty_raises(spark):
    from timeseries_data_provider_spark.operators import similarity

    empty = _vec_df(spark, [])
    with pytest.raises(ValueError, match="empty"):
        similarity.embedding_dim(empty)


def test_sq8_quantize_bounds_and_zero_guard(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import similarity

    rows = [
        (0, [1.0, -2.0, 0.5, 4.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector: must code to zeros
        (2, [-0.001, 0.001, 0.0005, -0.0002]),  # tiny magnitudes
    ]
    qz = similarity.quantize_embeddings(_vec_df(spark, rows)).collect()
    by_id = {r["vec_id"]: r for r in qz}
    # codes bounded to [-127, 127]; the max-|x| slot hits exactly +/-127
    for r in qz:
        assert all(-127 <= c <= 127 for c in r["q"]), r
    assert max(abs(c) for c in by_id[0]["q"]) == 127
    assert max(abs(c) for c in by_id[2]["q"]) == 127
    # zero vector: all-zero codes, no division blow-up
    assert by_id[1]["q"] == [0, 0, 0, 0]


def test_sq8_topk_recovers_brute(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    brute = [
        (r["vec_id"], r["sim"])
        for r in similarity.cosine_topk(e, 0, 10).collect()
    ]
    sq8 = [
        (r["vec_id"], r["sim"])
        for r in similarity.cosine_topk_sq8(e, 0, 10, refine=4).collect()
    ]
    # int8 on dim-64 embeddings: the 4x-refined candidate set recovers
    # the exact top-10 (the final sims are exact-float re-ranks, so
    # equality is on values too, not just ids)
    assert sq8 == brute
    # deterministic under repartitioning
    sq8b = [
        (r["vec_id"], r["sim"])
        for r in similarity.cosine_topk_sq8(
            e.repartition(7), 0, 10, refine=4
        ).collect()
    ]
    assert sq8b == sq8


def test_sq8_quantizer_matches_python_reference(spark):
    """quantize_embeddings vs an independent Python reimplementation of
    the floor quantizer over 200 seeded-random float32 vectors plus
    planted edge cases (zero vector, denormal-small magnitudes, single
    dominant slot, all-negative). One Spark pass, per-row compare —
    pins the exact FP op order (cast-to-double, scale = absmax/127,
    x/scale + 0.5, floor) and the qnorm column."""
    import math as m
    import random

    import numpy as np

    from timeseries_data_provider_spark.operators import similarity

    rng = random.Random(42)
    rows = [
        (0, [0.0, 0.0, 0.0]),
        (1, [1e-38, -1e-38, 5e-39]),
        (2, [100.0, 0.0, 0.0]),
        (3, [-0.5, -0.25, -0.125]),
    ]
    for i in range(4, 204):
        dim = rng.randrange(1, 9)
        rows.append(
            (i, [rng.uniform(-10, 10) * 10 ** rng.randrange(-6, 7)
                 for _ in range(dim)])
        )

    def ref(vec):
        xs = [float(np.float32(x)) for x in vec]
        am = max(abs(x) for x in xs)
        if am == 0.0:
            return [0] * len(xs), 0
        scale = am / 127.0
        q = [int(m.floor(x / scale + 0.5)) for x in xs]
        return q, sum(c * c for c in q)

    got = {
        r["vec_id"]: (list(r["q"]), r["qnorm"])
        for r in similarity.quantize_embeddings(
            _vec_df(spark, rows)
        ).collect()
    }
    for vec_id, vec in rows:
        q, qn = ref(vec)
        assert got[vec_id] == (q, qn), (vec_id, vec, got[vec_id], (q, qn))
        assert all(-127 <= c <= 127 for c in q)


def test_rp_signs_deterministic_and_engine_free():
    import hashlib

    from timeseries_data_provider_spark.operators.similarity import rp_signs

    a = rp_signs(16, 64)
    b = rp_signs(16, 64)
    assert a == b
    assert all(s in (1.0, -1.0) for row in a for s in row)
    # spot-check the published derivation rule (the oracle relies on
    # reproducing the matrix from (seed, j, i) alone)
    nib = int(hashlib.md5(b"rp:3:7").hexdigest()[0], 16)
    assert a[3][7] == (1.0 if nib % 2 == 0 else -1.0)


def test_rp_topk_inline_equals_projected_table_form(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    inline = similarity.rp_topk(e, query_vec_id=0, k=10, out_dim=16)
    proj = similarity.random_project(e, out_dim=16)
    via_table = similarity.rp_topk(
        e, query_vec_id=0, k=10, out_dim=16, projected=proj
    )
    assert [tuple(r) for r in inline.collect()] == [
        tuple(r) for r in via_table.collect()
    ]
    # re-rank sims are exact cosines: every returned sim must equal the
    # brute-force sim for that vec_id
    brute = {
        r["vec_id"]: r["sim"]
        for r in similarity.cosine_topk(e, query_vec_id=0, k=50).collect()
    }
    for r in inline.collect():
        if r["vec_id"] in brute:
            assert r["sim"] == brute[r["vec_id"]]


def test_rp_topk_candidate_pruning_reads_narrow_table(spark):
    # The projected-table form's candidate stage must scan ONLY the
    # (vec_id, rp) columns of the index table — the full embedding
    # column enters the plan solely through the candidate re-rank join.
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    proj = similarity.random_project(e, out_dim=16)
    plan = similarity.rp_topk(
        e, query_vec_id=0, k=10, out_dim=16, projected=proj
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_random_project_dim_guard(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark.operators import similarity

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    with _pytest.raises(Exception, match="random_project"):
        similarity.random_project(bad, out_dim=4, dim=2).collect()


def test_rp_topk_fetch_by_id_and_float_precision(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    proj = similarity.random_project(e, out_dim=16, precision="float")
    a = similarity.rp_topk(
        e, query_vec_id=0, k=10, out_dim=16, projected=proj
    ).collect()
    b = similarity.rp_topk(
        e, query_vec_id=0, k=10, out_dim=16, projected=proj,
        fetch_by_id=True,
    ).collect()
    # both re-rank paths agree, and sims are exact cosines regardless
    # of the float32 index precision
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    brute = {
        r["vec_id"]: r["sim"]
        for r in similarity.cosine_topk(e, query_vec_id=0, k=500).collect()
    }
    for r in a:
        assert r["sim"] == brute[r["vec_id"]]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision"):
        similarity.random_project(e, out_dim=4, precision="int8")


def test_rp_topk_rejects_mismatched_index_width(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    proj32 = similarity.random_project(e, out_dim=32)
    with _pytest.raises(Exception, match="out_dim"):
        similarity.rp_topk(
            e, query_vec_id=0, k=10, out_dim=16, projected=proj32
        ).collect()


# --- product quantization (r9) ---------------------------------------------

from timeseries_data_provider_spark.operators import similarity  # noqa: E402


def _pq_corpus(spark, n_per=6, dim=16):
    """Four well-separated clusters in dim-16: cluster c lives on
    block c of the vector (one-hot block structure), members scaled
    1 + i/100 so within-cluster order is deterministic and PQ's
    block-aligned codes separate clusters exactly."""
    rows = []
    for c in range(4):
        for i in range(n_per):
            v = [0.0] * dim
            for d in range(4):
                v[c * 4 + d] = (1.0 + i / 100.0) * (d + 1)
            rows.append((c * 100 + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_books_shape_and_dim_guard(spark):
    e = _pq_corpus(spark)
    books = similarity.train_pq_codebooks(e, m=4, ncodes=4, iterations=2)
    assert len(books) == 4
    assert all(len(b) == 4 for b in books)
    assert all(len(cw) == 4 for b in books for cw in b)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.train_pq_codebooks(e, m=5)


def test_pq_encode_matches_join_assignment(spark):
    # the literal-expression encoder must agree with the DataFrame
    # assignment path used in training (same L2, same first-min tie)
    e = _pq_corpus(spark)
    books = similarity.train_pq_codebooks(e, m=4, ncodes=4, iterations=2)
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in similarity.pq_encode(e, books).select("vec_id", "codes").collect()
    }
    cb = spark.createDataFrame(
        [
            (j, k, books[j][k])
            for j in range(len(books))
            for k in range(len(books[j]))
        ],
        "sub_id int, code int, cv array<double>",
    )
    subs = similarity._pq_subvectors(e, 4, 4)
    joined = similarity._assign_pq_codes(subs, cb).collect()
    want: dict = {}
    for r in joined:
        want.setdefault(r["vec_id"], {})[r["sub_id"]] = r["code"]
    assert codes == {
        v: [m[j] for j in range(4)] for v, m in want.items()
    }
    # codes are byte-ranged
    assert all(0 <= c < 4 for cs in codes.values() for c in cs)


def test_pq_topk_recovers_brute_on_clustered_corpus(spark):
    e = _pq_corpus(spark)
    brute = similarity.cosine_topk(e, query_vec_id=0, k=5).collect()
    for iters in (0, 2):
        books = similarity.train_pq_codebooks(
            e, m=4, ncodes=4, iterations=iters
        )
        got = similarity.pq_topk(
            e, books, query_vec_id=0, k=5, refine=2
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in brute], iters
    # the neighbors really are the same-cluster members
    assert {r["vec_id"] for r in brute} == {1, 2, 3, 4, 5}


def test_pq_topk_missing_query_raises(spark):
    e = _pq_corpus(spark)
    books = similarity.train_pq_codebooks(e, m=4, ncodes=4, iterations=0)
    with pytest.raises(ValueError, match="not found"):
        similarity.pq_topk(e, books, query_vec_id=999_999)


# --- SemDeDup (r9) ----------------------------------------------------------


def test_semantic_dedup_greedy_keeper_within_cluster(spark):
    # two tight semantic groups on orthogonal directions + one loner;
    # centroids seeded from the two lowest ids put each group in its
    # own cluster
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (3, [0.01, 0.999, 0.0, 0.0]),   # near-dup of 1
        (4, [0.998, 0.02, 0.0, 0.0]),   # near-dup of 0 AND 2
        (5, [0.0, 0.0, 1.0, 0.0]),      # loner (nearest centroid 0/1
                                         # but similar to neither)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["kept"], r["keeper_id"])
        for r in similarity.semantic_dedup(
            e, num_clusters=2, threshold=0.9
        ).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (True, None)
    assert out[2] == (False, 0)
    assert out[3] == (False, 1)
    assert out[4] == (False, 0)  # lowest qualifying id wins, not 2
    assert out[5] == (True, None)
    assert len(out) == 6  # one row per input vector


def test_semantic_dedup_local_minimum_rule_on_chains(spark):
    # the documented LOCAL-MINIMUM rule: on a chain 0~1~2 with
    # cos(0, 2) below threshold, 2 is dropped with keeper 1 even
    # though 1 is itself dropped — domination needs no closure loop
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [(0, unit(0.0)), (1, unit(0.25)), (2, unit(0.5))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = math.cos(0.3)  # 0~1 and 1~2 qualify; 0~2 (cos 0.5) does not
    out = {
        r["vec_id"]: (r["kept"], r["keeper_id"])
        for r in similarity.semantic_dedup(
            e, num_clusters=1, threshold=round(thr, 6)
        ).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, 0)
    assert out[2] == (False, 1)
    # ...and the higher-id-bridge case where this rule keeps MORE
    # than connected components: 0~2 and 1~2 but 0 and 1 orthogonal
    rows2 = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 1.0, 0.0, 0.0]),  # cos to both = 1/sqrt(2)
    ]
    e2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    out2 = {
        r["vec_id"]: (r["kept"], r["keeper_id"])
        for r in similarity.semantic_dedup(
            e2, num_clusters=1, threshold=0.7
        ).collect()
    }
    assert out2[0] == (True, None)
    assert out2[1] == (True, None)
    assert out2[2] == (False, 0)


def test_semantic_dedup_cluster_boundary_blocks_drop(spark):
    # near-identical vectors FORCED into different clusters are not
    # compared — the paper's approximation, made visible by seeding
    # the two of them as the centroids themselves
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9999, 0.0001]),  # ~dup of 0, but it IS centroid 1
        (2, [0.99, 0.001]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in similarity.semantic_dedup(
            e, num_clusters=2, threshold=0.99
        ).collect()
    }
    # 0 and 1 each anchor their own cluster -> both kept despite
    # being near-dups; 2 lands with one of them and is dropped
    assert out[0][0] is True and out[1][0] is True
    assert out[2][0] is False


def test_pq_topk_persisted_codes_path_matches_inline(spark):
    # the 32x lever: retrieval over a PERSISTED codes table must equal
    # the re-encode-per-query form exactly (review finding: without
    # codes=, every query paid the full K*dim encode)
    e = _pq_corpus(spark)
    books = similarity.train_pq_codebooks(e, m=4, ncodes=4, iterations=2)
    codes = similarity.pq_encode(e, books).select("vec_id", "codes")
    inline = similarity.pq_topk(e, books, query_vec_id=0, k=5, refine=2)
    persisted = similarity.pq_topk(
        e, books, query_vec_id=0, k=5, refine=2, codes=codes
    )
    assert [tuple(r) for r in persisted.collect()] == [
        tuple(r) for r in inline.collect()
    ]
