"""Physical-plan regression guards: the optimizations the engine's
scale story depends on must be visible in the executed plan. A
correctness-preserving refactor that silently loses pushdown or
broadcasts would pass the oracle tests — these catch it.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def explain_str(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_range_scan_pushes_down_raw_ns(spark):
    """query_range on the raw int64-nanos column must reach the parquet
    scan as PushedFilters (the converted-timestamp filter cannot)."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    ev = tables.load_table(spark, SF_SMOKE, "events", keep_raw_ns=True)
    df = core.query_range(
        ev, "click", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    ).select("value", "ts")
    plan = explain_str(df)
    assert "PushedFilters" in plan
    # the ts-nanos range bounds appear in pushed filters, not just as a
    # post-scan Filter
    assert "GreaterThanOrEqual(ts," in plan and "LessThanOrEqual(ts," in plan
    assert "EqualTo(event_type,click)" in plan


def test_column_pruning(spark):
    """A two-column projection must not read the full events schema."""
    from timeseries_data_provider_spark import tables

    ev = tables.load_table(spark, SF_SMOKE, "events")
    df = ev.select("event_id", "value")
    plan = explain_str(df)
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_lookup_join_broadcasts(spark):
    """The dimension lookup (O7) must be a broadcast hash join — no
    shuffle of the fact side."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    c = tables.load_table(spark, SF_SMOKE, "customer")
    n = tables.load_table(spark, SF_SMOKE, "nation")
    df = core.lookup_join(c, n, c.c_nationkey == n.n_nationkey)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ordered_limit_is_top_k(spark):
    """orderBy().limit() must plan as TakeOrderedAndProject (distributed
    partial top-k), not a global sort."""
    from timeseries_data_provider_spark import tables

    ev = tables.load_table(spark, SF_SMOKE, "events")
    df = ev.orderBy("ts", "event_id").limit(100)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan


def test_aggregate_is_partial_final(spark):
    """Time-bucket rollup must use two-phase hash aggregation (map-side
    partial combine before the shuffle)."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import aggregates

    ev = tables.load_table(spark, SF_SMOKE, "events")
    plan = explain_str(aggregates.time_bucket(ev))
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "Functions [4]" in plan


def test_jaccard_has_no_nested_loop(spark):
    """The inverted-index jaccard join must never degrade to a
    nested-loop / cartesian plan."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import dedup

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    plan = explain_str(dedup.ngram_jaccard_pairs(docs, 3, 0.3))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_approx_distinct_tolerance(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import aggregates
    from pyspark.sql import functions as F

    ev = tables.load_table(spark, SF_SMOKE, "events")
    approx = {
        r["event_type"]: r["approx_users"]
        for r in aggregates.approx_distinct_users(ev, rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.06 * exact[k])


def test_contamination_broadcasts_eval_set(spark):
    """The eval-holdout shingle set must be the broadcast build side —
    the train-side (100 TB side) shingles are probed map-side, never
    shuffled for the join."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import pipeline

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    plan = explain_str(pipeline.ngram_contamination(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_documents_has_no_shuffle(spark):
    """Chunking is a pure per-row explode — any Exchange in its plan is
    a regression."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import pipeline

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    plan = explain_str(pipeline.chunk_documents(docs, 32))
    assert "Exchange" not in plan


def test_vocab_topk_is_distributed_topk(spark):
    """Heavy hitters must plan as TakeOrderedAndProject (per-partition
    partial top-k), not a global sort."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import text

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    plan = explain_str(text.vocab_topk(docs, 100))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_declared_contract_is_exactly_fifty_with_full_oracles():
    """The driver records correctness rows for at most the FIRST 50
    declared queries (round-1 lesson: 65 declared, 50 recorded). Pin
    the contract at exactly 50 entries, every one with an oracle, so
    adding a 51st query (which would silently drop a row) or dropping
    an oracle (which would downgrade a row to rows-only) fails loudly
    here instead of in the next round's scoreboard."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) == 50, f"{len(qs)} declared queries (driver caps at 50)"
    assert set(qs) == set(oracles), (
        f"query/oracle mismatch: no-oracle={sorted(set(qs) - set(oracles))} "
        f"orphan-oracles={sorted(set(oracles) - set(qs))}"
    )
    assert entrymod.NON_BENCH <= set(qs)


def test_line_dedup_joins_are_equi_only(spark):
    """Cross-document line dedup must plan as hash-agg + equi-joins:
    no NestedLoop/Cartesian anywhere (the hot boilerplate lines are
    excluded from the kept set BEFORE the join, so the plan has no
    skew-amplifying stage to hide)."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import dedup

    docs = tables.load_table(spark, SF_SMOKE, "documents")
    plan = explain_str(dedup.line_dedup(docs, min_df=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_rp_topk_inline_is_single_scan_topk(spark):
    """The inline JL-projection top-k must keep the candidate stage a
    distributed partial top-k (TakeOrderedAndProject), with the
    projection riding the scan — no shuffle of the scored table."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import similarity

    e = tables.load_table(spark, SF_SMOKE, "embeddings")
    plan = explain_str(similarity.rp_topk(e, 0, k=10, out_dim=8))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_smj_fact_side(spark, tmp_path):
    """Catalyst's runtime Bloom-filter join pruning (Spark 4 default-
    on): for a sort-merge join with a selective build side, the fact
    side's scan gains a might_contain() predicate built from the dim
    side — rows that cannot join are dropped BEFORE the shuffle (the
    100 TB lever: shuffle bytes track the join's selectivity, not the
    fact's size). Thresholds here are lowered to local sizes, the AQE
    skew-join evidence methodology; the engine's session leaves the
    optimization enabled."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(500_000).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("pay"),
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(50).select((F.col("id") * 999).alias("k")).write.mode(
        "overwrite"
    ).parquet(dim_p)

    def plan(bloom_on):
        old = {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.optimizer.runtime.bloomFilter.enabled",
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold",
                "spark.sql.optimizer.runtime.bloomFilter."
                "creationSideThreshold",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled",
                str(bloom_on).lower(),
            )
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold",
                "1MB",
            )
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter."
                "creationSideThreshold",
                "10MB",
            )
            # force SMJ: broadcast joins don't need the filter
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # the injector wants a LIKELY-SELECTIVE predicate on
            # the creation side (a bare small table is not enough)
            dim = spark.read.parquet(dim_p).filter(
                F.col("k") < 40_000
            )
            q = spark.read.parquet(fact_p).join(dim, "k")
            assert q.count() == 41
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.explain("formatted")
            return buf.getvalue()
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)

    with_bloom = plan(True)
    without = plan(False)
    assert "might_contain" in with_bloom
    assert "might_contain" not in without
