"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent run by the driver at sf=0.01 for row-count + schema +
value-hash comparison. Every computed column is aliased identically on
both sides; float aggregates go through exact DECIMAL sums (see
timeseries_data_provider_spark/functions/numeric.py) so value hashes are
bit-stable across engines and partitionings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseries_data_provider_spark import tables  # noqa: E402
from timeseries_data_provider_spark.operators import (  # noqa: E402
    aggregates,
    core,
    dedup,
    joins,
    multimodal,
    pandas_ops,
    pipeline,
    resample,
    scalars,
    similarity,
    text,
    windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str, **kw) -> DataFrame:
    return tables.load_table(spark, sf_dir, name, **kw)


# ---------------------------------------------------------------------------
# reference-surface queries (SURVEY.md §2 rows O2-O16)


def q01_search_series(spark, sf):
    return core.search_series(_t(spark, sf, "events"))


def q02_range_scan(spark, sf):
    return core.query_range(
        _t(spark, sf, "events", keep_raw_ns=True),
        "click",
        "2024-01-02 00:00:00",
        "2024-01-03 00:00:00",
    ).select("value", "ts")


def q03_ordered_limit(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_type") == "view")
        .orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", "value", "ts")
    )


def q04_epoch_ms(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy("event_id")
        .limit(50)
        .select("event_id", core.epoch_ms(F.col("ts")).alias("ms"))
    )


def q05_fanout_in(spark, sf):
    ev = _t(spark, sf, "events", keep_raw_ns=True)
    return core.query_range(
        ev, ["click", "view"], "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    ).select("event_type", "event_id", "value")


def q06_table_shape(spark, sf):
    ev = _t(spark, sf, "events")
    return core.table_shape(
        ev.filter(F.col("event_type") == "purchase")
        .orderBy("ts", "event_id")
        .limit(200)
    )


def q07_retention_count(spark, sf):
    return core.expired_count(_t(spark, sf, "events"), "2024-01-05 00:00:00")


def q08_lookup_join(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        core.lookup_join(c, n, c.c_nationkey == n.n_nationkey)
        .orderBy("c_custkey")
        .limit(100)
        .select("c_custkey", "c_name", "n_name")
    )


def q16_json_extract(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        core.json_scalar(ev, "props", "$.k")
        .orderBy("event_id")
        .limit(100)
        .select("event_id", "k_val")
    )


# ---------------------------------------------------------------------------
# [EXT] aggregates / windows / joins


def q09_time_bucket(spark, sf):
    return aggregates.time_bucket(_t(spark, sf, "events"))


def q10_lag_delta(spark, sf):
    return windows.lag_delta(_t(spark, sf, "events")).orderBy("event_id").limit(500)


def q11_topk_per_group(spark, sf):
    return windows.topk_per_group(_t(spark, sf, "events"), k=5)


def q12_join_revenue(spark, sf):
    return joins.revenue_by_status(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    )


def q13_semi_join(spark, sf):
    return joins.customers_with_orders(
        _t(spark, sf, "customer"), _t(spark, sf, "orders")
    )


def q13b_anti_join(spark, sf):
    return joins.customers_without_orders(
        _t(spark, sf, "customer"), _t(spark, sf, "orders")
    )


def q14_intersect(spark, sf):
    return joins.nation_keys_intersect(
        _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    )


def q14b_except(spark, sf):
    return joins.nation_keys_except(
        _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    )


def q15_rollup(spark, sf):
    return aggregates.rollup_counts(_t(spark, sf, "lineitem"))


def q15b_cube(spark, sf):
    return aggregates.cube_counts(_t(spark, sf, "lineitem"))


def q17_dedup_counts(spark, sf):
    return aggregates.dedup_counts(_t(spark, sf, "documents"))


def q18_text_stats(spark, sf):
    return aggregates.text_stats(_t(spark, sf, "documents"))


def q19_moving_avg(spark, sf):
    return windows.moving_avg(_t(spark, sf, "events"), n=5)


def q20_sessionize(spark, sf):
    return windows.sessionize(_t(spark, sf, "events"), gap_minutes=30)


def q21_asof_join(spark, sf):
    return joins.asof_join_last_error(_t(spark, sf, "events"))


def q22_range_join(spark, sf):
    return joins.clicks_before_purchase(_t(spark, sf, "events"), minutes=10)


# ---------------------------------------------------------------------------
# [EXT] text analysis / dedup / similarity / multimodal


def q23_token_stats(spark, sf):
    return text.token_stats(_t(spark, sf, "documents"))


def q24_quality_score(spark, sf):
    return text.quality_score(_t(spark, sf, "documents"))


def q25_lang_guess(spark, sf):
    return text.lang_guess(_t(spark, sf, "documents"))


def q26_fingerprint(spark, sf):
    return text.fingerprint(_t(spark, sf, "documents"))


def q27_hash_dedup(spark, sf):
    return dedup.exact_dedup_pick(_t(spark, sf, "documents"))


def q28_ngram_jaccard(spark, sf):
    return dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"), n=3, threshold=0.3)


def q29_minhash_lsh(spark, sf):
    return dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), num_hashes=16, bands=8, n=3, threshold=0.3
    )


def q30_simhash(spark, sf):
    return dedup.simhash(_t(spark, sf, "documents"))


def q30b_simhash_pairs(spark, sf):
    return dedup.simhash_hamming_pairs(_t(spark, sf, "documents"), max_distance=8)


def q31_cosine_topk(spark, sf):
    return similarity.cosine_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10)


def q32_embedding_neardup(spark, sf):
    return similarity.embedding_neardup_pairs(
        _t(spark, sf, "embeddings"), threshold=0.35
    )


def q33_ivf_topk(spark, sf):
    return similarity.ivf_topk(
        _t(spark, sf, "embeddings"), query_vec_id=0, k=10, num_centroids=16, nprobe=8
    )


def q34_multimodal_meta(spark, sf):
    return multimodal.decode_meta_stub(
        multimodal.attach_blob(_t(spark, sf, "documents"))
    )


def q35_frame_sample(spark, sf):
    return multimodal.sample_frames(
        multimodal.attach_blob(_t(spark, sf, "documents")), frame_size=64
    )


def q37_gap_fill(spark, sf):
    return resample.gap_fill(_t(spark, sf, "events"), step_seconds=3600)


def q38_rate(spark, sf):
    return resample.rate(_t(spark, sf, "events"))


def q39_pivot(spark, sf):
    return resample.pivot_series(
        _t(spark, sf, "events"),
        ["click", "view", "purchase", "signup", "error"],
    )


def q40_ewma(spark, sf):
    # Recursive per-series EWMA via applyInPandas — not expressible in
    # SQL window frames, so no DuckDB oracle (validated against a local
    # pandas recurrence in tests/test_resample_pandas.py).
    return pandas_ops.ewma(_t(spark, sf, "events"), alpha=0.3)


def q36_approx_distinct(spark, sf):
    # HyperLogLog++ sketch — algorithm-specific estimates cannot
    # hash-match another engine; accuracy is asserted against the exact
    # count in tests/test_plans.py (rows-only driver check by design).
    return aggregates.approx_distinct_users(_t(spark, sf, "events"))


def q41_rolling_zscore(spark, sf):
    return windows.rolling_zscore(_t(spark, sf, "events"), n=20, min_points=5)


def q42_percentiles(spark, sf):
    return aggregates.value_percentiles(_t(spark, sf, "events"))


def q43_daily_users(spark, sf):
    return aggregates.daily_distinct_users(_t(spark, sf, "events"))


def q44_full_outer(spark, sf):
    return joins.orders_customers_full_outer(
        _t(spark, sf, "orders"), _t(spark, sf, "customer")
    )


def q45_cross_join(spark, sf):
    return joins.region_nation_cross(
        _t(spark, sf, "region"), _t(spark, sf, "nation")
    )


def q46_string_funcs(spark, sf):
    return scalars.part_string_features(_t(spark, sf, "part"))


def q47_date_parts(spark, sf):
    return scalars.orders_by_month(_t(spark, sf, "orders"))


def q48_lttb(spark, sf):
    # LTTB downsampling: sequential per-series pick (applyInPandas) —
    # no SQL equivalent; shape-preservation asserted in
    # tests/test_resample_pandas.py (rows-only driver check).
    return pandas_ops.lttb_downsample(_t(spark, sf, "events"), n_out=100)


def q49_dedup_clusters(spark, sf):
    # Iterative distributed connected components over the near-dup
    # graph; oracle = DuckDB recursive-CTE transitive closure.
    return dedup.neardup_clusters(_t(spark, sf, "documents"), n=3, threshold=0.3)


def q50_stratified_sample(spark, sf):
    # Deterministic proportional stratified sampling (md5-hash order, no
    # rand()) — reproducible eval-slice construction.
    return pipeline.stratified_sample(
        _t(spark, sf, "documents"), strata_col="lang", fraction=0.2
    )


def q51_chunk_docs(spark, sf):
    # Fixed-token-window chunking (context-length splitting).
    return pipeline.chunk_documents(_t(spark, sf, "documents"), chunk_tokens=32)


def q52_pack_sequences(spark, sf):
    # Greedy token-budget sequence packing per source shard.
    return pipeline.pack_sequences(_t(spark, sf, "documents"), budget=512)


def q61_approx_percentiles(spark, sf):
    # Sketch percentiles (Greenwald-Khanna): rows-only check — sketch
    # values are engine-specific; tolerance vs the exact form is
    # asserted in tests/test_pipeline_ops.py.
    return aggregates.approx_value_percentiles(_t(spark, sf, "events"))


def q60_cohort_retention(spark, sf):
    # First-touch cohort x day-offset distinct users (two-stage agg).
    return aggregates.cohort_retention(_t(spark, sf, "events"))


def q59_curate(spark, sf):
    # Composed curation pipeline: lang filter + quality gate +
    # exact-dedup keep, one declarative plan.
    return pipeline.curate(_t(spark, sf, "documents"), lang="en", min_score=0.5)


def q58_winnow_fingerprints(spark, sf):
    # Winnowing (MOSS rolling-hash) fingerprints: k-gram md5 + window
    # min + distinct.
    return text.winnow_fingerprints(_t(spark, sf, "documents"), k=3, w=4)


def q57_grouping_sets(spark, sf):
    # Arbitrary GROUPING SETS: both 1-D breakdowns in one Expand pass.
    return aggregates.grouping_sets_counts(_t(spark, sf, "lineitem"))


def q55_vocab_topk(spark, sf):
    # Corpus heavy hitters: distributed top-k over the token counts.
    return text.vocab_topk(_t(spark, sf, "documents"), k=100)


def q56_term_idf(spark, sf):
    # Document frequency + smoothed IDF (corpus half of TF-IDF).
    return text.term_df_idf(_t(spark, sf, "documents"), min_df=5)


def q54_label_centroids(spark, sf):
    # k-means/IVF update step: per-label per-dimension exact mean.
    return similarity.label_centroids(_t(spark, sf, "embeddings"))


def q53_contamination(spark, sf):
    # Benchmark-decontamination: train docs sharing >= 3 distinct
    # 3-grams with the deterministic eval holdout (doc_id % 97 == 0).
    return pipeline.ngram_contamination(
        _t(spark, sf, "documents"), eval_mod=97, n=3, min_common=3
    )


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: time-bucket rollup (the canonical time-series op) at
    sf0.001."""
    return q09_time_bucket(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {
        "q01_search_series": q01_search_series,
        "q02_range_scan": q02_range_scan,
        "q03_ordered_limit": q03_ordered_limit,
        "q04_epoch_ms": q04_epoch_ms,
        "q05_fanout_in": q05_fanout_in,
        "q06_table_shape": q06_table_shape,
        "q07_retention_count": q07_retention_count,
        "q08_lookup_join": q08_lookup_join,
        "q09_time_bucket": q09_time_bucket,
        "q10_lag_delta": q10_lag_delta,
        "q11_topk_per_group": q11_topk_per_group,
        "q12_join_revenue": q12_join_revenue,
        "q13_semi_join": q13_semi_join,
        "q13b_anti_join": q13b_anti_join,
        "q14_intersect": q14_intersect,
        "q14b_except": q14b_except,
        "q15_rollup": q15_rollup,
        "q15b_cube": q15b_cube,
        "q16_json_extract": q16_json_extract,
        "q17_dedup_counts": q17_dedup_counts,
        "q18_text_stats": q18_text_stats,
        "q19_moving_avg": q19_moving_avg,
        "q20_sessionize": q20_sessionize,
        "q21_asof_join": q21_asof_join,
        "q22_range_join": q22_range_join,
        "q23_token_stats": q23_token_stats,
        "q24_quality_score": q24_quality_score,
        "q25_lang_guess": q25_lang_guess,
        "q26_fingerprint": q26_fingerprint,
        "q27_hash_dedup": q27_hash_dedup,
        "q28_ngram_jaccard": q28_ngram_jaccard,
        "q29_minhash_lsh": q29_minhash_lsh,
        "q30_simhash": q30_simhash,
        "q30b_simhash_pairs": q30b_simhash_pairs,
        "q31_cosine_topk": q31_cosine_topk,
        "q32_embedding_neardup": q32_embedding_neardup,
        "q33_ivf_topk": q33_ivf_topk,
        "q34_multimodal_meta": q34_multimodal_meta,
        "q35_frame_sample": q35_frame_sample,
        "q36_approx_distinct": q36_approx_distinct,
        "q37_gap_fill": q37_gap_fill,
        "q38_rate": q38_rate,
        "q39_pivot": q39_pivot,
        "q40_ewma": q40_ewma,
        "q41_rolling_zscore": q41_rolling_zscore,
        "q42_percentiles": q42_percentiles,
        "q43_daily_users": q43_daily_users,
        "q44_full_outer": q44_full_outer,
        "q45_cross_join": q45_cross_join,
        "q46_string_funcs": q46_string_funcs,
        "q47_date_parts": q47_date_parts,
        "q48_lttb": q48_lttb,
        "q49_dedup_clusters": q49_dedup_clusters,
        "q50_stratified_sample": q50_stratified_sample,
        "q51_chunk_docs": q51_chunk_docs,
        "q52_pack_sequences": q52_pack_sequences,
        "q53_contamination": q53_contamination,
        "q54_label_centroids": q54_label_centroids,
        "q55_vocab_topk": q55_vocab_topk,
        "q56_term_idf": q56_term_idf,
        "q57_grouping_sets": q57_grouping_sets,
        "q58_winnow_fingerprints": q58_winnow_fingerprints,
        "q59_curate": q59_curate,
        "q60_cohort_retention": q60_cohort_retention,
        "q61_approx_percentiles": q61_approx_percentiles,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_search_series": "SELECT DISTINCT event_type AS name FROM events",
        "q02_range_scan": """
            SELECT value, ts FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-02 00:00:00'
              AND ts <= TIMESTAMP '2024-01-03 00:00:00'
        """,
        "q03_ordered_limit": """
            SELECT event_id, value, ts FROM events
            WHERE event_type = 'view'
            ORDER BY ts, event_id LIMIT 100
        """,
        "q04_epoch_ms": """
            SELECT event_id, epoch_ms(ts) AS ms FROM events
            ORDER BY event_id LIMIT 50
        """,
        "q05_fanout_in": """
            SELECT event_type, event_id, value FROM events
            WHERE event_type IN ('click', 'view')
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-02-01 00:00:00'
        """,
        "q06_table_shape": """
            SELECT event_type AS target, value, ts FROM events
            WHERE event_type = 'purchase'
            ORDER BY ts, event_id LIMIT 200
        """,
        "q07_retention_count": """
            SELECT COUNT(*) AS n FROM events
            WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        """,
        "q08_lookup_join": """
            SELECT c.c_custkey, c.c_name, n.n_name
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            ORDER BY c.c_custkey LIMIT 100
        """,
        "q09_time_bucket": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, COUNT(*) AS n,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                         / COUNT(*), 6) AS avg_v,
                   MIN(value) AS min_v, MAX(value) AS max_v
            FROM events GROUP BY 1, 2
        """,
        "q10_lag_delta": """
            SELECT event_id,
                   value - LAG(value) OVER
                     (PARTITION BY event_type ORDER BY ts, event_id) AS delta
            FROM events ORDER BY event_id LIMIT 500
        """,
        "q11_topk_per_group": """
            SELECT * FROM (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rn
              FROM events) t
            WHERE rn <= 5
        """,
        "q12_join_revenue": """
            SELECT o.o_orderstatus,
                   CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                                 AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "q13_semi_join": """
            SELECT COUNT(*) AS n FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        """,
        "q13b_anti_join": """
            SELECT COUNT(*) AS n FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "q14_intersect": """
            SELECT c_nationkey AS k FROM customer
            INTERSECT
            SELECT s_nationkey AS k FROM supplier
        """,
        "q14b_except": """
            SELECT c_nationkey AS k FROM customer
            EXCEPT
            SELECT s_nationkey AS k FROM supplier
        """,
        "q15_rollup": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q15b_cube": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_price
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q16_json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val
            FROM events ORDER BY event_id LIMIT 100
        """,
        "q17_dedup_counts": """
            SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq
            FROM documents
        """,
        "q18_text_stats": """
            SELECT lang, COUNT(*) AS n,
                   CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "q19_moving_avg": """
            SELECT event_id,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                              OVER w AS DOUBLE)
                         / COUNT(*) OVER w, 6) AS mov_avg
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "q20_sessionize": """
            WITH x AS (
              SELECT user_id,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
            FROM x GROUP BY user_id
        """,
        "q21_asof_join": """
            SELECT c.event_id, c.value AS click_value, e.value AS err_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'error') e
              ON c.user_id = e.user_id AND c.ts >= e.ts
        """,
        "q22_range_join": """
            SELECT p.event_id, COUNT(c.event_id) AS n_clicks
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 10 MINUTE
             AND c.ts <= p.ts
            GROUP BY p.event_id
        """,
        "q23_token_stats": r"""
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_uniq,
                   ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
                         / len(string_split(text, ' ')), 6) AS ttr,
                   len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
            FROM documents
        """,
        "q24_quality_score": """
            WITH x AS (
              SELECT doc_id, n_chars, string_split(text, ' ') AS w
              FROM documents
            ), y AS (
              SELECT doc_id,
                     len(list_filter(w, t -> t IN ('the','a','of','and','to',
                                                   'in','is','it')))::DOUBLE
                       / len(w) AS stop_ratio,
                     len(list_distinct(w))::DOUBLE / len(w) AS ttr,
                     least(n_chars::DOUBLE / 500.0, 1.0) AS length_factor
              FROM x)
            SELECT doc_id, ROUND(stop_ratio, 6) AS stop_ratio,
                   ROUND(ttr, 6) AS ttr,
                   ROUND(0.5 * ttr + 0.3 * (1.0 - stop_ratio)
                         + 0.2 * length_factor, 6) AS score
            FROM y
        """,
        "q25_lang_guess": """
            WITH x AS (
              SELECT ' ' || text || ' ' AS t FROM documents
            )
            SELECT CASE
                     WHEN t LIKE '% der %' OR t LIKE '% und %' THEN 'de'
                     WHEN t LIKE '% el %' OR t LIKE '% la %' THEN 'es'
                     WHEN t LIKE '% the %' OR t LIKE '% a %' THEN 'en'
                     ELSE 'unk' END AS lang_guess,
                   COUNT(*) AS n
            FROM x GROUP BY 1
        """,
        "q26_fingerprint": r"""
            SELECT doc_id,
                   sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                     AS fp
            FROM documents
        """,
        "q27_hash_dedup": """
            SELECT sha256(text) AS h, MIN(doc_id) AS keep_id,
                   COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "q28_ngram_jaccard": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN len(string_split(text, ' ')) < 3 THEN []
                          ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 1),
                            i -> string_split(text, ' ')[i] || ' '
                                 || string_split(text, ' ')[i + 1] || ' '
                                 || string_split(text, ' ')[i + 2]))
                     END AS sh
              FROM documents
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                           / len(list_distinct(list_concat(a.sh, b.sh))), 6)
                       AS j
              FROM d a JOIN d b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, j FROM pairs WHERE j >= 0.3
        """,
        # The LSH pipeline is deterministic (fixed xxhash64 seeds) and its
        # banding parameters give P(miss) < 1e-13 at the planted-pair
        # similarity level, so it verifies against the exact-Jaccard
        # oracle (validated identical at sf0.01).
        "q29_minhash_lsh": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN len(string_split(text, ' ')) < 3 THEN []
                          ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 1),
                            i -> string_split(text, ' ')[i] || ' '
                                 || string_split(text, ' ')[i + 1] || ' '
                                 || string_split(text, ' ')[i + 2]))
                     END AS sh
              FROM documents
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                           / len(list_distinct(list_concat(a.sh, b.sh))), 6)
                       AS j
              FROM d a JOIN d b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, j FROM pairs WHERE j >= 0.3
        """,
        "q31_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT e.vec_id,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[])
                                * list_dot_product(q.qv, q.qv)), 6) AS sim
            FROM embeddings e, q
            WHERE e.vec_id <> 0
            ORDER BY sim DESC, e.vec_id
            LIMIT 10
        """,
        "q32_embedding_neardup": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]) AS nsq
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     ROUND(list_dot_product(a.v, b.v)
                           / sqrt(a.nsq * b.nsq), 6) AS sim
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
            SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= 0.35
        """,
        # IVF probing with nprobe=8/16 returns the exact top-10 at every
        # provided scale factor (validated == brute force at sf0.001/0.01/
        # 0.1), so the brute-force oracle applies while still pruning half
        # the buckets.
        "q33_ivf_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT e.vec_id,
                   ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[])
                                * list_dot_product(q.qv, q.qv)), 6) AS sim
            FROM embeddings e, q
            WHERE e.vec_id <> 0
            ORDER BY sim DESC, e.vec_id
            LIMIT 10
        """,
        "q34_multimodal_meta": """
            SELECT doc_id,
                   octet_length(encode(text)) AS byte_len,
                   octet_length(encode(text)) % 640 AS width,
                   (octet_length(encode(text)) * 7) % 480 AS height
            FROM documents
        """,
        "q35_frame_sample": """
            SELECT doc_id, u AS frame_idx, u * 64 AS frame_byte_offset
            FROM (SELECT doc_id,
                         unnest(range(greatest(
                           octet_length(encode(text)) // 64, 1))) AS u
                  FROM documents)
        """,
        "q37_gap_fill": """
            WITH s AS (
              SELECT event_type AS name,
                     epoch_us(ts) // 1000000 AS es, MAX(value) AS v
              FROM events GROUP BY 1, 2
            ), b AS (
              SELECT name, MIN(es) AS e0, MAX(es) AS e1 FROM s GROUP BY name
            ), g AS (
              SELECT name, unnest(range(e0, e1 + 1, 3600)) AS es FROM b
            )
            SELECT g.name, g.es AS grid_es, s.v AS v_fill
            FROM g ASOF LEFT JOIN s
              ON g.name = s.name AND g.es >= s.es
        """,
        "q38_rate": """
            SELECT event_id,
                   ROUND((value - LAG(value) OVER w)
                         / ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w)
                            / 1000000.0), 6) AS rate
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        """,
        "q39_pivot": """
            SELECT strftime(ts, '%Y-%m-%d') AS d,
                   CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
                     AS click,
                   CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
                     AS view,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
                     AS purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup'
                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
                     AS signup,
                   CAST(SUM(CASE WHEN event_type = 'error'
                       THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
                     AS error
            FROM events GROUP BY 1
        """,
        "q41_rolling_zscore": """
            WITH x AS (
              SELECT event_id, value,
                     COUNT(*) OVER w AS cnt,
                     CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w
                          AS DOUBLE) AS s1,
                     CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER w
                          AS DOUBLE) AS s2
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
            SELECT event_id,
                   CASE WHEN cnt >= 5
                         AND (s2 - s1 * s1 / cnt) / (cnt - 1) > 0
                        THEN ROUND((value - s1 / cnt)
                                   / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)),
                                   6)
                   END AS z
            FROM x
        """,
        "q42_percentiles": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.5), 6) AS p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS p90
            FROM events GROUP BY event_type
        """,
        "q43_daily_users": """
            SELECT strftime(ts, '%Y-%m-%d') AS d,
                   COUNT(DISTINCT user_id) AS users
            FROM events GROUP BY 1
        """,
        "q44_full_outer": """
            SELECT COUNT(*) AS n_rows,
                   COUNT(o.o_orderkey) AS n_orders,
                   COUNT(c.c_custkey) AS n_customers
            FROM orders o FULL OUTER JOIN customer c
              ON o.o_custkey = c.c_custkey
        """,
        "q45_cross_join": """
            SELECT COUNT(*) AS n,
                   CAST(SUM(r_regionkey * n_nationkey) AS BIGINT) AS s
            FROM region CROSS JOIN nation
        """,
        "q46_string_funcs": """
            SELECT p_partkey,
                   UPPER(SUBSTR(p_name, 1, 8)) AS head,
                   REPLACE(p_brand, 'Brand#', 'B') AS brand_s,
                   LENGTH(p_type) AS type_len,
                   CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
                   concat_ws('|', p_brand, p_type) AS tag
            FROM part
        """,
        "q47_date_parts": """
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
                   CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                     AS total
            FROM orders GROUP BY 1, 2
        """,
        "q49_dedup_clusters": """
            WITH RECURSIVE d AS (
              SELECT doc_id,
                     CASE WHEN len(string_split(text, ' ')) < 3 THEN []
                          ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 1),
                            i -> string_split(text, ' ')[i] || ' '
                                 || string_split(text, ' ')[i + 1] || ' '
                                 || string_split(text, ' ')[i + 2]))
                     END AS sh
              FROM documents
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                          / len(list_distinct(list_concat(a.sh, b.sh))), 6)
                    >= 0.3
            ), edges AS (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION
              SELECT doc_b AS a, doc_a AS b FROM pairs
            ), reach AS (
              SELECT DISTINCT a AS n, a AS m FROM edges
              UNION
              SELECT r.n, e.b AS m
              FROM reach r JOIN edges e ON r.m = e.a
            )
            SELECT n AS doc_id, MIN(m) AS cluster_id
            FROM reach GROUP BY n
        """,
        "q50_stratified_sample": """
            SELECT lang, doc_id, rn FROM (
              SELECT lang, doc_id,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS BIGINT) AS rn,
                     CEIL(COUNT(*) OVER (PARTITION BY lang) * 0.2) AS k
              FROM documents) t
            WHERE rn <= k
        """,
        "q51_chunk_docs": """
            WITH w AS (
              SELECT doc_id, str_split(text, ' ') AS ws FROM documents
            ), c AS (
              SELECT doc_id, ws,
                     unnest(generate_series(
                       0, CAST(CEIL(len(ws) / 32.0) AS BIGINT) - 1
                     )) AS chunk_id
              FROM w
            )
            SELECT doc_id, chunk_id,
                   array_to_string(
                     ws[chunk_id * 32 + 1 : (chunk_id + 1) * 32], ' '
                   ) AS chunk_text,
                   len(ws[chunk_id * 32 + 1 : (chunk_id + 1) * 32])
                     AS n_chunk_tokens
            FROM c
        """,
        "q52_pack_sequences": """
            WITH t AS (
              SELECT doc_id, source,
                     CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents
            ), c AS (
              SELECT source, doc_id, n_tok,
                     SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS cum
              FROM t
            )
            SELECT source,
                   CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin_id,
                   COUNT(*) AS n_docs, SUM(n_tok) AS bin_tokens
            FROM c GROUP BY 1, 2
        """,
        "q53_contamination": """
            WITH w AS (
              SELECT doc_id, str_split(text, ' ') AS ws FROM documents
            ), g AS (
              SELECT doc_id, array_to_string(ws[i : i + 2], ' ') AS s
              FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
            ), sh AS (
              SELECT DISTINCT doc_id, s FROM g
            ), ev AS (
              SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
            )
            SELECT t.doc_id, COUNT(*) AS n_common
            FROM sh t JOIN ev USING (s)
            WHERE t.doc_id % 97 != 0
            GROUP BY 1 HAVING COUNT(*) >= 3
        """,
        "q54_label_centroids": """
            WITH flat AS (
              SELECT label,
                     CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                       AS dim,
                     unnest(embedding) AS x
              FROM embeddings
            )
            SELECT label, dim,
                   ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6)))
                              AS DOUBLE) / COUNT(*), 6) AS centroid
            FROM flat GROUP BY 1, 2
        """,
        "q55_vocab_topk": """
            SELECT term, COUNT(*) AS n
            FROM (SELECT unnest(str_split(text, ' ')) AS term
                  FROM documents) t
            GROUP BY 1 ORDER BY n DESC, term LIMIT 100
        """,
        "q56_term_idf": """
            WITH words AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest(str_split(text, ' ')) AS term
                FROM documents) t
            ), df AS (
              SELECT term, COUNT(*) AS df FROM words
              GROUP BY 1 HAVING COUNT(*) >= 5
            )
            SELECT term, df,
                   ROUND(ln(((SELECT COUNT(*) FROM documents) + 1.0)
                            / (df + 1.0)), 6) AS idf
            FROM df
        """,
        "q57_grouping_sets": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        "q58_winnow_fingerprints": """
            WITH w AS (
              SELECT doc_id, str_split(text, ' ') AS ws FROM documents
              WHERE len(str_split(text, ' ')) >= 3
            ), g AS (
              SELECT doc_id, unnest(generate_series(1, len(ws) - 2)) AS i,
                     ws
              FROM w
            ), h AS (
              SELECT doc_id, i,
                     md5(array_to_string(ws[i : i + 2], ' ')) AS h
              FROM g
            ), win AS (
              SELECT doc_id, i,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
              FROM h
            )
            SELECT DISTINCT doc_id, fp FROM win WHERE i >= 4
        """,
        "q59_curate": """
            WITH x AS (
              SELECT doc_id, text, n_chars, string_split(text, ' ') AS w
              FROM documents WHERE lang = 'en'
            ), y AS (
              SELECT doc_id, text,
                     len(list_filter(w, t -> t IN ('the','a','of','and','to',
                                                   'in','is','it')))::DOUBLE
                       / len(w) AS stop_ratio,
                     len(list_distinct(w))::DOUBLE / len(w) AS ttr,
                     least(n_chars::DOUBLE / 500.0, 1.0) AS length_factor
              FROM x
            ), scored AS (
              SELECT doc_id, text
              FROM y
              WHERE ROUND(0.5 * ttr + 0.3 * (1.0 - stop_ratio)
                          + 0.2 * length_factor, 6) >= 0.5
            )
            SELECT MIN(doc_id) AS doc_id FROM scored GROUP BY sha256(text)
        """,
        "q60_cohort_retention": """
            WITH f AS (
              SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_ts
              FROM events GROUP BY 1
            )
            SELECT strftime(f.cohort_ts, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', f.cohort_ts,
                                  date_trunc('day', e.ts)) AS BIGINT)
                     AS day_offset,
                   COUNT(DISTINCT e.user_id) AS users
            FROM events e JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
    }
