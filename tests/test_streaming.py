"""Collector / retention semantics (SURVEY.md §5 item 5): per-source
cadence (reference index.js:238), ingest-time stamping (:250-257),
null-sample drop (:246), failure isolation (:259-263), strict-< retention
cutoff (:273)."""

from __future__ import annotations

import json

import pytest

from timeseries_data_provider_spark.streaming.config import SourceConfig
from timeseries_data_provider_spark.streaming.ingest import (
    MetricsCollector,
    read_metrics,
)
from timeseries_data_provider_spark.streaming.retention import apply_retention


def _collector(spark, tmp_path, sources, responses):
    calls: list[str] = []

    def fetcher(src: SourceConfig) -> str:
        calls.append(src.name)
        body = responses[src.name]
        if isinstance(body, Exception):
            raise body
        return body

    c = MetricsCollector(
        spark, sources, str(tmp_path / "metrics"), fetcher=fetcher
    )
    return c, calls


def test_cadence_and_ingest(spark, tmp_path):
    sources = [
        SourceConfig(name="fast", interval=1, json_path="$.count"),
        SourceConfig(name="slow", interval=5, json_path="$.count"),
        SourceConfig(name="off", active=False, interval=1),
    ]
    responses = {
        "fast": json.dumps({"count": 1.5}),
        "slow": json.dumps({"count": 2.5}),
        "off": json.dumps({"count": 99.0}),
    }
    c, calls = _collector(spark, tmp_path, sources, responses)

    # ticks at t=0..5: fast fires 6x, slow at t=0 and t=5 → 2x, off never
    for t in range(6):
        c.tick(tick_time=1_700_000_000 + t)

    assert calls.count("fast") == 6
    assert calls.count("slow") == 2
    assert calls.count("off") == 0

    df = read_metrics(spark, str(tmp_path / "metrics"))
    got = {
        r["name"]: r["n"]
        for r in df.groupBy("name").count().withColumnRenamed("count", "n").collect()
    }
    assert got == {"fast": 6, "slow": 2}
    # ingest-time stamping: timestamps == tick times
    ts = sorted(
        r["time"].timestamp()
        for r in df.filter("name = 'fast'").select("time").collect()
    )
    assert ts == [1_700_000_000 + t for t in range(6)]


def test_null_sample_dropped_and_failure_isolated(spark, tmp_path):
    sources = [
        SourceConfig(name="ok", interval=1),
        SourceConfig(name="nullv", interval=1),  # body lacks the path
        SourceConfig(name="boom", interval=1),  # fetch raises
    ]
    responses = {
        "ok": json.dumps({"count": 7.0}),
        "nullv": json.dumps({"other": 1}),
        "boom": RuntimeError("connection refused"),
    }
    c, _ = _collector(spark, tmp_path, sources, responses)
    written = c.tick(tick_time=1_700_000_000)
    assert written == 1  # only 'ok'; null dropped, failure isolated
    df = read_metrics(spark, str(tmp_path / "metrics"))
    assert [r["name"] for r in df.collect()] == ["ok"]


def test_custom_transform(spark, tmp_path):
    src = SourceConfig(
        name="csv", interval=1, transform=lambda body: float(body.split(",")[1])
    )
    c, _ = _collector(spark, tmp_path, [src], {"csv": "a,3.25,b"})
    c.tick(tick_time=1_700_000_000)
    df = read_metrics(spark, str(tmp_path / "metrics"))
    assert df.collect()[0]["value"] == 3.25


def test_retention_strict_cutoff(spark, tmp_path):
    src = SourceConfig(name="s", interval=1)
    now = 1_700_000_000
    responses = {"s": json.dumps({"count": 1.0})}
    c, _ = _collector(spark, tmp_path, [src], responses)
    for t in range(5):
        c.tick(tick_time=now + t)
    path = str(tmp_path / "metrics")
    # cutoff lands exactly ON the t=+2 sample: strict < keeps it
    survivors = apply_retention(
        spark, path, "s", age_seconds=2, now_epoch=now + 4
    )
    assert survivors == 3  # t=+2, +3, +4 survive; +0, +1 deleted
    df = read_metrics(spark, path)
    ts = sorted(r["time"].timestamp() for r in df.collect())
    assert ts == [now + 2, now + 3, now + 4]


def test_retention_via_scheduler(spark, tmp_path):
    src = SourceConfig(
        name="s", interval=1, remove_interval=3, remove_age=2
    )
    now = 1_700_000_000
    c, _ = _collector(spark, tmp_path, [src], {"s": json.dumps({"count": 1.0})})
    # t=0: collect + retention both fire (lastRemove=0 epoch)
    for t in range(7):
        c.tick(tick_time=now + t)
    df = read_metrics(spark, str(tmp_path / "metrics"))
    ts = sorted(r["time"].timestamp() for r in df.collect())
    # retention last fired at t=+6 with age=2 → strict <, +4 survives
    assert ts[0] >= now + 4
    assert ts[-1] == now + 6


def test_streaming_smoke(spark, tmp_path):
    """Real Structured Streaming run: rate source, 1s trigger."""
    import time

    src = SourceConfig(name="live", interval=1)
    c, _ = _collector(spark, tmp_path, [src], {"live": json.dumps({"count": 5.0})})
    q = c.run_streaming(
        trigger_seconds=1, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            try:
                if read_metrics(spark, str(tmp_path / "metrics")).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    assert read_metrics(spark, str(tmp_path / "metrics")).count() >= 2


def test_collector_replay_matches_hand_trace(spark, tmp_path):
    """The declared q65 replay (streaming/ingest.collector_replay):
    hand-computed per-source expectations for the 60-tick trace —
    cadence, null-guard slot consumption, failure-isolation slot
    consumption, inactive/zero-interval exclusion, ingest stamps."""
    from timeseries_data_provider_spark.streaming.ingest import (
        collector_replay,
    )

    out = {
        r["name"]: r.asDict()
        for r in collector_replay(
            spark,
            n_ticks=60,
            base_epoch=1_000_000_000,
            table_path=str(tmp_path / "replay"),
        ).collect()
    }
    # x (inactive) and z (interval 0) never write
    assert set(out) == {"a", "b", "c", "d", "e"}

    def expect(ord_, step):
        fires = [i for i in range(60) if i % step == 0]
        return {
            "n_points": len(fires),
            "sum_value": sum(ord_ * 100 + i for i in fires),
            "first_ms": 1_000_000_000_000,
            "last_ms": (1_000_000_000 + fires[-1]) * 1000,
        }

    # a/b/c plain cadence; d fires i%4 but only even fires have the
    # key (rows i%8); e fires i%6 but odd fires raise (rows i%12)
    for name, ord_, step in [
        ("a", 1, 2), ("b", 2, 3), ("c", 3, 5), ("d", 4, 8), ("e", 5, 12)
    ]:
        want = expect(ord_, step)
        got = {k: out[name][k] for k in want}
        assert got == want, (name, got, want)


def test_corpus_ingest_stream_incremental_dedup(spark, tmp_path):
    """File-source corpus ingestion: two waves of JSON document files
    through ingest_documents_stream — wave 2 contains an exact copy of
    a wave-1 doc (must be dropped via the SIGNATURE INDEX, the settled
    text is never re-read) and an in-batch twin pair (lower id kept).
    The signature index grows by exactly the accepted docs, so wave 3
    would see waves 1+2 as corpus."""
    import json as _json

    from timeseries_data_provider_spark.streaming.corpus_ingest import (
        ingest_documents_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    root = str(tmp_path / "corpus")

    def write_wave(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight nine"
    t_c = "red orange yellow green blue indigo violet and more"
    write_wave("wave1.json", [(1, t_a), (2, t_b)])

    q = ingest_documents_stream(spark, str(src), root, min_est=1.0)
    try:
        q.processAllAvailable()
        # wave 2: 3 = copy of doc 1 (corpus dup), 4/5 = in-batch twins,
        # 6 = fresh
        write_wave("wave2.json", [(3, t_a), (4, t_c), (5, t_c), (6, t_b + " extra")])
        q.processAllAvailable()
    finally:
        q.stop()

    docs = {
        r["doc_id"] for r in spark.read.parquet(root + "/docs").collect()
    }
    assert docs == {1, 2, 4, 6}, docs  # 3 (corpus dup) and 5 (twin) dropped
    sigs = spark.read.parquet(root + "/signatures")
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == docs
    dups = spark.read.parquet(root + "/dups").collect()
    got = {(r["doc_a"], r["doc_b"], r["source"]) for r in dups}
    assert (1, 3, "corpus") in got, got
    assert (4, 5, "batch") in got, got
    for r in dups:
        assert r["est_jaccard"] == 1.0


def test_corpus_ingest_stream_maintains_window_index(spark, tmp_path):
    """substr_k wires incremental SUBSTRING dedup into the same loop:
    a wave-2 doc repeating a settled wave-1 paragraph is flagged with
    the exact span via the persisted WINDOW INDEX (settled text never
    re-read), and the index grows by exactly the accepted docs' new
    windows so wave 3 would see waves 1+2."""
    import json as _json

    from timeseries_data_provider_spark.streaming.corpus_ingest import (
        ingest_documents_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    root = str(tmp_path / "corpus")

    def write_wave(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    para = "tpl0 tpl1 tpl2 tpl3 tpl4"
    write_wave("wave1.json", [(1, f"{para} tail1"), (2, "u0 u1 u2 u3 u4 u5")])
    q = ingest_documents_stream(
        spark, str(src), root, min_est=1.0, substr_k=3
    )
    try:
        q.processAllAvailable()
        # doc 10 repeats the settled paragraph mid-text; doc 11 fresh
        write_wave(
            "wave2.json",
            [(10, f"x10 {para} y10"), (11, "v0 v1 v2 v3 v4 v5")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    spans = spark.read.parquet(root + "/substr_spans").collect()
    # wave 1 lands on an empty index: no spans; wave 2: doc 10's
    # paragraph at tokens 2-6
    assert [
        (r["doc_id"], r["start_tok"], r["end_tok"], r["batch_id"])
        for r in spans
    ] == [(10, 2, 6, 1)]
    # window index covers every accepted doc's distinct 3-gram windows
    idx = spark.read.parquet(root + "/windows")
    n_windows = idx.count()
    assert idx.select("w").distinct().count() == n_windows  # no dupes
    texts = {
        1: f"{para} tail1",
        2: "u0 u1 u2 u3 u4 u5",
        10: f"x10 {para} y10",
        11: "v0 v1 v2 v3 v4 v5",
    }
    want = set()
    for t in texts.values():
        ws = t.split(" ")
        for p in range(len(ws) - 2):
            want.add(" ".join(ws[p : p + 3]))
    assert {r["w"] for r in idx.collect()} == want


def test_ensure_window_index_backfills_from_settled_docs(spark, tmp_path):
    """Enabling substr_k on a corpus ingested BEFORE the feature must
    backfill the window index from the settled documents, not
    bootstrap empty (review finding: pre-existing docs were silently
    never span-checked)."""
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.streaming.corpus_ingest import (
        ensure_window_index,
    )

    root = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    ).withColumn("batch_id", F.lit(0)).write.parquet(root + "/docs")
    ensure_window_index(spark, root, k=3)
    idx = {
        r["w"] for r in spark.read.parquet(root + "/windows").collect()
    }
    assert idx == {"a b c", "b c d", "e f g", "f g h"}


def test_ensure_signature_index_refuses_to_overwrite_unreadable(
    spark, tmp_path
):
    """A transient/corrupt read of the signature index must RAISE, not
    silently bootstrap an empty index over the settled corpus's dedup
    state."""
    import pytest as _pytest

    from timeseries_data_provider_spark.streaming.corpus_ingest import (
        ensure_signature_index,
    )

    root = tmp_path / "corpus"
    root.mkdir()
    sig = root / "signatures"
    sig.mkdir()
    (sig / "part-00000.parquet").write_bytes(b"not a parquet file")
    with _pytest.raises(Exception):
        ensure_signature_index(spark, str(root))
    # the garbage file is untouched — nothing overwrote it
    assert (sig / "part-00000.parquet").read_bytes() == b"not a parquet file"


def test_retrofit_pre_feature_window_index_mixed_schema(spark, tmp_path):
    """A windows index built by pre-batch-stamp code (column ``w``
    only) keeps correct settled semantics once stamped appends land
    beside it (review finding: a plain read inferred the schema from
    ONE arbitrary file — old-file inference let a replay see its own
    windows as settled, new-file inference read every pre-feature
    window as null and silently dropped the settled corpus from span
    detection). The merged read + coalesce must (a) detect a batch
    doc repeating a PRE-FEATURE settled paragraph, (b) stay
    replay-safe, and (c) converge to one schema after reconcile."""
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.streaming import (
        corpus_ingest as ci,
    )

    root = str(tmp_path / "corpus")
    para = "tpl0 tpl1 tpl2 tpl3 tpl4"
    # pre-feature root: docs + a w-ONLY window index (what r8's loop
    # wrote), signatures bootstrapped empty
    ci.ensure_signature_index(spark, root)
    spark.createDataFrame(
        [(1, f"{para} tail1")], "doc_id long, text string"
    ).withColumn("batch_id", F.lit(0)).write.parquet(root + "/docs")
    from timeseries_data_provider_spark.operators.dedup import (
        substring_window_index,
    )

    substring_window_index(
        spark.read.parquet(root + "/docs"), k=3
    ).write.parquet(root + "/windows")
    assert spark.read.parquet(root + "/windows").columns == ["w"]

    # batch 5: doc 10 repeats the PRE-FEATURE settled paragraph; its
    # append stamps batch_id -> the directory now mixes schemas
    b = spark.createDataFrame(
        [(10, f"x10 {para} y10")], ci.DOC_SCHEMA
    )
    ci.process_corpus_batch(spark, b, 5, root, min_est=1.0, substr_k=3)
    spans = spark.read.parquet(root + "/substr_spans").collect()
    assert [
        (r["doc_id"], r["start_tok"], r["end_tok"]) for r in spans
    ] == [(10, 2, 6)]

    # replay of batch 5 on the mixed directory: its own windows must
    # NOT count as settled (no spurious full-coverage span), and the
    # pre-feature windows must still be seen
    ci.process_corpus_batch(spark, b, 5, root, min_est=1.0, substr_k=3)
    replay_spans = spark.read.parquet(root + "/substr_spans").collect()
    assert {
        (r["doc_id"], r["start_tok"], r["end_tok"]) for r in replay_spans
    } == {(10, 2, 6)}

    # reconcile converges the index to ONE schema: every file carries
    # batch_id, pre-feature rows stamped settled-before-everything
    ci.reconcile_ingest_root(spark, root)
    idx = spark.read.parquet(root + "/windows")
    assert set(idx.columns) == {"w", "batch_id"}
    rows = idx.collect()
    assert all(r["batch_id"] is not None for r in rows)
    assert {r["batch_id"] for r in rows} == {-1, 5}
    # and a second reconcile is a no-op (no needs_stamp retrigger)
    again = ci.reconcile_ingest_root(spark, root)
    assert all(v["before"] == v["after"] for v in again.values())


def test_source_config_extract_supports_array_paths():
    """extract() implements the documented get_json_object subset —
    array indexing included (review finding: the old dict-only walk
    silently dropped every sample for '$.data[0].count'-style paths
    that the batch json_scalar path serves fine)."""
    from timeseries_data_provider_spark.streaming.config import SourceConfig

    c = SourceConfig(
        name="x", interval=1, url="http://x", json_path="$.data[0].count"
    )
    assert c.extract('{"data": [{"count": 7}]}') == 7.0
    assert c.extract('{"data": []}') is None  # out-of-range -> null guard
    assert c.extract('{"error": "boom"}') is None
    plain = SourceConfig(name="y", interval=1, url="http://y")
    assert plain.extract('{"count": 3.5}') == 3.5


def test_reconcile_ingest_root_heals_every_crash_gap(spark, tmp_path):
    """The at-least-once recovery loop, proven end-to-end: for EVERY
    gap between the five per-batch appends (after spans, windows,
    docs, signatures), a batch that crashes in that gap and is then
    replayed (same batch + batch_id — exactly what the streaming
    checkpoint re-offers on restart), followed by
    reconcile_ingest_root, yields a root IDENTICAL to the no-crash
    control run — and a second reconcile pass is a no-op."""
    from timeseries_data_provider_spark.streaming import (
        corpus_ingest as ci,
    )

    para = "tpl0 tpl1 tpl2 tpl3 tpl4"
    wave1 = [(1, f"{para} tail1"), (2, "u0 u1 u2 u3 u4 u5")]
    # 3 = exact copy of settled doc 1 (corpus dup, dropped); 10
    # repeats the settled paragraph (span evidence); 11 fresh
    wave2 = [
        (3, f"{para} tail1"),
        (10, f"x10 {para} y10"),
        (11, "v0 v1 v2 v3 v4 v5"),
    ]
    kw = dict(min_est=1.0, substr_k=3)

    def run(root, gap):
        ci.ensure_signature_index(spark, root)
        ci.ensure_window_index(spark, root, k=3)
        b0 = spark.createDataFrame(wave1, ci.DOC_SCHEMA)
        b1 = spark.createDataFrame(wave2, ci.DOC_SCHEMA)
        ci.process_corpus_batch(spark, b0, 0, root, **kw)
        if gap is not None:
            with pytest.raises(ci._InjectedCrash):
                ci.process_corpus_batch(
                    spark, b1, 1, root, _fail_after=gap, **kw
                )
        ci.process_corpus_batch(spark, b1, 1, root, **kw)
        return root

    def snap(root):
        out = {}
        for name in [
            "docs", "signatures", "windows", "substr_spans", "dups",
        ]:
            df = spark.read.parquet(f"{root}/{name}")
            out[name] = sorted(tuple(r) for r in df.collect())
        return out

    control = snap(run(str(tmp_path / "control"), None))
    # sanity on the control itself: doc 3 dropped, doc 10's span found
    assert [t[0] for t in control["docs"]] == [1, 2, 10, 11]
    assert [(t[0], t[2], t[3]) for t in control["substr_spans"]] == [
        (10, 2, 6)
    ]

    for gap in ["spans", "windows", "docs", "signatures"]:
        root = run(str(tmp_path / f"crash_{gap}"), gap)
        ci.reconcile_ingest_root(spark, root)
        assert snap(root) == control, f"gap={gap}"
        again = ci.reconcile_ingest_root(spark, root)
        assert all(
            v["before"] == v["after"] for v in again.values()
        ), (gap, again)
