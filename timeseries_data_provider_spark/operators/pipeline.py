"""[EXT] Training-data pipeline operators: stratified sampling,
token-based chunking, greedy sequence packing, and train/eval
contamination detection.

These are the dataset-construction steps that sit between raw document
tables and a tokenized training mix (SURVEY.md §2.1 [EXT]); none exist
in the reference (it stores scalar time series only) but they are
first-class for the 100 TB design point.

Scale design:
- Everything is built-in column expressions + window/agg — no Python
  UDFs, so the operators stay in whole-stage codegen.
- Stratified sampling shuffles once on the stratum key; the per-stratum
  order is a deterministic hash, so resampling is reproducible across
  runs, partitionings, and cluster sizes (no rand()).
- Chunking is a per-row explode (no shuffle at all).
- Packing shuffles once on the pack key (`source`) — the window's sort
  is per-partition, which is exactly the "concat then split within a
  shard" semantics real tokenizer-packing jobs use.
- Contamination joins the train-side shingles against the (much
  smaller) distinct eval-side shingle set; at scale that right side is
  broadcastable and the join never materializes a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators.dedup import (
    shingles_exploded,
    shingles_raw,
)


def tokens(text_col: str) -> Column:
    """Whitespace tokenization that is safe on real input: split on
    whitespace RUNS, then drop empty tokens (a leading space or an
    empty string otherwise yields ``""`` entries). Empty text → empty
    array, not ``[""]``.

    The whitespace class is EXPLICIT (space/tab/LF/VT/FF/CR) rather
    than ``\\s``: Java ``\\s`` and RE2/DuckDB ``\\s`` disagree on
    vertical tab, and the q51 oracle must split identically — same
    character set both sides, declared byte for byte."""
    return F.array_remove(
        F.split(F.col(text_col), "[ \\t\\n\\x0B\\f\\r]+"), ""
    )


def stratified_sample(
    documents: DataFrame,
    strata_col: str = "lang",
    fraction: float = 0.2,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Proportional stratified sample: ceil(fraction * |stratum|) rows
    per stratum, picked by a deterministic hash order (md5 of the id) so
    the sample is stable across runs and partitionings — the standard
    way to build a class-balanced eval slice or a downsampled mix
    without rand()'s irreproducibility.

    One shuffle (window partition on the stratum); returns
    (strata, doc_id, rn) with rn = 1..k within the stratum.

    ``seed`` prefixes the hashed key: different seeds draw
    independent-looking samples (epoch 2 of a training mix, an A/B
    holdout re-draw) while staying fully deterministic; the default ""
    reproduces the historical draw.
    """
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(key, id_col)
    k = F.ceil(
        F.count(F.lit(1)).over(Window.partitionBy(strata_col)) * F.lit(fraction)
    )
    return (
        documents.select(
            strata_col,
            id_col,
            F.row_number().over(w).cast("long").alias("rn"),
            k.alias("__k"),
        )
        .filter(F.col("rn") <= F.col("__k"))
        .drop("__k")
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 32,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into fixed-size token chunks (whitespace
    tokens; the BPE stand-in used across the text operators). The
    context-window chunking step of a training pipeline: one row per
    (doc, chunk) with the chunk text and its token count; the last chunk
    is the remainder.

    Pure per-row explode — no shuffle; scales linearly with corpus
    size. ``keep_cols`` are passed through onto every chunk row (e.g.
    the pack key), so downstream steps never join back to the source
    table.

    Tokenization splits on whitespace RUNS and drops empty tokens
    (``tokens``): a plain single-space split turns the empty string
    into one phantom token and each extra space in a run into another,
    silently miscounting tokens and mispacking bins on real corpora
    (VERDICT r3 finding 1). Documents with zero tokens produce zero
    chunk rows.
    """
    c = chunk_tokens
    keep = list(keep_cols)
    n_chunks = F.ceil(F.size("__ws") / F.lit(float(c))).cast("int")
    piece = F.slice(F.col("__ws"), F.col("chunk_id") * c + 1, c)
    # explode(when(...)) — a null array explodes to no rows, so empty
    # documents vanish instead of hitting sequence(0, -1) (which would
    # count DOWN and emit two bogus chunks).
    chunk_ids = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1))
    return (
        documents.select("doc_id", *keep, tokens(text_col).alias("__ws"))
        .select(
            "doc_id",
            *keep,
            "__ws",
            F.explode(chunk_ids).alias("chunk_id"),
        )
        .select(
            "doc_id",
            *keep,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", piece).alias("chunk_text"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = 512,
    pack_col: str = "source",
    text_col: str = "text",
    counter=None,
) -> DataFrame:
    """Greedy sequential packing of documents into token-budget bins
    within each pack key: docs are laid out in id order and a new bin
    starts whenever the running token total crosses the budget — the
    "concatenate then split every N tokens" semantics of real
    sequence-packing jobs, expressed as one running-sum window.

    Returns per-bin stats (source, bin_id, n_docs, bin_tokens). One
    shuffle on the pack key; the per-key sort is Spark's standard
    window sort and spills if a key outgrows memory.

    ``counter``: optional callable mapping the text column name to a
    token-count Column — training budgets are BPE-denominated, so
    ``bpe.counter(merges)`` makes the bins real-token-accurate
    (VERDICT r6 item 3); the default stays the zero-UDF whitespace
    count.
    """
    n_tok = (
        F.size(tokens(text_col)).cast("long")
        if counter is None
        else counter(text_col).cast("long")
    )
    w = (
        Window.partitionBy(pack_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("__n_tok").over(w)
    return (
        documents.select(pack_col, "doc_id", n_tok.alias("__n_tok"))
        .select(
            pack_col,
            "doc_id",
            "__n_tok",
            F.floor((cum - F.col("__n_tok")) / F.lit(float(budget)))
            .cast("long")
            .alias("bin_id"),
        )
        .groupBy(pack_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tok").alias("bin_tokens"),
        )
    )


def chunk_and_pack(
    documents: DataFrame,
    chunk_tokens: int = 32,
    budget: int = 512,
    pack_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Chunk → pack composed: split every document into
    ``chunk_tokens``-token chunks (``chunk_documents``), then greedily
    pack the chunks into ``budget``-token bins per ``pack_col`` shard
    (``pack_sequences`` semantics over chunk rows, ordered by
    (doc_id, chunk_id)) — the two dataset-construction steps a
    tokenizer-packing job runs back to back, as one declarative plan.

    The pack key rides through the chunk explode (``keep_cols``), so
    there is NO join back to the source table: one scan, one explode,
    one shuffle (the window partition on the pack key). Returns
    (source, bin_id, n_chunks, bin_tokens).
    """
    chunks = chunk_documents(
        documents, chunk_tokens, text_col, keep_cols=(pack_col,)
    )
    w = (
        Window.partitionBy(pack_col)
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chunk_tokens").over(w)
    return (
        chunks.select(
            pack_col,
            "n_chunk_tokens",
            F.floor((cum - F.col("n_chunk_tokens")) / F.lit(float(budget)))
            .cast("long")
            .alias("bin_id"),
        )
        .groupBy(pack_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("bin_tokens"),
        )
    )


def ngram_contamination(
    documents: DataFrame,
    eval_mod: int = 97,
    n: int = 3,
    min_common: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval contamination detection by n-gram overlap: a train
    document is flagged when it shares at least ``min_common`` distinct
    word n-grams with the eval split (here: doc_id % eval_mod == 0, a
    deterministic holdout). This is the benchmark-decontamination step
    (n-gram collision style) every serious training pipeline runs.

    Plan shape: RAW shingle explode (no shuffle) → broadcast probe
    against the distinct eval shingle set → distinct-count only the
    MATCHED pairs. The eval set is an eval *benchmark* — tiny relative
    to the corpus by construction — so it is broadcast by default, and
    deduping after the probe means the sole train-side shuffle carries
    only shingles that actually collide with the holdout (usually a
    sliver of the corpus) instead of every (doc, shingle) pair
    (measured 64× sf0.1, where replication inflates collisions to most
    of the corpus: 21.3 s sort-merge → 11.1 s broadcast → 7.2 s with
    late dedup; the gap widens as the true collision fraction drops).
    Set broadcast_eval=False only if the holdout is itself huge.
    """
    ev = (
        shingles_exploded(documents.filter(F.col("doc_id") % eval_mod == 0), n)
        .select("s")
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        shingles_raw(documents.filter(F.col("doc_id") % eval_mod != 0), n)
        .join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("s")).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def build_bloom(
    keys: DataFrame,
    key_col: str = "s",
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> tuple[DataFrame, int, int]:
    """Distributed Bloom-filter build over a key column, entirely in
    DataFrame ops (Spark's internal bloom_filter_agg expression is not
    in the public function registry): k = m/n·ln2 hash probes per key
    (seeded xxhash64 mod m), bit positions OR-combined per 64-bit word
    (one hash-agg), then assembled into a single row holding the
    bitset as array<long> — ~1.2 bits/item·log2(1/p), so a filter over
    100M eval shingles at 1% fpp is ~170 MB where the equivalent
    broadcast hash relation would be several GB. Returns
    (one-row DataFrame with column ``bf``, num_bits, k).
    """
    import math

    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected_items * math.log(2)))
    n_words = (m + 63) // 64
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(m))
                for i in range(k)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.expr("cast(pos div 64 as long)").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("w"))
    )
    # assemble the dense bitset: missing words are zero
    spark = keys.sparkSession
    full = (
        spark.range(n_words)
        .withColumnRenamed("id", "word_idx")
        .join(words, "word_idx", "left")
        .select("word_idx", F.coalesce("w", F.lit(0)).alias("w"))
    )
    bf = full.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("word_idx", "w"))
            ),
            lambda s: s["w"],
        ).alias("bf")
    )
    return bf, m, k


def bloom_might_contain(
    m: int, k: int, key_col: str = "s", bf_col: str = "bf"
) -> Column:
    """Membership predicate for a ``build_bloom`` bitset: AND over the
    k seeded probes of 'bit set in word' (``bit_get`` — both args are
    columns, no literal-only shift limits). Pure JVM expressions —
    runs inside the scan's filter after the one-row bitset is
    broadcast."""
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(m))
        word = F.element_at(
            F.col(bf_col), F.floor(pos / F.lit(64)).cast("int") + F.lit(1)
        )
        cond = cond & (F.bit_get(word, F.pmod(pos, F.lit(64))) == 1)
    return cond


def ngram_contamination_bloom(
    documents: DataFrame,
    eval_mod: int = 97,
    n: int = 3,
    min_common: int = 3,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """``ngram_contamination`` with a Bloom-filter prefilter — the
    shape for when the eval shingle set outgrows a broadcast HASH
    table: the bitset costs ~10 bits/item at 1% fpp (vs tens of BYTES
    per item for the hash relation), so 100×-bigger holdouts still
    broadcast. Plan: distributed bloom build over the eval shingles
    (``build_bloom``) → one-row bitset broadcast-crossed onto the
    train shingles → JVM membership predicate prefilter → the exact
    broadcast join + distinct-count runs ONLY on the surviving sliver,
    so Bloom false positives cannot reach the result: output is
    row-identical to the exact form (pinned in
    tests/test_pipeline_ops.py).

    Choose this for broadcast SIZE, not local speed (measured,
    BASELINE.md §C): when collisions are pervasive the probe pays on
    every shingle and removes nothing (64×-replicated corpus: 32.0 s
    vs the exact form's 22.4 s), and at broadcast-hash-friendly
    holdout sizes the exact form is already fast (low-collision 320k
    corpus: 2.12 s vs 2.39 s — a wash). The regime this exists for is
    a holdout too big for a broadcast hash relation at all.
    """
    # Materialize the distinct eval shingles ONCE: both the bloom
    # build and the exact verify join consume them, and without the
    # checkpoint the eval docs would be scanned and re-shingled twice
    # (the exact form this prefilter claims to improve on scans once).
    # eager=False: construction stays side-effect-free (.explain() /
    # conditional building run no jobs); the checkpoint materializes
    # on the first action and is reused by the second consumer.
    ev_sh = (
        shingles_exploded(
            documents.filter(F.col("doc_id") % eval_mod == 0), n
        )
        .select("s")
        .distinct()
        .localCheckpoint(eager=False)
    )
    bf, m, k = build_bloom(ev_sh, "s", expected_items, fpp)
    train = shingles_raw(
        documents.filter(F.col("doc_id") % eval_mod != 0), n
    )
    prefiltered = (
        train.join(F.broadcast(bf))
        .filter(bloom_might_contain(m, k))
        .drop("bf")
    )
    ev = F.broadcast(ev_sh)
    return (
        prefiltered.join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("s")).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def curate(
    documents: DataFrame,
    lang: str = "en",
    min_score: float = 0.5,
) -> DataFrame:
    """End-to-end corpus curation in one declarative plan: language
    filter → quality gate (operators/text.quality_score) → exact-dedup
    keep rule (minimum doc_id per sha256 content hash). This is the
    composed form of the pipeline a training-data run executes; as one
    DataFrame expression Catalyst fuses the filters into the scan and
    the dedup is the only shuffle.
    """
    from timeseries_data_provider_spark.operators.text import quality_score

    filtered = documents.filter(F.col("lang") == lang)
    scored = quality_score(filtered).filter(F.col("score") >= min_score)
    kept = (
        filtered.join(scored.select("doc_id"), "doc_id")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return kept


def hash_split(
    documents: DataFrame,
    id_col: str = "doc_id",
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 8 hex chars
    of md5(id) are uniform over the 32-bit hex space, so comparing them
    LEXICOGRAPHICALLY against precomputed hex thresholds partitions the
    corpus into the requested fractions — stable across runs, cluster
    sizes, and engines (no rand(), no engine-specific integer hash; the
    same comparison reproduces in any SQL dialect).

    A pure per-row map: zero shuffle, trivially linear at 100 TB.
    Fractions must sum to 1; the last split takes the remainder.
    """
    total = sum(frac for _, frac in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        thr = format(int(cum * 16**8), "08x")
        cond = key < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        expr.otherwise(splits[-1][0])
        if expr is not None
        else F.lit(splits[-1][0])
    )
    return documents.select(id_col, expr.alias("split"))


def weighted_sample(
    documents: DataFrame,
    weight_col: str,
    k: int = 100,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets key = u^(1/w) with u a
    uniform derived from md5(id) (the same no-rand() determinism as
    stratified_sample/hash_split — reproducible across runs, cluster
    sizes, and engines), and the k largest keys are the sample. This
    is the quality-weighted mix sampler of a training pipeline
    ("sample documents proportional to score"): inclusion probability
    scales with w, heavier documents win ties against lighter ones in
    expectation, and the exact selection is replayable from ids alone.

    Nonpositive weights are excluded (standard A-ES domain). The plan
    is a TakeOrderedAndProject — distributed partial top-k per
    partition, k rows per partition to the driver — so it scales like
    any top-k, with no global sort and no shuffle of the full table.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        documents.filter(F.col(weight_col) > 0)
        .select(id_col, weight_col, key.alias("__key"))
        .orderBy(F.col("__key").desc(), id_col)
        .limit(k)
        .select(id_col, weight_col)
    )


def shard_assignment(
    id_col: str = "doc_id", n_shards: int = 256
) -> Column:
    """Deterministic shard id for a row: pmod(xxhash64(id), n_shards).
    A pure function of the id — independent of cluster size, task
    layout, and input partitioning — so shard membership is replayable
    and a re-run of the writer produces the identical layout."""
    return F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Materialize a training corpus as a FIXED-shard-count layout:
    ``<path>/data/shard=K/`` parquet (one file per shard) plus a
    ``<path>/manifest`` table of per-shard row counts and id ranges.
    This is the output stage of a 100 TB dataset build — downstream
    trainers want a stable, enumerable shard list with deterministic
    membership (resumable jobs re-derive which shard holds a doc from
    its id alone), not whatever file count the final stage's task
    layout happened to produce.

    Plan: one shuffle — repartition on the shard column to exactly
    ``n_shards`` tasks, rows sorted by id within each shard (parquet
    min/max stats stay tight for id-range readers), partitionBy-shard
    write. Hash-partitioning on the shard value means a task can hold
    several shard values (and some none); partitionBy still routes
    rows to the right directory, and each directory's rows all live in
    the one task that owned that shard value — so exactly one file per
    non-empty shard, verified by the manifest step. The manifest is
    computed by READING BACK the written layout (counts what actually
    landed, not what was intended) and is returned for caller-side
    verification against the input."""
    spark = df.sparkSession
    # plan-embedded guard (same pattern as similarity._dim_checked): a
    # NULL id has no defined shard — xxhash64(NULL) would silently
    # route the row to a NULL partition directory.
    chk = F.assert_true(
        F.col(id_col).isNotNull(),
        F.lit(
            f"write_training_shards: NULL {id_col!r} — shard membership "
            "is a pure id function and undefined for NULL"
        ),
    )
    if df.isEmpty():
        # an empty write leaves only _SUCCESS under data/, and the
        # manifest's read-back would then die on schema inference —
        # an obscure error long after the real cause (review finding).
        # A fully-filtered corpus is a real upstream outcome; fail it
        # loudly at the source.
        raise ValueError(
            "write_training_shards: input has no rows — refusing to "
            "write an empty shard layout (an upstream filter removed "
            "the whole corpus?)"
        )
    sharded = df.where(chk.isNull()).withColumn(
        "shard", shard_assignment(id_col, n_shards)
    )
    # within-shard order: id ASC by default (tight parquet min/max
    # for id-range readers); with ``shuffle_seed`` set, a
    # DETERMINISTIC pseudo-random training order instead —
    # xxhash64(seed, id) is a pure id function, so re-running the
    # write (or re-deriving position for a resume) reproduces the
    # exact same order, unlike rand()-based shuffles whose order
    # depends on task layout. Global shuffling at the reader is the
    # alternative; baking it into the layout means a plain sequential
    # shard read IS the shuffled epoch.
    if shuffle_seed is None:
        order_cols = [F.col(id_col)]
    else:
        order_cols = [
            F.xxhash64(F.lit(int(shuffle_seed)), F.col(id_col)),
            F.col(id_col),
        ]
    # "shard" leads the sort so the partitionBy writer's required
    # ordering (partition columns first) is already satisfied —
    # otherwise Spark inserts its own SortExec(shard) and the
    # optimizer ELIMINATES this one, silently discarding the
    # training order (found by the shuffled-order test)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(F.col("shard"), *order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path + "/data")
    )
    manifest = (
        spark.read.parquet(path + "/data")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/manifest")
    return spark.read.parquet(path + "/manifest")


def group_split(
    documents: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the SAME md5
    hex-threshold rule as ``hash_split``, but keyed on a GROUP column
    (source domain, site, author) instead of the row id — every row of
    a group lands in the same split, so near-duplicate pages from one
    domain can never straddle the train/test boundary and leak eval
    content into training. The standard contamination defence when
    row-level splitting is too fine.

    Same properties as hash_split: pure per-row map (zero shuffle,
    linear at 100 TB), engine-portable (lexicographic hex compare —
    no rand(), no engine-specific hash), fractions apply to the GROUP
    population (a heavy group tilts realized row fractions — inherent
    to group-level splitting, not a defect). Returns
    (id_col, group_col, split).
    """
    # NULL-safe key (review finding: a plain equi-join on the group
    # column silently DROPS rows whose group is NULL — they would land
    # in no split at all). NULL groups map to a sentinel that cannot
    # collide with a real value (strings never contain \x00), get a
    # deterministic split like any other group, and the original NULL
    # is preserved in the output column.
    gkey = F.coalesce(
        F.col(group_col).cast("string"), F.lit("\x00<null-group>")
    )
    assigned = hash_split(
        documents.select(gkey.alias("__g")).distinct(),
        id_col="__g",
        splits=splits,
    )
    # broadcast: distinct groups are a dimension-sized set (domains,
    # sources), never corpus-sized.
    return documents.select(id_col, group_col, gkey.alias("__g")).join(
        F.broadcast(assigned),
        "__g",
    ).select(id_col, group_col, "split")


def mixture_sample(
    documents: DataFrame,
    weights: dict,
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic data-mixture sampling: draw a corpus of ``total``
    rows matching caller-specified per-group proportions (the "20%
    code, 30% web, 50% books" knob of a training-data recipe). Each
    group's quota is floor(weight/sum(weights) * total), capped at the
    group's population; within a group, rows are picked by the same
    md5(id) order as stratified_sample, so the draw is replayable from
    ids alone and stable across runs, partitionings, and engines.

    Groups absent from ``weights`` (or with weight 0) contribute
    nothing. Quotas are plan-time literals (weights is driver-side
    config, like every mixture recipe); the per-group pick is ONE
    window shuffle partitioned by group — identical shape to
    stratified_sample, linear in corpus size at 100 TB.

    Returns (group_col, doc_id, rn) with rn = 1..quota within the
    group — the same contract as stratified_sample with the quota rule
    swapped from proportional to recipe-driven.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    bad = {g: w for g, w in weights.items() if w < 0}
    if bad:
        # a negative weight would inflate OTHER groups' quotas past
        # `total` (it shrinks wsum while their numerators stand)
        raise ValueError(f"mixture weights must be >= 0, got {bad}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("mixture weights must sum to > 0")
    quota = F.create_map(
        *[
            x
            for g, w in sorted(weights.items())
            for x in (F.lit(g), F.lit(int(w / wsum * total)))
        ]
    )
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (
        documents.select(
            group_col,
            id_col,
            F.row_number().over(w).cast("long").alias("rn"),
            quota[F.col(group_col)].alias("__q"),
        )
        .filter(F.col("rn") <= F.col("__q"))
        .drop("__q")
    )


def _ordered_prefix_take(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    buckets: int = 32,
) -> DataFrame:
    """Globally-ordered prefix cut WITHOUT a single-partition window:
    keep the maximal prefix of ``df`` ordered by ``order_col`` whose
    cumulative ``weight_col`` stays within ``budget``.

    Two-phase exact prefix sum (the distributed replacement for
    ``Window.partitionBy(lit(1))`` — a true global window funnels the
    whole frame through ONE task; VERDICT r5 finding #1):

    1. Bucket rows by deterministic quantile boundaries of
       ``order_col`` (one ``approxQuantile`` driver call on the frame
       being cut — GK sketch, no randomness, so the row→bucket map is
       identical across the two jobs below; ``repartitionByRange`` +
       ``spark_partition_id`` was rejected exactly because its sampled
       boundaries may differ between jobs and silently corrupt the
       offsets). The bucket expression is a monotone JVM fold over the
       boundary literals, so bucket order == global order.
    2. ONE narrow aggregate of per-bucket weight sums (≤ ``buckets``
       rows collected), prefix-summed on the driver into per-bucket
       offsets that re-enter the plan as a literal map — zero joins.
       The cumulative sum is then offset + a PARTITION-LOCAL window
       per bucket.

    Row-identical to the naive global-window rule for every input with
    UNIQUE ``order_col`` values (budget_select orders by doc_id, which
    is unique by contract) — with tied keys no cumulative cut is
    well-defined: both this and the naive rule become
    partitioning-dependent over the ties. An all-tied adversarial
    WEIGHT distribution (every row in the marginal class) now spreads
    across ``buckets`` tasks instead of one (§C stress row).
    """
    bounds = sorted(
        set(
            df.approxQuantile(
                order_col,
                [i / buckets for i in range(1, buckets)],
                0.001,
            )
        )
    )
    if not bounds:  # empty frame — nothing to cut
        return df.filter(F.lit(False))
    bkt = F.aggregate(
        F.array(*[F.lit(b) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(order_col).cast("double") >= b, 1).otherwise(0),
    )
    tagged = df.withColumn("__bkt", bkt)
    psums = {
        r["__bkt"]: r["t"]
        for r in tagged.groupBy("__bkt")
        .agg(F.sum(weight_col).alias("t"))
        .collect()
    }
    offsets, cum = {}, 0
    for b in sorted(psums):
        offsets[b] = cum
        cum += psums[b]
    # keys/values pinned to int/long explicitly: create_map requires
    # uniform types, and a mixed small/large offset set would
    # otherwise resolve to Integer for some literals and Long for
    # others (type-mismatch at 2^31 token corpora)
    omap = F.create_map(
        *[
            x
            for b, off in offsets.items()
            for x in (
                F.lit(int(b)).cast("int"),
                F.lit(int(off)).cast("long"),
            )
        ]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            "*",
            (
                F.element_at(omap, F.col("__bkt"))
                + F.sum(weight_col).over(w)
            ).alias("__cum"),
        )
        .filter(F.col("__cum") <= budget)
        .drop("__cum", "__bkt")
    )


def budget_select(
    documents: DataFrame,
    token_budget: int,
    text_col: str = "text",
    counter=None,
) -> DataFrame:
    """Token-budget corpus selection — "take the best documents until
    the budget is full": rank docs by (quality score DESC, id) and keep
    the maximal prefix whose cumulative token count fits
    ``token_budget``. The final sizing knob of a corpus build ("the
    best 1B tokens"), selecting greedily by quality.

    NOT a global sort: the selection rule is evaluated in two exact
    phases. (1) One hash aggregate builds the per-score token
    histogram — quality scores are rounded to 6 dp in [0, 1], so the
    histogram is bounded at ~1e6 rows regardless of corpus size (a
    config-sized driver collect, same class as the IVF centroid set) —
    and the driver walks it to find the cutoff score: every doc
    scoring ABOVE the cutoff is selected outright with zero ordering.
    (2) Only the single marginal score class is ordered (by id) and
    cut at the remaining budget — via ``_ordered_prefix_take``, a
    bucketed two-phase prefix sum, so even an adversarial corpus with
    EVERY document tied at the cutoff score never funnels through a
    single-partition window. The result is row-identical to the naive
    global-window prefix rule (the oracle computes exactly that),
    without ever sorting the corpus.

    Documents whose quality score is NULL (empty or whitespace-only
    text has no ratio statistics — the ``_words`` contract) are
    EXCLUDED from selection: they carry no rankable quality signal and
    no meaningful token count (ADVICE r5: a NULL score group used to
    crash the driver-side histogram sort with a TypeError).

    Returns the selected rows as (doc_id, score, n_tokens). The id
    column is fixed at ``doc_id`` — the quality scorer's contract
    (an earlier ``id_col`` parameter advertised a capability
    quality_score does not support; review finding).

    ``counter``: optional text-column-name -> Column token counter
    (``bpe.counter(merges)``) so "the best 1B tokens" is denominated
    in the tokens the model will actually train on; default stays the
    whitespace count (VERDICT r6 item 3).
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    from timeseries_data_provider_spark.operators.text import quality_score

    # Materialized once (lazy): the narrow (doc_id, score, n_tokens)
    # projection — three numeric columns per doc, the same size class
    # as a signature table — feeds FOUR consumers (histogram, the
    # above-cutoff filter, the marginal class's quantile probe and
    # prefix cut). Without this, every consumer re-runs the full
    # quality-scoring tokenization over the corpus (measured 28 s vs
    # 6 s at 3.2M docs, §C tiedbudget row).
    scored = (
        quality_score(documents)
        .select("doc_id", "score")
        .filter(F.col("score").isNotNull())
        .join(
            documents.select(
                "doc_id",
                (
                    F.size(tokens(text_col)).cast("long")
                    if counter is None
                    else counter(text_col).cast("long")
                ).alias("n_tokens"),
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    hist = sorted(
        scored.groupBy("score").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: -r["score"],
    )
    cum = 0
    cutoff = None
    remaining = token_budget
    for r in hist:
        if cum + r["t"] <= token_budget:
            cum += r["t"]
        else:
            cutoff = r["score"]
            remaining = token_budget - cum
            break
    if cutoff is None:
        return scored  # the whole corpus fits the budget
    full = scored.filter(F.col("score") > cutoff)
    marginal = _ordered_prefix_take(
        scored.filter(F.col("score") == cutoff),
        "doc_id",
        "n_tokens",
        remaining,
    )
    return full.unionByName(marginal)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version governance diff: classify every document id of
    two corpus versions as ``added`` (id only in new), ``removed``
    (id only in old), ``changed`` (same id, different content hash),
    or ``unchanged`` — the audit artifact a dataset release process
    publishes next to the data ("v2 adds 1.2M docs, removes 40k,
    rewrites 3k").

    Comparison is by sha256 content hash, so the diff never shuffles
    document bodies — two narrow (id, 64-char digest) projections into
    ONE full-outer equi-join on the id, linear at 100 TB. Returns
    (doc_id, status); aggregate for the summary counts.
    """
    oh = old.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("__old_h"),
    )
    nh = new.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("__new_h"),
    )
    status = (
        F.when(F.col("__old_h").isNull(), "added")
        .when(F.col("__new_h").isNull(), "removed")
        .when(F.col("__old_h") == F.col("__new_h"), "unchanged")
        .otherwise("changed")
    )
    return oh.join(nh, "doc_id", "full").select(
        "doc_id", status.alias("status")
    )


def split_sentences(text_col: str = "text") -> Column:
    """Sentence segmentation as a JVM expression: split AFTER runs of
    sentence-ending punctuation ([.!?]) followed by whitespace (Java
    regex lookbehind — stays in codegen), empty segments dropped. A
    deterministic, language-light rule: abbreviations ("e.g. x") DO
    split — stated, the cost of staying declarative; the plug point
    for a learned segmenter is the same column contract."""
    return F.array_remove(
        F.split(F.col(text_col), "(?<=[.!?])[ \\t\\n\\x0B\\f\\r]+"), ""
    )


def chunk_sentences(
    documents: DataFrame,
    max_tokens: int = 128,
    overlap_sentences: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-aware chunking — the RAG/embedding-ingest splitter:
    sentences never split mid-way, consecutive sentences group into
    chunks by a START-BASED token budget, and ``overlap_sentences``
    repeats each chunk's trailing sentences at the head of the next
    (retrieval context continuity).

    Budget rule (declarative, exact): sentence s starts chunk
    ``floor(tokens_before_s / max_tokens)`` — every chunk STARTS
    within budget; a chunk may overrun by its final sentence (true
    greedy packing is an inherently sequential fold — this is the
    stated declarative approximation, and single sentences longer
    than the budget land alone rather than being split).

    Returns (id, chunk_idx, n_sentences, n_tokens, chunk_text) —
    without overlap, concatenating chunk_text over chunk_idx
    reproduces the sentence sequence exactly (pinned in tests).

    Shape: one explode + two windows partitioned by doc (cumulative
    tokens, then per-chunk collect) — no self-join; the overlap is a
    bounded per-chunk window tail, never a cross join."""
    if max_tokens < 1:
        raise ValueError(f"chunk_sentences: max_tokens {max_tokens!r}")
    if overlap_sentences < 0:
        raise ValueError(
            f"chunk_sentences: overlap_sentences {overlap_sentences!r}"
        )
    from pyspark.sql import Window

    sents = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(split_sentences(text_col)).alias(
                "sent_idx", "sent"
            ),
        )
        .withColumn("n_tok", F.size(tokens("sent")))
    )
    w = Window.partitionBy("doc_id").orderBy("sent_idx")
    sents = sents.withColumn(
        "__before",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    ).withColumn(
        "chunk_idx", F.floor(F.col("__before") / max_tokens).cast("long")
    )
    if overlap_sentences:
        # repeat each chunk's last k sentences into the NEXT REAL
        # chunk — chunk indices can SKIP (an oversized sentence jumps
        # several budget multiples), so "+1" would route the tail to
        # a nonexistent chunk and silently drop the overlap (review
        # finding); the successor comes from a lead() over the doc's
        # actual chunk ids
        wd = Window.partitionBy("doc_id", "chunk_idx").orderBy(
            F.col("sent_idx").desc()
        )
        nxt = (
            sents.select("doc_id", "chunk_idx")
            .distinct()
            .withColumn(
                "__next",
                F.lead("chunk_idx").over(
                    Window.partitionBy("doc_id").orderBy("chunk_idx")
                ),
            )
        )
        tail = (
            sents.withColumn("__rev", F.row_number().over(wd))
            .filter(F.col("__rev") <= overlap_sentences)
            .join(nxt, ["doc_id", "chunk_idx"])
            .filter(F.col("__next").isNotNull())
            .withColumn("chunk_idx", F.col("__next"))
            .drop("__rev", "__next")
        )
        sents = sents.unionByName(tail)
    return (
        sents.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("n_tok").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_idx", "sent"))
                    ),
                    lambda s: s["sent"],
                ),
            ).alias("chunk_text"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "chunk_idx",
            "n_sentences",
            "n_tokens",
            "chunk_text",
        )
    )
