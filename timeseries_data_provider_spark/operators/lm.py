"""[EXT] Distributed n-gram language-model training and scoring —
the CCNet-style perplexity-proxy quality signal (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): train token-level n-gram counts on a reference corpus, score
every candidate document by its smoothed log-probability, and gate or
bucket on the score. The classic curation signal this engine's
quality tier was missing next to the Gopher repetition stats and C4
line rules.

Spark-first shape (all JVM, zero Python in either pass):

* **Train** (``ngram_lm``): one explode of (context, next-token)
  pairs + one hash-aggregate — the count table is the MODEL, a plain
  DataFrame keyed on (context, tok) that persists/broadcasts like any
  dimension. Size tracks distinct n-grams (vocabulary), not corpus
  bytes — the same scale class as the MinHash signature and substring
  window indexes.
* **Score** (``ngram_lm_score``): the candidate corpus's n-grams
  LEFT-join the model on (context, tok) and its context totals on
  context — both joins fan out exactly 1 per occurrence (the model is
  unique per key; hot contexts like "the" reduce to one model row, the
  line_dedup/hot-key shape), then one per-doc aggregate.

Numeric contract (the oracle-hashability trick): per-token add-k
log-probabilities are floored to integer MILLI-NATS
(``floor(1000·ln((c + k)/(C + k·V)))``) BEFORE summing, so every
scored column is exact integer math — order-independent, engine-
portable, no float aggregate. With ``k > 0`` every probability is
strictly below 1, so the floored value never sits on the ln(1) = 0
boundary where a last-ulp libm difference could flip it.

OOV semantics: an unseen (context, tok) pair scores with c = 0; an
entirely unseen context scores against C = 0 (pure 1/V mass). V is
the TRAINED next-token vocabulary, attached as a broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators.text import _words


def _ngrams(
    documents: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, context, tok): every n-gram of every document as
    an (n-1)-token context string + next token, 1-based positions —
    the single-space-joined context keeps the model oracle-portable
    (the substring_windows convention). Docs with fewer than n tokens
    yield no rows."""
    w = F.col("__w")
    ctx = F.concat_ws(
        " ", *[F.element_at(w, F.col("pos") + j) for j in range(n - 1)]
    )
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            _words(text_col).alias("__w"),
        )
        .filter(F.size("__w") >= n)
        .select(
            "doc_id",
            "__w",
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (n - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            ctx.alias("context"),
            F.element_at(w, F.col("pos") + (n - 1)).alias("tok"),
        )
    )


def ngram_lm(
    documents: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train an n-gram count model: (context, tok, cnt) over the
    reference corpus — one explode + one hash-aggregate. The returned
    DataFrame IS the model; persist it next to the other settled
    structures, or broadcast it when the n-gram vocabulary is small.
    ``n=1`` degenerates to a unigram model (empty context)."""
    if n < 1:
        raise ValueError(f"ngram_lm: n must be >= 1, got {n}")
    return (
        _ngrams(documents, n, text_col, id_col)
        .groupBy("context", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_score(
    documents: DataFrame,
    lm: DataFrame,
    n: int = 2,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a trained ``ngram_lm`` model with
    add-k smoothing, in exact integer milli-nats:

    per token: ``floor(1000 · ln((cnt + k) / (ctx_total + k·V)))``

    Returns (doc_id, n_ngrams, n_hits, logprob_milli,
    avg_logprob_milli) — ``n_hits`` counts n-grams the model has seen
    (the coverage signal), ``logprob_milli`` is the summed floored
    milli-nat log-probability (more negative = more surprising =
    CCNet's low-quality tail), ``avg_logprob_milli`` its per-n-gram
    floor (the length-normalized gate, a monotone proxy for
    perplexity: ppl = exp(-avg/1000)). Documents with fewer than n
    tokens score 0 n-grams and NULL averages.

    Scale shape: two fan-out-exactly-1 equi-joins (model unique per
    (context, tok); context totals unique per context) + one per-doc
    hash-aggregate. V rides a broadcast one-row cross join, the
    text.py scalar-attachment pattern."""
    grams = _ngrams(documents, n, text_col, id_col)
    ctx_totals = lm.groupBy("context").agg(
        F.sum("cnt").alias("__ctx_total")
    )
    vocab = lm.select(
        F.count_distinct("tok").cast("long").alias("__v")
    )
    scored = (
        grams.join(lm, ["context", "tok"], "left")
        .join(ctx_totals, "context", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce("cnt", F.lit(0)).alias("__c"),
            F.coalesce("__ctx_total", F.lit(0)).alias("__t"),
            "__v",
        )
        .select(
            "doc_id",
            (F.col("__c") > 0).cast("long").alias("__hit"),
            F.floor(
                F.lit(1000.0)
                * F.log(
                    (F.col("__c") + F.lit(float(k)))
                    / (F.col("__t") + F.lit(float(k)) * F.col("__v"))
                )
            ).alias("__milli"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__hit").alias("n_hits"),
            F.sum("__milli").alias("logprob_milli"),
        )
        .withColumn(
            "avg_logprob_milli",
            F.floor(
                F.col("logprob_milli").cast("double")
                / F.col("n_ngrams")
            ).cast("long"),
        )
    )
    base = documents.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.coalesce("logprob_milli", F.lit(0).cast("long")).alias(
            "logprob_milli"
        ),
        F.col("avg_logprob_milli"),
    )


# ---------------------------------------------------------------------------
# Interpolated modified Kneser-Ney (the KenLM/CCNet estimator)


def _kn_discounts(t: dict[int, int]) -> tuple[float, float, float]:
    """Modified-KN discounts (D1, D2, D3+) from count-of-counts
    t[1..4] (Chen & Goodman 1999 eq. 26; KenLM uses the same). The
    guarded fallbacks keep degenerate corpora (no singletons / no
    doubletons at some order) defined: each D_i clamps to [0, i], and
    a missing t_i denominator falls back to the absolute-discount
    0.75 convention."""
    t1, t2, t3, t4 = (t.get(i, 0) for i in (1, 2, 3, 4))
    if t1 > 0 and t2 > 0:
        y = t1 / (t1 + 2.0 * t2)
    else:
        y = 0.75  # degenerate: classic absolute-discount constant
    d1 = 1.0 - 2.0 * y * (t2 / t1) if t1 > 0 else 0.75
    d2 = 2.0 - 3.0 * y * (t3 / t2) if t2 > 0 else 0.75
    d3 = 3.0 - 4.0 * y * (t4 / t3) if t3 > 0 else 0.75
    return (
        min(max(d1, 0.0), 1.0),
        min(max(d2, 0.0), 2.0),
        min(max(d3, 0.0), 3.0),
    )


def kneser_ney_lm(
    documents: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Train an interpolated MODIFIED KNESER-NEY n-gram model — the
    KenLM estimator CCNet's perplexity filter actually uses (public
    basis: Chen & Goodman 1999; Heafield et al. 2013, "Scalable
    Modified Kneser-Ney Language Model Estimation", whose insight is
    exactly this module's shape: every statistic is a group-by over
    n-gram tables, so estimation is a handful of distributed
    aggregations — no driver pass over text).

    Per order k the model keeps (context, tok, cnt): RAW counts at
    the highest order, CONTINUATION counts below (cnt = number of
    DISTINCT left-extension words of the (k+1)-gram — Kneser-Ney's
    "how many contexts does this continuation complete" statistic,
    computed as one count_distinct group-by over the order-(k+1)
    table). Context tables carry (total, n1, n2, n3p) per context for
    the interpolation weight. Discounts (D1, D2, D3+) per order come
    from that order's count-of-counts — a 4-row bounded collect per
    order, the only driver data.

    Returns {"n", "tables": [order-1..order-n DataFrames],
    "ctx": [same-order context-stat DataFrames],
    "discounts": [(D1,D2,D3p) per order], "vocab": int}. Persist the
    tables like the other settled structures; they are
    vocabulary-sized, not corpus-sized.
    """
    if n < 2:
        raise ValueError(f"kneser_ney_lm: n must be >= 2, got {n}")
    tables: list[DataFrame] = [None] * (n + 1)  # 1-indexed by order
    tables[n] = ngram_lm(documents, n, text_col=text_col, id_col=id_col)
    for k in range(n - 1, 0, -1):
        higher = tables[k + 1]
        first = F.substring_index("context", " ", 1)
        if k == 1:
            rest = F.lit("")
        else:
            rest = F.expr("substring(context, instr(context, ' ') + 1)")
        tables[k] = (
            higher.groupBy(rest.alias("context"), "tok")
            .agg(F.count_distinct(first).alias("cnt"))
        )
    ctx_stats: list[DataFrame] = [None] * (n + 1)
    discounts: list[tuple[float, float, float]] = [None] * (n + 1)
    for k in range(1, n + 1):
        ctx_stats[k] = tables[k].groupBy("context").agg(
            F.sum("cnt").alias("total"),
            F.sum((F.col("cnt") == 1).cast("long")).alias("n1"),
            F.sum((F.col("cnt") == 2).cast("long")).alias("n2"),
            F.sum((F.col("cnt") >= 3).cast("long")).alias("n3p"),
        )
        # count-of-counts: 4 scalars, the only driver-side data
        coc = (
            tables[k]
            .filter(F.col("cnt") <= 4)
            .groupBy("cnt")
            .agg(F.count(F.lit(1)).alias("t"))
            .collect()
        )
        discounts[k] = _kn_discounts({r["cnt"]: r["t"] for r in coc})
    vocab = tables[1].select(F.count_distinct("tok")).first()[0] or 0
    return {
        "n": n,
        "tables": tables[1:],
        "ctx": ctx_stats[1:],
        "discounts": discounts[1:],
        "vocab": int(vocab),
    }


def _kn_level(p_lower, cnt, ctx, d: tuple[float, float, float]):
    """One interpolation level: (max(c−D(c),0) + γ(ctx)·p_lower)/total
    with the three-way modified discount; an UNSEEN context passes
    p_lower through unchanged (γ=1, no mass at this level)."""
    d1, d2, d3 = d
    c = F.coalesce(cnt, F.lit(0).cast("long"))
    disc = (
        F.when(c >= 3, F.lit(d3))
        .when(c == 2, F.lit(d2))
        .when(c == 1, F.lit(d1))
        .otherwise(F.lit(0.0))
    )
    gamma = (
        F.lit(d1) * ctx["n1"]
        + F.lit(d2) * ctx["n2"]
        + F.lit(d3) * ctx["n3p"]
    ) / ctx["total"]
    p_here = (
        F.greatest(c.cast("double") - disc, F.lit(0.0)) / ctx["total"]
        + gamma * p_lower
    )
    return F.when(ctx["total"].isNull(), p_lower).otherwise(p_here)


def kneser_ney_prob(
    pairs: DataFrame, model: dict, context_col: str = "context",
    tok_col: str = "tok",
) -> DataFrame:
    """Attach column ``p``: the interpolated modified-KN probability
    of ``tok`` after ``context`` (a space-joined (n−1)-token string),
    for every row of ``pairs`` — the testable core of the scorer
    (per-context Σ_tok p = 1 is pinned in tests/test_lm.py).

    Shape: per order one fan-out-exactly-1 left join on (suffix
    context, tok) + one on the context — 2n bounded joins, zero
    Python. The base of the recursion is the uniform 1/(V+1)
    distribution (the +1 is the implicit <unk>), so out-of-vocabulary
    tokens keep a strictly positive probability and log() stays
    finite."""
    n = model["n"]
    out = pairs
    # suffix contexts: __ctx1 = "" (unigram), __ctx{k} = last k-1 words
    w = F.split(F.col(context_col), " ")
    for k in range(1, n + 1):
        if k == 1:
            c = F.lit("")
        elif k == n:
            c = F.col(context_col)
        else:
            c = F.array_join(F.slice(w, -(k - 1), k - 1), " ")
        out = out.withColumn(f"__ctx{k}", c)
    for k in range(1, n + 1):
        t = model["tables"][k - 1].select(
            F.col("context").alias(f"__ctx{k}"),
            F.col("tok").alias(tok_col),
            F.col("cnt").alias(f"__c{k}"),
        )
        s = model["ctx"][k - 1].select(
            F.col("context").alias(f"__ctx{k}"),
            F.col("total").alias(f"__t{k}"),
            F.col("n1").alias(f"__n1_{k}"),
            F.col("n2").alias(f"__n2_{k}"),
            F.col("n3p").alias(f"__n3_{k}"),
        )
        out = out.join(t, [f"__ctx{k}", tok_col], "left").join(
            s, f"__ctx{k}", "left"
        )
    # r15: the three-level interpolation tree is rendered as ONE SQL
    # expression instead of ~150 Column ops — identical operator
    # structure and float ordering (repr() round-trips the discount
    # doubles exactly), one F.expr parse instead of hundreds of py4j
    # round-trips per query construction. The Column-DSL builder
    # (_kn_level) remains the readable reference; the q64 oracle
    # hash-checks the scores either way.
    p_sql = repr(1.0 / (model["vocab"] + 1)) + "D"
    for k in range(1, n + 1):
        d1, d2, d3 = model["discounts"][k - 1]
        c = f"coalesce(__c{k}, 0L)"
        disc = (
            f"(CASE WHEN {c} >= 3 THEN {d3!r}D"
            f" WHEN {c} = 2 THEN {d2!r}D"
            f" WHEN {c} = 1 THEN {d1!r}D"
            " ELSE 0.0D END)"
        )
        gamma = (
            f"(({d1!r}D * __n1_{k} + {d2!r}D * __n2_{k}"
            f" + {d3!r}D * __n3_{k}) / __t{k})"
        )
        p_here = (
            f"(greatest(cast({c} as double) - {disc}, 0.0D)"
            f" / __t{k} + {gamma} * {p_sql})"
        )
        p_sql = (
            f"(CASE WHEN __t{k} IS NULL THEN {p_sql}"
            f" ELSE {p_here} END)"
        )
    out = out.withColumn("p", F.expr(p_sql))
    return out.drop(
        *[f"__{pre}{k}" for k in range(1, n + 1)
          for pre in ("ctx", "c", "t", "n1_", "n2_", "n3_")]
    )


def kneser_ney_score(
    documents: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document KN log-probability — the CCNet quality gate
    (Wenzek et al. 2020 filter on reference-LM perplexity). Returns
    (doc_id, n_ngrams, logprob_milli, avg_logprob_milli): per-token
    ln p floored to integer MILLI-NATS before summing (the module's
    order-independent exact-aggregation contract; perplexity =
    exp(−avg/1000)). Docs shorter than n tokens score 0 n-grams and
    NULL average."""
    n = model["n"]
    grams = _ngrams(documents, n, text_col, id_col)
    scored = (
        kneser_ney_prob(grams, model)
        .select(
            "doc_id",
            F.floor(F.lit(1000.0) * F.log("p")).alias("__milli"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__milli").alias("logprob_milli"),
        )
        .withColumn(
            "avg_logprob_milli",
            F.floor(
                F.col("logprob_milli").cast("double") / F.col("n_ngrams")
            ).cast("long"),
        )
    )
    base = documents.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("logprob_milli", F.lit(0).cast("long")).alias(
            "logprob_milli"
        ),
        F.col("avg_logprob_milli"),
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "avg_logprob_milli",
    id_col: str = "doc_id",
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's final step (Wenzek et al. 2020 §4.4): partition the
    corpus into perplexity buckets — "head" = lowest perplexity
    (highest avg log-prob) under the reference LM, "tail" = most
    surprising — so downstream sampling weights by quality tier
    instead of hard-filtering.

    Scale shape: bucket BOUNDARIES are the exact score percentiles
    (ONE aggregate, n_buckets-1 scalars — the zorder/budget_select
    bounded-driver-data rule), then assignment is a zero-shuffle
    per-row comparison against broadcast literals — never a global
    ntile/percent_rank window (single-partition at corpus scale).
    The exact percentile's accumulator is a per-value counts map —
    bounded here because milli-nat scores are INTEGERS with data-
    bounded cardinality; for a float score column swap in
    approx_percentile (the GK sketch, same call shape).
    Ties share a bucket (boundary docs with equal scores are not
    split — sizes are equal up to tie mass, CCNet's own convention);
    NULL scores (docs too short to score) land in the LAST bucket,
    stated. Returns (id, bucket_idx, bucket)."""
    if n_buckets < 2:
        raise ValueError(
            f"perplexity_buckets: n_buckets {n_buckets!r}"
        )
    if len(labels) != n_buckets:
        raise ValueError(
            f"perplexity_buckets: {len(labels)} labels for "
            f"{n_buckets} buckets"
        )
    qs = [1.0 - i / n_buckets for i in range(1, n_buckets)]
    row = scored.agg(
        F.percentile(score_col, F.array(*[F.lit(q) for q in qs])).alias(
            "__b"
        )
    ).first()
    bounds = [float(b) for b in (row["__b"] or [])]
    # bucket = number of boundaries the score falls BELOW (score DESC
    # ordering: head holds scores above the top boundary)
    bucket = F.lit(0).cast("long")
    for b in bounds:
        bucket = bucket + F.when(
            F.col(score_col) < F.lit(b), F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    bucket = F.when(
        F.col(score_col).isNull(), F.lit(n_buckets - 1).cast("long")
    ).otherwise(bucket)
    label_arr = F.array(*[F.lit(x) for x in labels])
    return scored.select(
        id_col,
        bucket.alias("bucket_idx"),
    ).withColumn(
        "bucket",
        F.element_at(
            label_arr, (F.col("bucket_idx") + 1).cast("int")
        ),
    )
