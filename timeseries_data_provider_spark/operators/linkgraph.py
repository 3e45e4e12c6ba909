"""Link-graph analytics: exact-integer PageRank + host graph.

The crawl's link structure is a QUALITY PRIOR (the original use of
PageRank — Brin & Page 1998): pages/hosts referenced by many
well-referenced hosts are worth more crawl budget and more training
weight than orphan spam. Public-knowledge basis: the PageRank power
iteration; the host-graph aggregation is standard crawl practice.
Reference parity note: index.js has no graph surface; [EXT] SURVEY
§2.

EXACT-INTEGER formulation (the repo's determinism rule — float
PageRank sums are partitioning-order-dependent, so two runs of the
"same" job can disagree in the low bits; this one cannot): ranks are
integers at a fixed ``scale``; each iteration computes

    contrib(e)  = rank(src) // out_degree(src)          (floor)
    incoming(v) = SUM of contribs over in-edges          (exact int)
    dangling    = SUM of ranks of zero-out-degree nodes  (exact int)
    rank'(v)    = ((1000 - d) * (scale // N)
                   + d * (incoming(v) + dangling // N)) // 1000

with d = damping in milli (850 = 0.85). Floors leak a little mass
(stated — the price of exactness); ordering behavior matches float
PageRank on every test graph, and the whole recurrence is replayable
in plain Python for exact-equality tests.

Scale shape: per iteration one join edges x ranks (shuffle on src),
one hash-agg on dst, one anti-join for dangling mass — the standard
Pregel-free Spark PageRank plan, localCheckpointed per round so
lineage stays flat. The driver holds nothing but N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_exact", "host_edges", "anchor_text_agg"]


def pagerank_exact(
    edges: DataFrame,
    iterations: int = 10,
    damping_milli: int = 850,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact-integer PageRank over an edge list (see module docstring
    for the precise recurrence). Duplicate edges count as parallel
    edges (each carries a contribution — dedupe upstream if that is
    not wanted). Returns (node, rank) with SUM(rank) <= scale
    (floor leakage only)."""
    if iterations < 0:
        raise ValueError("pagerank: negative iterations")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    base = (1000 - damping_milli) * (scale // n)
    for _ in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "deg")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
            .first()["s"]
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()).select(
                    F.col("node").alias("src"),
                    # SQL `div` = exact integer division (a float `/`
                    # + cast can be off by one ulp at scale=1e12)
                    F.expr("rank div deg").alias("c"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            nodes.join(
                contribs, nodes["node"] == contribs["dst"], "left"
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping_milli)
                    * (
                        F.coalesce(F.col("incoming"), F.lit(0))
                        + F.lit(int(dangling) // n)
                    )
                )
                .alias("__num"),
            )
            .select(
                "node", F.expr("__num div 1000").alias("rank")
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def host_edges(
    links: DataFrame,
    src_url_col: str = "url",
    href_col: str = "href",
) -> DataFrame:
    """Page-level out-links -> weighted HOST graph edges:
    (src registered domain, dst registered domain, weight), self-loops
    dropped, relative hrefs (no scheme/host) excluded — the input
    PageRank/host-quality tiers consume. All JVM (the urls ops)."""
    from . import urls

    src_dom = urls.url_registered_domain(
        urls.url_host(F.col(src_url_col))
    )
    dst_dom = urls.url_registered_domain(
        urls.url_host(F.col(href_col))
    )
    return (
        links.select(
            src_dom.alias("src"), dst_dom.alias("dst")
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )

def anchor_text_agg(
    links: DataFrame,
    base_col: str = "base_url",
    href_col: str = "href",
    text_col: str = "anchor_text",
    min_chars: int = 1,
) -> DataFrame:
    """Per-target anchor-text profile: what the web CALLS a page —
    the classic target-description signal (used since Brin & Page
    1998 for relevance, and by crawl-quality tiers to label pages
    their own content doesn't describe). Resolves each href against
    its page (urls.resolve_links), then hash-aggregates per canonical
    target URL:

    (url, n_refs, n_texts, top_text, top_text_n) — total incoming
    anchors, distinct non-trivial texts, the most frequent text (ties
    broken lexicographically smallest — deterministic) and its count.
    Texts shorter than ``min_chars`` (empty/image anchors) count
    toward n_refs but not the text profile.

    Scale shape: resolve (Arrow) -> hash-aggregates keyed on the
    target URL, all JVM; output is target-URL-sized. The top-text
    pick is two bounded aggregates (winning count, then min text at
    that count), never a global sort."""
    from . import urls

    resolved = urls.resolve_links(
        links, base_col=base_col, href_col=href_col
    )
    base = (
        resolved.filter(F.col("url").isNotNull())
        .select(
            urls.url_normalize(F.col("url")).alias("url"),
            F.col(text_col).alias("__t"),
        )
        .filter(F.col("url").isNotNull())
        # three consumers (refs, counts twice) — pin so the Arrow
        # resolve pass runs once, not per consumer
        .localCheckpoint(eager=False)
    )
    refs = base.groupBy("url").agg(F.count(F.lit(1)).alias("n_refs"))
    counts = (
        base.filter(F.length("__t") >= min_chars)
        .groupBy("url", "__t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = counts.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_texts"),
        F.max("n").alias("top_text_n"),
    )
    winner = (
        counts.join(stats.select("url", "top_text_n"), "url")
        .filter(F.col("n") == F.col("top_text_n"))
        .groupBy("url")
        .agg(F.min("__t").alias("top_text"))
    )
    return (
        refs.join(stats, "url", "left")
        .join(winner, "url", "left")
        .select(
            "url",
            "n_refs",
            F.coalesce("n_texts", F.lit(0).cast("long")).alias(
                "n_texts"
            ),
            "top_text",
            "top_text_n",
        )
    )
