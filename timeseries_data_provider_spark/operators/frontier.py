"""Crawl-frontier scheduling: politeness-capped per-host fetch batches.

The piece between link discovery (operators/linkgraph, feeds, robots)
and the fetch tier: given millions of candidate URLs with priorities,
emit the NEXT BATCH — top-priority URLs per host, capped by each
host's crawl-delay politeness budget, each with a deterministic
in-window fetch offset so a thousand fetch workers need no
coordination. Public-knowledge basis: the Mercator frontier design
(Heydon & Najork 1999, "Mercator: A Scalable, Extensible Web
Crawler") — per-host FIFO politeness queues fed by a priority front —
re-expressed as Spark windows instead of in-memory queues. Reference
parity note: index.js has no crawl surface; [EXT] SURVEY §2.

Semantics (deterministic, closed-form — oracle-expressible):

- rank URLs within each host by (priority DESC, url ASC);
- a host with crawl-delay ``d`` seconds sustains
  ``floor(window_seconds / d)`` fetches per scheduling window; the
  per-host keep is ``min(max_per_host, that budget)``;
- kept URLs get ``scheduled_offset_ms = (rank-1) * d * 1000`` — the
  politeness spacing, honored by whichever worker owns the host
  partition.

Scale shape: one shuffle (the per-host window — hosts are the natural
partition key and web host cardinality is high, so skew is bounded by
the per-host cap itself), one fan-out-1 left join for delays, zero
Python. Already-fetched URLs are removed with a plain left-anti join
(``exclude_fetched``) BEFORE the window so settled corpus size never
inflates the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frontier_schedule", "exclude_fetched", "frontier_from_crawl"]


def exclude_fetched(
    candidates: DataFrame,
    fetched: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop candidates whose URL is already settled — a left-anti
    equi-join (the cheapest possible containment check; at 100 TB the
    fetched side is the corpus's url index, pruned to the url
    column)."""
    return candidates.join(
        fetched.select(F.col(url_col)).distinct(), url_col, "left_anti"
    )


def frontier_schedule(
    candidates: DataFrame,
    window_seconds: float = 60.0,
    default_delay: float = 1.0,
    delays: DataFrame | None = None,
    max_per_host: int | None = None,
    min_per_host: int = 1,
    url_col: str = "url",
    host_col: str | None = None,
    priority_col: str = "priority",
) -> DataFrame:
    """One scheduling window's fetch batch.

    ``candidates``: (url, priority[, host]) — ``host`` is derived
    from the URL when ``host_col`` is None (operators/urls).
    ``delays``: optional (host, crawl_delay) frame, e.g. aggregated
    from ``robots.parse_robots`` output; missing hosts use
    ``default_delay``. Non-positive or NULL delays clamp to
    ``default_delay`` (a zero delay must not divide by zero or grant
    an unbounded budget).

    ``min_per_host`` (default 1): floor on a host's budget — a
    crawl-delay LONGER than the window would otherwise floor to a
    budget of 0 and starve the host in EVERY window (each stateless
    window recomputes identically — review finding); one fetch per
    window is the graceful reading. Pass 0 for strict budgets when an
    external per-host last-fetch state enforces long delays across
    windows.

    Returns (host, url, priority, rank, scheduled_offset_ms,
    delay_clamped), one row per URL that fits this window's politeness
    budgets; rank is 1-based within host by (priority DESC, url ASC).
    ``delay_clamped`` is true when the host's crawl-delay exceeds the
    window and ``min_per_host`` raised its budget — the rows where the
    effective delay is SHORTER than robots asked for; audit or re-run
    with ``min_per_host=0`` for strict compliance. ``delays`` may
    carry duplicate host rows (re-fetched robots.txt); they aggregate
    to one row per host, largest delay winning."""
    if window_seconds <= 0:
        raise ValueError(
            f"frontier_schedule: window_seconds {window_seconds!r}"
        )
    if default_delay <= 0:
        raise ValueError(
            f"frontier_schedule: default_delay {default_delay!r}"
        )
    from . import urls as _urls

    if host_col is None:
        base = candidates.withColumn(
            "host", _urls.url_host(F.col(url_col))
        )
        host_col = "host"
    else:
        base = candidates
    base = base.filter(F.col(host_col).isNotNull())
    if delays is not None:
        # one row per host BEFORE the join — duplicate delay rows
        # (e.g. a re-fetched robots.txt) used to fan out every
        # candidate URL of that host into conflicting schedules
        # (review finding). On conflict the LARGEST delay wins: the
        # politest reading is the safe one for robots compliance.
        d = delays.groupBy(F.col("host").alias(host_col)).agg(
            F.max("crawl_delay").alias("__delay")
        )
        base = base.join(d, host_col, "left")
    else:
        base = base.withColumn("__delay", F.lit(None).cast("double"))
    delay = F.when(
        F.col("__delay").isNotNull() & (F.col("__delay") > 0),
        F.col("__delay").cast("double"),
    ).otherwise(F.lit(float(default_delay)))
    raw_budget = F.floor(F.lit(float(window_seconds)) / delay).cast(
        "long"
    )
    budget = raw_budget
    if min_per_host:
        budget = F.greatest(
            budget, F.lit(int(min_per_host)).cast("long")
        )
    if max_per_host is not None:
        budget = F.least(budget, F.lit(int(max_per_host)).cast("long"))
    # visibility flag (ADVICE r10): a crawl-delay longer than the
    # window silently clamps to min_per_host fetches — surface it so
    # robots compliance is auditable instead of invisible
    clamped = raw_budget < F.lit(int(min_per_host)).cast("long")
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        base.withColumn("__d", delay)
        .withColumn("__budget", budget)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= F.col("__budget"))
        .select(
            F.col(host_col).alias("host"),
            F.col(url_col).alias("url"),
            F.col(priority_col).alias("priority"),
            "rank",
            F.floor((F.col("rank") - 1) * F.col("__d") * 1000.0)
            .cast("long")
            .alias("scheduled_offset_ms"),
            clamped.alias("delay_clamped"),
        )
    )


def frontier_from_crawl(
    links: DataFrame,
    fetched: DataFrame,
    window_seconds: float = 60.0,
    default_delay: float = 1.0,
    delays: DataFrame | None = None,
    host_priorities: DataFrame | None = None,
    max_per_host: int | None = None,
    min_per_host: int = 1,
    base_col: str = "base_url",
    href_col: str = "href",
) -> DataFrame:
    """Close the crawl loop: raw out-links from the last batch's pages
    -> the NEXT politeness-scheduled fetch batch.

    Pipeline (each step an existing operator):
    1. resolve relative hrefs against their page (urls.resolve_links),
       dropping non-fetchable schemes;
    2. canonicalize (urls.url_normalize) and DISTINCT — the same URL
       discovered from many pages is one candidate;
    3. remove already-fetched URLs (left-anti vs the settled url
       index) BEFORE any window;
    4. attach a host-level priority (e.g. linkgraph.pagerank_exact
       aggregated via host_edges — the crawl-quality prior); hosts
       without a row get priority 0.0;
    5. frontier_schedule: per-host priority fronts under crawl-delay
       budgets.

    ``links``: (base_col, href_col, ...) — html_links output joined
    with its page URL. ``host_priorities``: optional (host, priority).
    Returns frontier_schedule's (host, url, priority, rank,
    scheduled_offset_ms, delay_clamped)."""
    from . import urls as _urls

    resolved = _urls.resolve_links(
        links, base_col=base_col, href_col=href_col
    )
    cand = (
        resolved.filter(F.col("url").isNotNull())
        .select(_urls.url_normalize(F.col("url")).alias("url"))
        .filter(F.col("url").isNotNull())
        .distinct()
    )
    cand = exclude_fetched(cand, fetched)
    cand = cand.withColumn("host", _urls.url_host(F.col("url")))
    if host_priorities is not None:
        cand = cand.join(host_priorities, "host", "left").withColumn(
            "priority",
            F.coalesce(F.col("priority"), F.lit(0.0)).cast("double"),
        )
    else:
        cand = cand.withColumn("priority", F.lit(0.0))
    return frontier_schedule(
        cand,
        window_seconds=window_seconds,
        default_delay=default_delay,
        delays=delays,
        max_per_host=max_per_host,
        min_per_host=min_per_host,
        host_col="host",
    )
