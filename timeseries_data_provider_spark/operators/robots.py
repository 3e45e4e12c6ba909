"""robots.txt (RFC 9309) parsing + distributed crawl filtering.

A compliant crawl pipeline must honor the Robots Exclusion Protocol;
at corpus scale that means joining BILLIONS of URLs against MILLIONS
of per-domain robots files — so the rules must be DATA (a frame keyed
by domain), not a broadcast blob. Public-knowledge basis: RFC 9309
and the original 1994 REP. Reference parity note: index.js has no
crawl surface; [EXT] SURVEY §2.

Semantics implemented (RFC 9309):

- group selection: the group whose User-agent token equals the
  crawler's (case-insensitive) if present, else the ``*`` group;
  multiple User-agent lines share the following rule block;
- rule matching: ``Allow``/``Disallow`` path patterns with ``*``
  wildcards and the ``$`` end anchor; LONGEST pattern (octets) wins;
  Allow wins exact ties; no matching rule -> allowed; empty
  ``Disallow:`` is a no-rule (allow-all marker);
- extras: ``Sitemap:`` (global) and the de-facto ``Crawl-delay``.
  Percent-encoding normalization is a documented non-goal at this
  tier (both sides of the match come from the same crawler).

Scale shape: ``robots_rules_df`` parses each domain's file in one
Arrow pass into (domain, allow, like_pattern, rule_len) ROWS —
patterns are compiled to SQL LIKE at parse time — and
``robots_filter`` is then pure JVM: equi-join on domain, LIKE match,
longest-match window, anti-semantics for disallowed rows. The
quadratic is bounded by rules-per-domain (tens), never by corpus
size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "rule_to_like",
    "robots_rules_df",
    "robots_delays_df",
    "robots_profile_df",
    "robots_filter",
]


def parse_robots(text: str, agent: str = "*") -> dict:
    """Parse one robots.txt for ``agent``: {rules: [(allow, path)],
    crawl_delay, sitemaps}. Group selection per RFC 9309 (exact
    agent token else '*'); unparseable lines are skipped (the spec's
    own tolerance)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_group_body = False
    sitemaps: list[str] = []

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_group_body = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:  # empty Disallow: = allow-all marker, no rule
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "sitemap":
            sitemaps.append(val)
    flush()
    # RFC 9309 §2.2.1: ALL groups whose agent list matches are
    # COMBINED into one (files with two 'User-agent: *' blocks are
    # common in the wild — dropping the later block loses its
    # Disallow lines). Exact-token groups outrank '*' groups, but
    # within the winning specificity EVERY group merges; the first
    # group's crawl-delay wins (de-facto extension, no spec order).
    exact = [g for g in groups if agent in g[0]]
    star = [g for g in groups if "*" in g[0]]
    chosen = exact or star
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    for _agents, g_rules, g_delay in chosen:
        rules.extend(g_rules)
        if delay is None:
            delay = g_delay
    return {
        "rules": rules,
        "crawl_delay": delay,
        "sitemaps": sitemaps,
    }


def rule_to_like(path: str) -> str:
    """Compile an REP path pattern to a SQL LIKE pattern:
    '*' -> '%', trailing '$' anchors (no trailing '%'), LIKE
    metacharacters escaped with backslash."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    out = []
    for ch in path:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    pat = "".join(out)
    if not anchored:
        pat += "%"
    return pat


def robots_rules_df(
    robots: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """One Arrow parse pass: (domain, robots_txt) -> one row per rule
    (domain, allow, like_pattern, rule_len) for ``agent``. Domains
    whose file yields no rules emit NO rows (join-miss = allowed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "domain": [],
                "allow": [],
                "like_pattern": [],
                "rule_len": [],
            }
            for dom, txt in zip(pdf[domain_col], pdf[text_col]):
                if txt is None:
                    continue
                for allow, path in parse_robots(str(txt), agent)["rules"]:
                    out["domain"].append(dom)
                    out["allow"].append(allow)
                    out["like_pattern"].append(rule_to_like(path))
                    out["rule_len"].append(len(path.encode("utf-8")))
            yield pd.DataFrame(out)

    return robots.select(domain_col, text_col).mapInPandas(
        run,
        "domain string, allow boolean, like_pattern string, rule_len long",
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep_disallowed: bool = False,
    key: str = "registered_domain",
) -> DataFrame:
    """Filter a URL frame by per-domain REP rules (from
    ``robots_rules_df``) — all JVM after the parse pass:

    1. derive (domain, path) from the URL (operators/urls helpers);
    2. equi-join rules on domain (rules-per-domain-bounded fan-out);
    3. keep matching rules (LIKE with a column pattern);
    4. longest-match window (rule_len DESC, allow DESC for the
       Allow-wins-ties rule);
    5. no matching rule (incl. no rules at all) -> allowed.

    ``keep_disallowed=True`` returns the BLOCKED rows instead (the
    audit view).

    ``key``: how a URL maps to the rules frame's ``domain`` column —
    ``"registered_domain"`` (rules aggregated per site, the corpus-
    blocklist convention) or ``"host"`` (robots.txt's OWN scope is
    per host: subdomains carry their own file — pass host-keyed
    rules and key="host" for strict REP fidelity)."""
    from . import urls as _urls

    if key not in ("registered_domain", "host"):
        raise ValueError(f"robots_filter: key {key!r}")
    u = F.col(url_col)
    qpart = F.try_parse_url(u, F.lit("QUERY"))
    path = F.concat(
        _urls._norm_path(u),
        F.when(qpart.isNull() | (qpart == ""), F.lit("")).otherwise(
            F.concat(F.lit("?"), qpart)
        ),
    )
    host = _urls.url_host(u)
    dom = (
        host
        if key == "host"
        else _urls.url_registered_domain(host)
    )
    base = (
        urls.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__dom", dom)
        .withColumn("__path", path)
    )
    matched = (
        base.join(rules.withColumnRenamed("domain", "__dom"), "__dom", "left")
        .withColumn(
            "__hit",
            F.col("like_pattern").isNotNull()
            & F.expr("__path LIKE like_pattern ESCAPE '\\\\'"),
        )
    )
    # per-ROW decision window: partitioning by the URL string would
    # collapse duplicate URLs into one surviving row
    w = Window.partitionBy("__rid").orderBy(
        F.col("__hit").desc(),
        F.col("rule_len").desc(),
        F.col("allow").desc(),
    )
    decided = (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "__allowed",
            F.when(F.col("__hit"), F.col("allow")).otherwise(F.lit(True)),
        )
    )
    keep = ~F.col("__allowed") if keep_disallowed else F.col("__allowed")
    return decided.filter(keep).select(*urls.columns)

def robots_delays_df(
    robots: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """One Arrow parse pass: (domain, robots_txt) -> (host,
    crawl_delay) rows for ``agent`` — the delays frame
    ``frontier.frontier_schedule`` consumes (the robots->frontier
    plumbing; ``robots_rules_df`` carries the Allow/Disallow rules
    but dropped the de-facto Crawl-delay). Domains without a parsed
    delay emit NO row (the frontier's default_delay applies)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "crawl_delay": []}
            for dom, txt in zip(pdf[domain_col], pdf[text_col]):
                if txt is None:
                    continue
                delay = parse_robots(str(txt), agent)["crawl_delay"]
                if delay is not None:
                    out["host"].append(dom)
                    out["crawl_delay"].append(float(delay))
            yield pd.DataFrame(out)

    return robots.select(domain_col, text_col).mapInPandas(
        run, "host string, crawl_delay double"
    )


def robots_profile_df(
    robots: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """ONE Arrow parse pass emitting BOTH frames' content (review
    finding: a crawl loop wiring rules + delays called parse_robots
    over the whole robots corpus twice): (domain, allow, like_pattern,
    rule_len, crawl_delay) — one row per rule with the group delay
    repeated, plus one rule-less row (NULL pattern) for domains that
    declare only a delay. Pin the result (localCheckpoint) and derive:

    - rules  = profile.filter(like_pattern IS NOT NULL)
               .drop(crawl_delay)
    - delays = profile.filter(crawl_delay IS NOT NULL)
               .select(domain AS host, crawl_delay).distinct()
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "domain": [],
                "allow": [],
                "like_pattern": [],
                "rule_len": [],
                "crawl_delay": [],
            }
            for dom, txt in zip(pdf[domain_col], pdf[text_col]):
                if txt is None:
                    continue
                parsed = parse_robots(str(txt), agent)
                delay = parsed["crawl_delay"]
                delay = float(delay) if delay is not None else None
                if parsed["rules"]:
                    for allow, path in parsed["rules"]:
                        out["domain"].append(dom)
                        out["allow"].append(allow)
                        out["like_pattern"].append(rule_to_like(path))
                        out["rule_len"].append(
                            len(path.encode("utf-8"))
                        )
                        out["crawl_delay"].append(delay)
                elif delay is not None:
                    out["domain"].append(dom)
                    out["allow"].append(None)
                    out["like_pattern"].append(None)
                    out["rule_len"].append(None)
                    out["crawl_delay"].append(delay)
            yield pd.DataFrame(out)

    return robots.select(domain_col, text_col).mapInPandas(
        run,
        "domain string, allow boolean, like_pattern string, "
        "rule_len long, crawl_delay double",
    )
