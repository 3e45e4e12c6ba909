"""URL canonicalization + domain operators (crawl front end).

Between the WARC reader (sources/warc.py) and dedup sits URL hygiene:
crawlers see the same page as ``HTTP://Example.COM:80//a//b#frag`` and
``http://example.com/a/b``, and every URL-keyed step (exact URL dedup,
domain-level mixing quotas, blocklist filtering) needs one canonical
form. Reference parity note: the reference (index.js:1-290) has no URL
surface; [EXT] LLM-pipeline scope per SURVEY §2.

Everything here is a composition of built-in JVM expressions
(``try_parse_url`` — Hive-compatible, backed by java.net.URI — plus
regex/array functions): zero Python UDFs, whole-stage-codegen
eligible, so URL hygiene over 100 TB is scan-rate work, not a
Python-tier cost. Invalid URLs propagate NULL (``try_parse_url``'s
contract — the throwing ``parse_url`` would kill a scan on one bad
crawl row); the quarantine filter is ``url_host(col).isNull()``.

Canonicalization rules (the conservative, order-independent subset of
RFC 3986 §6 normalization — the ones that never change which resource
is fetched):

- scheme and host lowercased
- default ports stripped (http:80, https:443); explicit non-default
  ports kept
- consecutive path slashes collapsed; empty path -> "/"
- fragment dropped (never sent to the server)
- query parameters sorted bytewise (param order is almost never
  semantic; sorting makes the canonical form join-stable) — empty
  query drops the "?"

``url_registered_domain`` is a documented PSL-LITE heuristic: last two
host labels, or three when the TLD is 2 chars and the second level is
a well-known cc second-level (co/com/net/org/ac/gov/edu — covers
co.uk/com.au/co.jp-style hierarchies). A production pipeline loads
the full Mozilla Public Suffix List; the ``cc_second_levels``
parameter is where it plugs in. The heuristic is deterministic and
stated — not a claim of PSL completeness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "url_normalize",
    "url_registered_domain",
    "url_path_depth",
    "domain_stats",
    "drop_blocklisted",
    "resolve_links",
]

_DEFAULT_CC_SECOND = ("co", "com", "net", "org", "ac", "gov", "edu")


def url_host(url: Column) -> Column:
    """Lowercased host of ``url`` (NULL when unparseable)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def _authority_port(url: Column) -> Column:
    # parse_url exposes no PORT part; it lives in AUTHORITY
    return F.regexp_extract(
        F.try_parse_url(url, F.lit("AUTHORITY")), r":(\d+)$", 1
    )


def _norm_path(url: Column) -> Column:
    p = F.regexp_replace(F.try_parse_url(url, F.lit("PATH")), "/{2,}", "/")
    return F.when(p == "", F.lit("/")).otherwise(p)


def _sorted_query(url: Column) -> Column:
    q = F.try_parse_url(url, F.lit("QUERY"))
    parts = F.array_sort(
        F.filter(F.split(q, "&"), lambda x: x != F.lit(""))
    )
    return F.when(
        q.isNull() | (F.size(parts) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(parts, "&")))


def url_normalize(url: Column) -> Column:
    """Canonical form of ``url`` per the module-docstring rules.
    NULL when the scheme or host cannot be parsed."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    port = _authority_port(url)
    is_default = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    return F.when(
        scheme.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            portpart,
            _norm_path(url),
            _sorted_query(url),
        )
    )


def url_registered_domain(
    host: Column, cc_second_levels: tuple[str, ...] = _DEFAULT_CC_SECOND
) -> Column:
    """PSL-lite registered domain of a (lowercased) host — see the
    module docstring for the heuristic and its stated limits. Hosts
    with fewer than two labels (``localhost``, bare IPs keep their
    dots and fall through the label rule) return the host itself."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    tld = F.element_at(parts, -1)
    second = F.element_at(parts, -2)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*cc_second_levels)
    )
    last2 = F.concat_ws(".", F.element_at(parts, -2), tld)
    last3 = F.concat_ws(".", F.element_at(parts, -3), second, tld)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n < 2, host)
        .when(take3, last3)
        .otherwise(last2)
    )


def url_path_depth(url: Column) -> Column:
    """Number of path segments in the NORMALIZED path ('/a/b/c.png'
    -> 3, '/' -> 0) — the URL-shape feature crawl-frontier policies
    and quality priors key on."""
    p = _norm_path(url)
    return (
        F.size(F.filter(F.split(p, "/"), lambda x: x != F.lit("")))
    ).cast("long")


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain corpus stats (docs, total chars of
    ``text`` when present) — the aggregation domain quotas and
    blocklist triage read. One hash aggregate; no UDFs."""
    dom = url_registered_domain(url_host(F.col(url_col)))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if "text" in df.columns:
        aggs.append(F.sum(F.length("text")).alias("n_chars"))
    return df.groupBy(dom.alias("domain")).agg(*aggs)


def drop_blocklisted(
    df: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Remove rows whose registered domain appears in ``blocked``
    (a frame with a ``domain`` column). Broadcast LEFT ANTI join —
    blocklists are small dimension tables; the corpus never
    shuffles."""
    dom = url_registered_domain(url_host(F.col(url_col)))
    return df.withColumn("__dom", dom).join(
        F.broadcast(blocked.select(F.col("domain").alias("__dom"))),
        "__dom",
        "left_anti",
    ).drop("__dom")


def resolve_links(
    links: DataFrame,
    base_col: str = "base_url",
    href_col: str = "href",
    out_col: str = "url",
    keep_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """RFC 3986 §5 reference resolution: absolutize each ``href``
    against its page's ``base_col`` URL — the step between out-link
    extraction (htmltext.html_links) and the frontier. Adds
    ``out_col``; rows whose href resolves to a non-fetchable scheme
    (mailto:, javascript:, data:, …) or fails to resolve get NULL
    (filter or quarantine downstream).

    Implementation note (a stated exception to this module's all-JVM
    rule): resolution runs in one Arrow pass over stdlib
    ``urllib.parse.urljoin`` — full §5.3 dot-segment/merge semantics
    in expression form would be a large, bug-prone aggregate fold,
    and the links frame is already the output of a Python parse pass
    (html_links), so the extraction tier's rate class is unchanged.
    Fragments are dropped (never sent to the server — the
    url_normalize rule, applied early so fragment-only self-links
    dedupe against the fetched set)."""
    from typing import Iterator as _It
    from urllib.parse import urljoin, urlsplit

    import pandas as _pd

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            out = []
            for base, href in zip(pdf[base_col], pdf[href_col]):
                if base is None or href is None:
                    out.append(None)
                    continue
                try:
                    u = urljoin(str(base), str(href).strip())
                    parts = urlsplit(u)
                    if parts.scheme not in keep_schemes or not parts.netloc:
                        out.append(None)
                        continue
                    # drop the fragment, keep everything else verbatim
                    # (url_normalize does the rest downstream)
                    out.append(u.split("#", 1)[0])
                except ValueError:
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    if out_col in links.columns:
        # replace, don't duplicate: re-resolving a frame that already
        # carries out_col used to build an invalid duplicate-column
        # schema and fail at runtime (review finding)
        links = links.drop(out_col)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in links.schema.fields
    )
    return links.mapInPandas(run, f"{schema}, {out_col} string")
