"""Sitemap + RSS/Atom feed parsing (crawl-frontier discovery).

The third leg of the crawl front end: robots.txt says what MAY be
fetched (operators/robots), sitemaps and feeds say what EXISTS —
the URL-discovery inputs a crawl frontier consumes. Public-knowledge
basis: sitemaps.org protocol (urlset/sitemapindex), RSS 2.0, and
Atom (RFC 4287). Reference parity note: index.js has no crawl
surface; [EXT] SURVEY §2.

Parsing posture (stated): tolerant TAG-level regex extraction, not a
validating XML parser — crawled sitemaps/feeds are full of undeclared
entities, bad encodings, and truncations, and a strict parser turns
each into a lost discovery batch. The regexes anchor on the exact
protocol elements (<url><loc>..., <item>..., <entry>...); hostile
input yields fewer rows, never an executor failure. Entity decoding
covers the five XML builtins (the protocol requires escaping exactly
these in <loc>).

Scale shape: per-row independent Arrow fan-out (1 sitemap -> N URL
rows); a sitemap index fans out to child-sitemap rows tagged
``kind='sitemap'`` so the frontier loop can fetch-and-recurse.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["parse_sitemap", "parse_feed", "frontier_urls", "frontier_features"]

_XML_ENT = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
}


def _unent(s: str) -> str:
    for k, v in _XML_ENT.items():
        s = s.replace(k, v)
    return s.strip()


_URL_BLOCK = re.compile(r"<url\b[^>]*>(.*?)</url>", re.DOTALL | re.IGNORECASE)
_SITEMAP_BLOCK = re.compile(
    r"<sitemap\b[^>]*>(.*?)</sitemap>", re.DOTALL | re.IGNORECASE
)
_LOC = re.compile(r"<loc\s*>(.*?)</loc>", re.DOTALL | re.IGNORECASE)
_LASTMOD = re.compile(
    r"<lastmod\s*>(.*?)</lastmod>", re.DOTALL | re.IGNORECASE
)
_PRIORITY = re.compile(
    r"<priority\s*>(.*?)</priority>", re.DOTALL | re.IGNORECASE
)


def parse_sitemap(text: str) -> list[dict]:
    """Rows from a sitemap: ``kind='url'`` entries from <urlset>,
    ``kind='sitemap'`` children from <sitemapindex> (the recursion
    hand-off). Each row: {kind, url, lastmod, priority_milli}."""
    out: list[dict] = []
    for kind, block_re in (("url", _URL_BLOCK), ("sitemap", _SITEMAP_BLOCK)):
        for m in block_re.finditer(text):
            block = m.group(1)
            loc = _LOC.search(block)
            if not loc:
                continue
            lastmod = _LASTMOD.search(block)
            prio = _PRIORITY.search(block)
            prio_milli = None
            if prio:
                try:
                    prio_milli = int(round(float(_unent(prio.group(1))) * 1000))
                except ValueError:
                    pass
            out.append(
                {
                    "kind": kind,
                    "url": _unent(loc.group(1)),
                    "lastmod": _unent(lastmod.group(1)) if lastmod else None,
                    "priority_milli": prio_milli,
                }
            )
    return out


_ITEM = re.compile(r"<item\b[^>]*>(.*?)</item>", re.DOTALL | re.IGNORECASE)
_ENTRY = re.compile(
    r"<entry\b[^>]*>(.*?)</entry>", re.DOTALL | re.IGNORECASE
)
_LINK_TEXT = re.compile(r"<link\s*>(.*?)</link>", re.DOTALL | re.IGNORECASE)
_LINK_HREF = re.compile(
    r"<link\b[^>]*?href\s*=\s*[\"']([^\"']+)[\"']", re.IGNORECASE
)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_DATE = re.compile(
    r"<(?:pubDate|updated|published)\s*>(.*?)</(?:pubDate|updated|published)>",
    re.DOTALL | re.IGNORECASE,
)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)


def _text(m: re.Match | None) -> str | None:
    if not m:
        return None
    s = m.group(1)
    c = _CDATA.search(s)
    if c:
        s = c.group(1)
    return _unent(s) or None


def parse_feed(text: str) -> list[dict]:
    """Rows from an RSS <item> or Atom <entry> feed: {kind='item',
    url, title, published}. RSS links are element text; Atom links are
    href attributes (first link wins — rel=alternate leads in
    practice)."""
    out: list[dict] = []
    for block_re in (_ITEM, _ENTRY):
        for m in block_re.finditer(text):
            block = m.group(1)
            link = _text(_LINK_TEXT.search(block))
            if link is None:
                href = _LINK_HREF.search(block)
                link = _unent(href.group(1)) if href else None
            if link is None:
                continue
            out.append(
                {
                    "kind": "item",
                    "url": link,
                    "title": _text(_TITLE.search(block)),
                    "published": _text(_DATE.search(block)),
                }
            )
    return out


def frontier_urls(text: str) -> list[dict]:
    """Sniff + parse a discovery document (sitemap / sitemap index /
    RSS / Atom) into unified frontier rows {kind, url, title,
    lastmod, priority_milli, published}."""
    rows: list[dict] = []
    for r in parse_sitemap(text):
        rows.append(
            {
                "kind": r["kind"],
                "url": r["url"],
                "title": None,
                "lastmod": r["lastmod"],
                "priority_milli": r["priority_milli"],
                "published": None,
            }
        )
    for r in parse_feed(text):
        rows.append(
            {
                "kind": r["kind"],
                "url": r["url"],
                "title": r["title"],
                "lastmod": None,
                "priority_milli": None,
                "published": r["published"],
            }
        )
    return rows


def frontier_features(
    df: DataFrame, text_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow 1->N fan-out of discovery documents into frontier rows
    (id, kind, url, title, lastmod, priority_milli, published)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = [
                "kind",
                "url",
                "title",
                "lastmod",
                "priority_milli",
                "published",
            ]
            out: dict = {id_col: []}
            for c in cols:
                out[c] = []
            for rid, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                for r in frontier_urls(str(txt)):
                    out[id_col].append(int(rid))
                    for c in cols:
                        out[c].append(r[c])
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} long, kind string, url string, title string, "
        "lastmod string, priority_milli long, published string",
    )
