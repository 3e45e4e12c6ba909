"""HTML -> text extraction and boilerplate removal (crawl front end).

The step between a crawl archive (sources/warc.py) and the text
pipeline: crawled corpora arrive as HTML, and every downstream signal
(dedup, quality, LM scoring, tokenization) wants the visible text with
navigation/boilerplate stripped. Reference parity note: the reference
(index.js:1-290) has no document surface at all — this module is [EXT]
LLM-pipeline scope per SURVEY §2.

Public-knowledge basis only:

- Parsing: Python stdlib ``html.parser.HTMLParser`` with
  ``convert_charrefs=True`` (entity decoding in the data callbacks,
  CDATA handling for <script>/<style> built in).
- Boilerplate: the link-density block heuristic from Boilerpipe
  (Kohlschuetter, Fankhauser, Nejdl — "Boilerplate Detection using
  Shallow Text Features", WSDM 2010) and jusText (Pomikalek 2011):
  segment the page into block-level text blocks, then drop blocks
  whose anchor-text fraction exceeds a threshold (navigation, footers,
  tag clouds) or that carry fewer than ``min_words`` words. We keep
  the deterministic core (link density + word count) and skip the
  stopword-density refinement — it needs a language-specific stopword
  list and the downstream quality operators (text.quality_score,
  lm.ngram_lm_score) already cover that axis.

Scale shape: extraction is per-row independent — one Arrow-batched
pass (``mapInPandas``), no shuffle, linear in bytes. Like the image
codecs it is a Python-rate tier (HTMLParser is a Python loop), so the
honest envelope lives in BASELINE.md §C, not in plan structure.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "Block",
    "extract_blocks",
    "html_to_text",
    "html_meta",
    "html_text_features",
    "html_links",
]

# Tags whose start OR end flushes the current text buffer into a block.
# (The HTML5 "flow content that establishes a paragraph break" set —
# enough to segment real pages; unknown tags are treated as inline.)
_BLOCK_TAGS = frozenset(
    """address article aside blockquote body dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr li main
    nav ol p pre section table td th tr ul""".split()
)

# Subtrees whose character data is never visible text. ``head`` is
# deliberately NOT here: crawled pages routinely omit </head>, and a
# depth-tracked head would then swallow the whole body. Its children
# are handled individually instead (title via the title buffer,
# script/style here, meta/link carry no data).
_SKIP_TAGS = frozenset(
    "script style noscript template svg math iframe".split()
)

# HTML void elements never nest — their end tags are implicit, so the
# skip/anchor depth counters must not expect a matching endtag.
_VOID_TAGS = frozenset(
    """area base br col embed hr img input link meta param source
    track wbr""".split()
)


@dataclass
class Block:
    """One block-level text run: normalized text plus the raw character
    counts the boilerplate rule needs (``n_chars``/``link_chars`` are
    counted over the decoded data segments BEFORE whitespace collapse,
    so density is well-defined even for whitespace-heavy markup)."""

    text: str
    n_chars: int
    link_chars: int
    n_words: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.n_chars if self.n_chars else 0.0


class _Extractor(HTMLParser):
    """Single-pass block segmenter + metadata collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._n_chars = 0
        self._link_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        # metadata
        self.title: str | None = None
        self.lang: str | None = None
        self.description: str | None = None
        self.canonical: str | None = None
        # OpenGraph properties (og:*) and raw JSON-LD blocks — the
        # structured-metadata layer a crawl pipeline routes on
        # (article vs product vs video) before extracting anything
        self.og: dict[str, str] = {}
        self.jsonld: list[str] = []
        self.links: list[str] = []  # anchor hrefs, document order
        # anchor text per link, aligned with self.links (captured
        # between the anchor's open and close; nested text counts
        # toward every open anchor)
        self.link_texts: list[str] = []
        self._open_anchors: list[tuple[int, list[str]]] = []
        self._in_jsonld = False
        self._jsonld_buf: list[str] = []
        self._in_title = False
        self._title_buf: list[str] = []

    # -- block machinery ---------------------------------------------

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append(
                Block(
                    text=text,
                    n_chars=self._n_chars,
                    link_chars=self._link_chars,
                    n_words=len(text.split()),
                )
            )
        self._buf.clear()
        self._n_chars = 0
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "html" and self.lang is None:
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v
        elif tag == "meta":
            ad = dict(attrs)
            if (
                ad.get("name", "").lower() == "description"
                and self.description is None
            ):
                self.description = ad.get("content")
            prop = (ad.get("property") or "").lower()
            if prop.startswith("og:") and prop not in self.og:
                self.og[prop] = ad.get("content") or ""
        elif tag == "link":
            ad = dict(attrs)
            if (
                ad.get("rel", "").lower() == "canonical"
                and self.canonical is None
            ):
                self.canonical = ad.get("href")
        if tag == "title" and not self._skip_depth:
            # skip-depth guard: <svg><title> is a shape label, not the
            # document title
            self._in_title = True
        elif tag == "body":
            # recovery for pages missing </title>: body content must
            # never accumulate into the title buffer
            self._finish_title()
        if tag == "script" and not self._skip_depth:
            ad = dict(attrs)
            if (ad.get("type") or "").lower() == "application/ld+json":
                self._in_jsonld = True
                self._jsonld_buf = []
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
            href = next(
                (v for k, v in attrs if k == "href" and v), None
            )
            if href is not None:
                self.links.append(href)
                self.link_texts.append("")
                self._open_anchors.append((len(self.links) - 1, []))
            else:
                # placeholder keeps </a> pops aligned — an href-less
                # inner <a> must not steal the outer link's close
                # (review finding)
                self._open_anchors.append((None, []))
        elif tag == "br":
            self._buf.append(" ")
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <div/> style self-closing: same flush semantics, no depth.
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth -= 1
        if tag == "a" and not self._skip_depth:
            self._anchor_depth = max(0, self._anchor_depth - 1)
            # close the anchor the starttag half just opened — leaving
            # the entry on the stack made a stale <a/> accumulate every
            # later anchor's text (review finding: <a href="/x"/> was
            # credited with the NEXT anchor's text)
            if self._open_anchors:
                idx, buf = self._open_anchors.pop()
                if idx is not None:
                    self.link_texts[idx] = " ".join(
                        "".join(buf).split()
                    )

    def _finish_title(self) -> None:
        if self._in_title and self.title is None:
            self.title = " ".join("".join(self._title_buf).split())
        self._in_title = False

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._finish_title()
        if tag == "script" and self._in_jsonld:
            block = "".join(self._jsonld_buf).strip()
            if block:
                self.jsonld.append(block)
            self._in_jsonld = False
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            if self._open_anchors:
                idx, buf = self._open_anchors.pop()
                if idx is not None:
                    self.link_texts[idx] = " ".join(
                        "".join(buf).split()
                    )
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_buf.append(data)
            return
        if self._in_jsonld:
            self._jsonld_buf.append(data)
            return
        if self._skip_depth:
            return
        self._buf.append(data)
        self._n_chars += len(data)
        if self._anchor_depth:
            self._link_chars += len(data)
            for _idx, buf in self._open_anchors:
                buf.append(data)

    def close(self) -> None:  # noqa: D102 — flush the trailing block
        super().close()
        self._finish_title()
        while self._open_anchors:  # unclosed <a> at EOF
            idx, buf = self._open_anchors.pop()
            if idx is not None:
                self.link_texts[idx] = " ".join("".join(buf).split())
        self._flush()


def extract_blocks(html: str) -> list[Block]:
    """Segment ``html`` into block-level text runs.

    Character data inside ``_SKIP_TAGS`` subtrees (script/style/head
    etc.) is dropped; entities are decoded; whitespace is collapsed
    per block. Malformed markup never raises — ``HTMLParser`` is
    recovery-oriented by construction, which is the right contract for
    crawled bytes (a hostile page must not kill an executor)."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return p.blocks


def _keep(b: Block, max_link_density: float, min_words: int) -> bool:
    return b.link_density <= max_link_density and b.n_words >= min_words


def html_to_text(
    html: str,
    drop_boilerplate: bool = True,
    max_link_density: float = 0.5,
    min_words: int = 1,
) -> str:
    """Visible text of ``html``, one line per kept block.

    With ``drop_boilerplate`` (default), blocks whose anchor-text
    fraction exceeds ``max_link_density`` or with fewer than
    ``min_words`` words are removed — the Boilerpipe/jusText core
    rule. ``drop_boilerplate=False`` keeps every non-empty block (the
    raw-extraction mode a contamination scan wants: boilerplate can
    still leak eval data)."""
    blocks = extract_blocks(html)
    if drop_boilerplate:
        blocks = [b for b in blocks if _keep(b, max_link_density, min_words)]
    return "\n".join(b.text for b in blocks)


def html_meta(html: str) -> dict:
    """Routing metadata: title, <html lang>, meta description,
    canonical link — the fields a crawl pipeline dedups and routes on
    before extracting anything."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return {
        "title": p.title,
        "lang": p.lang,
        "description": p.description,
        "canonical": p.canonical,
        "og": dict(p.og),
        "jsonld": list(p.jsonld),
        "links": list(p.links),
    }


def html_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow 1->N out-link fan-out: one row per anchor href in
    document order, WITH its anchor text (r10 — the classic
    relevance/description signal for the link's target) — the raw
    edge list of the crawl's link graph (operators/linkgraph builds
    the quality prior from it; ``linkgraph.anchor_text_agg``
    aggregates the per-target text profile)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [],
                "link_idx": [],
                "href": [],
                "anchor_text": [],
            }
            for rid, doc in zip(pdf[id_col], pdf[html_col]):
                if doc is None:
                    continue
                p = _Extractor()
                p.feed(doc)
                p.close()
                for i, href in enumerate(p.links):
                    out[id_col].append(rid)
                    out["link_idx"].append(i)
                    out["href"].append(href)
                    out["anchor_text"].append(p.link_texts[i])
            yield pd.DataFrame(out)

    return df.select(id_col, html_col).mapInPandas(
        run,
        f"{id_col} long, link_idx long, href string, "
        "anchor_text string",
    )


def html_text_features(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
    min_words: int = 1,
) -> DataFrame:
    """Distributed extraction: one Arrow pass over (id, html) rows ->
    (id, title, html_lang, n_blocks, n_boiler_blocks, text,
    n_text_chars). ``text`` is the boilerplate-cleaned extraction
    (newline-joined kept blocks); ``n_blocks`` counts every non-empty
    block BEFORE the drop so the removal rate is observable. NULL html
    rows produce NULL features (not empty strings) so upstream fetch
    failures stay distinguishable from genuinely empty pages."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = (
                "title",
                "html_lang",
                "n_blocks",
                "n_boiler_blocks",
                "text",
                "n_text_chars",
                "og_title",
                "og_type",
                "n_jsonld",
            )
            out: dict = {id_col: []}
            for k in cols:
                out[k] = []
            for rid, doc in zip(pdf[id_col], pdf[html_col]):
                out[id_col].append(rid)
                if doc is None or (isinstance(doc, float) and pd.isna(doc)):
                    for k in cols:
                        out[k].append(None)
                    continue
                p = _Extractor()
                p.feed(doc)
                p.close()
                kept = [
                    b
                    for b in p.blocks
                    if _keep(b, max_link_density, min_words)
                ]
                text = "\n".join(b.text for b in kept)
                out["title"].append(p.title)
                out["html_lang"].append(p.lang)
                out["n_blocks"].append(len(p.blocks))
                out["n_boiler_blocks"].append(len(p.blocks) - len(kept))
                out["text"].append(text)
                out["n_text_chars"].append(len(text))
                out["og_title"].append(p.og.get("og:title"))
                out["og_type"].append(p.og.get("og:type"))
                out["n_jsonld"].append(len(p.jsonld))
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, title string, html_lang string, "
        "n_blocks long, n_boiler_blocks long, text string, "
        "n_text_chars long, og_title string, og_type string, "
        "n_jsonld long"
    )
    return df.select(id_col, html_col).mapInPandas(run, schema)
