"""HTML -> Markdown conversion (structure-preserving extraction).

Plain-text extraction (operators/htmltext) flattens a page to block
lines — right for dedup/quality signals, but LLM training corpora
increasingly keep document STRUCTURE: headings, lists, links, code
fences survive as lightweight Markdown the tokenizer can learn from
(the approach of the public CommonCrawl-derived corpora that ship
"markdownified" HTML, and of the html2text/markdownify tool family).
This module converts crawled HTML to deterministic CommonMark-style
Markdown in one Arrow pass. Reference parity note: index.js:1-290 has
no document surface — [EXT] LLM-pipeline scope per SURVEY §2.

Mapping (CommonMark constructs only):

- ``h1..h6`` -> ``#``-prefixed headings;
- ``p``/``div``/other block tags -> blank-line-separated paragraphs;
- ``ul``/``ol``/``li`` -> ``-`` / ``1.`` items, children indented by
  the parent marker's width (CommonMark's content column — ``1. ``
  needs 3, ``- `` needs 2), ordered counters per level; a block tag
  inside an open ``li`` (loose items, ``<li><p>..`` ) keeps the item
  marker and continues at the content column;
- ``a href`` -> ``[text](href)`` (empty text falls back to the href);
- ``img`` -> ``![alt](src)``;
- ``strong``/``b`` -> ``**``, ``em``/``i`` -> ``*``, inline ``code``
  -> backticks (a backtick inside the span lengthens the delimiter
  run and pads with spaces, the CommonMark rule);
- ``pre`` -> fenced code block (internal whitespace preserved);
- ``blockquote`` -> ``> `` prefix (nested quotes stack);
- ``hr`` -> ``---``; ``br`` -> hard line break;
- ``table`` -> pipe rows; a leading all-``th`` row becomes the
  header with a ``---`` separator row.

Whitespace collapses outside ``pre``; script/style/head-machinery
subtrees are dropped (the htmltext skip set). Markdown-special
characters in text are NOT escaped by default — for a training
corpus, readable text beats round-trip fidelity — pass
``escape=True`` to backslash-escape the CommonMark specials.

Scale shape: per-row independent, one ``mapInPandas`` Arrow pass, no
shuffle — the Python-rate codec tier (HTMLParser is a Python loop);
the honest envelope belongs in BASELINE.md §C next to the htmltext
row.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from timeseries_data_provider_spark.operators.htmltext import (
    _SKIP_TAGS,
    _VOID_TAGS,
)

__all__ = ["html_to_markdown", "html_markdown"]

_HEADINGS = {f"h{i}": i for i in range(1, 7)}

# block tags that end the current paragraph without their own marker
_PARA_TAGS = frozenset(
    """address article aside body dd div dl dt fieldset figcaption
    figure footer form header main nav p section""".split()
)

_ESCAPE_RE = re.compile(r"([\\`*_{}\[\]()#+\-.!>|])")


class _MdConverter(HTMLParser):
    """Single-pass HTML -> Markdown emitter.

    Output model: ``self.out`` accumulates finished BLOCKS (each a
    string, blank-line-joined at the end); ``self._line`` is the
    in-progress inline run. List/quote state nests via explicit
    stacks — HTMLParser recovers from malformed markup, and the
    stacks saturate at zero rather than raising (hostile crawled
    bytes must not kill an executor)."""

    def __init__(self, escape: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._line: list[str] = []
        self._skip = 0
        self._pre = 0
        self._pre_buf: list[str] = []
        self._quote = 0
        # list stack: [type, counter, marker_emitted, marker_width]
        # per open ul/ol — marker_width feeds child-level indentation
        # (CommonMark content column: "1. " is 3, "- " is 2)
        self._lists: list[list] = []
        self._anchor: list[str | None] = []
        self._cell = False  # inside td/th: block tags don't flush
        self._row: list[str] | None = None
        self._row_is_header = True
        self._table_rows: list[tuple[list[str], bool]] | None = None
        self._in_title = False
        self.escape = escape

    # -- text plumbing -------------------------------------------------

    _BR = "\x00"  # hard-break sentinel: survives whitespace collapse
    _A0 = "\x01"  # anchor-open sentinel (never emitted)
    _C0 = "\x02"  # inline-code-open sentinel (never emitted)

    def _text(self) -> str:
        collapsed = " ".join("".join(self._line).split())
        collapsed = collapsed.replace(self._A0, "")
        collapsed = collapsed.replace(self._C0, "")
        return re.sub(r" ?\x00 ?", "\n", collapsed).strip("\n")

    def _quoted(self, body: str) -> str:
        return "\n".join(
            "> " * self._quote + ln for ln in body.splitlines() or [""]
        )

    def _flush(self, prefix: str = "", kind: str = "block") -> None:
        text = self._text()
        self._line.clear()
        if not text and not prefix:
            return
        body = f"{prefix}{text}" if text or prefix else text
        if self._quote:
            body = self._quoted(body)
            kind = "block"
        self.out.append((kind, body))

    def _emit_fence(self, code: str) -> None:
        # shared fence emitter (was copy-pasted in the </pre> close and
        # the truncated-page recovery — the copies had already drifted
        # on quote prefixing; review finding)
        fence = "```"
        while fence in code:
            fence += "`"
        block = f"{fence}\n{code}\n{fence}"
        if self._quote:
            block = self._quoted(block)
        self.out.append(("block", block))

    def _flush_listitem(self) -> None:
        if not self._lists:
            self._flush()
            return
        if not self._text():  # empty <li></li> or already flushed
            self._line.clear()
            return
        ent = self._lists[-1]
        indent = "".join(" " * e[3] for e in self._lists[:-1])
        if ent[2]:
            # later block inside the SAME <li> (loose item, e.g.
            # <li><p>a</p><p>b</p>): continue at the content column,
            # no second marker (review finding: this used to take the
            # plain _flush path and lose the marker entirely)
            self._flush(indent + " " * ent[3], kind="li")
            return
        marker = f"{ent[1]}. " if ent[0] == "ol" else "- "
        ent[2] = True
        ent[3] = len(marker)
        self._flush(indent + marker, kind="li")

    # -- tag handling ----------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        ad = dict(attrs)
        if tag == "title":
            # document title is head machinery, not body text (pages
            # routinely omit </head>, so head cannot be depth-tracked
            # wholesale — the htmltext rule)
            self._in_title = True
            return
        if tag == "body":
            self._in_title = False  # recovery for missing </title>
        if tag == "pre":
            self._flush()
            self._pre += 1
            return
        if self._pre:
            if tag == "br":
                self._pre_buf.append("\n")
            return
        if tag in _HEADINGS or tag == "table":
            self._flush()
        if tag in ("ul", "ol"):
            # a list opening inside an open <li> flushes the pending
            # item text WITH its marker (the parent item line)
            self._flush_listitem() if self._lists else self._flush()
            self._lists.append([tag, 0, False, 2 if tag == "ul" else 3])
        elif tag == "li":
            # crawled HTML routinely omits </li> — a new item flushes
            # the previous one's pending text under the old counter
            self._flush_listitem()
            if self._lists:
                self._lists[-1][1] += 1
                self._lists[-1][2] = False
        elif tag == "blockquote":
            self._flush()
            self._quote += 1
        elif tag == "a":
            self._anchor.append(ad.get("href"))
            self._line.append(self._A0)  # anchor-open sentinel
        elif tag == "img":
            alt = ad.get("alt") or ""
            src = ad.get("src") or ""
            self._line.append(f"![{alt}]({src})")
        elif tag in ("strong", "b"):
            self._line.append("**")
        elif tag in ("em", "i"):
            self._line.append("*")
        elif tag == "code":
            self._line.append(self._C0)
        elif tag == "br":
            self._line.append(self._BR)
        elif tag == "hr":
            self._flush()
            self.out.append(("block", "---"))
        elif tag == "table":
            self._table_rows = []
        elif tag == "tr":
            self._row = []
            self._row_is_header = True
        elif tag in ("td", "th"):
            self._cell = True
            if tag == "td":
                self._row_is_header = False
        elif tag in _PARA_TAGS and not self._cell:
            # inside an open <li> the pending text must keep its item
            # marker (loose list — review finding: the plain flush
            # dropped every marker on <li><p>text</p></li>)
            self._flush_listitem() if self._lists else self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip -= 1
            return
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "pre":
            # symmetric depth tracking (review finding: resetting to 0
            # made an inner </pre> truncate the outer block and leak
            # the tail out of the fence; <pre/> emitted an empty fence)
            if self._pre:
                self._pre -= 1
                if not self._pre:
                    code = "".join(self._pre_buf).strip("\n")
                    self._pre_buf.clear()
                    if code:
                        self._emit_fence(code)
            return
        if self._pre:
            return
        if tag in _HEADINGS:
            text = self._text()
            self._line.clear()
            if text:
                self.out.append(
                    ("block", "#" * _HEADINGS[tag] + " " + text)
                )
            return
        if tag == "li":
            self._flush_listitem()
        elif tag in ("ul", "ol"):
            self._flush_listitem()
            if self._lists:
                self._lists.pop()
        elif tag == "blockquote":
            self._flush()
            self._quote = max(0, self._quote - 1)
        elif tag == "a":
            href = self._anchor.pop() if self._anchor else None
            text_after = "".join(self._line)
            # close the sentinel opened at start; a block flush inside
            # the anchor may have discarded it (idx < 0) — then the
            # remaining text stays intact and the link renders with
            # its href as the label (review finding: rfind('[') both
            # chopped a character at idx=-1 and mis-split on literal
            # '[' in the anchor text)
            idx = text_after.rfind(self._A0)
            if idx >= 0:
                head = text_after[:idx]
                label = text_after[idx + 1 :].strip()
            else:
                head = text_after
                label = ""
            if href:
                if not label:
                    label = href
                self._line = [head, f"[{label}]({href})"]
            else:
                self._line = [head, label]
        elif tag in ("strong", "b"):
            self._line.append("**")
        elif tag in ("em", "i"):
            self._line.append("*")
        elif tag == "code":
            joined = "".join(self._line)
            idx = joined.rfind(self._C0)
            if idx < 0:
                # unmatched </code>: emit a bare delimiter (legacy)
                self._line.append("`")
            else:
                head, content = joined[:idx], joined[idx + 1 :]
                # CommonMark code span: the delimiter run must be
                # longer than any backtick run inside, space-padded if
                # the content starts/ends with a backtick (ADVICE:
                # <code>a`b</code> used to emit a broken span)
                n = max(
                    (len(r) for r in re.findall(r"`+", content)), default=0
                )
                delim = "`" * (n + 1)
                pad = (
                    " "
                    if content[:1] == "`" or content[-1:] == "`"
                    else ""
                )
                if content:
                    self._line = [head, f"{delim}{pad}{content}{pad}{delim}"]
                else:
                    self._line = [head]
        elif tag in ("td", "th"):
            if self._row is not None:
                # a <br> inside a cell must not break the pipe row
                # (review finding: literal newline made the table
                # structurally invalid)
                self._row.append(
                    self._text().replace("\n", " ").replace("|", "\\|")
                )
                self._line.clear()
            self._cell = False
        elif tag == "tr":
            if self._row is not None and self._table_rows is not None:
                if self._row:
                    self._table_rows.append(
                        (self._row, self._row_is_header)
                    )
                self._row = None
        elif tag == "table":
            rows = self._table_rows or []
            self._table_rows = None
            if rows:
                width = max(len(r) for r, _ in rows)
                lines = []
                first_header = rows[0][1]
                for i, (r, _hdr) in enumerate(rows):
                    r = r + [""] * (width - len(r))
                    lines.append("| " + " | ".join(r) + " |")
                    if i == 0 and first_header:
                        lines.append(
                            "| " + " | ".join(["---"] * width) + " |"
                        )
                self.out.append(("block", "\n".join(lines)))
        elif tag in _PARA_TAGS and not self._cell:
            self._flush_listitem() if self._lists else self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip or self._in_title:
            return
        if self._pre:
            self._pre_buf.append(data)
            return
        if self.escape:
            data = _ESCAPE_RE.sub(r"\\\1", data)
        self._line.append(data)

    def markdown(self) -> str:
        self.close()
        if self._pre and self._pre_buf:
            # truncated page ending inside <pre> (review finding:
            # the buffered code silently vanished)
            self._pre = 0
            code = "".join(self._pre_buf).strip("\n")
            self._pre_buf.clear()
            if code:
                self._emit_fence(code)
        self._flush()
        # consecutive list items join TIGHT (single newline); block
        # boundaries get the usual blank line
        parts: list[str] = []
        prev_kind = None
        for kind, body in self.out:
            if not body.strip():
                continue
            if parts:
                sep = "\n" if kind == "li" and prev_kind == "li" else "\n\n"
                parts.append(sep)
            parts.append(body)
            prev_kind = kind
        return "".join(parts)


def html_to_markdown(html: str, escape: bool = False) -> str:
    """Convert one HTML document to CommonMark-style Markdown (see
    the module docstring for the construct mapping). Malformed markup
    never raises — HTMLParser recovers and the converter's stacks
    saturate at zero."""
    c = _MdConverter(escape=escape)
    c.feed(html)
    return c.markdown()


def html_markdown(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    escape: bool = False,
) -> DataFrame:
    """Distributed conversion: (id, html) -> (id, markdown, n_md_chars)
    in one Arrow pass. NULL html stays NULL (fetch failures remain
    distinguishable from empty pages, the html_text_features rule)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "markdown": [], "n_md_chars": []}
            for rid, doc in zip(pdf[id_col], pdf[html_col]):
                out[id_col].append(rid)
                if doc is None or (isinstance(doc, float) and pd.isna(doc)):
                    out["markdown"].append(None)
                    out["n_md_chars"].append(None)
                    continue
                md = html_to_markdown(str(doc), escape=escape)
                out["markdown"].append(md)
                out["n_md_chars"].append(len(md))
            yield pd.DataFrame(out)

    return df.select(id_col, html_col).mapInPandas(
        run, f"{id_col} long, markdown string, n_md_chars long"
    )
