"""RTF text extraction — stdlib-only control-word parser.

RTF (Rich Text Format) predates OOXML as the Word interchange format
and survives in crawl corpora as email attachments, legal filings
and legacy exports. The format is a public Microsoft specification
(RTF 1.9.1): a brace-grouped stream of control words (``\\par``),
control symbols (``\\'hh``), and plain text.

Extraction contract (deterministic, stated):

- ``\\par``/``\\line``/``\\row`` end a line; ``\\tab``/``\\cell``
  emit TAB; group structure otherwise does not affect text;
- ``\\'hh`` decodes through the document's ``\\ansicpg`` code page
  (cp1252 when absent — the real-world default); ``\\uN`` emits the
  Unicode scalar and skips the following ``\\ucN``-many fallback
  bytes (the spec's substitution protocol, per-group state);
- destination groups that carry NON-document text (``\\fonttbl``,
  ``\\stylesheet``, ``\\colortbl``, ``\\info``, ``\\pict``,
  ``\\*\\<anything>`` …) are skipped whole; ``\\bin N`` skips N raw
  bytes (which may contain braces — counted, not scanned);
- malformed input (not RTF, unbalanced braces beyond tolerance) is a
  named ValueError, never silently-wrong text.

Scale shape: per-document independent (Arrow fan-out), zero shuffle.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rtf_text", "encode_rtf", "rtf_features"]

# destinations whose content is NOT document text (spec part 1; the
# \* prefix marks every "skip if unknown" destination and is honored
# wholesale)
_SKIP_DESTS = {
    "fonttbl",
    "stylesheet",
    "colortbl",
    "info",
    "pict",
    "object",
    "header",
    "footer",
    "footnote",
    "annotation",
    "xe",
    "tc",
    "field",  # field instructions; \fldrslt carries the visible text
    "themedata",
    "colorschememapping",
    "listtable",
    "listoverridetable",
    "latentstyles",
    "datastore",
}
# groups that re-enter document text inside a skipped \field
_TEXT_DESTS = {"fldrslt"}

_CTRL = re.compile(rb"([a-z]+)(-?\d+)? ?", re.ASCII)


def rtf_text(blob: bytes) -> dict:
    """Extract an RTF document's text: {title, n_paragraphs, text}.
    Title comes from the ``\\title`` destination inside ``\\info``
    (the one info member that IS wanted)."""
    if not blob.startswith(b"{\\rtf"):
        raise ValueError("rtf: missing {\\rtf header")
    codec = "cp1252"
    pend_high = 0  # UTF-16 high surrogate awaiting its pair
    out: list[str] = []
    title: list[str] = []
    # group state stack: (skip_why, uc_count, in_title) —
    # skip_why is None (emitting) or the destination word that
    # caused the skip; \*\fldrslt may only clear a "field"-induced
    # skip, never an arbitrary ancestor's (r11 ADVICE catch)
    stack: list[tuple[str | None, int, bool]] = []
    skip_why, uc, in_title = None, 1, False
    # start after '{' so the \rtfN control word (and its parameter)
    # parse as a control word, not as leaked text
    i, n = 1, len(blob)
    n_par = 0
    while i < n:
        c = blob[i]
        if c == 0x7B:  # {
            stack.append((skip_why, uc, in_title))
            if len(stack) > 256:
                raise ValueError("rtf: group nesting too deep")
            i += 1
            # \* destination: skip unless a known text destination
            if blob[i : i + 2] == b"\\*":
                j = i + 2
                m = _CTRL.match(blob, j + 1)
                if m and m.group(1).decode() in _TEXT_DESTS:
                    # \*\fldrslt: visible text even when the parent
                    # group (the \field) is being skipped — but only
                    # a FIELD-induced skip; a field result nested in
                    # \stylesheet/\pict etc. stays hidden
                    if skip_why in (None, "field"):
                        skip_why = None
                    i = m.end()
                else:
                    if skip_why in (None, "field"):
                        skip_why = "star"
            continue
        if c == 0x7D:  # }
            if not stack:
                break  # tolerant: trailer junk after the root close
            skip_why, uc, in_title = stack.pop()
            i += 1
            continue
        if c != 0x5C:  # plain text run
            j = i
            while j < n and blob[j] not in b"\\{}":
                j += 1
            if skip_why is None or in_title:
                text = blob[i:j].replace(b"\r", b"").replace(b"\n", b"")
                if text:
                    (title if in_title else out).append(
                        text.decode(codec, "replace")
                    )
            i = j
            continue
        # control word / symbol
        i += 1
        if i >= n:
            break
        c2 = blob[i]
        if c2 == 0x27:  # \'hh hex byte
            h = blob[i + 1 : i + 3]
            i += 3
            if skip_why is None or in_title:
                try:
                    ch = bytes([int(h, 16)]).decode(codec, "replace")
                except ValueError:
                    raise ValueError("rtf: malformed \\'hh escape")
                (title if in_title else out).append(ch)
            continue
        if c2 in b"\\{}":  # escaped delimiter
            if skip_why is None or in_title:
                (title if in_title else out).append(chr(c2))
            i += 1
            continue
        if c2 == 0x7E:  # \~ non-breaking space
            if skip_why is None or in_title:
                (title if in_title else out).append(" ")
            i += 1
            continue
        if c2 in b"-_:|":  # optional hyphen etc. — no text
            i += 1
            continue
        m = _CTRL.match(blob, i)
        if not m:
            i += 1  # unknown control symbol: ignore
            continue
        word = m.group(1).decode()
        param = int(m.group(2)) if m.group(2) else None
        i = m.end()
        if word == "bin":
            i += max(0, param or 0)  # raw bytes: counted, not parsed
            continue
        if word == "ansicpg" and param:
            try:
                b"\x41".decode(f"cp{param}")
                codec = f"cp{param}"
            except LookupError:
                pass  # unknown code page: keep the cp1252 default
            continue
        if word == "u" and param is not None:
            if skip_why is None or in_title:
                cp = param + 65536 if param < 0 else param
                # astral chars arrive as \u surrogate PAIRS (the
                # \u parameter is signed 16-bit by spec)
                if 0xD800 <= cp <= 0xDBFF:
                    pend_high = cp
                    ch = ""
                elif 0xDC00 <= cp <= 0xDFFF and pend_high:
                    ch = chr(
                        0x10000
                        + ((pend_high - 0xD800) << 10)
                        + (cp - 0xDC00)
                    )
                    pend_high = 0
                elif 0xDC00 <= cp <= 0xDFFF:
                    ch = "\ufffd"  # unpaired low surrogate
                else:
                    if pend_high:
                        (title if in_title else out).append("\ufffd")
                        pend_high = 0
                    ch = chr(cp) if cp <= 0x10FFFF else "\ufffd"
                if ch:
                    (title if in_title else out).append(ch)
            # skip the \ucN fallback bytes (default 1)
            skip = uc
            while skip > 0 and i < n:
                if blob[i : i + 2] == b"\\'":
                    i += 4
                elif blob[i] in b"\\{}":
                    break  # fallback may be absent before a delimiter
                else:
                    i += 1
                skip -= 1
            continue
        if word == "uc" and param is not None:
            uc = param
            continue
        if word in ("par", "line", "row", "sect", "page"):
            if skip_why is None:
                out.append("\n")
                if word == "par":
                    n_par += 1
            continue
        if word in ("tab", "cell"):
            if skip_why is None:
                out.append("\t")
            continue
        if word == "title":
            in_title = True
            if skip_why == "info":
                skip_why = None
            continue
        if word in _SKIP_DESTS:
            # a nested dest overwrites a field-induced reason (so a
            # \pict inside a \field hides its fldrslt) but never a
            # non-field ancestor's reason
            if skip_why in (None, "field"):
                skip_why = word
            continue
        if word in _TEXT_DESTS:
            if skip_why in (None, "field"):
                skip_why = None
            continue
        # every other control word is formatting: no text effect
    text = "".join(out)
    text = re.sub(r"\n{2,}", "\n", text).strip("\n")
    return {
        "title": "".join(title) or None,
        "n_paragraphs": n_par,
        "text": text,
    }


def _rtf_escape_char(ch: str) -> str:
    o = ord(ch)
    if 32 <= o < 128:
        return ch
    try:
        (b,) = ch.encode("cp1252")
        return f"\\'{b:02x}"
    except UnicodeEncodeError:
        pass
    if o <= 0xFFFF:
        return f"\\u{o if o < 32768 else o - 65536}?"
    # astral: UTF-16 surrogate pair, each signed 16-bit
    hi, lo = (
        0xD800 + ((o - 0x10000) >> 10),
        0xDC00 + ((o - 0x10000) & 0x3FF),
    )
    return f"\\u{hi - 65536}?\\u{lo - 65536}?"


def encode_rtf(
    paragraphs: list[str], title: str | None = None
) -> bytes:
    """Fixture writer: cp1252-representable chars write literally
    (non-ASCII via \\'hh), everything else as \\uN with a '?'
    fallback byte."""
    body = []
    if title is not None:
        enc = "".join(_rtf_escape_char(ch) for ch in title)
        body.append(r"{\info{\title " + enc + "}}")
    for p in paragraphs:
        run = []
        for ch in p:
            o = ord(ch)
            if ch == "\t":
                run.append(r"\tab ")
            elif ch in "\\{}":
                run.append("\\" + ch)
            elif o < 128:
                run.append(ch)
            else:
                run.append(_rtf_escape_char(ch))
        body.append("".join(run) + r"\par ")
    return (
        r"{\rtf1\ansi\ansicpg1252\uc1 "
        + r"{\fonttbl{\f0 Times New Roman;}}"
        + "".join(body)
        + "}"
    ).encode("cp1252", "replace")


def rtf_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched RTF extraction: (id, title, n_paragraphs, text,
    n_chars). NULL ids/payloads drop JVM-side. ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged inputs instead of
    killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        single_row_features,
    )

    return single_row_features(
        df,
        rtf_text,
        [
            ("title", "string"),
            ("n_paragraphs", "long"),
            ("text", "string"),
            ("n_chars", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
        derive={"n_chars": lambda m: len(m["text"])},
    )


