"""Subtitle parsing: SRT + WebVTT -> timed cues and transcripts.

Subtitles/captions are the TEXT of a video corpus — the alignment
layer speech models train on and the transcript text pipeline a video
crawl feeds into the normal curation stack. Public-knowledge basis:
the SubRip (.srt) de-facto format and WebVTT (W3C). Reference parity
note: index.js has no media surface; [EXT] SURVEY §2.

Parsing posture: tolerant, like the crawl parsers — malformed cue
blocks are SKIPPED (counted), never fatal; timestamps are exact
integer milliseconds; simple inline tags (<i>, <b>, <c.class>) are
stripped from cue text with the in-repo HTML rules kept out of it (a
plain tag regex — VTT "tags" are not HTML).

Scale shape: per-row independent Arrow 1->N fan-out (one row per
cue); ``transcript`` collapses cues back to one text per document
(concat in cue order) for the curation stack.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_cues", "subtitle_cues", "transcripts"]

_TS = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_CUE_LINE = re.compile(
    r"^\s*(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})\s*-->\s*"
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_TAG = re.compile(r"</?[A-Za-z][^>\n]*>")


def _ms(h, m, s, ms) -> int:
    return (
        (int(h) if h else 0) * 3_600_000
        + int(m) * 60_000
        + int(s) * 1000
        + int(ms)
    )


def parse_cues(text: str) -> tuple[list[dict], int]:
    """Parse an SRT or WebVTT document into cue dicts
    ({idx, start_ms, end_ms, text}) plus a skipped-block count.
    Dialect differences handled: optional WEBVTT header + metadata
    blocks, optional numeric cue identifiers, ``,`` vs ``.`` milli
    separators, optional hours field, VTT cue settings after the
    timestamp line, inline tags stripped."""
    cues: list[dict] = []
    skipped = 0
    blocks = re.split(r"\r?\n\r?\n+", text.strip())
    idx = 0
    for block in blocks:
        lines = [ln for ln in block.splitlines()]
        if not lines:
            continue
        head = lines[0].strip()
        if head.startswith(("WEBVTT", "NOTE", "STYLE", "REGION")):
            continue
        # optional identifier line before the timestamp line
        ts_line = None
        body_start = None
        for i in (0, 1):
            if i < len(lines) and _CUE_LINE.match(lines[i]):
                ts_line = lines[i]
                body_start = i + 1
                break
        if ts_line is None:
            skipped += 1
            continue
        m = _CUE_LINE.match(ts_line)
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end < start:
            skipped += 1
            continue
        body = " ".join(
            _TAG.sub("", ln).strip() for ln in lines[body_start:]
        ).strip()
        body = " ".join(body.split())
        if not body:
            skipped += 1
            continue
        cues.append(
            {"idx": idx, "start_ms": start, "end_ms": end, "text": body}
        )
        idx += 1
    return cues, skipped


def subtitle_cues(
    df: DataFrame, text_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow 1->N fan-out: one row per cue — (id, cue_idx, start_ms,
    end_ms, text, n_skipped on every row for observability)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [],
                "cue_idx": [],
                "start_ms": [],
                "end_ms": [],
                "text": [],
                "n_skipped": [],
            }
            for rid, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                cues, skipped = parse_cues(str(txt))
                for c in cues:
                    out[id_col].append(int(rid))
                    out["cue_idx"].append(c["idx"])
                    out["start_ms"].append(c["start_ms"])
                    out["end_ms"].append(c["end_ms"])
                    out["text"].append(c["text"])
                    out["n_skipped"].append(skipped)
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} long, cue_idx long, start_ms long, end_ms long, "
        "text string, n_skipped long",
    )


def transcripts(cues: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse cue rows to one transcript per document (cue order,
    newline-joined) + duration/word stats — the (doc_id, text) frame
    the curation stack consumes. All JVM."""
    return (
        cues.groupBy(id_col)
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("cue_idx", "text"))
                ).getField("text"),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_cues"),
            F.max("end_ms").alias("duration_ms"),
        )
    )