"""Unicode text normalization + mojibake repair (corpus cleaning).

Every LLM corpus build normalizes text before dedup/tokenization:
equivalent byte sequences must compare equal (NFC/NFKC), control
characters must go, and the web's most common encoding damage —
UTF-8 bytes decoded as Latin-1/cp1252 ("cafÃ©") — must be repaired
or the same sentence dedups as two documents and tokenizes as
garbage. Public-knowledge basis: Unicode UAX #15 normalization
(stdlib unicodedata) and the ftfy family's core observation
(Speer, "fixing Unicode the hard way") — implemented here as ONE
conservative, deterministic rule rather than ftfy's full heuristic
stack (stated; the rule below never changes clean text).

Mojibake rule (exact, testable): re-encode the string PER CHARACTER
as cp1252 with the five cp1252 holes patched to their C1 codepoints
(ftfy's sloppy-windows-1252; a latin-1 decode of UTF-8 bytes puts
real U+0080-U+009F characters in the string, possibly MIXED with
cp1252-mapped punctuation in the same string);
if the encode succeeds, the bytes STRICTLY decode as UTF-8, and the
decode is SHORTER than the input, accept the repair — genuine
mojibake always satisfies all three (multi-byte UTF-8 shows as 2-3
chars per character), while ordinary accented text fails the
shorter-decode test and passes through untouched. Applied to
fixpoint (double-encoded mojibake unwinds), bounded at 4 rounds.

Order matters and is fixed here: repair runs BEFORE control
stripping — latin-1 mojibake carries its UTF-8 continuation bytes
as C1 "control" characters, and stripping them first would destroy
exactly the evidence the repair needs.

Scale shape: the repair + NFC/NFKC tier is one Arrow-batched pass
(stdlib unicodedata — per-row independent, linear in chars, the
BPE-tier rate class); control/whitespace hygiene is JVM regexp
afterwards.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fix_mojibake",
    "normalize_text",
    "strip_controls",
    "clean_text",
]

# C0 controls except \t \n \r, plus DEL and the C1 range
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"


def strip_controls(col: Column) -> Column:
    """JVM-side control-character removal (keeps tab/newline/CR)."""
    return F.regexp_replace(col, _CONTROL_RE, "")


def _reencode(s: str) -> bytes | None:
    """Per-character cp1252 encode, falling back to the latin-1 byte
    for any U+0000-U+00FF character cp1252 can't encode (the C1
    range, incl. the five cp1252 holes — ftfy's sloppy-windows-1252
    observation). An all-or-nothing two-codec fallback left MIXED
    damage (cp1252-mapped punctuation + a raw C1 char in the same
    string, e.g. latin-1-decoded U+0080 next to cp1252-decoded
    U+2019) unrepaired (ADVICE r9)."""
    try:
        # fast path: the clean-text majority encodes wholesale at C
        # speed (review finding: an unconditional per-character loop
        # slowed the ingest hot path ~10x for nothing)
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp > 0xFF:
                return None
            out.append(cp)
    return bytes(out)


def fix_mojibake(s: str, max_rounds: int = 4) -> str:
    """Repair UTF-8-read-as-cp1252/latin-1 damage per the module's
    exact rule; clean text passes through unchanged."""
    for _ in range(max_rounds):
        raw = _reencode(s)
        if raw is None:
            return s
        try:
            decoded = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if len(decoded) >= len(s):
            return s
        s = decoded
    return s


def normalize_text(s: str, form: str = "NFKC", repair: bool = True) -> str:
    """One document through the Python tier: mojibake repair (opt-out)
    then Unicode normalization."""
    if repair:
        s = fix_mojibake(s)
    return unicodedata.normalize(form, s)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFKC",
    repair: bool = True,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Corpus cleaning pass: ONE Arrow pass for mojibake repair +
    NFC/NFKC, then JVM control stripping (in that order — see the
    module docstring) and optional whitespace collapsing. Adds
    ``was_changed`` so the cleaning rate is one aggregate away (the
    corpus-health metric); all other columns pass through."""
    out_cols = df.columns
    prepped = df.withColumn("__orig", F.col(text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed = [
                None
                if t is None
                else normalize_text(str(t), form=form, repair=repair)
                for t in pdf[text_col]
            ]
            pdf = pdf.copy()
            pdf[text_col] = fixed
            yield pdf

    cleaned = prepped.mapInPandas(run, prepped.schema)
    result = cleaned.withColumn(
        text_col, strip_controls(F.col(text_col))
    )
    if collapse_whitespace:
        result = result.withColumn(
            text_col,
            F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")),
        )
    return result.withColumn(
        "was_changed",
        ~F.col(text_col).eqNullSafe(F.col("__orig")),
    ).select(*out_cols, "was_changed")