"""Tolerant extraction envelope — the shared Arrow-batched runner
behind every ``*_features`` operator, with an opt-in quarantine mode.

The extraction tiers (WARC, PDF, OOXML, OLE2, RTF, email, codecs)
deliberately raise named errors on malformed input — the loud
contract that keeps fixtures honest. On a REAL 100 TB crawl batch
that posture is fatal: one damaged file kills a task, and after the
scheduler's retries, the job. The reference resolves the same
tension by null-guarding and *skipping* a failed extraction
(index.js:246 drops a response whose transform yields nothing);
this module generalizes that skip posture without losing the error:

- ``errors="raise"`` (DEFAULT — posture unchanged): any extraction
  failure propagates and fails the task. Output schema is exactly
  the feature schema.
- ``errors="quarantine"``: a failing row emits a single side row
  ``(id, <features all NULL>, err_class, err_msg)`` instead of
  killing the batch; healthy rows carry NULL ``err_class``. The
  job survives, and the damage is *data* — routable to a side sink,
  countable, groupable by error class — exactly what a production
  ingest needs (`WHERE err_class IS NOT NULL` is the quarantine
  sink; ``IS NULL`` the clean tier).

Scale shape: identical to the raw operators — per-document
independent, zero shuffle, one Arrow batch in / one out. The
try/except adds nothing measurable next to parsing work (§C
``quarantine`` stress row in BASELINE.md).

Reference parity: index.js:246 (skip-on-damage precedent); [EXT]
SURVEY §2 / VERDICT r11 top-next item.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extraction_envelope",
    "single_row_features",
    "quarantine_split",
]

_MAX_MSG = 400  # error text cap: bounded side-row width by design


def extraction_envelope(
    df: DataFrame,
    per_row: Callable[[int, bytes], list[dict]],
    columns: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    blob_col: str = "payload",
    errors: str = "raise",
) -> DataFrame:
    """Run ``per_row(id, blob) -> [row dict, ...]`` over every
    (id, blob) pair, Arrow-batched, 1->N fan-out.

    ``columns`` is the feature schema as (name, DDL type) pairs,
    EXCLUDING the id column (always emitted first as long). With
    ``errors="quarantine"`` the schema gains trailing
    ``err_class string, err_msg string`` and failures become side
    rows instead of task kills. NULL ids/payloads drop JVM-side in
    both modes (the cdc_chunks guard — the reference's own
    null-skip, index.js:246).
    """
    if errors not in ("raise", "quarantine"):
        raise ValueError(
            f"extraction_envelope: errors={errors!r} "
            "('raise' or 'quarantine')"
        )
    quarantine = errors == "quarantine"
    names = [n for n, _ in columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            out: dict[str, list] = {id_col: []}
            for c in names:
                out[c] = []
            if quarantine:
                out["err_class"] = []
                out["err_msg"] = []
            for rid, blob in zip(pdf_[id_col], pdf_[blob_col]):
                rid = int(rid)
                try:
                    rows = per_row(rid, bytes(blob))
                except Exception as e:  # noqa: BLE001 — quarantine
                    # catches EVERYTHING (ValueError contract plus
                    # any codec leak) so one damaged file can never
                    # kill a 100 TB batch; raise-mode rethrows
                    if not quarantine:
                        raise
                    out[id_col].append(rid)
                    for c in names:
                        out[c].append(None)
                    out["err_class"].append(type(e).__name__)
                    out["err_msg"].append(str(e)[:_MAX_MSG])
                    continue
                for r in rows:
                    out[id_col].append(rid)
                    for c in names:
                        out[c].append(r.get(c))
                    if quarantine:
                        out["err_class"].append(None)
                        out["err_msg"].append(None)
            yield pd.DataFrame(out)

    schema = f"{id_col} long, " + ", ".join(
        f"{n} {t}" for n, t in columns
    )
    if quarantine:
        schema += ", err_class string, err_msg string"
    return (
        df.select(id_col, blob_col)
        .where(F.col(id_col).isNotNull() & F.col(blob_col).isNotNull())
        .mapInPandas(run, schema)
    )


def single_row_features(
    df: DataFrame,
    extract: Callable[[bytes], dict],
    columns: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    blob_col: str = "payload",
    errors: str = "raise",
    derive: dict[str, Callable[[dict], object]] | None = None,
) -> DataFrame:
    """Envelope adapter for the common one-doc -> one-row extractors
    (``extract(blob) -> dict`` keyed by the feature columns).
    ``derive`` supplies columns computed FROM the extract dict (the
    recurring ``n_chars = len(m["text"])``)."""
    derive = derive or {}

    def per_row(rid: int, blob: bytes) -> list[dict]:
        m = extract(blob)
        return [
            {
                n: derive[n](m) if n in derive else m[n]
                for n, _ in columns
            }
        ]

    return extraction_envelope(
        df,
        per_row,
        columns,
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) views of a quarantine-mode output —
    sugar for the two sinks a production ingest writes."""
    return (
        df.where(F.col("err_class").isNull()).drop(
            "err_class", "err_msg"
        ),
        df.where(F.col("err_class").isNotNull()),
    )
