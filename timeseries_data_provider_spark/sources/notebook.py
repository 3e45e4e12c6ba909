"""Jupyter notebook (.ipynb) extraction — stdlib json.

Notebooks are a first-class code-corpus source (The Stack and its
successors mine them alongside plain source files); the format is
public (nbformat 4: a JSON document of typed cells). Extraction
yields the corpus-shaped pieces:

- ``notebook_text``: {language, nbformat, n_cells, n_code, n_md,
  text} — markdown cells verbatim, code cells fenced with the
  notebook's language (the canonical flattening used when notebooks
  join a text corpus), outputs DROPPED by default (they are derived
  artifacts and a training-leak vector); ``include_outputs=True``
  adds stream/text outputs fenced as ``output`` blocks.
- ``notebook_cells``: one record per cell (kind, idx, source,
  n_lines) — the granular form a code-dedup tier joins on.
- ``notebook_features``: the usual Arrow fan-out.

Hostility: nbformat's ``source`` is either a string or a list of
line strings — both accepted; non-JSON or JSON without a ``cells``
list raises the named ValueError; a size guard bounds the document.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "notebook_text",
    "notebook_cells",
    "encode_notebook",
    "notebook_features",
]

MAX_BYTES = 1 << 28  # 256 MiB: hostile-size guard


def _load(blob: bytes) -> dict:
    if len(blob) > MAX_BYTES:
        raise ValueError("ipynb: document exceeds size guard")
    try:
        doc = json.loads(blob)
    except (ValueError, UnicodeDecodeError) as e:
        raise ValueError(f"ipynb: not JSON: {e}") from e
    if not isinstance(doc, dict) or not isinstance(
        doc.get("cells"), list
    ):
        raise ValueError("ipynb: no cells list (not nbformat 4)")
    return doc


def _source(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        src = "".join(s for s in src if isinstance(s, str))
    return src if isinstance(src, str) else ""


def notebook_text(blob: bytes, include_outputs: bool = False) -> dict:
    doc = _load(blob)
    meta = doc.get("metadata") or {}
    lang = None
    ks = meta.get("kernelspec") or {}
    li = meta.get("language_info") or {}
    if isinstance(li, dict) and isinstance(li.get("name"), str):
        lang = li["name"]
    elif isinstance(ks, dict) and isinstance(ks.get("language"), str):
        lang = ks["language"]
    parts: list[str] = []
    n_code = n_md = 0
    for cell in doc["cells"]:
        if not isinstance(cell, dict):
            continue
        kind = cell.get("cell_type")
        src = _source(cell).rstrip("\n")
        if kind == "markdown":
            n_md += 1
            if src:
                parts.append(src)
        elif kind == "code":
            n_code += 1
            if src:
                parts.append(f"```{lang or ''}\n{src}\n```")
            if include_outputs:
                for out in cell.get("outputs") or []:
                    if not isinstance(out, dict):
                        continue
                    txt = out.get("text")
                    if txt is None and isinstance(
                        out.get("data"), dict
                    ):
                        txt = out["data"].get("text/plain")
                    if isinstance(txt, list):
                        txt = "".join(
                            s for s in txt if isinstance(s, str)
                        )
                    if isinstance(txt, str) and txt.strip():
                        parts.append(
                            "```output\n" + txt.rstrip("\n") + "\n```"
                        )
        elif kind == "raw":
            if src:
                parts.append(src)
    return {
        "language": lang,
        "nbformat": doc.get("nbformat"),
        "n_cells": len(doc["cells"]),
        "n_code": n_code,
        "n_md": n_md,
        "text": "\n\n".join(parts),
    }


def notebook_cells(blob: bytes) -> list[dict]:
    """One record per cell, archive order: {idx, kind, source,
    n_lines} — the granular join key for code dedup."""
    doc = _load(blob)
    out = []
    for idx, cell in enumerate(doc["cells"]):
        if not isinstance(cell, dict):
            continue
        src = _source(cell)
        out.append(
            {
                "idx": idx,
                "kind": str(cell.get("cell_type")),
                "source": src,
                "n_lines": src.count("\n") + 1 if src else 0,
            }
        )
    return out


def encode_notebook(
    cells: list[tuple[str, str]], language: str = "python"
) -> bytes:
    """Fixture writer: cells as (kind, source) pairs, nbformat-4
    shape with list-form sources (the on-disk convention)."""
    doc = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {
            "kernelspec": {"name": language, "language": language},
            "language_info": {"name": language},
        },
        "cells": [
            {
                "cell_type": kind,
                "metadata": {},
                "source": src.splitlines(keepends=True),
                **({"outputs": [], "execution_count": None}
                   if kind == "code" else {}),
            }
            for kind, src in cells
        ],
    }
    return json.dumps(doc).encode()


def notebook_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched notebook extraction: (id, language, n_cells,
    n_code, n_md, text, n_chars). ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged inputs instead of
    killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        single_row_features,
    )

    return single_row_features(
        df,
        notebook_text,
        [
            ("language", "string"),
            ("n_cells", "long"),
            ("n_code", "long"),
            ("n_md", "long"),
            ("text", "string"),
            ("n_chars", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
        derive={"n_chars": lambda m: len(m["text"])},
    )


