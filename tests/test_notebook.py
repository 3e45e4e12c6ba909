"""Jupyter notebook extraction (sources/notebook): nbformat-4 JSON
cells flattened into corpus text (code fenced by language, outputs
dropped by default), plus the per-cell granular form."""

import json

import pytest

from timeseries_data_provider_spark.sources import notebook


def test_flattening_and_counts():
    b = notebook.encode_notebook(
        [
            ("markdown", "# Title\n\nProse here."),
            ("code", "x = 1\nprint(x)"),
            ("markdown", "More prose."),
            ("code", ""),
        ]
    )
    m = notebook.notebook_text(b)
    assert m["language"] == "python"
    assert (m["n_cells"], m["n_code"], m["n_md"]) == (4, 2, 2)
    assert m["text"] == (
        "# Title\n\nProse here."
        "\n\n```python\nx = 1\nprint(x)\n```"
        "\n\nMore prose."
    )


def test_outputs_dropped_by_default_and_optional():
    doc = json.loads(notebook.encode_notebook([("code", "print(1)")]))
    doc["cells"][0]["outputs"] = [
        {"output_type": "stream", "text": ["1\n"]},
        {
            "output_type": "execute_result",
            "data": {"text/plain": ["ignored-when-stream-present"]},
        },
    ]
    blob = json.dumps(doc).encode()
    assert "1" not in notebook.notebook_text(blob)["text"].replace(
        "print(1)", ""
    )
    with_out = notebook.notebook_text(blob, include_outputs=True)
    assert "```output\n1\n```" in with_out["text"]


def test_string_form_source_and_raw_cells():
    # on-disk sources are LISTS of lines, but the string form is
    # legal too; raw cells pass through verbatim
    doc = {
        "nbformat": 4,
        "metadata": {},
        "cells": [
            {"cell_type": "code", "source": "a = 2"},
            {"cell_type": "raw", "source": "raw text"},
        ],
    }
    m = notebook.notebook_text(json.dumps(doc).encode())
    assert m["language"] is None
    assert m["text"] == "```\na = 2\n```\n\nraw text"


def test_notebook_cells_granular():
    b = notebook.encode_notebook(
        [("markdown", "m"), ("code", "a\nb\nc")]
    )
    cells = notebook.notebook_cells(b)
    assert [c["kind"] for c in cells] == ["markdown", "code"]
    assert cells[1]["n_lines"] == 3 and cells[1]["source"] == "a\nb\nc"


def test_hostile_loud():
    with pytest.raises(ValueError, match="JSON"):
        notebook.notebook_text(b"\x89PNG")
    with pytest.raises(ValueError, match="cells"):
        notebook.notebook_text(b'{"nbformat": 4}')


def test_notebook_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, None],
            "payload": [
                notebook.encode_notebook(
                    [("markdown", "hi"), ("code", "x=1")]
                ),
                None,
            ],
        }
    )
    out = notebook.notebook_features(
        spark.createDataFrame(rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_code"], r["n_md"], r["language"]) == (1, 1, "python")
    assert r["text"] == "hi\n\n```python\nx=1\n```"
