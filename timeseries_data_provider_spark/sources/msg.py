"""Outlook .msg extraction — [MS-OXMSG] property streams over the
CFB container (sources/cfb).

An Outlook message file is a CFB container whose streams are named
``__substg1.0_PPPPTTTT`` (PPPP = MAPI property id, TTTT = type:
001F UTF-16LE string, 001E 8-bit string). The corpus-relevant
properties are fixed, public MAPI tags: 0037 subject, 0C1A sender
name, 0E04 display-to, 1000 body, 007D transport headers.
Attachments and recipients live under ``__attach_version1.0_#NN`` /
``__recip_version1.0_#NN`` storages and are COUNTED here;
attachment payloads hand off via the storage-pathed stream names
``cfb_streams`` already exposes. RTF-compressed bodies
(PR_RTF_COMPRESSED 1009/0102, the [MS-OXRTFCP] LZFu scheme — the
form real Outlook messages very commonly carry INSTEAD of a plain
body) decompress through ``sources/lzfu.py`` and parse through the
existing RTF extractor when no plain/Unicode body property exists.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources import cfb

__all__ = ["msg_text", "msg_features"]

_PROPS = {
    "0037": "subject",
    "0C1A": "from_name",
    "0E04": "to",
    "1000": "body",
}
_SUBSTG = re.compile(r"__substg1\.0_([0-9A-F]{4})([0-9A-F]{4})$")


def msg_text(blob: bytes) -> dict:
    """{subject, from_name, to, body-as-text, n_attachments,
    n_recipients}. ``blob`` is the whole CFB container."""
    streams = cfb.cfb_streams(blob)
    names = [n for n, _ in streams]
    if not any(_SUBSTG.search(n) for n in names):
        raise ValueError("msg: no MAPI property streams")
    out = {v: None for v in _PROPS.values()}
    for name, data in streams:
        if "/" in name:
            continue  # top-level message properties only
        m = _SUBSTG.search(name)
        if not m:
            continue
        prop, typ = m.group(1), m.group(2)
        key = _PROPS.get(prop)
        if key is None:
            continue
        if typ == "001F":
            out[key] = data.decode("utf-16-le", "replace")
        elif typ == "001E":
            out[key] = data.decode("cp1252", "replace")
    if out["body"] is None:
        # PR_RTF_COMPRESSED fallback: decompress the LZFu stream and
        # extract text through the RTF parser ([MS-OXRTFCP]; the
        # plain body property wins when both exist — it is the same
        # text without markup)
        for name, data in streams:
            if "/" not in name and "__substg1.0_10090102" in name:
                from timeseries_data_provider_spark.sources import (
                    lzfu,
                    rtf as _rtf,
                )

                out["body"] = _rtf.rtf_text(
                    lzfu.lzfu_decompress(data)
                )["text"]
                break
    n_attach = len(
        {
            n.split("/", 1)[0]
            for n in names
            if n.startswith("__attach_version1.0_")
        }
    )
    n_recip = len(
        {
            n.split("/", 1)[0]
            for n in names
            if n.startswith("__recip_version1.0_")
        }
    )
    body = (out["body"] or "").replace("\r\n", "\n").replace(
        "\r", "\n"
    )
    return {
        "subject": out["subject"],
        "from_name": out["from_name"],
        "to": out["to"],
        "text": body.strip("\n"),
        "n_attachments": n_attach,
        "n_recipients": n_recip,
    }


def encode_msg(
    subject: str,
    body: str,
    from_name: str = "Alice",
    to: str = "Bob",
    n_attachments: int = 0,
    rtf_body: bool = False,
) -> bytes:
    """Fixture writer: the property streams a real .msg carries (all
    UTF-16LE /001F), plus empty attachment storages.
    ``rtf_body=True`` writes the body ONLY as PR_RTF_COMPRESSED
    (10090102, LZFu) — the common real-Outlook shape with no plain
    body property."""
    streams = [
        ("__substg1.0_0037001F", subject.encode("utf-16-le")),
        ("__substg1.0_0C1A001F", from_name.encode("utf-16-le")),
        ("__substg1.0_0E04001F", to.encode("utf-16-le")),
        ("__properties_version1.0", b"\x00" * 32),
    ]
    if rtf_body:
        from timeseries_data_provider_spark.sources import (
            lzfu,
            rtf as _rtf,
        )

        streams.insert(
            3,
            (
                "__substg1.0_10090102",
                # paragraphs split on EITHER newline form: a bare
                # \n inside an RTF paragraph is ignored by parsers,
                # so splitting only on \r\n silently dropped
                # newlines from multi-line bodies (r12 late catch)
                lzfu.lzfu_compress(
                    _rtf.encode_rtf(
                        body.replace("\r\n", "\n").split("\n")
                    )
                ),
            ),
        )
    else:
        streams.insert(
            3, ("__substg1.0_1000001F", body.encode("utf-16-le"))
        )
    # the fixture CFB writer is flat, so attachment markers write as
    # root streams named by their storage prefix — the counting rule
    # (prefix before the first '/') sees real nested storages and
    # these flat fixtures identically
    for k in range(n_attachments):
        streams.append((f"__attach_version1.0_#{k:08X}", b"payload"))
    return cfb.encode_cfb(streams)


def synth_msg_corpus(documents: "DataFrame") -> "DataFrame":
    """Deterministic Outlook .msg per document (q64's msg columns,
    r12 late — the synth_docx_corpus pattern): subject 'Msg {id}',
    and the body carried ONLY as PR_RTF_COMPRESSED — so the CFB
    walk, MAPI property decode, LZFu decompression, and RTF parse
    ALL sit on the oracle's hash-checked path; the round-tripped
    body text equals the source text by construction."""
    import pandas as pd

    def synth(batches):
        for pdf_ in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                doc_id = int(doc_id)
                out["doc_id"].append(doc_id)
                out["payload"].append(
                    encode_msg(
                        f"Msg {doc_id}", text, rtf_body=True
                    )
                )
            yield pd.DataFrame(out)

    from timeseries_data_provider_spark.tables import widen_for_python

    return widen_for_python(
        documents.select("doc_id", "text")
    ).mapInPandas(synth, "doc_id long, payload binary")


def msg_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched .msg extraction: (id, subject, from_name, to,
    text, n_chars, n_attachments, n_recipients). ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged inputs instead of
    killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        single_row_features,
    )

    return single_row_features(
        df,
        msg_text,
        [
            ("subject", "string"),
            ("from_name", "string"),
            ("to", "string"),
            ("text", "string"),
            ("n_chars", "long"),
            ("n_attachments", "long"),
            ("n_recipients", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
        derive={"n_chars": lambda m: len(m["text"])},
    )


