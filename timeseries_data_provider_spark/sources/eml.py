"""Email extraction (EML / mbox) — stdlib ``email`` package.

Mail archives are a classic corpus source (mailing lists, Enron-style
dumps, newsgroup exports) and a common crawl payload (.eml
attachments, mbox downloads). The stdlib ``email`` parser handles the
MIME grammar (RFC 5322/2045-2047: headers, encoded-words, multipart
trees, base64/quoted-printable transfer encodings, charsets); this
module adds the corpus-shaped contract on top:

- ``eml_text``: one message -> {subject, from_addr, to, date,
  message_id, n_parts, n_attachments, text}. The body prefers the
  ``text/plain`` alternative; an HTML-only message routes through the
  in-repo boilerplate-dropping extractor (operators/htmltext) so mail
  and web text share one cleaning rule. Attachment BYTES are exposed
  separately (``eml_attachments``) for the codec/dedup tiers — never
  inlined into text.
- ``mbox_messages``: split an mbox archive on RFC 4155 ``From ``
  separator lines (only at message starts — body lines beginning with
  ``>From `` stay untouched, the classic mboxrd quoting), yielding
  one EML payload per message.
- ``eml_features`` / ``mbox_features``: the usual Arrow fan-out
  operators (NULL-guarded, per-document independent, zero shuffle).

Hostile-input posture: header decode failures degrade to the raw
value (crawl mail is full of spec violations — tolerant beats loud
for METADATA), but a payload that is not mail at all (no header
block) raises the named ValueError. Attachment decode honors the
archives.MAX_MEMBER size guard.

Public-knowledge basis: RFC 5322 (message format), RFC 2045-2047
(MIME), RFC 4155 (mbox). Reference parity: index.js has no document
surface; [EXT] per SURVEY §2.
"""

from __future__ import annotations

import email
import email.policy
from email.message import Message
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources.archives import MAX_MEMBER

__all__ = [
    "eml_text",
    "eml_attachments",
    "mbox_messages",
    "encode_eml",
    "encode_mbox",
    "eml_features",
    "mbox_features",
]


def _decode_header(msg: Message, name: str) -> str | None:
    raw = msg.get(name)
    if raw is None:
        return None
    try:
        from email.header import decode_header, make_header

        return str(make_header(decode_header(raw)))
    except Exception:
        return str(raw)  # tolerant: raw value beats a dead task


def _part_text(part: Message) -> str:
    payload = part.get_payload(decode=True)
    if payload is None:
        return ""
    if len(payload) > MAX_MEMBER:
        raise ValueError("eml: part exceeds size guard")
    charset = part.get_content_charset() or "utf-8"
    try:
        text = payload.decode(charset, "replace")
    except LookupError:
        text = payload.decode("utf-8", "replace")
    # SMTP transport is CRLF; the corpus contract is \n
    return text.replace("\r\n", "\n").replace("\r", "\n")


def eml_text(blob: bytes) -> dict:
    """Extract one RFC 5322 message. Body preference: first
    ``text/plain`` leaf part; else first ``text/html`` leaf through
    the in-repo boilerplate-dropping HTML extractor; else empty."""
    if b":" not in blob[:1000] and not blob.startswith(b"From "):
        raise ValueError("eml: no header block")
    msg = email.message_from_bytes(blob)
    if not msg.keys():
        raise ValueError("eml: no header block")
    plain: list[str] = []
    html: list[str] = []
    n_parts = 0
    n_attach = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        n_parts += 1
        fn = part.get_filename()
        ctype = part.get_content_type()
        disp = str(part.get("Content-Disposition", "")).lower()
        if fn or disp.startswith("attachment"):
            n_attach += 1
            continue
        if ctype == "text/plain":
            plain.append(_part_text(part))
        elif ctype == "text/html":
            html.append(_part_text(part))
    if plain:
        text = "\n".join(t.strip("\n") for t in plain)
    elif html:
        from timeseries_data_provider_spark.operators.htmltext import (
            html_to_text,
        )

        text = "\n".join(html_to_text(h) for h in html)
    else:
        text = ""
    return {
        "subject": _decode_header(msg, "Subject"),
        "from_addr": _decode_header(msg, "From"),
        "to": _decode_header(msg, "To"),
        "date": _decode_header(msg, "Date"),
        "message_id": msg.get("Message-ID"),
        "n_parts": n_parts,
        "n_attachments": n_attach,
        "text": text,
    }


def eml_attachments(blob: bytes) -> list[tuple[str, bytes]]:
    """(filename, bytes) per attachment — the hand-off to the codec
    registry / CDC dedup tiers."""
    msg = email.message_from_bytes(blob)
    out: list[tuple[str, bytes]] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        fn = part.get_filename()
        disp = str(part.get("Content-Disposition", "")).lower()
        if not fn and not disp.startswith("attachment"):
            continue
        data = part.get_payload(decode=True) or b""
        if len(data) > MAX_MEMBER:
            raise ValueError("eml: attachment exceeds size guard")
        out.append((fn or "unnamed", data))
    return out


def mbox_messages(blob: bytes) -> list[bytes]:
    """Split an RFC 4155 mbox on ``From `` separator lines at message
    boundaries. Body lines quoted as ``>From `` (mboxrd) stay in the
    message; the separator line itself is not part of the payload."""
    if not blob.startswith(b"From "):
        raise ValueError("mbox: missing leading 'From ' separator")
    out: list[bytes] = []
    start = blob.find(b"\n") + 1
    i = start
    n = len(blob)
    while i < n:
        j = blob.find(b"\nFrom ", i)
        if j < 0:
            out.append(blob[start:n])
            break
        out.append(blob[start : j + 1])
        start = blob.find(b"\n", j + 1) + 1
        if start == 0:
            break
        i = start
    else:
        if start < n:
            out.append(blob[start:n])

    def unquote(m: bytes) -> bytes:
        # mboxrd read side: strip ONE level of '>' from >*From lines
        return b"\n".join(
            line[1:]
            if line.startswith(b">") and line.lstrip(b">").startswith(b"From ")
            else line
            for line in m.split(b"\n")
        )

    return [unquote(m) for m in out if m.strip()]


# -- fixture writers ----------------------------------------------------


def encode_eml(
    subject: str,
    body: str,
    from_addr: str = "alice@example.com",
    to: str = "bob@example.com",
    html_body: str | None = None,
    attachments: list[tuple[str, bytes]] | None = None,
) -> bytes:
    """Real multipart MIME via the stdlib generator: text/plain (+
    optional text/html alternative) + optional attachments. Non-ASCII
    headers take the RFC 2047 encoded-word path."""
    from email.message import EmailMessage

    m = EmailMessage(policy=email.policy.SMTP)
    m["Subject"] = subject
    m["From"] = from_addr
    m["To"] = to
    m["Date"] = "Sat, 15 Aug 2026 12:00:00 +0000"
    m["Message-ID"] = f"<{abs(hash((subject, body))) % 10**12}@fixture>"
    m.set_content(body)
    if html_body is not None:
        m.add_alternative(html_body, subtype="html")
    for fn, data in attachments or []:
        m.add_attachment(
            data,
            maintype="application",
            subtype="octet-stream",
            filename=fn,
        )
    return m.as_bytes()


def encode_mbox(messages: list[bytes]) -> bytes:
    """mboxrd archive: ``From `` separators + body ``From ``-quoting."""
    out = bytearray()
    for msg in messages:
        out += b"From fixture@example.com Sat Aug 15 12:00:00 2026\n"
        for line in msg.split(b"\n"):
            if line.startswith(b"From ") or line.startswith(b">From "):
                out += b">" + line + b"\n"
            else:
                out += line + b"\n"
    return bytes(out)


# -- Spark operators -----------------------------------------------------

_EML_COLS = [
    ("subject", "string"),
    ("from_addr", "string"),
    ("to", "string"),
    ("date", "string"),
    ("message_id", "string"),
    ("n_parts", "long"),
    ("n_attachments", "long"),
    ("text", "string"),
    ("n_chars", "long"),
]


def _eml_row(m: dict) -> dict:
    r = {n: m[n] for n, _ in _EML_COLS if n != "n_chars"}
    r["n_chars"] = len(m["text"])
    return r


def eml_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched single-message extraction (one row per doc).
    ``errors="quarantine"`` adds (err_class, err_msg) side rows for
    damaged messages instead of killing the task
    (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        extraction_envelope,
    )

    def per_row(rid: int, blob: bytes) -> list[dict]:
        return [_eml_row(eml_text(blob))]

    return extraction_envelope(
        df,
        per_row,
        _EML_COLS,
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


def mbox_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched 1->N archive fan-out: one row per message, with
    ``msg_idx`` preserving archive order. ``errors="quarantine"``
    adds (err_class, err_msg) side rows for damaged archives instead
    of killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        extraction_envelope,
    )

    def per_row(rid: int, blob: bytes) -> list[dict]:
        rows = []
        for k, msg in enumerate(mbox_messages(blob)):
            r = _eml_row(eml_text(msg))
            r["msg_idx"] = k
            rows.append(r)
        return rows

    return extraction_envelope(
        df,
        per_row,
        [("msg_idx", "long")] + _EML_COLS,
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


