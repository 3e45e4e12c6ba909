"""[EXT] Multimodal column plumbing.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction / frame-sampling run as Arrow-batched
pandas iterators (``mapInPandas``) so bytes move Spark→Python in columnar
batches, never row-at-a-time.

The actual codec work is STUBBED (no image/audio libs in this
container): ``decode_meta_stub`` computes deterministic fake
width/height from the byte payload so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and oracle-checkable,
while ``decode_image`` raises NotImplementedError where a real decoder
(PIL/libav) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_byte_offset", LongType()),
    ]
)

FRAME_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_byte_offset", LongType()),
    ]
)


def attach_blob(documents: DataFrame) -> DataFrame:
    """Derive an opaque binary payload column (UTF-8 bytes of the text —
    the testdata has no real media; the *column type and plan shape* are
    what production code reuses)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def decode_image(payload: bytes):  # pragma: no cover - requires codec libs
    """Real image decode hook — not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not installed in this environment"
    )


def decode_meta_stub(blobs: DataFrame) -> DataFrame:
    """'Decode' each payload to (width, height) metadata via mapInPandas.

    The stub derives dimensions deterministically from byte_len (so a
    SQL oracle can verify the full pipeline); a real decoder would read
    the codec header here, batch-wise, with identical plumbing.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": n,
                    "width": n % 640,
                    "height": (n * 7) % 480,
                }
            )

    return blobs.mapInPandas(decode, META_SCHEMA)


def frames_with_meta(blobs: DataFrame, frame_size: int = 64) -> DataFrame:
    """Metadata decode + frame sampling in ONE Arrow pass: each output
    row is a sampled frame carrying the decoded (byte_len, width,
    height) header metadata — the composed form a video-ingest pipeline
    runs (decode the header once, then emit keyframes), demonstrating
    the 1→N fan-out ``mapInPandas`` schema with per-item metadata.
    Same deterministic stub decode as ``decode_meta_stub``; a real
    decoder swaps into the same loop."""

    def decode_and_sample(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, ws, hs, idxs, offs = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = max(1, n // frame_size)
                for i in range(n_frames):
                    ids.append(doc_id)
                    lens.append(n)
                    ws.append(n % 640)
                    hs.append((n * 7) % 480)
                    idxs.append(i)
                    offs.append(i * frame_size)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "byte_len": pd.Series(lens, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_byte_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return blobs.mapInPandas(decode_and_sample, FRAME_META_SCHEMA)


def sample_frames(blobs: DataFrame, frame_size: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one output row per fixed-size 'frame' of
    the payload (a video decoder would emit keyframes). mapInPandas with
    a fan-out schema — demonstrates the 1→N multimodal explode path."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_size)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * frame_size)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_byte_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return blobs.mapInPandas(frames, FRAME_SCHEMA)
