"""Content-defined chunking (CDC) for binary-payload dedup.

Exact/text dedup works on documents; a 100 TB MULTIMODAL corpus also
carries big binary payloads (videos, archives, model checkpoints)
where near-identical files differ by a few inserted bytes — fixed-size
blocks then misalign and dedup nothing. Content-defined chunking cuts
at positions chosen by a rolling hash of the CONTENT, so an insertion
only re-chunks its neighborhood and every untouched region keeps its
chunk identity (public basis: the gear-hash CDC family — Xia et al.,
"FastCDC: a Fast and Efficient Content-Defined Chunking Approach",
USENIX ATC 2016; LBFS's original Rabin chunking, Muthitacharoen et
al. 2001).

Algorithm (gear CDC, the FastCDC hash): h_i = (h_{i-1} << 1 + G[b_i])
mod 2^64 over a fixed 256-entry gear table; position i ends a chunk
when (h_i & mask) == 0, subject to min/max chunk sizes (the mask has
``log2(avg_size)`` low bits, so expected chunk length ≈ avg_size).
The gear table is DERIVED from sha256 of the byte value — fixed
public constants, reproducible everywhere.

Spark-first shape: one Arrow pass fans each payload out to its chunk
rows (doc_id, chunk_idx, offset, length, chunk_hash) — per-row
independent, zero shuffle; chunk-level dedup is then a plain
hash-aggregate on chunk_hash (the exact-dedup tier, storage-sized
savings measured by ``chunk_dedup_stats``). The rolling hash itself
is NUMPY-VECTORIZED: the low ``b`` bits of h_i depend on only the
last ``b`` gear values (older bytes are shifted out), so the masked
hash at every position is a sum of ``b`` shifted gear lookups — b
array adds instead of a per-byte Python loop.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_boundaries", "cdc_chunks", "chunk_dedup_stats"]

# positions hashed per vectorized pass (module-level so tests can
# shrink it and pin cross-block-boundary equivalence). Peak temp
# memory per pass is ~3 uint64 arrays = ~24 bytes PER POSITION
# (review finding: an earlier comment claimed ~3x), so 2 Mi
# positions ~= 48 MiB of temporaries per in-flight payload.
_BLOCK = 1 << 21

# fixed public gear table: G[v] = first 8 bytes of sha256("cdc-gear-v")
_GEAR = np.array(
    [
        int.from_bytes(
            hashlib.sha256(b"cdc-gear-%d" % v).digest()[:8], "big"
        )
        for v in range(256)
    ],
    dtype=np.uint64,
)


def cdc_boundaries(
    data: bytes,
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> list[int]:
    """Chunk END positions (exclusive) for ``data`` under gear CDC.

    The last boundary is always ``len(data)``. ``avg_size`` must be a
    power of two (it defines the mask width); ``min_size`` suppresses
    tiny chunks (boundaries inside the first min_size bytes of a
    chunk are ignored), ``max_size`` forces a cut. Deterministic,
    content-defined: the same byte window yields the same cut points
    wherever it appears once the hash window (mask-width bytes) is
    inside it."""
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError(
            f"cdc_boundaries: need 0 < min {min_size} <= avg "
            f"{avg_size} <= max {max_size}"
        )
    bits = int(avg_size).bit_length() - 1
    if (1 << bits) != avg_size:
        raise ValueError(
            f"cdc_boundaries: avg_size {avg_size} must be a power of 2"
        )
    n = len(data)
    if n == 0:
        return []
    buf = np.frombuffer(data, dtype=np.uint8)
    # masked gear hash at every position: low `bits` bits of
    # h_i = sum_{k=0..bits-1} G[b_{i-k}] << k  (older terms shifted
    # out of the mask) — `bits` shifted adds, fully vectorized.
    # Processed in BLOCKS with a (bits-1)-byte carry so peak temp
    # memory is ~24 bytes per block POSITION (three uint64 arrays),
    # bounded by _BLOCK instead of scaling with the payload (a 100 MB
    # video payload must not allocate gigabytes per row).
    mask = np.uint64((1 << bits) - 1)
    block = _BLOCK
    hit_parts: list[np.ndarray] = []
    for b0 in range(0, n, block):
        b1 = min(n, b0 + block)
        lo = max(0, b0 - (bits - 1))  # carry window
        g = _GEAR[buf[lo:b1]]
        m = b1 - lo
        acc = np.zeros(m, dtype=np.uint64)
        for k in range(bits):
            shifted = (g << np.uint64(k)) & mask
            if k:
                acc[k:] += shifted[:-k]
            else:
                acc += shifted
            acc &= mask
        part = np.flatnonzero(acc[b0 - lo :] == 0)
        if part.size:
            hit_parts.append(part + b0)
    hits = (
        np.concatenate(hit_parts)
        if hit_parts
        else np.empty(0, dtype=np.int64)
    )
    out: list[int] = []
    start = 0
    hi = 0
    while start < n:
        cut = min(start + max_size, n)
        # first hash hit at least min_size into the chunk, and deep
        # enough that the hash window is fully inside the chunk (no
        # dependence on bytes before `start` — the content-defined
        # reuse property)
        lo = start + max(min_size, bits)
        hi = np.searchsorted(hits, lo)
        if hi < len(hits) and hits[hi] < cut - 1:
            cut = int(hits[hi]) + 1
        out.append(cut)
        start = cut
    return out


def cdc_chunks(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> DataFrame:
    """Arrow 1->N fan-out: every payload to its content-defined chunk
    rows (id, chunk_idx, offset, length, chunk_hash) — chunk_hash is
    the sha256 hex of the chunk bytes, the join/dedup key. NULL
    payloads emit no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [],
                "chunk_idx": [],
                "offset": [],
                "length": [],
                "chunk_hash": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                # a NULL id coerces the pandas column to float64/NaN
                # (review finding: int(NaN) killed the task) — skip
                # both NULL sides like the payload guard
                if blob is None or rid is None or pd.isna(rid):
                    continue
                data = bytes(blob)
                prev = 0
                for i, end in enumerate(
                    cdc_boundaries(data, min_size, avg_size, max_size)
                ):
                    out[id_col].append(int(rid))
                    out["chunk_idx"].append(i)
                    out["offset"].append(prev)
                    out["length"].append(end - prev)
                    out["chunk_hash"].append(
                        hashlib.sha256(data[prev:end]).hexdigest()
                    )
                    prev = end
            yield pd.DataFrame(out)

    # NULL ids are dropped JVM-side BEFORE Arrow: one NULL would
    # coerce the whole pandas id column to float64, silently mangling
    # xxhash64-scale ids (> 2^53) in the same batch (review finding)
    return (
        df.select(id_col, blob_col)
        .filter(F.col(id_col).isNotNull())
        .mapInPandas(
            run,
            f"{id_col} long, chunk_idx long, offset long, length long, "
            "chunk_hash string",
        )
    )


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage-dedup summary over a ``cdc_chunks`` frame:
    (n_chunks, n_distinct, total_bytes, unique_bytes, dup_bytes,
    dedup_ratio) — ``unique_bytes`` stores each distinct chunk once
    (the content-addressed store size); ratio = total/unique rounded
    to 6 dp. Two hash-aggregates, all JVM."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("length").alias("length"),
    )
    return per_hash.agg(
        F.sum("n").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n") * F.col("length")).alias("total_bytes"),
        F.sum("length").alias("unique_bytes"),
        (
            F.sum(F.col("n") * F.col("length")) - F.sum("length")
        ).alias("dup_bytes"),
        F.round(
            F.sum(F.col("n") * F.col("length"))
            / F.sum("length").cast("double"),
            6,
        ).alias("dedup_ratio"),
    )
