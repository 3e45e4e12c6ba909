"""Perceptual image hashing (dHash) + image near-dup pairs.

The image counterpart of text MinHash/SimHash dedup: crawled image
corpora are full of re-encodes, rescales, and format conversions of
the same picture, and exact byte/sha dedup sees none of them. dHash
(the difference hash — public algorithm, popularized by Krawetz's
"Kind of Like That" and the imagehash library's dhash) is the
standard cheap perceptual fingerprint: resize to (N+1) x N grayscale,
emit one bit per horizontal neighbor comparison. Two re-encodes of
one image land within a few bits; Hamming distance <= k finds them.

Built entirely on in-repo pieces: decode via the multimodal codec
registry (BMP/PNG/GIF/TIFF/JPEG/VP8L), resize via the SAME integer
index rule as multimodal.resize_nearest (deterministic, engine-
reproducible), grayscale = integer mean over channels. Candidate
generation reuses the SimHash quarter-blocking shape (dedup.py) —
factored here as ``hamming_pairs`` over any (id, 4x16-bit) frame,
so sketch-blocking semantics cannot drift between text and images.

Scale shape: hashing is one Arrow decode pass (codec-tier rate, the
honest Python cost); pair generation is pure JVM (quarter equi-join +
popcount verify) and never all-pairs. Within distance <= 3 the
quarter block is exact (pigeonhole); beyond that it is the stated
recall-bounded heuristic, same as SimHash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import multimodal

__all__ = [
    "dhash_bits",
    "image_dhash",
    "phash_bits",
    "image_phash",
    "hamming_pairs",
    "image_neardup_pairs",
    "image_pixel_hash",
]


def dhash_bits(pixels: np.ndarray, hash_size: int = 8) -> int:
    """dHash of a decoded pixel grid: grayscale (integer channel
    mean), nearest-neighbor resize to (hash_size+1) x hash_size with
    the (i*src)//out index rule, then bit (y*hash_size + x) = 1 iff
    gray[y, x+1] > gray[y, x]. Returns an unsigned ``hash_size**2``-
    bit integer."""
    px = pixels.astype(np.int64)
    if px.ndim == 3:
        px = px.sum(axis=2) // px.shape[2]
    small = multimodal.resize_nearest(px, hash_size + 1, hash_size)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64)
    out = 0
    for i, b in enumerate(bits.flatten()):
        out |= int(b) << i
    return out


def image_dhash(
    media: DataFrame,
    codec_setup=None,
    hash_size: int = 8,
    blob_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched perceptual hashing: decode each payload with the
    codec registry and emit (id, dhash, q0..q3) — the sketch plus its
    16-bit quarters, join-ready for ``hamming_pairs``. ``hash_size``
    is fixed at 8 for the quartered form (64 bits)."""
    if hash_size != 8:
        raise ValueError("image_dhash: quartered form requires hash_size=8")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec_setup is not None:
            codec_setup()
        for pdf in batches:
            out = {
                id_col: [],
                "dhash": [],
                "q0": [],
                "q1": [],
                "q2": [],
                "q3": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = multimodal.decode_image(bytes(blob))
                if img["pixels"] is None:
                    raise ValueError(
                        f"{img['format']} decoded to metadata only — "
                        "cannot hash"
                    )
                h = dhash_bits(img["pixels"], hash_size)
                out[id_col].append(int(rid))
                # store as signed 64-bit (Spark long); quarters unsigned
                out["dhash"].append(h - (1 << 64) if h >> 63 else h)
                for q in range(4):
                    out[f"q{q}"].append((h >> (16 * q)) & 0xFFFF)
            yield pd.DataFrame(out)

    # JVM-side NULL guard (the cdc_chunks pattern, review finding):
    # one NULL payload made bytes(None) kill the task, and one NULL id
    # coerced the pandas id column to float64, mangling ids > 2^53
    return (
        media.select(id_col, blob_col)
        .filter(F.col(id_col).isNotNull() & F.col(blob_col).isNotNull())
        .mapInPandas(
            run,
            f"{id_col} long, dhash long, q0 long, q1 long, q2 long, "
            "q3 long",
        )
    )


def hamming_pairs(
    sketches: DataFrame,
    max_distance: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidate pairs over any quartered 64-bit sketch frame
    (id, q0..q3): quarter equi-join blocking + exact popcount verify —
    the simhash_hamming_pairs shape, reusable for image dHash. Exact
    for distance <= 3 (pigeonhole over 4 quarters); recall-bounded
    above that, stated."""
    quarters = F.array(
        *[
            F.struct(F.lit(q).alias("q"), F.col(f"q{q}").alias("qh"))
            for q in range(4)
        ]
    )
    blocked = sketches.select(
        F.col(id_col), "q0", "q1", "q2", "q3",
        F.explode(quarters).alias("b"),
    ).select(
        F.col(id_col), "q0", "q1", "q2", "q3",
        F.col("b.q").alias("q"), F.col("b.qh").alias("qh"),
    )
    a = blocked.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"q{i}").alias(f"qa{i}") for i in range(4)],
        "q", "qh",
    )
    b = blocked.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"q{i}").alias(f"qb{i}") for i in range(4)],
        "q", "qh",
    )
    cand = (
        a.join(b, ["q", "qh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            *[F.col(f"qa{i}") for i in range(4)],
            *[F.col(f"qb{i}") for i in range(4)],
        )
        .distinct()
    )
    dist = sum(
        F.bit_count(F.col(f"qa{i}").bitwiseXOR(F.col(f"qb{i}")))
        for i in range(4)
    ).cast("long")
    return cand.select("doc_a", "doc_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_distance
    )


def image_neardup_pairs(
    media: DataFrame,
    codec_setup=None,
    max_distance: int = 6,
    blob_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end image near-dup detection: decode -> dHash -> quarter-
    blocked Hamming pairs. The sketch frame is checkpointed once —
    both sides of the blocked self-join consume it (the simhash
    materialization rule)."""
    sk = image_dhash(
        media, codec_setup=codec_setup, blob_col=blob_col, id_col=id_col
    ).localCheckpoint(eager=True)
    return hamming_pairs(sk, max_distance=max_distance, id_col=id_col)

# ---------------------------------------------------------------------------
# pHash (DCT perceptual hash) — the low-frequency sibling of dHash


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (float64, deterministic): the 2-D
    transform is C @ img @ C.T."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c[0, :] = np.sqrt(1.0 / n)
    return c


def phash_bits(
    pixels: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4
) -> int:
    """pHash of a decoded pixel grid (public algorithm: Krawetz's
    "Looks Like It" / the imagehash library's phash): grayscale,
    nearest-resize to (hash_size*highfreq_factor)^2, 2-D orthonormal
    DCT-II, keep the top-left hash_size x hash_size low-frequency
    block, bit i = 1 iff coefficient i > the block's MEDIAN (the
    imagehash convention: median over the whole block, DC included).
    Where dHash fingerprints local gradients, pHash fingerprints the
    global frequency envelope — robust to blur/re-scale/small crops
    that flip dHash bits."""
    px = pixels.astype(np.int64)
    if px.ndim == 3:
        px = px.sum(axis=2) // px.shape[2]
    n = hash_size * highfreq_factor
    small = multimodal.resize_nearest(px, n, n).astype(np.float64)
    c = _dct_matrix(n)
    d = c @ small @ c.T
    low = d[:hash_size, :hash_size]
    med = float(np.median(low))
    out = 0
    for i, v in enumerate(low.flatten()):
        if v > med:
            out |= 1 << i
    return out


def image_phash(
    media: DataFrame,
    codec_setup=None,
    hash_size: int = 8,
    blob_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched pHash: (id, phash, q0..q3) — quartered exactly
    like ``image_dhash``, so ``hamming_pairs`` consumes either sketch
    unchanged."""
    if hash_size != 8:
        raise ValueError("image_phash: quartered form requires hash_size=8")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec_setup is not None:
            codec_setup()
        for pdf in batches:
            out = {
                id_col: [],
                "phash": [],
                "q0": [],
                "q1": [],
                "q2": [],
                "q3": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = multimodal.decode_image(bytes(blob))
                if img["pixels"] is None:
                    raise ValueError(
                        f"{img['format']} decoded to metadata only — "
                        "cannot hash"
                    )
                h = phash_bits(img["pixels"], hash_size)
                out[id_col].append(int(rid))
                out["phash"].append(h - (1 << 64) if h >> 63 else h)
                for q in range(4):
                    out[f"q{q}"].append((h >> (16 * q)) & 0xFFFF)
            yield pd.DataFrame(out)

    # JVM-side NULL guard — see image_dhash
    return (
        media.select(id_col, blob_col)
        .filter(F.col(id_col).isNotNull() & F.col(blob_col).isNotNull())
        .mapInPandas(
            run,
            f"{id_col} long, phash long, q0 long, q1 long, q2 long, "
            "q3 long",
        )
    )


def image_pixel_hash(
    media: DataFrame,
    codec_setup=None,
    blob_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """FORMAT-INDEPENDENT exact image dedup key: decode each payload
    with the codec registry and emit (id, width, height, pixel_sha) —
    sha256 over the decoded pixel grid's raw bytes prefixed by its
    shape. Byte-level exact dedup misses every BMP<->PNG<->GIF
    re-encode of one image; pixel hashing catches them EXACTLY (zero
    false positives, unlike the perceptual tier) while dHash/pHash
    stay the near-dup ladder above it. A groupBy(pixel_sha) is the
    whole dedup — the text exact_dedup shape."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec_setup is not None:
            codec_setup()
        for pdf in batches:
            out = {id_col: [], "width": [], "height": [], "pixel_sha": []}
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = multimodal.decode_image(bytes(blob))
                if img["pixels"] is None:
                    raise ValueError(
                        f"{img['format']} decoded to metadata only — "
                        "cannot pixel-hash"
                    )
                px = np.ascontiguousarray(img["pixels"].astype(np.uint8))
                # canonical form: a 3-channel image whose channels
                # are identical (BMP replicates gray) squeezes to the
                # 2-D grid, so gray-BMP == gray-PNG pixel-for-pixel
                if px.ndim == 3 and (
                    px[:, :, :1] == px
                ).all():
                    px = np.ascontiguousarray(px[:, :, 0])
                h = hashlib.sha256()
                h.update(str(px.shape).encode())
                h.update(px.tobytes())
                out[id_col].append(int(rid))
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["pixel_sha"].append(h.hexdigest())
            yield pd.DataFrame(out)

    # JVM-side NULL guard — see image_dhash
    return (
        media.select(id_col, blob_col)
        .filter(F.col(id_col).isNotNull() & F.col(blob_col).isNotNull())
        .mapInPandas(
            run,
            f"{id_col} long, width long, height long, pixel_sha string",
        )
    )
