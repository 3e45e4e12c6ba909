"""Content-defined chunking (operators/cdc): vectorized-vs-naive
equivalence, the insertion-shift reuse property, Spark fan-out, and
the storage-dedup summary."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import cdc


def naive_boundaries(data, min_size, avg_size, max_size):
    """Per-byte reference: the gear recurrence verbatim."""
    bits = avg_size.bit_length() - 1
    mask = (1 << bits) - 1
    out = []
    n = len(data)
    start = 0
    while start < n:
        cut = min(start + max_size, n)
        h = 0
        for i in range(start, cut):
            h = ((h << 1) + int(cdc._GEAR[data[i]])) & 0xFFFFFFFFFFFFFFFF
            if (
                i >= start + max(min_size, bits)
                and (h & mask) == 0
                and i < cut - 1
            ):
                cut = i + 1
                break
        out.append(cut)
        start = cut
    return out


@pytest.mark.parametrize("n", [0, 1, 100, 5000, 60000, 200001])
def test_vectorized_matches_naive(n):
    rng = np.random.RandomState(n or 7)
    data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
    got = cdc.cdc_boundaries(data, 512, 1024, 8192)
    ref = naive_boundaries(data, 512, 1024, 8192)
    assert got == ref
    if n:
        assert got[-1] == n
        sizes = np.diff([0] + got)
        assert (sizes <= 8192).all()
        # every chunk except possibly the last respects min_size
        assert (sizes[:-1] >= 512).all()


def test_insertion_shifts_only_local_chunks():
    rng = np.random.RandomState(42)
    content = rng.randint(0, 256, 120_000, dtype=np.uint8).tobytes()
    prefix = rng.randint(0, 256, 9_001, dtype=np.uint8).tobytes()

    def hashes(data):
        out, prev = set(), 0
        for end in cdc.cdc_boundaries(data, 512, 1024, 8192):
            out.add(hashlib.sha256(data[prev:end]).hexdigest())
            prev = end
        return out

    a = hashes(content)
    b = hashes(prefix + content)
    shared = len(a & b) / len(a)
    # the content-defined property: the unshifted tail re-chunks
    # identically once the hash window resynchronizes
    assert shared >= 0.8, shared


def test_guards():
    with pytest.raises(ValueError):
        cdc.cdc_boundaries(b"x", 0, 1024, 8192)
    with pytest.raises(ValueError):
        cdc.cdc_boundaries(b"x", 512, 1000, 8192)  # not a power of 2
    with pytest.raises(ValueError):
        cdc.cdc_boundaries(b"x", 2048, 1024, 8192)  # min > avg
    assert cdc.cdc_boundaries(b"") == []


def test_spark_chunks_and_dedup_stats(spark):
    rng = np.random.RandomState(3)
    blob = rng.randint(0, 256, 50_000, dtype=np.uint8).tobytes()
    other = rng.randint(0, 256, 30_000, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4],
             "payload": [blob, blob, other, None]}
        )
    )
    chunks = cdc.cdc_chunks(df, min_size=512, avg_size=1024,
                            max_size=8192)
    rows = chunks.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3}  # NULL payload emits nothing
    # identical payloads chunk identically
    h1 = [r["chunk_hash"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])]
    assert h1 == h2
    # offsets/lengths tile the payload
    tile = sorted((r["offset"], r["length"]) for r in by_doc[1])
    assert tile[0][0] == 0
    assert sum(ln for _, ln in tile) == len(blob)
    stats = cdc.chunk_dedup_stats(chunks).collect()[0]
    assert stats["total_bytes"] == 2 * len(blob) + len(other)
    assert stats["unique_bytes"] == len(blob) + len(other)
    assert stats["dup_bytes"] == len(blob)
    assert stats["n_chunks"] == len(rows)


def test_blockwise_hashing_matches_single_pass(monkeypatch):
    # the vectorized hash runs in blocks with a carry window; a tiny
    # block size must produce IDENTICAL boundaries (cross-boundary
    # positions depend on carried bytes)
    rng = np.random.RandomState(11)
    data = rng.randint(0, 256, 40_000, dtype=np.uint8).tobytes()
    whole = cdc.cdc_boundaries(data, 512, 1024, 8192)
    monkeypatch.setattr(cdc, "_BLOCK", 777)  # odd, < bits multiples
    blocked = cdc.cdc_boundaries(data, 512, 1024, 8192)
    assert blocked == whole
    assert blocked == naive_boundaries(data, 512, 1024, 8192)


def test_null_doc_id_dropped_without_mangling(spark):
    # review finding: one NULL id coerced the pandas column to
    # float64, and int(float) would corrupt xxhash64-scale ids in the
    # same batch; NULL ids now drop JVM-side before Arrow
    big = (1 << 62) + 12345  # far above float64's exact-int range
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.array([big, None], dtype="Int64"),
                "payload": [b"x" * 5000, b"y" * 5000],
            }
        )
    )
    rows = cdc.cdc_chunks(df, min_size=512, avg_size=1024,
                          max_size=8192).collect()
    assert rows and all(r["doc_id"] == big for r in rows)
