"""Energy-based audio segmentation (silence splitting).

The clip-extraction step of an audio corpus build: long recordings
split at silences into trainable utterance segments (the classic
energy-threshold VAD — a deterministic integer formulation of the
standard frame-RMS gate; model-based VAD is a plug-in concern, like
the codecs). Public-knowledge basis: frame-energy voice activity
detection is textbook DSP (Rabiner & Schafer). Reference parity:
index.js has no audio surface; [EXT] SURVEY §2.

Exact-integer rules (testable, engine-portable):

- frames of ``frame_ms`` at the clip rate (frame f covers samples
  [f*spf, (f+1)*spf), the last partial frame included);
- frame energy = integer mean of squared 16-bit-domain samples
  (sum // count);
- a frame is SILENT iff energy <= threshold (threshold in squared-
  sample units — 16-bit domain, so full scale is ~1.07e9);
- a segment is a maximal run of non-silent frames, EXTENDED through
  silent gaps shorter than ``min_gap_ms``; segments shorter than
  ``min_segment_ms`` are dropped (counted).

Scale shape: decode + segmentation is one Arrow pass per clip
(codec-tier rate); output is a 1->N fan-out of (segment, start_ms,
end_ms, peak) rows — the fetch list a speech pipeline cuts clips by.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from . import multimodal

__all__ = ["segment_samples", "audio_segments"]


def segment_samples(
    samples: np.ndarray,
    rate: int,
    frame_ms: int = 20,
    threshold: int = 10_000,
    min_gap_ms: int = 200,
    min_segment_ms: int = 100,
) -> tuple[list[dict], int]:
    """Segment a mono 16-bit-domain sample array per the module's
    exact rules. Returns (segments, n_dropped_short). Segment dicts:
    {start_ms, end_ms, n_frames, peak_abs}."""
    s = np.asarray(samples, dtype=np.int64)
    spf = max(1, rate * frame_ms // 1000)
    n_frames = -(-len(s) // spf) if len(s) else 0
    voiced = []
    for f in range(n_frames):
        fr = s[f * spf : (f + 1) * spf]
        energy = int((fr * fr).sum()) // len(fr)
        voiced.append(energy > threshold)
    max_gap = min_gap_ms // frame_ms
    min_frames = -(-min_segment_ms // frame_ms)
    segments: list[dict] = []
    dropped = 0
    start = None
    gap = 0
    for f, v in enumerate(voiced + [False]):
        if v:
            if start is None:
                start = f
            gap = 0
        elif start is not None:
            gap += 1
            if gap > max_gap or f == n_frames:
                end = f - gap + 1  # last voiced frame + 1
                seg_frames = end - start
                if seg_frames >= min_frames:
                    lo = start * spf
                    hi = min(end * spf, len(s))
                    segments.append(
                        {
                            "start_ms": start * spf * 1000 // rate,
                            "end_ms": hi * 1000 // rate,
                            "n_frames": seg_frames,
                            "peak_abs": int(np.abs(s[lo:hi]).max()),
                        }
                    )
                else:
                    dropped += 1
                start = None
                gap = 0
    return segments, dropped


def audio_segments(
    media: DataFrame,
    codec_setup=None,
    frame_ms: int = 20,
    threshold: int = 10_000,
    min_gap_ms: int = 200,
    min_segment_ms: int = 100,
    blob_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode each audio payload (any registered container/codec),
    normalize to the mono 16-bit domain (the feature_samples adapter),
    and fan out one row per detected segment — plus per-clip
    n_dropped_short for observability."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec_setup is not None:
            codec_setup()
        for pdf in batches:
            out = {
                id_col: [],
                "seg_idx": [],
                "start_ms": [],
                "end_ms": [],
                "n_frames": [],
                "peak_abs": [],
                "n_dropped_short": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                d = multimodal.decode_audio(bytes(blob))
                s = multimodal.feature_samples(d)
                segs, dropped = segment_samples(
                    s,
                    d["sample_rate"],
                    frame_ms=frame_ms,
                    threshold=threshold,
                    min_gap_ms=min_gap_ms,
                    min_segment_ms=min_segment_ms,
                )
                for i, g in enumerate(segs):
                    out[id_col].append(int(rid))
                    out["seg_idx"].append(i)
                    out["start_ms"].append(g["start_ms"])
                    out["end_ms"].append(g["end_ms"])
                    out["n_frames"].append(g["n_frames"])
                    out["peak_abs"].append(g["peak_abs"])
                    out["n_dropped_short"].append(dropped)
            yield pd.DataFrame(out)

    return media.select(id_col, blob_col).mapInPandas(
        run,
        f"{id_col} long, seg_idx long, start_ms long, end_ms long, "
        "n_frames long, peak_abs long, n_dropped_short long",
    )