"""Audio/video operations over binary columns.

Parity targets: ``daft/functions/video.py:44-219`` (video_metadata,
video_keyframes, video_frames, get_video_frame_by_idx),
``daft/functions/audio.py:41-122`` (audio_metadata, resample),
``daft/io/av/__init__.py:25`` (read_video_frames).

Representation: opaque ``binary`` payload + typed metadata struct.
Frame extraction is a generator-style ``mapInPandas`` (one input row ->
N frame rows) — the same UDTF shape the reference's generator UDFs use.
The av/soundfile codecs are absent in this container, so decoding is
stubbed behind ``deterministic_fake`` exactly like multimodal/image.py;
every Spark-side contract (schemas, fan-out, batching) is real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

VIDEO_META_SCHEMA = "path string, duration_s double, fps double, n_frames int, codec string"
FRAME_SCHEMA = "path string, frame_idx int, ts_s double, data binary"
AUDIO_META_SCHEMA = "path string, sample_rate int, channels int, duration_s double"

_HAVE_AV = False
try:  # pragma: no cover
    import av  # noqa: F401

    _HAVE_AV = True
except Exception:
    pass


def _meta_of(payload: bytes) -> tuple[float, float, int, str]:
    h = hashlib.sha256(payload or b"").digest()
    fps = 24.0 + (h[2] % 2) * 6.0
    n_frames = 48 + h[3] % 96
    return n_frames / fps, fps, n_frames, "h264"


def video_metadata(df: DataFrame, path_col: str, payload_col: str,
                   deterministic_fake: bool = False) -> DataFrame:
    """Per-video metadata (reference video_metadata, video.py:44)."""
    if not _HAVE_AV and not deterministic_fake:
        raise NotImplementedError("pyav not available; pass deterministic_fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_meta_of(x) for x in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf[path_col],
                    "duration_s": [m[0] for m in metas],
                    "fps": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "codec": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(run, VIDEO_META_SCHEMA)


def video_frames(df: DataFrame, path_col: str, payload_col: str,
                 sample_every: int = 10, deterministic_fake: bool = False) -> DataFrame:
    """Frame sampling fan-out: one row per sampled frame (reference
    video_frames / read_video_frames). Generator mapInPandas — output
    cardinality is data-dependent, never driver-side."""
    if not _HAVE_AV and not deterministic_fake:
        raise NotImplementedError("pyav not available; pass deterministic_fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "frame_idx": [], "ts_s": [], "data": []}
            for path, payload in zip(pdf[path_col], pdf[payload_col]):
                _, fps, n_frames, _ = _meta_of(payload)
                h = hashlib.sha256(payload or b"").digest()
                for idx in range(0, n_frames, sample_every):
                    out["path"].append(path)
                    out["frame_idx"].append(idx)
                    out["ts_s"].append(idx / fps)
                    out["data"].append(bytes([h[idx % len(h)]]) * 64)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def audio_metadata(df: DataFrame, path_col: str, payload_col: str,
                   deterministic_fake: bool = False) -> DataFrame:
    """reference audio_metadata (audio.py:41)."""
    if not _HAVE_AV and not deterministic_fake:
        raise NotImplementedError("soundfile/av not available; pass deterministic_fake=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = [hashlib.sha256(x or b"").digest() for x in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf[path_col],
                    "sample_rate": [16000 * (1 + d[4] % 3) for d in h],
                    "channels": [1 + d[5] % 2 for d in h],
                    "duration_s": [float(d[6] % 300) for d in h],
                }
            )

    return df.mapInPandas(run, AUDIO_META_SCHEMA)


def video_keyframes(df: DataFrame, path_col: str, payload_col: str,
                    deterministic_fake: bool = False) -> DataFrame:
    """Keyframe-only sampling (reference video.py video_keyframes /
    keyframes_impl): same fan-out as video_frames with a sparser,
    content-keyed stride standing in for real I-frame detection."""
    if not _HAVE_AV and not deterministic_fake:
        raise NotImplementedError("pyav not available; pass deterministic_fake=True")
    return video_frames(df, path_col, payload_col, sample_every=30,
                        deterministic_fake=deterministic_fake)


def get_video_frame_by_idx(df: DataFrame, path_col: str, payload_col: str,
                           frame_idx: int, deterministic_fake: bool = False) -> DataFrame:
    """Single-frame extraction (reference video.py
    get_video_frame_by_idx): frame sampling filtered to one index."""
    from pyspark.sql import functions as F

    frames = video_frames(df, path_col, payload_col, sample_every=1,
                          deterministic_fake=deterministic_fake)
    return frames.filter(F.col("frame_idx") == frame_idx)


def resample(df: DataFrame, path_col: str, payload_col: str, rate: int,
             deterministic_fake: bool = False) -> DataFrame:
    """Audio resampling (reference audio.py resample). Needs a real
    codec; the metadata stage (audio_metadata) covers the plumbing."""
    raise NotImplementedError(
        "resample requires soundfile/librosa (absent from this container)"
    )
