"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested; the actual media codecs (PIL/ffmpeg
et al.) are not available in this environment, so the decode step is
pluggable: the default backend is a deterministic fake that parses our
own synthetic container format, and a real backend raises
``NotImplementedError`` with instructions (swap in PIL/torchaudio on a
cluster with the libs installed).

Synthetic container format (deterministic, self-describing):
  ``b"FAKEIMG1" + width:uint16 + height:uint16 + channels:uint8 + payload``
  ``b"FAKEAUD1" + sample_rate:uint32 + n_samples:uint32 + payload``
Payload bytes are a pure function of the media key (splitmix64 stream),
so any two generations are byte-identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMG_MAGIC = b"FAKEIMG1"
AUD_MAGIC = b"FAKEAUD1"

IMAGE_META_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "n_bytes long"
)
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_px double, std_px double, "
    "phash long"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, "
    "rms double"
)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def synth_media(spark: SparkSession, n: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """(media_id, kind, blob) — deterministic fake image/audio blobs."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(np.int64)
            kinds, blobs = [], []
            for i in ids:
                h = int(_mix64(np.array([i + seed], np.uint64))[0])
                if i % 3 != 2:  # 2/3 images
                    w = 16 + (h & 0x3F)
                    hgt = 16 + ((h >> 6) & 0x3F)
                    c = 3
                    n_px = w * hgt * c
                    payload = (
                        _mix64(np.arange(n_px, dtype=np.uint64) + np.uint64(h))
                        & np.uint64(0xFF)
                    ).astype(np.uint8).tobytes()
                    blobs.append(IMG_MAGIC + struct.pack("<HHB", w, hgt, c) + payload)
                    kinds.append("image")
                else:
                    sr = 8000
                    ns = 1000 + (h & 0xFFF)
                    payload = (
                        _mix64(np.arange(ns, dtype=np.uint64) + np.uint64(h))
                        & np.uint64(0xFFFF)
                    ).astype(np.uint16).tobytes()
                    blobs.append(AUD_MAGIC + struct.pack("<II", sr, ns) + payload)
                    kinds.append("audio")
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "blob": blobs})

    return base.mapInPandas(render, "media_id long, kind string, blob binary")


def _decode_image(blob: bytes, backend: str) -> tuple[int, int, int, np.ndarray]:
    if blob[:8] == IMG_MAGIC:
        w, h, c = struct.unpack("<HHB", blob[8:13])
        px = np.frombuffer(blob[13:13 + w * h * c], dtype=np.uint8)
        return w, h, c, px.reshape(h, w, c)
    if backend == "fake":
        raise ValueError("not a FAKEIMG1 container; pass backend='pil'")
    raise NotImplementedError(
        "real image decode requires PIL/opencv — not available in this "
        "environment; install and plug in via backend='pil'"
    )


def image_metadata(media: DataFrame, blob_col: str = "blob",
                   id_col: str = "media_id") -> DataFrame:
    """Parse container headers only (no pixel decode) — cheap metadata
    extraction, one pass, native-width output schema."""
    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b[id_col], b[blob_col]):
                blob = bytes(blob)
                if blob[:8] == IMG_MAGIC:
                    w, h, c = struct.unpack("<HHB", blob[8:13])
                    rows.append((mid, "image", w, h, c, len(blob)))
                elif blob[:8] == AUD_MAGIC:
                    rows.append((mid, "audio", None, None, None, len(blob)))
                else:
                    rows.append((mid, "unknown", None, None, None, len(blob)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "width",
                                              "height", "channels", "n_bytes"])

    return media.mapInPandas(meta, IMAGE_META_SCHEMA)


def image_features(media: DataFrame, blob_col: str = "blob",
                   id_col: str = "media_id", backend: str = "fake") -> DataFrame:
    """Decode → per-image stats + a 64-bit average-hash (the standard
    near-dup perceptual hash shape: downsample to 8×8 luma, threshold
    on the mean, pack bits). Arrow-batched; pixels never leave the
    executor."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b[id_col], b[blob_col]):
                blob = bytes(blob)
                if blob[:8] != IMG_MAGIC:
                    continue
                w, h, c, px = _decode_image(blob, backend)
                luma = px.astype(np.float64).mean(axis=2)
                # 8×8 average-hash: block-mean downsample, threshold, pack
                ys = np.linspace(0, h, 9, dtype=int)
                xs = np.linspace(0, w, 9, dtype=int)
                small = np.array([
                    [luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                     for j in range(8)] for i in range(8)
                ])
                bits = (small > small.mean()).flatten()
                phash = 0
                for k, bit in enumerate(bits):
                    if bit:
                        phash |= 1 << k
                # mask to signed-long range for the Spark LongType column
                rows.append((mid, w, h, float(px.mean()), float(px.std()),
                             phash & 0x7FFFFFFFFFFFFFFF))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "mean_px", "std_px", "phash"])

    return media.mapInPandas(feats, IMAGE_FEATURES_SCHEMA)


def image_resize(media: DataFrame, target: tuple[int, int] = (8, 8),
                 blob_col: str = "blob", id_col: str = "media_id",
                 backend: str = "fake") -> DataFrame:
    """Resize (nearest-neighbor) → re-encode into the same container.
    Output schema mirrors the input so resize composes with any
    downstream media operator."""
    tw, th = target

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, kinds, blobs = [], [], []
            for mid, blob in zip(b[id_col], b[blob_col]):
                blob = bytes(blob)
                if blob[:8] != IMG_MAGIC:
                    continue
                w, h, c, px = _decode_image(blob, backend)
                yi = (np.arange(th) * h // th)
                xi = (np.arange(tw) * w // tw)
                small = px[yi][:, xi]
                ids.append(mid)
                kinds.append("image")
                blobs.append(IMG_MAGIC + struct.pack("<HHB", tw, th, c)
                             + small.tobytes())
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "blob": blobs})

    return media.mapInPandas(resize, "media_id long, kind string, blob binary")


def audio_features(media: DataFrame, blob_col: str = "blob",
                   id_col: str = "media_id") -> DataFrame:
    """Decode fake-audio containers → duration + RMS."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b[id_col], b[blob_col]):
                blob = bytes(blob)
                if blob[:8] != AUD_MAGIC:
                    continue
                sr, ns = struct.unpack("<II", blob[8:16])
                samples = np.frombuffer(blob[16:16 + ns * 2], dtype=np.uint16)
                x = samples.astype(np.float64) - samples.mean()
                rows.append((mid, sr, ns, ns / sr,
                             float(np.sqrt((x ** 2).mean()))))
            yield pd.DataFrame(rows, columns=["media_id", "sample_rate",
                                              "n_samples", "duration_s", "rms"])

    return media.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4, blob_col: str = "blob",
                 id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling stub: treats an image blob as a 1-frame
    video; real ffmpeg-backed sampling is NotImplemented in this
    environment. The operator contract (explode one row per sampled
    frame, frame_idx column, binary frame payload) is real and tested."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(b[id_col], b[blob_col]):
                blob = bytes(blob)
                if blob[:8] == IMG_MAGIC:
                    ids.append(mid)
                    idxs.append(0)
                    frames.append(blob)
                # real video containers would explode to len//every_n rows
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(sample, "media_id long, frame_idx int, frame binary")
