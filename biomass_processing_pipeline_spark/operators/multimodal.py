"""Multimodal column operators: decode / resize / feature-extract /
frame-sample over opaque ``binary`` columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning,
mapInPandas signatures) is real and tested; where this container lacks the
codec library (PIL/ffmpeg/librosa), the decode step is either the engine's
deterministic codec (images — imaging.py) or a clearly-marked stub:

- images : REAL decode via imaging.decode_image (raw/zlib/quantize codecs)
- video  : modeled as K stacked frames in one blob (deterministic layout);
           frame sampling is real byte-slicing, per-frame decode is real
- audio  : STUB — ``decode_audio`` raises NotImplementedError; the
           ``audio_features`` operator accepts a ``decoder`` callable so
           the Spark plumbing is testable with a deterministic fake
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from biomass_processing_pipeline_spark import imaging


def resize_block_mean(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact block-mean downsample (integer factors); crops the remainder.
    Deterministic stand-in for a resampling kernel."""
    h, w, c = px.shape
    fh, fw = max(h // out_h, 1), max(w // out_w, 1)
    cropped = px[: fh * out_h, : fw * out_w]
    return (
        cropped.reshape(out_h, fh, out_w, fw, c).mean(axis=(1, 3)).astype(np.uint8)
    )


def grid_features(px: np.ndarray, grid: int = 4) -> np.ndarray:
    """Mean-pooled grid features: (grid*grid*channels,) float32 — a real,
    deterministic feature extractor (embedding stand-in)."""
    small = resize_block_mean(px, grid, grid).astype(np.float32) / 255.0
    return small.ravel()


def decode_audio(blob: bytes) -> np.ndarray:  # pragma: no cover - stub
    """STUB: no audio codec in this container. The operator plumbing takes
    any ``decoder`` callable; swap in librosa/soundfile in production."""
    raise NotImplementedError("no audio codec available in this environment")


def fake_audio_decoder(blob: bytes) -> np.ndarray:
    """Deterministic fake: interpret bytes as int8 PCM. Keeps the Spark
    plumbing (batching, schema, aggregation) fully testable."""
    return np.frombuffer(blob, dtype=np.int8).astype(np.float32) / 128.0


def image_resize_features(
    images: DataFrame, out_h: int = 8, out_w: int = 8, grid: int = 4,
) -> DataFrame:
    """(image_id, bytes) -> (image_id, thumb binary, features array<float>).

    One Arrow pass; thumbnails re-encoded with the raw codec.
    """
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                # quarantine, don't crash: a corrupt blob yields a row
                # with NULL thumb/features (nothing vanishes, consumers
                # filter `features IS NULL`), not a dead 10^12-image job
                try:
                    px = imaging.decode_image(t.bytes)
                    thumb = imaging.encode_image(
                        resize_block_mean(px, out_h, out_w), "raw"
                    )
                    feats = grid_features(px, grid).tolist()
                except Exception:
                    thumb, feats = None, None
                rows.append({
                    "image_id": t.image_id, "thumb": thumb,
                    "features": feats,
                })
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(
        _batches, schema="image_id string, thumb binary, features array<float>"
    )


def video_frame_sample(
    videos: DataFrame, every_k: int = 2,
) -> DataFrame:
    """(video_id, bytes, n_frames, w, h) -> one row per sampled frame with
    per-frame stats. The blob is n_frames stacked raw-codec images; frame
    extraction is real byte slicing + decode."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                # frame-less / NULL-metadata / NULL-blob video: nothing to
                # sample. One NULL in the batch makes Arrow hand the WHOLE
                # int column over as float64, so valid rows arrive as
                # np.float64 too — gate on NA-ness, not int-ness, or every
                # sibling of a NULL row silently drops
                n_frames = 0 if pd.isna(t.n_frames) else int(t.n_frames)
                if n_frames <= 0 or t.bytes is None:
                    continue
                frame_len = len(t.bytes) // n_frames
                for fi in range(0, n_frames, every_k):
                    blob = t.bytes[fi * frame_len : (fi + 1) * frame_len]
                    # quarantine, don't crash: a corrupt frame keeps its
                    # row (NULL stats) so frame accounting stays intact
                    try:
                        px = imaging.decode_image(blob)
                        lum = float(px.mean())
                        feats = grid_features(px).tolist()
                    except Exception:
                        lum, feats = None, None
                    rows.append({
                        "video_id": t.video_id, "frame_idx": fi,
                        "mean_lum": lum, "features": feats,
                    })
            yield pd.DataFrame(rows)

    return videos.mapInPandas(
        _batches,
        schema=("video_id string, frame_idx int, mean_lum double, "
                "features array<float>"),
    )


def audio_features(
    audio: DataFrame, decoder: Callable[[bytes], np.ndarray] = decode_audio,
) -> DataFrame:
    """(audio_id, bytes) -> (audio_id, duration_samples, rms, zero_cross).

    ``decoder`` defaults to the NotImplementedError stub; tests inject
    :func:`fake_audio_decoder`.
    """
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                # quarantine corrupt bytes (NULL features, row kept) but
                # let the stub's NotImplementedError stay loud — a missing
                # codec is a deployment error, not bad data
                try:
                    wave = decoder(t.bytes)
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append({
                        "audio_id": t.audio_id, "duration_samples": None,
                        "rms": None, "zero_cross": None,
                    })
                    continue
                zc = int(np.sum(np.abs(np.diff(np.signbit(wave)))))
                rows.append({
                    "audio_id": t.audio_id,
                    "duration_samples": int(len(wave)),
                    "rms": float(np.sqrt(np.mean(wave**2))) if len(wave) else 0.0,
                    "zero_cross": zc,
                })
            yield pd.DataFrame(rows)

    return audio.select("audio_id", "bytes").mapInPandas(
        _batches,
        schema="audio_id string, duration_samples long, rms double, zero_cross long",
    )
