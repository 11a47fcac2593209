import numpy as np
import pandas as pd
import pytest

from biomass_processing_pipeline_spark import imaging, synth
from biomass_processing_pipeline_spark.operators.multimodal import (
    audio_features,
    decode_audio,
    fake_audio_decoder,
    image_resize_features,
    resize_block_mean,
    video_frame_sample,
)
from biomass_processing_pipeline_spark.sources.images import load_images


def test_resize_block_mean_exact():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = resize_block_mean(px, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == int(px[:4, :4, 0].mean())


def test_image_resize_features(spark, smoke_dir):
    images = load_images(spark, smoke_dir).limit(50)
    out = image_resize_features(images).toPandas()
    assert len(out) == 50
    assert all(len(f) == 4 * 4 * 3 for f in out.features)
    th = imaging.decode_image(out.thumb.iloc[0])
    assert th.shape == (8, 8, 3)
    # features deterministic across runs
    out2 = image_resize_features(images).toPandas()
    a = out.sort_values("image_id").features.iloc[0]
    b = out2.sort_values("image_id").features.iloc[0]
    assert np.allclose(a, b)


def test_video_frame_sample(spark):
    frames = [synth.image_pixels(i, 16, 16) for i in range(6)]
    blob = b"".join(imaging.encode_image(f, "raw") for f in frames)
    df = spark.createDataFrame(
        pd.DataFrame([{"video_id": "v1", "bytes": blob, "n_frames": 6,
                       "w": 16, "h": 16}])
    )
    out = video_frame_sample(df, every_k=2).toPandas()
    assert list(out.frame_idx) == [0, 2, 4]
    assert np.isclose(out.mean_lum.iloc[0], frames[0].mean(), atol=0.5)


def test_audio_stub_and_fake(spark):
    df = spark.createDataFrame(
        pd.DataFrame([
            {"audio_id": "a1", "bytes": bytes(range(0, 128))},
            {"audio_id": "a2", "bytes": b"\x00" * 64},
        ])
    )
    out = audio_features(df, decoder=fake_audio_decoder).toPandas()
    out = out.set_index("audio_id")
    assert out.loc["a1"].duration_samples == 128
    assert out.loc["a2"].rms == 0.0
    with pytest.raises(NotImplementedError):
        decode_audio(b"xx")
    # default (stub) decoder must surface the NotImplementedError via Spark
    with pytest.raises(Exception, match="NotImplementedError|no audio codec"):
        audio_features(df).collect()


def test_corrupt_image_and_frame_quarantined(spark):
    """Corrupt blobs yield rows with NULL features (nothing vanishes,
    nothing crashes) in both the image and the video Arrow passes."""
    import pandas as pd

    good_px = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = imaging.encode_image(good_px, "raw")
    images = spark.createDataFrame(
        [("ok", good), ("bad", b"\xffnope")],
        "image_id string, bytes binary")
    out = (image_resize_features(images).toPandas()
           .set_index("image_id"))
    assert out.loc["ok", "features"] is not None
    assert out.loc["bad", "features"] is None and out.loc["bad", "thumb"] is None

    # 2-frame video whose second frame is garbage of the same length
    frame = imaging.encode_image(good_px, "raw")
    vid = frame + b"\x00" * len(frame)
    videos = spark.createDataFrame(
        [("v1", vid, 2, 8, 8), ("v0", b"", 0, 8, 8),
         # NULL metadata / NULL blob: Arrow hands NULL ints as NaN/NA,
         # which must skip cleanly, not TypeError inside the UDF
         ("vnull_n", vid, None, 8, 8), ("vnull_b", None, 2, 8, 8)],
        "video_id string, bytes binary, n_frames int, w int, h int")
    vf = (video_frame_sample(videos, every_k=1).toPandas()
          .set_index(["video_id", "frame_idx"]).sort_index())
    assert np.isfinite(vf.loc[("v1", 0), "mean_lum"])
    assert pd.isna(vf.loc[("v1", 1), "mean_lum"])  # corrupt frame kept, NULL
    top = vf.index.get_level_values(0)
    for vid_id in ("v0", "vnull_n", "vnull_b"):  # nothing to sample: no rows
        assert vid_id not in top

    # Same rows in ONE Arrow batch: a single NULL n_frames coerces the
    # whole int column to float64, so valid siblings arrive as np.float64
    # (2.0, not 2) — they must still sample, not silently drop
    vf1 = (video_frame_sample(videos.coalesce(1), every_k=1).toPandas()
           .set_index(["video_id", "frame_idx"]).sort_index())
    assert ("v1", 0) in vf1.index and ("v1", 1) in vf1.index
    assert np.isfinite(vf1.loc[("v1", 0), "mean_lum"])
    for vid_id in ("v0", "vnull_n", "vnull_b"):
        assert vid_id not in vf1.index.get_level_values(0)


def test_corrupt_audio_quarantined_stub_stays_loud(spark):
    """A decoder failure on one blob yields a NULL-feature row; the
    NotImplementedError codec stub still raises (deployment error, not
    bad data)."""
    def picky(blob: bytes) -> np.ndarray:
        if blob.startswith(b"BAD"):
            raise ValueError("corrupt frame")
        return fake_audio_decoder(blob)

    audio = spark.createDataFrame(
        [("a_ok", b"\x01\x02\x03\x04"), ("a_bad", b"BADBYTES")],
        "audio_id string, bytes binary")
    out = audio_features(audio, decoder=picky).toPandas().set_index("audio_id")
    assert out.loc["a_ok", "duration_samples"] == 4
    assert pd.isna(out.loc["a_bad", "rms"])
    import pytest as _pytest
    with _pytest.raises(Exception, match="(?i)audio codec|NotImplemented"):
        audio_features(audio.where("audio_id = 'a_ok'")).collect()
