import numpy as np

from biomass_processing_pipeline_spark import imaging, synth


def test_codecs_roundtrip_and_psnr():
    px = synth.image_pixels(123, 48, 32)
    assert px.shape == (32, 48, 3)
    for fmt in ("raw", "png"):
        dec = imaging.decode_image(imaging.encode_image(px, fmt))
        assert (dec == px).all(), fmt
    dec = imaging.decode_image(imaging.encode_image(px, "jpeg"))
    assert imaging.psnr(px, dec) >= 40.0  # input_hint lossy invariant


def test_pixels_deterministic():
    a = synth.image_pixels(7, 64, 64)
    b = synth.image_pixels(7, 64, 64)
    assert (a == b).all()
    c = synth.image_pixels(8, 64, 64)
    assert not (a == c).all()


def test_phash_stable_and_sensitive():
    px = synth.image_pixels(9, 64, 64)
    h1 = imaging.phash64(px)
    assert h1 == imaging.phash64(px.copy())
    other = synth.image_pixels(10, 64, 64)
    assert h1 != imaging.phash64(other)
    assert -(1 << 63) <= h1 < (1 << 63)
