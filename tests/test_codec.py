import numpy as np
import pytest

from legislation_scraper_ray.sources.codec import (
    decode_fake_jpeg,
    decode_image,
    decode_png,
    encode_fake_jpeg,
    encode_png,
    phash64,
    psnr,
)


def _img(seed=0, h=17, w=23):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    px = _img()
    assert (decode_png(encode_png(px)) == px).all()


def test_png_roundtrip_various_sizes():
    for seed, (h, w) in enumerate([(8, 8), (64, 8), (8, 64), (33, 47)]):
        px = _img(seed, h, w)
        assert (decode_png(encode_png(px)) == px).all()


def test_fake_jpeg_lossy_psnr():
    px = _img(1, 32, 32)
    dec = decode_fake_jpeg(encode_fake_jpeg(px))
    p = psnr(px, dec)
    assert 40.0 <= p < 60.0  # lossy but within the invariant band
    # decode is deterministic: encoding again yields identical bytes
    assert encode_fake_jpeg(px) == encode_fake_jpeg(px.copy())


def test_psnr_identical_is_inf():
    px = _img(2)
    assert psnr(px, px) == float("inf")


def test_phash_duplicates_share():
    px = _img(3)
    assert phash64(px) == phash64(px.copy())
    other = _img(4)
    assert phash64(px) != phash64(other)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"xxxx", "webp")
