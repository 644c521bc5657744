"""Multimodal stage plumbing: binary payload columns through actor stages.

The container has no real image libs (PIL etc.); codecs are the deterministic
in-repo implementations and unsupported formats raise NotImplementedError —
these tests pin the Ray-side plumbing (schema, batching, actor signature)."""

import numpy as np
import pyarrow as pa
import pytest


def test_decode_stage_mixed_batches(ray_session):
    import ray.data as rd

    from legislation_scraper_ray.sources.codec import encode_png, phash64
    from legislation_scraper_ray.stages.decode import DecodeActor

    rng = np.random.default_rng(0)
    rows = []
    for i in range(20):
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        rows.append(
            {
                "bytes": encode_png(px),
                "fmt": "png",
                "dec_sum": int(px.sum(dtype=np.uint64)),
                "phash": phash64(px),
                "psnr_db": float("inf"),
                "caption": f"cap {i}",
            }
        )
    rows.append(  # a payload-less row (listing analog)
        {"bytes": None, "fmt": None, "dec_sum": None, "phash": None, "psnr_db": None,
         "caption": None}
    )
    ds = rd.from_items(rows).map_batches(
        DecodeActor, batch_format="pyarrow", batch_size=8, concurrency=2, num_cpus=0.5
    )
    out = ds.to_pandas()
    decoded = out[out["bytes"].notna()]
    assert decoded["decode_ok"].all()
    assert len(out[out["bytes"].isna()]) == 1
    assert out["feat_mean_rgb"].iloc[0] is not None


def test_resize_stub_plumbing(ray_session):
    import ray.data as rd

    from legislation_scraper_ray.stages.multimodal import ResizeActor

    from legislation_scraper_ray.sources.codec import encode_png

    rng = np.random.default_rng(1)
    rows = [
        {"bytes": encode_png(rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)), "fmt": "png"}
        for _ in range(10)
    ]
    ds = rd.from_items(rows).map_batches(
        ResizeActor, fn_constructor_kwargs={"target": (8, 8)}, batch_format="pyarrow",
        batch_size=4, concurrency=2, num_cpus=0.5
    )
    out = ds.to_pandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    assert out["bytes"].map(len).gt(0).all()


def test_unsupported_format_raises():
    from legislation_scraper_ray.sources.codec import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP", "webp")
