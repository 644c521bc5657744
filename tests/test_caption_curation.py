"""Caption-curation operators over a planted image corpus: swapped captions
flag inconsistent; reused alt-text is mined with exact counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _corpus(tmp_path, n=120, swaps=((5, 17), (30, 31)), reuse=None):
    """Minimal corpus.parquet: captions follow the generator's 'Lei N de Y:'
    shape; ``swaps`` exchanges caption pairs (mismatched ids), ``reuse`` maps
    image index -> source index whose caption it copies verbatim."""
    caps = [f"Lei {i} de {1990 + i % 10}: norma artigo {i}" for i in range(n)]
    for a, b in swaps:
        caps[a], caps[b] = caps[b], caps[a]
    for dst, src in (reuse or {}).items():
        caps[dst] = caps[src]
    tbl = pa.table({
        "image_id": pa.array([f"img_{i:08d}" for i in range(n)]),
        "caption": pa.array(caps),
    })
    pq.write_table(tbl, tmp_path / "corpus.parquet")
    return caps


def test_consistency_flags_swapped_pairs(ray_session, tmp_path):
    swaps = ((5, 17), (30, 31))
    _corpus(tmp_path, swaps=swaps)
    from legislation_scraper_ray.pipelines.queries import caption_consistency_docs

    out = (caption_consistency_docs("ignored", corpus_dir=str(tmp_path))
           .to_pandas().set_index("image_id"))
    bad = {f"img_{i:08d}" for pair in swaps for i in pair}
    assert set(out.index[out["consistent"] == 0]) == bad
    # the flagged rows still report the caption's claimed id (the swap source)
    assert out.loc["img_00000005", "caption_id"] == 17
    assert (out["consistent"] == 1).sum() == len(out) - len(bad)


def test_consistency_handles_malformed_caption(ray_session, tmp_path):
    caps = _corpus(tmp_path, n=10, swaps=())
    tbl = pq.read_table(tmp_path / "corpus.parquet")
    caps[3] = "no law header at all"
    pq.write_table(pa.table({"image_id": tbl["image_id"],
                             "caption": pa.array(caps)}), tmp_path / "corpus.parquet")
    from legislation_scraper_ray.pipelines.queries import caption_consistency_docs

    out = (caption_consistency_docs("ignored", corpus_dir=str(tmp_path))
           .to_pandas().set_index("image_id"))
    assert out.loc["img_00000003", "consistent"] == 0
    assert pd.isna(out.loc["img_00000003", "caption_id"])


def test_reuse_stats_planted(ray_session, tmp_path):
    # images 100..104 all copy image 7's caption; 110 copies 8's
    reuse = {100: 7, 101: 7, 102: 7, 103: 7, 104: 7, 110: 8}
    _corpus(tmp_path, swaps=(), reuse=reuse)
    from legislation_scraper_ray.functions.hashing import hash64
    from legislation_scraper_ray.pipelines.queries import caption_reuse_stats

    out = caption_reuse_stats("ignored", corpus_dir=str(tmp_path))
    assert len(out) == 2
    top = out.iloc[0]
    assert top["n_images"] == 6 and top["first_image_id"] == "img_00000007"
    second = out.iloc[1]
    assert second["n_images"] == 2 and second["first_image_id"] == "img_00000008"
    caps = pq.read_table(tmp_path / "corpus.parquet")["caption"]
    h7 = int(hash64(caps.slice(7, 1).combine_chunks()).view(np.int64)[0])
    assert int(top["cap_hash"]) == h7


def test_reuse_stats_empty_when_unique(ray_session, tmp_path):
    _corpus(tmp_path, swaps=(), reuse=None)
    from legislation_scraper_ray.pipelines.queries import caption_reuse_stats

    out = caption_reuse_stats("ignored", corpus_dir=str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["cap_hash", "n_images", "first_image_id"]
