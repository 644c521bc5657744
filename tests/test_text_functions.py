import numpy as np
import pyarrow as pa

from legislation_scraper_ray.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_stats,
)


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def test_token_stats():
    out = token_stats(_tbl(["one two three", "a", "x y"]))
    assert out["n_tokens"].to_pylist() == [3, 1, 2]
    out2 = token_stats(_tbl(["abc 123 !?"]))
    assert out2["n_bpe_tokens"].to_pylist() == [4]  # abc, 123, !, ?


def test_lang_id_profiles():
    out = lang_id(
        _tbl(
            [
                "the cat sat on the mat and the dog",
                "el gato y la casa de los perros en madrid",
                "der hund und die katze in den garten von berlin",
                "zzz qqq xxx",  # no stopwords from any profile
            ]
        )
    )
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "und"]


def test_quality_features_ranges():
    out = quality_features(_tbl(["the quick brown fox jumps over the lazy dog"] * 3))
    q = out["quality"].to_pylist()
    assert all(0.0 <= x <= 1.0 for x in q)
    assert out["stopword_ratio"].to_pylist()[0] > 0.2  # 'the' ×2 of 9 tokens
    assert abs(out["mean_token_len"].to_pylist()[0] - (35 / 9)) < 1e-9


def test_fingerprint_shift_robustness():
    base = "alpha beta gamma delta epsilon zeta eta theta"
    shifted = "PREFIX " + base  # content shifted by one token
    out = fingerprint(_tbl([base, shifted, "totally different words here now"]))
    fp = out["fp_exact"].to_pylist()
    mh = out["fp_shingle_min"].to_pylist()
    assert fp[0] != fp[1]  # exact hash differs on any edit
    assert mh[0] == mh[1] or mh[1] == mh[0]  # min-shingle survives a prefix shift
    assert mh[0] != mh[2]
