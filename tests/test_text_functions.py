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


def test_segmented_reductions_trailing_empty():
    # Trailing empty segments after a nonempty one must not truncate the last
    # nonempty segment's reduction range (reduceat clamping bug).
    from legislation_scraper_ray.functions.text import segmented_min, segmented_sum

    vals = np.array([5, 3, 9, 1], dtype=np.uint64)
    parents = np.array([0, 0, 1, 1], dtype=np.int64)
    ident = np.iinfo(np.uint64).max
    out = segmented_min(vals, parents, 4, ident)
    assert out.tolist() == [3, 1, int(ident), int(ident)]
    s = segmented_sum(vals.astype(np.int64), parents, 4)
    assert s.tolist() == [8, 10, 0, 0]
    # interior empty segment
    parents2 = np.array([0, 0, 2, 2], dtype=np.int64)
    out2 = segmented_min(vals, parents2, 3, ident)
    assert out2.tolist() == [3, int(ident), 1]
    # 2-D vals (the MinHash signature shape)
    v2 = np.array([[5, 1], [3, 2], [9, 0], [1, 7]], dtype=np.uint64)
    o2 = segmented_min(v2, parents, 3, ident)
    assert o2[:2].tolist() == [[3, 1], [1, 0]]
    # empty input
    assert segmented_min(np.empty((0,), np.uint64), np.empty((0,), np.int64), 2, ident).tolist() == [int(ident)] * 2


def test_redact_pii():
    import pyarrow as pa

    from legislation_scraper_ray.functions.text import redact_pii

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "contact me at jane.doe+x@example.co.uk for details",
            "call +55 11 9123 4567 or 192.168.0.1",
            "card 4111 1111 1111 1111 expires soon",
            "clean text with no pii at all",
        ],
    })
    out = redact_pii(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "contact me at <EMAIL> for details"
    assert "<PHONE>" in texts[1] and "<IP>" in texts[1]
    assert "<CARD>" in texts[2] and "4111" not in texts[2]
    assert texts[3] == "clean text with no pii at all"
    assert out["n_redactions"].to_pylist() == [1, 2, 1, 0]
