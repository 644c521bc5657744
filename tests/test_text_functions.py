import numpy as np
import pandas as pd
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


def test_bpe_train_matches_naive_reference():
    """Merge sequence == a character-level naive BPE on the same weighted
    vocab (independent implementation: dict-of-list resegmentation)."""
    from legislation_scraper_ray.functions.text import bpe_train

    words = np.array(["low", "lower", "newest", "widest", "new"])
    counts = np.array([5, 2, 6, 3, 4])

    def naive(words, counts, n):
        segs = {w: [*w, "</w>"] for w in words}
        out = []
        for r in range(n):
            freq = {}
            for w, c in zip(words, counts):
                s = segs[w]
                for i in range(len(s) - 1):
                    freq[(s[i], s[i + 1])] = freq.get((s[i], s[i + 1]), 0) + int(c)
            if not freq:
                break
            m = max(freq.values())
            pair = min(p for p, f in freq.items() if f == m)
            out.append((pair, r))
            a, b = pair
            for w in words:
                s, i, ns = segs[w], 0, []
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        ns.append(a + b); i += 2
                    else:
                        ns.append(s[i]); i += 1
                segs[w] = ns
        return out

    got = bpe_train(words, counts, n_merges=8)
    assert got == naive(words, counts, 8)


def test_bpe_encode_len_applies_rank_order():
    from legislation_scraper_ray.functions.text import bpe_encode_len, bpe_train

    words = np.array(["aaab", "aab"])
    counts = np.array([10, 5])
    ranks = dict(bpe_train(words, counts, n_merges=4))
    # 'aaab</w>' fully merged under enough merges -> strictly fewer tokens
    n_raw = len("aaab") + 1
    assert 1 <= bpe_encode_len("aaab", ranks) < n_raw
    # unseen word still encodes (fewer merges apply), never errors
    assert bpe_encode_len("zzz", ranks) == 4


def test_bpe_train_token_counts_registry(ray_session):
    """End-to-end: counts equal a per-doc re-encode with the same ranks."""
    from legislation_scraper_ray.functions.text import bpe_encode_len, bpe_train
    from legislation_scraper_ray.pipelines.queries import bpe_train_token_counts

    sf = "/root/testdata/sf0.001"
    got = bpe_train_token_counts(sf, n_merges=16).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # re-derive ranks exactly as the query does (vocab = all words here)
    from collections import Counter
    wc = Counter()
    for t in docs["text"]:
        wc.update(t.split(" "))
    items = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    words = np.array([w for w, _ in items])
    counts = np.array([c for _, c in items])
    ranks = dict(bpe_train(words, counts, n_merges=16))
    memo = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        n = 0
        for w in text.split(" "):
            if w not in memo:
                memo[w] = bpe_encode_len(w, ranks)
            n += memo[w]
        assert got.loc[did, "n_bpe_tokens"] == n


def test_bpe_invariants_cross_scale():
    """VERDICT r3 #7: structural invariants beyond one-fixture parity —
    (1) per-word token count is MONOTONE NON-INCREASING as merges accumulate
        (a merge can only join adjacent symbols, never split them);
    (2) length conservation: the concatenation of a word's BPE tokens always
        reproduces the word + '</w>' (encode/decode round-trips exactly);
    (3) token count bounds: 1 ≤ n_tokens ≤ len(word) + 1."""
    import numpy as np

    from legislation_scraper_ray.functions.text import bpe_encode_len, bpe_train

    rng = np.random.default_rng(5)
    alphabet = list("abcdef")
    words = np.array(
        ["".join(rng.choice(alphabet, rng.integers(1, 12))) for _ in range(120)]
        + ["aaaa", "abab", "banana", "a"],
        dtype=object,
    )
    counts = rng.integers(1, 50, size=len(words))

    def encode_tokens(word, ranks):
        # mirror bpe_encode_len but keep the token strings (for invariant 2)
        seq = list(word) + ["</w>"]
        while len(seq) > 1:
            best_rank, best_i = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
        return seq

    prev_lens = None
    for n_merges in (0, 2, 4, 8, 16, 32):
        ranks = dict(bpe_train(words, counts, n_merges=n_merges))
        lens = np.array([bpe_encode_len(w, ranks) for w in words])
        # (3) bounds
        assert (lens >= 1).all()
        assert (lens <= np.array([len(w) + 1 for w in words])).all()
        # (1) monotone under merge accumulation (bpe_train's merge list is a
        # prefix-extension as n_merges grows: same deterministic tiebreak)
        if prev_lens is not None:
            assert (lens <= prev_lens).all()
        prev_lens = lens
        # (2) exact round-trip for every word
        for w in words:
            toks = encode_tokens(w, ranks)
            assert "".join(toks) == w + "</w>", (w, n_merges)
            assert len(toks) == bpe_encode_len(w, ranks)
    # with enough merges the most frequent short words collapse to 1 token
    assert prev_lens is not None and (prev_lens == 1).any()


def test_bpe_merge_list_prefix_stable():
    """Training with more merges extends the merge list without reordering
    the earlier ranks (required for the monotonicity invariant above and for
    incremental vocab growth at scale)."""
    import numpy as np

    from legislation_scraper_ray.functions.text import bpe_train

    rng = np.random.default_rng(9)
    words = np.array(
        ["".join(rng.choice(list("abcd"), rng.integers(2, 8))) for _ in range(60)],
        dtype=object,
    )
    counts = rng.integers(1, 20, size=len(words))
    m8 = bpe_train(words, counts, n_merges=8)
    m16 = bpe_train(words, counts, n_merges=16)
    assert m16[: len(m8)] == m8
