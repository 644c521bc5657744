"""Property coverage for text.kgram_pos_hashes (the span-dedup kernel):
positions are exactly the in-doc k-gram starts, equal token windows get
equal dual hashes, and distinct windows get distinct dual hashes (on real
vocab sizes a dual collision would require a simultaneous 128-bit event)."""

import numpy as np
import pyarrow as pa


def _naive(texts, k):
    out = []
    for d, t in enumerate(texts):
        toks = t.split(" ")
        for p in range(max(len(toks) - k + 1, 0)):
            out.append((d, p, tuple(toks[p:p + k])))
    return out


def test_positions_and_window_equivalence():
    from legislation_scraper_ray.functions.text import kgram_pos_hashes

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=n))
             for n in [0, 3, 7, 8, 9, 40, 120]
             # n=0 → "" splits to [""] (one token); keep it to pin behavior
             ]
    k = 8
    h1, h2, par, pos = kgram_pos_hashes(pa.array(texts, pa.string()), k)
    naive = _naive(texts, k)

    # same (doc, pos) set, in the same flat order
    assert list(zip(par.tolist(), pos.tolist())) == [(d, p)
                                                     for d, p, _ in naive]
    # hash equality ⇔ window equality (both families agree with the string
    # windows on this corpus)
    pairs = list(zip(h1.tolist(), h2.tolist()))
    windows = [w for _, _, w in naive]
    seen: dict = {}
    for hp, w in zip(pairs, windows):
        if hp in seen:
            assert seen[hp] == w, "dual-hash collision on distinct windows"
        seen[hp] = w
    by_window: dict = {}
    for hp, w in zip(pairs, windows):
        if w in by_window:
            assert by_window[w] == hp, "equal windows hashed differently"
        by_window[w] = hp


def test_cross_doc_equal_windows_share_hashes():
    from legislation_scraper_ray.functions.text import kgram_pos_hashes

    shared = " ".join(f"s{i}" for i in range(10))
    texts = [f"a b c {shared}", f"{shared} x y", "unrelated " * 12]
    h1, h2, par, pos = kgram_pos_hashes(pa.array(texts, pa.string()), 8)
    key = {}
    for a, b, d, p in zip(h1.tolist(), h2.tolist(), par.tolist(),
                          pos.tolist()):
        key[(d, p)] = (a, b)
    # doc0's shared window starts at token 3; doc1's at 0 — same 8 tokens
    for off in range(3):  # three shared 8-gram starts inside the 10 tokens
        assert key[(0, 3 + off)] == key[(1, 0 + off)]
    # no window of doc2 matches any shared one
    shared_hashes = {key[(1, off)] for off in range(3)}
    doc2 = {v for (d, _), v in key.items() if d == 2}
    assert not (shared_hashes & doc2)
