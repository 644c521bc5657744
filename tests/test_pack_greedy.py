"""Property tests for the shared greedy pack kernel (_pack_greedy): for ANY
token-count sequence and budget, the packing must conserve docs/tokens, stay
within budget except for lone oversized docs, and match a naive sequential
replay.  Pure-kernel tests — no Ray session needed."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from legislation_scraper_ray.pipelines.analytics import _pack_greedy


def _naive(tokens, budget):
    packs, cur_n, cur_d = [], 0, 0
    for t in tokens:
        if cur_d and cur_n + t > budget:
            packs.append((cur_d, cur_n))
            cur_n, cur_d = 0, 0
        cur_n += t
        cur_d += 1
    if cur_d:
        packs.append((cur_d, cur_n))
    return packs


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=300),
)
def test_pack_greedy_properties(tokens, budget):
    g = pd.DataFrame({
        "doc_id": np.arange(len(tokens), dtype=np.int64),
        "shard": np.zeros(len(tokens), np.int64),
        "n_tokens": np.asarray(tokens, np.int64),
    })
    out = _pack_greedy(g, budget)
    # conservation
    assert out["n_docs"].sum() == len(tokens)
    assert out["n_tokens"].sum() == sum(tokens)
    # budget compliance except lone oversized docs
    over = out[out["n_tokens"] > budget]
    assert (over["n_docs"] == 1).all()
    # pack ids dense and ordered
    assert out["pack_id"].tolist() == list(range(len(out)))
    # exact match vs the naive sequential replay
    assert list(zip(out["n_docs"], out["n_tokens"])) == _naive(tokens, budget)


@settings(max_examples=50, deadline=None)
@given(tokens=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40))
def test_pack_greedy_unit_budget_one_doc_per_pack_when_oversized(tokens):
    g = pd.DataFrame({
        "doc_id": np.arange(len(tokens), dtype=np.int64),
        "shard": np.zeros(len(tokens), np.int64),
        "n_tokens": np.asarray(tokens, np.int64),
    })
    out = _pack_greedy(g, 1)
    # every doc with >1 token must sit alone; 1-token docs may not merge
    # either (adding any doc to a nonempty pack exceeds budget 1 unless the
    # incoming doc has 0 tokens)
    assert out["n_docs"].tolist() == [1] * len(tokens)
