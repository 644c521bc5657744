"""Ground-truth tests for the analytics operator family (pipelines/analytics.py):
pandas/numpy brute-force oracles for every query, plus estimator-specific
checks (HLL error bound + merge associativity, sampling determinism)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _df(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_distinct_users_exact(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import distinct_users_by_type

    got = _df(distinct_users_by_type(SF)).set_index("event_type")["n_users"]
    want = events.groupby("event_type")["user_id"].nunique()
    for et, n in want.items():
        assert got[et] == n


def test_hll_small_range_accuracy(ray_session, events):
    """At sf scale every type has ≲150 distinct users — the linear-counting
    regime, where the estimate should be essentially exact."""
    from legislation_scraper_ray.pipelines.analytics import hll_distinct_users

    got = _df(hll_distinct_users(SF)).set_index("event_type")["n_users_est"]
    want = events.groupby("event_type")["user_id"].nunique()
    for et, n in want.items():
        assert abs(int(got[et]) - n) <= max(1, 0.02 * n)


def test_hll_large_cardinality_and_merge():
    """Estimator accuracy at real sketch cardinality (200k uniques ≫ m=4096),
    and the HLL merge law: registers from split batches max-merge to the same
    sketch as a single pass."""
    from legislation_scraper_ray.pipelines.analytics import (
        _hll_estimate,
        _hll_partial_batch,
    )

    n = 200_000
    uid = np.arange(n, dtype=np.int64) * 7919 + 13  # distinct keys
    t = pa.table({"event_type": pa.array(["x"] * n), "user_id": pa.array(uid)})
    one = np.frombuffer(_hll_partial_batch(t)["regs"][0].as_py(), dtype=np.uint8)

    parts = []
    for lo in range(0, n, 33_333):
        parts.append(
            np.frombuffer(
                _hll_partial_batch(t.slice(lo, 33_333))["regs"][0].as_py(), dtype=np.uint8
            )
        )
    merged = np.maximum.reduce(parts)
    assert np.array_equal(one, merged)

    est = _hll_estimate(one)
    assert abs(est - n) / n < 0.05  # σ ≈ 1.6 % at p=12


def test_value_quantiles_exact(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import value_quantiles_by_type

    got = _df(value_quantiles_by_type(SF)).set_index("event_type")
    for et, g in events.groupby("event_type"):
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90)):
            want = np.percentile(g["value"].to_numpy(), q)  # linear interpolation
            assert abs(got.loc[et, col] - want) < 1e-4


def test_median_by_user(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import median_value_by_user

    got = _df(median_value_by_user(SF)).set_index("user_id")
    want = events.groupby("user_id")["value"].median()
    for uid, m in want.items():
        assert abs(got.loc[uid, "med_value"] - m) < 1e-4
    assert (got["n"].sort_index() == events.groupby("user_id").size().sort_index()).all()


def test_top_tokens(ray_session, docs):
    from collections import Counter

    from legislation_scraper_ray.pipelines.analytics import top_tokens

    got = _df(top_tokens(SF, k=10))
    cnt = Counter()
    for txt in docs["text"]:
        cnt.update(txt.split(" "))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["token"], got["n"])) == want


def test_tfidf_top_term(ray_session, docs):
    from collections import Counter

    from legislation_scraper_ray.pipelines.analytics import tfidf_top_term

    got = _df(tfidf_top_term(SF)).set_index("doc_id")
    n_docs = len(docs)
    df_counts = Counter()
    tfs = {}
    for doc_id, txt in zip(docs["doc_id"], docs["text"]):
        tf = Counter(txt.split(" "))
        tfs[doc_id] = tf
        df_counts.update(tf.keys())
    assert len(got) == n_docs
    for doc_id, tf in tfs.items():
        scored = sorted(
            ((c * np.log(n_docs / df_counts[w]), w) for w, c in tf.items()),
            key=lambda sw: (-sw[0], sw[1]),
        )
        s, w = scored[0]
        assert got.loc[doc_id, "term"] == w
        assert abs(got.loc[doc_id, "tfidf"] - s) < 1e-3


def test_sample_docs_hash_deterministic(ray_session, docs):
    from legislation_scraper_ray.functions.hashing import splitmix64
    from legislation_scraper_ray.pipelines.analytics import sample_docs_hash

    got = _df(sample_docs_hash(SF))
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    want = set(docs["doc_id"][splitmix64(ids) % np.uint64(10) == 0])
    assert set(got["doc_id"]) == want
    # roughly a 10 % draw (binomial tolerance at n=500)
    assert 0.04 <= len(got) / len(docs) <= 0.18


def test_stratified_sample(ray_session, docs):
    from legislation_scraper_ray.functions.hashing import splitmix64
    from legislation_scraper_ray.pipelines.analytics import stratified_sample_docs

    got = _df(stratified_sample_docs(SF, k=20))
    d = docs.copy()
    d["skey"] = splitmix64(d["doc_id"].to_numpy().astype(np.uint64))
    for lang, g in d.groupby("lang"):
        want = g.sort_values(["skey", "doc_id"]).head(20)["doc_id"].tolist()
        sub = got[got["lang"] == lang].sort_values("rank")
        assert sub["doc_id"].tolist() == want
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))


def test_customers_without_orders(ray_session):
    from legislation_scraper_ray.pipelines.analytics import customers_without_orders

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    big = set(orders.loc[orders["o_totalprice"] > 300_000.0, "o_custkey"])
    want = set(cust["c_custkey"]) - big
    got = _df(customers_without_orders(SF))
    assert set(got["c_custkey"]) == want
    names = cust.set_index("c_custkey")["c_name"]
    for _, r in got.iterrows():
        assert r["c_name"] == names[r["c_custkey"]]


def test_rollup_counts_consistent(ray_session):
    from legislation_scraper_ray.pipelines.analytics import rollup_counts

    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_linestatus"])
    got = _df(rollup_counts(SF))
    total = got[(got["l_returnflag"] == "ALL") & (got["l_linestatus"] == "ALL")]["n"].iloc[0]
    assert total == len(li)
    fine = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] != "ALL")]
    want = li.groupby(["l_returnflag", "l_linestatus"]).size()
    assert len(fine) == len(want)
    for (rf, ls), n in want.items():
        assert fine[(fine["l_returnflag"] == rf) & (fine["l_linestatus"] == ls)]["n"].iloc[0] == n
    lvl1 = got[(got["l_returnflag"] != "ALL") & (got["l_linestatus"] == "ALL")]
    assert lvl1["n"].sum() == len(li)


def test_bloom_filter_properties():
    from legislation_scraper_ray.functions.bloom import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=20_000, replace=False).astype(np.int64)
    others = (rng.choice(10**9, size=20_000, replace=False) + 10**9).astype(np.int64)
    bm = bloom_build(members)
    # zero false negatives
    assert bloom_contains(bm, members).all()
    # FP rate ≈ (1-e^{-kn/m})^k ≈ 3e-5 at n=20k, m=2^20, k=4 — allow slack
    assert bloom_contains(bm, others).mean() < 0.01
    # OR-merge of partials == single-pass build
    parts = [bloom_build(members[i::4]) for i in range(4)]
    assert np.array_equal(bloom_merge(parts), bm)


def test_value_rank_in_type(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import value_rank_in_type

    got = _df(value_rank_in_type(SF)).set_index("event_id")["rnk"]
    want = (
        events.groupby("event_type")["value"].rank(method="min").astype("int64")
    )
    for eid, r in zip(events["event_id"], want):
        assert got[eid] == r


def test_bloom_semi_join(ray_session):
    from legislation_scraper_ray.pipelines.analytics import lineitem_big_orders_semi

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    qual = set(orders.loc[orders["o_totalprice"] > 400_000.0, "o_orderkey"])
    sub = li[li["l_orderkey"].isin(qual)]
    want = (
        sub.assign(rev=sub["l_extendedprice"] * (1 - sub["l_discount"]))
        .groupby("l_returnflag")["rev"]
        .agg(["sum", "size"])
    )
    got = _df(lineitem_big_orders_semi(SF)).set_index("l_returnflag")
    assert len(got) == len(want)
    for rf, row in want.iterrows():
        assert abs(got.loc[rf, "revenue"] - row["sum"]) < 1e-2
        assert got.loc[rf, "n"] == row["size"]


def test_value_quantiles_sample_bounds(ray_session, events):
    """Bottom-k sample quantiles must land inside a ±5 % quantile band of the
    exact distribution (deterministic: hash-keyed sample)."""
    from legislation_scraper_ray.pipelines.analytics import value_quantiles_sample

    got = _df(value_quantiles_sample(SF)).set_index("event_type")
    for et, g in events.groupby("event_type"):
        v = g["value"].to_numpy()
        for col, q in (("p50_est", 50), ("p90_est", 90)):
            lo, hi = np.percentile(v, max(q - 5, 0)), np.percentile(v, min(q + 5, 100))
            assert lo - 1e-9 <= got.loc[et, col] <= hi + 1e-9
        # sf0.001 groups are smaller than k → the sample is the full group
        assert got.loc[et, "sample_n"] == len(g)


def test_top_tokens_sketch_matches_exact(ray_session, docs):
    from legislation_scraper_ray.pipelines.analytics import top_tokens, top_tokens_sketch

    exact = _df(top_tokens(SF, k=100))
    sk = _df(top_tokens_sketch(SF, k=100))
    assert list(zip(sk["token"], sk["n"])) == list(zip(exact["token"], exact["n"]))


def test_top_tokens_sketch_certificate(ray_session, tmp_path):
    """Planted skew: truncation bites (counters < vocab) but the hot tokens'
    exact counts clear the displacement bound → certified-exact top-k.  Then a
    near-uniform corpus under tiny counters must REFUSE (RuntimeError) rather
    than return an uncertified result."""
    import pyarrow.parquet as pq_

    from legislation_scraper_ray.pipelines.analytics import top_tokens_sketch

    hot = " ".join(["hot0"] * 50 + ["hot1"] * 40)
    tails = [f"tail{i}" for i in range(200)]
    texts = [hot] * 20 + [" ".join(tails[i : i + 5]) for i in range(0, 200, 5)]
    d = tmp_path / "skew"
    d.mkdir()
    pq_.write_table(pa.table({"text": pa.array(texts, pa.string())}), d / "documents.parquet")
    got = _df(top_tokens_sketch(str(d), k=2, counters=4))
    assert got["token"].tolist() == ["hot0", "hot1"]
    assert got["n"].tolist() == [50 * 20, 40 * 20]

    flat = [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(40)]
    d2 = tmp_path / "uniform"
    d2.mkdir()
    pq_.write_table(pa.table({"text": pa.array(flat, pa.string())}), d2 / "documents.parquet")
    with pytest.raises(RuntimeError, match="certificate"):
        top_tokens_sketch(str(d2), k=2, counters=2)


def test_value_ts_regression(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import value_ts_regression

    got = _df(value_ts_regression(SF)).set_index("event_type")
    for et, g in events.groupby("event_type"):
        x = g["ts"].astype("int64").to_numpy() / 1e6 - 1_704_000_000.0
        y = g["value"].to_numpy()
        want_corr = np.corrcoef(x, y)[0, 1]
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got.loc[et, "corr_vt"] - want_corr) < 1e-3
        assert abs(got.loc[et, "slope"] - slope) < max(1e-3, abs(slope) * 1e-3)
        assert abs(got.loc[et, "intercept"] - intercept) < 1e-2
        assert got.loc[et, "n"] == len(g)


def test_user_funnel(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import FUNNEL_STAGES, user_funnel

    got = _df(user_funnel(SF)).set_index("stage")["n_users"]
    firsts = events.pivot_table(
        index="user_id", columns="event_type", values="ts", aggfunc="min"
    )
    reached = firsts["signup"].notna() if "signup" in firsts else None
    want = []
    for prev, cur in zip(FUNNEL_STAGES, FUNNEL_STAGES[1:]):
        want.append(int(reached.sum()))
        reached = reached & firsts[cur].notna() & (firsts[cur] > firsts[prev])
    want.append(int(reached.sum()))
    assert [got[s] for s in FUNNEL_STAGES] == want
    # funnel is monotone non-increasing
    assert all(a >= b for a, b in zip(want, want[1:]))


def test_training_data_prep(ray_session, docs):
    """Composed pipeline vs a pandas brute force: quality filter → exact dedup
    (min doc_id per text) → 3-gram-Jaccard ≥ 0.95 components → keep min-id
    representative → token counts."""
    from legislation_scraper_ray.pipelines.analytics import training_data_prep

    base = docs[docs["n_chars"] >= 70]
    uniq = base.sort_values("doc_id").drop_duplicates("text", keep="first")

    def shingles(txt):
        tok = txt.split(" ")
        return {" ".join(tok[i : i + 3]) for i in range(len(tok) - 2)}

    sh = {r.doc_id: shingles(r.text) for r in uniq.itertuples()}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.95:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    keep = {i for i in ids if find(i) == i}
    want = uniq[uniq["doc_id"].isin(keep)]

    got = _df(training_data_prep(SF)).sort_values("doc_id").reset_index(drop=True)
    assert set(got["doc_id"]) == set(want["doc_id"])
    lut = want.set_index("doc_id")
    for r in got.itertuples():
        assert r.lang == lut.loc[r.doc_id, "lang"]
        assert r.n_tokens == len(lut.loc[r.doc_id, "text"].split(" "))


def test_user_type_pivot(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import EVENT_TYPES, user_type_pivot

    got = _df(user_type_pivot(SF)).set_index("user_id").sort_index()
    want = events.pivot_table(
        index="user_id", columns="event_type", values="event_id", aggfunc="count", fill_value=0
    )
    assert (got[[f"n_{t}" for t in EVENT_TYPES]].sum(axis=1) == events.groupby("user_id").size()).all()
    for et in want.columns:
        assert (got[f"n_{et}"].to_numpy() == want[et].to_numpy()).all()


def test_kgram_hashes_matches_trigram_kernel(ray_session):
    """kgram_hashes(k=3) must be bit-identical to the trigram kernel the
    fingerprint operator uses (same Horner mix, same boundary mask)."""
    from legislation_scraper_ray.functions.hashing import hash64
    from legislation_scraper_ray.functions.text import _trigram_hashes, kgram_hashes

    rng = np.random.default_rng(7)
    wh = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    parents = np.sort(rng.integers(0, 12, size=200)).astype(np.int64)
    h3, p3 = _trigram_hashes(wh, parents)
    hk, pk = kgram_hashes(wh, parents, 3)
    assert (h3 == hk).all() and (p3 == pk).all()
    # short input edge
    assert kgram_hashes(wh[:2], parents[:2], 3)[0].size == 0


def test_doc_distinct_kgrams(ray_session):
    from legislation_scraper_ray.functions.text import doc_distinct_kgrams

    texts = pa.array([
        "a b c a b c a b",   # 4-grams: abca bcab cabc abca bcab → 5 total, 3 distinct
        "x y",                # shorter than k → 0
        "p q r s",            # exactly one 4-gram
    ])
    h, par, n_docs, n_total = doc_distinct_kgrams(texts, 4)
    assert n_docs == 3
    assert n_total.tolist() == [5, 0, 1]
    n_distinct = np.bincount(par, minlength=n_docs)
    assert n_distinct.tolist() == [3, 0, 1]


def test_decontaminate_and_repetition(ray_session, docs):
    """Brute-force pandas oracles at sf0.001 for the two hygiene operators."""
    from legislation_scraper_ray.pipelines.analytics import (
        decontaminate_docs,
        repetition_ratio_docs,
    )

    def kgrams(text, k=4):
        tok = text.split(" ")
        return {" ".join(tok[i : i + k]) for i in range(len(tok) - k + 1)}

    ev = set()
    for r in docs.itertuples():
        if r.doc_id % 20 == 0:
            ev |= kgrams(r.text)
    want = {
        r.doc_id: len(kgrams(r.text) & ev)
        for r in docs.itertuples()
        if r.doc_id % 20 != 0 and kgrams(r.text) & ev
    }
    got = _df(decontaminate_docs(SF))
    assert dict(zip(got["doc_id"], got["n_hits"])) == want

    got_rep = _df(repetition_ratio_docs(SF)).set_index("doc_id")
    assert len(got_rep) == len(docs)
    for r in docs.itertuples():
        tok = r.text.split(" ")
        grams = [" ".join(tok[i : i + 3]) for i in range(len(tok) - 2)]
        row = got_rep.loc[r.doc_id]
        assert row["n_kgrams"] == len(grams)
        assert row["n_distinct"] == len(set(grams))
        exp = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        assert abs(row["rep_ratio"] - exp) < 5e-5


def test_export_shards_and_pack_sequences(ray_session, docs):
    from legislation_scraper_ray.functions.hashing import splitmix64
    from legislation_scraper_ray.pipelines.analytics import export_shards, pack_sequences

    shard = splitmix64(docs["doc_id"].to_numpy().astype(np.uint64)) % np.uint64(32)
    ntok = docs["text"].str.split(" ").str.len().to_numpy()

    man = _df(export_shards(SF)).set_index("shard")
    assert man["n_docs"].sum() == len(docs)
    assert man["n_tokens"].sum() == ntok.sum()
    for s in man.index:
        m = shard == np.uint64(s)
        assert man.loc[s, "n_docs"] == m.sum()
        assert man.loc[s, "min_doc_id"] == docs["doc_id"][m].min()
    # hive layout on disk, one dir per shard
    import os
    dirs = sorted(os.listdir(f"/tmp/graft_export/{os.path.basename(SF)}"))
    assert all(d.startswith("shard=") for d in dirs) and len(dirs) == len(man)

    packs = _df(pack_sequences(SF))
    assert packs["n_docs"].sum() == len(docs)
    assert packs["n_tokens"].sum() == ntok.sum()
    # greedy invariants: every pack within budget unless a single oversized
    # doc; consecutive pack of same shard could not absorb the next pack's
    # first doc (budget=256, all docs < 256 tokens here → packs ≤ 256)
    assert (packs["n_tokens"] <= 256).all()
    shard8 = splitmix64(docs["doc_id"].to_numpy().astype(np.uint64)) % np.uint64(8)
    for s, grp in packs.groupby("shard"):
        order = docs.loc[shard8 == np.uint64(s)].sort_values("doc_id")
        toks = order["text"].str.split(" ").str.len().to_numpy()
        # replay greedy
        cur, pid, sizes = 0, 0, []
        for n in toks:
            if cur and cur + n > 256:
                sizes.append(cur); cur = 0
            cur += n
        sizes.append(cur)
        assert grp.sort_values("pack_id")["n_tokens"].tolist() == sizes


def test_pack_sequences_bpe(ray_session, docs):
    """BPE-token packing: budget compliance, token conservation vs the
    tokenizer query, and an exact greedy-walk replay per shard."""
    from legislation_scraper_ray.pipelines.analytics import pack_sequences_bpe
    from legislation_scraper_ray.pipelines.queries import bpe_train_token_counts

    budget = 320
    packs = _df(pack_sequences_bpe(SF, budget=budget))
    counts = bpe_train_token_counts(SF).to_pandas()
    assert packs["n_docs"].sum() == len(docs)
    assert packs["n_tokens"].sum() == counts["n_bpe_tokens"].sum()
    # every pack within budget unless a lone oversized doc
    over = packs[packs["n_tokens"] > budget]
    assert (over["n_docs"] == 1).all()
    # greedy maximality: within a shard, no pack could absorb its successor's
    # first doc — replay the walk per shard against the per-doc counts
    from legislation_scraper_ray.functions.hashing import splitmix64

    counts = counts.set_index("doc_id")["n_bpe_tokens"]
    shard8 = splitmix64(docs["doc_id"].to_numpy().astype(np.uint64)) % np.uint64(8)
    for s, grp in packs.groupby("shard"):
        order = docs.loc[shard8 == np.uint64(s)].sort_values("doc_id")
        toks = counts.loc[order["doc_id"]].to_numpy()
        cur, sizes = 0, []
        for n in toks:
            if cur and cur + n > budget:
                sizes.append(cur); cur = 0
            cur += n
        sizes.append(cur)
        assert grp.sort_values("pack_id")["n_tokens"].tolist() == sizes


def test_embedding_centroids(ray_session):
    from legislation_scraper_ray.pipelines.analytics import embedding_centroids

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    got = _df(embedding_centroids(SF))
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    for lab, grp in emb.groupby("label"):
        want = mat[grp.index].mean(axis=0)
        g = got[got["label"] == lab].sort_values("dim")["c"].to_numpy()
        assert len(g) == mat.shape[1]
        assert np.allclose(g, want, atol=5.1e-5)


def test_dup_ngram_docs_planted(ray_session, tmp_path):
    """Planted shared 4-grams: docs 0/1 share exactly one 4-gram, doc 2 is
    disjoint, docs 3/4 are identical (every 4-gram shared)."""
    import pyarrow.parquet as pq_

    from legislation_scraper_ray.pipelines.analytics import dup_ngram_docs

    texts = [
        "a b c d e",          # 4-grams: "a b c d", "b c d e"
        "a b c d x",          # shares "a b c d" with doc 0
        "q w e r t y",        # disjoint
        "m n o p q r",        # identical to doc 4 → 3 shared 4-grams
        "m n o p q r",
        "zz",                 # shorter than k → no 4-grams
    ]
    pq_.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = _df(dup_ngram_docs(str(tmp_path), k=4)).set_index("doc_id")["n_shared"]
    assert got.to_dict() == {0: 1, 1: 1, 3: 3, 4: 3}


def test_c4_filter_docs_rules(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from legislation_scraper_ray.pipelines.analytics import c4_filter_docs

    texts = [
        "the quick brown fox jumps over the lazy dog again",   # 10 words, keep
        "too short",                                            # < 10 words
        "code sample with brace { inside it breaks the rule ok",  # '{'
        "a b c d e f g h i j",                                  # mean_wl 1 < 3
        " ".join(["supercalifragilistic"] * 12),                # mean_wl > 10
    ]
    pq_.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = _df(c4_filter_docs(str(tmp_path))).set_index("doc_id")
    assert got["keep"].to_dict() == {0: 1, 1: 0, 2: 0, 3: 0, 4: 0}
    assert got.loc[1, "n_words"] == 2
    assert got.loc[3, "mean_wl"] == 1.0


def test_dup_ngram_docs_vs_pandas(ray_session, docs):
    """Brute-force pandas oracle over the real sf0.001 docs table."""
    from legislation_scraper_ray.pipelines.analytics import dup_ngram_docs

    k = 4
    grams: dict[int, set] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        w = text.split(" ")
        grams[did] = {tuple(w[i:i + k]) for i in range(len(w) - k + 1)}
    from collections import Counter
    df = Counter(g for s in grams.values() for g in s)
    want = {did: sum(1 for g in s if df[g] >= 2) for did, s in grams.items()}
    want = {d: n for d, n in want.items() if n > 0}
    got = _df(dup_ngram_docs(SF, k=k)).set_index("doc_id")["n_shared"].to_dict()
    assert got == want


def test_customer_order_stats_left_outer(ray_session, tmp_path):
    """Left-outer semantics: order-less customers appear with zero counts
    (sf0.001 has none, so plant some), matched customers carry exact sums."""
    import pyarrow.parquet as pq_

    from legislation_scraper_ray.pipelines.analytics import customer_order_stats

    pq_.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(["A", "B", "A", "C"], pa.string()),
    }), tmp_path / "customer.parquet")
    pq_.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([100.5, 200.25, 42.0], pa.float64()),
    }), tmp_path / "orders.parquet")
    got = _df(customer_order_stats(str(tmp_path))).set_index("c_custkey")
    assert len(got) == 4
    assert got["n_orders"].to_dict() == {1: 2, 2: 0, 3: 1, 4: 0}
    assert got["total_spend"].to_dict() == {1: 300.75, 2: 0.0, 3: 42.0, 4: 0.0}


def test_events_value_delta(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import events_value_delta

    got = _df(events_value_delta(SF)).set_index("event_id")["delta"]
    e = events.sort_values(["user_id", "ts", "event_id"])
    lag = e.groupby("user_id", sort=False)["value"].shift(1)
    want = (e["value"] - lag).round(4)
    keep = want.notna()
    want = pd.Series(want[keep].to_numpy(), index=e.loc[keep, "event_id"].to_numpy())
    assert len(got) == len(want)
    assert np.allclose(got.sort_index().to_numpy(), want.sort_index().to_numpy())


def test_events_running_total(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import events_running_total

    got = _df(events_running_total(SF)).set_index("event_id")["run_total"]
    e = events.sort_values(["user_id", "ts", "event_id"])
    want = e.groupby("user_id", sort=False)["value"].cumsum().round(4)
    want.index = e["event_id"].to_numpy()
    assert np.allclose(got.sort_index(), want.sort_index())


def test_events_ewma_recursion(ray_session, events):
    """EWMA matches a literal per-user replay of y = 0.7·prev + 0.3·x."""
    from legislation_scraper_ray.pipelines.analytics import events_ewma

    got = _df(events_ewma(SF)).set_index("event_id")["ewma"]
    want = {}
    for _uid, g in events.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        y = None
        for eid, x in zip(g["event_id"], g["value"]):
            y = x if y is None else (1 - 0.3) * y + 0.3 * x
            want[eid] = round(y, 4)
    assert len(got) == len(want)
    assert np.allclose(got.sort_index().to_numpy(),
                       pd.Series(want).sort_index().to_numpy())


def test_user_activity_full_outer(ray_session, events):
    from legislation_scraper_ray.pipelines.analytics import user_activity_full_outer

    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    got = _df(user_activity_full_outer(SF)).set_index("id")
    ev_users = set(events["user_id"])
    cust_keys = set(cust["c_custkey"])
    assert set(got.index) == ev_users | cust_keys
    only_cust = list(cust_keys - ev_users)
    only_ev = list(ev_users - cust_keys)
    if only_cust:
        assert (got.loc[only_cust, "n_events"] == 0).all()
        assert (got.loc[only_cust, "has_account"] == 1).all()
    if only_ev:
        assert (got.loc[only_ev, "has_account"] == 0).all()
    n = events.groupby("user_id").size()
    both = list(ev_users & cust_keys)[:10]
    for u in both:
        assert got.loc[u, "n_events"] == n[u]


def test_events_global_running_total(ray_session, events):
    """Global prefix scan == sequential cents cumsum in (ts, event_id) order."""
    from legislation_scraper_ray.pipelines.analytics import events_global_running_total

    got = _df(events_global_running_total(SF)).set_index("event_id")["run_total"]
    seq = events.sort_values(["ts", "event_id"])
    cents = np.floor(seq["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = pd.Series(cents.cumsum() / 100.0, index=seq["event_id"])
    assert len(got) == len(want)
    assert (got.sort_index().to_numpy() == want.sort_index().to_numpy()).all()


def test_max_concurrent_events_brute_force(ray_session, events):
    """Sweep-line peak == brute-force delta scan; closed-open interval rule
    (an interval ending at t frees its slot before one starting at t)."""
    from legislation_scraper_ray.pipelines.analytics import max_concurrent_events

    got = _df(max_concurrent_events(SF))
    us = events["ts"].astype("int64").to_numpy()
    dur = np.floor(events["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    t = np.concatenate([us, us + dur])
    d = np.concatenate([np.ones(len(us), np.int64), -np.ones(len(us), np.int64)])
    order = np.lexsort((d, t))  # t asc, then d asc (-1 first)
    cum = d[order].cumsum()
    peak = int(cum.max())
    first_t = int(t[order][int(np.argmax(cum == peak))])
    assert int(got["peak_concurrency"].iloc[0]) == peak
    assert int(got["peak_t"].iloc[0]) == first_t


def test_events_gapfill_hourly(ray_session, events):
    """Dense hourly axis: contiguous hours, zero-filled gaps, counts match."""
    from legislation_scraper_ray.pipelines.analytics import events_gapfill_hourly

    got = _df(events_gapfill_hourly(SF))
    hours = events["ts"].astype("int64").to_numpy() // 3_600_000_000
    want = pd.Series(hours).value_counts()
    assert (np.diff(got["hour"].to_numpy()) == 1).all()  # dense, no gaps
    assert got["hour"].iloc[0] == hours.min() and got["hour"].iloc[-1] == hours.max()
    assert int(got["n_events"].sum()) == len(events)
    byh = got.set_index("hour")["n_events"]
    for h, n in want.items():
        assert byh[h] == n
    assert (byh[~byh.index.isin(want.index)] == 0).all()


def test_events_watermark_late_brute_force(ray_session, events):
    """Distributed watermark scan == sequential replay of the same simulated
    arrival order (event_id + splitmix jitter), exclusive running-max
    watermark, 60 s allowed lateness."""
    from legislation_scraper_ray.functions.hashing import splitmix64
    from legislation_scraper_ray.pipelines.analytics import events_watermark_late

    got = _df(events_watermark_late(SF)).set_index("minute")
    eid = events["event_id"].to_numpy().astype(np.int64)
    us = events["ts"].astype("int64").to_numpy()
    ak = eid + (splitmix64(eid) % np.uint64(512)).astype(np.int64)
    order = np.lexsort((eid, ak))
    us_o = us[order]
    wm = np.empty(len(us_o), np.int64)
    wm[0] = -(2**62)
    wm[1:] = np.maximum.accumulate(us_o)[:-1]
    ok = us_o >= wm - 60_000_000
    minute = us_o // 60_000_000
    want = pd.DataFrame({"minute": minute, "ok": ok}).groupby("minute")["ok"].agg(
        ["sum", "size"]
    )
    assert len(got) == len(want)
    assert (got["n_accepted"].sort_index().to_numpy() == want["sum"].to_numpy()).all()
    assert (
        got["n_late"].sort_index().to_numpy()
        == (want["size"] - want["sum"]).to_numpy()
    ).all()
    assert int(got["n_late"].sum()) > 0  # jitter actually produces late events
