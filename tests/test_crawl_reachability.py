"""crawl_reachability: the whole crawl protocol (seen-set dedup, BFS
generation attribution, retry budget, error semantics) must equal the
recursive-CTE SQL ground truth, and the pipelined fast path must reach the
same SET of URLs (only per-generation attribution may differ)."""

import duckdb
import pandas as pd


def _oracle_df(scale: str) -> pd.DataFrame:
    from legislation_scraper_ray.pipelines.queries import _reachability_sql
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate(scale)
    sql = _reachability_sql(f"{corpus_dir}/web_graph.parquet",
                            f"{corpus_dir}/seeds.parquet")
    return duckdb.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["kind"] = df["kind"].astype(str)  # engine None vs oracle NaN
    return (df[sorted(df.columns)]
            .sort_values("url_hash", ignore_index=True))


def test_reachability_matches_sql(ray_session):
    from legislation_scraper_ray.pipelines.queries import crawl_reachability

    got = _canon(crawl_reachability("/root/testdata/sf0.001").to_pandas())
    want = _canon(_oracle_df("t1"))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pipelined_crawl_same_reached_set(ray_session):
    """The default 4-generation pipelined window may relabel generations but
    must reach the identical (url_hash, status) set."""
    from legislation_scraper_ray.pipelines.queries import (crawl_reachability,
                                                           crawl_seen_set)

    strict = crawl_reachability("/root/testdata/sf0.001").to_pandas()
    fast = crawl_seen_set("/root/testdata/sf0.001").to_pandas()
    assert set(zip(strict.url_hash, strict.status)) == \
        set(zip(fast.url_hash, fast.status))
