"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline on the sf0.001-scale synthetic
corpus; ``queries()`` / ``oracle_sql()`` expose the operator registry in
``legislation_scraper_ray.pipelines.queries`` (SURVEY.md §2 coverage +
training-data operator suite).  Ray is initialised by the driver before this
module is imported — nothing here calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).parent))


def entry() -> Any:
    """Flagship crawl on the t1 (sf0.001-scale) synthetic corpus: frontier BFS
    → cuckoo seen-set → politeness schedule → fetch pool → decode pool →
    partitioned parquet; returns the decoded document table."""
    import glob

    import pyarrow.dataset as pads

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    out = "/tmp/graft_entry_crawl"
    run_crawl(
        corpus_dir,
        out,
        CrawlConfig(n_seen_shards=2, fetch_concurrency=2, checkpoint=False),
    )
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
    return docs.sort_by("url_hash")


def queries() -> dict[str, Callable[[str], Any]]:
    from legislation_scraper_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from legislation_scraper_ray.pipelines.queries import ORACLE_SQL

    # The five image-corpus oracles read the generated t2 corpus parquet by
    # absolute path; make sure it exists even if the driver evaluates the SQL
    # before the corresponding Ray query has generated it (generation is
    # plain numpy+zlib — no Ray session needed — and cached after first use).
    try:
        from legislation_scraper_ray.sources.corpus import generate

        generate("t2")
    except Exception:
        pass  # worst case: those five oracles fail exactly as without this

    return dict(ORACLE_SQL)
