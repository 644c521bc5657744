"""legislation_scraper_ray — a Ray-Data-native distributed crawl + data-processing engine.

A from-scratch re-expression (NOT a port) of the capabilities of
felipeoes/legislation-scraper (reference at /root/reference) on top of
``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches:

- a distributed URL frontier + fetch scheduler (generation/BFS loop) replacing the
  reference's nested ``for year/situation/type/page`` loops
  (reference: src/scraper/base/scraper.py:479-485,
  src/scraper/federal_legislation/scrape.py:247-362);
- a sharded cuckoo-filter URL-seen set held in actor-pool state (the reference has no
  online seen set; its semantics anchor is the post-hoc exact dedup by document_url,
  src/datasets/build_dataset.py:204);
- per-host politeness token buckets (reference: hardcoded sleeps + 429/503 backoff,
  src/scraper/base/scraper.py:246-249, src/scraper/state_legislation/parana.py:457-459);
- stateful fetch / decode / caption actor pools (reference: requests.Session,
  MarkItDown+LLM handles, src/scraper/base/scraper.py:118-120);
- partitioned parquet sinks with per-partition lineage + metrics for exact
  checkpoint-resume (reference: lossy resume-by-last-year,
  src/database/saver.py:48-61).

The engine operates over tables of image + caption pairs with schema
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string, caption:string,
phash:int64)`` (BASELINE.json input_hint).  Lance is not available in this
environment; parquet is used as the table format (same Arrow schema).

No module in this package calls ``ray.init()`` — sessions are owned by the caller
(driver / bench.py / test fixture).
"""

__version__ = "0.1.0"


def _disable_numpy_hugepage_madvise() -> None:
    """Turn off numpy's ``madvise(MADV_HUGEPAGE)`` on >=4 MB allocations.

    With kernel THP ``defrag=madvise`` (this host's setting), the FIRST large
    numpy temporary in a fresh process triggers synchronous hugepage
    compaction: a 14 MB broadcast-add measured 1.7 s cold vs 0.012 s with the
    madvise disabled (150x).  Every Ray worker is a fresh process, so each
    decode/minhash/hash kernel paid multi-second warmup stalls.  This runs at
    package import, which happens in every worker that unpickles our UDFs.
    """
    try:
        from numpy.core import multiarray

        multiarray._set_madvise_hugepage(False)
    except Exception:
        pass  # private API; harmless to skip on numpy versions without it


_disable_numpy_hugepage_madvise()
