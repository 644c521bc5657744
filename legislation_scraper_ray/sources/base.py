"""Source plugin protocol — the engine's user-extension surface (SURVEY.md §2.10).

The reference's extension contract is an abstract scraper template — each of
its 27 sources implements ``_format_search_url`` / ``_get_docs_links`` /
``_get_doc_data`` / ``_scrape_year`` and registers itself in a declarative
list (src/scraper/base/scraper.py:434-456; main.py:59-357).  The Ray-native
equivalent is batch-level, not record-level: a Source supplies

- ``seeds()``       → frontier generation 0 as an Arrow table
  (≈ _format_search_url over the year × situation × type nesting);
- ``parse_listing`` → vectorized batch transform: fetched listing pages →
  out-link rows (≈ _get_docs_links, the 1→N flat map);
- ``parse_doc``     → vectorized batch transform: fetched doc payloads →
  document rows (≈ _get_doc_data);
- ``politeness()``  → per-host delay budget (replaces hardcoded sleeps).

Sources register by name; a crawl over a registered source is
``run_crawl(source=REGISTRY[name], ...)``-shaped.  The synthetic corpus source
(the hermetic stand-in for live HTTP) is the reference implementation; a real
HTTP source implements the same protocol with a requests.Session held in its
fetch actor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class Source(Protocol):
    name: str

    def seeds(self) -> pa.Table:
        """Frontier generation 0: columns url, host, year, situation, type,
        priority (float32), depth (int32)."""
        ...

    def parse_listing(self, batch: pa.Table) -> pa.Table:
        """Fetched listing batch → exploded out-link rows (url + inherited
        labels)."""
        ...

    def parse_doc(self, batch: pa.Table) -> pa.Table:
        """Fetched doc batch → final document rows."""
        ...

    def politeness(self) -> dict[str, int]:
        """host → delay_ms budget."""
        ...


@dataclass
class SyntheticCorpusSource:
    """The in-sandbox source: fetches resolve against the generated web_graph
    (sources/corpus.py).  Parse steps are identity-shaped because the synthetic
    fetch already returns structured columns — a live-HTML source would put its
    BeautifulSoup-equivalent (vectorized) extraction here."""

    corpus_dir: str
    name: str = "synthetic"

    def seeds(self) -> pa.Table:
        import os

        import numpy as np
        import pyarrow.parquet as pq

        seeds = pq.read_table(os.path.join(self.corpus_dir, "seeds.parquet"))
        return seeds.append_column("depth", pa.array(np.zeros(seeds.num_rows, np.int32)))

    def parse_listing(self, batch: pa.Table) -> pa.Table:
        from ..pipelines.crawl import _explode_links

        return _explode_links(batch)

    def parse_doc(self, batch: pa.Table) -> pa.Table:
        return batch

    def politeness(self) -> dict[str, int]:
        import json
        import os

        with open(os.path.join(self.corpus_dir, "manifest.json")) as f:
            return json.load(f)["robots_delay_ms"]


REGISTRY: dict[str, Callable[..., Source]] = {
    "synthetic": SyntheticCorpusSource,
}


def register(name: str, factory: Callable[..., Source]) -> None:
    REGISTRY[name] = factory
