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


@dataclass
class RestApiSource:
    """Second registered source shape: offset/limit REST pagination with
    RELATIVE out-links and URL-encoded document situation (corpus generator:
    sources/corpus.py ``generate_rest``).

    Exercises the per-source parse dispatch the reference implements as 27
    scraper subclasses (template methods src/scraper/base/scraper.py:434-456;
    offset/limit API analog src/scraper/conama/scrape.py:123-130):

    - ``parse_listing`` resolves relative links against the page's host (the
      reference's urljoin, state_legislation/alagoas.py:96-99) — without it,
      every child URL misses the web graph and the crawl dies at generation 1;
    - ``parse_doc`` recovers ``situation`` from the ``/item/{sit}/{id}`` URL
      path (the graph stores 'unknown'; the reference parses situation out of
      the detail page, state_legislation/parana.py:536-543)."""

    corpus_dir: str
    name: str = "rest"

    def seeds(self) -> pa.Table:
        import os

        import numpy as np
        import pyarrow.parquet as pq

        seeds = pq.read_table(os.path.join(self.corpus_dir, "seeds.parquet"))
        return seeds.append_column("depth", pa.array(np.zeros(seeds.num_rows, np.int32)))

    def parse_listing(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..pipelines.crawl import _explode_links

        out = _explode_links(batch)
        url, host = out["url"], out["host"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        rel = pc.starts_with(url, "/")
        absolute = pc.binary_join_element_wise(
            pc.binary_join_element_wise(pa.scalar("https://"), host, ""), url, ""
        )
        resolved = pc.if_else(rel, absolute, url)
        return out.set_column(out.schema.get_field_index("url"), "url", resolved)

    def parse_doc(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        sit_col = batch["doc_situation"]
        if isinstance(sit_col, pa.ChunkedArray):
            sit_col = sit_col.combine_chunks()
        ex = pc.extract_regex(batch["url"], r"/item/(?P<sit>[^/]+)/(?P<id>\d+)")
        sit = pc.struct_field(ex, "sit")
        # struct-level nulls don't propagate to children — mask explicitly
        sit = pc.if_else(pc.is_valid(ex), sit, sit_col)
        fixed = pc.if_else(pc.equal(sit_col, "unknown"), sit, sit_col)
        batch = batch.set_column(
            batch.schema.get_field_index("doc_situation"), "doc_situation", fixed
        )
        # dynamic per-source extras (reference: dict-merged per-source fields,
        # federal_legislation/scrape.py:355-360 → map column per SURVEY §1.4)
        n = batch.num_rows
        item_id = pc.struct_field(ex, "id")
        item_id = pc.if_else(pc.is_valid(ex), item_id, pa.scalar("", pa.string()))
        if isinstance(item_id, pa.ChunkedArray):
            item_id = item_id.combine_chunks()
        keys = pa.array(["item_id", "raw_situation"] * n, pa.string())
        items_np = np.empty(2 * n, dtype=object)
        items_np[0::2] = item_id.to_numpy(zero_copy_only=False)
        items_np[1::2] = sit_col.to_numpy(zero_copy_only=False)
        extras = pa.MapArray.from_arrays(
            pa.array(np.arange(0, 2 * n + 1, 2, dtype=np.int32), pa.int32()),
            keys,
            pa.array(items_np.tolist(), pa.string()),
        )
        return batch.append_column("extras", extras)

    def politeness(self) -> dict[str, int]:
        import json
        import os

        with open(os.path.join(self.corpus_dir, "manifest.json")) as f:
            return json.load(f)["robots_delay_ms"]


@dataclass
class FormPostSource(SyntheticCorpusSource):
    """Third registered source (r3): a stateful form-POST protocol — every
    request to a host must present the postback token minted by that host's
    previous response (the reference's JSF/ViewState chains,
    src/scraper/state_legislation/espirito_santo.py:69-127,
    src/scraper/state_legislation/maranhao.py:45-110).

    ``stateful_session = True`` makes ``run_crawl`` thread the per-host token
    chain through the host-affinity fetch units (sharded SessionTokenShard
    state, lineage ``post_token`` audit column) and refuse to run without
    ``host_affinity=True`` — the chain is sequential by protocol.  Parsing is
    inherited (the form pages resolve like the synthetic HTML source); the
    corpus lives on the disjoint ``form{i}.legis.example`` namespace
    (corpus.generate_form)."""

    name: str = "form"
    stateful_session: bool = True


@dataclass
class SpeculativePagedSource(SyntheticCorpusSource):
    """Fourth registered source (r3): UNKNOWN-total pagination — no page
    reveals how many pages exist; each listing links only its docs and the
    next probe page, and the chain ends at an empty page (reference:
    src/scraper/state_legislation/espirito_santo.py:238-269,
    src/scraper/state_legislation/minas_gerais.py:222-252).  The engine needs
    no special mode: the BFS frontier grows exactly one probe wave per page
    until discovery dries up — fan-out bounded by discovery, not by a count
    probe.  Corpus: corpus.generate_speculative (``spec{i}.legis.example``)."""

    name: str = "paged"


@dataclass
class Base64JsonSource(SyntheticCorpusSource):
    """Fifth registered source (r3): doc payloads arrive base64-encoded inside
    a JSON body (reference: src/scraper/state_legislation/alagoas.py:104-107,
    src/scraper/state_legislation/rio_de_janeiro.py:136-141).  The web graph
    marks the rows (``payload_encoding='b64json'``) and the fetch stage
    unwraps BEFORE the fused decode (stages/fetch.py ``unwrap_b64json``), so
    the decode invariants — pixel checksum, phash, PSNR vs raw-image ground
    truth — verify the unwrap end-to-end.  Corpus: corpus.generate_b64."""

    name: str = "b64"


@dataclass
class BrowserSource(SyntheticCorpusSource):
    """Sixth registered source (r4): the Selenium browser-pool stand-in
    (S3/T2) — result pages past page 1 have NO URL; enumerating a listing
    means driving a stateful browser handle through the click-chain, one page
    at a time (reference: the per-worker Selenium driver of
    src/scraper/base/scraper.py:134-171,284-310 and the click-through
    pagination loop of src/scraper/state_legislation/parana.py:127-156).

    ``browser_pool = True`` makes ``run_crawl`` stage the corpus's
    ``browser_pages.parquet`` click-chain and insert a BrowserExpand actor
    stage after fetch: one ScriptedBrowser handle per actor (built once in
    ``__init__`` — the T2 'model/driver handle' pattern), each OK entry
    listing driven open → click_next*… sequentially, merged links feeding the
    ordinary frontier explode.  Lineage gains ``pages_clicked`` +
    ``dom_token`` audit columns, so tests can re-derive every click chain and
    prove it never skipped or interleaved.  Corpus: corpus.generate_browser
    (``js{i}.legis.example``)."""

    name: str = "browser"
    browser_pool: bool = True


REGISTRY: dict[str, Callable[..., Source]] = {
    "synthetic": SyntheticCorpusSource,
    "rest": RestApiSource,
    "form": FormPostSource,
    "paged": SpeculativePagedSource,
    "b64": Base64JsonSource,
    "browser": BrowserSource,
}


def register(name: str, factory: Callable[..., Source]) -> None:
    REGISTRY[name] = factory
