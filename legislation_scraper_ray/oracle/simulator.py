"""Single-threaded reference-semantics crawl simulator (the ordering oracle).

Mirrors the reference's exact control flow (SURVEY.md §3.1):

- units (year, situation, type) processed strictly sequentially in declared
  order — years asc (src/scraper/base/scraper.py:479-485), situations then
  types in dict order (src/scraper/federal_legislation/scrape.py:10-56);
- within a unit: wave 0 = listing page 1 (the count probe, :259-285),
  wave 1 = remaining listing pages (ThreadPool wave, :288-302),
  wave 2 = all discovered doc links (waves 2+3 merged — link-resolve and
  fetch+parse happen to the same URL set, :305-350);
- URL-seen semantics = exact first-wins dedup by canonical URL — the
  reference's ``drop_duplicates(subset=["document_url"])``
  (src/datasets/build_dataset.py:204) applied online;
- failed URLs (exhausted retry budget) become error records
  (src/database/saver.py:142-177) and still count as seen.

~150 LoC, no Ray — the engine's strict-order parity tests compare against this.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import canonicalize_urls, fnv1a64_bytes


@dataclass
class SimResult:
    # url -> (wave, status, kind)
    fetched: dict[str, tuple[int, str, str]] = field(default_factory=dict)
    seen_hashes: set[int] = field(default_factory=set)
    docs: dict[str, str] = field(default_factory=dict)  # url -> caption
    errors: list[str] = field(default_factory=list)
    robots_blocked: set[str] = field(default_factory=set)  # disallowed URLs hit
    n_waves: int = 0


def _canon(url: str) -> str:
    return canonicalize_urls(pa.array([url]))[0].as_py()


def _resolve(base: str, u: str) -> str:
    """Relative-link resolution — the reference's urljoin absolute-ization
    (src/scraper/state_legislation/alagoas.py:96-99).  No-op for absolute
    links, so HTML-shaped corpora are unaffected."""
    if "://" in u:
        return u
    from urllib.parse import urljoin

    return urljoin(base, u)


def simulate(corpus_dir: str, robots_disallow: dict | None = None) -> SimResult:
    import json

    graph = pq.read_table(f"{corpus_dir}/web_graph.parquet")
    corpus = pq.read_table(f"{corpus_dir}/corpus.parquet")
    seeds = pq.read_table(f"{corpus_dir}/seeds.parquet")
    with open(f"{corpus_dir}/manifest.json") as f:
        pagination = json.load(f).get("pagination", "probe")

    rows = graph.to_pylist()
    by_url = {r["url"]: r for r in rows}
    captions = dict(zip(corpus["image_id"].to_pylist(), corpus["caption"].to_pylist()))

    res = SimResult()
    wave = 0

    blocked_prefixes = sorted(
        f"https://{h}{p}" for h, ps in (robots_disallow or {}).items() for p in ps
    )

    def fetch(url: str, w: int) -> dict | None:
        """Seen-check + fetch one URL; returns the graph row on success."""
        cu = _canon(url)
        # robots Disallow: checked BEFORE the seen set, mirroring the
        # engine's filter placement — a blocked URL is never fetched and
        # never becomes seen
        if blocked_prefixes and any(cu.startswith(p) for p in blocked_prefixes):
            res.robots_blocked.add(cu)
            return None
        h = fnv1a64_bytes(cu.encode())
        if h in res.seen_hashes:
            return None
        res.seen_hashes.add(h)
        row = by_url.get(cu)
        if row is None or row["fail_mode"] == "hard_error":
            res.fetched[cu] = (w, "error", row["kind"] if row else "missing")
            res.errors.append(cu)
            return None
        res.fetched[cu] = (w, "ok", row["kind"])
        if row["kind"] == "doc":
            res.docs[cu] = captions[row["image_id"]]
        return row

    # Reference order is host-major (sources run strictly sequentially,
    # main.py:359-365), then (year, situation, type) in declared order within a
    # source (O2).  Sort key = (host, priority).
    seed_rows = sorted(seeds.to_pylist(), key=lambda r: (r["host"], r["priority"]))

    if pagination == "speculative":
        # Grow-until-empty protocol (espirito_santo.py:238-269,
        # minas_gerais.py:222-252): no page reveals the total — the scraper
        # keeps requesting the next page (processing each page's docs as it
        # goes) until a page comes back empty.  Per unit that IS a BFS over
        # the link graph: wave k+1 = docs of wave-k pages + the next probe
        # page, so strict-mode engine generations match sim waves exactly.
        for seed in seed_rows:
            frontier = [seed["url"]]
            while frontier:
                nxt: list[str] = []
                for u in frontier:
                    r = fetch(u, wave)
                    if r is not None:
                        nxt.extend(_resolve(r["url"], x) for x in r["out_links"])
                wave += 1
                frontier = nxt
        res.n_waves = wave
        return res

    if pagination == "browser":
        # Click-through protocol (parana.py:127-156): pages past page 1 have
        # no URL — the scraper opens the entry, clicks through the scripted
        # DOM collecting links per page, then fetches all discovered docs.
        # Clicks are not fetches: they never enter the seen set or lineage.
        pages = pq.read_table(f"{corpus_dir}/browser_pages.parquet")
        by_entry: dict[str, list[tuple[int, list[str]]]] = {}
        for e, p, ls in zip(pages["entry_url"].to_pylist(),
                            pages["page"].to_pylist(), pages["links"].to_pylist()):
            by_entry.setdefault(e, []).append((int(p), list(ls or [])))
        for seed in seed_rows:
            entry = fetch(seed["url"], wave)
            wave += 1
            if entry is None:
                continue
            doc_links = [_resolve(entry["url"], u) for u in entry["out_links"]]
            for _p, ls in sorted(by_entry.get(_canon(seed["url"]), [])):
                doc_links.extend(_resolve(entry["url"], u) for u in ls)
            for u in doc_links:
                fetch(u, wave)
            wave += 1
        res.n_waves = wave
        return res

    for seed in seed_rows:
        page1 = fetch(seed["url"], wave)
        if page1 is None:
            wave += 1
            continue
        links1 = [_resolve(seed["url"], u) for u in page1["out_links"]]
        other_pages = [u for u in links1 if by_url.get(_canon(u), {}).get("kind") == "listing"]
        doc_links = [u for u in links1 if u not in other_pages]
        wave += 1
        page_rows = []
        for u in other_pages:  # wave 1: remaining listing pages
            r = fetch(u, wave)
            if r is not None:
                page_rows.append(r)
        wave += 1
        for r in page_rows:  # accumulate doc links in page order
            doc_links.extend(_resolve(r["url"], u) for u in r["out_links"])
        for u in doc_links:  # wave 2: all docs of the unit
            fetch(u, wave)
        wave += 1
    res.n_waves = wave
    return res
