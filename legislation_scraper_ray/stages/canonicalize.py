"""Stateless frontier-projection stages (pure Arrow compute, zero-copy batches).

Reference analogs: URL canonicalization/joining (M12,
src/scraper/federal_legislation/scrape.py:178), search-URL formatting (M1,
:89-103) and the filename/key sanitizer (M10, src/database/saver.py:118-128).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import canonicalize_urls, extract_hosts, hash64


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """Add ``url`` (canonical, replaces raw), ``host`` and ``url_hash`` columns.

    ``url_hash = fnv1a64(canonical_url)`` is the engine-wide partition key
    (seen-set routing, dedup, output lineage)."""
    canon = canonicalize_urls(batch["url"])
    hosts = extract_hosts(canon)
    hashes = pa.array(hash64(canon), type=pa.uint64())
    batch = batch.set_column(batch.schema.get_field_index("url"), "url", canon)
    if "host" in batch.schema.names:
        batch = batch.set_column(batch.schema.get_field_index("host"), "host", hosts)
    else:
        batch = batch.append_column("host", hosts)
    if "url_hash" in batch.schema.names:
        batch = batch.set_column(batch.schema.get_field_index("url_hash"), "url_hash", hashes)
    else:
        batch = batch.append_column("url_hash", hashes)
    return batch


def sanitize_keys(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Partition-key sanitizer: ASCII-fold, scrub ``[^\\w\\s-]``, collapse
    whitespace to ``_``, truncate to 245 chars — the reference's filename rules
    (src/database/saver.py:31,39-40,118-127) applied to partition values."""
    s = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    # ASCII fold: Arrow lacks unidecode; strip non-ASCII after NFKD-ish lower
    s = pc.replace_substring_regex(s, r"[^\x00-\x7F]+", "")
    s = pc.replace_substring_regex(s, r"[^\w\s-]", "")
    s = pc.replace_substring_regex(s, r"\s+", "_")
    return pc.utf8_slice_codeunits(s, 0, 245)


def priority_key(batch: pa.Table, year0: int = 0) -> pa.Table:
    """Attach the crawl-order priority (O2): lexicographic
    ``(year, situation_idx, type_idx)`` encoded to one float — reproduces the
    reference's nested loop order (src/scraper/base/scraper.py:479-485 years
    asc; situations then types in declared dict order)."""
    from ..sources.corpus import SITUATIONS, TYPES

    sit_idx = pc.index_in(batch["situation"], value_set=pa.array(SITUATIONS)).cast(pa.int32())
    typ_idx = pc.index_in(batch["type"], value_set=pa.array(TYPES)).cast(pa.int32())
    year = batch["year"].cast(pa.int32())
    prio = pc.add(
        pc.multiply(pc.subtract(year, pa.scalar(year0, pa.int32())), pa.scalar(100, pa.int32())),
        pc.add(pc.multiply(sit_idx, pa.scalar(10, pa.int32())), typ_idx),
    ).cast(pa.float32())
    name = "priority"
    if name in batch.schema.names:
        return batch.set_column(batch.schema.get_field_index(name), name, prio)
    return batch.append_column(name, prio)


def make_robots_filter(disallow: dict, counter=None):
    """robots.txt path-Disallow stage (RFC-9309-style prefix rules): drop
    frontier rows whose canonical URL starts with a disallowed
    ``https://host/prefix``.  Runs AFTER canonicalize and BEFORE the seen
    filter, so a disallowed URL is never fetched and never enters the seen
    set (re-discoveries are re-filtered — the rule, not the dedup, is the
    authority, and rules can change between recrawls).  One vectorized
    ``starts_with`` pass per RULE (a handful per crawl), never per row;
    ``counter`` (a zero-CPU actor) accumulates dropped-row counts
    fire-and-forget so the streaming chain never blocks on it.

    Reference analog: the hard-coded per-site URL scoping of each scraper
    (every subclass only requests its own listing/doc URL families) made a
    first-class, auditable crawl policy."""
    import numpy as np

    prefixes = sorted(f"https://{h}{p}" for h, ps in disallow.items() for p in ps)

    def robots_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or not prefixes:
            return batch
        urls = batch["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        blocked = np.zeros(batch.num_rows, dtype=bool)
        for pref in prefixes:
            blocked |= pc.starts_with(urls, pref).to_numpy(zero_copy_only=False)
        n = int(blocked.sum())
        if n == 0:
            return batch
        if counter is not None:
            counter.add.remote(n)
        return batch.filter(pa.array(~blocked))

    return robots_filter
