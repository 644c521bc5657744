"""Deterministic browser stand-in for Selenium-driven sources (S3 + T2).

Reference analog: the Selenium browser pool and its click-through pagination —
a result page past page 1 has NO URL; the scraper drives a live DOM, clicking
"próximo" and re-reading the mutated page state
(/root/reference/src/scraper/base/scraper.py:134-171,284-310 holds one driver
per worker; /root/reference/src/scraper/state_legislation/parana.py:127-156
loops the click-through collecting links per page).

The hermetic sandbox has no browser, so the DOM is a SCRIPTED STATE MACHINE
the corpus generator and this handle both replay:

    dom_1       = splitmix64(fnv1a64(entry_url))          (page 1, on open)
    dom_p       = splitmix64(dom_{p-1} XOR p)             (click to page p)

``browser_pages.parquet`` stores, for every entry listing, its pages 2..P with
the links each page exposes AND the ``dom_token`` a correctly-scripted browser
must hold when reading that page.  A skipped click, a re-used handle that
never ``open``ed, or out-of-order pagination produces the wrong token and the
page refuses to render (``BrowserProtocolError``) — the stand-in for
Selenium's stale-element/wrong-page failures.  This makes the Ray-side
plumbing REAL: the crawl can only enumerate a JS host's listings by driving
one stateful handle sequentially through its pages, exactly the T2 browser
pool semantics (one handle per actor, one page context at a time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64_bytes, splitmix64


class BrowserProtocolError(RuntimeError):
    """The scripted DOM was driven out of protocol (skipped/duplicate click,
    click without an open page, stale token)."""


def seed_dom(entry_url: str) -> int:
    """DOM state of page 1, established by ``open(entry_url)``."""
    return int(splitmix64(np.array([fnv1a64_bytes(entry_url.encode())], np.uint64))[0])


def advance_dom(dom: int, page: int) -> int:
    """DOM state after clicking from page ``page − 1`` to ``page``."""
    return int(splitmix64(np.array([np.uint64(dom) ^ np.uint64(page)], np.uint64))[0])


class ScriptedBrowser:
    """One live 'browser' handle: holds the DOM state of a single open page
    context.  Built once per actor from the corpus's ``browser_pages`` table
    (entry_url → ordered click-through pages); drives are strictly
    sequential — ``open`` then ``click_next`` until ``has_next`` is False."""

    def __init__(self, pages: pa.Table):
        entries = pages["entry_url"].to_pylist()
        pgs = pages["page"].to_pylist()
        toks = pages["dom_token"].to_pylist()
        links = pages["links"].to_pylist()
        by_entry: dict[str, list[tuple[int, int, list[str]]]] = {}
        for e, p, t, ls in zip(entries, pgs, toks, links):
            by_entry.setdefault(e, []).append((int(p), int(t), list(ls or [])))
        for rows in by_entry.values():
            rows.sort()
        self._by_entry = by_entry
        self._entry: str | None = None
        self._page = 0
        self._dom = 0
        self._pending: list[tuple[int, int, list[str]]] = []
        self._i = 0

    def is_entry(self, url: str) -> bool:
        return url in self._by_entry

    def open(self, entry_url: str) -> None:
        """Load page 1 of an entry listing (resets any previous page context —
        a browser tab holds ONE page at a time)."""
        self._entry = entry_url
        self._page = 1
        self._dom = seed_dom(entry_url)
        self._pending = self._by_entry.get(entry_url, [])
        self._i = 0

    def has_next(self) -> bool:
        return self._entry is not None and self._i < len(self._pending)

    def click_next(self) -> list[str]:
        """Click through to the next result page; returns that page's links.
        Raises ``BrowserProtocolError`` if the handle is driven out of
        protocol (the scripted server only renders page p to a DOM holding
        the exact click-chain token)."""
        if self._entry is None:
            raise BrowserProtocolError("click_next with no open page context")
        if self._i >= len(self._pending):
            raise BrowserProtocolError(f"no next page after page {self._page}")
        page, expected, links = self._pending[self._i]
        if page != self._page + 1:
            raise BrowserProtocolError(
                f"pagination skipped: at page {self._page}, next stored page is {page}"
            )
        dom = advance_dom(self._dom, page)
        if dom != expected:
            raise BrowserProtocolError(
                f"stale DOM state at page {page}: token {dom} != expected {expected}"
            )
        self._dom = dom
        self._page = page
        self._i += 1
        return links

    @property
    def dom_token(self) -> int:
        """Current DOM token (recorded in lineage for chain audits)."""
        return self._dom

    @property
    def page(self) -> int:
        return self._page
