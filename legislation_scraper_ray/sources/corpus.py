"""Deterministic synthetic corpus + web graph + seed generator (FIXTURES.md F1–F3, F5).

This is the hermetic stand-in for the live web the reference scrapes: the
``corpus`` table is the authoritative input-hint shape
``(image_id, bytes, w, h, fmt, caption, phash)``, the ``web_graph`` table maps
every crawlable URL to its out-links / payload FK / failure mode, and ``seeds``
is frontier generation 0 — one row per (host, year, situation, type), mirroring
the reference's crawl nesting (src/scraper/base/scraper.py:107 years list;
src/scraper/federal_legislation/scrape.py:247-262 situation/type loops;
page fan-out after a count probe, :259-285).

Everything is seeded (seed=42) and cached as parquet under a scale-keyed
directory, so tests / bench / oracle all see byte-identical inputs.  Generation
is plain numpy + zlib (no Ray session needed — callable before ray.init).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import decode_image, encode_image, phash64, psnr

SITUATIONS = ["valid", "revoked"]  # cf. VALID_SITUATIONS/INVALID_SITUATIONS, federal scrape.py:10-26
TYPES = ["lei", "decreto", "portaria", "resolucao"]  # cf. type dicts, federal scrape.py:28-56
WORDS = (
    "lei decreto ambiental federal estadual norma artigo paragrafo vigente revogado "
    "publicada republica presidencia congresso nacional codigo florestal recurso hidrico"
).split()


@dataclass(frozen=True)
class ScaleSpec:
    name: str
    n_hosts: int
    years: tuple[int, int]          # inclusive range
    n_types: int
    n_situations: int
    n_doc_urls: int                 # total crawlable doc URLs
    n_images: int                   # corpus rows (doc URLs many-to-one onto images)
    per_page: int                   # listing page size (reference: 20–10,000, scrape.py:260)
    dup_link_frac: float = 0.05     # % doc links repeated on a second listing page
    dup_image_frac: float = 0.02    # % corpus rows that are pixel-copies (shared phash)
    fail_frac: float = 0.04         # % URLs with a failure mode
    img_dim: tuple[int, int] = (8, 64)


SCALES: dict[str, ScaleSpec] = {
    "t1": ScaleSpec("t1", 2, (1990, 1991), 2, 2, 200, 180, 10, dup_link_frac=0.2),
    "t2": ScaleSpec("t2", 8, (1990, 1999), 4, 2, 5_000, 4_500, 20),
    "bench": ScaleSpec("bench", 8, (1980, 1999), 4, 2, 450_000, 50_000, 100, img_dim=(48, 96)),
    # scaling-bench corpus: same shape, 2x the doc URLs.  The N-vs-4N
    # efficiency criterion needs the job large enough that fixed ramp/drain
    # seams (~3-5 s regardless of corpus size: executor start, gen-0 seed
    # trickle, final-wave drain) amortize — at 450k pages they are ~25% of the
    # 16-core wall, at 900k ~12%, at the 10^10-URL design point ~0.
    "bench2x": ScaleSpec("bench2x", 8, (1980, 1999), 4, 2, 900_000, 50_000, 100, img_dim=(48, 96)),
    # r5: the BSP/politeness rounds cut the 16-core bench2x wall 27 s → 21 s,
    # pushing the fixed seams back to ~14-24% of the wide leg (the r3 mechanism
    # that forced 450k → 900k, recurring because the engine got faster) —
    # 1.8M pages restores the ≤ ~10% seam fraction the efficiency
    # measurement needs
    "bench4x": ScaleSpec("bench4x", 8, (1980, 1999), 4, 2, 1_800_000, 50_000, 100, img_dim=(48, 96)),
}

# sf_dir → corpus scale, so queries(sf_dir) pick a matching synthetic scale
SF_TO_SCALE = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}

CACHE_ROOT = os.environ.get("GRAFT_CORPUS_CACHE", "/tmp/graft_corpus")


def _caption(rng: np.random.Generator, n: int, year: int) -> str:
    words = rng.choice(WORDS, size=6)
    return f"Lei {n} de {year}: " + " ".join(words)


def _make_images(spec: ScaleSpec, rng: np.random.Generator):
    """corpus table columns. ~dup_image_frac rows are pixel-copies of earlier rows."""
    n = spec.n_images
    lo, hi = spec.img_dim
    ws = rng.integers(lo, hi + 1, size=n).astype(np.int32)
    hs = rng.integers(lo, hi + 1, size=n).astype(np.int32)
    fmts = np.where(rng.random(n) < 0.7, "png", "jpeg")
    years = rng.integers(spec.years[0], spec.years[1] + 1, size=n)
    dup_of = np.full(n, -1, dtype=np.int64)
    dup_mask = rng.random(n) < spec.dup_image_frac
    dup_mask[0] = False
    dup_of[dup_mask] = rng.integers(0, np.maximum(np.where(dup_mask)[0], 1))[: dup_mask.sum()]

    blobs, phashes, captions, dec_sums, psnrs = [], [], [], [], []
    pixel_cache: list[np.ndarray | None] = []
    for i in range(n):
        if dup_of[i] >= 0:
            j = int(dup_of[i])
            px = pixel_cache[j]
            ws[i], hs[i], fmts[i] = ws[j], hs[j], fmts[j]
        else:
            px = rng.integers(0, 256, size=(int(hs[i]), int(ws[i]), 3), dtype=np.uint8)
        pixel_cache.append(px)
        blob = encode_image(px, str(fmts[i]))
        blobs.append(blob)
        dec = decode_image(blob, str(fmts[i]))  # ground truth for the decode-stage invariant
        dec_sums.append(int(dec.astype(np.uint64).sum()))
        psnrs.append(psnr(px, dec))  # inf for png; ≈48.8 dB for the lossy stand-in
        phashes.append(phash64(dec))
        captions.append(_caption(rng, i, int(years[i])))
    return {
        "image_id": [f"img_{i:08d}" for i in range(n)],
        "bytes": blobs,
        "w": ws,
        "h": hs,
        "fmt": fmts.astype(object).tolist(),
        "caption": captions,
        "phash": np.array(phashes, dtype=np.int64),
        "dec_sum": np.array(dec_sums, dtype=np.uint64),  # extra: decoded-pixel checksum (gt)
        "psnr_db": np.array(psnrs, dtype=np.float64),    # extra: encode-time fidelity vs source
        "dup_of": dup_of,                                # extra: oracle for near-dup tests
    }


def generate(scale: str, root: str | None = None, force: bool = False,
             host_prefix: str = "host", variant: str | None = None,
             pagination: str = "probe", payload_encoding: str | None = None) -> str:
    """Generate (or return cached) corpus/web_graph/seeds/subjects parquet for a scale.

    Returns the directory containing ``corpus.parquet``, ``web_graph.parquet``,
    ``seeds.parquet``, ``subjects.parquet``, ``manifest.json``.

    ``host_prefix``/``variant`` produce a structurally identical corpus on a
    DISJOINT host namespace under its own cache dir — used by source variants
    (e.g. the form-POST source) so union crawls never collide.

    ``pagination``:
    - ``"probe"`` (default) — page 1 is a count probe that links every other
      listing page up front (reference: federal scrape.py:259-285);
    - ``"speculative"`` — NO total is revealed: each page links only its docs
      and the NEXT page, and the chain ends at an EMPTY terminal page — the
      grow-until-empty protocol of espirito_santo.py:238-269,
      minas_gerais.py:222-252 (the frontier must keep probing waves until an
      empty page, so total pages is discovered, not read);
    - ``"browser"`` — pages past page 1 have NO URL AT ALL: only the entry
      page is in the web graph (out_links = its own doc slice), and pages
      2..P live in a side table ``browser_pages.parquet`` (entry_url, page,
      dom_token, links) readable only by driving a ScriptedBrowser handle
      through the click-chain (state/browser.py) — the Selenium click-through
      protocol of parana.py:127-156.  Click pages carry no fail modes (the
      scripted DOM renders deterministically once reached); entry listings
      and docs fail like every other corpus.

    ``payload_encoding="b64json"`` stores every doc payload base64-encoded
    inside a JSON body (``{"doc": {"conteudo": "<b64>"}}``) and marks the doc
    rows in ``web_graph.payload_encoding`` — the reference's API-shaped sources
    deliver binaries exactly this way (alagoas.py:104-107,
    rio_de_janeiro.py:136-141); the fetch stage must unwrap before decode.
    Ground-truth ``dec_sum``/``phash``/``psnr_db`` stay computed from the RAW
    image, so the decode invariants verify the unwrap end-to-end."""
    spec = SCALES[scale]
    out = os.path.join(root or CACHE_ROOT, f"{scale}-{variant}" if variant else scale)
    manifest = os.path.join(out, "manifest.json")
    if os.path.exists(manifest) and not force:
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # ---- corpus (F1) ----
    corpus = _make_images(spec, rng)
    if payload_encoding == "b64json":
        import base64

        # ground-truth dec_sum/phash/psnr were computed from the RAW image
        # above — wrapping only the stored payload makes the decode-stage
        # invariants verify the unwrap end-to-end
        corpus["bytes"] = [
            json.dumps({"doc": {"conteudo": base64.b64encode(b).decode("ascii")}}).encode()
            for b in corpus["bytes"]
        ]
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array(corpus["image_id"], pa.string()),
                "bytes": pa.array(corpus["bytes"], pa.binary()),
                "w": pa.array(corpus["w"], pa.int32()),
                "h": pa.array(corpus["h"], pa.int32()),
                "fmt": pa.array(corpus["fmt"], pa.string()),
                "caption": pa.array(corpus["caption"], pa.string()),
                "phash": pa.array(corpus["phash"], pa.int64()),
                "dec_sum": pa.array(corpus["dec_sum"], pa.uint64()),
                "psnr_db": pa.array(corpus["psnr_db"], pa.float64()),
                "dup_of": pa.array(corpus["dup_of"], pa.int64()),
            }
        ),
        os.path.join(out, "corpus.parquet"),
    )

    # ---- hosts: Zipf-skewed doc allocation (one hot host for skew tests) ----
    hosts = [f"{host_prefix}{i}.legis.example" for i in range(spec.n_hosts)]
    zipf_w = 1.0 / np.arange(1, spec.n_hosts + 1)
    zipf_w /= zipf_w.sum()
    docs_per_host = np.maximum((zipf_w * spec.n_doc_urls).astype(int), 1)
    docs_per_host[0] += spec.n_doc_urls - docs_per_host.sum()

    years = list(range(spec.years[0], spec.years[1] + 1))
    sits = SITUATIONS[: spec.n_situations]
    typs = TYPES[: spec.n_types]
    n_cells_per_host = len(years) * len(sits) * len(typs)

    g_urls, g_hosts, g_kind, g_out, g_img, g_year, g_sit, g_typ = [], [], [], [], [], [], [], []
    g_subjects: list[list[int] | None] = []
    seed_rows = []
    browser_rows: list[dict] = []  # pagination == "browser": pages 2..P
    doc_counter = 0
    for hi, host in enumerate(hosts):
        # spread the host's docs over (year, situation, type) cells, deterministic
        cell_docs = rng.multinomial(int(docs_per_host[hi]), np.full(n_cells_per_host, 1.0 / n_cells_per_host))
        ci = 0
        for year in years:
            for si, sit in enumerate(sits):
                for ti, typ in enumerate(typs):
                    nd = int(cell_docs[ci])
                    ci += 1
                    base = f"https://{host}/busca?ano={year}&situacao={sit}&tipo={typ}"
                    n_pages = max(nd // spec.per_page + (1 if nd % spec.per_page else 0), 1)
                    if pagination == "speculative":
                        # the chain includes one EMPTY terminal page — the probe
                        # only learns the total by fetching until a page is empty
                        listing_urls = [f"{base}&pagina={p}" for p in range(1, n_pages + 2)]
                    else:
                        listing_urls = [f"{base}&pagina={p}" for p in range(1, n_pages + 1)]
                    seed_rows.append(
                        {
                            "url": listing_urls[0],
                            "host": host,
                            "year": year,
                            "situation": sit,
                            "type": typ,
                            "sit_idx": si,
                            "type_idx": ti,
                        }
                    )
                    doc_urls = []
                    for d in range(nd):
                        doc_urls.append(f"https://{host}/doc/{year}/{typ}/{sit}/{doc_counter + d}")
                    if pagination == "browser":
                        # click-through protocol: ONLY the entry page has a
                        # URL; pages 2..P live in the browser_pages side
                        # table, gated by the scripted DOM token chain
                        from ..state.browser import advance_dom, seed_dom

                        entry = listing_urls[0]
                        g_urls.append(entry)
                        g_hosts.append(host)
                        g_kind.append("listing")
                        g_out.append(doc_urls[: spec.per_page])
                        g_img.append(None)
                        g_year.append(year)
                        g_sit.append(sit)
                        g_typ.append(typ)
                        g_subjects.append(None)
                        dom = seed_dom(entry)
                        for p in range(1, len(listing_urls)):
                            links = doc_urls[p * spec.per_page : (p + 1) * spec.per_page]
                            if spec.dup_link_frac > 0:
                                prev = doc_urls[(p - 1) * spec.per_page : p * spec.per_page]
                                k = int(len(prev) * spec.dup_link_frac)
                                if k:
                                    links = list(rng.choice(prev, size=k, replace=False)) + links
                            dom = advance_dom(dom, p + 1)
                            browser_rows.append(
                                {"entry_url": entry, "page": p + 1,
                                 "dom_token": dom, "links": links}
                            )
                        for d, durl in enumerate(doc_urls):
                            g_urls.append(durl)
                            g_hosts.append(host)
                            g_kind.append("doc")
                            g_out.append([])
                            g_img.append(f"img_{(doc_counter + d) % spec.n_images:08d}")
                            g_year.append(year)
                            g_sit.append(sit)
                            g_typ.append(typ)
                            g_subjects.append(
                                rng.integers(0, 50, size=int(rng.integers(1, 4))).tolist()
                            )
                        doc_counter += nd
                        continue
                    # page p's out_links = its slice of docs (+ all other listing pages on p1:
                    # the count-probe fan-out, scrape.py:267-285; speculative: + next page only)
                    for p, lurl in enumerate(listing_urls):
                        links = doc_urls[p * spec.per_page : (p + 1) * spec.per_page]
                        # duplicate ~dup_link_frac of the previous page's links (cross-page dups)
                        if p > 0 and spec.dup_link_frac > 0:
                            prev = doc_urls[(p - 1) * spec.per_page : p * spec.per_page]
                            k = int(len(prev) * spec.dup_link_frac)
                            if k:
                                links = list(rng.choice(prev, size=k, replace=False)) + links
                        if pagination == "speculative":
                            if p + 1 < len(listing_urls):
                                links = links + [listing_urls[p + 1]]
                        elif p == 0 and len(listing_urls) > 1:
                            links = listing_urls[1:] + links
                        g_urls.append(lurl)
                        g_hosts.append(host)
                        g_kind.append("listing")
                        g_out.append(links)
                        g_img.append(None)
                        g_year.append(year)
                        g_sit.append(sit)
                        g_typ.append(typ)
                        g_subjects.append(None)
                    for d, durl in enumerate(doc_urls):
                        g_urls.append(durl)
                        g_hosts.append(host)
                        g_kind.append("doc")
                        g_out.append([])
                        g_img.append(f"img_{(doc_counter + d) % spec.n_images:08d}")
                        g_year.append(year)
                        g_sit.append(sit)
                        g_typ.append(typ)
                        g_subjects.append(
                            rng.integers(0, 50, size=int(rng.integers(1, 4))).tolist()
                        )
                    doc_counter += nd

    n_g = len(g_urls)
    fail = np.full(n_g, None, dtype=object)
    fr = rng.random(n_g)
    fail[fr < spec.fail_frac * 0.4] = "soft_429"
    fail[(fr >= spec.fail_frac * 0.4) & (fr < spec.fail_frac * 0.7)] = "soft_503"
    fail[(fr >= spec.fail_frac * 0.7) & (fr < spec.fail_frac * 0.9)] = "body_error"
    fail[(fr >= spec.fail_frac * 0.9) & (fr < spec.fail_frac)] = "hard_error"
    robots = {h: int(d) for h, d in zip(hosts, rng.integers(0, 30, size=len(hosts)))}

    graph_cols = {
        "url": pa.array(g_urls, pa.string()),
        "host": pa.array(g_hosts, pa.string()),
        "kind": pa.array(g_kind, pa.string()),
        "out_links": pa.array(g_out, pa.list_(pa.string())),
        "image_id": pa.array(g_img, pa.string()),
        "year": pa.array(g_year, pa.int32()),
        "situation": pa.array(g_sit, pa.string()),
        "type": pa.array(g_typ, pa.string()),
        "subject_ids": pa.array(g_subjects, pa.list_(pa.int32())),
        "robots_delay_ms": pa.array([robots[h] for h in g_hosts], pa.int32()),
        "fail_mode": pa.array(fail.tolist(), pa.string()),
    }
    if payload_encoding:
        graph_cols["payload_encoding"] = pa.array(
            [payload_encoding if k == "doc" else None for k in g_kind], pa.string()
        )
    pq.write_table(pa.table(graph_cols), os.path.join(out, "web_graph.parquet"))

    if pagination == "browser":
        pq.write_table(
            pa.table(
                {
                    "entry_url": pa.array([r["entry_url"] for r in browser_rows], pa.string()),
                    "page": pa.array([r["page"] for r in browser_rows], pa.int32()),
                    "dom_token": pa.array([r["dom_token"] for r in browser_rows], pa.uint64()),
                    "links": pa.array([r["links"] for r in browser_rows], pa.list_(pa.string())),
                }
            ),
            os.path.join(out, "browser_pages.parquet"),
        )

    # ---- seeds (F2): priority = lexicographic (year, situation_idx, type_idx) — O2 ----
    year0 = spec.years[0]
    seeds_tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in seed_rows], pa.string()),
            "host": pa.array([r["host"] for r in seed_rows], pa.string()),
            "year": pa.array([r["year"] for r in seed_rows], pa.int32()),
            "situation": pa.array([r["situation"] for r in seed_rows], pa.string()),
            "type": pa.array([r["type"] for r in seed_rows], pa.string()),
            "priority": pa.array(
                [
                    float((r["year"] - year0) * 100 + r["sit_idx"] * 10 + r["type_idx"])
                    for r in seed_rows
                ],
                pa.float32(),
            ),
        }
    )
    pq.write_table(seeds_tbl, os.path.join(out, "seeds.parquet"))

    # ---- subjects dim (F5) ----
    pq.write_table(
        pa.table(
            {
                "subject_id": pa.array(range(50), pa.int32()),
                "subject": pa.array([f"assunto_{i:02d}" for i in range(50)], pa.string()),
            }
        ),
        os.path.join(out, "subjects.parquet"),
    )

    with open(manifest, "w") as f:
        json.dump(
            {
                "scale": f"{scale}-{variant}" if variant else scale,
                "seed": 42,
                "pagination": pagination,
                "n_doc_urls": spec.n_doc_urls,
                "n_images": spec.n_images,
                "n_graph_rows": n_g,
                "n_seeds": len(seed_rows),
                "robots_delay_ms": robots,
            },
            f,
            indent=2,
        )
    return out


def generate_rest(scale: str, root: str | None = None, force: bool = False) -> str:
    """Second synthetic source shape: offset/limit REST-style pagination
    (reference analog: the CONAMA JSON API, src/scraper/conama/scrape.py:123-130),
    exercising per-source parse dispatch (SURVEY.md M4):

    - hosts ``api{i}.legis.example`` (disjoint from the HTML-shaped source);
    - listing URLs ``/items?year=&sit=&type=&offset=&limit=``;
    - doc URLs ``/item/{situation}/{id}``;
    - ``out_links`` are stored RELATIVE (``/item/...``) — the reference resolves
      with urljoin (state_legislation/alagoas.py:96-99); the engine must do it
      in ``RestApiSource.parse_listing`` or every child URL misses the graph;
    - doc rows carry ``situation='unknown'`` in the graph — the true situation
      is only recoverable from the URL path by ``parse_doc`` (the reference
      parses it out of the detail page, state_legislation/parana.py:536-543).
    """
    spec = SCALES[scale]
    out = os.path.join(root or CACHE_ROOT, f"{scale}-rest")
    manifest = os.path.join(out, "manifest.json")
    if os.path.exists(manifest) and not force:
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)

    corpus = _make_images(spec, rng)
    image_ids = [f"rimg_{i:08d}" for i in range(spec.n_images)]
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array(image_ids, pa.string()),
                "bytes": pa.array(corpus["bytes"], pa.binary()),
                "w": pa.array(corpus["w"], pa.int32()),
                "h": pa.array(corpus["h"], pa.int32()),
                "fmt": pa.array(corpus["fmt"], pa.string()),
                "caption": pa.array(corpus["caption"], pa.string()),
                "phash": pa.array(corpus["phash"], pa.int64()),
                "dec_sum": pa.array(corpus["dec_sum"], pa.uint64()),
                "psnr_db": pa.array(corpus["psnr_db"], pa.float64()),
                "dup_of": pa.array(corpus["dup_of"], pa.int64()),
            }
        ),
        os.path.join(out, "corpus.parquet"),
    )

    hosts = [f"api{i}.legis.example" for i in range(spec.n_hosts)]
    zipf_w = 1.0 / np.arange(1, spec.n_hosts + 1)
    zipf_w /= zipf_w.sum()
    docs_per_host = np.maximum((zipf_w * spec.n_doc_urls).astype(int), 1)
    docs_per_host[0] += spec.n_doc_urls - docs_per_host.sum()

    years = list(range(spec.years[0], spec.years[1] + 1))
    sits = SITUATIONS[: spec.n_situations]
    typs = TYPES[: spec.n_types]
    n_cells = len(years) * len(sits) * len(typs)
    limit = spec.per_page

    g_urls, g_hosts, g_kind, g_out, g_img, g_year, g_sit, g_typ = [], [], [], [], [], [], [], []
    g_subjects: list[list[int] | None] = []
    seed_rows = []
    doc_counter = 0
    year0 = spec.years[0]
    for hi, host in enumerate(hosts):
        cell_docs = rng.multinomial(int(docs_per_host[hi]), np.full(n_cells, 1.0 / n_cells))
        ci = 0
        for year in years:
            for si, sit in enumerate(sits):
                for ti, typ in enumerate(typs):
                    nd = int(cell_docs[ci])
                    ci += 1
                    base_q = f"year={year}&sit={sit}&type={typ}"
                    n_pages = max((nd + limit - 1) // limit, 1)
                    page_urls = [
                        f"https://{host}/items?{base_q}&offset={p * limit}&limit={limit}"
                        for p in range(n_pages)
                    ]
                    seed_rows.append(
                        {"url": page_urls[0], "host": host, "year": year,
                         "situation": sit, "type": typ,
                         "priority": float((year - year0) * 100 + si * 10 + ti)}
                    )
                    rel_docs = [
                        f"/item/{sit}/{doc_counter + d}" for d in range(nd)
                    ]
                    for p, purl in enumerate(page_urls):
                        links = rel_docs[p * limit : (p + 1) * limit]
                        if p == 0 and n_pages > 1:
                            # count-probe fan-out: page 1 links the other pages,
                            # also RELATIVE (path + query)
                            links = [
                                f"/items?{base_q}&offset={q * limit}&limit={limit}"
                                for q in range(1, n_pages)
                            ] + links
                        g_urls.append(purl)
                        g_hosts.append(host)
                        g_kind.append("listing")
                        g_out.append(links)
                        g_img.append(None)
                        g_year.append(year)
                        g_sit.append(sit)
                        g_typ.append(typ)
                        g_subjects.append(None)
                    for d in range(nd):
                        g_urls.append(f"https://{host}/item/{sit}/{doc_counter + d}")
                        g_hosts.append(host)
                        g_kind.append("doc")
                        g_out.append([])
                        g_img.append(image_ids[(doc_counter + d) % spec.n_images])
                        g_year.append(year)
                        g_sit.append("unknown")  # parse_doc must recover it from the URL
                        g_typ.append(typ)
                        g_subjects.append(
                            rng.integers(0, 50, size=int(rng.integers(1, 4))).tolist()
                        )
                    doc_counter += nd

    n_g = len(g_urls)
    fail = np.full(n_g, None, dtype=object)
    fr = rng.random(n_g)
    fail[fr < spec.fail_frac * 0.4] = "soft_429"
    fail[(fr >= spec.fail_frac * 0.4) & (fr < spec.fail_frac * 0.7)] = "soft_503"
    fail[(fr >= spec.fail_frac * 0.7) & (fr < spec.fail_frac * 0.9)] = "body_error"
    fail[(fr >= spec.fail_frac * 0.9) & (fr < spec.fail_frac)] = "hard_error"
    robots = {h: int(d) for h, d in zip(hosts, rng.integers(0, 30, size=len(hosts)))}

    pq.write_table(
        pa.table(
            {
                "url": pa.array(g_urls, pa.string()),
                "host": pa.array(g_hosts, pa.string()),
                "kind": pa.array(g_kind, pa.string()),
                "out_links": pa.array(g_out, pa.list_(pa.string())),
                "image_id": pa.array(g_img, pa.string()),
                "year": pa.array(g_year, pa.int32()),
                "situation": pa.array(g_sit, pa.string()),
                "type": pa.array(g_typ, pa.string()),
                "subject_ids": pa.array(g_subjects, pa.list_(pa.int32())),
                "robots_delay_ms": pa.array([robots[h] for h in g_hosts], pa.int32()),
                "fail_mode": pa.array(fail.tolist(), pa.string()),
            }
        ),
        os.path.join(out, "web_graph.parquet"),
    )
    seeds_tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in seed_rows], pa.string()),
            "host": pa.array([r["host"] for r in seed_rows], pa.string()),
            "year": pa.array([r["year"] for r in seed_rows], pa.int32()),
            "situation": pa.array([r["situation"] for r in seed_rows], pa.string()),
            "type": pa.array([r["type"] for r in seed_rows], pa.string()),
            "priority": pa.array([r["priority"] for r in seed_rows], pa.float32()),
        }
    )
    pq.write_table(seeds_tbl, os.path.join(out, "seeds.parquet"))
    pq.write_table(
        pa.table(
            {
                "subject_id": pa.array(range(50), pa.int32()),
                "subject": pa.array([f"assunto_{i:02d}" for i in range(50)], pa.string()),
            }
        ),
        os.path.join(out, "subjects.parquet"),
    )
    with open(manifest, "w") as f:
        json.dump(
            {"scale": f"{scale}-rest", "seed": 4242, "n_doc_urls": spec.n_doc_urls,
             "n_images": spec.n_images, "n_graph_rows": n_g,
             "n_seeds": len(seed_rows), "robots_delay_ms": robots},
            f, indent=2,
        )
    return out


def generate_form(scale: str, root: str | None = None, force: bool = False) -> str:
    """Corpus for the stateful form-POST source (S6 end-to-end): structurally
    the synthetic web on the disjoint ``form{i}.legis.example`` host namespace.
    The statefulness lives in the PROTOCOL, not the graph: every request to a
    host must present the token minted by the previous response
    (state/session.py), which FormPostSource declares via
    ``stateful_session = True`` (reference: the JSF/ViewState postbacks of
    espirito_santo.py:69-127, maranhao.py:45-110)."""
    return generate(scale, root=root, force=force, host_prefix="form", variant="form")


def generate_speculative(scale: str, root: str | None = None, force: bool = False) -> str:
    """Corpus for the speculative-pagination source: listings reveal NO total —
    each page links only its docs and the next page, and the crawl discovers
    the page count by probing until an empty page (the frontier grows by
    discovery, not by a known fan-out).  Disjoint ``spec{i}.legis.example``
    host namespace."""
    return generate(scale, root=root, force=force, host_prefix="spec",
                    variant="spec", pagination="speculative")


def generate_b64(scale: str, root: str | None = None, force: bool = False) -> str:
    """Corpus for the base64-in-JSON payload source: doc payloads arrive
    wrapped as ``{"doc": {"conteudo": "<base64>"}}`` (alagoas.py:104-107,
    rio_de_janeiro.py:136-141); ``web_graph.payload_encoding`` marks the rows
    so the fetch stage unwraps before decode.  Disjoint
    ``b64h{i}.legis.example`` host namespace."""
    return generate(scale, root=root, force=force, host_prefix="b64h",
                    variant="b64", payload_encoding="b64json")


def generate_browser(scale: str, root: str | None = None, force: bool = False) -> str:
    """Corpus for the Selenium-stand-in browser source (S3/T2): result pages
    past page 1 have NO URL — they exist only as scripted-DOM states reachable
    by clicking through from the entry page (state/browser.py; reference:
    parana.py:127-156 drives a live driver through 'próximo' clicks).  The web
    graph holds only entry listings (+ docs); ``browser_pages.parquet`` holds
    the click-chain (entry_url, page, dom_token, links).  Disjoint
    ``js{i}.legis.example`` host namespace."""
    return generate(scale, root=root, force=force, host_prefix="js",
                    variant="browser", pagination="browser")


def corpus_dir_for_sf(sf_dir: str) -> str:
    """Map a driver sf dir (…/sf0.01) to the matching synthetic-corpus scale dir."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return generate(SF_TO_SCALE.get(name, "t1"))
