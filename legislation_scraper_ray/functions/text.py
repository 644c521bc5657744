"""Text-analysis operators: tokenization, language ID, quality scoring,
fingerprinting.

These are the training-data-pipeline operators a 100 TB corpus engine needs on
top of the reference's scraping transforms (the reference's own text handling
is regex cleanup + markdown conversion, SURVEY.md §2.8).  All kernels are
vectorized: Arrow ``split_pattern`` for tokenization, flattened-word hashing +
``np.bincount`` for per-document token statistics — no Python loop over rows
or tokens in any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (hermetic stand-in for fasttext-style LID)
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "a", "of", "and", "to", "in", "is"},
    "es": {"el", "la", "de", "y", "en", "que", "los"},
    "pt": {"de", "e", "que", "do", "da", "em", "lei"},
    "de": {"der", "die", "und", "in", "den", "von"},
    "fr": {"le", "de", "et", "la", "les", "des"},
}

STOPWORDS = {"the", "a", "of", "and", "to", "in"}

# BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _flat_tokens(texts: pa.ChunkedArray | pa.Array):
    """texts → (flat word Array, parent_indices int64, per-doc counts int64)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    return pc.list_flatten(words), parents, counts


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count.

    Arrow has no findall; the regex token count is alpha runs + digit runs +
    single symbols (the TOKEN_REGEX classes), each counted vectorized."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ws_tokens = pc.list_value_length(pc.split_pattern(texts, " "))
    alpha_runs = pc.count_substring_regex(texts, r"[A-Za-z]+")
    digit_runs = pc.count_substring_regex(texts, r"[0-9]+")
    symbols = pc.count_substring_regex(texts, r"[^A-Za-z0-9\s]")
    bpe_tokens = pc.add(pc.add(alpha_runs, digit_runs), symbols)
    return batch.append_column("n_tokens", ws_tokens.cast(pa.int64())).append_column(
        "n_bpe_tokens", bpe_tokens.cast(pa.int64())
    )


def segmented_min(vals: np.ndarray, sorted_parents: np.ndarray, n: int, identity) -> np.ndarray:
    """Per-segment minimum of ``vals`` (shape (S,) or (S, k)) grouped by the
    NONDECREASING ``sorted_parents`` (values in [0, n)).  Empty segments get
    ``identity``.

    This is the C-speed replacement for ``np.minimum.at``: ufunc ``.at``
    dispatches per ELEMENT (~100 M scalar ops for a 4k-doc MinHash batch,
    measured 30+ s/batch), while one ``minimum.reduceat`` call per chunk runs
    the same reduction vectorized (same chunk-segmented-reduceat law as the
    decode stage — see CLAUDE.md)."""
    out_shape = (n,) + vals.shape[1:]
    out = np.full(out_shape, identity, dtype=vals.dtype)
    s = len(sorted_parents)
    if s == 0 or n == 0:
        return out
    starts = np.searchsorted(sorted_parents, np.arange(n)).astype(np.intp)
    counts = np.diff(np.append(starts, s))
    nonempty = counts > 0
    # reduceat over ONLY the nonempty starts: they are strictly increasing and
    # the last one runs to the end of ``vals``.  (Clamping empty trailing
    # starts to s-1 instead would truncate the final nonempty segment's range.)
    out[nonempty] = np.minimum.reduceat(vals, starts[nonempty], axis=0)
    return out


def segmented_sum(vals: np.ndarray, sorted_parents: np.ndarray, n: int) -> np.ndarray:
    """Per-segment sum — the ``np.add.at`` analog of :func:`segmented_min`
    (empty segments are 0)."""
    out_shape = (n,) + vals.shape[1:]
    out = np.zeros(out_shape, dtype=vals.dtype)
    s = len(sorted_parents)
    if s == 0 or n == 0:
        return out
    starts = np.searchsorted(sorted_parents, np.arange(n)).astype(np.intp)
    counts = np.diff(np.append(starts, s))
    nonempty = counts > 0
    out[nonempty] = np.add.reduceat(vals, starts[nonempty], axis=0)
    return out


def _stopword_hits(flat_words: pa.Array, parents: np.ndarray, n_docs: int, vocab: set[str]) -> np.ndarray:
    mask = pc.is_in(flat_words, value_set=pa.array(sorted(vocab))).to_numpy(zero_copy_only=False)
    return np.bincount(parents, weights=mask.astype(np.float64), minlength=n_docs)


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: token count, mean token length, stopword
    ratio, alpha ratio — the standard cheap quality filters for web corpora."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    flat, parents, counts = _flat_tokens(texts)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(texts, r"[A-Za-z]").to_numpy(zero_copy_only=False)
    stop_hits = _stopword_hits(flat, parents, n, STOPWORDS)
    tokens = np.maximum(counts, 1).astype(np.float64)
    mean_tok_len = (n_chars - (counts - 1)) / tokens  # chars minus separators
    out = batch
    out = out.append_column("n_tokens", pa.array(counts, pa.int64()))
    out = out.append_column("mean_token_len", pa.array(mean_tok_len, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_hits / tokens, pa.float64()))
    out = out.append_column(
        "alpha_ratio", pa.array(n_alpha / np.maximum(n_chars, 1), pa.float64())
    )
    quality = (
        np.clip(counts / 64.0, 0, 1) * 0.4
        + np.clip(stop_hits / tokens * 5, 0, 1) * 0.2
        + (n_alpha / np.maximum(n_chars, 1)) * 0.4
    )
    return out.append_column("quality", pa.array(quality, pa.float64()))


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID (argmax over per-language hit ratios;
    'und' when nothing matches)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(texts)
    flat, parents, counts = _flat_tokens(lowered)
    n = len(texts)
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((n, len(langs)))
    for j, lg in enumerate(langs):
        scores[:, j] = _stopword_hits(flat, parents, n, LANG_PROFILES[lg])
    best = scores.argmax(axis=1)
    hit = scores.max(axis=1) > 0
    pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprints: exact content hash (FNV-1a 64 of the text) and a
    rolling winnowed hash (min token-trigram hash — a 1-element MinHash, the
    cheapest shift-robust fingerprint)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    exact = hash64(texts)
    flat, parents, counts = _flat_tokens(texts)
    wh = hash64(flat)
    n = len(texts)
    tri = _trigram_hashes(wh, parents)
    minh = segmented_min(tri[0], tri[1], n, np.iinfo(np.uint64).max)
    return batch.append_column("fp_exact", pa.array(exact, pa.uint64())).append_column(
        "fp_shingle_min", pa.array(minh, pa.uint64())
    )


def _trigram_hashes(word_hashes: np.ndarray, parents: np.ndarray):
    """Hashes of consecutive word trigrams that do not cross doc boundaries.
    Returns (trigram_hash uint64[], parent_doc int64[])."""
    if len(word_hashes) < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    a, b, c = word_hashes[:-2], word_hashes[1:-1], word_hashes[2:]
    mix = np.uint64(0x9E3779B97F4A7C15)
    h = (a * mix + b) * mix + c
    same = (parents[:-2] == parents[1:-1]) & (parents[1:-1] == parents[2:])
    return h[same], parents[:-2][same]


# PII patterns a training-corpus scrub removes (emails, international-ish
# phone numbers, 16-digit card-like runs, IPv4).  Order matters: the card rule
# must run before the phone rule would eat its digit groups.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    (r"\+?\d{1,3}[ -]?\(?\d{2,4}\)?[ -]?\d{3,4}[ -]?\d{3,4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized PII redaction over a text column: each pattern is one Arrow
    ``replace_substring_regex`` kernel pass (no Python row loop), plus a
    per-row redaction count so downstream quality filters can drop
    PII-saturated documents.  Adds ``text`` (redacted in place) and
    ``n_redactions``."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_red = np.zeros(len(texts), np.int64)
    for pat, token in PII_PATTERNS:
        n_red += pc.count_substring_regex(texts, pat).to_numpy(zero_copy_only=False)
        texts = pc.replace_substring_regex(texts, pat, token)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, texts).append_column(
        "n_redactions", pa.array(n_red, pa.int64())
    )


def kgram_hashes(word_hashes: np.ndarray, parents: np.ndarray, k: int):
    """Generalized :func:`_trigram_hashes`: hashes of consecutive word
    ``k``-grams that do not cross doc boundaries (same golden-ratio Horner
    mix, so ``k=3`` is bit-identical to the trigram kernel).  Returns
    ``(kgram_hash uint64[], parent_doc int64[])``."""
    n = len(word_hashes)
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    h = word_hashes[: n - k + 1].copy()
    same = np.ones(n - k + 1, dtype=bool)
    for i in range(1, k):
        h = h * mix + word_hashes[i : n - k + 1 + i]
        same &= parents[: n - k + 1] == parents[i : n - k + 1 + i]
    return h[same], parents[: n - k + 1][same]


def kgram_pos_hashes(texts: pa.Array | pa.ChunkedArray, k: int):
    """POSITIONAL word-k-gram hashes for a batch of texts — the span-dedup
    variant of :func:`kgram_hashes`: every in-doc k-gram start position gets
    a DUAL 64-bit hash (two independent FNV token-hash families folded by
    two different odd Horner multipliers), so downstream equality tests are
    effectively 128-bit — a false "shared span" needs a simultaneous
    collision in both families (~2^-128).  Returns ``(h1 uint64[],
    h2 uint64[], parent_doc int64[], pos_in_doc int64[])`` with ``pos``
    0-based."""
    from .hashing import hash64_pair

    flat, parents, counts = _flat_tokens(texts)
    h1t, h2t = hash64_pair(flat)
    n = len(h1t)
    if n < k:
        return (np.empty(0, np.uint64), np.empty(0, np.uint64),
                np.empty(0, np.int64), np.empty(0, np.int64))
    mix1 = np.uint64(0x9E3779B97F4A7C15)
    mix2 = np.uint64(0xC2B2AE3D27D4EB4F)
    h1 = h1t[: n - k + 1].copy()
    h2 = h2t[: n - k + 1].copy()
    same = np.ones(n - k + 1, dtype=bool)
    for i in range(1, k):
        h1 = h1 * mix1 + h1t[i : n - k + 1 + i]
        h2 = h2 * mix2 + h2t[i : n - k + 1 + i]
        same &= parents[: n - k + 1] == parents[i : n - k + 1 + i]
    par = parents[: n - k + 1][same]
    starts = np.cumsum(counts) - counts
    idx = np.flatnonzero(same)
    pos = idx - starts[par]
    return h1[same], h2[same], par.astype(np.int64), pos.astype(np.int64)


def doc_distinct_kgrams(
    texts: pa.Array | pa.ChunkedArray, k: int
) -> tuple[np.ndarray, np.ndarray, int, np.ndarray]:
    """Per-doc DISTINCT word-k-gram hashes for a batch of texts, fully
    vectorized: tokenize → hash words → k-gram Horner mix → per-(doc, hash)
    dedup via one lexsort.  Returns ``(hashes, parent_doc, n_docs, n_total)``
    where ``hashes``/``parent_doc`` hold the distinct k-grams per doc (sorted
    by doc then hash) and ``n_total[d]`` is doc d's TOTAL (with-duplicate)
    k-gram count."""
    flat, parents, _counts = _flat_tokens(texts)
    wh = hash64(flat)
    h, par = kgram_hashes(wh, parents, k)
    n_docs = len(texts)
    n_total = np.bincount(par, minlength=n_docs).astype(np.int64) if len(par) else np.zeros(n_docs, np.int64)
    if not len(h):
        return h, par, n_docs, n_total
    order = np.lexsort((h, par))
    h, par = h[order], par[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (par[1:] != par[:-1])
    return h[keep], par[keep], n_docs, n_total


class LogisticScore:
    """Actor-pool "model inference" stage: a logistic quality classifier
    z = w0 + w1·ln(1 + n_tokens) + w2·stopword_ratio + w3·mean_token_len,
    score = σ(z) — the fasttext-style quality-filter shape of a web-corpus
    pipeline.  The weight vector ships by object-store broadcast and loads
    once per actor (``__init__``); each batch is scored as one vectorized
    numpy expression over the ``quality_features`` kernels (same feature
    formulas as the SQL oracle, evaluated left-to-right so the doubles
    agree).  Swap the 4-weight vector for a real model handle and the stage
    shape is unchanged.

    Reference analog: the validity/quality gates applied per scraped doc
    before save (/root/reference/src/scraper/base/scraper.py:423-447)."""

    def __init__(self, weights_ref):
        import ray

        self.w = (
            weights_ref
            if isinstance(weights_ref, np.ndarray)
            else ray.get(weights_ref)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_features(batch)
        n_tok = q["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        sr = q["stopword_ratio"].to_numpy(zero_copy_only=False)
        mtl = q["mean_token_len"].to_numpy(zero_copy_only=False)
        w0, w1, w2, w3 = self.w
        z = w0 + w1 * np.log(1.0 + n_tok) + w2 * sr + w3 * mtl
        score = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": pa.array(score, pa.float64()),
            }
        )


def bpe_train(words: np.ndarray, counts: np.ndarray, n_merges: int = 32):
    """Learn BPE merges from a WORD-FREQUENCY table (the standard trick: BPE
    never scans the corpus — it trains on the vocabulary weighted by count,
    which is output-sized even at 100 TB).  Deterministic: ties on pair
    frequency break lexicographically.  Returns the ordered merge list
    [((a, b), rank), ...] where symbols are strings ('</w>' marks word end).

    Pure driver-side computation over the vocab table; the distributed parts
    of the pipeline are the word count before and the encode pass after."""
    seqs = [tuple(w) + ("</w>",) for w in words]
    cnts = [int(c) for c in counts]
    merges = []
    for rank in range(n_merges):
        pair_freq: dict = {}
        for seq, c in zip(seqs, cnts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + c
        if not pair_freq:
            break
        top_f = max(pair_freq.values())
        best_pair = min(p for p, f in pair_freq.items() if f == top_f)
        merges.append((best_pair, rank))
        a, b = best_pair
        ab = a + b
        new_seqs = []
        for seq in seqs:
            if a not in seq:
                new_seqs.append(seq)
                continue
            out = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def bpe_encode_len(word: str, ranks: dict) -> int:
    """Number of BPE tokens for one word under the learned merge ranks
    (apply the lowest-rank applicable merge until none applies)."""
    seq = list(word) + ["</w>"]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return len(seq)


class BPECount:
    """map_batches actor stage: per-doc token count under a TRAINED BPE.

    Actor state (``__init__``): the broadcast merge-rank table plus a
    per-actor word→length memo — the corpus's unique-word set is vocab-sized,
    so after warmup each batch is a pure vectorized gather.  Per batch:
    explode to words (Arrow kernels), ``np.unique`` the batch's words, encode
    only the memo misses in Python (bounded by NEW vocab, not rows), then
    segment-sum the per-word lengths back to docs."""

    def __init__(self, ranks_ref):
        import ray

        self.ranks = ranks_ref if isinstance(ranks_ref, dict) else ray.get(ranks_ref)
        self.memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, parents, _counts = _flat_tokens(texts)
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words, return_inverse=True)
        lens = np.empty(len(uniq), np.int64)
        for j, w in enumerate(uniq):
            n = self.memo.get(w)
            if n is None:
                n = bpe_encode_len(w, self.ranks)
                self.memo[w] = n
            lens[j] = n
        per_word = lens[inv]
        n_docs = len(texts)
        out = np.bincount(parents, weights=per_word, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(out, pa.int64()),
            }
        )
