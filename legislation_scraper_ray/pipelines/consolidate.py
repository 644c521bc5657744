"""Consolidation job: crawl outputs → deduplicated, normalized final table.

Re-expression of the reference's offline builder (src/datasets/build_dataset.py,
SURVEY.md §3.3): glob per-record JSON → pandas → dedup by document_url →
coalesce text → markdown squeeze → unquote → year int → CSV/HF push, rebuilt
Ray-Data-first:

- read the partitioned parquet doc sink (hive partitioning, column-pruned);
- exact dedup by ``url_hash`` with first-wins-by-generation semantics
  (reference: drop_duplicates(subset=["document_url"]), build_dataset.py:204
  keep='first' in file order ≈ crawl order ≈ generation asc);
- normalize: caption whitespace squeeze (``\\n{4,}``→``\\n\\n\\n`` analog,
  build_dataset.py:224-229), URL unquote (:232-236), year int cast (:238);
- broadcast-join subject ids → names (Paraíba subjects lookup,
  src/scraper/state_legislation/paraiba.py:121-145);
- write one consolidated parquet partitioned by (year, type, situation).

Resume (r2): the reference builder resumes by CSV row count
(build_dataset.py:135-143 — lossy).  Here consolidation is two checkpointable
phases recorded in ``_manifest.json``:

1. *stage*: one streaming pass hash-partitions the input by
   ``url_hash % n_shards`` into ``_stage/shard=s/`` (all copies of a URL land
   in one shard, so per-shard dedup is exact).  Interrupt ⇒ redo (single pass).
2. *shards*: each shard independently runs normalize→dedup→subject-join→write
   to ``shard=s/…`` and is marked complete.  Interrupt ⇒ only the incomplete
   shard's directory is cleared and re-run (write_parquet APPENDS by default,
   so a partial directory must be removed before rewrite — same rule as the
   crawl's gen dirs).

``_stage`` and ``_manifest.json`` start with '_' so parquet dataset discovery
(pyarrow ``ignore_prefixes`` default) skips them when reading the output.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import unquote

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _make_normalize():
    def normalize(batch: pa.Table) -> pa.Table:
        cap = batch["caption"]
        if isinstance(cap, pa.ChunkedArray):
            cap = cap.combine_chunks()
        cap = pc.replace_substring_regex(cap, r"\n{4,}", "\n\n\n")
        cap = pc.utf8_trim_whitespace(cap)
        urls = [unquote(u) for u in batch["url"].to_pylist()]
        batch = batch.set_column(batch.schema.get_field_index("caption"), "caption", cap)
        batch = batch.set_column(
            batch.schema.get_field_index("url"), "url", pa.array(urls, pa.string())
        )
        return batch

    return normalize


def _dedup_part(t: pa.Table) -> pa.Table:
    # first-wins by (generation, scheduled_ts): the earliest fetch survives.
    # Pure Arrow (a pandas round-trip would mangle list columns into Ray
    # tensor-extension arrays).
    order = pc.sort_indices(
        t, sort_keys=[("generation", "ascending"), ("scheduled_ts", "ascending")]
    )
    t = t.take(order)
    h = t["url_hash"].to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(h, return_index=True)
    return t.take(pa.array(np.sort(first_idx)))


def _add_key(col: str, out: str, n: int):
    def add(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(out, pa.array((v % np.uint64(n)).astype(np.int32), pa.int32()))

    return add


def _load_manifest(path: str):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _save_manifest(path: str, state: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def consolidate(
    crawl_out_dir: str,
    corpus_dir: str,
    out_path: str,
    n_parts: int = 32,
    n_shards: int = 8,
    resume: bool = False,
    _fail_after_shards: int | None = None,
) -> rd.Dataset:
    """Consolidate (or resume consolidating) a crawl's doc sink.

    Returns a Dataset view of the written output.  ``_fail_after_shards`` is a
    test hook: raise after completing that many shards (simulated crash)."""
    manifest_path = os.path.join(out_path, "_manifest.json")
    stage_dir = os.path.join(out_path, "_stage")
    state = _load_manifest(manifest_path) if resume else None
    if state is None:
        if os.path.exists(out_path):
            shutil.rmtree(out_path)
        os.makedirs(out_path, exist_ok=True)
        state = {"n_shards": n_shards, "staged": False, "completed": []}
        _save_manifest(manifest_path, state)
    n_shards = state["n_shards"]

    # ---- phase 1: hash-partition the input into resume shards ----
    if not state["staged"]:
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        docs = rd.read_parquet(os.path.join(crawl_out_dir, "docs"))
        docs.map_batches(
            _add_key("url_hash", "shard", n_shards), batch_format="pyarrow"
        ).write_parquet(stage_dir, partition_cols=["shard"])
        state["staged"] = True
        _save_manifest(manifest_path, state)

    # ---- broadcast subjects dim (J1) ----
    subjects = pq.read_table(os.path.join(corpus_dir, "subjects.parquet"))
    sub_names = np.asarray(subjects["subject"].to_pylist(), dtype=object)
    sub_ref = ray.put(sub_names)

    class SubjectJoin:
        def __init__(self):
            self.names = ray.get(sub_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["subject_ids"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            flat = pc.list_flatten(ids).to_numpy(zero_copy_only=False)
            mapped = pa.array(self.names[flat].tolist(), pa.string())
            offsets = pc.list_value_length(ids).to_numpy(zero_copy_only=False)
            starts = np.concatenate([[0], np.cumsum(offsets)]).astype(np.int32)
            lists = pa.ListArray.from_arrays(pa.array(starts, pa.int32()), mapped)
            return t.append_column("subjects", lists)

    # ---- phase 2: per-shard normalize → dedup → join → write ----
    for s in range(n_shards):
        if s in state["completed"]:
            continue
        shard_out = os.path.join(out_path, f"shard={s}")
        if os.path.exists(shard_out):
            shutil.rmtree(shard_out)  # partial output from an interrupted write
        shard_src = os.path.join(stage_dir, f"shard={s}")
        if not os.path.exists(shard_src):  # empty shard (tiny corpus)
            state["completed"].append(s)
            _save_manifest(manifest_path, state)
            continue
        shard_ds = rd.read_parquet(shard_src)
        if "shard" in shard_ds.schema().names:
            # the reader re-infers "shard" from the hive path we read inside;
            # keep it out of the data files (it would clash with the output's
            # own shard=N directory level on read-back)
            shard_ds = shard_ds.drop_columns(["shard"])
        out = (
            shard_ds
            .map_batches(_make_normalize(), batch_format="pyarrow")
            .map_batches(_add_key("url_hash", "part", n_parts), batch_format="pyarrow")
            .groupby("part")
            .map_groups(_dedup_part, batch_format="pyarrow")
            .drop_columns(["part"])  # "shard" is the path level we read inside
        )
        if "subject_ids" in out.schema().names:
            out = out.map_batches(SubjectJoin, batch_format="pyarrow", concurrency=(1, 4), num_cpus=0.5)
        out.write_parquet(shard_out, partition_cols=["year", "type", "situation"])
        state["completed"].append(s)
        _save_manifest(manifest_path, state)
        if _fail_after_shards is not None and len(state["completed"]) >= _fail_after_shards:
            raise RuntimeError(f"injected crash after {_fail_after_shards} shards")

    shutil.rmtree(stage_dir, ignore_errors=True)
    return rd.read_parquet(out_path)
