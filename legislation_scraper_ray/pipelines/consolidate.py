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
"""

from __future__ import annotations

import os
from urllib.parse import unquote

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd


def consolidate(
    crawl_out_dir: str,
    corpus_dir: str,
    out_path: str,
    n_parts: int = 32,
) -> rd.Dataset:
    """Returns (and writes) the consolidated dataset."""
    docs = rd.read_parquet(os.path.join(crawl_out_dir, "docs"))

    # ---- broadcast subjects dim (J1) ----
    subjects = pq.read_table(os.path.join(corpus_dir, "subjects.parquet"))
    sub_names = np.asarray(subjects["subject"].to_pylist(), dtype=object)
    sub_ref = ray.put(sub_names)

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

    def dedup_part(t: pa.Table) -> pa.Table:
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

    def add_part(t: pa.Table) -> pa.Table:
        v = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "part", pa.array((v % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    out = (
        docs.map_batches(normalize, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .drop_columns(["part"])
    )
    if "subject_ids" in docs.schema().names:

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

        out = out.map_batches(SubjectJoin, batch_format="pyarrow", concurrency=2)
    out.write_parquet(out_path, partition_cols=["year", "type", "situation"])
    return out
