"""JSON-lines ingest/egress (reference S10/S11 parity).

The reference persists one JSON file per record in a value-derived directory
tree and re-ingests with a threaded glob reader
(src/database/saver.py:104-141; src/datasets/build_dataset.py:145-193), then
exports CSV (:241-248).  Ray-native equivalents: ``ray.data.read_json`` over a
directory of JSONL shards and ``Dataset.write_json`` / ``write_csv`` — one
shard per block instead of one file per record (a million tiny files is a
filesystem DoS at crawl scale; JSONL shards keep the same content)."""

from __future__ import annotations

import ray.data as rd


def write_jsonl(ds: rd.Dataset, path: str) -> None:
    ds.write_json(path)


def read_jsonl(path: str) -> rd.Dataset:
    return rd.read_json(path)


def write_csv(ds: rd.Dataset, path: str) -> None:
    ds.write_csv(path)


def read_csv(path: str) -> rd.Dataset:
    return rd.read_csv(path)
