"""Planted semantics for dup_span_docs: cross-doc k-gram sharing (k=8),
island merging of overlapping/touching spans, same-doc-repeat exclusion,
0-based start / exclusive end coordinates."""

import pyarrow as pa
import pyarrow.parquet as pq


def _w(i):
    return f"w{i}"


def _doc(words):
    return " ".join(words)


def test_dup_span_semantics_planted(ray_session, tmp_path):
    K = 8
    # doc 0 and doc 1 share tokens 10..29 of doc 0 (20 tokens) — one merged
    # span despite being covered by 13 overlapping 8-grams
    base0 = [_w(i) for i in range(40)]
    shared = base0[10:30]
    doc1 = [f"x{i}" for i in range(5)] + shared + [f"y{i}" for i in range(7)]
    # doc 2 repeats ITS OWN 8-gram twice but shares nothing cross-doc:
    # must produce NO span (distinct-doc count is 1)
    rep = [f"z{i}" for i in range(8)]
    doc2 = rep + ["mid1", "mid2"] + rep
    # doc 3 is too short to hold any 8-gram
    doc3 = ["a", "b", "c"]
    docs = [_doc(base0), _doc(doc1), _doc(doc2), _doc(doc3)]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(docs)})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    from legislation_scraper_ray.pipelines.analytics import dup_span_docs

    out = (dup_span_docs(str(tmp_path), k=K).to_pandas()
           .sort_values(["doc_id", "span_start"], ignore_index=True))

    rows = list(zip(out["doc_id"], out["span_start"], out["span_end"],
                    out["span_tokens"]))
    # doc 0: shared run at tokens [10, 30); doc 1: at [5, 25); doc 2/3: none
    assert rows == [(0, 10, 30, 20), (1, 5, 25, 20)]


def test_dedup_clean_cuts_exact_spans(ray_session, tmp_path):
    K = 8
    base0 = [_w(i) for i in range(40)]
    shared = base0[10:30]
    doc1 = [f"x{i}" for i in range(5)] + shared + [f"y{i}" for i in range(7)]
    doc2 = ["solo"] * 12  # self-repeats only → untouched
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([_doc(base0), _doc(doc1), _doc(doc2)])})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    from legislation_scraper_ray.pipelines.analytics import dedup_clean_docs

    out = (dedup_clean_docs(str(tmp_path), k=K).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert out["n_removed"].tolist() == [20, 20, 0]
    assert out.loc[0, "clean_text"] == _doc(base0[:10] + base0[30:])
    # doc1's shared block sits at tokens [5, 25): kept = 5 x's + 7 y's
    assert out.loc[1, "clean_text"] == _doc(doc1[:5] + doc1[25:])
    assert out.loc[2, "clean_text"] == _doc(doc2)


def test_dup_span_touching_spans_merge(ray_session, tmp_path):
    K = 8
    # docs 1 and 2 each share a DIFFERENT 8-token block with doc 0; in doc 0
    # the two blocks are adjacent (positions [0,8) and [8,16)) — consecutive
    # hit starts differ by exactly k, so doc 0 reports ONE merged [0,16) span
    blk_a = [f"a{i}" for i in range(8)]
    blk_b = [f"b{i}" for i in range(8)]
    doc0 = blk_a + blk_b
    doc1 = [f"p{i}" for i in range(3)] + blk_a + [f"q{i}" for i in range(4)]
    doc2 = [f"r{i}" for i in range(6)] + blk_b + [f"s{i}" for i in range(2)]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([" ".join(doc0), " ".join(doc1),
                                      " ".join(doc2)])})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    from legislation_scraper_ray.pipelines.analytics import dup_span_docs

    out = (dup_span_docs(str(tmp_path), k=K).to_pandas()
           .sort_values(["doc_id", "span_start"], ignore_index=True))
    rows = list(zip(out["doc_id"], out["span_start"], out["span_end"]))
    assert rows == [(0, 0, 16), (1, 3, 11), (2, 6, 14)]
