"""chunk_docs_overlap edge cases (exact window/stride boundaries) vs the
operator's own DuckDB oracle on a crafted corpus — the driver corpus never
hits n ∈ {64, 65, 112, 113}."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_chunk_boundaries_match_oracle(ray_session, tmp_path):
    sizes = [1, 2, 47, 48, 49, 63, 64, 65, 111, 112, 113, 160]
    texts = [" ".join(f"t{i}w{j}" for j in range(n)) for i, n in enumerate(sizes)]
    tbl = pa.table({"doc_id": pa.array(range(len(sizes)), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    import __ray_entry__ as e

    ray_df = (e.queries()["chunk_docs_overlap"](str(tmp_path)).to_pandas()
              .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    sql_df = (con.execute(e.oracle_sql()["chunk_docs_overlap"]
                          + " ORDER BY doc_id, chunk_id").df())
    assert ray_df["chunk_text"].tolist() == sql_df["chunk_text"].tolist()
    assert ray_df["n_tokens"].tolist() == sql_df["n_tokens"].tolist()
    assert ray_df["chunk_id"].tolist() == sql_df["chunk_id"].tolist()
    # boundary expectations: n<=64 -> 1 chunk; 65..112 -> 2; 113 -> 3
    per_doc = ray_df.groupby("doc_id").size().tolist()
    assert per_doc == [1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 3, 3]
    # overlap law: chunk k+1 repeats the last (window-stride)=16 tokens of
    # the 64-token chunk k
    g = ray_df[ray_df["doc_id"] == 11]
    c0, c1 = g.iloc[0]["chunk_text"].split(" "), g.iloc[1]["chunk_text"].split(" ")
    assert c0[48:] == c1[:16]
