"""Driver-style conformance check: run each queries() entry at a given sf_dir
and compare against its DuckDB oracle (row count + order-insensitive values).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            # width-normalize (float32 ROUND outputs from DuckDB FLOAT[] ops)
            # but stay strict about int-vs-float KIND (the r3 rag_prep red row)
            df[c] = df[c].astype("float64").round(4)
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64", errors="ignore")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    # corpus-path oracles are pinned to the sf0.01 (t2) image corpus — at any
    # other scale the engine reads a different corpus, so compare rows-only
    if "sf0.01" not in sf_dir:
        from legislation_scraper_ray.pipelines.queries import ORACLE_SF01_ONLY

        sqls = {k: v for k, v in sqls.items() if k not in ORACLE_SF01_ONLY}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ROWS   {name}: {len(mine)} rows ({dt:.1f}s, no oracle)")
            continue
        oracle = canon(con.execute(sqls[name]).df())
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                # dtype-strict (like the driver's value hash): an oracle that
                # returns HUGEINT->float64 for an integer engine column must
                # FAIL here, not be papered over (r3's rag_prep_docs red row).
                pd.testing.assert_frame_equal(
                    mine.reset_index(drop=True),
                    oracle.reset_index(drop=True),
                    check_dtype=True,
                    check_exact=False,
                    atol=1e-6,
                )
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS   {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL   {name}: rows {len(mine)} vs {len(oracle)}, cols {list(mine.columns)} vs"
                f" {list(oracle.columns)}"
                + ("" if ok_rows and ok_cols else "")
                + (f" | {detail}" if ok_rows and ok_cols and not ok_vals else "")
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()


if __name__ == "__main__":
    main()
