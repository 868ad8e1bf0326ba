"""Side-by-side Ray-vs-DuckDB oracle check (mimics the driver's
CORRECTNESS gate: row count + sorted-column value comparison).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True):
                bad = (~np.isclose(av.astype(float), bv.astype(float), atol=1e-9)).idxmax()
                return f"col {c} differs, e.g. row {bad}: {av[bad]} vs {bv[bad]}"
        else:
            eq = av.astype(str).values == bv.astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                return f"col {c} differs, e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return None


def main() -> int:
    import ray
    from ray.data import DataContext

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import os

    # kg_* oracles read the engine-materialized graph parquet for
    # GRAFT_ORACLE_SF_DIR (default sf0.01) — pin it to the sweep's
    # sf_dir so a sweep at another scale never compares against the
    # wrong graph (a round-4 sweep without this flagged 29 phantom
    # row-count failures at sf0.001)
    os.environ.setdefault("GRAFT_ORACLE_SF_DIR", sf_dir)
    sys.path.insert(0, ".")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        try:
            mine = qs[name](sf_dir)
            if not isinstance(mine, pd.DataFrame):
                mine = mine.to_pandas()
            ora = con.sql(sql).df()
            err = compare(mine, ora)
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION {type(e).__name__}: {e}"
        if err:
            failures += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name} ({len(mine)} rows)")
    # rows-only queries: just run them
    for name, fn in qs.items():
        if name in oracles or (only and name not in only):
            continue
        try:
            res = fn(sf_dir)
            if not isinstance(res, pd.DataFrame):
                res = res.to_pandas()
            print(f"ok   {name} [rows-only] ({len(res)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name} [rows-only]: {type(e).__name__}: {e}")
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
