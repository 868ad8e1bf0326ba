"""Decision-support batch (pipelines/dss.py) vs DuckDB at sf0.001 — a
representative subset in-pytest (the full 13-query sweep at three scale
factors runs via tools/check_oracles.py); plus shape pins the SQL
comparison can't express."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# one per distinct plan shape: EXISTS folding, two-level aggregate,
# self-grouped anti, global-scalar HAVING
SMOKE = ["q4_order_priority", "q13_customer_distribution",
         "q21_sole_supplier", "q11_supplier_concentration"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", SMOKE)
def test_dss_matches_oracle(name, con):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    from tools.check_oracles import compare

    mine = entry.queries()[name](SF)
    ora = con.sql(entry.oracle_sql()[name]).df()
    err = compare(mine, ora)
    assert err is None, f"{name}: {err}"


def test_q4_exists_folding_is_exact(con):
    """The max-shipdate fold must agree with a literal EXISTS probe on
    every order in the window, not just in aggregate."""
    from cpg_ray.pipelines.dss import q4_order_priority

    ours = q4_order_priority(SF)
    probe = con.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND o_orderkey IN (
              SELECT l_orderkey FROM lineitem l, orders o2
              WHERE l.l_orderkey = o2.o_orderkey
                AND l.l_shipdate > o2.o_orderdate)
        GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(
        ours, probe.astype({"order_count": "int64"}))


def test_q21_sole_supplier_never_counts_single_line_orders():
    """min==max alone would also admit 1-line orders; the n_lines >= 2
    guard is load-bearing."""
    from cpg_ray.pipelines.dss import q21_sole_supplier

    out = q21_sole_supplier(SF)
    con = duckdb.connect()
    single = con.sql(f"""
        WITH per_order AS (
            SELECT l_orderkey, count(*) n, min(l_suppkey) mn,
                   max(l_suppkey) mx
            FROM '{SF}/lineitem.parquet' GROUP BY 1)
        SELECT count(*) FROM per_order WHERE n = 1
    """).fetchone()[0]
    assert single > 0, "fixture must contain 1-line orders for this pin"
    multi_sole = con.sql(f"""
        WITH per_order AS (
            SELECT l_orderkey, count(*) n, min(l_suppkey) mn,
                   max(l_suppkey) mx
            FROM '{SF}/lineitem.parquet' GROUP BY 1)
        SELECT count(DISTINCT mn) FROM per_order WHERE n >= 2 AND mn = mx
    """).fetchone()[0]
    assert len(out) == min(10, multi_sole)
