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
# self-grouped anti, global-scalar HAVING, correlated-min collapse,
# distinct-then-count, nested-aggregate comparison
SMOKE = ["q4_order_priority", "q13_customer_distribution",
         "q21_sole_supplier", "q11_supplier_concentration",
         "q2_min_cost_supplier", "q16_supplier_counts",
         "q20_part_specialists"]


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


def test_q20_majority_leg_is_discriminating():
    """The not-all guard (qty_1996 < qty_total) must exclude at least
    one supplier that the plain more-than-half predicate admits —
    otherwise the query degenerates to 'every supplier with any 1996
    shipment of a small part' and stops testing the nested-aggregate
    comparison."""
    from cpg_ray.pipelines.dss import q20_part_specialists

    out = q20_part_specialists(SF)
    con = duckdb.connect()
    plain_n = con.sql(f"""
        SELECT count(*) FROM '{SF}/supplier.parquet' WHERE s_suppkey IN (
            SELECT l_suppkey FROM '{SF}/lineitem.parquet'
            WHERE l_partkey IN (SELECT p_partkey FROM '{SF}/part.parquet'
                                WHERE p_name LIKE 'small %')
            GROUP BY l_partkey, l_suppkey
            HAVING 2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                                 AND l_shipdate < TIMESTAMP '1997-01-01'
                                THEN l_quantity ELSE 0 END)
                   > sum(l_quantity))
    """).fetchone()[0]
    assert len(out) < plain_n, (
        "majority-not-all leg excluded nobody — predicate degenerate")
    assert len(out) > 0


def test_q2_winners_are_true_per_part_minima(con):
    """Every emitted (part, supplier) must quote exactly the global
    per-part minimum price, and every STANDARD part with any lineitem
    must be representable (the LIMIT trims, never the plan)."""
    from cpg_ray.pipelines.dss import q2_min_cost_supplier

    out = q2_min_cost_supplier(SF)
    assert len(out) > 0
    truth = con.sql("""
        SELECT l_partkey, min(l_extendedprice) AS m
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_type = 'STANDARD')
        GROUP BY 1
    """).df().set_index("l_partkey")["m"]
    for _, r in out.iterrows():
        assert r.min_cost == truth[r.p_partkey]


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
