"""In-pytest oracle smoke: a representative subset of the query suite
compared against DuckDB at sf0.001 (the full sweep lives in
tools/check_oracles.py; this keeps `pytest` self-sufficient as a
correctness gate)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SMOKE = [
    "q1_pricing_summary",        # pre-combined grouped aggregate
    "q3_shipping_priority",      # broadcast join chain + top-k
    "q_segment_revenue",         # hash-shuffle join
    "q_events_sessions_streaming",  # stateful streaming operator
    "q_events_interval",         # interval join
    "q_knn_cosine",              # similarity
    "q_doc_quality",             # text analysis + identical rounding
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(name, con):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    from tools.check_oracles import compare

    mine = entry.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    ora = con.sql(entry.oracle_sql()[name]).df()
    err = compare(mine, ora)
    assert err is None, f"{name}: {err}"
