"""Sketch accuracy + mergeability."""

import numpy as np

from cpg_ray.functions.relational import read_table
from cpg_ray.functions.sketches import HLL, approx_distinct, approx_quantiles

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 50_000, 200_000)
    true = len(np.unique(vals))
    whole = HLL(12).add_batch(vals)
    est = whole.estimate()
    assert abs(est - true) / true < 0.05

    # merge of halves == whole (registers identical)
    a = HLL(12).add_batch(vals[:100_000])
    b = HLL(12).add_batch(vals[100_000:])
    merged = a.merge(b)
    assert (merged.registers == whole.registers).all()

    # serialization round-trip
    rt = HLL.deserialize(whole.serialize())
    assert rt.estimate() == whole.estimate()


def test_approx_distinct_on_dataset():
    ds = read_table(SF, "lineitem", columns=["l_orderkey"])
    import duckdb

    true = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    est = approx_distinct(ds, "l_orderkey", p=12)
    assert abs(est - true) / true < 0.05, (est, true)


def test_approx_quantiles_on_dataset():
    ds = read_table(SF, "lineitem", columns=["l_extendedprice"])
    import duckdb

    got = approx_quantiles(ds, "l_extendedprice", [0.1, 0.5, 0.9])
    for q, g in zip([0.1, 0.5, 0.9], got):
        true = duckdb.sql(
            f"SELECT quantile_cont(l_extendedprice, {q}) "
            f"FROM '{SF}/lineitem.parquet'"
        ).fetchone()[0]
        assert abs(g - true) / true < 0.05, (q, g, true)
