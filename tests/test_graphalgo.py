"""Whole-graph algorithms: fixed-point PageRank and min-label
connected components (cpg_ray/functions/graphalgo.py).

The SQL-oracle pairing lives in __ray_entry__ (kg_pagerank /
kg_components, unrolled recursive CTEs); here we pin mode
equivalence, the exactness contracts, and the guard degradation.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cpg_ray.functions.graphalgo import label_components, pagerank
from cpg_ray.functions.relational import GuardExceeded


def _rand_edges(n_nodes=50, n_edges=300, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "src": [f"e{i}" for i in rng.integers(0, n_nodes, n_edges)],
            "dst": [f"e{i}" for i in rng.integers(0, n_nodes, n_edges)],
        }
    )


def test_pagerank_modes_agree():
    edges = _rand_edges()
    ds = rd.from_pandas(edges)
    d = pagerank(ds, iters=5, mode="driver").to_pandas()
    s = pagerank(rd.from_pandas(edges), iters=5, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True)
    )


def test_pagerank_mass_conservation_no_dangling():
    # every node has outdegree >= 1 -> floor truncation is the ONLY
    # mass loss: total stays within n_edges units of the full scale
    edges = pd.DataFrame(
        {"src": ["a", "b", "c", "d"], "dst": ["b", "c", "d", "a"]}
    )
    df = pagerank(rd.from_pandas(edges), iters=20, mode="driver").to_pandas()
    scale = 10**12
    assert scale - len(edges) * 25 <= df["score"].sum() <= scale
    # symmetric ring -> identical scores
    assert df["score"].nunique() == 1


def test_pagerank_sink_attracts_mass():
    # hub exchanges mass with three spokes: it receives three full
    # contributions and returns a third each, so it must outrank them
    edges = pd.DataFrame(
        {
            "src": ["a", "b", "c", "hub", "hub", "hub"],
            "dst": ["hub", "hub", "hub", "a", "b", "c"],
        }
    )
    df = pagerank(rd.from_pandas(edges), iters=10, mode="driver").to_pandas()
    assert df.iloc[0]["entity"] == "hub"


def test_pagerank_auto_degrades_to_shuffle():
    edges = _rand_edges()
    out = pagerank(
        rd.from_pandas(edges), iters=3, mode="auto", driver_edge_limit=10
    ).to_pandas()
    ref = pagerank(rd.from_pandas(edges), iters=3, mode="driver").to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ref.reset_index(drop=True)
    )
    with pytest.raises(GuardExceeded):
        pagerank(
            rd.from_pandas(edges), iters=3, mode="driver",
            driver_edge_limit=10,
        )


def test_components_modes_agree():
    edges = _rand_edges(n_nodes=40, n_edges=60, seed=3)
    d = label_components(
        rd.from_pandas(edges), rounds=8, mode="driver"
    ).to_pandas()
    s = label_components(
        rd.from_pandas(edges), rounds=8, mode="shuffle"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True)
    )


def test_components_converge_matches_unionfind():
    edges = _rand_edges(n_nodes=60, n_edges=55, seed=9)
    df = label_components(
        rd.from_pandas(edges), converge=True, mode="driver"
    ).to_pandas()
    assert bool(df["converged"].all())

    from cpg_ray.state.unionfind import UnionFind

    uf = UnionFind()
    e = edges[edges.src != edges.dst]
    for a, b in zip(e.src, e.dst):
        uf.union(a, b)
    got = df.groupby("component")["entity"].apply(frozenset)
    want = {}
    for n in set(e.src) | set(e.dst):
        want.setdefault(uf.find(n), set()).add(n)
    assert set(got) == {frozenset(v) for v in want.values()} == set(
        frozenset(v) for v in want.values()
    )
    # component label is the lexicographic min of its members
    for comp, members in got.items():
        assert comp == min(members)


def test_components_bounded_rounds_reports_convergence():
    # a 6-chain: diameter 5, so 2 rounds cannot converge; labels are
    # still exactly the 2-round propagation (converged=False says so)
    edges = pd.DataFrame(
        {"src": list("abcde"), "dst": list("bcdef")}
    )
    df = label_components(
        rd.from_pandas(edges), rounds=2, mode="driver"
    ).to_pandas()
    assert not df["converged"].any()
    full = label_components(
        rd.from_pandas(edges), converge=True, mode="driver"
    ).to_pandas()
    assert bool(full["converged"].all())
    assert set(full["component"]) == {"a"}


def test_empty_edges():
    empty = rd.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype=object),
                      "dst": pd.Series(dtype=object)})
    )
    assert pagerank(empty, mode="driver").to_pandas().empty
    assert label_components(empty, mode="driver").to_pandas().empty


def test_self_loops_dropped():
    edges = pd.DataFrame({"src": ["a", "a"], "dst": ["a", "b"]})
    df = pagerank(rd.from_pandas(edges), iters=4, mode="driver").to_pandas()
    assert set(df["entity"]) == {"a", "b"}
    cc = label_components(
        rd.from_pandas(edges), rounds=3, mode="driver"
    ).to_pandas()
    assert set(cc["component"]) == {"a"}
