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


# ---- triangle counting -------------------------------------------------


def _brute_triangles(edges: pd.DataFrame) -> pd.DataFrame:
    """Independent oracle: explicit adjacency-set closure over every
    node triple."""
    import itertools

    und, adj = set(), {}
    for s, d in zip(edges["src"], edges["dst"]):
        if s != d:
            und.add((min(s, d), max(s, d)))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cnt: dict[str, int] = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for q in (x, y, z):
                cnt[q] = cnt.get(q, 0) + 1
    return pd.DataFrame({
        "entity": pd.Series(sorted(cnt), dtype=object),
        "triangles": pd.Series([cnt[k] for k in sorted(cnt)],
                               dtype="int64"),
    })


def test_triangles_driver_matches_brute_force():
    from cpg_ray.functions.graphalgo import triangle_count

    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(4, 50))
        m = int(rng.integers(0, n * 4))
        e = pd.DataFrame({
            "src": [f"n{i:03d}" for i in rng.integers(0, n, m)],
            "dst": [f"n{i:03d}" for i in rng.integers(0, n, m)],
        })
        got = triangle_count(
            rd.from_pandas(e), mode="driver"
        ).to_pandas().reset_index(drop=True)
        want = _brute_triangles(e)
        if want.empty:
            assert got.empty, f"trial {trial}"
        else:
            assert got.equals(want), f"trial {trial}"


def test_triangles_modes_agree_and_skew_hub():
    """Shuffle plan (orientation + wedge fan-out + closure join) equals
    the driver kernel — including on a Zipf-style hub graph where an
    unoriented plan would blow up quadratically on the hub."""
    from cpg_ray.functions.graphalgo import triangle_count

    edges = _rand_edges(60, 500, seed=23)
    # hub: one node connected to everyone, plus a ring closing triangles
    hub = pd.DataFrame({
        "src": ["hub"] * 40 + [f"r{i}" for i in range(40)],
        "dst": [f"r{i}" for i in range(40)]
        + [f"r{(i + 1) % 40}" for i in range(40)],
    })
    for e in (edges, hub):
        ds = rd.from_pandas(e)
        a = triangle_count(ds, mode="driver").to_pandas().reset_index(
            drop=True)
        b = triangle_count(ds, mode="shuffle").to_pandas().reset_index(
            drop=True)
        b["triangles"] = b["triangles"].astype("int64")
        assert a.equals(b)
    # the hub graph's closure: every ring edge forms one triangle with
    # the hub → each ring node is in 2 triangles, hub in 40
    got = triangle_count(rd.from_pandas(hub), mode="driver").to_pandas()
    assert int(got.set_index("entity").loc["hub", "triangles"]) == 40
    assert (got.set_index("entity").drop("hub")["triangles"] == 2).all()


def test_triangles_guard_degrades_and_wedge_limit():
    from cpg_ray.functions.graphalgo import triangle_count

    edges = rd.from_pandas(_rand_edges(30, 200, seed=5))
    with pytest.raises(GuardExceeded):
        triangle_count(edges, mode="driver", driver_edge_limit=10)
    auto = triangle_count(
        edges, mode="auto", driver_edge_limit=10
    ).to_pandas().reset_index(drop=True)
    full = triangle_count(edges, mode="driver").to_pandas().reset_index(
        drop=True)
    auto["triangles"] = auto["triangles"].astype("int64")
    assert auto.equals(full)
    with pytest.raises(GuardExceeded):
        triangle_count(edges, mode="driver", wedge_limit=1)


# ---- k-core ------------------------------------------------------------


def _brute_kcore(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    und = set()
    for s, d in zip(edges["src"], edges["dst"]):
        if s != d:
            und.add((min(s, d), max(s, d)))
    alive = {x for e in und for x in e}

    def degs():
        d: dict[str, int] = {}
        for a, b in und:
            if a in alive and b in alive:
                d[a] = d.get(a, 0) + 1
                d[b] = d.get(b, 0) + 1
        return d

    for _ in range(rounds):
        dd = degs()
        alive = {x for x in alive if dd.get(x, 0) >= k}
    dd = degs()
    conv = all(dd.get(x, 0) >= k for x in alive)
    rows = sorted(alive)
    return pd.DataFrame({
        "entity": pd.Series(rows, dtype=object),
        "deg": pd.Series([dd.get(x, 0) for x in rows], dtype="int64"),
        "converged": conv,
    })


def test_kcore_driver_matches_brute_force():
    from cpg_ray.functions.graphalgo import k_core

    rng = np.random.default_rng(3)
    for t in range(8):
        n = int(rng.integers(4, 40))
        m = int(rng.integers(0, n * 3))
        e = pd.DataFrame({
            "src": [f"n{i:03d}" for i in rng.integers(0, n, m)],
            "dst": [f"n{i:03d}" for i in rng.integers(0, n, m)],
        })
        for kk, r in ((2, 1), (2, 8), (3, 3)):
            got = k_core(rd.from_pandas(e), k=kk, rounds=r,
                         mode="driver").to_pandas().reset_index(drop=True)
            want = _brute_kcore(e, kk, r)
            if want.empty:
                assert got.empty
            else:
                assert got.equals(want), f"trial {t} k={kk} r={r}"


def test_kcore_modes_agree_and_guard():
    from cpg_ray.functions.graphalgo import k_core

    e = _rand_edges(50, 300, seed=5)
    ds = rd.from_pandas(e)
    a = k_core(ds, k=3, rounds=4, mode="driver").to_pandas().reset_index(
        drop=True)
    b = k_core(ds, k=3, rounds=4, mode="shuffle").to_pandas().reset_index(
        drop=True)
    b["deg"] = b["deg"].astype("int64")
    assert a.equals(b)
    with pytest.raises(GuardExceeded):
        k_core(ds, mode="driver", driver_edge_limit=10)
    auto = k_core(ds, k=3, rounds=4, mode="auto",
                  driver_edge_limit=10).to_pandas().reset_index(drop=True)
    auto["deg"] = auto["deg"].astype("int64")
    assert auto.equals(a)


def test_co_occurrence_pairs_exact_and_mega_group_skip():
    from itertools import combinations

    from cpg_ray.functions.graphalgo import co_occurrence_pairs

    # exact pairs over small groups, all group sizes 1..4
    rows = []
    for g, items in [("u1", "abcd"), ("u2", "xy"), ("u3", "q"),
                     ("u4", "mnp")]:
        rows += [{"url": g, "e": c} for c in items]
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = co_occurrence_pairs(ds, max_group=100).to_pandas()
    assert (got.skipped_n == 0).all()
    want = sorted(
        p for items in ["abcd", "xy", "mnp"]
        for p in combinations(sorted(items), 2))
    assert sorted(zip(got.a, got.b)) == want

    # a mega group emits ONE summary row (reported skip), zero pairs;
    # the small group beside it is still exact
    rows = [{"url": "mega", "e": f"e{i}"} for i in range(50)]
    rows += [{"url": "ok", "e": c} for c in "ab"]
    got = co_occurrence_pairs(
        rd.from_pandas(pd.DataFrame(rows)), max_group=10).to_pandas()
    summ = got[got.skipped_n > 0]
    assert len(summ) == 1 and summ.iloc[0].a == "mega" \
        and summ.iloc[0].skipped_n == 50
    real = got[got.skipped_n == 0]
    assert list(zip(real.a, real.b)) == [("a", "b")]


# ---- multi-source BFS distances ---------------------------------------------


def _brute_bfs(edges: pd.DataFrame, seeds: list, rounds: int) -> dict:
    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, rounds + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    return dist


def test_bfs_driver_matches_brute_force_and_isolated_seed():
    from cpg_ray.functions.graphalgo import bfs_distances

    for seed in (1, 5, 17):
        edges = _rand_edges(n_nodes=35, n_edges=50, seed=seed)
        seeds = sorted(set(edges.src))[:3] + ["isolated_seed"]
        out = bfs_distances(
            rd.from_pandas(edges),
            rd.from_pandas(pd.DataFrame({"node": seeds})),
            rounds=6, mode="driver",
        ).to_pandas()
        expect = _brute_bfs(edges, seeds, rounds=6)
        got = dict(zip(out.entity, out.dist))
        assert got == expect
        # the seed absent from every edge is still reported at dist 0
        assert got["isolated_seed"] == 0


def test_bfs_modes_agree_and_converged_flag():
    from cpg_ray.functions.graphalgo import bfs_distances

    edges = _rand_edges(n_nodes=40, n_edges=45, seed=11)
    seeds = rd.from_pandas(pd.DataFrame({"node": [sorted(set(edges.src))[0]]}))
    d = bfs_distances(rd.from_pandas(edges), seeds, rounds=5,
                      mode="driver").to_pandas()
    s = bfs_distances(rd.from_pandas(edges), seeds,
                      rounds=5, mode="shuffle").to_pandas()
    s["dist"] = s["dist"].astype(d.dist.dtype)
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    # rounds=0 on a connected frontier must report converged=False
    # whenever one more round reaches something new
    z = bfs_distances(rd.from_pandas(edges), seeds, rounds=0,
                      mode="driver").to_pandas()
    reaches_more = len(d) > len(z)
    assert bool(z.converged.iloc[0]) != reaches_more


# ---- per-edge common neighbors / Jaccard --------------------------------------


def _brute_link_jaccard(edges: pd.DataFrame) -> pd.DataFrame:
    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    seen = set()
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        x, y = key
        common = len(adj[x] & adj[y])
        rows.append({"entity_a": x, "entity_b": y, "common": common,
                     "deg_a": len(adj[x]), "deg_b": len(adj[y]),
                     "jaccard": common / (len(adj[x]) + len(adj[y])
                                          - common)})
    return pd.DataFrame(rows).sort_values(
        ["entity_a", "entity_b"]).reset_index(drop=True)


def test_link_jaccard_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import link_jaccard

    for seed in (2, 9, 23):
        edges = _rand_edges(n_nodes=30, n_edges=70, seed=seed)
        expect = _brute_link_jaccard(edges)
        d = link_jaccard(rd.from_pandas(edges), mode="driver").to_pandas()
        pd.testing.assert_frame_equal(d, expect, check_dtype=False)
        s = link_jaccard(rd.from_pandas(edges), mode="shuffle").to_pandas()
        s = s.reset_index(drop=True)
        for c in ["common", "deg_a", "deg_b"]:
            s[c] = s[c].astype("int64")
        pd.testing.assert_frame_equal(s, expect, check_dtype=False)


def test_personalized_pagerank_modes_agree_and_seeds_dominate():
    edges = _rand_edges()
    seeds = {"e1", "e2", "e3"}
    d = pagerank(rd.from_pandas(edges), iters=6, mode="driver",
                 seeds=seeds).to_pandas()
    s = pagerank(rd.from_pandas(edges), iters=6, mode="shuffle",
                 seeds=seeds).to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True))
    # restart mass concentrates around the seed set: every seed ranks
    # above the median node, and the global top node is a seed
    ranks = {e: i for i, e in enumerate(d.entity)}
    assert d.entity.iloc[0] in seeds
    assert all(ranks[x] < len(d) / 2 for x in seeds)
    # floor truncation only ever RETIRES mass: total stays ≤ scale
    assert d.score.sum() <= 10 ** 12


def test_personalized_pagerank_requires_seed_in_graph():
    edges = _rand_edges()
    with pytest.raises(ValueError, match="seed"):
        pagerank(rd.from_pandas(edges), iters=3, mode="driver",
                 seeds={"not_a_node"})
    with pytest.raises(ValueError, match="seed"):
        pagerank(rd.from_pandas(edges), iters=3, mode="shuffle",
                 seeds={"not_a_node"})


# ---- per-edge Adamic-Adar / resource allocation -----------------------------


def _brute_link_aa(edges: pd.DataFrame) -> pd.DataFrame:
    import math

    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    seen = set()
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        x, y = key
        shared = adj[x] & adj[y]
        rows.append({
            "entity_a": x, "entity_b": y, "common": len(shared),
            "aa_scaled": sum(
                math.floor(1e12 / math.log(len(adj[w]))) for w in shared),
            "ra_scaled": sum(10 ** 12 // len(adj[w]) for w in shared),
        })
    return pd.DataFrame(rows).sort_values(
        ["entity_a", "entity_b"]).reset_index(drop=True)


def test_link_adamic_adar_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import link_adamic_adar

    for seed in (2, 9, 23):
        edges = _rand_edges(n_nodes=30, n_edges=70, seed=seed)
        expect = _brute_link_aa(edges)
        d = link_adamic_adar(
            rd.from_pandas(edges), mode="driver").to_pandas()
        pd.testing.assert_frame_equal(d, expect, check_dtype=False)
        s = link_adamic_adar(
            rd.from_pandas(edges), mode="shuffle").to_pandas()
        s = s.reset_index(drop=True)
        for c in ["common", "aa_scaled", "ra_scaled"]:
            s[c] = s[c].astype("int64")
        pd.testing.assert_frame_equal(s, expect, check_dtype=False)


def test_clustering_coefficient_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import clustering_coefficient

    edges = _rand_edges(n_nodes=30, n_edges=70, seed=5)
    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for v, nb in adj.items():
        t = sum(1 for x in nb for y in nb
                if x < y and y in adj.get(x, ()))
        d = len(nb)
        rows.append({"entity": v, "deg": d, "triangles": t,
                     "cc": (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0})
    expect = pd.DataFrame(rows).sort_values("entity").reset_index(drop=True)
    d = clustering_coefficient(
        rd.from_pandas(edges), mode="driver").to_pandas()
    d = d.reset_index(drop=True)
    for c in ["deg", "triangles"]:
        d[c] = d[c].astype("int64")
    pd.testing.assert_frame_equal(d, expect, check_dtype=False)
    s = clustering_coefficient(
        rd.from_pandas(edges), mode="shuffle").to_pandas()
    s = s.reset_index(drop=True)
    for c in ["deg", "triangles"]:
        s[c] = s[c].astype("int64")
    pd.testing.assert_frame_equal(s, expect, check_dtype=False)


# ---- HITS ---------------------------------------------------------------


def _brute_hits(edges: pd.DataFrame, iters: int, scale: int) -> pd.DataFrame:
    e = {(a, b) for a, b in zip(edges.src, edges.dst) if a != b}
    nodes = sorted({x for ab in e for x in ab})
    h = {v: scale // len(nodes) for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for s, d in e:
            raw[d] += h[s]
        div = max(sum(raw.values()) // scale, 1)
        a = {v: raw[v] // div for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in e:
            raw[s] += a[d]
        div = max(sum(raw.values()) // scale, 1)
        h = {v: raw[v] // div for v in nodes}
    return pd.DataFrame({"entity": nodes,
                         "hub": [h[v] for v in nodes],
                         "auth": [a[v] for v in nodes]})


def test_hits_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import hits

    edges = _rand_edges(n_nodes=25, n_edges=80, seed=7)
    expect = _brute_hits(edges, iters=4, scale=10 ** 12)
    d = hits(rd.from_pandas(edges), iters=4, mode="driver").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), expect, check_dtype=False)
    s = hits(rd.from_pandas(edges), iters=4, mode="shuffle").to_pandas()
    s = s.reset_index(drop=True)
    for c in ["hub", "auth"]:
        s[c] = s[c].astype("int64")
    pd.testing.assert_frame_equal(s, expect, check_dtype=False)
    # a pure source has auth 0; a pure sink has hub 0
    star = pd.DataFrame({"src": ["s", "s", "s"], "dst": ["a", "b", "c"]})
    r = hits(rd.from_pandas(star), iters=3,
             mode="driver").to_pandas().set_index("entity")
    assert r.loc["s", "auth"] == 0
    assert r.loc["a", "hub"] == 0 and r.loc["a", "auth"] > 0
    assert r.loc["s", "hub"] > 0


def test_neighbor_sample_deterministic_capped_and_modes_agree():
    import hashlib

    from cpg_ray.functions.graphalgo import neighbor_sample

    edges = _rand_edges(n_nodes=20, n_edges=120, seed=3)
    got = neighbor_sample(rd.from_pandas(edges), k=3).to_pandas()
    # brute force: per src, smallest-3 by (md5, dst) over distinct edges
    ded = edges[edges.src != edges.dst].drop_duplicates()
    ded = ded.assign(h=[
        hashlib.md5(f"{a}|{b}".encode()).hexdigest()
        for a, b in zip(ded.src, ded.dst)])
    expect = (ded.sort_values(["h", "dst"])
              .groupby("src", sort=False).head(3)[["src", "dst"]]
              .sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect, check_dtype=False)
    assert got.groupby("src").size().max() <= 3
    s = neighbor_sample(rd.from_pandas(edges), k=3,
                        mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        s.reset_index(drop=True), expect, check_dtype=False)


def test_random_walks_deterministic_modes_agree_and_stop_at_sinks():
    import hashlib

    from cpg_ray.functions.graphalgo import random_walks

    edges = _rand_edges(n_nodes=15, n_edges=40, seed=13)
    d = random_walks(rd.from_pandas(edges), walks_per_node=2,
                     length=3, mode="driver").to_pandas()
    s = random_walks(rd.from_pandas(edges), walks_per_node=2,
                     length=3, mode="shuffle").to_pandas()
    for c in ["w", "step"]:
        d[c] = d[c].astype("int64")
        s[c] = s[c].astype("int64")
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    # replay one walk by hand
    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a != b:
            adj.setdefault(a, set()).add(b)
    start = d.start.iloc[0]
    cur, path = start, [start]
    for t in range(3):
        nbrs = sorted(adj.get(cur, ()))
        if not nbrs:
            break
        cur = min(nbrs, key=lambda x: (
            hashlib.md5(f"{start}|0|{t}|{cur}|{x}".encode()).hexdigest(),
            x))
        path.append(cur)
    got = d[(d.start == start) & (d.w == 0)].sort_values("step")
    assert list(got.node) == path
    # a pure-sink graph yields only step-0 rows for the sink
    star = pd.DataFrame({"src": ["s", "s"], "dst": ["a", "b"]})
    r = random_walks(rd.from_pandas(star), walks_per_node=1,
                     length=4, mode="driver").to_pandas()
    assert set(r[r.start == "a"].step) == {0}
    assert r[(r.start == "s")].step.max() == 1  # one hop then sink


def test_triangle_free_graph_empty_sides_survive():
    """Star graphs have no triangles: the AA/clustering shuffle plans
    must survive their legitimately-EMPTY intermediate joins (the Ray
    2.49 empty-side ArrowInvalid defect), and a walk state that drains
    at sinks must not crash the per-step join."""
    from cpg_ray.functions.graphalgo import (
        clustering_coefficient,
        link_adamic_adar,
        random_walks,
    )

    star = pd.DataFrame({"src": ["h"] * 4,
                         "dst": ["a", "b", "c", "d"]})
    for mode in ("driver", "shuffle"):
        aa = link_adamic_adar(rd.from_pandas(star), mode=mode).to_pandas()
        assert len(aa) == 4 and (aa.common == 0).all() \
            and (aa.aa_scaled == 0).all()
        cc = clustering_coefficient(
            rd.from_pandas(star), mode=mode).to_pandas()
        assert (cc.cc == 0.0).all() and len(cc) == 5
        w = random_walks(rd.from_pandas(star), walks_per_node=1,
                         length=5, mode=mode).to_pandas()
        # every walk reaches a sink after ≤1 hop; state drains long
        # before length is exhausted
        assert w.step.max() == 1
        # the peel drains everything: k-core must return EMPTY, not
        # crash on the drained join (the same sparse-partition class)
        from cpg_ray.functions.graphalgo import k_core, label_components
        kc = k_core(rd.from_pandas(star), k=2, mode=mode).to_pandas()
        assert len(kc) == 0
        lc = label_components(rd.from_pandas(star), mode=mode,
                              rounds=4).to_pandas()
        assert len(lc) == 5 and set(lc.component) == {"a"}


def test_pagerank_weighted_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import pagerank_weighted

    rng = np.random.default_rng(19)
    # duplicated edges → real multiplicities
    edges = pd.DataFrame({
        "src": [f"n{i}" for i in rng.integers(0, 12, 200)],
        "dst": [f"n{i}" for i in rng.integers(0, 12, 200)],
    })
    d = pagerank_weighted(rd.from_pandas(edges), iters=5,
                          mode="driver").to_pandas()
    s = pagerank_weighted(rd.from_pandas(edges), iters=5,
                          mode="shuffle").to_pandas()
    s["score"] = s["score"].astype("int64")
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    # brute force replay
    ded = edges[edges.src != edges.dst]
    w = ded.groupby(["src", "dst"]).size()
    nodes = sorted({x for ab in w.index for x in ab})
    wdeg = w.groupby(level=0).sum()
    scale = 10 ** 12
    score = {v: scale // len(nodes) for v in nodes}
    for _ in range(5):
        acc = {v: (scale * 15) // (100 * len(nodes)) for v in nodes}
        for (a, b), ww in w.items():
            acc[b] += (score[a] * 85 * ww) // (100 * wdeg[a])
        score = acc
    expect = (pd.DataFrame({"entity": nodes,
                            "score": [score[v] for v in nodes]})
              .sort_values(["score", "entity"],
                           ascending=[False, True])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(d.reset_index(drop=True), expect,
                                  check_dtype=False)
    # mass only ever shrinks
    assert d.score.sum() <= scale


def test_scc_known_cycles_modes_agree_and_bounded_flag():
    from cpg_ray.functions.graphalgo import scc

    edges = pd.DataFrame({
        # cycle A: a<->b<->c (one SCC), cycle B: x<->y, plus DAG tail
        "src": ["a", "b", "c", "x", "y", "c", "t1"],
        "dst": ["b", "c", "a", "y", "x", "t1", "t2"],
    })
    d = scc(rd.from_pandas(edges), pivots=6, mode="driver").to_pandas()
    s = scc(rd.from_pandas(edges), pivots=6, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    m = d.set_index("entity")
    assert m.loc["a", "scc_id"] == m.loc["b", "scc_id"] \
        == m.loc["c", "scc_id"] == "a"
    assert m.loc["x", "scc_id"] == m.loc["y", "scc_id"] == "x"
    # trim: t1/t2 are singletons (t2 has no out-edge, t1 feeds it)
    assert m.loc["t2", "scc_id"] == "t2" and bool(m.loc["t2", "assigned"])
    assert bool(m.assigned.all())
    # pivots=0: only the trim assigns; cyclic nodes report unassigned
    z = scc(rd.from_pandas(edges), pivots=0,
            mode="driver").to_pandas().set_index("entity")
    assert not bool(z.loc["a", "assigned"])
    assert z.loc["a", "scc_id"] == "a"


def test_cooccur_pmi_matches_hand_computation():
    import math

    from cpg_ray.functions.graphalgo import cooccur_pmi

    men = pd.DataFrame({
        "url": ["u1", "u1", "u1", "u2", "u2", "u3"],
        "e":   ["A",  "B",  "C",  "A",  "B",  "A"],
    })
    df = cooccur_pmi(rd.from_pandas(men)).to_pandas()
    df = df.sort_values(["a", "b"]).reset_index(drop=True)
    # N=3 docs; df(A)=3 df(B)=2 df(C)=1; pairs (A,B)=2 (A,C)=1 (B,C)=1
    assert df[["a", "b"]].values.tolist() == [
        ["A", "B"], ["A", "C"], ["B", "C"]]
    assert df["c_ab"].tolist() == [2, 1, 1]
    assert df["c_a"].tolist() == [3, 3, 2]
    assert df["c_b"].tolist() == [2, 1, 1]
    exp = [math.floor(1e6 * math.log((c_ab * 3) / (ca * cb)))
           for c_ab, ca, cb in [(2, 3, 2), (1, 3, 1), (1, 2, 1)]]
    assert df["pmi_scaled"].tolist() == exp  # [0, 0, 405465]


def test_cooccur_pmi_single_item_groups_emit_nothing():
    from cpg_ray.functions.graphalgo import cooccur_pmi

    men = pd.DataFrame({"url": ["u1", "u2"], "e": ["A", "B"]})
    df = cooccur_pmi(rd.from_pandas(men)).to_pandas()
    assert len(df) == 0


def test_lpa_modes_agree_and_hand_graph():
    from cpg_ray.functions.graphalgo import label_propagation

    edges = _rand_edges(n_nodes=40, n_edges=120, seed=21)
    d = label_propagation(
        rd.from_pandas(edges), rounds=4, mode="driver"
    ).to_pandas()
    s = label_propagation(
        rd.from_pandas(edges), rounds=4, mode="shuffle"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True)
    )

    # hand graph: a triangle {a,b,c} with a pendant d-c; after round 1
    # every triangle node sees two triangle labels and adopts the min
    # neighbor label; the pendant adopts c's label.  Frequency LPA
    # with min tie-break on this graph converges to everyone at 'a'.
    hand = pd.DataFrame({
        "src": ["a", "b", "c", "c"],
        "dst": ["b", "c", "a", "d"],
    })
    out = label_propagation(rd.from_pandas(hand), rounds=4,
                            mode="driver").to_pandas()
    assert set(out["community"]) == {"a"}

    # brute-force differential: synchronous frequency vote, 4 rounds
    und = set()
    for s_, d_ in _rand_edges(25, 80, seed=5)[["src", "dst"]].values:
        if s_ != d_:
            und.add((s_, d_))
            und.add((d_, s_))
    nodes = sorted({x for e in und for x in e})
    lbl = {v: v for v in nodes}
    for _ in range(4):
        nxt = {}
        for v in nodes:
            votes = {}
            for (x, y) in und:
                if y == v:
                    votes[lbl[x]] = votes.get(lbl[x], 0) + 1
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        lbl = nxt
    exp = pd.DataFrame(sorted(lbl.items()), columns=["entity", "community"])
    got = label_propagation(
        rd.from_pandas(_rand_edges(25, 80, seed=5)), rounds=4,
        mode="driver").to_pandas()
    pd.testing.assert_frame_equal(got, exp)


def test_transe_matches_hand_md5_and_triangle_inequality_zero():
    import hashlib

    from cpg_ray.functions.graphalgo import transe_scores

    tri = pd.DataFrame({
        "subj": ["alice", "bob", "alice"],
        "pred": ["works_for", "works_for", "born_in"],
        "obj": ["acme", "acme", "paris"],
    })
    got = transe_scores(rd.from_pandas(tri)).to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)

    def emb(x):
        return np.array([
            int(hashlib.md5(f"{x}|{i}".encode()).hexdigest()[:8], 16)
            % 2001 - 1000 for i in range(4)], dtype=np.int64)

    rows = []
    for s, p, o in tri.drop_duplicates().values:
        rows.append((s, p, o,
                     int(np.abs(emb(s) + emb(p) - emb(o)).sum())))
    exp = (pd.DataFrame(rows, columns=["subj", "pred", "obj",
                                       "transe_score"])
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    # identity fit: h + r - t == 0 when r's embedding equals t - h;
    # can't happen with md5 seams, but duplicate triples must dedup
    dup = pd.concat([tri, tri], ignore_index=True)
    got2 = transe_scores(rd.from_pandas(dup)).to_pandas()
    assert len(got2) == 3


def test_sssp_modes_agree_matches_dijkstra_and_bfs_degenerate():
    import heapq

    from cpg_ray.functions.graphalgo import bfs_distances, sssp

    rng = np.random.default_rng(17)
    e = _rand_edges(n_nodes=30, n_edges=90, seed=13)
    e["w"] = rng.integers(1, 10, len(e))
    seeds = pd.DataFrame({"node": ["e1", "e7"]})

    d = sssp(rd.from_pandas(e), rd.from_pandas(seeds), rounds=10,
             mode="driver").to_pandas()
    s = sssp(rd.from_pandas(e), rd.from_pandas(seeds), rounds=10,
             mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True))

    # Dijkstra ground truth over the same undirected min-weight view
    adj = {}
    for s_, d_, w_ in e[["src", "dst", "w"]].values:
        if s_ == d_:
            continue
        w_ = int(w_)
        for a, b in ((s_, d_), (d_, s_)):
            cur = adj.setdefault(a, {})
            cur[b] = min(cur.get(b, 1 << 30), w_)
    dist = {n: 0 for n in seeds["node"]}
    pq = [(0, n) for n in seeds["node"]]
    heapq.heapify(pq)
    while pq:
        dd, v = heapq.heappop(pq)
        if dd > dist.get(v, 1 << 30):
            continue
        for u, w_ in adj.get(v, {}).items():
            nd = dd + w_
            if nd < dist.get(u, 1 << 30):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    if bool(d["converged"].all()):
        exp = pd.DataFrame(sorted(dist.items()),
                           columns=["entity", "dist"])
        exp["dist"] = exp["dist"].astype("int64")
        pd.testing.assert_frame_equal(d[["entity", "dist"]], exp)

    # unit weights degenerate to BFS distances
    e1 = e.assign(w=1)
    got = sssp(rd.from_pandas(e1), rd.from_pandas(seeds), rounds=12,
               mode="driver").to_pandas()
    bfs = bfs_distances(rd.from_pandas(e1), rd.from_pandas(seeds),
                        rounds=12, mode="driver").to_pandas()
    pd.testing.assert_frame_equal(got[["entity", "dist"]],
                                  bfs[["entity", "dist"]])


def test_node2vec_walks_bias_replay_and_uniform_first_hop():
    """Replay the second-order bias rule by hand: the md5 draw scaled
    by p_inv (return) / 1 (prev-neighbor) / q_inv (explore), argmin
    with dst tie-break; step 0 must equal the UNBIASED first hop (the
    common q_inv factor cancels)."""
    import hashlib

    from cpg_ray.functions.graphalgo import node2vec_walks, random_walks

    edges = _rand_edges(n_nodes=12, n_edges=36, seed=7)
    got = node2vec_walks(rd.from_pandas(edges), walks_per_node=2,
                         length=3, p_inv=4, q_inv=2).to_pandas()
    for c in ["w", "step"]:
        got[c] = got[c].astype("int64")

    adj: dict = {}
    for a, b in zip(edges.src, edges.dst):
        if a != b:
            adj.setdefault(a, set()).add(b)

    def draw(start, w, t, cur, dst):
        return int(hashlib.md5(
            f"{start}|{w}|{t}|{cur}|{dst}".encode()).hexdigest()[:15], 16)

    rows = []
    for start in sorted(set(edges.src) | set(edges.dst)):
        for w in range(2):
            prev, cur = None, start
            rows.append((start, w, 0, cur))
            for t in range(3):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                def key(x):
                    if prev is None:
                        bias = 2            # common factor, cancels
                    elif x == prev:
                        bias = 4
                    elif x in adj.get(prev, ()):
                        bias = 1
                    else:
                        bias = 2
                    return (draw(start, w, t, cur, x) * bias, x)
                prev, cur = cur, min(nbrs, key=key)
                rows.append((start, w, t + 1, cur))
    expect = pd.DataFrame(rows, columns=["start", "w", "step", "node"])
    expect = expect.sort_values(["start", "w", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), expect)

    # p_inv = q_inv = 1 degenerates to the unbiased first-order walk
    flat = node2vec_walks(rd.from_pandas(edges), walks_per_node=2,
                          length=3, p_inv=1, q_inv=1).to_pandas()
    base = random_walks(rd.from_pandas(edges), walks_per_node=2,
                        length=3, mode="driver").to_pandas()
    for c in ["w", "step"]:
        flat[c] = flat[c].astype("int64")
        base[c] = base[c].astype("int64")
    pd.testing.assert_frame_equal(flat.reset_index(drop=True),
                                  base.reset_index(drop=True))

    # sink drain: the two-edge path a->b->c stops at c; with a huge
    # return penalty the b step still must go to c (only candidate)
    path = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    r = node2vec_walks(rd.from_pandas(path), walks_per_node=1,
                       length=5, p_inv=10, q_inv=1).to_pandas()
    assert list(r[r.start == "a"].sort_values("step").node) == \
        ["a", "b", "c"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        node2vec_walks(rd.from_pandas(path), p_inv=0)
    with _pytest.raises(ValueError):
        node2vec_walks(rd.from_pandas(path), mode="driver")


def test_ktruss_hand_graph_cascade_and_modes_agree():
    """4-truss of K5 with a pendant triangle: K5 survives (every edge
    has support 3 inside), the triangle peels in round 1 (support 1 <
    2), and the bridge edge cascades out once its triangle dies.
    Driver and shuffle paths must agree row-for-row."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import k_truss

    k5 = [(a, b) for a in "ABCDE" for b in "ABCDE" if a < b]
    # pendant triangle X-Y-Z hanging off A via A-X (A-X closes no
    # triangle at all; X-Y-Z has support 1 per edge)
    extra = [("A", "X"), ("X", "Y"), ("X", "Z"), ("Y", "Z")]
    edges = pd.DataFrame(k5 + extra, columns=["src", "dst"])
    # shuffle arrival order and duplicate/reverse some edges
    noisy = pd.concat([edges, edges.iloc[:4].rename(
        columns={"src": "dst", "dst": "src"})]).sample(
        frac=1.0, random_state=3)
    ds = rd.from_pandas(noisy.reset_index(drop=True))

    out_d = k_truss(ds, k=4, rounds=4, mode="driver").to_pandas()
    out_s = (k_truss(ds, k=4, rounds=4, mode="shuffle").to_pandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out_d, out_s)

    assert set(zip(out_d.a, out_d.b)) == set(k5)
    assert (out_d.sup == 3).all()          # K5: every edge in 3 triangles
    assert bool(out_d.converged.iloc[0])


def test_ktruss_bounded_rounds_reports_unconverged():
    """A peel chain longer than `rounds` must surface converged=False,
    never a silently-wrong 'exact' truss."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import k_truss

    # chain of triangles sharing edges: peeling the tail triangle
    # lowers the next edge's support, one round per link
    tri_chain = [("n0", "n1"), ("n0", "n2"), ("n1", "n2"),
                 ("n1", "n3"), ("n2", "n3"),
                 ("n2", "n4"), ("n3", "n4"),
                 ("n3", "n5"), ("n4", "n5")]
    ds = rd.from_pandas(pd.DataFrame(tri_chain, columns=["src", "dst"]))
    full = k_truss(ds, k=4, rounds=8, mode="driver").to_pandas()
    assert full.empty or bool(full.converged.iloc[0])
    short = k_truss(ds, k=4, rounds=1, mode="driver").to_pandas()
    if not short.empty:
        assert not bool(short.converged.iloc[0])


def test_harmonic_hand_path_and_modes_agree():
    """Path a-b-c-d at max_hops=3: H(a) = scale(1/1 + 1/2 + 1/3) =
    6e6 + 3e6 + 2e6; H(b) = 2·6e6 + 3e6.  Driver and shuffle paths
    must agree row-for-row."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import harmonic_centrality

    edges = pd.DataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "a")],  # dup reverse
        columns=["src", "dst"])
    ds = rd.from_pandas(edges)
    out = (harmonic_centrality(ds, max_hops=3, mode="driver").to_pandas()
           .set_index("entity")["harmonic"])
    assert out["a"] == 6_000_000 + 3_000_000 + 2_000_000
    assert out["b"] == 2 * 6_000_000 + 3_000_000
    assert out["c"] == out["b"] and out["d"] == out["a"]

    out_s = (harmonic_centrality(ds, max_hops=3, mode="shuffle")
             .to_pandas().sort_values("entity").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.reset_index().sort_values("entity").reset_index(drop=True),
        out_s)


def test_harmonic_hop_bound_excludes_far_nodes():
    """max_hops=1 must credit direct neighbors only."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import harmonic_centrality

    ds = rd.from_pandas(pd.DataFrame(
        [("a", "b"), ("b", "c")], columns=["src", "dst"]))
    out = (harmonic_centrality(ds, max_hops=1, mode="driver").to_pandas()
           .set_index("entity")["harmonic"])
    assert out["a"] == 1_000_000 and out["b"] == 2_000_000


def test_mixing_modes_agree_and_hand_values():
    """Driver fast path and shuffle plan must produce identical
    integer sums; reciprocity/assortativity pinned on a hand graph
    (one mutual pair + one one-way edge)."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import graph_mixing_stats

    edges = pd.DataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], columns=["src", "dst"])
    ds = rd.from_pandas(edges)
    d = graph_mixing_stats(ds, mode="driver")
    s = graph_mixing_stats(rd.from_pandas(edges), mode="shuffle")
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    assert int(d.m_dir.iloc[0]) == 3
    assert int(d.n_recip.iloc[0]) == 2     # a->b and b->a
    assert int(d.m_und.iloc[0]) == 2       # {a,b}, {b,c}
    assert float(d.reciprocity.iloc[0]) == 2.0 / 3.0


def test_chunked_expansions_match_single_chunk(monkeypatch):
    """The skew-bounded chunked paths (wedge expansion in the k-truss
    support count; bitset-BFS gather in harmonic) produce identical
    results when the chunk budgets force many tiny chunks — the
    budgets bound PEAK MEMORY only, never the answer.  Hub-heavy
    fixture so deg² fan-out spans chunks."""
    import cpg_ray.functions.graphalgo as ga

    rng = np.random.default_rng(7)
    # star hub + random clutter → wedge counts dominated by one node
    hub = pd.DataFrame({"src": "hub",
                        "dst": [f"n{i}" for i in range(40)]})
    rnd = pd.DataFrame({
        "src": [f"n{i}" for i in rng.integers(0, 40, 120)],
        "dst": [f"n{i}" for i in rng.integers(0, 40, 120)],
    })
    edges = pd.concat([hub, rnd], ignore_index=True)
    edges = edges[edges.src != edges.dst]
    ds = rd.from_pandas(edges)

    big_t = ga.k_truss(ds, k=3, mode="driver").to_pandas()
    big_h = ga.harmonic_centrality(ds, max_hops=3,
                                   mode="driver").to_pandas()
    monkeypatch.setattr(ga, "_WEDGE_CHUNK", 7)
    monkeypatch.setattr(ga, "_BITSET_GATHER_BYTES", 64)  # few words
    small_t = ga.k_truss(ds, k=3, mode="driver").to_pandas()
    small_h = ga.harmonic_centrality(ds, max_hops=3,
                                     mode="driver").to_pandas()
    pd.testing.assert_frame_equal(big_t, small_t)
    pd.testing.assert_frame_equal(big_h, small_h)


def test_modularity_brute_force():
    """modularity == the textbook Q computed by brute force on a small
    labelled graph, q_scaled/(4m^2) identity included; label_of is a
    plain dict map."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import modularity

    # two triangles bridged by one edge + a duplicate/reversed edge +
    # a self-loop (both must be ignored)
    e = pd.DataFrame({
        "src": ["a", "b", "c", "x", "y", "z", "c", "b", "a"],
        "dst": ["b", "c", "a", "y", "z", "x", "x", "a", "a"],
    })
    lab = {"a": "L", "b": "L", "c": "L", "x": "R", "y": "R", "z": "R"}
    got = modularity(rd.from_pandas(e), src="src", dst="dst",
                     label_of=lambda s: s.map(lab))
    m = 7  # 3 + 3 + bridge
    assert (got.m_edges == m).all()
    row = got.set_index("cls")
    assert row.loc["L", "intra_edges"] == 3
    assert row.loc["R", "intra_edges"] == 3
    assert row.loc["L", "degree_sum"] == 7  # 6 + bridge endpoint c
    assert row.loc["R", "degree_sum"] == 7
    assert row.loc["L", "n_nodes"] == 3
    # Q = sum(4mL - D^2)/(4m^2) must equal the textbook value
    q = got.q_scaled.sum() / (4 * m * m)
    want = sum((3 / m) - (7 / (2 * m)) ** 2 for _ in range(2))
    assert abs(q - want) < 1e-12


def test_betweenness_brute_force_and_sampling():
    """Exact Brandes == O(n^3) shortest-path enumeration on a random
    graph (bridge structure included); md5 source sampling is
    deterministic and exact when the sample covers all sources."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import betweenness

    # two cliques joined by a bridge: the bridge endpoints dominate
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("c", "x"), ("c", "c"), ("b", "a")]  # self-loop + dup
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = betweenness(ds, mode="driver").set_index("entity")

    # brute force: BFS per source, count shortest paths per pair
    nodes = sorted({v for e in edges for v in e})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)

    def paths(s):
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nq.append(w)
                        order.append(w)
            q = nq
        for u in order:
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[u]
        return dist, sigma

    info = {s: paths(s) for s in nodes}
    want = dict.fromkeys(nodes, 0.0)
    for s, t in itertools.combinations(nodes, 2):
        dist_s, sig_s = info[s]
        if t not in dist_s:
            continue
        dist_t, sig_t = info[t]
        for v in nodes:
            if v in (s, t) or v not in dist_s or v not in dist_t:
                continue
            if dist_s[v] + dist_t[v] == dist_s[t]:
                want[v] += sig_s[v] * sig_t[v] / sig_s[t]
    for v in nodes:
        assert abs(got.loc[v, "betweenness"] - want[v]) < 1e-6, v
    # c and x sit on every cross-clique path
    assert got.loc["c", "betweenness"] == got.loc["x", "betweenness"]
    assert got.loc["c", "betweenness"] > got.loc["a", "betweenness"]

    # a sample covering all sources == exact; smaller is deterministic
    full = betweenness(ds, sample_sources=7)
    pd.testing.assert_frame_equal(
        full, betweenness(ds, mode="driver"))
    s1 = betweenness(ds, sample_sources=3)
    s2 = betweenness(ds, sample_sources=3)
    pd.testing.assert_frame_equal(s1, s2)
    assert (s1.n_sources == 3).all()


def test_kge_eval_filtered_rank_against_brute_force():
    """Brute-force recomputation on a fixture big enough that the md5
    5% sample catches some triples: ranks, filtered setting (other
    true tails excluded) and the (score, entity) tie-break must all
    match the distributed kernel."""
    import hashlib

    from cpg_ray.functions.graphalgo import kge_eval

    rows = [(f"h{i % 23}", f"p{i % 3}", f"t{(i * 7) % 31}")
            for i in range(400)]
    tri = pd.DataFrame(rows, columns=["subj", "pred", "obj"]
                       ).drop_duplicates()
    got = kge_eval(rd.from_pandas(tri), sample_pct=40)

    def emb(k, dims=4):
        return np.array([
            int(hashlib.md5(f"{k}|{i}".encode()).hexdigest()[:8], 16)
            % 2001 - 1000 for i in range(dims)], dtype=np.int64)

    facts = set(map(tuple, tri.to_numpy()))
    pools = {p: sorted(g["obj"].unique())
             for p, g in tri.groupby("pred")}
    exp: dict = {}
    for s, p, o in sorted(facts):
        h = int(hashlib.md5(f"{s}|{p}|{o}".encode()).hexdigest()[:8],
                16) % 100
        if h >= 40:
            continue
        st = int(np.abs(emb(s) + emb(p) - emb(o)).sum())
        rank = 1
        for e in pools[p]:
            if e == o or (s, p, e) in facts:
                continue
            se = int(np.abs(emb(s) + emb(p) - emb(e)).sum())
            if se < st or (se == st and e < o):
                rank += 1
        d = exp.setdefault(p, [0, 0, 0, 0])
        d[0] += 1
        d[1] += rank
        d[2] += rank <= 1
        d[3] += rank <= 10
    assert len(got)
    for t in got.itertuples():
        assert exp[t.pred] == [t.n_test, t.sum_rank, t.hits1,
                               t.hits10], t.pred
    assert set(got["pred"]) == set(exp)


def _greedy_mis(edges, pri_of):
    """Sequential greedy MIS in decreasing-priority order — the
    fixed-priority Luby limit."""
    nodes = sorted({v for e in edges for v in e})
    nbrs = {v: set() for v in nodes}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    chosen: set = set()
    for v in sorted(nodes, key=lambda x: -pri_of(x)):
        if not (nbrs[v] & chosen):
            chosen.add(v)
    return chosen


def test_mis_converged_equals_greedy_and_is_maximal_independent():
    import hashlib

    from cpg_ray.functions.graphalgo import maximal_independent_set

    edges = [(f"n{i}", f"n{(i * 5 + 1) % 40}") for i in range(80)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = maximal_independent_set(ds, rounds=12).to_pandas()
    assert got["converged"].all()

    def pri(k):
        return int(hashlib.md5(k.encode()).hexdigest()[:15], 16)

    want = _greedy_mis(edges, pri)
    inset = set(got.loc[got["status"] == "in", "entity"])
    assert inset == want
    # independence + maximality
    nbr = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    assert not any((a, b) in nbr for a in inset for b in inset
                   if a != b)
    for v in got.loc[got["status"] == "out", "entity"]:
        assert any((v, u) in nbr for u in inset)


def test_mis_bounded_rounds_reports_undecided_and_modes_agree():
    from cpg_ray.functions.graphalgo import maximal_independent_set

    # a long path needs several rounds; with these labels round 1
    # provably leaves p018/p031/p032/p036 undecided (no local-max
    # neighbor under the md5 priorities)
    edges = [(f"p{i:03d}", f"p{i + 1:03d}") for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    one = maximal_independent_set(ds, rounds=1).to_pandas()
    assert (one["status"] == "undecided").any()
    assert not one["converged"].any()
    a = maximal_independent_set(ds, rounds=3).to_pandas()
    b = maximal_independent_set(ds, rounds=3,
                                mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)


# ---- Katz centrality --------------------------------------------------------


def test_katz_modes_agree():
    from cpg_ray.functions.graphalgo import katz_centrality

    edges = _rand_edges(seed=23)
    d = katz_centrality(rd.from_pandas(edges), iters=4,
                        mode="driver").to_pandas()
    s = katz_centrality(rd.from_pandas(edges), iters=4,
                        mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True))


def test_katz_matches_bruteforce():
    from cpg_ray.functions.graphalgo import katz_centrality

    edges = _rand_edges(n_nodes=12, n_edges=40, seed=5)
    got = katz_centrality(rd.from_pandas(edges), iters=3,
                          mode="driver").to_pandas()
    e = edges[edges.src != edges.dst].drop_duplicates()
    nodes = sorted(set(e.src) | set(e.dst))
    x = {n: 10**6 for n in nodes}
    for _ in range(3):
        nxt = {n: 10**6 for n in nodes}
        for s_, d_ in zip(e.src, e.dst):
            nxt[d_] += x[s_] * 5 // 100
        x = nxt
    want = (pd.DataFrame({"entity": nodes,
                          "score": [x[n] for n in nodes]})
            .astype({"score": "int64"})
            .sort_values(["score", "entity"], ascending=[False, True])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_katz_no_degree_normalization_hub_prestige():
    from cpg_ray.functions.graphalgo import katz_centrality

    # three endorsers point at 'hub'; hub endorses one spoke — with no
    # out-degree split the hub's in-mass is 3× a spoke's
    edges = pd.DataFrame({"src": ["a", "b", "c", "hub"],
                          "dst": ["hub", "hub", "hub", "a"]})
    df = katz_centrality(rd.from_pandas(edges), iters=4,
                         mode="driver").to_pandas()
    sc = dict(zip(df.entity, df.score))
    assert sc["hub"] > sc["a"] > sc["b"] == sc["c"]


def test_katz_overflow_guard():
    from cpg_ray.functions.graphalgo import katz_centrality

    edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "a"]})
    with pytest.raises(GuardExceeded):
        katz_centrality(rd.from_pandas(edges), iters=8, base=10**15,
                        alpha_num=99, alpha_den=1, mode="driver")


def test_katz_empty_graph():
    from cpg_ray.functions.graphalgo import katz_centrality

    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object)})
    assert katz_centrality(rd.from_pandas(empty),
                           mode="driver").to_pandas().empty


# ---- Weisfeiler-Lehman refinement -------------------------------------------


def test_wl_modes_agree():
    from cpg_ray.functions.graphalgo import wl_refinement

    edges = _rand_edges(n_nodes=20, n_edges=60, seed=31)
    d = wl_refinement(rd.from_pandas(edges), rounds=2,
                      mode="driver").to_pandas()
    s = wl_refinement(rd.from_pandas(edges), rounds=2,
                      mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True))


def test_wl_orbit_symmetry_and_separation():
    from cpg_ray.functions.graphalgo import wl_refinement

    # star: all leaves are in one orbit, the hub in another; a path's
    # middle differs from its ends after one round
    edges = pd.DataFrame({
        "src": ["hub", "hub", "hub", "p1", "p2"],
        "dst": ["l1", "l2", "l3", "p2", "p3"]})
    df = wl_refinement(rd.from_pandas(edges), rounds=2,
                       mode="driver").to_pandas()
    c = dict(zip(df.entity, df.wl_color))
    assert c["l1"] == c["l2"] == c["l3"] != c["hub"]
    assert c["p1"] == c["p3"] != c["p2"]
    # degree-1 leaves of the star vs path ends: distinguished by
    # round 2 (their neighbors' colors differ)
    assert c["l1"] != c["p1"]


def test_wl_partition_refines_monotonically():
    from cpg_ray.functions.graphalgo import wl_refinement

    edges = _rand_edges(n_nodes=25, n_edges=80, seed=13)
    prev = None
    for r in range(4):
        df = wl_refinement(rd.from_pandas(edges), rounds=r,
                           mode="driver").to_pandas()
        ncls = df.wl_color.nunique()
        if prev is not None:
            assert ncls >= prev  # colors split, never merge
        prev = ncls


def test_wl_empty_graph():
    from cpg_ray.functions.graphalgo import wl_refinement

    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object)})
    assert wl_refinement(rd.from_pandas(empty),
                         mode="driver").to_pandas().empty


# ---- rich-club and reciprocity census ---------------------------------------


def test_rich_club_modes_agree_and_brute_force():
    from cpg_ray.functions.graphalgo import rich_club

    edges = _rand_edges(n_nodes=18, n_edges=70, seed=47)
    d = rich_club(rd.from_pandas(edges), max_k=8,
                  mode="driver").to_pandas()
    s = rich_club(rd.from_pandas(edges), max_k=8,
                  mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True))

    # brute force over the undirected simple graph
    e = edges[edges.src != edges.dst]
    und = set()
    for a, b in zip(e.src, e.dst):
        und.add((min(a, b), max(a, b)))
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, row in d.iterrows():
        k = row["k"]
        nodes = {v for v, dd in deg.items() if dd > k}
        edges_k = [1 for a, b in und if a in nodes and b in nodes]
        assert row["n_nodes"] == len(nodes)
        assert row["n_edges"] == len(edges_k)
        denom = len(nodes) * (len(nodes) - 1)
        want = (2 * len(edges_k) * 1_000_000) // denom if denom else 0
        assert row["phi_ppm"] == want


def test_rich_club_clique_is_saturated():
    from cpg_ray.functions.graphalgo import rich_club

    # K5: every node has degree 4, so phi(k)=1e6 for k<4, empty after
    nodes = [f"n{i}" for i in range(5)]
    pairs = [(a, b) for a in nodes for b in nodes if a < b]
    edges = pd.DataFrame(pairs, columns=["src", "dst"])
    df = rich_club(rd.from_pandas(edges), max_k=5,
                   mode="driver").to_pandas()
    by_k = df.set_index("k")
    for k in range(4):
        assert by_k.loc[k, "phi_ppm"] == 1_000_000
        assert by_k.loc[k, "n_nodes"] == 5
    assert by_k.loc[4, "n_nodes"] == 0 and by_k.loc[4, "phi_ppm"] == 0


def test_rich_club_empty():
    from cpg_ray.functions.graphalgo import rich_club

    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object)})
    df = rich_club(rd.from_pandas(empty), max_k=3,
                   mode="driver").to_pandas()
    assert list(df.k) == [0, 1, 2, 3]
    assert (df.n_nodes == 0).all() and (df.phi_ppm == 0).all()


def test_reciprocity_grouped_and_global():
    from cpg_ray.functions.graphalgo import reciprocity

    e = pd.DataFrame({
        "src": ["a", "b", "a", "c", "c", "d", "a", "x"],
        "dst": ["b", "a", "c", "a", "d", "c", "a", "y"],
        "pred": ["p", "p", "p", "q", "q", "q", "p", "q"],
    })
    # per-pred: p has (a,b),(b,a),(a,c) -> 2/3 reciprocal; the (a,a)
    # self-loop is dropped.  q has (c,a),(c,d),(d,c),(x,y) -> 2/4.
    got = reciprocity(rd.from_pandas(e), by="pred")
    by = got.set_index("grp")
    assert by.loc["p", "n_pairs"] == 3 and by.loc["p", "n_recip"] == 2
    assert by.loc["p", "recip_ppm"] == 2_000_000 // 3
    assert by.loc["q", "n_pairs"] == 4 and by.loc["q", "n_recip"] == 2
    assert by.loc["q", "recip_ppm"] == 500_000

    # global (no class): (a,c)+(c,a) now reciprocate ACROSS preds
    g = reciprocity(rd.from_pandas(e))
    assert list(g.grp) == ["__all__"]
    assert g.n_pairs[0] == 7 and g.n_recip[0] == 6


def test_reciprocity_duplicate_rows_counted_once():
    from cpg_ray.functions.graphalgo import reciprocity

    e = pd.DataFrame({"src": ["a", "a", "b"], "dst": ["b", "b", "a"],
                      "pred": ["p", "p", "p"]})
    got = reciprocity(rd.from_pandas(e), by="pred")
    assert got.n_pairs[0] == 2 and got.n_recip[0] == 2
    assert got.recip_ppm[0] == 1_000_000


def test_eccentricity_modes_agree_and_match_bruteforce():
    """Driver and shuffle eccentricity must agree exactly and match a
    per-source brute-force BFS, including disconnected components
    (n_reached < n) and the converged flag under a tight hop bound."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import eccentricity

    rng = np.random.RandomState(13)
    # two components: a 40-node random graph + a 12-node path (the
    # path forces large ecc, exercising the hop bound)
    edges = set()
    for _ in range(90):
        a, b = rng.randint(0, 40, 2)
        if a != b:
            edges.add((f"n{a:02d}", f"n{b:02d}"))
    for i in range(11):
        edges.add((f"p{i:02d}", f"p{i + 1:02d}"))
    df = pd.DataFrame(sorted(edges), columns=["src", "dst"])
    ds = rd.from_pandas(df).repartition(5)

    for rounds in (4, 12):
        got_d = eccentricity(ds, n_sources=10, rounds=rounds,
                             mode="driver")
        got_s = eccentricity(ds, n_sources=10, rounds=rounds,
                             mode="shuffle")
        pd.testing.assert_frame_equal(got_d.reset_index(drop=True),
                                      got_s.reset_index(drop=True))

        # brute force: bounded BFS from the same md5 sample
        import hashlib
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nodes = sorted(adj)
        srcs = sorted(nodes,
                      key=lambda v: (hashlib.md5(v.encode()).hexdigest(),
                                     v))[:10]
        rows = []
        for s in sorted(srcs):
            dist = {s: 0}
            frontier = {s}
            for h in range(1, rounds + 1):
                frontier = {v for f in frontier for v in adj[f]
                            if v not in dist}
                for v in frontier:
                    dist[v] = h
            probe = {v for f in frontier for v in adj[f]
                     if v not in dist}
            rows.append((s, max(dist.values()), len(dist),
                         not probe))
        truth = pd.DataFrame(rows, columns=["source", "ecc",
                                            "n_reached", "converged"])
        truth["ecc"] = truth["ecc"].astype("int64")
        truth["n_reached"] = truth["n_reached"].astype("int64")
        pd.testing.assert_frame_equal(got_d.reset_index(drop=True),
                                      truth)


def _dag(pairs):
    return rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_transitive_reduction_diamond_and_three_hop():
    from cpg_ray.functions.graphalgo import dag_transitive_reduction

    # a->c redundant via a->b->c; a->d redundant via the 3-hop chain
    out = dag_transitive_reduction(_dag([
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("a", "d"),
    ]), max_len=3)
    assert list(map(tuple, out.to_numpy())) == [
        ("a", "b"), ("b", "c"), ("c", "d")]


def test_transitive_reduction_keeps_unshortcut_edges():
    from cpg_ray.functions.graphalgo import dag_transitive_reduction

    # no alternative paths anywhere: reduction == input
    pairs = [("a", "b"), ("c", "d"), ("e", "f")]
    out = dag_transitive_reduction(_dag(pairs), max_len=3)
    assert list(map(tuple, out.to_numpy())) == sorted(pairs)


def test_transitive_reduction_empty():
    from cpg_ray.functions.graphalgo import dag_transitive_reduction

    out = dag_transitive_reduction(_dag([]), max_len=3)
    assert out.empty and list(out.columns) == ["src", "dst"]


def _kruskal_max(pairs):
    """Brute-force maximum spanning forest under (w DESC, a, b)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    agg = {}
    for a, b, w in pairs:
        a, b = min(a, b), max(a, b)
        if a != b:
            agg[(a, b)] = agg.get((a, b), 0) + w
    chosen = []
    for (a, b), w in sorted(agg.items(),
                            key=lambda kv: (-kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            chosen.append((a, b, w))
    return sorted(chosen)


def test_boruvka_msf_matches_kruskal_and_is_a_forest():
    from cpg_ray.functions.graphalgo import boruvka_msf

    pairs = [(f"n{i % 13}", f"n{(i * 5 + 2) % 13}", (i * 7) % 11 + 1)
             for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame(pairs,
                                     columns=["src", "dst", "w"]))
    out = boruvka_msf(ds, weight="w", rounds=6, jumps=8)
    assert out["converged"].all()
    got = sorted(zip(out["src"], out["dst"], out["weight"]))
    assert got == _kruskal_max(pairs)
    # forest shape: |E| = |V| - #components
    nodes = set(out["src"]) | set(out["dst"])
    comp = {n: n for n in nodes}

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for a, b, _ in got:
        ra, rb = find(a), find(b)
        assert ra != rb, "cycle in forest"
        comp[rb] = ra


def test_boruvka_msf_sums_orientations_and_handles_empty():
    from cpg_ray.functions.graphalgo import boruvka_msf

    # opposite orientations of the same unordered pair sum weights
    ds = rd.from_pandas(pd.DataFrame(
        [("a", "b", 2), ("b", "a", 3), ("b", "c", 4)],
        columns=["src", "dst", "w"]))
    out = boruvka_msf(ds, weight="w", rounds=3, jumps=4)
    assert list(zip(out["src"], out["dst"], out["weight"])) == [
        ("a", "b", 5), ("b", "c", 4)]
    assert out["converged"].all()

    empty = boruvka_msf(rd.from_pandas(pd.DataFrame(
        {"src": ["x"], "dst": ["x"], "w": [1]})), weight="w")
    assert empty.empty
    assert list(empty.columns) == ["src", "dst", "weight",
                                   "round_added", "converged"]


def test_anf_monotone_and_tracks_exact_reachability():
    from cpg_ray.functions.graphalgo import anf_neighborhood

    # path a-b-c-d-e plus isolated pair x-y
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("x", "y")]
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    out = anf_neighborhood(ds, hops=4, m=16)
    assert list(out["hop"]) == [1, 2, 3, 4]
    # N(h) is monotone non-decreasing by construction (max-merge)
    assert (out["nf_est"].diff().dropna() >= 0).all()
    # exact N(h) for this graph: h=1:17, h=2:23, h=3:27, h=4:29
    # (incl. self); HLL at m=16 over <=5 distinct values is coarse,
    # but must stay within a generous band and saturate at h>=4
    # saturation: hop 4 covers each component fully, so hop 5 of a
    # wider run would equal it; registers stop changing
    out5 = anf_neighborhood(ds, hops=5, m=16)
    assert out5["nf_est"].iloc[4] == out5["nf_est"].iloc[3]
    # the zero-register signal shrinks (or holds) as balls grow
    assert (out["zero_registers_total"].diff().dropna() <= 0).all()


def test_anf_empty_graph():
    from cpg_ray.functions.graphalgo import anf_neighborhood

    out = anf_neighborhood(rd.from_pandas(
        pd.DataFrame({"src": ["s"], "dst": ["s"]})), hops=3)
    assert out.empty and list(out.columns) == [
        "hop", "nf_est", "zero_registers_total"]


def test_transitive_reduction_modes_agree():
    from cpg_ray.functions.graphalgo import dag_transitive_reduction

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
             ("a", "d"), ("b", "d"), ("x", "y")]
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    a = dag_transitive_reduction(ds, max_len=3, mode="driver")
    b = dag_transitive_reduction(ds, max_len=3, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_anf_modes_agree():
    from cpg_ray.functions.graphalgo import anf_neighborhood

    pairs = [(f"n{i % 9}", f"n{(i * 4 + 1) % 9}") for i in range(30)]
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    a = anf_neighborhood(ds, hops=3, m=16, mode="driver")
    b = anf_neighborhood(ds, hops=3, m=16, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------
# SimRank (graphalgo.simrank)
# ---------------------------------------------------------------

def _simrank_edges():
    import pandas as pd
    import ray.data as rd

    # P1,P2 -> O1; P2,P3 -> O2; O1,O2 -> C1 ; P9 -> O9 (isolated-ish)
    rows = [("P1", "O1"), ("P2", "O1"), ("P2", "O2"), ("P3", "O2"),
            ("O1", "C1"), ("O2", "C1"), ("P9", "O9"),
            ("X", "X")]  # self-loop must drop
    return rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))


def test_simrank_two_rounds_hand_computed():
    from cpg_ray.functions.graphalgo import simrank

    out = simrank(_simrank_edges(), rounds=2, scale=10 ** 6,
                  c_num=8, c_den=10)
    got = {(r.a, r.b): r.simrank for r in out.itertuples()}
    # round 1: s1(O1,O2) = (8e5 * |{P2}|) // (d(O1)=2 * d(O2)=2 * ...)
    # s1 = (8*1e6*1) // (10*2*2) = 200_000
    # round 2: T(O1,O2) = 0 (no s1>0 pair feeds them: in-neighbors are
    # persons, and no person pair has common in-neighbors)
    # s2(O1,O2) = (8*(1e6*1 + 0)) // (10*2*2) = 200_000
    assert got[("O1", "O2")] == 200_000
    # O9/C1 never pair (no common in-neighbors, no T contribution)
    assert ("O9", "C1") not in got and ("C1", "O9") not in got
    # self-loop node X never appears
    assert not any("X" in p for p in got)


def test_simrank_driver_and_shuffle_paths_agree():
    import pandas as pd

    from cpg_ray.functions.graphalgo import simrank

    a = simrank(_simrank_edges(), rounds=2)
    b = simrank(_simrank_edges(), rounds=2, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)
    a1 = simrank(_simrank_edges(), rounds=1)
    b1 = simrank(_simrank_edges(), rounds=1, mode="shuffle")
    pd.testing.assert_frame_equal(a1, b1)


def test_simrank_pair_guard_refuses_not_truncates():
    import pytest

    from cpg_ray.functions.graphalgo import simrank
    from cpg_ray.functions.relational import GuardExceeded

    with pytest.raises(GuardExceeded):
        simrank(_simrank_edges(), rounds=2, pair_limit=0,
                mode="driver")


# ---------------------------------------------------------------
# Time-respecting reachability (graphalgo.temporal_reach)
# ---------------------------------------------------------------

def _temporal_edges():
    import pandas as pd
    import ray.data as rd

    t = pd.Timestamp
    rows = [
        # P1 -> A at t2; A -> B at t3 (valid: 3 >= 2); A -> C at t1
        # (INVALID from P1: 1 < 2, time runs backwards)
        ("P1", "A", t("2024-01-02")),
        ("A", "B", t("2024-01-03")),
        ("A", "C", t("2024-01-01")),
        # a later direct edge P1 -> B at t5 must LOSE to the t3 path
        ("P1", "B", t("2024-01-05")),
        # P2's only edge; duplicate observation keeps the MIN ts
        ("P2", "A", t("2024-01-04")),
        ("P2", "A", t("2024-01-06")),
        # self-loop drops
        ("P1", "P1", t("2024-01-01")),
    ]
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["src", "dst", "ts"]))


def test_temporal_reach_respects_time_and_min_arrival():
    import numpy as np
    import pandas as pd

    from cpg_ray.functions.graphalgo import temporal_reach

    out = temporal_reach(_temporal_edges(), rounds=3)
    us = lambda s: int(np.datetime64(s, "us").astype("int64"))
    got = {(r.src, r.dst): r.arrival_us for r in out.itertuples()}
    assert got[("P1", "A")] == us("2024-01-02")
    # earliest arrival at B: via A at t3, not the direct t5 edge
    assert got[("P1", "B")] == us("2024-01-03")
    # C is NOT time-respecting-reachable from P1 (edge predates arrival)
    assert ("P1", "C") not in got
    # P2 reaches A at its MIN observation, then B is unreachable
    # (A->B at t3 < arrival t4) but nothing later exists
    assert got[("P2", "A")] == us("2024-01-04")
    assert ("P2", "B") not in got
    assert ("P1", "P1") not in got  # self-loop dropped


def test_temporal_reach_driver_and_shuffle_paths_agree():
    import pandas as pd

    from cpg_ray.functions.graphalgo import temporal_reach

    a = temporal_reach(_temporal_edges(), rounds=3)
    b = temporal_reach(_temporal_edges(), rounds=3, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------
# Community conductance (graphalgo.conductance_census)
# ---------------------------------------------------------------

def test_conductance_two_cliques_one_bridge():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import conductance_census

    # two triangles joined by one bridge edge; label = clique
    edges = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
             ("a1", "b1")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    labels = pd.DataFrame({
        "entity": ["a1", "a2", "a3", "b1", "b2", "b3"],
        "community": ["A", "A", "A", "B", "B", "B"]})
    out = conductance_census(ds, labels)
    got = out.set_index("community")
    # vol(A) = 2+2+2 intra-degrees + 1 bridge end = 7; cut = 1
    assert got.loc["A", "vol"] == 7 and got.loc["A", "cut_edges"] == 1
    assert got.loc["A", "n_nodes"] == 3
    # phi = 1e6 * 1 // min(7, 14-7) = 142857
    assert got.loc["A", "conductance_ppm"] == 142857
    assert got.loc["B", "conductance_ppm"] == 142857


def test_conductance_single_community_excluded():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import conductance_census

    ds = rd.from_pandas(pd.DataFrame(
        [("x", "y"), ("y", "z")], columns=["src", "dst"]))
    labels = pd.DataFrame({"entity": ["x", "y", "z"],
                           "community": ["C", "C", "C"]})
    # the whole graph in one label -> denominator 0 -> excluded
    assert conductance_census(ds, labels).empty


def test_assortativity_star_vs_clique():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import degree_assortativity

    # star: hub degree n-1 meets leaves degree 1 -> perfectly
    # DISassortative (r = -1 -> sign -1, r2_ppm = -1_000_000)
    star = rd.from_pandas(pd.DataFrame(
        [("h", f"l{i}") for i in range(5)], columns=["src", "dst"]))
    s = degree_assortativity(star).iloc[0]
    assert s["sign"] == -1 and s["r2_ppm"] == -1_000_000
    assert s["m"] == 10  # 5 undirected edges, both orientations
    # regular graph (triangle): zero degree variance -> r undefined,
    # reported as 0 by the shared vx>0 rule
    tri = rd.from_pandas(pd.DataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], columns=["src", "dst"]))
    t = degree_assortativity(tri).iloc[0]
    assert t["sign"] == 0 and t["r2_ppm"] == 0


# ---- 4-cycle (square) census ---------------------------------------------


def _brute_squares(e: pd.DataFrame) -> int:
    import itertools

    adj: dict[str, set[str]] = {}
    for s, d in zip(e["src"], e["dst"]):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    count = 0
    # count each 4-cycle a-x-c-y once: unordered diagonal pairs (a,c),
    # unordered common-neighbor pairs (x,y), then halve (two diagonals)
    for a, c in itertools.combinations(nodes, 2):
        cn = len(adj[a] & adj[c])
        count += cn * (cn - 1) // 2
    return count // 2


def test_squares_known_motifs_and_brute_force():
    from cpg_ray.functions.graphalgo import square_census

    # one plain 4-cycle -> 1 square; K4 -> 3 squares
    c4 = pd.DataFrame({"src": list("ABCD"), "dst": list("BCDA")})
    k4 = pd.DataFrame({"src": ["E", "E", "E", "F", "F", "G"],
                       "dst": ["F", "G", "H", "G", "H", "H"]})
    both = pd.concat([c4, k4], ignore_index=True)
    got = square_census(rd.from_pandas(both), mode="driver")
    assert int(got.loc[0, "squares"]) == 4
    assert int(got.loc[0, "n_edges"]) == 10
    assert int(got.loc[0, "wedges"]) == 16  # Σ C(deg,2): 4·1 + 4·3
    rng = np.random.default_rng(11)
    for trial in range(8):
        n = int(rng.integers(4, 40))
        m = int(rng.integers(0, n * 3))
        e = pd.DataFrame({
            "src": [f"n{i:03d}" for i in rng.integers(0, n, m)],
            "dst": [f"n{i:03d}" for i in rng.integers(0, n, m)],
        })
        got = square_census(rd.from_pandas(e), mode="driver")
        assert int(got.loc[0, "squares"]) == _brute_squares(e), trial


def test_squares_modes_agree_and_hub_cap():
    from cpg_ray.functions.graphalgo import square_census

    edges = _rand_edges(50, 400, seed=31)
    ds = rd.from_pandas(edges)
    a = square_census(ds, mode="driver")
    b = square_census(ds, mode="shuffle")
    assert a.equals(b)
    # hub wider than max_center: shuffle mode skips it AND reports it
    hub = pd.DataFrame({
        "src": ["hub"] * 30, "dst": [f"r{i}" for i in range(30)]})
    capped = square_census(rd.from_pandas(hub), mode="shuffle",
                           max_center=10)
    assert int(capped.loc[0, "skipped_centers"]) == 1
    assert int(capped.loc[0, "squares"]) == 0
    # chunked driver expansion (tiny chunk) equals the one-shot result
    from cpg_ray.functions.graphalgo import _squares_driver
    chunked = _squares_driver(edges.drop_duplicates(), "src", "dst",
                              wedge_limit=10**8, chunk_wedges=7)
    assert chunked.equals(a)


# ---- SCAN structural clustering ----------------------------------------


def _brute_scan(edges: pd.DataFrame, *, eps_num=7, eps_den=10, mu=3,
                rounds=8) -> pd.DataFrame:
    """Independent set-based SCAN replay (Xu et al. KDD'07 semantics,
    bounded synchronous min-label rounds)."""
    E = {(min(s, d), max(s, d))
         for s, d in zip(edges["src"], edges["dst"]) if s != d}
    nodes = sorted({x for e in E for x in e})
    adj = {v: set() for v in nodes}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    sim = set()
    for a, b in E:
        cn = len(adj[a] & adj[b]) + 2  # closed neighborhoods
        if (eps_den * eps_den * cn * cn
                >= eps_num * eps_num
                * (len(adj[a]) + 1) * (len(adj[b]) + 1)):
            sim.add((a, b))
    simn = {v: set() for v in nodes}
    for a, b in sim:
        simn[a].add(b)
        simn[b].add(a)
    core = {v for v in nodes if len(simn[v]) + 1 >= mu}
    lbl = {v: v for v in core}
    cc = [(a, b) for a, b in sim if a in core and b in core]
    for _ in range(rounds):
        new = dict(lbl)
        for a, b in cc:
            if lbl[a] < new[b]:
                new[b] = lbl[a]
            if lbl[b] < new[a]:
                new[a] = lbl[b]
        lbl = new
    role, cluster = {}, {}
    for v in core:
        role[v], cluster[v] = "core", lbl[v]
    for v in nodes:
        if v in role:
            continue
        cands = [lbl[u] for u in simn[v] if u in core]
        if cands:
            role[v], cluster[v] = "member", min(cands)
    for v in nodes:
        if v in role:
            continue
        ks = {lbl[u] for u in adj[v] if u in core}
        role[v] = "hub" if len(ks) >= 2 else "outlier"
        cluster[v] = ""
    return pd.DataFrame({"entity": nodes,
                         "role": [role[v] for v in nodes],
                         "cluster": [cluster[v] for v in nodes]})


def _planted_scan_edges() -> pd.DataFrame:
    # two 6-cliques (cores), a bridge node touching both (hub), a
    # 3-anchor satellite (member at mu=5), a pendant (outlier), and a
    # pure self-loop node that must NOT surface
    rows = []
    for pre in ("a", "b"):
        clique = [f"{pre}{i}" for i in range(6)]
        rows += [(clique[i], clique[j])
                 for i in range(6) for j in range(i + 1, 6)]
    rows += [("hub", "a0"), ("hub", "b0"),
             ("mem", "a1"), ("mem", "a2"), ("mem", "a3"),
             ("lone", "hub"), ("selfy", "selfy")]
    return pd.DataFrame(rows, columns=["src", "dst"])


def test_scan_all_four_roles_and_brute_force():
    from cpg_ray.functions.graphalgo import scan_cluster

    edges = _planted_scan_edges()
    got = scan_cluster(rd.from_pandas(edges), mu=5, mode="driver")
    exp = _brute_scan(edges, mu=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    by = got.set_index("entity")
    assert (by.loc[[f"a{i}" for i in range(6)], "role"] == "core").all()
    assert (by.loc[[f"a{i}" for i in range(6)], "cluster"] == "a0").all()
    assert by.loc["hub", "role"] == "hub" and by.loc["hub", "cluster"] == ""
    assert by.loc["mem", "role"] == "member" and by.loc["mem", "cluster"] == "a0"
    assert by.loc["lone", "role"] == "outlier"
    assert "selfy" not in by.index  # self-loop-only nodes drop
    # noisy variants, several mu values, against the brute replay
    for seed, mu in ((3, 3), (9, 2), (21, 4)):
        rng = np.random.default_rng(seed)
        noise = pd.DataFrame({
            "src": [f"n{i:02d}" for i in rng.integers(0, 40, 150)],
            "dst": [f"n{i:02d}" for i in rng.integers(0, 40, 150)]})
        e2 = pd.concat([edges, noise], ignore_index=True)
        got = scan_cluster(rd.from_pandas(e2), mu=mu, mode="driver")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), _brute_scan(e2, mu=mu), )


def test_scan_modes_agree_and_guard_degrades():
    from cpg_ray.functions.graphalgo import scan_cluster

    edges = _planted_scan_edges()
    rng = np.random.default_rng(5)
    noise = pd.DataFrame({
        "src": [f"n{i:02d}" for i in rng.integers(0, 40, 150)],
        "dst": [f"n{i:02d}" for i in rng.integers(0, 40, 150)]})
    e2 = pd.concat([edges, noise], ignore_index=True)
    ds = rd.from_pandas(e2)
    d = scan_cluster(ds, mu=3, mode="driver")
    s = scan_cluster(rd.from_pandas(e2), mu=3, mode="shuffle")
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    # auto degrades past the guard instead of raising; driver REFUSES
    a = scan_cluster(rd.from_pandas(e2), mu=3, mode="auto",
                     driver_edge_limit=10)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  d.reset_index(drop=True))
    with pytest.raises(GuardExceeded):
        scan_cluster(rd.from_pandas(e2), mu=3, mode="driver",
                     driver_edge_limit=10)


def test_scan_shuffle_no_cores_and_empty():
    from cpg_ray.functions.graphalgo import scan_cluster

    # sparse random graph at strict eps: zero cores -> the whole
    # core/member/solo join chain runs on typed empties (the
    # zero-block left_outer regression) and everything is outlier
    edges = _rand_edges(60, 100, seed=2)
    for mode in ("driver", "shuffle"):
        out = scan_cluster(rd.from_pandas(edges), eps_num=99,
                           eps_den=100, mu=3, mode=mode)
        assert len(out) and (out["role"] == "outlier").all()
        assert (out["cluster"] == "").all()
    empty = rd.from_pandas(pd.DataFrame({"src": [], "dst": []}))
    assert scan_cluster(empty, mode="driver").empty


# ---- eigenvector centrality ----------------------------------------------


def _brute_eigen(edges: pd.DataFrame, iters: int, scale: int) -> pd.DataFrame:
    e = {(a, b) for a, b in zip(edges.src, edges.dst) if a != b}
    und = e | {(b, a) for a, b in e}
    nodes = sorted({x for ab in und for x in ab})
    x = {v: scale for v in nodes}
    for _ in range(iters):
        raw = dict(x)  # A+I shift
        for s, d in und:
            raw[d] += x[s]
        div = max(max(raw.values()) // scale, 1)
        x = {v: raw[v] // div for v in nodes}
    return (pd.DataFrame({"entity": nodes,
                          "score": [x[v] for v in nodes]})
            .astype({"score": "int64"})
            .sort_values(["score", "entity"], ascending=[False, True])
            .reset_index(drop=True))


def test_eigen_matches_brute_force_and_modes_agree():
    from cpg_ray.functions.graphalgo import eigenvector_centrality

    edges = _rand_edges(n_nodes=25, n_edges=80, seed=7)
    expect = _brute_eigen(edges, iters=5, scale=10 ** 6)
    d = eigenvector_centrality(rd.from_pandas(edges), iters=5,
                               mode="driver").to_pandas()
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), expect, check_dtype=False)
    s = eigenvector_centrality(rd.from_pandas(edges), iters=5,
                               mode="shuffle").to_pandas()
    s = s.reset_index(drop=True)
    s["score"] = s["score"].astype("int64")
    pd.testing.assert_frame_equal(s, expect, check_dtype=False)


def test_eigen_star_center_dominates():
    from cpg_ray.functions.graphalgo import eigenvector_centrality

    # hub with 4 leaves: the hub's eigenvector share is sqrt(deg)
    # larger — with max-norm the hub holds the top score and all
    # leaves tie below it
    star = pd.DataFrame({"src": ["h"] * 4, "dst": ["a", "b", "c", "d"]})
    r = eigenvector_centrality(rd.from_pandas(star), iters=6,
                               mode="driver").to_pandas()
    assert r.iloc[0]["entity"] == "h"
    leaves = r[r.entity != "h"]["score"].unique()
    assert len(leaves) == 1 and leaves[0] < r.iloc[0]["score"]


def test_heavy_edge_matching_mutual_and_modes_agree():
    """Heavy-edge matching: mutual max-weight proposals match, ties
    break to the smallest neighbor, matched pairs share supernode =
    min(u,v), unmatched keep themselves; driver == shuffle; matching
    is a valid matching (no node in two pairs)."""
    from cpg_ray.functions.graphalgo import heavy_edge_matching

    # weights via multiplicity: (a,b)×3, (b,c)×1, (c,d)×2 →
    # a↔b mutual (w3), c→d & d→c mutual (w2): two matched pairs
    edges = pd.DataFrame({
        "src": ["a", "a", "b", "b", "c", "c", "c"],
        "dst": ["b", "b", "a", "c", "d", "d", "c"],
    })
    d = heavy_edge_matching(rd.from_pandas(edges),
                            mode="driver").to_pandas()
    s = heavy_edge_matching(rd.from_pandas(edges),
                            mode="shuffle").to_pandas()
    s["matched"] = s["matched"].astype(bool)
    pd.testing.assert_frame_equal(
        d.reset_index(drop=True), s.reset_index(drop=True),
        check_dtype=False)
    m = d.set_index("entity")
    assert m.loc["a", "supernode"] == "a" and bool(m.loc["a", "matched"])
    assert m.loc["b", "supernode"] == "a"
    assert m.loc["c", "supernode"] == "c" and bool(m.loc["c", "matched"])
    assert m.loc["d", "supernode"] == "c"
    # star: center proposes to one leaf; only that pair matches
    star = pd.DataFrame({"src": ["h"] * 3, "dst": ["x", "y", "z"]})
    r = heavy_edge_matching(rd.from_pandas(star),
                            mode="driver").to_pandas().set_index("entity")
    assert bool(r.loc["h", "matched"]) and r.loc["h", "supernode"] == "h"
    assert bool(r.loc["x", "matched"])  # tie-break → smallest nbr 'x'
    assert not bool(r.loc["y", "matched"]) and not bool(r.loc["z", "matched"])
    # validity: each supernode hosts ≤ 2 members
    assert d.groupby("supernode").size().max() <= 2


def test_slashburn_roles_and_modes_agree():
    """SlashBurn on a planted hub-and-spoke graph: the hub retires
    round 1, isolated leaves become spokes, the surviving clique stays
    core; driver == composed-Dataset mode; every node classified
    exactly once."""
    from cpg_ray.functions.graphalgo import slashburn

    # hub h connects 4 leaves and clique {c1,c2,c3}; k=1 removes h,
    # leaves shatter to singleton spokes, clique is the GCC
    e = [("h", x) for x in ["l1", "l2", "l3", "l4", "c1"]]
    e += [("c1", "c2"), ("c2", "c3"), ("c1", "c3")]
    edges = pd.DataFrame(e, columns=["src", "dst"])
    d = slashburn(rd.from_pandas(edges), k=1, rounds=1,
                  mode="driver").to_pandas()
    s = slashburn(rd.from_pandas(edges), k=1, rounds=1,
                  mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True),
                                  check_dtype=False)
    m = d.set_index("entity")
    assert m.loc["h", "role"] == "hub" and m.loc["h", "round"] == 1
    for leaf in ["l1", "l2", "l3", "l4"]:
        assert m.loc[leaf, "role"] == "spoke", leaf
    for c in ["c1", "c2", "c3"]:
        assert m.loc[c, "role"] == "core", c
    # exactly-once classification
    assert len(d) == d["entity"].nunique() == 8


def test_bowtie_classification_and_modes_agree():
    """Bow-tie on a planted shape: 2-cycle core {p,q} (p max degree),
    upstream tail → IN, downstream tail → OUT, disconnected pair →
    other; driver == shuffle."""
    from cpg_ray.functions.graphalgo import bowtie

    e = [("p", "q"), ("q", "p"),          # core 2-cycle
         ("i1", "p"), ("i2", "i1"),       # IN chain
         ("q", "o1"), ("o1", "o2"),       # OUT chain
         ("x", "y")]                       # disconnected
    # make p the unambiguous max-degree pivot
    e += [("p", "o1"), ("i1", "q")]
    edges = pd.DataFrame(e, columns=["src", "dst"])
    d = bowtie(rd.from_pandas(edges), mode="driver").to_pandas()
    s = bowtie(rd.from_pandas(edges), mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True))
    m = d.set_index("entity")["cls"]
    assert m["p"] == "core" and m["q"] == "core"
    assert m["i1"] == "in" and m["i2"] == "in"
    assert m["o1"] == "out" and m["o2"] == "out"
    assert m["x"] == "other" and m["y"] == "other"


def test_coreness_hindex_converges_to_true_coreness():
    """H-index fixpoint equals the classic peel coreness on a planted
    graph (4-clique + pendant chain), modes agree, converged flag
    true once the fixpoint is reached."""
    from cpg_ray.functions.graphalgo import coreness

    # 4-clique (coreness 3) with a chain a-b-c hanging off (coreness 1)
    e = [("k1", "k2"), ("k1", "k3"), ("k1", "k4"),
         ("k2", "k3"), ("k2", "k4"), ("k3", "k4"),
         ("k4", "a"), ("a", "b"), ("b", "c")]
    edges = pd.DataFrame(e, columns=["src", "dst"])
    d = coreness(rd.from_pandas(edges), rounds=6,
                 mode="driver").to_pandas()
    s = coreness(rd.from_pandas(edges), rounds=6,
                 mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True),
                                  check_dtype=False)
    m = d.set_index("entity")["coreness"]
    for k in ["k1", "k2", "k3", "k4"]:
        assert m[k] == 3, k
    for v in ["a", "b", "c"]:
        assert m[v] == 1, v
    assert d["converged"].all()


def test_densest_peel_finds_planted_clique():
    """Peel on a 6-clique + sparse star fringe: the fringe peels away,
    a later round reports the clique's density (m/n = 15/6 → 2500
    milli), modes agree, density column is exact cross-multiplied."""
    from cpg_ray.functions.graphalgo import densest_subgraph_peel

    cl = [(f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)]
    fringe = [("c0", f"x{i}") for i in range(8)]
    edges = pd.DataFrame(cl + fringe, columns=["src", "dst"])
    d = densest_subgraph_peel(rd.from_pandas(edges), rounds=6,
                              mode="driver").to_pandas()
    s = densest_subgraph_peel(rd.from_pandas(edges), rounds=6,
                              mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(d.reset_index(drop=True),
                                  s.reset_index(drop=True),
                                  check_dtype=False)
    assert d["density_milli"].max() == 2500  # the clique round
    assert d.iloc[0]["n_nodes"] == 14  # full graph first


def test_rand_index_combinatorics_identity():
    """The contingency identity agree = C(n,2) + 2ΣC(nij,2) − ΣC(ai,2)
    − ΣC(bj,2) equals a brute-force pair count on a hand labeling, and
    identical labelings give Rand = 1."""
    import itertools

    a = {1: "x", 2: "x", 3: "y", 4: "y", 5: "y"}
    b = {1: "p", 2: "p", 3: "p", 4: "q", 5: "q"}

    def agree_pairs(a, b):
        n = 0
        for i, j in itertools.combinations(sorted(a), 2):
            same_a = a[i] == a[j]
            same_b = b[i] == b[j]
            n += same_a == same_b
        return n

    import pandas as pd
    m = pd.DataFrame({"k": list(a), "ca": [a[k] for k in a],
                      "cb": [b[k] for k in a]})

    def c2(s):
        return int((s * (s - 1) // 2).sum())

    n = len(m)
    total = n * (n - 1) // 2
    ident = (total + 2 * c2(m.groupby(["ca", "cb"]).size())
             - c2(m.groupby("ca").size())
             - c2(m.groupby("cb").size()))
    assert ident == agree_pairs(a, b)
    same = (total + 2 * c2(m.groupby(["ca", "ca"]).size())
            - 2 * c2(m.groupby("ca").size()))
    assert same == total  # identical labelings agree on every pair


def test_k4_known_motifs_brute_force_and_modes_agree():
    """K5 → C(5,4)=5 cliques / C(5,3)=10 triangles; a hanging chain
    adds neither; random graphs match itertools brute force; the
    driver bitset path equals the 5-join shuffle path."""
    from itertools import combinations

    from cpg_ray.functions.graphalgo import k4_census

    k5_nodes = list("ABCDE")
    k5 = pd.DataFrame(
        [(a, b) for a, b in combinations(k5_nodes, 2)],
        columns=["src", "dst"])
    chain = pd.DataFrame({"src": ["E", "X"], "dst": ["X", "Y"]})
    e = pd.concat([k5, chain], ignore_index=True)
    got = k4_census(rd.from_pandas(e), mode="driver")
    assert int(got.loc[0, "triangles"]) == 10
    assert int(got.loc[0, "k4"]) == 5
    assert int(got.loc[0, "n_edges"]) == 12

    def brute(e: pd.DataFrame) -> tuple[int, int]:
        es = {tuple(sorted(t)) for t in
              zip(e["src"], e["dst"]) if t[0] != t[1]}
        vs = sorted({v for t in es for v in t})
        tri = sum(1 for c in combinations(vs, 3)
                  if all(tuple(sorted(p)) in es
                         for p in combinations(c, 2)))
        k4 = sum(1 for c in combinations(vs, 4)
                 if all(tuple(sorted(p)) in es
                        for p in combinations(c, 2)))
        return tri, k4

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(5, 25))
        m = int(rng.integers(n, n * 4))
        e = pd.DataFrame({
            "src": [f"n{i:03d}" for i in rng.integers(0, n, m)],
            "dst": [f"n{i:03d}" for i in rng.integers(0, n, m)],
        })
        drv = k4_census(rd.from_pandas(e), mode="driver")
        tri, k4 = brute(e)
        assert (int(drv.loc[0, "triangles"]),
                int(drv.loc[0, "k4"])) == (tri, k4), trial

    shf = k4_census(rd.from_pandas(pd.concat([k5, chain],
                                             ignore_index=True)),
                    mode="shuffle")
    assert shf.equals(got)
    # auto degrades past the edge guard and still agrees
    auto = k4_census(rd.from_pandas(pd.concat([k5, chain],
                                              ignore_index=True)),
                     mode="auto", driver_edge_limit=3)
    assert auto.equals(got)


def test_onion_layers_known_graph_and_modes_agree():
    """Star + triangle-with-tail: the star leaves peel at layer 1
    core 1, the tail at layer 1 too, the hub after its leaves, the
    triangle last at core 2; cores equal classic coreness; driver ==
    shuffle; isolated-by-peel nodes still get their layer in shuffle
    mode (the node-state fix)."""
    from cpg_ray.functions.graphalgo import coreness, onion_layers

    # star S with 3 leaves + triangle A-B-C with tail T attached to A
    e = pd.DataFrame({
        "src": ["S", "S", "S", "A", "B", "C", "A"],
        "dst": ["l1", "l2", "l3", "B", "C", "A", "T"],
    })
    drv = onion_layers(rd.from_pandas(e), mode="driver").to_pandas() \
        .sort_values("entity").reset_index(drop=True)
    shf = onion_layers(rd.from_pandas(e), mode="shuffle").to_pandas() \
        .sort_values("entity").reset_index(drop=True)
    assert drv.equals(shf)
    row = drv.set_index("entity")
    # leaves + tail first (deg 1 ≤ k=1)
    assert row.loc["l1", "layer"] == 1 and row.loc["l1", "core"] == 1
    assert row.loc["T", "layer"] == 1
    # hub S isolated by its leaves' removal → next layer, still core 1
    # (the isolated-node case shuffle mode must not lose)
    assert row.loc["S", "layer"] == 2 and row.loc["S", "core"] == 1
    # triangle peels last at core 2
    assert (row.loc[["A", "B", "C"], "core"] == 2).all()
    assert row.loc["B", "layer"] == row["layer"].max()
    # cores equal classic coreness everywhere
    cor = coreness(rd.from_pandas(e), mode="driver").to_pandas() \
        .set_index("entity")["coreness"]
    assert (row["core"] == cor.loc[row.index]).all()


def test_powerlaw_alpha_recovers_planted_exponent():
    """Degrees drawn as floor(1/u^(1/(α-1))) from a α=2.5 power law:
    the CSN MLE on the exact degree multiset recovers ~2.5; a regular
    graph (all equal degrees at dmin) blows α up (s → small)."""
    from cpg_ray.functions.graphalgo import powerlaw_alpha

    rng = np.random.RandomState(5)
    # synthesize an edge list whose degree sequence is heavy-tailed:
    # star-bundle construction — node i gets ~d_i spokes
    u = rng.uniform(0.01, 1.0, 150)
    degs = np.minimum((1.0 / u) ** (1.0 / 1.5), 60).astype(int) + 1
    srcs, dsts = [], []
    spoke = 0
    for i, d in enumerate(degs):
        for _ in range(d):
            srcs.append(f"hub{i:03d}")
            dsts.append(f"sp{spoke:05d}")
            spoke += 1
    e = pd.DataFrame({"src": srcs, "dst": dsts})
    out = powerlaw_alpha(rd.from_pandas(e)).iloc[0]
    alpha = out["alpha_milli"] / 1000
    assert 1_900 <= out["alpha_milli"] <= 3_500, alpha
    # regular graph: every hub degree == 2 → ln(4/3) tail, alpha huge
    reg = pd.DataFrame({"src": ["a", "b", "c", "d"],
                        "dst": ["b", "c", "d", "a"]})  # 4-cycle, d=2
    r = powerlaw_alpha(rd.from_pandas(reg)).iloc[0]
    assert r["n_tail"] == 4
    assert r["alpha_milli"] > 4_000


def test_effdiam_interpolation_on_path_graph():
    """Interpolation arithmetic on a hand N(h) curve: path of 5 nodes
    has N = [5, 13, 19, 23, 25]; 0.9·25 = 22.5 → first h with
    10·N ≥ 225 is h=3, frac = (225−190)/(10·(23−19)) → 875/1000."""
    nf = {0: 5, 1: 13, 2: 19, 3: 23, 4: 25}
    nf_h = nf[4]
    d90_hop = next(h for h in sorted(nf) if 10 * nf[h] >= 9 * nf_h)
    assert d90_hop == 3
    prev, cur = nf[2], nf[3]
    frac = (1000 * (9 * nf_h - 10 * prev)) // (10 * (cur - prev))
    assert 1000 * (d90_hop - 1) + frac == 2875


def test_reciprocity_driver_fast_path_equals_distributed():
    """The guarded set-probe path and the hash_join path agree on a
    mixed fixture (full two-way, one-way, per-class split)."""
    from cpg_ray.functions.graphalgo import reciprocity

    e = pd.DataFrame({
        "pred": ["p", "p", "p", "q", "q"],
        "src": ["a", "b", "a", "x", "y"],
        "dst": ["b", "a", "c", "y", "x"],
    })
    ds = rd.from_pandas(e)
    fast = reciprocity(ds, by="pred")
    # force the distributed branch by dropping the guard via a big
    # fake count
    import cpg_ray.functions.graphalgo as g
    orig = rd.Dataset.count
    try:
        rd.Dataset.count = lambda self: 10_000_000
        slow = reciprocity(rd.from_pandas(e), by="pred")
    finally:
        rd.Dataset.count = orig
    assert fast.equals(slow)
    row = fast.set_index("grp")
    assert row.loc["p", "n_pairs"] == 3 and row.loc["p", "n_recip"] == 2
    assert row.loc["q", "n_recip"] == 2


def test_k4_bitset_budget_guard_and_onion_round_guard():
    """k4_census driver mode REFUSES when the n²/8 bitset allocation
    exceeds the budget (and auto degrades to the join path);
    onion_layers REFUSES past max_rounds instead of looping."""
    import pytest

    from cpg_ray.functions.graphalgo import (GuardExceeded, k4_census,
                                             onion_layers)

    e = pd.DataFrame({"src": ["a", "b", "c", "d"],
                      "dst": ["b", "c", "d", "a"]})
    with pytest.raises(GuardExceeded):
        k4_census(rd.from_pandas(e), mode="driver", bitset_budget=8)
    # auto mode degrades to shuffle and still answers
    auto = k4_census(rd.from_pandas(e), mode="auto", bitset_budget=8)
    assert int(auto.loc[0, "k4"]) == 0
    assert int(auto.loc[0, "n_edges"]) == 4

    # a path graph peels in several rounds; max_rounds=1 must refuse
    chain = pd.DataFrame({"src": list("abcde"), "dst": list("bcdef")})
    with pytest.raises(GuardExceeded):
        onion_layers(rd.from_pandas(chain), mode="driver", max_rounds=1)


def test_degree_ccdf_bit_length_bins_and_suffix_sum():
    """bit_length-1 bins agree with the SQL length(bin(d))-1 rule at
    power-of-two boundaries, and n_ge is a proper survival curve."""
    import duckdb

    for d in (1, 2, 3, 4, 7, 8, 1023, 1024):
        sql = duckdb.sql(f"SELECT length(bin({d})) - 1").fetchone()[0]
        assert sql == d.bit_length() - 1, d

    import __ray_entry__ as e
    out = e.queries()["kg_degree_ccdf"]("/root/testdata/sf0.001")
    assert (out["bin"].diff().dropna() > 0).all()
    assert (out["n_ge"].diff().dropna() <= 0).all()  # non-increasing
    assert int(out["n_ge"].iloc[0]) == int(out["n_nodes"].sum())


def test_comp_sizes_census_consistency():
    """Size distribution sums to the node total; the GCC share uses
    the max component size; sizes partition the kg_components
    labeling exactly."""
    import __ray_entry__ as e

    comp = e.queries()["kg_components"]("/root/testdata/sf0.001")
    out = e.queries()["kg_comp_sizes"]("/root/testdata/sf0.001")
    assert int((out["size"] * out["n_components"]).sum()) \
        == int(out["n_nodes_total"].iloc[0]) == len(comp)
    gcc = int(comp.groupby("component").size().max())
    assert int(out["gcc_share_ppm"].iloc[0]) \
        == gcc * 1_000_000 // len(comp)
