"""Graph-query layer over a small extracted graph."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from cpg_ray.pagegen import cfg_for_variant, render_page
from cpg_ray.schemas import PAGES
from cpg_ray.stages.extract import ExtractGraph


def _graph(n=40, variant="basic"):
    w = cfg_for_variant(variant).build()
    eg = ExtractGraph(aliases=[r["alias"] for r in w.alias_rows()])
    rows = [render_page(w, i, variant) for i in range(n)]
    batch = pa.Table.from_pydict(
        {c: [r[c] for r in rows] for c in PAGES.names}, schema=PAGES
    )
    out = eg(batch).to_pandas()
    nodes = out[out.kind == "node"][
        ["node_id", "label", "name", "norm_name", "url",
         "span_start", "span_end", "is_inferred"]
    ]
    edges = out[out.kind == "edge"][
        ["src_id", "dst_id", "etype", "index", "name", "url"]
    ]
    return rd.from_pandas(nodes.reset_index(drop=True)), rd.from_pandas(
        edges.reset_index(drop=True)
    ), nodes, edges


def test_rel_chain_matches_pandas_join():
    nodes_ds, edges_ds, nodes, edges = _graph()
    from cpg_ray.functions.graphquery import rel_chain

    got = rel_chain(
        nodes_ds, edges_ds, etype="AST", src_label="Section",
        dst_label="Mention",
    ).to_pandas()

    sec = nodes[nodes.label == "Section"][["node_id"]]
    men = nodes[nodes.label == "Mention"][["node_id"]]
    want = (
        edges[edges.etype == "AST"]
        .merge(sec, left_on="src_id", right_on="node_id")
        .merge(men, left_on="dst_id", right_on="node_id")
    )
    assert len(got) == len(want) > 0
    assert set(zip(got.src_id, got.dst_id)) == set(
        zip(want.src_id, want.dst_id)
    )


def test_label_and_prop_filter():
    nodes_ds, _e, nodes, _ = _graph()
    from cpg_ray.functions.graphquery import label_filter, prop_filter

    m = label_filter(nodes_ds, "Mention").to_pandas()
    assert set(m.label) == {"Mention"}
    assert len(m) == (nodes.label == "Mention").sum()

    late = prop_filter(nodes_ds, "span_start", ">", 100).to_pandas()
    assert (late.span_start > 100).all()


def test_dangling_edges_empty_on_wellformed_and_detects_breakage():
    nodes_ds, edges_ds, nodes, edges = _graph()
    from cpg_ray.functions.graphquery import dangling_edges

    assert dangling_edges(nodes_ds, edges_ds).count() == 0

    broken = pd.concat(
        [edges, pd.DataFrame([{"src_id": "nope", "dst_id": edges.dst_id.iloc[0],
                               "etype": "AST", "index": 0, "name": None,
                               "url": "u"}])],
        ignore_index=True,
    )
    bad = dangling_edges(nodes_ds, rd.from_pandas(broken)).to_pandas()
    assert len(bad) == 1 and bad.src_id.iloc[0] == "nope"


def test_var_length_reach():
    _n, edges_ds, _nodes, edges = _graph(15)
    from cpg_ray.functions.graphquery import var_length_reach

    out = var_length_reach(edges_ds, etype="EOG", max_hops=3).to_pandas()
    assert (out.hops <= 3).all() and (out.hops >= 1).all()
    # per url: EOG is a single chain, so reach-from-root = min(len, 3)
    eog = edges[edges.etype == "EOG"]
    for url, sub in eog.groupby("url"):
        expect = min(len(sub), 3)
        got = out[out.url == url]
        assert len(got) == expect, url
        assert sorted(got.hops) == list(range(1, expect + 1))


def test_follow_eog_chain_lengths():
    _n, edges_ds, _nodes, edges = _graph(20)
    from cpg_ray.functions.graphquery import follow_eog

    out = follow_eog(edges_ds).to_pandas()
    assert out.dense_index.all()
    by_url = edges[edges.etype == "EOG"].groupby("url").size()
    for r in out.itertuples():
        assert r.chain_len == by_url.get(r.url, 0)


def test_triple_diff_set_semantics():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphquery import triple_diff

    a = rd.from_pandas(pd.DataFrame({
        "canonical_subj": ["s1", "s1", "s2", "s3"],
        "pred": ["p", "p", "p", "p"],
        "canonical_obj": ["o1", "o1", "o2", "o3"],  # s1 duplicated
    }))
    b = rd.from_pandas(pd.DataFrame({
        "canonical_subj": ["s1", "s4"],
        "pred": ["p", "p"],
        "canonical_obj": ["o1", "o4"],
    }))
    df = triple_diff(a, b).to_pandas()
    added = df[df.side == "added"]
    removed = df[df.side == "removed"]
    assert set(added.canonical_subj) == {"s4"}
    assert set(removed.canonical_subj) == {"s2", "s3"}
    # shared fact (s1) never appears, and duplicates collapse
    assert "s1" not in set(df.canonical_subj)
    assert len(df) == 3


def test_label_ancestry_filter():
    """Abstract labels match their subtype set — the reference's
    all<T>() class-ancestry semantics (Graph.kt:387-398)."""
    import ray.data as rd

    from cpg_ray.functions.graphquery import label_filter

    nodes = pd.DataFrame({
        "node_id": ["a", "b", "c", "d"],
        "label": ["Document", "Section", "Mention", "Problem"],
    })
    ds = rd.from_pandas(nodes)
    assert set(label_filter(ds, "Node").to_pandas().node_id) == {
        "a", "b", "c", "d"
    }
    assert set(label_filter(ds, "Container").to_pandas().node_id) == {
        "a", "b"
    }
    assert set(label_filter(ds, "Mention").to_pandas().node_id) == {"c"}
