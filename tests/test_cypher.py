"""Textual openCypher-subset surface: parses query strings and compiles
them onto the tested graph-query operators (Graph.kt:86-167 analog)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cpg_ray.functions.cypher import parse, run_cypher
from cpg_ray.pagegen import _cached_world, cfg_for_variant, render_page
from cpg_ray.stages.extract import ExtractGraph


@pytest.fixture(scope="module")
def graph_tables():
    cfg = cfg_for_variant("basic")
    world = _cached_world(cfg)
    rows = [render_page(world, i, "basic") for i in range(40)]
    batch = pa.Table.from_pydict({k: [r[k] for r in rows] for k in rows[0]})
    out = ExtractGraph(aliases=[a["alias"] for a in world.alias_rows()])(
        batch
    ).to_pandas()
    nodes = out[out.kind == "node"][
        ["node_id", "label", "name", "norm_name", "url", "span_start",
         "span_end", "is_inferred", "literal"]
    ]
    edges = out[out.kind == "edge"][["src_id", "dst_id", "etype", "url"]]
    return rd.from_pandas(nodes), rd.from_pandas(edges), nodes, edges


def test_parse_rejects_unsupported():
    with pytest.raises(ValueError):
        parse("CREATE (n)")
    with pytest.raises(ValueError):  # undirected edges unsupported
        parse("MATCH (a:X)-[:E]-(b:Y) RETURN a")
    with pytest.raises(ValueError):
        parse("MATCH (a) WHERE a.x IN [1,2] RETURN a")
    with pytest.raises(ValueError):  # repeated pattern variables
        parse("MATCH (a:X)-[:E]->(a:Y) RETURN a")
    # multi-hop chains parse (one rel entry per hop)
    plan = parse("MATCH (a:X)-[:E]->(b:Y)-[:F]->(c:Z) RETURN c.name")
    assert [e for e, _h in plan.rels] == ["E", "F"]


def test_multi_hop_chain_matches_pandas(graph_tables):
    """(d:Document)-[:AST]->(s:Section)-[:AST]->(m:Mention) compiles to
    chained hash joins and agrees with two pandas merges."""
    nodes_ds, edges_ds, nodes, edges = graph_tables
    got = run_cypher(
        "MATCH (d:Document)-[:AST]->(s:Section)-[:AST]->(m:Mention) "
        "RETURN d.id AS doc, s.name AS section, m.name AS mention",
        nodes_ds, edges_ds,
    ).sort_values(["doc", "section", "mention"]).reset_index(drop=True)
    lab = {r.node_id: r.label for r in nodes.itertuples()}
    name = {r.node_id: r.name for r in nodes.itertuples()}
    ast = edges[edges.etype == "AST"]
    hop1 = ast[[lab.get(s) == "Document" and lab.get(d) == "Section"
                for s, d in zip(ast.src_id, ast.dst_id)]]
    hop2 = ast[[lab.get(s) == "Section" and lab.get(d) == "Mention"
                for s, d in zip(ast.src_id, ast.dst_id)]]
    want = hop1.merge(hop2, left_on="dst_id", right_on="src_id",
                      suffixes=("_1", "_2"))
    want = pd.DataFrame({
        "doc": want.src_id_1,
        "section": want.dst_id_1.map(name),
        "mention": want.dst_id_2.map(name),
    }).sort_values(["doc", "section", "mention"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_single_node_filter_matches_pandas(graph_tables):
    nodes_ds, _e, nodes, _edges = graph_tables
    got = run_cypher(
        "MATCH (m:Mention) WHERE m.is_inferred = false "
        "AND m.span_start >= 100 "
        "RETURN m.node_id AS node_id, m.name AS name",
        nodes_ds,
    ).sort_values("node_id").reset_index(drop=True)
    want = nodes[(nodes.label == "Mention") & (~nodes.is_inferred)
                 & (nodes.span_start >= 100)][["node_id", "name"]]
    want = want.sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_property_map_in_pattern(graph_tables):
    nodes_ds, _e, nodes, _edges = graph_tables
    url = nodes.url.iloc[0]
    got = run_cypher(
        f"MATCH (m:Mention {{url: '{url}'}}) RETURN count(m) AS n",
        nodes_ds,
    )
    want = len(nodes[(nodes.label == "Mention") & (nodes.url == url)])
    assert got.n.iloc[0] == want > 0


def test_relationship_chain_matches_rel_chain(graph_tables):
    nodes_ds, edges_ds, nodes, edges = graph_tables
    got = run_cypher(
        "MATCH (s:Section)-[:AST]->(m:Mention) "
        "RETURN s.id AS sid, m.id AS mid, m.name AS mname, s.url AS url",
        nodes_ds, edges_ds,
    ).sort_values(["sid", "mid"]).reset_index(drop=True)
    sec = nodes[nodes.label == "Section"][["node_id"]]
    men = nodes[nodes.label == "Mention"][["node_id", "name"]]
    want = (
        edges[edges.etype == "AST"]
        .merge(sec, left_on="src_id", right_on="node_id")
        .merge(men, left_on="dst_id", right_on="node_id",
               suffixes=("", "_m"))
    )
    want = pd.DataFrame(
        {"sid": want.src_id, "mid": want.dst_id, "mname": want.name,
         "url": want.url}
    ).sort_values(["sid", "mid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_order_by_and_limit(graph_tables):
    nodes_ds, _e, nodes, _edges = graph_tables
    got = run_cypher(
        "MATCH (m:Mention) RETURN m.name AS name, m.span_start AS s "
        "ORDER BY s DESC, name LIMIT 5",
        nodes_ds,
    )
    assert len(got) == 5
    assert list(got.s) == sorted(got.s, reverse=True)


def test_variable_length_path(graph_tables):
    """`-[:EOG*1..3]->` compiles onto var_length_reach + label joins
    and agrees with calling the operator directly."""
    from cpg_ray.functions.graphquery import var_length_reach

    nodes_ds, edges_ds, nodes, _edges = graph_tables
    got = run_cypher(
        "MATCH (a:Mention)-[:EOG*1..3]->(b:Mention) "
        "RETURN a.id AS src_id, b.id AS dst_id, a.hops AS hops",
        nodes_ds, edges_ds,
    ).sort_values(["src_id", "dst_id", "hops"]).reset_index(drop=True)
    want = var_length_reach(edges_ds, etype="EOG", max_hops=3).to_pandas()[
        ["src_id", "dst_id", "hops"]
    ].sort_values(["src_id", "dst_id", "hops"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"hops": "int64"}), want.astype({"hops": "int64"})
    )
    assert len(got) > 0 and got.hops.max() == 3

    # lower bound filters short paths
    got2 = run_cypher(
        "MATCH (a:Mention)-[:EOG*2..3]->(b:Mention) "
        "RETURN count(a) AS n",
        nodes_ds, edges_ds,
    )
    assert got2.n.iloc[0] == int((want.hops >= 2).sum())

    with pytest.raises(ValueError):
        parse("MATCH (a:X)-[:E*3..2]->(b:Y) RETURN a")


def test_aggregations_with_implicit_grouping(graph_tables):
    """Cypher's implicit grouping: plain RETURN terms group the
    aggregates (RETURN s.name, count(m)); bare aggregates are global."""
    nodes_ds, edges_ds, nodes, edges = graph_tables

    got = run_cypher(
        "MATCH (s:Section)-[:AST]->(m:Mention) "
        "RETURN s.name AS section, count(m) AS n "
        "ORDER BY section",
        nodes_ds, edges_ds,
    )
    name = {r.node_id: r.name for r in nodes.itertuples()}
    lab = {r.node_id: r.label for r in nodes.itertuples()}
    ast = edges[edges.etype == "AST"]
    pairs = ast[[lab.get(s) == "Section" and lab.get(d) == "Mention"
                 for s, d in zip(ast.src_id, ast.dst_id)]]
    want = (
        pairs.assign(section=pairs.src_id.map(name))
        .groupby("section").size().rename("n").reset_index()
        .sort_values("section").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}), want.astype({"n": "int64"})
    )
    assert len(got) > 1

    # global numeric aggregates over the node schema
    g = run_cypher(
        "MATCH (m:Mention) RETURN sum(m.span_start) AS s, "
        "max(m.span_end) AS mx, avg(m.span_start) AS a",
        nodes_ds,
    )
    men = nodes[nodes.label == "Mention"]
    assert int(g.s.iloc[0]) == int(men.span_start.sum())
    assert int(g.mx.iloc[0]) == int(men.span_end.max())
    assert abs(float(g.a.iloc[0]) - float(men.span_start.mean())) < 1e-9
