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
    # undirected single hops parse (direction "both"); undirected
    # variable-length hops still raise
    plan = parse("MATCH (a:X)-[:E]-(b:Y) RETURN a")
    assert plan.rels == [("E", None, "both")]
    with pytest.raises(ValueError):
        parse("MATCH (a:X)-[:E*1..2]-(b:Y) RETURN a")
    with pytest.raises(ValueError):
        parse("MATCH (a) WHERE a.x IN [1,2] RETURN a")
    with pytest.raises(ValueError):  # repeated pattern variables
        parse("MATCH (a:X)-[:E]->(a:Y) RETURN a")
    with pytest.raises(ValueError):  # BOTH direction: reference TODO too
        parse("MATCH (a:X)<-[:E]->(b:Y) RETURN a")
    # multi-hop chains parse (one rel entry per hop, with direction)
    plan = parse("MATCH (a:X)-[:E]->(b:Y)<-[:F]-(c:Z) RETURN c.name")
    assert [(e, r) for e, _h, r in plan.rels] == [("E", False), ("F", True)]


def test_property_map_tokenizer():
    """Inline props parse positionally: ':' and ',' INSIDE a string
    literal are value bytes, not separators; residue raises."""
    plan = parse("MATCH (a:X {name: 'a, b:c', n: 3}) RETURN a.name")
    assert plan.nodes[0][2] == {"name": "a, b:c", "n": 3}
    with pytest.raises(ValueError):
        parse("MATCH (a:X {name 'oops'}) RETURN a")
    with pytest.raises(ValueError):
        parse("MATCH (a:X {name: bareword}) RETURN a")


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


def _reach_closure(edges: pd.DataFrame, etype: str,
                   max_hops: int) -> pd.DataFrame:
    """Independent oracle for faithful *1..k semantics: the recursive-
    CTE UNION closure — one row per distinct (src, dst, hops) with a
    walk of exactly `hops` edges, from EVERY node."""
    rows = []
    for _url, sub in edges[edges.etype == etype].groupby("url"):
        adj: dict = {}
        for s, d in zip(sub.src_id, sub.dst_id):
            adj.setdefault(s, set()).add(d)
        triples = {(s, d, 1) for s, ds_ in adj.items() for d in ds_}
        frontier = set(triples)
        while frontier:
            nxt = set()
            for s, d, h in frontier:
                if h < max_hops:
                    for d2 in adj.get(d, ()):
                        t = (s, d2, h + 1)
                        if t not in triples:
                            nxt.add(t)
            triples |= nxt
            frontier = nxt
        rows.extend(triples)
    return pd.DataFrame(rows, columns=["src_id", "dst_id", "hops"])


def test_variable_length_path(graph_tables):
    """`-[:EOG*1..3]->` compiles onto var_length_reach's FULL mode
    (every source, every reachable length) and agrees with an
    independent recursive-closure oracle — NOT with the operator's
    roots-only default, which answers a different (chain-provenance)
    question."""
    nodes_ds, edges_ds, nodes, edges = graph_tables
    got = run_cypher(
        "MATCH (a:Mention)-[:EOG*1..3]->(b:Mention) "
        "RETURN a.id AS src_id, b.id AS dst_id, a.hops AS hops",
        nodes_ds, edges_ds,
    ).sort_values(["src_id", "dst_id", "hops"]).reset_index(drop=True)
    lab = {r.node_id: r.label for r in nodes.itertuples()}
    want = _reach_closure(edges, "EOG", 3)
    want = want[[lab.get(s) == "Mention" and lab.get(d) == "Mention"
                 for s, d in zip(want.src_id, want.dst_id)]]
    want = want.sort_values(
        ["src_id", "dst_id", "hops"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"hops": "int64"}), want.astype({"hops": "int64"})
    )
    assert len(got) > 0 and got.hops.max() == 3
    # mid-chain sources match too (the roots-only default would miss
    # them): some src is itself another edge's destination
    dsts = set(edges[edges.etype == "EOG"].dst_id)
    assert any(s in dsts for s in got.src_id)

    # lower bound filters short paths
    got2 = run_cypher(
        "MATCH (a:Mention)-[:EOG*2..3]->(b:Mention) "
        "RETURN count(a) AS n",
        nodes_ds, edges_ds,
    )
    assert got2.n.iloc[0] == int((want.hops >= 2).sum())

    with pytest.raises(ValueError):
        parse("MATCH (a:X)-[:E*3..2]->(b:Y) RETURN a")


def test_undirected_hop_is_union_of_orientations(graph_tables):
    """(a:Mention)-[:EOG]-(b:Mention): every physical edge appears in
    both orientations, self-loops once (openCypher BOTH semantics —
    exceeds the reference's Graph.kt:139 TODO)."""
    nodes_ds, edges_ds, nodes, edges = graph_tables
    got = run_cypher(
        "MATCH (a:Mention)-[:EOG]-(b:Mention) "
        "RETURN a.id AS a_id, b.id AS b_id",
        nodes_ds, edges_ds,
    ).sort_values(["a_id", "b_id"]).reset_index(drop=True)
    lab = {r.node_id: r.label for r in nodes.itertuples()}
    eog = edges[edges.etype == "EOG"]
    eog = eog[[lab.get(s) == "Mention" and lab.get(d) == "Mention"
               for s, d in zip(eog.src_id, eog.dst_id)]]
    fwd = pd.DataFrame({"a_id": eog.src_id, "b_id": eog.dst_id})
    rev = pd.DataFrame({"a_id": eog.dst_id, "b_id": eog.src_id})
    rev = rev[rev.a_id != rev.b_id]
    want = (pd.concat([fwd, rev], ignore_index=True)
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["a_id", "b_id"]], want)
    assert len(got) > len(eog)  # reverse orientation really adds rows

    # undirected hop inside a chain: (d)-[:AST]->(s)-[:AST]-(m) — the
    # undirected middle picks up s→m AND m→s AST edges; with AST only
    # running parent→child here, it must equal the directed chain
    dir3 = run_cypher(
        "MATCH (d:Document)-[:AST]->(s:Section)-[:AST]->(m:Mention) "
        "RETURN d.id AS doc, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["doc", "mid"]).reset_index(drop=True)
    und3 = run_cypher(
        "MATCH (d:Document)-[:AST]->(s:Section)-[:AST]-(m:Mention) "
        "RETURN d.id AS doc, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["doc", "mid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(dir3, und3)


def test_incoming_direction(graph_tables):
    """(m)<-[:AST]-(s) matches the physical edge s→m: same rows as the
    forward pattern with the ends swapped (Graph.kt:129-143 INCOMING)."""
    nodes_ds, edges_ds, _nodes, _edges = graph_tables
    fwd = run_cypher(
        "MATCH (s:Section)-[:AST]->(m:Mention) "
        "RETURN s.id AS sid, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["sid", "mid"]).reset_index(drop=True)
    rev = run_cypher(
        "MATCH (m:Mention)<-[:AST]-(s:Section) "
        "RETURN s.id AS sid, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["sid", "mid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fwd, rev)
    assert len(fwd) > 0

    # chain with a mixed-direction middle hop: (d)-[:AST]->(s) and
    # (m)<-[:AST]-(s) meet at s — same result as the all-forward chain
    fwd3 = run_cypher(
        "MATCH (d:Document)-[:AST]->(s:Section)-[:AST]->(m:Mention) "
        "RETURN d.id AS doc, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["doc", "mid"]).reset_index(drop=True)
    mix3 = run_cypher(
        "MATCH (m:Mention)<-[:AST]-(s:Section)<-[:AST]-(d:Document) "
        "RETURN d.id AS doc, m.id AS mid",
        nodes_ds, edges_ds,
    ).sort_values(["doc", "mid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fwd3, mix3)
    assert len(fwd3) > 0


def test_single_node_id_alias(graph_tables):
    """Single-node patterns accept `a.id` like relationship patterns do
    (docstring contract: every variable exposes id/name/url)."""
    nodes_ds, _e, nodes, _edges = graph_tables
    got = run_cypher(
        "MATCH (m:Mention) RETURN m.id AS node_id ORDER BY node_id LIMIT 5",
        nodes_ds,
    )
    want = sorted(nodes[nodes.label == "Mention"].node_id)[:5]
    assert list(got.node_id) == want


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


def test_optional_match_null_extension_and_count(graph_tables):
    """OPTIONAL MATCH: every base binding survives; chain tails get
    null y columns; count(y) counts non-null bindings (openCypher)."""
    import numpy as np

    nds, eds, nodes, edges = graph_tables
    base = run_cypher("MATCH (m:Mention) RETURN m.id AS m_id", nds, eds)
    opt = run_cypher(
        "MATCH (m:Mention) OPTIONAL MATCH (m)-[:EOG]->(n:Mention) "
        "RETURN m.id AS m_id, n.id AS next_id", nds, eds)
    # every mention appears (tails once with null, others per successor)
    assert set(opt.m_id) == set(base.m_id)
    assert opt.next_id.isna().any(), "fixture must have chain tails"
    # non-null rows are exactly the Mention->Mention EOG edges
    mset = set(nodes[nodes.label == "Mention"].node_id)
    ee = edges[(edges.etype == "EOG") & edges.src_id.isin(mset)
               & edges.dst_id.isin(mset)]
    got = opt[opt.next_id.notna()]
    assert set(zip(got.m_id, got.next_id)) == set(zip(ee.src_id,
                                                      ee.dst_id))
    # count(n) groups by the base var and skips nulls
    cnt = run_cypher(
        "MATCH (m:Mention) OPTIONAL MATCH (m)-[:EOG]->(n:Mention) "
        "RETURN m.id AS m_id, count(n) AS nn", nds, eds)
    tails = set(base.m_id) - set(ee.src_id)
    z = cnt[cnt.m_id.isin(tails)]
    assert (z.nn == 0).all() and len(z) == len(tails)
    assert int(cnt.nn.sum()) == len(ee)


def test_optional_match_rejections(graph_tables):
    nds, eds, *_ = graph_tables
    with pytest.raises(ValueError):  # unbound anchor
        run_cypher("MATCH (a:Section) OPTIONAL MATCH (z)-[:AST]->"
                   "(b:Mention) RETURN a", nds, eds)
    with pytest.raises(ValueError):  # WHERE on optional var
        run_cypher("MATCH (a:Section) OPTIONAL MATCH (a)-[:AST]->"
                   "(b:Mention) WHERE b.name = 'x' RETURN a", nds, eds)
    with pytest.raises(ValueError):  # undirected optional hop
        run_cypher("MATCH (a:Section) OPTIONAL MATCH (a)-[:AST]-"
                   "(b:Mention) RETURN a", nds, eds)
    with pytest.raises(ValueError):  # var-length optional hop
        run_cypher("MATCH (a:Section) OPTIONAL MATCH (a)-[:AST*1..2]->"
                   "(b:Mention) RETURN a", nds, eds)
    with pytest.raises(ValueError):  # re-bound optional variable
        run_cypher("MATCH (a:Section)-[:AST]->(b:Mention) OPTIONAL "
                   "MATCH (a)-[:AST]->(b:Mention) RETURN a", nds, eds)


def test_optional_match_colocate_mode_equivalence(graph_tables):
    """The three OPTIONAL MATCH execution paths are the same relation:
    'always' (guarded driver merge — the auto pick for intra-doc
    etypes under the row guard), 'bucketed' (forced hash(url)
    distributed exchange — the past-guard degrade), and 'never' (the
    general global left-outer hash join)."""
    nds, eds, *_ = graph_tables
    q = ("MATCH (m:Mention) OPTIONAL MATCH (m)-[:EOG]->(n:Mention) "
         "RETURN m.id AS m_id, n.id AS next_id, n.name AS next_name")

    def canon(df):
        return (df.fillna("")
                .sort_values(["m_id", "next_id", "next_name"])
                .reset_index(drop=True))

    driver = canon(run_cypher(q, nds, eds, colocate="always"))
    bucketed = canon(run_cypher(q, nds, eds, colocate="bucketed"))
    glob = canon(run_cypher(q, nds, eds, colocate="never"))
    pd.testing.assert_frame_equal(driver, glob)
    pd.testing.assert_frame_equal(bucketed, glob)
    assert len(glob) > 0 and (glob.next_id == "").any()


def test_where_before_optional_match_filters_base(graph_tables):
    """WHERE between MATCH and OPTIONAL MATCH (the openCypher-correct
    position for a base filter) prunes base bindings before the left
    extension; WHERE after OPTIONAL MATCH raises (it would scope to
    the optional clause in openCypher, which is unsupported)."""
    nds, eds, nodes, _edges = graph_tables
    some_url = sorted(nodes[nodes.label == "Mention"].url)[0]
    got = run_cypher(
        f"MATCH (m:Mention) WHERE m.url = '{some_url}' "
        "OPTIONAL MATCH (m)-[:EOG]->(n:Mention) "
        "RETURN m.id AS m_id, n.id AS next_id", nds, eds)
    want = set(nodes[(nodes.label == "Mention")
                     & (nodes.url == some_url)].node_id)
    assert set(got.m_id) == want
    with pytest.raises(ValueError, match="OPTIONAL"):
        run_cypher(
            "MATCH (m:Mention) OPTIONAL MATCH (m)-[:EOG]->(n:Mention) "
            f"WHERE m.url = '{some_url}' RETURN m.id AS m_id",
            nds, eds)
