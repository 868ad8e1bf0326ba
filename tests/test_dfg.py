"""G2/G3/G4 semantics: branch-aware EOG, flow-sensitive DFG fixpoint,
unreachable-edge kill, backward value evaluation.

Reference analogs pinned here: ControlFlowSensitiveDFGPass.java:96-310
(strong update + value-set join), UnreachableEOGPass.kt:41-97 (constant
condition kills edges, flagged not dropped), ValueEvaluator.kt:71-294
(follow DFG back to the defining literal and fold).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from cpg_ray.pagegen import _cached_world, cfg_for_variant, render_page
from cpg_ray.stages.dfg import build_eog, flow_sensitive_dfg
from cpg_ray.stages.extract import ExtractGraph


def test_build_eog_linear_parity():
    # all-plain documents degenerate to the exact pre-branch chain
    edges = build_eog([None] * 4)
    assert edges == [(0, 1, None, None), (1, 2, None, None),
                     (2, 3, None, None)]


def test_build_eog_fork_join_and_kill():
    # m0, then arm a = [m1], arm b = [m2, m3], then join m4; chosen=a
    tags = [None, (0, "a", True), (0, "b", False), (0, "b", False), None]
    edges = build_eog(tags)
    # fork: m0→m1 (branch True, live), m0→m2 (branch False, dead)
    assert (0, 1, True, None) in edges
    assert (0, 2, False, True) in edges
    # within dead arm: dead chain edge
    assert (2, 3, None, True) in edges
    # join: live tail m1→m4, dead tail m3→m4
    assert (1, 4, None, None) in edges
    assert (3, 4, None, True) in edges
    assert len(edges) == 5


def test_fixpoint_strong_update_kills_stale_def():
    # "Alric Wickham … Brona Wickham … Alric Wickham": the third mention
    # re-mentions the FIRST norm, but the second redefined the variable
    # `wickham` — naive consecutive-norm chaining links 0→2; the
    # flow-sensitive pass does not (the binding was killed)
    norms = ["alric wickham", "brona wickham", "alric wickham"]
    bare = [False, False, False]
    out = flow_sensitive_dfg(norms, bare, build_eog([None] * 3))
    assert (0, 2) not in out and out == []


def test_fixpoint_value_set_join_and_unreachable():
    # fork: arm a defines "port alden" (m1), arm b defines "new alden"
    # (m2); the post-join bare anaphor (m3) uses variable `alden`
    norms = ["hester caldwell", "port alden", "new alden", "new alden"]
    bare = [False, False, False, True]
    # both arms live → the use sees BOTH defs (value-set join)
    tags = [None, (0, "a", None), (0, "b", None), None]
    out = flow_sensitive_dfg(norms, bare, build_eog(tags))
    assert (1, 3) in out and (2, 3) in out
    # constant condition chosen=a → the dead arm's def never reaches it
    tags = [None, (0, "a", True), (0, "b", False), None]
    out = flow_sensitive_dfg(norms, bare, build_eog(tags))
    assert (1, 3) in out and (2, 3) not in out


@pytest.fixture(scope="module")
def branchy_graph():
    cfg = cfg_for_variant("branchy")
    world = _cached_world(cfg)
    rows = [render_page(world, i, "branchy") for i in range(1, 7)]
    batch = pa.Table.from_pydict({k: [r[k] for r in rows] for k in rows[0]})
    ex = ExtractGraph(aliases=[a["alias"] for a in world.alias_rows()])
    return ex(batch).to_pandas(), rows


def _anaphor_defs(out: pd.DataFrame, url: str) -> tuple[list, str]:
    """(sorted DFG2 def names reaching the page's bare anaphor, the
    anaphor's naive norm)."""
    page = out[out.url == url]
    nodes = page[page.kind == "node"].set_index("node_id")
    m = page[(page.kind == "node") & (page.label == "Mention")]
    bare = m[m.apply(
        lambda r: len(str(r["name"]).split()) == 1
        and len(str(r["norm_name"]).split()) > 1, axis=1)]
    assert len(bare) == 1
    aid = bare.node_id.iloc[0]
    e = page[(page.kind == "edge") & (page.etype == "DFG2")
             & (page.dst_id == aid)]
    return sorted(nodes.loc[s, "name"] for s in e.src_id), bare.norm_name.iloc[0]


def test_extract_fixpoint_disagrees_with_naive_on_chosen_page(branchy_graph):
    out, rows = branchy_graph
    # page 1: chosen="a" — naive anaphora resolved to the NEAREST prior
    # (arm b's city), the fixpoint keeps only the live arm a def
    defs, naive_norm = _anaphor_defs(out, rows[0]["url"])
    assert len(defs) == 1
    import cpg_ray.normalize as nz

    assert nz.norm_name(defs[0]) != naive_norm  # the disagreement


def test_extract_value_set_join_on_undeclared_page(branchy_graph):
    out, rows = branchy_graph
    # page 3: no data-chosen — both arms live, anaphor sees both defs
    defs, _ = _anaphor_defs(out, rows[2]["url"])
    assert len(defs) == 2


def test_unreachable_only_on_dead_arm(branchy_graph):
    out, rows = branchy_graph
    e = out[out.kind == "edge"]
    # undeclared page: nothing unreachable
    p3 = e[e.url == rows[2]["url"]]
    assert not p3.unreachable.fillna(False).astype(bool).any()
    # chosen page: some EOG edges dead, and every dead edge is EOG
    p1 = e[e.url == rows[0]["url"]]
    dead = p1[p1.unreachable.fillna(False).astype(bool)]
    assert len(dead) > 0 and set(dead.etype) == {"EOG"}
    # branch property appears exactly on fork edges (2 per page)
    assert p1.branch.notna().sum() == 2


def test_value_fold_arithmetic_promotion(branchy_graph):
    """G4 arithmetic folding (ValueEvaluator.kt:100-262): on the
    undeclared page the anaphor use folds to TWO different numbers —
    use_lit + arm_a's int literal (int+int → int) and use_lit + arm_b's
    float literal (int+float → float promotion)."""
    import ray.data as rd

    from cpg_ray.functions.graphquery import value_fold

    out, rows = branchy_graph
    nodes = out[out.kind == "node"][["node_id", "url", "literal"]]
    edges = out[out.kind == "edge"][["src_id", "dst_id", "etype", "url"]]
    vf = value_fold(
        rd.from_pandas(nodes), rd.from_pandas(edges)
    ).to_pandas()

    # page i=3 (rows[2], undeclared): lit_a=121, lit_b=133.5, lit_use=6
    page = out[out.url == rows[2]["url"]]
    m = page[(page.kind == "node") & (page.label == "Mention")]
    bare = m[m.apply(
        lambda r: len(str(r["name"]).split()) == 1
        and len(str(r["norm_name"]).split()) > 1, axis=1)]
    aid = bare.node_id.iloc[0]
    got = vf[(vf.url == rows[2]["url"]) & (vf.node_id == aid)]
    assert set(zip(got.value, got.vtype)) == {
        (127.0, "int"), (139.5, "float")
    }
    # page i=1 (chosen='a'): single live path → exactly one folded value,
    # via the int arm → int
    page1 = out[out.url == rows[0]["url"]]
    m1 = page1[(page1.kind == "node") & (page1.label == "Mention")]
    bare1 = m1[m1.apply(
        lambda r: len(str(r["name"]).split()) == 1
        and len(str(r["norm_name"]).split()) > 1, axis=1)]
    got1 = vf[(vf.url == rows[0]["url"])
              & (vf.node_id == bare1.node_id.iloc[0])]
    assert len(got1) == 1 and got1.vtype.iloc[0] == "int"


def test_typestate_per_path_vs_linear(branchy_graph):
    """Per-path DFA cloning (DFAOrderEvaluator.kt:56-144) vs naive
    linear span order, pinned on three corpus shapes:
    - undeclared fork, one visit per arm → linear sees visited,visited
      (violation); NO real path does (accepted per-path);
    - declared fork → linear still concatenates the dead arm (phantom
      violation); per-path never evaluates it;
    - double visit INSIDE one live arm → a REAL violation both report."""
    import ray.data as rd

    from cpg_ray.functions.typestate import (
        VISIT_ONCE,
        evaluate_order,
        evaluate_order_paths,
    )

    out, rows = branchy_graph
    nodes = out[out.kind == "node"][
        ["node_id", "label", "url", "span_start"]
    ]
    edges = out[out.kind == "edge"][
        ["src_id", "dst_id", "etype", "branch", "unreachable", "url"]
    ]
    triples = out[out.kind == "triple"][
        ["url", "subj_norm", "pred", "span_start"]
    ]
    per_path = evaluate_order_paths(
        rd.from_pandas(nodes), rd.from_pandas(edges),
        rd.from_pandas(triples),
    ).to_pandas()
    linear = evaluate_order(
        rd.from_pandas(triples), VISIT_ONCE
    ).to_pandas()

    def verdicts(df, url, subj):
        r = df[(df.url == url) & (df.subject == subj)]
        assert len(r) == 1
        return bool(r.accepted.iloc[0])

    def visited_subj(url):
        v = triples[(triples.url == url) & (triples.pred == "visited")]
        assert v.subj_norm.nunique() == 1
        return v.subj_norm.iloc[0]

    # rows[2] = page 3: undeclared fork — THE disagreement
    u3, s3 = rows[2]["url"], visited_subj(rows[2]["url"])
    assert verdicts(per_path, u3, s3) is True
    assert verdicts(linear, u3, s3) is False
    assert per_path[(per_path.url == u3)
                    & (per_path.subject == s3)].n_paths.iloc[0] == 2

    # rows[0] = page 1: chosen='a' — dead arm never evaluated per-path
    u1, s1 = rows[0]["url"], visited_subj(rows[0]["url"])
    assert verdicts(per_path, u1, s1) is True
    assert verdicts(linear, u1, s1) is False
    assert per_path[(per_path.url == u1)
                    & (per_path.subject == s1)].n_paths.iloc[0] == 1

    # rows[4] = page 5: chosen='a' with a double visit inside arm a —
    # a REAL violation on the live path
    u5, s5 = rows[4]["url"], visited_subj(rows[4]["url"])
    assert verdicts(per_path, u5, s5) is False


def test_typestate_multi_fork_cross_product():
    """Two fork groups in one document: paths are the CROSS PRODUCT of
    per-group live-arm choices (DFAOrderEvaluator clones state at every
    branch).  A violation that only exists when one arm of EACH group
    is taken must be found — evaluating groups independently would miss
    it; declared-dead arms never contribute."""
    import ray.data as rd

    from cpg_ray.functions.typestate import evaluate_order_paths
    from cpg_ray.stages.dfg import build_eog

    # mentions 0..6: plain, G0(a=1, b=2), plain, G1(a=4, b=5), plain
    tags = [None, (0, "a", None), (0, "b", None), None,
            (1, "a", None), (1, "b", None), None]
    url = "u1"
    spans = [10 * (i + 1) for i in range(7)]
    nodes = pd.DataFrame({
        "node_id": [f"m{i}" for i in range(7)],
        "label": "Mention", "url": url, "span_start": spans,
    })
    edges = pd.DataFrame(
        [(f"m{s}", f"m{d}", "EOG", b, u, url)
         for s, d, b, u in build_eog(tags)],
        columns=["src_id", "dst_id", "etype", "branch", "unreachable",
                 "url"],
    )
    # subject s: visited in G0-arm-a (m1) AND G1-arm-a (m4) — only the
    # (a, a) path sees both; s2: single visited in G0-arm-a
    triples = pd.DataFrame({
        "url": url,
        "subj_norm": ["s", "s", "s2"],
        "pred": ["visited", "visited", "visited"],
        "span_start": [spans[1], spans[4], spans[1]],
    })
    out = evaluate_order_paths(
        rd.from_pandas(nodes), rd.from_pandas(edges),
        rd.from_pandas(triples),
    ).to_pandas().set_index("subject")
    assert out.loc["s", "n_paths"] == 4  # 2 live arms × 2 live arms
    assert not out.loc["s", "accepted"]  # the (a,a) path violates
    assert out.loc["s2", "accepted"]  # ≤1 visited on every path

    # declared G0 (chosen=a): arm b dead → 2 paths; a visited recorded
    # in the DEAD arm never reaches any path
    tags_d = [None, (0, "a", True), (0, "b", False), None,
              (1, "a", None), (1, "b", None), None]
    edges_d = pd.DataFrame(
        [(f"m{s}", f"m{d}", "EOG", b, u, url)
         for s, d, b, u in build_eog(tags_d)],
        columns=["src_id", "dst_id", "etype", "branch", "unreachable",
                 "url"],
    )
    triples_d = pd.DataFrame({
        "url": url,
        "subj_norm": ["s3", "s3"],
        "pred": ["visited", "visited"],
        "span_start": [spans[2], spans[4]],  # dead-arm visit + live visit
    })
    out_d = evaluate_order_paths(
        rd.from_pandas(nodes), rd.from_pandas(edges_d),
        rd.from_pandas(triples_d),
    ).to_pandas().set_index("subject")
    assert out_d.loc["s3", "n_paths"] == 2
    assert out_d.loc["s3", "accepted"]  # dead-arm visit excluded


def test_value_eval_folds_to_root_defs(branchy_graph):
    import ray.data as rd

    from cpg_ray.functions.graphquery import value_eval

    out, rows = branchy_graph
    nodes = out[out.kind == "node"][["node_id", "label", "name", "url"]]
    edges = out[out.kind == "edge"][["src_id", "dst_id", "etype", "url"]]
    ev = value_eval(
        rd.from_pandas(nodes), rd.from_pandas(edges)
    ).to_pandas()
    # undeclared page's anaphor resolves to BOTH cities (n_values=2)
    defs3, _ = _anaphor_defs(out, rows[2]["url"])
    page3 = ev[ev.url == rows[2]["url"]]
    assert (page3.n_values == 2).any()
    joined = page3[page3.n_values == 2].resolved.iloc[0]
    assert joined == "|".join(sorted(defs3))
    # chosen page: every use resolves to exactly one value
    page1 = ev[ev.url == rows[0]["url"]]
    assert (page1.n_values == 1).all()
