"""Knowledge-fusion operators (functions/fusion.py) — behavior pins
beyond the SQL oracle comparison (the three kg_* fusion queries are
oracle-paired at three scale factors via tools/check_oracles.py)."""

import pandas as pd
import ray.data as rd

from cpg_ray.functions.fusion import (
    domain_weight,
    fact_conflicts,
    signature_violations,
    truth_vote,
)


def _triples(rows):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["pred", "canonical_subj", "canonical_obj", "url"]))


def test_fact_conflicts_only_multi_object_subjects():
    ds = _triples([
        ("born_in", "P1", "C1", "https://a.example/p/1"),
        ("born_in", "P1", "C1", "https://b.example/p/2"),   # repeat, same obj
        ("born_in", "P2", "C1", "https://a.example/p/3"),
        ("born_in", "P2", "C2", "https://b.example/p/4"),   # conflict
        ("visited", "P3", "C1", "https://a.example/p/5"),   # non-functional
        ("visited", "P3", "C2", "https://a.example/p/6"),
    ])
    out = fact_conflicts(ds)
    assert out.to_dict("records") == [
        {"pred": "born_in", "canonical_subj": "P2",
         "n_objects": 2, "n_mentions": 2}]


def test_truth_vote_one_vote_per_domain_and_weight_seam():
    # dom a asserts C1 on THREE pages; doms b and c assert C2 once each.
    # Page-level repetition must not buy votes: with equal weights the
    # two-domain assertion wins.
    rows = [
        ("born_in", "P1", "C1", "https://a.example/p/1"),
        ("born_in", "P1", "C1", "https://a.example/p/2"),
        ("born_in", "P1", "C1", "https://a.example/p/3"),
        ("born_in", "P1", "C2", "https://b.example/p/1"),
        ("born_in", "P1", "C2", "https://c.example/p/1"),
    ]
    eq = {d: 1.0 for d in ("a.example", "b.example", "c.example")}
    out = truth_vote(_triples(rows), weights=eq)
    assert out.loc[0, "chosen_obj"] == "C2"
    assert out.loc[0, "n_sources"] == 2
    # the credibility seam flips the outcome: a super-reliable domain a
    # outweighs two unit votes
    heavy = dict(eq, **{"a.example": 5.0})
    out2 = truth_vote(_triples(rows), weights=heavy)
    assert out2.loc[0, "chosen_obj"] == "C1"
    assert out2.loc[0, "n_sources"] == 1
    # default md5 weights are deterministic and in [1, 2)
    assert domain_weight("a.example") == domain_weight("a.example")
    assert 1.0 <= domain_weight("a.example") < 2.0


def test_truth_vote_tie_breaks_on_min_object():
    rows = [
        ("born_in", "P1", "C9", "https://a.example/p/1"),
        ("born_in", "P1", "C2", "https://b.example/p/1"),
    ]
    eq = {"a.example": 1.0, "b.example": 1.0}
    out = truth_vote(_triples(rows), weights=eq)
    assert out.loc[0, "chosen_obj"] == "C2"


def test_signature_violations_excludes_majority():
    ds = _triples([
        ("born_in", "P1", "C1", "https://a.example/p/1"),
        ("born_in", "P2", "C2", "https://a.example/p/2"),
        ("born_in", "inf:x", "C3", "https://a.example/p/3"),  # violator
    ])
    out = signature_violations(ds)
    assert out.to_dict("records") == [
        {"pred": "born_in", "skind": "inferred", "okind": "city", "n": 1}]


def _facts(rows):
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["canonical_subj", "pred", "canonical_obj"]))


def test_snapshot_merge_all_four_statuses():
    from cpg_ray.functions.fusion import snapshot_merge

    old = _facts([
        ("P1", "born_in", "C1"),     # kept (in both)
        ("P2", "born_in", "C1"),     # superseded (new says C2)
        ("P3", "visited", "C1"),     # carried (non-functional, old-only)
        ("P4", "born_in", "C3"),     # carried (functional, but new has
                                     # no (P4, born_in) assertion)
    ])
    new = _facts([
        ("P1", "born_in", "C1"),
        ("P2", "born_in", "C2"),     # fresh value -> supersedes
        ("P5", "visited", "C2"),     # added
    ])
    out = snapshot_merge(old, new).to_pandas()
    got = {(r.canonical_subj, r.pred, r.canonical_obj): r.status
           for r in out.itertuples()}
    assert got == {
        ("P1", "born_in", "C1"): "kept",
        ("P2", "born_in", "C2"): "added",
        ("P2", "born_in", "C1"): "superseded",
        ("P3", "visited", "C1"): "carried",
        ("P4", "born_in", "C3"): "carried",
        ("P5", "visited", "C2"): "added",
    }
    # merged KG = everything but superseded; duplicates impossible
    assert len(out) == len(got)


def test_snapshot_merge_noop_recrawl_and_empty_splits():
    """Identical snapshots -> everything 'kept' (exercises the
    empty-old_fn guard); a new snapshot with NO functional facts
    leaves old-only functional facts carried (empty-sp_new guard)."""
    from cpg_ray.functions.fusion import snapshot_merge

    snap = _facts([("P1", "born_in", "C1"), ("P2", "visited", "C2")])
    out = snapshot_merge(snap, snap).to_pandas()
    assert set(out.status) == {"kept"} and len(out) == 2

    old = _facts([("P1", "born_in", "C1")])
    new = _facts([("P9", "visited", "C9")])
    out2 = snapshot_merge(old, new).to_pandas()
    got = {(r.canonical_subj, r.pred, r.canonical_obj): r.status
           for r in out2.itertuples()}
    assert got == {("P1", "born_in", "C1"): "carried",
                   ("P9", "visited", "C9"): "added"}


def test_rdfs_closure_rules_and_provenance():
    """Pins rdfs2 (domain), rdfs3 (range), rdfs9 (subclass walk to
    entity), min-provenance (asserted < domain < range), and that a
    mis-kinded subject picks up BOTH its asserted and inferred types."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.fusion import rdfs_closure

    tri = pd.DataFrame({
        "canonical_subj": ["P1", "C9", "inf:x"],
        "pred": ["born_in", "works_for", "located_in"],
        "canonical_obj": ["C2", "O3", "K4"],
    })
    got = rdfs_closure(rd.from_pandas(tri)).to_pandas()
    m = {(r.entity, r.cls): r.provenance for r in got.itertuples()}

    # P1: asserted person, domain also says person -> asserted wins;
    # rdfs9 walks person -> agent -> entity with the same provenance
    assert m[("P1", "person")] == "asserted"
    assert m[("P1", "agent")] == "asserted"
    assert m[("P1", "entity")] == "asserted"
    # C9 works_for: asserted city AND domain-inferred person coexist
    assert m[("C9", "city")] == "asserted"
    assert m[("C9", "person")] == "domain"
    assert m[("C9", "place")] == "asserted"
    assert m[("C9", "agent")] == "domain"
    # inf:x has no asserted kind; rdfs2 types it city -> place -> entity
    assert m[("inf:x", "city")] == "domain"
    assert m[("inf:x", "place")] == "domain"
    assert ("inf:x", "person") not in m
    # rdfs3 range: O3 gets org via range, K4 country via range — but
    # both are ALSO asserted by prefix, so asserted wins
    assert m[("O3", "org")] == "asserted"
    assert m[("K4", "country")] == "asserted"
    # C2 (object of born_in): range says city, asserted city -> asserted
    assert m[("C2", "city")] == "asserted"


def test_snapshot_merge_broadcast_and_grouped_paths_agree():
    """pair_guard=0 forces the distributed map_groups degrade; both
    phase-2 paths must produce identical status tables."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.fusion import snapshot_merge

    old = rd.from_pandas(pd.DataFrame({
        "canonical_subj": ["P1", "P1", "P2", "O1", "P3"],
        "pred": ["born_in", "likes", "born_in", "based_in", "born_in"],
        "canonical_obj": ["C1", "C9", "C2", "C3", "C4"],
    }))
    new = rd.from_pandas(pd.DataFrame({
        "canonical_subj": ["P1", "P2", "O2"],
        "pred": ["born_in", "born_in", "based_in"],
        "canonical_obj": ["C8", "C2", "C5"],
    }))

    def run(**kw):
        df = snapshot_merge(old, new, **kw).to_pandas()
        return df.sort_values(
            ["canonical_subj", "pred", "canonical_obj"]
        ).reset_index(drop=True)

    fast, slow = run(), run(pair_guard=0)
    pd.testing.assert_frame_equal(fast, slow)
    m = {(r.canonical_subj, r.pred, r.canonical_obj): r.status
         for r in fast.itertuples()}
    assert m[("P1", "born_in", "C1")] == "superseded"  # new value landed
    assert m[("P1", "likes", "C9")] == "carried"       # non-functional
    assert m[("P2", "born_in", "C2")] == "kept"
    assert m[("O1", "based_in", "C3")] == "carried"    # no new value
    assert m[("P3", "born_in", "C4")] == "carried"
    assert m[("O2", "based_in", "C5")] == "added"


def test_property_entailment_rules_and_paths_agree():
    """inverseOf and propertyChainAxiom derivations on a fixture, with
    the broadcast and hash-join chain paths pinned equal
    (chain_guard=0 forces the join)."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.fusion import property_entailment

    tri = rd.from_pandas(pd.DataFrame({
        "canonical_subj": ["P1", "C1", "O1", "P2", "P1"],
        "pred": ["born_in", "located_in", "based_in", "likes",
                 "born_in"],
        "canonical_obj": ["C1", "K1", "C1", "C9", "C1"],
    }))

    def run(**kw):
        df = property_entailment(tri, **kw).to_pandas()
        return df.sort_values(
            ["rule", "canonical_subj", "pred", "canonical_obj"]
        ).reset_index(drop=True)

    got = run()
    m = set(map(tuple, got[["canonical_subj", "pred", "canonical_obj",
                            "rule"]].to_numpy()))
    assert ("C1", "birthplace_of", "P1", "inverse") in m
    assert ("K1", "contains", "C1", "inverse") in m
    assert ("C1", "hosts", "O1", "inverse") in m
    # chain: P1 born_in C1, C1 located_in K1 => born_in_country
    assert ("P1", "born_in_country", "K1",
            "chain:born_in_country") in m
    assert ("O1", "based_in_country", "K1",
            "chain:based_in_country") in m
    # non-declared pred derives nothing; duplicate base fact collapses
    assert not any(p == "likes" or "P2" in (s, o)
                   for s, p, o, _r in m)
    assert len(got) == len(m)

    slow = run(chain_guard=0)
    pd.testing.assert_frame_equal(got, slow[got.columns])


def test_rule_mining_counts_and_shapes():
    """Hand-computable fixture: 3 preds over a 5-entity world.

    facts: p(a,b) p(a,c) q(a,b)          → same p⇒q: n_body 2, sup 1
           r(b,a)                         → inverse p⇒r: p(a,b) rev
           p(a,b) ∧ p2-chain via q(b,d)   → chain p∘q: (a,d)
    """
    from cpg_ray.functions.fusion import rule_mining

    rows = [
        ("p", "a", "b", "u1"), ("p", "a", "c", "u1"),
        ("q", "a", "b", "u2"),
        ("r", "b", "a", "u2"),
        ("q", "b", "d", "u3"),
        # duplicate assertion across urls must NOT double-count
        ("p", "a", "b", "u9"),
    ]
    df = rule_mining(_triples(rows), min_support=1)
    by = {(t.shape, t.body1, t.body2, t.head): (t.n_body, t.support,
                                                t.conf_bp)
          for t in df.itertuples()}
    # same-pair: p(x,y) ⇒ q(x,y): bodies {(a,b),(a,c)}, support (a,b)
    assert by[("same", "p", "", "q")] == (2, 1, 5000)
    assert by[("same", "q", "", "p")] == (2, 1, 5000)
    # inverse: p(y,x) ⇒ r(x,y): r(b,a) with p(a,b) — support 1
    assert by[("inverse", "p", "", "r")] == (2, 1, 5000)
    # chain: p(x,z) ∧ q(z,y) ⇒ ? : body p∘q = {(a,d)} (via z=b);
    # no head matches (a,d) so the chain appears only at support 0
    assert ("chain", "p", "q", "q") not in by
    zero = rule_mining(_triples(rows), min_support=0, emit_zero=True)
    zby = {(t.shape, t.body1, t.body2, t.head): (t.n_body, t.support)
           for t in zero.itertuples()}
    assert zby[("chain", "p", "q", "q")] == (1, 0)
    # emit_zero enumerates the full same/inverse candidate space
    assert sum(1 for k in zby if k[0] == "same") == 6      # 3P2
    assert sum(1 for k in zby if k[0] == "inverse") == 9   # 3²


def test_rule_mining_hub_cap_excludes_hot_mid():
    """A hub mid-entity past hub_cap is excluded from chain bodies on
    both sides of the join — the documented skew posture."""
    from cpg_ray.functions.fusion import rule_mining

    rows = [("p", f"x{i}", "hub", "u") for i in range(8)]
    rows += [("q", "hub", f"y{i}", "u") for i in range(8)]
    rows += [("p", "solo", "mid", "u"), ("q", "mid", "out", "u")]
    full = rule_mining(_triples(rows), min_support=0, emit_zero=True)
    capped = rule_mining(_triples(rows), min_support=0,
                         emit_zero=True, hub_cap=10)
    nb = {(t.body1, t.body2): t.n_body for t in
          full[full["shape"] == "chain"].itertuples()}
    nbc = {(t.body1, t.body2): t.n_body for t in
           capped[capped["shape"] == "chain"].itertuples()}
    assert nb[("p", "q")] == 65          # 8×8 via hub + 1 via mid
    assert nbc[("p", "q")] == 1          # hub (degree 16) excluded


def test_shacl_validate_all_four_constraint_kinds():
    """Tiny world: every constraint class fires exactly once, and
    duplicate assertions across urls never double-count cardinality."""
    from cpg_ray.functions.fusion import shacl_validate

    rows = [
        # P1 born_in two distinct cities → maxCount (1 < 2)
        ("born_in", "P1", "C1", "u1"), ("born_in", "P1", "C2", "u2"),
        ("born_in", "P1", "C1", "u3"),   # dup assertion, same object
        # P2 works_for a city → class violation (expects org)
        ("works_for", "P2", "C1", "u1"),
        # org subject on born_in → domain violation (expects person)
        ("born_in", "O1", "C1", "u1"),
        # C1 located_in K1 — satisfied; C2 has none → minCount
        ("located_in", "C1", "K1", "u1"),
    ]
    df = shacl_validate(_triples(rows))
    got = {(t.constraint, t.focus, t.pred): (t.expected, t.actual,
                                             t.value)
           for t in df.itertuples()}
    assert got[("maxCount", "P1", "born_in")] == ("1", "2", "")
    assert got[("class", "P2", "works_for")] == ("org", "city", "C1")
    assert got[("domain", "O1", "born_in")] == ("person", "org", "C1")
    assert got[("minCount", "C2", "located_in")] == ("1", "0", "")
    # K1 is a country — no shape targets it; O1's missing based_in is
    # min_count 0 so absent
    assert all(t.focus != "K1" for t in df.itertuples())
    assert ("minCount", "O1", "based_in") not in got


def test_rule_mining_driver_and_shuffle_paths_agree():
    from cpg_ray.functions.fusion import rule_mining

    rows = [(p, f"s{i % 9}", f"o{(i * 3) % 7}", "u")
            for i, p in enumerate(["p", "q", "r"] * 30)]
    ds = _triples(rows)
    a = rule_mining(ds, min_support=0, emit_zero=True)
    b = rule_mining(ds, min_support=0, emit_zero=True, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_shacl_driver_and_shuffle_paths_agree():
    from cpg_ray.functions.fusion import shacl_validate

    rows = [
        ("born_in", "P1", "C1", "u1"), ("born_in", "P1", "C2", "u2"),
        ("works_for", "P2", "C1", "u1"), ("born_in", "O1", "C1", "u1"),
        ("located_in", "C1", "K1", "u1"), ("visited", "P3", "C2", "u"),
    ]
    a = shacl_validate(_triples(rows))
    b = shacl_validate(_triples(rows), mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_truth_discovery_trust_transfer_beats_raw_count():
    # dom a/b/c each corroborate P1->C1 AND assert many other
    # corroborated facts (high trust); dom x/y/z/w assert P1->C2 but
    # nothing else (trust stays low).  Raw source count picks C2
    # (4 > 3); after one trust round the corroborated sources' summed
    # trust flips the choice to C1.
    from cpg_ray.functions.fusion import truth_discovery

    rows = []
    for d in ("a", "b", "c"):
        rows.append(("born_in", "P1", "C1", f"http://{d}/1"))
        for k in range(5):
            rows.append(("born_in", f"P{k + 2}", "C9", f"http://{d}/2"))
    for d in ("x", "y", "z", "w"):
        rows.append(("born_in", "P1", "C2", f"http://{d}/1"))
    out = truth_discovery(_triples(rows), rounds=2)
    got = out[out.canonical_subj == "P1"].iloc[0]
    assert got.chosen_obj == "C1"
    assert got.n_sources == 3
    # round-1 scores (= source counts) would have chosen C2
    r1 = truth_discovery(_triples(rows), rounds=1)
    # rounds=1: claim score == n_sources, so C2 wins 4 > 3
    assert r1[r1.canonical_subj == "P1"].iloc[0].chosen_obj == "C2"


def test_truth_discovery_driver_and_shuffle_paths_agree():
    from cpg_ray.functions.fusion import truth_discovery

    rows = [("born_in", f"P{i % 7}", f"C{(i * 2) % 5}",
             f"http://d{i % 4}.test/{i}")
            for i in range(60)]
    a = truth_discovery(_triples(rows), rounds=2)
    b = truth_discovery(_triples(rows), rounds=2, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_truth_discovery_empty_and_tiebreak():
    from cpg_ray.functions.fusion import truth_discovery

    out = truth_discovery(_triples([("visited", "P1", "C1", "u")]))
    assert out.empty and list(out.columns) == [
        "pred", "canonical_subj", "chosen_obj", "claim_score",
        "n_sources"]
    # equal scores -> min object wins
    rows = [("born_in", "P1", "C2", "http://a/1"),
            ("born_in", "P1", "C1", "http://b/1")]
    out = truth_discovery(_triples(rows), rounds=2)
    assert out.iloc[0].chosen_obj == "C1"


# ---------------------------------------------------------------
# Regular path query (fusion.rpq_reach)
# ---------------------------------------------------------------

def _rpq_graph():
    """P1 reaches K1 two ways (born_in city C1 -> K1 at 2 hops, and
    works_for O1 based_in C2 -> K1 at 3) — min_hops must pick 2; K1
    and K2 sit on a located_in CYCLE, so the bounded star must
    terminate and still reach both."""
    return _triples([
        ("born_in", "P1", "C1", "u1"),
        ("works_for", "P1", "O1", "u2"),
        ("based_in", "O1", "C2", "u3"),
        ("located_in", "C1", "K1", "u4"),
        ("located_in", "C2", "K1", "u5"),
        ("located_in", "K1", "K2", "u6"),
        ("located_in", "K2", "K1", "u7"),   # cycle
        ("works_for", "P2", "O1", "u8"),    # employer-only person
        ("born_in", "P3", "C9", "u9"),      # birth city with no country
    ])


def test_rpq_min_hops_cycle_and_branches():
    from cpg_ray.functions.fusion import rpq_reach

    out = rpq_reach(_rpq_graph(), max_hops=4)
    got = {(r.src, r.dst): r.min_hops for r in out.itertuples()}
    # P1: birth city at 1, its country at 2 (beats the 3-hop employer
    # route), K2 via the cycle at 3
    assert got[("P1", "C1")] == 1
    assert got[("P1", "K1")] == 2
    assert got[("P1", "K2")] == 3
    # employer route exists too: C2 at hop 2
    assert got[("P1", "C2")] == 2
    # P2 only via employer: C2 at 2, K1 at 3, K2 at 4 (budget edge)
    assert got[("P2", "C2")] == 2
    assert got[("P2", "K1")] == 3
    assert got[("P2", "K2")] == 4
    # P3's birth city has no located_in — reachable at 1, nothing more
    assert got[("P3", "C9")] == 1
    assert not any(s == "P3" and d != "C9" for s, d in got)
    # cycle never escapes the budget: every hop count <= 4
    assert out.min_hops.max() <= 4


def test_rpq_driver_and_shuffle_paths_agree():
    from cpg_ray.functions.fusion import rpq_reach

    a = rpq_reach(_rpq_graph(), max_hops=4)
    b = rpq_reach(_rpq_graph(), max_hops=4, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_rpq_empty_and_no_start_nodes():
    from cpg_ray.functions.fusion import rpq_reach

    # graph with no person subjects -> empty result, stable schema
    out = rpq_reach(_triples([("located_in", "C1", "K1", "u")]))
    assert out.empty
    assert list(out.columns) == ["src", "dst", "min_hops"]
