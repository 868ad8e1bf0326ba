"""Knowledge-fusion operators over the extracted triple set — the
post-construction validation/conflation steps a web-scale KG build runs
after linking + canonicalization (Knowledge-Vault-style fusion —
public literature: Dong et al. 2014 "Knowledge Vault", truth-discovery
vote aggregation):

- :func:`fact_conflicts` — subjects asserting MULTIPLE distinct objects
  for a functional predicate (born_in has one true value; two values
  mean an extraction or linking error).  The conflict census drives
  extraction-quality dashboards.
- :func:`truth_vote` — per (subject, predicate), pick the object by
  source-weighted vote: each DOMAIN votes once per distinct assertion
  (page-level repetition must not buy votes), weight = a per-source
  reliability table.  The weight table is the learned-model seam; the
  default is the deterministic md5 rule so any SQL engine reproduces
  the vote bit-for-bit.
- :func:`signature_violations` — triples whose (subject-kind,
  object-kind) differs from their predicate's MAJORITY signature
  (domain/range constraint checking; the census of violations is the
  ontology-consistency metric).

Scale shape: everything is combiner-fed groupby over (pred, subj[, obj,
domain]) keys — cardinality bounded by the distinct-assertion count,
never the mention count; the only exchanges move one row per distinct
key.  Majority signatures are a per-predicate argmax over a tiny
(pred × kind × kind) table computed distributed and folded on the
driver (predicates are a handful).  Nothing walks rows in Python.

Reference analog: the reference's consumer checks + TypeManager common
type (SURVEY §2 M12 / A5) validate the graph after construction; this
family is the web-KG reinterpretation of that validation pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# kind from canonical-id prefix, the world's entity-id contract
# (pagegen: P=person O=org C=city K=country; inf:* = inferred)
_KIND = {"P": "person", "O": "org", "C": "city", "K": "country"}

FUNCTIONAL_PREDS = ("born_in", "located_in", "based_in", "works_for")


def domain_weight(domain: str) -> float:
    """Deterministic per-source reliability in [1, 2) — the seam where
    a learned source-credibility model plugs in.  SQL equivalent:
    ``1 + (('0x' || substr(md5(dom),1,8))::BIGINT % 1000) / 1000.0``"""
    h = int(hashlib.md5(domain.encode()).hexdigest()[:8], 16)
    return 1.0 + (h % 1000) / 1000.0


def _kinds(b: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "pred": b.pred,
        "skind": b.canonical_subj.str[0].map(_KIND).fillna("inferred"),
        "okind": b.canonical_obj.str[0].map(_KIND).fillna("inferred"),
    })


def fact_conflicts(triples_ds, preds=FUNCTIONAL_PREDS):
    """(pred, canonical_subj, n_objects, n_mentions) for subjects with
    >1 distinct object under a functional predicate.

    Two-phase: per-batch distinct (pred, subj, obj) partials with
    mention counts → one exchange keyed by assertion → per-(pred, subj)
    rollup of distinct-object and mention counts (tiny: one row per
    conflicted subject).  Returns a pandas DataFrame sorted (pred,
    subj)."""
    from .relational import groupby_agg

    pset = frozenset(preds)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.pred.isin(pset)]
        g = b.groupby(["pred", "canonical_subj", "canonical_obj"],
                      sort=False).size()
        return g.reset_index(name="n")

    assertions = groupby_agg(
        triples_ds.map_batches(partial, batch_format="pandas"),
        ["pred", "canonical_subj", "canonical_obj"],
        [("n", "sum", "n_mentions")],
    ).to_pandas()
    if assertions.empty:
        return pd.DataFrame({
            "pred": pd.Series(dtype="object"),
            "canonical_subj": pd.Series(dtype="object"),
            "n_objects": pd.Series(dtype="int64"),
            "n_mentions": pd.Series(dtype="int64")})
    per_subj = assertions.groupby(["pred", "canonical_subj"]).agg(
        n_objects=("canonical_obj", "nunique"),
        n_mentions=("n_mentions", "sum"))
    out = per_subj[per_subj.n_objects > 1].reset_index()
    out["n_objects"] = out["n_objects"].astype("int64")
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return out.sort_values(["pred", "canonical_subj"]).reset_index(drop=True)


def truth_vote(triples_ds, preds=FUNCTIONAL_PREDS, *, ndigits: int = 6,
               weights: dict | None = None):
    """Source-weighted truth selection: per (pred, canonical_subj) the
    object with the highest summed DISTINCT-domain reliability weight,
    min-object tie-break.  Returns (pred, canonical_subj, chosen_obj,
    vote_weight, n_sources), vote_weight rounded to ``ndigits``
    (per-assertion weight sums are associativity-sensitive doubles).

    One pass extracts (assertion, domain) distinct pairs per batch;
    one exchange merges them (a domain asserting the same fact on two
    pages in two blocks collapses here); the weighted rollup and
    argmax run on one row per distinct assertion."""
    from .relational import groupby_agg

    pset = frozenset(preds)
    wget = (weights or {}).get if weights else None

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.pred.isin(pset)]
        if b.empty:
            return pd.DataFrame({
                "pred": pd.Series(dtype="object"),
                "canonical_subj": pd.Series(dtype="object"),
                "canonical_obj": pd.Series(dtype="object"),
                "dom": pd.Series(dtype="object"),
                "one": pd.Series(dtype="int64")})
        dom = b.url.str.extract(r"//([^/]+)/", expand=False)
        d = pd.DataFrame({"pred": b.pred,
                          "canonical_subj": b.canonical_subj,
                          "canonical_obj": b.canonical_obj,
                          "dom": dom}).drop_duplicates()
        d["one"] = 1
        return d

    # max-merge the per-batch indicator: the same (assertion, domain)
    # seen in several blocks still counts ONE vote
    pairs = groupby_agg(
        triples_ds.map_batches(partial, batch_format="pandas"),
        ["pred", "canonical_subj", "canonical_obj", "dom"],
        [("one", "max", "one")],
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame({
            "pred": pd.Series(dtype="object"),
            "canonical_subj": pd.Series(dtype="object"),
            "chosen_obj": pd.Series(dtype="object"),
            "vote_weight": pd.Series(dtype="float64"),
            "n_sources": pd.Series(dtype="int64")})
    pairs["w"] = [wget(d, domain_weight(d)) if wget else domain_weight(d)
                  for d in pairs["dom"]]
    votes = pairs.groupby(
        ["pred", "canonical_subj", "canonical_obj"]).agg(
        vote_weight=("w", "sum"), n_sources=("dom", "nunique"))
    votes = votes.reset_index()
    votes["vote_weight"] = votes["vote_weight"].round(ndigits)
    win = (votes.sort_values(
        ["pred", "canonical_subj", "vote_weight", "canonical_obj"],
        ascending=[True, True, False, True], kind="mergesort")
        .groupby(["pred", "canonical_subj"], sort=False).head(1))
    win = win.rename(columns={"canonical_obj": "chosen_obj"})
    win["n_sources"] = win["n_sources"].astype("int64")
    return win.sort_values(["pred", "canonical_subj"]).reset_index(
        drop=True)[["pred", "canonical_subj", "chosen_obj",
                    "vote_weight", "n_sources"]]


def signature_violations(triples_ds):
    """(pred, skind, okind, n) for every kind pair that is NOT its
    predicate's majority signature (max count, lexicographic kind-pair
    tie-break).  One combiner-fed exchange over (pred, skind, okind) —
    a table bounded by preds × kinds² — then a driver argmax over that
    tiny table."""
    from .relational import groupby_agg

    counts = groupby_agg(
        triples_ds.map_batches(_kinds, batch_format="pandas"),
        ["pred", "skind", "okind"],
        [("pred", "count", "n")],
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame({
            "pred": pd.Series(dtype="object"),
            "skind": pd.Series(dtype="object"),
            "okind": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64")})
    major = (counts.sort_values(["pred", "n", "skind", "okind"],
                                ascending=[True, False, True, True],
                                kind="mergesort")
             .groupby("pred", sort=False).head(1)[
                 ["pred", "skind", "okind"]])
    major["__major"] = True
    out = counts.merge(major, on=["pred", "skind", "okind"], how="left")
    out = out[out["__major"].isna()].drop(columns="__major")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["pred", "skind", "okind"]).reset_index(drop=True)


# Static ontology for RDFS entailment over the world's four
# predicates: the subclass DAG and per-predicate domain/range
# declarations.  KB-sized by nature (an ontology is authored, not
# mined), so broadcasting its transitive closure is the scale-correct
# posture — the closure never grows with the corpus.
RDFS_SUBCLASS = (("person", "agent"), ("org", "agent"),
                 ("city", "place"), ("country", "place"),
                 ("agent", "entity"), ("place", "entity"))
RDFS_DOMAIN = {"born_in": "person", "works_for": "person",
               "based_in": "org", "located_in": "city"}
RDFS_RANGE = {"born_in": "city", "works_for": "org",
              "based_in": "city", "located_in": "country"}


def rdfs_closure(triples_ds, *, subclass=RDFS_SUBCLASS,
                 domain=RDFS_DOMAIN, range_=RDFS_RANGE,
                 mode: str = "auto"):
    """RDFS entailment materialization over the triple set (W3C RDF
    Schema semantics, public): every type fact derivable from

    - asserted types (entity-id prefix → class, the world's contract),
    - **rdfs2** domain(p, C) ∧ (s, p, o) ⇒ type(s, C),
    - **rdfs3** range(p, C) ∧ (s, p, o) ⇒ type(o, C),
    - **rdfs9** type(x, C) ∧ C ⊑* D ⇒ type(x, D) (reflexive-transitive
      subclass closure),

    with per-fact provenance = min('asserted' | 'domain' | 'range')
    over all derivations (asserted wins; deterministic).

    Scale shape: the subclass closure is computed on the driver (the
    ontology is KB-sized) and applied inside ONE ``map_batches`` pass
    that emits base + superclass facts per batch; the only exchange is
    the final distinct (groupby min over (entity, class)) — mention
    multiplicity collapses inside each batch first.  Returns a Dataset
    (entity, cls, provenance)."""
    from .relational import groupby_agg

    # reflexive-transitive closure of the (tiny) subclass DAG
    up: dict[str, set] = {}
    for c in {c for e in subclass for c in e} | set(domain.values()) \
            | set(range_.values()):
        up[c] = {c}
    changed = True
    while changed:
        changed = False
        for sub, sup in subclass:
            new = up[sub] | up.get(sup, {sup})
            if new != up[sub]:
                up[sub] = new
                changed = True

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ent_col, cls_of, src in (
            ("canonical_subj", None, "asserted"),
            ("canonical_obj", None, "asserted"),
            ("canonical_subj", domain, "domain"),
            ("canonical_obj", range_, "range"),
        ):
            e = b[ent_col]
            if cls_of is None:
                c = e.str[0].map(_KIND)
            else:
                c = b["pred"].map(cls_of)
            keep = c.notna()
            rows.append(pd.DataFrame({
                "entity": e[keep].to_numpy(),
                "cls": c[keep].to_numpy(),
                "provenance": src,
            }))
        base = pd.concat(rows, ignore_index=True).drop_duplicates()
        # rdfs9: expand along the broadcast closure
        out = []
        for c, sups in up.items():
            hit = base[base.cls == c]
            if not len(hit):
                continue
            for d in sorted(sups):
                out.append(pd.DataFrame({
                    "entity": hit.entity.to_numpy(),
                    "cls": d,
                    "provenance": hit.provenance.to_numpy(),
                }))
        allf = pd.concat(out, ignore_index=True)
        # batch-local distinct-min shrinks the exchange
        return (allf.groupby(["entity", "cls"], sort=False)["provenance"]
                .min().reset_index())

    facts = triples_ds.map_batches(emit, batch_format="pandas")
    return groupby_agg(facts, ["entity", "cls"],
                       [("provenance", "min", "provenance")], mode=mode)


# OWL-style property axioms over the world's predicates (authored,
# KB-sized — same posture as the RDFS ontology above).
OWL_INVERSE = {"located_in": "contains", "born_in": "birthplace_of",
               "works_for": "employs", "based_in": "hosts"}
# property chains (owl:propertyChainAxiom): p1 ∘ p2 ⇒ out
OWL_CHAINS = (("born_in", "located_in", "born_in_country"),
              ("based_in", "located_in", "based_in_country"))


# RPQ automaton for the headline geo-reach query: a person reaches a
# geo anchor via employer city (works_for · based_in) or birthplace
# (born_in), then climbs the containment hierarchy (located_in*,
# bounded by the hop budget) — the SPARQL 1.1 property-path shape
# `(works_for/based_in | born_in) / located_in*`.
RPQ_GEO_TRANSITIONS = (("q0", "works_for", "q1"),
                       ("q0", "born_in", "acc"),
                       ("q1", "based_in", "acc"),
                       ("acc", "located_in", "acc"))


def rpq_reach(triples_ds, *, transitions=RPQ_GEO_TRANSITIONS,
              start_state: str = "q0", start_prefix: str = "P",
              accept_states=("acc",), max_hops: int = 4,
              mode: str = "auto", driver_limit: int = 2_000_000):
    """Regular path query over the fact set via the product-automaton
    BFS (Mendelzon & Wood, SIAM J. Comput. 1995; the evaluation model
    behind SPARQL 1.1 property paths — public): ``transitions`` is an
    NFA as (state, pred, next_state) triples; starting from every
    distinct subject whose id starts with ``start_prefix`` in
    ``start_state``, expand hop levels F_h = {(src, o, s') :
    (src, n, st) ∈ F_{h-1}, (n, p, o) ∈ facts, (st, p, s') ∈ NFA}
    up to ``max_hops``; report each (src, dst) first reached in an
    accepting state with its min hop count.  Exact-hop level sets
    (DISTINCT per level) make the engine a literal transcription of
    the unrolled per-(hop, state) SQL twin — min-hop over exact-h
    levels equals BFS first arrival, and the hop budget bounds any
    Kleene-star cycle (a located_in loop terminates by construction,
    pinned in pytest).

    Scale shape: the NFA is a constant (broadcast in the transform
    closure); each hop is ONE composite hash_join of the frontier with
    the distinct fact set keyed on the frontier node — never an
    all-to-all on predicates — followed by a combiner-fed per-level
    DISTINCT, and the accept union finishes with one pre-combined
    min groupby.  The guarded driver twin (facts ≤ ``driver_limit``)
    runs the same levels as pandas merges — each Ray join spins a
    fresh aggregator fleet (~1-2 s fixed) that dwarfs the merge cost
    at entity-vocabulary scale; both paths are pinned equal in
    pytest.

    Reference analog: Graph.kt's MATCH chain evaluation generalized
    from fixed-length chains (rel_chain) and single-etype stars
    (var_length_reach) to arbitrary regular languages over etypes.

    Returns a pandas frame (src, dst, min_hops int64) sorted."""
    from .relational import distinct_on, groupby_agg, hash_join

    cols = ["canonical_subj", "pred", "canonical_obj"]
    acc = set(accept_states)
    tdf = pd.DataFrame(list(transitions),
                       columns=["state", "p", "nstate"])

    def to_spo(b: pd.DataFrame) -> pd.DataFrame:
        return (b[cols].drop_duplicates()
                .rename(columns={"canonical_subj": "s", "pred": "p",
                                 "canonical_obj": "o"}))

    d = distinct_on(
        triples_ds.map_batches(to_spo, batch_format="pandas"),
        ["s", "p", "o"], mode=mode).materialize()

    def finish(levels: list[pd.DataFrame]) -> pd.DataFrame:
        if not levels:
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "dst": pd.Series(dtype="object"),
                                 "min_hops": pd.Series(dtype="int64")})
        allacc = pd.concat(levels, ignore_index=True)
        out = (allacc.groupby(["src", "dst"], as_index=False)["h"]
               .min().rename(columns={"h": "min_hops"}))
        out["min_hops"] = out["min_hops"].astype("int64")
        return (out.sort_values(["src", "dst"])
                .reset_index(drop=True))

    if mode != "shuffle" and d.count() <= driver_limit:
        f = d.to_pandas()
        starts = np.unique(f.loc[f["s"].str.startswith(start_prefix),
                                 "s"].to_numpy(dtype=object))
        cur = pd.DataFrame({"src": starts, "node": starts,
                            "state": start_state})
        levels = []
        for h in range(1, max_hops + 1):
            if not len(cur):
                break
            step = (cur.merge(f, left_on="node", right_on="s")
                    .merge(tdf, on=["state", "p"]))
            cur = (step[["src", "o", "nstate"]]
                   .rename(columns={"o": "node", "nstate": "state"})
                   .drop_duplicates())
            hit = cur[cur["state"].isin(acc)]
            if len(hit):
                levels.append(pd.DataFrame(
                    {"src": hit["src"].to_numpy(),
                     "dst": hit["node"].to_numpy(), "h": h}))
        return finish(levels)

    # distributed: one frontier×facts join + per-level DISTINCT per hop
    starts = distinct_on(
        d.map_batches(
            lambda b: pd.DataFrame(
                {"src": (v := b.loc[b["s"].str.startswith(start_prefix),
                                    "s"].to_numpy(dtype=object)),
                 "node": v,
                 "state": start_state}),
            batch_format="pandas"),
        ["src", "node", "state"], mode=mode)
    cur = starts.materialize()
    levels = []
    for h in range(1, max_hops + 1):
        if cur.count() == 0:
            break
        step = hash_join(cur, d, on="node", right_on="s",
                         empty_safe=True)

        def apply_nfa(b: pd.DataFrame) -> pd.DataFrame:
            m = b.merge(tdf, on=["state", "p"])
            return pd.DataFrame(
                {"src": m["src"].to_numpy(),
                 "node": m["o"].to_numpy(),
                 "state": m["nstate"].to_numpy()})

        cur = distinct_on(
            step.map_batches(apply_nfa, batch_format="pandas"),
            ["src", "node", "state"], mode=mode).materialize()
        hit = cur.map_batches(
            lambda b, _h=h: (b.loc[b["state"].isin(acc),
                                   ["src", "node"]]
                             .rename(columns={"node": "dst"})
                             .assign(h=np.int64(_h))),
            batch_format="pandas").to_pandas()
        if len(hit):
            levels.append(hit)
    return finish(levels)


def property_entailment(triples_ds, *, inverse=OWL_INVERSE,
                        chains=OWL_CHAINS, mode: str = "auto",
                        chain_guard: int = 5_000_000):
    """OWL-style property entailment over the extracted triples (W3C
    OWL 2 RL rules, public): **inverseOf** — (s, p, o) ⇒ (o, p⁻, s)
    for every declared inverse — and **propertyChainAxiom** —
    (s, p1, x) ∧ (x, p2, o) ⇒ (s, out, o) for every declared chain
    (e.g. born_in ∘ located_in ⇒ born_in_country, the classic
    geo-lifting inference).  Returns the DISTINCT derived facts
    (canonical_subj, pred, canonical_obj, rule).

    Scale shape: inverses are batch-local rewrites (no exchange).
    Each chain's p2 side (e.g. city → country) is bounded by the
    entity vocabulary, not the corpus — collected under
    ``chain_guard`` and broadcast into the p1 probe pass; the final
    distinct is ONE groupby.  Past the guard the p2 side is joined
    with the hash-partitioned exchange instead."""
    from .relational import (broadcast_join, groupby_agg, hash_join,
                             _collect_limited, GuardExceeded)

    chains = list(chains)
    inv = dict(inverse)

    def inv_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["pred"].isin(inv)]
        return pd.DataFrame({
            "canonical_subj": m["canonical_obj"].to_numpy(),
            "pred": m["pred"].map(inv).to_numpy(),
            "canonical_obj": m["canonical_subj"].to_numpy(),
            "rule": "inverse",
        }).drop_duplicates()

    parts = [triples_ds.map_batches(inv_rows, batch_format="pandas")]
    for p1, p2, out_pred in chains:
        right = triples_ds.map_batches(
            lambda b, p2=p2: b[b["pred"] == p2][
                ["canonical_subj", "canonical_obj"]
            ].drop_duplicates().rename(columns={
                "canonical_subj": "__mid", "canonical_obj": "__obj"}),
            batch_format="pandas")
        left = triples_ds.map_batches(
            lambda b, p1=p1: b[b["pred"] == p1][
                ["canonical_subj", "canonical_obj"]
            ].drop_duplicates().rename(columns={
                "canonical_obj": "__mid"}),
            batch_format="pandas")
        try:
            small = _collect_limited(
                right, chain_guard,
                f"property_entailment chain {out_pred}"
            ).drop_duplicates()
            joined = broadcast_join(left, small, left_on="__mid")
        except GuardExceeded:
            if mode == "driver":
                raise
            joined = hash_join(left.materialize(),
                               right.materialize(), on="__mid")
        parts.append(joined.map_batches(
            lambda b, out_pred=out_pred: pd.DataFrame({
                "canonical_subj": b["canonical_subj"].to_numpy(),
                "pred": out_pred,
                "canonical_obj": b["__obj"].to_numpy(),
                "rule": f"chain:{out_pred}",
            }).drop_duplicates(), batch_format="pandas"))
    allp = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    keys = ["canonical_subj", "pred", "canonical_obj", "rule"]
    return groupby_agg(allp, keys, [("rule", "count", "__n")],
                       mode=mode).map_batches(
        lambda b: b[keys], batch_format="pandas")


def snapshot_merge(old_ds, new_ds, *,
                   keys=("canonical_subj", "pred", "canonical_obj"),
                   functional=FUNCTIONAL_PREDS, mode: str = "auto",
                   pair_guard: int = 5_000_000):
    """SCD-style KG upsert of a re-crawl into an existing snapshot —
    the incremental-maintenance step after :func:`~cpg_ray.functions.
    graphquery.triple_diff`'s census (SURVEY §2 D2 union-of-node-sets
    analog; fusion semantics from the same Knowledge-Vault lineage as
    :func:`truth_vote`): the new crawl's facts land, facts seen by
    both survive, and an old fact is RETIRED only when a functional
    predicate (one true value — ``born_in`` etc.) got a fresh value
    for the same subject; old facts outside that case carry over
    (a page dropping out of the crawl frontier must not erase its
    facts — absence of evidence).

    Returns a Dataset of ``keys + (status,)`` over the DISTINCT fact
    sets, status ∈ {kept, added, superseded, carried}; the merged KG
    is every row with ``status != 'superseded'``.

    Shape: TWO exchanges, ZERO joins — the tagged-union rewrite of
    the original four-join formulation (whose concurrent
    Join(num_partitions=CPUs) aggregator fleets deadlocked one DAG at
    32 CPUs and cost ~13 s serialized at sf0.1; this shape runs the
    same semantics in a fraction of that):
    1. both sides project to distinct keys tagged (in_a, in_b);
       ONE groupby-max over the fact key folds the sides together
       (kept = both, added = new-only, old-only = candidates).
    2. non-functional rows finalize batch-locally; functional rows
       co-locate per (subject, pred) with ONE map_groups pass —
       an old-only row is superseded iff its group contains any
       new-side fact."""
    from .relational import groupby_agg

    keys = list(keys)
    fset = frozenset(functional)
    subj, pred = keys[0], keys[1]

    def tagged(in_a: int, in_b: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = b[keys].drop_duplicates().copy()
            out["in_a"] = np.int64(in_a)
            out["in_b"] = np.int64(in_b)
            return out

        return f

    ta = old_ds.map_batches(tagged(1, 0), batch_format="pandas")
    tb = new_ds.map_batches(tagged(0, 1), batch_format="pandas")
    facts = groupby_agg(ta.union(tb), keys,
                        [("in_a", "max", "in_a"),
                         ("in_b", "max", "in_b")], mode=mode)

    def base_status(b: pd.DataFrame) -> pd.DataFrame:
        st = np.where(b["in_a"].to_numpy() > 0,
                      np.where(b["in_b"].to_numpy() > 0, "kept", "old"),
                      "added")
        return b.assign(status=st)

    staged = facts.map_batches(base_status, batch_format="pandas")
    nonfn = staged.map_batches(
        lambda b: b[~b[pred].isin(fset)].assign(
            status=b.loc[~b[pred].isin(fset), "status"].replace(
                {"old": "carried"}))[keys + ["status"]],
        batch_format="pandas")

    # phase 2: an old-only functional fact is superseded iff the NEW
    # side asserts that (subject, pred).  The new-pair set is bounded
    # by distinct functional subjects (entity-vocabulary scale, not
    # mention scale) — broadcast it under a guard; past the guard,
    # degrade to the per-(subj, pred) map_groups co-location (one
    # SORT exchange — measured 15+ s at sf0.1 vs ~1 s broadcast, which
    # is why broadcast is the happy path).
    import ray

    fn_rows = staged.map_batches(
        lambda b: b[b[pred].isin(fset)], batch_format="pandas"
    ).materialize()
    new_pairs_ds = groupby_agg(
        fn_rows.map_batches(
            lambda b: b[b["in_b"] > 0][[subj, pred]].drop_duplicates(),
            batch_format="pandas"),
        [subj, pred], [(pred, "count", "one")], mode=mode)
    pair_limit = pair_guard
    pairs: set | None = set()
    n = 0
    for b in new_pairs_ds.iter_batches(batch_format="pandas",
                                       batch_size=None):
        n += len(b)
        if n > pair_limit:
            pairs = None
            break
        pairs.update(zip(b[subj], b[pred]))

    if pairs is not None:
        ref = ray.put(pairs)
        from .relational import bcast_get

        def resolve(b: pd.DataFrame) -> pd.DataFrame:
            pset = bcast_get(ref)
            hit = pd.Series(
                list(zip(b[subj], b[pred])), index=b.index
            ).isin(pset) if len(b) else pd.Series([], dtype=bool)
            st = np.where(b["status"].to_numpy() == "old",
                          np.where(hit.to_numpy(), "superseded",
                                   "carried"),
                          b["status"].to_numpy())
            return b.assign(status=st)[keys + ["status"]]

        fn = fn_rows.map_batches(resolve, batch_format="pandas")
    else:  # guard tripped: distributed per-(subj, pred) co-location
        def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
            new_any = bool((g["in_b"] > 0).any())
            st = g["status"].replace(
                {"old": "superseded" if new_any else "carried"})
            return g.assign(status=st)[keys + ["status"]]

        fn = (fn_rows.groupby([subj, pred])
              .map_groups(resolve_group, batch_format="pandas"))
    return nonfn.union(fn)


def rule_mining(triples_ds, *, min_support: int = 5,
                conf_scale: int = 10_000, hub_cap: int = 100_000,
                emit_zero: bool = False, mode: str = "auto",
                driver_limit: int = 2_000_000):
    """AMIE-shape horn-rule mining over the distinct fact set
    (Galárraga et al., WWW'13 — public).  Three closed rule shapes
    over the predicate vocabulary:

    - ``same``     p1(x, y) ⇒ p2(x, y)          (p1 ≠ p2)
    - ``inverse``  p1(y, x) ⇒ p2(x, y)          (p1 = p2 detects
      symmetric predicates, kept)
    - ``chain``    p1(x, z) ∧ p2(z, y) ⇒ p3(x, y)

    For each rule: ``n_body`` = |distinct (x, y) satisfying the
    body|, ``support`` = |body pairs also asserted with the head
    predicate|, ``conf_bp`` = support · conf_scale // n_body — an
    exact integer (hash-stable cross-engine; the standard-confidence
    ratio in basis points).  Rules with support < ``min_support``
    drop.  Reference analog: the pass-over-graph statistics family
    (StatisticsCollectionPass.kt) lifted to schema induction.

    Scale shape: everything runs over D = DISTINCT (subj, pred, obj)
    — ONE combiner-fed exchange (``distinct_on``), after which every
    per-predicate pair count is a composite-key ``hash_join`` of D
    with itself (keyed by the shared variables, never all-to-all on
    predicates) followed by combiner-fed ``groupby_agg`` down to at
    most |P|²/|P|³ driver rows.  The chain body joins on the shared
    mid variable z; hub mids whose in×out fan-out would explode the
    exchange (z-degree > ``hub_cap``) are EXCLUDED on both engine and
    oracle sides (the documented skew posture — at web scale a hot z
    contributes deg²(z) body rows; capping it bounds the join, and
    the cap is part of the rule semantics, not a silent truncation).

    The happy path is a guarded DRIVER finish: the distinct fact set
    is entity-vocabulary × predicate bounded (far smaller than the
    mention-level corpus), and each Ray ``hash_join`` spins up a fresh
    aggregator fleet (~1-2 s fixed — BASELINE.md) that dwarfs the
    pandas merges at that size (measured 13 s distributed vs ~1 s
    driver at sf0.1's ~3k distinct facts).  Past ``driver_limit``
    distinct facts (or with ``mode='shuffle'``) the exchange path
    above runs instead; both are pinned equal in pytest.
    """
    from .relational import distinct_on, groupby_agg, hash_join

    cols = ["canonical_subj", "pred", "canonical_obj"]

    def to_xy(b: pd.DataFrame) -> pd.DataFrame:
        return (b[cols].drop_duplicates()
                .rename(columns={"canonical_subj": "x", "pred": "p",
                                 "canonical_obj": "y"}))

    d = distinct_on(
        triples_ds.map_batches(to_xy, batch_format="pandas"),
        ["x", "p", "y"], mode=mode).materialize()

    if mode != "shuffle" and d.count() <= driver_limit:
        ddf = d.to_pandas()
        nb = (ddf.groupby("p").size().rename("n_body")
              .reset_index())
        same = (ddf.merge(ddf.rename(columns={"p": "p2"}),
                          on=["x", "y"])
                .groupby(["p", "p2"]).size().rename("support")
                .reset_index())
        same = same[same["p"] != same["p2"]]
        inv = (ddf.merge(ddf.rename(columns={"x": "y", "y": "x",
                                             "p": "p2"}),
                         on=["x", "y"])
               .groupby(["p2", "p"]).size().rename("support")
               .reset_index())
        zdeg = pd.concat([ddf["y"], ddf["x"]],
                         ignore_index=True).value_counts()
        hot = set(zdeg[zdeg > hub_cap].index)
        left = ddf[~ddf["y"].isin(hot)].rename(
            columns={"p": "p1", "y": "z"})
        right = ddf[~ddf["x"].isin(hot)].rename(
            columns={"p": "p2", "x": "z"})
        body_df = (left.merge(right, on="z")[["p1", "p2", "x", "y"]]
                   .drop_duplicates())
        nb_chain = (body_df.groupby(["p1", "p2"]).size()
                    .rename("n_body").reset_index())
        chain = (body_df.merge(ddf.rename(columns={"p": "p3"}),
                               on=["x", "y"])
                 .groupby(["p1", "p2", "p3"]).size()
                 .rename("support").reset_index())
        n_body_of = dict(zip(nb["p"], nb["n_body"].astype(np.int64)))
        return _assemble_rules(same, inv, chain, nb_chain, n_body_of,
                               min_support=min_support,
                               conf_scale=conf_scale,
                               emit_zero=emit_zero)

    # per-predicate body sizes (distinct pairs per p — D is distinct)
    nb = groupby_agg(
        d.map_batches(lambda b: b.assign(__one=1)[["p", "__one"]],
                      batch_format="pandas"),
        ["p"], [("__one", "sum", "n_body")], mode=mode).to_pandas()
    n_body_of = dict(zip(nb["p"], nb["n_body"].astype(np.int64)))

    def pair_counts(joined, left_p: str, right_p: str) -> pd.DataFrame:
        cnt = joined.map_batches(
            lambda b: (b.groupby([left_p, right_p], sort=False)
                       .size().rename("__n").reset_index()),
            batch_format="pandas")
        return groupby_agg(cnt, [left_p, right_p],
                           [("__n", "sum", "support")],
                           mode=mode).to_pandas()

    # same-pair: join D with itself on the full (x, y) pair
    d2 = d.map_batches(lambda b: b.rename(columns={"p": "p2"}),
                       batch_format="pandas")
    same = pair_counts(
        hash_join(d, d2.materialize(), on=["x", "y"],
                  empty_safe=True), "p", "p2")
    same = same[same["p"] != same["p2"]]

    # inverse: join D with its reversal on (x, y)
    drev = d.map_batches(
        lambda b: b.rename(columns={"x": "y", "y": "x", "p": "p2"}),
        batch_format="pandas")
    inv = pair_counts(
        hash_join(d, drev.materialize(), on=["x", "y"],
                  empty_safe=True), "p2", "p")

    # chain body: p1(x, z) ∧ p2(z, y), hub mids excluded on BOTH sides
    zdeg = groupby_agg(
        d.map_batches(
            lambda b: pd.concat([
                b["y"].rename("z").to_frame().assign(__one=1),
                b["x"].rename("z").to_frame().assign(__one=1),
            ], ignore_index=True), batch_format="pandas"),
        ["z"], [("__one", "sum", "zd")], mode=mode)
    hot_df = zdeg.map_batches(
        lambda b: b.loc[b["zd"] > hub_cap, ["z"]],
        batch_format="pandas").to_pandas()
    # an all-filtered Ray dataset loses its schema — empty ⇒ no hubs
    hot = set(hot_df["z"]) if "z" in hot_df.columns else set()

    left = d.map_batches(
        lambda b: b[~b["y"].isin(hot)].rename(
            columns={"p": "p1", "y": "z"}),
        batch_format="pandas")
    right = d.map_batches(
        lambda b: b[~b["x"].isin(hot)].rename(
            columns={"p": "p2", "x": "z"}),
        batch_format="pandas")
    body = distinct_on(
        hash_join(left.materialize(), right.materialize(), on=["z"],
                  empty_safe=True).map_batches(lambda b: b[["p1", "p2", "x", "y"]],
                                batch_format="pandas"),
        ["p1", "p2", "x", "y"], mode=mode).materialize()
    nb_chain = groupby_agg(
        body.map_batches(lambda b: b.assign(__one=1),
                         batch_format="pandas"),
        ["p1", "p2"], [("__one", "sum", "n_body")], mode=mode
    ).to_pandas()
    dhead = d.map_batches(lambda b: b.rename(columns={"p": "p3"}),
                          batch_format="pandas")
    chain = groupby_agg(
        hash_join(body, dhead.materialize(), on=["x", "y"],
                  empty_safe=True).map_batches(
            lambda b: (b.groupby(["p1", "p2", "p3"], sort=False)
                       .size().rename("__n").reset_index()),
            batch_format="pandas"),
        ["p1", "p2", "p3"], [("__n", "sum", "support")],
        mode=mode).to_pandas()
    return _assemble_rules(same, inv, chain, nb_chain, n_body_of,
                           min_support=min_support,
                           conf_scale=conf_scale, emit_zero=emit_zero)


def _assemble_rules(same, inv, chain, nb_chain, n_body_of, *,
                    min_support, conf_scale, emit_zero):
    """Shared rule-table assembly for both rule_mining finishes."""

    frames = []
    if len(same):
        frames.append(pd.DataFrame({
            "shape": "same", "body1": same["p"].to_numpy(),
            "body2": "", "head": same["p2"].to_numpy(),
            "n_body": same["p"].map(n_body_of).astype(np.int64),
            "support": same["support"].astype(np.int64)}))
    if len(inv):
        frames.append(pd.DataFrame({
            "shape": "inverse", "body1": inv["p2"].to_numpy(),
            "body2": "", "head": inv["p"].to_numpy(),
            # |distinct (x, y) with p1(y, x)| = |distinct p1 pairs|
            "n_body": inv["p2"].map(n_body_of).astype(np.int64),
            "support": inv["support"].astype(np.int64)}))
    if len(chain):
        nbmap = {(r.p1, r.p2): int(r.n_body)
                 for r in nb_chain.itertuples()}
        frames.append(pd.DataFrame({
            "shape": "chain", "body1": chain["p1"].to_numpy(),
            "body2": chain["p2"].to_numpy(),
            "head": chain["p3"].to_numpy(),
            "n_body": [nbmap[(a, b)] for a, b in
                       zip(chain["p1"], chain["p2"])],
            "support": chain["support"].astype(np.int64)}))
    if emit_zero:
        # enumerate the FULL candidate space from the (tiny, driver-
        # held) predicate vocabulary so zero-support rules appear —
        # the schema-induction view: "which implications does the KG
        # refute?"  n_body comes from the counted bodies; candidates
        # whose body is empty stay out (confidence is undefined).
        preds = sorted(n_body_of)
        cands = [
            pd.DataFrame([("same", a, "", b, n_body_of[a])
                          for a in preds for b in preds if a != b],
                         columns=["shape", "body1", "body2", "head",
                                  "n_body"]),
            pd.DataFrame([("inverse", a, "", b, n_body_of[a])
                          for a in preds for b in preds],
                         columns=["shape", "body1", "body2", "head",
                                  "n_body"]),
            pd.DataFrame([("chain", r.p1, r.p2, h, int(r.n_body))
                          for r in nb_chain.itertuples()
                          for h in preds],
                         columns=["shape", "body1", "body2", "head",
                                  "n_body"]),
        ]
        cand = pd.concat(cands, ignore_index=True)
        counted = (pd.concat(frames, ignore_index=True)
                   [["shape", "body1", "body2", "head", "support"]]
                   if frames else None)
        out = (cand.merge(counted, how="left",
                          on=["shape", "body1", "body2", "head"])
               if counted is not None else cand.assign(support=0))
        out["support"] = out["support"].fillna(0)
    else:
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(columns=["shape", "body1", "body2", "head",
                                  "n_body", "support"])
    out = out[out["support"] >= min_support].copy()
    out["n_body"] = out["n_body"].astype(np.int64)
    out["support"] = out["support"].astype(np.int64)
    out["conf_bp"] = (out["support"] * conf_scale
                      // out["n_body"]).astype(np.int64)
    return (out.sort_values(["shape", "body1", "body2", "head"])
            .reset_index(drop=True))


# SHACL-lite node shapes over the world's kinds (W3C SHACL semantics,
# public; authored and KB-sized — same posture as the RDFS ontology).
# kind → pred → (min_count, max_count, range_kind); None = unbounded.
SHACL_SHAPES = {
    "person": {"born_in": (0, 1, "city"),
               "works_for": (0, None, "org"),
               "visited": (0, None, "city")},
    "org": {"based_in": (0, 1, "city")},
    "city": {"located_in": (1, 1, "country")},
}
# sh:targetSubjectsOf-style domain expectation per predicate
SHACL_DOMAIN = {"born_in": "person", "works_for": "person",
                "visited": "person", "based_in": "org",
                "located_in": "city"}


def shacl_validate(triples_ds, *, shapes=SHACL_SHAPES,
                   domain_of=SHACL_DOMAIN, mode: str = "auto",
                   driver_limit: int = 2_000_000):
    """SHACL-lite shape validation over the distinct fact set: every
    constraint violation as a row

    ``(focus, kind, pred, constraint, expected, actual, value)``

    with constraint ∈ {class, domain, maxCount, minCount} —

    - **class** (sh:class): object of a shaped property must be of the
      declared range kind; one row per offending (focus, pred, value).
    - **domain**: a fact whose subject kind differs from the
      predicate's declared subject kind.
    - **maxCount** (sh:maxCount): distinct-object count per
      (focus, pred) above the declared cap.
    - **minCount** (sh:minCount): a focus node of the shaped kind with
      NO fact for a required predicate (closed-world over the entity
      universe = every id seen as subject or object).

    Scale shape: class/domain checks are batch-local emissions over
    the distinct facts (no exchange beyond the one distinct);
    cardinality is a combiner-fed ``groupby_agg`` keyed by (focus,
    pred); minCount is a distributed ``left_anti`` join of the
    kind-filtered entity universe against the distinct subject set —
    nothing vocabulary-sized lands on the driver.  The shapes table
    itself is tiny and ships inside the batch closures."""
    from .relational import (default_n_buckets, distinct_on,
                             groupby_agg)

    cols = ["canonical_subj", "pred", "canonical_obj"]

    def to_xy(b: pd.DataFrame) -> pd.DataFrame:
        return (b[cols].drop_duplicates()
                .rename(columns={"canonical_subj": "x", "pred": "p",
                                 "canonical_obj": "y"}))

    d = distinct_on(
        triples_ds.map_batches(to_xy, batch_format="pandas"),
        ["x", "p", "y"], mode=mode).materialize()

    out_cols = ["focus", "kind", "pred", "constraint", "expected",
                "actual", "value"]
    range_of = {(k, p): rng for k, props in shapes.items()
                for p, (_, _, rng) in props.items() if rng}
    max_of = {(k, p): mx for k, props in shapes.items()
              for p, (_, mx, _) in props.items() if mx is not None}
    min_preds = [(k, p) for k, props in shapes.items()
                 for p, (mn, _, _) in props.items() if mn > 0]

    def local_checks(b: pd.DataFrame) -> pd.DataFrame:
        skind = b["x"].str[0].map(_KIND).fillna("inferred")
        okind = b["y"].str[0].map(_KIND).fillna("inferred")
        rows = []
        exp_rng = pd.Series(
            list(zip(skind, b["p"])), index=b.index).map(range_of)
        bad = exp_rng.notna() & (okind != exp_rng)
        if bad.any():
            v = b[bad]
            rows.append(pd.DataFrame({
                "focus": v["x"].to_numpy(),
                "kind": skind[bad].to_numpy(), "pred": v["p"].to_numpy(),
                "constraint": "class",
                "expected": exp_rng[bad].to_numpy(),
                "actual": okind[bad].to_numpy(),
                "value": v["y"].to_numpy()}))
        exp_dom = b["p"].map(domain_of)
        badd = exp_dom.notna() & (skind != exp_dom)
        if badd.any():
            v = b[badd]
            rows.append(pd.DataFrame({
                "focus": v["x"].to_numpy(),
                "kind": skind[badd].to_numpy(),
                "pred": v["p"].to_numpy(), "constraint": "domain",
                "expected": exp_dom[badd].to_numpy(),
                "actual": skind[badd].to_numpy(),
                "value": v["y"].to_numpy()}))
        if not rows:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in out_cols})
        return pd.concat(rows, ignore_index=True)[out_cols]


    def over_max(b: pd.DataFrame) -> pd.DataFrame:
        skind = b["x"].str[0].map(_KIND).fillna("inferred")
        cap = pd.Series(
            list(zip(skind, b["p"])), index=b.index).map(max_of)
        bad = cap.notna() & (b["n"] > cap)
        v = b[bad]
        return pd.DataFrame({
            "focus": v["x"].to_numpy(), "kind": skind[bad].to_numpy(),
            "pred": v["p"].to_numpy(), "constraint": "maxCount",
            "expected": cap[bad].astype("Int64").astype(str).to_numpy(),
            "actual": v["n"].astype(np.int64).astype(str).to_numpy(),
            "value": ""}) if bad.any() else pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in out_cols})

    if mode != "shuffle" and d.count() <= driver_limit:
        # guarded driver finish: the distinct fact set is vocabulary ×
        # predicate bounded, and the distributed finish pays three
        # extra exchanges (maxCount groupby, universe distinct, one
        # anti-join per minCount shape) of ~1-2 s fixed aggregator
        # spin-up each (measured 5.6 s distributed vs ~1 s driver at
        # sf0.1).  Past driver_limit (or mode='shuffle') the exchange
        # path below runs; pinned equal in pytest.
        ddf = d.to_pandas()
        frames = [local_checks(ddf)]
        cnt = (ddf.groupby(["x", "p"]).size().rename("n")
               .reset_index())
        frames.append(over_max(cnt))
        uni = pd.unique(np.concatenate(
            [ddf["x"].to_numpy(object), ddf["y"].to_numpy(object)]))
        ukind = pd.Series(uni).str[0].map(_KIND)
        for k, p in min_preds:
            uk = uni[(ukind == k).to_numpy()]
            have = set(ddf.loc[ddf["p"] == p, "x"])
            miss = np.sort(np.array(
                [e for e in uk if e not in have], dtype=object))
            if len(miss):
                frames.append(pd.DataFrame({
                    "focus": miss, "kind": k, "pred": p,
                    "constraint": "minCount", "expected": "1",
                    "actual": "0", "value": ""}))
        df = pd.concat(frames, ignore_index=True)
        if not len(df):
            return pd.DataFrame(columns=out_cols)
        return (df[out_cols]
                .sort_values(["constraint", "kind", "pred", "focus",
                              "value"])
                .reset_index(drop=True))

    parts = [d.map_batches(local_checks, batch_format="pandas")]

    # maxCount: combiner-fed distinct-object counts per (focus, pred)
    nobj = groupby_agg(
        d.map_batches(lambda b: b.assign(__one=1),
                      batch_format="pandas"),
        ["x", "p"], [("__one", "sum", "n")], mode=mode)


    parts.append(nobj.map_batches(over_max, batch_format="pandas"))

    # minCount: kind-filtered entity universe ANTI-JOIN subject set
    universe = distinct_on(
        d.map_batches(
            lambda b: pd.concat([b["x"].rename("e").to_frame(),
                                 b["y"].rename("e").to_frame()],
                                ignore_index=True).drop_duplicates(),
            batch_format="pandas"),
        ["e"], mode=mode).materialize()
    for k, p in min_preds:
        uk = universe.map_batches(
            lambda b, k=k: b[b["e"].str[0].map(_KIND) == k],
            batch_format="pandas").materialize()
        have = distinct_on(
            d.map_batches(
                lambda b, p=p: b.loc[b["p"] == p, ["x"]]
                .rename(columns={"x": "__h"}).drop_duplicates(),
                batch_format="pandas"),
            ["__h"], mode=mode).materialize()
        if have.count() == 0:
            missing = uk  # Ray's join crashes on an empty side
        elif uk.count() == 0:
            continue
        else:
            missing = uk.join(have, "left_anti",
                              num_partitions=default_n_buckets(),
                              on=("e",), right_on=("__h",))
        parts.append(missing.map_batches(
            lambda b, k=k, p=p: pd.DataFrame({
                "focus": b["e"].to_numpy(), "kind": k, "pred": p,
                "constraint": "minCount", "expected": "1",
                "actual": "0", "value": ""}) if len(b) else
            pd.DataFrame({c: pd.Series([], dtype=object)
                          for c in out_cols}),
            batch_format="pandas"))

    allv = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    df = allv.to_pandas()
    if not len(df):
        return pd.DataFrame(columns=out_cols)
    return (df[out_cols]
            .sort_values(["constraint", "kind", "pred", "focus",
                          "value"])
            .reset_index(drop=True))


def truth_discovery(triples_ds, preds=FUNCTIONAL_PREDS, *, rounds: int = 2,
                    mode: str = "auto", driver_limit: int = 2_000_000):
    """Iterative truth discovery over the source-claim bipartite graph
    (the Sums fixed point of Pasternack & Roth, COLING'10 — Kleinberg
    hubs/authorities on sources x claims; public): alternate

        claim_score_r(claim) = sum of trust_{r-1}(source) over the
                               distinct domains asserting it
        trust_r(source)      = sum of claim_score_r(claim) over the
                               distinct claims the domain asserts

    from trust_0 = 1, for a fixed ``rounds`` (default 2), all in exact
    int64 (no normalization, so the SQL twin reproduces scores
    bit-identically; bounded rounds bound the magnitude).  Unlike the
    static ``truth_vote`` (one md5-weighted pass), a source earns
    trust from asserting well-corroborated claims, and that trust then
    re-weights its uncorroborated claims — the conflict-resolution
    step of web-scale KG fusion.  Returns per (pred, canonical_subj)
    the argmax-score object, min-object tie-break: columns
    (pred, canonical_subj, chosen_obj, claim_score, n_sources).

    Scale shape: ONE combiner-fed exchange builds the DISTINCT
    (claim, domain) incidence (an assertion repeated across pages of
    a domain collapses to one edge); each half-iteration is then one
    pre-combined groupby over it.  trust is DOMAIN-vocabulary-bounded,
    so the claim half-step ships it as a broadcast map (ray.put once,
    read per actor) instead of a shuffle join; the trust half-step is
    a hash_join of the incidence with the claim scores followed by a
    domain-keyed rollup.  The happy path is a guarded DRIVER finish
    (the incidence is distinct-facts x domains bounded, far smaller
    than the mention-level corpus; each Ray join/groupby pays a fixed
    ~1-2 s aggregator-fleet spin-up — BASELINE.md); past
    ``driver_limit`` incidence rows (or mode='shuffle') the exchange
    path runs instead, pinned equal in pytest.

    Reference analog: the resolver cascade's disagreeing-evidence
    arbitration (CallResolver.java's candidate scoring) lifted from
    within-document candidates to cross-source fact conflicts."""
    import ray

    from .relational import bcast_get, distinct_on, groupby_agg, hash_join

    pset = frozenset(preds)
    keys = ["pred", "canonical_subj", "canonical_obj"]
    out_cols = ["pred", "canonical_subj", "chosen_obj",
                "claim_score", "n_sources"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.pred.isin(pset)]
        if b.empty:
            return pd.DataFrame({c: pd.Series(dtype="object")
                                 for c in keys + ["dom"]})
        dom = b.url.str.extract(r"//([^/]+)/", expand=False)
        return pd.DataFrame({"pred": b.pred,
                             "canonical_subj": b.canonical_subj,
                             "canonical_obj": b.canonical_obj,
                             "dom": dom}).drop_duplicates()

    pairs = distinct_on(
        triples_ds.map_batches(partial, batch_format="pandas"),
        keys + ["dom"], mode=mode).materialize()

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "pred": pd.Series(dtype="object"),
            "canonical_subj": pd.Series(dtype="object"),
            "chosen_obj": pd.Series(dtype="object"),
            "claim_score": pd.Series(dtype="int64"),
            "n_sources": pd.Series(dtype="int64")})

    n_pairs = pairs.count()
    if n_pairs == 0:
        return _empty()

    if mode != "shuffle" and n_pairs <= driver_limit:
        df = pairs.to_pandas()
        trust = pd.Series(1, index=pd.Index(df["dom"].unique()),
                          dtype="int64")
        claim = None
        for _ in range(rounds):
            df["t"] = df["dom"].map(trust).astype("int64")
            claim = (df.groupby(keys, sort=False)["t"].sum()
                     .rename("claim_score").reset_index())
            df = df.drop(columns=["c"], errors="ignore").merge(
                claim.rename(columns={"claim_score": "c"}), on=keys)
            trust = df.groupby("dom", sort=False)["c"].sum()
        ns = (df.groupby(keys, sort=False).size()
              .rename("n_sources").reset_index())
        sc = claim.merge(ns, on=keys)
        win = (sc.sort_values(
            ["pred", "canonical_subj", "claim_score", "canonical_obj"],
            ascending=[True, True, False, True], kind="mergesort")
            .groupby(["pred", "canonical_subj"], sort=False).head(1)
            .rename(columns={"canonical_obj": "chosen_obj"}))
        win["claim_score"] = win["claim_score"].astype("int64")
        win["n_sources"] = win["n_sources"].astype("int64")
        return (win[out_cols]
                .sort_values(["pred", "canonical_subj"])
                .reset_index(drop=True))

    # shuffle path: trust stays a broadcast dict (domain-bounded);
    # claim scores stay distributed end-to-end
    trust = {d: 1 for d in
             groupby_agg(pairs, ["dom"], [("dom", "count", "n")],
                         mode="shuffle").to_pandas()["dom"]}
    claims = None
    for _ in range(rounds):
        tref = ray.put(trust)

        def add_t(b: pd.DataFrame, _tref=tref) -> pd.DataFrame:
            t = bcast_get(_tref)
            b = b.copy()
            b["t"] = b["dom"].map(t).astype("int64")
            return b

        claims = groupby_agg(
            pairs.map_batches(add_t, batch_format="pandas"),
            keys, [("t", "sum", "c")], mode="shuffle").materialize()
        tt = groupby_agg(
            hash_join(pairs, claims, on=keys, empty_safe=True),
            ["dom"], [("c", "sum", "t")], mode="shuffle").to_pandas()
        trust = dict(zip(tt["dom"], tt["t"].astype("int64")))

    ns = groupby_agg(pairs, keys, [("dom", "count", "n_sources")],
                     mode="shuffle")
    sc = hash_join(claims, ns, on=keys, empty_safe=True).materialize()
    best = groupby_agg(sc, ["pred", "canonical_subj"],
                       [("c", "max", "c")], mode="shuffle")
    cand = hash_join(sc, best, on=["pred", "canonical_subj", "c"],
                     empty_safe=True).materialize()
    win = groupby_agg(cand, ["pred", "canonical_subj", "c"],
                      [("canonical_obj", "min", "chosen_obj")],
                      mode="shuffle").materialize()
    out = hash_join(
        win.map_batches(
            lambda b: b.rename(columns={"chosen_obj": "canonical_obj"}),
            batch_format="pandas"),
        cand, on=["pred", "canonical_subj", "canonical_obj", "c"],
        empty_safe=True).to_pandas()
    if not len(out):
        return _empty()
    out = out.rename(columns={"canonical_obj": "chosen_obj",
                              "c": "claim_score"})
    out["claim_score"] = out["claim_score"].astype("int64")
    out["n_sources"] = out["n_sources"].astype("int64")
    return (out[out_cols]
            .sort_values(["pred", "canonical_subj"])
            .reset_index(drop=True))
