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


def snapshot_merge(old_ds, new_ds, *,
                   keys=("canonical_subj", "pred", "canonical_obj"),
                   functional=FUNCTIONAL_PREDS,
                   num_partitions: int | None = None):
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

    Shape: four hash-partitioned semi/anti joins over the distinct
    key projections — each fact moves at most twice, no driver-side
    set ever materializes:
    - kept       = A ⋉ B          (left_semi on the full fact key)
    - added      = B ∖ A          (left_anti)
    - old-only   = A ∖ B, split by (subject, pred) against the new
      snapshot's functional (subject, pred) pairs: present →
      superseded (the new value replaces it), absent → carried.
    """
    import pyarrow as pa

    from .relational import _compact_nonempty, distinct_on

    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 2)))
    keys = list(keys)
    fset = frozenset(functional)

    def proj(ds):
        return distinct_on(
            ds.map_batches(lambda t: t.select(keys), batch_format="pyarrow"),
            keys,
        )

    def tag(status):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "status", pa.array([status] * t.num_rows, pa.string()))

        return f

    # strip schema-less zero-row partition blocks before every join
    # (Ray 2.49 emits them from groupbys/anti-joins on SPARSE inputs
    # and a downstream join crashes with ArrowInvalid — the same
    # latent defect hash_join's empty_safe guards; dense data masks it)
    a = _compact_nonempty(proj(old_ds).materialize())
    b = _compact_nonempty(proj(new_ds).materialize())
    # Every join below MATERIALIZES before the final union: a union of
    # unmaterialized join pipelines executes all their aggregator
    # fleets in ONE DAG, and 4-5 concurrent Join(num_partitions=CPUs)
    # operators over-subscribe the CPU budget and deadlock under
    # backpressure (observed: bench at sf0.1 / 32 CPUs hung 15+ min on
    # the union DAG; sf0.01 masked it).  The chained-join rule
    # (materialize between joins) applies to FAN-IN unions too.
    kept = _compact_nonempty(
        a.join(b, "left_semi", num_partitions=num_partitions,
               on=tuple(keys)).map_batches(tag("kept"),
                                           batch_format="pyarrow")
        .materialize())
    added = _compact_nonempty(
        b.join(a, "left_anti", num_partitions=num_partitions,
               on=tuple(keys)).map_batches(tag("added"),
                                           batch_format="pyarrow")
        .materialize())
    old_only = _compact_nonempty(
        a.join(b, "left_anti", num_partitions=num_partitions,
               on=tuple(keys)).materialize())

    def fn_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["pred"], pa.array(sorted(fset))))

    def nonfn_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(
            pc.is_in(t["pred"], pa.array(sorted(fset)))))

    sp_new = _compact_nonempty(distinct_on(
        b.map_batches(fn_only, batch_format="pyarrow")
         .map_batches(lambda t: t.select([keys[0], keys[1]]),
                      batch_format="pyarrow"),
        [keys[0], keys[1]],
    ).materialize())
    old_fn = _compact_nonempty(
        old_only.map_batches(fn_only, batch_format="pyarrow")
                .materialize())
    # Ray 2.49 joins raise on a fully-empty side (see hash_join's
    # empty_safe note); both splits are legitimately empty on e.g. a
    # no-op recrawl, so guard with the already-paid counts.
    if old_fn.count() == 0:
        parts = [kept, added]
    elif sp_new.count() == 0:
        parts = [kept, added,
                 old_fn.map_batches(tag("carried"), batch_format="pyarrow")]
    else:
        superseded = _compact_nonempty(old_fn.join(
            sp_new, "left_semi", num_partitions=num_partitions,
            on=(keys[0], keys[1]),
        ).map_batches(tag("superseded"), batch_format="pyarrow")
            .materialize())
        carried_fn = _compact_nonempty(old_fn.join(
            sp_new, "left_anti", num_partitions=num_partitions,
            on=(keys[0], keys[1]),
        ).map_batches(tag("carried"), batch_format="pyarrow")
            .materialize())
        parts = [kept, added, superseded, carried_fn]
    carried_nonfn = old_only.map_batches(
        nonfn_only, batch_format="pyarrow"
    ).map_batches(tag("carried"), batch_format="pyarrow")
    return parts[0].union(*parts[1:], carried_nonfn)
