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
