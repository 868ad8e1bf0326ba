"""Context-sensitive link scoring (J4 cascade tier 2) — the fixture
where the prior tier and the context tier DISAGREE and only context is
right (CallResolver signature-vs-candidates analog)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from cpg_ray.normalize import norm_name
from cpg_ray.pagegen import _cached_world, cfg_for_variant, render_page
from cpg_ray.stages.extract import ExtractTriples, build_detector_index
from cpg_ray.stages.link import (
    build_ambiguity_index,
    build_norm_index,
    build_related_index,
    make_link_fn,
    link_with_context,
)


@pytest.fixture(scope="module")
def ctx_fixture(ray_session):
    cfg = cfg_for_variant("ambiguous_ctx")
    world = _cached_world(cfg)
    # pages whose subject holds the LOW-prior side of a shared alias
    low = {eid for _a, eid, _c, pr in world.ambiguous_aliases if pr < 0.5}
    rows, subjects, amb_norms = [], [], set()
    for i in range(4000):
        if len(rows) >= 6:
            break
        from cpg_ray.pagegen import page_plan

        sid, _lang, _s = page_plan(world, i, "ambiguous_ctx")
        if sid in low:
            r = render_page(world, i, "ambiguous_ctx")
            alias = next(a for a, e, _c, pr in world.ambiguous_aliases
                         if e == sid and pr < 0.5)
            if alias in r["text"]:
                rows.append(r)
                subjects.append(sid)
                amb_norms.add(norm_name(alias))
    assert rows, "fixture: no low-prior ambiguous pages found"
    batch = pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in rows[0]}
    )
    alias_rows = world.alias_rows()
    det_ref = ray.put(build_detector_index([a["alias"] for a in alias_rows]))
    raw = rd.from_arrow(
        ExtractTriples(index_ref=det_ref)(batch)
    )
    return world, alias_rows, raw, subjects, amb_norms


def test_context_overrides_prior(ctx_fixture):
    world, alias_rows, raw, subjects, amb_norms = ctx_fixture
    norm_ref = ray.put(build_norm_index(alias_rows))
    amb_ref = ray.put(build_ambiguity_index(alias_rows))
    rel_ref = ray.put(build_related_index(world.facts_by_subj))

    raw_df = raw.to_pandas()
    amb_rows = raw_df[raw_df.subj_norm.isin(amb_norms)]
    assert len(amb_rows), "fixture produced no ambiguous-subject triples"

    # prior-only tier resolves the shared alias to the HIGH-prior entity
    prior_df = raw.map_batches(
        make_link_fn(norm_ref), batch_format="pyarrow"
    ).to_pandas()
    # context tier resolves it to the document's actual subject
    ctx_df = link_with_context(raw, norm_ref, amb_ref, rel_ref).to_pandas()

    for url, sid in zip(raw_df.url.unique(), subjects):
        for norm in amb_norms & set(
            raw_df[raw_df.url == url].subj_norm
        ):
            span = raw_df[(raw_df.url == url) & (raw_df.subj_norm == norm)
                          ].span_start.iloc[0]
            p = prior_df[(prior_df.url == url)
                         & (prior_df.span_start == span)].subj.iloc[0]
            c = ctx_df[(ctx_df.url == url)
                       & (ctx_df.span_start == span)].subj.iloc[0]
            assert c == sid, (url, norm, c, sid)
            assert p != sid  # the disagreement: prior tier is wrong here


def test_context_agrees_with_prior_when_unambiguous(ctx_fixture):
    world, alias_rows, raw, _subjects, amb_norms = ctx_fixture
    norm_ref = ray.put(build_norm_index(alias_rows))
    amb_ref = ray.put(build_ambiguity_index(alias_rows))
    rel_ref = ray.put(build_related_index(world.facts_by_subj))

    prior_df = make_link_fn(norm_ref)(
        pa.Table.from_pandas(raw.to_pandas(), preserve_index=False)
    ).to_pandas()
    ctx_df = link_with_context(raw, norm_ref, amb_ref, rel_ref).to_pandas()

    key = ["url", "span_start"]
    m = prior_df.merge(ctx_df, on=key, suffixes=("_p", "_c"))
    raw_df = raw.to_pandas()
    unamb = raw_df[~raw_df.subj_norm.isin(amb_norms)][key]
    mu = m.merge(unamb, on=key)
    assert (mu.subj_p == mu.subj_c).all()
    assert (mu.obj_p == mu.obj_c).all()


def test_tier3_widened_context_overrides_prior_on_tier2_tie(ray_session):
    """The 'ambiguous_ctx2' fixture: tier-2 direct overlap is PROVABLY
    insufficient (the document names neither candidate's direct fact
    objects, so both score 0) and prior-only widening would pick the
    wrong entity; the tier-3 one-hop signature widening
    (CallResolver.java:847-1016/1707-1749 analog, gated on the tier-2
    tie) resolves to the document's actual subject."""
    import pandas as pd

    # A (prior .9) and B (prior .1) share the alias; the page names B
    # only via the shared alias plus Z — an entity TWO fact hops from
    # B (B→Y→Z) and unrelated to A (A→X→W)
    alias_rows = [
        {"alias": "Smith", "entity_id": "A", "canonical_name": "A",
         "prior": 0.9},
        {"alias": "Smith", "entity_id": "B", "canonical_name": "B",
         "prior": 0.1},
        {"alias": "Zeta", "entity_id": "Z", "canonical_name": "Z",
         "prior": 1.0},
    ]
    from types import SimpleNamespace as F

    facts_by_subj = {
        "A": [F(obj="X")], "B": [F(obj="Y")],
        "Y": [F(obj="Z")], "X": [F(obj="W")],
    }
    norm_ref = ray.put(build_norm_index(alias_rows))
    amb_ref = ray.put(build_ambiguity_index(alias_rows))
    rel_ref = ray.put(build_related_index(facts_by_subj))

    raw = rd.from_pandas(pd.DataFrame({
        "subj_norm": [norm_name("Smith")],
        "pred": ["knows"],
        "obj_norm": [norm_name("Zeta")],
        "url": ["https://ctx2/p0"],
        "span_start": [0],
    }))
    # tier-2 silence is part of the fixture's contract
    rel = build_related_index(facts_by_subj)
    ctx = {"Z"}
    assert not (rel["A"] & ctx) and not (rel["B"] & ctx)

    out = link_with_context(raw, norm_ref, amb_ref, rel_ref).to_pandas()
    assert list(out.subj) == ["B"], out  # prior alone would say A
    assert list(out.obj) == ["Z"]

    # and when even the widened signatures tie, prior still decides
    raw2 = rd.from_pandas(pd.DataFrame({
        "subj_norm": [norm_name("Smith")],
        "pred": ["knows"],
        "obj_norm": [norm_name("Smith")],  # no unambiguous context
        "url": ["https://ctx2/p1"],
        "span_start": [0],
    }))
    out2 = link_with_context(raw2, norm_ref, amb_ref, rel_ref).to_pandas()
    assert list(out2.subj) == ["A"]  # high prior, deterministic
