"""A5 getCommonType lattice + J9 external-KB enrichment unit tests."""

from __future__ import annotations

from cpg_ray.state.lattice import ancestors, common_kind, common_type, kind_of


def test_kind_of_prefixes():
    assert kind_of("P000001") == "person"
    assert kind_of("O00003D") == "org"
    assert kind_of("C00009") == "city"
    assert kind_of("K07") == "country"
    assert kind_of("inf:zorblax unit 3") == "inferred"


def test_ancestors_and_pairwise_meet():
    assert ancestors("person") == ["person", "agent", "entity"]
    assert common_type("person", "person") == "person"
    assert common_type("person", "org") == "agent"
    assert common_type("city", "country") == "place"
    assert common_type("person", "city") == "entity"
    assert common_type("inferred", "org") == "entity"


def test_fold_is_order_free():
    assert common_kind(["person"]) == "person"
    assert common_kind(["org", "person"]) == common_kind(["person", "org"]) == "agent"
    assert common_kind(["city", "country", "city"]) == "place"
    assert common_kind(["person", "country"]) == "entity"
    assert common_kind([]) == "entity"


def test_kb_snapshot_and_enrich(tmp_path):
    import pandas as pd

    from cpg_ray.pagegen import _cached_world, cfg_for_variant
    from cpg_ray.stages.enrich import EnrichEntities, build_kb_snapshot

    world = _cached_world(cfg_for_variant("basic"))
    kb = str(tmp_path / "kb" / "kb.parquet")
    build_kb_snapshot(world, kb)
    en = EnrichEntities(kb)

    out = en(pd.DataFrame({"entity_id": ["C00000", "P000000", "inf:x"]}))
    # city country comes from its located_in fact
    city_fact = world.facts_by_subj["C00000"][0]
    assert out.country.iloc[0] == world.entities[city_fact.obj].canonical_name
    assert out.kind.iloc[0] == "city"
    assert out.kind.iloc[1] == "person"
    # external KB knows nothing about inferred entities
    assert pd.isna(out.kind.iloc[2]) and pd.isna(out.country.iloc[2])
