"""External-KB enrichment stage — the J9 analog.

Reference: ``JavaExternalTypeHierarchyResolver`` resolves types against
an EXTERNAL JavaParser ``TypeSolver`` — an out-of-repo knowledge base
loaded once per run, probed per type
(JavaExternalTypeHierarchyResolver.java:47-75, solver obtained at 51).

Our analog: a read-only KB *snapshot file* (Parquet) loaded once per
ACTOR in ``__init__`` — deliberately distinct from the ``ray.put``
broadcast path the linker uses: an external KB lives on shared storage,
is versioned by path, and may be larger than comfortable for the object
store, so each actor maps it from disk instead (ST5 heavyweight-init
shape).  Probing stays per-batch and vectorized.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def build_kb_snapshot(world, path: str) -> str:
    """Write the deterministic external-KB snapshot for a world:
    (entity_id, kind, country) — country resolved through the world's
    located_in/based_in/born_in fact chains (the "knowledge the corpus
    itself does not spell out" that an external solver contributes)."""
    import os

    def city_country(cid: str) -> str | None:
        for f in world.facts_by_subj.get(cid, []):
            if f.pred == "located_in":
                return world.entities[f.obj].canonical_name
        return None

    rows = []
    for eid, ent in world.entities.items():
        country = None
        if ent.kind == "city":
            country = city_country(eid)
        elif ent.kind == "country":
            country = ent.canonical_name
        else:
            link = {"org": "based_in", "person": "born_in"}[ent.kind]
            for f in world.facts_by_subj.get(eid, []):
                if f.pred == link:
                    country = city_country(f.obj)
                    break
        rows.append({"entity_id": eid, "kind": ent.kind, "country": country})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.Table.from_pylist(
        sorted(rows, key=lambda r: r["entity_id"]),
        schema=pa.schema([("entity_id", pa.string()), ("kind", pa.string()),
                          ("country", pa.string())]),
    )
    pq.write_table(tbl, path)
    return path


class EnrichEntities:
    """Entities batch → + (kind, country) columns probed from the KB
    snapshot.  KB loads once per actor (``__init__``); misses stay null
    (an external solver knows nothing about inferred entities — the
    reference's unresolved-symbol case)."""

    def __init__(self, kb_path: str):
        kb = pq.read_table(kb_path).to_pandas()
        self.kind = dict(zip(kb.entity_id, kb.kind))
        self.country = dict(zip(kb.entity_id, kb.country))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["kind"] = batch["entity_id"].map(self.kind)
        out["country"] = batch["entity_id"].map(self.country)
        return out
