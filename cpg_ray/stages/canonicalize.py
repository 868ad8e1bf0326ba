"""P3 canonicalize stage: entity-vocabulary collection via salted
two-phase aggregation + driver-side union-find over the (small)
alias-equivalence edge set, then a broadcast rewrite of the triples.

Reference analog: TypeResolver deduplicating equal ``Type`` instances
across all translation units and rewriting every node's type pointer to
the canonical instance (TypeResolver.java:36-198), plus
ScopeManager.mergeFrom as the extract→link phase barrier
(ScopeManager.kt:130-160).

Scale design (north rule):
- The triples stream is NEVER grouped directly by entity — a Zipf-hot
  entity (org 0 in the skew fixture appears in >50% of works_for
  triples) would funnel most rows into one reducer.  Instead:
  phase 0 (combiner): per-batch distinct inside ``map_batches`` —
  a hot entity contributes ≤1 row per (batch, side);
  phase 1: groupby on (salt, entity_id) where ``salt`` is
  row-position-derived and independent of the key, so even the
  per-batch partials of a hot key spread over SALT_K reducers;
  phase 2: groupby on entity_id over ≤SALT_K rows/key.
- Union-find runs on the driver over the equivalence edges only
  (bounded by dictionary size, not corpus size) — SURVEY.md §2.9 G7.
- The canonical map is broadcast once (``ray.put``) and applied in a
  stateless ``map_batches`` rewrite, the anti-pattern-free analog of
  TypeResolver's in-place pointer rewrite.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.relational import GuardExceeded
from ..state.unionfind import UnionFind

SALT_K = 16


def _vocab_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: distinct entity_id + mention count, fully
    vectorized (pyarrow value_counts — no Python row loop).
    (``is_inferred`` is derivable from the ``inf:`` id prefix.)"""
    import pyarrow.compute as pc

    both = pa.concat_arrays(
        [batch["subj"].combine_chunks(), batch["obj"].combine_chunks()]
    )
    vc = pc.value_counts(both)
    ids = vc.field("values")
    counts = vc.field("counts")
    n = len(ids)
    return pa.table(
        {
            "entity_id": ids,
            "n_mentions": pc.cast(counts, pa.int64()),
            # salt from enumeration position — independent of the key,
            # so a hot entity's partials spread across SALT_K groups
            "salt": pa.array([i % SALT_K for i in range(n)], pa.int32()),
        }
    )


def collect_entity_vocab(linked_ds, *, mode: str = "auto",
                         driver_key_limit: int = 5_000_000) -> "pa.Table":
    """Distinct entities (+ mention counts) present in the linked
    triples.

    mode="driver": combiner (per-batch distinct) → stream the
    partials to the driver and merge incrementally in pandas.  The
    combiner bounds each batch's contribution to O(distinct entities),
    so driver memory is O(vocabulary), never O(triples) — and it skips
    Ray's sort-based Aggregate barrier, which costs seconds even on
    tiny inputs.

    mode="shuffle": combiner → salted groupby (key-independent salt so
    a Zipf-hot entity's partials spread across SALT_K reducers) → final
    groupby.  The path for vocabularies too big for one driver.  Tests
    assert both modes agree (incl. on the hot-entity skew fixture).

    mode="auto" (default): the guarded driver path, DEGRADING to the
    salted shuffle when the vocabulary guard trips instead of aborting
    the pipeline (the guard fires incrementally, so driver memory never
    exceeds ~driver_key_limit entries before the switch).  Flagship
    callers pass a materialized linked dataset, so the fallback re-reads
    blocks rather than re-running extract/link.
    """
    if mode == "auto":
        try:
            return collect_entity_vocab(
                linked_ds, mode="driver", driver_key_limit=driver_key_limit
            )
        except GuardExceeded:
            return collect_entity_vocab(linked_ds, mode="shuffle")
    if mode == "shuffle":
        from ray.data.aggregate import Sum

        partials = linked_ds.map_batches(_vocab_partial, batch_format="pyarrow")

        phase1 = partials.groupby(["salt", "entity_id"]).aggregate(
            Sum("n_mentions", alias_name="n_mentions")
        )
        phase2 = phase1.groupby("entity_id").aggregate(
            Sum("n_mentions", alias_name="n_mentions")
        )
        batches = [
            b for b in phase2.iter_batches(batch_format="pyarrow",
                                           batch_size=None) if b.num_rows
        ]
        if not batches:
            return pa.table(
                {
                    "entity_id": pa.array([], pa.string()),
                    "n_mentions": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(batches).select(["entity_id", "n_mentions"])

    # driver path: iterate the (already materialized) linked dataset
    # directly — launching a separate combiner map stage costs more in
    # task scheduling than the value_counts it offloads (measured
    # 2.4-3.7 s stage launch vs ~0.3 s of driver compute at 650k rows).
    import pyarrow.compute as pc

    counts: dict[str, int] = {}
    for b in linked_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        both = pa.concat_arrays(
            [b["subj"].combine_chunks(), b["obj"].combine_chunks()]
        )
        vc = pc.value_counts(both)
        for eid, n in zip(
            vc.field("values").to_pylist(), vc.field("counts").to_pylist()
        ):
            counts[eid] = counts.get(eid, 0) + n
        if len(counts) > driver_key_limit:
            # the vocabulary (incl. inferred entities, which grow with
            # the corpus) no longer fits the driver-merge assumption
            raise GuardExceeded(
                f"collect_entity_vocab(mode='driver'): {len(counts)} "
                f"entities exceeds driver_key_limit={driver_key_limit}; "
                "use mode='shuffle' (salted two-phase groupby)"
            )
    ids = sorted(counts)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.string()),
            "n_mentions": pa.array([counts[e] for e in ids], pa.int64()),
        }
    )


def build_canonical_map(
    vocab: pa.Table, equivalences: list[tuple[str, str]]
) -> dict[str, str]:
    """Union-find over the equivalence edges → member → min(id), keeping
    ONLY canon ≠ member entries.

    The broadcast map is bounded by the equivalence-edge set (dictionary
    twins), NOT by the observed vocabulary: with ``infer_on_miss`` the
    inferred-entity space grows with the corpus, and a map holding every
    vocab id would broadcast unbounded state at 10^12 pages.  Every
    consumer (make_canonical_fn/entities_table) already
    falls back to identity via ``cmap.get(e, e)``, so dropping identity
    entries is semantics-free.  ``vocab`` stays a parameter for the
    signature's sake (callers may pass richer equivalence sources later)."""
    del vocab  # identity entries are implicit — see docstring
    uf = UnionFind()
    for a, b in equivalences:
        uf.union(a, b)
    return {k: v for k, v in uf.canonical_map().items() if k != v}


def build_alias_pack(cmap: dict[str, str], alias_rows: list[dict]) -> dict:
    """DICTIONARY-bounded Arrow pack for the entities assembly: canonical
    id → (canonical_name, sorted distinct aliases), pre-flattened into
    parallel arrays so :func:`_assemble_entities` is pure kernels.

    Built once on the driver (the loop is over the alias dictionary,
    which is broadcast-sized by construction — NOT over the observed
    vocabulary, which grows with the corpus via ``inf:`` ids) and
    ``ray.put`` once for the distributed path."""
    canon_of = lambda e: cmap.get(e, e)  # noqa: E731
    aliases_by_canon: dict[str, list[str]] = {}
    name_by_canon: dict[str, str] = {}
    for row in alias_rows:
        c = canon_of(row["entity_id"])
        aliases_by_canon.setdefault(c, []).append(row["alias"])
        # deterministic canonical name: the name registered for the
        # canonical member itself wins, else first seen
        if row["entity_id"] == c or c not in name_by_canon:
            name_by_canon[c] = row["canonical_name"]
    keys = sorted(name_by_canon)
    return {
        "keys": pa.array(keys, pa.string()),
        "names": pa.array([name_by_canon[k] for k in keys], pa.string()),
        "aliases": pa.array(
            [sorted(set(aliases_by_canon.get(k, []))) for k in keys],
            pa.list_(pa.string()),
        ),
    }


def _assemble_entities(ids: pa.Array, pack: dict) -> pa.Table:
    """Distinct canonical ids → ENTITIES rows, fully vectorized: one
    ``pc.index_in`` against the dictionary pack + takes/coalesces — no
    Python loop over the vocabulary (it runs per batch in the
    distributed path)."""
    import pyarrow.compute as pc

    from ..schemas import ENTITIES

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    keys, names, aliases = pack["keys"], pack["names"], pack["aliases"]
    n = len(keys)
    inferred = pc.starts_with(ids, "inf:")
    idx = pc.fill_null(pc.index_in(ids, value_set=keys), n)
    # inferred ids never take dictionary entries — route them (and
    # misses) to the sentinel slot n, which holds null name / [] aliases
    idx = pc.if_else(inferred, pa.scalar(n, idx.type), idx)
    names_ext = pa.concat_arrays([names, pa.array([None], pa.string())])
    alias_ext = pa.concat_arrays(
        [aliases, pa.array([[]], pa.list_(pa.string()))]
    )
    # name: dictionary name, else the id itself; inferred → strip "inf:"
    name = pc.if_else(
        inferred,
        pc.utf8_slice_codeunits(ids, 4),
        pc.coalesce(pc.take(names_ext, idx), ids),
    )
    return pa.Table.from_pydict(
        {
            "entity_id": ids,
            "canonical_name": name,
            "aliases": pc.take(alias_ext, idx),
            "is_inferred": inferred,
        },
        schema=ENTITIES,
    )


def _canon_rewrite(col, cmap_arrays) -> pa.Array:
    """entity_id column → canonical ids (identity on miss), vectorized."""
    import pyarrow.compute as pc

    keys, vals = cmap_arrays
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not len(keys):
        return col
    return pc.coalesce(pc.take(vals, pc.index_in(col, value_set=keys)), col)


def entities_table(
    vocab: pa.Table,
    cmap: dict[str, str],
    alias_rows: list[dict],
) -> pa.Table:
    """Canonical entities table (ENTITIES schema): one row per canonical
    id observed in the corpus, aliases aggregated from the dictionary.
    Driver-side variant for in-memory vocab tables (triples_dataset
    path); the same Arrow kernels as the distributed
    :func:`entities_dataset`, no Python loop over the vocabulary."""
    import pyarrow.compute as pc

    cmap_arrays = (
        pa.array(list(cmap.keys()), pa.string()),
        pa.array(list(cmap.values()), pa.string()),
    )
    canon = pc.unique(_canon_rewrite(vocab["entity_id"], cmap_arrays))
    canon = pc.take(canon, pc.array_sort_indices(canon))
    return _assemble_entities(canon, build_alias_pack(cmap, alias_rows))


# per-process cache of broadcast packs (same shape as link._VEC_INDEX_CACHE)
_PACK_CACHE: dict[str, dict] = {}


def _cached_pack(pack_ref) -> dict:
    key = pack_ref.hex() if hasattr(pack_ref, "hex") else str(pack_ref)
    v = _PACK_CACHE.get(key)
    if v is None:
        from ..functions.relational import bcast_get

        v = _PACK_CACHE[key] = bcast_get(pack_ref)
    return v


def entities_dataset(vocab_ds, cmap_ref, pack_ref):
    """Distributed entities build: vocab Dataset ⋈ broadcast canonical
    map + alias pack, assembled inside ``map_batches`` — driver memory
    is O(batch), never O(vocabulary).  The 100-TB path: the observed
    vocabulary (incl. corpus-growing ``inf:`` entities) is never folded
    in a driver Python loop.

    vocab_ds needs an ``entity_id`` column; cmap_ref/pack_ref are
    ``ray.put`` handles to the canonical map and
    :func:`build_alias_pack` output.  Returns a sorted ENTITIES
    Dataset."""
    import pyarrow.compute as pc

    from ..functions.relational import distinct_on
    from .link import _vec_cmap

    def to_canon(batch: pa.Table) -> pa.Table:
        canon = _canon_rewrite(batch["entity_id"], _vec_cmap(cmap_ref))
        # per-batch distinct combiner: a hot entity contributes ≤1 row
        # per batch into the global distinct
        return pa.table({"entity_id": pc.unique(canon)})

    def assemble(batch: pa.Table) -> pa.Table:
        return _assemble_entities(batch["entity_id"], _cached_pack(pack_ref))

    distinct = distinct_on(
        vocab_ds.map_batches(to_canon, batch_format="pyarrow"), ["entity_id"]
    )
    return distinct.map_batches(assemble, batch_format="pyarrow").sort(
        "entity_id"
    )
