"""P2 link stage: mention→entity resolution against a broadcast alias
dictionary, run as a ``map_batches`` actor pool.

Reference analogs:
- the alias/candidate dictionary held once per actor =
  recordMap/TypeManager state probed by the resolver passes
  (CallResolver.java:67-69, 106-130; TypeManager.java:106-149) — the
  global mutable singleton becomes a broadcast read-only table
  (``ray.put`` once on the driver, ``ray.get`` once per actor in
  ``__init__``), never re-shipped per batch.
- tiered resolution cascade = CallResolver's signature matching with
  implicit-cast / default-arg widening (CallResolver.java:242-301,
  1017-1133): tier 1 exact norm match (highest prior wins,
  deterministic entity-id tie-break), tier 2 honorific/suffix-stripped
  retry, miss → inferred entity (createInferredFunctionDeclaration
  analog, CallResolver.java:1078-1088): id ``inf:<norm>`` so equal
  unknown surface forms collapse to one entity order-free.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import TRIPLES

LINKED_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("span_start", pa.int64()),
        ("subj_is_inferred", pa.bool_()),
        ("obj_is_inferred", pa.bool_()),
    ]
)


def build_norm_index(alias_rows: list[dict]) -> dict[str, tuple[str, str, float]]:
    """norm(alias) → (entity_id, canonical_name, prior); highest prior
    wins, ties broken on min entity_id (explicit determinism)."""
    from ..normalize import norm_name

    out: dict[str, tuple[str, str, float]] = {}
    for row in alias_rows:
        key = norm_name(row["alias"])
        cand = (row["entity_id"], row["canonical_name"], row["prior"])
        cur = out.get(key)
        if cur is None or cand[2] > cur[2] or (cand[2] == cur[2] and cand[0] < cur[0]):
            out[key] = cand
    return out


# Per-process vectorized view of the broadcast norm index: the dict is
# flattened ONCE per worker into (keys: pa.Array, ids: np.ndarray) so
# every batch resolves with one pc.index_in kernel instead of two dict
# probes per row (the one row-loop the round-1 review flagged in link).
_VEC_INDEX_CACHE: dict[str, tuple] = {}


def _vec_index(index_ref):
    key = index_ref.hex() if hasattr(index_ref, "hex") else str(index_ref)
    v = _VEC_INDEX_CACHE.get(key)
    if v is None:
        import numpy as np

        from ..functions.relational import bcast_get

        index = bcast_get(index_ref)
        keys = pa.array(list(index.keys()), pa.string())
        ids = np.array([hit[0] for hit in index.values()], dtype=object)
        v = _VEC_INDEX_CACHE[key] = (keys, ids)
    return v


def make_link_fn(index_ref, *, infer_on_miss: bool = True):
    """Vectorized link stage (stateless tasks): the norm index is fetched
    at most once per worker process (bcast cache), so the stage runs as
    elastic tasks instead of a CPU-reserving actor pool — it fills
    whatever cores the extract pool leaves free.  Resolution is one
    vectorized ``pc.index_in`` per side (no Python row loop).

    ``infer_on_miss`` is the InferenceConfiguration analog
    (InferenceConfiguration.kt:25-60, used VariableUsageResolver.java:416):
    True fabricates an inferred entity (``inf:<norm>``) for unknown
    surface forms; False drops triples with an unresolved side (the
    resolver simply fails, no edge is created)."""

    def link_batch(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        keys, ids = _vec_index(index_ref)
        sides = {}
        for side in ("subj", "obj"):
            col = batch[f"{side}_norm"]
            idx = pc.fill_null(
                pc.index_in(col, value_set=keys), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            found = idx >= 0
            if len(ids):
                linked = ids[idx.clip(min=0)]  # fancy indexing: fresh array
            else:  # empty dictionary: everything will be inferred
                linked = np.empty(len(idx), dtype=object)
            miss = np.flatnonzero(~found)
            if len(miss):
                # build inf:<norm> ids for the MISSES only — the common
                # case is a near-complete dictionary, so materializing
                # every norm as a Python string would be wasted work
                miss_norms = pc.take(col, pa.array(miss)).to_pylist()
                linked[miss] = [f"inf:{s}" for s in miss_norms]
            sides[side] = (linked, found)
        kept = batch
        if not infer_on_miss:
            mask = sides["subj"][1] & sides["obj"][1]
            if not mask.all():
                kept = batch.take(pa.array(np.flatnonzero(mask)))
                sides = {
                    s: (arr[mask], fnd[mask])
                    for s, (arr, fnd) in sides.items()
                }
        return pa.Table.from_pydict(
            {
                "subj": sides["subj"][0],
                "pred": kept["pred"],
                "obj": sides["obj"][0],
                "url": kept["url"],
                "span_start": kept["span_start"],
                "subj_is_inferred": ~sides["subj"][1],
                "obj_is_inferred": ~sides["obj"][1],
            },
            schema=LINKED_SCHEMA,
        )

    return link_batch


def build_ambiguity_index(alias_rows: list[dict]) -> dict[str, list[tuple]]:
    """norm(alias) → [(entity_id, prior), …] for surface forms registered
    to MORE THAN ONE entity (the candidate sets of the J4 scoring
    cascade, CallResolver.java:242-301)."""
    from ..normalize import norm_name

    by_norm: dict[str, dict[str, float]] = {}
    for row in alias_rows:
        key = norm_name(row["alias"])
        cur = by_norm.setdefault(key, {})
        eid = row["entity_id"]
        cur[eid] = max(cur.get(eid, 0.0), row["prior"])
    return {
        k: sorted(v.items())
        for k, v in by_norm.items()
        if len(v) > 1
    }


def build_related_index(facts_by_subj: dict) -> dict[str, frozenset]:
    """entity_id → the entity ids it is factually related to (the
    'argument signature' of a candidate: what should co-occur in a
    document genuinely about it)."""
    return {
        eid: frozenset(f.obj for f in facts)
        for eid, facts in facts_by_subj.items()
    }


def link_with_context(raw_ds, index_ref, amb_ref, related_ref, *,
                      infer_on_miss: bool = True,
                      n_buckets: int | None = None):
    """Context-sensitive linking — the full J4 candidate-scoring cascade
    (CallResolver.java:242-301, 1017-1133):

    - tier 1: unambiguous exact norm match (broadcast index, as
      :func:`make_link_fn`);
    - tier 2 (ambiguous surface forms only): candidates scored by
      DOCUMENT CONTEXT — the number of the candidate's related entities
      (its fact objects) resolved unambiguously elsewhere in the same
      document.  The analog of signature matching choosing among
      same-name overloads by the arguments actually present at the
      call site;
    - tier 3 (only when tier 2 TIES at the top — the reference gates
      each widening on the previous tier's miss the same way:
      implicit-cast widening CallResolver.java:847-896, default-arg
      widening 980-1016, Java supertype walk 1707-1749): each tied
      candidate's signature is WIDENED by one fact hop — its related
      set unioned with its related entities' own related sets — and
      rescored against the same document context.  A page that never
      names a candidate's direct fact objects but does name its
      2-hop neighborhood resolves here instead of falling to prior;
    - prior, then min entity id, when every tier is silent.

    Resolution is document-local, so triples bucket by hash(url) and
    each url's rows resolve within one group (the same partitioning
    assumption as every per-document operator here — no global state).
    n_buckets=None derives the exchange width from the cluster's CPUs
    (relational.default_n_buckets, floor 32)."""
    import zlib

    if n_buckets is None:
        from ..functions.relational import default_n_buckets

        n_buckets = default_n_buckets(32)

    import pandas as pd

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__b"] = [zlib.crc32(u.encode()) % n_buckets for u in b["url"]]
        return b

    out_cols = ["subj", "pred", "obj", "url", "span_start",
                "subj_is_inferred", "obj_is_inferred"]

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.relational import bcast_get

        index = bcast_get(index_ref)
        amb = bcast_get(amb_ref)
        related = bcast_get(related_ref)
        frames = []
        for _url, sub in g.groupby("url", sort=False):
            norms = pd.concat([sub.subj_norm, sub.obj_norm]).unique()
            context = {
                index[n][0] for n in norms if n in index and n not in amb
            }

            def widened(eid: str) -> set:
                # tier-3 signature widening: the candidate's fact
                # objects plus THEIR fact objects (one extra hop —
                # the supertype-walk analog, never transitive closure)
                r = related.get(eid, frozenset())
                w = set(r)
                for o in r:
                    w |= related.get(o, frozenset())
                return w

            def link_one(n: str) -> tuple[str, bool]:
                cands = amb.get(n)
                if cands is not None:
                    # tier 2: direct context overlap; cands is sorted
                    # by entity id and max() keeps the FIRST of equal
                    # keys, so ties deterministically fall to min id
                    direct = [
                        (len(related.get(c[0], frozenset()) & context), c)
                        for c in cands
                    ]
                    top = max(s for s, _c in direct)
                    tied = [c for s, c in direct if s == top]
                    if len(tied) > 1:
                        # tier 3 (gated on a tier-2 tie): rescore the
                        # TIED candidates on the widened signature
                        wide = [(len(widened(c[0]) & context), c)
                                for c in tied]
                        top3 = max(s for s, _c in wide)
                        tied = [c for s, c in wide if s == top3]
                    best = max(tied, key=lambda c: c[1])
                    return best[0], False
                hit = index.get(n)
                if hit is not None:
                    return hit[0], False
                return f"inf:{n}", True

            cache = {n: link_one(n) for n in norms}
            # dict-backed Series.map (C-level lookup) — per-row lambdas
            # on the tier-2 path would run on every ambiguous mention
            ids = {n: v[0] for n, v in cache.items()}
            inf = {n: v[1] for n, v in cache.items()}
            if not infer_on_miss:
                sub = sub[~(sub.subj_norm.map(inf) | sub.obj_norm.map(inf))]
            frames.append(
                pd.DataFrame(
                    {
                        "subj": sub.subj_norm.map(ids),
                        "pred": sub.pred,
                        "obj": sub.obj_norm.map(ids),
                        "url": sub.url,
                        "span_start": sub.span_start,
                        "subj_is_inferred": sub.subj_norm.map(inf),
                        "obj_is_inferred": sub.obj_norm.map(inf),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(frames, ignore_index=True)

    return (
        raw_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(resolve, batch_format="pandas")
    )


# Per-process vectorized view of the broadcast canonical map, same shape
# as _VEC_INDEX_CACHE: the (tiny — canon≠member twins only) dict is
# flattened once per worker into (keys: pa.Array, values: pa.Array) so
# every batch rewrites with one pc.index_in + pc.take per side instead of
# a Python loop over every triple (it runs twice per triple in the
# hottest post-link stage of both flagship paths).
_VEC_CMAP_CACHE: dict[str, tuple] = {}


def _vec_cmap(cmap_ref):
    key = cmap_ref.hex() if hasattr(cmap_ref, "hex") else str(cmap_ref)
    v = _VEC_CMAP_CACHE.get(key)
    if v is None:
        from ..functions.relational import bcast_get

        cmap = bcast_get(cmap_ref)
        keys = pa.array(list(cmap.keys()), pa.string())
        vals = pa.array(list(cmap.values()), pa.string())
        v = _VEC_CMAP_CACHE[key] = (keys, vals)
    return v


def make_canonical_fn(cmap_ref):
    """Linked batch → TRIPLES batch: stamp canonical_subj/canonical_obj
    from a broadcast canonical map (entity_id → canonical id), identity
    on miss.  One ``pc.index_in`` + take per side — no Python row loop
    (the same vectorization as :func:`make_link_fn`)."""

    def add_canonical(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys, vals = _vec_cmap(cmap_ref)
        out = {name: batch[name] for name in batch.column_names}
        for side in ("subj", "obj"):
            col = batch[side]
            if len(keys):
                idx = pc.index_in(col, value_set=keys)
                # take() maps null idx (miss) → null, then identity-fill
                mapped = pc.take(vals, idx)
                out[f"canonical_{side}"] = pc.coalesce(
                    mapped, col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                )
            else:
                out[f"canonical_{side}"] = col
        return pa.Table.from_pydict(out, schema=TRIPLES)

    return add_canonical
