"""The flagship P0→P4 pipeline: pages → extract → link → canonicalize →
materialize (SURVEY.md §7.1), the Ray-Data reinterpretation of
``TranslationManager.analyze()`` (TranslationManager.kt:73-126):
per-file frontend parse ≙ per-row extract (embarrassingly parallel),
the ScopeManager.mergeFrom barrier ≙ the first shuffle (entity-vocab
groupby), the sequential resolver passes ≙ ordered dataset-to-dataset
stages where only link/canonicalize/materialize shuffle.

Two paths:
- :func:`triples_dataset` — in-memory, returns the canonicalized
  triples ``Dataset``; used by queries()/tests/bench at sf≤0.1 scale.
- :func:`run_flagship` — on-disk, sharded, resumable; ONE pass over the
  pages writes nodes/edges/triples_raw (kind-partitioned), then a
  second job links + canonicalizes the (much smaller) triples.  This is
  the 100 TB shape: the pages are read exactly once, intermediates are
  columnar Parquet, and every shard commits independently.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..pagegen import WorldCfg, _cached_world
from ..stages.canonicalize import (
    build_canonical_map,
    collect_entity_vocab,
    entities_table,
)
from ..stages.extract import ExtractGraph, ExtractTriples
from ..stages.materialize import (
    read_lineage,
    shard_done,
    shard_input_files,
    write_metrics,
    write_shard,
)


def _put(obj):
    import ray

    return ray.put(obj)


def _preimport_fs_modules() -> None:
    """Make lazily-imported filesystem modules thread-stable before
    running Ray Data pipelines from multiple threads.

    Ray's path resolution probes ``from fsspec.implementations.http
    import HTTPFileSystem`` and catches ModuleNotFoundError (aiohttp
    absent here).  Under CONCURRENT first-import the failed module can
    be observed half-initialized by another thread, surfacing as
    ImportError("cannot import name ...") — which Ray does NOT catch.
    Seeding a benign stub (module with a never-instantiated
    HTTPFileSystem sentinel) makes the probe deterministic: the import
    succeeds, the isinstance check is False, no race window exists."""
    import sys
    import types

    import fsspec  # noqa: F401
    import pyarrow.fs  # noqa: F401

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        stub = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:  # sentinel: nothing is an instance
            pass

        stub.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


def triples_dataset(
    pages_ds,
    cfg: WorldCfg,
    *,
    extract_concurrency=(1, 8),
    link_concurrency=None,  # kept for API compat; link runs as tasks now
    extract_batch_size: int = 256,
    infer_on_miss: bool = True,  # InferenceConfiguration analog (X8)
):
    """pages Dataset → canonicalized TRIPLES Dataset (+ entities table).

    Stage shapes: extract = actor pool (holds the gazetteer index);
    link + canonical rewrite = stateless tasks with per-process
    broadcast caches (they fill whatever cores extract leaves free —
    two fixed actor pools in one pipeline can reserve every CPU and
    starve the read stage into a deadlock).

    Returns ``(triples_ds, entities_tbl)``.  The linked intermediate is
    materialized once (triples are orders of magnitude smaller than
    pages) so the vocab scan and the canonical rewrite don't re-run
    extraction; the on-disk path in :func:`run_flagship` achieves the
    same with a Parquet intermediate instead.
    """
    world = _cached_world(cfg)
    alias_rows = world.alias_rows()
    # both indexes built ONCE here and broadcast (per-actor rebuild of a
    # 50k-alias index was the dominant flagship cost — see stages docstrings)
    from ..stages.extract import build_detector_index
    from ..stages.link import build_norm_index, make_canonical_fn, make_link_fn

    det_ref = _put(build_detector_index([r["alias"] for r in alias_rows]))
    norm_ref = _put(build_norm_index(alias_rows))

    raw = pages_ds.map_batches(
        ExtractTriples,
        fn_constructor_kwargs={"index_ref": det_ref},
        batch_size=extract_batch_size,
        batch_format="pyarrow",
        concurrency=extract_concurrency,
    )
    linked = raw.map_batches(
        make_link_fn(norm_ref, infer_on_miss=infer_on_miss),
        batch_size=8192,
        batch_format="pyarrow",
    ).materialize()

    vocab = collect_entity_vocab(linked)
    cmap = build_canonical_map(vocab, world.equivalences)
    triples = linked.map_batches(
        make_canonical_fn(_put(cmap)), batch_size=16384, batch_format="pyarrow"
    )
    ents = entities_table(vocab, cmap, world.alias_rows())
    return triples, ents


def run_flagship(
    pages_path: str,
    out_dir: str,
    cfg: WorldCfg,
    *,
    n_shards: int = 8,
    resume: bool = False,
    extract_concurrency=(1, 8),
    shard_parallelism: int = 2,
    total_order: bool = False,
) -> dict:
    """On-disk sharded run. Returns summary stats (incl. lineage).

    ``total_order=True`` additionally materializes ``triples_sorted/``:
    ONE cross-shard ``Dataset.sort`` over the final triples — full O1
    parity with the reference's global NodeComparator order
    (Neo4jApplication sorts the whole graph before the push).  This is
    an extra all-to-all exchange over the complete triple set, so it is
    OFF by default (per-shard order is the scale-correct default); its
    cost lands in lineage/metrics as the ``total-order sort`` stage.
    Part filenames sort lexicographically in block order, so readers
    recover the global order from the file listing.

    ``shard_parallelism`` runs that many shard sub-pipelines
    concurrently (threads; Ray releases the GIL while waiting) — shards
    stay independent commit units, so resume semantics are unchanged
    while the sequential-shard wall-clock gap closes.  Pools are
    autoscaling ``(1, k)`` so concurrent pipelines share CPUs without
    reserving the machine (fixed pools that sum to every CPU deadlock
    the read stages)."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    from ..stages.extract import build_detector_index
    from ..stages.link import build_norm_index, make_canonical_fn, make_link_fn

    world = _cached_world(cfg)
    alias_rows = world.alias_rows()
    det_ref = _put(build_detector_index([r["alias"] for r in alias_rows]))
    norm_ref = _put(build_norm_index(alias_rows))
    files = glob.glob(os.path.join(pages_path, "*.parquet"))
    shards = shard_input_files(files, n_shards)
    lineage: list[dict] = []
    skipped = 0

    # prune shard dirs left by an earlier run with MORE shards — the
    # shard=* globs (entities rebuild, downstream readers) would union
    # their stale rows silently, markers never consulted
    import shutil

    pruned = False
    for table in ("graph", "triples", "vocab"):
        base = os.path.join(out_dir, table)
        if not os.path.isdir(base):
            continue
        for entry in os.listdir(base):
            if not entry.startswith("shard="):
                continue
            try:
                k = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if k >= len(shards):
                shutil.rmtree(os.path.join(base, entry))
                pruned = True

    # ---- phase A: one pass over pages → kind-partitioned graph shards
    def run_shard(sid_files):
        sid, shard_files = sid_files
        t0 = time.monotonic()
        rows_in = sum(pq.read_metadata(f).num_rows for f in shard_files)
        pages = rd.read_parquet(shard_files)
        graph = pages.map_batches(
            ExtractGraph,
            fn_constructor_kwargs={"index_ref": det_ref},
            batch_size=256,
            batch_format="pyarrow",
            concurrency=extract_concurrency,
        )
        return write_shard(
            graph, out_dir, "graph", sid, "extract", rows_in,
            shard_files, t0, partition_cols=["kind"],
        )

    todo = []
    for sid, shard_files in enumerate(shards):
        if resume and shard_done(out_dir, "graph", sid, shard_files):
            skipped += 1
        else:
            todo.append((sid, shard_files))
    if todo:
        _preimport_fs_modules()
        with ThreadPoolExecutor(max_workers=max(1, shard_parallelism)) as ex:
            lineage.extend(ex.map(run_shard, todo))

    # ---- phase B: link + canonicalize, PER SHARD (parallel, resumable).
    # The canonical map is bounded by the dictionary's equivalence edges
    # (build_canonical_map ignores the observed vocabulary), so the
    # rewrite needs no global vocab barrier: each graph shard's triples
    # link + canonicalize + sort independently — the serial phase-B tail
    # of round 1 becomes one resumable commit unit per shard.
    # Staleness: phase B's inputs are the triple parquet files phase A
    # wrote; a rerun shard writes NEW (uuid-named) files, so passing the
    # current file list to shard_done makes any phase-A recompute (or a
    # changed input set) invalidate that shard's triples marker — resume
    # never leaves triples/entities stale after inputs change.
    cmap = build_canonical_map(None, world.equivalences)
    cmap_ref = _put(cmap)
    triple_cols = ["url", "span_start", "subj_surface", "subj_norm",
                   "pred", "obj_surface", "obj_norm"]

    def run_triple_shard(sid_files):
        sid, files = sid_files
        t0 = time.monotonic()
        rows_in = sum(pq.read_metadata(f).num_rows for f in files)
        raw = rd.read_parquet(files, columns=triple_cols)
        triples = (
            raw.map_batches(make_link_fn(norm_ref), batch_size=8192,
                            batch_format="pyarrow")
            .map_batches(make_canonical_fn(cmap_ref), batch_size=16384,
                         batch_format="pyarrow")
            # O1 analog: per-shard sort (global order is per-commit-unit
            # at scale; a cross-shard total sort would be one more
            # all-to-all over the full triple set)
            .sort(["canonical_subj", "pred", "canonical_obj"])
            # materialized so the vocab partial below reuses the sorted
            # blocks instead of re-reading the just-written parquet in a
            # second Ray execution (measured seconds per shard of fixed
            # per-execution overhead); a shard's triples are small
            .materialize()
        )
        row = write_shard(
            triples, out_dir, "triples", sid, "link+canonicalize",
            rows_in, files, t0,
        )
        # per-shard vocab PARTIAL, committed alongside the triples shard
        # (A2 mergeFrom as shard-local partial + global merge — no later
        # pass ever scans the full triple set again): distinct entities
        # + mention counts of THIS shard's final triples, lineage-keyed
        # on the same input files so staleness tracks the triples shard
        t1 = time.monotonic()
        partial = collect_entity_vocab(
            triples.select_columns(["subj", "obj"])
        )
        vrow = write_shard(
            rd.from_arrow(partial), out_dir, "vocab", sid, "vocab-partial",
            row["rows_out"], files, t1,
        )
        return [row, vrow]

    b_todo = []
    for sid in range(len(shards)):
        files = sorted(
            glob.glob(
                os.path.join(out_dir, "graph", f"shard={sid}",
                             "kind=triple", "*.parquet")
            )
        )
        if not files:
            continue
        if resume and shard_done(out_dir, "triples", sid, files) \
                and shard_done(out_dir, "vocab", sid, files):
            continue
        b_todo.append((sid, files))
    if b_todo:
        _preimport_fs_modules()
        with ThreadPoolExecutor(max_workers=max(1, shard_parallelism)) as ex:
            for rows in ex.map(run_triple_shard, b_todo):
                lineage.extend(rows)

    # ---- entities table: merge the per-shard vocab partials (rows
    # bounded by shards × per-shard vocabulary — never a scan of the
    # triples themselves) whenever any shard changed.  The build is a
    # DISTRIBUTED pass (vocab Dataset ⋈ broadcast alias/canon pack in
    # map_batches, written via Ray) — the observed vocabulary grows with
    # the corpus via ``inf:`` entities, so a driver-side fold over it
    # would be the one stage whose memory scales with corpus size.
    ents_dir = os.path.join(out_dir, "entities")
    if b_todo or pruned or not glob.glob(os.path.join(ents_dir, "*.parquet")):
        import shutil as _sh

        from ..functions.relational import groupby_agg
        from ..stages.canonicalize import build_alias_pack, entities_dataset

        vocab_files = sorted(
            glob.glob(os.path.join(out_dir, "vocab", "shard=*", "*.parquet"))
        )
        merged = groupby_agg(
            rd.read_parquet(vocab_files),
            ["entity_id"], [("n_mentions", "sum", "n_mentions")],
        )
        pack_ref = _put(build_alias_pack(cmap, world.alias_rows()))
        ents_ds = entities_dataset(merged, cmap_ref, pack_ref)
        _sh.rmtree(ents_dir, ignore_errors=True)
        os.makedirs(ents_dir, exist_ok=True)
        ents_ds.write_parquet(ents_dir)

    # ---- optional O1 full parity: global total-order materialize
    if total_order:
        tri_files = sorted(
            glob.glob(
                os.path.join(out_dir, "triples", "shard=*", "*.parquet")
            )
        )
        if tri_files and not (
            resume and not b_todo
            and shard_done(out_dir, "triples_sorted", 0, tri_files)
        ):
            t0 = time.monotonic()
            rows_in = sum(pq.read_metadata(f).num_rows for f in tri_files)
            sorted_ds = rd.read_parquet(tri_files).sort(
                ["canonical_subj", "pred", "canonical_obj",
                 "url", "span_start"]
            )
            lineage.append(
                write_shard(
                    sorted_ds, out_dir, "triples_sorted", 0,
                    "total-order sort", rows_in, tri_files, t0,
                    ordered_filenames=True,
                )
            )

    write_metrics(out_dir, lineage)
    done = read_lineage(out_dir, "graph") + read_lineage(out_dir, "triples")
    return {
        "shards": len(shards),
        "shards_skipped": skipped,
        "lineage_rows": len(done),
        "triples_out": sum(
            r["rows_out"] for r in done if r["partition_id"].startswith("triples")
        ),
    }
