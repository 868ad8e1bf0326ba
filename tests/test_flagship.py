"""Flagship pipeline P/R vs the golden oracle + resume semantics
(reference analog: cross-language golden tests, JavaVsCppTest.java:42-54;
our target: triple P/R >= 0.95, BASELINE.md)."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from cpg_ray.pagegen import (
    cfg_for_variant,
    generate_pages_dataset,
    gold_triples,
    materialize_pages,
)
from cpg_ray.pipelines.flagship import run_flagship, triples_dataset

N = 400


def _pr(got: set, want: set):
    tp = len(got & want)
    p = tp / max(1, len(got))
    r = tp / max(1, len(want))
    return p, r


@pytest.mark.parametrize("variant", ["basic", "unresolved", "skew", "mixed",
                                     "ambiguous", "scoped"])
def test_flagship_pr(variant):
    cfg = cfg_for_variant(variant)
    pages = generate_pages_dataset(N, cfg, variant)
    triples, ents = triples_dataset(pages, cfg)
    df = triples.to_pandas()
    got = set(zip(df.canonical_subj, df.pred, df.canonical_obj))
    w = cfg.build()
    want = set()
    for i in range(N):
        want |= gold_triples(w, i, variant)
    p, r = _pr(got, want)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"
    # canonicalization collapsed every twin id
    twins = {b for _a, b in w.equivalences}
    assert not (set(df.canonical_subj) | set(df.canonical_obj)) & twins


def test_inferred_entities_surface(tmp_path):
    cfg = cfg_for_variant("unresolved")
    pages = generate_pages_dataset(200, cfg, "unresolved")
    triples, ents = triples_dataset(pages, cfg)
    df = triples.to_pandas()
    assert df.obj_is_inferred.any()
    edf = ents.to_pandas()
    inf = edf[edf.is_inferred]
    assert len(inf) > 0
    assert all(e.startswith("inf:") for e in inf.entity_id)


def test_skew_hot_entity_still_exact():
    """Salted two-phase aggregation must not lose or duplicate the hot
    entity (north-rule skew fixture: org 0 in >50% of works_for)."""
    cfg = cfg_for_variant("skew")
    pages = generate_pages_dataset(300, cfg, "skew")
    triples, ents = triples_dataset(pages, cfg)
    df = triples.to_pandas()
    wf = df[df.pred == "works_for"]
    hot_share = (wf.canonical_obj == "O00000").mean()
    assert hot_share >= 0.5
    edf = ents.to_pandas()
    assert (edf.entity_id == "O00000").sum() == 1  # exactly one canonical row


def test_ambiguous_alias_resolved_by_prior():
    """One surface form registered for two entities: the linker must
    pick the higher-prior candidate deterministically (CallResolver
    scoring analog)."""
    from cpg_ray.stages.link import build_norm_index

    w = cfg_for_variant("ambiguous").build()
    assert w.ambiguous_aliases, "fixture lost its ambiguous aliases"
    idx = build_norm_index(w.alias_rows())
    from cpg_ray.normalize import norm_name

    for alias, eid, _canon, prior in w.ambiguous_aliases:
        if prior > 0.5:
            assert idx[norm_name(alias)][0] == eid


def test_infer_on_miss_toggle():
    """InferenceConfiguration analog: inference off drops triples with
    an unresolved side instead of fabricating inferred entities."""
    cfg = cfg_for_variant("unresolved")
    pages = generate_pages_dataset(150, cfg, "unresolved")
    on_df = triples_dataset(pages, cfg)[0].to_pandas()
    off_df = triples_dataset(pages, cfg, infer_on_miss=False)[0].to_pandas()
    assert on_df.obj_is_inferred.any()
    assert not off_df.obj_is_inferred.any()
    assert not off_df.subj_is_inferred.any()
    assert not off_df.obj.str.startswith("inf:").any()
    dropped = len(on_df) - len(off_df)
    assert dropped == int(on_df.obj_is_inferred.sum() + on_df.subj_is_inferred.sum()
                          - (on_df.obj_is_inferred & on_df.subj_is_inferred).sum())


def test_run_flagship_resume(tmp_path):
    cfg = cfg_for_variant("basic")
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    materialize_pages(pages_dir, 200, cfg, "basic", num_files=4)

    s1 = run_flagship(pages_dir, out_dir, cfg, n_shards=2)
    assert s1["triples_out"] > 0 and s1["shards_skipped"] == 0
    s2 = run_flagship(pages_dir, out_dir, cfg, n_shards=2, resume=True)
    assert s2["shards_skipped"] == s2["shards"]
    assert s2["triples_out"] == s1["triples_out"]

    # partial-failure resume: nuke one shard's marker → only it reruns
    marker = glob.glob(os.path.join(out_dir, "graph", "shard=0", "_SUCCESS"))[0]
    os.remove(marker)
    shutil.rmtree(os.path.join(out_dir, "triples"))
    s3 = run_flagship(pages_dir, out_dir, cfg, n_shards=2, resume=True)
    assert s3["shards_skipped"] == s3["shards"] - 1
    assert s3["triples_out"] == s1["triples_out"]

    # incremental recompute: a shard whose INPUT FILES changed is stale
    # even though its marker exists
    extra = os.path.join(pages_dir, "zz_extra.parquet")
    import pyarrow.parquet as pq2

    src = glob.glob(os.path.join(pages_dir, "*.parquet"))[0]
    pq2.write_table(pq2.read_table(src).slice(0, 5), extra)
    s4 = run_flagship(pages_dir, out_dir, cfg, n_shards=2, resume=True)
    assert s4["shards_skipped"] < s4["shards"]  # at least one stale shard reran
    # phase B staleness: the added pages must refresh the TRIPLES too —
    # resume must not leave triples/entities stale after a graph shard
    # recompute (phase B reruns whenever its input file set changed)
    assert s4["triples_out"] > s1["triples_out"]
    os.remove(extra)

    # lineage/metrics written
    mfiles = glob.glob(os.path.join(out_dir, "metrics", "*.parquet"))
    assert mfiles
    m = pq.read_table(mfiles[0])
    assert {"partition_id", "stage", "rows_in", "rows_out", "wall_ms"} <= set(
        m.column_names
    )

    # output is sorted by canonical_subj (O1 materialize sort)
    tri = pq.read_table(glob.glob(os.path.join(out_dir, "triples", "shard=0", "*.parquet"))[0])
    subj = tri["canonical_subj"].to_pylist()
    assert subj == sorted(subj)

    # per-shard vocab partials committed with lineage (A2 mergeFrom as
    # shard-local partial + global merge), and their merged counts equal
    # a direct count over the final triples
    vmarkers = glob.glob(os.path.join(out_dir, "vocab", "shard=*", "_SUCCESS"))
    tmarkers = glob.glob(os.path.join(out_dir, "triples", "shard=*",
                                      "_SUCCESS"))
    assert vmarkers and len(vmarkers) == len(tmarkers)
    import json as _json

    stages = {_json.load(open(mk))["stage"] for mk in vmarkers}
    assert stages == {"vocab-partial"}
    import pandas as _pd

    vparts = _pd.concat([
        pq.read_table(f).to_pandas()
        for f in glob.glob(os.path.join(out_dir, "vocab", "shard=*",
                                        "*.parquet"))
    ])
    merged = vparts.groupby("entity_id").n_mentions.sum()
    tri_all = _pd.concat([
        pq.read_table(f, columns=["subj", "obj"]).to_pandas()
        for f in glob.glob(os.path.join(out_dir, "triples", "shard=*",
                                        "*.parquet"))
    ])
    direct = _pd.concat([tri_all.subj, tri_all.obj]).value_counts()
    assert merged.sort_index().equals(
        direct.sort_index().rename_axis("entity_id").rename("n_mentions")
    )


def test_run_flagship_total_order(tmp_path):
    """total_order=True materializes triples_sorted/: one cross-shard
    sort, globally ordered when files are read in path order (O1 FULL
    parity — per-shard order stays the scale-correct default), same row
    multiset as the per-shard triples, cost recorded in lineage."""
    import json as _json

    import pandas as _pd

    cfg = cfg_for_variant("basic")
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    materialize_pages(pages_dir, 200, cfg, "basic", num_files=4)

    run_flagship(pages_dir, out_dir, cfg, n_shards=3, total_order=True)
    sfiles = sorted(
        glob.glob(os.path.join(out_dir, "triples_sorted", "shard=0",
                               "*.parquet"))
    )
    assert sfiles
    keys = ["canonical_subj", "pred", "canonical_obj", "url", "span_start"]
    df = _pd.concat(
        [pq.read_table(f, columns=keys).to_pandas() for f in sfiles],
        ignore_index=True,
    )
    assert df.equals(
        df.sort_values(keys, kind="mergesort").reset_index(drop=True)
    ), "path-ordered read must be globally sorted"
    # same multiset as the per-shard output
    per_shard = _pd.concat([
        pq.read_table(f, columns=keys).to_pandas()
        for f in glob.glob(os.path.join(out_dir, "triples", "shard=*",
                                        "*.parquet"))
    ], ignore_index=True).sort_values(keys, kind="mergesort")
    assert len(per_shard) == len(df)
    assert per_shard.reset_index(drop=True).equals(
        df.sort_values(keys, kind="mergesort").reset_index(drop=True)
    )
    # lineage: the sort's cost is a recorded stage, and resume with
    # unchanged inputs skips the re-sort (marker mtime unchanged)
    marker = os.path.join(out_dir, "triples_sorted", "shard=0", "_SUCCESS")
    assert _json.load(open(marker))["stage"] == "total-order sort"
    mtime = os.path.getmtime(marker)
    run_flagship(pages_dir, out_dir, cfg, n_shards=3, resume=True,
                 total_order=True)
    assert os.path.getmtime(marker) == mtime


def test_run_flagship_prunes_stale_shards(tmp_path):
    """Re-running the same out_dir with FEWER shards must remove the
    orphaned shard dirs (the shard=* globs would silently union their
    stale rows) and rebuild entities."""
    cfg = cfg_for_variant("basic")
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    materialize_pages(pages_dir, 120, cfg, "basic", num_files=4)
    # force 4 physical input files (Ray may have written one block)
    parts = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    import pyarrow.parquet as pq2

    all_t = pq2.read_table(parts[0]) if len(parts) == 1 else None
    if all_t is not None:
        os.remove(parts[0])
        n = all_t.num_rows
        step = n // 4
        for i in range(4):
            sl = all_t.slice(i * step, step if i < 3 else n - 3 * step)
            pq2.write_table(sl, os.path.join(pages_dir, f"p{i}.parquet"))

    s1 = run_flagship(pages_dir, out_dir, cfg, n_shards=4)
    n1 = len(glob.glob(os.path.join(out_dir, "graph", "shard=*")))
    assert n1 >= 3  # enough shards that shrinking leaves orphans
    s2 = run_flagship(pages_dir, out_dir, cfg, n_shards=2, resume=True)
    for k in range(2, n1):
        assert not os.path.isdir(os.path.join(out_dir, "graph", f"shard={k}"))
        assert not os.path.isdir(out_dir + f"/triples/shard={k}")
    # same corpus, different sharding → identical triple volume
    assert s2["triples_out"] == s1["triples_out"]


def test_compaction_side_by_side_resume_and_equality():
    """Compacting many small parquet files must preserve every row,
    respect the size target (FFD bins), resume by skipping existing
    outputs, and never touch the inputs."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cpg_ray.stages.materialize import compact_parquet, plan_compaction

    src = "/tmp/compact_test/in"
    dst = "/tmp/compact_test/out"
    import shutil
    shutil.rmtree("/tmp/compact_test", ignore_errors=True)
    os.makedirs(src)
    for i in range(37):
        pq.write_table(
            pa.table({"k": list(range(i * 10, i * 10 + 10)),
                      "v": [f"r{i}-{j}" for j in range(10)]}),
            f"{src}/part-{i:04d}.parquet")
    sizes = [(p, os.path.getsize(p))
             for p in glob.glob(f"{src}/*.parquet")]
    one = sizes[0][1]

    stats = compact_parquet(src, dst, target_bytes=one * 8)
    assert stats["files_before"] == 37
    assert stats["files_after"] == stats["bins"] < 37
    assert stats["compacted"] == stats["bins"] and stats["skipped"] == 0
    # inputs untouched (side-by-side posture)
    assert len(glob.glob(f"{src}/*.parquet")) == 37
    # row-set equality
    a = pd.read_parquet(src).sort_values("k").reset_index(drop=True)
    b = pd.read_parquet(dst).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # every output within the target (all inputs are below it)
    for p in glob.glob(f"{dst}/*.parquet"):
        assert os.path.getsize(p) <= one * 8 * 1.25  # parquet overhead
    assert os.path.exists(f"{dst}/_SUCCESS")

    # rerun = pure resume
    stats2 = compact_parquet(src, dst, target_bytes=one * 8)
    assert stats2["compacted"] == 0
    assert stats2["skipped"] == stats["bins"]

    # oversized file gets its own bin; in-place refused
    assert plan_compaction([("big", 100), ("s1", 10), ("s2", 10)], 50) \
        == [["big"], ["s1", "s2"]]
    with pytest.raises(ValueError):
        compact_parquet(src, src)


def test_compact_parquet_replan_rewrites_stale_bins():
    """A rerun with a DIFFERENT plan (changed target_bytes or input
    set) must not skip-on-existence: mismatched bins rewrite, orphan
    bins past the new plan's end are removed, and the directory's
    row-set equals the inputs afterwards."""
    import glob
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cpg_ray.stages.materialize import compact_parquet

    src = "/tmp/compact_replan/in"
    dst = "/tmp/compact_replan/out"
    shutil.rmtree("/tmp/compact_replan", ignore_errors=True)
    os.makedirs(src)
    for i in range(12):
        pq.write_table(
            pa.table({"k": list(range(i * 10, i * 10 + 10)),
                      "v": [f"r{i}-{j}" for j in range(10)]}),
            f"{src}/part-{i:04d}.parquet")
    one = os.path.getsize(f"{src}/part-0000.parquet")

    s1 = compact_parquet(src, dst, target_bytes=one * 2)  # many bins
    assert s1["compacted"] == s1["bins"] > 2

    # replan with wider bins: fewer, DIFFERENT bins — everything must
    # rewrite (no stale skip) and the extra old bins must be gone
    s2 = compact_parquet(src, dst, target_bytes=one * 6)
    assert s2["bins"] < s1["bins"]
    assert s2["skipped"] == 0 and s2["compacted"] == s2["bins"]
    assert len(glob.glob(f"{dst}/compact-*.parquet")) == s2["bins"]
    a = pd.read_parquet(src).sort_values("k").reset_index(drop=True)
    b = pd.read_parquet(dst).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # input-set change with same target: affected bins rewrite
    os.remove(f"{src}/part-0011.parquet")
    s3 = compact_parquet(src, dst, target_bytes=one * 6)
    assert s3["compacted"] >= 1
    a = pd.read_parquet(src).sort_values("k").reset_index(drop=True)
    b = pd.read_parquet(dst).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # unchanged rerun is still a pure resume
    s4 = compact_parquet(src, dst, target_bytes=one * 6)
    assert s4["compacted"] == 0 and s4["skipped"] == s4["bins"]
