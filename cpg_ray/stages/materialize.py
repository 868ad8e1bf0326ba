"""P4 materialize stage: partitioned, resumable Parquet output with
per-partition lineage + metrics rows.

Reference analog: the Neo4j push (cpg-neo4j/Application.kt:223-245) —
one giant transactional ``session.save`` — re-expressed as independent
per-shard Parquet writes:

- output layout: ``out/<table>/shard=<k>/*.parquet`` — one directory per
  input shard, written by an independent sub-pipeline;
- commit protocol: a shard directory counts as done only when its
  ``_SUCCESS`` marker exists; the marker is written after the data and
  carries the lineage row (rows in/out, wall ms, input files);
- resume: rerunning skips shards whose marker exists (anti-join of done
  partition ids before scheduling, SURVEY.md §4 checkpoint/resume);
  a partially-written shard is simply overwritten (idempotent).

There is deliberately no cross-shard transaction and no purge — at
100 TB a single transaction is the reference's StackOverflowError
(cpg-neo4j/README.md "Known issues") writ large.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def shard_input_files(files: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic round-robin assignment of input files to shards."""
    files = sorted(files)
    n_shards = max(1, min(n_shards, len(files)))
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(files):
        shards[i % n_shards].append(f)
    return shards


def shard_dir(out_dir: str, table: str, shard_id: int) -> str:
    return os.path.join(out_dir, table, f"shard={shard_id}")


def shard_done(out_dir: str, table: str, shard_id: int,
               input_files: list[str] | None = None) -> bool:
    """A shard counts as done when its _SUCCESS marker exists AND (when
    ``input_files`` is given) the lineage's recorded inputs match the
    current assignment — incremental recompute: a shard whose input
    file set changed is stale and reruns (lineage as the commit log,
    SURVEY.md §7.4.7)."""
    marker = os.path.join(shard_dir(out_dir, table, shard_id), "_SUCCESS")
    if not os.path.exists(marker):
        return False
    if input_files is None:
        return True
    try:
        with open(marker) as f:
            lineage = json.load(f)
        return sorted(lineage.get("input_files", [])) == sorted(input_files)
    except (OSError, ValueError):
        return False


class OrderedFilenames:
    """Filenames whose lexicographic order equals dataset block order —
    readers that sort paths recover a total-order write exactly."""

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index) -> str:
        # uuid TRAILS the indices (Ray requires it in the name; order is
        # decided by the zero-padded indices before it)
        return f"part-{task_index:06d}-{block_index:06d}-{write_uuid}.parquet"

    def get_filename_for_row(self, row, write_uuid, task_index,
                             block_index, row_index) -> str:
        return (f"part-{task_index:06d}-{block_index:06d}-"
                f"{row_index:09d}-{write_uuid}.parquet")


def write_shard(
    ds,
    out_dir: str,
    table: str,
    shard_id: int,
    stage: str,
    rows_in: int,
    input_files: list[str],
    t_start: float,
    partition_cols: list[str] | None = None,
    ordered_filenames: bool = False,
) -> dict:
    """Write one shard's dataset + _SUCCESS lineage marker (idempotent:
    an existing partial directory is clobbered first).
    ``ordered_filenames`` names parts so path sort order == block order
    (the total-order materialize needs readers to recover the global
    sort from the file listing)."""
    d = shard_dir(out_dir, table, shard_id)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    kwargs = {}
    if ordered_filenames:
        kwargs["filename_provider"] = OrderedFilenames()
    ds.write_parquet(d, partition_cols=partition_cols, **kwargs)
    rows_out = sum(
        pq.read_metadata(os.path.join(root, f)).num_rows
        for root, _dirs, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )
    lineage = {
        "partition_id": f"{table}/shard={shard_id}",
        "stage": stage,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "wall_ms": (time.monotonic() - t_start) * 1000.0,
        "input_files": input_files,
    }
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        json.dump(lineage, f)
    return lineage


def write_metrics(out_dir: str, lineage_rows: list[dict]) -> None:
    """Append lineage/metrics rows (METRICS schema) to out/metrics/."""
    if not lineage_rows:
        return
    from ..schemas import METRICS

    d = os.path.join(out_dir, "metrics")
    os.makedirs(d, exist_ok=True)
    tbl = pa.Table.from_pydict(
        {name: [r[name] for r in lineage_rows] for name in METRICS.names},
        schema=METRICS,
    )
    # content-named file per flush → idempotent overwrite on resume
    # (crc32, NOT builtin hash(): PYTHONHASHSEED randomizes the latter
    # per process, which would leak duplicate metric files across reruns)
    import zlib

    key = zlib.crc32(
        "|".join(sorted(r["partition_id"] for r in lineage_rows)).encode()
    )
    pq.write_table(tbl, os.path.join(d, f"metrics-{key}.parquet"))


def read_lineage(out_dir: str, table: str) -> list[dict]:
    rows = []
    base = os.path.join(out_dir, table)
    if not os.path.isdir(base):
        return rows
    for entry in sorted(os.listdir(base)):
        marker = os.path.join(base, entry, "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                rows.append(json.load(f))
    return rows


# ---------------------------------------------------------------------------
# Compaction (the small-files problem)
# ---------------------------------------------------------------------------


def plan_compaction(files: list[tuple[str, int]],
                    target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing bin packing of (path, size) into bins of at
    most ``target_bytes`` (a file larger than the target gets its own
    bin).  Deterministic: sizes descending, path ascending."""
    bins: list[tuple[int, list[str]]] = []
    for path, size in sorted(files, key=lambda t: (-t[1], t[0])):
        for i, (used, members) in enumerate(bins):
            if used + size <= target_bytes:
                bins[i] = (used + size, members + [path])
                break
        else:
            bins.append((size, [path]))
    return [members for _, members in bins]


def compact_parquet(in_dir: str, out_dir: str, *,
                    target_bytes: int = 128 << 20) -> dict:
    """Compact a directory of small Parquet files into
    ``target_bytes``-sized ones in a NEW directory — the operational
    complement of the per-shard resumable layout (never ONE giant
    file, but never a million tiny ones either: at 100 TB, file-open
    overhead and footer reads dominate a read over fragmented output).

    - planning is driver-side metadata only (paths + sizes);
    - each bin rewrites in its OWN Ray task (bounded memory — a bin is
      at most ``target_bytes``), pyarrow concat → one file.  This is a
      deliberate raw-``ray.remote`` stage: "one output file per
      explicit file group" is exactly the shape the Dataset API can't
      express (SURVEY.md §2 guidance);
    - side-by-side rewrite (the Iceberg-rewrite posture): inputs are
      never touched, so a crash mid-run loses nothing; commit per bin
      is ``<name>.tmp`` → ``os.replace`` (atomic on POSIX); each bin
      also commits a ``.manifest.json`` sidecar naming its members,
      and a rerun skips a bin ONLY when the sidecar matches the
      CURRENT plan — existence alone is not enough, because a rerun
      after ``target_bytes`` or the input file set changed would
      otherwise silently mix stale bins into the new directory and
      stamp ``_SUCCESS`` over them; the final ``_SUCCESS`` marker
      carries the plan, and readers switch directories only when it
      exists (the shard-marker idiom).

    Returns {"bins": n, "compacted": n_rewritten, "skipped": n_resumed,
    "files_before": n, "files_after": n}.

    Reference analog: the unity-build consolidation the survey
    deliberately rejects for INPUT (TranslationManager.kt:184-212,
    SURVEY §2.1 S10) is the right move for OUTPUT metadata — merging
    files, not work units.
    """
    import glob

    import ray

    if os.path.abspath(in_dir) == os.path.abspath(out_dir):
        raise ValueError("compaction is side-by-side: out_dir must "
                         "differ from in_dir (crash safety)")
    files = [(p, os.path.getsize(p))
             for p in sorted(glob.glob(os.path.join(in_dir, "*.parquet")))]
    os.makedirs(out_dir, exist_ok=True)
    bins = plan_compaction(files, target_bytes)

    def _manifest_path(out_path: str) -> str:
        # "_"-prefixed so pyarrow dataset discovery ignores it (the
        # default ignore_prefixes are "." and "_") — readers glob the
        # directory and must never try to parse the sidecar as parquet
        d, b = os.path.split(out_path)
        return os.path.join(d, "_" + b + ".manifest.json")

    @ray.remote
    def rewrite(members: list[str], out_path: str) -> int:
        tables = [pq.read_table(p) for p in sorted(members)]
        merged = pa.concat_tables(tables, promote_options="default")
        tmp = out_path + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, out_path)
        # manifest commits AFTER the data file: a crash between the two
        # re-rewrites the bin on resume (idempotent), never skips a
        # half-written one
        mpath = _manifest_path(out_path)
        mtmp = mpath + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"members": sorted(members)}, f)
        os.replace(mtmp, mpath)
        return merged.num_rows

    def bin_is_current(out_path: str, members: list[str]) -> bool:
        mpath = _manifest_path(out_path)
        if not (os.path.exists(out_path) and os.path.exists(mpath)):
            return False
        try:
            with open(mpath) as f:
                return json.load(f).get("members") == sorted(members)
        except (OSError, json.JSONDecodeError):
            return False

    # orphan cleanup: a replan with fewer bins leaves stale
    # compact-NNNNN outputs past the new plan's end — readers glob the
    # directory, so they must go (their manifests too), and any stale
    # _SUCCESS stops vouching for the directory while we rewrite
    import glob as _glob

    for stale in _glob.glob(os.path.join(out_dir, "compact-*.parquet")):
        idx = os.path.basename(stale)[len("compact-"):-len(".parquet")]
        if not idx.isdigit() or int(idx) >= len(bins):
            os.remove(stale)
            mpath = _manifest_path(stale)
            if os.path.exists(mpath):
                os.remove(mpath)
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)

    stats = {"bins": len(bins), "compacted": 0, "skipped": 0,
             "files_before": len(files), "files_after": len(bins)}
    pending = []
    for i, members in enumerate(bins):
        out_path = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        if bin_is_current(out_path, members):  # resumed, same plan
            stats["skipped"] += 1
            continue
        pending.append(rewrite.remote(members, out_path))
        stats["compacted"] += 1
    ray.get(pending)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        json.dump({"plan": [sorted(m) for m in bins],
                   "target_bytes": target_bytes, **stats}, f)
    return stats
