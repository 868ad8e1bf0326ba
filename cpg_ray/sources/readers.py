"""Sources and sinks (SURVEY.md §2.1).

Reference analogs: file-tree discovery → the Parquet manifest (S1);
extension→frontend dispatch → format dispatch by suffix (S2); the
Neo4j push → partitioned Parquet writes (S11, in stages/materialize);
benchmark JSON sink → metrics write_json (S12).

All readers prune columns at the read and return a lazy Dataset; the
format dispatcher mirrors ``TranslationManager.getFrontend``
(TranslationManager.kt:373-405): suffix → reader, unknown suffix →
explicit error listing what IS supported (never a silent skip).
"""

from __future__ import annotations

import os

_READERS = {}


def _register(*suffixes):
    def deco(fn):
        for s in suffixes:
            _READERS[s] = fn
        return fn

    return deco


@_register(".parquet")
def read_parquet(path, columns=None, **kw):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kw)


@_register(".csv")
def read_csv(path, columns=None, **kw):
    import ray.data as rd

    ds = rd.read_csv(path, **kw)
    return ds.select_columns(columns) if columns else ds


@_register(".json", ".jsonl")
def read_json(path, columns=None, **kw):
    import ray.data as rd

    ds = rd.read_json(path, **kw)
    return ds.select_columns(columns) if columns else ds


@_register(".txt")
def read_text(path, columns=None, **kw):
    import ray.data as rd

    return rd.read_text(path, **kw)


@_register(".warc", ".warc.gz")
def read_warc_files(path, columns=None, **kw):
    from .warc import read_warc

    return read_warc(path, **kw)


def _file_task_read(path, loader, columns=None):
    """Distributed task-per-file read for formats Ray Data has no
    native reader for: a Dataset of file paths fans out, each task
    loads ONE file with the pyarrow ``loader`` and emits its rows as
    an Arrow table (column-pruned at the read).  Same shape as Ray's
    own file-based datasources — reads scale with file count, nothing
    lands on the driver."""
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if not f.startswith(("_", ".")))
    else:
        files = sorted(_expand_glob(path))
    if not files:
        raise FileNotFoundError(f"no data files under {path}")

    def load(batch):
        import pyarrow as pa

        tables = [loader(p, columns) for p in batch["path"]]
        return pa.concat_tables(tables) if tables else loader(
            files[0], columns).slice(0, 0)

    paths = rd.from_items([{"path": p} for p in files])
    return paths.map_batches(load, batch_format="pandas", batch_size=1)


def _expand_glob(path):
    import glob as _g

    hits = _g.glob(path)
    return hits if hits else [path]


@_register(".orc")
def read_orc(path, columns=None, **kw):
    """ORC read (no native Ray reader): task-per-file via pyarrow.orc,
    columns pruned inside the stripe read."""

    def loader(p, cols):
        import pyarrow.orc as _orc

        return _orc.ORCFile(p).read(columns=cols)

    return _file_task_read(path, loader, columns)


@_register(".feather", ".arrow")
def read_feather(path, columns=None, **kw):
    """Arrow IPC / Feather v2 read: task-per-file via
    pyarrow.feather (zero-copy mmap inside the task)."""

    def loader(p, cols):
        import pyarrow.feather as _f

        return _f.read_table(p, columns=cols)

    return _file_task_read(path, loader, columns)


def _dispatch_suffix(name: str) -> str:
    """Compound-aware suffix: '.gz' dispatches on the inner suffix
    (data.warc.gz → '.warc.gz', data.csv.gz → '.csv.gz' → explicit
    'no reader' error rather than silently parsing gzip bytes as WARC)."""
    name = name.lower()
    if name.endswith(".gz"):
        inner = os.path.splitext(name[: -len(".gz")])[1]
        return f"{inner}.gz" if inner else ".gz"
    return os.path.splitext(name)[1]


def read_any(path: str, columns=None, **kw):
    """Suffix-dispatched read (S2 analog).  Directories dispatch on the
    suffix of their first file."""
    probe = path
    if os.path.isdir(path):
        entries = sorted(
            f for f in os.listdir(path) if not f.startswith(("_", "."))
        )
        if not entries:
            raise FileNotFoundError(f"no data files under {path}")
        probe = entries[0]
    suffix = _dispatch_suffix(probe)
    reader = _READERS.get(suffix)
    if reader is None:
        raise ValueError(
            f"no reader registered for '{suffix}' "
            f"(registered: {sorted(_READERS)})"
        )
    return reader(path, columns=columns, **kw)


def write_metrics_json(ds_or_rows, out_dir: str) -> str:
    """Benchmark/metrics JSON sink (S12 analog, Benchmark.kt:39-52)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    if hasattr(ds_or_rows, "write_json"):
        ds_or_rows.write_json(out_dir)
        return out_dir
    path = os.path.join(out_dir, "metrics.json")
    with open(path, "w") as f:
        for row in ds_or_rows:
            f.write(json.dumps(row) + "\n")
    return path


# ---------------------------------------------------------------------------
# Zone-map pruned reads (the payoff of clustered layout)
# ---------------------------------------------------------------------------


def read_parquet_pruned(path, predicates: dict, columns=None, **kw):
    """``read_parquet`` that SKIPS whole files whose footer min/max
    statistics prove no row can match — the zone-map read that
    clustered layout (sorted shards, Z-order —
    :mod:`cpg_ray.functions.layout`) exists to enable.  At 100 TB the
    cheapest byte is the one never read: footers are a few KB per
    file, so planning cost is O(files), not O(data).

    ``predicates`` maps column → (lo, hi) — closed interval, either
    end None for unbounded.  A file is kept when EVERY predicate
    interval overlaps that column's [min, max] (files lacking stats
    for a column are kept — pruning is an optimization, never a
    filter).  Returns (Dataset of the kept files, stats dict); rows
    must still be filtered exactly downstream — zone maps prove
    absence, not presence.

    Reference analog: include-path whitelisting in the C++ frontend
    (CXXLanguageFrontend.kt:76-165 skips whole headers by path before
    parsing a byte) — the same prune-before-parse posture at the
    storage layer.
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True))
    else:
        files = [path]
    kept, skipped = [], 0
    for f in files:
        meta = _pq.ParquetFile(f).metadata
        schema_names = {meta.schema.column(i).name
                        for i in range(meta.num_columns)}
        overlap = True
        for col_name, (lo, hi) in predicates.items():
            if col_name not in schema_names:
                continue  # unknown column: keep (never a filter)
            cmin = cmax = None
            have = True
            for rg in range(meta.num_row_groups):
                col_idx = next(
                    i for i in range(meta.num_columns)
                    if meta.schema.column(i).name == col_name)
                st = meta.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    have = False
                    break
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if not have:
                continue  # stats missing: keep
            if (hi is not None and cmin > hi) or \
                    (lo is not None and cmax < lo):
                overlap = False
                break
        if overlap:
            kept.append(f)
        else:
            skipped += 1
    stats = {"files_total": len(files), "files_read": len(kept),
             "files_skipped": skipped}
    if not kept:
        import pyarrow as _pa

        return rd.from_arrow(_pa.table({})), stats
    return rd.read_parquet(kept, columns=columns, **kw), stats
