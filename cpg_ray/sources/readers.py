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
