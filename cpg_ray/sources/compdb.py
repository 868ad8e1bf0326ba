"""Compilation-database sidecar source (S9 analog).

Reference: ``CompilationDatabase.fromFile`` parses compile_commands.json
into a per-file config — the file list plus per-file include dirs and
defined symbols — which the frontend consults per translation unit
(frontends/CompilationDatabase.kt:1-208; wired in Application.kt:347-353).

Our analog: a sidecar table of per-URL extraction parameters, loaded
once on the driver, broadcast via ``ray.put`` and handed to the extract
actor pool (``ExtractGraph(config_ref=...)``):

- ``lang``  — force the connector-table dispatch for that url (the
  per-file compiler-flags analog);
- ``skip``  — exclude the url, emitting an auditable
  ``excluded-by-config`` problem row (the compdb's file-list
  restriction; never a silent drop).

Accepted formats: ``.json``/``.jsonl`` (list of objects or one object
per line) and ``.parquet`` — columns/keys: ``url`` (required), ``lang``
(optional), ``skip`` (optional bool).
"""

from __future__ import annotations

import json
import os


def load_extraction_config(path: str) -> dict[str, dict]:
    """Sidecar file → {url: {"lang": str|None, "skip": bool}}.

    Small by contract (one row per specially-configured url, not per
    page) — loaded driver-side and broadcast once, the same shape as
    the alias dictionary (never re-shipped per batch)."""
    suffix = os.path.splitext(path)[1].lower()
    if suffix == ".parquet":
        import pyarrow.parquet as pq

        rows = pq.read_table(path).to_pylist()
    elif suffix in (".json", ".jsonl"):
        with open(path) as f:
            text = f.read().strip()
        if suffix == ".jsonl" or (text and text[0] != "["):
            rows = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
        else:
            rows = json.loads(text)
    else:
        raise ValueError(
            f"unsupported sidecar format '{suffix}' "
            "(supported: .json, .jsonl, .parquet)"
        )
    out: dict[str, dict] = {}
    for r in rows:
        if "url" not in r:
            raise ValueError(f"sidecar row missing 'url': {r!r}")
        out[r["url"]] = {
            "lang": r.get("lang"),
            "skip": bool(r.get("skip", False)),
        }
    return out
