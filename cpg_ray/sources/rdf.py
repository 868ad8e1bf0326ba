"""RDF N-Triples sink/source for the triples table — the KG-ecosystem
serialization beside the Parquet graph sink (W3C N-Triples 1.1,
public spec; the reference's :export pushes to Neo4j, Neo4jPlugin
:export analog — this is the same graph leaving the engine in the
interchange format triple stores actually ingest).

Mapping: canonical ids and predicates become ``urn:cpg:`` IRIs with
percent-encoding for characters outside the IRI-safe set (ids carry
spaces/quotes via ``inf:`` norms), so every line is spec-valid:

    <urn:cpg:ent:Q1> <urn:cpg:pred:works_for> <urn:cpg:ent:Q2> .

Scale shape: formatting is a stateless ``map_batches`` pass; each task
writes its own uuid-named ``.nt`` part file (an export is
wipe-and-rerun, so unique names + a count-carrying ``_SUCCESS`` marker
are the right commit protocol — per-shard determinism lives in the
Parquet sink, not the interchange dump).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache
from urllib.parse import quote, unquote

import pandas as pd

_PREFIX = "urn:cpg:"


@lru_cache(maxsize=1 << 18)
def _iri(kind: str, value: str) -> str:
    # percent-encode everything outside the unreserved/IRI-safe set;
    # ':' stays readable (it is legal in a URN's NSS)
    return f"<{_PREFIX}{kind}:{quote(value, safe=':')}>"


def ntriples_lines(batch: pd.DataFrame, *, subj_col="canonical_subj",
                   pred_col="pred", obj_col="canonical_obj"
                   ) -> pd.Series:
    """Format one batch of triples as N-Triples lines (vectorized map
    over cached per-distinct-value IRI encodings)."""
    s = batch[subj_col].map(lambda v: _iri("ent", str(v)))
    p = batch[pred_col].map(lambda v: _iri("pred", str(v)))
    o = batch[obj_col].map(lambda v: _iri("ent", str(v)))
    return s + " " + p + " " + o + " ."


def export_ntriples(triples_ds, out_dir: str, **cols) -> dict:
    """Distributed N-Triples export: one ``.nt`` part per task,
    ``_SUCCESS`` carries the total line count.  Returns the stats."""
    import json
    import uuid

    import ray.data as rd  # noqa: F401 (documents the input contract)

    os.makedirs(out_dir, exist_ok=True)

    def dump(b: pd.DataFrame) -> pd.DataFrame:
        lines = ntriples_lines(b, **cols)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
            if len(lines):
                f.write("\n")
        return pd.DataFrame({"n": [len(lines)]})

    n = int(triples_ds.map_batches(
        dump, batch_format="pandas").to_pandas()["n"].sum())
    stats = {"lines": n, "out_dir": out_dir}
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        json.dump(stats, f)
    return stats


_LINE = re.compile(
    r"^<urn:cpg:ent:(?P<s>[^>]*)> <urn:cpg:pred:(?P<p>[^>]*)> "
    r"<urn:cpg:ent:(?P<o>[^>]*)> \.$")


def parse_ntriples(path_or_dir: str) -> pd.DataFrame:
    """Read ``urn:cpg`` N-Triples back into (subj, pred, obj) — the
    ingest symmetry the round-trip tests pin.  Raises on any line that
    is not a spec-valid triple of this vocabulary."""
    import glob

    files = (sorted(glob.glob(os.path.join(path_or_dir, "*.nt")))
             if os.path.isdir(path_or_dir) else [path_or_dir])
    rows = []
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                m = _LINE.match(line)
                if not m:
                    raise ValueError(f"not a urn:cpg N-Triple: {line!r}")
                rows.append((unquote(m.group("s")),
                             unquote(m.group("p")),
                             unquote(m.group("o"))))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"])
