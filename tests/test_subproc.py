"""Out-of-process extractor: child-process pipe protocol must produce
the same bytes as in-process extraction, and survive child death."""

import pyarrow as pa
import ray.data as rd

from cpg_ray.pagegen import cfg_for_variant, render_page
from cpg_ray.schemas import PAGES
from cpg_ray.stages.subproc import SubprocessExtractText


def _batch(n=25, variant="mixed"):
    w = cfg_for_variant(variant).build()
    rows = [render_page(w, i, variant) for i in range(n)]
    return rows, pa.Table.from_pydict(
        {c: [r[c] for r in rows] for c in PAGES.names}, schema=PAGES
    )


def test_subprocess_extract_matches_inprocess():
    rows, batch = _batch()
    ex = SubprocessExtractText()
    out = ex(batch).to_pandas()
    by_url = {r["url"]: r["text"] for r in rows}
    for r in out.itertuples():
        assert r.text == by_url[r.url]


def test_subprocess_extract_survives_child_death():
    rows, batch = _batch(6, "basic")
    ex = SubprocessExtractText()
    ex(batch.slice(0, 2))
    ex.child.kill()
    ex.child.wait()
    out = ex(batch.slice(2, 4)).to_pandas()
    # first row after death is a problem marker; the restarted child
    # serves the rest byte-identically
    assert bool(out.is_problem.iloc[0])
    by_url = {r["url"]: r["text"] for r in rows}
    for r in out.iloc[1:].itertuples():
        assert r.text == by_url[r.url]
        assert not r.is_problem


def test_subprocess_extract_as_actor_pool():
    rows, batch = _batch(40)
    ds = rd.from_arrow(batch)
    out = ds.map_batches(
        SubprocessExtractText, batch_size=8, batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    by_url = {r["url"]: r["text"] for r in rows}
    assert len(out) == len(rows)
    for r in out.itertuples():
        assert r.text == by_url[r.url]
