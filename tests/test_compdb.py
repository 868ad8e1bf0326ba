"""S9 compilation-database sidecar + unsupported-language dispatch
(problem rows, never silent: TranslationManager.kt:373-405,
CompilationDatabase.kt:1-208 analogs)."""

from __future__ import annotations

import json

import pyarrow as pa

from cpg_ray.pagegen import _cached_world, cfg_for_variant, render_page
from cpg_ray.sources.compdb import load_extraction_config
from cpg_ray.stages.extract import ExtractGraph


def _world():
    return _cached_world(cfg_for_variant("basic"))


def _aliases(world):
    return [a["alias"] for a in world.alias_rows()]


def _graph_for(rows, config=None):
    batch = pa.Table.from_pydict({k: [r[k] for r in rows] for k in rows[0]})
    ex = ExtractGraph(aliases=_aliases(_world()), config=config or {})
    return ex(batch).to_pandas()


def test_unsupported_lang_emits_problem_row_and_extracts_best_effort():
    world = _world()
    r = render_page(world, 0, "basic")
    r = dict(r, lang="xx")  # no connector table registered for 'xx'
    out = _graph_for([r])
    probs = out[(out.kind == "problem")]
    assert "unsupported-lang:xx" in set(probs.name)
    # best-effort: mentions/nodes still extracted (en fallback)
    assert (out.kind == "node").sum() > 1


def test_supported_langs_have_no_lang_problem():
    world = _world()
    rows = [render_page(world, i, "basic") for i in range(6)]
    out = _graph_for(rows)
    assert not any(
        str(n).startswith("unsupported-lang")
        for n in out[out.kind == "problem"].name
    )


def test_compdb_lang_override_and_skip(tmp_path):
    world = _world()
    rows = [render_page(world, i, "basic") for i in range(3)]
    sidecar = tmp_path / "compdb.json"
    sidecar.write_text(json.dumps([
        {"url": rows[0]["url"], "skip": True},
        {"url": rows[1]["url"], "lang": "xx"},
    ]))
    cfg = load_extraction_config(str(sidecar))
    assert cfg[rows[0]["url"]]["skip"] is True
    out = _graph_for(rows, config=cfg)

    # skipped url: exactly one auditable problem row, nothing else
    p0 = out[out.url == rows[0]["url"]]
    assert len(p0) == 1 and p0.kind.iloc[0] == "problem"
    assert p0.name.iloc[0] == "excluded-by-config"

    # lang-overridden url: dispatched as 'xx' → unsupported-lang problem
    p1 = out[(out.url == rows[1]["url"]) & (out.kind == "problem")]
    assert "unsupported-lang:xx" in set(p1.name)

    # unconfigured url: untouched
    p2 = out[(out.url == rows[2]["url"]) & (out.kind == "problem")]
    assert len(p2) == 0


def test_compdb_parquet_and_jsonl_roundtrip(tmp_path):
    import pyarrow.parquet as pq

    rows = [{"url": "u1", "lang": "de", "skip": False},
            {"url": "u2", "skip": True}]
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "c.parquet")
    cfg = load_extraction_config(str(tmp_path / "c.parquet"))
    assert cfg["u1"]["lang"] == "de" and cfg["u2"]["skip"] is True

    (tmp_path / "c.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    assert load_extraction_config(str(tmp_path / "c.jsonl")) == cfg
