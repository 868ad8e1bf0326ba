"""Stage registry, source dispatch, CLI, typestate DFA."""

import json
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_pipeline_registry_order_and_validation():
    from cpg_ray.pipelines.registry import Pipeline, Stage

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column("y", pa.array([v + 1 for v in t["x"].to_pylist()]))

    def double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("z", pc.multiply(t["y"], 2))

    p = Pipeline()
    p.register(Stage("double", double, requires=["y"], produces=["z"]))
    p.register(Stage("add_one", add_one, requires=["x"], produces=["y"]),
               before="double")
    ds = rd.range(5).map_batches(
        lambda t: pa.table({"x": t["id"]}), batch_format="pyarrow"
    )
    out = p.run(ds).to_pandas().sort_values("x")
    assert list(out.z) == [2, 4, 6, 8, 10]
    assert [m["stage"] for m in p.metrics] == ["add_one", "double"]

    bad = Pipeline([Stage("needs_missing", double, requires=["nope"])])
    with pytest.raises(ValueError, match="nope"):
        bad.run(ds)

    with pytest.raises(ValueError, match="duplicate"):
        p.register(Stage("double", double))


def test_read_any_dispatch(tmp_path):
    from cpg_ray.sources.readers import read_any, write_metrics_json

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq_path = tmp_path / "t.parquet"
    csv_path = tmp_path / "t.csv"
    json_path = tmp_path / "t.json"
    df.to_parquet(pq_path)
    df.to_csv(csv_path, index=False)
    df.to_json(json_path, orient="records", lines=True)

    for path in (pq_path, csv_path, json_path):
        got = read_any(str(path)).to_pandas().sort_values("a").reset_index(drop=True)
        assert list(got.a) == [1, 2, 3], path

    with pytest.raises(ValueError, match="no reader registered"):
        read_any(str(tmp_path / "t.xyz"))

    out = write_metrics_json([{"stage": "x", "ms": 1.5}], str(tmp_path / "m"))
    assert json.loads(open(out).readline())["stage"] == "x"


def test_typestate_dfa():
    from cpg_ray.functions.typestate import BIO_BEFORE_CORP, evaluate_order

    ok, viol = BIO_BEFORE_CORP.run(["works_for", "born_in", "based_in"])
    assert ok and viol == -1
    ok, viol = BIO_BEFORE_CORP.run(["based_in", "works_for"])
    assert not ok and viol == 1  # bio fact after corp phase = violation

    df = pd.DataFrame(
        {
            "url": ["u1"] * 3 + ["u2"] * 2,
            "subj_norm": ["s"] * 3 + ["t"] * 2,
            "pred": ["works_for", "based_in", "acquired",
                     "located_in", "born_in"],
            "span_start": [0, 10, 20, 0, 10],
        }
    )
    out = evaluate_order(rd.from_pandas(df)).to_pandas()
    by = {(r.url, r.subject): (r.accepted, r.violation_at)
          for r in out.itertuples()}
    assert by[("u1", "s")] == (True, -1)
    assert by[("u2", "t")] == (False, 1)


def test_cli_gen_translate_stats(tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r1 = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "--num-cpus", "4",
         "gen", "--out", pages, "--n", "200"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=180,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert json.loads(r1.stdout.strip().splitlines()[-1])["pages"] == 200

    r2 = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "--num-cpus", "4",
         "translate", "--pages", pages, "--out", out, "--shards", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["triples_out"] > 0

    r3 = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "stats", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=120,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    lines = [json.loads(line) for line in r3.stdout.strip().splitlines()]
    assert any(l["partition_id"].startswith("triples") for l in lines)

    r4 = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "--num-cpus", "4",
         "cypher", "--out", out, "--query",
         "MATCH (m:Mention) RETURN count(m) AS n"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=180,
    )
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert int(r4.stdout.strip().splitlines()[-1].split()[-1]) > 0

    # N-Triples export round-trips through the rdf parser
    nt_dest = str(tmp_path / "nt")
    r5 = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "--num-cpus", "4",
         "export", "--out", out, "--dest", nt_dest, "--fmt", "nt"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300,
    )
    assert r5.returncode == 0, r5.stderr[-2000:]
    n_exported = json.loads(
        r5.stdout.strip().splitlines()[-1])["exported_rows"]
    assert n_exported > 0
    from cpg_ray.sources.rdf import parse_ntriples

    assert len(parse_ntriples(nt_dest)) == n_exported


def test_cli_ingest_warc(tmp_path):
    from cpg_ray.pagegen import _cached_world, cfg_for_variant, render_page
    from cpg_ray.sources.warc import write_warc

    world = _cached_world(cfg_for_variant("basic"))
    rows = [render_page(world, i, "basic") for i in range(30)]
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    write_warc(str(warc_dir / "a.warc.gz"), rows[:15])
    write_warc(str(warc_dir / "b.warc.gz"), rows[15:])
    out = str(tmp_path / "pages")

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "cpg_ray.cli", "--num-cpus", "4",
         "ingest", "--warc", str(warc_dir), "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["pages"] == 30

    import pyarrow.parquet as pq2

    t = pq2.read_table(out)
    assert set(t.column_names) == {"url", "warc_ts", "html", "text", "lang"}
    assert set(t["lang"].to_pylist()) <= {"en", "de", "fr"}


def test_zone_map_pruned_read_clustered_vs_shuffled():
    """Zone-map pruning must (a) never lose a matching row, and (b)
    actually skip most files when the layout is clustered on the
    predicate column — the Z-order/sorted-shard payoff."""
    import glob
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cpg_ray.sources.readers import read_parquet_pruned

    rng = np.random.RandomState(3)
    n = 8000
    df = pd.DataFrame({"k": rng.randint(0, 10_000, n).astype("int64"),
                       "v": rng.rand(n)})
    base = "/tmp/zonemap_test"
    shutil.rmtree(base, ignore_errors=True)
    for name, order in (("clustered", df.sort_values("k")),
                        ("shuffled", df)):
        d = f"{base}/{name}"
        os.makedirs(d)
        for i, chunk in enumerate(np.array_split(order, 20)):
            pq.write_table(pa.Table.from_pandas(
                chunk.reset_index(drop=True)), f"{d}/p{i:03d}.parquet")

    want = df[(df.k >= 4000) & (df.k <= 4400)].sort_values(
        ["k", "v"]).reset_index(drop=True)

    ds_c, st_c = read_parquet_pruned(f"{base}/clustered",
                                     {"k": (4000, 4400)})
    got = (ds_c.to_pandas().query("4000 <= k <= 4400")
           .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert st_c["files_skipped"] >= 15, st_c  # clustered: most skipped

    ds_s, st_s = read_parquet_pruned(f"{base}/shuffled",
                                     {"k": (4000, 4400)})
    got_s = (ds_s.to_pandas().query("4000 <= k <= 4400")
             .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got_s, want)
    assert st_s["files_skipped"] == 0  # every shuffled file overlaps

    # no-match predicate prunes everything and returns an empty Dataset
    ds_e, st_e = read_parquet_pruned(f"{base}/clustered",
                                     {"k": (50_000, None)})
    assert st_e["files_read"] == 0 and ds_e.count() == 0
    # unknown/stat-less columns are kept, never filtered
    _, st_u = read_parquet_pruned(f"{base}/clustered",
                                  {"nonexistent": (0, 1)})
    assert st_u["files_skipped"] == 0


def test_ntriples_roundtrip_and_escaping():
    """Export → parse must be the identity on (subj, pred, obj) sets,
    including ids carrying spaces, quotes, angle brackets and unicode
    (percent-encoded into spec-valid IRIs)."""
    import shutil

    import pandas as pd
    import ray.data as rd

    from cpg_ray.sources.rdf import (export_ntriples, ntriples_lines,
                                     parse_ntriples)

    tri = pd.DataFrame({
        "canonical_subj": ["ent:Q1", "inf:has space", 'inf:qu"ote',
                           "ent:Q2", "inf:üñíçødé"],
        "pred": ["works_for", "located in", "says", "born_in", "w<>p"],
        "canonical_obj": ["ent:Q2", "ent:Q3", "inf:x\ty",
                          "inf:new\nline", "ent:Q1"],
    })
    out = "/tmp/nt_export_test"
    shutil.rmtree(out, ignore_errors=True)
    stats = export_ntriples(rd.from_pandas(tri).repartition(3), out)
    assert stats["lines"] == 5

    back = parse_ntriples(out)
    assert set(zip(back.subj, back.pred, back.obj)) == set(
        zip(tri.canonical_subj, tri.pred, tri.canonical_obj))

    # every emitted line is single-line and spec-shaped (no raw
    # whitespace beyond the three separators)
    lines = ntriples_lines(tri)
    for ln in lines:
        assert "\n" not in ln and "\t" not in ln
        assert ln.endswith(" .") and ln.count(" ") == 3


def test_check_registry_runtime_plugins(tmp_path):
    """Consumer-check registry (console :run analog): built-ins pass
    on a well-formed graph; third-party modules dropped in a directory
    register at RUNTIME; a crashing check and a broken plugin become
    failed report rows, never exceptions."""
    import json
    import subprocess
    import sys

    from cpg_ray.pipelines.checks import default_registry

    # a tiny translated graph (cached by the conftest-level helpers if
    # present; build here from the pagegen world otherwise)
    from cpg_ray.pagegen import cfg_for_variant, materialize_pages
    from cpg_ray.pipelines.flagship import run_flagship

    cfg = cfg_for_variant("basic")
    pages = materialize_pages(str(tmp_path / "pages"), 200, cfg, "basic")
    out = str(tmp_path / "graph")
    run_flagship(pages, out, cfg, n_shards=2, resume=True)

    plug = tmp_path / "plugins"
    plug.mkdir()
    (plug / "good.py").write_text(
        "def register(registry):\n"
        "    registry.add('plugin_node_count', lambda ctx: "
        "(ctx.nodes().count() > 0, 'has nodes'), source='good.py')\n"
    )
    (plug / "crashy.py").write_text(
        "def register(registry):\n"
        "    def boom(ctx):\n"
        "        raise RuntimeError('intentional')\n"
        "    registry.add('plugin_boom', boom, source='crashy.py')\n"
    )
    (plug / "broken.py").write_text("this is not python ][\n")

    reg = default_registry()
    loaded = reg.discover(str(plug))
    assert len(loaded) == 2  # broken.py fails to load, but is reported
    report = reg.run(out)
    rows = report.set_index("check")

    assert rows.loc["triples_nonempty", "ok"]
    assert rows.loc["no_dangling_edges", "ok"]
    assert rows.loc["triple_schema", "ok"]
    assert rows.loc["plugin_node_count", "ok"]
    assert not rows.loc["plugin_boom", "ok"]
    assert "intentional" in rows.loc["plugin_boom", "detail"]
    assert not rows.loc["load:broken.py", "ok"]

    # duplicate names are rejected at registration
    import pytest

    with pytest.raises(ValueError):
        reg.add("plugin_boom", lambda ctx: (True, ""))


def test_read_any_orc_and_feather(tmp_path):
    """Task-per-file ORC / Arrow-IPC readers: suffix dispatch, column
    pruning at the read, multi-file directory fan-out."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.orc as orc

    from cpg_ray.sources.readers import read_any

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                       "c": [0.5, 1.5, 2.5]})
    t = pa.Table.from_pandas(df, preserve_index=False)
    orc.write_table(t, str(tmp_path / "t.orc"))
    feather.write_feather(t, str(tmp_path / "t.feather"))

    for name in ("t.orc", "t.feather"):
        got = read_any(str(tmp_path / name)).to_pandas() \
            .sort_values("a").reset_index(drop=True)
        assert list(got.a) == [1, 2, 3], name
        assert list(got.columns) == ["a", "b", "c"], name

    # column pruning
    got = read_any(str(tmp_path / "t.orc"), columns=["a"]).to_pandas()
    assert list(got.columns) == ["a"]

    # directory of several files fans out task-per-file
    d = tmp_path / "many"
    d.mkdir()
    for i in range(3):
        orc.write_table(
            pa.table({"a": [i * 10, i * 10 + 1]}), str(d / f"p{i}.orc"))
    got = read_any(str(d)).to_pandas().sort_values("a")
    assert list(got.a) == [0, 1, 10, 11, 20, 21]
