"""WARC source round-trip: pages → WARC file → read_warc → extract
reproduces the byte-identical text."""

from cpg_ray.pagegen import cfg_for_variant, render_page
from cpg_ray.sources.warc import read_warc, warc_to_pages, write_warc
from cpg_ray.stages.extract import extract_text


def _pages(n=30):
    w = cfg_for_variant("basic").build()
    return [render_page(w, i, "basic") for i in range(n)]


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    pages = _pages()
    for name in ("crawl.warc", "crawl.warc.gz"):
        path = write_warc(str(tmp_path / name), pages)
        ds = read_warc(path)
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        assert len(df) == len(pages)
        by_url = {p["url"]: p for p in pages}
        for r in df.itertuples():
            src = by_url[r.url]
            assert bytes(r.html) == src["html"]
            assert r.warc_ts.value // 1000 == (src["warc_ts"] // 1_000_000) * 1_000_000
            # extraction over WARC-sourced html = the canonical text
            text, _ = extract_text(bytes(r.html))
            assert text == src["text"]


def test_warc_skips_malformed_records(tmp_path):
    pages = _pages(5)
    path = write_warc(str(tmp_path / "c.warc"), pages)
    raw = open(path, "rb").read()
    # corrupt: drop WARC-Target-URI from the first record + inject noise
    raw = raw.replace(b"WARC-Target-URI: " + pages[0]["url"].encode(), b"X: y", 1)
    broken = b"garbage\r\nnot a record\r\n" + raw
    tbl, skipped = warc_to_pages(broken)
    assert tbl.num_rows == 4
    assert skipped == 1


def test_warc_non_response_records_ignored(tmp_path):
    pages = _pages(3)
    path = write_warc(str(tmp_path / "c.warc"), pages)
    raw = open(path, "rb").read()
    extra = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    tbl, skipped = warc_to_pages(extra + raw)
    assert tbl.num_rows == 3 and skipped == 0


def test_warc_to_flagship_end_to_end(tmp_path):
    """The Common-Crawl-shaped path: pages → WARC bytes on disk →
    read_warc → flagship triples, P/R = 1.0 vs the golden oracle (the
    source format must be transparent to the engine)."""
    from cpg_ray.pagegen import _cached_world, cfg_for_variant, gold_triples, render_page
    from cpg_ray.pipelines.flagship import triples_dataset
    from cpg_ray.sources.warc import read_warc, write_warc

    cfg = cfg_for_variant("basic")
    world = _cached_world(cfg)
    rows = [render_page(world, i, "basic") for i in range(80)]
    p1 = write_warc(str(tmp_path / "a.warc.gz"), rows[:40])
    p2 = write_warc(str(tmp_path / "b.warc.gz"), rows[40:])

    from cpg_ray.sources.warc import fill_lang

    # WARC records carry no lang column: the html lang attribute (or
    # langid fallback) fills it so per-language connector dispatch works
    pages = fill_lang(read_warc([p1, p2]))
    triples, _ = triples_dataset(pages, cfg)
    got = {
        (r["canonical_subj"], r["pred"], r["canonical_obj"])
        for r in triples.to_pandas().to_dict("records")
    }
    want = set()
    for i in range(80):
        want |= gold_triples(world, i, "basic")
    assert got == want
