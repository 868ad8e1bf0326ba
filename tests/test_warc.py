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
