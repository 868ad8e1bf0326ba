"""Minimal WARC (Web ARChive, ISO 28500) source: Common-Crawl-style
crawls ship as WARC files; this reader turns `response` records into
rows of the engine's pages schema (url, warc_ts, html, text='',
lang='') ready for the extract stage.

Pure-python record parser over the public format: records are
"WARC/1.0\\r\\n" header blocks (Name: value lines) + Content-Length
payload + "\\r\\n\\r\\n" separators; response payloads embed an HTTP
response whose body is the HTML.  Gzip (.warc.gz) is handled via the
stdlib.  Malformed records are skipped and counted, never raised — the
same forgiving posture as the extract stage (Handler.java:129-138).

Scale shape: `read_warc(paths)` = ``read_binary_files`` (one task per
WARC file — the natural CC partition unit) → ``flat`` parse per file in
``map_batches``.  WARC files are self-contained, so this is
embarrassingly parallel with no cross-file state.
"""

from __future__ import annotations

import gzip
import re
import io

import pyarrow as pa

from ..schemas import PAGES


def _parse_warc_ts(value: str) -> int:
    """WARC-Date (ISO-8601 'YYYY-MM-DDTHH:MM:SSZ') → µs since epoch."""
    from datetime import datetime, timezone

    dt = datetime.strptime(value.strip(), "%Y-%m-%dT%H:%M:%SZ")
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def iter_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per record; skips garbage
    between records.

    Gzip is STREAMED (GzipFile over the compressed buffer), so a task
    holds the compressed blob plus one record's payload — never the
    whole decompressed archive (CC WARCs decompress ~4×; the full-blob
    decompress was the memory spike at real archive sizes)."""
    if data[:2] == b"\x1f\x8b":  # gzip magic
        stream = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # inter-record padding / damage: scan forward
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            continue
        payload = stream.read(length)
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Strip the embedded HTTP response head from a response payload."""
    sep = payload.find(b"\r\n\r\n")
    if payload[:5] == b"HTTP/" and sep >= 0:
        return payload[sep + 4 :]
    return payload


def warc_to_pages(data: bytes) -> tuple[pa.Table, int]:
    """One WARC blob → (pages table, skipped_record_count)."""
    urls, tss, htmls = [], [], []
    skipped = 0
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            skipped += 1
            continue
        try:
            ts = _parse_warc_ts(date)
        except ValueError:
            skipped += 1
            continue
        urls.append(url)
        tss.append(ts)
        htmls.append(_http_body(payload))
    table = pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": tss,
            "html": htmls,
            "text": [""] * len(urls),
            "lang": [""] * len(urls),
        },
        schema=PAGES,
    )
    return table, skipped


def read_warc(paths):
    """WARC file(s) → lazy pages Dataset (text/lang empty — the extract
    stage fills text; langid fills lang)."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=False)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"].to_pylist():
            tbl, _skipped = warc_to_pages(blob)
            tables.append(tbl)
        return pa.concat_tables(tables) if tables else PAGES.empty_table()

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


_HTML_LANG = re.compile(rb'<html[^>]*\blang="([A-Za-z-]+)"')


def fill_lang(pages_ds):
    """Stamp the ``lang`` column on WARC-ingested pages: the html
    ``lang`` attribute wins when present (the declared language —
    crawls trust it first), else the stopword-profile langid over the
    extracted text.  One pass, before the extract stage's per-language
    connector dispatch."""
    import pandas as pd

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import langid
        from ..stages.extract import extract_text

        langs, texts = [], []
        for h in b["html"]:
            m = _HTML_LANG.search(bytes(h)[:2048])
            langs.append(
                m.group(1).decode("ascii").split("-")[0].lower() if m else None
            )
            texts.append(extract_text(h)[0] if m is None else "")
        b = b.copy()
        if any(d is None for d in langs):
            pred = langid(pd.DataFrame({"text": texts})).pred_lang
            b["lang"] = [
                d if d is not None else p for d, p in zip(langs, pred)
            ]
        else:  # every page declared its language — skip the langid pass
            b["lang"] = langs
        return b

    return pages_ds.map_batches(fill, batch_format="pandas")


def write_warc(path: str, pages: list[dict]) -> str:
    """Write pages rows as a WARC file (test fixture / round-trip
    helper; gzip if path endswith .gz)."""
    from datetime import datetime, timezone

    buf = io.BytesIO()
    for p in pages:
        dt = datetime.fromtimestamp(
            p["warc_ts"] / 1_000_000, tz=timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + p["html"]
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            f"WARC-Date: {dt}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("latin-1")
        buf.write(head)
        buf.write(http)
        buf.write(b"\r\n\r\n")
    data = buf.getvalue()
    if path.endswith(".gz"):
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path
