"""URL/domain filtering for web corpora: blocklists, scheme checks,
per-domain caps — the hygiene stage a crawl pipeline runs before
extraction (broadcast blocklist, vectorized checks, no shuffle except
the optional per-domain cap).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pandas as pd


def domain_of(url: str) -> str:
    try:
        host = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    return host.lower()


def _blocked(host: str, blocked: frozenset) -> bool:
    """True if host or any parent domain is blocked (suffix matching:
    blocking 'example.com' blocks 'a.b.example.com')."""
    parts = host.split(".")
    return any(".".join(parts[i:]) in blocked for i in range(len(parts)))


def filter_urls(ds, *, blocked_domains=(), allowed_schemes=("http", "https"),
                url_col: str = "url"):
    """Drop rows whose url has a blocked domain (suffix match) or a
    non-allowed scheme / unparsable url.  Broadcast blocklist."""
    import ray

    ref = ray.put(frozenset(d.lower() for d in blocked_domains))
    schemes = frozenset(allowed_schemes)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        from .relational import bcast_get

        blocked = bcast_get(ref)
        keep = []
        for u in batch[url_col]:
            try:
                sp = urlsplit(u)
            except ValueError:
                keep.append(False)
                continue
            host = (sp.hostname or "").lower()
            keep.append(
                bool(host) and sp.scheme in schemes
                and not _blocked(host, blocked)
            )
        return batch[pd.Series(keep, index=batch.index)]

    return ds.map_batches(f, batch_format="pandas")


def cap_per_domain(ds, *, max_per_domain: int, url_col: str = "url",
                   order_col: str | None = None, mode: str = "driver"):
    """Keep at most N rows per domain (deterministic: min order_col
    rows win) — anti-monoculture sampling for training corpora.

    Grouped head is ALGEBRAIC, so this is the grouped_topk combiner
    shape: each batch keeps its local per-domain head (the data shrinks
    distributed, ≤ N rows per (domain, batch)), then a final head over
    the survivors — never one map_groups task per domain (millions of
    tiny tasks at web scale).  mode="shuffle" finishes with a grouped
    shuffle instead of the driver merge when N × domains exceeds one
    machine."""
    from .relational import grouped_topk

    def add_domain(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__domain"] = [domain_of(u) for u in b[url_col]]
        return b

    capped = grouped_topk(
        ds.map_batches(add_domain, batch_format="pandas"),
        ["__domain"], order_col or url_col, max_per_domain,
        descending=False, mode=mode,
    )
    return capped.map_batches(
        lambda b: b.drop(columns="__domain"), batch_format="pandas"
    )


def canonical_url(s: pd.Series) -> pd.Series:
    """URL canonicalization (the Common-Crawl / web-dedup prep step,
    public shape): strip the fragment, lowercase scheme and host, drop
    a leading ``www.``, drop default ports (``:80`` http / ``:443``
    https), and remove ``utm_*`` tracking parameters — path case and
    the remaining query string are preserved.  Fully vectorized pandas
    str kernels; the DuckDB oracle implements the SAME SPEC with
    independent SQL expressions (regexp_extract/lower/regexp_replace),
    so the two canonicalizers verify each other rather than sharing
    one regex chain."""
    s = s.str.replace(r"#.*$", "", regex=True)
    scheme = s.str.extract(
        r"^([A-Za-z][A-Za-z0-9+.\-]*)://", expand=False).str.lower()
    host = s.str.extract(
        r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", expand=False).str.lower()
    rest = s.str.replace(
        r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "", regex=True)
    host = host.str.replace(r"^www\.", "", regex=True)
    host = host.where(scheme != "http",
                      host.str.replace(r":80$", "", regex=True))
    host = host.where(scheme != "https",
                      host.str.replace(r":443$", "", regex=True))
    rest = rest.str.replace(r"utm_[a-z]+=[^&#]*&", "", regex=True)
    rest = rest.str.replace(r"[?&]utm_[a-z]+=[^&#]*$", "", regex=True)
    return scheme + "://" + host + rest
