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
                   order_col: str | None = None):
    """Keep at most N rows per domain (deterministic: min order_col
    rows win) — anti-monoculture sampling for training corpora.  The
    one shuffle in this module (groupby domain)."""

    def add_domain(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__domain"] = [domain_of(u) for u in b[url_col]]
        return b

    def head(g: pd.DataFrame) -> pd.DataFrame:
        if order_col:
            g = g.sort_values(order_col, kind="mergesort")
        else:
            g = g.sort_values(url_col, kind="mergesort")
        return g.head(max_per_domain).drop(columns="__domain")

    return (
        ds.map_batches(add_domain, batch_format="pandas")
        .groupby("__domain")
        .map_groups(head, batch_format="pandas")
    )
