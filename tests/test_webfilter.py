"""URL hygiene stage + es connector dispatch."""

import pandas as pd
import ray.data as rd


def _pages_df():
    return pd.DataFrame(
        {
            "url": [
                "https://site1.example/p/1",
                "https://spam.bad.example/p/2",
                "http://bad.example/p/3",
                "ftp://site2.example/p/4",
                "https://sub.a.site3.example/p/5",
                "not a url at all",
            ],
            "doc_id": range(6),
        }
    )


def test_filter_urls_blocklist_and_scheme():
    from cpg_ray.functions.webfilter import filter_urls

    out = filter_urls(
        rd.from_pandas(_pages_df()), blocked_domains=["bad.example"]
    ).to_pandas()
    assert set(out.doc_id) == {0, 4}  # spam.bad + bad blocked, ftp + junk dropped


def test_cap_per_domain():
    from cpg_ray.functions.webfilter import cap_per_domain

    df = pd.DataFrame(
        {
            "url": [f"https://d{i % 2}.example/p/{i}" for i in range(10)],
            "doc_id": range(10),
        }
    )
    out = cap_per_domain(
        rd.from_pandas(df), max_per_domain=2, order_col="doc_id"
    ).to_pandas()
    assert len(out) == 4
    assert set(out.doc_id) == {0, 1, 2, 3}  # min doc_id per domain kept


def test_es_connector_dispatch():
    from cpg_ray.stages.extract import MentionDetector, triples_from_mentions
    from cpg_ray.world import CONNECTOR_TO_PRED

    assert CONNECTOR_TO_PRED["es"]["trabaja para"] == "works_for"
    det = MentionDetector(["Ada Verne", "Acme Labs"])
    t = "Ada Verne trabaja para Acme Labs."
    tr = triples_from_mentions(t, det.detect(t), "es")
    assert len(tr) == 1 and tr[0][1] == "works_for"


def test_canonical_url_spec():
    import pandas as pd

    from cpg_ray.functions.webfilter import canonical_url

    s = pd.Series([
        "HTTPS://WWW.Site1.EXAMPLE:443/Path/9?utm_source=x&ref=en#frag",
        "http://www.a.example:80/p?id=1&utm_campaign=z",
        "https://b.example/CaseKept/Q?utm_medium=m",
        "https://c.example:8443/keepport",
        "ftp://D.example/file",
    ])
    out = canonical_url(s).tolist()
    assert out[0] == "https://site1.example/Path/9?ref=en"
    assert out[1] == "http://a.example/p?id=1"          # trailing utm drop
    assert out[2] == "https://b.example/CaseKept/Q"     # utm-only query
    assert out[3] == "https://c.example:8443/keepport"  # non-default port
    assert out[4] == "ftp://d.example/file"             # scheme lowered
