"""Extract-stage invariants (reference analog: frontend parse tests on
tiny fixtures, SURVEY.md §5.1; EOG index conformance, §5.2)."""

import pyarrow as pa

from cpg_ray.pagegen import cfg_for_variant, render_page
from cpg_ray.schemas import PAGES
from cpg_ray.stages.extract import (
    ExtractGraph,
    MentionDetector,
    extract_text,
    triples_from_mentions,
)

VARIANTS = ["basic", "unresolved", "skew", "dupes", "ordering", "malformed", "mixed"]


def test_text_byte_identical_per_url():
    """THE per-row invariant from BASELINE.json input_hint: extracted
    text is byte-identical to the pages.text column, for every variant
    including truncated HTML."""
    for variant in VARIANTS:
        w = cfg_for_variant(variant).build()
        for i in range(120):
            p = render_page(w, i, variant)
            text, _ = extract_text(p["html"])
            assert text.encode() == p["text"].encode(), (variant, i)


def test_malformed_yields_problem_rows_not_exceptions():
    w = cfg_for_variant("malformed").build()
    det_rows = w.alias_rows()
    eg = ExtractGraph(aliases=[r["alias"] for r in det_rows])
    rows = [render_page(w, i, "malformed") for i in range(60)]
    batch = pa.Table.from_pydict(
        {n: [r[n] for r in rows] for n in PAGES.names}, schema=PAGES
    )
    out = eg(batch)
    kinds = set(out["kind"].to_pylist())
    assert "problem" in kinds
    n_prob = out["kind"].to_pylist().count("problem")
    assert 0 < n_prob < len(rows)


def test_garbage_html_never_raises():
    for blob in [b"", b"<", b"<html><p>x", b"\xff\xfe\x00garbage", b"<p>" * 1000]:
        text, problem = extract_text(blob)
        assert isinstance(text, str)
        assert problem is True


def test_eog_index_matches_text_order():
    """Order is data (an index column), not stream position —
    Properties.INDEX analog (Properties.java:43-49)."""
    w = cfg_for_variant("ordering").build()
    eg = ExtractGraph(aliases=[r["alias"] for r in w.alias_rows()])
    rows = [render_page(w, i, "ordering") for i in range(30)]
    batch = pa.Table.from_pydict(
        {n: [r[n] for r in rows] for n in PAGES.names}, schema=PAGES
    )
    out = eg(batch).to_pylist()
    by_url_nodes = {}
    for r in out:
        if r["kind"] == "node" and r["label"] == "Mention":
            by_url_nodes.setdefault(r["url"], {})[r["node_id"]] = r["span_start"]
    for url, nodes in by_url_nodes.items():
        eog = sorted(
            (
                (r["index"], r["src_id"], r["dst_id"])
                for r in out
                if r["kind"] == "edge" and r["etype"] == "EOG" and r["url"] == url
            )
        )
        # EOG chain must follow ascending span order
        for idx, src, dst in eog:
            assert nodes[src] < nodes[dst]
        # indexes are dense 0..n-1
        assert [e[0] for e in eog] == list(range(len(eog)))


def test_mention_detection_longest_match():
    det = MentionDetector(["Acme Labs", "Acme Labs Inc.", "Freedonia"])
    ms = det.detect("Acme Labs Inc. is based in Freedonia.")
    assert [m.surface for m in ms] == ["Acme Labs Inc", "Freedonia"]
    tr = triples_from_mentions("Acme Labs Inc. is based in Freedonia.", ms, "en")
    assert len(tr) == 1 and tr[0][1] == "based_in"


def test_scope_resolution_last_name_anaphor():
    """Within-document scope resolution (ScopeManager analog): a bare
    last-name token resolves to the nearest prior mention whose norm
    ends with it."""
    det = MentionDetector(["Ada May Verne", "Bo Verne", "Port Alden"])
    t = "Ada May Verne works for X. Bo Verne sat. Verne visited Port Alden."
    ms = det.detect(t)
    anaphor = [m for m in ms if m.surface == "Verne"]
    assert len(anaphor) == 1
    # nearest prior antecedent is "Bo Verne", not "Ada May Verne"
    assert anaphor[0].norm == "bo verne"
    tr = triples_from_mentions(t, ms, "en")
    assert ("bo verne", "visited") in {(s.norm, p) for s, p, _o in tr}

    # no antecedent → no mention fabricated
    ms2 = det.detect("Verne visited Port Alden.")
    assert [m.surface for m in ms2] == ["Port Alden"]


def test_scoped_variant_pr():
    from cpg_ray.normalize import norm_name  # noqa: F401  (import check)
    from cpg_ray.pagegen import gold_triples
    from cpg_ray.stages.link import build_norm_index

    w = cfg_for_variant("scoped").build()
    det = MentionDetector([r["alias"] for r in w.alias_rows()])
    idx = build_norm_index(w.alias_rows())
    cmap = w.canonical_map()
    got, want = set(), set()
    for i in range(150):
        p = render_page(w, i, "scoped")
        text, _ = extract_text(p["html"])
        ms = det.detect(text)
        for m1, pred, m2 in triples_from_mentions(text, ms, p["lang"]):
            def link(m):
                h = idx.get(m.norm)
                return f"inf:{m.norm}" if h is None else cmap.get(h[0], h[0])
            got.add((link(m1), pred, link(m2)))
        want |= gold_triples(w, i, "scoped")
    assert got == want
    assert any(pred == "visited" for _s, pred, _o in want)


def test_unknown_capitalized_run_is_inferred():
    det = MentionDetector(["Ada Verne"])
    ms = det.detect("Ada Verne works for Zorblax Unit 7.")
    assert [(m.surface, m.inferred) for m in ms] == [
        ("Ada Verne", False),
        ("Zorblax Unit 7", True),
    ]


def test_ast_edges_contain_sections():
    w = cfg_for_variant("basic").build()
    eg = ExtractGraph(aliases=[r["alias"] for r in w.alias_rows()])
    p = render_page(w, 0, "basic")
    batch = pa.Table.from_pydict({n: [p[n]] for n in PAGES.names}, schema=PAGES)
    out = eg(batch).to_pylist()
    labels = [r["label"] for r in out if r["kind"] == "node"]
    assert "Document" in labels and "Section" in labels and "Mention" in labels
    ast = [r for r in out if r["kind"] == "edge" and r["etype"] == "AST"]
    assert ast, "no AST edges"
    node_ids = {r["node_id"] for r in out if r["kind"] == "node"}
    for e in ast:
        assert e["src_id"] in node_ids and e["dst_id"] in node_ids


def test_mention_literals_rules():
    """Literal attachment rules: first standalone number after the
    mention, clipped at the next mention and at the sentence break;
    decimals survive intact; digit-free docs short-circuit."""
    from cpg_ray.stages.extract import MentionDetector, mention_literals

    det = MentionDetector(["Kara Voss", "Ashford Vale", "Acme Labs"])
    text = ("Kara Voss visited Ashford Vale near milepost 123.5. "
            "Acme Labs counted 42 visitors. The year had 365 days.")
    mentions = det.detect(text)
    assert [m.surface for m in mentions] == [
        "Kara Voss", "Ashford Vale", "Acme Labs"
    ]
    lits = mention_literals(text, mentions)
    # Kara Voss: next mention (Ashford Vale) starts before any number
    # Ashford Vale: 123.5 within its sentence (decimal point kept, the
    #   sentence-final period excluded)
    # Acme Labs: 42 within its sentence; 365 is past the break
    assert lits == [None, "123.5", "42"]

    # digit-free document: the short-circuit returns all None
    text2 = "Kara Voss visited Ashford Vale."
    m2 = det.detect(text2)
    assert mention_literals(text2, m2) == [None] * len(m2)
