"""Property-based tests (hypothesis): the extractor must be total,
deterministic and idempotent on arbitrary byte blobs — the per-row
invariant cannot rely on well-formed input at web scale."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cpg_ray.normalize import char_to_byte_offsets, collapse_ws, norm_name
from cpg_ray.stages.extract import MentionDetector, extract_text

html_ish = st.one_of(
    st.binary(max_size=2000),
    st.text(max_size=2000).map(lambda s: s.encode("utf-8", "ignore")),
    st.builds(
        lambda parts: ("<html><body>" + "".join(parts)).encode(),
        st.lists(
            st.sampled_from(
                ["<p>", "</p>", "<h1>", "</h1>", "<nav>", "</nav>",
                 "text & more", "<title>t</title>", "<script>x<y</script>",
                 "ünïcödé ", "<p", ">", "<!--", "-->"]
            ),
            max_size=30,
        ),
    ),
)


@given(html_ish)
@settings(max_examples=200, deadline=None)
def test_extract_total_and_deterministic(blob):
    t1, p1 = extract_text(blob)
    t2, p2 = extract_text(blob)
    assert isinstance(t1, str)
    assert (t1, p1) == (t2, p2)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_byte_offsets_prefix_sum(s):
    off = char_to_byte_offsets(s)
    assert off[0] == 0
    assert off[-1] == len(s.encode("utf-8"))
    assert all(b <= a for b, a in zip(off, off[1:]))  # monotone... reversed
    assert all(a <= b for a, b in zip(off, off[1:]))


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_norm_name_idempotent(s):
    n = norm_name(s)
    assert norm_name(n) == n
    assert collapse_ws(collapse_ws(s)) == collapse_ws(s)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=591),
               max_size=400))
@settings(max_examples=100, deadline=None)
def test_mention_detection_spans_valid(text):
    det = MentionDetector(["Ada Verne", "Acme Labs Inc.", "Freedonia"])
    for m in det.detect(text):
        assert 0 <= m.start < m.end <= len(text)
        assert text[m.start:m.end] == m.surface
    # non-overlap and sorted
    ms = det.detect(text)
    for a, b in zip(ms, ms[1:]):
        assert a.end <= b.start


# ---- branch-aware EOG + flow-sensitive DFG (stages/dfg) -------------------

_segment = st.one_of(
    st.integers(min_value=1, max_value=4).map(lambda n: ("plain", n)),
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=3),
        st.sampled_from([None, "a", "b"]),
    ).map(lambda t: ("fork", t[0], t[1], t[2])),
)


def _tags_from_segments(segs):
    """Segment specs → the tags list build_eog consumes."""
    tags, gid = [], 0
    for s in segs:
        if s[0] == "plain":
            tags.extend([None] * s[1])
        else:
            _k, na, nb, chosen = s
            for _ in range(na):
                tags.append((gid, "a", None if chosen is None else chosen == "a"))
            for _ in range(nb):
                tags.append((gid, "b", None if chosen is None else chosen == "b"))
            gid += 1
    return tags


@given(st.lists(_segment, min_size=1, max_size=6))
@settings(max_examples=150, deadline=None)
def test_build_eog_structural_invariants(segs):
    from cpg_ray.stages.dfg import build_eog

    tags = _tags_from_segments(segs)
    edges = build_eog(tags)
    n = len(tags)
    # all edges point forward in mention order (the DAG invariant the
    # one-pass fixpoint relies on)
    assert all(0 <= s < d < n for s, d, _b, _u in edges)
    # no duplicate edges
    assert len({(s, d) for s, d, _b, _u in edges}) == len(edges)
    # arms of one group never connect to each other directly
    for s, d, _b, _u in edges:
        ts, td = tags[s], tags[d]
        if ts is not None and td is not None and ts[0] == td[0]:
            assert ts[1] == td[1]
    # unreachable only ever appears when some arm is declared not-chosen
    any_dead = any(t is not None and t[2] is False for t in tags)
    if not any_dead:
        assert all(u is None for _s, _d, _b, u in edges)
    # linear documents degenerate to the exact chain
    if all(t is None for t in tags):
        assert edges == [(i, i + 1, None, None) for i in range(n - 1)]


@given(
    st.lists(_segment, min_size=1, max_size=5),
    st.randoms(use_true_random=False),
)
@settings(max_examples=150, deadline=None)
def test_flow_sensitive_dfg_invariants(segs, rnd):
    from cpg_ray.stages.dfg import build_eog, flow_sensitive_dfg

    tags = _tags_from_segments(segs)
    n = len(tags)
    keys = ["wickham", "alden"]
    firsts = ["alric", "brona", "cyra"]
    norms = [f"{rnd.choice(firsts)} {rnd.choice(keys)}" for _ in range(n)]
    bare = [rnd.random() < 0.3 for _ in range(n)]
    edges = build_eog(tags)
    out = flow_sensitive_dfg(norms, bare, edges)
    dead_idx = {i for i in range(n)
                if tags[i] is not None and tags[i][2] is False}
    for d, u in out:
        assert d < u  # defs strictly precede uses
        # def and use share the variable (last token)
        assert norms[d].split()[-1] == norms[u].split()[-1]
        # every edge into/within/out of a declared-dead arm is flagged
        # unreachable, so a dead-arm def can never reach ANY use
        assert d not in dead_idx
    # bare mentions never serve as defs
    for d, _u in out:
        assert not bare[d]


@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=40),
    st.randoms(use_true_random=False),
)
@settings(max_examples=150, deadline=None)
def test_flow_sensitive_dfg_linear_fast_path_equivalent(picks, rnd):
    """The fork-free fast path must be edge-for-edge identical to the
    general fixpoint over the linear EOG chain — the extract stage
    dispatches on exactly this equivalence."""
    from cpg_ray.stages.dfg import (
        build_eog,
        flow_sensitive_dfg,
        flow_sensitive_dfg_linear,
    )

    keys = ["wickham", "alden", "voss"]
    firsts = ["alric", "brona", ""]
    norms = [
        (f"{firsts[p % 3]} {keys[p % len(keys)]}").strip() if p < 5 else ""
        for p in picks
    ]
    bare = [rnd.random() < 0.4 for _ in picks]
    general = flow_sensitive_dfg(norms, bare, build_eog([None] * len(picks)))
    fast = flow_sensitive_dfg_linear(norms, bare)
    assert sorted(general) == sorted(fast)


@given(
    st.integers(2, 10),
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=25),
    st.lists(st.sampled_from([None, "3", "7", "2.5", "10.5", "0"]),
             min_size=10, max_size=10),
)
@settings(max_examples=150, deadline=None)
def test_value_fold_dp_matches_bruteforce(n, raw_edges, lit_picks):
    """The memoized set-valued DP behind value_fold must equal
    brute-force enumeration of every backward path on random DAGs
    (edges forced forward by construction → acyclic)."""
    from cpg_ray.functions.graphquery import fold_literal_paths

    edges = {(min(a % n, b % n), max(a % n, b % n)) for a, b in raw_edges
             if a % n != b % n}  # forward-only → acyclic by construction
    preds: dict[int, list[int]] = {}
    for s, d in sorted(edges):
        preds.setdefault(d, []).append(s)
    lits = {i: lit_picks[i] for i in range(n)}

    def lit_of(i):
        lit = lits.get(i)
        if lit is None:
            return 0.0, False
        return float(lit), "." in lit

    def brute(use):
        out = set()

        def rec(node, acc, isf):
            v, f = lit_of(node)
            acc, isf = acc + v, isf or f
            ps = preds.get(node)
            if not ps:
                out.add((acc, isf))
                return
            for p in ps:
                rec(p, acc, isf)

        rec(use, 0.0, False)
        return frozenset(out)

    for use in preds:
        assert fold_literal_paths(use, preds, lits) == brute(use), (
            use, preds, lits
        )


@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200),
       st.lists(st.text(min_size=1, max_size=20), max_size=50))
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives(keys, probes):
    from cpg_ray.functions.relational import BloomFilter

    bf = BloomFilter(len(keys), 0.01).add_batch(keys)
    assert bf.contains_batch(keys).all()  # NEVER a false negative


@given(
    st.lists(st.sampled_from(["ada verne", "acme labs", "port alden",
                              "zorblax unit 1", "unknown thing", ""]),
             min_size=1, max_size=40),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_vectorized_link_matches_dict_probe(norms, infer):
    """The pc.index_in vectorized linker must agree with the obvious
    per-row dict probe on every input, including all-miss batches."""
    import pyarrow as pa
    import ray

    from cpg_ray.stages.link import build_norm_index, make_link_fn

    index = build_norm_index(
        [
            {"alias": "Ada Verne", "entity_id": "P1",
             "canonical_name": "Ada Verne", "prior": 1.0},
            {"alias": "Acme Labs", "entity_id": "O1",
             "canonical_name": "Acme Labs", "prior": 1.0},
            {"alias": "Port Alden", "entity_id": "C1",
             "canonical_name": "Port Alden", "prior": 1.0},
        ]
    )
    n = len(norms)
    batch = pa.table(
        {
            "subj_norm": norms, "obj_norm": list(reversed(norms)),
            "pred": ["p"] * n, "url": ["u"] * n,
            "span_start": list(range(n)),
            "subj_surface": norms, "obj_surface": norms,
        }
    )
    got = make_link_fn(ray.put(index), infer_on_miss=infer)(batch).to_pandas()

    # reference: per-row dict probe
    def probe(seq):
        out = []
        for s in seq:
            hit = index.get(s)
            out.append((hit[0], False) if hit else (f"inf:{s}", True))
        return out

    subj = probe(norms)
    obj = probe(list(reversed(norms)))
    keep = [i for i in range(n)
            if infer or (not subj[i][1] and not obj[i][1])]
    assert list(got.subj) == [subj[i][0] for i in keep]
    assert list(got.obj) == [obj[i][0] for i in keep]
    assert list(got.subj_is_inferred) == [subj[i][1] for i in keep]
    assert list(got.span_start) == keep


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_cypher_parse_total(junk):
    """The query parser is TOTAL over arbitrary strings: every input
    either parses to a plan or raises ValueError — never a crash of
    another type, never a silent partial parse."""
    from cpg_ray.functions.cypher import parse

    try:
        plan = parse(junk)
    except ValueError:
        return
    # a successful parse must have produced a coherent plan
    assert plan.nodes and plan.returns


_fastpath_html = st.builds(
    lambda parts: "".join(parts),
    st.lists(
        st.sampled_from(
            ["<p>", "</p>", "<h1>", "</h1>", "<h2 >", "</h2 >",
             "<title>", "</title>", "<nav>", "</nav>", "<footer>",
             "</footer>", '<div class="variant" data-branch="A">',
             '<div class="variant" data-branch="B" data-chosen="B">',
             "<div>", "</div>", "<meta charset=\"utf-8\"/>", "<p/>",
             "<!DOCTYPE html>", "<script>var x = 1 < 2;</script>",
             "<style>b{x:1}</style>", "plain text ", "a &amp; b ",
             "&copy; &#65; &unknown; ", "  spaced\t text\n", "ünïcödé ",
             # constructs OUTSIDE the strict grammar -> must fall back,
             # never diverge
             "<!-- comment -->", "<p", ">", "< p>", "<?pi?>",
             "<a href='single'>", "<a href=unquoted>", "<em>x</em>",
             '<a title="a&amp;b">', "<![CDATA[x]]>", "</p",
             ]
        ),
        max_size=40,
    ),
)


@given(_fastpath_html)
@settings(max_examples=300, deadline=None)
def test_fast_blocks_differential_vs_htmlparser(text):
    """Whenever the strict fast scanner ACCEPTS an input, its blocks
    must be exactly html.parser's; on rejection extract_blocks falls
    back, so equality holds globally (the byte-identical invariant)."""
    from cpg_ray.stages.extract import (
        _FastMiss,
        _blocks_htmlparser,
        _fast_blocks,
    )

    ref = _blocks_htmlparser(text)
    try:
        got = _fast_blocks(text)
    except _FastMiss:
        return  # fallback path: html.parser is the single source
    assert [(b.tag, b.text, b.branch, b.chosen) for b in got] == [
        (b.tag, b.text, b.branch, b.chosen) for b in ref
    ]


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        max_size=40,
    ),
    st.integers(3, 5),
)
@settings(max_examples=150, deadline=None)
def test_ktruss_driver_matches_bruteforce_fixpoint(raw_edges, k):
    """The bounded-round vectorized peel (rounds ≥ graph size ⇒ exact)
    must equal the naive set-based k-truss fixpoint on arbitrary small
    graphs, and every surviving edge must meet the support bar."""
    import pandas as pd

    from cpg_ray.functions.graphalgo import _ktruss_driver

    edges = pd.DataFrame(raw_edges, columns=["src", "dst"]).astype(str)
    out = _ktruss_driver(edges, "src", "dst", k=k, rounds=12)

    # brute force: canonical undirected set, peel until stable
    es = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    es = {(str(a), str(b)) for a, b in es}
    while True:
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            break
        es = keep
    assert set(zip(out.a, out.b)) == es
    if len(out):
        truth_sup = {e: sup[e] for e in es}
        for _, r in out.iterrows():
            assert r.sup == truth_sup[(r.a, r.b)]
        assert bool(out.converged.iloc[0])


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        max_size=30,
    ),
    st.integers(1, 4),
)
@settings(max_examples=100, deadline=None)
def test_harmonic_driver_matches_per_source_bfs(raw_edges, max_hops):
    """The level-set closure must equal a naive per-source BFS sum of
    scale/d on arbitrary small graphs, for every hop bound."""
    import math
    from collections import deque

    import pandas as pd

    import ray.data as rd
    from cpg_ray.functions.graphalgo import harmonic_centrality

    edges = pd.DataFrame(raw_edges, columns=["src", "dst"]).astype(str)
    out = harmonic_centrality(
        rd.from_pandas(edges) if len(edges) else
        rd.from_pandas(pd.DataFrame({"src": pd.Series([], dtype=object),
                                     "dst": pd.Series([], dtype=object)})),
        max_hops=max_hops, mode="driver").to_pandas()
    # Ray 2.49 empty-dataset to_pandas drops the schema entirely
    got = dict(zip(out.entity, out.harmonic)) if len(out) else {}

    adj: dict = {}
    for a, b in raw_edges:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scale = math.lcm(*range(1, max_hops + 1)) * 1_000_000
    want = {}
    for v in adj:
        dist = {v: 0}
        q = deque([v])
        total = 0
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for nb in adj[u]:
                if nb not in dist:
                    dist[nb] = dist[u] + 1
                    total += scale // dist[nb]
                    q.append(nb)
        want[v] = total
    assert got == want
