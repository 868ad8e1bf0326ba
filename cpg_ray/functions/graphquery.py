"""Query layer over the materialized graph tables (nodes/edges) — the
Ray-Data analog of the reference's openCypher surface and traversal DSL.

Reference analogs:
- label filter = ``result.all<T>()`` / label-ancestry match
  (graph/Extensions.kt:36-67, Graph.kt:387-398) → predicate pushdown on
  the ``label`` column;
- property WHERE = openCypher comparisons on reflective properties
  (Graph.kt:245-286) → vectorized filters;
- relationship chain ``(a:A)-[:REL]->(b:B)`` (Graph.kt:121-167) → two
  hash joins edges⋈nodes;
- followNextEOG DFS (EdgeCachePass.kt:79-100) → per-document traversal
  over grouped edges (EOG never crosses documents, so the partition key
  is ``url`` and the traversal is group-local);
- dangling-edge check = the consumer-check pattern (M12,
  cpg-console/analysis/*) + disconnectFromGraph anti-set (D4).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import hash_join


def _add_url_bucket(df: pd.DataFrame, n_buckets: int | None) -> pd.DataFrame:
    """Stamp the deterministic per-document bucket column (crc32, not
    builtin hash — PYTHONHASHSEED differs across workers) shared by
    every group-local per-url traversal here.  ``None`` derives the
    width from the cluster's CPUs (relational.default_n_buckets)."""
    import zlib

    if n_buckets is None:
        from .relational import default_n_buckets

        n_buckets = default_n_buckets()
    df = df.copy()
    df["__bucket"] = [zlib.crc32(u.encode()) % n_buckets for u in df["url"]]
    return df


# Edge types that NEVER cross document boundaries by construction
# (SURVEY G1; reference EvaluationOrderGraphPass.java:87-130 — the
# EOG never crosses translation-unit boundaries; AST/DFG/TRIPLE edges
# are emitted per-page by the extract stage with both endpoints in the
# same page).  REFERS_TO links mentions to CANONICAL entities and may
# cross documents — deliberately excluded.  Queries over these etypes
# may bucket by url and run group-local instead of paying a global
# all-to-all hash join.
INTRA_DOC_ETYPES = frozenset({"AST", "EOG", "DFG", "DFG2", "TRIPLE"})

# Label hierarchy — the reference's "a node's label set is its class
# ancestry" (Graph.kt:387-398: result.all<T>() matches SUBTYPES too).
# Our node taxonomy is shallow by design, but the ancestry-match
# semantics are part of the query surface: filtering on an abstract
# label matches every concrete subtype.
LABEL_SUBTYPES: dict[str, frozenset] = {
    "Node": frozenset({"Document", "Section", "Mention", "Problem"}),
    "Container": frozenset({"Document", "Section"}),  # scope-bearing
}


def label_filter(nodes_ds, label: str):
    """nodes with a given label (pushdown-friendly vectorized filter);
    abstract labels (LABEL_SUBTYPES) match their whole subtype set —
    the class-ancestry semantics of the reference's ``all<T>()``."""
    subtypes = LABEL_SUBTYPES.get(label)
    if subtypes is not None:
        wanted = pa.array(sorted(subtypes), pa.string())
        return nodes_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["label"], value_set=wanted)),
            batch_format="pyarrow",
        )
    return nodes_ds.map_batches(
        lambda t: t.filter(pc.equal(t["label"], pa.scalar(label))),
        batch_format="pyarrow",
    )


def prop_filter(nodes_ds, column: str, op: str, value):
    """WHERE-clause comparison on a node property column."""
    kernel = {"==": pc.equal, "<": pc.less, ">": pc.greater,
              "<=": pc.less_equal, ">=": pc.greater_equal}[op]
    return nodes_ds.map_batches(
        lambda t: t.filter(kernel(t[column], pa.scalar(value))),
        batch_format="pyarrow",
    )


def rel_chain(nodes_ds, edges_ds, *, etype: str, src_label: str,
              dst_label: str, num_partitions: int = 8):
    """(src:src_label)-[:etype]->(dst:dst_label) — edges filtered on
    etype, then two hash joins against the label-filtered node sides.
    Returns (src_id, src_name, dst_id, dst_name, url)."""
    e = edges_ds.map_batches(
        lambda t: t.filter(pc.equal(t["etype"], pa.scalar(etype))).select(
            ["src_id", "dst_id", "url"]
        ),
        batch_format="pyarrow",
    )
    src = label_filter(nodes_ds, src_label).map_batches(
        lambda t: t.select(["node_id", "name"]).rename_columns(
            ["src_id", "src_name"]
        ),
        batch_format="pyarrow",
    )
    dst = label_filter(nodes_ds, dst_label).map_batches(
        lambda t: t.select(["node_id", "name"]).rename_columns(
            ["dst_id", "dst_name"]
        ),
        batch_format="pyarrow",
    )
    # empty_safe: a label/etype combination that matches nothing is a
    # legitimate query result — Ray's Dataset.join crashes on an empty
    # side (see relational.hash_join), and j1 is empty whenever the
    # first hop matches nothing
    j1 = hash_join(e, src, on="src_id", num_partitions=num_partitions,
                   empty_safe=True)
    j2 = hash_join(j1, dst, on="dst_id", num_partitions=num_partitions,
                   empty_safe=True)
    return j2


DANGLING_COLS = ["src_id", "dst_id", "etype", "url"]


def dangling_edges(nodes_ds, edges_ds, *, num_partitions: int | None = None):
    """DISTINCT edges whose src or dst id is missing from the node table
    — the graph-consistency check; MUST be empty for a well-formed
    graph.  (Set semantics by contract — the paired SQL oracle also
    selects DISTINCT; per-row multiplicity of corrupt edges is not
    preserved.)

    Scale shape: ONE hash-partitioned ``left_anti`` join — edges are
    exploded to (edge attrs, endpoint) rows (2 rows per edge) and
    anti-joined against the node-id column, so no node-id set is ever
    collected on the driver (the previous broadcast-set version held
    every node id in one Python set — tens of GB at corpus scale).
    An edge with both endpoints missing surfaces twice; the final
    distinct collapses it (the dangling set is tiny by definition).

    ``num_partitions`` defaults to the cluster CPU count:
    Ray's join aggregator actors need a slot each, and a fixed 16 on a
    2-CPU cluster starves the pipeline into a permanent hang (measured)."""
    from .relational import distinct_on

    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 2))
        num_partitions = max(2, cpus)

    nid = nodes_ds.map_batches(
        lambda t: t.select(["node_id"]), batch_format="pyarrow"
    )

    def explode(t: pa.Table) -> pa.Table:
        base = t.select(DANGLING_COLS)
        a = base.append_column("endpoint", t["src_id"])
        b = base.append_column("endpoint", t["dst_id"])
        return pa.concat_tables([a, b])

    ep = edges_ds.map_batches(explode, batch_format="pyarrow")
    miss = ep.join(
        nid, "left_anti", num_partitions=num_partitions,
        on=("endpoint",), right_on=("node_id",),
    ).map_batches(lambda t: t.select(DANGLING_COLS), batch_format="pyarrow")
    return distinct_on(miss, DANGLING_COLS)


def follow_eog(edges_ds, *, max_hops: int = 10):
    """Per-document EOG path lengths: for each url, walk the EOG chain
    from its root (no incoming EOG edge) and report chain length +
    whether indexes are dense (G6/§2.11 INDEX semantics).  EOG is
    within-document by construction, so this is a grouped traversal —
    no cross-partition walk."""

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.etype == "EOG"]
        url = g.url.iloc[0] if len(g) else None
        if not len(g):
            return pd.DataFrame({"url": [], "chain_len": [], "dense_index": []})
        nxt = dict(zip(g.src_id, g.dst_id))
        roots = set(g.src_id) - set(g.dst_id)
        chain = 0
        for r in roots:
            cur, hops = r, 0
            while cur in nxt and hops < max_hops * 1000:
                cur = nxt[cur]
                hops += 1
            chain = max(chain, hops)
        idx = sorted(g["index"].dropna().astype(int).tolist())
        dense = idx == list(range(len(idx)))
        return pd.DataFrame(
            {"url": [url], "chain_len": [chain], "dense_index": [dense]}
        )

    return edges_ds.groupby("url").map_groups(walk, batch_format="pandas")


def var_length_reach(edges_ds, *, etype: str = "EOG", max_hops: int = 3,
                     n_buckets: int | None = None,
                     from_roots: bool = True, shortest_only: bool = True):
    """Variable-length path traversal — openCypher ``*1..k`` analog
    (Graph.kt:121-167 extended): per-document BFS over ``etype`` edges
    emitting (url, src_id, dst_id, hops) rows.

    Two semantics, chosen by the flags:

    - **default (from_roots=True, shortest_only=True)** — the chain-
      provenance view used by kg_eog_reach: BFS only from chain ROOTS
      (nodes with no incoming etype edge), one row per (root, dst) at
      the SHORTEST hop count.  Cheap and right for "how far from the
      start of the chain" questions; NOT openCypher path semantics.
    - **full (from_roots=False, shortest_only=False)** — the faithful
      ``MATCH (a)-[:E*lo..hi]->(b)`` semantics the cypher compiler
      uses: BFS from EVERY node, one row per distinct (src, dst, hops)
      with a walk of exactly ``hops`` ≤ max_hops edges (a diamond
      reachable at 2 and 3 hops yields both rows).  Matches the
      recursive-CTE ``UNION`` closure exactly.

    Partitioning: EOG/AST/DFG edges never cross documents, so rows are
    bucketed by hash(url) and each document's BFS runs group-local —
    the same assumption as follow_eog, never a distributed fixpoint."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return _add_url_bucket(b[b.etype == etype], n_buckets)

    def bfs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, sub in g.groupby("url", sort=False):
            adj: dict[str, list[str]] = {}
            for s, d in zip(sub.src_id, sub.dst_id):
                adj.setdefault(s, []).append(d)
            # only nodes with OUTGOING edges can start a non-empty walk
            starts = (sorted(set(adj) - set(sub.dst_id)) if from_roots
                      else sorted(adj))
            for root in starts:
                frontier = [root]
                seen = {root}
                for hop in range(1, max_hops + 1):
                    nxt: set[str] = set()
                    for n in frontier:
                        for d in adj.get(n, []):
                            if shortest_only:
                                if d not in seen:
                                    seen.add(d)
                                    nxt.add(d)
                                    rows.append(
                                        {"url": url, "src_id": root,
                                         "dst_id": d, "hops": hop}
                                    )
                            elif d not in nxt:
                                # frontier-at-hop is a SET: one row per
                                # distinct (src, dst, hops) even when
                                # several walks of that length exist
                                nxt.add(d)
                                rows.append(
                                    {"url": url, "src_id": root,
                                     "dst_id": d, "hops": hop}
                                )
                    if not nxt:
                        break
                    frontier = sorted(nxt)
        return pd.DataFrame(rows, columns=["url", "src_id", "dst_id", "hops"])

    return (
        edges_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(bfs, batch_format="pandas")
    )


def dead_edges(edges_ds):
    """Edges killed by a constant condition (``unreachable=true`` —
    UnreachableEOGPass semantics, UnreachableEOGPass.kt:41-97): flagged
    at extraction, surfaced here so dead content is auditable, never
    silently dropped (Properties.java:43-49 UNREACHABLE)."""
    return edges_ds.map_batches(
        lambda b: b[b["unreachable"].fillna(False).astype(bool)],
        batch_format="pandas",
    )


def live_edges(edges_ds):
    """The D4 anti-set removal: drop edges flagged unreachable (the
    query-time analog of disconnectFromGraph, Node.kt:204-228)."""
    return edges_ds.map_batches(
        lambda b: b[~b["unreachable"].fillna(False).astype(bool)],
        batch_format="pandas",
    )


def value_eval(nodes_ds, edges_ds, *, etype: str = "DFG2",
               n_buckets: int | None = None):
    """ValueEvaluator analog (ValueEvaluator.kt:71-294): for every use
    mention with incoming data-flow, follow the DFG backward to its
    root definitions (the "literals": defs with no incoming edge) and
    fold — the fold is the sorted distinct set of root names joined
    with '|'; ``n_values > 1`` is the multi-path case the reference
    reports via value sets / cannotEvaluate.

    Partitioning: the DFG never crosses documents, so nodes and edges
    are co-bucketed by hash(url) and each document's backward walk runs
    group-local (the follow_eog/var_length_reach assumption)."""

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        e = b[b["etype"] == etype][["url", "src_id", "dst_id"]].copy()
        e["name"] = None
        e["side"] = 0
        return e

    def tag_nodes(b: pd.DataFrame) -> pd.DataFrame:
        n = b[["url", "node_id", "name"]].copy()
        n = n.rename(columns={"node_id": "src_id"})
        n["dst_id"] = None
        n["side"] = 1
        return n[["url", "src_id", "dst_id", "name", "side"]]

    e = edges_ds.map_batches(tag_edges, batch_format="pandas")
    n = nodes_ds.map_batches(tag_nodes, batch_format="pandas")
    both = e.union(n).map_batches(
        lambda b: _add_url_bucket(b, n_buckets), batch_format="pandas"
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        names = dict(zip(g[g.side == 1].src_id, g[g.side == 1]["name"]))
        rows = []
        for url, sub in g[g.side == 0].groupby("url", sort=False):
            preds: dict[str, list[str]] = {}
            for s, d in zip(sub.src_id, sub.dst_id):
                preds.setdefault(d, []).append(s)
            for use, ps in preds.items():
                stack = list(ps)
                seen = set(ps)
                roots: set[str] = set()
                while stack:
                    cur = stack.pop()
                    cps = preds.get(cur)
                    if not cps:
                        roots.add(cur)
                        continue
                    for p in cps:
                        if p not in seen:
                            seen.add(p)
                            stack.append(p)
                vals = sorted({str(names.get(r, "")) for r in roots})
                rows.append(
                    {"url": url, "node_id": use,
                     "resolved": "|".join(vals), "n_values": len(vals)}
                )
        return pd.DataFrame(
            rows, columns=["url", "node_id", "resolved", "n_values"]
        )

    return both.groupby("__bucket").map_groups(walk, batch_format="pandas")


def value_fold(nodes_ds, edges_ds, *, etype: str = "DFG2",
               n_buckets: int | None = None):
    """ValueEvaluator ARITHMETIC folding (ValueEvaluator.kt:100-262:
    the reference folds +/- along the DFG path with the full JVM
    numeric-promotion matrix): every data-flow use is resolved backward
    to its root definitions, summing the numeric ``literal`` of every
    node on the path; int+int stays int, any float literal on the path
    promotes the folded value to float (handlePlus promotion,
    ValueEvaluator.kt:120-139).  A use below an undeclared A/B fork
    folds to a value SET — one row per distinct (value, vtype).

    Literals use only binary-exact fractions in the fixture corpus, so
    the folded doubles compare exactly against the SQL oracle's
    recursive-CTE accumulation.

    Partitioning: same group-local per-url walk as :func:`value_eval`
    (the DFG never crosses documents); the per-document walk is a
    set-valued DP over the DAG, memoized per node."""

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        e = b[b["etype"] == etype][["url", "src_id", "dst_id"]].copy()
        e["literal"] = None
        e["side"] = 0
        return e

    def tag_nodes(b: pd.DataFrame) -> pd.DataFrame:
        n = b[["url", "node_id", "literal"]].copy()
        n = n.rename(columns={"node_id": "src_id"})
        n["dst_id"] = None
        n["side"] = 1
        return n[["url", "src_id", "dst_id", "literal", "side"]]

    e = edges_ds.map_batches(tag_edges, batch_format="pandas")
    n = nodes_ds.map_batches(tag_nodes, batch_format="pandas")
    both = e.union(n).map_batches(
        lambda b: _add_url_bucket(b, n_buckets), batch_format="pandas"
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        lits = dict(zip(g[g.side == 1].src_id, g[g.side == 1]["literal"]))
        rows = []
        for url, sub in g[g.side == 0].groupby("url", sort=False):
            preds: dict[str, list[str]] = {}
            for s, d in zip(sub.src_id, sub.dst_id):
                preds.setdefault(d, []).append(s)
            for use in sorted(preds):
                for v, f in sorted(fold_literal_paths(use, preds, lits)):
                    rows.append(
                        {"url": url, "node_id": use, "value": v,
                         "vtype": "float" if f else "int"}
                    )
        return pd.DataFrame(
            rows, columns=["url", "node_id", "value", "vtype"]
        )

    return both.groupby("__bucket").map_groups(walk, batch_format="pandas")


def fold_literal_paths(use, preds: dict, lits: dict,
                       _memo: dict | None = None) -> frozenset:
    """The per-document fold of :func:`value_fold` as a pure function:
    the set of (sum of literals along a backward path from ``use`` to a
    root, any-float-on-path) pairs — a memoized set-valued DP over the
    DAG, ITERATIVE so a 10^5-mention linear chain cannot blow the
    recursion limit (found by the property test below), with gray-set
    cycle detection as a defensive guard (extraction emits forward-only
    edges, but a corrupted table must fail loudly, not hang).
    Property-pinned against brute-force path enumeration
    (tests/test_properties.py)."""
    memo = _memo if _memo is not None else {}

    def lit_of(node) -> tuple[float, bool]:
        lit = lits.get(node)
        missing = lit is None or (isinstance(lit, float) and pd.isna(lit))
        return (0.0 if missing else float(lit),
                not missing and "." in str(lit))

    gray: set = set()
    stack = [(use, False)]
    while stack:
        node, expanded = stack.pop()
        if node in memo:
            continue
        ps = preds.get(node)
        if not ps:
            v0, f0 = lit_of(node)
            memo[node] = frozenset({(v0, f0)})
            continue
        if expanded:
            gray.discard(node)
            v0, f0 = lit_of(node)
            memo[node] = frozenset(
                (v0 + v, f0 or f) for p in ps for v, f in memo[p]
            )
        else:
            if node in gray:  # pred edge back onto the current path
                raise ValueError(f"cycle in data-flow edges at {node!r}")
            gray.add(node)
            stack.append((node, True))
            stack.extend((p, False) for p in ps if p not in memo)
    return memo[use]


def empty_sections(nodes_ds, edges_ds, *, num_partitions: int | None = None):
    """Structure-simplification candidates (CompressLLVMPass analog,
    cpg-language-llvm/passes/CompressLLVMPass.kt:38-120: inline/remove
    graph structure that carries no content): Section nodes that OWN no
    mention — no outgoing AST edge — e.g. a trailing heading on a
    truncated page.  Found with one hash left_anti join of sections
    against AST-edge sources; a compact pass would drop these nodes and
    their incoming doc→section edges."""
    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 2))
        num_partitions = max(2, cpus)
    sections = label_filter(nodes_ds, "Section").map_batches(
        lambda t: t.select(["node_id", "name", "url"]),
        batch_format="pyarrow",
    )
    ast_src = edges_ds.map_batches(
        lambda t: t.filter(pc.equal(t["etype"], pa.scalar("AST"))).select(
            ["src_id"]
        ),
        batch_format="pyarrow",
    )
    return sections.join(
        ast_src, "left_anti", num_partitions=num_partitions,
        on=("node_id",), right_on=("src_id",),
    )


def triple_diff(a_ds, b_ds, *, keys=("canonical_subj", "pred",
                                     "canonical_obj"),
                num_partitions: int | None = None):
    """Snapshot delta between two triple sets (incremental-crawl story:
    what did the new crawl add/remove?).  Two hash-partitioned
    ``left_anti`` joins over the DISTINCT key projections — additions =
    B∖A, removals = A∖B — unioned with a ``side`` column.  Set
    semantics over ``keys`` (the canonical fact identity), matching a
    SQL EXCEPT oracle."""
    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 2))
        num_partitions = max(2, cpus)
    from .relational import distinct_on

    keys = list(keys)

    def proj(ds):
        return distinct_on(
            ds.map_batches(lambda t: t.select(keys), batch_format="pyarrow"),
            keys,
        )

    a, b = proj(a_ds), proj(b_ds)

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.string())
            )

        return f

    added = b.join(a, "left_anti", num_partitions=num_partitions,
                   on=tuple(keys)).map_batches(tag("added"),
                                               batch_format="pyarrow")
    removed = a.join(b, "left_anti", num_partitions=num_partitions,
                     on=tuple(keys)).map_batches(tag("removed"),
                                                 batch_format="pyarrow")
    return added.union(removed)


def degree_stats(edges_ds):
    """Per-etype edge counts + distinct sources — A1 statistics analog."""
    from .relational import groupby_agg

    return groupby_agg(
        edges_ds, ["etype"],
        [("src_id", "count", "n_edges")],
    )
