"""Typestate / order evaluation over per-document event sequences —
the Ray-Data analog of DFAOrderEvaluator
(cpg-analysis/fsm/DFAOrderEvaluator.kt:56-144, DFA.kt:1-153): simulate
a DFA over the ordered events of each base object and report
order violations.

Here the "EOG path" is a document's mention/predicate sequence (ordered
by span_start — order is a column, not stream position) and the "base
object" is the subject entity: e.g. the spec «a works_for fact must
precede any acquired fact about the same org» runs per (url, subject).

The DFA spec is broadcast; evaluation is a per-document
``map_batches``/grouped walk — no shuffle beyond grouping by url
(per-document state never crosses documents, exactly like the
reference's per-function evaluation).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class DFA:
    """Transition table: (state, symbol) → state; missing transition =
    violation (the reference's `checkOrder` failure).

    ``loop_unknown=True`` makes symbols outside the DFA's alphabet
    self-loop instead of violating — the reference's evaluator likewise
    only consumes the nodes its op-map names (DFAOrderEvaluator.kt:
    56-72 ``nodeToRelevantMethod``), everything else passes through."""

    start: str
    accepting: frozenset
    transitions: dict  # (state, symbol) -> state
    loop_unknown: bool = False

    def run(self, symbols: list[str]) -> tuple[bool, int]:
        """(accepted, index of first violation or -1)."""
        alphabet = {s for (_st, s) in self.transitions}
        state = self.start
        for i, sym in enumerate(symbols):
            nxt = self.transitions.get((state, sym))
            if nxt is None:
                if self.loop_unknown and sym not in alphabet:
                    continue
                return False, i
            state = nxt
        return state in self.accepting, -1


# Example spec over our predicate alphabet: for one subject on one page,
# biography facts (works_for/born_in) must precede corporate facts
# (based_in/acquired/located_in); any order within each phase is fine.
BIO_BEFORE_CORP = DFA(
    start="bio",
    accepting=frozenset({"bio", "corp"}),
    transitions={
        ("bio", "works_for"): "bio",
        ("bio", "born_in"): "bio",
        ("bio", "based_in"): "corp",
        ("bio", "acquired"): "corp",
        ("bio", "located_in"): "corp",
        ("corp", "based_in"): "corp",
        ("corp", "acquired"): "corp",
        ("corp", "located_in"): "corp",
    },
)


# Visit-once spec: a subject may `visited` at most once along any one
# execution path; all other predicates pass through.  On an undeclared
# A/B fork this is exactly the spec where naive linear span order
# (both arms concatenated) reports a violation that NO real path has.
VISIT_ONCE = DFA(
    start="s0",
    accepting=frozenset({"s0", "s1"}),
    transitions={("s0", "visited"): "s1"},
    loop_unknown=True,
)


def evaluate_order_paths(nodes_ds, edges_ds, triples_ds,
                         dfa: DFA = VISIT_ONCE, *, max_paths: int = 64,
                         n_buckets: int | None = None):
    """PER-PATH DFA evaluation over the branchy EOG — the reference
    clones DFA state at every branch and evaluates each path separately
    (DFAOrderEvaluator.kt:56-144 ``eogPathSet`` per-path cloning),
    unlike :func:`evaluate_order`'s single span-ordered sequence.

    Paths: each A/B fork group contributes one choice among its LIVE
    arms (an arm whose fork edge is flagged unreachable by a declared
    constant condition is never on any path — UnreachableEOGPass
    interplay); a path's triples are the plain triples plus the chosen
    arms' triples, in span order.  A subject is ``accepted`` iff NO
    path violates the DFA; ``n_paths`` is the number of live paths of
    its document (capped at ``max_paths``, cap reported by truncation —
    the fixture corpus has ≤2).

    Arm membership is derived from the graph itself: fork edges carry
    the ``branch`` property; arm bodies are the closure over EOG edges
    through nodes with in-degree 1 (the join node is the first node fed
    by more than one arm tail).  Triples attach to arms via their
    subject mention's span_start.

    Partitioning: per-document, like every graph walk here — nodes,
    edges and triples co-bucket on hash(url), the walk is group-local.
    """
    import zlib

    import ray

    dfa_ref = ray.put(dfa)
    if n_buckets is None:
        from .relational import default_n_buckets

        n_buckets = default_n_buckets()

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        e = b[b["etype"] == "EOG"][
            ["url", "src_id", "dst_id", "branch", "unreachable"]
        ].copy()
        e["side"] = 0
        for c in ("span_start", "subj_norm", "pred"):
            e[c] = None
        return e

    def tag_nodes(b: pd.DataFrame) -> pd.DataFrame:
        n = b[b["label"] == "Mention"][["url", "node_id", "span_start"]]
        n = n.rename(columns={"node_id": "src_id"}).copy()
        n["side"] = 1
        for c in ("dst_id", "branch", "unreachable", "subj_norm", "pred"):
            n[c] = None
        return n

    def tag_triples(b: pd.DataFrame) -> pd.DataFrame:
        t = b[["url", "subj_norm", "pred", "span_start"]].copy()
        t["side"] = 2
        for c in ("src_id", "dst_id", "branch", "unreachable"):
            t[c] = None
        return t

    cols = ["url", "src_id", "dst_id", "branch", "unreachable",
            "span_start", "subj_norm", "pred", "side"]
    parts = [
        edges_ds.map_batches(tag_edges, batch_format="pandas"),
        nodes_ds.map_batches(tag_nodes, batch_format="pandas"),
        triples_ds.map_batches(tag_triples, batch_format="pandas"),
    ]
    parts = [p.map_batches(lambda b: b[cols], batch_format="pandas")
             for p in parts]
    both = parts[0].union(parts[1]).union(parts[2]).map_batches(
        lambda b: b.assign(
            __bucket=[zlib.crc32(u.encode()) % n_buckets for u in b["url"]]
        ),
        batch_format="pandas",
    )

    def check(g: pd.DataFrame) -> pd.DataFrame:
        from itertools import product

        from .relational import bcast_get

        d = bcast_get(dfa_ref)
        rows = []
        for url, sub in g.groupby("url", sort=False):
            edges = sub[sub.side == 0]
            node_span = dict(
                zip(sub[sub.side == 1].src_id, sub[sub.side == 1].span_start)
            )
            tri = sub[sub.side == 2]
            # in-degree over ALL EOG edges (dead ones included — the
            # join node's identity is structural, not reachability)
            indeg: dict[str, int] = {}
            adj: dict[str, list[str]] = {}
            for s, dst, br in zip(edges.src_id, edges.dst_id, edges.branch):
                indeg[dst] = indeg.get(dst, 0) + 1
                if br is None or pd.isna(br):
                    adj.setdefault(s, []).append(dst)
            # arm membership: closure from fork-edge heads through
            # indegree-1 nodes; arm identity = (fork_src, branch)
            member: dict[str, tuple] = {}
            groups: dict[str, dict] = {}  # fork_src -> {branch: dead}
            for s, dst, br, unr in zip(edges.src_id, edges.dst_id,
                                       edges.branch, edges.unreachable):
                if br is None or pd.isna(br):
                    continue
                dead = bool(unr) and not pd.isna(unr)
                groups.setdefault(s, {})[bool(br)] = dead
                stack = [dst]
                while stack:
                    n = stack.pop()
                    if n in member:
                        continue
                    member[n] = (s, bool(br))
                    for m in adj.get(n, ()):
                        if indeg.get(m, 0) == 1:
                            stack.append(m)
            live = [
                [(src, b) for b, dead in arms.items() if not dead]
                for src, arms in sorted(groups.items())
            ]
            live = [arms for arms in live if arms]
            paths = list(product(*live)) if live else [()]
            if len(paths) > max_paths:
                paths = paths[:max_paths]
            span_arm = {
                node_span[n]: a for n, a in member.items() if n in node_span
            }
            tri = tri.sort_values("span_start", kind="mergesort")
            t_arms = [span_arm.get(sp) for sp in tri.span_start]
            for subj, sdf in tri.assign(__arm=t_arms).groupby(
                "subj_norm", sort=False
            ):
                ok = True
                for path in paths:
                    chosen = set(path)
                    seq = [
                        p for p, a in zip(sdf["pred"], sdf["__arm"])
                        if a is None or a in chosen
                    ]
                    accepted, _ = d.run(seq)
                    if not accepted:
                        ok = False
                        break
                rows.append(
                    {"url": url, "subject": subj, "accepted": ok,
                     "n_paths": len(paths)}
                )
        return pd.DataFrame(
            rows, columns=["url", "subject", "accepted", "n_paths"]
        )

    return both.groupby("__bucket").map_groups(check, batch_format="pandas")


def evaluate_order(triples_ds, dfa: DFA = BIO_BEFORE_CORP,
                  *, subject_col: str = "subj_norm"):
    """Run the DFA per (url, subject) over span-ordered predicates.
    Returns a Dataset of (url, subject, accepted, violation_at).

    Partitioning: rows are bucketed by hash(url) so every document's
    rows meet in one group regardless of upstream batching (a plain
    per-batch walk would split a url across batch boundaries); the
    pandas groupby over (url, subject) runs inside the bucket groups
    (per-tiny-group map_groups is the Ray slow path); the bucket width
    derives from the cluster's CPUs when not given."""
    import zlib

    import ray

    from .relational import default_n_buckets

    dfa_ref = ray.put(dfa)
    _nb = default_n_buckets()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = [zlib.crc32(u.encode()) % _nb for u in b["url"]]
        return b

    def check(g: pd.DataFrame) -> pd.DataFrame:
        from .relational import bcast_get

        d = bcast_get(dfa_ref)
        rows = []
        for (url, subj), sub in g.groupby(["url", subject_col], sort=False):
            sub = sub.sort_values("span_start", kind="mergesort")
            ok, viol = d.run(sub["pred"].tolist())
            rows.append(
                {"url": url, "subject": subj, "accepted": ok,
                 "violation_at": viol}
            )
        return pd.DataFrame(rows)

    return (
        triples_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(check, batch_format="pandas")
    )
