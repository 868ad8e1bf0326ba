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
    violation (the reference's `checkOrder` failure)."""

    start: str
    accepting: frozenset
    transitions: dict  # (state, symbol) -> state

    def run(self, symbols: list[str]) -> tuple[bool, int]:
        """(accepted, index of first violation or -1)."""
        state = self.start
        for i, sym in enumerate(symbols):
            nxt = self.transitions.get((state, sym))
            if nxt is None:
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


def evaluate_order(triples_ds, dfa: DFA = BIO_BEFORE_CORP,
                  *, subject_col: str = "subj_norm"):
    """Run the DFA per (url, subject) over span-ordered predicates.
    Returns a Dataset of (url, subject, accepted, violation_at).

    Partitioning: rows are bucketed by hash(url) so every document's
    rows meet in one group regardless of upstream batching (a plain
    per-batch walk would split a url across batch boundaries); the
    pandas groupby over (url, subject) runs inside each of the ~16
    bucket groups (per-tiny-group map_groups is the Ray slow path)."""
    import zlib

    import ray

    dfa_ref = ray.put(dfa)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = [zlib.crc32(u.encode()) % 16 for u in b["url"]]
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
