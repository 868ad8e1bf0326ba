"""Stateful streaming-window operator: an actor that carries OPEN
sessions across batches of a time-ordered event log and emits sessions
as they close.

This is the one operator class the Dataset API genuinely can't express
as stateless batch transforms (SURVEY.md guidance: "keep incremental
state in an actor when the reference's semantics need it — one actor
per key-hash bucket, fed batches in ts order").  The batch path
(`queries.q_events_sessions`) answers the same question offline; this
operator is the online shape: sessions stream out with bounded state =
O(open sessions), not O(history).

Scale-out story: hash users into B buckets; each bucket is an
independent time-ordered stream with its own sessionizer actor.  The
local-mode demonstration runs the buckets sequentially against one
actor pool of size 1 per bucket (ordering within a bucket is the
correctness requirement; across buckets there is none).
"""

from __future__ import annotations

import pandas as pd


class Sessionizer:
    """Per-bucket stateful consumer.  Feed time-ordered event batches
    via :meth:`feed`; closed sessions stream back; :meth:`flush` emits
    the still-open tail."""

    def __init__(self, gap_seconds: float = 1800.0):
        self.gap = pd.Timedelta(seconds=gap_seconds)
        # user_id -> (session_start, last_ts, n_events)
        self.open: dict = {}
        self._watermark = None

    def feed(self, batch: pd.DataFrame) -> pd.DataFrame:
        closed = []
        for row in batch.sort_values("ts", kind="mergesort").itertuples():
            if self._watermark is not None and row.ts < self._watermark:
                raise ValueError(
                    f"out-of-order event at {row.ts} < watermark "
                    f"{self._watermark}: feed batches in ts order"
                )
            self._watermark = row.ts
            cur = self.open.get(row.user_id)
            if cur is None:
                self.open[row.user_id] = (row.ts, row.ts, 1)
            elif row.ts - cur[1] > self.gap:
                closed.append(
                    {"user_id": row.user_id, "session_start": cur[0],
                     "session_end": cur[1], "n_events": cur[2]}
                )
                self.open[row.user_id] = (row.ts, row.ts, 1)
            else:
                self.open[row.user_id] = (cur[0], row.ts, cur[2] + 1)
        return pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    def flush(self) -> pd.DataFrame:
        out = [
            {"user_id": uid, "session_start": s, "session_end": e,
             "n_events": n}
            for uid, (s, e, n) in sorted(self.open.items())
        ]
        self.open.clear()
        return pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events"]
        )


def sessionize_streaming(events_ds, *, gap_seconds: float = 1800.0,
                         n_buckets: int = 8) -> pd.DataFrame:
    """Run the stateful sessionizer over an events Dataset: bucket by
    user hash, iterate each bucket's events in ts order through its own
    Sessionizer, concatenate closed + flushed sessions.

    One global ts-sort, then a single ordered iteration routes each
    event to its bucket's Sessionizer — the local-mode stand-in for one
    actor per bucket on a cluster (state and per-bucket ordering
    semantics identical; the materialize pins the sorted block order so
    iteration is deterministic)."""
    sorted_ds = events_ds.sort("ts").materialize()
    szs = [Sessionizer(gap_seconds) for _ in range(n_buckets)]
    frames = []
    for batch in sorted_ds.iter_batches(batch_format="pandas",
                                        batch_size=8192):
        batch = batch.copy()
        batch["__b"] = batch.user_id % n_buckets
        for b, sub in batch.groupby("__b", sort=True):
            out = szs[int(b)].feed(sub.drop(columns="__b"))
            if len(out):
                frames.append(out)
    for sz in szs:
        tail = sz.flush()
        if len(tail):
            frames.append(tail)
    if not frames:
        return pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values(["user_id", "session_start"], kind="mergesort")
        .reset_index(drop=True)
    )
