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

Scale-out: hash users into B buckets; each bucket is an independent
time-ordered stream with its own sessionizer, run remotely inside
``groupby(bucket).map_groups`` (ordering within a bucket is the
correctness requirement; across buckets there is none).  No event ever
iterates through the driver.
"""

from __future__ import annotations

import numpy as np
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

    _COLS = ["user_id", "session_start", "session_end", "n_events"]

    def feed(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: session breaks come from one grouped shift/gap
        compare + a per-(user, session) aggregate — O(events) pandas
        kernels; the only Python loop is per USER-IN-BATCH (stitching
        each user's first/last session into the carried open state),
        which is orders of magnitude smaller than the event count."""
        if not len(batch):
            return pd.DataFrame(columns=self._COLS)
        df = batch.sort_values("ts", kind="mergesort")
        if self._watermark is not None and df["ts"].iloc[0] < self._watermark:
            raise ValueError(
                f"out-of-order event at {df['ts'].iloc[0]} < watermark "
                f"{self._watermark}: feed batches in ts order"
            )
        self._watermark = df["ts"].iloc[-1]

        uid = df["user_id"]
        prev = df.groupby(uid, sort=False)["ts"].shift()
        if self.open:  # first row of each user continues its open session
            last_by_user = {u: v[1] for u, v in self.open.items()}
            prev = prev.fillna(uid.map(last_by_user))
        new_sess = prev.isna() | ((df["ts"] - prev) > self.gap)
        # per-user session ordinal: 0 = continuation of the open session
        sid = new_sess.groupby(uid.values, sort=False).cumsum()
        agg = (
            df.assign(__sid=sid.values)
            .groupby(["user_id", "__sid"], sort=True)  # user rows contiguous
            .agg(start=("ts", "min"), end=("ts", "max"), n=("ts", "size"))
            .reset_index()
            .rename(columns={"__sid": "sid"})
        )

        # stitch against carried state — all masks, no per-user loop
        frames: list[pd.DataFrame] = []
        first_m = ~agg["user_id"].duplicated(keep="first")
        last_m = ~agg["user_id"].duplicated(keep="last")
        if self.open:
            o = self.open
            cont = agg["sid"].eq(0)  # first group merges into open session
            if cont.any():
                cu = agg.loc[cont, "user_id"].tolist()
                agg.loc[cont, "start"] = [o[u][0] for u in cu]
                agg.loc[cont, "n"] = (
                    agg.loc[cont, "n"].to_numpy() + [o[u][2] for u in cu]
                )
            # open sessions severed by a brand-new first session
            sever = first_m & ~cont & agg["user_id"].isin(o.keys())
            if sever.any():
                su = agg.loc[sever, "user_id"].tolist()
                frames.append(pd.DataFrame({
                    "user_id": su,
                    "session_start": [o[u][0] for u in su],
                    "session_end": [o[u][1] for u in su],
                    "n_events": [o[u][2] for u in su],
                }))
        done = agg[~last_m]
        frames.append(pd.DataFrame({
            "user_id": done["user_id"].to_numpy(),
            "session_start": done["start"].to_numpy(),
            "session_end": done["end"].to_numpy(),
            "n_events": done["n"].to_numpy(),
        }))
        tail = agg[last_m]  # each user's final group stays open
        self.open.update(
            zip(tail["user_id"].tolist(),
                zip(tail["start"], tail["end"], tail["n"].tolist()))
        )
        out = pd.concat(frames, ignore_index=True)
        return out if len(out) else pd.DataFrame(columns=self._COLS)

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


def sessionize_with_actors(events_ds, *, gap_seconds: float = 1800.0,
                           n_buckets: int = 4,
                           batch_rows: int = 8192) -> pd.DataFrame:
    """The ONLINE shape: long-lived per-bucket Ray ACTORS each holding a
    :class:`Sessionizer`, fed time-ordered micro-batches; state
    (open sessions + watermark) persists ACROSS feed calls — the raw
    @ray.remote escape hatch for semantics ``map_groups`` can't express
    (an unbounded stream has no "whole group" to hand to a task).

    The driver here only ROUTES batches (no per-event work — the state
    machine runs remotely); in production the router is whatever ordered
    ingest feeds the stream.  Per-actor ordering is guaranteed by Ray's
    per-actor task queue (submission order = execution order), so closed
    sessions stream out of each feed as the bucket's watermark advances.
    For bounded datasets prefer :func:`sessionize_streaming` (one hash
    shuffle, no routing hop)."""
    import ray

    @ray.remote
    class BucketSessionizer:
        def __init__(self, gap: float):
            self.sz = Sessionizer(gap)

        def feed(self, df: pd.DataFrame) -> pd.DataFrame:
            return self.sz.feed(df)

        def flush(self) -> pd.DataFrame:
            return self.sz.flush()

    actors = [BucketSessionizer.remote(gap_seconds) for _ in range(n_buckets)]
    sorted_ds = events_ds.sort("ts")
    futures = []
    for batch in sorted_ds.iter_batches(batch_format="pandas",
                                        batch_size=batch_rows):
        batch = batch.copy()
        batch["__b"] = (batch.user_id % n_buckets).astype("int32")
        for b, sub in batch.groupby("__b", sort=True):
            futures.append(actors[int(b)].feed.remote(sub.drop(columns="__b")))
    futures.extend(a.flush.remote() for a in actors)
    frames = [f for f in ray.get(futures) if len(f)]
    for a in actors:
        ray.kill(a)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    if not frames:
        return pd.DataFrame(columns=cols)
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values(["user_id", "session_start"], kind="mergesort")
        .reset_index(drop=True)
    )


def sessionize_streaming(events_ds, *, gap_seconds: float = 1800.0,
                         n_buckets: int = 8,
                         batch_rows: int = 8192) -> pd.DataFrame:
    """Run the stateful sessionizer over an events Dataset,
    DISTRIBUTED: users hash into ``n_buckets`` independent time-ordered
    streams; each bucket's events run through their own
    :class:`Sessionizer` inside a ``groupby(bucket).map_groups`` task —
    one stateful consumer per bucket, executing in parallel across the
    cluster, state bounded by that bucket's OPEN sessions.

    No driver-side iteration: the only cross-bucket work is the hash
    shuffle.  Within a bucket the group is sorted by ts and fed in
    ``batch_rows`` chunks, preserving the incremental feed/flush
    semantics (closed sessions stream out of ``feed`` as the watermark
    advances — the same state machine a long-lived per-bucket actor
    would run on an unbounded stream)."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__b"] = (b.user_id % n_buckets).astype("int32")
        return b

    cols = ["user_id", "session_start", "session_end", "n_events"]

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sz = Sessionizer(gap_seconds)
        g = g.sort_values("ts", kind="mergesort").drop(columns="__b")
        frames = [
            sz.feed(g.iloc[i : i + batch_rows])
            for i in range(0, len(g), batch_rows)
        ]
        frames.append(sz.flush())
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(frames, ignore_index=True)

    out = (
        events_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(run_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=cols)
    return (
        out.sort_values(["user_id", "session_start"], kind="mergesort")
        .reset_index(drop=True)
    )


class TumblingWindower:
    """Tumbling-window counter with ALLOWED LATENESS and late-event
    routing (the Beam/Flink watermark model, public): events arrive in
    stream order; the watermark is the max event time seen so far minus
    nothing (it IS the max — lateness is the allowance below it); an
    event whose ts sits more than ``lateness_s`` behind the
    pre-existing watermark is routed to the late side (flagged rows,
    emitted immediately, aggregated per window); a window [w, w+W)
    closes — its on-time count emitted exactly once — when the
    watermark passes w + W + lateness.  State is O(open windows),
    never the stream."""

    def __init__(self, window_s: int = 600, lateness_s: int = 600):
        self.window_us = int(window_s) * 1_000_000
        self.lateness_us = int(lateness_s) * 1_000_000
        self.window_s = int(window_s)
        self._wm: int | None = None  # max event-time seen, µs
        self._open: dict[int, int] = {}  # window start (epoch s) -> n

    _COLS = ["window_start", "late", "n"]

    def _emit_closed(self) -> list[tuple[int, bool, int]]:
        if self._wm is None:
            return []
        rows = []
        for w in sorted(self._open):
            if (w * 1_000_000 + self.window_us + self.lateness_us
                    <= self._wm):
                rows.append((w, False, self._open.pop(w)))
        return rows

    def feed(self, df: pd.DataFrame) -> pd.DataFrame:
        """``df`` in ARRIVAL order with a ``ts`` column; returns closed
        windows (late=False) and this batch's late rows aggregated per
        window (late=True)."""
        t = df["ts"].values.astype("datetime64[us]").astype("int64")
        prev = np.int64(self._wm if self._wm is not None
                        else np.iinfo(np.int64).min)
        run = np.maximum.accumulate(np.r_[prev, t])[:-1]  # wm BEFORE row
        late = (run != np.iinfo(np.int64).min) & (
            t < run - self.lateness_us)
        win = (t // self.window_us * self.window_s).astype(np.int64)
        for w, n in zip(*np.unique(win[~late], return_counts=True)):
            self._open[int(w)] = self._open.get(int(w), 0) + int(n)
        if len(t):
            self._wm = int(max(t.max(),
                               self._wm if self._wm is not None
                               else t.max()))
        rows = self._emit_closed()
        lw, ln = np.unique(win[late], return_counts=True)
        rows += [(int(w), True, int(n)) for w, n in zip(lw, ln)]
        return pd.DataFrame(rows, columns=self._COLS)

    def flush(self) -> pd.DataFrame:
        rows = [(w, False, self._open.pop(w))
                for w in sorted(self._open)]
        return pd.DataFrame(rows, columns=self._COLS)


def tumbling_window_counts(events_ds, *, key_col: str = "event_type",
                           window_s: int = 600, lateness_s: int = 600,
                           batch_rows: int = 8192) -> pd.DataFrame:
    """Distributed watermarked tumbling windows: each key is its own
    time-ordered stream (arrival order = event_id) running through its
    own :class:`TumblingWindower` inside groupby(key).map_groups —
    the sessionize_streaming shape with per-key watermarks, so the
    result is deterministic AND SQL-expressible (running-max lateness
    per key; the oracle replays it with one window function)."""

    def run_key(g: pd.DataFrame) -> pd.DataFrame:
        tw = TumblingWindower(window_s, lateness_s)
        g = g.sort_values("event_id", kind="mergesort")
        frames = [tw.feed(g.iloc[i:i + batch_rows])
                  for i in range(0, len(g), batch_rows)]
        frames.append(tw.flush())
        out = pd.concat([f for f in frames if len(f)],
                        ignore_index=True)
        out = (out.groupby(["window_start", "late"], as_index=False)
               ["n"].sum())
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    df = (events_ds.groupby(key_col)
          .map_groups(run_key, batch_format="pandas").to_pandas())
    df["window_start"] = df["window_start"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df.sort_values(
        [key_col, "window_start", "late"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed prefix scan (running aggregates in one GLOBAL total order)
# ---------------------------------------------------------------------------


def ordered_scan(ds, order_col: str, specs: list, *,
                 n_buckets: int | None = None,
                 keep_cols: list | None = None):
    """Running aggregate over a global total order — ``sum(v) OVER
    (ORDER BY order_col ROWS UNBOUNDED PRECEDING)`` as a distributed
    two-phase scan (the classic parallel-prefix shape: local scan per
    range, tiny exclusive combine across ranges, broadcast back).

    ``specs`` is a list of ``(value_col, op, out_col)`` with op in
    {"sum", "max", "min"}; values must be numeric.  int64 stays int64
    — exact in any association (the oracle-paired contract; scale
    floats to integers first, as q_events_running_total does).  Float
    SUMS associate as local-scan-plus-offset, which can differ from a
    strict sequential fold in the last ulps; max/min are exact for any
    dtype.
    ``order_col`` values must be unique (ROW semantics; ties would make
    the running value order-dependent) and numeric or datetime64
    (datetimes range-bucket through their epoch ticks).

    Scale shape: ranges come from equal-width bucketing on the observed
    [min, max] (one combiner pass), so the only exchange is the bucket
    groupby; cross-range carry is a K-row driver table (K =
    :func:`~cpg_ray.functions.relational.default_n_buckets`), never a
    sequential pass over the data.  Skewed order keys unbalance range
    SIZES, not correctness.

    Reference analog: the reference's EOG `INDEX` property makes
    evaluation order a COLUMN (Properties.java:43-49); this operator is
    the same move for running state — order is data, so the scan
    parallelizes.

    Two FUSED ops compose a scan of a scan without a second exchange:
    ``summin`` / ``summax`` emit the running min / max OF the running
    sum of ``value_col`` — per range the local min-of-prefix, combined
    across ranges as ``min(local + sum_offset, carry_min)`` (the
    segment-scan identity: a segment's contribution to the global
    min-prefix is its sum offset plus its local min-prefix).  A
    ``summin``/``summax`` spec REQUIRES a ``(value_col, "sum", …)``
    spec in the same call (its offsets come from that sum's totals) —
    the CUSUM identity s_i = P_i − min(0, min_{j≤i} P_j) is then ONE
    scan call, one exchange.

    ``keep_cols`` names input columns carried through to the output
    unchanged — what lets scans COMPOSE (a second scan over a first
    scan's output needs the first's running column next to its own).

    Execution shape (one exchange total): bucketize (linear) →
    ``groupby(__bucket).map_groups`` local sorted scan — the ONLY
    exchange — materialized once, then per-range carries are recovered
    from each range's LAST row by a linear per-batch combiner (≤ K
    candidate rows per batch, combined on the driver), and a final
    linear ``map_batches`` adds the K-row broadcast offsets.  The
    materialize pins one output-sized copy in the object store (spill
    handles overflow); the alternative — recomputing the sorted scan
    for the carry pass — costs a second all-to-all, which is worse at
    every scale."""
    import ray.data as rd

    from .relational import default_n_buckets

    ops = {"sum": ("cumsum", np.add), "max": ("cummax", np.maximum),
           "min": ("cummin", np.minimum),
           "summin": ("cummin", np.minimum),
           "summax": ("cummax", np.maximum)}
    for c, op, _ in specs:
        if op not in ops:
            raise ValueError(f"unsupported scan op {op!r}")
        if op in ("summin", "summax") and not any(
                c2 == c and op2 == "sum" for c2, op2, _ in specs):
            raise ValueError(
                f"{op!r} over {c!r} needs a ({c!r}, 'sum', …) spec in "
                "the same call — its cross-range offsets come from "
                "that sum's totals")
    if n_buckets is None:
        n_buckets = default_n_buckets()

    keep_cols = list(keep_cols or [])
    cols = [order_col] + sorted({c for c, _, _ in specs}
                                | set(keep_cols))

    def ordkey(s: pd.Series) -> np.ndarray:
        """Order column → float64 range key.  Datetimes map through
        int64 epoch ticks; float64 rounding is MONOTONE, and bucket
        assignment only needs monotonicity (equal keys share a
        bucket), so precision loss never reorders the scan."""
        a = s.to_numpy()
        if np.issubdtype(a.dtype, np.datetime64):
            a = a.astype("int64")
        return a.astype(np.float64)

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({"mn": [], "mx": []})
        k = ordkey(b[order_col])
        return pd.DataFrame({"mn": [k.min()], "mx": [k.max()]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    if mm.empty:
        return rd.from_pandas(pd.DataFrame(
            {order_col: pd.Series([], dtype="int64"),
             **{c: pd.Series([], dtype="int64") for c in keep_cols},
             **{out: pd.Series([], dtype="int64")
                for _, _, out in specs}}))
    lo, hi = mm.mn.min(), mm.mx.max()
    # interior boundaries of n_buckets equal-width ranges
    bounds = np.linspace(float(lo), float(hi), n_buckets + 1)[1:-1]

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["__bucket"] = np.searchsorted(
            bounds, ordkey(b[order_col]), side="right"
        ).astype("int32")
        return b

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    # phase 1 — the one exchange: per-range sorted LOCAL scan (no
    # cross-range state yet); __bucket rides along for the carry pass
    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        out = {order_col: g[order_col].to_numpy(),
               "__bucket": g["__bucket"].to_numpy()}
        for c in keep_cols:
            out[c] = g[c].to_numpy()
        for c, op, name in specs:
            if op in ("summin", "summax"):
                local = getattr(g[c].cumsum(), ops[op][0])()
            else:
                local = getattr(g[c], ops[op][0])()
            out[name] = local.to_numpy()
        return pd.DataFrame(out)

    local = bucketed.groupby("__bucket").map_groups(
        local_scan, batch_format="pandas").materialize()

    # phase 2 — per-range totals from each range's LAST row: a linear
    # per-batch combiner (≤ K candidate rows per batch; map_groups may
    # split a range across downstream batches, so combine by max order
    # key on the driver), then the exclusive cross-range carry fold
    spec_cols = [name for _, _, name in specs]

    def last_rows(b: pd.DataFrame) -> pd.DataFrame:
        idx = b.groupby("__bucket")[order_col].idxmax()
        return b.loc[idx, ["__bucket", order_col] + spec_cols]

    summ = pd.concat(
        [last_rows(b) for b in local.iter_batches(
            batch_size=None, batch_format="pandas")] or
        [pd.DataFrame(columns=["__bucket", order_col] + spec_cols)],
        ignore_index=True)
    summ = (summ.sort_values(["__bucket", order_col])
            .groupby("__bucket", as_index=False).last()
            .sort_values("__bucket").reset_index(drop=True))

    sum_total = {c: {} for c, op, _ in specs if op == "sum"}
    for c, op, name in specs:
        if op == "sum":
            for bk, t in zip(summ["__bucket"], summ[name]):
                sum_total[c][int(bk)] = t
    offsets: dict[int, list] = {}
    carry: list = [None] * len(specs)
    sum_carry: dict = {c: None for c in sum_total}
    for _, row in summ.iterrows():
        bk = int(row["__bucket"])
        offsets[bk] = list(carry)
        for i, (c, op, name) in enumerate(specs):
            if op == "sum":
                t = row[name]  # local cumsum at range end == range sum
                carry[i] = t if carry[i] is None else carry[i] + t
            elif op in ("max", "min"):
                m = row[name]
                carry[i] = m if carry[i] is None else ops[op][1](
                    carry[i], m)
            else:  # summin / summax: carry = combine(prev, O_k + M_k)
                o = sum_carry[c]
                m = row[name] if o is None else row[name] + o
                carry[i] = m if carry[i] is None else ops[op][1](
                    carry[i], m)
        for c in sum_carry:
            t = sum_total[c].get(bk)
            if t is not None:
                sum_carry[c] = t if sum_carry[c] is None \
                    else sum_carry[c] + t
    # exclusive SUM offsets per range, for summin/summax finalize
    sum_off: dict = {c: {} for c in sum_total}
    for c, tot in sum_total.items():
        run = None
        for bk in sorted(tot):
            sum_off[c][bk] = run
            run = tot[bk] if run is None else run + tot[bk]

    # phase 3 — linear finalize: broadcast K-row offsets onto each row
    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = {order_col: b[order_col].to_numpy()}
        for c in keep_cols:
            out[c] = b[c].to_numpy()
        bk = b["__bucket"].to_numpy()
        for i, (c, op, name) in enumerate(specs):
            vals = b[name].to_numpy().copy()
            if op in ("summin", "summax"):
                so = sum_off[c]
                add = np.array([0 if so.get(int(k)) is None
                                else so[int(k)] for k in bk])
                vals = vals + add
            off = np.array([offsets.get(int(k), [None] * len(specs))[i]
                            for k in bk], dtype=object)
            has = np.array([o is not None for o in off])
            if has.any():
                o = np.where(has, off, 0).astype(vals.dtype)
                if op == "sum":
                    vals = np.where(has, vals + o, vals)
                else:
                    vals = np.where(has, ops[op][1](vals, o), vals)
            out[name] = vals
        return pd.DataFrame(out)

    return local.map_batches(finalize, batch_format="pandas")


def sessionize_disordered(events_ds, *, gap_seconds: float = 1800.0,
                          lateness_s: float = 300.0,
                          jitter_s: float = 600.0,
                          n_buckets: int = 8,
                          batch_rows: int = 4096) -> pd.DataFrame:
    """Sessionize a DISORDERED event stream through the
    :class:`ReorderBuffer` → :class:`Sessionizer` actor chain — the
    allowed-lateness ingestion shape (Beam/Flink) where events arrive
    displaced from event-time order and anything later than the
    released watermark is dropped, counted, and excluded from its
    session.

    The disorder is SYNTHESIZED deterministically so a SQL twin can
    reproduce the exact drop set: arrival key = epoch_µs(ts) +
    (md5_32(event_id) mod 2J) − J with J = ``jitter_s`` (bounded ±J
    displacement), tie-broken by event_id; each user-hash bucket
    feeds its buffer in ``batch_rows`` arrival-order chunks.  The
    buffer's drop rule then reduces to closed form — an event in
    chunk c drops iff ts ≤ runmax(chunk maxima < c) − lateness (a
    dropped event can never carry the chunk max, so the running max
    ignores drops) — which is one window expression cross-engine.
    Kept events reach the sessionizer in strict ts order by
    construction, so sessions over them are the standard gap rule.

    Scale shape: identical to :func:`sessionize_streaming` — the only
    exchange is the bucket hash shuffle; buffer + sessionizer state
    stay bounded by lateness-window × open sessions per bucket.

    Returns the closed-session frame (user_id, session_start,
    session_end, n_events) with ``attrs['dropped_late']`` holding the
    total dropped-event count."""
    import hashlib as _h

    J = int(jitter_s * 1_000_000)

    def add_keys(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        jit = np.array([int(_h.md5(str(int(e)).encode())
                            .hexdigest()[:8], 16) % (2 * J) - J
                        for e in b["event_id"].to_numpy()],
                       dtype=np.int64)
        b["__arr"] = us + jit
        b["__b"] = (b.user_id % n_buckets).astype("int32")
        return b

    cols = ["user_id", "session_start", "session_end", "n_events"]

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rb = ReorderBuffer(Sessionizer(gap_seconds),
                           allowed_lateness_s=lateness_s)
        g = (g.sort_values(["__arr", "event_id"], kind="mergesort")
             .drop(columns=["__arr", "__b"]))
        frames = [rb.feed(g.iloc[i: i + batch_rows])
                  for i in range(0, len(g), batch_rows)]
        frames.append(rb.flush())
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame(columns=cols + ["__dropped"])
        out = pd.concat(frames, ignore_index=True)
        out["__dropped"] = np.int64(0)
        if len(out):
            out.iloc[0, out.columns.get_loc("__dropped")] = np.int64(
                rb.dropped_late)
        return out

    out = (events_ds.map_batches(add_keys, batch_format="pandas")
           .groupby("__b")
           .map_groups(run_bucket, batch_format="pandas")
           .to_pandas())
    if out.empty:
        res = pd.DataFrame(columns=cols)
        res.attrs["dropped_late"] = 0
        return res
    dropped = int(out["__dropped"].sum())
    res = (out[cols].sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    res.attrs["dropped_late"] = dropped
    return res


class ReorderBuffer:
    """Bounded event-time reorder buffer in front of any ts-ordered
    consumer (the Beam/Flink ALLOWED-LATENESS model for an input that
    is not quite sorted): events buffer until the watermark —
    ``max ts seen − allowed_lateness`` — passes them, then release
    downstream in ts order, so any displacement within the allowance
    is invisible to the consumer.  Events arriving at or below the
    already-released watermark are COUNTED and dropped
    (``.dropped_late``), never fed out of order and never silent.

    State is O(events inside one lateness window) — bounded by the
    stream's rate × allowance, not its history; the consumer keeps its
    own strictly-ordered contract (Sessionizer.feed still raises on a
    violation, which this buffer makes unreachable by construction)."""

    def __init__(self, consumer, allowed_lateness_s: float = 300.0):
        self.consumer = consumer
        self.lateness = pd.Timedelta(seconds=allowed_lateness_s)
        self._buf: list[pd.DataFrame] = []
        self._max_ts = None
        self._released_to = None
        self.dropped_late = 0

    def feed(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return self.consumer.feed(batch)
        if self._released_to is not None:
            late = batch["ts"] <= self._released_to
            self.dropped_late += int(late.sum())
            batch = batch[~late]
        if len(batch):
            self._buf.append(batch)
            mx = batch["ts"].max()
            self._max_ts = mx if self._max_ts is None \
                else max(self._max_ts, mx)
        empty = batch.iloc[0:0]
        if self._max_ts is None:
            return self.consumer.feed(empty)
        wm = self._max_ts - self.lateness
        if self._released_to is not None and wm <= self._released_to:
            return self.consumer.feed(empty)
        pend = pd.concat(self._buf, ignore_index=True)
        ready = pend["ts"] <= wm
        self._buf = [pend[~ready]] if (~ready).any() else []
        self._released_to = wm
        out = pend[ready]
        if not len(out):
            return out
        return self.consumer.feed(out.sort_values("ts",
                                                  kind="mergesort"))

    def flush(self) -> pd.DataFrame:
        frames = []
        if self._buf:
            pend = pd.concat(self._buf, ignore_index=True)
            self._buf = []
            if len(pend):
                frames.append(self.consumer.feed(
                    pend.sort_values("ts", kind="mergesort")))
        frames.append(self.consumer.flush())
        frames = [f for f in frames if len(f)]
        return (pd.concat(frames, ignore_index=True) if frames
                else self.consumer.flush())


ALLEN_RELATIONS = (
    "before", "meets", "overlaps", "starts", "during", "finishes",
    "equals", "finished_by", "contains", "started_by",
    "overlapped_by", "met_by", "after",
)


def allen_relation_census(ds, *, group_col: str, kind_col: str,
                          ts_col: str, max_group: int = 5000):
    """Allen interval-algebra census (Allen, CACM 1983): per group,
    the activity interval of each kind ([min ts, max ts]) is compared
    against every other kind in the group (ordered pairs, kind_a <
    kind_b) and classified into exactly one of the 13 Allen relations
    via a mutually-exclusive CASE ladder on interval endpoints —
    identical ladder in the SQL twin, timestamp comparisons only, so
    counts hash-match.  Returns (kind_a, kind_b, rel, n) ordered.

    Scale shape: one pre-combined groupby builds the per-(group, kind)
    intervals, the bounded within-group pair fan-out runs inside
    bucketed ``map_groups`` (a group with m kinds emits m(m-1)/2 pairs
    — kinds-per-group is vocabulary-bounded; ``max_group`` guards the
    pathological case by SKIPPING the group, reported via the
    ``skipped_groups`` attr), and the census is one more pre-combined
    count.  Nothing row-scale reaches the driver."""
    from .relational import _collect_limited, default_n_buckets, groupby_agg

    iv = groupby_agg(
        ds.map_batches(lambda b: b[[group_col, kind_col, ts_col]],
                       batch_format="pandas"),
        [group_col, kind_col],
        [(ts_col, "min", "t0"), (ts_col, "max", "t1")])
    nb = default_n_buckets()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, sub in g.groupby(group_col, sort=False):
            m = len(sub)
            if m < 2 or m > max_group:
                if m > max_group:
                    parts.append(pd.DataFrame(
                        {"kind_a": ["__skip__"], "kind_b": [""],
                         "rel": [""], "skipped": [np.int64(m)]}))
                continue
            sub = sub.sort_values(kind_col)
            i, j = np.triu_indices(m, k=1)
            a0 = sub["t0"].to_numpy()[i]
            a1 = sub["t1"].to_numpy()[i]
            b0 = sub["t0"].to_numpy()[j]
            b1 = sub["t1"].to_numpy()[j]
            rel = np.select(
                [a1 < b0,
                 a1 == b0,
                 (a0 < b0) & (b0 < a1) & (a1 < b1),
                 (a0 == b0) & (a1 < b1),
                 (b0 < a0) & (a1 < b1),
                 (b0 < a0) & (a1 == b1),
                 (a0 == b0) & (a1 == b1),
                 (a0 < b0) & (a1 == b1),
                 (a0 < b0) & (b1 < a1),
                 (a0 == b0) & (b1 < a1),
                 (b0 < a0) & (a0 < b1) & (b1 < a1),
                 (b1 == a0),
                 (b1 < a0)],
                ALLEN_RELATIONS, default="?")
            parts.append(pd.DataFrame({
                "kind_a": sub[kind_col].to_numpy()[i],
                "kind_b": sub[kind_col].to_numpy()[j],
                "rel": rel, "skipped": np.int64(0)}))
        if not parts:
            return pd.DataFrame({
                "kind_a": pd.Series([], dtype=object),
                "kind_b": pd.Series([], dtype=object),
                "rel": pd.Series([], dtype=object),
                "skipped": pd.Series([], dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    rels = iv.map_batches(
        lambda b: b.assign(__bk=pd.util.hash_array(
            b[group_col].to_numpy()) % nb),
        batch_format="pandas",
    ).groupby("__bk").map_groups(pairs, batch_format="pandas")
    out = _collect_limited(
        groupby_agg(rels, ["kind_a", "kind_b", "rel"],
                    [("skipped", "sum", "skip_sum"),
                     ("rel", "count", "n")]),
        5_000_000, "allen_relation_census")
    skipped = out[out["kind_a"] == "__skip__"]
    out = out[out["kind_a"] != "__skip__"][
        ["kind_a", "kind_b", "rel", "n"]]
    out["n"] = out["n"].astype("int64")
    out = (out.sort_values(["kind_a", "kind_b", "rel"])
           .reset_index(drop=True))
    out.attrs["skipped_groups"] = int(skipped["n"].sum()) \
        if len(skipped) else 0
    return out
