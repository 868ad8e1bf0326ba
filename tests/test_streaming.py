"""Stateful streaming sessionizer: equivalence with the batch
sessionization query + state/order semantics."""

import pandas as pd
import pytest
import ray.data as rd

from cpg_ray.functions.streaming import Sessionizer, sessionize_streaming


def test_sessionizer_unit():
    sz = Sessionizer(gap_seconds=60)
    b1 = pd.DataFrame(
        {"user_id": [1, 1, 2], "ts": pd.to_datetime([0, 30, 40], unit="s")}
    )
    assert len(sz.feed(b1)) == 0  # nothing closed yet
    b2 = pd.DataFrame(
        {"user_id": [1, 2], "ts": pd.to_datetime([200, 70], unit="s")}
    )
    closed = sz.feed(b2)
    # user 1's first session (0-30) closed by the 200s event; user 2
    # continues (40→70 within gap)
    assert len(closed) == 1
    assert closed.user_id.iloc[0] == 1 and closed.n_events.iloc[0] == 2
    tail = sz.flush()
    assert set(tail.user_id) == {1, 2}

    with pytest.raises(ValueError, match="out-of-order"):
        sz.feed(pd.DataFrame({"user_id": [1], "ts": pd.to_datetime([0], unit="s")}))


def test_streaming_matches_batch_sessionization():
    from cpg_ray.pipelines.queries import q_events_sessions

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"])
    got = sessionize_streaming(rd.from_arrow(ev), gap_seconds=1800)
    per_user = got.groupby("user_id").size().rename("n_sessions").reset_index()
    want = q_events_sessions(sf)[["user_id", "n_sessions"]]
    merged = per_user.merge(want, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(want)
    assert (merged.n_sessions_s == merged.n_sessions_b).all()
    # session event counts cover every event exactly once
    assert got.n_events.sum() == ev.num_rows


def test_actor_sessionizer_matches_and_persists_state():
    """The online actor variant agrees with the distributed batch
    variant, and its per-bucket state genuinely spans feed calls
    (sessions crossing a micro-batch boundary close correctly)."""
    from cpg_ray.functions.streaming import sessionize_with_actors

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"])
    batch = sessionize_streaming(rd.from_arrow(ev), gap_seconds=1800)
    # tiny batch_rows forces most sessions to span many feed calls
    online = sessionize_with_actors(
        rd.from_arrow(ev), gap_seconds=1800, n_buckets=3, batch_rows=64
    )
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True), online.reset_index(drop=True)
    )


def test_tumbling_windower_watermark_and_late_routing():
    import numpy as np
    import pandas as pd

    from cpg_ray.functions.streaming import TumblingWindower

    base = 1_700_000_000_000_000  # µs epoch, window = 600 s
    rows = pd.DataFrame({"ts": pd.to_datetime(np.array([
        base,                        # w0
        base + 700_000_000,          # w1, wm -> here
        base + 50_000_000,           # 650 s behind wm -> LATE (w0)
        base + 200_000_000,          # 500 s behind wm -> on time (w0)
        base + 2_500_000_000,        # w4: closes w0 and w1
    ]), unit="us")})
    tw = TumblingWindower(window_s=600, lateness_s=600)
    out1 = tw.feed(rows.iloc[:3])
    # the late row is emitted immediately, flagged
    late = out1[out1.late]
    assert len(late) == 1 and late.n.iloc[0] == 1
    out2 = tw.feed(rows.iloc[3:])
    fl = tw.flush()
    allrows = pd.concat([out1, out2, fl], ignore_index=True)
    # every event accounted for exactly once
    assert allrows.n.sum() == len(rows)
    w0 = base // 1_000_000 // 600 * 600
    ontime = allrows[~allrows.late].set_index("window_start")
    assert ontime.loc[w0, "n"] == 2  # first row + the 500s-behind row
    # closed-once invariant: no duplicate (window, late=False) rows
    assert not allrows[~allrows.late].window_start.duplicated().any()


def test_tumbling_window_counts_matches_batch_semantics():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import tumbling_window_counts

    rng = np.random.default_rng(3)
    n = 2000
    ts = 1_700_000_000_000_000 + np.sort(
        rng.integers(0, 3_600_000_000, n))
    # shuffle a little so some events arrive out of order
    idx = np.arange(n)
    swaps = rng.integers(0, n - 1, 200)
    for s in swaps:
        idx[s], idx[s + 1] = idx[s + 1], idx[s]
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "event_type": rng.choice(["a", "b"], n),
        "ts": pd.to_datetime(ts[idx], unit="us"),
    })
    got = tumbling_window_counts(rd.from_pandas(df), window_s=600,
                                 lateness_s=60, batch_rows=128)
    # replay the watermark rule in pure pandas per type
    rows = []
    for t, sub in df.groupby("event_type"):
        sub = sub.sort_values("event_id")
        tt = sub.ts.values.astype("datetime64[us]").astype("int64")
        wm = np.maximum.accumulate(
            np.r_[np.int64(-2 ** 62), tt])[:-1]
        late = tt < wm - 60_000_000
        win = tt // 600_000_000 * 600
        f = pd.DataFrame({"event_type": t, "window_start": win,
                          "late": late})
        rows.append(f)
    expect = (pd.concat(rows).groupby(
        ["event_type", "window_start", "late"], as_index=False)
        .size().rename(columns={"size": "n"})
        .sort_values(["event_type", "window_start", "late"])
        .reset_index(drop=True))
    expect["n"] = expect["n"].astype("int64")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_tumbling_windower_property_conservation_and_close_once():
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cpg_ray.functions.streaming import TumblingWindower

    @given(ts=st.lists(st.integers(0, 5000), min_size=1, max_size=300),
           chunk=st.integers(1, 50),
           lateness=st.sampled_from([0, 30, 600]))
    @settings(max_examples=60, deadline=None)
    def prop(ts, chunk, lateness):
        base = 1_700_000_000
        rows = pd.DataFrame({"ts": pd.to_datetime(
            [(base + t) * 1_000_000 for t in ts], unit="us")})
        tw = TumblingWindower(window_s=60, lateness_s=lateness)
        frames = [tw.feed(rows.iloc[i:i + chunk])
                  for i in range(0, len(rows), chunk)]
        frames.append(tw.flush())
        out = pd.concat([f for f in frames if len(f)],
                        ignore_index=True)
        # every event accounted for exactly once
        assert out.n.sum() == len(rows)
        # each on-time window closes exactly once across all feeds
        ontime = out[~out.late]
        assert not ontime.window_start.duplicated().any()
        # chunking must not change the final aggregate
        tw2 = TumblingWindower(window_s=60, lateness_s=lateness)
        whole = pd.concat([tw2.feed(rows), tw2.flush()],
                          ignore_index=True)
        a = (out.groupby(["window_start", "late"])["n"].sum()
             .astype("int64").sort_index())
        b = (whole.groupby(["window_start", "late"])["n"].sum()
             .astype("int64").sort_index())
        pd.testing.assert_series_equal(a, b)

    prop()


def test_ordered_scan_matches_sequential_scan_under_skew():
    """Range-partitioned two-phase scan must equal the sequential
    cumsum/cummax even when the order keys are heavily skewed into one
    range and arrive shuffled across blocks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    rng = np.random.RandomState(7)
    n = 5000
    # 90% of keys live in the bottom 1% of the key space (one hot range)
    keys = np.where(rng.rand(n) < 0.9,
                    rng.randint(0, 10_000, n),
                    rng.randint(0, 1_000_000, n))
    keys = np.unique(keys)  # order keys must be unique
    vals = rng.randint(-500, 500, len(keys)).astype("int64")
    perm = rng.permutation(len(keys))
    ds = rd.from_pandas(pd.DataFrame(
        {"k": keys[perm], "v": vals[perm]})).repartition(13)

    out = (ordered_scan(ds, "k", [("v", "sum", "rs"), ("v", "max", "rm"),
                                  ("v", "min", "rn")], n_buckets=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    truth = pd.DataFrame({"k": keys, "v": vals}).sort_values("k")
    assert (out.rs.to_numpy() == truth.v.cumsum().to_numpy()).all()
    assert (out.rm.to_numpy() == truth.v.cummax().to_numpy()).all()
    assert (out.rn.to_numpy() == truth.v.cummin().to_numpy()).all()


def test_ordered_scan_single_bucket_and_empty():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    ds = rd.from_pandas(pd.DataFrame({"k": [3, 1, 2], "v": [10, 1, 100]}))
    out = (ordered_scan(ds, "k", [("v", "sum", "rs")], n_buckets=1)
           .to_pandas().sort_values("k"))
    assert list(out.rs) == [1, 101, 111]

    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                         "v": pd.Series([], dtype="int64")}))
    assert ordered_scan(empty, "k", [("v", "sum", "rs")]).count() == 0


def test_ordered_scan_datetime_order_column():
    """Event-time is the natural scan order: a datetime64 order column
    must range-bucket correctly (epoch-tick keys) and match the
    sequential scan."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    rng = np.random.RandomState(11)
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.sort(rng.choice(10**6, size=400, replace=False)), unit="s")
    vals = rng.randint(-100, 100, 400).astype("int64")
    perm = rng.permutation(400)
    ds = rd.from_pandas(pd.DataFrame(
        {"ts": ts[perm], "v": vals[perm]})).repartition(7)
    out = (ordered_scan(ds, "ts", [("v", "sum", "rs"), ("v", "max", "rm")],
                        n_buckets=5)
           .to_pandas().sort_values("ts").reset_index(drop=True))
    assert (out.rs.to_numpy() == vals.cumsum()).all()
    assert (out.rm.to_numpy() == np.maximum.accumulate(vals)).all()


def test_cusum_two_scan_composition_matches_recursion():
    """The CUSUM prefix identity s_i = P_i − min(0, min_{j≤i} P_j)
    computed as ordered_scan(sum) → ordered_scan(min, keep_cols=[P])
    must equal the sequential non-associative recursion
    s_i = max(0, s_{i−1} + dv_i) on a shuffled multi-block stream,
    including streams that never reset (all-positive drift) and
    streams pinned at zero (all-negative drift)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    rng = np.random.RandomState(23)
    for dv in (rng.randint(-80, 60, 3000),          # mixed, resets
               rng.randint(1, 50, 500),             # never resets
               rng.randint(-50, -1, 500)):          # pinned at 0
        dv = dv.astype("int64")
        n = len(dv)
        perm = rng.permutation(n)
        ds = rd.from_pandas(pd.DataFrame(
            {"k": np.arange(n)[perm], "dv": dv[perm]})).repartition(9)
        prefix = ordered_scan(ds, "k", [("dv", "sum", "p")],
                              n_buckets=6)
        out = (ordered_scan(prefix, "k", [("p", "min", "pmin")],
                            keep_cols=["p"], n_buckets=6)
               .to_pandas().sort_values("k").reset_index(drop=True))
        got = (out.p.to_numpy()
               - np.minimum(out.pmin.to_numpy(), 0))
        s, truth = 0, np.empty(n, dtype="int64")
        for i, d in enumerate(dv):
            s = max(0, s + d)
            truth[i] = s
        assert (got == truth).all()


def test_fused_summin_matches_composition_and_recursion():
    """The fused ``summin``/``summax`` specs (running min/max OF the
    running sum, one exchange) must equal the two-scan composition AND
    the sequential CUSUM recursion, across reset/no-reset drifts and
    range-count extremes (1 bucket = all-local, 16 = carry-heavy)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    rng = np.random.RandomState(31)
    for dv in (rng.randint(-80, 60, 3000),
               rng.randint(1, 50, 400),
               rng.randint(-50, -1, 400)):
        dv = dv.astype("int64")
        n = len(dv)
        perm = rng.permutation(n)
        df = pd.DataFrame({"k": np.arange(n)[perm], "dv": dv[perm]})
        for nb in (1, 6, 16):
            ds = rd.from_pandas(df).repartition(7)
            fused = (ordered_scan(
                ds, "k", [("dv", "sum", "p"), ("dv", "summin", "pmin"),
                          ("dv", "summax", "pmax")], n_buckets=nb)
                .to_pandas().sort_values("k").reset_index(drop=True))
            p = np.cumsum(dv)
            assert (fused.p.to_numpy() == p).all()
            assert (fused.pmin.to_numpy()
                    == np.minimum.accumulate(p)).all()
            assert (fused.pmax.to_numpy()
                    == np.maximum.accumulate(p)).all()
            got = fused.p.to_numpy() - np.minimum(
                fused.pmin.to_numpy(), 0)
            s, truth = 0, np.empty(n, dtype="int64")
            for i, d in enumerate(dv):
                s = max(0, s + d)
                truth[i] = s
            assert (got == truth).all()


def test_summin_without_sum_spec_raises():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from cpg_ray.functions.streaming import ordered_scan

    ds = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(4), "dv": np.ones(4, dtype="int64")}))
    with pytest.raises(ValueError, match="needs a"):
        ordered_scan(ds, "k", [("dv", "summin", "pmin")])


def test_reorder_buffer_hides_bounded_disorder_from_sessionizer():
    """Events shuffled within the lateness allowance must produce
    IDENTICAL sessions to a fully-sorted feed; displacement beyond the
    allowance is counted and dropped, and the strict consumer never
    raises."""
    import numpy as np
    import pandas as pd

    from cpg_ray.functions.streaming import ReorderBuffer, Sessionizer

    rng = np.random.RandomState(9)
    n = 3000
    base = pd.Timestamp("2026-02-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.randint(0, 200_000, n)), unit="s")
    ev = pd.DataFrame({"user_id": rng.randint(0, 40, n), "ts": ts})

    # ground truth: plain sessionizer over the sorted stream
    truth_sz = Sessionizer(gap_seconds=1800)
    srt = ev.sort_values("ts", kind="mergesort")
    frames = [truth_sz.feed(srt.iloc[i:i + 500])
              for i in range(0, n, 500)]
    frames.append(truth_sz.flush())
    truth = (pd.concat([f for f in frames if len(f)], ignore_index=True)
             .sort_values(["user_id", "session_start"])
             .reset_index(drop=True))

    # arrival order: each event displaced by < lateness (300 s)
    arrival = ev.assign(
        __k=ev.ts + pd.to_timedelta(rng.randint(0, 250, n), unit="s")
    ).sort_values("__k", kind="mergesort").drop(columns="__k")
    rb = ReorderBuffer(Sessionizer(gap_seconds=1800),
                       allowed_lateness_s=300)
    frames = [rb.feed(arrival.iloc[i:i + 500]) for i in range(0, n, 500)]
    frames.append(rb.flush())
    got = (pd.concat([f for f in frames if len(f)], ignore_index=True)
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, truth)
    assert rb.dropped_late == 0


def test_reorder_buffer_drops_and_counts_beyond_lateness():
    import pandas as pd

    from cpg_ray.functions.streaming import ReorderBuffer, Sessionizer

    base = pd.Timestamp("2026-02-01")
    rb = ReorderBuffer(Sessionizer(gap_seconds=60),
                       allowed_lateness_s=10)
    rb.feed(pd.DataFrame({"user_id": [1, 1],
                          "ts": [base, base + pd.Timedelta(seconds=100)]}))
    # watermark is now 100-10=90s: an event at 5s is beyond lateness
    out = rb.feed(pd.DataFrame({"user_id": [1],
                                "ts": [base + pd.Timedelta(seconds=5)]}))
    assert rb.dropped_late == 1 and len(out) == 0
    final = rb.flush()
    # the on-time events still sessionize (two sessions: 0s and 100s)
    assert len(final) == 2 and int(final.n_events.sum()) == 2


# ---- Allen interval algebra -------------------------------------------------


def test_allen_census_all_13_relations():
    import ray.data as rd

    from cpg_ray.functions.streaming import (ALLEN_RELATIONS,
                                             allen_relation_census)

    # one synthetic group per relation, intervals crafted to hit each
    # of the 13 classes exactly once: kind 'a' vs kind 'b'
    spans = {
        "before":        ((0, 2), (5, 8)),
        "meets":         ((0, 5), (5, 8)),
        "overlaps":      ((0, 6), (5, 8)),
        "starts":        ((5, 6), (5, 8)),
        "during":        ((6, 7), (5, 8)),
        "finishes":      ((6, 8), (5, 8)),
        "equals":        ((5, 8), (5, 8)),
        "finished_by":   ((0, 8), (5, 8)),
        "contains":      ((0, 9), (5, 8)),
        "started_by":    ((5, 9), (5, 8)),
        "overlapped_by": ((6, 9), (5, 8)),
        "met_by":        ((8, 9), (5, 8)),
        "after":         ((9, 12), (5, 8)),
    }
    rows = []
    for gi, (rel, ((a0, a1), (b0, b1))) in enumerate(spans.items()):
        rows += [(gi, "a", pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=a0)),
                 (gi, "a", pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=a1)),
                 (gi, "b", pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=b0)),
                 (gi, "b", pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=b1))]
    ev = pd.DataFrame(rows, columns=["g", "k", "ts"])
    out = allen_relation_census(rd.from_pandas(ev), group_col="g",
                                kind_col="k", ts_col="ts")
    got = dict(zip(out["rel"], out["n"]))
    assert got == {rel: 1 for rel in ALLEN_RELATIONS}
    assert (out["kind_a"] == "a").all() and (out["kind_b"] == "b").all()
    assert out.attrs["skipped_groups"] == 0


def test_allen_census_skip_guard_and_point_intervals():
    import ray.data as rd

    from cpg_ray.functions.streaming import allen_relation_census

    t = pd.Timestamp(2024, 1, 1)
    ev = pd.DataFrame({
        "g": [1] * 4 + [2, 2],
        "k": ["a", "b", "c", "d", "x", "y"],
        "ts": [t] * 4 + [t, t],
    })
    # group 1 exceeds max_group=3 -> skipped and reported; group 2's
    # coincident point intervals classify as 'meets' (first ladder hit)
    out = allen_relation_census(rd.from_pandas(ev), group_col="g",
                                kind_col="k", ts_col="ts", max_group=3)
    assert out.attrs["skipped_groups"] == 1
    assert list(out.itertuples(index=False, name=None)) == [
        ("x", "y", "meets", 1)]


def test_sessionize_disordered_drops_beyond_lateness():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.streaming import sessionize_disordered

    t0 = pd.Timestamp("2024-01-01")
    # one user, events a minute apart over 2 hours; tiny jitter makes
    # arrival ~ts order EXCEPT one straggler displaced far beyond the
    # lateness allowance (forced by feeding chunk size 4: by the time
    # it arrives, the watermark has passed it)
    rows = [(i, 7, t0 + pd.Timedelta(minutes=i)) for i in range(120)]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts"]))
    out = sessionize_disordered(ds, gap_seconds=1800, lateness_s=60,
                                jitter_s=3600, n_buckets=1,
                                batch_rows=4)
    # big jitter + small lateness: SOME events must drop, the rest
    # sessionize in pure ts order (gaps <= 30 min unless a dropped
    # run opens one)
    assert out.attrs["dropped_late"] > 0
    assert out.n_events.sum() + out.attrs["dropped_late"] == 120
    # zero-jitter control: nothing drops, one session
    out2 = sessionize_disordered(ds, gap_seconds=1800, lateness_s=60,
                                 jitter_s=0.000001, n_buckets=1,
                                 batch_rows=4)
    assert out2.attrs["dropped_late"] == 0
    assert len(out2) == 1 and out2.n_events.iloc[0] == 120
