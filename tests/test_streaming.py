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
