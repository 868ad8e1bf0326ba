"""skew_join (hot-key broadcast + cold-key shuffle hybrid): result
equivalence with the plain hash join on skewed and uniform inputs, the
dimension-side guard, and the no-hot-keys fallback."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cpg_ray.functions.relational import GuardExceeded, hash_join, skew_join


def _skewed_sides(seed=3, n=6000, n_keys=300):
    rng = np.random.RandomState(seed)
    keys = np.concatenate([
        np.zeros(n // 2, dtype=np.int64),              # one mega-hot key
        np.full(n // 6, 7, dtype=np.int64),            # a second hot key
        rng.randint(1, n_keys, size=n - n // 2 - n // 6),
    ])
    rng.shuffle(keys)
    left = pd.DataFrame({"k": keys, "a": np.arange(len(keys))})
    right = pd.DataFrame({
        "rk": np.arange(n_keys, dtype=np.int64),
        "b": [f"v{i}" for i in range(n_keys)],
    })
    return left, right


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_skew_join_equals_hash_join_on_zipf(how):
    left, right = _skewed_sides()
    # drop hot key 0 from the right so left_outer exercises null fill
    right = right[right.rk != 0]
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    got, n_hot = skew_join(l, r, on="k", right_on="rk", how=how)
    want = hash_join(l, r, on="k", right_on="rk", how=how)
    g = got.to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
    w = want.to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
    assert n_hot >= 2  # both planted hot keys routed to the broadcast path
    pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)


def test_skew_join_no_hot_keys_falls_back_to_hash_join():
    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 5000, size=5000),
                         "a": np.arange(5000)})
    right = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                          "b": np.arange(5000) * 2})
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    got, n_hot = skew_join(l, r, on="k", hot_min_share=0.05)
    assert n_hot == 0  # uniform keys: nothing above 5% share
    g = got.to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
    w = left.merge(right, on="k").sort_values(["k", "a"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)


def test_skew_join_right_hot_guard_raises():
    """Hot right side bigger than the declared dimension-side limit →
    GuardExceeded, never a silent driver blow-up."""
    left, right = _skewed_sides()
    # make the right side hot-heavy: many rows for hot key 0
    right = pd.concat([right] + [pd.DataFrame({"rk": [0] * 500,
                                               "b": ["dup"] * 500})],
                      ignore_index=True)
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    with pytest.raises(GuardExceeded, match="skew_join"):
        skew_join(l, r, on="k", right_on="rk",
                  right_hot_row_limit=100)[0]


def test_skew_join_rejects_unsupported_how():
    left, right = _skewed_sides()
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    with pytest.raises(ValueError):
        skew_join(l, r, on="k", right_on="rk", how="full_outer")
