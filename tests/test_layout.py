"""Z-order layout keys (functions/layout.py): bit-pattern pins and the
clustering benefit the SQL comparison can't express."""

import numpy as np
import pandas as pd
import ray.data as rd

from cpg_ray.functions.layout import add_zorder_key, morton_key


def test_morton_hand_bits_and_range():
    # x=3 (bits at even positions: 0b101=5), y=2 (odd: 0b1000=8)
    assert morton_key([3], [2])[0] == 13
    assert morton_key([0], [0])[0] == 0
    assert morton_key([0xFFFF], [0xFFFF])[0] == 0xFFFFFFFF
    # only the low 16 bits participate
    assert morton_key([0x1_0003], [2])[0] == 13


def test_morton_is_monotone_per_dimension():
    """Fixing one dimension, the key is strictly increasing in the
    other — the property that makes zkey ranges prune both columns."""
    xs = np.arange(1000)
    z = morton_key(xs, np.zeros(1000, np.int64))
    assert (np.diff(z) > 0).all()
    z2 = morton_key(np.zeros(1000, np.int64), xs)
    assert (np.diff(z2) > 0).all()


def test_zorder_clusters_both_dimensions():
    """Chunking a zkey-sorted table must give far tighter per-chunk
    user_id ranges than chunking the ts-sorted table — the file-skip
    win that justifies the layout."""
    rng = np.random.RandomState(5)
    n = 20000
    df = pd.DataFrame({
        "xk": rng.randint(0, 1 << 16, n).astype("int64"),
        "yk": np.sort(rng.randint(0, 1 << 16, n)).astype("int64"),
    })
    keyed = add_zorder_key(rd.from_pandas(df), "xk", "yk").to_pandas()

    def mean_x_span(d: pd.DataFrame, order: str) -> float:
        d = d.sort_values(order, kind="mergesort").reset_index(drop=True)
        chunks = np.array_split(d, 64)
        return float(np.mean([c.xk.max() - c.xk.min() for c in chunks]))

    span_by_time = mean_x_span(keyed, "yk")
    span_by_z = mean_x_span(keyed, "zkey")
    # time-sorted chunks see the whole x domain; z-sorted chunks a
    # fraction of it
    assert span_by_z < span_by_time * 0.5
    # buckets are the zkey high bits: bucket order == key order
    srt = keyed.sort_values("zkey")
    assert (np.diff(srt.zkey_bucket.to_numpy()) >= 0).all()
