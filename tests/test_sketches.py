"""Sketch accuracy + mergeability."""

import numpy as np

from cpg_ray.functions.relational import read_table
from cpg_ray.functions.sketches import HLL, approx_distinct, approx_quantiles

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 50_000, 200_000)
    true = len(np.unique(vals))
    whole = HLL(12).add_batch(vals)
    est = whole.estimate()
    assert abs(est - true) / true < 0.05

    # merge of halves == whole (registers identical)
    a = HLL(12).add_batch(vals[:100_000])
    b = HLL(12).add_batch(vals[100_000:])
    merged = a.merge(b)
    assert (merged.registers == whole.registers).all()

    # serialization round-trip
    rt = HLL.deserialize(whole.serialize())
    assert rt.estimate() == whole.estimate()


def test_approx_distinct_on_dataset():
    ds = read_table(SF, "lineitem", columns=["l_orderkey"])
    import duckdb

    true = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    est = approx_distinct(ds, "l_orderkey", p=12)
    assert abs(est - true) / true < 0.05, (est, true)


def test_approx_quantiles_on_dataset():
    ds = read_table(SF, "lineitem", columns=["l_extendedprice"])
    import duckdb

    got = approx_quantiles(ds, "l_extendedprice", [0.1, 0.5, 0.9])
    for q, g in zip([0.1, 0.5, 0.9], got):
        true = duckdb.sql(
            f"SELECT quantile_cont(l_extendedprice, {q}) "
            f"FROM '{SF}/lineitem.parquet'"
        ).fetchone()[0]
        assert abs(g - true) / true < 0.05, (q, g, true)


def test_misra_gries_bounds_and_merge():
    """Deterministic MG guarantee: true − n/(k+1) ≤ est ≤ true, and
    every value with true count > n/(k+1) survives; merge of halves
    obeys the same bound over the combined stream."""
    from cpg_ray.functions.sketches import MisraGries

    rng = np.random.RandomState(7)
    # Zipf-ish: heavy head over a large tail
    vals = np.concatenate([
        np.repeat(np.arange(10), 3000),          # 10 hot values × 3000
        rng.randint(100, 50_000, 70_000),        # long tail
    ])
    rng.shuffle(vals)
    k = 64
    n = len(vals)
    import pandas as pd
    true = pd.Series(vals).value_counts()

    mg = MisraGries(k)
    for chunk in np.array_split(vals, 37):       # uneven batch feed
        mg.add_counts(dict(pd.Series(chunk).value_counts()), len(chunk))
    bound = n / (k + 1)
    assert len(mg.counters) <= k
    for v, est in mg.counters.items():
        assert est <= true[v] and true[v] - est <= bound, (v, est)
    for v in range(10):                          # hot values must survive
        assert true[v] > bound
        assert v in mg.counters

    # merge of halves: same guarantee over the combined stream
    a, b = MisraGries(k), MisraGries(k)
    a.add_counts(dict(pd.Series(vals[: n // 2]).value_counts()), n // 2)
    b.add_counts(dict(pd.Series(vals[n // 2:]).value_counts()), n - n // 2)
    a.merge(b)
    assert a.n == n
    for v, est in a.counters.items():
        assert est <= true[v] and true[v] - est <= bound


def test_heavy_hitters_on_dataset():
    import duckdb

    import ray.data as rd

    ds = read_table(SF, "orders", columns=["o_orderpriority"])
    from cpg_ray.functions.sketches import heavy_hitters

    got = heavy_hitters(ds, "o_orderpriority", k=16)
    true = duckdb.sql(
        f"SELECT o_orderpriority, count(*) FROM '{SF}/orders.parquet' "
        "GROUP BY 1"
    ).df().set_index("o_orderpriority")["count_star()"]
    n = int(true.sum())
    assert int(got.n_total.iloc[0]) == n
    # 5 priorities, k=16 ≫ 5: estimates are EXACT (no compression)
    for _i, r in got.iterrows():
        assert int(r.est_count) == int(true[r.value])
    assert set(got.value) == set(true.index)


def test_kmv_distinct_matches_brute_force_formula():
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import kmv_distinct

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "v": rng.integers(0, 400, 3000),
    })
    got = kmv_distinct(rd.from_pandas(df), group_col="g",
                       value_col="v", k=16).set_index("g")
    for g, sub in df.groupby("g"):
        hs = sorted({hashlib.md5(str(v).encode()).hexdigest()
                     for v in sub.v})
        true_distinct = sub.v.nunique()
        if len(hs) >= 16:
            prefix = int(hs[15][:8], 16)
            est = float(15 * 4294967296) / float(prefix)
            assert got.loc[g, "kth_prefix"] == prefix
            assert abs(got.loc[g, "est_distinct"] - est) == 0
            # the estimate lands within 60% of truth at k=16 on this
            # distribution (the formula's variance bound is ~1/sqrt(k))
            assert 0.4 * true_distinct < est < 2.5 * true_distinct
        else:
            assert got.loc[g, "est_distinct"] == float(len(hs))
        assert got.loc[g, "n_used"] == min(16, len(hs))


def test_cms_bounds_and_exactness():
    """CMS estimates are one-sided (est >= exact always, for ANY input
    — collisions only add) and EXACT when width exceeds the distinct
    count (no collisions possible in any row).  Batch boundaries must
    not matter: the sketch built from 7-row batches equals the one
    built from one batch."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import cms_frequencies

    rng = np.random.default_rng(41)
    vals = rng.zipf(1.5, 5000) % 97  # skewed, 97 distinct max
    df = pd.DataFrame({"v": vals})
    exact = df.v.value_counts()

    # narrow sketch: collisions -> overcounts, never undercounts
    _c, est = cms_frequencies(rd.from_pandas(df), "v", width=16, depth=3)
    got = est(exact.index.to_numpy())
    assert (got >= exact.to_numpy()).all()

    # wide sketch: width > distinct values in EVERY row -> min is exact
    # only if some row is collision-free; with width 4096 and <=97
    # values collisions are possible but vanishingly unlikely across
    # 4 independent rows — assert exactness (deterministic hashes, so
    # this is a stable property of THIS input, not a flaky bound)
    _c2, est2 = cms_frequencies(rd.from_pandas(df), "v",
                                width=4096, depth=4)
    assert (est2(exact.index.to_numpy()) == exact.to_numpy()).all()

    # batch-boundary invariance: many small blocks vs one block
    ds_small = rd.from_pandas(df).repartition(40)
    c3, _ = cms_frequencies(ds_small, "v", width=16, depth=3)
    assert (c3 == _c).all()


def test_dsample_quantiles_deterministic_and_batch_invariant():
    """The sample is the k md5-smallest-keyed rows GLOBALLY (pure-
    python brute force), quantiles are the percentile_cont lerp over
    it, and batching cannot change anything; n <= k degenerates to
    exact population quantiles."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import dsample_quantiles

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(3000),
                       "v": rng.normal(0, 10, 3000)})
    got = dsample_quantiles(rd.from_pandas(df), "v", [0.25, 0.5, 0.75],
                            key_col="id", k=200)

    keyed = sorted(df.itertuples(),
                   key=lambda r: (hashlib.md5(str(r.id).encode())
                                  .hexdigest(), r.id))
    s = np.sort(np.array([r.v for r in keyed[:200]]))

    def pc(q):
        h = (len(s) - 1) * q
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        return float(s[lo] + (s[hi] - s[lo]) * (h - lo))

    assert got["value"].tolist() == [pc(0.25), pc(0.5), pc(0.75)]
    assert (got["n_sample"] == 200).all()

    got2 = dsample_quantiles(rd.from_pandas(df).repartition(23), "v",
                             [0.25, 0.5, 0.75], key_col="id", k=200)
    pd.testing.assert_frame_equal(got, got2)

    small = dsample_quantiles(rd.from_pandas(df.head(50)), "v", [0.5],
                              key_col="id", k=200)
    assert small["n_sample"].iloc[0] == 50
    assert small["value"].iloc[0] == float(np.median(df.head(50).v))


def test_hll_distinct_block_invariant_and_accurate():
    """The md5-HLL register state must be identical however rows are
    split across blocks (mergeable-combiner contract), and the raw
    estimator must land within ~3×1.04/√m relative error of the true
    cardinality once past the small-range regime."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import hll_distinct

    rng = np.random.RandomState(5)
    n_true = {"a": 3000, "b": 800}
    rows = []
    for g, n in n_true.items():
        vals = rng.choice(100_000, size=n, replace=False)
        # duplicates must not move any register
        rows.extend((g, int(v)) for v in np.concatenate([vals, vals[:200]]))
    df = pd.DataFrame(rows, columns=["g", "v"])

    one = hll_distinct(rd.from_pandas(df), "g", "v")
    many = hll_distinct(rd.from_pandas(df).repartition(17), "g", "v")
    pd.testing.assert_frame_equal(
        one.sort_values("g").reset_index(drop=True),
        many.sort_values("g").reset_index(drop=True))

    tol = 3 * 1.04 / np.sqrt(64)
    for _, r in one.iterrows():
        err = abs(r.hll_est - n_true[r.g]) / n_true[r.g]
        assert err < tol, (r.g, r.hll_est, n_true[r.g], err)


def test_kmv_overlap_exact_when_union_fits_in_k():
    # when |union| <= k the sketch IS the set: estimate = exact Jaccard
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import kmv_overlap

    rows = [
        ("a", "w1 w2 w3 w4"),          # bigrams: 3
        ("b", "w2 w3 w4 w5"),          # shares 2 of them; union = 4
        ("c", "z1 z2"),                # disjoint singleton slice
    ]
    out = kmv_overlap(
        rd.from_pandas(pd.DataFrame(rows, columns=["g", "text"])),
        group_col="g", text_col="text", n=2, k=64)
    ab = out[(out.group_a == "a") & (out.group_b == "b")].iloc[0]
    assert ab.k_used == 4 and ab.n_shared == 2
    assert ab.jaccard_bp == 10000 * 2 // 4
    ac = out[(out.group_a == "a") & (out.group_b == "c")].iloc[0]
    assert ac.n_shared == 0 and ac.jaccard_bp == 0


def test_kmv_overlap_combiner_caps_partials():
    # many batches, tiny k: result identical to a single-batch run
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sketches import kmv_overlap

    df = pd.DataFrame({
        "g": ["x" if i % 2 else "y" for i in range(200)],
        "text": [f"tok{i} tok{i + 1} tok{i + 2}" for i in range(200)],
    })
    one = kmv_overlap(rd.from_pandas(df), group_col="g",
                      text_col="text", n=2, k=16)
    many = kmv_overlap(rd.from_pandas(df).repartition(20),
                       group_col="g", text_col="text", n=2, k=16)
    pd.testing.assert_frame_equal(one, many)
