"""Unit tests for frequent-itemset mining (A-priori / SON shape)."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _baskets(rows):
    recs = [(bk, it) for bk, items in rows for it in items]
    return rd.from_pandas(pd.DataFrame(recs, columns=["bk", "it"]))


def _brute(rows, min_support, max_size=3):
    """Exhaustive reference: count every itemset up to max_size."""
    sets = [frozenset(items) for _, items in rows]
    vocab = sorted(set().union(*sets))
    out = []
    for k in range(1, max_size + 1):
        for combo in itertools.combinations(vocab, k):
            sup = sum(1 for s in sets if set(combo) <= s)
            if sup >= min_support:
                out.append((",".join(combo), k, sup))
    return (pd.DataFrame(out, columns=["itemset", "size", "support"])
            .astype({"size": "int64", "support": "int64"})
            .sort_values(["size", "itemset"]).reset_index(drop=True))


def test_frequent_itemsets_matches_bruteforce():
    from cpg_ray.functions.mining import frequent_itemsets

    rng = np.random.default_rng(7)
    vocab = [f"i{j}" for j in range(12)]
    rows = []
    for bk in range(200):
        n = int(rng.integers(1, 6))
        items = list(rng.choice(vocab, size=n, replace=False))
        # plant a hot triple in ~30% of baskets
        if rng.random() < 0.3:
            items += ["A", "B", "C"]
        rows.append((bk, items))
    got = frequent_itemsets(_baskets(rows), basket_col="bk",
                            item_col="it", min_support=15)
    want = _brute(rows, 15)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert "A,B,C" in set(got[got["size"] == 3]["itemset"])


def test_frequent_itemsets_duplicate_items_counted_once():
    from cpg_ray.functions.mining import frequent_itemsets

    # item repeated within a basket counts once (DISTINCT bk,it view)
    rows = [(b, ["x", "x", "y"]) for b in range(5)]
    got = frequent_itemsets(_baskets(rows), basket_col="bk",
                            item_col="it", min_support=5)
    sup = dict(zip(got["itemset"], got["support"]))
    assert sup["x"] == 5 and sup["y"] == 5 and sup["x,y"] == 5


def test_frequent_itemsets_default_threshold_and_max_size():
    from cpg_ray.functions.mining import frequent_itemsets

    rows = [(b, ["p", "q"]) for b in range(40)] + \
           [(b + 100, ["r"]) for b in range(3)]
    # default threshold = max(2, 43 // 20) = 2 → r survives at sup 3
    got = frequent_itemsets(_baskets(rows), basket_col="bk", item_col="it")
    sup = dict(zip(got["itemset"], got["support"]))
    assert sup["r"] == 3 and sup["p,q"] == 40
    got1 = frequent_itemsets(_baskets(rows), basket_col="bk",
                             item_col="it", max_size=1)
    assert set(got1["size"]) == {1}


def test_frequent_itemsets_cand_limit_guard():
    from cpg_ray.functions.mining import frequent_itemsets
    from cpg_ray.functions.relational import GuardExceeded

    rows = [(b, ["a", "b", "c"]) for b in range(10)]
    with pytest.raises(GuardExceeded):
        frequent_itemsets(_baskets(rows), basket_col="bk", item_col="it",
                          min_support=2, cand_limit=1)


def test_association_rules_match_bruteforce():
    from cpg_ray.functions.mining import association_rules

    rng = np.random.default_rng(11)
    vocab = [f"i{j}" for j in range(8)]
    rows = []
    for bk in range(120):
        items = list(rng.choice(vocab, size=int(rng.integers(1, 5)),
                                replace=False))
        if rng.random() < 0.4:
            items += ["A", "B", "C"]
        rows.append((bk, items))
    got = association_rules(_baskets(rows), basket_col="bk", item_col="it",
                            min_support=10, min_conf_bp=2000)

    # brute force over the same itemset lattice
    sets = [frozenset(items) for _, items in rows]
    fi = _brute(rows, 10)
    sup = {frozenset(s.split(",")): v
           for s, v in zip(fi["itemset"], fi["support"])}
    n = len(rows)
    want = []
    for z, s_z in sup.items():
        if len(z) < 2:
            continue
        for r in range(1, len(z)):
            for a in itertools.combinations(sorted(z), r):
                a, c = frozenset(a), z - frozenset(a)
                conf = s_z * 10_000 // sup[a]
                if conf >= 2000:
                    want.append((",".join(sorted(a)), ",".join(sorted(c)),
                                 s_z, conf,
                                 s_z * n * 1_000_000 // (sup[a] * sup[c])))
    want = (pd.DataFrame(want, columns=list(got.columns))
            .astype({c: "int64" for c in got.columns[2:]})
            .sort_values(["antecedent", "consequent"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert (got["conf_bp"] >= 2000).all()
    # A→B,C style rules from the planted triple must be present
    assert "A" in set(got["antecedent"])


def test_frequent_itemsets_driver_and_shuffle_paths_agree():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.mining import frequent_itemsets

    rows = [(i % 17, f"it{(i * 3 + j) % 9}")
            for i in range(120) for j in range(4)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["bk", "it"]))
    a = frequent_itemsets(ds, basket_col="bk", item_col="it",
                          min_support=3)
    b = frequent_itemsets(ds, basket_col="bk", item_col="it",
                          min_support=3, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)
    assert a.attrs["n_baskets"] == b.attrs["n_baskets"]


def test_frequent_itemsets_driver_honors_hot_basket_skip():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.mining import frequent_itemsets

    # one hot basket above max_group contributes L1 but no pairs,
    # identically in both modes
    rows = [(0, f"hot{j}") for j in range(8)]
    rows += [(i, "x") for i in range(1, 6)]
    rows += [(i, "y") for i in range(1, 6)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["bk", "it"]))
    a = frequent_itemsets(ds, basket_col="bk", item_col="it",
                          min_support=2, max_group=4)
    b = frequent_itemsets(ds, basket_col="bk", item_col="it",
                          min_support=2, max_group=4, mode="shuffle")
    pd.testing.assert_frame_equal(a, b)
    two = a[a["size"] == 2]
    assert set(two["itemset"]) == {"x,y"}
