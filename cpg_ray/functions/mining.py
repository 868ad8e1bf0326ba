"""Frequent-itemset mining (A-priori / SON shape) over transactional
Datasets.

The classic market-basket operator family (Agrawal & Srikant, VLDB'94;
the SON two-phase distributed variant is Savasere/Omiecinski/Navathe,
VLDB'95): level-wise candidate generation with the anti-monotone
support prune — L1 from one combiner-fed groupby, L2 from the bounded
within-basket pair fan-out, C3 generated driver-side from the
(support-bounded) L2 table and counted fully vectorized against a
per-bucket basket×vocabulary boolean matrix.  Nothing corpus-sized
ever reaches the driver: L1 is vocabulary-bounded, L2 is
support-bounded (≥min_support baskets each), and the L3 count ships
``|C3|`` partial counters per bucket.

Reference analog: the statistics/aggregation passes
(StatisticsCollectionPass.kt) count label/edge combinations per
translation unit then merge — the same per-unit-combine →
global-reduce shape this module applies to baskets.
"""
from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from .relational import (GuardExceeded, _collect_limited, distinct_on,
                         default_n_buckets, groupby_agg)

__all__ = ["frequent_itemsets", "association_rules"]


def _gen_c3(l2: pd.DataFrame, cand_limit: int) -> pd.DataFrame:
    """A-priori C3 from the support-bounded L2 table: join on the
    shared first item, prune on the (b, c) subset — pure pandas."""
    x = l2.rename(columns={"b": "c3_b"})
    y = l2.rename(columns={"b": "c3_c"})
    c3 = x.merge(y, on="a", sort=False, suffixes=("", "_y"))
    c3 = c3[c3["c3_b"] < c3["c3_c"]][["a", "c3_b", "c3_c"]]
    pairset = set(zip(l2["a"], l2["b"]))
    keep = [
        (b, c) in pairset
        for b, c in zip(c3["c3_b"].to_numpy(), c3["c3_c"].to_numpy())]
    c3 = c3[np.array(keep, dtype=bool)] if len(c3) else c3
    if len(c3) > cand_limit:
        raise GuardExceeded(
            f"frequent_itemsets: |C3|={len(c3)} exceeds "
            f"cand_limit={cand_limit}")
    return c3


def _itemsets_driver(df: pd.DataFrame, *, basket_col: str,
                     item_col: str, min_support: int | None,
                     rel_den: int, floor_support: int, max_size: int,
                     max_group: int, cand_limit: int) -> pd.DataFrame:
    """Driver twin of the distributed path over the collected DISTINCT
    (basket, item) view — identical semantics including the L2
    hot-basket skip (pruned baskets > max_group contribute no pairs)
    and the uncapped L3 matrix count; each distributed level pays
    1-2 aggregator-fleet exchanges (measured 7.2 s vs ~1 s at sf0.1's
    ~550k distinct rows)."""
    n_baskets = int(df[basket_col].nunique())
    s = (int(min_support) if min_support is not None
         else max(floor_support, n_baskets // rel_den))
    l1 = (df.groupby(item_col, sort=True).size()
          .rename("support").reset_index())
    if len(l1) > cand_limit:
        raise GuardExceeded(
            f"frequent_itemsets: |L1|={len(l1)} exceeds "
            f"cand_limit={cand_limit}")
    l1 = l1[l1["support"] >= s]
    out = [pd.DataFrame({
        "itemset": l1[item_col].astype(str).to_numpy(),
        "size": np.int64(1),
        "support": l1["support"].to_numpy("int64")})]
    vocab = l1[item_col].to_numpy(dtype=object)
    if max_size == 1 or not len(vocab):
        return _finish(out, n_baskets)
    pruned = df[df[item_col].isin(set(vocab))]
    # L2 via CSR-style vectorized pair expansion — a pandas self-merge
    # on the basket key is a high-multiplicity join (measured ~1.2 s
    # for 554k rows x ~5.5 items/basket at sf0.1 vs ~60 ms here);
    # items sort ascending inside each basket run, so a < b holds by
    # construction and the pair key is exact integer arithmetic
    idx = {v: i for i, v in enumerate(vocab)}
    nv = len(vocab)
    icodes = pruned[item_col].map(idx).to_numpy(np.int64)
    bcodes, _ = pd.factorize(pruned[basket_col], sort=False)
    order = np.lexsort((icodes, bcodes))
    b_sorted = bcodes[order]
    i_sorted = icodes[order]
    starts = np.flatnonzero(
        np.r_[True, b_sorted[1:] != b_sorted[:-1]]) \
        if len(b_sorted) else np.array([], dtype=np.int64)
    lens = np.diff(np.r_[starts, len(b_sorted)]) \
        if len(starts) else np.array([], dtype=np.int64)
    run_len = np.repeat(lens, lens)
    keep_run = run_len <= max_group  # hot-basket skip, same as L2 pass
    pos = np.arange(len(b_sorted)) - np.repeat(starts, lens)
    reps = np.where(keep_run, run_len - pos - 1, 0)
    if reps.sum() > 0:
        left = np.repeat(np.arange(len(b_sorted)), reps)
        cum = np.cumsum(reps)
        seg0 = np.r_[0, cum[:-1]]
        right = left + (np.arange(int(reps.sum()))
                        - np.repeat(seg0, reps) + 1)
        keys, counts = np.unique(i_sorted[left] * nv + i_sorted[right],
                                 return_counts=True)
        l2 = pd.DataFrame({"a": vocab[keys // nv],
                           "b": vocab[keys % nv],
                           "support": counts.astype("int64")})
    else:
        l2 = pd.DataFrame({"a": pd.Series(dtype="object"),
                           "b": pd.Series(dtype="object"),
                           "support": pd.Series(dtype="int64")})
    if len(l2) > cand_limit:
        raise GuardExceeded(
            f"frequent_itemsets: |L2|={len(l2)} exceeds "
            f"cand_limit={cand_limit}")
    l2 = l2[l2["support"] >= s].sort_values(["a", "b"])
    out.append(pd.DataFrame({
        "itemset": (l2["a"].astype(str) + "," + l2["b"].astype(str)
                    ).to_numpy(dtype=object),
        "size": np.int64(2),
        "support": l2["support"].to_numpy("int64")}))
    if max_size == 2 or not len(l2):
        return _finish(out, n_baskets)
    c3 = _gen_c3(l2, cand_limit)
    if not len(c3):
        return _finish(out, n_baskets)
    ti = np.array([idx[v] for v in c3["a"]], dtype=np.int64)
    tj = np.array([idx[v] for v in c3["c3_b"]], dtype=np.int64)
    tk = np.array([idx[v] for v in c3["c3_c"]], dtype=np.int64)
    # reuse the basket/item codes from the L2 expansion (same frame)
    codes = bcodes
    cols = icodes
    mat = np.zeros((codes.max() + 1 if len(codes) else 0, len(vocab)),
                   dtype=bool)
    if len(codes):
        mat[codes, cols] = True
    # count grouped by the shared (a, b) prefix: ONE baskets-long AND
    # per L2 pair, reused across its candidate thirds — the naive
    # mat[:, ti] & mat[:, tj] & mat[:, tk] materializes a
    # (baskets x |C3|) temporary three times over (measured 8.8 s vs
    # ~0.2 s at sf0.1's 147k x 2300)
    cnt = np.zeros(len(c3), dtype=np.int64)
    pair_key = ti * len(vocab) + tj
    order = np.argsort(pair_key, kind="stable")
    bounds = np.flatnonzero(np.diff(pair_key[order])) + 1
    for grp in np.split(order, bounds):
        and_ab = mat[:, ti[grp[0]]] & mat[:, tj[grp[0]]]
        cnt[grp] = (and_ab[:, None] & mat[:, tk[grp]]).sum(axis=0)
    keep = np.flatnonzero(cnt >= s)
    if len(keep):
        names = np.array([
            f"{c3['a'].iloc[i]},{c3['c3_b'].iloc[i]},"
            f"{c3['c3_c'].iloc[i]}" for i in keep], dtype=object)
        out.append(pd.DataFrame({
            "itemset": names, "size": np.int64(3),
            "support": cnt[keep].astype("int64")}))
    return _finish(out, n_baskets)


def frequent_itemsets(ds, *, basket_col: str, item_col: str,
                      min_support: int | None = None,
                      rel_den: int = 20, floor_support: int = 2,
                      max_size: int = 3, max_group: int = 5000,
                      cand_limit: int = 5_000_000, mode: str = "auto",
                      driver_limit: int = 2_000_000) -> pd.DataFrame:
    """A-priori frequent itemsets up to ``max_size`` (1..3) over the
    distinct (basket, item) view of ``ds``.

    ``min_support`` defaults to ``max(floor_support,
    n_baskets // rel_den)`` — the SQL twin is
    ``greatest(2, count(DISTINCT bk)//20)`` so both engines derive the
    identical threshold from the data.

    Shape per level:

    - **L1**: combiner-fed :func:`groupby_agg` over items; the
      surviving vocabulary is collected under ``cand_limit`` (it is
      support-bounded: ≤ n_baskets/min_support · avg_basket items) and
      broadcast as the filter set for every later level.
    - **L2**: baskets pruned to L1 items, then the
      :func:`~cpg_ray.functions.graphalgo.co_occurrence_pairs`
      within-basket fan-out (bucketed ``groupby.map_groups``, hot
      baskets capped at ``max_group`` with reported skips) feeds one
      combiner-fed count.  Pair counts over the PRUNED baskets equal
      pair counts over the raw baskets for any L1×L1 pair — the
      anti-monotone prune never changes a surviving support.
    - **C3/L3**: candidate triples are generated from the L2 table
      (join on the shared first item, prune on the third A-priori
      subset) on the driver — L2 is support-bounded, the guard is
      ``cand_limit`` — then counted in ONE distributed pass: each
      basket bucket builds a boolean basket×|L1| membership matrix and
      evaluates all candidates with three column ANDs, emitting
      ``|C3|`` partial counters.  No triple fan-out ever materializes.

    Returns a pandas frame (itemset: comma-joined sorted items, size,
    support) sorted by (size, itemset) — driver-sized by the support
    bound itself.
    """
    if max_size not in (1, 2, 3):
        raise ValueError("max_size must be 1, 2 or 3")
    bi = distinct_on(
        ds.map_batches(lambda b: b[[basket_col, item_col]],
                       batch_format="pandas"),
        [basket_col, item_col]).materialize()
    if mode != "shuffle" and bi.count() <= driver_limit:
        return _itemsets_driver(
            bi.to_pandas(), basket_col=basket_col, item_col=item_col,
            min_support=min_support, rel_den=rel_den,
            floor_support=floor_support, max_size=max_size,
            max_group=max_group, cand_limit=cand_limit)
    n_baskets = distinct_on(
        bi.map_batches(lambda b: b[[basket_col]], batch_format="pandas"),
        [basket_col]).count()
    s = (int(min_support) if min_support is not None
         else max(floor_support, n_baskets // rel_den))

    l1 = _collect_limited(
        groupby_agg(bi, [item_col], [(basket_col, "count", "support")]),
        cand_limit, "frequent_itemsets")
    l1 = l1[l1["support"] >= s].sort_values(item_col)
    out = [pd.DataFrame({
        "itemset": l1[item_col].astype(str).to_numpy(),
        "size": np.int64(1),
        "support": l1["support"].to_numpy("int64")})]
    vocab = l1[item_col].to_numpy(dtype=object)
    if max_size == 1 or not len(vocab):
        return _finish(out, n_baskets)

    vset = set(vocab)
    pruned = bi.map_batches(
        lambda b: b[b[item_col].isin(vset)], batch_format="pandas")
    if max_size == 3:
        pruned = pruned.materialize()  # feeds both L2 and L3 passes

    from .graphalgo import co_occurrence_pairs

    pair_counts = groupby_agg(
        co_occurrence_pairs(pruned, group_col=basket_col,
                            item_col=item_col, max_group=max_group)
        .map_batches(lambda b: b[b["skipped_n"] == 0][["a", "b"]],
                     batch_format="pandas"),
        ["a", "b"], [("a", "count", "support")])
    l2 = _collect_limited(pair_counts, cand_limit, "frequent_itemsets")
    l2 = l2[l2["support"] >= s].sort_values(["a", "b"])
    out.append(pd.DataFrame({
        "itemset": (l2["a"].astype(str) + "," + l2["b"].astype(str)
                    ).to_numpy(dtype=object),
        "size": np.int64(2),
        "support": l2["support"].to_numpy("int64")}))
    if max_size == 2 or not len(l2):
        return _finish(out, n_baskets)

    # ---- C3: join L2 with itself on the shared first item, prune on
    # the (b, c) subset — pure pandas on the support-bounded L2 table.
    c3 = _gen_c3(l2, cand_limit)
    if not len(c3):
        return _finish(out, n_baskets)

    idx = {v: i for i, v in enumerate(vocab)}
    ti = np.array([idx[v] for v in c3["a"]], dtype=np.int64)
    tj = np.array([idx[v] for v in c3["c3_b"]], dtype=np.int64)
    tk = np.array([idx[v] for v in c3["c3_c"]], dtype=np.int64)
    nb = default_n_buckets()
    nv = len(vocab)

    def count_triples(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[basket_col], sort=False)
        cols = g[item_col].map(idx).to_numpy(np.int64)
        m = np.zeros((codes.max() + 1 if len(codes) else 0, nv),
                     dtype=bool)
        if len(codes):
            m[codes, cols] = True
        cnt = (m[:, ti] & m[:, tj] & m[:, tk]).sum(axis=0)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"__t": nz.astype(np.int64),
                             "cnt": cnt[nz].astype(np.int64)})

    partials = pruned.map_batches(
        lambda b: b.assign(__bk=pd.util.hash_array(
            b[basket_col].to_numpy()) % nb),
        batch_format="pandas",
    ).groupby("__bk").map_groups(count_triples, batch_format="pandas")
    tc = _collect_limited(
        groupby_agg(partials, ["__t"], [("cnt", "sum", "support")]),
        cand_limit, "frequent_itemsets")
    tc = tc[tc["support"] >= s]
    t = tc["__t"].to_numpy(np.int64)
    names = np.array([
        f"{vocab[ti[i]]},{vocab[tj[i]]},{vocab[tk[i]]}" for i in t],
        dtype=object)
    l3 = pd.DataFrame({"itemset": names, "size": np.int64(3),
                       "support": tc["support"].to_numpy("int64")})
    out.append(l3.sort_values("itemset"))
    return _finish(out, n_baskets)


def _finish(parts: list[pd.DataFrame],
            n_baskets: int | None = None) -> pd.DataFrame:
    df = pd.concat(parts, ignore_index=True)
    df["size"] = df["size"].astype("int64")
    df["support"] = df["support"].astype("int64")
    df = df.sort_values(["size", "itemset"]).reset_index(drop=True)
    if n_baskets is not None:
        df.attrs["n_baskets"] = int(n_baskets)
    return df


def association_rules(ds, *, basket_col: str, item_col: str,
                      min_support: int | None = None,
                      min_conf_bp: int = 2500,
                      rel_den: int = 20, floor_support: int = 2,
                      max_size: int = 3,
                      **fi_kwargs) -> pd.DataFrame:
    """Association rules (Agrawal & Srikant, VLDB'94 §3) from the
    frequent itemsets of ``ds``: every (antecedent → consequent)
    split of each frequent 2/3-itemset, filtered on confidence.

    Metrics are INTEGER-exact so the SQL twin hash-matches:

    - ``conf_bp``  = ``support(Z) * 10000 // support(A)`` (basis
      points, floor division),
    - ``lift_ppm`` = ``support(Z) * n_baskets * 1_000_000 //
      (support(A) * support(C))`` (parts per million).

    Every proper subset of a frequent itemset is itself frequent (the
    anti-monotone property), so all antecedent/consequent supports are
    present in the itemset table — rule generation is pure driver-side
    arithmetic over the support-bounded result of
    :func:`frequent_itemsets` (one distributed mining pass, zero extra
    exchanges).  Antecedent/consequent render as comma-joined sorted
    item lists; output ordered by (antecedent, consequent).
    """
    fi = frequent_itemsets(ds, basket_col=basket_col, item_col=item_col,
                           min_support=min_support, rel_den=rel_den,
                           floor_support=floor_support,
                           max_size=max_size, **fi_kwargs)
    n = int(fi.attrs["n_baskets"])
    sup = {frozenset(s.split(",")): int(v)
           for s, v in zip(fi["itemset"], fi["support"])}
    rows = []
    for items, s_z in sup.items():
        if len(items) < 2:
            continue
        members = sorted(items)
        for r in range(1, len(members)):
            for ante in itertools.combinations(members, r):
                a, c = frozenset(ante), items - frozenset(ante)
                s_a, s_c = sup.get(a), sup.get(c)
                if s_a is None or s_c is None:  # pragma: no cover
                    continue  # anti-monotone ⇒ unreachable
                conf_bp = s_z * 10_000 // s_a
                if conf_bp < min_conf_bp:
                    continue
                rows.append((",".join(sorted(a)), ",".join(sorted(c)),
                             s_z, conf_bp,
                             s_z * n * 1_000_000 // (s_a * s_c)))
    out = pd.DataFrame(rows, columns=["antecedent", "consequent",
                                      "support", "conf_bp", "lift_ppm"])
    for col in ("support", "conf_bp", "lift_ppm"):
        out[col] = out[col].astype("int64")
    return (out.sort_values(["antecedent", "consequent"])
            .reset_index(drop=True))
