"""Decision-support query batch — with Q1/Q3/Q5/Q6/Q14-analogs living
in pipelines/queries.py, this module completes all 22 TPC-H shapes
(Q2/Q4/Q7-Q13/Q15-Q22) adapted to the driver's star schema — no
partsupp table, no comment/shipmode columns, so each query keeps the
PATTERN and swaps the missing column for an available analog.

Why these matter beyond breadth: each one exercises a distinct
distributed-plan shape the engine must get right at 100 TB —

- correlated EXISTS folded to an algebraic per-key reduction (q4: the
  subquery ``EXISTS(l WHERE l.ok=o.ok AND l.ship>o.date)`` is exactly
  ``max(l_shipdate) per order > o_orderdate`` — one combiner-shaped
  aggregate replaces a correlated probe per row);
- multi-dimension star joins where every dimension is broadcast and the
  fact table is touched exactly once (q7/q8/q9/q10);
- scalar global aggregates broadcast back over a distributed HAVING
  (q11, q22) — two tiny passes, never a cross join;
- two-level aggregation (q13: aggregate orders per customer, then
  histogram the counts — the second groupby's input is already one row
  per customer, so the wide exchange happens once);
- correlated average threshold as a broadcast per-key map (q17);
- disjunctive multi-predicate pushdown evaluated vectorized per batch
  (q19);
- self-grouped anti semantics (q21: sole-supplier orders via min==max
  per group — no self-join);
- correlated-min collapse (q2: ``cost = (SELECT min ...)`` becomes a
  per-part min aggregate broadcast back over the price book);
- COUNT(DISTINCT) as keep-first-then-count (q16: the distinct collapses
  (descriptor, supplier) pairs ahead of the counting exchange);
- nested-aggregate comparison in one pass (q20: the windowed and the
  all-time quantity are two conditional columns of a single combiner
  pass, never two fact scans).

Scale notes use the repo conventions: dimension tables (region, nation,
customer, supplier, part, orders at these SFs) ride driver-side /
broadcast like q5_region_revenue; the lineitem fact table only ever
streams through ``map_batches`` with combiner partials ahead of any
exchange.  Where orders would outgrow a broadcast at true 100 TB scale
the docstring names the hash_join fallback; the guarded broadcast is
the measured-faster choice at bench scale (see relational.hash_join /
broadcast_join).

Reference analogs: the aggregate/having shapes mirror the reference's
StatisticsCollectionPass + consumer checks (SURVEY.md §2 A1-A5, M12);
the EXISTS folding mirrors its Edges-cache reachability probes
(ST4/J11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.relational import (
    broadcast_join,
    groupby_agg,
    read_table,
    semi_anti_filter,
    topk,
)
from .queries import _pq, hround


# ---------------------------------------------------------------------------
# Q4: correlated EXISTS folded into an algebraic per-order max
# ---------------------------------------------------------------------------


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """Orders in 1996Q1 with at least one lineitem shipped after the
    order date, counted per priority.

    Plan: EXISTS(l WHERE l.ok = o.ok AND l_shipdate > o_orderdate)
    ≡ max(l_shipdate) OVER that order > o_orderdate.  The per-order max
    is a combiner partial (one row per (order, batch)) merged by
    groupby_agg — the only exchange, one row per order key.  The date
    window keeps the orders side small enough to broadcast; at true
    100 TB swap the broadcast for hash_join on l_orderkey (same result,
    one more exchange)."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    maxship = groupby_agg(li, ["l_orderkey"],
                          [("l_shipdate", "max", "max_ship")])

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
    win = orders[(orders.o_orderdate >= pd.Timestamp("1996-01-01"))
                 & (orders.o_orderdate < pd.Timestamp("1996-04-01"))]

    joined = broadcast_join(maxship, win,
                            left_on="l_orderkey", right_on="o_orderkey")

    def flt(b: pd.DataFrame) -> pd.DataFrame:
        return b[b.max_ship > b.o_orderdate][["o_orderpriority"]]

    agg = groupby_agg(joined.map_batches(flt, batch_format="pandas"),
                      ["o_orderpriority"],
                      [("o_orderpriority", "count", "order_count")])
    df = agg.to_pandas()
    df["order_count"] = df["order_count"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q7: two-nation volume shipping (multi-dimension star join)
# ---------------------------------------------------------------------------


def q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """Revenue flow between NATION_12 suppliers and NATION_13 customers
    (both directions) by ship year, 1996-1997.

    Plan: supplier→nation and orders→customer-nation are prebuilt
    driver-side dimension maps (broadcast once); the fact table streams
    through a single map_batches that resolves both nations, applies
    the pair filter, and emits combiner partials keyed by
    (supp_nation, cust_nation, year)."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"])
    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).merge(
        nation, left_on="s_nationkey", right_on="n_nationkey"
    )[["s_suppkey", "n_name"]].rename(columns={"n_name": "supp_nation"})
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "n_name"]].rename(columns={"n_name": "cust_nation"})
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"]).merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )[["o_orderkey", "cust_nation"]]
    # prune the broadcast dims to the two nations of interest — the
    # probe side then carries only keys that can survive the filter
    sup = sup[sup.supp_nation.isin(["NATION_12", "NATION_13"])]
    orders = orders[orders.cust_nation.isin(["NATION_12", "NATION_13"])]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])
    j = broadcast_join(li, sup, left_on="l_suppkey", right_on="s_suppkey")
    j = broadcast_join(j, orders, left_on="l_orderkey", right_on="o_orderkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b.l_shipdate >= pd.Timestamp("1996-01-01"))
            & (b.l_shipdate < pd.Timestamp("1998-01-01"))
            & (
                ((b.supp_nation == "NATION_12") & (b.cust_nation == "NATION_13"))
                | ((b.supp_nation == "NATION_13") & (b.cust_nation == "NATION_12"))
            )
        )
        b = b[m]
        return pd.DataFrame({
            "supp_nation": b.supp_nation,
            "cust_nation": b.cust_nation,
            "l_year": b.l_shipdate.dt.year.astype("int64"),
            "volume": b.l_extendedprice * (1 - b.l_discount),
        })

    agg = groupby_agg(j.map_batches(prep, batch_format="pandas"),
                      ["supp_nation", "cust_nation", "l_year"],
                      [("volume", "sum", "revenue")])
    df = agg.to_pandas()
    if df.empty:  # all-empty Datasets lose their schema on to_pandas
        df = pd.DataFrame({"supp_nation": pd.Series(dtype="object"),
                           "cust_nation": pd.Series(dtype="object"),
                           "l_year": pd.Series(dtype="int64"),
                           "revenue": pd.Series(dtype="float64")})
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(
        drop=True
    )


# ---------------------------------------------------------------------------
# Q8: market share of one supplier nation inside a region
# ---------------------------------------------------------------------------


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """NATION_12's share of PROMO-part revenue delivered to ASIA
    customers, by order year.  Conditional aggregate over the same
    single fact pass: both the numerator (CASE WHEN supp_nation =
    'NATION_12') and denominator are sums emitted by one combiner."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _pq(sf_dir, "region")
    asia = region[region.r_name == "ASIA"].merge(
        nation, left_on="r_regionkey", right_on="n_regionkey")
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust[cust.c_nationkey.isin(asia.n_nationkey)]
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    orders = orders[(orders.o_orderdate >= pd.Timestamp("1996-01-01"))
                    & (orders.o_orderdate < pd.Timestamp("1998-01-01"))]
    orders = orders.assign(o_year=orders.o_orderdate.dt.year.astype("int64"))[
        ["o_orderkey", "o_year"]]

    part = _pq(sf_dir, "part", ["p_partkey", "p_type"])
    promo = part[part.p_type == "PROMO"][["p_partkey"]]

    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).merge(
        nation, left_on="s_nationkey", right_on="n_nationkey"
    )[["s_suppkey", "n_name"]].rename(columns={"n_name": "supp_nation"})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    j = broadcast_join(li, promo, left_on="l_partkey", right_on="p_partkey")
    j = broadcast_join(j, orders, left_on="l_orderkey", right_on="o_orderkey")
    j = broadcast_join(j, sup, left_on="l_suppkey", right_on="s_suppkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        vol = b.l_extendedprice * (1 - b.l_discount)
        return pd.DataFrame({
            "o_year": b.o_year,
            "nat": np.where(b.supp_nation == "NATION_12", vol, 0.0),
            "vol": vol,
        })

    agg = groupby_agg(j.map_batches(prep, batch_format="pandas"),
                      ["o_year"],
                      [("nat", "sum", "nat_volume"),
                       ("vol", "sum", "total_volume")])
    df = agg.to_pandas()
    df["mkt_share"] = hround(df["nat_volume"] / df["total_volume"], 4)
    df = df.drop(columns=["nat_volume"])
    df["total_volume"] = df["total_volume"].round(2)
    return df.sort_values("o_year").reset_index(drop=True)[
        ["o_year", "mkt_share", "total_volume"]]


# ---------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """Profit (ext*(1-disc)) on parts whose name contains 'red', by
    supplier nation and order year.  Same one-pass star shape as q8;
    the p_name LIKE filter prunes the broadcast part dim BEFORE the
    fact pass, so non-matching lineitems never merge."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"])
    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).merge(
        nation, left_on="s_nationkey", right_on="n_nationkey"
    )[["s_suppkey", "n_name"]].rename(columns={"n_name": "nation"})
    part = _pq(sf_dir, "part", ["p_partkey", "p_name"])
    red = part[part.p_name.str.contains("red", regex=False)][["p_partkey"]]
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    orders = orders.assign(o_year=orders.o_orderdate.dt.year.astype("int64"))[
        ["o_orderkey", "o_year"]]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    j = broadcast_join(li, red, left_on="l_partkey", right_on="p_partkey")
    j = broadcast_join(j, sup, left_on="l_suppkey", right_on="s_suppkey")
    j = broadcast_join(j, orders, left_on="l_orderkey", right_on="o_orderkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": b.nation,
            "o_year": b.o_year,
            "amount": b.l_extendedprice * (1 - b.l_discount),
        })

    agg = groupby_agg(j.map_batches(prep, batch_format="pandas"),
                      ["nation", "o_year"],
                      [("amount", "sum", "sum_profit")])
    df = agg.to_pandas()
    df["sum_profit"] = df["sum_profit"].round(2)
    return df.sort_values(["nation", "o_year"],
                          ascending=[True, False]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q10: returned-item reporting (top 20 customers)
# ---------------------------------------------------------------------------


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """Revenue lost to returns (l_returnflag='R') for orders placed in
    1996Q4, per customer, top 20.  Fact pass emits combiner partials
    per order key; the per-customer rollup and customer/nation detail
    join happen on the already-tiny aggregate."""
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    win = orders[(orders.o_orderdate >= pd.Timestamp("1996-10-01"))
                 & (orders.o_orderdate < pd.Timestamp("1997-01-01"))][
        ["o_orderkey", "o_custkey"]]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag",
                             "l_extendedprice", "l_discount"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.l_returnflag == "R"]
        return pd.DataFrame({
            "l_orderkey": b.l_orderkey,
            "rev": b.l_extendedprice * (1 - b.l_discount),
        })

    j = broadcast_join(li.map_batches(prep, batch_format="pandas"), win,
                       left_on="l_orderkey", right_on="o_orderkey")
    agg = groupby_agg(j, ["o_custkey"], [("rev", "sum", "revenue")])

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "c_name", "c_acctbal", "n_name"]]

    j2 = broadcast_join(agg, cust, left_on="o_custkey", right_on="c_custkey")
    df = topk(j2, ["revenue", "c_custkey"], 20,
              descending=[True, False]).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["c_acctbal"] = hround(df["c_acctbal"], 2)
    return df[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


# ---------------------------------------------------------------------------
# Q11: supplier revenue concentration (global-scalar HAVING)
# ---------------------------------------------------------------------------


def q11_supplier_concentration(sf_dir: str) -> pd.DataFrame:
    """Suppliers whose lineitem revenue exceeds 1.05× the mean supplier
    share.  The per-supplier aggregate is the only fact-table exchange;
    the global scalar is the SUM of that aggregate's own rows (tiny),
    never a second fact pass — the TPC-H Q11 nested-query shape made
    algebraic."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": b.l_suppkey,
            "rev": b.l_extendedprice * (1 - b.l_discount),
        })

    per_supp = groupby_agg(li.map_batches(prep, batch_format="pandas"),
                           ["l_suppkey"], [("rev", "sum", "value")]).to_pandas()
    total = float(per_supp["value"].sum())
    # scale-free threshold: 1.05× the mean supplier share (the synthetic
    # data is near-uniform per supplier — max/mean is only ~1.1), so the query
    # selects genuinely-concentrated suppliers at every scale factor
    # (a fixed fraction goes empty as the supplier count grows)
    out = per_supp[per_supp["value"] > total * 1.05 / len(per_supp)].copy()
    out["value"] = out["value"].round(2)
    return out.sort_values(["value", "l_suppkey"],
                           ascending=[False, True]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (two-level aggregate)
# ---------------------------------------------------------------------------


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """Histogram of customers by how many non-'4-NOT SPECIFIED' orders
    they placed — the LEFT JOIN ... GROUP BY c_custkey / GROUP BY
    c_count two-level shape.  Level 1 exchanges one row per customer
    (combiner-fed); level 2's input is already tiny.  Customers with
    zero qualifying orders are the anti-set: total customers minus
    distinct customers seen, no join needed."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b.o_orderpriority != "4-NOT SPECIFIED"][["o_custkey"]]

    per_cust = groupby_agg(orders.map_batches(prep, batch_format="pandas"),
                           ["o_custkey"],
                           [("o_custkey", "count", "c_count")]).to_pandas()
    n_customers = len(_pq(sf_dir, "customer", ["c_custkey"]))

    hist = per_cust.groupby("c_count").size().reset_index(name="custdist")
    zero = n_customers - len(per_cust)
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    hist["c_count"] = hist["c_count"].astype("int64")
    hist["custdist"] = hist["custdist"].astype("int64")
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q15: top supplier by windowed revenue (scalar max subquery)
# ---------------------------------------------------------------------------


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Supplier with the highest revenue over 1996H1 (deterministic
    min-suppkey tie-break).  One combiner-fed per-supplier aggregate;
    the scalar max and the final row selection run on its tiny
    output."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b.l_shipdate >= pd.Timestamp("1996-01-01"))
             & (b.l_shipdate < pd.Timestamp("1996-07-01")))
        b = b[m]
        return pd.DataFrame({
            "l_suppkey": b.l_suppkey,
            "rev": b.l_extendedprice * (1 - b.l_discount),
        })

    per_supp = groupby_agg(li.map_batches(prep, batch_format="pandas"),
                           ["l_suppkey"],
                           [("rev", "sum", "total_revenue")]).to_pandas()
    per_supp["total_revenue"] = per_supp["total_revenue"].round(2)
    top = per_supp.sort_values(["total_revenue", "l_suppkey"],
                               ascending=[False, True]).head(1)
    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = top.merge(sup, left_on="l_suppkey", right_on="s_suppkey")[
        ["s_suppkey", "s_name", "total_revenue"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated avg as broadcast map)
# ---------------------------------------------------------------------------


def q17_small_quantity(sf_dir: str) -> pd.DataFrame:
    """Average yearly revenue lost if Brand#23 orders below 20% of that
    part's mean quantity were not filled.  The correlated scalar
    subquery (0.2 * avg(l_quantity) per part) becomes a per-part
    (sum, count) combiner aggregate over ONLY the brand's partkeys
    (pruned via broadcast set before any work), broadcast back as a
    threshold map for the second filtered pass."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand"])
    keys = part[part.p_brand == "Brand#23"][["p_partkey"]]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"])
    brand_li = broadcast_join(li, keys, left_on="l_partkey",
                              right_on="p_partkey")
    stats = groupby_agg(brand_li, ["l_partkey"],
                        [("l_quantity", "mean", "avg_qty")]).to_pandas()
    thresh = dict(zip(stats.l_partkey, 0.2 * stats.avg_qty))

    def flt(b: pd.DataFrame) -> pd.DataFrame:
        t = b.l_partkey.map(thresh)
        return pd.DataFrame({"x": b.l_extendedprice[b.l_quantity < t]})

    total = brand_li.map_batches(flt, batch_format="pandas").sum("x")
    total = 0.0 if total is None else float(total)
    return pd.DataFrame({"avg_yearly": [round(total / 7.0, 2)]})


# ---------------------------------------------------------------------------
# Q18: large-volume orders (grouped HAVING over the fact table)
# ---------------------------------------------------------------------------


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """Orders whose total quantity exceeds 150, with customer detail,
    top 10 by total price.  The per-order quantity sum is the one
    exchange; HAVING filters its tiny output before any dimension
    join."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    per_order = groupby_agg(li, ["l_orderkey"],
                            [("l_quantity", "sum", "sum_qty")]).to_pandas()
    big = per_order[per_order.sum_qty > 150]

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    out = (big.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
              .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(10)
    out["o_totalprice"] = hround(out["o_totalprice"], 2)
    out["sum_qty"] = hround(out["sum_qty"], 2)
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-conjunctions pushdown)
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue under three OR'd (brand, size-range, quantity-range)
    predicate groups.  The part dim is pre-pruned to rows that can
    satisfy ANY branch, broadcast, and the disjunction evaluates
    vectorized per batch — one fact pass, no shuffle at all."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    cand = part[
        ((part.p_brand == "Brand#12") & part.p_size.between(1, 10))
        | ((part.p_brand == "Brand#23") & part.p_size.between(1, 15))
        | ((part.p_brand == "Brand#34") & part.p_size.between(1, 20))
    ]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice", "l_discount"])
    j = broadcast_join(li, cand, left_on="l_partkey", right_on="p_partkey")

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            ((b.p_brand == "Brand#12") & b.p_size.between(1, 10)
             & b.l_quantity.between(1, 20))
            | ((b.p_brand == "Brand#23") & b.p_size.between(1, 15)
               & b.l_quantity.between(10, 30))
            | ((b.p_brand == "Brand#34") & b.p_size.between(1, 20)
               & b.l_quantity.between(20, 40))
        )
        b = b[m]
        return pd.DataFrame({"rev": b.l_extendedprice * (1 - b.l_discount)})

    total = j.map_batches(prep, batch_format="pandas").sum("rev")
    total = 0.0 if total is None else float(total)
    return pd.DataFrame({"revenue": [round(total, 2)]})


# ---------------------------------------------------------------------------
# Q21: sole-supplier multi-line orders (self-grouped anti semantics)
# ---------------------------------------------------------------------------


def q21_sole_supplier(sf_dir: str) -> pd.DataFrame:
    """Suppliers who were the ONLY supplier on multi-line orders, with
    how many such orders — TPC-H Q21's EXISTS(other lineitem)/NOT
    EXISTS(other supplier) pair folded into one per-order aggregate:
    count(*) ≥ 2 AND min(suppkey) == max(suppkey).  No self-join ever
    materializes; the per-order reduction is the single exchange."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    per_order = groupby_agg(
        li, ["l_orderkey"],
        [("l_suppkey", "count", "n_lines"),
         ("l_suppkey", "min", "mn"),
         ("l_suppkey", "max", "mx")])
    # the per-ORDER aggregate is fact-table-keyed (billions of rows at
    # scale) — filter sole orders and recount per supplier DISTRIBUTED
    # (per-batch filter + one more pre-combined groupby); the driver
    # only ever sees the supplier-sized count table
    sole = per_order.map_batches(
        lambda b: b.loc[(b.n_lines >= 2) & (b.mn == b.mx), ["mn"]],
        batch_format="pandas")
    counts = groupby_agg(
        sole, ["mn"], [("mn", "count", "numwait")]).to_pandas()
    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = counts.merge(sup, left_on="mn", right_on="s_suppkey")
    out["numwait"] = out["numwait"].astype("int64")
    out = out.sort_values(["numwait", "s_suppkey"],
                          ascending=[False, True]).head(10)
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q22: idle high-balance customers (scalar avg + anti join)
# ---------------------------------------------------------------------------


def q22_idle_customers(sf_dir: str) -> pd.DataFrame:
    """Customers with above-average positive balances and no order
    since 1999, grouped by nation: the global scalar (avg of positive
    balances) is
    one tiny aggregate broadcast into the filter; the NOT EXISTS is the
    engine's broadcast anti filter against the distinct order-customer
    key set."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])
    # scalar: avg positive balance via one (sum, count) partial pass
    stats = groupby_agg(
        cust.map_batches(
            lambda b: pd.DataFrame(
                {"one": np.zeros(1, dtype=np.int64),
                 "s": [b.c_acctbal[b.c_acctbal > 0.0].sum()],
                 "c": [int((b.c_acctbal > 0.0).sum())]}),
            batch_format="pandas"),
        ["one"], [("s", "sum", "s"), ("c", "sum", "c")]).to_pandas()
    avg_bal = float(stats.s.iloc[0]) / float(stats.c.iloc[0])

    o = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    have = set(
        o[o.o_orderdate >= pd.Timestamp("1999-01-01")].o_custkey.unique())

    rich = cust.map_batches(
        lambda b: b[b.c_acctbal > avg_bal], batch_format="pandas")
    idle = semi_anti_filter(rich, "c_custkey", have, anti=True)
    agg = groupby_agg(idle, ["c_nationkey"],
                      [("c_acctbal", "count", "numcust"),
                       ("c_acctbal", "sum", "totacctbal")])
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({"c_nationkey": pd.Series(dtype="int64"),
                             "numcust": pd.Series(dtype="int64"),
                             "totacctbal": pd.Series(dtype="float64")})
    df["numcust"] = df["numcust"].astype("int64")
    df["totacctbal"] = df["totacctbal"].round(2)
    return df.sort_values("c_nationkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part (correlated-min subquery shape)
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """For every STANDARD part, the supplier(s) quoting the minimum
    observed price — the TPC-H Q2 correlated-min shape with lineitem
    standing in for partsupp (supply cost := min l_extendedprice ever
    charged by that supplier for that part; comparisons only, no float
    arithmetic, so the Ray and SQL answers are bit-identical).

    Plan: one combiner-shaped exchange builds the (part, supplier)
    price book; the correlated ``cost = (SELECT min ...)`` collapses to
    a per-part min broadcast back over the book (two tiny aggregates,
    never a per-row probe).  The part filter rides as a broadcast
    key set so only qualifying parts' pairs ever leave the fact scan."""
    from ..functions.relational import distinct_on  # noqa: F401 (doc)

    part = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_type"])
    std = part[part.p_type == "STANDARD"]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    pairs = semi_anti_filter(li, "l_partkey", set(std.p_partkey))
    book = groupby_agg(pairs, ["l_partkey", "l_suppkey"],
                       [("l_extendedprice", "min", "cost")])
    pmin = groupby_agg(book, ["l_partkey"], [("cost", "min", "min_cost")])
    best = broadcast_join(book, pmin.to_pandas(),
                          left_on="l_partkey", right_on="l_partkey")
    winners = best.map_batches(
        lambda b: b[b.cost == b.min_cost][["l_partkey", "l_suppkey",
                                           "min_cost"]],
        batch_format="pandas").to_pandas()

    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = (winners
           .merge(std[["p_partkey", "p_name"]],
                  left_on="l_partkey", right_on="p_partkey")
           .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    out = out[["p_partkey", "p_name", "s_name", "min_cost"]]
    return (out.sort_values(["min_cost", "p_partkey", "s_name"],
                            ascending=[False, True, True])
            .head(100).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Q12: lateness by line class (join + conditional counts per class)
# ---------------------------------------------------------------------------


def q12_priority_lateness(sf_dir: str) -> pd.DataFrame:
    """1996 lineitems shipped more than 90 days after their order date,
    split per return flag into lines belonging to critical
    (1-URGENT/2-HIGH) vs other orders — the TPC-H Q12 shape with
    l_returnflag standing in for shipmode and ship-lag for the
    commit/receipt comparison.  Counts only: hash-exact by
    construction.

    Plan: the orders side is three thin columns (broadcast; at true
    100 TB swap for hash_join on l_orderkey), the lateness predicate
    and the priority CASE both evaluate vectorized per batch, and the
    per-flag counts are combiner partials into a 3-row exchange."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def in_1996(b: pd.DataFrame) -> pd.DataFrame:
        return b[(b.l_shipdate >= pd.Timestamp("1996-01-01"))
                 & (b.l_shipdate < pd.Timestamp("1997-01-01"))]

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = broadcast_join(li.map_batches(in_1996, batch_format="pandas"),
                            orders, left_on="l_orderkey",
                            right_on="o_orderkey")

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        late = b[b.l_shipdate > b.o_orderdate + pd.Timedelta(days=90)]
        hi = late.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
        return pd.DataFrame({
            "l_returnflag": late.l_returnflag,
            "high_line": hi.astype("int64"),
            "low_line": (~hi).astype("int64"),
        })

    agg = groupby_agg(joined.map_batches(classify, batch_format="pandas"),
                      ["l_returnflag"],
                      [("high_line", "sum", "high_line_count"),
                       ("low_line", "sum", "low_line_count")])
    df = agg.to_pandas()
    df["high_line_count"] = df["high_line_count"].astype("int64")
    df["low_line_count"] = df["low_line_count"].astype("int64")
    return df.sort_values("l_returnflag").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q16: supplier-count distribution with a NOT-IN blacklist
# ---------------------------------------------------------------------------


def q16_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """How many distinct suppliers ship each surviving part descriptor
    (brand, type, size), excluding one brand, one type, an eight-value
    size whitelist, and every supplier in arrears (s_acctbal < 0) —
    the TPC-H Q16 NOT-IN + count(DISTINCT) shape with the negative
    balance standing in for the complaints LIKE.

    Plan: blacklist and part descriptors both broadcast; the distinct
    collapses (descriptor, supplier) pairs with a hash-partition
    keep-first BEFORE the count, so the wide exchange carries at most
    one row per pair (the combiner shape for COUNT DISTINCT)."""
    from ..functions.relational import distinct_on

    part = _pq(sf_dir, "part",
               ["p_partkey", "p_brand", "p_type", "p_size"])
    keep = part[(part.p_brand != "Brand#4") & (part.p_type != "PROMO")
                & part.p_size.isin([1, 5, 9, 13, 17, 21, 25, 29])]

    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    blacklist = set(supp[supp.s_acctbal < 0.0].s_suppkey)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    ok = semi_anti_filter(li, "l_suppkey", blacklist, anti=True)
    joined = broadcast_join(ok, keep, left_on="l_partkey",
                            right_on="p_partkey")
    pairs = distinct_on(
        joined.map_batches(
            lambda b: b[["p_brand", "p_type", "p_size", "l_suppkey"]],
            batch_format="pandas"),
        ["p_brand", "p_type", "p_size", "l_suppkey"])
    agg = groupby_agg(pairs, ["p_brand", "p_type", "p_size"],
                      [("l_suppkey", "count", "supplier_cnt")])
    df = agg.to_pandas()
    df["supplier_cnt"] = df["supplier_cnt"].astype("int64")
    return (df.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Q20: nested-aggregate comparison + semi join (excess-volume suppliers)
# ---------------------------------------------------------------------------


def q20_part_specialists(sf_dir: str) -> pd.DataFrame:
    """Suppliers who shipped more than half — but not all — of their
    all-time volume of some 'small …' part during 1996: the TPC-H Q20
    correlated half-of-shipped-quantity comparison with the
    per-(part, supplier) all-time total standing in for availqty (the
    not-all leg keeps the predicate discriminating — 72 of 100
    suppliers at sf0.01 — instead of trivially matching every
    single-shipment pair).  The comparison runs as ``2*qty_1996 >
    qty_total AND qty_1996 < qty_total`` on integer-valued quantity
    sums, so both engines agree bit-exactly.

    Plan: the 'small' part key set broadcasts into the fact scan; both
    the windowed and the all-time quantity land in ONE combiner pass
    (a conditional column, not a second scan); the qualifying supplier
    key set is tiny and semi-joins the supplier dimension driver-side."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_name"])
    small = set(part[part.p_name.str.startswith("small ")].p_partkey)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity",
                             "l_shipdate"])
    hits = semi_anti_filter(li, "l_partkey", small)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        in96 = ((b.l_shipdate >= pd.Timestamp("1996-01-01"))
                & (b.l_shipdate < pd.Timestamp("1997-01-01")))
        return pd.DataFrame({
            "l_partkey": b.l_partkey,
            "l_suppkey": b.l_suppkey,
            "qty_1996": b.l_quantity.where(in96, 0.0),
            "qty_total": b.l_quantity,
        })

    per = groupby_agg(hits.map_batches(prep, batch_format="pandas"),
                      ["l_partkey", "l_suppkey"],
                      [("qty_1996", "sum", "qty_1996"),
                       ("qty_total", "sum", "qty_total")]).to_pandas()
    winners = set(per[(2.0 * per.qty_1996 > per.qty_total)
                      & (per.qty_1996 < per.qty_total)].l_suppkey)

    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"])
    out = (supp[supp.s_suppkey.isin(winners)]
           .merge(nation, left_on="s_nationkey", right_on="n_nationkey"))
    return (out[["s_name", "n_name"]]
            .sort_values("s_name").reset_index(drop=True))


DSS_ORACLE_SQL: dict[str, str] = {
    "q2_min_cost_supplier": """
        WITH book AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_type = 'STANDARD')
            GROUP BY l_partkey, l_suppkey
        )
        SELECT p_partkey, p_name, s_name, cost AS min_cost
        FROM book
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE cost = (SELECT min(b2.cost) FROM book b2
                      WHERE b2.l_partkey = book.l_partkey)
        ORDER BY min_cost DESC, p_partkey, s_name
        LIMIT 100
    """,
    "q12_priority_lateness": """
        SELECT l_returnflag,
               -- CAST: DuckDB sum(BIGINT) -> HUGEINT -> pandas float64
               -- breaks the driver hash on identical values.
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q16_supplier_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#4'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_part_specialists": """
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small %')
            GROUP BY l_partkey, l_suppkey
            HAVING 2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                                 AND l_shipdate < TIMESTAMP '1997-01-01'
                                THEN l_quantity ELSE 0 END)
                   > sum(l_quantity)
               AND sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                             AND l_shipdate < TIMESTAMP '1997-01-01'
                            THEN l_quantity ELSE 0 END)
                   < sum(l_quantity)
        )
        ORDER BY s_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q7_nation_volume": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_13')
                OR (sn.n_name = 'NATION_13' AND cn.n_name = 'NATION_12'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT o_year,
               floor(sum(nat) / sum(vol) * 10000 + 0.5) / 10000
                   AS mkt_share,
               round(sum(vol), 2) AS total_volume
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS vol,
                   CASE WHEN sn.n_name = 'NATION_12'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END AS nat
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN region ON r_regionkey = cn.n_regionkey
            WHERE r_name = 'ASIA'
              AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               floor(c_acctbal * 100 + 0.5) / 100 AS c_acctbal,
               n_name
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q11_supplier_concentration": """
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
        FROM lineitem
        GROUP BY l_suppkey
        HAVING sum(l_extendedprice * (1 - l_discount)) >
               (SELECT sum(l_extendedprice * (1 - l_discount)) * 1.05
                       / count(DISTINCT l_suppkey)
                FROM lineitem)
        ORDER BY value DESC, l_suppkey
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-07-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        ORDER BY total_revenue DESC, s_suppkey
        LIMIT 1
    """,
    "q17_small_quantity": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = p_partkey)
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
               floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(l_quantity) > 150
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "q19_disjunctive_revenue": """
        SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)),
                              0.0), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 20 AND 40)
    """,
    "q21_sole_supplier": """
        WITH per_order AS (
            SELECT l_orderkey, count(*) AS n_lines,
                   min(l_suppkey) AS mn, max(l_suppkey) AS mx
            FROM lineitem
            GROUP BY l_orderkey
        )
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM per_order JOIN supplier ON s_suppkey = mn
        WHERE n_lines >= 2 AND mn = mx
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey
        LIMIT 10
    """,
    "q22_idle_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
}
