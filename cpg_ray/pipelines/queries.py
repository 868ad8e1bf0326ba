"""The query layer: one callable per operator family from SURVEY.md §2,
each over the driver's testdata tables (sf_dir) and — where
SQL-expressible — paired with a DuckDB oracle in ORACLE_SQL.

Conventions (driver contract):
- every callable takes ``sf_dir`` and returns a pandas DataFrame;
- computed/aggregate column names match the oracle SQL exactly
  (the driver sorts columns by name and hashes values);
- float aggregates are rounded identically on both sides;
- deterministic tie-breaks everywhere a LIMIT / top-k could tie
  (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..functions.relational import (
    broadcast_join,
    groupby_agg,
    grouped_topk,
    hash_join,
    read_table,
    semi_anti_filter,
    topk,
)


def hround(x, d: int = 2):
    """Half-away rounding as the explicit IEEE expression
    ``floor(x*10^d + 0.5)/10^d`` — the oracle SQL uses the same literal
    formula, so both engines run identical double ops on identical
    inputs.  (pandas .round is half-even, DuckDB round() is half-away;
    the testdata contains exact midpoints like 60802.925 where they
    disagree.)  Positive inputs only."""
    f = 10.0 ** d
    return np.floor(np.asarray(x, dtype=np.float64) * f + 0.5) / f


def _pq(sf_dir: str, name: str, columns=None) -> pd.DataFrame:
    """Driver-side read of a SMALL table (dimension side of broadcast
    joins)."""
    return pq.read_table(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    ).to_pandas()


# ---------------------------------------------------------------------------
# Aggregations (A1-A5 analog): pre-combined groupby
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filter + wide grouped aggregate with pre-combine."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.l_shipdate <= pd.Timestamp("2000-01-01")]
        b = b.assign(
            disc_price=b.l_extendedprice * (1 - b.l_discount),
            charge=b.l_extendedprice * (1 - b.l_discount) * (1 + b.l_tax),
        )
        return b

    agg = groupby_agg(
        ds.map_batches(prep, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("charge", "sum", "sum_charge"),
            ("l_quantity", "mean", "avg_qty"),
            ("l_extendedprice", "mean", "avg_price"),
            ("l_discount", "mean", "avg_disc"),
            ("l_quantity", "count", "count_order"),
        ],
    )
    df = agg.to_pandas().sort_values(["l_returnflag", "l_linestatus"])
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
              "avg_qty", "avg_price", "avg_disc"]:
        df[c] = df[c].round(2)
    return df.reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: tight filter + single global aggregate."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b.l_shipdate >= pd.Timestamp("1996-01-01"))
            & (b.l_shipdate < pd.Timestamp("1997-01-01"))
            & (b.l_discount >= 0.05)
            & (b.l_discount <= 0.07)
            & (b.l_quantity < 24)
        )
        b = b[m]
        return pd.DataFrame({"rev": b.l_extendedprice * b.l_discount, "one": 1})

    part = ds.map_batches(prep, batch_format="pandas")
    total = part.sum("rev")
    return pd.DataFrame({"revenue": [round(float(total), 2)]})


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (streaming analog, SURVEY.md §2.11):
    window key = hour bucket column; order is data, not stream order."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(hour=b.ts.dt.floor("h"))

    agg = groupby_agg(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "hour"],
        [("value", "sum", "sum_value"), ("value", "count", "n_events")],
    )
    df = agg.to_pandas()
    df["sum_value"] = df["sum_value"].round(4)
    return df.sort_values(["event_type", "hour"]).reset_index(drop=True)


def q_top_users(sf_dir: str) -> pd.DataFrame:
    """Grouped sum + global top-k with explicit tie-break (O2/O3)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])
    agg = groupby_agg(ds, ["user_id"], [("value", "sum", "total_value"),
                                        ("value", "count", "n_events")])
    df = topk(agg, ["total_value", "user_id"], 20,
              descending=[True, False]).to_pandas()
    df["total_value"] = df["total_value"].round(4)
    return df


# ---------------------------------------------------------------------------
# Joins (J1-J11 analog)
# ---------------------------------------------------------------------------


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """Broadcast-join chain (small sides broadcast once) + grouped sum +
    top-k."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust[cust.c_mktsegment == "BUILDING"][["c_custkey"]]
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders[orders.o_orderdate < pd.Timestamp("1998-01-01")]
    side = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")[
        ["o_orderkey", "o_orderdate"]
    ]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(rev=b.l_extendedprice * (1 - b.l_discount))[
            ["l_orderkey", "rev"]
        ]

    joined = broadcast_join(
        li.map_batches(rev, batch_format="pandas"),
        side, left_on="l_orderkey", right_on="o_orderkey",
    )
    agg = groupby_agg(joined, ["o_orderkey", "o_orderdate"],
                      [("rev", "sum", "revenue")])
    df = topk(agg, ["revenue", "o_orderkey"], 10,
              descending=[True, False]).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df[["o_orderkey", "o_orderdate", "revenue"]]


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """Star-join via one prebuilt broadcast dimension (region⋈nation⋈
    customer⋈orders driver-side smalls) against the big fact table."""
    region = _pq(sf_dir, "region")
    nation = _pq(sf_dir, "nation")
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    dim = (
        region[region.r_name == "ASIA"]
        .merge(nation, left_on="r_regionkey", right_on="n_regionkey")
        .merge(cust, left_on="n_nationkey", right_on="c_nationkey")
        .merge(orders, left_on="c_custkey", right_on="o_custkey")
    )[["o_orderkey", "n_name"]]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(rev=b.l_extendedprice * (1 - b.l_discount))[
            ["l_orderkey", "rev"]
        ]

    joined = broadcast_join(
        li.map_batches(rev, batch_format="pandas"),
        dim, left_on="l_orderkey", right_on="o_orderkey",
    )
    df = groupby_agg(joined, ["n_name"], [("rev", "sum", "revenue")]).to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values("revenue", ascending=False).reset_index(drop=True)


def q_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """Join + aggregate with AGGREGATE PUSHDOWN below the join: orders
    pre-aggregate to one partial (sum, count) per customer key BEFORE
    the hash-partitioned Dataset.join, so the exchange moves one row
    per customer instead of one per order — at 100 TB the difference
    between shuffling the fact table and shuffling its key space.  The
    final per-segment merge re-aggregates the joined partials (sums of
    sums — algebraic, exact)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    # combiner-ONLY partials: the join doesn't need fully-merged keys
    # (several partial rows per customer join identically and the final
    # per-segment aggregate re-merges them), so no exchange happens
    # before the join at all — one row per (customer, batch) moves
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", sort=False)["o_totalprice"]
        return pd.DataFrame(
            {"rev": g.sum(), "n": g.size()}
        ).reset_index()

    per_cust = orders.map_batches(partial, batch_format="pandas")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(per_cust, cust, on="o_custkey", right_on="c_custkey",
                       num_partitions=8)
    agg = groupby_agg(joined, ["c_mktsegment"],
                      [("rev", "sum", "total_revenue"),
                       ("n", "sum", "n_orders")])
    df = agg.to_pandas()
    df["total_revenue"] = df["total_revenue"].round(2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df.sort_values("c_mktsegment").reset_index(drop=True)


def q_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set (D4 analog): customers with no
    order after 2000-01-01."""
    o = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    have = set(o[o.o_orderdate >= pd.Timestamp("2000-01-01")].o_custkey.unique())
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    df = semi_anti_filter(cust, "c_custkey", have, anti=True).to_pandas()
    if df.empty:  # empty Datasets lose their schema on to_pandas
        df = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                           "c_name": pd.Series(dtype="object")})
    return df.sort_values("c_custkey").reset_index(drop=True)


def q_suppliers_with_shipments(sf_dir: str) -> pd.DataFrame:
    """Semi join: suppliers appearing in lineitem."""
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey"])
    have = set(li.unique("l_suppkey"))
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    df = semi_anti_filter(sup, "s_suppkey", have).to_pandas()
    return df.sort_values("s_suppkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Filters / sorts / limits / scalar functions (M*, F*, O*)
# ---------------------------------------------------------------------------


def q_filter_topk_orders(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderstatus",
                             "o_totalprice", "o_orderdate"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return b[(b.o_orderstatus == "O") & (b.o_totalprice > 100000)]

    df = topk(ds.map_batches(f, batch_format="pandas"),
              ["o_totalprice", "o_orderkey"], 15,
              descending=[True, False]).to_pandas()
    df["o_totalprice"] = hround(df["o_totalprice"], 2)
    return df[["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]]


def q_lineitem_expressions(sf_dir: str) -> pd.DataFrame:
    """Scalar-function family (F1-F5 analog): arithmetic, conditional,
    string concat — vectorized per batch."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount", "l_tax",
                             "l_returnflag", "l_linestatus"])

    def fx(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b.l_orderkey,
                "l_linenumber": b.l_linenumber,
                "charge": hround(
                    b.l_extendedprice * (1 - b.l_discount) * (1 + b.l_tax), 2
                ),
                "qty_class": np.where(b.l_quantity > 25, "H", "L"),
                "rl": b.l_returnflag + b.l_linestatus,
            }
        )

    return ds.map_batches(fx, batch_format="pandas").to_pandas()


def q_grouped_topk_parts(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "part",
                    columns=["p_brand", "p_partkey", "p_name", "p_retailprice"])
    df = grouped_topk(ds, ["p_brand"], "p_retailprice", 3,
                      descending=True, tie_break="p_partkey").to_pandas()
    df["p_retailprice"] = hround(df["p_retailprice"], 2)
    return df.sort_values(["p_brand", "p_retailprice", "p_partkey"],
                          ascending=[True, False, True]).reset_index(drop=True)


def q_part_type_stats(sf_dir: str) -> pd.DataFrame:
    """String-predicate filter (F3: LIKE / contains) + grouped stats."""
    ds = read_table(sf_dir, "part",
                    columns=["p_type", "p_brand", "p_retailprice", "p_size"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return b[b.p_type.str.contains("ARD", regex=False)]

    agg = groupby_agg(
        ds.map_batches(f, batch_format="pandas"), ["p_brand"],
        [("p_retailprice", "mean", "avg_price"),
         ("p_size", "max", "max_size"),
         ("p_type", "count", "n_parts")],
    )
    df = agg.to_pandas()
    df["avg_price"] = df["avg_price"].round(2)
    return df.sort_values("p_brand").reset_index(drop=True)


def q_region_nation_union(sf_dir: str) -> pd.DataFrame:
    """Dataset union (D2 analog: merging per-source node sets)."""
    import ray.data as rd

    r = read_table(sf_dir, "region", columns=["r_name"]).map_batches(
        lambda b: pd.DataFrame({"name": b.r_name, "kind": "region"}),
        batch_format="pandas",
    )
    n = read_table(sf_dir, "nation", columns=["n_name"]).map_batches(
        lambda b: pd.DataFrame({"name": b.n_name, "kind": "nation"}),
        batch_format="pandas",
    )
    df = r.union(n).to_pandas()
    return df.sort_values(["kind", "name"]).reset_index(drop=True)


def q_dedup_groups(sf_dir: str) -> pd.DataFrame:
    """Exact keep-first dedup shape (D1/A3): min doc per (lang, source)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    agg = groupby_agg(ds, ["lang", "source"],
                      [("doc_id", "min", "doc_id"),
                       ("doc_id", "count", "n_copies")])
    return agg.to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_doc_token_stats(sf_dir: str) -> pd.DataFrame:
    from ..functions.text import token_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    stats = ds.map_batches(token_stats, batch_format="pandas")
    agg = groupby_agg(stats, ["lang"],
                      [("token_count", "sum", "total_tokens"),
                       ("char_count", "mean", "avg_chars"),
                       ("doc_id", "count", "n_docs")])
    df = agg.to_pandas()
    df["avg_chars"] = df["avg_chars"].round(2)
    return df.sort_values("lang").reset_index(drop=True)


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    from ..functions.text import quality_score, token_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        ds.map_batches(token_stats, batch_format="pandas")
        .map_batches(quality_score, batch_format="pandas")
    )
    df = out.to_pandas()[["doc_id", "token_count", "punct_ratio", "upper_ratio"]]
    df["punct_ratio"] = hround(df["punct_ratio"], 4)
    df["upper_ratio"] = hround(df["upper_ratio"], 4)
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_gopher(sf_dir: str) -> pd.DataFrame:
    """Gopher-rules quality features + verdict per document."""
    from ..functions.text import gopher_quality

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = ds.map_batches(gopher_quality, batch_format="pandas").to_pandas()
    for c in ("mean_word_len", "symbol_ratio", "bullet_frac",
              "dup_line_frac"):
        df[c] = hround(df[c], 4)
    return df[["doc_id", "n_words", "mean_word_len", "symbol_ratio",
               "bullet_frac", "dup_line_frac", "gopher_pass"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_doc_langid(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic (rows-only check: no SQL equivalent)."""
    from ..functions.text import langid

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    df = ds.map_batches(langid, batch_format="pandas").to_pandas()
    return df[["doc_id", "lang", "pred_lang"]].sort_values("doc_id").reset_index(
        drop=True
    )


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprints (rows-only)."""
    from ..functions.text import fingerprint

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = ds.map_batches(fingerprint, batch_format="pandas").to_pandas()
    return df[["doc_id", "fingerprint"]].sort_values("doc_id").reset_index(drop=True)


def q_doc_top_tokens(sf_dir: str) -> pd.DataFrame:
    """flat_map fan-out (J7 asterisk-import expansion analog) with a
    per-batch COMBINER: documents explode to token rows, but each batch
    pre-counts its tokens so the shuffle moves one row per (token,
    batch), never one per token occurrence."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def explode_counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall("[a-z0-9_]+").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"tok": vc.index, "n": vc.values})

    agg = groupby_agg(
        ds.map_batches(explode_counts, batch_format="pandas"),
        ["tok"], [("n", "sum", "n")],
    )
    df = topk(agg, ["n", "tok"], 20, descending=[True, False]).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.reset_index(drop=True)


def q_doc_tfidf(sf_dir: str) -> pd.DataFrame:
    """Corpus TF-IDF, top-3 salient terms per document (two combiner
    passes + one broadcast idf table; the huge-vocab join path is
    pinned equivalent in test_functions)."""
    from ..functions.text import tfidf_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = tfidf_topk(docs, k=3).to_pandas()
    df["tf"] = df["tf"].astype("int64")
    return df.sort_values(
        ["doc_id", "tfidf", "tok"], ascending=[True, False, True]
    ).reset_index(drop=True)


def q_doc_bm25(sf_dir: str) -> pd.DataFrame:
    """Per-document top-3 BM25 terms (Robertson idf, Lucene +1 floor;
    avgdl from exact integer sums so the oracle's doubles are
    bit-identical)."""
    from ..functions.text import bm25_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = bm25_topk(docs, k=3).to_pandas()
    df["tf"] = df["tf"].astype("int64")
    return df.sort_values(
        ["doc_id", "bm25", "tok"], ascending=[True, False, True]
    ).reset_index(drop=True)

BM25_SEARCH_QUERIES = {
    "qa": "hash join order",
    "qb": "window sort merge",
    "qc": "spark stream batch",
}


def q_doc_bm25_search(sf_dir: str) -> pd.DataFrame:
    """BM25 retrieval: top-10 documents per query (text-side similarity
    search; ranking on the rounded score keeps the top-n sets identical
    across engines despite sum-order float noise)."""
    from ..functions.text import bm25_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = bm25_search(docs, BM25_SEARCH_QUERIES, top_n=10).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values(
        ["qid", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)[["qid", "doc_id", "score"]]


def q_doc_rerank(sf_dir: str) -> pd.DataFrame:
    """Retrieve-then-rerank: BM25 top-20 recall stage, md5-seam
    cross-encoder pair scoring (Σ_t w(q,t)·ln(1+tf) + w(q,d)), top-5
    per query — the two-stage architecture every production retrieval
    stack runs; the SQL oracle reproduces both stages bit-for-bit."""
    from ..functions.text import rerank_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = rerank_search(docs, BM25_SEARCH_QUERIES, k_retrieve=20, top_n=5)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.reset_index(drop=True)


def q_retrieval_eval(sf_dir: str) -> pd.DataFrame:
    """Retrieval-quality evaluation (TREC shape): MRR (lcm-scaled
    exact reciprocal), hits/precision/recall at 10 of the BM25 run
    against deterministic boolean-AND relevance judgments — the
    eval harness every retrieval stack needs, with every metric an
    exact integer so the SQL oracle hash-matches."""
    from ..functions.text import retrieval_eval

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return retrieval_eval(docs, BM25_SEARCH_QUERIES, top_n=10)


SPARSE_SEARCH_QUERIES = {"qa": "hash join", "qb": "window sort",
                         "qc": "stream batch"}


def q_doc_sparse_search(sf_dir: str) -> pd.DataFrame:
    """Learned-sparse retrieval (SPLADE scoring shape): md5-derived
    static term weights stand in for a learned model, query terms
    expand with their top-2 co-occurring corpus terms at 0.3 weight,
    score = Σ qw·w(t)·ln(1+tf) — top-10 docs per query, ranked on the
    rounded score with a doc-id tie-break."""
    from ..functions.sparse import sparse_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = sparse_search(docs, SPARSE_SEARCH_QUERIES, top_n=10).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values(
        ["qid", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)[["qid", "doc_id", "score"]]


def q_doc_maxsim(sf_dir: str) -> pd.DataFrame:
    """Late-interaction retrieval (ColBERT MaxSim scoring shape):
    every token carries an md5-derived integer vector (the learned-
    encoder seam), score(q, d) = Σ over query tokens of the best
    document-token dot product within the doc's first 32 token
    positions — exact int64 end to end, top-10 per query."""
    from ..functions.sparse import maxsim_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = maxsim_search(docs, SPARSE_SEARCH_QUERIES,
                       top_n=10, doc_prefix=32).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["score"] = df["score"].astype("int64")
    return df.sort_values(
        ["qid", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)[["qid", "doc_id", "score"]]


def q_doc_hybrid_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (integer-scaled
    1/(60+rank)) of the BM25 ranking and the learned-sparse (SPLADE
    shape) ranking for the same three query intents — the standard
    lexical × learned-sparse hybrid; fused score is an exact int64
    sum, top-10 per query."""
    from ..functions.sparse import rrf_fuse, sparse_search
    from ..functions.text import bm25_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bm = bm25_search(docs, BM25_SEARCH_QUERIES, top_n=10)
    sp = sparse_search(docs, SPARSE_SEARCH_QUERIES, top_n=10)
    df = rrf_fuse(bm, sp, top_n=10).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["rrf"] = df["rrf"].astype("int64")
    return df.sort_values(
        ["qid", "rrf", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)[["qid", "doc_id", "rrf"]]


def q_doc_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction over documents with deterministically injected
    PII (every 7th doc gains an email, a phone and an IPv4 — the
    synthetic corpus has none of its own, so the injection is what
    makes the scrub observable); counts on the original text,
    sequential typed-token replacement, byte-compared redacted text."""
    from ..functions.text import pii_scrub

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        extra = (" contact u" + ids.astype(str)
                 + "@example.com or 555-123-4567 at 192.168.1."
                 + (ids % 256).astype(str))
        b = b.copy()
        b["text"] = b["text"].where(ids % 7 != 0, b["text"] + extra)
        return b

    df = docs.map_batches(inject, batch_format="pandas").map_batches(
        pii_scrub, batch_format="pandas",
    ).to_pandas()
    return (df[["doc_id", "n_email", "n_phone", "n_ipv4", "redacted"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_doc_contamination(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: every 50th document plays the held-out
    evaluation set; the remaining corpus counts, per document, its
    distinct 8-grams that appear verbatim in the benchmark (broadcast
    gram set + one stateless map pass — no shuffle)."""
    import ray

    from ..functions.text import contamination_counts, word_ngram_set

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda b: b[b.doc_id % 50 == 0], batch_format="pandas"
    ).to_pandas()  # the eval set is tiny by definition (2% of docs)
    grams = frozenset().union(*(word_ngram_set(t, 8) for t in bench.text)) \
        if len(bench) else frozenset()
    train = docs.map_batches(
        lambda b: b[b.doc_id % 50 != 0], batch_format="pandas"
    )
    df = contamination_counts(train, ray.put(grams), n=8).to_pandas()
    df["n_contaminated"] = df["n_contaminated"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_join_kmv(sf_dir: str) -> pd.DataFrame:
    """Join-cardinality estimation by KMV θ-sketch SET ALGEBRA
    (Beyer et al. SIGMOD'07 / the DataSketches theta model): bottom-64
    md5 sketches of orders.o_custkey and customer.c_custkey merge into
    a union sketch; θ = its kth minimum; the intersection estimate is

        ρ = |common hashes < θ|,  est = ρ/k · (k−1)/θ_frac

    — the planner's ingredient for sizing a join WITHOUT scanning
    either side fully.  Deterministic md5 hashing → the same sketch on
    both engines; the output carries the exact integer sketch facts
    (ρ, k, the exact distinct counts for calibration) plus the floored
    milli estimate.

    Shape: one pre-combined bottom-k pass per table (per-batch bottom-k
    partials are associative), driver finish on 2×64 hashes."""
    import hashlib

    from ..functions.relational import distinct_on

    k = 64

    def sketch(table, col):
        ds = read_table(sf_dir, table, columns=[col])

        def bk(b: pd.DataFrame) -> pd.DataFrame:
            u = pd.unique(b[col])
            h = np.array([int(hashlib.md5(str(v).encode())
                              .hexdigest()[:8], 16) for v in u],
                         dtype=np.int64)
            h.sort()
            return pd.DataFrame({"h": h[:k]})

        parts = ds.map_batches(bk, batch_format="pandas").to_pandas()
        hs = np.unique(parts["h"].to_numpy("int64"))
        return hs[:k]

    def exact(table, col):
        ds = read_table(sf_dir, table, columns=[col])
        return int(distinct_on(ds, [col]).count())

    sa = sketch("orders", "o_custkey")
    sb = sketch("customer", "c_custkey")
    union = np.unique(np.concatenate([sa, sb]))[:k]
    theta = int(union[-1]) if len(union) >= k else (1 << 32)
    common = np.intersect1d(sa, sb)
    rho = int((common < theta).sum())
    ku = min(k, len(union))
    est_union = (ku - 1) / (theta / float(1 << 32)) \
        if theta and ku > 1 else 0.0
    est_inter_milli = int(np.floor(rho / k * est_union * 1000)) \
        if k else 0
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "rho": pd.Series([rho], dtype="int64"),
        "theta": pd.Series([theta], dtype="int64"),
        "est_inter_milli": pd.Series([est_inter_milli],
                                     dtype="int64"),
        "exact_orders_keys": pd.Series([exact("orders", "o_custkey")],
                                       dtype="int64"),
        "exact_customer_keys": pd.Series(
            [exact("customer", "c_custkey")], dtype="int64"),
    })


def q_doc_pipeline(sf_dir: str) -> pd.DataFrame:
    """The END-TO-END curation funnel — the composition this engine
    exists for, as ONE oracle-paired query: non-eval documents flow
    through Gopher quality → exact text dedup (keep-first by md5) →
    benchmark decontamination (8-gram broadcast set), with per-stage
    (docs, tokens) tallies — the funnel report every production
    curation run ships.  Every stage reuses the already-verified
    kernels; tallies are exact ints (tokens = \\S+ runs, the gopher
    token contract).

    Shape: one streamed pass per stage boundary, global count/sum
    aggregates only; the eval-gram set broadcasts once; the dedup
    winner table is one pre-combined exchange + a join."""
    import hashlib

    import ray

    from ..functions.relational import hash_join
    from ..functions.text import gopher_quality, word_ngram_set

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda b: b[b.doc_id % 50 == 0], batch_format="pandas"
    ).to_pandas()
    grams = frozenset().union(*(word_ngram_set(t, 8) for t in bench.text)) \
        if len(bench) else frozenset()
    gref = ray.put(grams)

    def enrich(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b.doc_id % 50 != 0]
        feats = gopher_quality(b)
        out = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy("int64"),
            "text": b["text"].values,
            "n_words": feats["n_words"].to_numpy("int64"),
            "gopher_pass": feats["gopher_pass"].to_numpy(bool),
            "key": [hashlib.md5(t.encode()).hexdigest()
                    for t in b["text"]],
        })
        return out

    base = docs.map_batches(enrich, batch_format="pandas") \
        .materialize()

    def tally(ds_, stage, name):
        # ONE pass per stage: per-batch (docs, tokens) partials summed
        # driver-side — not separate count() + sum() actions
        part = ds_.map_batches(
            lambda b: pd.DataFrame({"n": [len(b)],
                                    "tok": [int(b["n_words"].sum())]}),
            batch_format="pandas").to_pandas()
        return {"stage": stage, "stage_name": name,
                "docs": int(part["n"].sum()),
                "tokens": int(part["tok"].sum())}

    rows = [tally(base, 1, "input")]
    # vectorized mask filters — Dataset.filter(row_lambda) is the
    # per-row slow path (measured 10.2 s -> ~3 s for the funnel)
    g = base.map_batches(lambda b: b[b["gopher_pass"]],
                         batch_format="pandas").materialize()
    rows.append(tally(g, 2, "gopher_quality"))
    winners = groupby_agg(g, ["key"], [("doc_id", "min", "w")])
    n_keys = winners.count()
    if n_keys <= 5_000_000:
        # guarded broadcast winner map (the paragraph_dedup degrade
        # shape): one dict probe per batch instead of a
        # hash-partitioned join + aggregator fleet — measured
        # 6.6 → 3.3 s for the funnel at sf0.1
        wmap = dict(zip(*[winners.to_pandas()[c] for c in ("key", "w")]))
        wref = ray.put(wmap)

        def keep_first(b: pd.DataFrame) -> pd.DataFrame:
            from ..functions.relational import bcast_get
            wm = bcast_get(wref)
            return b[b["doc_id"].to_numpy("int64")
                     == b["key"].map(wm).to_numpy("int64")]

        d = g.map_batches(keep_first, batch_format="pandas") \
            .materialize()
    else:
        d = hash_join(g, winners.materialize(), on="key",
                      empty_safe=True).map_batches(
            lambda b: b[b["doc_id"] == b["w"]],
            batch_format="pandas").materialize()
    rows.append(tally(d, 3, "exact_dedup"))

    def clean_and_tally(b: pd.DataFrame) -> pd.DataFrame:
        # final stage fused with its tally — one pass, no materialize
        from ..functions.relational import bcast_get
        gs = bcast_get(gref)
        keep = [not any(x in gs for x in word_ngram_set(t, 8))
                for t in b["text"]]
        kept = b[np.asarray(keep, dtype=bool)]
        return pd.DataFrame({"n": [len(kept)],
                             "tok": [int(kept["n_words"].sum())]})

    part = d.map_batches(clean_and_tally, batch_format="pandas") \
        .to_pandas()
    rows.append({"stage": 4, "stage_name": "decontaminated",
                 "docs": int(part["n"].sum()),
                 "tokens": int(part["tok"].sum())})
    out = pd.DataFrame(rows)
    for c in ("stage", "docs", "tokens"):
        out[c] = out[c].astype("int64")
    return out


def q_orders_priority_leftjoin(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER broadcast join (the fabricate-nothing miss case —
    unmatched left rows survive with nulls) + grouped match counting."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust[cust.c_mktsegment == "BUILDING"][["c_custkey"]]
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_custkey"])
    joined = broadcast_join(
        orders, building, left_on="o_custkey", right_on="c_custkey",
        how="left",
    )
    agg = groupby_agg(joined, ["o_orderpriority"],
                      [("c_custkey", "count", "n_building"),
                       ("o_custkey", "count", "n_orders")])
    df = agg.to_pandas()
    df["n_building"] = df["n_building"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


# GPT-2-style pretokenizer classes, restricted to the regex dialect both
# Python `re` and DuckDB's RE2 share (letter runs incl. Latin-1
# accents, digit runs, symbol runs) — kept in exact sync with the
# oracle SQL of q_doc_bpe_tokens.
BPE_TOKEN_RE = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\s]+"


def q_doc_bpe_tokens(sf_dir: str) -> pd.DataFrame:
    """BPE-ish pretokenizer counting per document (training-data token
    accounting: letter runs / digit runs / symbol runs)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b.doc_id,
                "bpe_tokens": b.text.str.count(BPE_TOKEN_RE).astype("int64"),
            }
        )

    df = ds.map_batches(count, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Dedup family (rows-only: deterministic dup injection + near-dedup)
# ---------------------------------------------------------------------------


def _docs_with_dupes(sf_dir: str):
    """documents ∪ near-copies of every 10th doc (deterministic)."""
    import ray.data as rd

    base = _pq(sf_dir, "documents", ["doc_id", "text"])
    dup = base[base.doc_id % 10 == 0].copy()
    dup["doc_id"] = dup["doc_id"] + 10_000_000
    dup["text"] = dup["text"] + " tail"
    return rd.from_pandas(pd.concat([base, dup], ignore_index=True))


def q_doc_dup_ngrams(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact word-8-gram duplication (top 100,
    deterministic order) over documents ∪ injected near-copies so true
    positives exist — the operator lives in functions/dedup."""
    from ..functions.dedup import exact_ngram_dup_counts

    df = exact_ngram_dup_counts(_docs_with_dupes(sf_dir), n=8).to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return df.sort_values(["n_docs", "gram"],
                          ascending=[False, True]).head(100).reset_index(
        drop=True
    )


def q_doc_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact word-8-gram Jaccard near-dup pairs (threshold 0.5) over
    documents ∪ injected near-copies — the distributed gram-self-join
    operator (recall 1.0 by construction), hash-verified against the
    quadratic SQL semantics."""
    from ..functions.dedup import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(
        _docs_with_dupes(sf_dir), n=8, threshold=0.5
    ).to_pandas()
    df = df.astype({"a": "int64", "b": "int64", "inter": "int64",
                    "union": "int64"})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_doc_setjoin_prefix(sf_dir: str) -> pd.DataFrame:
    """AllPairs/PPJoin prefix-filtered EXACT set-similarity self-join
    (word 4-grams, Jaccard ≥ 3/5) over documents ∪ injected
    near-copies: candidate generation joins only each doc's rarest
    ``s − ⌈t·s⌉ + 1`` grams under a global document-frequency order
    (recall 1.0 by the prefix-filter theorem), then exact verification
    runs on the candidate cohort only.  Hash-verified against the
    quadratic SQL semantics — same answer as the full gram self-join,
    fraction-of-the-join-volume candidate stage (pinned in pytest)."""
    from ..functions.dedup import setjoin_prefix

    pairs, _info = setjoin_prefix(
        _docs_with_dupes(sf_dir), n=4, threshold_num=3, threshold_den=5)
    df = pairs.to_pandas()
    df = df.astype({"a": "int64", "b": "int64", "inter": "int64",
                    "union": "int64"})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_dedup_minhash(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import near_dedup_minhash

    survivors, pairs, cmap = near_dedup_minhash(
        _docs_with_dupes(sf_dir), id_col="doc_id", text_col="text",
        verify_threshold=0.5,
    )
    df = survivors.to_pandas()[["doc_id"]].sort_values("doc_id")
    return df.reset_index(drop=True)


def q_dedup_simhash(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import simhash_pairs, simhash_signatures

    sigs = simhash_signatures(_docs_with_dupes(sf_dir), id_col="doc_id")
    pairs = simhash_pairs(sigs.materialize(), id_col="doc_id", max_hamming=3)
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup over the embeddings table plus
    deterministic injected near-copies (every 20th vector, tiny
    perturbation) so the operator has true positives to find."""
    import ray.data as rd

    from ..functions.dedup import embedding_near_dup_pairs

    base = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    dup = base[base.vec_id % 20 == 0].copy()
    dup["embedding"] = dup.apply(
        lambda r: (np.asarray(r.embedding, dtype=np.float32)
                   + np.float32(1e-3) * np.float32(1 + r.vec_id % 3)).tolist(),
        axis=1,
    )
    dup["vec_id"] = dup["vec_id"] + 10_000_000
    corpus = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    pairs = embedding_near_dup_pairs(corpus, threshold=0.98)
    if "cosine" not in pairs.columns:
        pairs = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
    pairs["cosine"] = pairs["cosine"].round(4)
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def q_knn_cosine(sf_dir: str) -> pd.DataFrame:
    """Exact brute-force cosine top-10 vs the vec_id=0 embedding."""
    from ..functions.similarity import knn_bruteforce

    q = _pq(sf_dir, "embeddings").query("vec_id == 0").embedding.iloc[0]
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = knn_bruteforce(ds, np.asarray([list(q)]), k=10)
    df = df[["vec_id", "cosine", "rank"]]
    df["cosine"] = df["cosine"].round(4)
    df["rank"] = df["rank"].astype("int64") + 1
    return df.reset_index(drop=True)


def q_emb_rbh(sf_dir: str) -> pd.DataFrame:
    """Reciprocal best hits between the even- and odd-id embedding
    sets — the mutual-nearest-neighbor primitive of bitext mining
    (Artetxe & Schwenk's margin criterion starts here): a pair (a, b)
    survives iff b is a's top cosine match AND a is b's.  Scores are
    BIT-DETERMINISTIC cross-engine: exact int64 dot products of
    2^10-quantized vectors divided by IEEE-correctly-rounded sqrt of
    the exact integer norm — numpy and DuckDB produce the identical
    double, ties break by smallest candidate id.  Output carries only
    integers (the pair + the exact dot), never a float column.

    Shape: one quantized matmul per batch against the broadcast
    smaller side + per-row argmax; the mutual check is a tiny merge of
    the two argmax tables."""
    import ray

    from ..functions.relational import bcast_get

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # B = the odd-id pivot set, broadcast once (the bounded side); A
    # streams through map_batches — each batch emits A-side argmaxes
    # EXACTLY plus per-B PARTIAL argmax candidates (argmax is
    # associative with the deterministic (score desc, id asc)
    # tie-break, so batch partials combine order-free)
    bdf = ds.map_batches(
        lambda b: b[b["vec_id"].to_numpy("int64") % 2 == 1],
        batch_format="pandas").to_pandas()
    qb = np.floor(np.stack(bdf["embedding"].to_numpy())
                  .astype(np.float64) * (1 << 10)).astype(np.int64)
    ib = bdf["vec_id"].to_numpy("int64")
    nb = (qb * qb).sum(axis=1)
    ref = ray.put((qb, ib, nb))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        qb_, ib_, nb_ = bcast_get(ref)
        sel = batch["vec_id"].to_numpy("int64") % 2 == 0
        if not sel.any():
            return pd.DataFrame({"kind": pd.Series([], dtype=object),
                                 "x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "dot": pd.Series([], dtype="int64"),
                                 "nx": pd.Series([], dtype="int64")})
        qa = np.floor(np.stack(batch["embedding"].to_numpy()[sel])
                      .astype(np.float64)
                      * (1 << 10)).astype(np.int64)
        ia = batch["vec_id"].to_numpy("int64")[sel]
        na = (qa * qa).sum(axis=1)
        dots = qa @ qb_.T  # exact int64
        # A-side exact argmax over the complete B
        sa = dots.astype(np.float64) / np.sqrt(
            nb_.astype(np.float64))
        oa = np.lexsort((np.broadcast_to(ib_, sa.shape),
                         -sa), axis=1)[:, 0]
        a_rows = pd.DataFrame({
            "kind": "a", "x": ia, "y": ib_[oa],
            "dot": dots[np.arange(len(ia)), oa], "nx": na})
        # B-side PARTIAL argmax over this A batch
        sb = dots.astype(np.float64) / np.sqrt(
            na.astype(np.float64))[:, None]
        ob = np.lexsort((np.broadcast_to(ia[:, None],
                                         sb.shape), -sb), axis=0)[0]
        b_rows = pd.DataFrame({
            "kind": "b", "x": ib_, "y": ia[ob],
            "dot": dots[ob, np.arange(len(ib_))],
            "nx": na[ob]})
        return pd.concat([a_rows, b_rows], ignore_index=True)

    parts = ds.map_batches(scan, batch_format="pandas").to_pandas()
    a_best = parts[parts["kind"] == "a"][["x", "y", "dot"]]
    bp = parts[parts["kind"] == "b"].copy()
    # combine B partials: score = dot/sqrt(na(candidate)), tie → min y
    bp["score"] = bp["dot"].to_numpy("int64").astype(np.float64) \
        / np.sqrt(bp["nx"].to_numpy("int64").astype(np.float64))
    bp = bp.sort_values(["x", "score", "y"],
                        ascending=[True, False, True],
                        kind="mergesort")
    b_best = bp.groupby("x", sort=False).head(1)[["x", "y"]]
    m = a_best.merge(b_best, left_on=["x", "y"],
                     right_on=["y", "x"], suffixes=("_a", "_b"))
    out = pd.DataFrame({"a": m["x_a"].astype("int64"),
                        "b": m["y_a"].astype("int64"),
                        "qdot": m["dot"].astype("int64")})
    return out.sort_values("a").reset_index(drop=True)


def q_emb_kcenter(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the 2-approximation diversity coreset data curation
    uses): seed = min vec_id; each round add the point FARTHEST from
    the selected set (exact int64 squared distance of 2^10-quantized
    vectors, ties → smallest id).  Every comparison is integer, so the
    generated unrolled SQL twin is bit-identical.

    Shape: k bounded passes — each round broadcasts the ≤ k selected
    vectors and streams the corpus once computing min-dist²-to-set
    per batch with a per-batch argmax partial (associative, combined
    driver-side); no all-pairs table, no state between rounds beyond
    the k selected rows."""
    import ray

    from ..functions.relational import bcast_get

    k = 6
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # guarded driver fast path (the auto/degrade convention): under
    # the row guard one pull + pure-numpy greedy (k matmuls on the
    # local matrix) beats k streamed passes' fixed session costs
    # (measured 3.9 -> 0.7 s at sf0.1); the streaming path below is
    # the identical kernel for corpora past the guard
    n_rows = ds.count()
    if n_rows <= 2_000_000:
        full = ds.to_pandas()
        q = np.floor(np.stack(full["embedding"].to_numpy())
                     .astype(np.float64) * (1 << 10)).astype(np.int64)
        ids = full["vec_id"].to_numpy("int64")
        order0 = int(ids.argmin())
        sel = [order0]
        picked = [(1, int(ids[order0]), 0)]
        nn = (q * q).sum(1)
        mind2 = None
        for t in range(2, k + 1):
            sv = q[sel[-1]]
            d2 = nn + int(sv @ sv) - 2 * (q @ sv)
            mind2 = d2 if mind2 is None else np.minimum(mind2, d2)
            mask = np.ones(len(ids), dtype=bool)
            mask[sel] = False
            mm = np.where(mask, mind2, -1)
            o = np.lexsort((ids, -mm))[0]
            sel.append(int(o))
            picked.append((t, int(ids[o]), int(mm[o])))
        return pd.DataFrame({
            "round": pd.Series([p[0] for p in picked], dtype="int64"),
            "vec_id": pd.Series([p[1] for p in picked],
                                dtype="int64"),
            "d2": pd.Series([p[2] for p in picked], dtype="int64"),
        })

    def quant(b: pd.DataFrame):
        q = np.floor(np.stack(b["embedding"].to_numpy())
                     .astype(np.float64) * (1 << 10)).astype(np.int64)
        return b["vec_id"].to_numpy("int64"), q

    seed_df = ds.map_batches(
        lambda b: pd.DataFrame({"vec_id": [b["vec_id"].min()],
                                "embedding": [b["embedding"].iloc[
                                    b["vec_id"].to_numpy().argmin()]]}),
        batch_format="pandas").to_pandas()
    s0 = seed_df.loc[seed_df["vec_id"].idxmin()]
    sel_ids = [int(s0["vec_id"])]
    sel_q = [np.floor(np.asarray(s0["embedding"], dtype=np.float64)
                      * (1 << 10)).astype(np.int64)]
    picked = [(1, sel_ids[0], 0)]
    for t in range(2, k + 1):
        ref = ray.put((np.stack(sel_q), tuple(sel_ids)))

        def far(b: pd.DataFrame) -> pd.DataFrame:
            ids, q = quant(b)
            s, taken = bcast_get(ref)  # (m, D), selected ids
            keep = ~np.isin(ids, taken)
            if not keep.any():
                return pd.DataFrame({"vec_id": pd.Series(
                    [], dtype="int64"),
                    "d2": pd.Series([], dtype="int64"),
                    "qvec": pd.Series([], dtype=object)})
            ids, q = ids[keep], q[keep]
            # dist² = |c|² + |s|² − 2 c·s, exact int64
            d2 = ((q * q).sum(1)[:, None] + (s * s).sum(1)[None, :]
                  - 2 * (q @ s.T))
            m = d2.min(axis=1)
            o = np.lexsort((ids, -m))[0]
            # carry the argmax row's quantized vector in the partial —
            # saves a whole filter scan per round just to re-fetch it
            return pd.DataFrame({"vec_id": [ids[o]],
                                 "d2": [int(m[o])],
                                 "qvec": [q[o].tolist()]})

        cand = ds.map_batches(far, batch_format="pandas").to_pandas()
        cand = cand.sort_values(["d2", "vec_id"],
                                ascending=[False, True],
                                kind="mergesort")
        pick = int(cand["vec_id"].iloc[0])
        picked.append((t, pick, int(cand["d2"].iloc[0])))
        sel_q.append(np.asarray(cand["qvec"].iloc[0],
                                dtype=np.int64))
        sel_ids.append(pick)
    return pd.DataFrame({
        "round": pd.Series([p[0] for p in picked], dtype="int64"),
        "vec_id": pd.Series([p[1] for p in picked], dtype="int64"),
        "d2": pd.Series([p[2] for p in picked], dtype="int64"),
    })


def q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-10 (the scale path) — rows-only;
    tests measure recall vs brute force."""
    from ..functions.similarity import knn_ivf

    emb = _pq(sf_dir, "embeddings")
    q = np.stack(emb[emb.vec_id.isin([0, 1, 2])].sort_values("vec_id").embedding)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df, _n = knn_ivf(ds, q, k=10)
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def q_knn_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate (LSH-bucketed) top-10 — rows-only; tests measure
    recall vs brute force."""
    from ..functions.similarity import knn_lsh

    emb = _pq(sf_dir, "embeddings")
    q = np.stack(emb[emb.vec_id.isin([0, 1, 2])].sort_values("vec_id").embedding)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df, _n = knn_lsh(ds, q, k=10)
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)



def q_knn_exact(sf_dir: str) -> pd.DataFrame:
    """ORACLE-PAIRED exact cosine top-10 (the hash-verified member of
    the kNN family): quantized int64 coordinates, exact integer dot
    products and norms, score = one IEEE multiply + sqrt + divide —
    bit-identical in numpy and DuckDB (similarity.knn_exact_quantized)."""
    from ..functions.similarity import knn_exact_quantized

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = knn_exact_quantized(ds, [0, 1, 2], k=10)
    for c in ["qid", "vec_id", "rank"]:
        df[c] = df[c].astype("int64")
    return df.sort_values(["qid", "rank"]).reset_index(drop=True)


def q_knn_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-10 (the MEMORY-compression scale
    path: D floats → m uint8 codes per vector, exact re-rank of the
    refined candidates) — rows-only; tests measure recall vs brute
    force and pin codebook determinism."""
    from ..functions.similarity import knn_pq

    emb = _pq(sf_dir, "embeddings")
    q = np.stack(emb[emb.vec_id.isin([0, 1, 2])].sort_values("vec_id").embedding)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df, _n = knn_pq(ds, q, k=10)
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def q_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-10 highest-cosine OTHER-label vectors (the DPR in-batch
    negatives upgrade) — integer-quantized exact cosine, so the mined
    sets hash-match SQL."""
    from ..functions.similarity import hard_negatives

    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding", "label"])
    df = hard_negatives(ds, [0, 1, 2], k=10)
    for c in ["anchor_id", "vec_id", "rank"]:
        df[c] = df[c].astype("int64")
    return df.sort_values(["anchor_id", "rank"]).reset_index(drop=True)


def q_events_dquantiles(sf_dir: str) -> pd.DataFrame:
    """Deterministic-sample quantiles over event values: the 512 rows
    with globally-smallest md5(event_id) form a batching-independent
    sample (valid combiner), percentile_cont lerp over it —
    oracle-paired, unlike the reservoir path in q_approx_stats."""
    from ..functions.sketches import dsample_quantiles

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    return dsample_quantiles(ds, "value", [0.1, 0.5, 0.9, 0.99],
                             key_col="event_id", k=512)


def q_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed integer-exact Lloyd's k-means (k=8, 4 rounds) over
    the embeddings table — centroids broadcast per round, one streaming
    partial-sums pass each, assignment bit-identical to the generated
    unrolled-round SQL oracle (see similarity.kmeans_quantized)."""
    from ..functions.similarity import kmeans_quantized

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assign, _hist = kmeans_quantized(ds, k=8, rounds=4)
    df = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    df["cluster"] = df["cluster"].astype("int64")
    return df


def q_doc_delta_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingestion dedup (dedup.delta_dedup): a
    deterministic 20% doc slice plays the NEW crawl shard, the rest
    the accumulated corpus; each new doc classifies exact_dup (content
    md5 join) / near_dup (banded-MinHash bucket collision vs base) /
    fresh — the daily-update shape where a shard dedups against the
    corpus, not just itself.  All tiers are md5-deterministic so the
    SQL twin reproduces the identical partition, signatures and
    statuses."""
    from ..functions.dedup import delta_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return delta_dedup(ds, mod=5, new_slot=0)


def q_doc_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Exact-phrase retrieval by positional adjacency
    (text.phrase_search): the 5 most frequent corpus bigrams as the
    deterministic query set, hits = docs where the two tokens are
    ADJACENT under the shared token contract — the inverted-index
    primitive, not substring matching."""
    from ..functions.text import phrase_search

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return phrase_search(ds, top_phrases=5)


def q_sem_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup over the embeddings table (similarity.sem_dedup,
    arXiv:2303.09540 shape): k-means clusters (k=8, 4 rounds,
    integer-exact) then within-cluster cosine ≥ 2/5 flags semantic
    duplicates, min-id representative kept.  τ is calibrated to the
    synthetic corpus (unit-norm Gaussian-ish vectors top out near
    cos 0.6) so both branches are exercised; a production corpus uses
    the paper's ~0.95 with the same rational-arithmetic path."""
    from ..functions.similarity import sem_dedup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = sem_dedup(ds, k=8, rounds=4, tau=(2, 5)).to_pandas()
    df["vec_id"] = df["vec_id"].astype("int64")
    df["cluster"] = df["cluster"].astype("int64")
    df["is_dup"] = df["is_dup"].astype(bool)
    return df.sort_values("vec_id").reset_index(drop=True)



def q_events_user_join(sf_dir: str) -> pd.DataFrame:
    """Skew-aware hybrid join (relational.skew_join): hot user_ids —
    found by one Misra-Gries combiner pass — take a broadcast no-shuffle
    path while the cold remainder hash-joins; the union is exactly the
    plain LEFT JOIN the oracle runs.  events.user_id 0 has no customer
    row, so the outer path is exercised too."""
    from ..functions.relational import skew_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "value"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ds, _n_hot = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                           how="left_outer", hot_min_share=0.005)
    df = ds.to_pandas()
    df["c_name"] = df["c_name"].fillna("")
    return (df[["event_id", "user_id", "c_name", "value"]]
            .sort_values("event_id").reset_index(drop=True))



def q_doc_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Maximal duplicated token spans — the ExactSubstr CUT LIST
    (functions/dedup.duplicate_spans): every span of tokens covered by
    corpus-duplicated word-8-grams as one (start, end, length) row,
    over documents ∪ injected near-copies so whole planted duplicates
    surface as single long intervals."""
    from ..functions.dedup import duplicate_spans

    df = duplicate_spans(_docs_with_dupes(sf_dir), n=8).to_pandas()
    return df.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def q_doc_dedup_spans(sf_dir: str) -> pd.DataFrame:
    """Exact duplicated-span REMOVAL (Lee et al. substring dedup as a
    transform, functions/text.mask_dup_spans): tokens covered by any
    corpus-duplicated word-8-gram are dropped — over documents ∪
    injected near-copies so whole planted spans vanish while unique
    text survives byte-identically."""
    from ..functions.text import mask_dup_spans

    df = mask_dup_spans(_docs_with_dupes(sf_dir), n=8).to_pandas()
    df["n_masked"] = df["n_masked"].astype("int64")
    df["n_tokens"] = df["n_tokens"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)



def q_multimodal_phash(sf_dir: str) -> pd.DataFrame:
    """Image near-dup detection by 64-bit perceptual hash (pHash: luma
    → area-mean 32×32 → DCT low block vs median) through the builtin
    codec tier: planted near-copies (noise / small patch edits /
    brightness shifts of shared base images, encoded as REAL PNG and
    BMP bytes) pair up under banded Hamming search while unrelated
    images stay apart — rows-only; distances pinned in tests."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.dedup import simhash_pairs
    from ..functions.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_png,
        phash_signatures,
    )

    rng = np.random.default_rng(17)
    ids, blobs, mimes, ws, hs = [], [], [], [], []
    for i in range(60):
        base = np.kron(rng.uniform(0, 255, (8, 8)),
                       np.ones((8, 8)))  # rich low-frequency structure
        img = np.stack([base, base * 0.9, base * 0.8],
                       axis=2).astype(np.uint8)
        variants = [("orig", img)]
        if i % 4 == 0:  # plant a noisy near-copy
            noisy = np.clip(img.astype(int) + rng.integers(-8, 9, img.shape),
                            0, 255).astype(np.uint8)
            variants.append(("noisy", noisy))
        if i % 4 == 1:  # plant a dimmed near-copy
            dim = np.clip(img.astype(float) * 0.85, 0, 255).astype(np.uint8)
            variants.append(("dim", dim))
        for tag, arr in variants:
            ids.append(f"img{i:04d}_{tag}")
            if i % 2:
                blobs.append(encode_png(arr))
                mimes.append("image/png")
            else:
                blobs.append(encode_bmp(arr))
                mimes.append("image/bmp")
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
    media = rd.from_arrow(pa.Table.from_pydict(
        {"media_id": ids, "media": blobs, "mime": mimes,
         "width": ws, "height": hs}, schema=MEDIA_SCHEMA))
    # arrow-level mask, NOT row-based .filter(): Ray's row filter
    # rebuilds blocks through Python ints and uint64 hashes above
    # int64-max overflow the conversion
    sig = phash_signatures(media, fake=None).map_batches(
        lambda t: t.filter(t.column("ok")), batch_format="pyarrow")
    pairs = simhash_pairs(sig, id_col="media_id", max_hamming=10)
    pairs["hamming"] = pairs["hamming"].astype("int64")
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sessionization (window analog over the events log)
# ---------------------------------------------------------------------------


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user via groupby().map_groups
    over ts-sorted groups (guide 'streaming-shaped workloads' pattern)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        gap = g.ts.diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame(
            {"user_id": [g.user_id.iloc[0]],
             "n_sessions": [int(gap.sum()) + 1],
             "n_events": [len(g)]}
        )

    df = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


def q_events_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding 1-hour window per user: for each event, count of that
    user's events in [ts-1h, ts].  Oracle = RANGE window frame.

    Two paths on the usual measured-threshold pattern:
    - broadcast (small table): the per-user sorted timestamp index is
      built once and broadcast; each batch answers its windows with two
      vectorized searchsorteds per user — NO shuffle (the 16-bucket
      groupby's sort shuffle dominated this query's wall time at sf0.1);
    - bucketed (scale path): users hash into buckets, grouped pandas
      rolling inside map_groups — all of a user's history co-located."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    if ds.count() <= 5_000_000:  # parquet-metadata count, no read
        import numpy as np
        import ray

        batches = list(ds.iter_batches(batch_format="pandas",
                                       batch_size=None))
        # count()==0 still selects this branch; pd.concat([]) raises
        ev = (
            pd.concat(batches, ignore_index=True)
            if batches
            else pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="datetime64[ns]")})
        ).sort_values(["user_id", "ts"], kind="mergesort")
        ts_ns = ev["ts"].values.astype("datetime64[ns]").astype("int64")
        # contiguous per-user segments of the (user, ts)-sorted array
        index = {}
        uvals = ev["user_id"].values
        if len(uvals):
            bounds = np.flatnonzero(
                np.r_[True, uvals[1:] != uvals[:-1], True])
            for i in range(len(bounds) - 1):
                index[uvals[bounds[i]]] = ts_ns[bounds[i]:bounds[i + 1]]
        ref = ray.put(index)
        from ..functions.relational import bcast_get

        def win(b: pd.DataFrame) -> pd.DataFrame:
            idx = bcast_get(ref)
            b = b.reset_index(drop=True)
            out = np.empty(len(b), dtype=np.int64)
            for u, grp in b.groupby("user_id", sort=False):
                arr = idx[u]
                t = grp["ts"].values.astype("datetime64[ns]").astype("int64")
                hi = np.searchsorted(arr, t, side="right")
                lo = np.searchsorted(arr, t - 3_600_000_000_000, side="left")
                out[grp.index.values] = hi - lo
            return pd.DataFrame(
                {"event_id": b.event_id, "user_id": b.user_id, "n_1h": out}
            )

        df = ds.map_batches(
            win, batch_format="pandas", batch_size=32768
        ).to_pandas()
        if not len(df):  # zero blocks reach win() on an empty input
            df = pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "n_1h": pd.Series([], dtype="int64")})
        return df.sort_values("event_id").reset_index(drop=True)

    from ..functions.relational import default_n_buckets

    n_buckets = default_n_buckets()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (b.user_id % n_buckets).astype("int32")
        return b

    def window(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _uid, sub in g.groupby("user_id", sort=False):
            sub = sub.sort_values(["ts", "event_id"], kind="mergesort")
            cnt = (
                sub.rolling("3600s", on="ts", closed="both")["event_id"]
                .count()
                .astype("int64")
            )
            out.append(
                pd.DataFrame(
                    {"event_id": sub.event_id, "user_id": sub.user_id,
                     "n_1h": cnt}
                )
            )
        return pd.concat(out, ignore_index=True)

    df = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(window, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values("event_id").reset_index(drop=True)


def q_events_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each purchase event, the user's latest click at
    or before it (pd.merge_asof within user-hash buckets)."""
    from ..functions.relational import asof_join

    purchases = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(
        lambda b: b[b.event_type == "purchase"][["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    clicks = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_type"]
    ).map_batches(
        lambda b: b[b.event_type == "click"][["user_id", "ts"]].assign(
            click_ts=lambda x: x.ts
        ),
        batch_format="pandas",
    )
    n_events = read_table(sf_dir, "events", columns=["event_id"]).count()
    out = asof_join(
        purchases, clicks, by="user_id", on="ts",
        right_value_cols=["click_ts"],
        # size known from parquet metadata — skip auto's count barrier
        mode="broadcast" if n_events <= 5_000_000 else "shuffle",
    ).to_pandas()
    out = out.rename(columns={"click_ts_asof": "last_click_ts"})
    return out[["event_id", "user_id", "last_click_ts"]].sort_values(
        "event_id"
    ).reset_index(drop=True)


def q_events_interval(sf_dir: str) -> pd.DataFrame:
    """Interval join: for each purchase, the user's click count in the
    preceding hour (stream-stream window join over the events log)."""
    from ..functions.relational import interval_join

    purchases = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(
        lambda b: b[b.event_type == "purchase"][["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    clicks = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_type"]
    ).map_batches(
        lambda b: b[b.event_type == "click"][["user_id", "ts"]].assign(
            click_ts=lambda x: x.ts
        ),
        batch_format="pandas",
    )
    n_events = read_table(sf_dir, "events", columns=["event_id"]).count()
    joined = interval_join(
        purchases, clicks, by="user_id", on="ts",
        lower=pd.Timedelta(hours=-1), upper=pd.Timedelta(0),
        right_value_cols=["click_ts"], how="left",
        mode="broadcast" if n_events <= 5_000_000 else "shuffle",
    )

    # count of non-null click_ts_r per purchase via the pre-combined
    # groupby — NOT a per-batch count: Ray may split a bucket's rows
    # across batches at its default batch_size, and a per-batch count
    # would then emit duplicate event_id rows with partial counts.
    agg = groupby_agg(joined, ["event_id", "user_id"],
                      [("click_ts_r", "count", "n_recent_clicks")])
    df = agg.to_pandas()
    df["n_recent_clicks"] = df["n_recent_clicks"].astype("int64")
    return df.sort_values("event_id").reset_index(drop=True)


def q_orders_rank_window(sf_dir: str) -> pd.DataFrame:
    """RANK() OVER (PARTITION BY priority ORDER BY orderdate) for every
    order — the full ranked output, not top-k.  Two-pass distributed
    rank (relational.partitioned_rank): distinct (priority, date)
    counts move through the exchange (≈ priorities × dates rows, never
    the orders), ranks computed once and broadcast back — a partition's
    rows are never co-located."""
    from ..functions.relational import partitioned_rank

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    ranked = partitioned_rank(
        orders, ["o_orderpriority"], "o_orderdate", out_col="rnk")
    df = ranked.to_pandas()[["o_orderkey", "o_orderpriority", "rnk"]]
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_orders_cume_dist(sf_dir: str) -> pd.DataFrame:
    """CUME_DIST() + PERCENT_RANK() OVER (PARTITION BY priority ORDER
    BY orderdate) for every order — value-level window functions on the
    same two-pass counts-table shape as q_orders_rank_window: the
    exchange moves one row per distinct (priority, date); the divisions
    are int→double on exact counts, so the doubles are bit-identical to
    DuckDB's."""
    from ..functions.relational import partitioned_cume

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    out = partitioned_cume(orders, ["o_orderpriority"], "o_orderdate")
    df = out.to_pandas()[
        ["o_orderkey", "o_orderpriority", "cume_dist", "percent_rank"]]
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_orders_ntile(sf_dir: str) -> pd.DataFrame:
    """ROW_NUMBER() + NTILE(4) OVER (PARTITION BY priority ORDER BY
    orderkey) — row-level window functions, which genuinely need the
    partition's total order: hash-shuffle co-location + one vectorized
    sort/arange per partition (relational.partitioned_ntile).  The
    order key is unique, so both engines are deterministic."""
    from ..functions.relational import partitioned_ntile

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    out = partitioned_ntile(
        orders, ["o_orderpriority"], ["o_orderkey"], 4)
    df = out.to_pandas()[
        ["o_orderkey", "o_orderpriority", "row_number", "tile"]]
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_cube_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(priority, status): all 4 aggregation levels from
    ONE exchange via the generic `relational.grouping_sets` — finest
    partials once, coarser levels as sums-of-sums of that small table
    (the q_rollup_revenue shape, generalized to arbitrary set lists)."""
    from ..functions.relational import cube_sets, grouping_sets

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    out = grouping_sets(
        orders, ["o_orderpriority", "o_orderstatus"],
        cube_sets(["o_orderpriority", "o_orderstatus"]),
        [("o_totalprice", "sum", "total"),
         ("o_totalprice", "count", "n")]).rename(
        columns={"o_orderpriority": "priority",
                 "o_orderstatus": "status"})
    out["total"] = out["total"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["priority", "status"]).reset_index(drop=True)


def q_orders_first_value(sf_dir: str) -> pd.DataFrame:
    """FIRST_VALUE / LAST_VALUE over the whole partition (the
    unbounded-frame form): composition of existing operators —
    distinct_on picks each partition's first/last row (one combiner
    pass each, exact), the 5-row result broadcasts back over the
    stream.  Order key is unique, so both engines are deterministic."""
    import ray

    from ..functions.relational import bcast_get, distinct_on

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    firsts = distinct_on(
        orders, ["o_orderpriority"], order_col="o_orderkey").to_pandas()
    neg = orders.map_batches(
        lambda b: b.assign(__negk=-b.o_orderkey), batch_format="pandas")
    lasts = distinct_on(
        neg, ["o_orderpriority"], order_col="__negk").to_pandas()
    fmap = ray.put(dict(zip(firsts.o_orderpriority, firsts.o_totalprice)))
    lmap = ray.put(dict(zip(lasts.o_orderpriority, lasts.o_totalprice)))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b.o_orderkey,
            "o_orderpriority": b.o_orderpriority,
            "first_price": b.o_orderpriority.map(bcast_get(fmap)),
            "last_price": b.o_orderpriority.map(bcast_get(lmap))})

    df = orders.map_batches(attach, batch_format="pandas").to_pandas()
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_events_lag(sf_dir: str) -> pd.DataFrame:
    """LAG window: microseconds since the same user's previous event
    (-1 for the user's first).  Bucketed by user hash; inside a bucket
    the whole computation is ONE vectorized diff over the
    (user, ts, event_id)-sorted frame with first-row-per-user masking —
    no per-user Python loop."""
    import numpy as np

    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    nb = default_n_buckets()

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = g["ts"].values.astype("datetime64[us]").astype("int64")
        u = g["user_id"].values
        d = np.empty(len(g), np.int64)
        if len(g):
            d[1:] = t[1:] - t[:-1]
            d[np.r_[True, u[1:] != u[:-1]]] = -1
        return pd.DataFrame({"event_id": g.event_id, "user_id": g.user_id,
                             "delta_us": d})

    df = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(lag, batch_format="pandas").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_events_transitions(sf_dir: str) -> pd.DataFrame:
    """Event-type transition census (per-user Markov bigram counts —
    the first-order behavior model a clickstream pipeline trains on):
    count consecutive (event_type → next event_type) pairs within each
    user's ts-ordered stream, summed across users.

    Shape: user-hash buckets co-locate each user's stream; inside a
    bucket ONE vectorized shift over the (user, ts, event_id)-sorted
    frame yields every transition (user-boundary rows masked) and the
    per-bucket pandas groupby is the combiner — only the tiny
    (type, type) partial counts leave each bucket for the final
    merge."""
    from ..functions.relational import default_n_buckets, groupby_agg

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nb = default_n_buckets()

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy(dtype=object)
        keep = u[:-1] == u[1:]
        out = pd.DataFrame({"from_type": t[:-1][keep],
                            "to_type": t[1:][keep]})
        out = out.groupby(["from_type", "to_type"], sort=False
                          ).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(trans, batch_format="pandas")
    df = groupby_agg(parts, ["from_type", "to_type"],
                     [("n", "sum", "n")]).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def q_events_range_frame(sf_dir: str) -> pd.DataFrame:
    """RANGE-frame window (value-range frames, the window family's last
    gap after ROWS frames / ranks / ntiles): per event, the count and
    exact sum of the SAME USER's events in the preceding hour,
    peers-inclusive (RANGE ... 1 HOUR PRECEDING AND CURRENT ROW).

    Shape: user-hash buckets co-locate each partition; inside a bucket
    the frame bounds for EVERY row come from two global searchsorted
    calls over per-user-offset timestamp keys (each user's segment maps
    to a disjoint key range, so one monotonic array answers all users —
    no per-user Python loop), and the sums are exact int64 cent prefix
    sums (csum[hi]-csum[lo] is exact for integers, unlike float prefix
    differences)."""
    import numpy as np

    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    nb = default_n_buckets()
    hour_us = 3_600_000_000

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "w_cnt": pd.Series(dtype="int64"),
                "w_sum": pd.Series(dtype="float64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = g["ts"].values.astype("datetime64[us]").astype("int64")
        t = t - t.min()  # headroom so uidx*span never overflows int64
        u = g["user_id"].values
        uidx = np.cumsum(np.r_[0, u[1:] != u[:-1]])
        span = np.int64(t.max()) + hour_us + 2
        if int(uidx[-1] + 1) * int(span) >= 2**62:
            # guard the composite-key headroom (would need per-user
            # chunking past ~4e18 key space; unreachable at any bucket
            # size this data model produces)
            raise ValueError("range-frame composite key overflow")
        key = uidx * span + t
        lo = np.searchsorted(key, key - hour_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        cents = np.floor(g["value"].values * 100 + 0.5).astype("int64")
        csum = np.r_[0, np.cumsum(cents)]
        return pd.DataFrame({
            "event_id": g.event_id.values,
            "user_id": g.user_id.values,
            "w_cnt": (hi - lo).astype("int64"),
            "w_sum": (csum[hi] - csum[lo]) / 100.0,
        })

    df = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(frame, batch_format="pandas").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_events_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact interpolated per-group quantiles (percentile_cont
    semantics: sorted-array lerp at h=(n-1)q, bit-identical to DuckDB's
    formula).  Groups are event TYPES — a handful — so co-locating each
    group (one groupby) is the query's own shape; for per-key quantiles
    over millions of keys the mergeable-sketch path (q_approx_stats)
    is the scale alternative."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["value"].dropna().to_numpy(float))

        def pc(q: float) -> float:
            h = (len(s) - 1) * q
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            return float(s[lo] + (s[hi] - s[lo]) * (h - lo))

        return pd.DataFrame({"event_type": [g.event_type.iloc[0]],
                             "p50": [pc(0.5)], "p95": [pc(0.95)],
                             "n": [np.int64(len(s))]})

    df = ds.groupby("event_type").map_groups(
        quant, batch_format="pandas").to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


def q_users_customers_fullouter(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join: per-user event counts × the customer table on
    user_id = c_custkey (Ray-native full_outer hash join; completes the
    join family: inner/left/semi/anti/asof/interval already covered).
    Both unmatched sides are real in this data — user 0 has no customer
    row, customers past the user range have no events.  NULLs are
    COALESCEd identically in both engines so the hash compare is
    NULL-free."""
    from ..functions.relational import groupby_agg, hash_join

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id"])
    per_user = groupby_agg(ev, ["user_id"],
                           [("event_id", "count", "n_events")])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    # Ray's join COALESCEs the key into the left `on` column — the
    # output has one `user_id` column carrying both sides' keys
    j = hash_join(per_user, cust, on="user_id", right_on="c_custkey",
                  how="full_outer").to_pandas()
    out = pd.DataFrame({
        "key": j["user_id"].astype("int64"),
        "n_events": j["n_events"].fillna(0).astype("int64"),
        "c_mktsegment": j["c_mktsegment"].fillna(""),
    })
    return out.sort_values("key").reset_index(drop=True)


def q_users_click_and_purchase(sf_dir: str) -> pd.DataFrame:
    """INTERSECT: users who clicked AND purchased (set-op family
    completion beside union/EXCEPT-diff).  Distinct per side first —
    the exchange moves user IDs, not events — then an inner hash
    join."""
    from ..functions.relational import distinct_on, hash_join

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def side(t: str):
        return distinct_on(
            ev.map_batches(
                lambda b, t=t: b[b.event_type == t][["user_id"]],
                batch_format="pandas"),
            ["user_id"])

    j = hash_join(side("click"), side("purchase"), on="user_id")
    df = j.to_pandas()[["user_id"]]
    return df.sort_values("user_id").reset_index(drop=True)


def q_supplier_typo_pairs(sf_dir: str) -> pd.DataFrame:
    """Edit-distance-1 name pairs via FastSS deletion neighborhoods
    (dedup.ed1_pairs): signature-bucket candidates + vectorized verify
    — linear in total chars where the SQL oracle pays the V² self-join
    with levenshtein()."""
    from ..functions.dedup import ed1_pairs

    sup = read_table(sf_dir, "supplier", columns=["s_name"])
    df = ed1_pairs(sup, "s_name").to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(priority, status): every aggregation level from
    ONE exchange — the finest-level partials are computed once
    (pre-combined groupby), and the coarser levels are sums-of-sums
    over that small result on the driver.  DuckDB recomputes each
    level over the rows; sums agree to well past the round(2)."""
    from ..functions.relational import groupby_agg

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    fine = groupby_agg(
        orders, ["o_orderpriority", "o_orderstatus"],
        [("o_totalprice", "sum", "total"),
         ("o_totalprice", "count", "n")]).to_pandas()
    lvl1 = (fine.groupby("o_orderpriority", as_index=False)
            .agg(total=("total", "sum"), n=("n", "sum"))
            .assign(o_orderstatus="ALL"))
    lvl0 = pd.DataFrame({"o_orderpriority": ["ALL"],
                         "o_orderstatus": ["ALL"],
                         "total": [fine.total.sum()],
                         "n": [fine.n.sum()]})
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True).rename(
        columns={"o_orderpriority": "priority", "o_orderstatus": "status"})
    out["total"] = out["total"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["priority", "status"]).reset_index(drop=True)


def q_orders_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report: SUM() OVER (PARTITION BY priority) as a
    two-pass distributed window aggregate — per-priority totals from
    one pre-combined groupby, broadcast back, per-batch divide.  Prices
    are dime-quantized, so both engines sum EXACT integer cents and
    perform one int→double division — the share is bit-identical (the
    BM25 exact-integer-sums trick)."""
    import numpy as np
    import ray

    from ..functions.relational import bcast_get, groupby_agg

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cents = orders.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b.o_orderkey,
            "o_orderpriority": b.o_orderpriority,
            "cents": np.round(b.o_totalprice.to_numpy() * 100)
            .astype("int64")}),
        batch_format="pandas")
    tot = groupby_agg(cents, ["o_orderpriority"],
                      [("cents", "sum", "tot")]).to_pandas()
    ref = ray.put(dict(zip(tot.o_orderpriority, tot.tot.astype("int64"))))

    def share(b: pd.DataFrame) -> pd.DataFrame:
        t = b.o_orderpriority.map(bcast_get(ref)).to_numpy("int64")
        return pd.DataFrame({
            "o_orderkey": b.o_orderkey,
            "o_orderpriority": b.o_orderpriority,
            "share": b.cents.to_numpy("int64").astype("float64")
            / t.astype("float64")})

    df = cents.map_batches(share, batch_format="pandas").to_pandas()
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_sample_events(sf_dir: str) -> pd.DataFrame:
    """Seeded random sample + shuffle (O-family; rows-only — sampling
    is seed-stable within a Ray version, not SQL-reproducible)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    samp = ds.random_sample(0.05, seed=42)
    return samp.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_doc_sample_hash(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-language hash sampling (en 50%, de 25%,
    others 10%) — reproducible on any engine, unlike random_sample
    (q_sample_events)."""
    from ..functions.relational import hash_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    df = hash_sample(
        docs, "doc_id", rate=0.1, group_col="lang",
        rates={"en": 0.5, "de": 0.25},
    ).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_hearst(sf_dir: str) -> pd.DataFrame:
    """Hearst-pattern (hyponym, isa, hypernym) extraction over
    documents carrying deterministically appended pattern sentences
    (doc_id % 7 selects the pattern, the doc's own first tokens are
    the hyponyms — same injected-true-positives device as
    _docs_with_dupes).  The SQL oracle rebuilds the identical
    augmented text and runs the IDENTICAL RE2 regexes."""
    import ray.data as rd

    from ..functions.text import hearst_triples

    base = _pq(sf_dir, "documents", ["doc_id", "text"])
    toks = base.text.str.split(" ")
    w1, w2, w3 = toks.str[0], toks.str[1], toks.str[2]
    mod = base.doc_id % 7
    t = base.text.copy()
    t[mod == 0] = (base.text + " systems such as " + w1 + ", " + w2
                   + " and " + w3 + ".")[mod == 0]
    t[mod == 1] = (base.text + " " + w1 + " and other engines.")[mod == 1]
    t[mod == 2] = (base.text + " operators, including " + w2 + " and "
                   + w3 + ".")[mod == 2]
    t[mod == 3] = (base.text + " frameworks, especially " + w1
                   + ".")[mod == 3]
    docs = rd.from_pandas(pd.DataFrame({"doc_id": base.doc_id, "text": t}))
    df = hearst_triples(docs).to_pandas()
    df = df.astype({"doc_id": "int64", "hypo_idx": "int64"})
    return df.sort_values(["doc_id", "pattern", "hypo_idx"]).reset_index(
        drop=True)


def q_sample_priority(sf_dir: str) -> pd.DataFrame:
    """Priority sampling (Duffield/Lund/Thorup): deterministic weighted
    sampling WITHOUT replacement of 50 events, weight = value cents + 1
    — the reproducible weighted analog of q_doc_sample_hash.  The k
    smallest md5-priorities h/w, their IEEE-exact double priorities AND
    the unbiased max(w, 2^52/τ) estimator all hash-match the SQL
    oracle."""
    from ..functions.relational import priority_sample

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def addw(b: pd.DataFrame) -> pd.DataFrame:
        w = np.floor(np.abs(b["value"].to_numpy()) * 100 + 0.5)
        return pd.DataFrame({"event_id": b["event_id"],
                             "weight": w.astype("int64") + 1})

    df = priority_sample(
        ds.map_batches(addw, batch_format="pandas"),
        "event_id", "weight", k=50,
    )
    return df.astype({"event_id": "int64", "weight": "int64"})


def q_embedding_centroid(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroid, integer-quantized for exactness:
    q = floor(x·2^20) (float32→double and ×2^20 are IEEE-exact, floor
    deterministic), per-(label, dim) sums pre-combined per batch via
    one np.add.at — no per-row work, one small groupby exchange; the
    centroid is one int→double division.  The vector analog of the
    kmeans-quantized contract."""
    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b["embedding"].to_numpy())  # (B, D) float32
        q = np.floor(mat.astype(np.float64) * (1 << 20)).astype(np.int64)
        labels, codes = np.unique(b["label"].to_numpy(), return_inverse=True)
        sums = np.zeros((len(labels), q.shape[1]), np.int64)
        np.add.at(sums, codes, q)
        cnt = np.bincount(codes, minlength=len(labels)).astype(np.int64)
        d = q.shape[1]
        return pd.DataFrame({
            "label": np.repeat(labels, d).astype("int64"),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(labels)),
            "s": sums.ravel(),
            "n": np.repeat(cnt, d),
        })

    agg = groupby_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["label", "dim"], [("s", "sum", "sum_q"), ("n", "sum", "n")])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": b["label"].astype("int64"),
            "dim": b["dim"].astype("int64"),
            "sum_q": b["sum_q"].astype("int64"),
            "n": b["n"].astype("int64"),
            "centroid": b["sum_q"].to_numpy("int64").astype("float64")
            / b["n"].to_numpy("int64").astype("float64"),
        })

    df = agg.map_batches(finish, batch_format="pandas").to_pandas()
    return df.sort_values(["label", "dim"]).reset_index(drop=True)


def q_promo_share(sf_dir: str) -> pd.DataFrame:
    """Promo revenue share per ship-month (the TPC-H Q14 shape on the
    columns this corpus has): revenue kept as exact integer
    cents × (100 − discount-%) so the per-month promo ratio is one
    int→double division; the part-type flag arrives by broadcast join
    (part is the small side)."""
    from ..functions.relational import broadcast_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])
    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_type"]).to_pandas()
    joined = broadcast_join(li, part, left_on="l_partkey",
                            right_on="p_partkey")

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["l_extendedprice"].to_numpy("float64") * 100
        ).astype("int64")
        disc = np.round(
            b["l_discount"].to_numpy("float64") * 100).astype("int64")
        rev = cents * (100 - disc)
        promo = b["p_type"].str.startswith("PROMO").to_numpy()
        month = b["l_shipdate"].astype(str).str.slice(0, 7)
        return pd.DataFrame({
            "month": month,
            "promo_rev": np.where(promo, rev, 0),
            "total_rev": rev,
        })

    agg = groupby_agg(
        joined.map_batches(partials, batch_format="pandas"),
        ["month"], [("promo_rev", "sum", "promo_rev"),
                    ("total_rev", "sum", "total_rev")])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "month": b["month"],
            "promo_rev": b["promo_rev"].astype("int64"),
            "total_rev": b["total_rev"].astype("int64"),
            "promo_share": 100.0
            * b["promo_rev"].to_numpy("int64").astype("float64")
            / b["total_rev"].to_numpy("int64").astype("float64"),
        })

    df = agg.map_batches(finish, batch_format="pandas").to_pandas()
    return df.sort_values("month").reset_index(drop=True)


def q_supplier_blocking(sf_dir: str) -> pd.DataFrame:
    """Sorted-neighborhood ER blocking over supplier names: candidate
    pairs within 4 positions of the global (s_name, s_suppkey) order —
    range-bucketed, bucket-local windows, driver-stitched boundaries
    (see dedup.sorted_neighborhood_pairs)."""
    from ..functions.dedup import sorted_neighborhood_pairs

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    df = sorted_neighborhood_pairs(
        sup, key_col="s_name", id_col="s_suppkey", window=4).to_pandas()
    df["dist"] = df["dist"].astype("int64")
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_supplier_lev(sf_dir: str) -> pd.DataFrame:
    """Exact edit-distance verification of sorted-neighborhood ER
    candidates: SN blocking proposes pairs (position distance ≤ 4 in
    the global name order), the vectorized capped Wagner-Fischer DP
    (dedup.levenshtein_capped — P-wide numpy cells, no Python loop
    over pairs) verifies true Levenshtein ≤ 2.  The classic two-stage
    blocking-then-verify ER shape with an EXACT integer verifier —
    unlike q_supplier_typo_pairs' generate-side ed1 neighborhoods,
    this measures the distance of arbitrary candidates."""
    import ray

    from ..functions.dedup import (levenshtein_capped,
                                   sorted_neighborhood_pairs)
    from ..functions.relational import bcast_get

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    cands = sorted_neighborhood_pairs(
        sup, key_col="s_name", id_col="s_suppkey", window=4)
    names = dict(zip(*(lambda d: (d["s_suppkey"], d["s_name"]))(
        sup.to_pandas())))
    ref = ray.put(names)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "lev": pd.Series([], dtype="int64")})
        lut = bcast_get(ref)
        a = b["id_a"].map(lut).to_numpy(object)
        c = b["id_b"].map(lut).to_numpy(object)
        d = levenshtein_capped(a, c, k=2)
        keep = d <= 2
        return pd.DataFrame({
            "id_a": b["id_a"].to_numpy("int64")[keep],
            "id_b": b["id_b"].to_numpy("int64")[keep],
            "lev": d[keep]})

    df = cands.map_batches(verify, batch_format="pandas").to_pandas()
    for c in ("id_a", "id_b", "lev"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_doc_balanced(sf_dir: str) -> pd.DataFrame:
    """Class-balanced downsampling: cap every language at the SAME
    number of documents (k=50), chosen by md5 hash order — the
    deterministic equivalent of per-class uniform sampling for
    training-mix balancing.  Scale shape: the algebraic
    top-k-per-group combiner (grouped_topk), so no language's full
    document list ever co-locates."""
    import hashlib

    from ..functions.relational import grouped_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__h"] = b["doc_id"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        return b

    picked = grouped_topk(
        docs.map_batches(add_hash, batch_format="pandas"),
        ["lang"], "__h", 50, descending=False, tie_break="doc_id")
    df = picked.map_batches(
        lambda b: b[["doc_id", "lang"]], batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_events_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT: the per-user pivoted event-type counts melted back to
    (user_id, event_col, n) rows — explicit zeros kept, which is what
    distinguishes a real unpivot from a sparse groupby.  The melt is
    batch-local (pd.melt, vectorized); the only exchange is the
    pivot's own pre-combined groupby."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def ind(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": b.user_id})
        for t in types:
            out[f"n_{t}"] = (b.event_type == t).astype("int64")
        return out

    pivoted = groupby_agg(
        ds.map_batches(ind, batch_format="pandas"),
        ["user_id"], [(f"n_{t}", "sum", f"n_{t}") for t in types])

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        out = b.melt(id_vars=["user_id"], var_name="event_col",
                     value_name="n")
        out["n"] = out["n"].astype("int64")
        return out

    df = pivoted.map_batches(melt, batch_format="pandas").to_pandas()
    return df.sort_values(["user_id", "event_col"]).reset_index(drop=True)


def q_events_sessions_streaming(sf_dir: str) -> pd.DataFrame:
    """Same sessionization answered by the STATEFUL streaming operator
    (actor-held open sessions across ordered batches) — must agree with
    the batch/SQL result."""
    from ..functions.streaming import sessionize_streaming

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    sessions = sessionize_streaming(ds, gap_seconds=1800)
    agg = (
        sessions.groupby("user_id")
        .agg(n_sessions=("session_start", "size"), n_events=("n_events", "sum"))
        .reset_index()
    )
    agg["n_sessions"] = agg["n_sessions"].astype("int64")
    agg["n_events"] = agg["n_events"].astype("int64")
    return agg.sort_values("user_id").reset_index(drop=True)


def q_events_reorder_sessions(sf_dir: str) -> pd.DataFrame:
    """Sessionization of a DISORDERED stream through the
    ReorderBuffer → Sessionizer actor chain
    (streaming.sessionize_disordered): md5-jittered arrival order
    (±600 s), 300 s allowed lateness — events beyond the released
    watermark drop, counted, excluded from their session.  The drop
    rule reduces to a closed form (ts ≤ runmax of prior chunk maxima
    − lateness) the SQL twin reproduces exactly."""
    from ..functions.streaming import sessionize_disordered

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    sessions = sessionize_disordered(
        ds, gap_seconds=1800, lateness_s=300, jitter_s=600,
        n_buckets=8, batch_rows=4096)
    agg = (sessions.groupby("user_id")
           .agg(n_sessions=("session_start", "size"),
                n_events=("n_events", "sum"))
           .reset_index())
    agg["n_sessions"] = agg["n_sessions"].astype("int64")
    agg["n_events"] = agg["n_events"].astype("int64")
    return agg.sort_values("user_id").reset_index(drop=True)


ORACLE_SQL_REORDER = """
    WITH a AS (
        SELECT user_id, ts, event_id, user_id % 8 AS b,
               epoch_us(ts)
               + (('0x' || substr(md5(event_id::VARCHAR), 1, 8))
                  ::BIGINT % 1200000000) - 600000000 AS arr
        FROM events
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY b ORDER BY arr, event_id) AS rn
        FROM a
    ), ch AS (
        SELECT *, (rn - 1) // 4096 AS c FROM r
    ), cm AS (
        SELECT b, c, max(ts) AS cmax FROM ch GROUP BY b, c
    ), wm AS (
        SELECT b, c, max(cmax) OVER (
            PARTITION BY b ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prevmax
        FROM cm
    ), kept AS (
        SELECT ch.user_id, ch.ts
        FROM ch JOIN wm ON wm.b = ch.b AND wm.c = ch.c
        WHERE wm.prevmax IS NULL
           OR ch.ts > wm.prevmax - INTERVAL 300 SECOND
    )
    SELECT user_id,
           sum(CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
           count(*)                            AS n_events
    FROM (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   AS prev_ts
        FROM kept
    )
    GROUP BY user_id
    ORDER BY user_id
"""


def q_approx_stats(sf_dir: str) -> pd.DataFrame:
    """Sketch-based approximate aggregates (rows-only): HLL distinct
    users + sample quantiles of event value, with the mergeable
    per-batch-sketch shape."""
    from ..functions.sketches import approx_distinct, approx_quantiles

    ds = read_table(sf_dir, "events", columns=["user_id", "value"])
    est_users = approx_distinct(ds, "user_id", p=12)
    q10, q50, q90 = approx_quantiles(ds, "value", [0.1, 0.5, 0.9])
    return pd.DataFrame(
        {
            "approx_distinct_users": [round(est_users, 1)],
            "value_p10": [round(q10, 4)],
            "value_p50": [round(q50, 4)],
            "value_p90": [round(q90, 4)],
        }
    )


def q_nation_region_cross(sf_dir: str) -> pd.DataFrame:
    """CROSS JOIN (completes the join family): nation × region as a
    broadcast nested loop — the small side ships once via ray.put,
    each batch emits the cartesian product with one numpy repeat/tile,
    no shuffle.  Guarded against big×big cartesian mistakes."""
    from ..functions.relational import cross_join

    nation = read_table(sf_dir, "nation", columns=["n_name"])
    region = read_table(
        sf_dir, "region", columns=["r_name"]).to_pandas()
    df = cross_join(nation, region).to_pandas()
    return df.sort_values(["n_name", "r_name"]).reset_index(drop=True)


def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Context-window chunking (training-sample preparation): 200-char
    chunks every 150 chars (50 overlap) per document — stateless
    flat-map, chunks never cross documents, vectorized str.slice per
    chunk offset.  Verified against the DuckDB generate_series +
    substr oracle byte-for-byte."""
    from ..functions.text import chunk_documents

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = chunk_documents(docs, size=200, overlap=50).to_pandas()
    return df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def q_doc_packed(sf_dir: str) -> pd.DataFrame:
    """Chunk → count tokens → greedy-pack into 64-token training
    sequences (rows-only: greedy reset packing is not SQL-expressible;
    the invariants — no bin over budget, bins contiguous, reference
    greedy agreement — are pytest-pinned).  The full training-sample
    preparation path: chunk_documents feeds pack_sequences with no
    shuffle between them except the packing buckets."""
    from ..functions.text import chunk_documents, pack_sequences

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunks = chunk_documents(docs, size=200, overlap=50)
    with_tokens = chunks.map_batches(
        lambda b: b.assign(
            n_tokens=b.chunk.str.count(r"\S+").astype("int64")),
        batch_format="pandas")
    packed = pack_sequences(
        with_tokens, budget=64,
        order_cols=["doc_id", "chunk_idx"]).to_pandas()
    out = (packed.groupby("bin_id", as_index=False)
           .agg(n_items=("chunk_idx", "size"),
                n_tokens=("n_tokens", "sum"),
                any_over=("over_budget", "any")))
    out["n_items"] = out["n_items"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("bin_id").reset_index(drop=True)


def q_events_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters over the event users (rows-only: the
    estimates carry a deterministic n/(k+1) error bound rather than SQL
    equality) — one exact per-batch value_counts compressed to k
    counters, merged on the driver; the shuffle moves ≤k pairs per
    batch, never the values."""
    from ..functions.sketches import heavy_hitters

    ds = read_table(sf_dir, "events", columns=["user_id"])
    df = heavy_hitters(ds, "user_id", k=64)
    df["value"] = df["value"].astype("int64")
    return df.sort_values(
        ["est_count", "value"], ascending=[False, True]
    ).reset_index(drop=True)


def q_events_cms(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch point-frequency estimates for every event user
    (width 64 × depth 4, small enough that bucket collisions genuinely
    over-count at sf0.01+) vs the exact counts — md5 bucket hashes make
    the whole sketch DETERMINISTIC and hash-comparable against a SQL
    oracle that rebuilds the identical counter matrix.  Build is one
    combiner-fed groupby over ≤ depth×width partial rows per batch; the
    one-sided CMS bound est ≥ exact is asserted in the output."""
    from ..functions.relational import groupby_agg
    from ..functions.sketches import cms_frequencies

    ds = read_table(sf_dir, "events", columns=["user_id"])
    _counters, estimate = cms_frequencies(ds, "user_id", width=64, depth=4)
    exact = groupby_agg(
        ds, ["user_id"], [("user_id", "count", "exact")]
    ).to_pandas()
    exact["est"] = estimate(exact["user_id"].to_numpy())
    exact["overcount"] = exact["est"] - exact["exact"]
    df = exact.astype({"user_id": "int64", "exact": "int64",
                       "est": "int64", "overcount": "int64"})
    assert (df["overcount"] >= 0).all()
    return df.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only; codec stubbed)
# ---------------------------------------------------------------------------


def q_multimodal_decode(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.multimodal import decode_features, synthesize_media

    media = rd.from_arrow(synthesize_media(200))
    df = decode_features(media).to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)


def q_multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Video frame-sampling fan-out (flat-map shape, actor pool, codec
    stubbed; rows-only)."""
    import ray.data as rd

    from ..functions.multimodal import SampleVideoFrames, synthesize_video

    vids = rd.from_arrow(synthesize_video(100))
    df = vids.map_batches(
        SampleVideoFrames, fn_constructor_kwargs={"every": 10, "fake": True},
        batch_size=16, batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    df["frame_mean"] = df["frame_mean"].round(4)
    return df.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_multimodal_builtin(sf_dir: str) -> pd.DataFrame:
    """GENUINE decode through the actor-pool stages with zero
    third-party codecs: deterministic real PNG (all five scanline
    filters) / BMP / PPM / WAV / uncompressed-AVI payloads (plus
    per-modality junk rows) through DecodeImage + DecodeAudio +
    SampleVideoFrames in fake=None (auto) mode — the builtin
    pure-numpy/stdlib tier parses the containers, junk routes to
    problem rows (rows-only; the codec outputs are pinned exactly by
    test_multimodal_stages)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.multimodal import (
        DecodeAudio,
        DecodeImage,
        SampleVideoFrames,
        encode_avi,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    ids, blobs, mimes = [], [], []
    for i in range(120):
        img = rng.integers(0, 256, (8 + i % 5, 8 + i % 7, 3),
                           dtype=np.uint8)
        if i % 6 == 5:
            ids.append(f"junk{i:04d}")
            blobs.append(b"\xff\xd8\xff\xe0" + bytes(img[..., 0].ravel()[:64]))
            mimes.append("image/jpeg")
        elif i % 6 == 4:
            from ..functions.jpeg import encode_jpeg, \
                encode_jpeg_progressive

            # alternate baseline and PROGRESSIVE (SOF2) streams — both
            # decode genuinely through the builtin tier
            enc = encode_jpeg if i % 12 == 4 else encode_jpeg_progressive
            ids.append(f"jpg{i:04d}")
            blobs.append(enc(
                img, quality=90,
                subsample="4:2:0" if i % 12 == 4 else "4:4:4"))
            mimes.append("image/jpeg")
        elif i % 6 == 1:
            from ..functions.gif import encode_gif

            ids.append(f"gif{i:04d}")
            blobs.append(encode_gif(img, interlace=bool(i % 12 == 1)))
            mimes.append("image/gif")
        elif i % 3 == 2:
            ids.append(f"png{i:04d}")
            blobs.append(encode_png(img, filter_type=i % 5))
            mimes.append("image/png")
        elif i % 2:
            ids.append(f"bmp{i:04d}")
            blobs.append(encode_bmp(img))
            mimes.append("image/bmp")
        else:
            ids.append(f"ppm{i:04d}")
            blobs.append(encode_ppm(img))
            mimes.append("image/x-portable-pixmap")
    from ..functions.tiff import encode_tiff

    for i in range(120, 140):
        img = rng.integers(0, 256, (8 + i % 5, 8 + i % 7, 3),
                           dtype=np.uint8)
        ids.append(f"tif{i:04d}")
        blobs.append(encode_tiff(
            img, compression="packbits" if i % 2 else "none",
            rows_per_strip=4 + i % 9))
        mimes.append("image/tiff")
    media = rd.from_arrow(pa.table({
        "media_id": ids, "media": pa.array(blobs, pa.large_binary()),
        "mime": mimes,
        "width": pa.array([0] * len(ids), pa.int32()),
        "height": pa.array([0] * len(ids), pa.int32()),
    }))
    img_df = media.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": None},
        batch_size=32, batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    img_df["px_mean"] = img_df["px_mean"].round(4)
    img_df["px_std"] = img_df["px_std"].round(4)

    from ..functions.multimodal import encode_wav_ulaw

    t = np.arange(400) / 8000.0
    aud = rd.from_arrow(pa.table({
        "media_id": [f"wav{i:03d}" for i in range(40)],
        "media": pa.array(
            [(encode_wav_ulaw if i % 4 == 3 else encode_wav)(
                0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t), 8000)
             for i in range(40)], pa.large_binary()),
        "sample_rate": pa.array([8000] * 40, pa.int32()),
    }))
    aud_df = aud.map_batches(
        DecodeAudio, fn_constructor_kwargs={"fake": None},
        batch_size=16, batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    aud_df = aud_df.rename(columns={"duration_s": "px_mean",
                                    "rms": "px_std"})

    vids, vblobs, nfr = [], [], []
    for i in range(20):
        n = 3 + i % 4
        frames = rng.integers(0, 256, (n, 6 + i % 3, 8 + i % 5, 3),
                              dtype=np.uint8)
        vids.append(f"avi{i:03d}")
        vblobs.append(encode_avi(
            frames, fps=12.0, codec="MJPG" if i % 5 == 4 else "DIB"))
        nfr.append(n)
    vids.append("vjunk")
    vblobs.append(b"\x00\x00\x01\xbampeg-junk")
    nfr.append(3)
    vid_ds = rd.from_arrow(pa.table({
        "media_id": vids,
        "media": pa.array(vblobs, pa.large_binary()),
        "n_frames": pa.array(nfr, pa.int32()),
        "fps": pa.array([12.0] * len(vids), pa.float32()),
    }))
    vid_df = vid_ds.map_batches(
        SampleVideoFrames, fn_constructor_kwargs={"every": 2, "fake": None},
        batch_size=8, batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    vid_df["media_id"] = (vid_df["media_id"] + "#f"
                          + vid_df["frame_idx"].astype(str))
    vid_df = vid_df.drop(columns=["frame_idx"]).rename(
        columns={"frame_mean": "px_mean"})
    vid_df["px_std"] = np.nan

    out = pd.concat([img_df, aud_df, vid_df], ignore_index=True)
    out["px_mean"] = out["px_mean"].round(4)
    out["px_std"] = out["px_std"].round(4)
    return out.sort_values("media_id").reset_index(drop=True)


def q_multimodal_audio(sf_dir: str) -> pd.DataFrame:
    """Audio feature extraction (duration/RMS, codec stubbed; rows-only)."""
    import ray.data as rd

    from ..functions.multimodal import DecodeAudio, synthesize_audio

    aud = rd.from_arrow(synthesize_audio(150))
    df = aud.map_batches(
        DecodeAudio, fn_constructor_kwargs={"fake": True},
        batch_size=16, batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    df["duration_s"] = df["duration_s"].round(6)
    df["rms"] = df["rms"].round(4)
    return df.sort_values("media_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB, same parquet views)
# ---------------------------------------------------------------------------



def q_multimodal_audio_features(sf_dir: str) -> pd.DataFrame:
    """Frame-wise audio features over GENUINE WAV payloads (PCM16,
    µ-law and ADPCM containers all through the builtin tier): exact
    int64 ZCR / q15 energy / peak per file via the AudioFrameFeatures
    actor pool; junk rows route to problem rows (rows-only — SQL
    cannot decode RIFF; the features are pinned by pytest on closed-
    form waveforms)."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.multimodal import (AudioFrameFeatures, encode_wav,
                                        encode_wav_adpcm,
                                        encode_wav_ulaw)

    rng = np.random.default_rng(7)
    ids, blobs = [], []
    for i in range(90):
        n = 1200 + (i * 37) % 800
        t = np.arange(n)
        wave = (0.4 * np.sin(2 * np.pi * t * (3 + i % 5) / 100)
                + 0.05 * rng.standard_normal(n))
        enc = (encode_wav, encode_wav_ulaw, encode_wav_adpcm)[i % 3]
        ids.append(f"aud{i:05d}")
        blobs.append(enc(wave, 16000))
    ids.append("junk00000")
    blobs.append(b"RIFFxxxxWAVEjunkjunk")
    aud = rd.from_arrow(pa.Table.from_pydict(
        {"media_id": ids, "media": blobs}))
    df = aud.map_batches(
        AudioFrameFeatures, batch_size=16, batch_format="pyarrow",
        concurrency=(1, 4)).to_pandas()
    for c in ("n_samples", "n_frames", "zcr", "energy_q", "peak_q"):
        df[c] = df[c].astype("int64")
    return df.sort_values("media_id").reset_index(drop=True)


def q_events_moving(sf_dir: str) -> pd.DataFrame:
    """Bounded window FRAME (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    + LEAD, per user ordered by (ts, event_id): 3-event moving sum of
    EXACT integer cents (the q_orders_share trick — int sums are
    order-free, so the hash matches any engine) and the next event id
    (-1 at the partition edge).  Bucketed by user hash; inside a bucket
    the frame sum is THREE masked shifted adds over the sorted arrays
    and LEAD is one shifted compare — no per-user loop, no per-row
    loop (completes the window family: rank/dense_rank, cume_dist/
    percent_rank, ntile/row_number, lag, first/last_value, ratio-to-
    report are the other frames)."""
    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    nb = default_n_buckets()

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        c = np.round(g["value"].to_numpy("float64") * 100).astype("int64")
        e = g["event_id"].to_numpy("int64")
        w = c.copy()
        if len(g) > 1:
            m1 = u[1:] == u[:-1]
            w[1:][m1] += c[:-1][m1]
        if len(g) > 2:
            m2 = u[2:] == u[:-2]
            w[2:][m2] += c[:-2][m2]
        nxt = np.full(len(g), -1, dtype="int64")
        if len(g) > 1:
            nxt[:-1][m1] = e[1:][m1]
        return pd.DataFrame({"event_id": e, "user_id": g.user_id,
                             "w3_cents": w, "lead_event": nxt})

    df = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(
        lambda g: win(g.drop(columns="__bk")), batch_format="pandas",
    ).to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_nation_suppliers(sf_dir: str) -> pd.DataFrame:
    """Grouped ORDERED string concatenation (string_agg ORDER BY):
    supplier names per nation, value-sorted.  Nation is broadcast
    (tiny side); the concat is combiner-shaped — one pre-joined
    partial string per (nation, batch) moves, the finish re-sorts
    each group's values once (relational.ordered_concat, mode=auto
    degrading driver -> shuffle co-location at the guard)."""
    from ..functions.relational import ordered_concat

    sup = read_table(sf_dir, "supplier", columns=["s_name", "s_nationkey"])
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    joined = broadcast_join(sup, nation,
                            left_on="s_nationkey", right_on="n_nationkey")
    df = ordered_concat(joined, ["n_name"], "s_name",
                        sep="|", alias="names").to_pandas()
    df["n"] = df["n"].astype("int64")
    return df[["n_name", "names", "n"]].sort_values("n_name").reset_index(
        drop=True)


def q_doc_unigram(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM document scoring (CCNet/KenLM quality-signal shape):
    corpus token counts (pre-combined groupby) broadcast once, then
    per-doc integer-exact features in one stateless pass.  The float
    LM score (avg_neg_logprob) is computed too but pytest-pinned and
    EXCLUDED here so the oracle hash stays integer-exact."""
    from ..functions.text import unigram_features

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = unigram_features(docs, id_col="doc_id").to_pandas()
    df = df.drop(columns=["avg_neg_logprob"])
    for c in ["n_tokens", "sum_tok_freq", "min_freq", "n_hapax"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)




def q_doc_dsir(sf_dir: str) -> pd.DataFrame:
    """DSIR importance scores: target = English docs, source = whole
    corpus; score = Σ tf·ln(p_tgt/p_src) under add-one-smoothed unigram
    LMs — the data-mixing selection signal, one tokenize pass."""
    from ..functions.text import dsir_scores

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"])
    flagged = docs.map_batches(
        lambda b: b.assign(is_tgt=(b["lang"] == "en")).drop(columns="lang"),
        batch_format="pandas")
    df = dsir_scores(flagged, id_col="doc_id").to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment (80/10/10 by md5-prefix
    range — the reproducible split every training pipeline needs; a
    doc's split never changes as the corpus grows, unlike fractional
    random_split) with a per-(lang, split) stratification report.
    One stateless pass + one pre-combined groupby."""
    import hashlib

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    # 8-hex-digit thresholds: 0.8·2^32 and 0.9·2^32, floored
    t_train, t_val = 3435973836, 3865470566

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = b["doc_id"].astype(str).map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
        split = np.where(h < t_train, "train",
                         np.where(h < t_val, "val", "test"))
        return pd.DataFrame({"lang": b["lang"], "split": split,
                             "one": np.int64(1)})

    df = groupby_agg(docs.map_batches(assign, batch_format="pandas"),
                     ["lang", "split"], [("one", "sum", "n")]).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values(["lang", "split"]).reset_index(drop=True)


def q_orders_pareto(sf_dir: str) -> pd.DataFrame:
    """Pareto / cumulative-share analysis: customers ordered by exact
    revenue cents desc, integer cumulative sums (order fixed by
    (rev desc, custkey) so the cumsum is deterministic), share = one
    int→double division per row, in_top80 = predecessor-cumulative
    < 80% as a pure integer comparison (cum−rev)·5 < total·4.  The
    per-customer aggregate is distributed (pre-combined groupby);
    the ordered scan runs on that one-row-per-customer table."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": b["o_custkey"],
            "c": np.round(b["o_totalprice"].to_numpy("float64")
                          * 100).astype("int64"),
        })

    agg = groupby_agg(ds.map_batches(cents, batch_format="pandas"),
                      ["o_custkey"], [("c", "sum", "rev_cents")]
                      ).to_pandas()
    agg["rev_cents"] = agg["rev_cents"].astype("int64")
    agg = agg.sort_values(["rev_cents", "o_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    total = int(agg.rev_cents.sum())
    agg["cum_cents"] = agg.rev_cents.cumsum().astype("int64")
    agg["share"] = (agg.cum_cents.to_numpy("int64").astype("float64")
                    / float(total))
    prev = agg.cum_cents.to_numpy("int64") - agg.rev_cents.to_numpy("int64")
    agg["in_top80"] = prev * 5 < total * 4
    return agg.reset_index(drop=True)


def q_doc_dropout(sf_dir: str) -> pd.DataFrame:
    """Deterministic word-dropout augmentation (the EDA/word-dropout
    training-data trick, public): token i of a doc is dropped iff
    uint32(md5(doc_id|i|token)) < floor(0.2·2^32) — a reproducible
    20% draw any engine replays.  Fully batch-local (the explode is
    within-row): no shuffle, one stateless pass."""
    import hashlib

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    threshold = 858993459  # floor(0.2 * 2^32)

    def aug(b: pd.DataFrame) -> pd.DataFrame:
        lists = b["text"].str.split(" ")
        sizes = lists.str.len().to_numpy("int64")
        total = int(sizes.sum())
        flat = (np.concatenate(
            [np.asarray(v, dtype=object) for v in lists])
            if total else np.array([], dtype=object))
        doc = b["doc_id"].to_numpy().repeat(sizes)
        pos = np.concatenate(
            [np.arange(1, s + 1) for s in sizes]) if total else \
            np.array([], np.int64)
        t = pd.DataFrame({"doc_id": doc, "i": pos, "tok": flat})
        h = (t["doc_id"].astype(str) + "|" + t["i"].astype(str)
             + "|" + t["tok"]).map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
        kept = t[h.to_numpy() >= threshold]
        base = pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_tokens": sizes,
        })
        k = kept.sort_values(["doc_id", "i"]).groupby(
            "doc_id", as_index=False).agg(
            n_kept=("tok", "size"),
            aug_text=("tok", " ".join))
        out = base.merge(k, on="doc_id", how="left")
        out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
        out["aug_text"] = out["aug_text"].fillna("")
        return out

    df = docs.map_batches(aug, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Data-profiling / expectations pass over lineitem: per column,
    null count, exact distinct count, and min/max (rendered as
    strings so one long-format table carries mixed types).  Shape:
    one stateless partial pass (per-batch null counts + min/max
    combiners) plus one two-phase exact distinct per column — the
    profile every ingestion pipeline runs before training."""
    from ..functions.relational import distinct_on

    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    ds = read_table(sf_dir, "lineitem", columns=cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # one WIDE row per batch: min/max stay TYPED across the merge
        # (stringified only at the end — a lexicographic min over
        # stringified numbers would be wrong: "10.0" < "2.0")
        row: dict = {}
        for c in cols:
            s = b[c]
            row[f"null__{c}"] = np.int64(s.isna().sum())
            row[f"mn__{c}"] = (s.dropna().min()
                               if s.notna().any() else None)
            row[f"mx__{c}"] = (s.dropna().max()
                               if s.notna().any() else None)
        return pd.DataFrame([row])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()

    def render(x) -> str:
        if hasattr(x, "strftime"):
            return x.strftime("%Y-%m-%d")
        return str(x)

    rows = []
    for c in cols:
        rows.append({
            "column": c,
            "n_null": int(parts[f"null__{c}"].sum()),
            "n_distinct": distinct_on(ds.select_columns([c]),
                                      [c]).count(),
            "min_str": render(parts[f"mn__{c}"].dropna().min()),
            "max_str": render(parts[f"mx__{c}"].dropna().max()),
        })
    agg = pd.DataFrame(rows).astype({"n_null": "int64",
                                     "n_distinct": "int64"})
    return agg.sort_values("column").reset_index(drop=True)


def q_events_running_total(sf_dir: str) -> pd.DataFrame:
    """Global running sum + running max of event value in event-id
    order — the distributed two-phase prefix scan
    (:func:`~cpg_ray.functions.streaming.ordered_scan`): local scan per
    range, K-row exclusive combine on the driver, offsets broadcast
    back.  Values scale to integer cents (floor(v*100+0.5)) so the
    running sums are exact int64 in any association."""
    from ..functions.streaming import ordered_scan

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b.event_id.astype("int64"),
            "v": np.floor(b.value.to_numpy(np.float64) * 100.0
                          + 0.5).astype("int64"),
        })

    scanned = ordered_scan(
        ev.map_batches(prep, batch_format="pandas"), "event_id",
        [("v", "sum", "run_sum_cents"), ("v", "max", "run_max_cents")])
    df = scanned.to_pandas()
    df["run_sum_cents"] = df["run_sum_cents"].astype("int64")
    df["run_max_cents"] = df["run_max_cents"].astype("int64")
    return (df[["event_id", "run_sum_cents", "run_max_cents"]]
            .sort_values("event_id").reset_index(drop=True))


# CUSUM drift allowance / alarm threshold, in integer cents.  The
# events value column averages ~49.6, so k=60.00 makes the one-sided
# statistic reset on typical traffic and climb only on sustained
# high-value bursts; h=500.00 fires on a genuine level shift.
CUSUM_K_CENTS = 6_000
CUSUM_H_CENTS = 50_000


def q_events_cusum(sf_dir: str) -> pd.DataFrame:
    """One-sided CUSUM change-point statistic (Page 1954) over the
    global event stream: s_i = max(0, s_{i-1} + (v_i − k)) with alarm
    at s_i ≥ h.  The recursion is non-associative, but the classic
    prefix identity s_i = P_i − min(0, min_{j≤i} P_j) (P = prefix sum
    of centered values) turns it into ONE fused distributed scan —
    :func:`~cpg_ray.functions.streaming.ordered_scan` with a ``sum``
    spec and the fused ``summin`` spec (running min OF the running
    sum; segment-scan combine min(local + sum_offset, carry)) — so
    change detection over a 100-TB stream is a single bucket exchange
    plus a K-row driver combine, never a sequential pass.
    Values scale to integer cents so every intermediate is exact
    int64.  Reference analog: the EOG INDEX property makes evaluation
    order a column (Properties.java:43-49); here running *state* is
    recovered from order-as-data."""
    from ..functions.streaming import ordered_scan

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b.event_id.astype("int64"),
            "dv": np.floor(b.value.to_numpy(np.float64) * 100.0
                           + 0.5).astype("int64") - CUSUM_K_CENTS,
        })

    scanned = ordered_scan(
        ev.map_batches(prep, batch_format="pandas"), "event_id",
        [("dv", "sum", "p"), ("dv", "summin", "pmin")])
    df = scanned.to_pandas()
    p = df["p"].to_numpy(np.int64)
    cusum = p - np.minimum(df["pmin"].to_numpy(np.int64), 0)
    out = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "cusum_cents": cusum.astype("int64"),
        "alarm": cusum >= CUSUM_H_CENTS,
    })
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_zorder(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) clustering keys over (user_id, event-time):
    the data-layout primitive behind multi-dimensional file pruning —
    interleave the low 16 bits of both dimensions so a zkey-sorted
    file holds a small range of EACH (Delta/Iceberg OPTIMIZE ZORDER
    shape).  Integer-only, so the unrolled shift/mask SQL oracle
    matches bit-for-bit; the 16-way zbucket is the range partition a
    Z-order writer would ship each row to."""
    from ..functions.layout import add_zorder_key

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        secs = b.ts.to_numpy().astype("datetime64[us]").astype("int64") \
            // 1_000_000
        return pd.DataFrame({
            "event_id": b.event_id.astype("int64"),
            "xk": b.user_id.to_numpy("int64") & 0xFFFF,
            "yk": secs & 0xFFFF,
        })

    keyed = add_zorder_key(
        ev.map_batches(prep, batch_format="pandas"), "xk", "yk",
        n_buckets=16)
    df = keyed.to_pandas()
    df["zkey"] = df["zkey"].astype("int64")
    df["zbucket"] = df["zkey_bucket"].astype("int64")
    return (df[["event_id", "zkey", "zbucket"]]
            .sort_values("event_id").reset_index(drop=True))


def q_events_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-type z-score normalization of value cents (the ML
    feature-scaling step): mean and population std come from EXACT
    integer sums (the q_lineitem_stats contract), then each row is one
    double expression — broadcast the tiny moments table, one
    stateless pass over the events."""
    import numpy as np

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["value"].to_numpy("float64") * 100).astype("int64")
        return pd.DataFrame({"event_type": b["event_type"],
                             "c": cents, "c2": cents * cents,
                             "one": np.int64(1)})

    mom = groupby_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["event_type"], [("c", "sum", "s1"), ("c2", "sum", "s2"),
                         ("one", "sum", "n")]).to_pandas()
    # population std from exact sums, the literal double formula
    mom["mean"] = mom.s1.astype("float64") / mom.n.astype("float64")
    mom["std"] = np.sqrt(
        mom.s2.astype("float64") / mom.n.astype("float64")
        - mom["mean"] * mom["mean"])
    moments = {t: (m, s) for t, m, s in
               zip(mom.event_type, mom["mean"], mom["std"])}

    def score(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["value"].to_numpy("float64") * 100).astype("int64")
        m = b["event_type"].map(lambda t: moments[t][0]).to_numpy()
        s = b["event_type"].map(lambda t: moments[t][1]).to_numpy()
        return pd.DataFrame({
            "event_id": b["event_id"], "event_type": b["event_type"],
            "z": (cents.astype("float64") - m) / s,
        })

    df = ds.map_batches(score, batch_format="pandas").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_doc_mix_weights(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled domain mixing weights (the multilingual /
    multi-domain LM sampling formula, α = 0.5: sample probability
    ∝ size^α so small domains up-weight): per source, the exact int64
    character budget, w_scaled = floor(sqrt(chars)·10⁹) (one IEEE
    sqrt per domain — deterministic), the exact integer w_total, and
    share = w_scaled / w_total as the single int→double divide.  One
    combiner-shaped exchange (per-batch partial sums per source)."""
    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b.source,
            "n_chars": b.n_chars.astype("int64"),
            "one": np.ones(len(b), dtype=np.int64),
        })

    agg = groupby_agg(docs.map_batches(prep, batch_format="pandas"),
                      ["source"], [("one", "sum", "n_docs"),
                                   ("n_chars", "sum", "chars")])
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["chars"] = df["chars"].astype("int64")
    df["w_scaled"] = np.floor(
        np.sqrt(df["chars"].to_numpy(np.float64)) * 1e9).astype("int64")
    total = int(df["w_scaled"].sum())
    df["w_total"] = np.int64(total)
    df["share"] = df["w_scaled"].to_numpy(np.float64) / np.float64(total)
    return (df[["source", "n_docs", "chars", "w_scaled", "w_total",
                "share"]]
            .sort_values("source").reset_index(drop=True))


def q_doc_class_weights(sf_dir: str) -> pd.DataFrame:
    """Inverse-frequency class weights per language (the sklearn
    'balanced' formula n_total / (n_classes · n_lang)): exact integer
    counts, one double division."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    cnt = groupby_agg(docs, ["lang"],
                      [("doc_id", "count", "n")]).to_pandas()
    total = int(cnt.n.sum())
    k = len(cnt)
    cnt["n"] = cnt["n"].astype("int64")
    cnt["weight"] = float(total) / (
        float(k) * cnt["n"].to_numpy("int64").astype("float64"))
    return (cnt[["lang", "n", "weight"]]
            .sort_values("lang").reset_index(drop=True))


def q_events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users grouped by first-activity day; for day
    offsets 0-2, how many of each cohort were active.  Exact two-phase
    distinct (user, day) + one hash join on user — the cohort table is
    as big as the user set, so it is NOT broadcast."""
    from ..functions.relational import distinct_on, hash_join

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b.user_id,
                             "day": b.ts.dt.floor("D")})

    act = distinct_on(ds.map_batches(days, batch_format="pandas"),
                      ["user_id", "day"]).materialize()
    cohort = groupby_agg(act, ["user_id"], [("day", "min", "cohort")])
    joined = hash_join(act, cohort.materialize(), on="user_id")

    def offsets(b: pd.DataFrame) -> pd.DataFrame:
        d = ((b["day"] - b["cohort"]).dt.days).astype("int64")
        out = pd.DataFrame({"cohort": b["cohort"], "d": d,
                            "user_id": b["user_id"]})
        return out[(out.d >= 0) & (out.d <= 2)]

    per = joined.map_batches(offsets, batch_format="pandas")
    df = groupby_agg(per, ["cohort", "d"],
                     [("user_id", "count", "n_users")]).to_pandas()
    for c in ["d", "n_users"]:
        df[c] = df[c].astype("int64")
    return df.sort_values(["cohort", "d"]).reset_index(drop=True)


def q_events_funnel(sf_dir: str) -> pd.DataFrame:
    """Funnel analysis: per user, the first 'click' and the first
    'purchase' AFTER that click; converted = purchase within 1 h.
    One pre-combined groupby gets each user's first click; the
    after-click first purchase needs the pair co-located — one
    user-bucketed exchange, the q_events_lag shape."""
    import numpy as np

    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    nb = default_n_buckets()

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        clicks = (g[g.event_type == "click"]
                  .groupby("user_id", as_index=False)["ts"].min()
                  .rename(columns={"ts": "first_click"}))
        pur = (g[g.event_type == "purchase"][["user_id", "ts"]]
               .merge(clicks, on="user_id"))
        pur = pur[pur.ts > pur.first_click]
        fp = (pur.groupby("user_id", as_index=False)["ts"].min()
              .rename(columns={"ts": "first_purchase"}))
        out = clicks.merge(fp, on="user_id", how="left")
        out["converted_1h"] = (
            out["first_purchase"].notna()
            & ((out["first_purchase"] - out["first_click"])
               <= pd.Timedelta(hours=1)))
        return out

    df = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(funnel, batch_format="pandas").to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


def q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    """Watermarked tumbling-window counts with allowed lateness and
    late-event routing (streaming.TumblingWindower, the Beam/Flink
    model): per event type — its own ordered stream — 10-minute
    windows, 10-minute lateness; rows more than the allowance behind
    the running max arrive flagged late.  The oracle replays the
    watermark with one running-max window function."""
    from ..functions.streaming import tumbling_window_counts

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "ts"])
    return tumbling_window_counts(ds, key_col="event_type",
                                  window_s=600, lateness_s=600)


def q_events_scd2(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension (type 2) intervals: each user's event
    stream becomes (user_id, event_type, valid_from, valid_to) rows
    where valid_to is the NEXT event's timestamp (NULL on the open
    current row) — the LEAD shape of q_events_lag, same user-hash
    bucketing, one vectorized shift per bucket."""
    import numpy as np

    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nb = default_n_buckets()

    def lead(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        nxt = g["ts"].shift(-1)
        last = np.r_[g["user_id"].values[1:] != g["user_id"].values[:-1],
                     True]
        nxt[last] = pd.NaT
        return pd.DataFrame({
            "event_id": g.event_id, "user_id": g.user_id,
            "event_type": g.event_type,
            "valid_from": g.ts, "valid_to": nxt,
        })

    df = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(lead, batch_format="pandas").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_events_kmv(sf_dir: str) -> pd.DataFrame:
    """KMV distinct-user sketch per event type — the DETERMINISTIC
    sketch (md5 order), so unlike HLL (q_approx_stats) the estimate
    itself is oracle-paired bit-for-bit."""
    from ..functions.sketches import kmv_distinct

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    df = kmv_distinct(ds, group_col="event_type", value_col="user_id",
                      k=16)
    return df.sort_values("event_type").reset_index(drop=True)


def q_events_gapfill(sf_dir: str) -> pd.DataFrame:
    """Time-series gap filling: hourly event counts per type with
    MISSING hours materialized as zero rows over each type's own
    [min, max] hour span — the resample/asfreq shape.  The dense hour
    range is generated per type from its (min, max, counts) aggregate;
    only the aggregate moves, never the events."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def hours(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "hour": b["ts"].dt.floor("h"),
        })

    agg = groupby_agg(
        ds.map_batches(hours, batch_format="pandas"),
        ["event_type", "hour"], [("hour", "count", "n")]).to_pandas()
    frames = []
    for t, sub in agg.groupby("event_type", sort=True):
        full = pd.DataFrame({"hour": pd.date_range(
            sub["hour"].min(), sub["hour"].max(), freq="h")})
        m = full.merge(sub[["hour", "n"]], on="hour", how="left")
        m["n"] = m["n"].fillna(0).astype("int64")
        m.insert(0, "event_type", t)
        frames.append(m)
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(["event_type", "hour"]).reset_index(drop=True)


def q_events_winsor(sf_dir: str) -> pd.DataFrame:
    """Winsorized per-type revenue: clip value-cents at the exact
    interpolated [p10, p90] (the percentile_cont lerp, bit-identical
    to DuckDB), keeping the middle mass as an EXACT integer sum and
    the clipped tails as counts × boundary — one double expression
    with fixed association, so the hash matches despite the float
    boundaries.  Same co-locate-per-type shape as q_events_quantiles
    (a handful of groups is the query's own cardinality)."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def winsor(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            g["value"].dropna().to_numpy("float64") * 100
        ).astype("int64")
        s = np.sort(cents).astype("float64")

        def pc(q: float) -> float:
            h = (len(s) - 1) * q
            lo_i, hi_i = int(np.floor(h)), int(np.ceil(h))
            return float(s[lo_i] + (s[hi_i] - s[lo_i]) * (h - lo_i))

        lo, hi = pc(0.10), pc(0.90)
        f = cents.astype("float64")
        below = f < lo
        above = f > hi
        n_below = int(below.sum())
        n_above = int(above.sum())
        sum_mid = int(cents[~below & ~above].sum())
        return pd.DataFrame({
            "event_type": [g.event_type.iloc[0]],
            "n": [np.int64(len(cents))],
            "n_below": [np.int64(n_below)],
            "n_above": [np.int64(n_above)],
            "lo": [lo], "hi": [hi],
            "winsor_sum": [float(sum_mid) + n_below * lo
                           + n_above * hi],
        })

    df = ds.groupby("event_type").map_groups(
        winsor, batch_format="pandas").to_pandas()
    for c in ["n", "n_below", "n_above"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


def q_supplier_er(sf_dir: str) -> pd.DataFrame:
    """End-to-end entity resolution: FastSS edit-distance-1 candidate
    pairs (linear in total chars) → bounded min-label propagation →
    cluster id per DISTINCT supplier name, singletons keeping their
    own name.  Both engines run the SAME 8 rounds, so the hashes match
    even on a hypothetical >8-diameter typo chain."""
    from ..functions.dedup import ed1_pairs
    from ..functions.graphalgo import label_components

    sup = read_table(sf_dir, "supplier", columns=["s_name"])
    pairs = ed1_pairs(sup, "s_name").materialize()
    comp = label_components(pairs, src="a", dst="b",
                            rounds=8).to_pandas()
    names = sup.to_pandas().drop_duplicates().rename(
        columns={"s_name": "name"})
    df = names.merge(comp.rename(columns={"entity": "name"}),
                     on="name", how="left")
    df["cluster"] = df["component"].where(
        df["component"].notna(), df["name"])
    return (df[["name", "cluster"]]
            .sort_values("name").reset_index(drop=True))


def q_customer_fs(sf_dir: str) -> pd.DataFrame:
    """Fellegi-Sunter probabilistic record linkage over customers
    blocked by nation (dedup.fellegi_sunter_scores): u-probabilities
    estimated from per-field value frequencies, m fixed at 0.95,
    per-field milli-log-odds floored to exact int64 terms (the entropy
    float discipline); returns the pairs the model calls matches
    (score > 0) — agreement on RARE buckets is what pushes a pair
    over the line."""
    from ..functions.dedup import fellegi_sunter_scores

    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey", "c_acctbal",
                             "c_mktsegment"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["c_acctbal"].to_numpy("float64") * 100).astype("int64")
        return pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "c_nationkey": b["c_nationkey"],
            "seg": b["c_mktsegment"],
            "bal_bucket": np.floor(cents / 100000.0).astype("int64"),
            "bal_pos": cents >= 0,
        })

    scored = fellegi_sunter_scores(
        ds.map_batches(derive, batch_format="pandas"),
        id_col="c_custkey", block_col="c_nationkey",
        field_cols=["seg", "bal_bucket", "bal_pos"])
    df = scored.map_batches(
        lambda b: b[b["is_match"]][["a", "b", "score_micro"]],
        batch_format="pandas").to_pandas()
    for c in ("a", "b", "score_micro"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_customer_golden(sf_dir: str) -> pd.DataFrame:
    """Golden-record survivorship (the MDM step after matching):
    FS match pairs (q_customer_fs's model) close into clusters by
    bounded min-label propagation (8 rounds), every customer lands in
    a cluster (singletons stay themselves), and each cluster elects
    one survivor row — representative id = min custkey, segment by
    MODAL vote (count desc, value asc tie-break), balance = max exact
    cents, plus member count.  The deterministic merge policy a
    dedup-then-canonicalize pipeline needs.

    Shape: matching reuses the broadcast FS pass; clustering is the
    bounded label_components kernel on the (tiny) match-pair list;
    survivorship is one pre-combined groupby over the
    cluster-annotated dimension table."""
    from ..functions.dedup import fellegi_sunter_scores
    from ..functions.graphalgo import label_components

    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey", "c_acctbal",
                             "c_mktsegment"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["c_acctbal"].to_numpy("float64") * 100).astype("int64")
        return pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "c_nationkey": b["c_nationkey"],
            "seg": b["c_mktsegment"],
            "cents": cents,
            "bal_bucket": np.floor(cents / 100000.0).astype("int64"),
            "bal_pos": cents >= 0,
        })

    base = ds.map_batches(derive, batch_format="pandas").materialize()
    scored = fellegi_sunter_scores(
        base, id_col="c_custkey", block_col="c_nationkey",
        field_cols=["seg", "bal_bucket", "bal_pos"])
    pairs = scored.map_batches(
        lambda b: b[b["is_match"]][["a", "b"]],
        batch_format="pandas").materialize()
    comp = label_components(pairs, src="a", dst="b",
                            rounds=8).to_pandas()
    lut = dict(zip(comp["entity"].astype("int64"),
                   comp["component"].astype("int64")))

    # survivorship driver finish: the annotated table is
    # DIMENSION-sized (customers), so one guarded pull + two pandas
    # groupbys beat three aggregator fleets (the accepted q21 shape —
    # the guard keeps the posture honest past dimension scale)
    bdf = base.to_pandas()
    if len(bdf) > 20_000_000:
        raise RuntimeError(
            "q_customer_golden: customer table past the driver-finish "
            "guard; shard the survivorship groupbys")
    keys = bdf["c_custkey"].to_numpy("int64")
    cl = np.array([lut.get(k, k) for k in keys], dtype=np.int64)
    ann = pd.DataFrame({"cluster": cl, "c_custkey": keys,
                        "seg": bdf["seg"],
                        "cents": bdf["cents"].to_numpy("int64")})
    votes = ann.groupby(["cluster", "seg"], sort=False) \
        .size().reset_index(name="n")
    votes = votes.sort_values(["cluster", "n", "seg"],
                              ascending=[True, False, True],
                              kind="mergesort")
    modal = votes.groupby("cluster", sort=False).head(1) \
        .rename(columns={"seg": "golden_segment"})[
        ["cluster", "golden_segment"]]
    agg = ann.groupby("cluster", sort=False).agg(
        golden_custkey=("c_custkey", "min"),
        golden_cents=("cents", "max"),
        n_members=("c_custkey", "count")).reset_index()
    df = agg.merge(modal, on="cluster")
    for c in ("cluster", "golden_custkey", "golden_cents",
              "n_members"):
        df[c] = df[c].astype("int64")
    return df[["cluster", "golden_custkey", "golden_segment",
               "golden_cents", "n_members"]] \
        .sort_values("cluster").reset_index(drop=True)


def q_doc_regex(sf_dir: str) -> pd.DataFrame:
    """Vectorized regex field extraction (pandas .str kernels — one
    compiled scan per column, no per-row Python): first match, match
    count, and replace-derived counts, with RE2-compatible patterns so
    DuckDB runs the IDENTICAL regexes."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def ex(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"]
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "first_s_word": t.str.extract(
                r"(s[a-z]+)", expand=False).fillna(""),
            "n_b_words": t.str.count(r"b[a-z]+").astype("int64"),
            "n_vowels": (t.str.len()
                         - t.str.replace(r"[aeiou]", "", regex=True)
                         .str.len()).astype("int64"),
        })

    df = docs.map_batches(ex, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_bigram(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM document scoring (unigram design one order up):
    integer-exact per-doc bigram stats against broadcast corpus
    counts; the float LM score is pytest-pinned and excluded."""
    from ..functions.text import bigram_features

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = bigram_features(docs, id_col="doc_id").to_pandas()
    df = df.drop(columns=["avg_neg_logprob"])
    for c in ["n_bigrams", "sum_bigram_freq", "min_bigram_freq",
              "n_hapax_bigrams"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_fasttext(sf_dir: str) -> pd.DataFrame:
    """Hashed-n-gram linear quality classifier (fastText shape — the
    CCNet/GPT-3 quality-filter architecture): unigram+bigram features
    hashed into 1024 buckets (the hashing trick), static md5-derived
    integer bucket weights standing in for the trained model (the
    standard model seam, sparse.py:43), per-doc mean weight scaled to
    an exact integer score with a pos/neg label.  One stateless pass,
    weight table in the closure, no shuffle."""
    from ..functions.text import fasttext_scores

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = fasttext_scores(docs, id_col="doc_id").to_pandas()
    for c in ["doc_id", "n_feats", "w_sum", "score_scaled"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_bigram_xent(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity/LM quality filter (text.bigram_xent,
    arXiv:1911.00359 §4.3 shape): per-doc conditional cross-entropy
    under the corpus's own add-one-smoothed bigram LM — one exploded
    pass counts unigrams+bigrams together, the vocab-sized log-prob
    table broadcasts once, scoring is one stateless pass."""
    from ..functions.text import bigram_xent

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = bigram_xent(docs, id_col="doc_id").to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_bigrams"] = df["n_bigrams"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_kneser_ney(sf_dir: str) -> pd.DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per doc
    (text.kneser_ney_xent): the continuation-count smoothing the
    add-one LM of q_doc_bigram_xent cannot express — distinct-successor
    / distinct-predecessor tallies over the bigram TYPE table, one
    exploded pass + one pre-combined exchange, type-keyed log-prob
    table broadcast once."""
    from ..functions.text import kneser_ney_xent

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = kneser_ney_xent(docs, id_col="doc_id").to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_bigrams"] = df["n_bigrams"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_emb_rp(sf_dir: str) -> pd.DataFrame:
    """Johnson-Lindenstrauss random projection of the embeddings table
    to k=16 dims (similarity.random_projection): deterministic ±1
    md5-sign matrix, inputs integer-quantized at 2^20, each output
    coordinate an exact int64 dot product — the dimensionality-
    reduction front end for billion-scale ANN (project once, index the
    16-dim table).  One matmul per batch, no shuffle."""
    from ..functions.similarity import random_projection

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = random_projection(ds, k=16).to_pandas()
    df["vec_id"] = df["vec_id"].astype("int64")
    return df.sort_values(["vec_id", "j"]).reset_index(drop=True)


def q_emb_pca(sf_dir: str) -> pd.DataFrame:
    """Top principal component of the embeddings table
    (similarity.pca_top_component): distributed Gram matrix — per-batch
    QᵀQ int64 partials, one pre-combined exchange, never a row-wise
    self-join — then exact-integer max-norm power iteration on the
    D×D result driver-side, truncating division matching DuckDB's //
    on negatives, sign fixed at the max-|loading| coordinate."""
    from ..functions.similarity import pca_top_component

    ds = read_table(sf_dir, "embeddings", columns=["embedding"])
    return pca_top_component(ds, iters=10)


def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT ...) per group, two-phase: per-batch
    (hour, user) distinct combiner -> global distinct (distinct_on,
    mode=auto) -> pre-combined count per hour.  Only distinct pairs
    cross the exchange, never events; the companion n_events rides the
    ordinary pre-combined groupby.  (The approximate path for
    billion-key cardinalities is the HLL sketch, q_approx_stats.)"""
    from ..functions.relational import distinct_on

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    hours = ds.map_batches(
        lambda b: pd.DataFrame({"hour": b.ts.dt.floor("h"),
                                "user_id": b.user_id}),
        batch_format="pandas").materialize()
    pairs = distinct_on(hours, ["hour", "user_id"])
    users = groupby_agg(pairs, ["hour"],
                        [("user_id", "count", "n_users")]).to_pandas()
    events = groupby_agg(hours, ["hour"],
                         [("user_id", "count", "n_events")]).to_pandas()
    df = users.merge(events, on="hour")
    df["n_users"] = df["n_users"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df.sort_values("hour").reset_index(drop=True)


def q_events_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT / conditional aggregation: per-user event-type counts as
    COLUMNS (count(*) FILTER (WHERE type = ...)) plus exact total
    cents — ONE pre-combined groupby exchange carries every pivoted
    column (indicator ints are summed like any other partial)."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    types = ["click", "error", "purchase", "signup", "view"]

    def ind(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": b.user_id})
        for t in types:
            out[f"n_{t}"] = (b.event_type == t).astype("int64")
        out["cents"] = np.round(
            b.value.to_numpy("float64") * 100).astype("int64")
        return out

    specs = [(f"n_{t}", "sum", f"n_{t}") for t in types]
    specs.append(("cents", "sum", "total_cents"))
    df = groupby_agg(ds.map_batches(ind, batch_format="pandas"),
                     ["user_id"], specs).to_pandas()
    for c in df.columns.drop("user_id"):
        df[c] = df[c].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def q_url_canonical(sf_dir: str) -> pd.DataFrame:
    """URL canonicalization (crawl-dedup prep): a deterministically
    messy variant of each document URL (upper-cased scheme+host,
    www. prefix, explicit :443, utm_ tracking param, fragment) is
    canonicalized back by `webfilter.canonical_url`.  The messy
    SYNTHESIS is the same tiny expression in both engines; the
    CANONICALIZERS are written independently (pandas str kernels vs
    SQL regexp_extract/lower/regexp_replace) against one spec, so
    they verify each other.  Stateless map pass, no shuffle."""
    from ..functions.webfilter import canonical_url

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        url = ("https://site" + (b.doc_id % 97).astype(str)
               + ".example/Path/" + b.doc_id.astype(str))
        host = url.str.extract(r"^https://([^/]+)", expand=False)
        path = url.str.replace(r"^https://[^/]+", "", regex=True)
        messy = ("HTTPS://WWW." + host.str.upper() + ":443" + path
                 + "?utm_source=news&ref=" + b.lang + "#sec")
        return pd.DataFrame({"doc_id": b.doc_id, "messy_url": messy,
                             "canon_url": canonical_url(messy)})

    df = docs.map_batches(canon, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)




def q_lineitem_stats(sf_dir: str) -> pd.DataFrame:
    """Statistical aggregates — STDDEV_SAMP and CORR — from EXACT
    integer sums: one pre-combined groupby carries n, Σx, Σx², Σy,
    Σy², Σxy (ints, order-free), then both engines evaluate the SAME
    explicit double formula sqrt((nΣx²-ΣxΣx)/(n(n-1))) resp.
    (nΣxy-ΣxΣy)/(√(nΣx²-Σx²)·√(nΣy²-Σy²)) — IEEE ops in identical
    order, bit-identical on any engine (the oracle uses the literal
    formula, NOT its own stddev()/corr(), which are Welford-streamed
    and order-dependent).  x = quantity, y = discount in percent
    (both small ints; the sums stay far from int64 overflow)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_discount"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        x = np.round(b.l_quantity.to_numpy("float64")).astype("int64")
        y = np.round(b.l_discount.to_numpy("float64") * 100).astype(
            "int64")
        return pd.DataFrame({"l_returnflag": b.l_returnflag, "one": 1,
                             "x": x, "xx": x * x, "y": y, "yy": y * y,
                             "xy": x * y})

    agg = groupby_agg(
        ds.map_batches(pre, batch_format="pandas"), ["l_returnflag"],
        [("one", "sum", "n"), ("x", "sum", "sx"), ("xx", "sum", "sxx"),
         ("y", "sum", "sy"), ("yy", "sum", "syy"),
         ("xy", "sum", "sxy")]).to_pandas()
    n = agg.n.to_numpy("int64").astype("float64")
    sx = agg.sx.to_numpy("int64").astype("float64")
    sxx = agg.sxx.to_numpy("int64").astype("float64")
    sy = agg.sy.to_numpy("int64").astype("float64")
    syy = agg.syy.to_numpy("int64").astype("float64")
    sxy = agg.sxy.to_numpy("int64").astype("float64")
    agg["stddev_qty"] = np.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    agg["corr_qty_disc"] = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
    for c in ["n", "sx", "sxx", "sy", "syy", "sxy"]:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("l_returnflag").reset_index(drop=True)


def q_events_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-user event-count concentration (the
    skew census that tells you whether a partitioning key is safe:
    gini → 1 means a few hot users own the traffic).  EXACT INTEGER
    via the mean-absolute-difference identity over the count
    HISTOGRAM:

        Σ_{i<j} c_i c_j (v_j − v_i)
            = Σ_j v_j c_j C_{<j} − Σ_j c_j S_{<j}

    (values v ascending, C/S = cumulative count/sum of smaller
    values; the sum counts each unordered pair ONCE), so
    gini_ppm = (Σ_{i<j}|Δ|·10^6) // (n·Σx) needs only int64 sums and
    one floor division — no floats, hash-exact.

    Scale shape: per-user counts are ONE pre-combined exchange
    (user-sized), the value histogram a SECOND tiny exchange
    (distinct-count-sized — bounded by the max events any user has),
    and the cumulative finish runs on that tiny table driver-side.
    Never sorts the user table globally."""
    from ..functions.relational import groupby_agg

    ds = read_table(sf_dir, "events", columns=["user_id"])
    per_user = groupby_agg(ds, ["user_id"],
                           [("user_id", "count", "n")])
    hist = groupby_agg(per_user, ["n"],
                       [("n", "count", "c")]).to_pandas()
    hist = hist.sort_values("n").reset_index(drop=True)
    v = hist["n"].to_numpy("int64")
    c = hist["c"].to_numpy("int64")
    cum_c = np.concatenate([[0], np.cumsum(c)[:-1]])
    cum_s = np.concatenate([[0], np.cumsum(c * v)[:-1]])
    num = int((v * c * cum_c).sum() - (c * cum_s).sum())
    n_users = int(c.sum())
    total = int((c * v).sum())
    gini_ppm = (num * 1_000_000) // (n_users * total) \
        if n_users and total else 0
    return pd.DataFrame({
        "n_users": pd.Series([n_users], dtype="int64"),
        "n_events": pd.Series([total], dtype="int64"),
        "gini_ppm": pd.Series([gini_ppm], dtype="int64"),
    })


def q_events_ewma(sf_dir: str) -> pd.DataFrame:
    """Exact-integer exponential smoothing per user (α = 1/4):

        y₁ = x₁ ;  y_t = (x_t + 3·y_{t−1}) // 4     (cents, floor)

    — the classic streaming engagement smoother, kept INTEGER so the
    recursive-CTE twin is bit-identical (floor of nonnegative cents;
    floats would drift by ulps across engines).  The recurrence is
    sequential per user but VECTORIZED ACROSS USERS: inside a bucket
    the per-user sequences align by step index (CSR offsets) and the
    loop runs over the LONGEST sequence, each iteration one numpy op
    over every user still active — no per-row or per-user Python.

    Shape: one user-hash bucket exchange; per bucket one sort + one
    offsets pass + max-len vector steps."""
    from ..functions.relational import default_n_buckets

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])
    nb = default_n_buckets()
    bucketed = ev.map_batches(
        lambda b: pd.DataFrame({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts": b["ts"],
            "cents": np.round(b["value"].to_numpy("float64")
                              * 100).astype("int64"),
            "__bucket": (b["user_id"].to_numpy("int64") % nb)
            .astype("int32"),
        }),
        batch_format="pandas")

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ewma_cents": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy("int64")
        x = g["cents"].to_numpy("int64")
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        y = np.empty(len(u), dtype=np.int64)
        # step 0: every user's first event
        idx = starts.copy()
        y[idx] = x[idx]
        max_len = int(counts.max())
        for t in range(1, max_len):
            act = counts > t
            cur = starts[act] + t
            y[cur] = (x[cur] + 3 * y[cur - 1]) // 4
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy("int64"),
            "user_id": u, "ewma_cents": y})

    df = bucketed.groupby("__bucket").map_groups(
        lambda g: smooth(g.drop(columns="__bucket")),
        batch_format="pandas").to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("event_id").reset_index(drop=True)


def q_events_streaks(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    GAPS-AND-ISLANDS: distinct active days, islands identified by the
    day-ordinal − rank constant (consecutive days share it), longest
    island per user plus its start day.  Exact integers end to end.

    Shape: one two-phase distinct (user, day) exchange, then islands
    resolved inside a user-hash bucket groupby — per bucket one sort +
    one diff/cumsum pass, no per-user Python loop."""
    from ..functions.relational import default_n_buckets, distinct_on

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    days = distinct_on(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "user_id": b["user_id"],
                "day": (b["ts"].astype("int64")
                        // 86_400_000_000).astype("int64")}),
            batch_format="pandas"),
        ["user_id", "day"])
    nb = default_n_buckets()
    bucketed = days.map_batches(
        lambda b: b.assign(__bucket=b["user_id"].to_numpy("int64")
                           % nb),
        batch_format="pandas")

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "longest_streak": pd.Series([], dtype="int64"),
                "streak_start_day": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy("int64")
        d = g["day"].to_numpy("int64")
        new_user = np.r_[True, u[1:] != u[:-1]]
        rank = np.arange(len(g), dtype=np.int64)
        rank -= np.maximum.accumulate(
            np.where(new_user, rank, -1))
        island = d - rank  # constant within one consecutive run
        f = pd.DataFrame({"user_id": u, "island": island, "day": d})
        runs = f.groupby(["user_id", "island"], sort=False)["day"] \
            .agg(["count", "min"]).reset_index()
        runs = runs.sort_values(["user_id", "count", "min"],
                                ascending=[True, False, True],
                                kind="mergesort")
        best = runs.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({
            "user_id": best["user_id"].to_numpy("int64"),
            "longest_streak": best["count"].to_numpy("int64"),
            "streak_start_day": best["min"].to_numpy("int64")})

    df = bucketed.groupby("__bucket").map_groups(
        lambda g: islands(g.drop(columns="__bucket")),
        batch_format="pandas").to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def q_events_dow_chi2(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality census with the EXACTLY-SCALED
    chi-square uniformity statistic: χ² against uniform expectation
    e = N/7 is rational, but χ²·7N = Σ(7·o_d − N)² is an integer —
    report THAT (plus per-day counts), no float ever; the reader
    divides by 7N once if they want the classic value.  One
    pre-combined groupby."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    cnt = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "dow": ((b["ts"].astype("datetime64[us]")
                         .astype("int64") // 86_400_000_000 + 4)
                        % 7).astype("int64")}),
            batch_format="pandas"),
        ["dow"], [("dow", "count", "n")]).to_pandas()
    cnt = cnt.set_index("dow").reindex(range(7), fill_value=0)
    o = cnt["n"].to_numpy("int64")
    n_total = int(o.sum())
    chi2_scaled = int(((7 * o - n_total) ** 2).sum())
    out = pd.DataFrame({
        "dow": pd.Series(range(7), dtype="int64"),
        "n": o,
        "n_total": pd.Series([n_total] * 7, dtype="int64"),
        "chi2_scaled": pd.Series([chi2_scaled] * 7, dtype="int64"),
    })
    return out


def q_events_mannwhitney(sf_dir: str) -> pd.DataFrame:
    """Exact Mann-Whitney rank-sum comparison of per-user purchase
    totals across the md5-parity arms — the nonparametric two-sample
    test, kept INTEGER via DOUBLED MIDRANKS: a tied value group's
    doubled midrank is min(rn)+max(rn) (always an integer), so
    2·R₁ = Σ_{a-rows}(min+max), U₂ = 2·U = 2R₁ − n₁(n₁+1), and the
    common-language effect size AUC = U/(n₁n₂) reports as
    U₂·1000 // (2n₁n₂) — every quantity exact on any engine (the tie
    correction that float ranks get wrong).

    Shape: per-user totals one pre-combined exchange; rank statistics
    over the (value → min/max rank, per-arm counts) GROUP table —
    value-distinct-sized, one more exchange; constant-size output."""
    import hashlib

    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    per_user = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "user_id": b["user_id"],
                "cents": np.where(
                    b["event_type"].to_numpy() == "purchase",
                    np.round(b["value"].to_numpy("float64") * 100)
                    .astype("int64"), 0)}),
            batch_format="pandas"),
        ["user_id"], [("cents", "sum", "s")])

    def armed(b: pd.DataFrame) -> pd.DataFrame:
        arm = np.array([int(hashlib.md5(str(x).encode())
                            .hexdigest()[:8], 16) % 2
                        for x in b["user_id"].to_numpy("int64")],
                       dtype=np.int64)
        return pd.DataFrame({"s": b["s"].to_numpy("int64"),
                             "arm": arm})

    groups = groupby_agg(
        per_user.map_batches(armed, batch_format="pandas"),
        ["s"], [("arm", "sum", "n_b"),
                ("arm", "count", "n_all")]).to_pandas()
    groups = groups.sort_values("s").reset_index(drop=True)
    n_all = groups["n_all"].to_numpy("int64")
    n_b = groups["n_b"].to_numpy("int64")
    n_a_g = n_all - n_b
    ends = np.cumsum(n_all)
    starts = ends - n_all + 1
    dbl_mid = starts + ends  # min(rn) + max(rn) per value group
    n1 = int(n_a_g.sum())
    n2 = int(n_b.sum())
    two_r1 = int((n_a_g * dbl_mid).sum())
    u2 = two_r1 - n1 * (n1 + 1)
    auc_milli = u2 * 1000 // (2 * n1 * n2) if n1 and n2 else 0
    return pd.DataFrame({
        "n_a": pd.Series([n1], dtype="int64"),
        "n_b": pd.Series([n2], dtype="int64"),
        "u2": pd.Series([u2], dtype="int64"),
        "auc_milli": pd.Series([auc_milli], dtype="int64"),
    })


def q_events_conformal(sf_dir: str) -> pd.DataFrame:
    """Split conformal prediction (Vovk/Lei-Wasserman, the
    distribution-free coverage guarantee modern ML-ops ships):
    calibration = first time half, predictor = per-event-type FLOOR
    mean of cents (exact integers), conformal radius q̂ = the
    ⌈(n+1)·0.9⌉-th smallest absolute residual (EXACT order statistic,
    clamped to n), then the guarantee audited on the held-out second
    half: coverage = share of |cents − μ_type| ≤ q̂ — finite-sample
    ≥ 90% in expectation, every number integer-exact.

    Shape: the µs-midpoint split (the PSI discipline), per-type means
    one pre-combined exchange, the order statistic a guarded driver
    pull of calibration residuals, coverage one stateless pass."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "t": b["ts"].astype("datetime64[us]").astype("int64"),
            "typ": b["event_type"],
            "cents": np.round(b["value"].to_numpy("float64")
                              * 100).astype("int64")})

    base = ev.map_batches(prep, batch_format="pandas").materialize()
    tmin, tmax = int(base.min("t")), int(base.max("t"))
    mid = tmin + (tmax - tmin) // 2
    cal = base.map_batches(lambda b, m=mid: b[b["t"] < m],
                           batch_format="pandas").materialize()
    mu = groupby_agg(cal, ["typ"],
                     [("cents", "sum", "s"),
                      ("cents", "count", "n")]).to_pandas()
    mu["mu"] = mu["s"].to_numpy("int64") // mu["n"].to_numpy("int64")
    mumap = dict(zip(mu["typ"], mu["mu"].astype("int64")))

    cdf = cal.to_pandas()
    if len(cdf) > 20_000_000:
        raise RuntimeError("q_events_conformal: calibration half past "
                           "the order-statistic driver guard")
    res = np.abs(cdf["cents"].to_numpy("int64")
                 - cdf["typ"].map(mumap).to_numpy("int64"))
    res.sort()
    n_cal = len(res)
    k = min(-(-((n_cal + 1) * 9) // 10), n_cal)  # ceil, clamped
    q_hat = int(res[k - 1]) if n_cal else 0

    def cover(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["t"] >= mid]
        if not len(b):
            return pd.DataFrame({"n": [0], "cov": [0]})
        m = b["typ"].map(mumap)
        known = m.notna()
        r = np.abs(b["cents"].to_numpy("int64")[known.to_numpy()]
                   - m[known].to_numpy("int64"))
        return pd.DataFrame({"n": [int(known.sum())],
                             "cov": [int((r <= q_hat).sum())]})

    t = base.map_batches(cover, batch_format="pandas").to_pandas()
    n_test, n_cov = int(t["n"].sum()), int(t["cov"].sum())
    return pd.DataFrame({
        "n_cal": pd.Series([n_cal], dtype="int64"),
        "q_hat": pd.Series([q_hat], dtype="int64"),
        "n_test": pd.Series([n_test], dtype="int64"),
        "n_covered": pd.Series([n_cov], dtype="int64"),
        "coverage_milli": pd.Series(
            [n_cov * 1000 // n_test if n_test else 0],
            dtype="int64"),
    })


def q_events_abtest(sf_dir: str) -> pd.DataFrame:
    """DETERMINISTIC permutation test for an A/B split (the
    experimentation primitive, Fisher-style): users hash-assign to
    arms by md5 parity; the statistic is the arm mean difference of
    per-user purchase cents; B=64 PSEUDO-RANDOM reassignments (arm of
    user u in resample b = parity of md5(u|b)) rebuild the statistic;
    p = (#resamples at least as extreme) / B.  EVERY comparison is
    exact: |sA_b·nB_b − sB_b·nA_b| · (nA·nB) vs |sA·nB − sB·nA| ·
    (nA_b·nB_b) — cross-multiplied in arbitrary-precision Python ints
    (the SQL twin uses HUGEINT), so the p-value is bit-identical on
    any engine; no RNG state, no float.

    Shape: per-user cents one pre-combined exchange; each resample's
    sums ride ONE (user × 64) exploded pre-combined groupby — a single
    exchange for all resamples; the comparison table is 64 rows."""
    import hashlib

    from ..functions.relational import groupby_agg

    nb = 64
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    per_user = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "user_id": b["user_id"],
                "cents": np.where(
                    b["event_type"].to_numpy() == "purchase",
                    np.round(b["value"].to_numpy("float64") * 100)
                    .astype("int64"), 0)}),
            batch_format="pandas"),
        ["user_id"], [("cents", "sum", "s")])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy("int64")
        s = b["s"].to_numpy("int64")
        arm0 = np.array([int(hashlib.md5(str(x).encode())
                             .hexdigest()[:8], 16) % 2
                         for x in u], dtype=np.int64)
        rows = {"b": [], "arm": [], "s": []}
        # b = 0 is the OBSERVED assignment; b = 1..64 the resamples
        rows["b"].append(np.zeros(len(u), dtype=np.int64))
        rows["arm"].append(arm0)
        rows["s"].append(s)
        for t in range(1, nb + 1):
            arm = np.array([int(hashlib.md5(f"{x}|{t}".encode())
                                .hexdigest()[:8], 16) % 2
                            for x in u], dtype=np.int64)
            rows["b"].append(np.full(len(u), t, dtype=np.int64))
            rows["arm"].append(arm)
            rows["s"].append(s)
        return pd.DataFrame({k: np.concatenate(v)
                             for k, v in rows.items()})

    sums = groupby_agg(
        per_user.map_batches(explode, batch_format="pandas"),
        ["b", "arm"], [("s", "sum", "sum_c"),
                       ("s", "count", "n")]).to_pandas()
    g = sums.set_index(["b", "arm"])

    def stat(bi):
        sa = int(g.loc[(bi, 0), "sum_c"]) if (bi, 0) in g.index else 0
        na = int(g.loc[(bi, 0), "n"]) if (bi, 0) in g.index else 0
        sb = int(g.loc[(bi, 1), "sum_c"]) if (bi, 1) in g.index else 0
        nb_ = int(g.loc[(bi, 1), "n"]) if (bi, 1) in g.index else 0
        return sa, na, sb, nb_

    sa0, na0, sb0, nb0 = stat(0)
    t0_num = abs(sa0 * nb0 - sb0 * na0)
    t0_den = na0 * nb0 if na0 and nb0 else 1
    n_extreme = 0
    for bi in range(1, nb + 1):
        sa, na, sb, nb_ = stat(bi)
        num = abs(sa * nb_ - sb * na)
        den = na * nb_ if na and nb_ else 1
        # |T_b| >= |T0|  <=>  num·t0_den >= t0_num·den  (exact ints)
        if num * t0_den >= t0_num * den:
            n_extreme += 1
    return pd.DataFrame({
        "n_users_a": pd.Series([na0], dtype="int64"),
        "n_users_b": pd.Series([nb0], dtype="int64"),
        "sum_a": pd.Series([sa0], dtype="int64"),
        "sum_b": pd.Series([sb0], dtype="int64"),
        "b_resamples": pd.Series([nb], dtype="int64"),
        "n_extreme": pd.Series([n_extreme], dtype="int64"),
        "p_milli": pd.Series([n_extreme * 1000 // nb],
                             dtype="int64"),
    })


def q_events_psi(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index drift census (the ML-ops
    distribution-shift monitor): event values in the FIRST time half
    define decile edges (exact order statistics — the element at index
    floor((N−1)·k/10) of the sorted first-half cents, deterministic on
    any engine); both halves bucket against those edges; per bucket

        term = (p − q) · ln(p / q),   p,q Laplace-smoothed shares

    floored to nano units (the entropy float discipline — one IEEE
    ln/divide per bucket on exact integer counts, order-free int sum).
    PSI > 0.2 is the classic retrain trigger.

    Shape: min/max ts one combiner pass; the edge selection pulls ONLY
    the 9 order statistics (first half sorted cents are a driver pull
    at this table's size — guarded); bucket counts are one
    pre-combined groupby per half."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def cents_half(b: pd.DataFrame) -> pd.DataFrame:
        # normalize to MICROsecond ticks explicitly: the midpoint's
        # floor-div halving must happen in the same unit as the SQL
        # twin's epoch_us or a boundary event can flip halves
        return pd.DataFrame({
            "t": b["ts"].astype("datetime64[us]").astype("int64"),
            "cents": np.round(b["value"].to_numpy("float64")
                              * 100).astype("int64")})

    base = ev.map_batches(cents_half, batch_format="pandas") \
        .materialize()
    # one combined min/max pass (Dataset.min + Dataset.max were two
    # full aggregate executions; with the filter fix below, measured
    # 5.1 → 1.4 s at sf0.1)
    mm = base.map_batches(
        lambda b: pd.DataFrame({"lo": [b["t"].min()],
                                "hi": [b["t"].max()]}),
        batch_format="pandas").to_pandas()
    tmin, tmax = int(mm["lo"].min()), int(mm["hi"].max())
    mid = tmin + (tmax - tmin) // 2
    # batch-mask extraction, NOT Dataset.filter's per-row lambda (the
    # q_doc_pipeline row-path lesson)
    fc = base.map_batches(
        lambda b, m=mid: b.loc[b["t"].to_numpy("int64") < m,
                               ["cents"]],
        batch_format="pandas").to_pandas()["cents"].to_numpy("int64")
    if len(fc) > 20_000_000:
        raise RuntimeError("q_events_psi: first half past the "
                           "order-statistic driver guard")
    fc.sort()
    n1 = len(fc)
    edges = np.array([fc[(n1 - 1) * k // 10] for k in range(1, 10)],
                     dtype=np.int64)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cents"].to_numpy("int64")
        bk = (c[:, None] > edges[None, :]).sum(axis=1)
        half = np.where(b["t"].to_numpy("int64") < mid, 1, 2)
        return pd.DataFrame({"half": half, "bucket": bk})

    cnt = groupby_agg(
        base.map_batches(bucketize, batch_format="pandas"),
        ["half", "bucket"], [("bucket", "count", "n")]).to_pandas()
    g = cnt.pivot_table(index="bucket", columns="half", values="n",
                        fill_value=0).reindex(range(10),
                                              fill_value=0)
    nf = g.get(1, pd.Series(0, index=g.index)).to_numpy("int64")
    ns = g.get(2, pd.Series(0, index=g.index)).to_numpy("int64")
    tot1, tot2 = int(nf.sum()), int(ns.sum())
    p = (nf + 1.0) / (tot1 + 10.0)
    q = (ns + 1.0) / (tot2 + 10.0)
    term = np.floor((p - q) * np.log(p / q) * 1e9).astype("int64")
    return pd.DataFrame({
        "bucket": pd.Series(range(10), dtype="int64"),
        "n_first": nf, "n_second": ns, "term_nano": term})


def q_events_theilsen(sf_dir: str) -> pd.DataFrame:
    """Theil-Sen robust trend of daily event volume (the median of all
    pairwise slopes — 29% breakdown point, the robust alternative to
    least squares): slopes are EXACT RATIONALS (Δcount, Δday); the
    median is the lower-median row of the slope list ordered by VALUE
    (IEEE double division of identical real quotients rounds
    identically on any engine) with (num, den) as the deterministic
    tie-break among equal-value fractions — so both engines select the
    SAME fraction and the output is integer-exact, no float ever
    stored.

    Shape: daily counts are one pre-combined exchange (day-sized);
    slopes are the tiny O(days²) driver table."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    daily = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({"day": b["ts"].dt.floor("D")}),
            batch_format="pandas"),
        ["day"], [("day", "count", "n")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    x = (daily["day"] - daily["day"].min()).dt.days.to_numpy("int64")
    n = daily["n"].to_numpy("int64")
    i, j = np.triu_indices(len(x), 1)
    num = n[j] - n[i]
    den = x[j] - x[i]
    val = num / den
    order = np.lexsort((den, num, val))
    k = (len(num) - 1) // 2
    sel = order[k]
    return pd.DataFrame({
        "num": pd.Series([int(num[sel])], dtype="int64"),
        "den": pd.Series([int(den[sel])], dtype="int64"),
        "n_days": pd.Series([len(x)], dtype="int64"),
        "n_pairs": pd.Series([len(num)], dtype="int64"),
    })


def q_events_seqpairs(sf_dir: str) -> pd.DataFrame:
    """Gapped sequential-pattern census (the PrefixSpan 2-item case,
    Pei et al. 2001): for every ordered event-type pair (a, b), how
    many users have SOME a strictly before SOME b — any gap, unlike
    q_events_transitions' consecutive pairs.  Containment reduces to
    per-user first/last timestamps: a-then-b ⇔ min_ts(a) < max_ts(b)
    (ties broken by event_id so the census is exact under equal
    timestamps).

    Shape: ONE pre-combined (user, type) exchange carrying min/max of
    the (ts, event_id) lexicographic key, then a per-user type×type
    cross inside a bucket groupby (≤ |types|² = 25 rows per user) and
    one tiny census groupby."""
    from ..functions.relational import default_n_buckets, groupby_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        # lexicographic (ms-tick, event_id) as one sortable int key:
        # epoch millis < 2^41, event ids < 2^22 — key < 2^63 (micro
        # ticks would overflow int64; sub-ms order falls to the
        # event_id tie-break, the SAME definition on both engines)
        ticks = b["ts"].astype("int64").to_numpy() // 1000
        key = ticks * (1 << 22) + b["event_id"].to_numpy("int64")
        return pd.DataFrame({"user_id": b["user_id"],
                             "t": b["event_type"], "k": key})

    mm = groupby_agg(ev.map_batches(keyed, batch_format="pandas"),
                     ["user_id", "t"],
                     [("k", "min", "kmin"), ("k", "max", "kmax")])
    nb = default_n_buckets()
    bucketed = mm.map_batches(
        lambda b: b.assign(__bucket=b["user_id"].to_numpy("int64") % nb),
        batch_format="pandas")

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        m = g.merge(g, on="user_id", suffixes=("_a", "_b"))
        m = m[m["kmin_a"] < m["kmax_b"]]
        return pd.DataFrame({"a": m["t_a"], "b": m["t_b"]})

    pairs = bucketed.groupby("__bucket").map_groups(
        cross, batch_format="pandas")
    df = groupby_agg(pairs, ["a", "b"],
                     [("a", "count", "n_users")]).to_pandas()
    df["n_users"] = df["n_users"].astype("int64")
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def q_events_attribution(sf_dir: str) -> pd.DataFrame:
    """Linear multi-touch revenue attribution with EXACT largest-
    remainder cent apportionment: each purchase's cents split across
    the user's click/view touches in the prior 3 days — every touch
    gets cents // k, the cents % k remainder goes one cent each to the
    MOST RECENT touches (ts desc, event_id desc tie-break), so
    Σ attributed == purchase cents exactly (the classic money-split
    invariant; floats would leak cents).

    Shape: one interval join (mode=auto broadcasts the touch side
    under the guard, bucketed exchange past it), then a vectorized
    per-purchase rank + apportion pass — quadratic only within one
    user's window, bounded by per-user event volume."""
    from ..functions.relational import interval_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id",
                             "event_type", "value"])
    purchases = ev.map_batches(
        lambda b: pd.DataFrame({
            "purchase_id": b[b.event_type == "purchase"]["event_id"],
            "user_id": b[b.event_type == "purchase"]["user_id"],
            "ts": b[b.event_type == "purchase"]["ts"],
            "cents": np.round(
                b[b.event_type == "purchase"]["value"]
                .to_numpy("float64") * 100).astype("int64"),
        }),
        batch_format="pandas")
    touches = ev.map_batches(
        lambda b: b[b.event_type.isin(["click", "view"])]
        .rename(columns={"event_id": "touch_id"})
        [["touch_id", "user_id", "ts"]],
        batch_format="pandas")

    joined = interval_join(
        purchases, touches, by="user_id", on="ts",
        lower=pd.Timedelta(days=-3), upper=pd.Timedelta(0),
        right_value_cols=["touch_id"])

    def apportion(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "purchase_id": pd.Series([], dtype="int64"),
                "touch_id": pd.Series([], dtype="int64"),
                "attributed_cents": pd.Series([], dtype="int64")})
        b = b.sort_values(["purchase_id", "ts_r", "touch_id_r"],
                          ascending=[True, False, False],
                          kind="mergesort")
        g = b.groupby("purchase_id", sort=False)
        k = g["touch_id_r"].transform("size").to_numpy("int64")
        rank = g.cumcount().to_numpy("int64")
        cents = b["cents"].to_numpy("int64")
        attributed = cents // k + (rank < cents % k).astype("int64")
        return pd.DataFrame({
            "purchase_id": b["purchase_id"].to_numpy("int64"),
            "touch_id": b["touch_id_r"].to_numpy("int64"),
            "attributed_cents": attributed})

    # a purchase's touches must share one frame for the rank/apportion
    # pass — bucket by purchase hash and apportion inside the bucket
    # (the q_events_paths idiom: one map_groups per BUCKET, pandas
    # groupby per purchase inside — never one Python call per tiny
    # group, never a driver finish on the pair-sized table)
    from ..functions.relational import default_n_buckets
    nb = default_n_buckets()
    bucketed = joined.map_batches(
        lambda b: b.assign(__bucket=b["purchase_id"].to_numpy("int64")
                           % nb),
        batch_format="pandas")
    out = bucketed.groupby("__bucket").map_groups(
        apportion, batch_format="pandas").to_pandas()
    return out.sort_values(["purchase_id", "touch_id"]) \
        .reset_index(drop=True)


def q_events_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-user event-type Shannon entropy (behavioral-diversity
    feature): H = Σ_type (c/n)·ln(n/c), kept INTEGER-EXACT as a sum of
    per-type floor(1e9·(c/n)·ln(n/c)) terms — each term is one IEEE
    divide, one libm log, one multiply, one floor on exact int64
    counts, so the int sum is order-free and the SQL oracle
    hash-matches (the adamic-adar float discipline).

    Shape: one pre-combined (user, type) count exchange; the entropy
    finish runs on the tiny counts table, user-segments resolved with
    ONE reduceat pass per bucket — no per-user Python loop."""
    from ..functions.relational import default_n_buckets, groupby_agg

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    cnts = groupby_agg(ds, ["user_id", "event_type"],
                       [("event_type", "count", "c")])
    nb = default_n_buckets()

    def ent(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "h_scaled": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "event_type"], kind="mergesort")
        u = g["user_id"].to_numpy("int64")
        c = g["c"].to_numpy("int64")
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        n_seg = np.add.reduceat(c, starts)
        sizes = np.diff(np.r_[starts, len(u)])
        n_rep = np.repeat(n_seg, sizes)
        term = np.floor(1_000_000_000.0 * ((c / n_rep)
                        * np.log(n_rep / c))).astype("int64")
        return pd.DataFrame({"user_id": u[starts],
                             "n_events": n_seg,
                             "h_scaled": np.add.reduceat(term, starts)})

    df = cnts.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(ent, batch_format="pandas").to_pandas()
    for col in ["user_id", "n_events", "h_scaled"]:
        df[col] = df[col].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def q_events_mode(sf_dir: str) -> pd.DataFrame:
    """MODE aggregate (most frequent value per group, deterministic
    min-value tie-break): distinct (group, value) counts through one
    pre-combined groupby, then grouped_topk(k=1) with the explicit
    tie_break — only counts cross the exchange, and the finish moves
    one candidate per (group, batch)."""
    from ..functions.relational import grouped_topk

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    counts = groupby_agg(ds, ["event_type", "user_id"],
                         [("user_id", "count", "n")])
    df = grouped_topk(counts, ["event_type"], "n", 1,
                      descending=True, tie_break="user_id").to_pandas()
    df = df.rename(columns={"user_id": "modal_user", "n": "n_events"})
    df["n_events"] = df["n_events"].astype("int64")
    df["modal_user"] = df["modal_user"].astype("int64")
    return df[["event_type", "modal_user", "n_events"]].sort_values(
        "event_type").reset_index(drop=True)


def q_events_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width HISTOGRAM per group: bin = min(cents // 500, 9) —
    exact integer floor division in both engines, counts through one
    pre-combined groupby exchange (empty bins are absent rows, the
    same sparse convention on both sides)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def binify(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b.value.to_numpy("float64") * 100).astype(
            "int64")
        return pd.DataFrame({"event_type": b.event_type,
                             "bin": np.minimum(cents // 500, 9)})

    df = groupby_agg(ds.map_batches(binify, batch_format="pandas"),
                     ["event_type", "bin"],
                     [("bin", "count", "n")]).to_pandas()
    df["bin"] = df["bin"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df.sort_values(["event_type", "bin"]).reset_index(drop=True)




def q_doc_rep_ngrams(sf_dir: str) -> pd.DataFrame:
    """WITHIN-document repeated word-3-gram stats (the Gopher
    duplicate-n-gram quality rule): integer-exact occurrences and
    distinct repeated grams per doc, one stateless map pass — a doc's
    grams never leave their batch (contrast q_doc_dup_ngrams, the
    CROSS-document 8-gram family that needs the gram exchange)."""
    from ..functions.text import rep_ngrams

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = docs.map_batches(
        lambda b: rep_ngrams(b, n=3), batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)




def q_doc_sentences(sf_dir: str) -> pd.DataFrame:
    """Per-document sentence segmentation stats (text.sentence_stats):
    split pattern chosen to be byte-identical between Python re and
    DuckDB's RE2."""
    from ..functions.text import sentence_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = docs.map_batches(sentence_stats,
                          batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_events_mad(sf_dir: str) -> pd.DataFrame:
    """Robust statistics: per-group MEDIAN and MAD (median absolute
    deviation) with percentile_cont lerp semantics — the
    q_events_quantiles formula applied twice (the deviations are
    exact IEEE |x - med| on identical doubles, so both engines lerp
    identical sorted arrays).  Groups are event types (a handful) so
    co-locating each group is the query's own shape; sketches are the
    million-key path."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def pc(s: np.ndarray, q: float) -> float:
        h = (len(s) - 1) * q
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        return float(s[lo] + (s[hi] - s[lo]) * (h - lo))

    def robust(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].dropna().to_numpy("float64"))
        med = pc(v, 0.5)
        dev = np.sort(np.abs(g["value"].dropna().to_numpy("float64")
                             - med))
        return pd.DataFrame({"event_type": [g.event_type.iloc[0]],
                             "med": [med], "mad": [pc(dev, 0.5)],
                             "n": [np.int64(len(v))]})

    df = ds.groupby("event_type").map_groups(
        robust, batch_format="pandas").to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


ORACLE_SQL: dict[str, str] = {
    "q_events_mad": """
        WITH med AS (
            SELECT event_type,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                       AS m
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, any_value(med.m) AS med,
               percentile_cont(0.5) WITHIN GROUP (
                   ORDER BY abs(e.value - med.m)) AS mad,
               count(e.value)::BIGINT AS n
        FROM events e JOIN med USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "q_doc_split": """
        WITH a AS (
            SELECT lang,
                   CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                             1, 8))::BIGINT
                             < 3435973836 THEN 'train'
                        WHEN ('0x' || substr(md5(doc_id::VARCHAR),
                                             1, 8))::BIGINT
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT lang, split, count(*)::BIGINT AS n
        FROM a GROUP BY lang, split ORDER BY lang, split
    """,
    "q_orders_pareto": """
        WITH agg AS (
            SELECT o_custkey,
                   sum(round(o_totalprice * 100)::BIGINT)::BIGINT
                       AS rev_cents
            FROM orders GROUP BY o_custkey
        ), t AS (SELECT sum(rev_cents)::BIGINT AS total FROM agg),
        w AS (
            SELECT o_custkey, rev_cents,
                   sum(rev_cents) OVER (
                       ORDER BY rev_cents DESC, o_custkey
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
            FROM agg
        )
        SELECT o_custkey, rev_cents, cum_cents,
               cum_cents::DOUBLE / (SELECT total FROM t)::DOUBLE
                   AS share,
               (cum_cents - rev_cents) * 5
                   < (SELECT total FROM t) * 4 AS in_top80
        FROM w ORDER BY rev_cents DESC, o_custkey
    """,
    "q_doc_dropout": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(generate_series(
                       1, array_length(string_split(text, ' ')))) AS i
            FROM documents
        ), kept AS (
            SELECT doc_id, i, tok
            FROM toks
            WHERE ('0x' || substr(md5(doc_id::VARCHAR || '|'
                                      || i::VARCHAR || '|' || tok),
                                  1, 8))::BIGINT >= 858993459
        ), base AS (
            SELECT doc_id, count(*)::BIGINT AS n_tokens
            FROM toks GROUP BY doc_id
        ), agg AS (
            SELECT doc_id, count(*)::BIGINT AS n_kept,
                   string_agg(tok, ' ' ORDER BY i) AS aug_text
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               coalesce(a.n_kept, 0)::BIGINT AS n_kept,
               coalesce(a.aug_text, '') AS aug_text
        FROM base b LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id
    """,
    "q_profile_lineitem": """
        SELECT 'l_orderkey' AS "column",
               count(*) FILTER (WHERE l_orderkey IS NULL)::BIGINT
                   AS n_null,
               count(DISTINCT l_orderkey)::BIGINT AS n_distinct,
               min(l_orderkey)::VARCHAR AS min_str,
               max(l_orderkey)::VARCHAR AS max_str
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity',
               count(*) FILTER (WHERE l_quantity IS NULL)::BIGINT,
               count(DISTINCT l_quantity)::BIGINT,
               min(l_quantity)::VARCHAR, max(l_quantity)::VARCHAR
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag',
               count(*) FILTER (WHERE l_returnflag IS NULL)::BIGINT,
               count(DISTINCT l_returnflag)::BIGINT,
               min(l_returnflag), max(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate',
               count(*) FILTER (WHERE l_shipdate IS NULL)::BIGINT,
               count(DISTINCT l_shipdate)::BIGINT,
               strftime(min(l_shipdate), '%Y-%m-%d'),
               strftime(max(l_shipdate), '%Y-%m-%d')
        FROM lineitem
        ORDER BY "column"
    """,
    # q_events_zorder's oracle is GENERATED (unrolled shift/mask
    # spread) — assigned after the dict via _zorder_oracle_sql()
    "q_events_running_total": """
        WITH t AS (SELECT event_id,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                   FROM events)
        SELECT event_id,
               -- DuckDB sum(BIGINT) yields HUGEINT which pandas
               -- receives as float64 and breaks the driver hash on
               -- numerically-identical values; cast back to BIGINT.
               CAST(sum(v) OVER (ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS run_sum_cents,
               max(v) OVER (ORDER BY event_id
                            ROWS UNBOUNDED PRECEDING) AS run_max_cents
        FROM t
        ORDER BY event_id
    """,
    "q_events_cusum": """
        WITH t AS (SELECT event_id,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                              - 6000 AS dv
                   FROM events),
        p AS (SELECT event_id,
                     -- sum(BIGINT) is HUGEINT; cast back (hash rule)
                     CAST(sum(dv) OVER (ORDER BY event_id
                                        ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS p
              FROM t),
        s AS (SELECT event_id,
                     p - least(0, min(p) OVER (ORDER BY event_id
                                               ROWS UNBOUNDED PRECEDING)
                               ) AS cusum_cents
              FROM p)
        SELECT event_id, cusum_cents,
               cusum_cents >= 50000 AS alarm
        FROM s
        ORDER BY event_id
    """,
    "q_events_zscore": """
        WITH m AS (
            SELECT event_type,
                   sum(round(value * 100)::BIGINT)::BIGINT AS s1,
                   sum(round(value * 100)::BIGINT
                       * round(value * 100)::BIGINT)::BIGINT AS s2,
                   count(*)::BIGINT AS n
            FROM events GROUP BY event_type
        ), mm AS (
            SELECT event_type,
                   s1::DOUBLE / n::DOUBLE AS mean,
                   sqrt(s2::DOUBLE / n::DOUBLE
                        - (s1::DOUBLE / n::DOUBLE)
                          * (s1::DOUBLE / n::DOUBLE)) AS std
            FROM m
        )
        SELECT e.event_id, e.event_type,
               (round(e.value * 100)::BIGINT::DOUBLE - mm.mean)
                   / mm.std AS z
        FROM events e JOIN mm USING (event_type)
        ORDER BY event_id
    """,
    "q_doc_mix_weights": """
        WITH per AS (
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS chars
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n_docs, chars,
                   CAST(floor(sqrt(chars) * 1000000000) AS BIGINT)
                       AS w_scaled
            FROM per
        )
        SELECT source, n_docs, chars, w_scaled,
               (SELECT sum(w_scaled) FROM w)::BIGINT AS w_total,
               w_scaled / ((SELECT sum(w_scaled) FROM w) * 1.0)
                   AS share
        FROM w
        ORDER BY source
    """,
    "q_doc_class_weights": """
        WITH c AS (
            SELECT lang, count(*)::BIGINT AS n
            FROM documents GROUP BY lang
        )
        SELECT lang, n,
               (SELECT sum(n) FROM c)::DOUBLE
                   / ((SELECT count(*) FROM c)::DOUBLE * n::DOUBLE)
                   AS weight
        FROM c ORDER BY lang
    """,
    "q_events_retention": """
        WITH act AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ), f AS (
            SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id
        )
        SELECT f.cohort, date_diff('day', f.cohort, a.day)::BIGINT AS d,
               count(*)::BIGINT AS n_users
        FROM act a JOIN f USING (user_id)
        WHERE date_diff('day', f.cohort, a.day) BETWEEN 0 AND 2
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_events_funnel": """
        WITH c AS (
            SELECT user_id, min(ts) AS first_click
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS first_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.first_click
            GROUP BY e.user_id
        )
        SELECT c.user_id, c.first_click, p.first_purchase,
               CASE WHEN p.first_purchase IS NULL THEN false
                    ELSE p.first_purchase - c.first_click
                         <= INTERVAL 1 HOUR END AS converted_1h
        FROM c LEFT JOIN p USING (user_id)
        ORDER BY user_id
    """,
    "q_events_tumbling": """
        WITH arr AS (
            SELECT event_type, ts, event_id,
                   max(ts) OVER (PARTITION BY event_type
                                 ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS wm_prev
            FROM events
        ), f AS (
            SELECT event_type,
                   epoch_us(ts) // 600000000 * 600 AS window_start,
                   (wm_prev IS NOT NULL
                    AND epoch_us(ts) < epoch_us(wm_prev) - 600000000)
                       AS late
            FROM arr
        )
        SELECT event_type, window_start::BIGINT AS window_start, late,
               count(*)::BIGINT AS n
        FROM f GROUP BY 1, 2, 3
        ORDER BY event_type, window_start, late
    """,
    "q_events_scd2": """
        SELECT event_id, user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events ORDER BY event_id
    """,
    "q_events_kmv": """
        WITH h AS (
            SELECT DISTINCT event_type, md5(user_id::VARCHAR) AS hh
            FROM events
        ), r AS (
            SELECT event_type, hh,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY hh) AS rn
            FROM h
        )
        SELECT event_type,
               least(count(*), 16)::BIGINT AS n_used,
               coalesce(max(CASE WHEN rn = 16 THEN
                   ('0x' || substr(hh, 1, 8))::BIGINT END), 0)::BIGINT
                   AS kth_prefix,
               CASE WHEN count(*) >= 16
                    THEN (15 * 4294967296)::DOUBLE
                         / max(CASE WHEN rn = 16 THEN
                             ('0x' || substr(hh, 1, 8))::BIGINT
                           END)::DOUBLE
                    ELSE count(*)::DOUBLE END AS est_distinct
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    "q_events_gapfill": """
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT event_type, min(hour) AS lo, max(hour) AS hi
            FROM c GROUP BY 1
        ), dense AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS hour
            FROM span
        )
        SELECT d.event_type, d.hour, coalesce(c.n, 0)::BIGINT AS n
        FROM dense d LEFT JOIN c USING (event_type, hour)
        ORDER BY event_type, hour
    """,
    "q_events_winsor": """
        WITH c AS (
            SELECT event_type, round(value * 100)::BIGINT AS cents
            FROM events WHERE value IS NOT NULL
        ), q AS (
            SELECT event_type,
                   percentile_cont(0.10)
                       WITHIN GROUP (ORDER BY cents) AS lo,
                   percentile_cont(0.90)
                       WITHIN GROUP (ORDER BY cents) AS hi
            FROM c GROUP BY event_type
        )
        SELECT c.event_type,
               count(*)::BIGINT AS n,
               (count(*) FILTER (WHERE cents::DOUBLE < q.lo))::BIGINT
                   AS n_below,
               (count(*) FILTER (WHERE cents::DOUBLE > q.hi))::BIGINT
                   AS n_above,
               any_value(q.lo) AS lo,
               any_value(q.hi) AS hi,
               coalesce(sum(cents) FILTER (
                   WHERE cents::DOUBLE >= q.lo
                     AND cents::DOUBLE <= q.hi), 0)::DOUBLE
               + (count(*) FILTER (WHERE cents::DOUBLE < q.lo))::DOUBLE
                 * any_value(q.lo)
               + (count(*) FILTER (WHERE cents::DOUBLE > q.hi))::DOUBLE
                 * any_value(q.hi) AS winsor_sum
        FROM c JOIN q USING (event_type)
        GROUP BY c.event_type
        ORDER BY c.event_type
    """,
    "q_supplier_er": """
        WITH RECURSIVE
        names AS (SELECT DISTINCT s_name AS n FROM supplier),
        p AS (SELECT a.n AS src, b.n AS dst
              FROM names a JOIN names b
                  ON a.n < b.n AND levenshtein(a.n, b.n) <= 1),
        und AS (SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM p
                    UNION ALL SELECT dst AS src, src AS dst FROM p)),
        pnodes AS (SELECT DISTINCT src AS n FROM und),
        adj AS (SELECT src, dst FROM und
                UNION ALL SELECT n, n FROM pnodes),
        lp AS (
            SELECT 0 AS iter, n AS node, n AS lbl FROM pnodes
            UNION ALL
            SELECT MIN(q.iter) + 1, a.dst, MIN(q.lbl)
            FROM lp q JOIN adj a ON a.src = q.node
            GROUP BY a.dst
            HAVING MIN(q.iter) + 1 <= 8
        ),
        fin AS (SELECT node, lbl FROM lp WHERE iter = 8)
        SELECT nm.n AS name, coalesce(f.lbl, nm.n) AS cluster
        FROM names nm LEFT JOIN fin f ON f.node = nm.n
        ORDER BY name
    """,
    "q_doc_regex": """
        SELECT doc_id,
               coalesce(regexp_extract(text, 's[a-z]+'), '')
                   AS first_s_word,
               len(regexp_extract_all(text, 'b[a-z]+'))::BIGINT
                   AS n_b_words,
               (length(text)
                - length(regexp_replace(text, '[aeiou]', '', 'g'))
               )::BIGINT AS n_vowels
        FROM documents ORDER BY doc_id
    """,
    "q_doc_bigram": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(generate_series(
                       1, array_length(string_split(text, ' ')))) AS i
            FROM documents
        ), g AS (
            SELECT a.doc_id, a.tok || ' ' || b.tok AS gram
            FROM toks a
            JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        ), cnt AS (
            SELECT gram, count(*)::BIGINT AS c FROM g GROUP BY gram
        )
        SELECT g.doc_id,
               count(*)::BIGINT AS n_bigrams,
               sum(c.c)::BIGINT AS sum_bigram_freq,
               min(c.c)::BIGINT AS min_bigram_freq,
               sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_hapax_bigrams
        FROM g JOIN cnt c USING (gram)
        GROUP BY g.doc_id ORDER BY doc_id
    """,
    "q_doc_bigram_xent": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(generate_series(
                       1, array_length(string_split(text, ' ')))) AS i
            FROM documents
        ), g AS (
            SELECT a.doc_id, a.tok || ' ' || b.tok AS gram, a.tok AS w1
            FROM toks a
            JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        ), cnt AS (
            SELECT gram, count(*)::BIGINT AS c12 FROM g GROUP BY gram
        ), c1 AS (
            SELECT split_part(gram, ' ', 1) AS w1, sum(c12)::BIGINT AS s
            FROM cnt GROUP BY 1
        ), v AS (SELECT count(DISTINCT tok)::DOUBLE AS v FROM toks)
        SELECT g.doc_id,
               count(*)::BIGINT AS n_bigrams,
               round(sum(-ln((c.c12 + 1.0)
                             / (c1.s + (SELECT v FROM v))))
                     / count(*), 6) AS xent
        FROM g JOIN cnt c USING (gram) JOIN c1 ON c1.w1 = g.w1
        GROUP BY g.doc_id ORDER BY doc_id
    """,
    # Kneser-Ney: distinct-successor (n1p) / distinct-predecessor
    # (cont) tallies over the bigram TYPE table; D = 0.75 exactly;
    # parenthesization matches text.kneser_ney_xent term by term
    "q_doc_kneser_ney": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(generate_series(
                       1, array_length(string_split(text, ' ')))) AS i
            FROM documents
        ), g AS (
            SELECT a.doc_id, a.tok || ' ' || b.tok AS gram,
                   a.tok AS w1, b.tok AS w2
            FROM toks a
            JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        ), cnt AS (
            SELECT gram, min(w1) AS w1, min(w2) AS w2,
                   count(*)::BIGINT AS c12
            FROM g GROUP BY gram
        ), c1 AS (
            SELECT w1, sum(c12)::BIGINT AS s, count(*)::BIGINT AS n1p
            FROM cnt GROUP BY w1
        ), cont AS (
            SELECT w2, count(*)::BIGINT AS cc FROM cnt GROUP BY w2
        ), t AS (SELECT count(*)::DOUBLE AS tt FROM cnt)
        SELECT g.doc_id,
               count(*)::BIGINT AS n_bigrams,
               round(sum(-ln(((c.c12 - 0.75) / c1.s)
                             + ((0.75 * c1.n1p) / c1.s)
                               * (cont.cc / (SELECT tt FROM t))))
                     / count(*), 6) AS kn_xent
        FROM g JOIN cnt c USING (gram)
        JOIN c1 ON c1.w1 = g.w1 JOIN cont ON cont.w2 = g.w2
        GROUP BY g.doc_id ORDER BY doc_id
    """,
    # JL random projection: the ±1 sign matrix is the parity of the
    # top-32-bit md5("i|j") hex — identical to
    # similarity.random_projection's driver-built matrix
    "q_emb_rp": """
        WITH x AS (
            SELECT vec_id,
                   unnest(range(len(embedding))) AS i,
                   unnest(embedding)::DOUBLE AS e
            FROM embeddings
        ), q AS (
            SELECT vec_id, i, floor(e * 1048576)::BIGINT AS qv FROM x
        ), s AS (
            SELECT i, j,
                   CASE WHEN ('0x' || substr(md5(i::VARCHAR || '|'
                              || j::VARCHAR), 1, 8))::BIGINT % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM (SELECT DISTINCT i FROM x)
            CROSS JOIN (SELECT unnest(range(16)) AS j)
        )
        SELECT q.vec_id, s.j::BIGINT AS j,
               sum(q.qv * s.sgn)::BIGINT AS y
        FROM q JOIN s ON s.i = q.i
        GROUP BY q.vec_id, s.j
        ORDER BY vec_id, j
    """,
    "q_embedding_centroid": """
        WITH x AS (
            SELECT label,
                   unnest(range(len(embedding))) AS dim,
                   unnest(embedding)::DOUBLE AS e
            FROM embeddings
        ), agg AS (
            SELECT label::BIGINT AS label, dim::BIGINT AS dim,
                   sum(floor(e * 1048576))::BIGINT AS sum_q,
                   count(*)::BIGINT AS n
            FROM x GROUP BY 1, 2
        )
        SELECT label, dim, sum_q, n,
               sum_q::DOUBLE / n::DOUBLE AS centroid
        FROM agg ORDER BY label, dim
    """,
    "q_promo_share": """
        WITH r AS (
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   round(l_extendedprice * 100)::BIGINT
                       * (100 - round(l_discount * 100)::BIGINT) AS rev,
                   p_type LIKE 'PROMO%' AS promo
            FROM lineitem JOIN part ON p_partkey = l_partkey
        ), agg AS (
            SELECT month,
                   sum(CASE WHEN promo THEN rev ELSE 0 END)::BIGINT
                       AS promo_rev,
                   sum(rev)::BIGINT AS total_rev
            FROM r GROUP BY month
        )
        SELECT month, promo_rev, total_rev,
               100.0 * promo_rev::DOUBLE / total_rev::DOUBLE
                   AS promo_share
        FROM agg ORDER BY month
    """,
    "q_supplier_blocking": """
        WITH r AS (
            SELECT s_suppkey, s_name,
                   row_number() OVER (ORDER BY s_name, s_suppkey) AS rn
            FROM supplier
        )
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
               (b.rn - a.rn)::BIGINT AS dist
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
        ORDER BY id_a, id_b
    """,
    "q_doc_balanced": """
        WITH r AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(doc_id::VARCHAR), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, lang FROM r WHERE rn <= 50 ORDER BY doc_id
    """,
    "q_events_unpivot": """
        WITH p AS (
            SELECT user_id,
                   (count(*) FILTER (WHERE event_type = 'click'))::BIGINT
                       AS n_click,
                   (count(*) FILTER (WHERE event_type = 'error'))::BIGINT
                       AS n_error,
                   (count(*) FILTER (WHERE event_type = 'purchase'))::BIGINT
                       AS n_purchase,
                   (count(*) FILTER (WHERE event_type = 'signup'))::BIGINT
                       AS n_signup,
                   (count(*) FILTER (WHERE event_type = 'view'))::BIGINT
                       AS n_view
            FROM events GROUP BY user_id
        )
        SELECT user_id, event_col, n::BIGINT AS n
        FROM p UNPIVOT (n FOR event_col IN
                        (n_click, n_error, n_purchase, n_signup, n_view))
        ORDER BY user_id, event_col
    """,
    "q_doc_sentences": """
        WITH s AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(
                       text, '[.!?]+[ \t\n\r\f]+')) AS sent
            FROM documents
        ), agg AS (
            SELECT doc_id,
                   (count(*) FILTER (WHERE sent <> ''))::BIGINT
                       AS n_sentences,
                   coalesce(sum(length(sent)), 0)::BIGINT AS sum_chars,
                   coalesce(max(length(sent))
                            FILTER (WHERE sent <> ''), 0)::BIGINT
                       AS max_chars
            FROM s GROUP BY doc_id
        )
        SELECT doc_id, n_sentences, sum_chars, max_chars,
               CASE WHEN n_sentences > 0
                    THEN sum_chars::DOUBLE / n_sentences::DOUBLE
                    ELSE 0.0 END AS avg_chars
        FROM agg ORDER BY doc_id
    """,
    "q_doc_rep_ngrams": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(generate_series(
                       1, array_length(string_split(text, ' ')))) AS i
            FROM documents
        ), g AS (
            SELECT a.doc_id,
                   a.tok || ' ' || b.tok || ' ' || c.tok AS gram
            FROM toks a
            JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        ), cnt AS (
            SELECT doc_id, gram, count(*)::BIGINT AS c
            FROM g GROUP BY doc_id, gram
        )
        SELECT doc_id,
               sum(c)::BIGINT AS n_grams,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT
                   AS n_dup_occ,
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_dup_grams
        FROM cnt GROUP BY doc_id
        ORDER BY doc_id
    """,
    "q_lineitem_stats": """
        WITH p AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_discount * 100) AS BIGINT) AS y
            FROM lineitem
        ), s AS (
            SELECT l_returnflag, count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx,
                   sum(y)::BIGINT AS sy, sum(y * y)::BIGINT AS syy,
                   sum(x * y)::BIGINT AS sxy
            FROM p GROUP BY l_returnflag
        )
        SELECT l_returnflag, n, sx, sxx, sy, syy, sxy,
               sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    / (n::DOUBLE * (n::DOUBLE - 1))) AS stddev_qty,
               (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (sqrt(n::DOUBLE * sxx::DOUBLE
                           - sx::DOUBLE * sx::DOUBLE)
                      * sqrt(n::DOUBLE * syy::DOUBLE
                             - sy::DOUBLE * sy::DOUBLE))
                   AS corr_qty_disc
        FROM s
        ORDER BY l_returnflag
    """,
    "q_events_mode": """
        WITH c AS (
            SELECT event_type, user_id, count(*)::BIGINT AS n
            FROM events GROUP BY event_type, user_id
        ), r AS (
            SELECT event_type, user_id, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, user_id) AS rn
            FROM c
        )
        SELECT event_type, user_id::BIGINT AS modal_user,
               n AS n_events
        FROM r WHERE rn = 1
        ORDER BY event_type
    """,
    "q_events_histogram": """
        SELECT event_type,
               least(CAST(round(value * 100) AS BIGINT) // 500, 9)
                   AS bin,
               count(*)::BIGINT AS n
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, bin
    """,
    "q_events_distinct_users": """
        SELECT date_trunc('hour', ts) AS hour,
               count(DISTINCT user_id)::BIGINT AS n_users,
               count(*)::BIGINT AS n_events
        FROM events
        GROUP BY 1
        ORDER BY hour
    """,
    "q_events_pivot": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')::BIGINT
                   AS n_click,
               count(*) FILTER (WHERE event_type = 'error')::BIGINT
                   AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase')::BIGINT
                   AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')::BIGINT
                   AS n_signup,
               count(*) FILTER (WHERE event_type = 'view')::BIGINT
                   AS n_view,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT
                   AS total_cents
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_url_canonical": r"""
        WITH u AS (
            SELECT doc_id,
                   'https://site' || (doc_id % 97)::VARCHAR
                       || '.example/Path/' || doc_id::VARCHAR AS url,
                   lang
            FROM documents
        ), m AS (
            SELECT doc_id,
                   'HTTPS://WWW.'
                       || upper(regexp_extract(url, '^https://([^/]+)', 1))
                       || ':443'
                       || regexp_replace(url, '^https://[^/]+', '')
                       || '?utm_source=news&ref=' || lang || '#sec'
                       AS messy_url
            FROM u
        ), s AS (
            SELECT doc_id, messy_url,
                   regexp_replace(messy_url, '#.*$', '') AS nofrag
            FROM m
        ), parts AS (
            SELECT doc_id, messy_url,
                   lower(regexp_extract(
                       nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                       AS scheme,
                   lower(regexp_extract(
                       nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
                       AS host0,
                   regexp_replace(
                       nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
                       AS rest0
            FROM s
        ), canon AS (
            SELECT doc_id, messy_url, scheme,
                   CASE
                     WHEN scheme = 'https' THEN regexp_replace(
                         regexp_replace(host0, '^www\.', ''), ':443$', '')
                     WHEN scheme = 'http' THEN regexp_replace(
                         regexp_replace(host0, '^www\.', ''), ':80$', '')
                     ELSE regexp_replace(host0, '^www\.', '')
                   END AS host,
                   regexp_replace(regexp_replace(
                       rest0, 'utm_[a-z]+=[^&#]*&', ''),
                       '[?&]utm_[a-z]+=[^&#]*$', '') AS rest
            FROM parts
        )
        SELECT doc_id, messy_url,
               scheme || '://' || host || rest AS canon_url
        FROM canon
        ORDER BY doc_id
    """,
    "q_events_moving": """
        SELECT event_id, user_id,
               sum(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               )::BIGINT AS w3_cents,
               COALESCE(lead(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), -1)::BIGINT AS lead_event
        FROM events
        ORDER BY event_id
    """,
    "q_nation_suppliers": """
        SELECT n_name,
               string_agg(s_name, '|' ORDER BY s_name) AS names,
               count(*)::BIGINT AS n
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "q_doc_unigram": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), cnt AS (
            SELECT tok, count(*)::BIGINT AS c FROM toks GROUP BY tok
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_tokens,
               sum(c)::BIGINT AS sum_tok_freq,
               min(c)::BIGINT AS min_freq,
               sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        FROM toks JOIN cnt USING (tok)
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "q_orders_rank_window": """
        SELECT o_orderkey, o_orderpriority,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate) AS rnk
        FROM orders
        ORDER BY o_orderkey
    """,
    "q_nation_region_cross": """
        SELECT n.n_name, r.r_name
        FROM nation n CROSS JOIN region r
        ORDER BY n_name, r_name
    """,
    "q_doc_chunks": """
        WITH idx AS (
            SELECT doc_id, text,
                   unnest(range(0, greatest(
                       ceil((length(text) - 50) / 150.0)::BIGINT, 1)))
                       AS chunk_idx
            FROM documents
        )
        SELECT doc_id, chunk_idx,
               substr(text, (chunk_idx * 150 + 1)::INT, 200) AS chunk
        FROM idx
        ORDER BY doc_id, chunk_idx
    """,
    "q_orders_first_value": """
        SELECT o_orderkey, o_orderpriority,
               FIRST_VALUE(o_totalprice) OVER (
                   PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS first_price,
               LAST_VALUE(o_totalprice) OVER (
                   PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS last_price
        FROM orders
        ORDER BY o_orderkey
    """,
    "q_orders_cume_dist": """
        SELECT o_orderkey, o_orderpriority,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate) AS cume_dist,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_orderdate) AS percent_rank
        FROM orders
        ORDER BY o_orderkey
    """,
    "q_orders_ntile": """
        SELECT o_orderkey, o_orderpriority,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_orderkey) AS row_number,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_orderkey) AS tile
        FROM orders
        ORDER BY o_orderkey
    """,
    "q_cube_revenue": """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               round(sum(o_totalprice), 2) AS total,
               count(*)::BIGINT AS n
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY priority, status
    """,
    "q_events_lag": """
        SELECT event_id, user_id,
               COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), -1)
                   AS delta_us
        FROM events
        ORDER BY event_id
    """,
    "q_doc_fasttext": """
        WITH d AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
            FROM documents
        ), uni AS (
            SELECT doc_id, unnest(l) AS f FROM d
        ), big AS (
            SELECT doc_id, l[i] || ' ' || l[i + 1] AS f
            FROM (SELECT doc_id, l,
                         unnest(range(1, greatest(len(l), 1)::BIGINT))
                             AS i
                  FROM d)
        ), feats AS (
            SELECT doc_id, f FROM uni
            UNION ALL SELECT doc_id, f FROM big
        ), ws AS (
            SELECT doc_id,
                   count(*)::BIGINT AS n_feats,
                   SUM(('0x' || substr(md5(
                           ((('0x' || substr(md5(f), 1, 8))::BIGINT
                             % 1024))::VARCHAR), 1, 8))::BIGINT
                       % 2001 - 1000)::BIGINT AS w_sum
            FROM feats GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(ws.n_feats, 0)::BIGINT AS n_feats,
               COALESCE(ws.w_sum, 0)::BIGINT AS w_sum,
               COALESCE(CAST(floor(1000000.0 * (ws.w_sum
                   / (1000.0 * ws.n_feats))) AS BIGINT), 0)::BIGINT
                   AS score_scaled,
               CASE WHEN COALESCE(CAST(floor(1000000.0 * (ws.w_sum
                   / (1000.0 * ws.n_feats))) AS BIGINT), 0) > 0
                    THEN 'pos' ELSE 'neg' END AS label
        FROM d LEFT JOIN ws USING (doc_id)
        ORDER BY doc_id
    """,
    "q_events_entropy": """
        WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS c
                   FROM events GROUP BY 1, 2),
        n AS (SELECT user_id, sum(c)::BIGINT AS n FROM c GROUP BY 1)
        SELECT c.user_id, n.n AS n_events,
               SUM(CAST(floor(1000000000.0 * ((c.c / n.n)
                   * ln(n.n / c.c))) AS BIGINT))::BIGINT AS h_scaled
        FROM c JOIN n USING (user_id)
        GROUP BY 1, 2
        ORDER BY user_id
    """,
    "q_events_transitions": """
        WITH nxt AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       AS next_type
            FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
               count(*)::BIGINT AS n
        FROM nxt WHERE next_type IS NOT NULL
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q_events_quantiles": """
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95,
               count(value)::BIGINT AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_users_customers_fullouter": """
        WITH pu AS (
            SELECT user_id, count(event_id)::BIGINT AS n_events
            FROM events GROUP BY user_id
        )
        SELECT COALESCE(pu.user_id, c.c_custkey)::BIGINT AS key,
               COALESCE(pu.n_events, 0)::BIGINT AS n_events,
               COALESCE(c.c_mktsegment, '') AS c_mktsegment
        FROM pu FULL OUTER JOIN customer c ON pu.user_id = c.c_custkey
        ORDER BY key
    """,
    "q_users_click_and_purchase": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
        ORDER BY user_id
    """,
    "q_supplier_typo_pairs": """
        SELECT a.s_name AS a, b.s_name AS b
        FROM supplier a, supplier b
        WHERE a.s_name < b.s_name
          AND levenshtein(a.s_name, b.s_name) <= 1
        ORDER BY a, b
    """,
    "q_rollup_revenue": """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               round(sum(o_totalprice), 2) AS total,
               count(*)::BIGINT AS n
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        ORDER BY priority, status
    """,
    "q_orders_share": """
        WITH c AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), t AS (
            SELECT o_orderpriority, sum(cents) AS tot
            FROM c GROUP BY o_orderpriority
        )
        SELECT c.o_orderkey, c.o_orderpriority,
               CAST(c.cents AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
        FROM c JOIN t USING (o_orderpriority)
        ORDER BY c.o_orderkey
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                 AS sum_qty,
               round(sum(l_extendedprice), 2)                            AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)         AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2)                                 AS avg_qty,
               round(avg(l_extendedprice), 2)                            AS avg_price,
               round(avg(l_discount), 2)                                 AS avg_disc,
               count(*)                                                  AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q_events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               round(sum(value), 4) AS sum_value,
               count(*)             AS n_events
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
        ORDER BY event_type, hour
    """,
    "q_top_users": """
        SELECT user_id, round(sum(value), 4) AS total_value,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
        ORDER BY sum(value) DESC, user_id
        LIMIT 20
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "q_segment_revenue": """
        SELECT c_mktsegment,
               round(sum(o_totalprice), 2) AS total_revenue,
               count(*)                    AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
        )
        ORDER BY c_custkey
    """,
    "q_suppliers_with_shipments": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        ORDER BY s_suppkey
    """,
    "q_filter_topk_orders": """
        SELECT o_orderkey, o_custkey,
               floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
               o_orderdate
        FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 100000
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15
    """,
    "q_lineitem_expressions": """
        SELECT l_orderkey, l_linenumber,
               floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                     + 0.5) / 100 AS charge,
               CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS qty_class,
               l_returnflag || l_linestatus AS rl
        FROM lineitem
    """,
    "q_grouped_topk_parts": """
        SELECT p_brand, p_partkey, p_name,
               floor(p_retailprice * 100 + 0.5) / 100 AS p_retailprice
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey
            ) AS rn
            FROM part
        )
        WHERE rn <= 3
        ORDER BY p_brand, p_retailprice DESC, p_partkey
    """,
    "q_part_type_stats": """
        SELECT p_brand,
               round(avg(p_retailprice), 2) AS avg_price,
               max(p_size)                  AS max_size,
               count(*)                     AS n_parts
        FROM part
        WHERE p_type LIKE '%ARD%'
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "q_region_nation_union": """
        SELECT r_name AS name, 'region' AS kind FROM region
        UNION ALL
        SELECT n_name AS name, 'nation' AS kind FROM nation
        ORDER BY kind, name
    """,
    "q_dedup_groups": """
        SELECT lang, source, min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    "q_doc_token_stats": """
        SELECT lang,
               sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+')))::BIGINT AS total_tokens,
               round(avg(length(text)), 2)                         AS avg_chars,
               count(*)                                            AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "q_doc_quality": """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS token_count,
               floor(len(regexp_extract_all(text, '[.,;:!?]'))
                     / greatest(length(text), 1) * 10000 + 0.5) / 10000
                                                              AS punct_ratio,
               floor(len(regexp_extract_all(text, '[A-Z]'))
                     / greatest(length(text), 1) * 10000 + 0.5) / 10000
                                                              AS upper_ratio
        FROM documents
        ORDER BY doc_id
    """,
    "q_events_reorder_sessions": ORACLE_SQL_REORDER,
    "q_events_sessions_streaming": """
        SELECT user_id,
               sum(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
               count(*)                            AS n_events
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events
        )
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_events_sessions": """
        SELECT user_id,
               sum(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
               count(*)                            AS n_events
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events
        )
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q_events_sliding": """
        SELECT event_id, user_id,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS n_1h
        FROM events
        ORDER BY event_id
    """,
    "q_events_asof": """
        SELECT event_id, user_id, last_click_ts
        FROM (
            SELECT event_id, user_id, event_type,
                   max(CASE WHEN event_type = 'click' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_click_ts
            FROM events
        )
        WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "q_events_interval": """
        SELECT p.event_id, p.user_id, count(c.ts)::BIGINT AS n_recent_clicks
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts <  p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
        ORDER BY p.event_id
    """,
    "q_doc_langid": """
        WITH f AS (
            -- per-language stopword-hit counts; the per-row ntok
            -- normalisation the Ray side applies cancels out of both
            -- the argmax and the >0 check, so raw counts suffice here
            SELECT doc_id, lang,
                   len(regexp_extract_all(lower(text),
                       '\\b(der|die|das|und|ist|nicht|mit|ein|eine|für)\\b'
                   ))::DOUBLE AS n_de,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|and|of|to|in|is|that|with|for|was)\\b'
                   ))::DOUBLE AS n_en,
                   len(regexp_extract_all(lower(text),
                       '\\b(el|la|los|las|es|en|que|una|por|para)\\b'
                   ))::DOUBLE AS n_es,
                   len(regexp_extract_all(lower(text),
                       '\\b(le|la|les|et|est|dans|pour|que|une|des)\\b'
                   ))::DOUBLE AS n_fr,
                   len(regexp_extract_all(text, '[一-鿿]'))::DOUBLE
                       / greatest(length(text), 1) AS cjk
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN cjk > 0.05 THEN 'zh'
                    WHEN greatest(n_de, n_en, n_es, n_fr) <= 0.0
                        THEN 'unknown'
                    WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr
                        THEN 'de'
                    WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
                    WHEN n_es >= n_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM f
        ORDER BY doc_id
    """,
    "q_doc_gopher": """
        WITH f AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
                   greatest(len(regexp_extract_all(text, '\\S+')), 1)
                       AS nw,
                   len(regexp_extract_all(text, '\\S'))::DOUBLE AS n_chars,
                   len(regexp_extract_all(text, '[#…]'))::DOUBLE AS n_sym,
                   len(regexp_extract_all(text, '(?m)^[-*•]'))::DOUBLE
                       AS n_bullets,
                   greatest(len(string_split(text, chr(10))), 1) AS n_lines,
                   len(list_distinct(string_split(text, chr(10))))::DOUBLE
                       AS n_uniq_lines
            FROM documents
        )
        SELECT doc_id, n_words,
               floor(n_chars / nw * 10000 + 0.5) / 10000 AS mean_word_len,
               floor(n_sym / nw * 10000 + 0.5) / 10000   AS symbol_ratio,
               floor(n_bullets / n_lines * 10000 + 0.5) / 10000
                                                          AS bullet_frac,
               floor((1.0 - n_uniq_lines / n_lines) * 10000 + 0.5) / 10000
                                                          AS dup_line_frac,
               (n_words BETWEEN 50 AND 100000
                AND n_chars / nw BETWEEN 3.0 AND 10.0
                AND n_sym / nw <= 0.1
                AND n_bullets / n_lines <= 0.9
                AND (1.0 - n_uniq_lines / n_lines) <= 0.3) AS gopher_pass
        FROM f
        ORDER BY doc_id
    """,
    "q_doc_contamination": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ), bgrams AS (
            SELECT DISTINCT
                   array_to_string(list_slice(words, i, i + 7), ' ') AS gram
            FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
            WHERE doc_id % 50 = 0 AND len(words) >= 8
        ), dgrams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(words, i, i + 7), ' ') AS gram
            FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
            WHERE doc_id % 50 <> 0 AND len(words) >= 8
        ), hits AS (
            SELECT g.doc_id, count(*) AS n
            FROM dgrams g JOIN bgrams b USING (gram)
            GROUP BY g.doc_id
        )
        SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        LEFT JOIN hits h USING (doc_id)
        ORDER BY doc_id
    """,
    "q_doc_dup_ngrams": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000, text || ' tail'
            FROM documents WHERE doc_id % 10 = 0
        ), w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM corpus
        ), g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(words, i, i + 7), ' ') AS gram
            FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
            WHERE len(words) >= 8
        )
        SELECT gram, count(*)::BIGINT AS n_docs
        FROM g
        GROUP BY gram
        HAVING count(*) > 1
        ORDER BY n_docs DESC, gram
        LIMIT 100
    """,
    "q_doc_jaccard_pairs": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000, text || ' tail'
            FROM documents WHERE doc_id % 10 = 0
        ), w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM corpus
        ), g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(words, i, i + 7), ' ') AS gram
            FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
            WHERE len(words) >= 8
        ), sizes AS (
            SELECT doc_id, count(*)::BIGINT AS n FROM g GROUP BY doc_id
        ), inter AS (
            SELECT g1.doc_id AS a, g2.doc_id AS b,
                   count(*)::BIGINT AS inter
            FROM g g1 JOIN g g2 ON g1.gram = g2.gram
                              AND g1.doc_id < g2.doc_id
            GROUP BY 1, 2
        )
        SELECT i.a, i.b, i.inter,
               (sa.n + sb.n - i.inter)::BIGINT AS "union",
               i.inter::DOUBLE / (sa.n + sb.n - i.inter) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE i.inter::DOUBLE / (sa.n + sb.n - i.inter) >= 0.5
        ORDER BY a, b
    """,
    "q_doc_setjoin_prefix": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000, text || ' tail'
            FROM documents WHERE doc_id % 10 = 0
        ), w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM corpus
        ), g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(words, i, i + 3), ' ') AS gram
            FROM w, LATERAL unnest(range(1, len(words) - 2)) AS t(i)
            WHERE len(words) >= 4
        ), sizes AS (
            SELECT doc_id, count(*)::BIGINT AS n FROM g GROUP BY doc_id
        ), inter AS (
            SELECT g1.doc_id AS a, g2.doc_id AS b,
                   count(*)::BIGINT AS inter
            FROM g g1 JOIN g g2 ON g1.gram = g2.gram
                              AND g1.doc_id < g2.doc_id
            GROUP BY 1, 2
        )
        SELECT i.a, i.b, i.inter,
               (sa.n + sb.n - i.inter)::BIGINT AS "union",
               i.inter::DOUBLE / (sa.n + sb.n - i.inter) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE i.inter::DOUBLE / (sa.n + sb.n - i.inter) >= 0.6
        ORDER BY a, b
    """,
    "q_doc_sample_hash": """
        SELECT doc_id, lang
        FROM documents
        WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
              CASE lang WHEN 'en' THEN '8000'
                        WHEN 'de' THEN '4000'
                        ELSE '1999' END
        ORDER BY doc_id
    """,
    "q_doc_pii_scrub": """
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact u' || doc_id::VARCHAR
                             || '@example.com or 555-123-4567 at 192.168.1.'
                             || (doc_id % 256)::VARCHAR
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                   ))::BIGINT AS n_email,
               len(regexp_extract_all(text,
                   '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))::BIGINT AS n_phone,
               len(regexp_extract_all(text,
                   '\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b'))::BIGINT AS n_ipv4,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
                   '\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b', '<IP>', 'g'
               ) AS redacted
        FROM aug
        ORDER BY doc_id
    """,
    "q_events_range_frame": """
        SELECT event_id, user_id,
               count(*) OVER w AS w_cnt,
               sum((floor(value * 100 + 0.5))::BIGINT) OVER w / 100.0
                   AS w_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                           AND CURRENT ROW)
        ORDER BY event_id
    """,
    "q_doc_dsir": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, tok),
        cnt AS (
            SELECT tok, sum(tf)::BIGINT AS cs,
                   sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END)::BIGINT
                       AS ct
            FROM tf JOIN documents USING (doc_id)
            GROUP BY tok
        ),
        sc AS (SELECT sum(cs)::DOUBLE AS c_src, sum(ct)::DOUBLE AS c_tgt,
                      count(*)::DOUBLE AS v
               FROM cnt)
        SELECT tf.doc_id,
               round(sum(tf.tf * ln(((cnt.ct + 1.0)
                                     / ((SELECT c_tgt FROM sc)
                                        + (SELECT v FROM sc)))
                                    / ((cnt.cs + 1.0)
                                       / ((SELECT c_src FROM sc)
                                          + (SELECT v FROM sc))))), 6)
                   AS dsir_score
        FROM tf JOIN cnt USING (tok)
        GROUP BY tf.doc_id
        ORDER BY tf.doc_id
    """,
    "q_doc_sparse_search": """
        WITH qt(qid, tok) AS (VALUES ('qa','hash'), ('qa','join'),
                                     ('qb','window'), ('qb','sort'),
                                     ('qc','stream'), ('qc','batch')),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, tok),
        cooc AS (
            SELECT q.tok AS qtok, t2.tok,
                   count(DISTINCT t2.doc_id)::BIGINT AS c
            FROM (SELECT DISTINCT tok FROM qt) q
            JOIN tf t1 ON t1.tok = q.tok
            JOIN tf t2 ON t2.doc_id = t1.doc_id AND t2.tok <> q.tok
            GROUP BY q.tok, t2.tok
        ),
        exp2 AS (
            SELECT qtok, tok FROM (
                SELECT qtok, tok,
                       row_number() OVER (PARTITION BY qtok
                                          ORDER BY c DESC, tok) AS rk
                FROM cooc) WHERE rk <= 2
        ),
        qx AS (
            SELECT qid, tok, max(qw) AS qw FROM (
                SELECT qid, tok, 1.0 AS qw FROM qt
                UNION ALL
                SELECT qt.qid, exp2.tok, 0.3
                FROM qt JOIN exp2 ON exp2.qtok = qt.tok
            ) GROUP BY qid, tok
        ),
        w AS (SELECT tok,
                     1 + (('0x' || substr(md5(tok), 1, 8))::BIGINT % 1000)
                         / 1000.0 AS tw
              FROM (SELECT DISTINCT tok FROM qx)),
        s AS (SELECT qx.qid, tf.doc_id,
                     round(sum(qx.qw * w.tw * ln(1 + tf.tf)), 6) AS score
              FROM tf JOIN qx ON qx.tok = tf.tok JOIN w ON w.tok = tf.tok
              GROUP BY qx.qid, tf.doc_id),
        ranked AS (SELECT qid, doc_id, score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY score DESC, doc_id)
                              AS rk
                   FROM s)
        SELECT qid, doc_id, score FROM ranked WHERE rk <= 10
        ORDER BY qid, score DESC, doc_id
    """,
    "q_doc_maxsim": """
        WITH qt(qid, tok) AS (VALUES ('qa','hash'), ('qa','join'),
                                     ('qb','window'), ('qb','sort'),
                                     ('qc','stream'), ('qc','batch')),
        dtok AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(list_slice(
                           regexp_extract_all(lower(text), '[a-z0-9_]+'),
                           1, 32)) AS tok
                FROM documents)
        ),
        dv AS (SELECT doc_id, tok,
                   (('0x'||substr(md5(tok||'#0'),1,8))::BIGINT % 2001)
                       - 1000 AS v0,
                   (('0x'||substr(md5(tok||'#1'),1,8))::BIGINT % 2001)
                       - 1000 AS v1,
                   (('0x'||substr(md5(tok||'#2'),1,8))::BIGINT % 2001)
                       - 1000 AS v2,
                   (('0x'||substr(md5(tok||'#3'),1,8))::BIGINT % 2001)
                       - 1000 AS v3
               FROM dtok),
        qv AS (SELECT qid, tok,
                   (('0x'||substr(md5(tok||'#0'),1,8))::BIGINT % 2001)
                       - 1000 AS q0,
                   (('0x'||substr(md5(tok||'#1'),1,8))::BIGINT % 2001)
                       - 1000 AS q1,
                   (('0x'||substr(md5(tok||'#2'),1,8))::BIGINT % 2001)
                       - 1000 AS q2,
                   (('0x'||substr(md5(tok||'#3'),1,8))::BIGINT % 2001)
                       - 1000 AS q3
               FROM qt),
        ms AS (SELECT qv.qid, dv.doc_id, qv.tok,
                      max(dv.v0*qv.q0 + dv.v1*qv.q1
                          + dv.v2*qv.q2 + dv.v3*qv.q3) AS m
               FROM dv CROSS JOIN qv
               GROUP BY qv.qid, dv.doc_id, qv.tok),
        s AS (SELECT qid, doc_id, sum(m)::BIGINT AS score
              FROM ms GROUP BY qid, doc_id),
        ranked AS (SELECT qid, doc_id, score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY score DESC, doc_id)
                              AS rk
                   FROM s)
        SELECT qid, doc_id, score FROM ranked WHERE rk <= 10
        ORDER BY qid, score DESC, doc_id
    """,
    "q_doc_bm25_search": """
        WITH qt(qid, tok) AS (VALUES ('qa', 'hash'), ('qa', 'join'), ('qa', 'order'), ('qb', 'window'), ('qb', 'sort'), ('qb', 'merge'), ('qc', 'spark'), ('qc', 'stream'), ('qc', 'batch')),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        ),
        dl AS (SELECT doc_id, count(*)::BIGINT AS dl
               FROM toks GROUP BY doc_id),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
               FROM toks WHERE tok IN (SELECT tok FROM qt)
               GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS dfreq
                  FROM toks WHERE tok IN (SELECT tok FROM qt)
                  GROUP BY tok),
        n AS (SELECT count(*)::BIGINT AS n FROM documents),
        ad AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        w AS (
            SELECT tf.doc_id, tf.tok,
                   ln(((SELECT n FROM n) - dfreq.dfreq + 0.5)
                      / (dfreq.dfreq + 0.5) + 1)
                   * ((tf.tf * (1.2 + 1))
                      / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl)
                                        / (SELECT avgdl FROM ad)))) AS w
            FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
        ),
        s AS (SELECT qt.qid, w.doc_id, round(sum(w.w), 6) AS score
              FROM w JOIN qt USING (tok) GROUP BY qt.qid, w.doc_id),
        ranked AS (
            SELECT qid, doc_id, score,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
            FROM s
        )
        SELECT qid, doc_id, score FROM ranked WHERE rk <= 10
        ORDER BY qid, score DESC, doc_id
    """,
    "q_doc_bm25": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, tok),
        dl AS (SELECT doc_id, count(*)::BIGINT AS dl
               FROM toks GROUP BY doc_id),
        dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS dfreq
                  FROM toks GROUP BY tok),
        n AS (SELECT count(*)::BIGINT AS n FROM documents),
        ad AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        scored AS (
            SELECT tf.doc_id, tf.tok, tf.tf,
                   ln(((SELECT n FROM n) - dfreq.dfreq + 0.5)
                      / (dfreq.dfreq + 0.5) + 1)
                   * ((tf.tf * (1.2 + 1))
                      / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl)
                                        / (SELECT avgdl FROM ad)))) AS s
            FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
        ),
        ranked AS (
            SELECT doc_id, tok, tf, s,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY s DESC, tok) AS rk
            FROM scored
        )
        SELECT doc_id, tok, tf, round(s, 6) AS bm25
        FROM ranked WHERE rk <= 3
        ORDER BY doc_id, bm25 DESC, tok
    """,
    "q_doc_tfidf": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS dfreq
                  FROM toks GROUP BY tok),
        n AS (SELECT count(*)::BIGINT AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok, tf.tf,
                   tf.tf * ln((SELECT n FROM n)::DOUBLE / dfreq.dfreq) AS s
            FROM tf JOIN dfreq USING (tok)
        ),
        ranked AS (
            SELECT doc_id, tok, tf, s,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY s DESC, tok) AS rk
            FROM scored
        )
        SELECT doc_id, tok, tf, round(s, 6) AS tfidf
        FROM ranked WHERE rk <= 3
        ORDER BY doc_id, tfidf DESC, tok
    """,
    "q_doc_top_tokens": """
        SELECT tok, count(*)::BIGINT AS n
        FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
            FROM documents
        )
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    "q_orders_priority_leftjoin": """
        SELECT o_orderpriority,
               count(c.c_custkey)::BIGINT AS n_building,
               count(*)::BIGINT           AS n_orders
        FROM orders o
        LEFT JOIN (SELECT c_custkey FROM customer
                   WHERE c_mktsegment = 'BUILDING') c
          ON o.o_custkey = c.c_custkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_doc_bpe_tokens": """
        SELECT doc_id,
               len(regexp_extract_all(
                   text, '[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\\s]+'
               ))::BIGINT AS bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "q_knn_cosine": """
        SELECT vec_id,
               round(list_cosine_similarity(
                   embedding::DOUBLE[],
                   (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
               ), 4) AS cosine,
               row_number() OVER (
                   ORDER BY list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
                   ) DESC, vec_id
               ) AS rank
        FROM embeddings
        ORDER BY rank
        LIMIT 10
    """,
}


def _kmeans_ctes(*, k: int, rounds: int, dim: int,
                 q_scale: int) -> tuple[list[str], str]:
    """Shared CTE chain for the generated k-means oracles: each Lloyd
    round is a literal pair of CTEs (exact BIGINT centroid sums via
    GROUP BY, then reassignment via CROSS JOIN + ROW_NUMBER over the
    identical one-division distance expression) — bit-identical to
    similarity.kmeans_quantized by construction.  Returns (ctes,
    final_cte_name); the final CTE carries vec_id, x0..x{dim-1},
    cluster."""
    xs = ", ".join(
        f"CAST(floor(embedding[{i + 1}] * {q_scale}.0) AS BIGINT) AS x{i}"
        for i in range(dim))
    cols = ", ".join(f"x{i}" for i in range(dim))
    ctes = [
        f"pts AS (SELECT vec_id, {xs} FROM embeddings)",
        f"a0 AS (SELECT vec_id, {cols}, vec_id % {k} AS cluster FROM pts)",
    ]
    for r in range(1, rounds + 1):
        sums = ", ".join(f"SUM(x{i})::BIGINT AS s{i}" for i in range(dim))
        ctes.append(
            f"c{r} AS (SELECT cluster, count(*)::BIGINT AS n, {sums} "
            f"FROM a{r - 1} GROUP BY cluster)")
        terms = " + ".join(
            f"(c.n*p.x{i} - c.s{i})*(c.n*p.x{i} - c.s{i})"
            for i in range(dim))
        pcols = ", ".join(f"p.x{i}" for i in range(dim))
        ctes.append(
            f"a{r} AS (SELECT vec_id, {cols}, cand AS cluster FROM ("
            f"SELECT p.vec_id, {pcols}, c.cluster AS cand, "
            f"ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY "
            f"({terms})::DOUBLE / (c.n*c.n)::DOUBLE, c.cluster) AS rn "
            f"FROM a{r - 1} p CROSS JOIN c{r} c) WHERE rn = 1)")
    return ctes, f"a{rounds}"


def _kmeans_oracle_sql(*, k: int, rounds: int, dim: int, q_scale: int) -> str:
    ctes, fin = _kmeans_ctes(k=k, rounds=rounds, dim=dim, q_scale=q_scale)
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT vec_id, cluster::BIGINT AS cluster "
            f"FROM {fin} ORDER BY vec_id")


def _sem_dedup_oracle_sql(*, k: int, rounds: int, dim: int, q_scale: int,
                          tau_num: int, tau_den: int) -> str:
    """Generated oracle for q_sem_dedup: the k-means CTE chain, then a
    within-cluster lower-id self-join with the SAME rational cosine
    test similarity.sem_dedup runs — den²·dot² ≥ num²·‖a‖²·‖b‖² in
    pure BIGINT arithmetic (the dot over quantized int coordinates, so
    the comparison is exact in both engines)."""
    ctes, fin = _kmeans_ctes(k=k, rounds=rounds, dim=dim, q_scale=q_scale)
    cols = ", ".join(f"x{i}" for i in range(dim))
    nrm = " + ".join(f"x{i}*x{i}" for i in range(dim))
    dot = " + ".join(f"a.x{i}*b.x{i}" for i in range(dim))
    # pn MUST be MATERIALIZED: DuckDB inlines CTEs per reference, and
    # pn is referenced three times — inlining replays the whole
    # unrolled k-means chain per reference (observed OOM); the dot is
    # computed ONCE per pair in prs, never re-evaluated inside the
    # aggregate
    ctes.append(
        f"pn AS MATERIALIZED (SELECT vec_id, cluster, {cols}, "
        f"({nrm})::BIGINT AS nrm FROM {fin})")
    ctes.append(
        f"prs AS (SELECT a.vec_id AS vid, ({dot})::BIGINT AS dot, "
        f"a.nrm AS na, b.nrm AS nb FROM pn a JOIN pn b "
        f"ON b.cluster = a.cluster AND b.vec_id < a.vec_id)")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT p.vec_id, p.cluster::BIGINT AS cluster,
               coalesce(bool_or(r.dot > 0 AND
                   {tau_den * tau_den}*r.dot*r.dot >=
                   {tau_num * tau_num}*r.na*r.nb), false) AS is_dup
        FROM pn p LEFT JOIN prs r ON r.vid = p.vec_id
        GROUP BY p.vec_id, p.cluster
        ORDER BY p.vec_id""")


ORACLE_SQL["q_hard_negatives"] = """
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(floor(x * 1024) AS BIGINT)) AS l
        FROM embeddings
    ), q AS (
        SELECT vec_id AS anchor_id, label AS alabel, l AS ql
        FROM e WHERE vec_id IN (0, 1, 2)
    ), flat AS (
        SELECT q.anchor_id, q.alabel, e.vec_id, e.label,
               unnest(q.ql) AS a, unnest(e.l) AS b
        FROM q CROSS JOIN e
    ), dots AS (
        SELECT anchor_id, alabel, vec_id, label,
               SUM(a * b)::BIGINT AS dot,
               SUM(a * a)::BIGINT AS na,
               SUM(b * b)::BIGINT AS nb
        FROM flat GROUP BY anchor_id, alabel, vec_id, label
    ), scored AS (
        SELECT anchor_id, vec_id,
               CAST(dot AS DOUBLE)
                   / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                   AS score,
               row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY CAST(dot AS DOUBLE)
                       / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                       DESC, vec_id) AS rank
        FROM dots WHERE nb > 0 AND label <> alabel
    )
    SELECT anchor_id, vec_id, score, rank::BIGINT AS rank
    FROM scored WHERE rank <= 10
    ORDER BY anchor_id, rank
"""

ORACLE_SQL["q_events_dquantiles"] = """
    WITH samp AS (
        SELECT value FROM events
        ORDER BY md5(event_id::VARCHAR), event_id
        LIMIT 512
    )
    SELECT 0.1::DOUBLE AS q,
           percentile_cont(0.1) WITHIN GROUP (ORDER BY value) AS value,
           count(*)::BIGINT AS n_sample FROM samp
    UNION ALL
    SELECT 0.5::DOUBLE,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY value),
           count(*)::BIGINT FROM samp
    UNION ALL
    SELECT 0.9::DOUBLE,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY value),
           count(*)::BIGINT FROM samp
    UNION ALL
    SELECT 0.99::DOUBLE,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY value),
           count(*)::BIGINT FROM samp
    ORDER BY q
"""

ORACLE_SQL["q_doc_rerank"] = """
    WITH qt(qid, tok) AS (VALUES ('qa', 'hash'), ('qa', 'join'),
        ('qa', 'order'), ('qb', 'window'), ('qb', 'sort'),
        ('qb', 'merge'), ('qc', 'spark'), ('qc', 'stream'),
        ('qc', 'batch')),
    toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
                   AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl
           FROM toks GROUP BY doc_id),
    tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
           FROM toks WHERE tok IN (SELECT tok FROM qt)
           GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS dfreq
              FROM toks WHERE tok IN (SELECT tok FROM qt)
              GROUP BY tok),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    ad AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    w AS (
        SELECT tf.doc_id, tf.tok,
               ln(((SELECT n FROM n) - dfreq.dfreq + 0.5)
                  / (dfreq.dfreq + 0.5) + 1)
               * ((tf.tf * (1.2 + 1))
                  / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl)
                                    / (SELECT avgdl FROM ad)))) AS w
        FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
    ),
    s AS (SELECT qt.qid, w.doc_id, round(sum(w.w), 6) AS score
          FROM w JOIN qt USING (tok) GROUP BY qt.qid, w.doc_id),
    cand AS (
        SELECT qid, doc_id, score AS bm25_score,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
        FROM s
    ),
    ce AS (
        SELECT qt.qid, tf.doc_id,
               sum(((('0x' || substr(md5(qt.qid || '|' || qt.tok),
                                     1, 8))::BIGINT % 1000) / 1000.0)
                   * ln(1 + tf.tf)) AS ce_raw
        FROM tf JOIN qt USING (tok)
        GROUP BY qt.qid, tf.doc_id
    ),
    fin AS (
        SELECT c.qid, c.doc_id, c.bm25_score,
               round(coalesce(ce.ce_raw, 0)
                     + ((('0x' || substr(md5(c.qid || '|'
                             || c.doc_id::VARCHAR), 1, 8))::BIGINT
                         % 1000) / 1000.0), 6) AS ce_score
        FROM cand c LEFT JOIN ce ON ce.qid = c.qid
                                AND ce.doc_id = c.doc_id
        WHERE c.rk <= 20
    ),
    rr AS (
        SELECT qid, doc_id, bm25_score, ce_score,
               row_number() OVER (
                   PARTITION BY qid
                   ORDER BY ce_score DESC, doc_id)::BIGINT AS "rank"
        FROM fin
    )
    SELECT qid, doc_id, bm25_score, ce_score, "rank"
    FROM rr WHERE "rank" <= 5
    ORDER BY qid, "rank"
"""

ORACLE_SQL["q_doc_hearst"] = """
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS w
        FROM documents
    ), aug AS (
        SELECT doc_id,
               CASE doc_id % 7
                 WHEN 0 THEN text || ' systems such as ' || w[1] || ', '
                             || w[2] || ' and ' || w[3] || '.'
                 WHEN 1 THEN text || ' ' || w[1] || ' and other engines.'
                 WHEN 2 THEN text || ' operators, including ' || w[2]
                             || ' and ' || w[3] || '.'
                 WHEN 3 THEN text || ' frameworks, especially ' || w[1]
                             || '.'
                 ELSE text END AS text
        FROM t
    ), m AS (
        SELECT doc_id, 'such_as' AS pattern,
               regexp_extract(text,
                   '([a-z]+) such as ([a-z]+), ([a-z]+) and ([a-z]+)',
                   1) AS obj,
               [regexp_extract(text,
                   '([a-z]+) such as ([a-z]+), ([a-z]+) and ([a-z]+)', 2),
                regexp_extract(text,
                   '([a-z]+) such as ([a-z]+), ([a-z]+) and ([a-z]+)', 3),
                regexp_extract(text,
                   '([a-z]+) such as ([a-z]+), ([a-z]+) and ([a-z]+)', 4)]
                   AS subjs
        FROM aug
        WHERE regexp_matches(text,
                  '([a-z]+) such as ([a-z]+), ([a-z]+) and ([a-z]+)')
        UNION ALL
        SELECT doc_id, 'and_other',
               regexp_extract(text, '([a-z]+) and other ([a-z]+)', 2),
               [regexp_extract(text, '([a-z]+) and other ([a-z]+)', 1)]
        FROM aug
        WHERE regexp_matches(text, '([a-z]+) and other ([a-z]+)')
        UNION ALL
        SELECT doc_id, 'including',
               regexp_extract(text,
                   '([a-z]+), including ([a-z]+) and ([a-z]+)', 1),
               [regexp_extract(text,
                   '([a-z]+), including ([a-z]+) and ([a-z]+)', 2),
                regexp_extract(text,
                   '([a-z]+), including ([a-z]+) and ([a-z]+)', 3)]
        FROM aug
        WHERE regexp_matches(text,
                  '([a-z]+), including ([a-z]+) and ([a-z]+)')
        UNION ALL
        SELECT doc_id, 'especially',
               regexp_extract(text, '([a-z]+), especially ([a-z]+)', 1),
               [regexp_extract(text, '([a-z]+), especially ([a-z]+)', 2)]
        FROM aug
        WHERE regexp_matches(text, '([a-z]+), especially ([a-z]+)')
    )
    SELECT doc_id, pattern,
           unnest(subjs) AS subj, 'isa' AS pred, obj,
           unnest(generate_series(1, array_length(subjs)))::BIGINT
               AS hypo_idx
    FROM m
    ORDER BY doc_id, pattern, hypo_idx
"""

ORACLE_SQL["q_sample_priority"] = """
    WITH w AS (
        SELECT event_id,
               floor(abs(value) * 100 + 0.5)::BIGINT + 1 AS weight,
               ('0x' || substr(md5(event_id::VARCHAR), 1, 13))::BIGINT
                   AS h
        FROM events
    ), p AS (
        SELECT event_id, weight,
               h::DOUBLE / weight::DOUBLE AS priority
        FROM w
    ), tau AS (
        SELECT priority AS t FROM p
        ORDER BY priority, event_id
        LIMIT 1 OFFSET 50
    )
    SELECT event_id, weight, priority,
           greatest(weight::DOUBLE,
                    4503599627370496.0 / (SELECT t FROM tau))
               AS est_weight
    FROM p ORDER BY priority, event_id LIMIT 50
"""

ORACLE_SQL["q_events_cms"] = """
    WITH cnt AS (
        SELECT user_id, count(*)::BIGINT AS exact
        FROM events GROUP BY user_id
    ), bk AS (
        SELECT user_id, r.d,
               ('0x' || substr(md5(r.d::VARCHAR || '|'
                                   || user_id::VARCHAR), 1, 8))::BIGINT
                   % 64 AS b
        FROM cnt, range(4) r(d)
    ), counters AS (
        SELECT bk.d, bk.b, sum(c.exact)::BIGINT AS counter
        FROM bk JOIN cnt c USING (user_id)
        GROUP BY bk.d, bk.b
    ), est AS (
        SELECT bk.user_id, min(co.counter)::BIGINT AS est
        FROM bk JOIN counters co ON co.d = bk.d AND co.b = bk.b
        GROUP BY bk.user_id
    )
    SELECT c.user_id, c.exact, e.est,
           (e.est - c.exact)::BIGINT AS overcount
    FROM cnt c JOIN est e USING (user_id)
    ORDER BY c.user_id
"""

ORACLE_SQL["q_kmeans"] = _kmeans_oracle_sql(k=8, rounds=4, dim=64,
                                            q_scale=1024)

ORACLE_SQL["q_sem_dedup"] = _sem_dedup_oracle_sql(
    k=8, rounds=4, dim=64, q_scale=1024, tau_num=2, tau_den=5)


ORACLE_SQL["q_events_user_join"] = """
    SELECT e.event_id, e.user_id,
           coalesce(c.c_name, '') AS c_name, e.value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY e.event_id
"""


ORACLE_SQL["q_doc_dup_spans"] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, text || ' tail'
        FROM documents WHERE doc_id % 10 = 0
    ), w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM corpus
    ), g AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(list_slice(words, i, i + 7), ' ') AS gram
        FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
        WHERE len(words) >= 8
    ), dup AS (
        SELECT doc_id, pos FROM g
        WHERE gram IN (SELECT gram FROM g
                       GROUP BY gram HAVING count(*) >= 2)
    ), isl AS (
        SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER win IS NULL
                         OR pos > lag(pos) OVER win + 8
                    THEN 1 ELSE 0 END AS brk
        FROM dup WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ), grp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        FROM isl
    )
    SELECT doc_id, min(pos)::BIGINT AS span_start,
           (max(pos) + 7)::BIGINT AS span_end,
           (max(pos) - min(pos) + 8)::BIGINT AS span_tokens
    FROM grp GROUP BY doc_id, gid
    ORDER BY doc_id, span_start
"""


ORACLE_SQL["q_doc_dedup_spans"] = """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, text || ' tail'
        FROM documents WHERE doc_id % 10 = 0
    ), w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM corpus
    ), g AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(words, i, i + 7), ' ') AS gram
        FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
        WHERE len(words) >= 8
    ), dup AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
    ), gf AS (
        SELECT g.doc_id, g.pos,
               CASE WHEN d.gram IS NULL THEN 0 ELSE 1 END AS f
        FROM g LEFT JOIN dup d USING (gram)
    ), toks AS (
        SELECT doc_id, i AS pos, words[i] AS tok
        FROM w, LATERAL unnest(range(1, len(words) + 1)) AS t(i)
    ), m AS (
        SELECT t.doc_id, t.pos, t.tok,
               max(coalesce(gf.f, 0)) OVER (
                   PARTITION BY t.doc_id ORDER BY t.pos
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS masked
        FROM toks t
        LEFT JOIN gf ON gf.doc_id = t.doc_id AND gf.pos = t.pos
    )
    SELECT doc_id,
           coalesce(string_agg(tok, ' ' ORDER BY pos)
                    FILTER (WHERE masked = 0), '') AS clean_text,
           sum(masked)::BIGINT AS n_masked,
           count(*)::BIGINT AS n_tokens
    FROM m GROUP BY doc_id ORDER BY doc_id
"""


def q_doc_minhash_sig(sf_dir: str) -> pd.DataFrame:
    """Hash-verified MinHash signature kernel (md5-variant twin of the
    production crc32 path — same min-over-permutations math, see
    dedup.minhash_signatures_md5): 8 permutations over distinct 3-word
    shingles, exact int64 universal hashing mod 2^61-1."""
    from ..functions.dedup import minhash_signatures_md5

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = minhash_signatures_md5(docs).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_doc_simhash_sig(sf_dir: str) -> pd.DataFrame:
    """Hash-verified SimHash bit-vote kernel (md5-variant twin of the
    production path): 16-bit frequency-weighted signature over word
    bigrams with multiplicity."""
    from ..functions.dedup import simhash_signatures_md5

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = simhash_signatures_md5(docs).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


_MINHASH_SIGS = ",\n           ".join(
    f"min(((('0x' || substr(md5('a|{j}'), 1, 8))::BIGINT"
    f" % 2147483647 + 1) * x"
    f" + ('0x' || substr(md5('b|{j}'), 1, 8))::BIGINT % 2147483648)"
    f" % 2305843009213693951)::BIGINT AS sig{j}"
    for j in range(8))
ORACLE_SQL["q_doc_minhash_sig"] = f"""
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS s
        FROM (SELECT doc_id, l,
                     unnest(range(1, len(l) - 1)) AS i
              FROM d WHERE len(l) >= 3)
    ), x AS (
        SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS x
        FROM sh
    )
    SELECT doc_id,
           {_MINHASH_SIGS}
    FROM x GROUP BY doc_id ORDER BY doc_id
"""

ORACLE_SQL["q_doc_phrase_search"] = """
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), pos AS (
        SELECT doc_id, i AS p, l[i] AS w
        FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
              FROM toks)
    ), big AS (
        SELECT a.w || ' ' || b.w AS phrase, count(*)::BIGINT AS n
        FROM pos a JOIN pos b
          ON b.doc_id = a.doc_id AND b.p = a.p + 1
        GROUP BY 1
    ), top5 AS (
        SELECT phrase FROM big ORDER BY n DESC, phrase LIMIT 5
    )
    SELECT DISTINCT t.phrase, a.doc_id
    FROM top5 t
    JOIN pos a ON a.w = split_part(t.phrase, ' ', 1)
    JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
             AND b.w = split_part(t.phrase, ' ', 2)
    ORDER BY phrase, a.doc_id
"""


_DD_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, is_new, {k} AS k, sig{2 * k} AS s1, "
    f"sig{2 * k + 1} AS s2 FROM sg"
    for k in range(4))
ORACLE_SQL["q_doc_delta_dedup"] = f"""
    WITH dd AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 5 = 0 AS is_new
        FROM documents
    ), hx AS (
        SELECT doc_id, is_new, md5(text) AS h FROM dd
    ), exact AS (
        SELECT n.doc_id, min(b.doc_id)::BIGINT AS m
        FROM hx n JOIN hx b ON b.h = n.h AND NOT b.is_new
        WHERE n.is_new GROUP BY n.doc_id
    ), toks AS (
        SELECT doc_id, is_new,
               regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM dd
    ), sh AS (
        SELECT DISTINCT doc_id, is_new,
               l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS s
        FROM (SELECT doc_id, is_new, l,
                     unnest(range(1, len(l) - 1)) AS i
              FROM toks WHERE len(l) >= 3)
    ), x AS (
        SELECT doc_id, is_new,
               ('0x' || substr(md5(s), 1, 8))::BIGINT AS x
        FROM sh
    ), sg AS (
        SELECT doc_id, is_new,
               {_MINHASH_SIGS}
        FROM x GROUP BY doc_id, is_new
    ), bands AS ({_DD_BANDS}
    ), near AS (
        SELECT n.doc_id, min(b.doc_id)::BIGINT AS m
        FROM bands n JOIN bands b
          ON b.k = n.k AND b.s1 = n.s1 AND b.s2 = n.s2
         AND NOT b.is_new
        WHERE n.is_new GROUP BY n.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN e.m IS NOT NULL THEN 'exact_dup'
                WHEN nr.m IS NOT NULL THEN 'near_dup'
                ELSE 'fresh' END AS status,
           COALESCE(e.m, nr.m, -1)::BIGINT AS match_id
    FROM dd d LEFT JOIN exact e ON e.doc_id = d.doc_id
              LEFT JOIN near nr ON nr.doc_id = d.doc_id
    WHERE d.is_new
    ORDER BY d.doc_id
"""

def q_doc_winnowing(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprint selection (dedup.winnowing_fingerprints,
    the MOSS rule): char-5-gram md5 hashes over cleaned text, window
    of 4, rightmost-min selection via the h·L−pos key — the
    guaranteed-overlap sparse fingerprint set for plagiarism-style
    matching."""
    from ..functions.dedup import winnowing_fingerprints

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return winnowing_fingerprints(ds, k=5, w=4)


def q_doc_simhash_dedup(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup PAIRS at Hamming ≤ 3 via the 4-chunk
    pigeonhole index (dedup.simhash_near_pairs — Manku WWW'07): a
    pair within radius 3 must agree on one of four 4-bit chunks, so
    candidates generate per chunk bucket, never all-pairs, then
    verify by exact popcount of the signature XOR."""
    from ..functions.dedup import simhash_near_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_pairs(ds, max_hamming=3)


ORACLE_SQL["q_doc_winnowing"] = """
    WITH d AS (
        SELECT doc_id,
               regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
        FROM documents
    ), g AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5(substr(t, i, 5)), 1, 8))::BIGINT
                   AS h
        FROM d, unnest(range(1, length(t) - 5 + 2)) AS u(i)
        WHERE length(t) >= 5
    ), wk AS (
        -- rightmost-min tie rule as one integer key: h*L - pos
        SELECT doc_id, pos,
               min(h * 1048576 - pos) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
        FROM g
    ), chosen AS (
        SELECT DISTINCT doc_id, sel FROM wk WHERE pos >= 4
    )
    SELECT doc_id,
           ((sel + 1048576) // 1048576) * 1048576 - sel AS pos,
           (sel + 1048576) // 1048576 AS fp
    FROM chosen
    ORDER BY doc_id, pos, fp
"""

ORACLE_SQL["q_doc_simhash_dedup"] = """
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), sh AS (
        SELECT doc_id, l[i] || ' ' || l[i + 1] AS s
        FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i
              FROM d WHERE len(l) >= 2)
    ), x AS (
        SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS x
        FROM sh
    ), votes AS (
        SELECT doc_id, b.i AS bit,
               SUM(((x >> b.i) & 1) * 2 - 1)::BIGINT AS v
        FROM x CROSS JOIN (SELECT unnest(range(0, 16)) AS i) b
        GROUP BY 1, 2
    ), sig AS (
        SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit)
                        ELSE 0 END)::BIGINT AS sh16
        FROM votes GROUP BY doc_id
    ), ch AS (
        SELECT doc_id, sh16, k.k, (sh16 >> (k.k * 4)) & 15 AS cv
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
    )
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
           bit_count(xor(a.sh16, b.sh16))::BIGINT AS hamming
    FROM ch a JOIN ch b
      ON b.k = a.k AND b.cv = a.cv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh16, b.sh16)) <= 3
    ORDER BY a, b
"""

ORACLE_SQL["q_doc_simhash_sig"] = """
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), sh AS (
        SELECT doc_id, l[i] || ' ' || l[i + 1] AS s
        FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i
              FROM d WHERE len(l) >= 2)
    ), x AS (
        SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS x
        FROM sh
    ), votes AS (
        SELECT doc_id, b.i AS bit,
               SUM(((x >> b.i) & 1) * 2 - 1)::BIGINT AS v,
               count(*)::BIGINT AS n
        FROM x CROSS JOIN (SELECT unnest(range(0, 16)) AS i) b
        GROUP BY 1, 2
    )
    SELECT doc_id, min(n)::BIGINT AS n_shingles,
           SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit)
                    ELSE 0 END)::BIGINT AS simhash16
    FROM votes GROUP BY doc_id ORDER BY doc_id
"""


ORACLE_SQL["q_knn_exact"] = """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(x * 1024) AS BIGINT)) AS l
        FROM embeddings
    ), q AS (
        SELECT vec_id AS qid, l AS ql FROM e WHERE vec_id IN (0, 1, 2)
    ), flat AS (
        SELECT q.qid, e.vec_id, unnest(q.ql) AS a, unnest(e.l) AS b
        FROM q CROSS JOIN e
    ), dots AS (
        SELECT qid, vec_id,
               SUM(a * b)::BIGINT AS dot,
               SUM(a * a)::BIGINT AS na,
               SUM(b * b)::BIGINT AS nb
        FROM flat GROUP BY qid, vec_id
    ), scored AS (
        SELECT qid, vec_id,
               CAST(dot AS DOUBLE)
                   / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                   AS score,
               row_number() OVER (
                   PARTITION BY qid
                   ORDER BY CAST(dot AS DOUBLE)
                       / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                       DESC, vec_id) AS rank
        FROM dots WHERE nb > 0
    )
    SELECT qid, vec_id, score, rank::BIGINT AS rank
    FROM scored WHERE rank <= 10
    ORDER BY qid, rank
"""


def q_doc_keyphrases(sf_dir: str) -> pd.DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): top-3 candidate
    phrases per doc by integer-scaled degree/frequency score — see
    text.rake_keyphrases for the exactness contract."""
    from ..functions.text import rake_keyphrases

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = rake_keyphrases(docs).to_pandas()
    return df.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def _rake_oracle_sql() -> str:
    from ..functions.text import RAKE_STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"""
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), t AS (
        SELECT doc_id, i AS pos, l[i] AS tok,
               CASE WHEN l[i] IN ({stop_list}) THEN 1 ELSE 0 END AS stop
        FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
    ), g AS (
        SELECT doc_id, pos, tok, stop,
               SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM t
    ), w AS (
        SELECT doc_id, grp, pos, tok FROM g WHERE stop = 0
    ), plen AS (
        SELECT doc_id, grp, count(*)::BIGINT AS ln,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM w GROUP BY doc_id, grp
    ), stats AS (
        SELECT w.doc_id, w.tok,
               count(*)::BIGINT AS freq,
               SUM(p.ln)::BIGINT AS deg
        FROM w JOIN plen p USING (doc_id, grp)
        GROUP BY 1, 2
    ), score AS (
        SELECT w.doc_id, w.grp,
               SUM(CAST(floor(1000000.0 * (s.deg / s.freq))
                   AS BIGINT))::BIGINT AS sc
        FROM w JOIN stats s ON s.doc_id = w.doc_id AND s.tok = w.tok
        GROUP BY 1, 2
    ), ph AS (
        SELECT DISTINCT p.doc_id, p.phrase, s.sc
        FROM plen p JOIN score s
            ON s.doc_id = p.doc_id AND s.grp = p.grp
    ), ranked AS (
        SELECT doc_id, phrase, sc AS rake_scaled,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY sc DESC, phrase) AS rnk
        FROM ph
    )
    SELECT doc_id, phrase, rake_scaled, rnk::BIGINT AS rank
    FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rank
"""


ORACLE_SQL["q_doc_keyphrases"] = _rake_oracle_sql()

ORACLE_SQL["q_doc_hybrid_rrf"] = f"""
    WITH bm AS (SELECT * FROM ({ORACLE_SQL['q_doc_bm25_search']})),
    sp AS (SELECT * FROM ({ORACLE_SQL['q_doc_sparse_search']})),
    ra AS (SELECT qid, doc_id,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id) AS r
           FROM bm),
    rb AS (SELECT qid, doc_id,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id) AS r
           FROM sp),
    fused AS (
        SELECT coalesce(ra.qid, rb.qid) AS qid,
               coalesce(ra.doc_id, rb.doc_id) AS doc_id,
               coalesce(1000000000 // (60 + ra.r), 0)
               + coalesce(1000000000 // (60 + rb.r), 0) AS rrf
        FROM ra FULL OUTER JOIN rb
          ON ra.qid = rb.qid AND ra.doc_id = rb.doc_id)
    SELECT qid, doc_id, rrf::BIGINT AS rrf FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY rrf DESC, doc_id) AS rn
        FROM fused) WHERE rn <= 10
    ORDER BY qid, rrf DESC, doc_id
"""


def _zorder_oracle_sql() -> str:
    """Generated Z-order oracle: the same unrolled shift/mask spread
    as layout.morton_key, integer end to end."""
    from ..functions.layout import morton_sql

    return f"""
        SELECT event_id, zkey, zkey >> 28 AS zbucket FROM (
            SELECT event_id, {morton_sql('xk', 'yk')} AS zkey FROM (
                SELECT event_id,
                       user_id & 65535 AS xk,
                       (epoch_us(ts) // 1000000) & 65535 AS yk
                FROM events))
        ORDER BY event_id
    """


ORACLE_SQL["q_events_zorder"] = _zorder_oracle_sql()

# Retrieval eval: the BM25 ranked run (identical CTE chain to
# q_doc_bm25_search) scored against conjunctive-containment qrels —
# every metric an exact integer (mrr scaled by lcm(1..10) = 2520,
# precision/recall in basis points via integer division)
ORACLE_SQL["q_retrieval_eval"] = """
    WITH qt(qid, tok) AS (VALUES ('qa', 'hash'), ('qa', 'join'), ('qa', 'order'), ('qb', 'window'), ('qb', 'sort'), ('qb', 'merge'), ('qc', 'spark'), ('qc', 'stream'), ('qc', 'batch')),
    toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl
           FROM toks GROUP BY doc_id),
    tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
           FROM toks WHERE tok IN (SELECT tok FROM qt)
           GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS dfreq
              FROM toks WHERE tok IN (SELECT tok FROM qt)
              GROUP BY tok),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    ad AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
    w AS (
        SELECT tf.doc_id, tf.tok,
               ln(((SELECT n FROM n) - dfreq.dfreq + 0.5)
                  / (dfreq.dfreq + 0.5) + 1)
               * ((tf.tf * (1.2 + 1))
                  / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl)
                                    / (SELECT avgdl FROM ad)))) AS w
        FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
    ),
    s AS (SELECT qt.qid, w.doc_id, round(sum(w.w), 6) AS score
          FROM w JOIN qt USING (tok) GROUP BY qt.qid, w.doc_id),
    ranked AS (
        SELECT qid, doc_id,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
        FROM s
    ),
    dt AS (SELECT DISTINCT doc_id, tok FROM toks
           WHERE tok IN (SELECT tok FROM qt)),
    nq AS (SELECT qid, count(DISTINCT tok)::BIGINT AS k
           FROM qt GROUP BY qid),
    rel AS (
        SELECT q.qid, d2.doc_id
        FROM dt d2 JOIN qt q USING (tok) JOIN nq USING (qid)
        GROUP BY q.qid, d2.doc_id, nq.k
        HAVING count(DISTINCT d2.tok) = nq.k
    ),
    nrel AS (SELECT qid, count(*)::BIGINT AS n_rel
             FROM rel GROUP BY qid),
    j AS (
        SELECT r.qid, r.rk,
               CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END
                   AS isrel
        FROM ranked r LEFT JOIN rel ON rel.qid = r.qid
                                   AND rel.doc_id = r.doc_id
        WHERE r.rk <= 10
    ),
    m AS (
        SELECT qid, sum(isrel)::BIGINT AS hits,
               coalesce(min(rk) FILTER (WHERE isrel = 1), 0)::BIGINT
                   AS first_rank
        FROM j GROUP BY qid
    )
    SELECT m.qid, coalesce(nrel.n_rel, 0)::BIGINT AS n_rel, m.hits,
           m.first_rank,
           (CASE WHEN m.first_rank > 0 THEN 2520 // m.first_rank
                 ELSE 0 END)::BIGINT AS mrr_x2520,
           ((m.hits * 10000) // 10)::BIGINT AS precision_bp,
           (CASE WHEN coalesce(nrel.n_rel, 0) > 0
                 THEN (m.hits * 10000) // nrel.n_rel
                 ELSE 0 END)::BIGINT AS recall_bp
    FROM m LEFT JOIN nrel ON nrel.qid = m.qid
    ORDER BY m.qid
"""


def q_basket_itemsets(sf_dir: str) -> pd.DataFrame:
    """A-priori frequent brand itemsets over order baskets (market-
    basket mining, Agrawal & Srikant VLDB'94): each order is a basket
    of the part BRANDS it touches (dimension-sized vocabulary joined in
    via one broadcast), levels L1/L2/L3 with the anti-monotone prune —
    L2 from the bounded within-basket pair fan-out, C3 generated from
    the support-bounded L2 table and counted in one vectorized
    boolean-matrix pass.  min_support derives from the data
    (greatest(2, n_baskets//200)) so the SQL twin computes the identical
    threshold."""
    from ..functions.mining import frequent_itemsets
    from ..functions.relational import broadcast_join, read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_brand"]).to_pandas()
    baskets = broadcast_join(li, part, left_on="l_partkey",
                             right_on="p_partkey")
    return frequent_itemsets(baskets, basket_col="l_orderkey",
                             item_col="p_brand", rel_den=200)


ORACLE_SQL["q_basket_itemsets"] = """
    WITH bi AS (
        SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS it
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), thr AS (
        SELECT greatest(2, count(DISTINCT bk) // 200) AS s FROM bi
    ), l1 AS (
        SELECT it, count(*)::BIGINT AS sup FROM bi GROUP BY it
        HAVING count(*) >= (SELECT s FROM thr)
    ), f AS (
        SELECT bk, it FROM bi WHERE it IN (SELECT it FROM l1)
    ), l2 AS (
        SELECT f1.it AS a, f2.it AS b, count(*)::BIGINT AS sup
        FROM f f1 JOIN f f2 ON f1.bk = f2.bk AND f1.it < f2.it
        GROUP BY a, b HAVING count(*) >= (SELECT s FROM thr)
    ), c3 AS (
        SELECT x.a, x.b, y.b AS c
        FROM l2 x JOIN l2 y ON x.a = y.a AND x.b < y.b
        WHERE EXISTS (SELECT 1 FROM l2 z WHERE z.a = x.b AND z.b = y.b)
    ), l3 AS (
        SELECT c3.a, c3.b, c3.c, count(*)::BIGINT AS sup
        FROM c3
        JOIN f fa ON fa.it = c3.a
        JOIN f fb ON fb.bk = fa.bk AND fb.it = c3.b
        JOIN f fc ON fc.bk = fa.bk AND fc.it = c3.c
        GROUP BY c3.a, c3.b, c3.c
        HAVING count(*) >= (SELECT s FROM thr)
    )
    SELECT itemset, size, support FROM (
        SELECT it AS itemset, 1::BIGINT AS size, sup AS support FROM l1
        UNION ALL
        SELECT a || ',' || b, 2::BIGINT, sup FROM l2
        UNION ALL
        SELECT a || ',' || b || ',' || c, 3::BIGINT, sup FROM l3
    ) ORDER BY size, itemset
"""


def q_basket_rules(sf_dir: str) -> pd.DataFrame:
    """Association rules over the frequent brand itemsets (Agrawal &
    Srikant VLDB'94 §3): every antecedent→consequent split of each
    frequent 2/3-itemset, confidence ≥ 10%.  Metrics are integer-exact
    — conf_bp = sup(Z)*10000 // sup(A) basis points, lift_ppm =
    sup(Z)*n*1e6 // (sup(A)*sup(C)) parts-per-million — so the SQL
    twin (identical floor divisions over the same L1/L2/L3 supports)
    hash-matches.  Rule generation is driver-side arithmetic over the
    support-bounded itemset table: one distributed mining pass total."""
    from ..functions.mining import association_rules
    from ..functions.relational import broadcast_join, read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_brand"]).to_pandas()
    baskets = broadcast_join(li, part, left_on="l_partkey",
                             right_on="p_partkey")
    return association_rules(baskets, basket_col="l_orderkey",
                             item_col="p_brand", rel_den=200,
                             min_conf_bp=1000)


ORACLE_SQL["q_basket_rules"] = """
    WITH bi AS (
        SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS it
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), thr AS (
        SELECT greatest(2, count(DISTINCT bk) // 200) AS s,
               count(DISTINCT bk)::BIGINT AS nb FROM bi
    ), l1 AS (
        SELECT it, count(*)::BIGINT AS sup FROM bi GROUP BY it
        HAVING count(*) >= (SELECT s FROM thr)
    ), f AS (
        SELECT bk, it FROM bi WHERE it IN (SELECT it FROM l1)
    ), l2 AS (
        SELECT f1.it AS a, f2.it AS b, count(*)::BIGINT AS sup
        FROM f f1 JOIN f f2 ON f1.bk = f2.bk AND f1.it < f2.it
        GROUP BY a, b HAVING count(*) >= (SELECT s FROM thr)
    ), c3 AS (
        SELECT x.a, x.b, y.b AS c
        FROM l2 x JOIN l2 y ON x.a = y.a AND x.b < y.b
        WHERE EXISTS (SELECT 1 FROM l2 z WHERE z.a = x.b AND z.b = y.b)
    ), l3 AS (
        SELECT c3.a, c3.b, c3.c, count(*)::BIGINT AS sup
        FROM c3
        JOIN f fa ON fa.it = c3.a
        JOIN f fb ON fb.bk = fa.bk AND fb.it = c3.b
        JOIN f fc ON fc.bk = fa.bk AND fc.it = c3.c
        GROUP BY c3.a, c3.b, c3.c
        HAVING count(*) >= (SELECT s FROM thr)
    ), rules AS (
        -- pair rules: a→b and b→a
        SELECT p.a AS antecedent, p.b AS consequent, p.sup AS support,
               la.sup AS sa, lb.sup AS sc
        FROM l2 p JOIN l1 la ON la.it = p.a JOIN l1 lb ON lb.it = p.b
        UNION ALL
        SELECT p.b, p.a, p.sup, lb.sup, la.sup
        FROM l2 p JOIN l1 la ON la.it = p.a JOIN l1 lb ON lb.it = p.b
        UNION ALL
        -- triple rules, single antecedent: x → other two
        SELECT t.a, t.b || ',' || t.c, t.sup, la.sup, pbc.sup
        FROM l3 t JOIN l1 la ON la.it = t.a
        JOIN l2 pbc ON pbc.a = t.b AND pbc.b = t.c
        UNION ALL
        SELECT t.b, t.a || ',' || t.c, t.sup, lb.sup, pac.sup
        FROM l3 t JOIN l1 lb ON lb.it = t.b
        JOIN l2 pac ON pac.a = t.a AND pac.b = t.c
        UNION ALL
        SELECT t.c, t.a || ',' || t.b, t.sup, lc.sup, pab.sup
        FROM l3 t JOIN l1 lc ON lc.it = t.c
        JOIN l2 pab ON pab.a = t.a AND pab.b = t.b
        UNION ALL
        -- triple rules, pair antecedent: two → remaining one
        SELECT t.a || ',' || t.b, t.c, t.sup, pab.sup, lc.sup
        FROM l3 t JOIN l2 pab ON pab.a = t.a AND pab.b = t.b
        JOIN l1 lc ON lc.it = t.c
        UNION ALL
        SELECT t.a || ',' || t.c, t.b, t.sup, pac.sup, lb.sup
        FROM l3 t JOIN l2 pac ON pac.a = t.a AND pac.b = t.c
        JOIN l1 lb ON lb.it = t.b
        UNION ALL
        SELECT t.b || ',' || t.c, t.a, t.sup, pbc.sup, la.sup
        FROM l3 t JOIN l2 pbc ON pbc.a = t.b AND pbc.b = t.c
        JOIN l1 la ON la.it = t.a
    )
    SELECT antecedent, consequent, support,
           (support * 10000 // sa)::BIGINT AS conf_bp,
           (support * (SELECT nb FROM thr) * 1000000
            // (sa * sc))::BIGINT AS lift_ppm
    FROM rules
    WHERE support * 10000 // sa >= 1000
    ORDER BY antecedent, consequent
"""


def q_doc_textrank(sf_dir: str) -> pd.DataFrame:
    """TextRank keywords (Mihalcea & Tarau 2004): top-5 tokens per doc
    by the bounded integer damping-0.85 fixed point over the
    undirected adjacent-token graph — see text.textrank_keywords for
    the exactness contract."""
    from ..functions.text import textrank_keywords

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = textrank_keywords(docs).to_pandas()
    return df.sort_values(["doc_id", "rank"]).reset_index(drop=True)


# per-doc unrolled TextRank: composite (doc_id, node) recursion keys;
# self-loop adj rows (deg NULL) carry every node through each round
ORACLE_SQL["q_doc_textrank"] = """
    WITH RECURSIVE d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), t AS (
        SELECT doc_id, i AS pos, l[i] AS tok
        FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)
    ), bg AS (
        SELECT a.doc_id, a.tok AS u, b.tok AS v
        FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.tok <> b.tok
    ), e AS (
        SELECT DISTINCT doc_id, u AS src, v AS dst FROM (
            SELECT doc_id, u, v FROM bg
            UNION ALL SELECT doc_id, v AS u, u AS v FROM bg)
    ), deg AS (
        SELECT doc_id, src, count(*)::BIGINT AS deg FROM e GROUP BY 1, 2
    ), nodes AS (
        SELECT DISTINCT doc_id, src AS tok FROM e
    ), adj AS (
        SELECT e.doc_id, e.src, e.dst, dg.deg
        FROM e JOIN deg dg USING (doc_id, src)
        UNION ALL SELECT doc_id, tok, tok, NULL FROM nodes
    ), tr AS (
        SELECT 0 AS iter, doc_id, tok AS node, 1000000::BIGINT AS score
        FROM nodes
        UNION ALL
        SELECT MIN(p.iter) + 1, a.doc_id, a.dst,
               150000 + coalesce(SUM(CASE WHEN a.deg IS NOT NULL
                             THEN (p.score * 85) // (100 * a.deg)
                             END), 0)
        FROM tr p JOIN adj a ON a.doc_id = p.doc_id AND a.src = p.node
        GROUP BY a.doc_id, a.dst
        HAVING MIN(p.iter) + 1 <= 4
    ), fin AS (
        SELECT doc_id, node AS token, score FROM tr WHERE iter = 4
    ), ranked AS (
        SELECT doc_id, token, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token) AS rnk
        FROM fin
    )
    SELECT doc_id, token, score::BIGINT AS score, rnk::BIGINT AS rank
    FROM ranked WHERE rnk <= 5
    ORDER BY doc_id, rank
"""


def q_events_allen(sf_dir: str) -> pd.DataFrame:
    """Allen interval-algebra census (Allen CACM'83): per user, the
    activity interval of each event type vs every other type,
    classified into the 13 relations by the mutually-exclusive
    endpoint CASE ladder — identical ladder in SQL, so the census
    hash-matches.  See streaming.allen_relation_census."""
    from ..functions.streaming import allen_relation_census

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])
    return allen_relation_census(ev, group_col="user_id",
                                 kind_col="event_type", ts_col="ts")


ORACLE_SQL["q_events_allen"] = """
    WITH iv AS (
        SELECT user_id, event_type, min(ts) AS t0, max(ts) AS t1
        FROM events GROUP BY 1, 2
    ), pr AS (
        SELECT a.event_type AS kind_a, b.event_type AS kind_b,
            CASE
              WHEN a.t1 < b.t0 THEN 'before'
              WHEN a.t1 = b.t0 THEN 'meets'
              WHEN a.t0 < b.t0 AND b.t0 < a.t1 AND a.t1 < b.t1
                  THEN 'overlaps'
              WHEN a.t0 = b.t0 AND a.t1 < b.t1 THEN 'starts'
              WHEN b.t0 < a.t0 AND a.t1 < b.t1 THEN 'during'
              WHEN b.t0 < a.t0 AND a.t1 = b.t1 THEN 'finishes'
              WHEN a.t0 = b.t0 AND a.t1 = b.t1 THEN 'equals'
              WHEN a.t0 < b.t0 AND a.t1 = b.t1 THEN 'finished_by'
              WHEN a.t0 < b.t0 AND b.t1 < a.t1 THEN 'contains'
              WHEN a.t0 = b.t0 AND b.t1 < a.t1 THEN 'started_by'
              WHEN b.t0 < a.t0 AND a.t0 < b.t1 AND b.t1 < a.t1
                  THEN 'overlapped_by'
              WHEN b.t1 = a.t0 THEN 'met_by'
              ELSE 'after'
            END AS rel
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
    )
    SELECT kind_a, kind_b, rel, count(*)::BIGINT AS n
    FROM pr GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def q_part_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto front (Börzsönyi et al. ICDE'01): parts not
    dominated in (retailprice ↓, size ↑) — no cheaper-or-equal part
    with a larger-or-equal size that is strictly better in one
    dimension.  Two-phase plan: block-local skylines (sound candidate
    superset by dominance transitivity) then one exact driver pass —
    see relational.skyline_2d."""
    from ..functions.relational import skyline_2d

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_retailprice", "p_size"])
    out = skyline_2d(part, x="p_retailprice", y="p_size")
    return (out.sort_values("p_partkey").reset_index(drop=True)
            [["p_partkey", "p_retailprice", "p_size"]])


ORACLE_SQL["q_part_skyline"] = """
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size))
    ORDER BY p_partkey
"""


def q_doc_coverage(sf_dir: str) -> pd.DataFrame:
    """Greedy maximum-coverage data selection (k=8) over distinct
    word bigrams of the documents corpus — the submodular (1−1/e)
    greedy sweep used for coverage-based training-data subset
    selection; every pick, marginal gain, and cumulative covered
    count is integer-exact against the unrolled-CTE SQL twin."""
    from ..functions.text import coverage_select

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = coverage_select(docs, k=8)
    return df.sort_values("sel_rank").reset_index(drop=True)


def _coverage_oracle_sql(*, k: int) -> str:
    """Generated-SQL oracle for greedy max-coverage selection: one
    MATERIALIZED CTE trio per round — winner r{i} (max gain, min
    doc_id), selected-set sel{i}, covered-set c{i} — over the
    distinct (doc_id, bigram) pair table.  AS MATERIALIZED keeps
    DuckDB from inlining each round's covered set into the next
    (re-execution blows up exponentially)."""
    parts = []
    for r in range(1, k + 1):
        parts.append(f""",
        g{r} AS (SELECT doc_id, count(*)::BIGINT AS gain
                 FROM t
                 WHERE tok NOT IN (SELECT tok FROM c{r - 1})
                   AND doc_id NOT IN (SELECT doc_id FROM sel{r - 1})
                 GROUP BY doc_id),
        r{r} AS MATERIALIZED (SELECT doc_id, gain FROM g{r}
                              ORDER BY gain DESC, doc_id LIMIT 1),
        sel{r} AS MATERIALIZED (SELECT doc_id FROM sel{r - 1}
                                UNION ALL
                                SELECT doc_id FROM r{r}),
        c{r} AS MATERIALIZED (SELECT tok FROM c{r - 1}
                              UNION
                              SELECT t.tok FROM t
                              JOIN r{r} USING (doc_id))""")
    finals = "\n        UNION ALL ".join(
        f"""SELECT {r}::BIGINT AS sel_rank, doc_id, gain,
               (SELECT count(*)::BIGINT FROM c{r}) AS covered_total
            FROM r{r}"""
        for r in range(1, k + 1))
    return f"""
        WITH s AS (SELECT doc_id, string_split(text, ' ') AS a
                   FROM documents),
        raw AS (SELECT doc_id, a[i] || ' ' || a[i + 1] AS tok
                FROM s, unnest(range(1, array_length(a))) AS u(i)),
        t AS MATERIALIZED (SELECT DISTINCT doc_id, tok FROM raw),
        c0 AS (SELECT ''::VARCHAR AS tok WHERE false),
        sel0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE false)
        {''.join(parts)}
        SELECT * FROM ({finals})
        ORDER BY sel_rank
    """


ORACLE_SQL["q_doc_coverage"] = _coverage_oracle_sql(k=8)


def q_events_hll(sf_dir: str) -> pd.DataFrame:
    """Per-event-type HyperLogLog distinct-user estimates — the
    deterministic md5 twin of the HLL sketch (register from md5 hex
    chars 1–8, 32-bit rank word from chars 9–16, rho by exact integer
    bit-length), reported next to the exact distinct count so the
    estimator error is visible; z_scaled/zero_registers make the whole
    register state SQL-reproducible."""
    from ..functions.relational import distinct_on, groupby_agg
    from ..functions.sketches import hll_distinct

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    est = hll_distinct(ev, "event_type", "user_id", m=64)
    uniq = distinct_on(ev, ["event_type", "user_id"])
    exact = groupby_agg(uniq, ["event_type"],
                        [("user_id", "count", "n_exact")]).to_pandas()
    df = exact.merge(est, on="event_type")
    for c in ("n_exact", "zero_registers", "z_scaled", "hll_est"):
        df[c] = df[c].astype("int64")
    return (df[["event_type", "n_exact", "zero_registers",
                "z_scaled", "hll_est"]]
            .sort_values("event_type").reset_index(drop=True))


ORACLE_SQL["q_events_hll"] = """
    WITH v AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (SELECT event_type,
                 ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
                     % 64 AS j,
                 ('0x' || substr(md5(user_id::VARCHAR), 9, 8))::BIGINT
                     AS w
          FROM v),
    -- rho = 33 - bit_length(w) by exact integer comparison
    r AS (SELECT event_type, j,
                 max(CASE WHEN w = 0 THEN 33
                          ELSE 33 - (CASE WHEN w >= 2147483648 THEN 32
                                          ELSE length(
                                              ltrim(bin(w::INT64), '0')
                                          ) END)
                     END)::BIGINT AS mj
          FROM h GROUP BY event_type, j),
    z AS (SELECT event_type,
                 sum(1::BIGINT << (33 - mj))::BIGINT
                     + (64 - count(*)) * (1::BIGINT << 33) AS z_scaled,
                 (64 - count(*))::BIGINT AS zero_registers
          FROM r GROUP BY event_type),
    ex AS (SELECT event_type, count(*)::BIGINT AS n_exact
           FROM v GROUP BY event_type)
    SELECT ex.event_type, ex.n_exact, z.zero_registers, z.z_scaled,
           ((709::BIGINT * 64 * 64 * (1::BIGINT << 33))
            // (1000 * z.z_scaled))::BIGINT AS hll_est
    FROM ex JOIN z USING (event_type)
    ORDER BY ex.event_type
"""


def q_doc_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch reading-ease readability census (text.readability):
    exact integer milli-point scores + 70/50/30 band labels per
    document — the syllable-based curation signal the token-ratio
    quality features (q_doc_quality, q_doc_gopher) are blind to."""
    from ..functions.text import readability

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = ds.map_batches(readability, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


ORACLE_SQL["q_doc_readability"] = """
    WITH f AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT
                   AS words,
               len(regexp_extract_all(text, '[.!?]+'))::BIGINT
                   AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                   AS syllables
        FROM documents),
    g AS (
        SELECT *,
               (206835 - (1015 * words) // greatest(sentences, 1)
                       - (84600 * syllables) // greatest(words, 1)
               )::BIGINT AS fre_milli
        FROM f)
    SELECT doc_id, words, sentences, syllables, fre_milli,
           CASE WHEN fre_milli >= 70000 THEN 'easy'
                WHEN fre_milli >= 50000 THEN 'standard'
                WHEN fre_milli >= 30000 THEN 'difficult'
                ELSE 'very_difficult' END AS band
    FROM g ORDER BY doc_id
"""


def q_events_paths(sf_dir: str) -> pd.DataFrame:
    """User-journey census (clickstream path mining, the funnel's
    free-form sibling): each user's first 5 events by (ts, event_id)
    become the journey string 'a>b>c', then a census of how many
    users walked each journey.  One user-bucketed exchange co-locates
    each user's stream (the q_events_funnel shape); the per-bucket
    journey census is a combiner partial, so only journey-vocabulary-
    sized frames reach the driver — users never do."""
    import numpy as np

    from ..functions.relational import default_n_buckets

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nb = default_n_buckets()

    def journeys(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        g = g.groupby("user_id", as_index=False, sort=False).head(5)
        j = (g.groupby("user_id", sort=False)["event_type"]
             .agg(">".join).rename("journey").reset_index())
        return (j.groupby("journey", as_index=False)
                .agg(n_users=("user_id", "count")))

    part = ds.map_batches(
        lambda b: b.assign(__bk=(b.user_id % nb).astype("int32")),
        batch_format="pandas",
    ).groupby("__bk").map_groups(
        journeys, batch_format="pandas").to_pandas()
    out = part.groupby("journey", as_index=False)["n_users"].sum()
    out["depth"] = (out["journey"].str.count(">") + 1).astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return (out[["journey", "depth", "n_users"]]
            .sort_values("journey").reset_index(drop=True))


ORACLE_SQL["q_events_paths"] = """
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
    j AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS journey
        FROM r WHERE rn <= 5 GROUP BY user_id)
    SELECT journey,
           len(string_split(journey, '>'))::BIGINT AS depth,
           count(*)::BIGINT AS n_users
    FROM j GROUP BY journey ORDER BY journey
"""


def _pca_oracle_sql(*, iters: int, scale: int = 10 ** 6,
                    quant_shift: int = 10) -> str:
    """Generated unrolled-iteration oracle for q_emb_pca: Gram matrix
    via a vec_id self-join + group-sum, then per-round matrix-vector
    join + max-norm.  DuckDB's ``//`` TRUNCATES on negatives (numpy
    floors) — every signed division is spelled as the explicit
    truncating form CASE WHEN x < 0 THEN -((-x) // d) ELSE x // d END
    to match similarity.pca_top_component's tdiv.  AS MATERIALIZED
    everywhere (unrolled chains re-execute per reference otherwise)."""
    parts = [f"""
        WITH x AS MATERIALIZED (
            SELECT vec_id, unnest(range(len(embedding))) AS i,
                   unnest(embedding)::DOUBLE AS e
            FROM embeddings
        ), q AS MATERIALIZED (
            SELECT vec_id, i, floor(e * {1 << quant_shift})::BIGINT AS qv
            FROM x
        ), c AS MATERIALIZED (
            SELECT a.i AS a, b.i AS b, sum(a.qv * b.qv)::BIGINT AS v
            FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2
        ), dv AS MATERIALIZED (
            SELECT greatest(max(abs(v)) // {1 << 32}, 1) AS d FROM c
        ), cs AS MATERIALIZED (
            SELECT a, b,
                   CASE WHEN v < 0
                        THEN -((-v) // (SELECT d FROM dv))
                        ELSE v // (SELECT d FROM dv) END AS cv
            FROM c
        ), v0 AS MATERIALIZED (
            SELECT DISTINCT i AS j, {scale}::BIGINT AS v FROM x)"""]
    for t in range(1, iters + 1):
        parts.append(f"""
        , r{t} AS MATERIALIZED (
            SELECT cs.a AS j, sum(cs.cv * p.v) AS raw
            FROM cs JOIN v{t - 1} p ON p.j = cs.b GROUP BY cs.a)
        , m{t} AS MATERIALIZED (
            SELECT greatest(max(abs(raw)) // {scale}, 1) AS m FROM r{t})
        , v{t} AS MATERIALIZED (
            SELECT j, (CASE WHEN raw < 0
                            THEN -((-raw) // (SELECT m FROM m{t}))
                            ELSE raw // (SELECT m FROM m{t})
                       END)::BIGINT AS v
            FROM r{t})""")
    parts.append(f"""
        , top AS (SELECT v FROM v{iters}
                  ORDER BY abs(v) DESC, j LIMIT 1)
        SELECT j::BIGINT AS j,
               (CASE WHEN (SELECT v FROM top) < 0
                     THEN -v ELSE v END)::BIGINT AS loading
        FROM v{iters} ORDER BY j""")
    return "".join(parts)


ORACLE_SQL["q_emb_pca"] = _pca_oracle_sql(iters=10)


# Gini via the histogram MAD identity: window cumulants over the
# ordered distinct per-user counts, all integer
ORACLE_SQL["q_events_gini"] = """
    WITH pu AS (
        SELECT user_id, count(*)::BIGINT AS n
        FROM events GROUP BY user_id
    ), h AS (
        SELECT n AS v, count(*)::BIGINT AS c FROM pu GROUP BY n
    ), w AS (
        SELECT v, c,
               coalesce(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)::BIGINT AS cum_c,
               coalesce(sum(c * v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)::BIGINT AS cum_s
        FROM h
    ), agg AS (
        SELECT sum(v * c * cum_c)::BIGINT - sum(c * cum_s)::BIGINT
                   AS num,
               sum(c)::BIGINT AS n_users,
               sum(c * v)::BIGINT AS n_events
        FROM w
    )
    SELECT n_users, n_events,
           CASE WHEN n_users > 0 AND n_events > 0
                THEN (num * 1000000) // (n_users * n_events)
                ELSE 0 END::BIGINT AS gini_ppm
    FROM agg
"""


# Fellegi-Sunter: u from value frequencies Σc(c−1)/(N(N−1)), m=0.95;
# per-field floor(1e6·ln) weights summed as int64; blocked self-join
ORACLE_SQL["q_customer_fs"] = """
    WITH base AS (
        SELECT c_custkey, c_nationkey, c_mktsegment AS seg,
               floor(round(c_acctbal * 100) / 100000.0)::BIGINT
                   AS bal_bucket,
               round(c_acctbal * 100) >= 0 AS bal_pos
        FROM customer
    ), n AS (SELECT count(*)::BIGINT AS n FROM base),
    u_seg AS (
        SELECT sum(c * (c - 1))::DOUBLE
               / ((SELECT n FROM n) * ((SELECT n FROM n) - 1)) AS u
        FROM (SELECT count(*)::BIGINT AS c FROM base GROUP BY seg)
    ), u_bb AS (
        SELECT sum(c * (c - 1))::DOUBLE
               / ((SELECT n FROM n) * ((SELECT n FROM n) - 1)) AS u
        FROM (SELECT count(*)::BIGINT AS c FROM base
              GROUP BY bal_bucket)
    ), u_bp AS (
        SELECT sum(c * (c - 1))::DOUBLE
               / ((SELECT n FROM n) * ((SELECT n FROM n) - 1)) AS u
        FROM (SELECT count(*)::BIGINT AS c FROM base GROUP BY bal_pos)
    ), w AS (
        SELECT
            floor(1000000 * ln(0.95 / least(greatest(
                (SELECT u FROM u_seg), 1e-9), 1 - 1e-9)))::BIGINT
                AS seg_a,
            floor(1000000 * ln((1 - 0.95) / (1 - least(greatest(
                (SELECT u FROM u_seg), 1e-9), 1 - 1e-9))))::BIGINT
                AS seg_d,
            floor(1000000 * ln(0.95 / least(greatest(
                (SELECT u FROM u_bb), 1e-9), 1 - 1e-9)))::BIGINT
                AS bb_a,
            floor(1000000 * ln((1 - 0.95) / (1 - least(greatest(
                (SELECT u FROM u_bb), 1e-9), 1 - 1e-9))))::BIGINT
                AS bb_d,
            floor(1000000 * ln(0.95 / least(greatest(
                (SELECT u FROM u_bp), 1e-9), 1 - 1e-9)))::BIGINT
                AS bp_a,
            floor(1000000 * ln((1 - 0.95) / (1 - least(greatest(
                (SELECT u FROM u_bp), 1e-9), 1 - 1e-9))))::BIGINT
                AS bp_d
    ), scored AS (
        SELECT x.c_custkey AS a, y.c_custkey AS b,
               (CASE WHEN x.seg = y.seg
                     THEN (SELECT seg_a FROM w)
                     ELSE (SELECT seg_d FROM w) END
                + CASE WHEN x.bal_bucket = y.bal_bucket
                       THEN (SELECT bb_a FROM w)
                       ELSE (SELECT bb_d FROM w) END
                + CASE WHEN x.bal_pos = y.bal_pos
                       THEN (SELECT bp_a FROM w)
                       ELSE (SELECT bp_d FROM w) END)::BIGINT
                   AS score_micro
        FROM base x JOIN base y
          ON y.c_nationkey = x.c_nationkey
         AND x.c_custkey < y.c_custkey
    )
    SELECT a, b, score_micro FROM scored
    WHERE score_micro > 0 ORDER BY a, b
"""


# attribution: interval join + row_number rank (ts desc, id desc) +
# largest-remainder apportionment — Σ attributed == cents exactly
ORACLE_SQL["q_events_attribution"] = """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts,
               round(value * 100)::BIGINT AS cents
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT event_id AS touch_id, user_id, ts
        FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
        SELECT p.purchase_id, p.cents, t.touch_id,
               row_number() OVER (PARTITION BY p.purchase_id
                                  ORDER BY t.ts DESC, t.touch_id DESC)
                   - 1 AS rnk,
               count(*) OVER (PARTITION BY p.purchase_id) AS k
        FROM p JOIN t
          ON t.user_id = p.user_id
         AND t.ts >= p.ts - INTERVAL 3 DAY
         AND t.ts < p.ts
    )
    SELECT purchase_id, touch_id,
           (cents // k + CASE WHEN rnk < cents % k
                              THEN 1 ELSE 0 END)::BIGINT
               AS attributed_cents
    FROM j ORDER BY purchase_id, touch_id
"""


# gapped a-then-b containment: min/max of the (ts, event_id) lex key
ORACLE_SQL["q_events_seqpairs"] = """
    WITH k AS (
        SELECT user_id, event_type AS t,
               epoch_ms(ts) * 4194304 + event_id AS k
        FROM events
    ), mm AS (
        SELECT user_id, t, min(k) AS kmin, max(k) AS kmax
        FROM k GROUP BY user_id, t
    )
    SELECT x.t AS a, y.t AS b, count(*)::BIGINT AS n_users
    FROM mm x JOIN mm y
      ON y.user_id = x.user_id AND x.kmin < y.kmax
    GROUP BY x.t, y.t ORDER BY a, b
"""


# Theil-Sen: lower-median pairwise slope, ordered by double value
# with (num, den) tie-break — both engines pick the same fraction
ORACLE_SQL["q_events_theilsen"] = """
    WITH d AS (
        SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ), d2 AS (
        SELECT datediff('day', (SELECT min(day) FROM d), day)::BIGINT
                   AS x, n
        FROM d
    ), p AS (
        SELECT (b.n - a.n)::BIGINT AS num, (b.x - a.x)::BIGINT AS den
        FROM d2 a JOIN d2 b ON b.x > a.x
    ), c AS (SELECT count(*)::BIGINT AS cnt FROM p)
    SELECT num, den,
           (SELECT count(*) FROM d)::BIGINT AS n_days,
           (SELECT cnt FROM c) AS n_pairs
    FROM p
    ORDER BY num::DOUBLE / den, num, den
    LIMIT 1 OFFSET (((SELECT cnt FROM c) - 1) // 2)
"""


# SN candidates + exact Levenshtein verify (DuckDB builtin vs the
# vectorized capped Wagner-Fischer DP)
ORACLE_SQL["q_supplier_lev"] = """
    WITH r AS (
        SELECT s_suppkey, s_name,
               row_number() OVER (ORDER BY s_name, s_suppkey) AS rn
        FROM supplier
    )
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           levenshtein(a.s_name, b.s_name)::BIGINT AS lev
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    ORDER BY id_a, id_b
"""


# gaps-and-islands: day − row_number is constant within a
# consecutive run; longest island per user, tie → earliest start
ORACLE_SQL["q_events_streaks"] = """
    WITH d AS (
        SELECT DISTINCT user_id,
               (epoch_us(ts) // 86400000000)::BIGINT AS day
        FROM events
    ), r AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id
                                        ORDER BY day) AS island
        FROM d
    ), runs AS (
        SELECT user_id, island, count(*)::BIGINT AS len,
               min(day)::BIGINT AS start_day
        FROM r GROUP BY user_id, island
    ), best AS (
        SELECT user_id, len, start_day,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY len DESC, start_day) AS rn
        FROM runs
    )
    SELECT user_id, len AS longest_streak,
           start_day AS streak_start_day
    FROM best WHERE rn = 1 ORDER BY user_id
"""


def _golden_oracle_sql(rounds: int = 8) -> str:
    """Generated oracle for q_customer_golden: the FS match query
    rides as a subquery (DuckDB allows WITH inside subqueries), match
    clusters close by the SAME bounded min-label rule as
    graphalgo.label_components (self-loop adjacency, 8 rounds), then
    modal/min/max survivorship per cluster."""
    lbl = ""
    for t in range(1, rounds + 1):
        lbl += f"""
    , l{t} AS MATERIALIZED (
        SELECT p.node, least(p.lbl, coalesce(n.m, p.lbl)) AS lbl
        FROM l{t - 1} p LEFT JOIN (
            SELECT u.s AS node, min(q.lbl) AS m
            FROM und u JOIN l{t - 1} q ON q.node = u.t
            GROUP BY u.s) n USING (node))"""
    return f"""
    WITH mp AS MATERIALIZED (
        SELECT a, b FROM ({{fs}})
    ), und AS MATERIALIZED (
        SELECT a AS s, b AS t FROM mp
        UNION ALL SELECT b, a FROM mp
    ), l0 AS MATERIALIZED (
        SELECT DISTINCT s AS node, s AS lbl FROM und)
    {lbl}
    , base AS (
        SELECT c_custkey, c_mktsegment AS seg,
               round(c_acctbal * 100)::BIGINT AS cents
        FROM customer
    ), cl AS (
        SELECT b.c_custkey,
               coalesce(l.lbl, b.c_custkey)::BIGINT AS cluster,
               b.seg, b.cents
        FROM base b LEFT JOIN l{rounds} l ON l.node = b.c_custkey
    ), votes AS (
        SELECT cluster, seg, count(*)::BIGINT AS n FROM cl
        GROUP BY cluster, seg
    ), modal AS (
        SELECT cluster, seg AS golden_segment FROM (
            SELECT cluster, seg, row_number() OVER (
                PARTITION BY cluster ORDER BY n DESC, seg) AS rn
            FROM votes) WHERE rn = 1
    ), agg AS (
        SELECT cluster, min(c_custkey)::BIGINT AS golden_custkey,
               max(cents)::BIGINT AS golden_cents,
               count(*)::BIGINT AS n_members
        FROM cl GROUP BY cluster
    )
    SELECT a.cluster, a.golden_custkey, m.golden_segment,
           a.golden_cents, a.n_members
    FROM agg a JOIN modal m USING (cluster)
    ORDER BY cluster
"""


ORACLE_SQL["q_customer_golden"] = _golden_oracle_sql().format(
    fs=ORACLE_SQL["q_customer_fs"])


# integer EWMA: recursive CTE joining rn -> rn+1 per user
ORACLE_SQL["q_events_ewma"] = """
    WITH RECURSIVE x AS (
        SELECT event_id, user_id,
               round(value * 100)::BIGINT AS cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), rec AS (
        SELECT event_id, user_id, rn, cents AS y
        FROM x WHERE rn = 1
        UNION ALL
        SELECT n.event_id, n.user_id, n.rn,
               (n.cents + 3 * r.y) // 4
        FROM rec r JOIN x n
          ON n.user_id = r.user_id AND n.rn = r.rn + 1
    )
    SELECT event_id, user_id, y::BIGINT AS ewma_cents
    FROM rec ORDER BY event_id
"""


# RBH: exact int dots of 2^10-quantized vectors; score = dot /
# sqrt(norm) — correctly-rounded IEEE ops, identical doubles both
# engines; argmax ties -> smallest id; mutual join
ORACLE_SQL["q_emb_rbh"] = """
    WITH x AS (
        SELECT vec_id, unnest(range(len(embedding))) AS i,
               floor(unnest(embedding)::DOUBLE * 1024)::BIGINT AS qv
        FROM embeddings
    ), n AS (
        SELECT vec_id, sum(qv * qv)::BIGINT AS nrm
        FROM x GROUP BY vec_id
    ), d AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               sum(a.qv * b.qv)::BIGINT AS dot
        FROM x a JOIN x b ON b.i = a.i
        WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        GROUP BY 1, 2
    ), abest AS (
        SELECT a, b, dot FROM (
            SELECT d.a, d.b, d.dot,
                   row_number() OVER (PARTITION BY d.a
                       ORDER BY d.dot::DOUBLE / sqrt(nb.nrm::DOUBLE)
                                DESC, d.b) AS rn
            FROM d JOIN n nb ON nb.vec_id = d.b)
        WHERE rn = 1
    ), bbest AS (
        SELECT a, b FROM (
            SELECT d.a, d.b,
                   row_number() OVER (PARTITION BY d.b
                       ORDER BY d.dot::DOUBLE / sqrt(na.nrm::DOUBLE)
                                DESC, d.a) AS rn
            FROM d JOIN n na ON na.vec_id = d.a)
        WHERE rn = 1
    )
    SELECT ab.a AS a, ab.b AS b, ab.dot AS qdot
    FROM abest ab JOIN bbest bb ON bb.a = ab.a AND bb.b = ab.b
    ORDER BY ab.a
"""


def _kcenter_oracle_sql(k: int = 6) -> str:
    """Generated unrolled oracle for q_emb_kcenter: per round one
    dot-product join against the single previous pick, dist² =
    |c|²+|s|²−2c·s exact BIGINT, min-fold into the running
    min-dist-to-set, argmax pick (d2 DESC, vec_id)."""
    parts = ["""
    WITH x AS MATERIALIZED (
        SELECT vec_id, unnest(range(len(embedding))) AS i,
               floor(unnest(embedding)::DOUBLE * 1024)::BIGINT AS qv
        FROM embeddings
    ), nrm AS MATERIALIZED (
        SELECT vec_id, sum(qv * qv)::BIGINT AS n FROM x
        GROUP BY vec_id
    ), s1 AS MATERIALIZED (
        SELECT min(vec_id)::BIGINT AS v FROM embeddings)"""]
    prev_m = None
    for t in range(2, k + 1):
        sprev = f"s{t - 1}" if t > 2 else "s1"
        parts.append(f"""
    , dot{t} AS MATERIALIZED (
        SELECT a.vec_id, sum(a.qv * b.qv)::BIGINT AS dot
        FROM x a JOIN x b ON b.i = a.i
        WHERE b.vec_id = (SELECT p FROM pick{t - 1})
        GROUP BY a.vec_id
    )""" if t > 2 else f"""
    , dot{t} AS MATERIALIZED (
        SELECT a.vec_id, sum(a.qv * b.qv)::BIGINT AS dot
        FROM x a JOIN x b ON b.i = a.i
        WHERE b.vec_id = (SELECT v FROM s1)
        GROUP BY a.vec_id
    )""")
        dist = (f"""cn.n + (SELECT nn.n FROM nrm nn
                     WHERE nn.vec_id = (SELECT p FROM pick{t - 1}))
                 - 2 * d.dot""" if t > 2 else
                """cn.n + (SELECT nn.n FROM nrm nn
                     WHERE nn.vec_id = (SELECT v FROM s1))
                 - 2 * d.dot""")
        fold = (f"least(m.d2, ({dist}))" if prev_m else f"({dist})")
        join_m = (f"JOIN m{t - 1} m ON m.vec_id = d.vec_id" if prev_m else "")
        parts.append(f"""
    , m{t} AS MATERIALIZED (
        SELECT d.vec_id AS vec_id, ({fold})::BIGINT AS d2
        FROM dot{t} d JOIN nrm cn ON cn.vec_id = d.vec_id {join_m}
    )
    , pick{t} AS MATERIALIZED (
        SELECT vec_id AS p, d2 FROM m{t}
        WHERE vec_id NOT IN (SELECT v FROM s1){"".join(
            f" AND vec_id <> (SELECT p FROM pick{r})"
            for r in range(2, t))}
        ORDER BY d2 DESC, vec_id LIMIT 1
    )""")
        prev_m = t
    sel = ["""
    SELECT 1::BIGINT AS round, (SELECT v FROM s1) AS vec_id,
           0::BIGINT AS d2"""]
    for t in range(2, k + 1):
        sel.append(f"""
    SELECT {t}::BIGINT, p, d2 FROM pick{t}""")
    parts.append("\n    UNION ALL".join(sel))
    parts.append("\n    ORDER BY round")
    return "".join(parts)


ORACLE_SQL["q_emb_kcenter"] = _kcenter_oracle_sql(6)


# the curation funnel: gopher gate -> md5 keep-first -> 8-gram
# decontamination, per-stage exact (docs, tokens) tallies
ORACLE_SQL["q_doc_pipeline"] = """
    WITH d0 AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
    ), f AS (
        SELECT doc_id, text,
               len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
               greatest(len(regexp_extract_all(text, '\\S+')), 1) AS nw,
               len(regexp_extract_all(text, '\\S'))::DOUBLE AS n_chars,
               len(regexp_extract_all(text, '[#…]'))::DOUBLE AS n_sym,
               len(regexp_extract_all(text, '(?m)^[-*•]'))::DOUBLE
                   AS n_bullets,
               greatest(len(string_split(text, chr(10))), 1) AS n_lines,
               len(list_distinct(string_split(text, chr(10))))::DOUBLE
                   AS n_uniq
        FROM d0
    ), d1 AS (
        SELECT doc_id, text, n_words FROM f
        WHERE n_words BETWEEN 50 AND 100000
          AND n_chars / nw BETWEEN 3.0 AND 10.0
          AND n_sym / nw <= 0.1
          AND n_bullets / n_lines <= 0.9
          AND (1.0 - n_uniq / n_lines) <= 0.3
    ), w AS (
        SELECT md5(text) AS key, min(doc_id) AS win FROM d1 GROUP BY 1
    ), d2 AS (
        SELECT d.doc_id, d.text, d.n_words
        FROM d1 d JOIN w ON w.key = md5(d.text) AND w.win = d.doc_id
    ), bg AS (
        SELECT DISTINCT
               array_to_string(list_slice(words, i, i + 7), ' ') AS gram
        FROM (SELECT string_split(text, ' ') AS words FROM documents
              WHERE doc_id % 50 = 0) x,
             LATERAL unnest(range(1, len(words) - 6)) AS t(i)
        WHERE len(words) >= 8
    ), dg AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(words, i, i + 7), ' ') AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM d2) x,
             LATERAL unnest(range(1, len(words) - 6)) AS t(i)
        WHERE len(words) >= 8
    ), hits AS (
        SELECT DISTINCT doc_id FROM dg JOIN bg USING (gram)
    ), d3 AS (
        SELECT * FROM d2
        WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    )
    SELECT 1::BIGINT AS stage, 'input' AS stage_name,
           count(*)::BIGINT AS docs,
           coalesce(sum(n_words), 0)::BIGINT AS tokens FROM f
    UNION ALL SELECT 2, 'gopher_quality', count(*),
           coalesce(sum(n_words), 0) FROM d1
    UNION ALL SELECT 3, 'exact_dedup', count(*),
           coalesce(sum(n_words), 0) FROM d2
    UNION ALL SELECT 4, 'decontaminated', count(*),
           coalesce(sum(n_words), 0) FROM d3
    ORDER BY stage
"""


# KMV theta-sketch join-size estimate: bottom-64 md5 sketches per
# side, union sketch kth-min theta, rho = common below theta
ORACLE_SQL["q_join_kmv"] = """
    WITH sa AS (
        SELECT DISTINCT ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))
                   ::BIGINT AS h
        FROM orders ORDER BY h LIMIT 64
    ), sb AS (
        SELECT DISTINCT ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))
                   ::BIGINT AS h
        FROM customer ORDER BY h LIMIT 64
    ), un AS (
        SELECT DISTINCT h FROM (SELECT h FROM sa
                                UNION ALL SELECT h FROM sb)
        ORDER BY h LIMIT 64
    ), th AS (
        SELECT CASE WHEN (SELECT count(*) FROM un) >= 64
                    THEN (SELECT max(h) FROM un)
                    ELSE 4294967296 END AS theta,
               (SELECT count(*) FROM un)::BIGINT AS ku
    ), rho AS (
        SELECT count(*)::BIGINT AS rho
        FROM sa JOIN sb USING (h)
        WHERE h < (SELECT theta FROM th)
    )
    SELECT 64::BIGINT AS k,
           (SELECT rho FROM rho) AS rho,
           (SELECT theta FROM th)::BIGINT AS theta,
           CASE WHEN (SELECT theta FROM th) > 0
                     AND (SELECT ku FROM th) > 1
                THEN floor((SELECT rho FROM rho) / 64.0
                     * (((SELECT ku FROM th) - 1)
                        / ((SELECT theta FROM th) / 4294967296.0))
                     * 1000)::BIGINT
                ELSE 0 END AS est_inter_milli,
           (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT
               AS exact_orders_keys,
           (SELECT count(DISTINCT c_custkey) FROM customer)::BIGINT
               AS exact_customer_keys
"""


# PSI: first-half exact decile order statistics as edges, Laplace
# shares, floored nano ln terms
ORACLE_SQL["q_events_psi"] = """
    WITH c AS (
        SELECT epoch_us(ts) AS t, round(value * 100)::BIGINT AS cents
        FROM events
    ), m AS (
        SELECT min(t) + (max(t) - min(t)) // 2 AS mid FROM c
    ), f AS (
        SELECT cents FROM c WHERE t < (SELECT mid FROM m)
    ), n1 AS (SELECT count(*)::BIGINT AS n FROM f),
    r AS (
        SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM f
    ), e AS (
        SELECT k, (SELECT cents FROM r
                   WHERE rn = ((SELECT n FROM n1) - 1) * k // 10 + 1)
                   AS edge
        FROM unnest(range(1, 10)) AS t(k)
    ), bk AS (
        SELECT CASE WHEN t < (SELECT mid FROM m) THEN 1 ELSE 2 END
                   AS half,
               (SELECT count(*) FROM e WHERE c.cents > e.edge)::BIGINT
                   AS bucket
        FROM c
    ), cnt AS (
        SELECT half, bucket, count(*)::BIGINT AS n FROM bk
        GROUP BY half, bucket
    ), grid AS (SELECT unnest(range(10))::BIGINT AS bucket),
    tot AS (
        SELECT coalesce(sum(CASE WHEN half = 1 THEN n END), 0)::BIGINT
                   AS t1,
               coalesce(sum(CASE WHEN half = 2 THEN n END), 0)::BIGINT
                   AS t2
        FROM cnt
    )
    SELECT g.bucket,
           coalesce(f1.n, 0)::BIGINT AS n_first,
           coalesce(f2.n, 0)::BIGINT AS n_second,
           floor(((coalesce(f1.n, 0) + 1.0)
                      / ((SELECT t1 FROM tot) + 10.0)
                  - (coalesce(f2.n, 0) + 1.0)
                      / ((SELECT t2 FROM tot) + 10.0))
                 * ln(((coalesce(f1.n, 0) + 1.0)
                           / ((SELECT t1 FROM tot) + 10.0))
                      / ((coalesce(f2.n, 0) + 1.0)
                           / ((SELECT t2 FROM tot) + 10.0)))
                 * 1e9)::BIGINT AS term_nano
    FROM grid g
    LEFT JOIN cnt f1 ON f1.bucket = g.bucket AND f1.half = 1
    LEFT JOIN cnt f2 ON f2.bucket = g.bucket AND f2.half = 2
    ORDER BY g.bucket
"""


# permutation test: md5-parity arms, 64 md5(u|b) resamples, HUGEINT
# cross-multiplied extremeness comparison
ORACLE_SQL["q_events_abtest"] = """
    WITH pu AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'purchase'
                        THEN round(value * 100)::BIGINT
                        ELSE 0 END)::BIGINT AS s
        FROM events GROUP BY user_id
    ), ex AS (
        SELECT b, CASE WHEN b = 0
                  THEN ('0x' || substr(md5(user_id::VARCHAR), 1, 8))
                       ::BIGINT % 2
                  ELSE ('0x' || substr(md5(user_id::VARCHAR || '|'
                                           || b::VARCHAR), 1, 8))
                       ::BIGINT % 2 END AS arm,
               s
        FROM pu CROSS JOIN (SELECT unnest(range(0, 65)) AS b)
    ), sums AS (
        SELECT b, arm, sum(s)::BIGINT AS sum_c, count(*)::BIGINT AS n
        FROM ex GROUP BY b, arm
    ), wide AS (
        SELECT b,
               coalesce(sum(CASE WHEN arm = 0 THEN sum_c END), 0)
                   ::BIGINT AS sa,
               coalesce(sum(CASE WHEN arm = 0 THEN n END), 0)
                   ::BIGINT AS na,
               coalesce(sum(CASE WHEN arm = 1 THEN sum_c END), 0)
                   ::BIGINT AS sb,
               coalesce(sum(CASE WHEN arm = 1 THEN n END), 0)
                   ::BIGINT AS nb
        FROM sums GROUP BY b
    ), obs AS (
        SELECT abs(sa::HUGEINT * nb - sb::HUGEINT * na) AS num,
               CASE WHEN na > 0 AND nb > 0
                    THEN na::HUGEINT * nb ELSE 1::HUGEINT END AS den,
               sa, na, sb, nb
        FROM wide WHERE b = 0
    ), ext AS (
        SELECT count(*)::BIGINT AS n_extreme
        FROM wide w
        WHERE w.b > 0
          AND abs(w.sa::HUGEINT * w.nb - w.sb::HUGEINT * w.na)
              * (SELECT den FROM obs)
              >= (SELECT num FROM obs)
                 * (CASE WHEN w.na > 0 AND w.nb > 0
                         THEN w.na::HUGEINT * w.nb
                         ELSE 1::HUGEINT END)
    )
    SELECT (SELECT na FROM obs) AS n_users_a,
           (SELECT nb FROM obs) AS n_users_b,
           (SELECT sa FROM obs) AS sum_a,
           (SELECT sb FROM obs) AS sum_b,
           64::BIGINT AS b_resamples,
           (SELECT n_extreme FROM ext) AS n_extreme,
           ((SELECT n_extreme FROM ext) * 1000 // 64)::BIGINT
               AS p_milli
"""


# split conformal: per-type floor means on the calibration half,
# exact ceil((n+1)*0.9) order-statistic radius, held-out coverage
ORACLE_SQL["q_events_conformal"] = """
    WITH c AS (
        SELECT epoch_us(ts) AS t, event_type AS typ,
               round(value * 100)::BIGINT AS cents
        FROM events
    ), m AS (SELECT min(t) + (max(t) - min(t)) // 2 AS mid FROM c),
    cal AS (SELECT * FROM c WHERE t < (SELECT mid FROM m)),
    mu AS (
        SELECT typ, sum(cents)::BIGINT // count(*)::BIGINT AS mu
        FROM cal GROUP BY typ
    ), res AS (
        SELECT abs(cal.cents - mu.mu)::BIGINT AS r
        FROM cal JOIN mu USING (typ)
    ), nc AS (SELECT count(*)::BIGINT AS n FROM res),
    kk AS (
        SELECT least(((SELECT n FROM nc) + 1) * 9 // 10
                     + CASE WHEN ((SELECT n FROM nc) + 1) * 9 % 10
                                 > 0 THEN 1 ELSE 0 END,
                     (SELECT n FROM nc)) AS k
    ), q AS (
        SELECT r AS q_hat FROM (
            SELECT r, row_number() OVER (ORDER BY r) AS rn FROM res)
        WHERE rn = (SELECT k FROM kk)
    ), tst AS (
        SELECT c.cents, mu.mu FROM c JOIN mu USING (typ)
        WHERE c.t >= (SELECT mid FROM m)
    ), cov AS (
        SELECT count(*)::BIGINT AS n_test,
               sum(CASE WHEN abs(cents - mu) <= (SELECT q_hat FROM q)
                        THEN 1 ELSE 0 END)::BIGINT AS n_covered
        FROM tst
    )
    SELECT (SELECT n FROM nc) AS n_cal,
           (SELECT q_hat FROM q)::BIGINT AS q_hat,
           n_test, n_covered,
           CASE WHEN n_test > 0
                THEN n_covered * 1000 // n_test ELSE 0 END::BIGINT
               AS coverage_milli
    FROM cov
"""


# Mann-Whitney with doubled midranks: per distinct value the group's
# min+max global rank; U2 = 2R1 - n1(n1+1), all integer
ORACLE_SQL["q_events_mannwhitney"] = """
    WITH pu AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'purchase'
                        THEN round(value * 100)::BIGINT
                        ELSE 0 END)::BIGINT AS s
        FROM events GROUP BY user_id
    ), a AS (
        SELECT s, ('0x' || substr(md5(user_id::VARCHAR), 1, 8))
                   ::BIGINT % 2 AS arm
        FROM pu
    ), g AS (
        SELECT s, sum(arm)::BIGINT AS n_b, count(*)::BIGINT AS n_all
        FROM a GROUP BY s
    ), w AS (
        SELECT s, n_b, n_all,
               sum(n_all) OVER (ORDER BY s
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS ends
        FROM g
    ), mid AS (
        SELECT (n_all - n_b) AS n_a_g,
               (ends - n_all + 1 + ends)::BIGINT AS dbl_mid,
               n_b, n_all
        FROM w
    ), agg AS (
        SELECT sum(n_a_g)::BIGINT AS n1, sum(n_b)::BIGINT AS n2,
               sum(n_a_g * dbl_mid)::BIGINT AS two_r1
        FROM mid
    )
    SELECT n1 AS n_a, n2 AS n_b,
           (two_r1 - n1 * (n1 + 1))::BIGINT AS u2,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN (two_r1 - n1 * (n1 + 1)) * 1000
                     // (2 * n1 * n2)
                ELSE 0 END::BIGINT AS auc_milli
    FROM agg
"""


# dow = (epoch_day + 4) % 7 — same arithmetic both engines (no
# dayofweek() dialect dependence); chi2 exactly scaled by 7N
ORACLE_SQL["q_events_dow_chi2"] = """
    WITH d AS (
        SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
        FROM events
    ), c AS (
        SELECT dow, count(*)::BIGINT AS n FROM d GROUP BY dow
    ), grid AS (SELECT unnest(range(7))::BIGINT AS dow),
    f AS (
        SELECT g.dow, coalesce(c.n, 0)::BIGINT AS n
        FROM grid g LEFT JOIN c USING (dow)
    ), t AS (
        SELECT sum(n)::BIGINT AS n_total,
               sum((7 * n - (SELECT sum(n) FROM f))
                   * (7 * n - (SELECT sum(n) FROM f)))::BIGINT
                   AS chi2_scaled
        FROM f
    )
    SELECT f.dow, f.n, (SELECT n_total FROM t) AS n_total,
           (SELECT chi2_scaled FROM t) AS chi2_scaled
    FROM f ORDER BY f.dow
"""


# ---- round-5 eighth-session additions -------------------------------------


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — the Benford expectation
# as LITERAL ppm constants (identical table in the SQL twin, so no
# engine ever evaluates a transcendental)
_BENFORD_PPM = np.array([301029, 176091, 124938, 96910, 79181,
                         66946, 57991, 51152, 45757], dtype=np.int64)


def q_events_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-significant-digit conformance census (the classic
    fraud / data-quality screen): leading digit of the positive value
    cents vs the Benford expectation, kept EXACT by hard-coding the
    expectation as literal ppm constants and reporting the signed
    per-digit deviation dev_ppm = 1e6·o_d − N·p_ppm[d] (an integer —
    divide by 1e6·N once for the classic proportion gap) plus the
    total absolute deviation.  Digit extraction is vectorized
    log10-with-fixups (float log10 can land one power off at exact
    powers of ten; both misestimates are corrected integrally, so the
    result is exact on any libm).

    Shape: one map_batches digit pass + one pre-combined groupby;
    constant-size (9-row) driver finish."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["value"])

    def digits(b: pd.DataFrame) -> pd.DataFrame:
        c = np.round(b["value"].to_numpy("float64") * 100).astype("int64")
        c = c[c > 0]
        p = np.floor(np.log10(c.astype("float64"))).astype("int64")
        pw = np.power(10, np.maximum(p, 0)).astype("int64")
        fd = c // pw
        over = fd >= 10          # log10 rounded low at a power boundary
        fd[over] //= 10
        under = fd == 0          # log10 rounded high
        fd[under] = c[under] // (pw[under] // 10)
        return pd.DataFrame({"digit": fd})

    cnt = groupby_agg(
        ev.map_batches(digits, batch_format="pandas"),
        ["digit"], [("digit", "count", "n")]).to_pandas()
    cnt = cnt.set_index("digit").reindex(range(1, 10), fill_value=0)
    o = cnt["n"].to_numpy("int64")
    n_total = int(o.sum())
    dev = 1_000_000 * o - n_total * _BENFORD_PPM
    total_abs = int(np.abs(dev).sum())
    return pd.DataFrame({
        "digit": pd.Series(range(1, 10), dtype="int64"),
        "n": o,
        "n_total": pd.Series([n_total] * 9, dtype="int64"),
        "dev_ppm": dev,
        "total_abs_dev_ppm": pd.Series([total_abs] * 9, dtype="int64"),
    })


ORACLE_SQL["q_events_benford"] = """
    WITH c AS (
        SELECT round(value * 100)::BIGINT AS cents
        FROM events WHERE round(value * 100)::BIGINT > 0
    ), d AS (
        SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit FROM c
    ), cnt AS (
        SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit
    ), p AS (
        SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
                              (4, 96910), (5, 79181), (6, 66946),
                              (7, 57991), (8, 51152), (9, 45757))
                 AS t(digit, ppm)
    ), f AS (
        SELECT p.digit::BIGINT AS digit, coalesce(cnt.n, 0)::BIGINT AS n,
               p.ppm::BIGINT AS ppm
        FROM p LEFT JOIN cnt ON cnt.digit = p.digit
    ), t AS (
        SELECT sum(n)::BIGINT AS n_total FROM f
    ), dev AS (
        SELECT f.digit, f.n, t.n_total,
               (1000000 * f.n - t.n_total * f.ppm)::BIGINT AS dev_ppm
        FROM f, t
    )
    SELECT digit, n, n_total, dev_ppm,
           (SELECT sum(abs(dev_ppm))::BIGINT FROM dev)
               AS total_abs_dev_ppm
    FROM dev ORDER BY digit
"""


def q_events_spearman(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between per-user activity (event
    count) and per-user purchase spend (total cents) — the
    nonparametric engagement-monetization monitor — kept EXACT with
    DOUBLED MIDRANKS on both margins (q_events_mannwhitney's tie
    discipline): a tied group's doubled midrank min(rn)+max(rn) is an
    integer, so every moment (Sx, Sy, Sxx, Syy, Sxy) is an int64 sum
    and cov = n·Sxy − Sx·Sy / var = n·Sxx − Sx² are exact ints.
    rho² reports in ppm as cov² // max(varx·vary // 1e6, 1) — the
    denominator is integer-truncated BEFORE the divide (biases UP by
    the truncation slack — ≤ 1 ppm once varx·vary ≥ ~1e12, larger on
    tiny moments, identical on both engines) so the numerator stays
    inside 128-bit; sign(cov) reports separately (no sqrt
    anywhere).

    Shape: per-user totals one pre-combined exchange; each margin's
    rank table is value-distinct-sized (one more exchange each); the
    dmid maps broadcast into a linear partial-moment pass; output is
    one row."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    per_user = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "user_id": b["user_id"].to_numpy("int64"),
                "cents": np.where(
                    b["event_type"].to_numpy() == "purchase",
                    np.round(b["value"].to_numpy("float64") * 100)
                    .astype("int64"), 0),
                "one": np.ones(len(b), dtype="int64")}),
            batch_format="pandas"),
        ["user_id"], [("cents", "sum", "s"),
                      ("one", "sum", "c")]).materialize()

    def dmid_map(col: str) -> dict[int, int]:
        g = groupby_agg(per_user, [col], [(col, "count", "n")]) \
            .to_pandas().sort_values(col).reset_index(drop=True)
        n_all = g["n"].to_numpy("int64")
        ends = np.cumsum(n_all)
        dbl = ends - n_all + 1 + ends  # min(rank) + max(rank)
        return dict(zip(g[col].to_numpy("int64").tolist(),
                        dbl.tolist()))

    ms, mc = dmid_map("s"), dmid_map("c")

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        x = b["s"].map(ms).to_numpy("int64")
        y = b["c"].map(mc).to_numpy("int64")
        return pd.DataFrame({
            "n": [np.int64(len(b))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            "sxy": [(x * y).sum()]})

    agg = per_user.map_batches(moments, batch_format="pandas") \
        .to_pandas().sum()
    n = int(agg["n"])
    sx, sy = int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    den = max((varx * vary) // 1_000_000, 1)
    rho2_ppm = (cov * cov) // den
    sign = 0 if cov == 0 else (1 if cov > 0 else -1)
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "sign": pd.Series([sign], dtype="int64"),
        "rho2_ppm": pd.Series([rho2_ppm], dtype="int64"),
    })


ORACLE_SQL["q_events_spearman"] = """
    WITH pu AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'purchase'
                        THEN round(value * 100)::BIGINT
                        ELSE 0 END)::BIGINT AS s,
               count(*)::BIGINT AS c
        FROM events GROUP BY user_id
    ), gs AS (
        SELECT s, count(*)::BIGINT AS n FROM pu GROUP BY s
    ), ws AS (
        SELECT s, (2 * sum(n) OVER (ORDER BY s ROWS UNBOUNDED
                                    PRECEDING) - n + 1)::BIGINT
                   AS dmid
        FROM gs
    ), gc AS (
        SELECT c, count(*)::BIGINT AS n FROM pu GROUP BY c
    ), wc AS (
        SELECT c, (2 * sum(n) OVER (ORDER BY c ROWS UNBOUNDED
                                    PRECEDING) - n + 1)::BIGINT
                   AS dmid
        FROM gc
    ), r AS (
        SELECT ws.dmid AS x, wc.dmid AS y
        FROM pu JOIN ws USING (s) JOIN wc USING (c)
    ), m AS (
        SELECT count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x * x)::HUGEINT AS sxx,
               sum(y * y)::HUGEINT AS syy,
               sum(x * y)::HUGEINT AS sxy
        FROM r
    ), f AS (
        SELECT n,
               (n * sxy - sx * sy) AS cov,
               (n * sxx - sx * sx) AS varx,
               (n * syy - sy * sy) AS vary
        FROM m
    )
    SELECT n::BIGINT AS n,
           (CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1
                 ELSE 0 END)::BIGINT AS sign,
           ((cov * cov) // greatest((varx * vary) // 1000000, 1))
               ::BIGINT AS rho2_ppm
    FROM f
"""


def q_events_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation census (the classic CRM customer-value
    stratification): per purchasing user recency (days since last
    purchase, vs the corpus's latest purchase day), frequency
    (#purchases) and monetary (total cents), each scored 1-3 against
    EXACT tercile order statistics — the element at sorted ascending
    position ceil(n/3)-1 / ceil(2n/3)-1, deterministic on any engine
    (ntile() ties are engine-defined; explicit thresholds are not).
    Scores: frequency/monetary rise with value (v > edge), recency
    falls (r <= edge is better).  Segment code = 100r + 10f + m.

    Shape: one pre-combined per-user exchange; the 6 edges come from
    a guarded driver pull of the user-dimension-sized table (the PSI
    order-statistic pattern); census is one more pre-combined
    groupby."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "value"])

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["event_type"].to_numpy() == "purchase"
        b = b[keep]
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "day": (b["ts"].astype("datetime64[us]").astype("int64")
                    // 86_400_000_000).astype("int64"),
            "cents": np.round(b["value"].to_numpy("float64") * 100)
            .astype("int64"),
            "one": np.ones(keep.sum(), dtype="int64")})

    per_user = groupby_agg(
        ev.map_batches(purchases, batch_format="pandas"),
        ["user_id"], [("day", "max", "last_day"),
                      ("one", "sum", "f"),
                      ("cents", "sum", "m")]).to_pandas()
    if len(per_user) > 20_000_000:
        raise RuntimeError("q_events_rfm: per-user table past the "
                           "order-statistic driver guard")
    ref_day = int(per_user["last_day"].max())
    rec = (ref_day - per_user["last_day"].to_numpy("int64"))
    f = per_user["f"].to_numpy("int64")
    m = per_user["m"].to_numpy("int64")
    n = len(per_user)

    def edges(v: np.ndarray) -> tuple[int, int]:
        s = np.sort(v)
        return int(s[(n + 2) // 3 - 1]), int(s[(2 * n + 2) // 3 - 1])

    e1r, e2r = edges(rec)
    e1f, e2f = edges(f)
    e1m, e2m = edges(m)
    r_score = 1 + (rec <= e1r).astype("int64") + (rec <= e2r)
    f_score = 1 + (f > e1f).astype("int64") + (f > e2f)
    m_score = 1 + (m > e1m).astype("int64") + (m > e2m)
    seg = 100 * r_score + 10 * f_score + m_score
    out = pd.DataFrame({"segment": seg, "m": m}) \
        .groupby("segment").agg(n_users=("m", "count"),
                                sum_cents=("m", "sum")).reset_index()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("segment").reset_index(drop=True)


ORACLE_SQL["q_events_rfm"] = """
    WITH p AS (
        SELECT user_id,
               max(epoch_us(ts) // 86400000000)::BIGINT AS last_day,
               count(*)::BIGINT AS f,
               sum(round(value * 100)::BIGINT)::BIGINT AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), ref AS (
        SELECT max(last_day)::BIGINT AS rd, count(*)::BIGINT AS n
        FROM p
    ), r AS (
        SELECT (SELECT rd FROM ref) - last_day AS rec, f, m FROM p
    ), k AS (
        SELECT ((SELECT n FROM ref) + 2) // 3 AS k1,
               (2 * (SELECT n FROM ref) + 2) // 3 AS k2
    ), rr AS (SELECT rec AS v, row_number() OVER (ORDER BY rec) AS rn
              FROM r),
    rf AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn
           FROM r),
    rm AS (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn
           FROM r),
    e AS (
        SELECT (SELECT v FROM rr WHERE rn = (SELECT k1 FROM k)) AS e1r,
               (SELECT v FROM rr WHERE rn = (SELECT k2 FROM k)) AS e2r,
               (SELECT v FROM rf WHERE rn = (SELECT k1 FROM k)) AS e1f,
               (SELECT v FROM rf WHERE rn = (SELECT k2 FROM k)) AS e2f,
               (SELECT v FROM rm WHERE rn = (SELECT k1 FROM k)) AS e1m,
               (SELECT v FROM rm WHERE rn = (SELECT k2 FROM k)) AS e2m
    ), scored AS (
        SELECT (100 * (1 + (CASE WHEN rec <= (SELECT e1r FROM e)
                                 THEN 1 ELSE 0 END)
                         + (CASE WHEN rec <= (SELECT e2r FROM e)
                                 THEN 1 ELSE 0 END))
                + 10 * (1 + (CASE WHEN f > (SELECT e1f FROM e)
                                  THEN 1 ELSE 0 END)
                          + (CASE WHEN f > (SELECT e2f FROM e)
                                  THEN 1 ELSE 0 END))
                + (1 + (CASE WHEN m > (SELECT e1m FROM e)
                             THEN 1 ELSE 0 END)
                     + (CASE WHEN m > (SELECT e2m FROM e)
                             THEN 1 ELSE 0 END)))::BIGINT AS segment,
               m
        FROM r
    )
    SELECT segment, count(*)::BIGINT AS n_users,
           sum(m)::BIGINT AS sum_cents
    FROM scored GROUP BY segment ORDER BY segment
"""


def q_doc_zipf(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law fit of the corpus token rank-frequency curve — the
    log-log slope every corpus-health audit quotes (natural text ≈ −1;
    boilerplate/spam bends it) — estimated ROBUSTLY by Theil-Sen over
    the top-256 tokens: points are (L(rank), L(freq)) with
    L(v) = floor(1e9·ln v) (the PSI floored-nano-ln discipline — one
    IEEE ln per integer input, identical on both engines), the median
    slope an EXACT RATIONAL selected by (value, num, den) order (the
    q_events_theilsen selection rule), so the output is integer-exact.

    Shape: corpus token counts one pre-combined exchange; the top-256
    cut is deterministic (freq DESC, token ASC); slopes are the tiny
    O(T²/2) driver table."""
    from ..functions.relational import groupby_agg

    docs = read_table(sf_dir, "documents", columns=["text"])

    def explode_counts(b: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: one row per (token, batch), never one
        # per occurrence (the q_doc_top_tokens shuffle contract)
        toks = b["text"].str.lower().str.findall("[a-z0-9_]+").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"tok": vc.index, "n": vc.values})

    tf = groupby_agg(
        docs.map_batches(explode_counts, batch_format="pandas"),
        ["tok"], [("n", "sum", "f")]).to_pandas()
    top = tf.sort_values(["f", "tok"], ascending=[False, True],
                         kind="mergesort").head(256).reset_index(drop=True)
    t_n = len(top)
    r = np.arange(1, t_n + 1, dtype="int64")
    f = top["f"].to_numpy("int64")
    lx = np.floor(np.log(r.astype("float64")) * 1e9).astype("int64")
    ly = np.floor(np.log(f.astype("float64")) * 1e9).astype("int64")
    i, j = np.triu_indices(t_n, 1)
    num = ly[j] - ly[i]
    den = lx[j] - lx[i]
    val = num / den
    order = np.lexsort((den, num, val))
    k = (len(num) - 1) // 2
    sel = order[k]
    return pd.DataFrame({
        "num": pd.Series([int(num[sel])], dtype="int64"),
        "den": pd.Series([int(den[sel])], dtype="int64"),
        "n_tokens": pd.Series([t_n], dtype="int64"),
        "n_pairs": pd.Series([len(num)], dtype="int64"),
    })


ORACLE_SQL["q_doc_zipf"] = """
    WITH tf AS (
        SELECT tok, count(*)::BIGINT AS f
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9_]+')) AS tok
              FROM documents)
        GROUP BY tok
    ), top AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
        FROM tf QUALIFY r <= 256
    ), l AS (
        SELECT floor(ln(r) * 1000000000)::BIGINT AS lx,
               floor(ln(f) * 1000000000)::BIGINT AS ly,
               r
        FROM top
    ), pairs AS (
        SELECT (b.ly - a.ly)::BIGINT AS num,
               (b.lx - a.lx)::BIGINT AS den
        FROM l a JOIN l b ON b.r > a.r
    ), stats AS (
        SELECT count(*)::BIGINT AS n_pairs FROM pairs
    ), sel AS (
        SELECT num, den
        FROM pairs
        ORDER BY num / den, num, den
        LIMIT 1 OFFSET (SELECT (n_pairs - 1) // 2 FROM stats)
    )
    SELECT (SELECT num FROM sel) AS num,
           (SELECT den FROM sel) AS den,
           (SELECT count(*) FROM top)::BIGINT AS n_tokens,
           (SELECT n_pairs FROM stats) AS n_pairs
"""


def q_events_holt(sf_dir: str) -> pd.DataFrame:
    """Holt's linear-trend double exponential smoothing of the daily
    event volume (α=0.3, β=0.1 — the level+trend forecaster plain
    EWMA can't express), kept EXACT in milli-units with TRUNCATING
    integer division (DuckDB's ``//`` truncates toward zero — -7//2 is
    -3 there and -4 in Python; the q_emb_pca divergence lesson):

        l_t = (3·1000·y_t + 7·(l_{t-1} + b_{t-1})) /trunc/ 10
        b_t = ((l_t − l_{t-1}) + 9·b_{t-1}) /trunc/ 10

    initialized l_1 = 1000·y_1, b_1 = 1000·(y_2 − y_1).  The SQL twin
    is a literal recursive CTE over the same day-indexed series.

    Shape: daily counts one pre-combined exchange; the recurrence is
    inherently serial over the day-sized series (driver loop, ~100
    steps)."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    daily = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "day": (b["ts"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000)}),
            batch_format="pandas"),
        ["day"], [("day", "count", "n")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy("int64")
    y = daily["n"].to_numpy("int64")

    def tdiv(a: int, b: int) -> int:
        # truncate toward zero (DuckDB //) for positive b
        return -((-a) // b) if a < 0 else a // b

    n = len(y)
    lvl = [0] * n
    trd = [0] * n
    lvl[0] = 1000 * int(y[0])
    trd[0] = 1000 * (int(y[1]) - int(y[0])) if n > 1 else 0
    for t in range(1, n):
        lp, bp = lvl[t - 1], trd[t - 1]
        lt = tdiv(3 * 1000 * int(y[t]) + 7 * (lp + bp), 10)
        bt = tdiv((lt - lp) + 9 * bp, 10)
        lvl[t], trd[t] = lt, bt
    return pd.DataFrame({
        "day": days,
        "n": y,
        "level_milli": pd.Series(lvl, dtype="int64"),
        "trend_milli": pd.Series(trd, dtype="int64"),
    })


ORACLE_SQL["q_events_holt"] = """
    WITH RECURSIVE daily AS (
        SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ), d AS (
        SELECT day, n, row_number() OVER (ORDER BY day) AS t
        FROM daily
    ), h(t, day, n, l, b) AS (
        SELECT 1::BIGINT, day, n, (1000 * n)::BIGINT,
               (1000 * (coalesce((SELECT n FROM d WHERE t = 2), n)
                        - n))::BIGINT
        FROM d WHERE t = 1
        UNION ALL
        SELECT d.t, d.day, d.n,
               ((3 * 1000 * d.n + 7 * (h.l + h.b)) // 10)::BIGINT,
               (((((3 * 1000 * d.n + 7 * (h.l + h.b)) // 10) - h.l)
                 + 9 * h.b) // 10)::BIGINT
        FROM h JOIN d ON d.t = h.t + 1
    )
    SELECT day, n, l AS level_milli, b AS trend_milli
    FROM h ORDER BY day
"""


def q_events_autocorr(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation census of the daily event volume at lags 1-7
    (the seasonality screen a forecasting pipeline runs before model
    choice), kept EXACT: per lag the Pearson moments over the aligned
    (y_t, y_{t+lag}) pairs are int64 sums, cov/var are exact ints, and
    r² reports in ppm as cov² // max(varx·vary // 1e6, 1) with
    sign(cov) separate (the q_events_spearman truncation discipline —
    biases up by the truncation slack, identical on both engines; no
    sqrt, no float).

    Shape: daily counts one pre-combined exchange; the lag table is
    the tiny O(7·days) driver frame; SQL twin is a literal self-join
    on the day index."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    daily = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "day": (b["ts"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000)}),
            batch_format="pandas"),
        ["day"], [("day", "count", "n")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    y = daily["n"].to_numpy("int64")
    rows = []
    for lag in range(1, 8):
        if lag >= len(y):
            rows.append((lag, 0, 0, 0))
            continue
        a = y[:-lag].astype(object)
        b = y[lag:].astype(object)
        n = len(a)
        sx, sy = int(sum(a)), int(sum(b))
        sxx = int(sum(x * x for x in a))
        syy = int(sum(x * x for x in b))
        sxy = int(sum(p * q for p, q in zip(a, b)))
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        den = max((varx * vary) // 1_000_000, 1)
        r2 = (cov * cov) // den
        sign = 0 if cov == 0 else (1 if cov > 0 else -1)
        rows.append((lag, n, sign, r2))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "sign",
                                       "r2_ppm"]).astype("int64")


ORACLE_SQL["q_events_autocorr"] = """
    WITH daily AS (
        SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ), d AS (
        SELECT n, row_number() OVER (ORDER BY day) AS t FROM daily
    ), lags AS (SELECT unnest(range(1, 8))::BIGINT AS lag),
    pairs AS (
        SELECT l.lag, a.n AS x, b.n AS y
        FROM lags l
        JOIN d a ON TRUE
        JOIN d b ON b.t = a.t + l.lag
    ), m AS (
        SELECT lag, count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x * x)::HUGEINT AS sxx, sum(y * y)::HUGEINT AS syy,
               sum(x * y)::HUGEINT AS sxy
        FROM pairs GROUP BY lag
    ), f AS (
        SELECT lag, n,
               (n * sxy - sx * sy) AS cov,
               (n * sxx - sx * sx) AS varx,
               (n * syy - sy * sy) AS vary
        FROM m
    )
    SELECT l.lag,
           coalesce(f.n, 0)::BIGINT AS n_pairs,
           coalesce(CASE WHEN f.cov > 0 THEN 1
                         WHEN f.cov < 0 THEN -1 ELSE 0 END,
                    0)::BIGINT AS sign,
           coalesce((f.cov * f.cov)
                    // greatest((f.varx * f.vary) // 1000000, 1),
                    0)::BIGINT AS r2_ppm
    FROM lags l LEFT JOIN f USING (lag)
    ORDER BY l.lag
"""


def q_doc_heaps(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary growth table: streaming the corpus in
    doc_id order, after each document the cumulative token count and
    the distinct-vocabulary size (V(n) ≈ K·n^β — the sublinear growth
    curve a healthy natural corpus follows; a flat or linear curve
    flags template spam / vocabulary collapse).  Exact integers: a
    token's first appearance is min(doc_id), so vocab at d = running
    sum of first-seen counts — no estimation anywhere.

    Shape: two pre-combined exchanges (per-doc token counts; per-token
    min doc_id → per-doc first-seen census); running sums over the
    doc-dimension-sized table on the driver."""
    from ..functions.relational import groupby_agg

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b.set_index("doc_id")["text"].str.lower() \
            .str.findall("[a-z0-9_]+").explode().dropna()
        g = s.reset_index()
        g.columns = ["doc_id", "tok"]
        # per-batch combiner: (doc_id, tok) partial counts + mins
        vc = g.groupby(["doc_id", "tok"]).size().reset_index(name="n")
        return vc

    per = docs.map_batches(explode, batch_format="pandas") \
        .materialize()
    cnt = groupby_agg(per, ["doc_id"], [("n", "sum", "n")]).to_pandas()
    fs = groupby_agg(per, ["tok"], [("doc_id", "min", "d")])
    fd = groupby_agg(fs, ["d"], [("d", "count", "new_toks")]).to_pandas()

    base = read_table(sf_dir, "documents", columns=["doc_id"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    base = base.merge(cnt, on="doc_id", how="left") \
        .merge(fd.rename(columns={"d": "doc_id"}), on="doc_id",
               how="left").fillna(0)
    base["cum_tokens"] = base["n"].astype("int64").cumsum()
    base["vocab"] = base["new_toks"].astype("int64").cumsum()
    out = base[["doc_id", "cum_tokens", "vocab"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


ORACLE_SQL["q_doc_heaps"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text),
                                         '[a-z0-9_]+')) AS tok
        FROM documents
    ), cnt AS (
        SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY doc_id
    ), fs AS (
        SELECT tok, min(doc_id) AS d FROM tok GROUP BY tok
    ), fd AS (
        SELECT d AS doc_id, count(*)::BIGINT AS new_toks
        FROM fs GROUP BY d
    )
    SELECT b.doc_id,
           CAST(sum(coalesce(c.n, 0)) OVER (ORDER BY b.doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(f.new_toks, 0)) OVER (ORDER BY b.doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
    FROM documents b
    LEFT JOIN cnt c USING (doc_id)
    LEFT JOIN fd f USING (doc_id)
    ORDER BY b.doc_id
"""


def q_emb_outliers(sf_dir: str) -> pd.DataFrame:
    """Distance-based outlier census (Ramaswamy et al. SIGMOD'00 —
    the classic kNN-distance outlier rule curation uses to surface
    mislabeled/junk embeddings): a point's score is its squared
    distance to its 5th nearest neighbor (2^10-quantized exact int64,
    the q_emb_kcenter discipline); report the top 20 by (score DESC,
    vec_id) — the k-th order statistic of a multiset needs no
    tie-break to be value-deterministic.

    Shape: the quantized corpus matrix broadcasts ONCE (ray.put);
    each batch computes its rows' distances to all via one matmul and
    keeps only the 5th-smallest per row — O(n²) flops but O(batch)
    memory and one linear pass; the row guard REFUSES past 200k
    vectors (GuardExceeded — at that scale the honest path is the
    q_knn_ivf/q_knn_lsh ANN family, not a dense all-pairs)."""
    import ray

    from ..functions.relational import GuardExceeded, bcast_get, topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = ds.to_pandas()
    if len(full) > 200_000:
        raise GuardExceeded("q_emb_outliers: > 200k vectors; use the "
                            "ANN family for the scale path")
    q = np.floor(np.stack(full["embedding"].to_numpy())
                 .astype(np.float64) * (1 << 10)).astype(np.int64)
    ids = full["vec_id"].to_numpy("int64")
    order = np.argsort(ids, kind="mergesort")
    q, ids = q[order], ids[order]
    ref = ray.put((ids, q, (q * q).sum(1)))

    def knn5(b: pd.DataFrame) -> pd.DataFrame:
        cids, cq, cnn = bcast_get(ref)
        bq = np.floor(np.stack(b["embedding"].to_numpy())
                      .astype(np.float64) * (1 << 10)).astype(np.int64)
        bids = b["vec_id"].to_numpy("int64")
        d2 = (bq * bq).sum(1)[:, None] + cnn[None, :] - 2 * (bq @ cq.T)
        # mask self (same vec_id) with +inf-like sentinel
        self_mask = bids[:, None] == cids[None, :]
        d2[self_mask] = np.iinfo(np.int64).max
        kth = np.partition(d2, 4, axis=1)[:, 4]
        return pd.DataFrame({"vec_id": bids, "knn_d2": kth})

    scored = ds.map_batches(knn5, batch_format="pandas")
    out = topk(scored, ["knn_d2", "vec_id"], 20,
               descending=[True, False]).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


ORACLE_SQL["q_emb_outliers"] = """
    WITH q AS (
        SELECT vec_id, idx,
               floor(qv * 1024)::BIGINT AS qq
        FROM (SELECT vec_id,
                     unnest(embedding)::DOUBLE AS qv,
                     generate_subscripts(embedding, 1) AS idx
              FROM embeddings)
    ), d AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               sum((a.qq - b.qq) * (a.qq - b.qq))::BIGINT AS d2
        FROM q a JOIN q b ON a.idx = b.idx AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), r AS (
        SELECT i AS vec_id, d2,
               row_number() OVER (PARTITION BY i
                                  ORDER BY d2, j) AS rn
        FROM d
    )
    SELECT vec_id, d2 AS knn_d2
    FROM r WHERE rn = 5
    ORDER BY knn_d2 DESC, vec_id
    LIMIT 20
"""


def q_events_stationary(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain (the
    long-run behavior profile of q_events_transitions' bigram model):
    12 rounds of integer power iteration π' = πP over the transition
    counts, each term tdiv(π_i·C(i,j), R_i) with R_i the row sum —
    non-negative, so floor == truncation and every engine agrees;
    start π = 1e6 per type, report the raw (un-renormalized) masses
    plus each type's row sum.  The SQL twin unrolls the 12 rounds
    over the tiny type×type matrix.

    Shape: the transition census is q_events_transitions' bucketed
    shift pass (one exchange); the iteration is a 5×5 driver loop."""
    tr = q_events_transitions(sf_dir)
    ev = read_table(sf_dir, "events", columns=["event_type"])
    from ..functions.relational import groupby_agg

    types = groupby_agg(ev, ["event_type"],
                        [("event_type", "count", "cnt")]).to_pandas()
    types = sorted(types["event_type"].tolist())
    t_idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    c = np.zeros((k, k), dtype="int64")
    for _, row in tr.iterrows():
        c[t_idx[row["from_type"]], t_idx[row["to_type"]]] = row["n"]
    rs = c.sum(1)
    p = np.full(k, 1_000_000, dtype=object)
    for _ in range(12):
        nxt = [0] * k
        for i in range(k):
            if rs[i] == 0:
                continue
            for j in range(k):
                nxt[j] += (int(p[i]) * int(c[i, j])) // int(rs[i])
        p = np.array(nxt, dtype=object)
    return pd.DataFrame({
        "event_type": pd.Series(types, dtype=object),
        "pi_ppm": pd.Series([int(x) for x in p], dtype="int64"),
        "row_sum": pd.Series(rs, dtype="int64"),
    })


def _stationary_oracle_rounds(rounds: int = 12) -> str:
    parts = []
    for r in range(1, rounds + 1):
        parts.append(f"""
        , p{r} AS MATERIALIZED (
            SELECT ty.event_type,
                   coalesce((SELECT sum((p.p * t.n) // r.rs)
                             FROM p{r - 1} p
                             JOIN t ON t.from_type = p.event_type
                             JOIN r ON r.from_type = t.from_type
                             WHERE t.to_type = ty.event_type),
                            0)::BIGINT AS p
            FROM types ty)""")
    return "".join(parts)


ORACLE_SQL["q_events_stationary"] = f"""
    WITH nxt AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   AS next_type
        FROM events
    ), t AS MATERIALIZED (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*)::BIGINT AS n
        FROM nxt WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), r AS MATERIALIZED (
        SELECT from_type, sum(n)::BIGINT AS rs FROM t GROUP BY 1
    ), types AS MATERIALIZED (
        SELECT DISTINCT event_type FROM events
    ), p0 AS MATERIALIZED (
        SELECT event_type, 1000000::BIGINT AS p FROM types
    ){_stationary_oracle_rounds(12)}
    SELECT ty.event_type,
           p12.p AS pi_ppm,
           coalesce(r.rs, 0)::BIGINT AS row_sum
    FROM types ty
    JOIN p12 ON p12.event_type = ty.event_type
    LEFT JOIN r ON r.from_type = ty.event_type
    ORDER BY ty.event_type
"""


def q_emb_facility(sf_dir: str) -> pd.DataFrame:
    """Greedy facility-location data selection (the submodular
    REPRESENTATIVENESS objective — Σ_v max(0, max_{s∈S} sim(v,s)) —
    behind CRAIG-style coreset curation; the complement of
    q_emb_kcenter's min-max DIVERSITY pick): 6 greedy rounds, sim =
    exact int64 dot of the 2^10-quantized vectors, coverage floored
    at 0, pick = argmax total coverage (ties → smallest vec_id), so
    every comparison is integer and the unrolled SQL twin is
    bit-identical.  The picked total after round r IS the next
    round's baseline (Σ_v max(best_v, dot(v,c)) at the argmax), so
    gains need no separate coverage pass.

    Shape: under the row guard one pull + 6 numpy argmax rounds over
    the Gram matrix; past it the quantized corpus matrix broadcasts
    ONCE (ray.put, n×d ints — dimension-bounded) and each round
    streams the corpus in one linear pass: per batch a B×n matmul
    clipped by the batch rows' current coverage emits an n-sized
    candidate-total partial (associative sum — the kcenter partial
    discipline); no n×n table ever materializes."""
    import ray

    from ..functions.relational import bcast_get

    k = 6
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(df: pd.DataFrame):
        qm = np.floor(np.stack(df["embedding"].to_numpy())
                      .astype(np.float64) * (1 << 10)).astype(np.int64)
        return df["vec_id"].to_numpy("int64"), qm

    n_rows = ds.count()
    if n_rows <= 8_000:
        full = ds.to_pandas()
        ids, qm = quant(full)
        order = np.argsort(ids, kind="mergesort")
        ids, qm = ids[order], qm[order]
        gram = np.maximum(qm @ qm.T, 0)  # coverage floors at 0
        best = np.zeros(len(ids), dtype="int64")
        picked: list[tuple[int, int, int]] = []
        best_total = 0
        for r in range(1, k + 1):
            tot = np.maximum(gram, best[:, None]).sum(0)
            picked_pos = [int(np.searchsorted(ids, v))
                          for _, v, _ in picked]
            tot[picked_pos] = np.iinfo(np.int64).min
            c = int(tot.argmax())  # ids sorted asc → first max = min id
            picked.append((r, int(ids[c]), int(tot[c]) - best_total))
            best_total = int(tot[c])
            best = np.maximum(best, gram[:, c])
        return pd.DataFrame(picked, columns=["rank", "vec_id", "gain"]) \
            .astype("int64")

    # streaming path: corpus matrix broadcast once, k linear passes
    full = ds.to_pandas()
    ids, qm = quant(full)
    order = np.argsort(ids, kind="mergesort")
    ids, qm = ids[order], qm[order]
    mref = ray.put((ids, qm))
    sel_pos: list[int] = []
    picked = []
    best_total = 0
    for r in range(1, k + 1):
        pref = ray.put(np.array(sel_pos, dtype="int64"))

        def gains(b: pd.DataFrame, _m=mref, _p=pref) -> pd.DataFrame:
            cids, cq = bcast_get(_m)
            spos = bcast_get(_p)
            _, bq = quant(b)
            dots = np.maximum(bq @ cq.T, 0)  # B×n, floored coverage
            best_b = (dots[:, spos].max(1) if len(spos)
                      else np.zeros(len(bq), dtype="int64"))
            part = np.maximum(dots, best_b[:, None]).sum(0)
            return pd.DataFrame({"pos": np.arange(len(cids),
                                                  dtype="int64"),
                                 "tot": part})

        parts = ds.map_batches(gains, batch_format="pandas").to_pandas()
        tot = parts.groupby("pos")["tot"].sum().to_numpy("int64")
        tot[sel_pos] = np.iinfo(np.int64).min
        c = int(tot.argmax())
        picked.append((r, int(ids[c]), int(tot[c]) - best_total))
        best_total = int(tot[c])
        sel_pos.append(c)
    return pd.DataFrame(picked, columns=["rank", "vec_id", "gain"]) \
        .astype("int64")


def _facility_oracle_sql(k: int = 6) -> str:
    """Generated unrolled oracle for q_emb_facility: the full
    quantized dot matrix (floored at 0) materializes once; per round
    the candidate totals fold the running per-point coverage with
    greatest(), the pick is (tot DESC, vec_id), and the pick's total
    becomes the next baseline."""
    parts = ["""
    WITH x AS MATERIALIZED (
        SELECT vec_id, unnest(range(len(embedding))) AS i,
               floor(unnest(embedding)::DOUBLE * 1024)::BIGINT AS qv
        FROM embeddings
    ), dotm AS MATERIALIZED (
        SELECT a.vec_id AS v, b.vec_id AS c,
               greatest(sum(a.qv * b.qv), 0)::BIGINT AS dot
        FROM x a JOIN x b ON b.i = a.i
        GROUP BY a.vec_id, b.vec_id
    ), m0 AS MATERIALIZED (
        SELECT DISTINCT vec_id AS v, 0::BIGINT AS b FROM embeddings)"""]
    for t in range(1, k + 1):
        not_in = ("" if t == 1 else
                  "WHERE d.c NOT IN (" + " UNION ALL ".join(
                      f"SELECT p FROM pick{s}" for s in range(1, t))
                  + ")")
        parts.append(f"""
    , g{t} AS MATERIALIZED (
        SELECT d.c, sum(greatest(m.b, d.dot))::BIGINT AS tot
        FROM dotm d JOIN m{t - 1} m ON m.v = d.v
        {not_in}
        GROUP BY d.c
    ), pick{t} AS MATERIALIZED (
        SELECT c AS p, tot FROM g{t} ORDER BY tot DESC, c LIMIT 1
    ), m{t} AS MATERIALIZED (
        SELECT m.v, greatest(m.b, d.dot)::BIGINT AS b
        FROM m{t - 1} m JOIN dotm d
          ON d.v = m.v AND d.c = (SELECT p FROM pick{t}))""")
    sel = " UNION ALL ".join(
        f"""SELECT {t}::BIGINT AS rank, (SELECT p FROM pick{t}) AS vec_id,
             ((SELECT tot FROM pick{t})
              - {f'(SELECT tot FROM pick{t - 1})' if t > 1 else '0'})
                 ::BIGINT AS gain"""
        for t in range(1, k + 1))
    parts.append(f"""
    SELECT * FROM ({sel}) ORDER BY rank""")
    return "".join(parts)


ORACLE_SQL["q_emb_facility"] = _facility_oracle_sql(6)


def q_doc_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-document 8-gram novelty scoring (the incremental-crawl
    freshness signal dedup pipelines rank by): streaming the corpus in
    doc_id order, a document's novelty = how many of its DISTINCT
    word-8-grams have never appeared in any earlier document (first
    appearance = min doc_id — the q_doc_heaps first-seen census at
    gram granularity).  Exact integers: (doc_id, n_grams, n_novel).
    Documents shorter than 8 words report 0/0.

    Shape: per-batch per-doc distinct gram explode (a doc never
    straddles batches) → ONE pre-combined (gram → min doc, count-per-
    doc) exchange pair; no gram ever reaches the driver."""
    from ..functions.relational import groupby_agg

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        doc_ids, grams = [], []
        for did, text in zip(b["doc_id"], b["text"]):
            toks = str(text).split(" ")
            if len(toks) < 8:
                continue
            for g in {" ".join(toks[i:i + 8])
                      for i in range(len(toks) - 7)}:
                doc_ids.append(did)
                grams.append(g)
        return pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64"),
                             "gram": pd.Series(grams, dtype=object)})

    per = docs.map_batches(explode, batch_format="pandas").materialize()
    cnt = groupby_agg(per, ["doc_id"],
                      [("gram", "count", "n_grams")]).to_pandas()
    fs = groupby_agg(per, ["gram"], [("doc_id", "min", "first_doc")])
    nov = groupby_agg(fs, ["first_doc"],
                      [("first_doc", "count", "n_novel")]).to_pandas()

    base = read_table(sf_dir, "documents", columns=["doc_id"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    base = base.merge(cnt, on="doc_id", how="left") \
        .merge(nov.rename(columns={"first_doc": "doc_id"}),
               on="doc_id", how="left").fillna(0)
    for c in ("n_grams", "n_novel"):
        base[c] = base[c].astype("int64")
    return base[["doc_id", "n_grams", "n_novel"]]


ORACLE_SQL["q_doc_novelty"] = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), g AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(words, i, i + 7), ' ') AS gram
        FROM w, LATERAL unnest(range(1, len(words) - 6)) AS t(i)
        WHERE len(words) >= 8
    ), cnt AS (
        SELECT doc_id, count(*)::BIGINT AS n_grams FROM g
        GROUP BY doc_id
    ), fs AS (
        SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
    ), nov AS (
        SELECT first_doc AS doc_id, count(*)::BIGINT AS n_novel
        FROM fs GROUP BY first_doc
    )
    SELECT d.doc_id,
           coalesce(c.n_grams, 0)::BIGINT AS n_grams,
           coalesce(n.n_novel, 0)::BIGINT AS n_novel
    FROM documents d
    LEFT JOIN cnt c USING (doc_id)
    LEFT JOIN nov n USING (doc_id)
    ORDER BY d.doc_id
"""


def q_events_vmr(sf_dir: str) -> pd.DataFrame:
    """Burstiness census: the variance-to-mean ratio (index of
    dispersion) of daily event volume — a Poisson arrival stream reads
    ~1000 milli, clustered/bursty traffic reads high, super-regular
    low.  Exactly: VMR = s²/ȳ = (n·Σy² − S²) / ((n−1)·S) reported as
    vmr_milli = 1000·(n·Σy² − S²) // ((n−1)·S) — every term an
    integer.

    Shape: daily counts one pre-combined exchange; constant driver
    finish."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    daily = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "day": (b["ts"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000)}),
            batch_format="pandas"),
        ["day"], [("day", "count", "n")]).to_pandas()
    y = daily["n"].to_numpy("int64")
    n = len(y)
    s = int(y.sum())
    s2 = int((y.astype(object) ** 2).sum())
    vmr_milli = (1000 * (n * s2 - s * s)) // ((n - 1) * s) \
        if n > 1 and s > 0 else 0
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "total": pd.Series([s], dtype="int64"),
        "vmr_milli": pd.Series([vmr_milli], dtype="int64")})


ORACLE_SQL["q_events_vmr"] = """
    WITH daily AS (
        SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ), m AS (
        SELECT count(*)::HUGEINT AS n, sum(n)::HUGEINT AS s,
               sum(n * n)::HUGEINT AS s2
        FROM daily
    )
    SELECT n::BIGINT AS n_days, s::BIGINT AS total,
           (CASE WHEN n > 1 AND s > 0
                 THEN (1000 * (n * s2 - s * s)) // ((n - 1) * s)
                 ELSE 0 END)::BIGINT AS vmr_milli
    FROM m
"""


def q_events_runs(sf_dir: str) -> pd.DataFrame:
    """Wald-Wolfowitz runs test census on the daily-volume sequence:
    days label above (1) / at-or-below (0) the EXACT median-by-
    position (lower median of the sorted counts — an order statistic,
    no float), runs = label changes + 1; the expected run count under
    randomness, E[R] = 2·n1·n0/(n1+n0) + 1, reports as an exact
    milli floor.  R far from E[R] flags trending (few runs) or
    oscillating (many runs) traffic.

    Shape: daily counts one pre-combined exchange; day-sized driver
    finish (the sequence scan is inherently ordered)."""
    from ..functions.relational import groupby_agg

    ev = read_table(sf_dir, "events", columns=["ts"])
    daily = groupby_agg(
        ev.map_batches(
            lambda b: pd.DataFrame({
                "day": (b["ts"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000)}),
            batch_format="pandas"),
        ["day"], [("day", "count", "n")]).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    y = daily["n"].to_numpy("int64")
    n = len(y)
    med = int(np.sort(y)[(n - 1) // 2])
    lab = (y > med).astype("int64")
    runs = int((lab[1:] != lab[:-1]).sum()) + 1 if n else 0
    n1 = int(lab.sum())
    n0 = n - n1
    er_milli = (1000 * 2 * n1 * n0) // (n1 + n0) + 1000 \
        if (n1 + n0) > 0 else 0
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "median": pd.Series([med], dtype="int64"),
        "n_above": pd.Series([n1], dtype="int64"),
        "runs": pd.Series([runs], dtype="int64"),
        "expected_runs_milli": pd.Series([er_milli], dtype="int64")})


ORACLE_SQL["q_events_runs"] = """
    WITH daily AS (
        SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ), med AS (
        SELECT n AS m FROM daily ORDER BY n
        LIMIT 1 OFFSET (SELECT (count(*) - 1) // 2 FROM daily)
    ), lab AS (
        SELECT day, (CASE WHEN n > (SELECT m FROM med)
                          THEN 1 ELSE 0 END)::BIGINT AS l
        FROM daily
    ), chg AS (
        SELECT l, lag(l) OVER (ORDER BY day) AS pl FROM lab
    ), agg AS (
        SELECT count(*)::BIGINT AS n,
               sum(CASE WHEN pl IS NOT NULL AND l <> pl
                        THEN 1 ELSE 0 END)::BIGINT + 1 AS runs,
               sum(l)::BIGINT AS n1
        FROM chg
    )
    SELECT n AS n_days, (SELECT m FROM med) AS median,
           n1 AS n_above, runs,
           (CASE WHEN n > 0
                 THEN (1000 * 2 * n1 * (n - n1)) // n + 1000
                 ELSE 0 END)::BIGINT AS expected_runs_milli
    FROM agg
"""


def q_doc_hashvec(sf_dir: str) -> pd.DataFrame:
    """Signed feature hashing (Weinberger et al. ICML'09 — the
    hashing-trick featurizer linear text classifiers train on):
    every token occurrence lands in bucket md5[0:8] % 64 with sign
    from md5[8] parity; per doc the signed bucket vector's exact
    integer profile — nnz buckets, Σ|v| and Σv² (the sign trick makes
    E[Σv²] equal the true token-count norm despite collisions).
    md5 windows are disjoint hex slices so the SQL twin is
    bit-identical.

    Shape: one explode pass with a per-batch (doc, bucket) combiner;
    one pre-combined groupby; per-doc profile aggregation."""
    import hashlib

    from ..functions.relational import groupby_agg

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def buckets(b: pd.DataFrame) -> pd.DataFrame:
        toks = b.set_index("doc_id")["text"].str.lower() \
            .str.findall("[a-z0-9_]+").explode().dropna()
        g = toks.reset_index()
        g.columns = ["doc_id", "tok"]
        uniq = g["tok"].unique()
        hs = {t: hashlib.md5(t.encode()).hexdigest() for t in uniq}
        g["bucket"] = g["tok"].map(
            lambda t: int(hs[t][:8], 16) % 64).astype("int64")
        g["sgn"] = g["tok"].map(
            lambda t: 1 if int(hs[t][8], 16) % 2 == 0 else -1
        ).astype("int64")
        # per-batch combiner: one row per (doc, bucket)
        vc = g.groupby(["doc_id", "bucket"])["sgn"].sum() \
            .reset_index(name="v")
        return vc

    per = groupby_agg(
        docs.map_batches(buckets, batch_format="pandas"),
        ["doc_id", "bucket"], [("v", "sum", "v")]).to_pandas()
    per = per[per["v"] != 0]
    prof = per.assign(one=1, l1=per["v"].abs(),
                      l2=per["v"] * per["v"]) \
        .groupby("doc_id").agg(nnz=("one", "sum"), l1=("l1", "sum"),
                               l2sq=("l2", "sum")).reset_index()
    base = read_table(sf_dir, "documents", columns=["doc_id"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out = base.merge(prof, on="doc_id", how="left").fillna(0)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


ORACLE_SQL["q_doc_hashvec"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text),
                                         '[a-z0-9_]+')) AS tok
        FROM documents
    ), h AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64
                   AS bucket,
               (CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2
                          = 0
                     THEN 1 ELSE -1 END)::BIGINT AS sgn
        FROM tok
    ), per AS (
        SELECT doc_id, bucket, sum(sgn)::BIGINT AS v
        FROM h GROUP BY doc_id, bucket
        HAVING sum(sgn) <> 0
    ), prof AS (
        SELECT doc_id, count(*)::BIGINT AS nnz,
               sum(abs(v))::BIGINT AS l1,
               sum(v * v)::BIGINT AS l2sq
        FROM per GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(p.nnz, 0)::BIGINT AS nnz,
           coalesce(p.l1, 0)::BIGINT AS l1,
           coalesce(p.l2sq, 0)::BIGINT AS l2sq
    FROM documents d LEFT JOIN prof p USING (doc_id)
    ORDER BY d.doc_id
"""


def q_doc_calibration(sf_dir: str) -> pd.DataFrame:
    """Classifier calibration census (the reliability-diagram table an
    ML-ops quality gate ships): q_doc_fasttext's scores ranked into 10
    equal-count bins by the TOTAL order (score, doc_id) — engine-
    deterministic where ntile() tie placement is not — against the
    'en' language tag as reference label; per bin n_docs, n_en and
    en_rate_ppm (exact integers).  A well-calibrated filter shows a
    monotone en_rate curve; a flat one means the score carries no
    signal at that grain.

    Shape: the scoring pass is q_doc_fasttext's (stateless, weights
    in the closure); the rank is over the doc-dimension table
    (guarded driver sort, the PSI order-statistic regime); census one
    groupby."""
    from ..functions.text import fasttext_scores

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang"]).to_pandas()
    sc = fasttext_scores(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        id_col="doc_id").to_pandas()[["doc_id", "score_scaled"]]
    if len(sc) > 20_000_000:
        raise RuntimeError("q_doc_calibration: doc table past the "
                           "rank driver guard")
    df = sc.merge(docs, on="doc_id")
    df = df.sort_values(["score_scaled", "doc_id"],
                        kind="mergesort").reset_index(drop=True)
    n = len(df)
    df["bin"] = (np.arange(n, dtype="int64") * 10) // n
    df["is_en"] = (df["lang"] == "en").astype("int64")
    out = df.groupby("bin").agg(
        n_docs=("is_en", "count"), n_en=("is_en", "sum")).reset_index()
    out["en_rate_ppm"] = out["n_en"] * 1_000_000 // out["n_docs"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


ORACLE_SQL["q_doc_calibration"] = """
    WITH d AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ), uni AS (
        SELECT doc_id, unnest(l) AS f FROM d
    ), big AS (
        SELECT doc_id, l[i] || ' ' || l[i + 1] AS f
        FROM (SELECT doc_id, l,
                     unnest(range(1, greatest(len(l), 1)::BIGINT)) AS i
              FROM d)
    ), feats AS (
        SELECT doc_id, f FROM uni
        UNION ALL SELECT doc_id, f FROM big
    ), ws AS (
        SELECT doc_id,
               count(*)::BIGINT AS n_feats,
               SUM(('0x' || substr(md5(
                       ((('0x' || substr(md5(f), 1, 8))::BIGINT
                         % 1024))::VARCHAR), 1, 8))::BIGINT
                   % 2001 - 1000)::BIGINT AS w_sum
        FROM feats GROUP BY doc_id
    ), scored AS (
        SELECT dd.doc_id,
               COALESCE(CAST(floor(1000000.0 * (ws.w_sum
                   / (1000.0 * ws.n_feats))) AS BIGINT), 0)::BIGINT
                   AS score_scaled,
               (CASE WHEN dd.lang = 'en' THEN 1 ELSE 0 END)::BIGINT
                   AS is_en
        FROM documents dd LEFT JOIN ws USING (doc_id)
    ), ranked AS (
        SELECT is_en,
               ((row_number() OVER (ORDER BY score_scaled, doc_id)
                 - 1) * 10)
               // (SELECT count(*) FROM scored) AS bin
        FROM scored
    )
    SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_docs,
           sum(is_en)::BIGINT AS n_en,
           (sum(is_en) * 1000000 // count(*))::BIGINT AS en_rate_ppm
    FROM ranked GROUP BY bin ORDER BY bin
"""


def q_emb_scatter(sf_dir: str) -> pd.DataFrame:
    """Cluster-scatter census over the q_kmeans assignment — the
    Calinski-Harabasz ingredients as EXACT per-cluster integers:
    within_floor = (n_c·Σ‖x‖² − ‖Σx‖²) // n_c (the n_c-scaled
    within-cluster scatter, floored once) and between_floor =
    ‖n·S_c − n_c·S‖² // (n_c·n²) (the cluster-mean-to-global-mean
    term with both means cross-multiplied away before the single
    floor).  All products stay inside 128-bit for dimension-bounded
    corpora, so the SQL twin (the k-means CTE chain + one HUGEINT
    rollup) is bit-identical.  CH(k) = (ΣB/(k−1)) / (ΣW/(n−k)) to the
    floor resolution.

    Shape: the assignment is q_kmeans' broadcast-round pass; scatter
    needs ONE more pre-combined (cluster, dim) sum exchange; the k×d
    finish is driver-trivial."""
    from ..functions.similarity import kmeans_quantized

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assign, _hist = kmeans_quantized(ds, k=8, rounds=4)
    adf = assign.to_pandas()
    full = ds.to_pandas().merge(adf, on="vec_id")
    q = np.floor(np.stack(full["embedding"].to_numpy())
                 .astype(np.float64) * 1024).astype(np.int64)
    cl = full["cluster"].to_numpy("int64")
    n = len(full)
    s_all = q.astype(object).sum(0)
    rows = []
    for c in sorted(set(cl.tolist())):
        m = cl == c
        nc = int(m.sum())
        qc = q[m].astype(object)
        ssq = int((qc * qc).sum())
        sc = qc.sum(0)
        s2 = int((sc * sc).sum())
        within = (nc * ssq - s2) // nc
        dvec = n * sc - nc * s_all
        between = int((dvec * dvec).sum()) // (nc * n * n)
        rows.append((c, nc, within, between))
    return pd.DataFrame(rows, columns=["cluster", "n", "within_floor",
                                       "between_floor"]).astype("int64")


def _scatter_oracle_sql(*, k: int, rounds: int, dim: int,
                        q_scale: int) -> str:
    ctes, fin = _kmeans_ctes(k=k, rounds=rounds, dim=dim,
                             q_scale=q_scale)
    ssq = " + ".join(f"x{i} * x{i}" for i in range(dim))
    sums = ", ".join(f"SUM(x{i})::HUGEINT AS s{i}" for i in range(dim))
    gsums = ", ".join(f"SUM(x{i})::HUGEINT AS g{i}"
                      for i in range(dim))
    s2 = " + ".join(f"s{i} * s{i}" for i in range(dim))
    # plain column references via one cross join — a scalar subquery
    # inside each of the 64 chain terms blows DuckDB's binder
    # recursion limit (observed at depth 128)
    dvec = " + ".join(
        f"(t.n * p.s{i} - p.n * g.g{i})"
        f" * (t.n * p.s{i} - p.n * g.g{i})"
        for i in range(dim))
    s2p = " + ".join(f"p.s{i} * p.s{i}" for i in range(dim))
    return ("WITH " + ",\n".join(ctes) + f""",
    snap AS MATERIALIZED (SELECT * FROM {fin}),
    tot AS (SELECT count(*)::HUGEINT AS n FROM snap),
    gl AS (SELECT {gsums} FROM snap),
    per AS (
        SELECT cluster, count(*)::HUGEINT AS n,
               SUM({ssq})::HUGEINT AS ssq, {sums}
        FROM snap GROUP BY cluster
    )
    SELECT p.cluster::BIGINT AS cluster, p.n::BIGINT AS n,
           ((p.n * p.ssq - ({s2p})) // p.n)::BIGINT AS within_floor,
           (({dvec}) // (p.n * t.n * t.n))::BIGINT AS between_floor
    FROM per p, tot t, gl g ORDER BY p.cluster""")


ORACLE_SQL["q_emb_scatter"] = _scatter_oracle_sql(k=8, rounds=4,
                                                  dim=64, q_scale=1024)


def q_doc_jsd(sf_dir: str) -> pd.DataFrame:
    """Jensen-Shannon divergence between the English and non-English
    token distributions (the subcorpus-shift census a mixing pipeline
    monitors — symmetric, bounded, defined even on disjoint support,
    unlike raw KL): add-one-smoothed unigram distributions over the
    JOINT vocabulary, JSD = ½KL(p‖m) + ½KL(q‖m) with every ln term
    floored to nanos on exact integer count ratios (the PSI float
    discipline — one IEEE ln per vocab term, order-free integer sum).
    Reports the two KL halves and the JSD in nano units plus the
    vocab/token tallies.

    Shape: ONE exploded (group, token) pre-combined exchange; the
    vocabulary-sized table drives a vectorized driver finish."""
    from ..functions.relational import groupby_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        grp = np.where(b["lang"].to_numpy() == "en", "en", "other")
        s = pd.DataFrame({
            "grp": grp,
            "toks": b["text"].str.lower().str.findall("[a-z0-9_]+"),
        }).explode("toks").dropna()
        vc = s.groupby(["grp", "toks"]).size().reset_index(name="n")
        vc.columns = ["grp", "tok", "n"]
        return vc

    cnt = groupby_agg(
        docs.map_batches(explode, batch_format="pandas"),
        ["grp", "tok"], [("n", "sum", "n")]).to_pandas()
    piv = cnt.pivot_table(index="tok", columns="grp", values="n",
                          fill_value=0)
    a = piv.get("en", pd.Series(0, index=piv.index)).to_numpy("int64")
    b_ = piv.get("other", pd.Series(0, index=piv.index)) \
        .to_numpy("int64")
    v = len(piv)
    na, nb = int(a.sum()), int(b_.sum())
    # add-one smoothing: p_t = (a_t+1)/(na+V), q_t likewise; m = (p+q)/2
    p = (a + 1.0) / (na + v)
    q = (b_ + 1.0) / (nb + v)
    m = (p + q) / 2.0
    kl_pm = int(np.floor(p * np.log(p / m) * 1e9).astype("int64").sum())
    kl_qm = int(np.floor(q * np.log(q / m) * 1e9).astype("int64").sum())
    jsd_nano = (kl_pm + kl_qm) // 2
    return pd.DataFrame({
        "vocab": pd.Series([v], dtype="int64"),
        "n_en": pd.Series([na], dtype="int64"),
        "n_other": pd.Series([nb], dtype="int64"),
        "kl_pm_nano": pd.Series([kl_pm], dtype="int64"),
        "kl_qm_nano": pd.Series([kl_qm], dtype="int64"),
        "jsd_nano": pd.Series([jsd_nano], dtype="int64")})


ORACLE_SQL["q_doc_jsd"] = """
    WITH tok AS (
        SELECT (CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END)
                   AS grp,
               unnest(regexp_extract_all(lower(text),
                                         '[a-z0-9_]+')) AS tok
        FROM documents
    ), cnt AS (
        SELECT grp, tok, count(*)::BIGINT AS n
        FROM tok GROUP BY grp, tok
    ), piv AS (
        SELECT tok,
               coalesce(sum(CASE WHEN grp = 'en' THEN n END), 0)
                   ::BIGINT AS a,
               coalesce(sum(CASE WHEN grp = 'other' THEN n END), 0)
                   ::BIGINT AS b
        FROM cnt GROUP BY tok
    ), tots AS (
        SELECT count(*)::BIGINT AS v, sum(a)::BIGINT AS na,
               sum(b)::BIGINT AS nb
        FROM piv
    ), terms AS (
        SELECT
            floor(((p.a + 1.0) / (t.na + t.v))
                  * ln(((p.a + 1.0) / (t.na + t.v))
                       / ((((p.a + 1.0) / (t.na + t.v))
                           + ((p.b + 1.0) / (t.nb + t.v))) / 2.0))
                  * 1000000000)::BIGINT AS tp,
            floor(((p.b + 1.0) / (t.nb + t.v))
                  * ln(((p.b + 1.0) / (t.nb + t.v))
                       / ((((p.a + 1.0) / (t.na + t.v))
                           + ((p.b + 1.0) / (t.nb + t.v))) / 2.0))
                  * 1000000000)::BIGINT AS tq
        FROM piv p, tots t
    )
    SELECT (SELECT v FROM tots) AS vocab,
           (SELECT na FROM tots) AS n_en,
           (SELECT nb FROM tots) AS n_other,
           sum(tp)::BIGINT AS kl_pm_nano,
           sum(tq)::BIGINT AS kl_qm_nano,
           ((sum(tp) + sum(tq)) // 2)::BIGINT AS jsd_nano
    FROM terms
"""
