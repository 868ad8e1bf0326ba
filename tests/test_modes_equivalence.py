"""Driver-merge vs shuffle-mode equivalence: the scale paths must
produce byte-identical results to the small-corpus defaults — this is
what makes the driver-merge default safe to ship (mode='shuffle' is the
same algebra, different exchange)."""

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_groupby_agg_modes_agree():
    from cpg_ray.functions.relational import groupby_agg, read_table

    ds = read_table(SF, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    specs = [("l_quantity", "sum", "sq"), ("l_extendedprice", "mean", "ap"),
             ("l_quantity", "count", "n"), ("l_quantity", "max", "mx")]
    a = groupby_agg(ds, ["l_returnflag"], specs, mode="driver").to_pandas()
    b = groupby_agg(ds, ["l_returnflag"], specs, mode="shuffle").to_pandas()
    a, b = _norm(a), _norm(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=1e-12)


def test_entity_vocab_modes_agree_incl_skew():
    import ray

    from cpg_ray.pagegen import cfg_for_variant, generate_pages_dataset, _cached_world
    from cpg_ray.stages.canonicalize import collect_entity_vocab
    from cpg_ray.stages.extract import ExtractTriples, build_detector_index
    from cpg_ray.stages.link import make_link_fn, build_norm_index

    cfg = cfg_for_variant("skew")
    world = _cached_world(cfg)
    det_ref = ray.put(build_detector_index(
        [r["alias"] for r in world.alias_rows()]))
    norm_ref = ray.put(build_norm_index(world.alias_rows()))
    pages = generate_pages_dataset(200, cfg, "skew")
    linked = pages.map_batches(
        ExtractTriples, fn_constructor_kwargs={"index_ref": det_ref},
        batch_size=64, batch_format="pyarrow", concurrency=(1, 4),
    ).map_batches(
        make_link_fn(norm_ref), batch_format="pyarrow"
    ).materialize()

    va = collect_entity_vocab(linked, mode="driver").to_pandas()
    vb = collect_entity_vocab(linked, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(va), _norm(vb), check_dtype=False)
    # hot entity present exactly once with the full count in both
    assert (va.entity_id == "O00000").sum() == 1


def test_exact_dedup_modes_agree():
    from cpg_ray.functions.dedup import exact_dedup

    base = pq.read_table(f"{SF}/documents.parquet").to_pandas()[
        ["doc_id", "text"]
    ].head(120)
    dup = base.head(30).copy()
    dup["doc_id"] += 1_000_000
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    a = exact_dedup(ds, mode="driver").to_pandas()
    b = exact_dedup(ds, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_grouped_topk_and_distinct_modes_agree():
    from cpg_ray.functions.relational import (
        distinct_on,
        grouped_topk,
        read_table,
    )

    ds = read_table(SF, "part",
                    columns=["p_brand", "p_partkey", "p_retailprice"])
    a = grouped_topk(ds, ["p_brand"], "p_retailprice", 3,
                     tie_break="p_partkey", mode="driver").to_pandas()
    b = grouped_topk(ds, ["p_brand"], "p_retailprice", 3,
                     tie_break="p_partkey", mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)

    ds2 = read_table(SF, "orders",
                     columns=["o_custkey", "o_orderkey", "o_totalprice"])
    c = distinct_on(ds2, ["o_custkey"], order_col="o_orderkey",
                    mode="driver").to_pandas()
    d = distinct_on(ds2, ["o_custkey"], order_col="o_orderkey",
                    mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(c), _norm(d), check_dtype=False)


def test_auto_mode_degrades_at_switch_boundary():
    """mode='auto' (the universal default) must cross the driver-limit
    boundary by SWITCHING to the shuffle path, not raising — while
    mode='driver' at the same limit still raises (the guard itself is
    intact)."""
    import pytest

    from cpg_ray.functions.relational import (
        distinct_on,
        groupby_agg,
        grouped_topk,
        read_table,
    )

    ds = read_table(SF, "orders",
                    columns=["o_custkey", "o_orderkey", "o_totalprice"])

    # groupby_agg: >2 distinct o_custkey keys trips a limit of 2
    specs = [("o_totalprice", "sum", "rev")]
    with pytest.raises(RuntimeError):
        groupby_agg(ds, ["o_custkey"], specs, mode="driver",
                    driver_key_limit=2).to_pandas()
    auto = groupby_agg(ds, ["o_custkey"], specs, mode="auto",
                       driver_key_limit=2).to_pandas()
    ref = groupby_agg(ds, ["o_custkey"], specs, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(auto), _norm(ref), check_dtype=False,
                                  check_exact=False, rtol=1e-12)

    # distinct_on / grouped_topk: candidate rows exceed a limit of 5
    with pytest.raises(RuntimeError):
        distinct_on(ds, ["o_custkey"], order_col="o_orderkey",
                    mode="driver", driver_row_limit=5).to_pandas()
    auto2 = distinct_on(ds, ["o_custkey"], order_col="o_orderkey",
                        mode="auto", driver_row_limit=5).to_pandas()
    ref2 = distinct_on(ds, ["o_custkey"], order_col="o_orderkey",
                       mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(auto2), _norm(ref2),
                                  check_dtype=False)

    auto3 = grouped_topk(ds, ["o_custkey"], "o_totalprice", 2,
                         tie_break="o_orderkey", mode="auto",
                         driver_row_limit=5).to_pandas()
    ref3 = grouped_topk(ds, ["o_custkey"], "o_totalprice", 2,
                        tie_break="o_orderkey", mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(auto3), _norm(ref3),
                                  check_dtype=False)


def test_asof_and_interval_join_modes_agree():
    """Broadcast (no-shuffle) and bucketed-shuffle paths of the as-of
    and interval joins must agree row-for-row."""
    from cpg_ray.functions.relational import asof_join, interval_join

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "user_id", "ts", "event_type"]
                       ).to_pandas()
    left = rd.from_pandas(
        ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
    )
    right_df = ev[ev.event_type == "click"][["user_id", "ts"]].assign(
        click_ts=lambda x: x.ts
    )
    for mode in ("broadcast", "shuffle"):
        out = asof_join(
            left, rd.from_pandas(right_df), by="user_id", on="ts",
            right_value_cols=["click_ts"], mode=mode,
        ).to_pandas()[["event_id", "user_id", "click_ts_asof"]]
        if mode == "broadcast":
            base = _norm(out)
        else:
            pd.testing.assert_frame_equal(base, _norm(out),
                                          check_dtype=False)
    for mode in ("broadcast", "shuffle"):
        out = interval_join(
            left, rd.from_pandas(right_df), by="user_id", on="ts",
            lower=pd.Timedelta(hours=-1), upper=pd.Timedelta(0),
            right_value_cols=["click_ts"], how="left", mode=mode,
        ).to_pandas()[["event_id", "user_id", "click_ts_r"]]
        if mode == "broadcast":
            base_i = _norm(out)
        else:
            pd.testing.assert_frame_equal(base_i, _norm(out),
                                          check_dtype=False)


def test_entity_vocab_auto_degrades():
    """collect_entity_vocab(mode='auto') with a tiny guard returns the
    shuffle-path result instead of raising."""
    import pyarrow as pa
    import ray.data as rd

    from cpg_ray.stages.canonicalize import collect_entity_vocab

    tri = rd.from_arrow(pa.table({
        "subj": [f"P{i:03d}" for i in range(40)],
        "obj": [f"O{i % 7:03d}" for i in range(40)],
    })).materialize()
    auto = collect_entity_vocab(tri, driver_key_limit=3).to_pandas()
    ref = collect_entity_vocab(tri, mode="shuffle").to_pandas()
    pd.testing.assert_frame_equal(_norm(auto), _norm(ref), check_dtype=False)
