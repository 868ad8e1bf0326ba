"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline (pages →
extract → link → canonicalize) at sf0.001 scale; ``queries()`` exposes
one callable per implemented operator family (SURVEY.md §2);
``oracle_sql()`` provides DuckDB equivalents for the SQL-expressible
ones (the rest get rows-only checks).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# pages-per-sf for the KG queries (generated deterministically and
# cached under /tmp — input_hint shape, no external data)
_SF_PAGES = {"sf0.001": 500, "sf0.01": 2000, "sf0.1": 20000}


def _n_pages_for(sf_dir: str) -> int:
    return _SF_PAGES.get(os.path.basename(os.path.normpath(sf_dir)), 1000)


def _pages_ds(sf_dir: str, variant: str = "mixed"):
    from cpg_ray.pagegen import cfg_for_variant, materialize_pages

    import ray.data as rd

    n = _n_pages_for(sf_dir)
    scale = max(1, n // 2000)
    cfg = cfg_for_variant(variant, scale=scale)
    path = materialize_pages(
        f"/tmp/cpg_ray_pages/{variant}_{n}_{cfg.seed}", n, cfg, variant
    )
    return rd.read_parquet(path), cfg


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale synthetic pages."""
    pages, cfg = _pages_ds("/root/testdata/sf0.001", "mixed")
    from cpg_ray.pipelines.flagship import triples_dataset

    triples, _entities = triples_dataset(pages, cfg)
    return triples


# ---- KG queries (rows-only: pipelines over the synthesized pages) ----------


def _kg_triples(sf_dir: str):
    pages, cfg = _pages_ds(sf_dir, "mixed")
    from cpg_ray.pipelines.flagship import triples_dataset

    triples, _ = triples_dataset(pages, cfg)
    return triples.to_pandas().sort_values(
        ["canonical_subj", "pred", "canonical_obj", "url", "span_start"]
    ).reset_index(drop=True)


def _kg_entities(sf_dir: str):
    pages, cfg = _pages_ds(sf_dir, "mixed")
    from cpg_ray.pipelines.flagship import triples_dataset

    _, ents = triples_dataset(pages, cfg)
    df = ents.to_pandas()
    df["aliases"] = df["aliases"].map(lambda a: "|".join(a))
    return df.sort_values("entity_id").reset_index(drop=True)


def _kg_extracted_text(sf_dir: str):
    """Per-row invariant surface: url → extracted text (must equal the
    pages.text column byte-for-byte)."""
    import pyarrow as pa

    from cpg_ray.stages.extract import extract_text

    pages, _cfg = _pages_ds(sf_dir, "mixed")

    def ext(batch: pa.Table) -> pa.Table:
        texts, probs = [], []
        for html in batch["html"].to_pylist():
            t, p = extract_text(html)
            texts.append(t)
            probs.append(p)
        return pa.table(
            {
                "url": batch["url"],
                "extracted": texts,
                "expected": batch["text"],
                "is_problem": probs,
            }
        )

    df = pages.map_batches(ext, batch_format="pyarrow").to_pandas()
    df["byte_identical"] = df.extracted == df.expected
    return df[["url", "byte_identical", "is_problem"]].sort_values("url").reset_index(
        drop=True
    )


def _graph_tables(sf_dir: str):
    """Materialized nodes/edges Datasets for the graph-query layer
    (built once per sf via the resumable sharded pipeline, cached on
    disk under /tmp)."""
    import glob

    import ray.data as rd

    from cpg_ray.pagegen import cfg_for_variant, materialize_pages
    from cpg_ray.pipelines.flagship import run_flagship

    n = _n_pages_for(sf_dir)
    scale = max(1, n // 2000)
    cfg = cfg_for_variant("mixed", scale=scale)
    pages_path = materialize_pages(
        f"/tmp/cpg_ray_pages/mixed_{n}_{cfg.seed}", n, cfg, "mixed"
    )
    out_dir = f"/tmp/cpg_ray_graph/mixed_{n}_{cfg.seed}"
    run_flagship(pages_path, out_dir, cfg, n_shards=4, resume=True)
    nodes = rd.read_parquet(
        sorted(glob.glob(f"{out_dir}/graph/shard=*/kind=node/*.parquet")),
        columns=["node_id", "label", "name", "norm_name", "url",
                 "span_start", "span_end", "is_inferred"],
    )
    edges = rd.read_parquet(
        sorted(glob.glob(f"{out_dir}/graph/shard=*/kind=edge/*.parquet")),
        columns=["src_id", "dst_id", "etype", "index", "name", "url"],
    )
    return nodes, edges


def _kg_rel_chain(sf_dir: str):
    """(Section)-[:AST]->(Mention) relationship chain — openCypher
    chain analog (Graph.kt:121-167) via two hash joins."""
    from cpg_ray.functions.graphquery import rel_chain

    nodes, edges = _graph_tables(sf_dir)
    df = rel_chain(
        nodes, edges, etype="AST", src_label="Section", dst_label="Mention"
    ).to_pandas()
    return df.sort_values(["url", "src_id", "dst_id"]).reset_index(drop=True)


def _kg_label_filter(sf_dir: str):
    """Label + property WHERE filter (M10/M11 analog): inferred
    mentions, sorted."""
    from cpg_ray.functions.graphquery import label_filter

    nodes, _edges = _graph_tables(sf_dir)
    m = label_filter(nodes, "Mention")
    df = m.map_batches(
        lambda b: b[b.is_inferred], batch_format="pandas"
    ).to_pandas()
    return df.sort_values(["url", "span_start"]).reset_index(drop=True)


def _kg_dangling_edges(sf_dir: str):
    """Graph consistency check (M12/D4 analog) — must return 0 rows."""
    from cpg_ray.functions.graphquery import dangling_edges

    nodes, edges = _graph_tables(sf_dir)
    df = dangling_edges(nodes, edges).to_pandas()
    if df.empty:
        import pandas as pd

        df = pd.DataFrame({"src_id": pd.Series(dtype="object"),
                           "dst_id": pd.Series(dtype="object")})
    return df


def _kg_eog_chains(sf_dir: str):
    """Per-document EOG walk (G6 followNextEOG analog): chain length +
    index density per url."""
    from cpg_ray.functions.graphquery import follow_eog

    _nodes, edges = _graph_tables(sf_dir)
    df = follow_eog(edges).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def _kg_problems(sf_dir: str):
    """Problem rows routed to their own partition (ProblemNode analog,
    Handler.java:129-138): truncated pages appear here, never as
    exceptions."""
    import glob

    import pandas as pd
    import ray.data as rd

    _nodes, _edges = _graph_tables(sf_dir)  # ensures the cache exists
    n = _n_pages_for(sf_dir)
    files = sorted(
        glob.glob(
            f"/tmp/cpg_ray_graph/mixed_{n}_42/graph/shard=*/kind=problem/*.parquet"
        )
    )
    if not files:
        return pd.DataFrame({"url": pd.Series(dtype="object"),
                             "name": pd.Series(dtype="object")})
    df = rd.read_parquet(files, columns=["url", "name"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def _kg_scope_resolution(sf_dir: str):
    """Flagship over the 'scoped' variant: last-name anaphora resolved
    via within-document scope (ScopeManager.kt:375-602 analog)."""
    pages, cfg = _pages_ds(sf_dir, "scoped")
    from cpg_ray.pipelines.flagship import triples_dataset

    triples, _ = triples_dataset(pages, cfg)
    df = triples.to_pandas()
    df = df[df.pred == "visited"]
    return df.sort_values(["url", "span_start"]).reset_index(drop=True)


def _kg_eog_reach(sf_dir: str):
    """Variable-length path traversal (*1..3 analog) over EOG edges."""
    from cpg_ray.functions.graphquery import var_length_reach

    _nodes, edges = _graph_tables(sf_dir)
    df = var_length_reach(edges, etype="EOG", max_hops=3).to_pandas()
    return df.sort_values(["url", "src_id", "hops"]).reset_index(drop=True)


def _kg_typestate(sf_dir: str):
    """DFA order evaluation per (url, subject) — DFAOrderEvaluator
    analog (cpg-analysis/fsm/DFAOrderEvaluator.kt:56-144)."""
    import ray

    from cpg_ray.functions.typestate import evaluate_order
    from cpg_ray.pagegen import _cached_world
    from cpg_ray.stages.extract import ExtractTriples, build_detector_index

    pages, cfg = _pages_ds(sf_dir, "mixed")
    det_ref = ray.put(
        build_detector_index(
            [r["alias"] for r in _cached_world(cfg).alias_rows()]
        )
    )
    raw = pages.map_batches(
        ExtractTriples,
        fn_constructor_kwargs={"index_ref": det_ref},
        batch_size=256,
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    df = evaluate_order(raw).to_pandas()
    return df.sort_values(["url", "subject"]).reset_index(drop=True)


def _kg_graph_stats(sf_dir: str):
    """Node/edge/problem counts per kind+label (StatisticsCollectionPass
    analog, StatisticsCollectionPass.kt:39-65)."""
    import ray

    from cpg_ray.pagegen import _cached_world
    from cpg_ray.stages.extract import ExtractGraph

    pages, cfg = _pages_ds(sf_dir, "mixed")
    dict_ref = ray.put(_cached_world(cfg).alias_rows())
    g = pages.map_batches(
        ExtractGraph,
        fn_constructor_kwargs={"dict_ref": dict_ref},
        batch_size=256,
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    from cpg_ray.functions.relational import groupby_agg

    agg = groupby_agg(g, ["kind", "etype", "label"], [("url", "count", "n")])
    return (
        agg.to_pandas()
        .fillna({"etype": "", "label": ""})
        .sort_values(["kind", "etype", "label"])
        .reset_index(drop=True)
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from cpg_ray.pipelines import queries as q

    out: dict[str, Callable[[str], Any]] = {
        "q1_pricing_summary": q.q1_pricing_summary,
        "q6_forecast_revenue": q.q6_forecast_revenue,
        "q_events_hourly": q.q_events_hourly,
        "q_top_users": q.q_top_users,
        "q3_shipping_priority": q.q3_shipping_priority,
        "q5_region_revenue": q.q5_region_revenue,
        "q_segment_revenue": q.q_segment_revenue,
        "q_customers_without_orders": q.q_customers_without_orders,
        "q_suppliers_with_shipments": q.q_suppliers_with_shipments,
        "q_filter_topk_orders": q.q_filter_topk_orders,
        "q_lineitem_expressions": q.q_lineitem_expressions,
        "q_grouped_topk_parts": q.q_grouped_topk_parts,
        "q_dedup_groups": q.q_dedup_groups,
        "q_part_type_stats": q.q_part_type_stats,
        "q_region_nation_union": q.q_region_nation_union,
        "q_doc_token_stats": q.q_doc_token_stats,
        "q_doc_quality": q.q_doc_quality,
        "q_events_sessions": q.q_events_sessions,
        "q_events_sessions_streaming": q.q_events_sessions_streaming,
        "q_knn_cosine": q.q_knn_cosine,
        # rows-only (non-SQL-expressible)
        "q_doc_langid": q.q_doc_langid,
        "q_doc_fingerprint": q.q_doc_fingerprint,
        "q_dedup_minhash": q.q_dedup_minhash,
        "q_dedup_simhash": q.q_dedup_simhash,
        "q_embedding_near_dup": q.q_embedding_near_dup,
        "q_knn_lsh": q.q_knn_lsh,
        "q_knn_ivf": q.q_knn_ivf,
        "q_multimodal_decode": q.q_multimodal_decode,
        "q_events_sliding": q.q_events_sliding,
        "q_events_asof": q.q_events_asof,
        "q_events_interval": q.q_events_interval,
        "q_sample_events": q.q_sample_events,
        "q_approx_stats": q.q_approx_stats,
        "kg_triples": _kg_triples,
        "kg_entities": _kg_entities,
        "kg_extracted_text": _kg_extracted_text,
        "kg_graph_stats": _kg_graph_stats,
        "kg_rel_chain": _kg_rel_chain,
        "kg_label_filter": _kg_label_filter,
        "kg_dangling_edges": _kg_dangling_edges,
        "kg_eog_chains": _kg_eog_chains,
        "kg_eog_reach": _kg_eog_reach,
        "kg_scope_resolution": _kg_scope_resolution,
        "kg_typestate": _kg_typestate,
        "kg_problems": _kg_problems,
    }
    return out


def oracle_sql() -> dict[str, str]:
    from cpg_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
