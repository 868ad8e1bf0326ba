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
        "q_doc_token_stats": q.q_doc_token_stats,
        "q_doc_quality": q.q_doc_quality,
        "q_events_sessions": q.q_events_sessions,
        "q_knn_cosine": q.q_knn_cosine,
        # rows-only (non-SQL-expressible)
        "q_doc_langid": q.q_doc_langid,
        "q_doc_fingerprint": q.q_doc_fingerprint,
        "q_dedup_minhash": q.q_dedup_minhash,
        "q_dedup_simhash": q.q_dedup_simhash,
        "q_embedding_near_dup": q.q_embedding_near_dup,
        "q_knn_lsh": q.q_knn_lsh,
        "q_multimodal_decode": q.q_multimodal_decode,
        "kg_triples": _kg_triples,
        "kg_entities": _kg_entities,
        "kg_extracted_text": _kg_extracted_text,
        "kg_graph_stats": _kg_graph_stats,
    }
    return out


def oracle_sql() -> dict[str, str]:
    from cpg_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
