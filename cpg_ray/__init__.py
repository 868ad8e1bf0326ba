"""cpg_ray — a Ray-Data-native knowledge-graph construction engine.

Reinterprets the reference Code Property Graph library
(AY2122-CP4101-FYP-TQR/cpg, a JVM library that builds typed nodes +
labelled edges per compilation unit and then cross-links them — see
SURVEY.md) as web-scale triple extraction over Parquet tables of
Common-Crawl-style web pages:

    pages (url, warc_ts, html, text, lang)
      → extract   (deterministic html→text + per-document graph; reference
                   analog: LanguageFrontend.parse + EvaluationOrderGraphPass)
      → link      (actor-pool mention→entity scoring against an alias
                   dictionary; reference analog: VariableUsageResolver /
                   CallResolver)
      → canonicalize (salted groupby + union-find; reference analog:
                   TypeResolver dedup, TypeResolver.java:36-198)
      → materialize (sorted, partitioned, resumable Parquet; reference
                   analog: cpg-neo4j push, Application.kt:223-245)

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit salted two-phase aggregation for skewed keys.  Library
code never calls ``ray.init()`` — sessions are owned by the caller
(driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
