"""Arrow schemas for every logical table in the engine.

Reference analog: the fixed, code-defined node/edge schema of the CPG
(`cpg-core/.../graph/Node.kt:48-138`, `graph/edge/PropertyEdge.kt:46-49`,
`graph/edge/Properties.java:43-49`).  Class-hierarchy labels become a
``label`` column; the `PropertyEdge` property map becomes nullable
columns (`index`, `branch`, `name`, `unreachable`).
"""

from __future__ import annotations

import pyarrow as pa

# Input table, exactly BASELINE.json `input_hint`.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Node table — reference analog: Node.kt:48 (name/code/location/isInferred)
# with SARIF-style location (PhysicalLocation.java:34) flattened to
# (url, span_start, span_end) UTF-8 byte offsets into the extracted text.
NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("label", pa.string()),  # Document | Section | Mention | Problem
        ("name", pa.string()),
        ("norm_name", pa.string()),
        ("url", pa.string()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("is_inferred", pa.bool_()),
    ]
)

# Edge table — reference analog: PropertyEdge + Properties enum
# (Properties.java:43-49: INDEX, BRANCH, NAME, UNREACHABLE).
EDGES = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("etype", pa.string()),  # AST | EOG | DFG | DFG2 | TRIPLE | REFERS_TO
        ("index", pa.int32()),
        ("name", pa.string()),
        ("branch", pa.bool_()),  # Properties.BRANCH: true/false fork arm
        ("unreachable", pa.bool_()),  # Properties.UNREACHABLE: dead edge
        ("url", pa.string()),
    ]
)

# Raw (pre-link) triple candidates emitted by the extract stage.
TRIPLES_RAW = pa.schema(
    [
        ("subj_surface", pa.string()),
        ("subj_norm", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("obj_norm", pa.string()),
        ("url", pa.string()),
        ("span_start", pa.int64()),  # byte offset of the subject mention
    ]
)

# Linked + canonicalized triples (final output of the flagship pipeline).
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),  # entity id after linking
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("span_start", pa.int64()),
        ("subj_is_inferred", pa.bool_()),
        ("obj_is_inferred", pa.bool_()),
        ("canonical_subj", pa.string()),
        ("canonical_obj", pa.string()),
    ]
)

# Canonical entity dictionary after union-find canonicalization.
ENTITIES = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("is_inferred", pa.bool_()),
    ]
)

# Alias dictionary (the broadcast small side of the link stage).
ALIAS_DICT = pa.schema(
    [
        ("alias", pa.string()),
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("prior", pa.float64()),
    ]
)

# Per-partition lineage/metrics rows — reference analog: Benchmark.kt:39-113
# and the `scratch` map (TranslationResult.java:56-57).
METRICS = pa.schema(
    [
        ("partition_id", pa.string()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_ms", pa.float64()),
        ("input_files", pa.list_(pa.string())),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
