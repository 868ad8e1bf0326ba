"""Golden-output test (FIXTURES.md F2): the parallel Ray pipeline must
reproduce the frozen single-threaded reference computation exactly —
the closest analog of the reference's cross-implementation golden test
(JavaVsCppTest.java:42-54)."""

import pandas as pd
import pyarrow.parquet as pq

from cpg_ray.pagegen import cfg_for_variant, generate_pages_dataset
from cpg_ray.pipelines.flagship import triples_dataset

GOLDEN = "tests/golden/basic_triples_n200.parquet"


def test_pipeline_matches_frozen_golden():
    cfg = cfg_for_variant("basic")
    pages = generate_pages_dataset(200, cfg, "basic")
    triples, _ents = triples_dataset(pages, cfg)
    got = (
        triples.to_pandas()
        .sort_values(["url", "span_start", "pred"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = pq.read_table(GOLDEN).to_pandas()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
