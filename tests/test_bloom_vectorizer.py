"""Bloom-filter semi join + feature-hashing vectorizer."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_bloom_filter_no_false_negatives_and_low_fp():
    from cpg_ray.functions.relational import BloomFilter

    keys = [f"k{i}" for i in range(5000)]
    other = [f"x{i}" for i in range(20000)]
    bf = BloomFilter(len(keys), fp_rate=0.01).add_batch(keys)
    assert bf.contains_batch(np.array(keys)).all()  # zero false negatives
    fp = bf.contains_batch(np.array(other)).mean()
    assert fp < 0.03, fp


def test_bloom_semi_filter_matches_exact():
    from cpg_ray.functions.relational import bloom_semi_filter, semi_anti_filter

    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_suppkey",
                                                            "l_orderkey"])
    keys = {1, 3, 5, 7}
    exact = semi_anti_filter(li, "l_suppkey", keys).to_pandas()
    bloom = bloom_semi_filter(li, "l_suppkey", keys).to_pandas()
    # semi side: bloom ⊇ exact, surplus bounded by fp_rate
    assert len(bloom) >= len(exact)
    assert set(map(tuple, exact.values.tolist())) <= set(
        map(tuple, bloom.values.tolist())
    )
    assert len(bloom) - len(exact) <= 0.03 * len(li.to_pandas())


def test_hashing_vectorizer_feeds_knn():
    from cpg_ray.functions.similarity import knn_bruteforce
    from cpg_ray.functions.text import hashing_vectorizer

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[
        ["doc_id", "text"]
    ].head(120)
    vec = hashing_vectorizer(docs)
    assert all(len(v) == 64 for v in vec.embedding)
    norms = [np.linalg.norm(v) for v in vec.embedding]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)

    # doc 0's planted near-dups (50 and 82 in this corpus) must be its
    # nearest non-self neighbours with near-1 cosine
    ds = rd.from_pandas(vec.rename(columns={"doc_id": "vec_id"}))
    q = np.asarray([vec.embedding.iloc[0]])
    top = knn_bruteforce(ds, q, k=3)
    assert top.vec_id.iloc[0] == 0
    assert set(top.vec_id.iloc[1:3]) == {50, 82}
    assert (top.cosine.iloc[1:3] > 0.9).all()
