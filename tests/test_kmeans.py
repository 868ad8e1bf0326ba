"""Distributed integer-exact k-means (similarity.kmeans_quantized):
bit-identical to the generated SQL oracle, Lloyd's monotone-inertia
invariant, label recovery on the synthetic clustered embeddings, and
the int64-exactness guard."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _embeddings_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_kmeans_matches_generated_oracle_other_params():
    """Exact assignment match vs DuckDB at NON-default (k, rounds,
    q_scale) — pins the generator, not just the registered instance."""
    from cpg_ray.functions.similarity import kmeans_quantized
    from cpg_ray.pipelines.queries import _kmeans_oracle_sql

    assign, _ = kmeans_quantized(_embeddings_ds(), k=5, rounds=3,
                                 q_scale=256)
    got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{SF}/embeddings.parquet'")
    want = con.execute(
        _kmeans_oracle_sql(k=5, rounds=3, dim=64, q_scale=256)).df()
    pd.testing.assert_frame_equal(
        got, want.astype({"cluster": "int64"}), check_dtype=False)


def test_kmeans_inertia_monotone_nonincreasing():
    """Lloyd's invariant: each round's inertia (exact integer
    numerators vs the assigning centroids) never increases."""
    from cpg_ray.functions.similarity import kmeans_quantized

    _, hist = kmeans_quantized(_embeddings_ds(), k=8, rounds=5)
    inertias = [h["inertia"] for h in hist]
    assert len(inertias) == 5
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a * (1 + 1e-12)


def test_kmeans_recovers_planted_clusters():
    """On deterministic Gaussian blobs (well separated), the quantized
    distributed k-means recovers the planted partition near-perfectly.
    (The testdata embeddings table is random unit vectors — its label
    column has NO geometric structure, so recovery is pinned on a
    planted corpus instead.)"""
    from cpg_ray.functions.similarity import kmeans_quantized

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 4.0
    X = np.concatenate(
        [centers[i] + 0.3 * rng.randn(120, 16) for i in range(4)])
    y = np.repeat(np.arange(4), 120)
    perm = rng.permutation(len(X))
    X, y = X[perm], y[perm]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    }))
    assign, _ = kmeans_quantized(ds, k=4, rounds=10)
    m = assign.to_pandas().sort_values("vec_id")
    m["label"] = y
    purity = (
        m.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0])
        .sum() / len(m)
    )
    # Lloyd's from the oracle-fixed modular init is a LOCAL optimum:
    # with 4 planted blobs it may merge two (observed 0.75 = 3 exact
    # clusters + 1 merged pair); chance is 0.25.
    assert purity >= 0.7, purity


def test_kmeans_two_blobs_recovered_exactly():
    """k=2 on two well-separated planted blobs: the modular init's
    near-identical centroids still split along the blob axis and
    converge to the exact planted partition."""
    from cpg_ray.functions.similarity import kmeans_quantized

    rng = np.random.RandomState(7)
    centers = rng.randn(2, 16) * 4.0
    X = np.concatenate(
        [centers[i] + 0.3 * rng.randn(100, 16) for i in range(2)])
    y = np.repeat(np.arange(2), 100)
    perm = rng.permutation(len(X))
    X, y = X[perm], y[perm]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    }))
    assign, _ = kmeans_quantized(ds, k=2, rounds=10)
    m = assign.to_pandas().sort_values("vec_id")
    m["label"] = y
    purity = (
        m.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0])
        .sum() / len(m)
    )
    assert purity == 1.0, purity


def test_kmeans_exactness_guard_raises():
    """An absurd q_scale overflows the int64 bound → GuardExceeded with
    an actionable message, never a silently-wrong wrapped product."""
    from cpg_ray.functions.relational import GuardExceeded
    from cpg_ray.functions.similarity import kmeans_quantized

    with pytest.raises(GuardExceeded, match="q_scale"):
        kmeans_quantized(_embeddings_ds(), k=4, rounds=2, q_scale=2**40)


def test_kmeans_validates_params():
    from cpg_ray.functions.similarity import kmeans_quantized

    with pytest.raises(ValueError):
        kmeans_quantized(_embeddings_ds(), k=0)
    with pytest.raises(ValueError):
        kmeans_quantized(_embeddings_ds(), k=2, rounds=0)


def test_sem_dedup_matches_local_bruteforce():
    """SemDeDup flags exactly the rows with an earlier same-cluster
    neighbor at cosine >= tau — verified against a local quantized
    brute-force recomputation (independent of the SQL oracle)."""
    from cpg_ray.functions.similarity import kmeans_quantized, sem_dedup

    got = (sem_dedup(_embeddings_ds(), k=5, rounds=2, q_scale=256,
                     tau=(2, 5), block_rows=7)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    assign, _ = kmeans_quantized(_embeddings_ds(), k=5, rounds=2,
                                 q_scale=256)
    amap = dict(zip(*assign.to_pandas()[["vec_id", "cluster"]]
                    .T.values.tolist()))
    raw = rd.read_parquet(f"{SF}/embeddings.parquet").to_pandas()
    raw = raw.sort_values("vec_id").reset_index(drop=True)
    x = np.floor(np.stack(raw["embedding"].values).astype(np.float64)
                 * 256.0).astype(np.int64)
    nrm = np.einsum("bd,bd->b", x, x)
    ids = raw["vec_id"].values
    cl = np.array([amap[i] for i in ids])
    want = np.zeros(len(ids), dtype=bool)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[j] < ids[i] and cl[j] == cl[i]:
                d = int(x[i] @ x[j])
                if d > 0 and 25 * d * d >= 4 * int(nrm[i]) * int(nrm[j]):
                    want[i] = True
                    break
    assert got["vec_id"].tolist() == ids.tolist()
    assert got["is_dup"].tolist() == want.tolist()
    assert 0 < int(want.sum()) < len(ids)  # both branches exercised


def test_sem_dedup_cluster_cap_guard():
    from cpg_ray.functions.relational import GuardExceeded
    from cpg_ray.functions.similarity import sem_dedup

    with pytest.raises((GuardExceeded, Exception)) as ei:
        sem_dedup(_embeddings_ds(), k=1, rounds=1,
                  max_cluster_rows=10).to_pandas()
    assert "max_cluster_rows" in str(ei.value)


def test_sem_dedup_validates_tau():
    from cpg_ray.functions.similarity import sem_dedup

    with pytest.raises(ValueError):
        sem_dedup(_embeddings_ds(), tau=(7, 5))
