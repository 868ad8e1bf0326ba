"""Similarity search over an embedding column (list<float>).

- :func:`knn_bruteforce` — exact cosine top-k: one numpy matmul per
  batch against a broadcast query matrix (the baseline; fully
  distributed, no shuffle), then a tiny global top-k merge.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH buckets on
  both corpus and queries; candidates = corpus vectors sharing a bucket
  with a query under any of R repetitions; exact cosine re-rank of
  candidates only.  Recall is tunable via (n_planes, R).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import bcast_get


def _as_matrix(series) -> np.ndarray:
    return np.stack(series.values).astype(np.float64)


def knn_bruteforce(ds, query_vecs: np.ndarray, k: int = 10,
                   *, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Returns a pandas DataFrame (query_id, vec_id, cosine, rank) of
    the exact top-k per query.  query_vecs: (Q, D)."""
    import ray

    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
    ref = ray.put(qn)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = bcast_get(ref)  # (Q, D)
        v = _as_matrix(batch[vec_col])
        vn = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
        sim = vn @ qm.T  # (B, Q)
        ids = batch[id_col].values
        kk = min(k, len(ids))
        out = []
        for qi in range(qm.shape[0]):
            idx = np.argpartition(-sim[:, qi], kk - 1)[:kk]
            out.append(
                pd.DataFrame(
                    {"query_id": qi, id_col: ids[idx], "cosine": sim[idx, qi]}
                )
            )
        return pd.concat(out, ignore_index=True)

    local = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    # global merge: tiny (Q × k × num_batches)
    local = local.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    top = local.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount()
    return top


def build_ivf_centroids(ds, n_clusters: int = 16, *, vec_col: str = "embedding",
                        sample_n: int = 2048, iters: int = 8, seed: int = 31
                        ) -> np.ndarray:
    """Deterministic mini k-means over a driver-side sample → (C, D)
    centroid matrix.  The sample bounds driver memory; at corpus scale
    the assignment step stays fully distributed (centroids broadcast)."""
    sample = ds.limit(sample_n).to_pandas()
    v = _as_matrix(sample[vec_col])
    v = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.RandomState(seed)
    cent = v[rng.choice(len(v), size=min(n_clusters, len(v)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(v @ cent.T, axis=1)
        for c in range(len(cent)):
            members = v[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / np.linalg.norm(m).clip(min=1e-12)
    return cent


def knn_ivf(ds, query_vecs: np.ndarray, k: int = 10, *,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_clusters: int = 16, nprobe: int = 4, seed: int = 31):
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    centroid (one matmul per batch against the broadcast centroid
    matrix); each query probes only its ``nprobe`` nearest clusters and
    exact-reranks the members.  Returns (result_df, n_candidates)."""
    import ray

    cent = build_ivf_centroids(ds, n_clusters, vec_col=vec_col, seed=seed)
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
    # per query: the set of probed cluster ids
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((cent, q_probe, qn))

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        cent_l, q_probe_l, qm = bcast_get(ref)
        v = _as_matrix(batch[vec_col])
        vn = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
        assign = np.argmax(vn @ cent_l.T, axis=1)  # (B,)
        ids = batch[id_col].values
        out = []
        for qi in range(qm.shape[0]):
            sel = np.flatnonzero(np.isin(assign, q_probe_l[qi]))
            if not len(sel):
                continue
            sim = vn[sel] @ qm[qi]
            # local top-k INSIDE the batch: rows reaching the driver are
            # bounded by Q×k×num_batches, never a corpus fraction
            # (nprobe/n_clusters of the whole corpus otherwise — the
            # knn_bruteforce argpartition pattern)
            kk = min(k, len(sel))
            loc = np.argpartition(-sim, kk - 1)[:kk]
            df = pd.DataFrame(
                {"query_id": qi, id_col: ids[sel[loc]], "cosine": sim[loc]}
            )
            df["n_seen"] = np.nan
            df.iloc[0, df.columns.get_loc("n_seen")] = float(len(sel))
            out.append(df)
        if not out:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "cosine": [], "n_seen": []}
            )
        return pd.concat(out, ignore_index=True)

    cand = ds.map_batches(candidates, batch_format="pandas").to_pandas()
    n_candidates = int(cand["n_seen"].dropna().sum()) if len(cand) else 0
    cand = cand.drop(columns="n_seen").sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount()
    return top, n_candidates


def knn_lsh(ds, query_vecs: np.ndarray, k: int = 10, *,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_planes: int = 8, reps: int = 4, seed: int = 23):
    """Approximate top-k: LSH-bucket candidate generation + exact
    re-rank.  Returns (result_df, n_candidates) so callers can report
    the candidate-set reduction vs brute force."""
    import ray

    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
    dim = q.shape[1]
    planes = [
        np.random.RandomState(seed + r).randn(dim, n_planes) for r in range(reps)
    ]
    q_buckets = [
        ((qn @ p) > 0).dot(1 << np.arange(n_planes)).astype(np.int64) for p in planes
    ]
    ref = ray.put((planes, q_buckets, qn))

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        planes_l, q_buckets_l, qm = bcast_get(ref)
        v = _as_matrix(batch[vec_col])
        vn = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
        ids = batch[id_col].values
        hit = np.zeros((len(ids), qm.shape[0]), dtype=bool)
        for p, qb in zip(planes_l, q_buckets_l):
            vb = ((vn @ p) > 0).dot(1 << np.arange(p.shape[1])).astype(np.int64)
            hit |= vb[:, None] == qb[None, :]
        out = []
        for qi in range(qm.shape[0]):
            sel = np.flatnonzero(hit[:, qi])
            if not len(sel):
                continue
            sim = vn[sel] @ qm[qi]
            # local top-k per batch — same driver-bound as knn_ivf
            kk = min(k, len(sel))
            loc = np.argpartition(-sim, kk - 1)[:kk]
            df = pd.DataFrame(
                {"query_id": qi, id_col: ids[sel[loc]], "cosine": sim[loc]}
            )
            df["n_seen"] = np.nan
            df.iloc[0, df.columns.get_loc("n_seen")] = float(len(sel))
            out.append(df)
        if not out:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "cosine": [], "n_seen": []}
            )
        return pd.concat(out, ignore_index=True)

    cand = ds.map_batches(candidates, batch_format="pandas").to_pandas()
    n_candidates = int(cand["n_seen"].dropna().sum()) if len(cand) else 0
    cand = cand.drop(columns="n_seen").sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount()
    return top, n_candidates
