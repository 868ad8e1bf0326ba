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


def kmeans_quantized(ds, k: int = 8, rounds: int = 4, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_scale: int = 1024, emit_coords: bool = False):
    """Fully DISTRIBUTED Lloyd's k-means over an embedding column, with
    every arithmetic step chosen to be bit-identical to a SQL engine
    (the generated unrolled-round oracle in ``__ray_entry__``):

    - coordinates quantized ``x_q = floor(x * q_scale)`` — float32 →
      float64 is exact, scaling by a power of two is exact, floor is
      deterministic, so both engines hold identical int64 coordinates;
    - centroids kept as exact integer sums ``(S_j, n_j)`` per cluster —
      integer sums are order-free, so the distributed partial-sum merge
      and SQL's GROUP BY SUM agree exactly;
    - assignment compares ``dist_j = A_j / n_j²`` where
      ``A_j = Σ_i (n_j·x_i − S_ji)²`` is the EXACT int64 squared
      distance to the exact *rational* mean ``S_j/n_j`` scaled by
      ``n_j²`` — one IEEE division per candidate, ties broken by the
      lowest cluster id (numpy first-hit ``argmin`` over candidates
      sorted ascending = SQL ``ORDER BY dist, cluster``);
    - init: ``cluster = vec_id % k`` (deterministic, SQL-trivial).

    Scale shape: the dataset is materialized ONCE; each round is one
    streaming ``map_batches`` pass with the centroid table broadcast
    via ``ray.put`` (K×(D+2) ints) and each batch emitting a ≤K-row
    partial-sum frame — nothing shuffles, nothing per-row reaches the
    driver.  Exactness bound: ``A_j ≤ D·4·n_j²·max|x_q|²`` must stay
    below 2^63 — at D=64, q_scale=1024, unit-norm-ish coordinates that
    is ~350k points per cluster; the guard raises
    :class:`~cpg_ray.functions.relational.GuardExceeded` past it
    (lower ``q_scale``, or use the non-oracle float path
    :func:`build_ivf_centroids` — sampled init + double means — as the
    billion-row route).

    Returns ``(assignment_ds, history)``: a Dataset of
    ``(id_col, cluster:int64)`` after ``rounds`` reassignments, and one
    ``{"round", "sizes", "inertia"}`` dict per round, where inertia is
    Σ dist of that round's assignment against the centroids it was
    measured against (exact integer numerators, one division per
    cluster) — monotonically non-increasing, the Lloyd's invariant the
    tests pin.

    Reference seam: the reference's TypeResolver groups equivalent
    types by iterated refinement (round-based recluster until stable);
    this is the embedding-space analog used for corpus bucketing /
    IVF-style routing in the LLM-data pipeline.
    """
    import ray

    from .relational import GuardExceeded, bcast_get

    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")

    def _quantize(batch: pd.DataFrame):
        x = np.floor(
            _as_matrix(batch[vec_col]) * float(q_scale)).astype(np.int64)
        return batch[id_col].values.astype(np.int64), x

    def _assign(x, cids, n, s) -> np.ndarray:
        dist = np.empty((x.shape[0], len(cids)), dtype=np.float64)
        for j in range(len(cids)):
            diff = x * n[j] - s[j]                      # int64, exact
            a = np.einsum("bd,bd->b", diff, diff)       # int64, exact
            dist[:, j] = a.astype(np.float64) / float(int(n[j]) ** 2)
        return cids[np.argmin(dist, axis=1)]

    def _partials(x, assign, a_num=None) -> pd.DataFrame:
        """≤K-row combiner frame for one batch: exact int sums per
        assigned cluster (+ the per-cluster distance numerator when the
        assignment came from real centroids)."""
        cids, idx = np.unique(assign, return_inverse=True)
        n = np.bincount(idx, minlength=len(cids)).astype(np.int64)
        s = np.zeros((len(cids), x.shape[1]), dtype=np.int64)
        np.add.at(s, idx, x)
        out = pd.DataFrame({
            "cluster": cids.astype(np.int64),
            "n": n,
            "s": [row for row in s],
            "mx": np.int64(np.max(np.abs(x))) if len(x) else np.int64(0),
        })
        if a_num is not None:
            sums = np.zeros(len(cids), dtype=np.int64)
            np.add.at(sums, idx, a_num)
            out["a_num"] = sums
        return out

    def _merge(parts: pd.DataFrame):
        g = parts.groupby("cluster", sort=True)
        cids = np.asarray(sorted(g.groups), dtype=np.int64)
        n = g["n"].sum().values.astype(np.int64)
        s = np.stack([np.sum(np.stack(rows.values), axis=0)
                      for _, rows in g["s"]]).astype(np.int64)
        return cids, n, s, int(parts["mx"].max())

    ds = ds.materialize()

    def init_partials(batch: pd.DataFrame) -> pd.DataFrame:
        ids, x = _quantize(batch)
        return _partials(x, (ids % k).astype(np.int64))

    parts = ds.map_batches(init_partials, batch_format="pandas").to_pandas()
    cids, n, s, mx = _merge(parts)
    dim = s.shape[1]
    history: list[dict] = []
    ref = None

    for r in range(1, rounds + 1):
        if 4.0 * dim * float(n.max()) ** 2 * float(mx) ** 2 >= 2.0**63:
            raise GuardExceeded(
                f"kmeans_quantized exactness bound exceeded at round {r}: "
                f"max cluster size {int(n.max())} × max|x_q| {mx} at D={dim}"
                " overflows int64 — lower q_scale or use the float path")
        ref = ray.put((cids, n, s))

        def round_partials(batch: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c_l, n_l, s_l = bcast_get(_ref)
            ids, x = _quantize(batch)
            assign = _assign(x, c_l, n_l, s_l)
            # exact per-row distance numerator vs the ASSIGNING centroid
            pos = np.searchsorted(c_l, assign)
            diff = x * n_l[pos][:, None] - s_l[pos]
            a_num = np.einsum("bd,bd->b", diff, diff)
            return _partials(x, assign, a_num)

        parts = ds.map_batches(
            round_partials, batch_format="pandas").to_pandas()
        g = parts.groupby("cluster", sort=True)
        a_tot = g["a_num"].sum()
        old_pos = {int(c): int(np.searchsorted(cids, c)) for c in g.groups}
        inertia = float(sum(
            float(int(a_tot[c])) / float(int(n[old_pos[c]]) ** 2)
            for c in g.groups))
        new_cids, new_n, new_s, new_mx = _merge(
            parts[["cluster", "n", "s", "mx"]])
        history.append({
            "round": r,
            "sizes": dict(zip(new_cids.tolist(),
                              new_n.astype(int).tolist())),
            "inertia": inertia,
        })
        cids, n, s, mx = new_cids, new_n, new_s, max(mx, new_mx)

    def assign_rows(batch: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        c_l, n_l, s_l = bcast_get(_ref)
        ids, x = _quantize(batch)
        out = pd.DataFrame({
            id_col: ids,
            "cluster": _assign(x, c_l, n_l, s_l).astype(np.int64),
        })
        if emit_coords:
            # downstream consumers (sem_dedup) need the SAME quantized
            # coordinates the assignment saw — re-quantizing later from
            # floats would be exact too, but carrying them through keeps
            # the contract in one place
            out["xq"] = [row for row in x]
            out["nrm"] = np.einsum("bd,bd->b", x, x)
        return out

    return ds.map_batches(assign_rows, batch_format="pandas"), history


def sem_dedup(ds, *, k: int = 8, rounds: int = 4,
              id_col: str = "vec_id", vec_col: str = "embedding",
              q_scale: int = 1024, tau: tuple[int, int] = (2, 5),
              max_cluster_rows: int = 200_000, block_rows: int = 1024):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication", public
    arXiv:2303.09540): cluster the embedding space with k-means, then
    flag semantic duplicates ONLY within each cluster — a row is a
    duplicate iff an earlier row (smaller ``id_col``) in the SAME
    cluster has cosine similarity ≥ τ, so keep = ¬is_dup retains
    exactly one representative (the min id) per duplicate set.

    Exactness: clustering is :func:`kmeans_quantized` (integer-exact,
    SQL-oracle-paired); the cosine test runs on the SAME quantized
    int64 coordinates with τ = num/den held as a rational, so

        cos(a, b) ≥ τ   ⇔   dot > 0  ∧  den²·dot² ≥ num²·‖a‖²·‖b‖²

    is pure int64 arithmetic — bit-identical to the generated SQL
    oracle, no float hash risk.  Bound: den²·(D·mx²)² and
    num²·nrm_max² must stay below 2^63 (checked per cluster, raises
    :class:`~cpg_ray.functions.relational.GuardExceeded`).

    Scale shape: one extra exchange beyond k-means — assignments are
    hash-partitioned by cluster and each cluster is flagged
    group-locally with CHUNKED int64 matmuls (``block_rows`` × m per
    step, never m × m materialized).  The per-cluster work is O(m²·D),
    which is the SemDeDup design point: k must grow with the corpus
    (the paper uses k ≈ n / 10⁴) so m stays bounded;
    ``max_cluster_rows`` raises GuardExceeded past the declared cap
    rather than silently thrashing.

    Reference seam: the reference dedups structurally-equal nodes per
    translation unit then across units (canonicalization); this is the
    embedding-space analog an LLM-data pipeline runs before training.

    Returns a Dataset of ``(id_col, cluster, is_dup)``.
    """
    from .relational import GuardExceeded

    num, den = tau
    if not (0 < num <= den):
        raise ValueError("tau must be a rational in (0, 1] as (num, den)")
    num2, den2 = num * num, den * den

    assign, _hist = kmeans_quantized(
        ds, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col,
        q_scale=q_scale, emit_coords=True)

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
                "is_dup": pd.Series(dtype=bool)})
        m = len(g)
        if m > max_cluster_rows:
            raise GuardExceeded(
                f"sem_dedup cluster of {m} rows exceeds max_cluster_rows="
                f"{max_cluster_rows} — raise k (SemDeDup scales k with the"
                " corpus) or the cap")
        g = g.sort_values(id_col, kind="mergesort")
        x = np.stack(g["xq"].to_numpy()).astype(np.int64)
        nrm = g["nrm"].to_numpy().astype(np.int64)
        mx = int(np.max(np.abs(x))) if m else 0
        dot_max = float(x.shape[1]) * float(mx) ** 2
        if (den2 * dot_max ** 2 >= 2.0 ** 63
                or num2 * float(nrm.max()) ** 2 >= 2.0 ** 63):
            raise GuardExceeded(
                "sem_dedup exactness bound exceeded: den²·dot² or "
                "num²·nrm² overflows int64 — lower q_scale")
        is_dup = np.zeros(m, dtype=bool)
        cols = np.arange(m, dtype=np.int64)
        for a in range(0, m, block_rows):
            b = min(a + block_rows, m)
            d = x[a:b] @ x.T                            # int64, exact
            cond = (d > 0) & (den2 * d * d >= num2 * nrm[a:b, None] * nrm)
            cond &= cols[None, :] < np.arange(a, b, dtype=np.int64)[:, None]
            is_dup[a:b] = cond.any(axis=1)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "cluster": g["cluster"].to_numpy().astype(np.int64),
            "is_dup": is_dup})

    return assign.groupby("cluster").map_groups(flag, batch_format="pandas")


def train_pq_codebooks(ds, *, m: int = 4, ks: int = 16, rounds: int = 5,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       sample_mod: int = 7, sample_cap: int = 100_000):
    """Product-quantization codebooks (Jégou et al. 2011): split D dims
    into ``m`` subspaces and train an independent ``ks``-centroid
    Lloyd's codebook per subspace on a DETERMINISTIC id-hash sample
    (``vec_id % sample_mod == 0``, capped — training needs a sketch of
    the distribution, not the corpus).  Vectors are L2-normalized
    before training so PQ inner products approximate cosine.  Returns
    an (m, ks, D/m) float64 array; init is the first ``ks`` sample
    rows by vec_id (deterministic), empty clusters keep their previous
    centroid."""
    sample = []
    n = 0
    for b in ds.iter_batches(batch_format="pandas", batch_size=None):
        sel = b[b[id_col] % sample_mod == 0]
        if len(sel):
            sample.append(sel[[id_col, vec_col]])
            n += len(sel)
        if n >= sample_cap:
            break
    if not sample:
        raise ValueError("train_pq_codebooks: empty sample")
    sdf = (pd.concat(sample, ignore_index=True)
           .sort_values(id_col).head(sample_cap))
    x = _as_matrix(sdf[vec_col])
    x = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dims {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, ks, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        c = xs[:ks].copy()
        if len(xs) < ks:
            c = np.resize(c, (ks, sub))
        for _ in range(rounds):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for cid in range(ks):
                pts = xs[a == cid]
                if len(pts):
                    c[cid] = pts.mean(axis=0)
        books[j] = c
    return books


def knn_pq(ds, query_vecs: np.ndarray, k: int = 10, *,
           id_col: str = "vec_id", vec_col: str = "embedding",
           m: int = 4, ks: int = 16, refine: int = 4,
           codebooks: np.ndarray | None = None):
    """Product-quantization ADC search — the MEMORY-compression scale
    path beside knn_ivf (routing) and knn_lsh (bucketing): each
    normalized corpus vector is encoded as ``m`` uint8 centroid codes
    (D floats → m bytes, e.g. 64×8B → 4B, 128× smaller resident
    index), and each query scores a vector as the sum of ``m``
    query-subvector · centroid dot products read from a per-query
    lookup table (asymmetric distance computation — the query side
    stays exact).

    Per batch: encode, ADC-score against the broadcast codebooks, keep
    the top ``refine·k`` candidates per query, then re-rank those few
    EXACTLY with the batch's own still-resident vectors; a tiny global
    top-k merge finishes.  At 100 TB the codes table is what you'd
    materialize and scan (the encode pass writes it once); nothing
    here holds more than a batch of raw vectors at a time.

    Returns ``(df, n_candidates)`` like knn_ivf: exact-cosine-ranked
    (query_id, vec_id, cosine, rank) plus the candidate volume the ADC
    prune admitted (the recall/efficiency dial: higher ``refine`` =
    more exact work = higher recall)."""
    import ray

    if codebooks is None:
        codebooks = train_pq_codebooks(ds, m=m, ks=ks,
                                       vec_col=vec_col, id_col=id_col)
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
    d = qn.shape[1]
    sub = d // m
    # per-query ADC tables: (Q, m, ks)
    tables = np.einsum(
        "qjs,jks->qjk", qn.reshape(len(qn), m, sub), codebooks)
    ref = ray.put((codebooks, tables, qn))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        books, tabs, qm = bcast_get(ref)
        v = _as_matrix(batch[vec_col])
        vn = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
        bsz = len(vn)
        codes = np.empty((bsz, m), dtype=np.int64)
        for j in range(m):
            xs = vn[:, j * sub:(j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        ids = batch[id_col].values
        cand = min(refine * k, bsz)
        out = []
        for qi in range(tabs.shape[0]):
            adc = tabs[qi][np.arange(m)[None, :], codes].sum(axis=1)
            idx = np.argpartition(-adc, cand - 1)[:cand]
            out.append(pd.DataFrame({"query_id": qi, id_col: ids[idx],
                                     "cosine": vn[idx] @ qm[qi]}))
        return pd.concat(out, ignore_index=True)

    cands = ds.map_batches(local, batch_format="pandas").to_pandas()
    n_candidates = len(cands)
    cands = cands.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True])
    topk = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount()
    return topk, n_candidates


def knn_exact_quantized(ds, query_ids: list, k: int = 10, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        q_scale: int = 1024):
    """EXACT cosine top-k with cross-engine bit-identical scores — the
    oracle-paired member of the kNN family (knn_bruteforce keeps the
    float-BLAS fast path; this one trades a few % of speed for
    hash-verifiability): coordinates quantize ``floor(x·1024)`` to
    int64 (exact), dot products and squared norms are exact integer
    sums (order-free), and the score is computed with exactly ONE
    IEEE multiply, ONE sqrt and ONE divide —
    ``dot / sqrt(double(na)·double(nb))`` — so numpy and any SQL
    engine agree to the last bit (the kmeans/adamic-adar float
    discipline).  Queries are corpus rows named by id (broadcast after
    one small filtered read); zero-norm rows are excluded on both
    sides.  Per batch: integer matmul + per-query top-k candidates;
    tiny global merge, ties broken by ascending id."""
    import ray

    _qset = set(query_ids)
    qdf = (ds.map_batches(
        # batch mask (Dataset.filter's row lambda rebuilt the set per
        # ROW on top of the per-row call cost)
        lambda b: b[b[id_col].isin(_qset)], batch_format="pandas")
        .to_pandas().sort_values(id_col))
    if len(qdf) != len(query_ids):
        raise ValueError("some query ids missing from the corpus")
    qm = np.floor(_as_matrix(qdf[vec_col]) * float(q_scale)).astype(np.int64)
    qids = qdf[id_col].to_numpy(np.int64)
    qn = (qm * qm).sum(axis=1)  # exact int squared norms
    if (qn == 0).any():
        raise ValueError("zero-norm query vector")
    ref = ray.put((qids, qm, qn))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        ids_, qmat, qnorm = bcast_get(ref)
        v = np.floor(
            _as_matrix(batch[vec_col]) * float(q_scale)).astype(np.int64)
        nb = (v * v).sum(axis=1)
        keep = nb > 0
        v, nb = v[keep], nb[keep]
        ids = batch[id_col].values[keep]
        if not len(ids):
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        dot = v @ qmat.T  # (B, Q) exact int64
        out = []
        for qi in range(len(ids_)):
            score = dot[:, qi].astype(np.float64) / np.sqrt(
                np.float64(qnorm[qi]) * nb.astype(np.float64))
            kk = min(k, len(ids))
            idx = np.argpartition(-score, kk - 1)[:kk]
            out.append(pd.DataFrame({"qid": np.int64(ids_[qi]),
                                     id_col: ids[idx],
                                     "score": score[idx]}))
        return pd.concat(out, ignore_index=True)

    cands = ds.map_batches(local, batch_format="pandas").to_pandas()
    cands = cands.sort_values(["qid", "score", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
    topk = cands.groupby("qid", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("qid").cumcount() + 1
    return topk


def hard_negatives(ds, anchor_ids: list, k: int = 10, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label", q_scale: int = 1024):
    """Hard-negative mining for contrastive/embedding training
    (public: e.g. DPR, Karpukhin et al. 2020 §4.2 — the negatives
    that matter are the most-similar OTHER-CLASS examples): for each
    anchor, the top-k highest-cosine vectors whose label DIFFERS from
    the anchor's.  Same cross-engine exactness contract as
    :func:`knn_exact_quantized` (int64 quantized dots/norms, one IEEE
    multiply+sqrt+divide), so the mined negative sets hash-match SQL.

    Scale shape: anchors broadcast once via ``ray.put``; one corpus
    pass computes the (batch × anchors) integer matmul, masks
    same-label/self rows, keeps the local top-k per anchor; driver
    merge over k × anchors × batches candidate rows."""
    import ray

    _aset = set(anchor_ids)
    qdf = (ds.map_batches(
        lambda b: b[b[id_col].isin(_aset)], batch_format="pandas")
        .to_pandas().sort_values(id_col))
    if len(qdf) != len(anchor_ids):
        raise ValueError("some anchor ids missing from the corpus")
    qm = np.floor(_as_matrix(qdf[vec_col]) * float(q_scale)).astype(np.int64)
    qids = qdf[id_col].to_numpy(np.int64)
    qlabels = qdf[label_col].to_numpy(np.int64)
    qn = (qm * qm).sum(axis=1)
    if (qn == 0).any():
        raise ValueError("zero-norm anchor vector")
    ref = ray.put((qids, qlabels, qm, qn))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        ids_, labels_, qmat, qnorm = bcast_get(ref)
        v = np.floor(
            _as_matrix(batch[vec_col]) * float(q_scale)).astype(np.int64)
        nb = (v * v).sum(axis=1)
        keep = nb > 0
        v, nb = v[keep], nb[keep]
        ids = batch[id_col].values[keep]
        labels = batch[label_col].values[keep]
        empty = pd.DataFrame({"anchor_id": pd.Series([], dtype="int64"),
                              id_col: pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
        if not len(ids):
            return empty
        dot = v @ qmat.T
        out = []
        for qi in range(len(ids_)):
            neg = labels != labels_[qi]
            if not neg.any():
                continue
            score = dot[neg, qi].astype(np.float64) / np.sqrt(
                np.float64(qnorm[qi]) * nb[neg].astype(np.float64))
            nids = ids[neg]
            kk = min(k, len(nids))
            idx = np.argpartition(-score, kk - 1)[:kk]
            out.append(pd.DataFrame({"anchor_id": np.int64(ids_[qi]),
                                     id_col: nids[idx],
                                     "score": score[idx]}))
        return pd.concat(out, ignore_index=True) if out else empty

    cands = ds.map_batches(local, batch_format="pandas").to_pandas()
    cands = cands.sort_values(["anchor_id", "score", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
    topk = cands.groupby("anchor_id", sort=True).head(k).reset_index(
        drop=True)
    topk["rank"] = topk.groupby("anchor_id").cumcount() + 1
    return topk


def random_projection(ds, *, k: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      quant_shift: int = 20):
    """Johnson-Lindenstrauss random projection (Achlioptas 2001,
    "Database-friendly random projections", public) with EXACT integer
    arithmetic: inputs quantize as q_i = floor(x_i·2^quant_shift)
    (IEEE-exact for float32 inputs), the projection matrix is the
    deterministic ±1 sign matrix

        s(i, j) = +1  if the top-32-bit md5("i|j") hex is even
                  −1  otherwise

    (Achlioptas's ±1 Rademacher variant — JL guarantees hold with the
    same constants as Gaussian entries), and each output coordinate is
    the int64 sum  y_j = Σ_i q_i · s(i, j)  — no floats anywhere after
    quantization, so the SQL twin (unnest + md5-sign join + group-sum)
    is bit-identical.  Distances shrink by the common factor
    2^quant_shift/√k, preserved in expectation per JL.

    Shape: the (D × k) sign matrix is built ONCE driver-side (D·k md5
    calls — 64×16 here, microseconds) and broadcast; the projection is
    one numpy matmul per batch, no shuffle, output is O(rows × k)
    long-format (id, j, y) rows for the oracle's group-by.

    Returns a Dataset of ``(id_col, j int64, y int64)``.
    """
    import hashlib

    import ray

    def sign_matrix(d: int) -> np.ndarray:
        s = np.empty((d, k), dtype=np.int64)
        for i in range(d):
            for j in range(k):
                h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8]
                s[i, j] = 1 if int(h, 16) % 2 == 0 else -1
        return s

    # D is static for a given table — probe one row, build the sign
    # matrix once, broadcast
    first = ds.take(1)
    d = len(first[0][vec_col]) if first else 0
    sref = ray.put(sign_matrix(d) if d else np.zeros((0, k), np.int64))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64")})
        s = bcast_get(sref)
        mat = np.stack(b[vec_col].to_numpy())
        q = np.floor(mat.astype(np.float64)
                     * (1 << quant_shift)).astype(np.int64)
        y = q @ s  # (B, k) int64 exact
        n = len(b)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy().repeat(k),
            "j": np.tile(np.arange(k, dtype=np.int64), n),
            "y": y.ravel(),
        })

    return ds.map_batches(project, batch_format="pandas")


def pca_top_component(ds, *, vec_col: str = "embedding",
                      iters: int = 10, scale: int = 10 ** 6,
                      quant_shift: int = 10):
    """Top principal component (uncentered PCA / top right-singular
    vector) by EXACT-INTEGER power iteration on the distributed Gram
    matrix:

    1. quantize  q_i = floor(x_i · 2^quant_shift)  (true floor — both
       numpy and SQL ``floor()`` floor negative floats);
    2. Gram      C[a,b] = Σ_rows q_a · q_b  — per-batch QᵀQ partials
       (one (D×D) int64 matmul per batch, long-format (a, b, v) rows),
       ONE pre-combined groupby exchange, never a row-wise self-join;
    3. rescale   Cs = tdiv(C, max(maxabs(C) // 2^32, 1)) so the
       iteration's products stay inside int64;
    4. iterate   raw = Cs @ v;  v' = tdiv(raw, max(maxabs(raw) //
       scale, 1)) — max-norm, like eigenvector_centrality but on a
       dense D×D driver-side matrix (D ≈ 64; the DATA pass is the
       distributed part, the D² iteration is microseconds);
    5. sign      the max-|loading| coordinate (ties → lowest dim) is
       made positive — eigenvectors are sign-ambiguous.

    tdiv is TRUNCATING division (sign(a)·(|a|//d)) — matching DuckDB's
    ``//`` on negatives (DuckDB truncates, numpy floors; mixing them
    diverges on any negative intermediate), so the SQL twin is
    bit-identical.  C is PSD ⇒ power iteration converges without the
    bipartite shift.  int64 budget: |Cs| ≤ 2^32, |v| < 2·scale,
    D = 64 ⇒ |raw| ≤ 64·2^32·2·10^6 ≈ 5.5×10^17 < 2^63.

    Returns a pandas DataFrame of ``(j int64, loading int64)``, one
    row per input dimension, sorted by j.
    """
    from .relational import groupby_agg

    def tdiv(a: np.ndarray, d: int) -> np.ndarray:
        return np.sign(a) * (np.abs(a) // d)

    def gram_partials(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        mat = np.stack(b[vec_col].to_numpy())
        q = np.floor(mat.astype(np.float64)
                     * (1 << quant_shift)).astype(np.int64)
        c = q.T @ q  # (D, D) int64 exact
        d = c.shape[0]
        return pd.DataFrame({
            "a": np.repeat(np.arange(d, dtype=np.int64), d),
            "b": np.tile(np.arange(d, dtype=np.int64), d),
            "v": c.ravel(),
        })

    cdf = groupby_agg(
        ds.map_batches(gram_partials, batch_format="pandas"),
        ["a", "b"], [("v", "sum", "v")]).to_pandas()
    if not len(cdf):
        return pd.DataFrame({"j": pd.Series([], dtype="int64"),
                             "loading": pd.Series([], dtype="int64")})
    d = int(cdf["a"].max()) + 1
    c = np.zeros((d, d), dtype=np.int64)
    c[cdf["a"].to_numpy(), cdf["b"].to_numpy()] = \
        cdf["v"].to_numpy("int64")
    div = max(int(np.abs(c).max()) // (1 << 32), 1)
    cs = tdiv(c, div)
    v = np.full(d, scale, dtype=np.int64)
    for _ in range(iters):
        raw = cs @ v
        m = max(int(np.abs(raw).max()) // scale, 1)
        v = tdiv(raw, m)
    jstar = int(np.lexsort((np.arange(d), -np.abs(v)))[0])
    if v[jstar] < 0:
        v = -v
    return pd.DataFrame({"j": np.arange(d, dtype=np.int64),
                         "loading": v.astype("int64")})
