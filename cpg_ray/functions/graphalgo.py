"""Whole-graph algorithms over the canonical entity graph: PageRank
and connected components (reference analog: the graph the Neo4j sink
exports for exactly these downstream analyses — Neo4jSink plus the
StatisticsCollectionPass degree views; our engine runs them in place).

Both are defined with EXACT cross-engine semantics so a SQL engine
running the identical unrolled iterations is bit-identical — no float
drift, no rounding policy:

- :func:`pagerank` is FIXED-POINT: scores are int64 in units of
  ``1/scale`` of total mass, every update is integer multiply +
  floor-divide (``(score * 85) // (100 * outdeg)``), and dangling-node
  mass is (deterministically) retired rather than redistributed.  The
  same iteration count on any engine gives the same bytes — a
  reproducibility property worth more at 100 TB than the ~1e-12 mass
  the floor drops, and the whole reason the oracle can hash-match.
- :func:`label_components` is min-LABEL propagation in lexicographic
  entity-id order for a FIXED number of rounds (the oracle-paired
  contract; each round is one bounded shuffle, so cost is explicit and
  the result is exact wherever the component diameter ≤ rounds — the
  returned ``converged`` flag says whether another round would change
  anything).  ``converge=True`` iterates until fixpoint instead
  (pytest-pinned against the union-find ground truth).

Scale shape: mode="driver" streams the DISTINCT edge list to the
driver under a row guard and iterates vectorized numpy (int64 /
int32-code kernels — the O(E) state is the deduped topology, never the
corpus); mode="shuffle" keeps everything a Dataset and runs each
iteration as hash_join + pre-combined groupby (the 100-TB path: K
iterations = K bounded exchanges, materialized between joins per the
chained-join aggregator rule); mode="auto" tries the driver and
degrades on :class:`~cpg_ray.functions.relational.GuardExceeded`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import GuardExceeded

_DEF_EDGE_LIMIT = 5_000_000
# Driver-mode chunk budgets: the edge-count guard bounds EDGES, not
# derived fan-outs, so the wedge expansion (Σ deg²/2 rows; one 1e5-hub
# → ~5e9) and the bitset-BFS gather (E × n/64 words) are chunked to a
# fixed peak regardless of skew.  Module-level so tests can shrink
# them to exercise the multi-chunk path on small fixtures.
_WEDGE_CHUNK = 30_000_000
_BITSET_GATHER_BYTES = 256 << 20


def _edges_to_driver(edges_ds, src: str, dst: str, limit: int) -> pd.DataFrame:
    """Stream the distinct (src, dst) edge list to the driver, guarded.
    Batches dedup LOCALLY as they arrive; the accumulated list only
    compacts globally when its raw length crosses the guard (to test
    the true distinct count) or at the end — the old
    every-batch global dedup re-sorted the whole accumulation per
    batch, a hidden O(batches × total) cost shared by every
    driver-mode graph op.  Memory stays O(locally-distinct rows) with
    the guard as the ceiling, never O(input rows)."""
    parts: list[pd.DataFrame] = []
    total = 0

    def compact() -> pd.DataFrame:
        if not parts:
            return pd.DataFrame({src: pd.Series([], dtype=object),
                                 dst: pd.Series([], dtype=object)})
        merged = (pd.concat(parts, ignore_index=True)
                  if len(parts) > 1 else parts[0]).drop_duplicates()
        parts.clear()
        parts.append(merged)
        return merged

    for b in edges_ds.iter_batches(batch_format="pandas",
                                   batch_size=None):
        b = b[[src, dst]][b[src] != b[dst]].drop_duplicates()
        parts.append(b)
        total += len(b)
        if total > limit:
            total = len(compact())
            if total > limit:
                raise GuardExceeded(
                    f"graphalgo(mode='driver'): > {limit} distinct "
                    "edges; use mode='shuffle'"
                )
    return compact().reset_index(drop=True)


def _index_graph(edges: pd.DataFrame, src: str, dst: str):
    """Lexicographically-sorted node codes (== SQL VARCHAR order for
    the ASCII entity ids) + edge index arrays."""
    nodes = np.unique(np.concatenate([
        edges[src].to_numpy(dtype=object), edges[dst].to_numpy(dtype=object)
    ])) if len(edges) else np.array([], dtype=object)
    src_idx = np.searchsorted(nodes, edges[src].to_numpy(dtype=object))
    dst_idx = np.searchsorted(nodes, edges[dst].to_numpy(dtype=object))
    return nodes, src_idx.astype(np.int64), dst_idx.astype(np.int64)


# ---- PageRank --------------------------------------------------------------


def _pagerank_driver(edges: pd.DataFrame, src: str, dst: str, *,
                     iters: int, scale: int, seeds=None) -> pd.DataFrame:
    nodes, src_idx, dst_idx = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64")})
    outdeg = np.bincount(src_idx, minlength=n).astype(np.int64)
    if seeds is None:
        base_vec = np.full(n, (scale * 15) // (100 * n), dtype=np.int64)
        score = np.full(n, scale // n, dtype=np.int64)
    else:
        m = np.isin(nodes, np.array(sorted(seeds), dtype=object))
        ns = int(m.sum())
        if ns == 0:
            raise ValueError("personalized pagerank: no seed in graph")
        base_vec = np.where(m, (scale * 15) // (100 * ns), 0) \
            .astype(np.int64)
        score = np.where(m, scale // ns, 0).astype(np.int64)
    denom = 100 * outdeg[src_idx]  # per-edge, outdeg ≥ 1 by construction
    for _ in range(iters):
        contrib = (score[src_idx] * 85) // denom
        acc = base_vec.copy()
        np.add.at(acc, dst_idx, contrib)
        score = acc
    out = pd.DataFrame({"entity": nodes, "score": score})
    return out.sort_values(["score", "entity"],
                           ascending=[False, True]).reset_index(drop=True)


def _pagerank_shuffle(edges_ds, src: str, dst: str, *, iters: int,
                      scale: int, seeds=None):
    """Dataset-native iteration: K bounded exchanges.  Scores live as a
    (node, score) Dataset; each round is edges ⋈ scores (hash join on
    src) → per-batch contrib → pre-combined sum by dst → left-join
    onto the node set with the teleport base."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    pairs = edges_ds.map_batches(
        lambda b: b[b[src] != b[dst]].rename(
            columns={src: "__src", dst: "__dst"})[["__src", "__dst"]],
        batch_format="pandas",
    )
    pairs = distinct_on(pairs, ["__src", "__dst"]).materialize()
    outdeg = groupby_agg(pairs, ["__src"], [("__dst", "count", "__deg")])
    ew = hash_join(pairs, outdeg.materialize(), on="__src",
                   empty_safe=True).materialize()
    nodes = distinct_on(
        pairs.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["__src"], b["__dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"],
    ).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "score": pd.Series([], dtype="int64")}))
    if seeds is None:
        def base_of(col):
            return np.int64((scale * 15) // (100 * n))

        def init_of(col):
            return np.full(len(col), scale // n, dtype=np.int64)
    else:
        import ray

        from .relational import bcast_get, semi_anti_filter

        seed_ref = ray.put(frozenset(seeds))
        ns = semi_anti_filter(nodes, "node", frozenset(seeds)).count()
        if ns == 0:
            raise ValueError("personalized pagerank: no seed in graph")

        def base_of(col):
            m = col.isin(bcast_get(seed_ref)).to_numpy()
            return np.where(m, (scale * 15) // (100 * ns), 0) \
                .astype(np.int64)

        def init_of(col):
            m = col.isin(bcast_get(seed_ref)).to_numpy()
            return np.where(m, scale // ns, 0).astype(np.int64)

    scores = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "score": init_of(b["node"])}),
        batch_format="pandas",
    ).materialize()
    for _ in range(iters):
        contrib = hash_join(ew, scores, on="__src", empty_safe=True,
                            right_on="node").map_batches(
            lambda b: pd.DataFrame({
                "__dst": b["__dst"],
                "c": (b["score"].to_numpy(np.int64) * 85)
                // (100 * b["__deg"].to_numpy(np.int64)),
            }),
            batch_format="pandas",
        )
        sums = groupby_agg(contrib, ["__dst"], [("c", "sum", "s")])
        scores = hash_join(
            nodes, sums.materialize(), on="node", right_on="__dst",
            how="left_outer",
        ).map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "score": base_of(b["node"])
                + b["s"].fillna(0).astype(np.int64),
            }),
            batch_format="pandas",
        ).materialize()
    return scores.map_batches(
        lambda b: b.rename(columns={"node": "entity"})[["entity", "score"]],
        batch_format="pandas",
    ).sort(["score", "entity"], descending=[True, False])


def pagerank(edges_ds, *, src: str = "src", dst: str = "dst",
             iters: int = 10, scale: int = 10 ** 12, mode: str = "auto",
             driver_edge_limit: int = _DEF_EDGE_LIMIT, seeds=None):
    """Fixed-point PageRank (damping 0.85 as the exact fraction 85/100)
    over the distinct directed (src, dst) edges, self-loops dropped.
    Returns a Dataset of (entity, score int64) sorted by score desc,
    entity asc; sum of scores ≤ ``scale`` (floor truncation retires
    sub-unit mass — deterministically, identically on every engine).

    ``seeds``: an iterable of node ids makes it PERSONALIZED PageRank —
    all teleport mass (the 15% restart and the initial distribution)
    lands uniformly on the seeds present in the graph instead of the
    whole node set (random walk with restart from the seed set); in
    shuffle mode the seed set is broadcast once and probed per batch.
    Raises ValueError when no seed occurs in the graph."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _pagerank_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, iters=iters, scale=scale, seeds=seeds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _pagerank_shuffle(edges_ds, src, dst, iters=iters, scale=scale,
                             seeds=seeds)


# ---- deterministic random walks ---------------------------------------------


def _walk_hash_frame(b: pd.DataFrame, step: int) -> pd.DataFrame:
    import hashlib

    b = b.copy()
    key = (b["start"].astype(str) + "|" + b["w"].astype(str)
           + f"|{step}|" + b["cur"].astype(str) + "|"
           + b["dst"].astype(str))
    b["__h"] = key.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return b


def random_walks(edges_ds, *, src: str = "src", dst: str = "dst",
                 walks_per_node: int = 2, length: int = 3,
                 mode: str = "auto",
                 driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """DeepWalk-style walk-corpus generation (Perozzi et al. 2014,
    public) with DETERMINISTIC pseudo-random steps: from every node,
    ``walks_per_node`` walks of up to ``length`` steps; at each step
    the walker moves to the out-neighbor minimizing
    md5(start|walk|step|cur|dst) (ties by dst) — a reproducible
    uniform draw any engine replays, the per-walk analog of
    neighbor_sample's hash order.  Walks STOP at sinks (no out-edge).
    Returns (start, w, step, node) rows — step 0 is the start itself.

    Scale shape: each step is one hash join (state ⋈ edges on cur)
    plus the algebraic top-1-per-walk combiner (grouped_topk k=1), so
    L steps = L bounded exchanges; the walk STATE is O(nodes × W),
    never the corpus.  mode="driver" runs the identical kernel on one
    frame under the edge guard."""
    import ray.data as rd

    from .relational import distinct_on, grouped_topk, hash_join

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][[src, dst]]
        return b.rename(columns={src: "e_src", dst: "dst"})

    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit).rename(
                columns={src: "e_src", dst: "dst"})
            nodes = np.unique(np.concatenate(
                [edges["e_src"].to_numpy(dtype=object),
                 edges["dst"].to_numpy(dtype=object)]))
            state = pd.DataFrame({
                "start": np.repeat(nodes, walks_per_node),
                "w": np.tile(np.arange(walks_per_node, dtype=np.int64),
                             len(nodes)),
            })
            state["cur"] = state["start"]
            out = [pd.DataFrame({"start": state["start"],
                                 "w": state["w"],
                                 "step": np.int64(0),
                                 "node": state["cur"]})]
            for t in range(length):
                cand = state.merge(edges, left_on="cur",
                                   right_on="e_src")
                if not len(cand):
                    break
                cand = _walk_hash_frame(cand, t)
                cand = cand.sort_values(["__h", "dst"],
                                        kind="mergesort")
                nxt = cand.groupby(["start", "w"],
                                   sort=False).head(1)
                state = pd.DataFrame({"start": nxt["start"],
                                      "w": nxt["w"],
                                      "cur": nxt["dst"]})
                out.append(pd.DataFrame({"start": state["start"],
                                         "w": state["w"],
                                         "step": np.int64(t + 1),
                                         "node": state["cur"]}))
            df = pd.concat(out, ignore_index=True).sort_values(
                ["start", "w", "step"]).reset_index(drop=True)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    edges = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["e_src", "dst"]).materialize()
    nodes = distinct_on(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["e_src"], b["dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"]).materialize()

    def init(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "start": b["node"].to_numpy().repeat(walks_per_node),
            "w": np.tile(np.arange(walks_per_node, dtype=np.int64), n),
            "cur": b["node"].to_numpy().repeat(walks_per_node),
        })

    state = nodes.map_batches(init, batch_format="pandas").materialize()
    out_ds = state.map_batches(
        lambda b: pd.DataFrame({"start": b["start"], "w": b["w"],
                                "step": np.int64(0),
                                "node": b["cur"]}),
        batch_format="pandas")
    for t in range(length):
        cand = hash_join(state, edges, on="cur", right_on="e_src",
                         empty_safe=True)
        picked = grouped_topk(
            cand.map_batches(
                lambda b, st=t: _walk_hash_frame(b, st),
                batch_format="pandas"),
            ["start", "w"], "__h", 1, descending=False,
            tie_break="dst")
        state = picked.map_batches(
            lambda b: pd.DataFrame({"start": b["start"], "w": b["w"],
                                    "cur": b["dst"]}),
            batch_format="pandas").materialize()
        out_ds = out_ds.union(state.map_batches(
            lambda b, st=t: pd.DataFrame(
                {"start": b["start"], "w": b["w"],
                 "step": np.int64(st + 1), "node": b["cur"]}),
            batch_format="pandas"))
    return out_ds.sort(["start", "w", "step"])


# ---- deterministic neighbor sampling ---------------------------------------


def neighbor_sample(edges_ds, *, src: str = "src", dst: str = "dst",
                    k: int = 3, mode: str = "auto"):
    """Per-node out-neighbor sampling with a deterministic fan-out cap
    (the GraphSAGE neighborhood-sampling step, Hamilton et al. 2017 —
    public): for every src of the DISTINCT directed graph (self-loops
    dropped), keep the k out-edges with the smallest
    md5(src || '|' || dst) (ties by dst).  Hash order is a reproducible
    uniform-without-replacement draw any engine replays bit-for-bit —
    the same reproducibility contract as relational.hash_sample, per
    node instead of per table.  Scale shape: the per-batch local
    top-k-per-group combiner of grouped_topk (algebraic, no sort
    shuffle below the guard; degrades to the map_groups finish past
    it), so a 10^8-node graph never co-locates a node's full edge
    list unless its fan-out survives the combiner."""
    import hashlib

    from .relational import distinct_on, grouped_topk

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][[src, dst]]
        return b.rename(columns={src: "src", dst: "dst"})

    edges = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["src", "dst"])

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__h"] = (b["src"].astype(str) + "|" + b["dst"].astype(str)).map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        return b

    picked = grouped_topk(
        edges.map_batches(add_hash, batch_format="pandas"),
        ["src"], "__h", k, descending=False, tie_break="dst", mode=mode)
    return picked.map_batches(
        lambda b: b[["src", "dst"]], batch_format="pandas"
    ).sort(["src", "dst"])


def negative_samples(edges_ds, *, src: str = "src", dst: str = "dst",
                     k: int = 2):
    """Deterministic negative sampling for link-prediction training
    (the corrupt-the-tail scheme of TransE et al., public): for every
    distinct directed edge and i ∈ [0, k), the negative tail is
    ``nodes_sorted[uint32(md5(src|dst|i)) mod |V|]`` — a reproducible
    uniform draw over the node set, uncorrected for accidental
    positives (standard practice; the loss treats them as noise).
    The sorted node array is broadcast ONCE (ray.put) and indexed per
    batch; cost is one stateless pass over the edge list."""
    import hashlib

    import ray

    from .relational import bcast_get, distinct_on

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][[src, dst]]
        return b.rename(columns={src: "src", dst: "dst"})

    edges = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["src", "dst"]).materialize()
    nodes = np.sort(distinct_on(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["src"], b["dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"]).to_pandas()["node"].to_numpy(dtype=object))
    nodes_ref = ray.put(nodes)

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        arr = bcast_get(nodes_ref)
        n = len(arr)
        outs = []
        for i in range(k):
            key = (b["src"].astype(str) + "|" + b["dst"].astype(str)
                   + f"|{i}")
            pick = key.map(lambda s: int(
                hashlib.md5(s.encode()).hexdigest()[:8], 16) % n
            ).to_numpy("int64")
            outs.append(pd.DataFrame({
                "src": b["src"], "dst": b["dst"],
                "i": np.int64(i), "neg": arr[pick]}))
        return pd.concat(outs, ignore_index=True)

    return edges.map_batches(
        sample, batch_format="pandas").sort(["src", "dst", "i"])


# ---- HITS hubs & authorities ------------------------------------------------


def _hits_driver(edges: pd.DataFrame, src: str, dst: str, *,
                 iters: int, scale: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "hub": pd.Series([], dtype="int64"),
                             "auth": pd.Series([], dtype="int64")})
    keep = s_i != d_i
    key = np.unique(s_i[keep] * n + d_i[keep])
    s_i, d_i = key // n, key % n
    h = np.full(n, scale // n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a_raw = np.zeros(n, dtype=np.int64)
        np.add.at(a_raw, d_i, h[s_i])
        div = max(int(a_raw.sum()) // scale, 1)
        a = a_raw // div
        h_raw = np.zeros(n, dtype=np.int64)
        np.add.at(h_raw, s_i, a[d_i])
        div = max(int(h_raw.sum()) // scale, 1)
        h = h_raw // div
    out = pd.DataFrame({"entity": nodes, "hub": h, "auth": a})
    return out.sort_values("entity").reset_index(drop=True)


def _hits_shuffle(edges_ds, src: str, dst: str, *, iters: int,
                  scale: int):
    """Dataset-native HITS: per iteration, two (join on one endpoint →
    pre-combined sum by the other) exchanges plus two SCALAR sum
    aggregates for the floor-normalizers — 2 joins + 2 groupbys + 2
    driver scalars per round, all bounded."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    edges = distinct_on(
        edges_ds.map_batches(
            lambda b: b[b[src] != b[dst]].rename(
                columns={src: "e_src", dst: "e_dst"})[["e_src", "e_dst"]],
            batch_format="pandas"),
        ["e_src", "e_dst"],
    ).materialize()
    nodes = distinct_on(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["e_src"], b["e_dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"],
    ).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "hub": pd.Series([], dtype="int64"),
             "auth": pd.Series([], dtype="int64")}))

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"],
                             "score": np.int64(scale // n)})

    def one_side(state, from_col: str, to_col: str):
        """state (node, score) → raw sums at the OTHER endpoint, then
        floor-normalize by a scalar aggregate; zero-raw nodes kept."""
        contrib = hash_join(edges, state, on=from_col,
                            empty_safe=True,
                            right_on="node").map_batches(
            lambda b: pd.DataFrame({"node": b[to_col],
                                    "part": b["score"]}),
            batch_format="pandas")
        raw = groupby_agg(contrib, ["node"],
                          [("part", "sum", "raw")]).materialize()
        total = int(raw.sum("raw") or 0)
        div = max(total // scale, 1)
        scored = hash_join(nodes, raw, on="node", empty_safe=True,
                           how="left_outer").map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "score": (b["raw"].fillna(0).astype("int64")
                          // np.int64(div)),
            }),
            batch_format="pandas")
        return scored.materialize()

    h = nodes.map_batches(init, batch_format="pandas").materialize()
    a = None
    for _ in range(iters):
        a = one_side(h, "e_src", "e_dst")
        h = one_side(a, "e_dst", "e_src")
    joined = hash_join(
        h.map_batches(lambda b: b.rename(columns={"score": "hub"}),
                      batch_format="pandas").materialize(),
        a.map_batches(lambda b: b.rename(columns={"score": "auth"}),
                      batch_format="pandas"),
        on="node")
    return joined.map_batches(
        lambda b: pd.DataFrame({"entity": b["node"],
                                "hub": b["hub"].astype("int64"),
                                "auth": b["auth"].astype("int64")}),
        batch_format="pandas").sort("entity")


def hits(edges_ds, *, src: str = "src", dst: str = "dst",
         iters: int = 4, scale: int = 10 ** 12, mode: str = "auto",
         driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """HITS hubs & authorities (Kleinberg 1999, public) over the
    distinct directed graph, self-loops dropped, with FLOOR-NORMALIZED
    integer semantics: each half-step sums the opposite score over the
    edges (exact int64) and divides every node by the scalar
    ``max(total // scale, 1)`` — normalization only ever SHRINKS mass
    (total stays ≤ ~scale), every op is integer, so the same iteration
    count is bit-identical on any engine (the classic L2 norm would be
    float-order-dependent and unhashable).  int64 bound: per-node raw
    sums stay ≤ total mass ≈ scale × max fan-in share; with the 1e12
    scale a node needs > ~9 × 10^6 × scale incoming mass to overflow —
    unreachable since total mass is ≤ scale per side.  Returns
    (entity, hub int64, auth int64) sorted by entity."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _hits_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, iters=iters, scale=scale)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _hits_shuffle(edges_ds, src, dst, iters=iters, scale=scale)


# ---- weighted PageRank -------------------------------------------------------


def _wpagerank_driver(edges: pd.DataFrame, *, iters: int,
                      scale: int) -> pd.DataFrame:
    """edges: (src, dst, w int64) already weight-aggregated per
    distinct pair, self-loops dropped."""
    nodes, s_i, d_i = _index_graph(edges, "src", "dst")
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64")})
    w = edges["w"].to_numpy("int64")
    wdeg = np.zeros(n, np.int64)
    np.add.at(wdeg, s_i, w)
    base = (scale * 15) // (100 * n)
    score = np.full(n, scale // n, dtype=np.int64)
    denom = 100 * wdeg[s_i]
    for _ in range(iters):
        contrib = (score[s_i] * 85 * w) // denom
        acc = np.full(n, base, dtype=np.int64)
        np.add.at(acc, d_i, contrib)
        score = acc
    out = pd.DataFrame({"entity": nodes, "score": score})
    return out.sort_values(["score", "entity"],
                           ascending=[False, True]).reset_index(drop=True)


def pagerank_weighted(edges_ds, *, src: str = "src", dst: str = "dst",
                      iters: int = 8, scale: int = 10 ** 12,
                      mode: str = "auto",
                      driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """PageRank with INTEGER edge weights = the input's (src, dst)
    multiplicity (for a KG: how many triples assert the pair — a
    natural edge-confidence weight).  Mass splits proportionally:
    contrib = (score · 85 · w) // (100 · wdeg) — exact integers, so
    the unrolled SQL oracle is bit-identical.  int64 bound: score ≤
    scale = 1e12, so per-edge w must stay < ~10^5; the multiplicity of
    one (subj, obj) pair in a KG is far below that (guarded).  Scale
    shape mirrors pagerank: the weighted edge list is ONE pre-combined
    groupby over the raw pairs; mode='shuffle' runs the same K bounded
    exchanges with w carried on the edge table."""
    import ray.data as rd

    from .relational import groupby_agg, hash_join

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        return pd.DataFrame({"src": b[src], "dst": b[dst],
                             "one": np.int64(1)})

    wedges_ds = groupby_agg(
        edges_ds.map_batches(pairs, batch_format="pandas"),
        ["src", "dst"], [("one", "sum", "w")]).materialize()
    wmax = int(wedges_ds.max("w") or 0)
    if wmax >= 100_000:
        raise ValueError(
            f"edge multiplicity {wmax} ≥ 1e5: score·85·w would "
            "overflow int64 at scale=1e12")
    if mode in ("driver", "auto"):
        if wedges_ds.count() <= driver_edge_limit:
            df = wedges_ds.to_pandas()
            df["w"] = df["w"].astype("int64")
            return rd.from_pandas(
                _wpagerank_driver(df, iters=iters, scale=scale))
        if mode == "driver":
            raise GuardExceeded(
                f"pagerank_weighted(mode='driver'): > "
                f"{driver_edge_limit} distinct edges")
    # Dataset path: the _pagerank_shuffle loop with weights carried
    nodes = groupby_agg(
        wedges_ds.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["src"], b["dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "__d")],
    ).map_batches(lambda b: b[["node"]],
                  batch_format="pandas").materialize()
    n = nodes.count()
    wdeg = groupby_agg(wedges_ds, ["src"], [("w", "sum", "wdeg")])
    ew = hash_join(wedges_ds, wdeg.materialize(),
                   on="src", empty_safe=True).materialize()
    base = (scale * 15) // (100 * n)
    scores = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "score": np.int64(scale // n)}),
        batch_format="pandas").materialize()
    for _ in range(iters):
        contrib = hash_join(ew, scores, on="src", right_on="node",
                            empty_safe=True).map_batches(
            lambda b: pd.DataFrame({
                "node": b["dst"],
                "part": (b["score"].to_numpy("int64") * 85
                         * b["w"].to_numpy("int64"))
                // (100 * b["wdeg"].to_numpy("int64")),
            }),
            batch_format="pandas")
        summed = groupby_agg(contrib, ["node"],
                             [("part", "sum", "s")])
        scores = hash_join(nodes, summed.materialize(), on="node",
                           how="left_outer",
                           empty_safe=True).map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "score": base + b["s"].fillna(0).astype(np.int64),
            }),
            batch_format="pandas").materialize()
    return scores.map_batches(
        lambda b: b.rename(columns={"node": "entity"}),
        batch_format="pandas").sort(["score", "entity"],
                                    descending=[True, False])


# ---- connected components --------------------------------------------------


def _components_driver(edges: pd.DataFrame, src: str, dst: str, *,
                       rounds: int, converge: bool) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "component": pd.Series([], dtype=object),
                             "converged": pd.Series([], dtype=bool)})
    # undirected: propagate both ways each round
    u_s = np.concatenate([s_i, d_i])
    u_d = np.concatenate([d_i, s_i])
    lbl = np.arange(n, dtype=np.int64)  # codes ARE lexicographic rank
    done = False
    r = 0
    while True:
        acc = lbl.copy()
        np.minimum.at(acc, u_d, lbl[u_s])
        changed = bool((acc != lbl).any())
        lbl = acc
        r += 1
        if converge:
            if not changed:
                done = True
                break
        else:
            if r >= rounds:
                # one lookahead to report convergence truthfully
                probe = lbl.copy()
                np.minimum.at(probe, u_d, lbl[u_s])
                done = not bool((probe != lbl).any())
                break
    out = pd.DataFrame({"entity": nodes, "component": nodes[lbl],
                        "converged": done})
    return out.sort_values("entity").reset_index(drop=True)


def _components_shuffle(edges_ds, src: str, dst: str, *, rounds: int):
    """Dataset-native fixed-round propagation (converge=True is a
    driver-mode feature; the distributed contract is the bounded-round
    one).  Each round: labels ⋈ undirected edges → pre-combined min by
    dst → least(own, neighborhood min)."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = distinct_on(und, ["__src", "__dst"]).materialize()
    nodes = distinct_on(
        und.map_batches(lambda b: pd.DataFrame({"node": b["__src"]}),
                        batch_format="pandas"),
        ["node"],
    ).materialize()
    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "component": pd.Series([], dtype=object),
             "converged": pd.Series([], dtype=bool)}))
    labels = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"], "lbl": b["node"]}),
        batch_format="pandas",
    ).materialize()
    for _ in range(rounds):
        neigh = hash_join(und, labels, on="__src",
                          right_on="node", empty_safe=True).map_batches(
            lambda b: b[["__dst", "lbl"]], batch_format="pandas")
        mins = groupby_agg(neigh, ["__dst"], [("lbl", "min", "minl")])
        labels = hash_join(
            labels, mins.materialize(), on="node", right_on="__dst",
            how="left_outer", empty_safe=True,
        ).map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "lbl": b[["lbl", "minl"]].min(axis=1),
            }),
            batch_format="pandas",
        ).materialize()
    # distributed mode reports converged=False pessimistically only if a
    # lookahead round would still change labels
    ahead = hash_join(und, labels, on="__src", right_on="node",
                      empty_safe=True).map_batches(
        lambda b: b[["__dst", "lbl"]], batch_format="pandas")
    amins = groupby_agg(ahead, ["__dst"], [("lbl", "min", "minl")])
    final = hash_join(labels, amins.materialize(), on="node",
                      right_on="__dst", how="left_outer",
                      empty_safe=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        would = b[["lbl", "minl"]].min(axis=1)
        return pd.DataFrame({"entity": b["node"], "component": b["lbl"],
                             "__stable": (would == b["lbl"])})

    final = final.map_batches(finish, batch_format="pandas").materialize()
    conv = bool(final.map_batches(
        lambda b: pd.DataFrame({"m": [bool(b["__stable"].all())]}),
        batch_format="pandas",
    ).to_pandas()["m"].all())
    return final.map_batches(
        lambda b: pd.DataFrame({"entity": b["entity"],
                                "component": b["component"],
                                "converged": conv}),
        batch_format="pandas",
    ).sort("entity")


def label_components(edges_ds, *, src: str = "src", dst: str = "dst",
                     rounds: int = 12, converge: bool = False,
                     mode: str = "auto",
                     driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Connected components by min-label propagation over the
    undirected view of (src, dst), self-loops dropped.  Fixed-round by
    default (exact wherever component diameter ≤ rounds; ``converged``
    reports whether a further round would change labels); converge=True
    runs to fixpoint (driver mode only — unbounded rounds are a
    driver-scale loop, the distributed contract is bounded)."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if converge and mode == "shuffle":
        raise ValueError("converge=True requires the driver path")
    if mode in ("driver", "auto"):
        try:
            df = _components_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, rounds=rounds, converge=converge)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver" or converge:
                raise
    return _components_shuffle(edges_ds, src, dst, rounds=rounds)


# ---- co-occurrence pair fan-out ----------------------------------------


def co_occurrence_pairs(ds, *, group_col: str = "url",
                        item_col: str = "e", max_group: int = 5000,
                        n_buckets: int | None = None):
    """All unordered within-group pairs (``a < b``) of items per group
    — the co-mention edge builder (entities on the same page → an
    edge).  Input rows should already be distinct on (group, item).

    A group with m members fans out m(m-1)/2 pairs, so a pathological
    mega-page (100k mentions → 5e9 pairs) would OOM the wedge step.
    Groups wider than ``max_group`` therefore emit ONE summary row
    (``a`` = group key, ``b`` = "", ``skipped_n`` = member count)
    instead of pairs — the same reported-skip contract as
    ``simhash_pairs`` / ``embedding_near_dup_pairs``: never silent,
    never unbounded.  Real pair rows carry ``skipped_n == 0``; callers
    filter on it.  One bounded exchange (bucket groupby by group hash,
    width from the cluster)."""
    import ray.data  # noqa: F401  (ds is already a Dataset)

    from .relational import default_n_buckets

    nb = n_buckets or default_n_buckets()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, item_col], kind="mergesort")
        u = g[group_col].to_numpy(dtype=object)
        e = g[item_col].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(u)])
        hot = sizes > max_group
        keep = ~np.repeat(hot, sizes)
        first, second = _pair_ranges(sizes[~hot])
        ek = e[keep]
        out = pd.DataFrame({"a": ek[first], "b": ek[second],
                            "skipped_n": np.int64(0)})
        if hot.any():
            summ = pd.DataFrame({"a": u[starts[hot]], "b": "",
                                 "skipped_n": sizes[hot].astype("int64")})
            out = pd.concat([out, summ], ignore_index=True)
        return out

    return ds.map_batches(
        lambda b: b.assign(__bk=pd.util.hash_array(
            b[group_col].to_numpy(dtype=object)) % nb),
        batch_format="pandas",
    ).groupby("__bk").map_groups(pairs, batch_format="pandas")


def cooccur_pmi(mentions, *, group_col: str = "url", item_col: str = "e",
                scale: int = 1_000_000, max_group: int = 5000,
                df_row_limit: int = 5_000_000):
    """Pointwise-mutual-information co-occurrence scoring (Church &
    Hanks 1990, the classic relation-strength signal in KG
    construction): for every unordered item pair (a < b) sharing a
    group, the pair's group count ``c_ab``, each item's group
    frequency ``c_a``/``c_b``, and
    ``pmi_scaled = floor(scale * ln(c_ab * N / (c_a * c_b)))`` with
    N = number of distinct groups.  The single per-row ``ln`` keeps
    the float discipline of :func:`link_adamic_adar` (no
    order-dependent float SUM — every arithmetic step is one exact
    int64 product, one IEEE divide, one libm log), so a SQL oracle
    reproduces the bytes.

    Input rows must already be distinct on (group, item) — the same
    contract as :func:`co_occurrence_pairs`, which provides the pair
    fan-out (capped mega-group guard, skip rows filtered here after a
    zero-skip assertion is NOT made: skipped groups simply contribute
    no pairs, the declared lossy contract of the pair builder).

    Scale shape: pair fan-out is one bounded exchange
    (co_occurrence_pairs), pair counts and item frequencies are
    combiner-fed groupbys; the item-frequency table is vocabulary-
    sized and collected under ``df_row_limit``
    (:class:`~cpg_ray.functions.relational.GuardExceeded` past it)
    then broadcast onto the pair counts — no shuffle join of the
    big side."""
    from .relational import (_collect_limited, broadcast_join,
                             distinct_on, groupby_agg)

    n_docs = distinct_on(
        mentions.map_batches(lambda b: b[[group_col]],
                             batch_format="pandas"),
        [group_col]).count()

    dfreq = _collect_limited(
        groupby_agg(mentions, [item_col], [(group_col, "count", "df")]),
        df_row_limit, "cooccur_pmi")

    pair_counts = groupby_agg(
        co_occurrence_pairs(mentions, group_col=group_col,
                            item_col=item_col, max_group=max_group)
        .map_batches(lambda b: b[b["skipped_n"] == 0][["a", "b"]],
                     batch_format="pandas"),
        ["a", "b"], [("a", "count", "c_ab")])

    j = broadcast_join(
        pair_counts,
        dfreq.rename(columns={item_col: "a", "df": "c_a"}), left_on="a")
    j = broadcast_join(
        j, dfreq.rename(columns={item_col: "b", "df": "c_b"}),
        left_on="b")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        c_ab = b["c_ab"].to_numpy("int64")
        c_a = b["c_a"].to_numpy("int64")
        c_b = b["c_b"].to_numpy("int64")
        ratio = (c_ab * n_docs).astype("float64") \
            / (c_a * c_b).astype("float64")
        b = b[["a", "b", "c_ab", "c_a", "c_b"]].copy()
        b["pmi_scaled"] = np.floor(scale * np.log(ratio)).astype("int64")
        return b

    return j.map_batches(score, batch_format="pandas")


# ---- triangle counting -------------------------------------------------


def _pair_ranges(sizes: np.ndarray):
    """Vectorized all-(i<j)-pairs index builder for contiguous groups:
    given group sizes over a sorted array, returns (first_idx,
    second_idx) into that array covering every within-group ordered
    pair.  No Python loop — the wedge fan-out is the hot step."""
    m = int(sizes.sum())
    if m == 0:
        z = np.array([], np.int64)
        return z, z
    starts = np.cumsum(sizes) - sizes
    local = np.arange(m, dtype=np.int64) - np.repeat(starts, sizes)
    rep = np.repeat(sizes, sizes) - 1 - local  # pairs each element opens
    total = int(rep.sum())
    first = np.repeat(np.arange(m, dtype=np.int64), rep)
    run_starts = np.cumsum(rep) - rep
    offs = np.arange(total, dtype=np.int64) - np.repeat(run_starts, rep) + 1
    return first, first + offs


def _triangles_driver(edges: pd.DataFrame, src: str, dst: str, *,
                      wedge_limit: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "triangles": pd.Series([], dtype="int64")})
    keep = s_i != d_i  # defense in depth; _edges_to_driver also drops
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)  # distinct undirected edges
    lo, hi = ukey // n, ukey % n
    deg = (np.bincount(lo, minlength=n)
           + np.bincount(hi, minlength=n)).astype(np.int64)
    # degree-ordered orientation (ties by id) bounds the wedge fan-out
    # by O(m^1.5) regardless of hubs — the standard skew defense
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    fwd = rank[lo] < rank[hi]
    u = np.where(fwd, lo, hi)
    v = np.where(fwd, hi, lo)
    o2 = np.lexsort((rank[v], u))
    u, v = u[o2], v[o2]
    m = len(u)
    grp_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
        if m else np.array([], np.int64)
    sizes = np.diff(np.r_[grp_start, m])
    n_wedges = int((sizes * (sizes - 1) // 2).sum())
    if n_wedges > wedge_limit:
        raise GuardExceeded(
            f"triangle_count(mode='driver'): {n_wedges} wedges > "
            f"{wedge_limit}; use mode='shuffle'"
        )
    first, second = _pair_ranges(sizes)
    wu, wv, ww = u[first], v[first], v[second]  # rank(wv) < rank(ww)
    ekey = np.sort(u * n + v)
    wkey = wv * n + ww
    pos = np.searchsorted(ekey, wkey)
    pos_c = np.minimum(pos, max(len(ekey) - 1, 0))
    hit = (pos < len(ekey)) & (ekey[pos_c] == wkey) if len(ekey) else \
        np.zeros(len(wkey), bool)
    cnt = (np.bincount(wu[hit], minlength=n)
           + np.bincount(wv[hit], minlength=n)
           + np.bincount(ww[hit], minlength=n)).astype(np.int64)
    nz = np.flatnonzero(cnt)
    out = pd.DataFrame({"entity": nodes[nz], "triangles": cnt[nz]})
    return out.sort_values("entity").reset_index(drop=True)


def _triangles_shuffle(edges_ds, src: str, dst: str, *,
                       n_buckets: int | None = None):
    """Dataset-native plan: distinct undirected edges → degree join →
    degree-ordered orientation → per-anchor wedge fan-out (hash-bucket
    map_groups, the dedup band_pairs shape) → composite-key hash join
    closing wedges against the oriented edge set → per-corner count.
    Three bounded exchanges + the closure join; the wedge volume is
    O(m^1.5) by the orientation, never hub-quadratic."""
    import ray.data as rd

    from .relational import (
        default_n_buckets,
        distinct_on,
        groupby_agg,
        hash_join,
    )

    if n_buckets is None:
        n_buckets = default_n_buckets()

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        s = b[src].to_numpy(dtype=object)
        d = b[dst].to_numpy(dtype=object)
        fwd = s < d
        return pd.DataFrame({"a": np.where(fwd, s, d),
                             "b": np.where(fwd, d, s)})

    und = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"), ["a", "b"]
    ).materialize()
    deg = groupby_agg(
        und.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["a"], b["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "deg")],
    ).materialize()
    ab = hash_join(und, deg, on="a", right_on="node").map_batches(
        lambda b: b.rename(columns={"deg": "deg_a"}), batch_format="pandas")
    abd = hash_join(ab.materialize(), deg, on="b",
                    right_on="node", empty_safe=True).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}), batch_format="pandas")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        fwd = (b["deg_a"] < b["deg_b"]) | (
            (b["deg_a"] == b["deg_b"]) & (b["a"] < b["b"]))
        f = fwd.to_numpy()
        return pd.DataFrame({
            "u": np.where(f, b["a"], b["b"]),
            "v": np.where(f, b["b"], b["a"]),
            "deg_v": np.where(f, b["deg_b"], b["deg_a"]),
            "__bk": pd.util.hash_array(
                np.where(f, b["a"], b["b"])) % n_buckets,
        })

    oriented = abd.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "deg_v", "v"], kind="mergesort")
        u_arr = g["u"].to_numpy(dtype=object)
        v_arr = g["v"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.r_[True, u_arr[1:] != u_arr[:-1]]) if len(u_arr) else \
            np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(u_arr)])
        first, second = _pair_ranges(sizes)
        return pd.DataFrame({"wu": u_arr[first], "wv": v_arr[first],
                             "ww": v_arr[second]})

    wedge_ds = oriented.groupby("__bk").map_groups(
        wedges, batch_format="pandas").materialize()
    if wedge_ds.count() == 0:
        # Ray drops zero-row blocks: an all-empty map_groups output is
        # SCHEMALESS and crashes the closure join.  A wedge-free graph
        # simply has no triangles.
        import pyarrow as pa

        return rd.from_arrow(pa.table({
            "entity": pa.array([], pa.large_string()),
            "triangles": pa.array([], pa.int64())}))
    closed = hash_join(
        wedge_ds,
        oriented.map_batches(lambda b: b[["u", "v"]],
                             batch_format="pandas"),
        on=["wv", "ww"], right_on=["u", "v"],
    )
    corners = closed.map_batches(
        lambda b: pd.DataFrame({"entity": pd.concat(
            [b["wu"], b["wv"], b["ww"]], ignore_index=True)}),
        batch_format="pandas")
    out = groupby_agg(corners, ["entity"],
                      [("entity", "count", "triangles")])
    return out.sort("entity")


def triangle_count(edges_ds, *, src: str = "src", dst: str = "dst",
                   mode: str = "auto",
                   driver_edge_limit: int = _DEF_EDGE_LIMIT,
                   wedge_limit: int = 100_000_000):
    """Per-entity triangle participation counts over the undirected
    distinct view of (src, dst), self-loops dropped; entities in no
    triangle are omitted.  Degree-ordered orientation makes each
    triangle close exactly once from its lowest-(degree, id) corner and
    bounds the wedge fan-out at O(m^1.5) even under Zipf hubs — the
    north-rule skew defense applied to the closure problem.  Returns a
    Dataset of (entity, triangles int64) sorted by entity."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _triangles_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, wedge_limit=wedge_limit)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _triangles_shuffle(edges_ds, src, dst)


def clustering_coefficient(edges_ds, *, src: str = "src",
                           dst: str = "dst", mode: str = "auto",
                           driver_edge_limit: int = _DEF_EDGE_LIMIT,
                           wedge_limit: int = 100_000_000):
    """Local clustering coefficient per node of the undirected distinct
    graph: cc = 2·T / (deg·(deg−1)) with T the node's triangle count
    (Watts & Strogatz 1998, public); deg < 2 → 0.0.  Exact integer T
    and deg feed ONE double expression — 2.0·T is exact, the division
    is one IEEE op — so any engine reproduces the bytes.  Every node
    of the graph gets a row (zero-triangle nodes included).  Scale
    shape: triangle counts ride :func:`triangle_count` (mode passes
    through); degrees are one pre-combined groupby; the stitch is a
    broadcast-or-shuffle left join."""
    from .relational import distinct_on, groupby_agg, hash_join

    tri = triangle_count(edges_ds, src=src, dst=dst, mode=mode,
                         driver_edge_limit=driver_edge_limit,
                         wedge_limit=wedge_limit)

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        s = b[src].to_numpy(dtype=object)
        d = b[dst].to_numpy(dtype=object)
        fwd = s < d
        return pd.DataFrame({"a": np.where(fwd, s, d),
                             "b": np.where(fwd, d, s)})

    und = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"), ["a", "b"])
    deg = groupby_agg(
        und.map_batches(
            lambda b: pd.DataFrame({"entity": pd.concat(
                [b["a"], b["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["entity"], [("entity", "count", "deg")],
    )
    joined = hash_join(deg.materialize(), tri.materialize(),
                       on="entity", how="left_outer",
                       empty_safe=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy("int64")
        t = b["triangles"].fillna(0).to_numpy("int64")
        denom = d * (d - 1)
        cc = np.where(
            d >= 2,
            (2.0 * t.astype(np.float64))
            / np.maximum(denom, 1).astype(np.float64),
            0.0)
        return pd.DataFrame({"entity": b["entity"], "deg": d,
                             "triangles": t, "cc": cc})

    return joined.map_batches(finish, batch_format="pandas").sort("entity")


# ---- k-core ------------------------------------------------------------


def _kcore_driver(edges: pd.DataFrame, src: str, dst: str, *, k: int,
                  rounds: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "deg": pd.Series([], dtype="int64"),
                             "converged": pd.Series([], dtype=bool)})
    keep = s_i != d_i
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)
    u_s = np.concatenate([ukey // n, ukey % n])  # symmetric halves
    u_d = np.concatenate([ukey % n, ukey // n])
    alive = np.ones(n, bool)

    def degrees() -> np.ndarray:
        live = alive[u_s] & alive[u_d]
        return np.bincount(u_s[live], minlength=n).astype(np.int64)

    for _ in range(rounds):
        alive = degrees() >= k
    deg = degrees()
    converged = bool((deg[alive] >= k).all())
    idx = np.flatnonzero(alive)
    out = pd.DataFrame({"entity": nodes[idx], "deg": deg[idx],
                        "converged": converged})
    return out.sort_values("entity").reset_index(drop=True)


def _kcore_shuffle(edges_ds, src: str, dst: str, *, k: int, rounds: int):
    """Dataset-native peel: each round is alive ⋈ symmetric edges ⋈
    alive → pre-combined degree groupby → filter ≥ k.  ``rounds``
    bounded exchanges, alive only shrinks."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = distinct_on(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({
                "__src": pd.concat([b[src], b[dst]], ignore_index=True),
                "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
            }).loc[lambda d: d["__src"] != d["__dst"]],
            batch_format="pandas"),
        ["__src", "__dst"],
    ).materialize()
    alive = distinct_on(
        und.map_batches(lambda b: pd.DataFrame({"node": b["__src"]}),
                        batch_format="pandas"),
        ["node"],
    ).materialize()
    if alive.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "deg": pd.Series([], dtype="int64"),
             "converged": pd.Series([], dtype=bool)}))

    def live_degrees(alive_ds):
        e1 = hash_join(und, alive_ds, on="__src", right_on="node",
                       empty_safe=True)
        e2 = hash_join(e1.materialize(), alive_ds, on="__dst",
                       right_on="node", empty_safe=True)
        return groupby_agg(
            e2.map_batches(lambda b: b[["__src"]], batch_format="pandas"),
            ["__src"], [("__src", "count", "deg")],
        ).materialize()

    for _ in range(rounds):
        degs = live_degrees(alive)
        alive = degs.map_batches(
            lambda b: b[b["deg"] >= k][["__src"]].rename(
                columns={"__src": "node"}),
            batch_format="pandas",
        ).materialize()
        if alive.count() == 0:
            return rd.from_pandas(pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "deg": pd.Series([], dtype="int64"),
                 "converged": pd.Series([], dtype=bool)}))
    degs = live_degrees(alive)
    # nodes can drop to degree 0 among survivors — they are still
    # alive this round; left join keeps them with deg 0
    final = hash_join(alive, degs, on="node", right_on="__src",
                      how="left_outer", empty_safe=True).map_batches(
        lambda b: pd.DataFrame({
            "entity": b["node"],
            "deg": b["deg"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    ).materialize()
    conv = bool(final.map_batches(
        lambda b: pd.DataFrame({"m": [bool((b["deg"] >= k).all())]}),
        batch_format="pandas",
    ).to_pandas()["m"].all())
    return final.map_batches(
        lambda b: b.assign(converged=conv), batch_format="pandas",
    ).sort("entity")


def k_core(edges_ds, *, src: str = "src", dst: str = "dst", k: int = 2,
           rounds: int = 8, mode: str = "auto",
           driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Bounded-round k-core peel over the undirected distinct view of
    (src, dst), self-loops dropped: ``rounds`` times, drop every node
    whose degree among surviving nodes is < k.  Returns survivors as
    (entity, deg int64 — degree within the surviving subgraph,
    converged bool — whether every survivor already meets the k bar,
    i.e. a further round would change nothing).  Exact k-core wherever
    the peel depth ≤ rounds — same bounded-exchange contract as
    :func:`label_components`."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _kcore_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, k=k, rounds=rounds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _kcore_shuffle(edges_ds, src, dst, k=k, rounds=rounds)


# ---- multi-source BFS distances --------------------------------------------


def _seeds_to_driver(seeds_ds, seed_col: str, limit: int) -> np.ndarray:
    vals: set = set()
    for b in seeds_ds.iter_batches(batch_format="pandas",
                                   batch_size=None):
        vals.update(b[seed_col].dropna().tolist())
        if len(vals) > limit:
            raise GuardExceeded(
                f"bfs_distances(mode='driver'): > {limit} seeds; "
                "use mode='shuffle'")
    return np.array(sorted(vals), dtype=object)


def _bfs_driver(edges: pd.DataFrame, seeds: np.ndarray, src: str,
                dst: str, *, rounds: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    extra = seeds[~np.isin(seeds, nodes)]  # isolated seeds still output
    n = len(nodes)
    INF = np.int64(2) ** 62
    u_s = np.concatenate([s_i, d_i])
    u_d = np.concatenate([d_i, s_i])
    dist = np.full(n, INF, dtype=np.int64)
    if n:
        seed_idx = np.searchsorted(nodes, seeds[np.isin(seeds, nodes)])
        dist[seed_idx] = 0
    for _ in range(rounds):
        acc = dist.copy()
        if n:
            np.minimum.at(acc, u_d, dist[u_s] + 1)
        dist = acc
    probe = dist.copy()
    if n:
        np.minimum.at(probe, u_d, dist[u_s] + 1)
    done = not bool((probe != dist).any())
    reached = dist < INF
    out = pd.DataFrame({
        "entity": np.concatenate([nodes[reached], extra]),
        "dist": np.concatenate([dist[reached],
                                np.zeros(len(extra), dtype=np.int64)]),
        "converged": done,
    })
    return out.sort_values("entity").reset_index(drop=True)


def _bfs_shuffle(edges_ds, seeds_ds, src: str, dst: str, seed_col: str,
                 *, rounds: int):
    """Dataset-native bounded-round BFS: the frontier table (node,
    dist) only ever holds REACHED nodes; each round is one hash join +
    one pre-combined min groupby (dist can only shrink for new nodes —
    BFS is monotone, so a round adds rows, never rewrites them)."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = distinct_on(und, ["__src", "__dst"]).materialize()

    def advance(labels):
        neigh = hash_join(und, labels, on="__src",
                          right_on="node", empty_safe=True).map_batches(
            lambda b: pd.DataFrame({"node": b["__dst"],
                                    "dist": b["dist"] + 1}),
            batch_format="pandas")
        both = labels.union(neigh)
        return groupby_agg(both, ["node"],
                           [("dist", "min", "dist")]).materialize()

    labels = distinct_on(
        seeds_ds.map_batches(
            lambda b: pd.DataFrame({"node": b[seed_col], "dist": 0}),
            batch_format="pandas"),
        ["node"],
    ).materialize()
    for _ in range(rounds):
        labels = advance(labels)
    # BFS monotonicity: a further round can only ADD nodes, so the
    # convergence probe is one row-count compare
    conv = advance(labels).count() == labels.count()
    return labels.map_batches(
        lambda b: pd.DataFrame({"entity": b["node"],
                                "dist": b["dist"].astype("int64"),
                                "converged": conv}),
        batch_format="pandas",
    ).sort("entity")


def bfs_distances(edges_ds, seeds_ds, *, src: str = "src",
                  dst: str = "dst", seed_col: str = "node",
                  rounds: int = 12, mode: str = "auto",
                  driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Multi-source BFS distances over the undirected entity graph for
    a FIXED number of rounds (exact integer semantics — the SQL oracle
    runs the identical bounded recursion and hash-matches).  Returns
    (entity, dist, converged) for REACHED nodes only; ``converged``
    says whether round rounds+1 would reach anything new (BFS is
    monotone, so distances never improve — a probe round is one
    row-count compare).

    Scale shape: driver mode = guarded distinct edge list + vectorized
    ``np.minimum.at`` rounds; shuffle mode = K bounded exchanges over
    a frontier Dataset that holds only reached nodes (the 100-TB path:
    frontier ⋈ edges → pre-combined min per dst per round).
    """
    if mode == "shuffle":
        return _bfs_shuffle(edges_ds, seeds_ds, src, dst, seed_col,
                            rounds=rounds)
    try:
        import ray.data as rd

        edges = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
        seeds = _seeds_to_driver(seeds_ds, seed_col, driver_edge_limit)
        return rd.from_pandas(_bfs_driver(edges, seeds, src, dst,
                                          rounds=rounds))
    except GuardExceeded:
        if mode == "driver":
            raise
        return _bfs_shuffle(edges_ds, seeds_ds, src, dst, seed_col,
                            rounds=rounds)


# ---- link prediction: per-edge common neighbors / Jaccard ------------------


def _link_jaccard_driver(edges: pd.DataFrame, src: str, dst: str, *,
                         wedge_limit: int) -> pd.DataFrame:
    """Per-EDGE common-neighbor counts are per-edge triangle counts:
    each closed wedge {wu, wv, ww} contributes one shared neighbor to
    each of its three edges — the same degree-ordered orientation +
    vectorized wedge closure as the triangle kernel, with hits
    attributed to edge keys instead of corners."""
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({
            "entity_a": pd.Series([], dtype=object),
            "entity_b": pd.Series([], dtype=object),
            "common": pd.Series([], dtype="int64"),
            "deg_a": pd.Series([], dtype="int64"),
            "deg_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")})
    keep = s_i != d_i
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)
    lo, hi = ukey // n, ukey % n
    deg = (np.bincount(lo, minlength=n)
           + np.bincount(hi, minlength=n)).astype(np.int64)
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    fwd = rank[lo] < rank[hi]
    u = np.where(fwd, lo, hi)
    v = np.where(fwd, hi, lo)
    o2 = np.lexsort((rank[v], u))
    u, v = u[o2], v[o2]
    m = len(u)
    grp_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
        if m else np.array([], np.int64)
    sizes = np.diff(np.r_[grp_start, m])
    n_wedges = int((sizes * (sizes - 1) // 2).sum())
    if n_wedges > wedge_limit:
        raise GuardExceeded(
            f"link_jaccard(mode='driver'): {n_wedges} wedges > "
            f"{wedge_limit}; use mode='shuffle'")
    first, second = _pair_ranges(sizes)
    wu, wv, ww = u[first], v[first], v[second]
    ekey = u * n + v  # already sorted by (u, rank(v)) but keys need sort
    sort_pos = np.argsort(ekey, kind="stable")
    ekey_sorted = ekey[sort_pos]
    wkey = wv * n + ww
    pos = np.searchsorted(ekey_sorted, wkey)
    pos_c = np.minimum(pos, max(m - 1, 0))
    hit = (pos < m) & (ekey_sorted[pos_c] == wkey) if m else \
        np.zeros(len(wkey), bool)

    def edge_pos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return sort_pos[np.searchsorted(ekey_sorted, a * n + b)]

    common = np.zeros(m, np.int64)
    if hit.any():
        np.add.at(common, edge_pos(wu[hit], wv[hit]), 1)
        np.add.at(common, edge_pos(wu[hit], ww[hit]), 1)
        np.add.at(common, edge_pos(wv[hit], ww[hit]), 1)
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    out = pd.DataFrame({
        "entity_a": nodes[a], "entity_b": nodes[b],
        "common": common,
        "deg_a": deg[a], "deg_b": deg[b],
    })
    out["jaccard"] = out["common"].to_numpy("int64").astype("float64") / (
        out["deg_a"].to_numpy("int64").astype("float64")
        + out["deg_b"].to_numpy("int64").astype("float64")
        - out["common"].to_numpy("int64").astype("float64"))
    return out.sort_values(["entity_a", "entity_b"]).reset_index(drop=True)


def _link_jaccard_shuffle(edges_ds, src: str, dst: str,
                          n_buckets: int | None = None):
    """Dataset plan: the _triangles_shuffle wedge/closure pipeline with
    hits attributed to CANONICAL EDGE PAIRS (three per closed wedge)
    instead of corners, then a left join back onto the undirected edge
    set (zero-common edges survive) and a degree join for the exact
    int→double Jaccard."""
    from .relational import (
        default_n_buckets,
        distinct_on,
        groupby_agg,
        hash_join,
    )

    if n_buckets is None:
        n_buckets = default_n_buckets()

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        s = b[src].to_numpy(dtype=object)
        d = b[dst].to_numpy(dtype=object)
        fwd = s < d
        return pd.DataFrame({"a": np.where(fwd, s, d),
                             "b": np.where(fwd, d, s)})

    und = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"), ["a", "b"]
    ).materialize()
    deg = groupby_agg(
        und.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["a"], b["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "deg")],
    ).materialize()
    ab = hash_join(und, deg, on="a", right_on="node").map_batches(
        lambda b: b.rename(columns={"deg": "deg_a"}),
        batch_format="pandas")
    abd = hash_join(ab.materialize(), deg, on="b",
                    right_on="node", empty_safe=True).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}),
        batch_format="pandas")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        fwd = (b["deg_a"] < b["deg_b"]) | (
            (b["deg_a"] == b["deg_b"]) & (b["a"] < b["b"]))
        f = fwd.to_numpy()
        return pd.DataFrame({
            "u": np.where(f, b["a"], b["b"]),
            "v": np.where(f, b["b"], b["a"]),
            "deg_v": np.where(f, b["deg_b"], b["deg_a"]),
            "__bk": pd.util.hash_array(
                np.where(f, b["a"], b["b"])) % n_buckets,
        })

    oriented = abd.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "deg_v", "v"], kind="mergesort")
        u_arr = g["u"].to_numpy(dtype=object)
        v_arr = g["v"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.r_[True, u_arr[1:] != u_arr[:-1]]) if len(u_arr) else \
            np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(u_arr)])
        first, second = _pair_ranges(sizes)
        return pd.DataFrame({"wu": u_arr[first], "wv": v_arr[first],
                             "ww": v_arr[second]})

    wedge_ds = oriented.groupby("__bk").map_groups(
        wedges, batch_format="pandas").materialize()
    closed = None
    if wedge_ds.count():
        closed = hash_join(
            wedge_ds,
            oriented.map_batches(lambda b: b[["u", "v"]],
                                 batch_format="pandas"),
            on=["wv", "ww"], right_on=["u", "v"],
        )

    def edge_hits(b: pd.DataFrame) -> pd.DataFrame:
        xs = pd.concat([b["wu"], b["wu"], b["wv"]], ignore_index=True)
        ys = pd.concat([b["wv"], b["ww"], b["ww"]], ignore_index=True)
        x = xs.to_numpy(dtype=object)
        y = ys.to_numpy(dtype=object)
        fwd = x < y
        return pd.DataFrame({"a": np.where(fwd, x, y),
                             "b": np.where(fwd, y, x)})

    if closed is not None:
        commons = groupby_agg(
            closed.map_batches(edge_hits, batch_format="pandas"),
            ["a", "b"], [("a", "count", "common")],
        ).materialize()
    else:
        # wedge-free graph: no edge has a shared neighbor (the empty
        # side must carry a schema for the left join to null-extend)
        import pyarrow as pa

        import ray.data as rd

        commons = rd.from_arrow(pa.table({
            "a": pa.array([], pa.large_string()),
            "b": pa.array([], pa.large_string()),
            "common": pa.array([], pa.int64())}))
    withc = hash_join(und, commons, on=["a", "b"],
                      how="left_outer", empty_safe=True)
    withd = hash_join(
        hash_join(withc.materialize(), deg, on="a",
                  right_on="node", empty_safe=True).map_batches(
            lambda b: b.rename(columns={"deg": "deg_a"}),
            batch_format="pandas").materialize(),
        deg, on="b", right_on="node", empty_safe=True).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}),
        batch_format="pandas")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        c = b["common"].fillna(0).astype("int64")
        da = b["deg_a"].astype("int64")
        db = b["deg_b"].astype("int64")
        return pd.DataFrame({
            "entity_a": b["a"], "entity_b": b["b"], "common": c,
            "deg_a": da, "deg_b": db,
            "jaccard": c.to_numpy("int64").astype("float64") / (
                da.to_numpy("int64").astype("float64")
                + db.to_numpy("int64").astype("float64")
                - c.to_numpy("int64").astype("float64")),
        })

    return withd.map_batches(
        finish, batch_format="pandas").sort(["entity_a", "entity_b"])


# ---- link prediction: Adamic-Adar / resource allocation --------------------

_AA_SCALE = 10 ** 12


def _apex_terms(deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-scaled per-apex link-score terms.  An apex (the shared
    neighbor of an edge's endpoints) always sits in a triangle, so its
    undirected degree is ≥ 2 and ln(deg) > 0.  Both terms are one
    IEEE-exact double op + floor (ln and / are bit-identical between
    numpy and DuckDB on this target), so SUMS of them are exact int64
    — order-free, hashable cross-engine."""
    aa = np.zeros(len(deg), np.int64)
    ok = deg >= 2
    aa[ok] = np.floor(
        float(_AA_SCALE) / np.log(deg[ok].astype(np.float64))
    ).astype(np.int64)
    ra = (_AA_SCALE // np.maximum(deg, 1)).astype(np.int64)
    return aa, ra


def _link_aa_driver(edges: pd.DataFrame, src: str, dst: str, *,
                    wedge_limit: int) -> pd.DataFrame:
    """The link_jaccard wedge kernel with hits carrying APEX identity:
    each closed wedge {wu; wv, ww} contributes apex ww to edge (wu,wv),
    apex wv to (wu,ww) and apex wu to (wv,ww); per-edge scores are the
    integer sums of the apex terms."""
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    empty = pd.DataFrame({
        "entity_a": pd.Series([], dtype=object),
        "entity_b": pd.Series([], dtype=object),
        "common": pd.Series([], dtype="int64"),
        "aa_scaled": pd.Series([], dtype="int64"),
        "ra_scaled": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    keep = s_i != d_i
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)
    lo, hi = ukey // n, ukey % n
    deg = (np.bincount(lo, minlength=n)
           + np.bincount(hi, minlength=n)).astype(np.int64)
    aa_t, ra_t = _apex_terms(deg)
    order = np.lexsort((np.arange(n), deg))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    fwd = rank[lo] < rank[hi]
    u = np.where(fwd, lo, hi)
    v = np.where(fwd, hi, lo)
    o2 = np.lexsort((rank[v], u))
    u, v = u[o2], v[o2]
    m = len(u)
    grp_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
        if m else np.array([], np.int64)
    sizes = np.diff(np.r_[grp_start, m])
    n_wedges = int((sizes * (sizes - 1) // 2).sum())
    if n_wedges > wedge_limit:
        raise GuardExceeded(
            f"link_adamic_adar(mode='driver'): {n_wedges} wedges > "
            f"{wedge_limit}; use mode='shuffle'")
    first, second = _pair_ranges(sizes)
    wu, wv, ww = u[first], v[first], v[second]
    ekey = u * n + v
    sort_pos = np.argsort(ekey, kind="stable")
    ekey_sorted = ekey[sort_pos]
    wkey = wv * n + ww
    pos = np.searchsorted(ekey_sorted, wkey)
    pos_c = np.minimum(pos, max(m - 1, 0))
    hit = (pos < m) & (ekey_sorted[pos_c] == wkey) if m else \
        np.zeros(len(wkey), bool)

    def edge_pos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return sort_pos[np.searchsorted(ekey_sorted, a * n + b)]

    common = np.zeros(m, np.int64)
    aa = np.zeros(m, np.int64)
    ra = np.zeros(m, np.int64)
    if hit.any():
        for ea, eb, apex in ((wu, wv, ww), (wu, ww, wv), (wv, ww, wu)):
            p = edge_pos(ea[hit], eb[hit])
            np.add.at(common, p, 1)
            np.add.at(aa, p, aa_t[apex[hit]])
            np.add.at(ra, p, ra_t[apex[hit]])
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    out = pd.DataFrame({
        "entity_a": nodes[a], "entity_b": nodes[b],
        "common": common, "aa_scaled": aa, "ra_scaled": ra,
    })
    return out.sort_values(["entity_a", "entity_b"]).reset_index(drop=True)


def _link_aa_shuffle(edges_ds, src: str, dst: str,
                     n_buckets: int | None = None):
    """Dataset plan: the link_jaccard shuffle pipeline with edge_hits
    emitting (edge, apex) rows; apex degree arrives by one hash join
    against the degree table, the per-row term is computed in-batch
    (vectorized), and one pre-combined groupby sums terms per edge."""
    from .relational import (
        default_n_buckets,
        distinct_on,
        groupby_agg,
        hash_join,
    )

    if n_buckets is None:
        n_buckets = default_n_buckets()

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        s = b[src].to_numpy(dtype=object)
        d = b[dst].to_numpy(dtype=object)
        fwd = s < d
        return pd.DataFrame({"a": np.where(fwd, s, d),
                             "b": np.where(fwd, d, s)})

    und = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"), ["a", "b"]
    ).materialize()
    deg = groupby_agg(
        und.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["a"], b["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "deg")],
    ).materialize()
    ab = hash_join(und, deg, on="a", right_on="node").map_batches(
        lambda b: b.rename(columns={"deg": "deg_a"}),
        batch_format="pandas")
    abd = hash_join(ab.materialize(), deg, on="b",
                    right_on="node", empty_safe=True).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}),
        batch_format="pandas")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        fwd = (b["deg_a"] < b["deg_b"]) | (
            (b["deg_a"] == b["deg_b"]) & (b["a"] < b["b"]))
        f = fwd.to_numpy()
        return pd.DataFrame({
            "u": np.where(f, b["a"], b["b"]),
            "v": np.where(f, b["b"], b["a"]),
            "deg_v": np.where(f, b["deg_b"], b["deg_a"]),
            "__bk": pd.util.hash_array(
                np.where(f, b["a"], b["b"])) % n_buckets,
        })

    oriented = abd.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "deg_v", "v"], kind="mergesort")
        u_arr = g["u"].to_numpy(dtype=object)
        v_arr = g["v"].to_numpy(dtype=object)
        starts = np.flatnonzero(
            np.r_[True, u_arr[1:] != u_arr[:-1]]) if len(u_arr) else \
            np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(u_arr)])
        first, second = _pair_ranges(sizes)
        return pd.DataFrame({"wu": u_arr[first], "wv": v_arr[first],
                             "ww": v_arr[second]})

    wedge_ds = oriented.groupby("__bk").map_groups(
        wedges, batch_format="pandas").materialize()
    closed = None
    if wedge_ds.count():
        closed = hash_join(
            wedge_ds,
            oriented.map_batches(lambda b: b[["u", "v"]],
                                 batch_format="pandas"),
            on=["wv", "ww"], right_on=["u", "v"],
        )

    def edge_apex(b: pd.DataFrame) -> pd.DataFrame:
        xs = pd.concat([b["wu"], b["wu"], b["wv"]], ignore_index=True)
        ys = pd.concat([b["wv"], b["ww"], b["ww"]], ignore_index=True)
        ap = pd.concat([b["ww"], b["wv"], b["wu"]], ignore_index=True)
        x = xs.to_numpy(dtype=object)
        y = ys.to_numpy(dtype=object)
        fwd = x < y
        return pd.DataFrame({"a": np.where(fwd, x, y),
                             "b": np.where(fwd, y, x),
                             "apex": ap.to_numpy(dtype=object)})

    def terms(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy("int64")
        aa_t, ra_t = _apex_terms(d)
        return pd.DataFrame({"a": b["a"], "b": b["b"],
                             "aa_t": aa_t, "ra_t": ra_t})

    if closed is not None:
        hits = closed.map_batches(edge_apex, batch_format="pandas")
        withdeg = hash_join(hits.materialize(), deg, on="apex",
                            right_on="node", empty_safe=True)
        scores = groupby_agg(
            withdeg.map_batches(terms, batch_format="pandas"),
            ["a", "b"], [("a", "count", "common"),
                         ("aa_t", "sum", "aa_scaled"),
                         ("ra_t", "sum", "ra_scaled")],
        ).materialize()
    else:
        import pyarrow as pa

        import ray.data as rd

        scores = rd.from_arrow(pa.table({
            "a": pa.array([], pa.large_string()),
            "b": pa.array([], pa.large_string()),
            "common": pa.array([], pa.int64()),
            "aa_scaled": pa.array([], pa.int64()),
            "ra_scaled": pa.array([], pa.int64())}))
    withc = hash_join(und, scores, on=["a", "b"],
                      how="left_outer", empty_safe=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "entity_a": b["a"], "entity_b": b["b"],
            "common": b["common"].fillna(0).astype("int64"),
            "aa_scaled": b["aa_scaled"].fillna(0).astype("int64"),
            "ra_scaled": b["ra_scaled"].fillna(0).astype("int64"),
        })

    return withc.map_batches(
        finish, batch_format="pandas").sort(["entity_a", "entity_b"])


def link_adamic_adar(edges_ds, *, src: str = "src", dst: str = "dst",
                     mode: str = "auto",
                     driver_edge_limit: int = _DEF_EDGE_LIMIT,
                     wedge_limit: int = 100_000_000):
    """Adamic-Adar and resource-allocation link-prediction scores for
    every existing edge of the undirected distinct graph (Adamic &
    Adar 2003; Zhou/Lü/Zhang 2009 — public formulas): over shared
    neighbors w of the edge's endpoints, AA sums 1/ln(deg(w)) and RA
    sums 1/deg(w).  Both are kept INTEGER-EXACT as sums of
    floor(1e12/ln(deg)) / floor-div terms so any engine reproduces the
    bytes (float sums would be order-dependent and unhashable).  Same
    degree-ordered O(m^1.5) wedge kernel and guards as link_jaccard;
    mode="auto" degrades driver → shuffle."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _link_aa_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, wedge_limit=wedge_limit)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _link_aa_shuffle(edges_ds, src, dst)


def link_jaccard(edges_ds, *, src: str = "src", dst: str = "dst",
                 mode: str = "auto",
                 driver_edge_limit: int = _DEF_EDGE_LIMIT,
                 wedge_limit: int = 100_000_000):
    """Link-prediction scores for every EXISTING edge of the undirected
    distinct graph: common-neighbor count and neighborhood Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)| (Liben-Nowell & Kleinberg 2003, public).
    Exact integer counts; the division is one int→double op so any
    engine reproduces the doubles bit-for-bit.  Scale shape mirrors
    triangle_count: degree-ordered orientation bounds the wedge
    fan-out at O(m^1.5) under Zipf hubs; mode="shuffle" is the
    bounded-exchange Dataset plan, mode="auto" degrades driver →
    shuffle at the guards."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _link_jaccard_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, wedge_limit=wedge_limit)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _link_jaccard_shuffle(edges_ds, src, dst)


# ---- 2-hop neighborhoods ------------------------------------------------


def two_hop_counts(edges_ds, *, src: str = "src", dst: str = "dst",
                   mode: str = "auto",
                   driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Exact DISTINCT 2-hop out-neighborhood size per node (a→b→c,
    a ≠ c): the GNN receptive-field / friend-of-friend statistic.
    One self-join on the middle node, one distinct, one pre-combined
    count — the join fan-out is Σ outdeg(b)·indeg(b), the honest cost
    of the exact statistic (sketched variants live in sketches.py)."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][[src, dst]]
        return b.rename(columns={src: "a", dst: "b"})

    e1 = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"]).materialize()
    if mode in ("driver", "auto") and e1.count() <= driver_edge_limit:
        df = e1.to_pandas()
        two = df.merge(df.rename(columns={"a": "b", "b": "c"}), on="b")
        two = two[two.a != two.c][["a", "c"]].drop_duplicates()
        out = (two.groupby("a", as_index=False).size()
               .rename(columns={"a": "entity", "size": "n_two_hop"})
               .astype({"n_two_hop": "int64"})
               .sort_values("entity").reset_index(drop=True))
        return rd.from_pandas(out)
    if mode == "driver":
        raise GuardExceeded(
            f"two_hop_counts(mode='driver'): > {driver_edge_limit} "
            "distinct edges; use mode='shuffle'")
    e2 = e1.map_batches(
        lambda t: t.rename(columns={"a": "b", "b": "c"}),
        batch_format="pandas")
    pairs = hash_join(e1, e2.materialize(), on="b",
                      empty_safe=True).map_batches(
        lambda t: t[t["a"] != t["c"]][["a", "c"]],
        batch_format="pandas")
    ded = distinct_on(pairs, ["a", "c"])
    out = groupby_agg(ded.map_batches(
        lambda t: t.rename(columns={"a": "entity"})[["entity"]],
        batch_format="pandas"),
        ["entity"], [("entity", "count", "n_two_hop")])
    return out.sort("entity")


# ---- strongly connected components (bounded pivot FW-BW) -------------------


def _reach(adj: dict, start) -> set:
    seen = {start}
    stack = [start]
    while stack:
        x = stack.pop()
        for y in adj.get(x, ()):
            if y not in seen:
                seen.add(y)
                stack.append(y)
    return seen


def _scc_driver(edges: pd.DataFrame, *, pivots: int) -> pd.DataFrame:
    fwd: dict = {}
    bwd: dict = {}
    nodes = set()
    for a, b in zip(edges["src"], edges["dst"]):
        if a == b:
            continue
        fwd.setdefault(a, set()).add(b)
        bwd.setdefault(b, set()).add(a)
        nodes.add(a)
        nodes.add(b)
    scc: dict = {}
    # trim: a node with no in-edges or no out-edges is its own SCC
    for v in nodes:
        if not fwd.get(v) or not bwd.get(v):
            scc[v] = (v, True)
    for _ in range(pivots):
        rest = [v for v in nodes if v not in scc]
        if not rest:
            break
        pivot = min(rest)
        comp = _reach(fwd, pivot) & _reach(bwd, pivot)
        for v in comp:
            if v not in scc:
                scc[v] = (pivot, True)
    rows = [(v, scc[v][0] if v in scc else v, v in scc)
            for v in sorted(nodes)]
    return pd.DataFrame(rows, columns=["entity", "scc_id", "assigned"])


def scc(edges_ds, *, src: str = "src", dst: str = "dst",
        pivots: int = 6, mode: str = "auto",
        driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Strongly connected components by TRIM + bounded pivot
    forward-backward (Fleischer/Hendrickson/Pinar 2000, public), with
    deterministic semantics any engine replays:

    1. TRIM: a node with zero in-edges or zero out-edges (full graph)
       is its own singleton SCC;
    2. K pivot rounds: pivot = the lexicographically-smallest
       still-unassigned node; its SCC is forward-reach ∩
       backward-reach (closures over the FULL graph — SCC membership
       is independent of earlier assignments since SCCs are disjoint);
       unassigned members get scc_id = pivot;
    3. nodes still unassigned after K pivots report
       ``assigned=false`` with themselves as scc_id — the bounded
       contract, same honesty as label_components' converged flag.

    Scale shape: the trim is two pre-combined degree groupbys; each
    pivot round is two frontier-Dataset BFS closures (the bfs_distances
    machinery) plus one broadcast membership probe — K is explicit
    cost.  mode="driver" runs the identical semantics via set walks
    under the edge guard; mode="auto" degrades."""
    import ray.data as rd

    from .relational import bcast_get, distinct_on, groupby_agg

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _scc_driver(
                _edges_to_driver(edges_ds, src, dst,
                                 driver_edge_limit).rename(
                    columns={src: "src", dst: "dst"}),
                pivots=pivots)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    import ray

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][[src, dst]]
        return b.rename(columns={src: "src", dst: "dst"})

    edges = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["src", "dst"]).materialize()
    nodes_ds = distinct_on(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["src"], b["dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"]).materialize()
    outs = groupby_agg(edges, ["src"], [("src", "count", "o")])
    ins = groupby_agg(edges, ["dst"], [("dst", "count", "i")])
    has_out = frozenset(outs.to_pandas()["src"])
    has_in = frozenset(ins.to_pandas()["dst"])
    # NOTE: the degree KEY SETS (distinct nodes with any in/out edge)
    # are broadcast — O(nodes), the same budget as the scores/labels
    # tables every other whole-graph op carries.
    assigned: dict = {}
    all_nodes = nodes_ds.to_pandas()["node"]
    for v in all_nodes:
        if v not in has_out or v not in has_in:
            assigned[v] = v

    def frontier_closure(start, col_from: str, col_to: str) -> frozenset:
        """BFS to closure as bounded frontier joins: only NEW nodes
        re-enter the frontier, so total work is O(E) per closure."""
        seen = {start}
        frontier = rd.from_pandas(pd.DataFrame({"node": [start]}))
        while True:
            seen_ref = ray.put(frozenset(seen))
            step = frontier.map_batches(
                lambda b: b.rename(columns={"node": col_from}),
                batch_format="pandas")
            from .relational import hash_join

            nxt = hash_join(edges, step.materialize(), on=col_from,
                            empty_safe=True).map_batches(
                lambda b, sr=seen_ref: pd.DataFrame({
                    "node": b[col_to][~b[col_to].isin(
                        bcast_get(sr))].unique()}),
                batch_format="pandas")
            ndf = distinct_on(nxt, ["node"]).to_pandas()
            # to_pandas() on an all-empty dataset drops columns
            if "node" not in ndf.columns or not len(ndf):
                return frozenset(seen)
            new = ndf["node"]
            seen.update(new)
            frontier = rd.from_pandas(pd.DataFrame({"node": new}))

    for _ in range(pivots):
        rest = [v for v in all_nodes if v not in assigned]
        if not rest:
            break
        pivot = min(rest)
        comp = (frontier_closure(pivot, "src", "dst")
                & frontier_closure(pivot, "dst", "src"))
        for v in comp:
            if v not in assigned:
                assigned[v] = pivot
    out = pd.DataFrame({
        "entity": sorted(all_nodes),
    })
    out["scc_id"] = out["entity"].map(
        lambda v: assigned.get(v, v))
    out["assigned"] = out["entity"].map(
        lambda v: v in assigned)
    return rd.from_pandas(out)


# ---- label-propagation communities -----------------------------------------


def _lpa_driver(edges: pd.DataFrame, src: str, dst: str, *,
                rounds: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "community": pd.Series([], dtype=object)})
    u_s = np.concatenate([s_i, d_i])
    u_d = np.concatenate([d_i, s_i])
    # distinct undirected neighbor pairs (edge multiplicity must not
    # weight the vote — same contract as the SQL UNION)
    pair = np.unique(u_d * np.int64(n) + u_s)
    u_d, u_s = pair // n, pair % n
    lbl = np.arange(n, dtype=np.int64)  # codes ARE lexicographic rank
    for _ in range(rounds):
        key = u_d * np.int64(n) + lbl[u_s]
        uk, cnt = np.unique(key, return_counts=True)
        v, lab = uk // n, uk % n
        # argmax count per v, tie-break min label: sort (v, -cnt, lab)
        order = np.lexsort((lab, -cnt, v))
        v, lab = v[order], lab[order]
        first = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        nxt = lbl.copy()
        nxt[v[first]] = lab[first]
        lbl = nxt
    out = pd.DataFrame({"entity": nodes, "community": nodes[lbl]})
    return out.sort_values("entity").reset_index(drop=True)


def _lpa_shuffle(edges_ds, src: str, dst: str, *, rounds: int):
    """Dataset-native synchronous LPA: each round is labels ⋈ distinct
    undirected edges → pre-combined (node, label) vote counts →
    grouped_topk argmax (count desc, label asc)."""
    import ray.data as rd

    from .relational import (distinct_on, groupby_agg, grouped_topk,
                             hash_join)

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = distinct_on(und, ["__src", "__dst"]).materialize()
    nodes = distinct_on(
        und.map_batches(lambda b: pd.DataFrame({"node": b["__src"]}),
                        batch_format="pandas"),
        ["node"],
    ).materialize()
    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "community": pd.Series([], dtype=object)}))
    labels = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"], "lbl": b["node"]}),
        batch_format="pandas",
    ).materialize()
    for _ in range(rounds):
        votes = hash_join(und, labels, on="__src", right_on="node",
                          empty_safe=True).map_batches(
            lambda b: b[["__dst", "lbl"]], batch_format="pandas")
        cnt = groupby_agg(votes, ["__dst", "lbl"],
                          [("lbl", "count", "c")])
        win = grouped_topk(cnt, ["__dst"], "c", 1, descending=True,
                           tie_break="lbl")
        labels = win.map_batches(
            lambda b: pd.DataFrame({"node": b["__dst"], "lbl": b["lbl"]}),
            batch_format="pandas",
        ).materialize()
    return labels.map_batches(
        lambda b: pd.DataFrame({"entity": b["node"],
                                "community": b["lbl"]}),
        batch_format="pandas",
    ).sort("entity")


def label_propagation(edges_ds, *, src: str = "src", dst: str = "dst",
                      rounds: int = 4, mode: str = "auto",
                      driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Community detection by SYNCHRONOUS frequency label propagation
    (Raghavan et al. 2007) over the distinct undirected view of
    (src, dst), self-loops dropped: every node starts as its own
    community; each round it adopts the most frequent label among its
    neighbors' previous-round labels, ties broken by lexicographic min
    label.  FIXED rounds is the contract (synchronous LPA can
    oscillate on bipartite structures; a bounded round count makes the
    result deterministic, cross-engine exact, and the distributed cost
    explicit: K rounds = K bounded exchanges).  Unlike
    :func:`label_components` (min-label → connected components) the
    frequency vote yields sub-component communities.

    Reference analog: the Neo4j sink's exported graph is what the
    reference runs community analyses on (Neo4jSink); our engine runs
    them in place."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _lpa_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, rounds=rounds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _lpa_shuffle(edges_ds, src, dst, rounds=rounds)


# ---- KG-embedding triple scoring -------------------------------------------


def transe_scores(triples_ds, *, subj: str = "subj", pred: str = "pred",
                  obj: str = "obj", dims: int = 4):
    """TransE triple-plausibility scores (Bordes et al. 2013): the
    energy ``score(h, r, t) = Σ_i |E(h,i) + R(r,i) - E(t,i)|`` under
    L1, over the DISTINCT (subj, pred, obj) triples.  Embeddings are
    the model seam: a trained KGE model's vectors plug in here; none
    ships in this container, so components derive per (string, dim)
    from ``md5_32(x || '|' || i) % 2001 - 1000`` — integer, so the
    energy is EXACT and the SQL oracle hash-matches (the repo's
    standard model-seam rule, sparse.py:43).  Low score = the relation
    geometrically "fits" — the triple-ranking signal KG-completion
    pipelines compute at scale.

    Scale shape: embeddings are DERIVED per batch (md5 once per unique
    string per block, numpy gather + abs-sum over dims) — no embedding
    table is joined or broadcast, so the only exchange is the upstream
    distinct."""
    import hashlib

    from .relational import distinct_on

    def emb_matrix(keys: np.ndarray) -> np.ndarray:
        out = np.empty((len(keys), dims), dtype=np.int64)
        for j, k in enumerate(keys):
            for i in range(dims):
                h = hashlib.md5(f"{k}|{i}".encode()).hexdigest()[:8]
                out[j, i] = int(h, 16) % 2001 - 1000
        return out

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({
                subj: pd.Series([], dtype=object),
                pred: pd.Series([], dtype=object),
                obj: pd.Series([], dtype=object),
                "transe_score": pd.Series([], dtype="int64")})
        ents = pd.unique(np.concatenate(
            [b[subj].to_numpy(object), b[obj].to_numpy(object)]))
        preds = pd.unique(b[pred].to_numpy(object))
        e_tab = emb_matrix(ents)
        p_tab = emb_matrix(preds)
        e_idx = {k: j for j, k in enumerate(ents)}
        p_idx = {k: j for j, k in enumerate(preds)}
        h = e_tab[b[subj].map(e_idx).to_numpy(np.int64)]
        r = p_tab[b[pred].map(p_idx).to_numpy(np.int64)]
        t = e_tab[b[obj].map(e_idx).to_numpy(np.int64)]
        return pd.DataFrame({
            subj: b[subj].values, pred: b[pred].values,
            obj: b[obj].values,
            "transe_score": np.abs(h + r - t).sum(axis=1)})

    tri = distinct_on(triples_ds, [subj, pred, obj])
    return tri.map_batches(score, batch_format="pandas")


# ---- weighted shortest paths (Bellman-Ford rounds) -------------------------


def _wedges_to_driver(edges_ds, src: str, dst: str, weight: str,
                      limit: int) -> pd.DataFrame:
    """Distinct undirected weighted edge list on the driver, guarded:
    both directions, self-loops dropped, min weight per directed pair
    (the tie rule a multi-weight input resolves to)."""
    seen: pd.DataFrame | None = None
    for b in edges_ds.iter_batches(batch_format="pandas",
                                   batch_size=None):
        b = b[[src, dst, weight]][b[src] != b[dst]]
        u = pd.DataFrame({
            "s": pd.concat([b[src], b[dst]], ignore_index=True),
            "d": pd.concat([b[dst], b[src]], ignore_index=True),
            "w": pd.concat([b[weight], b[weight]], ignore_index=True),
        })
        seen = u if seen is None else pd.concat([seen, u],
                                                ignore_index=True)
        seen = seen.groupby(["s", "d"], as_index=False)["w"].min()
        if len(seen) > limit:
            raise GuardExceeded(
                f"sssp(mode='driver'): > {limit} distinct edges; "
                "use mode='shuffle'")
    if seen is None:
        return pd.DataFrame({"s": [], "d": [], "w": []})
    return seen


def _sssp_driver(und: pd.DataFrame, seeds: np.ndarray, *,
                 rounds: int) -> pd.DataFrame:
    nodes = np.unique(np.concatenate([
        und["s"].to_numpy(object), und["d"].to_numpy(object),
        seeds.astype(object)]))
    if len(nodes) == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "dist": pd.Series([], dtype="int64"),
                             "converged": pd.Series([], dtype=bool)})
    s_i = np.searchsorted(nodes, und["s"].to_numpy(object))
    d_i = np.searchsorted(nodes, und["d"].to_numpy(object))
    w = und["w"].to_numpy(np.int64)
    INF = np.iinfo(np.int64).max // 4
    dist = np.full(len(nodes), INF, dtype=np.int64)
    dist[np.searchsorted(nodes, seeds.astype(object))] = 0

    def advance(d0):
        nxt = d0.copy()
        cand = d0[s_i]
        ok = cand < INF
        np.minimum.at(nxt, d_i[ok], cand[ok] + w[ok])
        return nxt

    for _ in range(rounds):
        dist = advance(dist)
    conv = bool((advance(dist) == dist).all())
    reached = dist < INF
    out = pd.DataFrame({"entity": nodes[reached],
                        "dist": dist[reached],
                        "converged": conv})
    return out.sort_values("entity").reset_index(drop=True)


def _sssp_shuffle(edges_ds, seeds_ds, src: str, dst: str, weight: str,
                  seed_col: str, *, rounds: int):
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
            "__w": pd.concat([b[weight], b[weight]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = groupby_agg(und, ["__src", "__dst"],
                      [("__w", "min", "__w")]).materialize()

    def advance(labels):
        relax = hash_join(und, labels, on="__src", right_on="node",
                          empty_safe=True).map_batches(
            lambda b: pd.DataFrame({"node": b["__dst"],
                                    "dist": b["dist"] + b["__w"]}),
            batch_format="pandas")
        both = labels.union(relax)
        return groupby_agg(both, ["node"],
                           [("dist", "min", "dist")]).materialize()

    labels = distinct_on(
        seeds_ds.map_batches(
            lambda b: pd.DataFrame({"node": b[seed_col], "dist": 0}),
            batch_format="pandas"),
        ["node"],
    ).materialize()
    for _ in range(rounds):
        labels = advance(labels)
    probe = advance(labels)
    # min is monotone non-increasing and the reached set non-decreasing,
    # so (count, sum) equality == fixpoint
    def _sig(ds):
        agg = ds.map_batches(
            lambda b: pd.DataFrame({"n": [len(b)],
                                    "s": [int(b["dist"].sum())]}),
            batch_format="pandas").to_pandas()
        return int(agg["n"].sum()), int(agg["s"].sum())

    conv = _sig(probe) == _sig(labels)
    return labels.map_batches(
        lambda b: pd.DataFrame({"entity": b["node"],
                                "dist": b["dist"].astype("int64"),
                                "converged": conv}),
        batch_format="pandas",
    ).sort("entity")


def sssp(edges_ds, seeds_ds, *, src: str = "src", dst: str = "dst",
         weight: str = "w", seed_col: str = "node", rounds: int = 8,
         mode: str = "auto", driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Multi-source WEIGHTED shortest-path distances (synchronous
    Bellman-Ford for a FIXED number of relaxation rounds) over the
    undirected view of (src, dst, weight), self-loops dropped, min
    weight per directed pair.  After K rounds the distance is exact
    over paths of ≤ K edges — the bounded-exchange contract every
    other iterative operator here uses; ``converged`` reports whether
    round K+1 would improve anything.  Returns REACHED nodes only.

    Scale shape: driver mode = guarded distinct weighted edge list +
    vectorized ``np.minimum.at`` relaxations; shuffle mode = K bounded
    exchanges (frontier ⋈ edges → +w → pre-combined min per node) —
    unlike BFS the frontier re-relaxes reached nodes, so each round is
    a full min-union, not an append."""
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "shuffle":
        return _sssp_shuffle(edges_ds, seeds_ds, src, dst, weight,
                             seed_col, rounds=rounds)
    try:
        import ray.data as rd

        und = _wedges_to_driver(edges_ds, src, dst, weight,
                                driver_edge_limit)
        seeds = _seeds_to_driver(seeds_ds, seed_col, driver_edge_limit)
        return rd.from_pandas(_sssp_driver(und, seeds, rounds=rounds))
    except GuardExceeded:
        if mode == "driver":
            raise
        return _sssp_shuffle(edges_ds, seeds_ds, src, dst, weight,
                             seed_col, rounds=rounds)


# ---- graph-level mixing statistics ------------------------------------------


def _mixing_driver(e: pd.DataFrame, src: str, dst: str) -> pd.DataFrame:
    """Vectorized pandas twin of the shuffle plan — identical integer
    sums, one driver pass over the (guarded) distinct edge list."""
    d = e[[src, dst]].rename(columns={src: "a", dst: "b"})
    d = d[d["a"] != d["b"]].drop_duplicates()
    m_dir = len(d)
    rev = d.rename(columns={"a": "b", "b": "a"}).assign(__r=1)
    n_recip = int(d.merge(rev, on=["a", "b"], how="left")["__r"]
                  .notna().sum())
    lo = d[["a", "b"]].min(axis=1)
    hi = d[["a", "b"]].max(axis=1)
    und = pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()
    deg = pd.concat([und["lo"], und["hi"]],
                    ignore_index=True).value_counts()
    j = deg.reindex(und["lo"]).to_numpy("int64")
    k = deg.reindex(und["hi"]).to_numpy("int64")
    m = len(und)
    s_jk = int((j * k).sum())
    s_sum = int((j + k).sum())
    s_sq = int((j ** 2 + k ** 2).sum())
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    return pd.DataFrame({
        "m_dir": [np.int64(m_dir)], "n_recip": [np.int64(n_recip)],
        "reciprocity": [np.float64(n_recip) / np.float64(m_dir)
                        if m_dir else 0.0],
        "m_und": [np.int64(m)],
        "assort_num": [np.int64(num)], "assort_den": [np.int64(den)],
        "assortativity": [np.float64(num) / np.float64(den)
                          if den else 0.0],
    })


def graph_mixing_stats(edges_ds, *, src: str = "src", dst: str = "dst",
                       mode: str = "auto",
                       driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """One-row graph-level mixing statistics over the distinct directed
    edge view (self-loops dropped): edge RECIPROCITY (share of directed
    edges whose reverse also exists — Garlaschelli & Loffredo 2004) and
    Newman DEGREE ASSORTATIVITY (2002) over the undirected view,
    computed from exact integer sums —

        r = (4·M·Σjk − (Σ(j+k))²) / (2·M·Σ(j²+k²) − (Σ(j+k))²)

    with j,k the endpoint degrees of each undirected edge and M the
    undirected edge count; numerator and denominator are emitted as
    exact int64 beside the one-IEEE-divide double (0.0 when the
    denominator is 0 — a regular graph has no degree variance), so the
    SQL oracle hash-matches.

    Scale shape: one distinct_on + one degree groupby + two hash joins
    (degree onto each endpoint) + single-row integer aggregation —
    every exchange is bounded by the distinct edge list.  mode="auto"
    (default) computes the same integers on the driver below the edge
    guard — the statistic is one row, and on a small graph the three
    Ray joins are pure orchestration overhead (measured 8.9 s → 0.04 s
    at 3.3k edges) — degrading to the shuffle plan past it."""
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            e = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
            return _mixing_driver(e, src, dst)
        except GuardExceeded:
            if mode == "driver":
                raise
    from .relational import distinct_on, groupby_agg, hash_join

    dirred = edges_ds.map_batches(
        lambda b: pd.DataFrame({"a": b[src], "b": b[dst]})
        .loc[lambda d: d["a"] != d["b"]],
        batch_format="pandas")
    dirred = distinct_on(dirred, ["a", "b"]).materialize()

    # reciprocity: key-match against the reversed view
    rev = dirred.map_batches(
        lambda b: pd.DataFrame({"a": b["b"], "b": b["a"],
                                "__r": np.int64(1)}),
        batch_format="pandas")
    both = hash_join(dirred, rev, on=["a", "b"], right_on=["a", "b"],
                     how="left_outer", empty_safe=True)
    rec = both.map_batches(
        lambda b: pd.DataFrame({
            "m_dir": [np.int64(len(b))],
            "n_recip": [np.int64(b["__r"].notna().sum())]}),
        batch_format="pandas").to_pandas().sum()
    m_dir, n_recip = int(rec["m_dir"]), int(rec["n_recip"])

    und = dirred.map_batches(
        lambda b: pd.DataFrame({
            "lo": b[["a", "b"]].min(axis=1),
            "hi": b[["a", "b"]].max(axis=1)}),
        batch_format="pandas")
    und = distinct_on(und, ["lo", "hi"]).materialize()
    deg_rows = und.map_batches(
        lambda b: pd.DataFrame({
            "v": pd.concat([b["lo"], b["hi"]], ignore_index=True)}),
        batch_format="pandas")
    deg = groupby_agg(deg_rows, ["v"], [("v", "count", "d")])
    j1 = hash_join(und, deg.materialize(), on="lo", right_on="v",
                   empty_safe=True).map_batches(
        lambda b: b.rename(columns={"d": "j"})[["lo", "hi", "j"]],
        batch_format="pandas")
    j2 = hash_join(j1, deg.materialize(), on="hi", right_on="v",
                   empty_safe=True).map_batches(
        lambda b: b.rename(columns={"d": "k"})[["j", "k"]],
        batch_format="pandas")
    sums = j2.map_batches(
        lambda b: pd.DataFrame({
            "m": [np.int64(len(b))],
            "s_jk": [np.int64((b["j"].to_numpy("int64")
                               * b["k"].to_numpy("int64")).sum())],
            "s_sum": [np.int64((b["j"] + b["k"]).sum())],
            "s_sq": [np.int64((b["j"].to_numpy("int64") ** 2
                               + b["k"].to_numpy("int64") ** 2).sum())],
        }), batch_format="pandas").to_pandas().sum()
    m = int(sums["m"])
    s_jk, s_sum, s_sq = int(sums["s_jk"]), int(sums["s_sum"]), int(sums["s_sq"])
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    return pd.DataFrame({
        "m_dir": [np.int64(m_dir)], "n_recip": [np.int64(n_recip)],
        "reciprocity": [np.float64(n_recip) / np.float64(m_dir)
                        if m_dir else 0.0],
        "m_und": [np.int64(m)],
        "assort_num": [np.int64(num)], "assort_den": [np.int64(den)],
        "assortativity": [np.float64(num) / np.float64(den)
                          if den else 0.0],
    })


# ---- node2vec biased walks --------------------------------------------------


def _walk_hash60(b: pd.DataFrame, step: int) -> pd.Series:
    """60-bit integer md5 draw per candidate (numeric so the node2vec
    bias can scale it; ('0x' || substr(md5(k),1,15))::BIGINT in SQL)."""
    import hashlib

    key = (b["start"].astype(str) + "|" + b["w"].astype(str)
           + f"|{step}|" + b["cur"].astype(str) + "|"
           + b["dst"].astype(str))
    return key.map(
        lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16))


def node2vec_walks(edges_ds, *, src: str = "src", dst: str = "dst",
                   walks_per_node: int = 2, length: int = 3,
                   p_inv: int = 4, q_inv: int = 2, mode: str = "auto"):
    """node2vec-style SECOND-ORDER biased walks (Grover & Leskovec
    2016) with deterministic pseudo-random steps: like
    :func:`random_walks` but each candidate's 60-bit md5 draw is
    SCALED by the integer inverse bias before the argmin —

        weight = p_inv  if dst == prev        (return,  α = 1/p)
               = 1      if edge(prev → dst)    (BFS-1,   α = 1)
               = q_inv  otherwise              (explore, α = 1/q)

    so returning / exploring candidates win the draw proportionally
    less often (p_inv, q_inv > 1 ≈ DFS-ish exploration; the
    deterministic analog of the walk-bias sampling).  Step 0 has no
    prev (sentinel ''): every candidate scales by the same q_inv, a
    common factor that argmin ignores — the first hop stays a uniform
    draw, exactly as in the paper.  Ties break on dst.  Walks stop at
    sinks.  Returns (start, w, step, node) rows.

    Scale shape: identical to random_walks (L bounded exchanges, state
    O(nodes × W)) plus one LEFT probe of the edge list per step for
    the BFS-1 test — the distributed second-order trick: the walker
    carries ``prev`` in its state row instead of materializing
    neighbor sets."""
    import ray.data as rd

    from .relational import distinct_on, grouped_topk, hash_join

    if mode not in ("shuffle", "auto"):
        raise ValueError("node2vec_walks runs the Dataset kernel only "
                         "(mode='shuffle'/'auto'); the per-step edge "
                         "probe makes a separate driver kernel "
                         "redundant")
    if p_inv < 1 or q_inv < 1:
        raise ValueError("p_inv and q_inv must be >= 1")

    def weight(cand: pd.DataFrame) -> np.ndarray:
        w = np.full(len(cand), q_inv, dtype=np.int64)
        w[cand["__bfs1"].values] = 1
        # return-bias beats BFS-1 when both hold (dst==prev is also a
        # prev-neighbor iff the graph repeats the edge both ways)
        w[cand["dst"].values == cand["prev"].values] = p_inv
        return w

    canon = edges_ds.map_batches(
        lambda b: pd.DataFrame({"e_src": b[src], "dst": b[dst]})
        .loc[lambda d: d["e_src"] != d["dst"]],
        batch_format="pandas")
    edges = distinct_on(canon, ["e_src", "dst"]).materialize()
    probe = edges.map_batches(
        lambda b: pd.DataFrame({"p_src": b["e_src"], "p_dst": b["dst"],
                                "__hit": np.int64(1)}),
        batch_format="pandas").materialize()
    nodes = distinct_on(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["e_src"], b["dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"]).materialize()

    def init(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "start": b["node"].to_numpy().repeat(walks_per_node),
            "w": np.tile(np.arange(walks_per_node, dtype=np.int64), n),
            "prev": "",
            "cur": b["node"].to_numpy().repeat(walks_per_node),
        })

    state = nodes.map_batches(init, batch_format="pandas").materialize()
    out_ds = state.map_batches(
        lambda b: pd.DataFrame({"start": b["start"], "w": b["w"],
                                "step": np.int64(0), "node": b["cur"]}),
        batch_format="pandas")
    for t in range(length):
        cand = hash_join(state, edges, on="cur", right_on="e_src",
                         empty_safe=True)
        cand = hash_join(cand, probe, on=["prev", "dst"],
                         right_on=["p_src", "p_dst"], how="left_outer",
                         empty_safe=True)

        def keyed(b: pd.DataFrame, st=t) -> pd.DataFrame:
            b = b.copy()
            b["__bfs1"] = b["__hit"].notna().values
            b["__key"] = _walk_hash60(b, st).to_numpy(np.int64) * weight(b)
            return b[["start", "w", "prev", "cur", "dst", "__key"]]

        picked = grouped_topk(
            cand.map_batches(keyed, batch_format="pandas"),
            ["start", "w"], "__key", 1, descending=False,
            tie_break="dst")
        state = picked.map_batches(
            lambda b: pd.DataFrame({"start": b["start"], "w": b["w"],
                                    "prev": b["cur"], "cur": b["dst"]}),
            batch_format="pandas").materialize()
        out_ds = out_ds.union(state.map_batches(
            lambda b, st=t: pd.DataFrame(
                {"start": b["start"], "w": b["w"],
                 "step": np.int64(st + 1), "node": b["cur"]}),
            batch_format="pandas"))
    return out_ds.sort(["start", "w", "step"])


# ---- k-truss -----------------------------------------------------------


def _canon_undirected(edges: pd.DataFrame, src: str, dst: str
                      ) -> pd.DataFrame:
    """Distinct canonical (a < b) undirected edge list, self-loops
    dropped."""
    e = edges[edges[src] != edges[dst]]
    a = np.minimum(e[src].to_numpy(), e[dst].to_numpy())
    b = np.maximum(e[src].to_numpy(), e[dst].to_numpy())
    return (pd.DataFrame({"a": a, "b": b})
            .drop_duplicates().reset_index(drop=True))


def _truss_support_int(a: np.ndarray, b: np.ndarray, n: int
                       ) -> np.ndarray:
    """Per-edge triangle support for an int-coded canonical (a < b)
    edge list, fully vectorized: wedges are the per-node neighbor-pair
    combinations (CSR expansion), closed by a searchsorted membership
    probe on the sorted edge keys, each triangle crediting its three
    edges via one bincount — no pandas joins (the merge-based wedge
    spent 8 s on 5M candidate rows; this path runs it in ~0.3 s)."""
    m = len(a)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    keys = a * n + b
    order = np.argsort(keys, kind="stable")
    sk = keys[order]  # sorted unique edge keys (input is distinct)
    # CSR of canonical neighbors (b ascending within each a)
    sa, sb = a[order], b[order]
    deg = np.bincount(sa, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum(deg)
    g = deg[sa]                       # group size per row
    pos = np.arange(m, dtype=np.int64) - indptr[sa]
    cnt = g - 1 - pos                 # partners after this row
    tot = int(cnt.sum())
    if tot == 0:
        return np.zeros(m, dtype=np.int64)[np.argsort(order)]
    # Σ deg²/2 wedge rows in one shot is NOT bounded by the edge-count
    # guard (one degree-1e5 hub alone yields ~5e9 rows): chunk the
    # expansion over edge ranges with a fixed wedge budget and
    # accumulate the three bincount credits incrementally — peak is
    # ~_WEDGE_CHUNK rows × a few int64 arrays, plus at most one edge's
    # own fan-out (< n), regardless of skew
    sup_sorted = np.zeros(m, dtype=np.int64)
    cumw = np.cumsum(cnt)
    cuts = np.searchsorted(
        cumw, np.arange(_WEDGE_CHUNK, tot, _WEDGE_CHUNK),
        side="left") + 1
    bounds = np.concatenate([[0], cuts, [m]])
    for r0, r1 in zip(bounds[:-1], bounds[1:]):
        if r0 >= r1:
            continue
        c = cnt[r0:r1]
        t = int(c.sum())
        if t == 0:
            continue
        rows = np.repeat(np.arange(r0, r1, dtype=np.int64), c)
        offs = np.arange(t, dtype=np.int64) - np.repeat(
            np.cumsum(c) - c, c)
        wb = sb[rows]                 # wedge (a; wb < wc)
        wc = sb[rows + 1 + offs]
        close = wb * n + wc
        p = np.searchsorted(sk, close)
        p[p >= m] = m - 1
        hit = sk[p] == close
        # triangle (sa[row], wb, wc): credit edges (a,wb)=row, (a,wc)
        # = row+1+offs, (wb,wc)=p — indices into the SORTED edge list
        sup_sorted += np.bincount(rows[hit], minlength=m)
        sup_sorted += np.bincount((rows + 1 + offs)[hit], minlength=m)
        sup_sorted += np.bincount(p[hit], minlength=m)
    out = np.empty(m, dtype=np.int64)
    out[order] = sup_sorted
    return out


def _ktruss_driver(edges: pd.DataFrame, src: str, dst: str, *, k: int,
                   rounds: int) -> pd.DataFrame:
    e = _canon_undirected(edges, src, dst)
    # peel on int codes: the wedge join fans out to Σ deg² rows, and
    # integer hash joins run ~5× faster than string joins at that
    # volume (measured 12.6 s → ~3 s at sf0.1's co-mention graph);
    # names come back only on the final rows
    codes, uniques = pd.factorize(
        pd.concat([e["a"], e["b"]], ignore_index=True))
    n = len(uniques)
    ca = codes[: len(e)].astype(np.int64)
    cb = codes[len(e):].astype(np.int64)
    # re-canonicalize in CODE order: the wedge closure compares codes,
    # so the pair orientation must be canonical under the same order
    a = np.minimum(ca, cb)
    b = np.maximum(ca, cb)
    for _ in range(rounds):
        if not len(a):
            break
        sup = _truss_support_int(a, b, n)
        keep = sup >= k - 2
        a, b = a[keep], b[keep]
    sup = _truss_support_int(a, b, n)
    if len(a):
        na, nb = uniques[a], uniques[b]
        out = pd.DataFrame({
            "a": np.minimum(na, nb),  # caller's (string) orientation
            "b": np.maximum(na, nb),
            "sup": sup,
            "converged": bool((sup >= k - 2).all()),
        })
    else:
        out = pd.DataFrame({"a": pd.Series([], dtype=object),
                            "b": pd.Series([], dtype=object),
                            "sup": pd.Series([], dtype="int64"),
                            "converged": pd.Series([], dtype=bool)})
    return (out.sort_values(["a", "b"], kind="mergesort")
            .reset_index(drop=True))


def _ktruss_shuffle(edges_ds, src: str, dst: str, *, k: int, rounds: int):
    """Dataset-native edge peel: per round one wedge self-join + one
    closing join + a credit groupby — ``rounds`` bounded exchanges,
    the edge set only shrinks.  The wedge join fans out to
    Σ_a deg(a)² rows; hot endpoints make ranges large, not wrong."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    empty = pd.DataFrame({"a": pd.Series([], dtype=object),
                          "b": pd.Series([], dtype=object),
                          "sup": pd.Series([], dtype="int64"),
                          "converged": pd.Series([], dtype=bool)})

    e = distinct_on(
        edges_ds.map_batches(
            lambda t: _canon_undirected(t, src, dst),
            batch_format="pandas"),
        ["a", "b"]).materialize()

    def support(e_ds):
        wedges = hash_join(
            e_ds,
            e_ds.map_batches(lambda t: t.rename(columns={"b": "c"}),
                             batch_format="pandas").materialize(),
            on="a", empty_safe=True)
        wedges = wedges.map_batches(lambda t: t[t["b"] < t["c"]],
                                    batch_format="pandas")
        tri = hash_join(
            wedges.materialize(),
            e_ds.map_batches(
                lambda t: t.rename(columns={"a": "b", "b": "c"}),
                batch_format="pandas").materialize(),
            on=["b", "c"], empty_safe=True)
        credit = tri.map_batches(
            lambda t: pd.concat([
                t[["a", "b"]],
                t[["a", "c"]].rename(columns={"c": "b"}),
                t[["b", "c"]].rename(columns={"b": "a", "c": "b"}),
            ], ignore_index=True),
            batch_format="pandas")
        return groupby_agg(credit, ["a", "b"],
                           [("a", "count", "sup")]).materialize()

    for _ in range(rounds):
        if e.count() == 0:
            return rd.from_pandas(empty)
        sup = support(e)
        e = sup.map_batches(
            lambda t: t[t["sup"] >= k - 2][["a", "b"]],
            batch_format="pandas").materialize()
    if e.count() == 0:
        return rd.from_pandas(empty)
    sup = support(e)
    final = hash_join(e, sup, on=["a", "b"], how="left_outer",
                      empty_safe=True).map_batches(
        lambda t: pd.DataFrame({
            "a": t["a"], "b": t["b"],
            "sup": t["sup"].fillna(0).astype("int64")}),
        batch_format="pandas").materialize()
    conv = bool(final.map_batches(
        lambda t: pd.DataFrame({"m": [bool((t["sup"] >= k - 2).all())]}),
        batch_format="pandas").to_pandas()["m"].all())
    return final.map_batches(lambda t: t.assign(converged=conv),
                             batch_format="pandas").sort(["a", "b"])


def k_truss(edges_ds, *, src: str = "src", dst: str = "dst", k: int = 3,
            rounds: int = 4, mode: str = "auto",
            driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Bounded-round k-truss peel (Cohen 2008, public) over the
    undirected distinct view of (src, dst): ``rounds`` times, drop
    every edge participating in fewer than k-2 triangles among
    SURVIVING edges.  Returns surviving edges as (a, b, sup int64 —
    triangle support within the surviving subgraph, converged bool —
    whether every survivor already meets the bar).  Exact k-truss
    wherever the peel depth ≤ rounds — the same bounded-exchange
    contract as :func:`k_core`, one level up (edges instead of
    nodes).

    Reference analog: the reference prunes EDGES against a structural
    criterion in EOG truncation (EvaluationOrderGraphPass.java:220-260
    removes edges failing backward reachability); k-truss is the same
    edge-peel shape with triangle support as the criterion."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _ktruss_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, k=k, rounds=rounds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _ktruss_shuffle(edges_ds, src, dst, k=k, rounds=rounds)


# ---- harmonic centrality (bounded hops) ---------------------------------


def harmonic_centrality(edges_ds, *, src: str = "src", dst: str = "dst",
                        max_hops: int = 3, mode: str = "auto",
                        driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Bounded-hop harmonic centrality (Marchiori & Latora 2000,
    public) over the undirected distinct view of (src, dst):
    H(v) = Σ_{u: 0 < d(u,v) ≤ max_hops} 1/d(u,v), reported as the
    exact integer ``Σ scale/d`` with ``scale = lcm(1..max_hops)·10⁶``
    (every term divides evenly — no float division anywhere, so the
    SQL oracle hash-matches).  Returns (entity, harmonic int64) for
    every non-isolated node.

    Scale shape: level sets, not per-source BFS — hop-h pairs come from
    ONE join of the hop-(h-1) level against the edge list, deduplicated
    and anti-joined against all closer levels, so the exchange count is
    max_hops·2 regardless of node count; the per-level pair volume is
    the honest cost of the exact statistic (sketches.py holds the
    approximate alternatives).

    Reference analog: followNextEOG's bounded-depth reachability
    (EdgeCachePass.kt:79-100) — the same closure, with 1/d credit."""
    import math

    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    scale = math.lcm(*range(1, max_hops + 1)) * 1_000_000

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        return pd.DataFrame({
            "a": pd.concat([b[src], b[dst]], ignore_index=True),
            "c": pd.concat([b[dst], b[src]], ignore_index=True),
        })

    sym = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "c"]).materialize()

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    if sym.count() == 0:  # empty graph: empty blocks lose their schema
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "harmonic": pd.Series([], dtype="int64")}))

    if mode in ("driver", "auto") and sym.count() <= driver_edge_limit:
        # int-coded CSR frontier expansion: pair (a, c) lives as ONE
        # int64 key a·n + c, level sets are unique key arrays, and the
        # hop is a vectorized adjacency gather — no string merges (the
        # first cut did pandas string joins and spent 74 s at sf0.1 on
        # the near-quadratic hop-3 closure; this shape is ~50× faster
        # at identical output)
        e = sym.to_pandas()
        codes, uniques = pd.factorize(
            pd.concat([e["a"], e["c"]], ignore_index=True))
        n = len(uniques)
        A = codes[: len(e)].astype(np.int64)
        C = codes[len(e):].astype(np.int64)
        score = np.zeros(n, dtype=np.int64)
        if n <= 50_000:
            # packed-bitset BFS level sets: each node's reach is a row
            # of n/64 uint64 words; one hop = gather neighbor rows +
            # segmented OR (bitwise_or.reduceat) — allocation-bound,
            # not FLOP-bound.  On a small-world graph the hop-3
            # closure holds ~n² pairs: per-pair sparse expansion did
            # n²·deg work (38 s at sf0.1's 4.4k-node co-mention
            # graph) and BLAS matmuls run single-threaded under Ray's
            # OMP_NUM_THREADS=1 (9 s per n³ sgemm); the bitset hop is
            # ~0.3 s.  Memory n²/8 bytes — the 50k-node cap keeps it
            # ≤ ~312 MB, past which the sparse key path takes over.
            w = (n + 63) // 64
            order = np.argsort(A, kind="stable")
            srcs, dsts = A[order], C[order]
            deg = np.bincount(A, minlength=n).astype(np.int64)
            indptr = np.zeros(n + 1, np.int64)
            indptr[1:] = np.cumsum(deg)
            pop = np.array([bin(i).count("1") for i in range(256)],
                           np.uint16)

            def popcount(m: np.ndarray) -> np.ndarray:
                return pop[m.view(np.uint8)].sum(
                    axis=1).astype(np.int64)

            reach = np.zeros((n, w), np.uint64)
            np.bitwise_or.at(reach, (A, C >> 6),
                             np.uint64(1) << (C & 63).astype(np.uint64))
            selfbits = np.zeros((n, w), np.uint64)
            ids = np.arange(n)
            selfbits[ids, ids >> 6] = np.uint64(1) << (
                ids & 63).astype(np.uint64)
            score += popcount(reach) * (scale // 1)
            front = reach.copy()
            has_idx = np.flatnonzero(deg > 0)
            # the hop gathers front[dsts] — E×w×8 bytes if done in one
            # shot (tens of GB for a few-million-edge 50k-node graph,
            # well under driver_edge_limit) — so chunk the
            # gather+reduceat over contiguous source-node ranges with
            # a fixed edge budget; peak extra memory is the gather
            # budget + one hub node's own row block, never O(E·n/64)
            chunk_edges = max(1, _BITSET_GATHER_BYTES // (w * 8))
            if len(has_idx):
                ecum = np.cumsum(deg[has_idx])
                cuts = np.searchsorted(
                    ecum, np.arange(chunk_edges, int(ecum[-1]),
                                    chunk_edges), side="left") + 1
                node_chunks = np.split(has_idx, cuts)
            else:
                node_chunks = []
            for h in range(2, max_hops + 1):
                nxt = np.zeros_like(front)
                for ci in node_chunks:
                    if not len(ci):
                        continue
                    s0 = indptr[ci[0]]
                    span = dsts[s0:indptr[ci[-1] + 1]]
                    nxt[ci] = np.bitwise_or.reduceat(
                        front[span], indptr[ci] - s0, axis=0)
                new = nxt & ~reach & ~selfbits
                score += popcount(new) * (scale // h)
                reach |= new
                front = new
        else:
            # sparse int-key frontier expansion (pair (a, c) as one
            # int64 key a·n + c) — no string merges, no n² memory
            order = np.argsort(A, kind="stable")
            dsts = C[order]
            deg = np.bincount(A, minlength=n).astype(np.int64)
            indptr = np.zeros(n + 1, np.int64)
            indptr[1:] = np.cumsum(deg)
            frontier = np.unique(A * n + C)
            seen = frontier
            score += np.bincount(frontier // n,
                                 minlength=n) * (scale // 1)
            for h in range(2, max_hops + 1):
                af, cf = frontier // n, frontier % n
                cnt = deg[cf]
                tot = int(cnt.sum())
                if tot == 0:
                    break
                rep_a = np.repeat(af, cnt)
                offs = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt)
                d = dsts[np.repeat(indptr[cf], cnt) + offs]
                keys = rep_a * n + d
                keys = np.unique(keys[rep_a != d])
                fresh = keys[~np.isin(keys, seen, assume_unique=True)]
                score += np.bincount(fresh // n,
                                     minlength=n) * (scale // h)
                seen = np.concatenate([seen, fresh])
                frontier = fresh
        out = (pd.DataFrame({"entity": uniques, "harmonic": score})
               .sort_values("entity").reset_index(drop=True))
        return rd.from_pandas(out)
    if mode == "driver":
        raise GuardExceeded(
            f"harmonic_centrality(mode='driver'): > {driver_edge_limit} "
            "distinct edges; use mode='shuffle'")

    def anti(cand_ds, prior_ds):
        marked = prior_ds.map_batches(
            lambda t: t.assign(__hit=np.int8(1)),
            batch_format="pandas").materialize()
        j = hash_join(cand_ds, marked, on=["a", "c"], how="left_outer",
                      empty_safe=True)
        return j.map_batches(
            lambda t: t[t["__hit"].isna()][["a", "c"]],
            batch_format="pandas").materialize()

    levels = [sym]
    seen = sym
    for _ in range(2, max_hops + 1):
        cand = hash_join(
            levels[-1].map_batches(
                lambda t: t.rename(columns={"a": "__o", "c": "a"}),
                batch_format="pandas").materialize(),
            sym, on="a", empty_safe=True)
        cand = distinct_on(
            cand.map_batches(
                lambda t: t[t["__o"] != t["c"]][["__o", "c"]].rename(
                    columns={"__o": "a"}),
                batch_format="pandas"),
            ["a", "c"])
        fresh = anti(cand.materialize(), seen)
        levels.append(fresh)
        seen = seen.union(fresh).materialize()
    parts = None
    for h, lvl in enumerate(levels, start=1):
        contrib = groupby_agg(
            lvl.map_batches(
                lambda t, w=scale // h: pd.DataFrame(
                    {"entity": t["a"],
                     "harmonic": np.full(len(t), w, dtype=np.int64)}),
                batch_format="pandas"),
            ["entity"], [("harmonic", "sum", "harmonic")])
        parts = contrib if parts is None else parts.union(contrib)
    out = groupby_agg(parts, ["entity"], [("harmonic", "sum", "harmonic")])
    return out.map_batches(
        lambda t: t.assign(harmonic=t["harmonic"].astype("int64")),
        batch_format="pandas").sort("entity")


def modularity(edges_ds, *, src: str = "src", dst: str = "dst",
               label_of, mode: str = "auto") -> pd.DataFrame:
    """Newman modularity of a node partition over the undirected
    simple graph (Newman & Girvan 2004, public), in EXACT integer
    semantics: per community c the table carries L_c (intra-community
    edges), D_c (degree sum), n_nodes and the integer numerator
    ``q_scaled = 4·m·L_c − D_c²`` with m the total edge count, so
    ``Q = Σ_c q_scaled / (4·m²)`` — every reported value is an int64
    and hash-matches any engine computing the same definition.

    ``label_of`` is a VECTORIZED labeller (pd.Series ids →
    pd.Series labels) for id-derivable partitions (entity kind,
    hash buckets); a labels TABLE (e.g. LPA output) joins onto the
    edge list via hash_join first and uses label columns directly.

    Scale shape: canonical undirected dedup (distinct_on, auto mode)
    → ONE stats pass whose per-batch combiner emits ≤ |communities|
    rows (degree and intra partials) → tiny groupby; n_nodes adds a
    (cls, node) distinct.  The per-community finish is driver-side
    over a communities-sized table."""
    from .relational import distinct_on, groupby_agg

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        return _canon_undirected(b, src, dst)

    eu = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"], mode=mode,
    ).materialize()

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        la, lb = label_of(b["a"]), label_of(b["b"])
        deg = pd.concat([la, lb]).value_counts()
        intra = la[la.to_numpy() == lb.to_numpy()].value_counts()
        return pd.DataFrame({
            "cls": deg.index,
            "degree_sum": deg.to_numpy(np.int64),
            "intra_edges": pd.Series(deg.index.map(intra))
                           .fillna(0).to_numpy(np.int64),
        })

    agg = groupby_agg(
        eu.map_batches(stats, batch_format="pandas"),
        ["cls"], [("degree_sum", "sum", "degree_sum"),
                  ("intra_edges", "sum", "intra_edges")],
    ).to_pandas()

    def nodes(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([
            pd.DataFrame({"cls": label_of(b["a"]), "v": b["a"]}),
            pd.DataFrame({"cls": label_of(b["b"]), "v": b["b"]}),
        ]).drop_duplicates()
        return out

    nn = groupby_agg(
        distinct_on(eu.map_batches(nodes, batch_format="pandas"),
                    ["cls", "v"], mode=mode),
        ["cls"], [("v", "count", "n_nodes")],
    ).to_pandas()

    out = agg.merge(nn, on="cls", how="left")
    m = int(out["degree_sum"].sum()) // 2
    out["q_scaled"] = 4 * m * out["intra_edges"] - out["degree_sum"] ** 2
    out["m_edges"] = m
    out = out.astype({c: "int64" for c in
                      ("degree_sum", "intra_edges", "n_nodes",
                       "q_scaled", "m_edges")})
    return out[["cls", "n_nodes", "intra_edges", "degree_sum",
                "q_scaled", "m_edges"]].sort_values("cls").reset_index(
        drop=True)


def _brandes_driver(edges: pd.DataFrame, src: str, dst: str, *,
                    sources: np.ndarray | None,
                    ) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized Brandes over the indexed undirected simple graph:
    per source one numpy BFS (dist + path counts σ), then the backward
    dependency pass grouped by BFS level over the shortest-path DAG
    edges.  Returns (node codes, raw δ sums, n_nodes)."""
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return nodes, np.zeros(0, np.float64), 0
    keep = s_i != d_i
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)
    lo, hi = ukey // n, ukey % n
    # both directions for BFS and DAG selection
    a = np.concatenate([lo, hi])
    b = np.concatenate([hi, lo])
    order = np.argsort(a, kind="stable")
    a, b = a[order], b[order]
    starts = np.searchsorted(a, np.arange(n + 1))
    bc = np.zeros(n, np.float64)
    srcs = np.arange(n) if sources is None else sources
    for s in srcs:
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n, np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        frontier = np.array([s], np.int64)
        level = 0
        while len(frontier):
            # expand all frontier adjacencies at once (offset
            # arithmetic, no per-node python concatenate: base+arange
            # minus the per-node running start)
            cnt = starts[frontier + 1] - starts[frontier]
            u_rep = np.repeat(frontier, cnt)
            tot = int(cnt.sum())
            base = np.repeat(starts[frontier], cnt)
            offs = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            tgt = b[base + offs]
            fresh = dist[tgt] == -1
            dist[tgt[fresh]] = level + 1
            nxt_mask = dist[tgt] == level + 1
            np.add.at(sigma, tgt[nxt_mask], sigma[u_rep[nxt_mask]])
            frontier = np.unique(tgt[fresh])
            level += 1
        # backward pass over DAG edges grouped by level of the tail
        da, db = dist[a], dist[b]
        dag = (da >= 0) & (db == da + 1)
        ea, eb, eda = a[dag], b[dag], da[dag]
        delta = np.zeros(n, np.float64)
        for lvl in range(level - 1, -1, -1):
            sel = eda == lvl
            if not sel.any():
                continue
            va, vb = ea[sel], eb[sel]
            np.add.at(delta, va,
                      sigma[va] / sigma[vb] * (1.0 + delta[vb]))
        delta[s] = 0.0
        bc += delta
    return nodes, bc, n


def betweenness(edges_ds, *, src: str = "src", dst: str = "dst",
                mode: str = "driver",
                sample_sources: int | None = None,
                driver_edge_limit: int = _DEF_EDGE_LIMIT,
                ndigits: int = 6) -> pd.DataFrame:
    """Betweenness centrality (Brandes 2001, public) over the
    undirected simple graph; undirected pair-counting, so raw δ sums
    halve.  ``sample_sources=k`` runs the deterministic Brandes–Pich
    2007 source sample (the k md5-smallest node ids — reproducible on
    any engine) and scales by n/k, THE published path when all-sources
    is too much; exact when ``None``.

    Scale posture (declared): driver-only — the guarded distinct edge
    list must fit the driver (raises :class:`GuardExceeded` past
    ``driver_edge_limit``; no silent degrade).  Betweenness at corpus
    scale = sampled sources over the entity graph, whose distinct
    topology is vocabulary-sized, not corpus-sized; a
    frontier-Dataset Brandes (per-source forward σ BFS + per-level
    backward joins) is the documented follow-up if the topology ever
    outgrows one node.  Rows-only by design: σ-ratio sums are float
    path fractions, not cross-engine-exact."""
    import hashlib

    if mode not in ("driver", "auto"):
        raise ValueError("betweenness supports mode='driver' "
                         "(see docstring for the scale posture)")
    edges = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    sources = None
    scale = 1.0
    if sample_sources is not None and sample_sources < n:
        order = np.argsort(
            np.array([hashlib.md5(str(v).encode()).hexdigest()
                      for v in nodes]), kind="stable")
        sources = np.sort(order[:sample_sources])
        scale = n / sample_sources
    nodes, raw, n = _brandes_driver(edges, src, dst, sources=sources)
    out = pd.DataFrame({
        "entity": nodes,
        "betweenness": np.round(raw * scale / 2.0, ndigits),
        "n_sources": np.int64(len(sources) if sources is not None
                              else n),
    })
    return out.sort_values(
        ["betweenness", "entity"], ascending=[False, True]
    ).reset_index(drop=True)


def kge_eval(triples_ds, *, subj: str = "subj", pred: str = "pred",
             obj: str = "obj", dims: int = 4, sample_pct: int = 5,
             pool_guard: int = 2_000_000):
    """Filtered link-prediction evaluation of the TransE energies
    (Bordes et al. 2013 protocol, public): for each held-out test
    triple (h, r, t) — a deterministic md5 sample of the distinct
    facts — rank the true tail t among the predicate's candidate pool
    (type-constrained: the distinct objects of r) by L1 energy
    ascending, EXCLUDING candidates that are themselves true facts
    (the "filtered" setting), ties broken by entity id.  Per
    predicate, all exact integers: ``n_test``, ``sum_rank`` (mean
    rank = sum_rank / n_test left to the reader — ratios aren't
    hash-stable), ``hits1``, ``hits10``.

    Scale shape: the test set is a hash sample (small by
    construction); candidate pools are vocabulary-bounded per
    predicate and collected under ``pool_guard`` then broadcast; the
    per-test filter sets come from ONE semi-filtered pass over the
    distinct facts keyed by the broadcast test (h, r) set — bounded
    by test-set fan-out, never corpus-sized.  Scoring is a
    distributed map over the test triples: per batch, one
    (n × pool × dims) numpy broadcast against the md5-derived
    integer embeddings (the model seam — a trained KGE model's
    vectors plug in here)."""
    import hashlib

    import ray
    import ray.data as rd

    from .relational import _collect_limited, bcast_get, distinct_on

    def emb_matrix(keys) -> np.ndarray:
        out = np.empty((len(keys), dims), dtype=np.int64)
        for j, k in enumerate(keys):
            for i in range(dims):
                h = hashlib.md5(f"{k}|{i}".encode()).hexdigest()[:8]
                out[j, i] = int(h, 16) % 2001 - 1000
        return out

    d = distinct_on(triples_ds, [subj, pred, obj]).materialize()

    def pick_test(b: pd.DataFrame) -> pd.DataFrame:
        keep = [
            int(hashlib.md5(f"{s}|{p}|{o}".encode()).hexdigest()[:8],
                16) % 100 < sample_pct
            for s, p, o in zip(b[subj], b[pred], b[obj])]
        return b[np.asarray(keep, dtype=bool)]

    test = d.map_batches(pick_test, batch_format="pandas").to_pandas()
    if not len(test):
        return pd.DataFrame(columns=["pred", "n_test", "sum_rank",
                                     "hits1", "hits10"])

    pools_df = _collect_limited(
        d.map_batches(lambda b: b[[pred, obj]].drop_duplicates(),
                      batch_format="pandas")
        .map_batches(lambda b: b.drop_duplicates(),
                     batch_format="pandas"),
        pool_guard, "kge_eval candidate pools")
    pools_df = pools_df.drop_duplicates()
    pools = {p: np.sort(g[obj].to_numpy(object))
             for p, g in pools_df.groupby(pred, sort=False)}
    pool_embs = {p: emb_matrix(v) for p, v in pools.items()}

    hr_keys = frozenset(zip(test[subj], test[pred]))
    hr_ref = ray.put(hr_keys)

    def hr_facts(b: pd.DataFrame) -> pd.DataFrame:
        ks = bcast_get(hr_ref)
        m = [(s, p) in ks for s, p in zip(b[subj], b[pred])]
        return b[np.asarray(m, dtype=bool)]

    filt_df = d.map_batches(hr_facts, batch_format="pandas").to_pandas()
    filt: dict = {}
    for s, p, o in zip(filt_df[subj], filt_df[pred], filt_df[obj]):
        filt.setdefault((s, p), set()).add(o)
    refs = ray.put((pools, pool_embs, filt))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        pls, pembs, flt = bcast_get(refs)
        out = []
        for p, g in b.groupby(pred, sort=False):
            cand, emb_c = pls[p], pembs[p]
            hs = emb_matrix(pd.unique(g[subj].to_numpy(object)))
            h_idx = {k: j for j, k in
                     enumerate(pd.unique(g[subj].to_numpy(object)))}
            r_emb = emb_matrix([p])[0]
            q = hs[[h_idx[s] for s in g[subj]]] + r_emb  # n × dims
            sc = np.abs(q[:, None, :] - emb_c[None, :, :]).sum(
                axis=2)  # n × pool
            for row_i, (s, t) in enumerate(zip(g[subj], g[obj])):
                ti = np.searchsorted(cand, t)
                s_t = sc[row_i, ti]
                drop = flt.get((s, p), set())
                ok = np.array([e != t and e not in drop
                               for e in cand], dtype=bool)
                srow = sc[row_i]
                better = ok & ((srow < s_t)
                               | ((srow == s_t) & (cand < t)))
                out.append((p, 1 + int(better.sum())))
        return pd.DataFrame(out, columns=["pred_", "rank"])

    ranks = rd.from_pandas(test).map_batches(
        score, batch_format="pandas").to_pandas()
    agg = ranks.groupby("pred_").agg(
        n_test=("rank", "size"), sum_rank=("rank", "sum"),
        hits1=("rank", lambda r: int((r <= 1).sum())),
        hits10=("rank", lambda r: int((r <= 10).sum()))).reset_index()
    agg = agg.rename(columns={"pred_": "pred"})
    for c in ("n_test", "sum_rank", "hits1", "hits10"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("pred").reset_index(drop=True)


def _mis_pri(keys) -> np.ndarray:
    """60-bit md5 priority per node id — SQL twin:
    ``('0x' || substr(md5(e), 1, 15))::BIGINT``.  Priorities decide
    Luby symmetry breaking; EQUAL priorities on adjacent nodes block
    each other permanently (strict > on both sides) — deterministic
    and engine-identical, and at 60 bits adjacent collisions are
    effectively impossible."""
    import hashlib

    return np.array([
        int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        for k in keys], dtype=np.int64)


def _mis_driver(edges: pd.DataFrame, src: str, dst: str, *,
                rounds: int) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    pri = _mis_pri(nodes)
    u_s = np.concatenate([s_i, d_i])
    u_d = np.concatenate([d_i, s_i])
    status = np.zeros(n, dtype=np.int8)   # 0 undecided / 1 in / 2 out
    rdec = np.zeros(n, dtype=np.int64)
    for r in range(1, rounds + 1):
        und = status == 0
        if not und.any():
            break
        live = und[u_s] & und[u_d]
        nbrmax = np.full(n, -1, dtype=np.int64)
        if live.any():
            np.maximum.at(nbrmax, u_d[live], pri[u_s[live]])
        newin = und & (pri > nbrmax)
        if not newin.any():
            break  # only possible under an adjacent-priority collision
        status[newin] = 1
        rdec[newin] = r
        und2 = status == 0
        hit = newin[u_s] & und2[u_d]
        outn = np.zeros(n, dtype=bool)
        outn[u_d[hit]] = True
        outn &= und2
        status[outn] = 2
        rdec[outn] = r
    converged = not bool((status == 0).any())
    smap = np.array(["undecided", "in", "out"], dtype=object)
    return pd.DataFrame({
        "entity": nodes, "status": smap[status],
        "round_decided": rdec, "converged": converged,
    }).sort_values("entity").reset_index(drop=True)


def _mis_shuffle(edges_ds, src: str, dst: str, *, rounds: int):
    """Dataset-native bounded-round Luby: priorities are md5-DERIVED
    per batch (never joined or broadcast); each round is two
    semi-joins (live edges), one max-groupby (strongest undecided
    neighbor), one left join (the join decision), and two anti-joins
    (shrink the undecided set) — all hash exchanges, nothing
    driver-sized."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    sym = distinct_on(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({
                "__a": pd.concat([b[src], b[dst]], ignore_index=True),
                "__b": pd.concat([b[dst], b[src]], ignore_index=True),
            }).loc[lambda d: d["__a"] != d["__b"]],
            batch_format="pandas"),
        ["__a", "__b"],
    ).materialize()
    und = distinct_on(
        sym.map_batches(lambda b: pd.DataFrame({"node": b["__a"]}),
                        batch_format="pandas"),
        ["node"],
    ).materialize()
    empty = pd.DataFrame({
        "entity": pd.Series([], dtype=object),
        "status": pd.Series([], dtype=object),
        "round_decided": pd.Series([], dtype="int64")})
    decided = [empty]
    for r in range(1, rounds + 1):
        if und.count() == 0:
            break
        e1 = hash_join(sym, und, on="__a", right_on="node",
                       empty_safe=True)
        live = hash_join(e1.materialize(), und, on="__b",
                         right_on="node", empty_safe=True).materialize()
        nbrmax = groupby_agg(
            live.map_batches(
                lambda b: pd.DataFrame({
                    "node": b["__b"].to_numpy(),
                    "__k": _mis_pri(b["__a"].to_numpy(object))}),
                batch_format="pandas"),
            ["node"], [("__k", "max", "nbrmax")]).materialize()
        cand = hash_join(und, nbrmax, on="node", how="left_outer",
                         empty_safe=True)
        newin = cand.map_batches(
            lambda b: b.loc[
                _mis_pri(b["node"].to_numpy(object))
                > b["nbrmax"].fillna(-1).to_numpy(np.int64),
                ["node"]],
            batch_format="pandas").materialize()
        if newin.count() == 0:
            break
        outs = distinct_on(
            hash_join(live, newin, on="__a", right_on="node",
                      empty_safe=True).map_batches(
                lambda b: pd.DataFrame({"node": b["__b"]}),
                batch_format="pandas"),
            ["node"]).materialize()
        decided.append(newin.map_batches(
            lambda b, r=r: pd.DataFrame({
                "entity": b["node"].to_numpy(), "status": "in",
                "round_decided": np.int64(r)}) if len(b) else
            empty.copy(), batch_format="pandas").to_pandas())
        decided.append(outs.map_batches(
            lambda b, r=r: pd.DataFrame({
                "entity": b["node"].to_numpy(), "status": "out",
                "round_decided": np.int64(r)}) if len(b) else
            empty.copy(), batch_format="pandas").to_pandas())
        # anti-join the decided sets out of the undecided set;
        # _compact_nonempty strips the join's SCHEMALESS empty
        # partition blocks (Ray 2.49 sparse-partition defect) before
        # the next round's joins consume und
        from .relational import _compact_nonempty, default_n_buckets

        for gone in (newin, outs):
            if gone.count() == 0:
                continue
            und = _compact_nonempty(und.join(
                gone.map_batches(
                    lambda b: b.rename(columns={"node": "__g"}),
                    batch_format="pandas").materialize(),
                "left_anti", num_partitions=default_n_buckets(),
                on=("node",), right_on=("__g",)).materialize())
    leftover = und.to_pandas() if und.count() else None
    if leftover is not None and len(leftover):
        decided.append(pd.DataFrame({
            "entity": leftover["node"].to_numpy(),
            "status": "undecided",
            "round_decided": np.int64(0)}))
        converged = False
    else:
        converged = True
    out = pd.concat(decided, ignore_index=True)
    out["round_decided"] = out["round_decided"].astype("int64")
    out["converged"] = converged
    return out.sort_values("entity").reset_index(drop=True)


def maximal_independent_set(edges_ds, *, src: str = "src",
                            dst: str = "dst", rounds: int = 4,
                            mode: str = "auto",
                            driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Deterministic Luby maximal-independent-set rounds (Luby 1986,
    public) over the undirected distinct view of (src, dst), self-loops
    dropped: each synchronous round, an undecided node ENTERS the set
    iff its md5 priority strictly exceeds every undecided neighbor's;
    its undecided neighbors leave as 'out'.  ``rounds`` bounded
    exchanges (Luby needs O(log n) w.h.p.); leftovers report status
    'undecided' with ``converged`` False — the same bounded-round
    contract as k_core / label_propagation.  Returns (entity, status
    in/out/undecided, round_decided int — 0 for undecided, converged
    bool).  The fixed-priority variant equals the sequential greedy
    MIS in decreasing-priority order once converged (pinned in
    pytest) — the classic symmetry-breaking primitive behind parallel
    coloring / scheduling passes."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _mis_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, rounds=rounds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return rd.from_pandas(_mis_shuffle(edges_ds, src, dst,
                                       rounds=rounds))


# ---- Katz centrality --------------------------------------------------------


def _katz_driver(edges: pd.DataFrame, src: str, dst: str, *,
                 iters: int, base: int, alpha_num: int,
                 alpha_den: int) -> pd.DataFrame:
    nodes, src_idx, dst_idx = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64")})
    indeg_max = int(np.bincount(dst_idx, minlength=n).max())
    score = np.full(n, base, dtype=np.int64)
    for _ in range(iters):
        # int64 overflow guard BEFORE the round that could overflow:
        # next_max ≤ base + indeg_max · (α·cur_max); raise rather than
        # wrap silently (numpy wraps, DuckDB errors — keep both honest)
        est = base + indeg_max * (int(score.max()) * alpha_num
                                  // alpha_den)
        if est > (1 << 62):
            raise GuardExceeded(
                f"katz_centrality: projected score {est} exceeds the "
                f"int64 budget; lower iters/alpha or base")
        contrib = (score[src_idx] * alpha_num) // alpha_den
        acc = np.full(n, base, dtype=np.int64)
        np.add.at(acc, dst_idx, contrib)
        score = acc
    out = pd.DataFrame({"entity": nodes, "score": score})
    return out.sort_values(["score", "entity"],
                           ascending=[False, True]).reset_index(drop=True)


def _katz_shuffle(edges_ds, src: str, dst: str, *, iters: int, base: int,
                  alpha_num: int, alpha_den: int):
    """Dataset-native Katz: K bounded exchanges, each one hash join
    (edges ⋈ scores on src) → per-batch floor-scaled contribution →
    pre-combined sum by dst → left-join onto the node set + base."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    pairs = edges_ds.map_batches(
        lambda b: b[b[src] != b[dst]].rename(
            columns={src: "__src", dst: "__dst"})[["__src", "__dst"]],
        batch_format="pandas",
    )
    pairs = distinct_on(pairs, ["__src", "__dst"]).materialize()
    nodes = distinct_on(
        pairs.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["__src"], b["__dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"],
    ).materialize()
    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "score": pd.Series([], dtype="int64")}))
    scores = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "score": np.int64(base)}),
        batch_format="pandas",
    ).materialize()
    for _ in range(iters):
        contrib = hash_join(pairs, scores, on="__src", empty_safe=True,
                            right_on="node").map_batches(
            lambda b: pd.DataFrame({
                "__dst": b["__dst"],
                "c": (b["score"].to_numpy(np.int64) * alpha_num)
                // alpha_den,
            }),
            batch_format="pandas",
        )
        sums = groupby_agg(contrib, ["__dst"], [("c", "sum", "s")])
        scores = hash_join(
            nodes, sums.materialize(), on="node", right_on="__dst",
            how="left_outer",
        ).map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "score": base + b["s"].fillna(0).astype(np.int64),
            }),
            batch_format="pandas",
        ).materialize()
    return scores.map_batches(
        lambda b: b.rename(columns={"node": "entity"})[["entity", "score"]],
        batch_format="pandas",
    ).sort(["score", "entity"], descending=[True, False])


def katz_centrality(edges_ds, *, src: str = "src", dst: str = "dst",
                    iters: int = 6, base: int = 10 ** 6,
                    alpha_num: int = 5, alpha_den: int = 100,
                    mode: str = "auto",
                    driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Katz centrality (Katz 1953) by bounded fixed-point iteration
    over the distinct directed (src, dst) edges, self-loops dropped:

        x₀(v)     = base
        x_{k+1}(v) = base + Σ_{(u,v)∈E} (α_num · x_k(u)) // α_den

    The attenuation α is the exact fraction α_num/α_den with FLOOR
    division applied per source node — every engine (and the unrolled
    recursive-CTE SQL twin) reproduces the identical int64 scores, so
    results hash-match.  Unlike PageRank there is no out-degree
    normalization: a node's influence radiates whole to every
    successor, attenuated per hop — the classic prestige measure for
    citation/endorsement graphs.

    int64 budget: scores grow ≤ (d_in·α)^k; the driver path projects
    the next round's bound and raises :class:`GuardExceeded` instead
    of wrapping (numpy would wrap silently, DuckDB would error —
    neither silently disagrees).  Defaults (α=1/20, 6 rounds) keep
    graphs with d_in ≤ ~10⁴ comfortably inside the budget.

    Scale shape: mode='shuffle' runs K bounded exchanges — each round
    one hash join (edges ⋈ scores), a pre-combined sum by dst, and a
    left join onto the node set; mode='auto' uses the driver fast path
    under ``driver_edge_limit`` distinct edges and degrades to shuffle
    past it.  Returns (entity, score int64) sorted score desc,
    entity asc."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if mode in ("driver", "auto"):
        try:
            df = _katz_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, iters=iters, base=base,
                alpha_num=alpha_num, alpha_den=alpha_den)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _katz_shuffle(edges_ds, src, dst, iters=iters, base=base,
                         alpha_num=alpha_num, alpha_den=alpha_den)


# ---- eigenvector centrality --------------------------------------------------


def _eigen_driver(edges: pd.DataFrame, src: str, dst: str, *,
                  iters: int, scale: int) -> pd.DataFrame:
    und = _und_pairs_df(edges, src, dst)
    if und.empty:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64")})
    nodes, s_i, d_i = _index_graph(und, "src", "dst")
    n = len(nodes)
    x = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        raw = x.copy()  # A+I shift: self term first
        np.add.at(raw, d_i, x[s_i])
        div = max(int(raw.max()) // scale, 1)
        x = raw // div
    out = pd.DataFrame({"entity": nodes, "score": x})
    return out.sort_values(["score", "entity"],
                           ascending=[False, True]).reset_index(drop=True)


def _eigen_shuffle(edges_ds, src: str, dst: str, *, iters: int,
                   scale: int):
    """Dataset-native power iteration: per round one hash join
    (undirected edges ⋈ scores on src), a pre-combined sum by dst, and
    ONE scalar max aggregate for the floor-normalizer — K bounded
    exchanges, state is O(nodes)."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = distinct_on(und, ["__src", "__dst"]).materialize()
    nodes = distinct_on(
        und.map_batches(lambda b: pd.DataFrame({"node": b["__src"]}),
                        batch_format="pandas"),
        ["node"],
    ).materialize()
    if nodes.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "score": pd.Series([], dtype="int64")}))
    # A+I shift: self-loop rows fold the self term into the same
    # join + sum as the neighbor terms
    adj = und.union(nodes.map_batches(
        lambda b: pd.DataFrame({"__src": b["node"], "__dst": b["node"]}),
        batch_format="pandas")).materialize()
    scores = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "score": np.int64(scale)}),
        batch_format="pandas",
    ).materialize()
    for _ in range(iters):
        contrib = hash_join(adj, scores, on="__src", empty_safe=True,
                            right_on="node").map_batches(
            lambda b: pd.DataFrame({"node": b["__dst"],
                                    "part": b["score"]}),
            batch_format="pandas")
        raw = groupby_agg(contrib, ["node"],
                          [("part", "sum", "raw")]).materialize()
        # every node of the symmetric graph has >=1 in-neighbor, so
        # raw covers the whole node set — no left join needed
        div = max(int(raw.max("raw") or 0) // scale, 1)
        scores = raw.map_batches(
            lambda b, d=div: pd.DataFrame({
                "node": b["node"],
                "score": b["raw"].astype("int64") // np.int64(d),
            }),
            batch_format="pandas",
        ).materialize()
    return scores.map_batches(
        lambda b: pd.DataFrame({"entity": b["node"],
                                "score": b["score"].astype("int64")}),
        batch_format="pandas").sort(["score", "entity"],
                                    descending=[True, False])


def eigenvector_centrality(edges_ds, *, src: str = "src",
                           dst: str = "dst", iters: int = 8,
                           scale: int = 10 ** 6, mode: str = "auto",
                           driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Eigenvector centrality (Bonacich 1972) by MAX-NORM integer
    power iteration over the UNDIRECTED distinct entity graph,
    self-loops dropped:

        x₀(v)     = scale
        raw(v)    = x_k(v) + Σ_{u ∈ N(v)} x_k(u)     (A+I shift)
        x_{k+1}(v) = raw(v) // max(max_raw // scale, 1)

    The self term is the standard A+I spectral shift: identical
    eigenvectors, but the iteration CONVERGES on bipartite components
    (plain power iteration oscillates with period 2 there — a star
    graph never settles).  The per-round normalizer is the GLOBAL max
    of the raw sums floored to units of ``scale`` — every operation is
    exact int64 (floor division, no floats), so the generated
    unrolled-CTE SQL twin is bit-identical; max-norm keeps the top
    score in [scale, 2·scale) and every other score proportional to
    its eigenvector share.  Differs from kg_hits machinery: ONE score
    vector over the symmetric graph (hub ≡ auth), max- not
    sum-normalized — the classic influence measure for
    mutual-endorsement graphs.

    int64 budget: scores ≤ ~2·scale after normalization, so raw sums
    ≤ 2·scale·deg_max ≈ 2×10⁶·deg — overflow needs deg_max > ~4×10¹²,
    unreachable.  Scale shape: mode='shuffle' is K bounded exchanges
    (join + pre-combined sum + one scalar max per round); mode='auto'
    uses the driver kernel under ``driver_edge_limit`` distinct edges
    and degrades to shuffle past it.  Returns (entity, score int64)
    sorted score desc, entity asc."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if mode in ("driver", "auto"):
        try:
            df = _eigen_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, iters=iters, scale=scale)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _eigen_shuffle(edges_ds, src, dst, iters=iters, scale=scale)


# ---- Weisfeiler-Lehman color refinement -------------------------------------


def _und_pairs_df(edges: pd.DataFrame, src: str, dst: str) -> pd.DataFrame:
    e = edges[edges[src] != edges[dst]]
    a = e[src].to_numpy(dtype=object)
    b = e[dst].to_numpy(dtype=object)
    und = pd.DataFrame({"src": np.concatenate([a, b]),
                        "dst": np.concatenate([b, a])})
    return und.drop_duplicates(ignore_index=True)


def _wl_driver(edges: pd.DataFrame, src: str, dst: str, *,
               rounds: int) -> pd.DataFrame:
    import hashlib

    und = _und_pairs_df(edges, src, dst)
    if und.empty:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "wl_color": pd.Series([], dtype=object)})
    nodes, src_idx, dst_idx = _index_graph(und, "src", "dst")
    n = len(nodes)
    deg = np.bincount(src_idx, minlength=n).astype(np.int64)
    color = deg.astype(str).astype(object)
    for _ in range(rounds):
        # neighbor multiset per node: sort edges by (dst, neighbor
        # color) then join per contiguous run — one lexsort per round
        ncol = color[src_idx]
        order = np.lexsort((ncol.astype(str), dst_idx))
        d_sorted, c_sorted = dst_idx[order], ncol[order]
        starts = np.flatnonzero(np.r_[True, d_sorted[1:] != d_sorted[:-1]])
        ends = np.r_[starts[1:], len(d_sorted)]
        nxt = color.copy()
        for s0, e0 in zip(starts, ends):
            v = d_sorted[s0]
            sig = color[v] + "|" + ",".join(c_sorted[s0:e0])
            nxt[v] = hashlib.md5(sig.encode()).hexdigest()
        color = nxt
    return (pd.DataFrame({"entity": nodes, "wl_color": color})
            .sort_values("entity").reset_index(drop=True))


def _wl_shuffle(edges_ds, src: str, dst: str, *, rounds: int):
    """Dataset-native WL: each round one hash join (undirected edges ⋈
    colors on the neighbor end), a per-group ordered concat via
    groupby.map_groups, and a join back to the node's own color for
    the hash — K bounded exchanges."""
    import hashlib

    import ray.data as rd

    from .relational import distinct_on, hash_join

    from .relational import groupby_agg

    und = distinct_on(
        edges_ds.map_batches(
            lambda b: (lambda e: pd.DataFrame({
                "__src": np.concatenate([e[src].to_numpy(dtype=object),
                                         e[dst].to_numpy(dtype=object)]),
                "__dst": np.concatenate([e[dst].to_numpy(dtype=object),
                                         e[src].to_numpy(dtype=object)]),
            }))(b[b[src] != b[dst]]),
            batch_format="pandas"),
        ["__src", "__dst"]).materialize()
    colors = groupby_agg(
        und, ["__src"], [("__dst", "count", "__deg")]).map_batches(
        lambda b: pd.DataFrame({
            "node": b["__src"],
            "c": b["__deg"].astype("int64").astype(str)}),
        batch_format="pandas",
    ).materialize()
    if colors.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "wl_color": pd.Series([], dtype=object)}))

    def agg_group(g: pd.DataFrame) -> pd.DataFrame:
        cs = np.sort(g["c"].to_numpy(dtype=object).astype(str))
        return pd.DataFrame({"node": [g["__src"].iloc[0]],
                             "sig": [",".join(cs)]})

    for _ in range(rounds):
        nb = hash_join(und, colors, on="__dst", right_on="node",
                       empty_safe=True)
        sigs = nb.groupby("__src").map_groups(agg_group,
                                              batch_format="pandas")
        colors = hash_join(colors, sigs.materialize(), on="node",
                           empty_safe=True).map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"],
                "c": [hashlib.md5(f"{c}|{s}".encode()).hexdigest()
                      for c, s in zip(b["c"], b["sig"])]}),
            batch_format="pandas",
        ).materialize()
    return colors.map_batches(
        lambda b: b.rename(columns={"node": "entity", "c": "wl_color"})
        [["entity", "wl_color"]],
        batch_format="pandas",
    ).sort("entity")


def wl_refinement(edges_ds, *, src: str = "src", dst: str = "dst",
                  rounds: int = 3, mode: str = "auto",
                  driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Weisfeiler-Lehman color refinement (1-WL, Weisfeiler & Leman
    1968; the graph-isomorphism feature map behind WL kernels and the
    GIN expressiveness bound) over the undirected view of (src, dst),
    self-loops dropped:

        c₀(v)     = str(deg(v))
        c_{k+1}(v) = md5(c_k(v) || '|' ||
                       sorted-join(',', multiset{c_k(u) : u ∈ N(v)}))

    Colors are md5 hex strings — string-exact on every engine, so the
    generated unrolled SQL twin (string_agg ORDER BY inside one CTE
    per round) hash-matches.  Two nodes share a round-k color iff 1-WL
    cannot distinguish their k-hop neighborhoods — the stable
    partition refines toward orbit classes.

    Scale shape: each round is one hash join (edges ⋈ colors on the
    neighbor end), one ordered-concat groupby, and one join back —
    K bounded exchanges in mode='shuffle'; mode='auto' runs the driver
    fast path under ``driver_edge_limit`` distinct edges.  Returns
    (entity, wl_color) ordered by entity."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            df = _wl_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, rounds=rounds)
            return rd.from_pandas(df)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _wl_shuffle(edges_ds, src, dst, rounds=rounds)


# ---- graph census: rich-club and reciprocity --------------------------------


def rich_club(edges_ds, *, src: str = "src", dst: str = "dst",
              max_k: int = 10, mode: str = "auto",
              driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Rich-club connectivity curve (Colizza et al., Nature Physics
    2006) over the undirected view of (src, dst), self-loops dropped:
    for each degree threshold k in 0..max_k, the subgraph induced on
    nodes with deg > k has N_k nodes and E_k undirected edges;
    φ(k) = 2·E_k / (N_k·(N_k−1)) reported as the exact integer
    ``phi_ppm = (2·E_k·10⁶) // (N_k·(N_k−1))`` — a rising curve means
    hubs preferentially interconnect.

    Scale shape: degrees are one pre-combined groupby; each edge's
    contribution to every k below min(deg_a, deg_b) is a (max_k+2)-bin
    histogram — in shuffle mode two bounded hash joins tag the edge
    ends with degrees and the histograms combine per batch, so the
    driver only ever sees ≤ max_k+2 counters per side."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit)
            und = _und_pairs_df(edges, src, dst)
            return rd.from_pandas(_rich_club_finish(und, max_k))
        except GuardExceeded:
            if mode == "driver":
                raise
    return _rich_club_shuffle(edges_ds, src, dst, max_k=max_k)


def _rich_club_finish(und: pd.DataFrame, max_k: int) -> pd.DataFrame:
    ks = np.arange(max_k + 1, dtype=np.int64)
    if und.empty:
        return pd.DataFrame({"k": ks,
                             "n_nodes": np.zeros_like(ks),
                             "n_edges": np.zeros_like(ks),
                             "phi_ppm": np.zeros_like(ks)})
    nodes, src_idx, dst_idx = _index_graph(und, "src", "dst")
    deg = np.bincount(src_idx, minlength=len(nodes)).astype(np.int64)
    one = und["src"].to_numpy(dtype=object) < und["dst"].to_numpy(
        dtype=object)
    m = np.minimum(deg[src_idx], deg[dst_idx])[one]
    # counts per threshold: survivors have deg/min strictly > k
    n_nodes = np.array([(deg > k).sum() for k in ks], dtype=np.int64)
    n_edges = np.array([(m > k).sum() for k in ks], dtype=np.int64)
    denom = n_nodes * (n_nodes - 1)
    phi = np.where(denom > 0, (2 * n_edges * 1_000_000) //
                   np.maximum(denom, 1), 0).astype(np.int64)
    return pd.DataFrame({"k": ks, "n_nodes": n_nodes,
                         "n_edges": n_edges, "phi_ppm": phi})


def _rich_club_shuffle(edges_ds, src: str, dst: str, *, max_k: int):
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    und = distinct_on(
        edges_ds.map_batches(
            lambda b: (lambda e: pd.DataFrame({
                "__src": np.concatenate([e[src].to_numpy(dtype=object),
                                         e[dst].to_numpy(dtype=object)]),
                "__dst": np.concatenate([e[dst].to_numpy(dtype=object),
                                         e[src].to_numpy(dtype=object)]),
            }))(b[b[src] != b[dst]]),
            batch_format="pandas"),
        ["__src", "__dst"]).materialize()
    deg = groupby_agg(und, ["__src"],
                      [("__dst", "count", "__deg")]).materialize()
    ks = np.arange(max_k + 1, dtype=np.int64)

    def node_hist(b: pd.DataFrame) -> pd.DataFrame:
        d = b["__deg"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": ks, "n": [(d > k).sum() for k in ks]})

    nn = groupby_agg(deg.map_batches(node_hist, batch_format="pandas"),
                     ["k"], [("n", "sum", "n_nodes")]).to_pandas()
    half = und.map_batches(
        lambda b: b[b["__src"] < b["__dst"]], batch_format="pandas")
    tagged = hash_join(
        hash_join(half, deg, on="__src", empty_safe=True),
        deg.map_batches(lambda b: b.rename(
            columns={"__src": "__dst", "__deg": "__degb"}),
            batch_format="pandas").materialize(),
        on="__dst", empty_safe=True)

    def edge_hist(b: pd.DataFrame) -> pd.DataFrame:
        m = np.minimum(b["__deg"].to_numpy(np.int64),
                       b["__degb"].to_numpy(np.int64))
        return pd.DataFrame({
            "k": ks, "n": [(m > k).sum() for k in ks]})

    ne = groupby_agg(tagged.map_batches(edge_hist, batch_format="pandas"),
                     ["k"], [("n", "sum", "n_edges")]).to_pandas()
    out = pd.DataFrame({"k": ks}).merge(nn, on="k", how="left") \
        .merge(ne, on="k", how="left").fillna(0)
    out["n_nodes"] = out["n_nodes"].astype("int64")
    out["n_edges"] = out["n_edges"].astype("int64")
    denom = out["n_nodes"] * (out["n_nodes"] - 1)
    out["phi_ppm"] = np.where(
        denom > 0,
        (2 * out["n_edges"].to_numpy(np.int64) * 1_000_000)
        // np.maximum(denom.to_numpy(np.int64), 1), 0).astype("int64")
    return rd.from_pandas(out.sort_values("k").reset_index(drop=True))


def reciprocity(edges_ds, *, src: str = "src", dst: str = "dst",
                by: str | None = None):
    """Edge reciprocity census: over the distinct directed (src, dst)
    pairs (self-loops dropped), optionally per ``by`` class (e.g. the
    predicate), the count of pairs whose exact reverse also exists —
    ``recip_ppm = n_recip·10⁶ // n_pairs`` (exact integer).  The
    directed-KG health signal: a functional predicate with high
    reciprocity usually marks extraction-direction confusion.

    Scale shape: one distinct pass, then ONE hash join of the pair set
    against its own reversal on a composed key, then a pre-combined
    census per class — no driver-side pair set."""
    from .relational import distinct_on, groupby_agg, hash_join

    cols = ([by] if by else []) + [src, dst]

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]][cols]
        return b

    pairs = distinct_on(
        edges_ds.map_batches(prep, batch_format="pandas"),
        cols).materialize()

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        g = b[by].astype(str) if by else ""
        pre = (g + "\x1f") if by else ""
        return pd.DataFrame({
            "__grp": (b[by].astype(str) if by else "__all__"),
            "__key": pre + b[src].astype(str) + "\x1f"
            + b[dst].astype(str),
            "__rev": pre + b[dst].astype(str) + "\x1f"
            + b[src].astype(str),
        })

    kd = pairs.map_batches(keyed, batch_format="pandas").materialize()
    if kd.count() <= 5_000_000:
        # guarded driver fast path: the pair table is bounded, and a
        # set-probe beats the hash_join aggregator-fleet spin-up
        # (measured 3.1 → 1.1 s warm at sf0.1); the distributed join
        # below is the identical semantics past the guard
        df = kd.to_pandas()
        hit = df["__key"].isin(set(df["__rev"]))
        out = df.assign(one=1, rec=hit.astype("int64")) \
            .groupby("__grp").agg(n_pairs=("one", "sum"),
                                  n_recip=("rec", "sum")) \
            .reset_index().rename(columns={"__grp": "grp"})
    else:
        rev = kd.map_batches(
            lambda b: pd.DataFrame({"__key": b["__rev"],
                                    "__hit": np.int64(1)}),
            batch_format="pandas")
        joined = hash_join(kd,
                           distinct_on(rev, ["__key"]).materialize(),
                           on="__key", how="left_outer",
                           empty_safe=True)
        out = groupby_agg(
            joined.map_batches(
                lambda b: pd.DataFrame({
                    "grp": b["__grp"],
                    "one": np.int64(1),
                    "rec": b["__hit"].fillna(0).astype(np.int64)}),
                batch_format="pandas"),
            ["grp"], [("one", "sum", "n_pairs"),
                      ("rec", "sum", "n_recip")],
        ).to_pandas()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["n_recip"] = out["n_recip"].astype("int64")
    out["recip_ppm"] = (out["n_recip"] * 1_000_000
                        // out["n_pairs"]).astype("int64")
    return out.sort_values("grp").reset_index(drop=True)


# ---- eccentricity from deterministically sampled sources -------------------


def _ecc_sources(nodes: np.ndarray, n_sources: int) -> np.ndarray:
    """The n_sources nodes with lexicographically smallest
    (md5(node), node) — the same deterministic sample the SQL twin
    takes with ORDER BY md5(node), node LIMIT n."""
    import hashlib

    keys = np.array([hashlib.md5(str(v).encode()).hexdigest()
                     for v in nodes], dtype=object)
    order = np.lexsort((nodes, keys))
    return nodes[order[:n_sources]]


def _ecc_driver(edges: pd.DataFrame, src: str, dst: str, *,
                n_sources: int, rounds: int) -> pd.DataFrame:
    a = edges[src].to_numpy(object)
    b = edges[dst].to_numpy(object)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) == 0:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "ecc": pd.Series([], dtype="int64"),
            "n_reached": pd.Series([], dtype="int64"),
            "converged": pd.Series([], dtype=bool)})
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    s2 = np.concatenate([ai, bi])
    d2 = np.concatenate([bi, ai])
    order = np.argsort(s2, kind="stable")
    s2, d2 = s2[order], d2[order]
    indptr = np.searchsorted(s2, np.arange(len(nodes) + 1))
    srcs = _ecc_sources(nodes, n_sources)
    rows = []
    for sv in srcs:
        si = int(np.searchsorted(nodes, sv))
        dist = np.full(len(nodes), -1, dtype=np.int64)
        dist[si] = 0
        frontier = np.array([si], dtype=np.int64)
        h = 0
        while len(frontier) and h < rounds:
            nbr = np.concatenate(
                [d2[indptr[f]:indptr[f + 1]] for f in frontier]) \
                if len(frontier) else np.array([], np.int64)
            nbr = np.unique(nbr)
            frontier = nbr[dist[nbr] < 0]
            h += 1
            dist[frontier] = h
        if len(frontier):  # probe round rounds+1
            nbr = np.unique(np.concatenate(
                [d2[indptr[f]:indptr[f + 1]] for f in frontier]))
            conv = not (dist[nbr] < 0).any()
        else:
            conv = True
        reached = dist >= 0
        rows.append((sv, int(dist[reached].max()),
                     int(reached.sum()), bool(conv)))
    out = pd.DataFrame(rows,
                       columns=["source", "ecc", "n_reached",
                                "converged"])
    return out.sort_values("source").reset_index(drop=True)


def _ecc_shuffle(edges_ds, src: str, dst: str, *, n_sources: int,
                 rounds: int):
    """Dataset-native per-source bounded BFS: the frontier table
    (s, node, dist) holds only reached pairs; each round is one hash
    join + one pre-combined min groupby, shared by ALL sources (the
    source tag rides along, so k sources cost one exchange per round,
    not k)."""
    import hashlib

    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join, topk

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas",
    )
    und = distinct_on(und, ["__src", "__dst"]).materialize()

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        ns = b["__src"].to_numpy(object)
        return pd.DataFrame({
            "node": ns,
            "__md5": [hashlib.md5(str(v).encode()).hexdigest()
                      for v in ns]})

    nodes = distinct_on(
        und.map_batches(keyed, batch_format="pandas"), ["node"])
    srcs = topk(nodes, ["__md5", "node"], n_sources,
                descending=False).to_pandas()["node"].to_numpy(object)

    labels = rd.from_pandas(pd.DataFrame(
        {"s": srcs, "node": srcs,
         "dist": np.zeros(len(srcs), dtype="int64")})).materialize()

    def advance(lab):
        neigh = hash_join(und, lab, on="__src", right_on="node",
                          empty_safe=True).map_batches(
            lambda b: pd.DataFrame({"s": b["s"], "node": b["__dst"],
                                    "dist": b["dist"] + 1}),
            batch_format="pandas")
        both = lab.union(neigh)
        return groupby_agg(both, ["s", "node"],
                           [("dist", "min", "dist")]).materialize()

    for _ in range(rounds):
        labels = advance(labels)
    probe = advance(labels)
    per_s = groupby_agg(labels, ["s"],
                        [("dist", "max", "ecc"),
                         ("node", "count", "n_reached")]).to_pandas()
    probe_s = groupby_agg(probe, ["s"],
                          [("node", "count", "n2")]).to_pandas()
    df = per_s.merge(probe_s, on="s")
    df["converged"] = df["n_reached"] == df["n2"]
    df = df.rename(columns={"s": "source"})
    for c in ("ecc", "n_reached"):
        df[c] = df[c].astype("int64")
    return (df[["source", "ecc", "n_reached", "converged"]]
            .sort_values("source").reset_index(drop=True))


def eccentricity(edges_ds, *, src: str = "src", dst: str = "dst",
                 n_sources: int = 32, rounds: int = 12,
                 mode: str = "auto",
                 driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Per-source eccentricity over the undirected distinct entity
    graph from a deterministic md5 sample of n_sources nodes — the
    standard diameter/radius lower-bounding sweep (Magnien, Latapy &
    Habib 2009: max sampled ecc ≤ diameter ≤ 2·min sampled ecc; exact
    all-pairs is n BFS sweeps and off the table at web scale).  Rounds
    are bounded so the SQL twin can run the identical hop-limited
    recursion; each row carries a truthful per-source ``converged``
    flag (would hop rounds+1 reach anything new).

    Returns (source, ecc, n_reached, converged) sorted by source.
    Driver mode = guarded edge collect + per-source CSR BFS; shuffle
    mode = one source-tagged frontier Dataset shared by all sources
    (k sources ride one hash-join + min-groupby exchange per round).
    mode='auto' degrades driver→shuffle past the edge guard."""
    if mode == "shuffle":
        return _ecc_shuffle(edges_ds, src, dst,
                            n_sources=n_sources, rounds=rounds)
    try:
        edges = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
        return _ecc_driver(edges, src, dst, n_sources=n_sources,
                           rounds=rounds)
    except GuardExceeded:
        if mode == "driver":
            raise
        return _ecc_shuffle(edges_ds, src, dst,
                            n_sources=n_sources, rounds=rounds)


def _tr_driver(e: pd.DataFrame, max_len: int) -> pd.DataFrame:
    """Driver twin of the shuffle path below: the DAG view is
    distinct-fact bounded (entity vocab × predicates, never the
    corpus), and each Ray hash_join/left_anti pays a fixed ~1-2 s
    aggregator-fleet spin-up (BASELINE.md) — measured 13.7 s
    distributed vs <1 s in pandas at sf0.1's ~3k stratified edges."""
    if e.empty:
        return pd.DataFrame({"src": pd.Series(dtype="object"),
                             "dst": pd.Series(dtype="object")})
    reach = None
    cur = e
    for _ in range(2, max_len + 1):
        cur = (cur.rename(columns={"dst": "mid"})
               .merge(e.rename(columns={"src": "mid"}), on="mid")
               [["src", "dst"]].drop_duplicates())
        reach = cur if reach is None else (
            pd.concat([reach, cur], ignore_index=True)
            .drop_duplicates())
    kept = e.merge(reach, on=["src", "dst"], how="left",
                   indicator=True)
    kept = kept[kept["_merge"] == "left_only"][["src", "dst"]]
    return (kept.sort_values(["src", "dst"]).reset_index(drop=True))


def dag_transitive_reduction(edges_ds, *, src: str = "src",
                             dst: str = "dst", max_len: int = 3,
                             mode: str = "auto",
                             driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Transitive reduction of a DAG whose longest path has at most
    ``max_len`` edges (Aho, Garey & Ullman, SIAM J. Comput. 1972 —
    public): drop every edge (u, v) that also has an alternative path
    u→v of length in [2, max_len]; what remains is the unique minimal
    edge set with the same reachability.  The caller guarantees the
    bound — a kind-STRATIFIED edge view (edges only ever point from a
    lower stratum to a strictly higher one, as in person→org→city→
    country) bounds paths by #strata − 1 structurally, making the
    reachability closure EXACT with no converged-flag caveat.

    Scale shape: fully distributed, no driver state — ONE combiner-fed
    distinct on the edge view, then per extra hop ONE mid-keyed
    ``hash_join`` + distinct (pair sets stay pair-shaped; nothing is
    ever collected), a union of the 2..max_len-hop pair sets, and one
    ``left_anti`` exchange removing the redundant edges.  Each join
    materializes before the next (the chained-join fleet rule,
    BASELINE.md).

    Returns a sorted pandas DataFrame (src, dst) of surviving edges.

    The happy path is a guarded DRIVER finish over the collected
    distinct edge view (``_tr_driver``); past ``driver_edge_limit``
    edges (or with mode='shuffle') the fully-distributed exchange path
    below runs instead — both pinned equal in pytest."""
    import pandas as pd

    from .relational import (_compact_nonempty, default_n_buckets,
                             distinct_on, hash_join)

    if mode != "shuffle":
        try:
            df = _edges_to_driver(edges_ds, src, dst,
                                  driver_edge_limit)
            df = df.rename(columns={src: "src", dst: "dst"})
            return _tr_driver(df, max_len)
        except GuardExceeded:
            if mode == "driver":
                raise

    e = _compact_nonempty(distinct_on(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({"src": b[src], "dst": b[dst]}),
            batch_format="pandas"),
        ["src", "dst"]).materialize())
    if e.count() == 0:
        return pd.DataFrame({"src": pd.Series(dtype="object"),
                             "dst": pd.Series(dtype="object")})

    reach = None
    cur = e
    for _ in range(2, max_len + 1):
        nxt = hash_join(
            cur.map_batches(
                lambda b: b.rename(columns={"dst": "mid"}),
                batch_format="pandas"),
            e.map_batches(
                lambda b: b.rename(columns={"src": "mid"}),
                batch_format="pandas"),
            on="mid", empty_safe=True)
        cur = _compact_nonempty(distinct_on(
            nxt.map_batches(lambda b: b[["src", "dst"]],
                            batch_format="pandas"),
            ["src", "dst"]).materialize())
        reach = cur if reach is None else _compact_nonempty(
            reach.union(cur).materialize())

    if reach.count() == 0:
        df = e.to_pandas()
        return (df[["src", "dst"]].sort_values(["src", "dst"])
                .reset_index(drop=True))
    redundant = _compact_nonempty(
        distinct_on(reach, ["src", "dst"]).materialize())
    kept = e.join(redundant, "left_anti",
                  num_partitions=default_n_buckets(),
                  on=("src", "dst"))
    df = kept.to_pandas()
    if not len(df):
        return pd.DataFrame({"src": pd.Series(dtype="object"),
                             "dst": pd.Series(dtype="object")})
    return (df[["src", "dst"]].sort_values(["src", "dst"])
            .reset_index(drop=True))


def boruvka_msf(edges_ds, *, src: str = "src", dst: str = "dst",
                weight: str | None = None, rounds: int = 6,
                jumps: int = 8):
    """Bounded-round deterministic Borůvka MAXIMUM-weight spanning
    forest (Borůvka 1926; the textbook distributed MSF primitive —
    also the GHS algorithm's core step): each synchronous round every
    current component selects its strongest incident cross-component
    edge under the TOTAL order (weight DESC, a ASC, b ASC) — ties are
    impossible, so the forest is unique and engine-independent — the
    selected edges join the forest, and touching components merge via
    ``jumps`` bounded min-label propagation steps over the selection
    graph.  The SQL twin unrolls the identical ``rounds`` x ``jumps``
    schedule, so results hash-match bit-for-bit; ``converged`` reports
    truthfully whether cross-component edges remain after the final
    round (Borůvka halves the component count per round, so
    rounds=O(log n) suffices wherever the per-round merge completes
    within ``jumps`` hops of the selection graph).

    Scale shape: the weighted edge table is built by ONE combiner-fed
    groupby and stays a Dataset end-to-end.  Per round: the label map
    is component-VOCABULARY-bounded (entity vocab, never the corpus —
    the canonicalize-vocab posture), shipped once via ray.put and read
    per batch; candidate selection is a per-batch local argmax whose
    partials are (component x block)-bounded before the driver picks
    per-component winners; the merge itself runs over the selected
    edges only (at most one per component).  Nothing corpus-sized is
    ever collected.

    Input: (src, dst[, weight]) rows; opposite orientations and
    repeated rows of the same unordered pair SUM their weights
    (weight=None counts rows).  Self-loops drop.  Returns a sorted
    pandas DataFrame (src, dst, weight, round_added, converged)."""
    import ray

    from .relational import bcast_get, distinct_on, groupby_agg

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src].astype(object).to_numpy()
        d = b[dst].astype(object).to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        z = np.maximum(s, d)
        w = (b[weight].to_numpy(np.int64)[keep] if weight is not None
             else np.ones(len(a), dtype=np.int64))
        return pd.DataFrame({"a": a, "b": z, "w": w})

    e = groupby_agg(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"], [("w", "sum", "w")]).materialize()

    out_empty = pd.DataFrame({
        "src": pd.Series(dtype="object"),
        "dst": pd.Series(dtype="object"),
        "weight": pd.Series(dtype="int64"),
        "round_added": pd.Series(dtype="int64"),
        "converged": pd.Series(dtype="bool")})
    if e.count() == 0:
        return out_empty

    nodes = distinct_on(
        e.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["a"], b["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"]).to_pandas()["node"]
    lbl = pd.Series(nodes.to_numpy(object), index=nodes.to_numpy(object))

    pick_cols = ["grp", "a", "b", "w"]
    forest_parts = []
    converged = None
    for r in range(1, rounds + 1):
        lref = ray.put(dict(lbl))

        def local_pick(b: pd.DataFrame, _lref=lref) -> pd.DataFrame:
            m = bcast_get(_lref)
            la = b["a"].map(m)
            lb = b["b"].map(m)
            d = b.assign(la=la, lb=lb)[la.to_numpy() != lb.to_numpy()]
            if d.empty:
                return pd.DataFrame({
                    "grp": pd.Series(dtype="object"),
                    "a": pd.Series(dtype="object"),
                    "b": pd.Series(dtype="object"),
                    "w": pd.Series(dtype="int64")})
            two = pd.concat([
                d.rename(columns={"la": "grp"})[pick_cols],
                d.rename(columns={"lb": "grp"})[pick_cols],
            ], ignore_index=True)
            return (two.sort_values(
                ["grp", "w", "a", "b"],
                ascending=[True, False, True, True], kind="mergesort")
                .groupby("grp", sort=False).head(1))

        picks = e.map_batches(local_pick,
                              batch_format="pandas").to_pandas()
        if picks.empty:
            converged = True
            break
        best = (picks.sort_values(
            ["grp", "w", "a", "b"],
            ascending=[True, False, True, True], kind="mergesort")
            .groupby("grp", sort=False).head(1))
        sel = best[["a", "b", "w"]].drop_duplicates().copy()
        sel["round_added"] = np.int64(r)
        forest_parts.append(sel)

        # merge: bounded min-label propagation over the selection
        # graph, on labels only (<= one selected edge per component)
        la = sel["a"].map(lbl)
        lb = sel["b"].map(lbl)
        lg = pd.DataFrame({
            "x": pd.concat([la, lb], ignore_index=True),
            "y": pd.concat([lb, la], ignore_index=True),
        }).drop_duplicates()
        labels = pd.Index(lg["x"].unique())
        m = pd.Series(labels.to_numpy(object), index=labels)
        for _ in range(jumps):
            nb = lg.assign(my=lg["y"].map(m)).groupby("x")["my"].min()
            m2 = np.minimum(m, nb.reindex(m.index).fillna(m))
            if m2.equals(m):
                break  # fixpoint: remaining jumps are no-ops
            m = m2
        merged = lbl.map(m)
        lbl = merged.where(merged.notna(), lbl)

    if converged is None:
        lref = ray.put(dict(lbl))

        def cross_count(b: pd.DataFrame, _lref=lref) -> pd.DataFrame:
            m = bcast_get(_lref)
            return pd.DataFrame({"n": [int(
                (b["a"].map(m).to_numpy()
                 != b["b"].map(m).to_numpy()).sum())]})

        converged = e.map_batches(
            cross_count,
            batch_format="pandas").to_pandas()["n"].sum() == 0

    if not forest_parts:
        return out_empty
    out = pd.concat(forest_parts, ignore_index=True).rename(
        columns={"a": "src", "b": "dst", "w": "weight"})
    out["weight"] = out["weight"].astype("int64")
    out["round_added"] = out["round_added"].astype("int64")
    out["converged"] = bool(converged)
    return (out[["src", "dst", "weight", "round_added", "converged"]]
            .sort_values(["src", "dst", "round_added"])
            .reset_index(drop=True))


def _anf_driver(edges: pd.DataFrame, src: str, dst: str, *,
                hops: int, m: int, alpha_num: int,
                alpha_den: int) -> pd.DataFrame:
    """Driver twin of the shuffle path: registers are a dense (n, m)
    int64 matrix (rho=0 encodes the empty register — real ranks are
    ≥ 1), one ``np.maximum.at`` gather per hop over the symmetric
    edge index.  The entity graph's distinct edge list is
    vocab-bounded (~5k rows at sf0.1) while each distributed hop pays
    ~3 aggregator-fleet exchanges — measured 11.9 s distributed vs
    <1 s here."""
    import hashlib

    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({
            "hop": pd.Series(dtype="int64"),
            "nf_est": pd.Series(dtype="int64"),
            "zero_registers_total": pd.Series(dtype="int64")})
    u_s = np.concatenate([s_i, d_i])
    u_d = np.concatenate([d_i, s_i])
    powers = (np.int64(1) << np.arange(1, 33, dtype=np.int64))
    hexes = [hashlib.md5(str(v).encode()).hexdigest() for v in nodes]
    j = np.array([int(h[:8], 16) for h in hexes], dtype=np.int64) % m
    w = np.array([int(h[8:16], 16) for h in hexes], dtype=np.int64)
    bits = np.searchsorted(powers, w, side="right") + 1
    rho = np.where(w >= 1, 33 - bits, 33).astype(np.int64)
    regs = np.zeros((n, m), dtype=np.int64)
    regs[np.arange(n), j] = rho
    rows = []
    for h in range(1, hops + 1):
        new = regs.copy()
        np.maximum.at(new, u_d, regs[u_s])
        regs = new
        pw = np.where(regs == 0, np.int64(1) << 33,
                      np.int64(1) << (33 - regs))
        z = pw.sum(axis=1)
        est = (alpha_num * m * m * (np.int64(1) << 33)) \
            // (alpha_den * z)
        rows.append((h, int(est.sum()), int((regs == 0).sum())))
    out = pd.DataFrame(rows, columns=["hop", "nf_est",
                                      "zero_registers_total"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def anf_neighborhood(edges_ds, *, src: str = "src", dst: str = "dst",
                     hops: int = 4, m: int = 16,
                     alpha_num: int = 673, alpha_den: int = 1000,
                     mode: str = "auto",
                     driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """ANF / HyperANF neighborhood function (Palmer et al. KDD'02;
    Boldi & Vigna WWW'11 — the method behind the four-degrees-of-
    separation measurement; public): per hop h, the estimated number
    of (node, reachable-node) pairs within distance ≤ h, i.e.
    N(h) = Σ_v |B(v, h)|, computed by propagating per-node HyperLogLog
    registers along edges — each round every node max-merges its
    neighbors' registers, which is exactly a distance-h distinct-count
    sketch.  Registers use the repo's DETERMINISTIC md5 twin
    (sketches.hll_distinct): register j and rank word w from disjoint
    md5 hex windows, rho by exact integer comparison, and the raw
    estimator carried as exact integers (est = α_num·m²·2³³ //
    (α_den·Z_scaled)) so the unrolled SQL twin reproduces every hop
    bit-for-bit.  α = 673/1000 is the standard m=16 constant.

    Scale shape: the register table is (node × ≤m) rows — sketch-
    bounded, never corpus-bounded; each hop is ONE hash_join (edges ⋈
    registers) + ONE combiner-fed groupby-max, the textbook HyperANF
    exchange; the per-hop estimate is a per-node rollup + ONE global
    sum, and the driver only ever sees ``hops`` rows.  Isolated nodes
    (no edges) contribute nothing, matching the edge-derived node set.

    Returns a pandas DataFrame (hop, nf_est, zero_registers_total),
    hop = 1..hops.  The happy path is a guarded DRIVER register
    matrix (``_anf_driver``); past ``driver_edge_limit`` distinct
    edges (or with mode='shuffle') the distributed register exchanges
    below run instead — both pinned equal in pytest."""
    import hashlib

    from .relational import (_compact_nonempty, distinct_on,
                             groupby_agg, hash_join)

    if mode != "shuffle":
        try:
            df = _edges_to_driver(edges_ds, src, dst,
                                  driver_edge_limit)
            return _anf_driver(df, src, dst, hops=hops, m=m,
                               alpha_num=alpha_num,
                               alpha_den=alpha_den)
        except GuardExceeded:
            if mode == "driver":
                raise

    powers = (np.int64(1) << np.arange(1, 33, dtype=np.int64))

    sym = distinct_on(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({
                "a": pd.concat([b[src], b[dst]], ignore_index=True),
                "b": pd.concat([b[dst], b[src]], ignore_index=True),
            }).loc[lambda d: d["a"] != d["b"]],
            batch_format="pandas"),
        ["a", "b"]).materialize()
    if sym.count() == 0:
        return pd.DataFrame({
            "hop": pd.Series(dtype="int64"),
            "nf_est": pd.Series(dtype="int64"),
            "zero_registers_total": pd.Series(dtype="int64")})

    def seed(b: pd.DataFrame) -> pd.DataFrame:
        nodes = b["node"].to_numpy(object)
        hexes = [hashlib.md5(str(v).encode()).hexdigest()
                 for v in nodes]
        j = np.array([int(h[:8], 16) for h in hexes],
                     dtype=np.int64) % m
        w = np.array([int(h[8:16], 16) for h in hexes],
                     dtype=np.int64)
        bits = np.searchsorted(powers, w, side="right") + 1
        rho = np.where(w >= 1, 33 - bits, 33).astype(np.int64)
        return pd.DataFrame({"node": nodes, "j": j, "rho": rho})

    regs = distinct_on(
        sym.map_batches(lambda b: pd.DataFrame({"node": b["a"]}),
                        batch_format="pandas"),
        ["node"]).map_batches(seed, batch_format="pandas").materialize()

    def per_node_z(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pw"] = np.int64(1) << (33 - b["rho"].to_numpy(np.int64))
        b["one"] = np.int64(1)
        return b[["node", "pw", "one"]]

    rows = []
    for h in range(1, hops + 1):
        contrib = hash_join(
            sym, regs.map_batches(
                lambda b: b.rename(columns={"node": "b"}),
                batch_format="pandas"),
            on="b", empty_safe=True).map_batches(
            lambda b: pd.DataFrame({"node": b["a"], "j": b["j"],
                                    "rho": b["rho"]}),
            batch_format="pandas")
        regs = _compact_nonempty(groupby_agg(
            regs.union(contrib), ["node", "j"],
            [("rho", "max", "rho")]).materialize())
        z = groupby_agg(
            regs.map_batches(per_node_z, batch_format="pandas"),
            ["node"], [("pw", "sum", "zsum"), ("one", "sum", "nreg")])
        est_parts = z.map_batches(
            lambda b: pd.DataFrame({"nf": [int((
                (alpha_num * m * m * (np.int64(1) << 33))
                // (alpha_den * (
                    b["zsum"].to_numpy(np.int64)
                    + (m - b["nreg"].to_numpy(np.int64))
                    * (np.int64(1) << 33)))).sum())],
                "zr": [int((m - b["nreg"].to_numpy(np.int64)).sum())]}),
            batch_format="pandas").to_pandas()
        rows.append((h, int(est_parts["nf"].sum()),
                     int(est_parts["zr"].sum())))
    # nf_est is the RAW estimator sum (no linear-counting small-range
    # correction — ln is not cross-engine exact; see hll_distinct);
    # zero_registers_total carries the signal a consumer needs to
    # know which hops sit in the biased small-range regime.
    out = pd.DataFrame(rows, columns=["hop", "nf_est",
                                      "zero_registers_total"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def simrank(edges_ds, *, src: str = "src", dst: str = "dst",
            rounds: int = 2, scale: int = 10 ** 6,
            c_num: int = 8, c_den: int = 10, mode: str = "auto",
            driver_edge_limit: int = _DEF_EDGE_LIMIT,
            pair_limit: int = 2_000_000) -> pd.DataFrame:
    """SimRank structural similarity (Jeh & Widom, KDD'02 — public):
    two objects are similar when their IN-neighbors are similar,

        s(a, a) = 1
        s(a, b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i, j)

    evaluated ``rounds`` times (default 2) from s₀ = identity in exact
    integer fixed point — scores scaled by ``scale`` with FLOOR
    division, C the exact fraction c_num/c_den — so both engines (and
    the pair-join SQL twin) reproduce identical int64 scores:

        s₁(a,b) = (c_num·scale·|I(a)∩I(b)|) // (c_den·d(a)·d(b))
        s₂(a,b) = (c_num·(scale·|I(a)∩I(b)| + T(a,b)))
                   // (c_den·d(a)·d(b)),
        T(a,b)  = Σ_{i∈I(a), j∈I(b), i≠j} s₁(i, j)

    over the distinct self-loop-free edge set.  SimRank is symmetric,
    so pairs report once with a < b; only positive-score pairs return
    (zero pairs are the implicit default, as in the paper's sparse
    formulation).

    Scale posture: the pair space is inherently quadratic in shared
    in-neighbor fan-out — past ``pair_limit`` live pairs the operator
    raises :class:`~cpg_ray.functions.relational.GuardExceeded`
    (an honest refusal, never a silently-truncated answer; partial
    SimRank is not SimRank).  Under the guard the per-round state is
    driver-bounded, so mode='auto' runs the driver twin below
    ``driver_edge_limit`` distinct edges; mode='shuffle' distributes
    the two fan-out joins (common-source pair expansion; the T pass
    broadcasts the pair-bounded s₁ table and joins the emitted
    (a, j, v) partials back to the edge set) and is pinned equal in
    pytest.

    Returns a pandas frame (a, b, simrank int64), a < b, sorted by
    simrank desc, a, b."""
    if rounds not in (1, 2):
        raise ValueError("rounds must be 1 or 2 (unrolled twin)")
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def _finish(pairs: pd.DataFrame) -> pd.DataFrame:
        pairs = pairs[pairs["simrank"] > 0]
        out = pairs.sort_values(
            ["simrank", "a", "b"], ascending=[False, True, True],
            kind="mergesort").reset_index(drop=True)
        out["simrank"] = out["simrank"].astype("int64")
        return out[["a", "b", "simrank"]]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"a": pd.Series(dtype="object"),
                             "b": pd.Series(dtype="object"),
                             "simrank": pd.Series(dtype="int64")})

    if mode in ("driver", "auto"):
        try:
            e = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
            e = e[e[src] != e[dst]]
            if not len(e):
                return _empty()
            din = e.groupby(dst).size().rename("din")
            # common in-neighbors: all ordered out-pairs per source
            m = e.merge(e, on=src, suffixes=("_a", "_b"))
            m = m[m[f"{dst}_a"] < m[f"{dst}_b"]]
            com = (m.groupby([f"{dst}_a", f"{dst}_b"]).size()
                   .rename("c").reset_index()
                   .rename(columns={f"{dst}_a": "a", f"{dst}_b": "b"}))
            if len(com) > pair_limit:
                raise GuardExceeded(
                    f"simrank: {len(com)} live pairs exceed "
                    f"pair_limit={pair_limit}")
            da = com["a"].map(din).to_numpy("int64")
            db = com["b"].map(din).to_numpy("int64")
            s1 = (c_num * scale * com["c"].to_numpy("int64")) \
                // (c_den * da * db)
            s1df = com.assign(v=s1)
            s1df = s1df[s1df["v"] > 0]
            if rounds == 1:
                return _finish(s1df.rename(columns={"v": "simrank"})
                               [["a", "b", "simrank"]])
            # T pass: symmetric s1 ⋈ edges twice, i ≠ j by a<b pairs
            sym = pd.concat([
                s1df.rename(columns={"a": "i", "b": "j"}),
                s1df.rename(columns={"a": "j", "b": "i"}),
            ], ignore_index=True)[["i", "j", "v"]]
            t = (sym.merge(e.rename(columns={src: "i", dst: "a"}),
                           on="i")
                 .merge(e.rename(columns={src: "j", dst: "b"}),
                        on="j"))
            t = t[t["a"] < t["b"]]
            toff = (t.groupby(["a", "b"])["v"].sum().rename("t")
                    .reset_index())
            allp = com.merge(toff, on=["a", "b"], how="outer")
            if len(allp) > pair_limit:
                raise GuardExceeded(
                    f"simrank: {len(allp)} live pairs exceed "
                    f"pair_limit={pair_limit}")
            cc = allp["c"].fillna(0).to_numpy("int64")
            tt = allp["t"].fillna(0).to_numpy("int64")
            da = allp["a"].map(din).to_numpy("int64")
            db = allp["b"].map(din).to_numpy("int64")
            s2 = (c_num * (scale * cc + tt)) // (c_den * da * db)
            return _finish(allp.assign(simrank=s2)
                           [["a", "b", "simrank"]])
        except GuardExceeded:
            if mode == "driver":
                raise

    # shuffle path: distribute the two fan-out joins; the per-round
    # pair STATE stays pair_limit-bounded (guarded collect) because
    # partial SimRank is refused, not truncated
    import ray

    from .relational import (_collect_limited, bcast_get, distinct_on,
                             groupby_agg, hash_join)

    e_ds = distinct_on(
        edges_ds.map_batches(
            lambda b: b.loc[b[src] != b[dst], [src, dst]],
            batch_format="pandas"),
        [src, dst], mode="shuffle").materialize()
    din_df = _collect_limited(
        groupby_agg(e_ds, [dst], [(src, "count", "din")]),
        pair_limit, "simrank")
    if not len(din_df):
        return _empty()
    din = dict(zip(din_df[dst], din_df["din"].astype("int64")))
    com_ds = groupby_agg(
        hash_join(
            e_ds.map_batches(lambda b: b.rename(
                columns={dst: "a"}), batch_format="pandas"),
            e_ds.map_batches(lambda b: b.rename(
                columns={dst: "b"}), batch_format="pandas"),
            on=src, empty_safe=True).map_batches(
                lambda b: b.loc[b["a"] < b["b"], ["a", "b"]]
                .assign(one=np.int64(1)), batch_format="pandas"),
        ["a", "b"], [("one", "sum", "c")])
    com = _collect_limited(com_ds, pair_limit, "simrank")
    if not len(com):
        return _empty()
    da = com["a"].map(din).to_numpy("int64")
    db = com["b"].map(din).to_numpy("int64")
    com["v"] = (c_num * scale * com["c"].to_numpy("int64")) \
        // (c_den * da * db)
    s1df = com[com["v"] > 0]
    if rounds == 1:
        return _finish(s1df.rename(columns={"v": "simrank"})
                       [["a", "b", "simrank"]])
    # broadcast symmetric s1 keyed by i; one linear emit pass over the
    # edges + one hash join back to the edge set + combiner sum
    sym: dict = {}
    for i, j, v in zip(com["a"], com["b"], com["v"]):
        if v > 0:
            sym.setdefault(i, []).append((j, int(v)))
            sym.setdefault(j, []).append((i, int(v)))
    sym_ref = ray.put(sym)

    def emit(b: pd.DataFrame, _ref=sym_ref) -> pd.DataFrame:
        mm = bcast_get(_ref)
        rows_a, rows_j, rows_v = [], [], []
        for i, a in zip(b[src].to_numpy(object),
                        b[dst].to_numpy(object)):
            for j, v in mm.get(i, ()):
                rows_a.append(a)
                rows_j.append(j)
                rows_v.append(v)
        return pd.DataFrame({"a": pd.Series(rows_a, dtype="object"),
                             "j": pd.Series(rows_j, dtype="object"),
                             "v": pd.Series(rows_v, dtype="int64")})

    part = e_ds.map_batches(emit, batch_format="pandas")
    tj = hash_join(part, e_ds.map_batches(
        lambda b: b.rename(columns={src: "j", dst: "b"}),
        batch_format="pandas"), on="j", empty_safe=True)
    toff = _collect_limited(
        groupby_agg(
            tj.map_batches(lambda b: b.loc[b["a"] < b["b"],
                                           ["a", "b", "v"]],
                           batch_format="pandas"),
            ["a", "b"], [("v", "sum", "t")]),
        pair_limit, "simrank")
    allp = com[["a", "b", "c"]].merge(toff, on=["a", "b"], how="outer")
    if len(allp) > pair_limit:
        raise GuardExceeded(
            f"simrank: {len(allp)} live pairs exceed "
            f"pair_limit={pair_limit}")
    cc = allp["c"].fillna(0).to_numpy("int64")
    tt = allp["t"].fillna(0).to_numpy("int64")
    da = allp["a"].map(din).to_numpy("int64")
    db = allp["b"].map(din).to_numpy("int64")
    allp["simrank"] = (c_num * (scale * cc + tt)) // (c_den * da * db)
    return _finish(allp[["a", "b", "simrank"]])


def temporal_reach(edges_ds, *, src: str = "src", dst: str = "dst",
                   ts: str = "ts", start_prefix: str = "P",
                   rounds: int = 3, mode: str = "auto",
                   driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Time-respecting earliest-arrival reachability over a temporal
    edge set (Holme & Saramäki, Phys. Rep. 2012; Wu et al., VLDB'14
    one-pass earliest-arrival — public): a path is valid only if edge
    timestamps are NON-DECREASING along it (information can't hop
    backwards in time), and each reached node reports its EARLIEST
    arrival.  Bounded Bellman-Ford-style rounds from every node whose
    id starts with ``start_prefix``:

        A₁(s, v)   = min ts over edges (s, v, ts)
        A_h(s, v)  = min(A_{h-1}(s, v),
                         min_{(u,v,ts)∈E, ts ≥ A_{h-1}(s,u)} ts)

    — exact timestamp comparisons and min-combines only, so the
    unrolled per-round SQL twin hash-matches (arrivals exported as
    int64 epoch-microseconds).  Self-loop edges drop.  Rounds bound
    the hop radius the way kg_sssp bounds Bellman-Ford — the classic
    diffusion question ("whom could the information have reached by
    when?") needs the near radius, not the transitive closure.

    Scale shape: each round is ONE hash join of the arrival frontier
    with the edge set keyed on the frontier node (the ts ≥ arr filter
    rides inside the join's map side) + a pre-combined per-(src, v)
    min, then a min-merge with the previous round — kg_sssp's
    exchange pattern with a temporal relaxation; the guarded driver
    twin (≤ ``driver_edge_limit`` distinct edges) runs the same
    rounds as pandas merges and is pinned equal in pytest.

    Returns a pandas frame (src, dst, arrival_us int64) sorted."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, hash_join

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    def _to_us(a) -> np.ndarray:
        return np.asarray(a).astype("datetime64[us]").astype("int64")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"node": "dst"})
        out["arrival_us"] = out["arrival_us"].astype("int64")
        return (out[["src", "dst", "arrival_us"]]
                .sort_values(["src", "dst"]).reset_index(drop=True))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"src": pd.Series(dtype="object"),
                             "dst": pd.Series(dtype="object"),
                             "arrival_us": pd.Series(dtype="int64")})

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b[src] != b[dst]]
        return pd.DataFrame({"s": d[src].to_numpy(object),
                             "o": d[dst].to_numpy(object),
                             "t": _to_us(d[ts].to_numpy())})

    e_ds = groupby_agg(
        edges_ds.map_batches(prep, batch_format="pandas"),
        ["s", "o"], [("t", "min", "t")]).materialize()

    if mode != "shuffle" and e_ds.count() <= driver_edge_limit:
        f = e_ds.to_pandas()
        if not len(f):
            return _empty()
        a = (f[f["s"].str.startswith(start_prefix)]
             .groupby(["s", "o"], as_index=False)["t"].min()
             .rename(columns={"s": "src", "o": "node",
                              "t": "arrival_us"}))
        for _ in range(rounds - 1):
            step = a.merge(f, left_on="node", right_on="s")
            step = step[step["t"] >= step["arrival_us"]]
            step = (step.groupby(["src", "o"], as_index=False)["t"]
                    .min().rename(columns={"o": "node",
                                           "t": "arrival_us"}))
            a = (pd.concat([a, step], ignore_index=True)
                 .groupby(["src", "node"], as_index=False)
                 ["arrival_us"].min())
        return _finish(a)

    # shuffle path: per round one frontier ⋈ edges join + min-combine
    a_ds = groupby_agg(
        e_ds.map_batches(
            lambda b: (b[b["s"].str.startswith(start_prefix)]
                       .rename(columns={"s": "src", "o": "node",
                                        "t": "arrival_us"})),
            batch_format="pandas"),
        ["src", "node"], [("arrival_us", "min", "arrival_us")]
    ).materialize()
    for _ in range(rounds - 1):
        step = hash_join(
            a_ds, e_ds.map_batches(
                lambda b: b.rename(columns={"s": "node"}),
                batch_format="pandas"),
            on="node", empty_safe=True).map_batches(
            lambda b: (b.loc[b["t"] >= b["arrival_us"],
                             ["src", "o", "t"]]
                       .rename(columns={"o": "node",
                                        "t": "arrival_us"})),
            batch_format="pandas")
        a_ds = groupby_agg(
            a_ds.union(step), ["src", "node"],
            [("arrival_us", "min", "arrival_us")]).materialize()
    df = a_ds.to_pandas()
    if not len(df):
        return _empty()
    return _finish(df)


def conductance_census(edges_ds, labels: pd.DataFrame, *,
                       src: str = "src", dst: str = "dst",
                       node_col: str = "entity",
                       label_col: str = "community",
                       scale: int = 1_000_000) -> pd.DataFrame:
    """Per-community conductance over a node labeling (Leskovec et
    al., WWW'08 network-community-profile methodology — public):
    φ(S) = cut(S) / min(vol(S), 2m − vol(S)) with cut = undirected
    edges leaving S and vol = Σ degree over members, reported as an
    exact int64 floor ``conductance_ppm = cut·scale //
    min(vol, 2m−vol)`` so the SQL twin hash-matches.  Communities
    whose denominator is 0 (the whole graph in one label) are
    excluded — both engines agree.

    Scale shape: ONE linear pass over the symmetric distinct edge set
    with the node→label map broadcast (``ray.put``; label tables are
    entity-vocabulary-bounded, the same posture as the KB-enrich
    broadcast) emitting per-label (vol, cut) combiner partials — each
    symmetric edge row contributes 1 to vol(label(src)) and, when the
    endpoint labels differ, 1 to cut — then one label-sized groupby
    finish on the driver.  No pair fan-out, no shuffle beyond the
    edge distinct.

    Returns (community, n_nodes, vol, cut_edges, conductance_ppm)
    sorted by community."""
    import ray

    from .relational import bcast_get, distinct_on

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b[src] != b[dst]]
        return pd.DataFrame({
            "a": np.concatenate([d[src].to_numpy(object),
                                 d[dst].to_numpy(object)]),
            "b": np.concatenate([d[dst].to_numpy(object),
                                 d[src].to_numpy(object)])})

    und = distinct_on(
        edges_ds.map_batches(to_sym, batch_format="pandas"),
        ["a", "b"]).materialize()
    lmap_ref = ray.put(dict(zip(labels[node_col], labels[label_col])))

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        m = bcast_get(lmap_ref)
        la = b["a"].map(m)
        lb = b["b"].map(m)
        g = pd.DataFrame({"community": la.to_numpy(object),
                          "vol": np.int64(1),
                          "cut": (la.to_numpy(object)
                                  != lb.to_numpy(object))
                          .astype("int64")})
        return (g.groupby("community", as_index=False)
                [["vol", "cut"]].sum())

    part = und.map_batches(partials, batch_format="pandas").to_pandas()
    if not len(part):
        return pd.DataFrame({
            "community": pd.Series(dtype="object"),
            "n_nodes": pd.Series(dtype="int64"),
            "vol": pd.Series(dtype="int64"),
            "cut_edges": pd.Series(dtype="int64"),
            "conductance_ppm": pd.Series(dtype="int64")})
    agg = part.groupby("community", as_index=False)[["vol", "cut"]] \
        .sum()
    m2 = int(agg["vol"].sum())
    nn = (labels.groupby(label_col).size().rename("n_nodes")
          .reset_index().rename(columns={label_col: "community"}))
    out = agg.merge(nn, on="community", how="left")
    out["n_nodes"] = out["n_nodes"].fillna(0).astype("int64")
    vol = out["vol"].to_numpy("int64")
    den = np.minimum(vol, m2 - vol)
    keep = den > 0
    out = out[keep]
    out["conductance_ppm"] = (
        out["cut"].to_numpy("int64") * scale
        // den[keep]).astype("int64")
    out = out.rename(columns={"cut": "cut_edges"})
    out["vol"] = out["vol"].astype("int64")
    return (out[["community", "n_nodes", "vol", "cut_edges",
                 "conductance_ppm"]]
            .sort_values("community").reset_index(drop=True))


def degree_assortativity(edges_ds, *, src: str = "src",
                         dst: str = "dst",
                         scale: int = 1_000_000) -> pd.DataFrame:
    """Degree assortativity (Newman, PRL 2002 — public): the Pearson
    correlation of endpoint degrees across the symmetric distinct
    edge set, kept EXACT by avoiding the square root — report the
    covariance/variance building blocks as int64 sums plus
    ``r2_ppm = sign · (cov² · scale) // (var_x · var_y)`` (r² in ppm
    with r's sign), all integer floor arithmetic both engines
    reproduce bit-for-bit.

    Over the symmetric edge list (each undirected edge twice, once
    per orientation) x = deg(a), y = deg(b) per row — the standard
    undirected estimator; x and y are exchangeable so Σx = Σy and
    var_x = var_y, but both report for the census shape.

    Scale shape: degrees come from one pre-combined groupby broadcast
    as a node→degree map (entity-vocabulary-bounded); the moment sums
    (Σx, Σy, Σxy, Σx², Σy², m) are per-batch combiner partials — one
    linear pass, one tiny driver fold.  Returns a single-row frame
    (m, sum_x, sum_y, sum_xy, sum_x2, sum_y2, sign, r2_ppm)."""
    import ray

    from .relational import bcast_get, distinct_on, groupby_agg

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b[src] != b[dst]]
        return pd.DataFrame({
            "a": np.concatenate([d[src].to_numpy(object),
                                 d[dst].to_numpy(object)]),
            "b": np.concatenate([d[dst].to_numpy(object),
                                 d[src].to_numpy(object)])})

    und = distinct_on(
        edges_ds.map_batches(to_sym, batch_format="pandas"),
        ["a", "b"]).materialize()
    deg = groupby_agg(und, ["a"], [("b", "count", "d")]).to_pandas()
    dref = ray.put(dict(zip(deg["a"], deg["d"].astype("int64"))))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        m = bcast_get(dref)
        x = b["a"].map(m).to_numpy("int64")
        y = b["b"].map(m).to_numpy("int64")
        return pd.DataFrame({
            "m": [np.int64(len(b))], "sum_x": [x.sum()],
            "sum_y": [y.sum()], "sum_xy": [(x * y).sum()],
            "sum_x2": [(x * x).sum()], "sum_y2": [(y * y).sum()]})

    p = und.map_batches(moments, batch_format="pandas").to_pandas()
    cols = ["m", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
    t = {c: int(p[c].sum()) for c in cols}
    cov = t["m"] * t["sum_xy"] - t["sum_x"] * t["sum_y"]
    vx = t["m"] * t["sum_x2"] - t["sum_x"] * t["sum_x"]
    vy = t["m"] * t["sum_y2"] - t["sum_y"] * t["sum_y"]
    sign = 0 if cov == 0 else (1 if cov > 0 else -1)
    r2 = (cov * cov * scale) // (vx * vy) if vx > 0 and vy > 0 else 0
    out = pd.DataFrame([{**t, "sign": np.int64(sign),
                         "r2_ppm": np.int64(sign * r2)}])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---- 4-cycle (square) census --------------------------------------------


def _squares_driver(edges: pd.DataFrame, src: str, dst: str, *,
                    wedge_limit: int,
                    chunk_wedges: int = 20_000_000) -> pd.DataFrame:
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    zero = pd.DataFrame([{
        "n_nodes": np.int64(n), "n_edges": np.int64(0),
        "wedges": np.int64(0), "diag_pairs": np.int64(0),
        "squares": np.int64(0), "skipped_centers": np.int64(0)}])
    if n == 0:
        return zero
    keep = s_i != d_i
    lo = np.minimum(s_i[keep], d_i[keep])
    hi = np.maximum(s_i[keep], d_i[keep])
    ukey = np.unique(lo * n + hi)
    if not len(ukey):
        return zero
    zero["n_edges"] = np.int64(len(ukey))
    # symmetric (center, leaf) sorted by center then leaf index, so
    # within-center pairs come out with x < y by construction
    c = np.concatenate([ukey // n, ukey % n])
    leaf = np.concatenate([ukey % n, ukey // n])
    order = np.lexsort((leaf, c))
    c, leaf = c[order], leaf[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    sizes = np.diff(np.r_[starts, len(c)])
    n_wedges = int((sizes * (sizes - 1) // 2).sum())
    if n_wedges > wedge_limit:
        raise GuardExceeded(
            f"square_census(mode='driver'): {n_wedges} wedges > "
            f"{wedge_limit}; use mode='shuffle'")
    # chunk the wedge expansion over center ranges so peak memory is
    # bounded by chunk_wedges keys, not the whole fan-out (the ADVICE
    # r4 k-truss lesson applied up front)
    wcum = np.cumsum(sizes * (sizes - 1) // 2)
    key_parts: list[np.ndarray] = []
    cnt_parts: list[np.ndarray] = []
    g0 = 0
    while g0 < len(sizes):
        g1 = int(np.searchsorted(
            wcum, (wcum[g0 - 1] if g0 else 0) + chunk_wedges,
            side="right")) + 1
        g1 = min(max(g1, g0 + 1), len(sizes))
        a0, a1 = starts[g0], starts[g1 - 1] + sizes[g1 - 1]
        first, second = _pair_ranges(sizes[g0:g1])
        sub = leaf[a0:a1]
        pk = sub[first] * n + sub[second]
        uk, ct = np.unique(pk, return_counts=True)
        key_parts.append(uk)
        cnt_parts.append(ct.astype(np.int64))
        g0 = g1
    keys = np.concatenate(key_parts) if key_parts else np.array([], np.int64)
    cnts = np.concatenate(cnt_parts) if cnt_parts else np.array([], np.int64)
    o = np.argsort(keys, kind="mergesort")
    keys, cnts = keys[o], cnts[o]
    bnd = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) \
        if len(keys) else np.array([], np.int64)
    cn = np.add.reduceat(cnts, bnd) if len(keys) else np.array([], np.int64)
    squares2 = int((cn * (cn - 1) // 2).sum())
    return pd.DataFrame([{
        "n_nodes": np.int64(n), "n_edges": np.int64(len(ukey)),
        "wedges": np.int64(int(cn.sum())),
        "diag_pairs": np.int64(len(cn)),
        "squares": np.int64(squares2 // 2),
        "skipped_centers": np.int64(0)}])


def square_census(edges_ds, *, src: str = "src", dst: str = "dst",
                  mode: str = "auto",
                  driver_edge_limit: int = _DEF_EDGE_LIMIT,
                  wedge_limit: int = 100_000_000,
                  max_center: int = 5000,
                  n_buckets: int | None = None) -> pd.DataFrame:
    """4-cycle (square) census of the undirected distinct graph: every
    4-cycle a–x–c–y–a is counted once via its two diagonal pairs —
    ``squares = Σ_{unordered pairs (x,y)} C(cn(x,y), 2) / 2`` where
    ``cn`` is the common-neighbor (2-path) count (the rectangle-count
    identity; Chiba & Nishizeki SIAM J. Comput. 1985, public).  Exact
    int64 arithmetic end to end, so the SQL wedge-groupby twin is
    bit-identical.  Squares are the minimal even-cycle motif —
    bipartite-ish density signal where triangles are blind (KG
    co-mention graphs: two entities sharing two distinct contexts).

    Returns ONE row: (n_nodes, n_edges, wedges, diag_pairs, squares,
    skipped_centers) — all int64.

    Scale shape: the wedge fan-out is Σ_c C(deg_c, 2), hub-quadratic
    with no orientation rescue (every square must close through BOTH
    diagonals), so each mode carries its own bound: driver mode guards
    total wedges (``wedge_limit``, GuardExceeded past it) and chunks
    the expansion over center ranges (peak memory ≈ chunk keys, not
    the fan-out); shuffle mode fans wedges out per center bucket
    (one bounded exchange), CAPS centers wider than ``max_center``
    (skips REPORTED in ``skipped_centers``, the co_occurrence_pairs
    contract — never silent), pre-combines C(cn,2) per batch after the
    pair groupby, and only census partials reach the driver."""
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            return _squares_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, wedge_limit=wedge_limit)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _squares_shuffle(edges_ds, src, dst, max_center=max_center,
                            n_buckets=n_buckets)


def _squares_shuffle(edges_ds, src: str, dst: str, *, max_center: int,
                     n_buckets: int | None) -> pd.DataFrame:
    from .relational import default_n_buckets, distinct_on, groupby_agg

    nb = n_buckets or default_n_buckets()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b[src] != b[dst]]
        return pd.DataFrame({
            "c": np.concatenate([d[src].to_numpy(object),
                                 d[dst].to_numpy(object)]),
            "l": np.concatenate([d[dst].to_numpy(object),
                                 d[src].to_numpy(object)])})

    und = distinct_on(
        edges_ds.map_batches(to_sym, batch_format="pandas"),
        ["c", "l"]).materialize()
    n_nodes = int(groupby_agg(und, ["c"], [("l", "count", "d")]).count())
    n_edges = int(und.count()) // 2

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "l"], kind="mergesort")
        cc = g["c"].to_numpy(object)
        ll = g["l"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]]) \
            if len(cc) else np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(cc)])
        hot = sizes > max_center
        keepmask = ~np.repeat(hot, sizes)
        first, second = _pair_ranges(sizes[~hot])
        lk = ll[keepmask]
        out = pd.DataFrame({"x": lk[first], "y": lk[second],
                            "skipped": np.int64(0)})
        if hot.any():
            out = pd.concat([out, pd.DataFrame(
                {"x": cc[starts[hot]], "y": "",
                 "skipped": np.int64(1)})], ignore_index=True)
        return out

    wedge_ds = und.map_batches(
        lambda b: b.assign(__bk=pd.util.hash_array(
            b["c"].to_numpy(object)) % nb),
        batch_format="pandas",
    ).groupby("__bk").map_groups(pairs, batch_format="pandas") \
        .materialize()
    skipped = int(
        wedge_ds.map_batches(
            lambda b: pd.DataFrame({"s": [int(b["skipped"].sum())]}),
            batch_format="pandas").to_pandas()["s"].sum())
    pc = groupby_agg(
        wedge_ds.map_batches(
            lambda b: b[b["skipped"] == 0][["x", "y"]],
            batch_format="pandas"),
        ["x", "y"], [("x", "count", "cn")])

    def census(b: pd.DataFrame) -> pd.DataFrame:
        cn = b["cn"].to_numpy("int64")
        return pd.DataFrame([{
            "wedges": np.int64(cn.sum()),
            "diag_pairs": np.int64(len(cn)),
            "sq2": np.int64((cn * (cn - 1) // 2).sum())}])

    p = pc.map_batches(census, batch_format="pandas").to_pandas()
    return pd.DataFrame([{
        "n_nodes": np.int64(n_nodes), "n_edges": np.int64(n_edges),
        "wedges": np.int64(int(p["wedges"].sum()) if len(p) else 0),
        "diag_pairs": np.int64(int(p["diag_pairs"].sum()) if len(p) else 0),
        "squares": np.int64((int(p["sq2"].sum()) if len(p) else 0) // 2),
        "skipped_centers": np.int64(skipped)}])


# ---- SCAN structural clustering ------------------------------------------


def _scan_driver(edges: pd.DataFrame, src: str, dst: str, *,
                 eps_num: int, eps_den: int, mu: int,
                 rounds: int) -> pd.DataFrame:
    edges = edges[edges[src] != edges[dst]]
    nodes, s_i, d_i = _index_graph(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": pd.Series([], dtype=object),
                             "role": pd.Series([], dtype=object),
                             "cluster": pd.Series([], dtype=object)})
    lo = np.minimum(s_i, d_i)
    hi = np.maximum(s_i, d_i)
    ukey = np.unique(lo * n + hi)
    a, b = ukey // n, ukey % n
    deg = (np.bincount(a, minlength=n)
           + np.bincount(b, minlength=n)).astype(np.int64)
    sup = _truss_support_int(a, b, n)
    ccn = sup + 2                      # closed-neighborhood overlap
    simmask = (eps_den * eps_den) * ccn * ccn \
        >= (eps_num * eps_num) * (deg[a] + 1) * (deg[b] + 1)
    sa, sb = a[simmask], b[simmask]
    simcnt = (np.bincount(sa, minlength=n)
              + np.bincount(sb, minlength=n)).astype(np.int64)
    is_core = (simcnt + 1) >= mu
    # synchronous min-label rounds over core-core similar edges
    cm = is_core[sa] & is_core[sb]
    ca, cb = sa[cm], sb[cm]
    lbl = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        new = lbl.copy()
        np.minimum.at(new, cb, lbl[ca])
        np.minimum.at(new, ca, lbl[cb])
        lbl = new
    role = np.full(n, "outlier", dtype=object)
    cluster = np.full(n, "", dtype=object)
    role[is_core] = "core"
    cluster[is_core] = nodes[lbl[is_core]]
    # members: non-core endpoint of a similar edge to a core; cluster
    # = min core-neighbor cluster (index min == lexicographic min)
    one_core = is_core[sa] ^ is_core[sb]
    na = np.where(is_core[sa], sb, sa)[one_core]
    nc = np.where(is_core[sa], sa, sb)[one_core]
    mlab = np.full(n, n, dtype=np.int64)
    np.minimum.at(mlab, na, lbl[nc])
    is_member = (~is_core) & (mlab < n)
    role[is_member] = "member"
    cluster[is_member] = nodes[mlab[is_member]]
    # hubs among the rest: >= 2 distinct core-neighbor clusters
    rest = (~is_core) & (~is_member)
    es = np.concatenate([a, b])
    ed = np.concatenate([b, a])
    m2 = is_core[ed] & rest[es]
    if m2.any():
        key = es[m2] * np.int64(n) + lbl[ed[m2]]
        uk = np.unique(key)
        kcnt = np.bincount(uk // n, minlength=n)
        role[rest & (kcnt >= 2)] = "hub"
    return pd.DataFrame({"entity": nodes, "role": role,
                         "cluster": cluster})


def scan_cluster(edges_ds, *, src: str = "src", dst: str = "dst",
                 eps_num: int = 7, eps_den: int = 10, mu: int = 3,
                 rounds: int = 8, mode: str = "auto",
                 driver_edge_limit: int = _DEF_EDGE_LIMIT) -> pd.DataFrame:
    """SCAN structural graph clustering (Xu et al., KDD'07 — public),
    deterministic bounded-round variant with every comparison exact
    int64 so the generated SQL twin is bit-identical:

    - structural similarity per undirected edge:
      σ(u,v) = |N[u]∩N[v]| / √(|N[u]|·|N[v]|) over CLOSED
      neighborhoods; the ε-test is squared —
      ``eps_den²·(cn+2)² ≥ eps_num²·(deg_u+1)·(deg_v+1)`` — so no
      square root ever materializes (the kg_assortativity discipline);
    - cores: nodes with ≥ μ ε-similar neighbors (self included,
      σ(u,u)=1);
    - clusters: ``rounds`` synchronous min-label rounds over the
      core–core ε-similar subgraph (label = lexicographically
      smallest member, exact wherever cluster diameter ≤ rounds);
    - non-cores: ``member`` of the min ε-similar core neighbor's
      cluster; else ``hub`` when plain edges reach ≥ 2 distinct core
      clusters (the bridge role); else ``outlier`` — SCAN's
      hub/outlier separation is exactly what LPA/components cannot
      express (noise-robust community detection for KG curation).

    Returns (entity, role, cluster) for EVERY node, cluster '' for
    hub/outlier rows, sorted by entity.

    Scale shape: the similarity pass is the k-truss edge-support
    kernel (chunked CSR wedge expansion, O(m^1.5) by orientation);
    driver mode guards the edge list (GuardExceeded past
    ``driver_edge_limit``); shuffle mode composes the oriented
    triangle closure + bounded label_components exchanges — no step
    is hub-quadratic and nothing row-scale reaches the driver."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            return _scan_driver(
                _edges_to_driver(edges_ds, src, dst, driver_edge_limit),
                src, dst, eps_num=eps_num, eps_den=eps_den, mu=mu,
                rounds=rounds)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _scan_shuffle(edges_ds, src, dst, eps_num=eps_num,
                         eps_den=eps_den, mu=mu, rounds=rounds)


def _scan_shuffle(edges_ds, src: str, dst: str, *, eps_num: int,
                  eps_den: int, mu: int, rounds: int) -> pd.DataFrame:
    """Dataset-native SCAN: oriented wedge closure for per-edge
    support (the _triangles_shuffle plan, crediting all three edges of
    each closed triangle), degree joins, the squared ε-test, a core
    census, label_components(mode='shuffle') over the core-similar
    subgraph, then member/hub classification via bounded joins.  The
    final role table is node-sized; only that reaches the driver."""
    from .relational import (_compact_nonempty, default_n_buckets,
                             distinct_on, groupby_agg, hash_join)

    def mat(ds):
        # every join input rides _compact_nonempty: sparse partitions
        # leave SCHEMALESS empty blocks that crash the next join
        return _compact_nonempty(ds.materialize())

    def typed_or(ds, **cols):
        # an ALL-empty groupby/filter output can be schemaless, which
        # defeats hash_join's empty_safe short-circuit (it needs both
        # schemas) — substitute a typed empty so outer joins survive
        import pyarrow as pa
        import ray.data as rd
        if ds.count():
            return ds
        return rd.from_arrow(pa.table(
            {k: pa.array([], t) for k, t in cols.items()}))

    nb = default_n_buckets()

    def canon(bt: pd.DataFrame) -> pd.DataFrame:
        bt = bt[bt[src] != bt[dst]]
        s = bt[src].to_numpy(object)
        d = bt[dst].to_numpy(object)
        fwd = s < d
        return pd.DataFrame({"a": np.where(fwd, s, d),
                             "b": np.where(fwd, d, s)})

    ce = mat(distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"]))
    deg = mat(groupby_agg(
        ce.map_batches(
            lambda bt: pd.DataFrame({"node": pd.concat(
                [bt["a"], bt["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "deg")]))
    # oriented wedge closure (degree order, ties by id)
    ab = hash_join(ce, deg, on="a", right_on="node").map_batches(
        lambda bt: bt.rename(columns={"deg": "deg_a"}),
        batch_format="pandas")
    abd = hash_join(mat(ab), deg, on="b", right_on="node",
                    empty_safe=True).map_batches(
        lambda bt: bt.rename(columns={"deg": "deg_b"}),
        batch_format="pandas")

    def orient(bt: pd.DataFrame) -> pd.DataFrame:
        fwd = (bt["deg_a"] < bt["deg_b"]) | (
            (bt["deg_a"] == bt["deg_b"]) & (bt["a"] < bt["b"]))
        f = fwd.to_numpy()
        return pd.DataFrame({
            "u": np.where(f, bt["a"], bt["b"]),
            "v": np.where(f, bt["b"], bt["a"]),
            "deg_v": np.where(f, bt["deg_b"], bt["deg_a"]),
            "__bk": pd.util.hash_array(
                np.where(f, bt["a"], bt["b"])) % nb})

    oriented = mat(abd.map_batches(orient, batch_format="pandas"))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "deg_v", "v"], kind="mergesort")
        u_arr = g["u"].to_numpy(object)
        v_arr = g["v"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, u_arr[1:] != u_arr[:-1]]) \
            if len(u_arr) else np.array([], np.int64)
        sizes = np.diff(np.r_[starts, len(u_arr)])
        first, second = _pair_ranges(sizes)
        return pd.DataFrame({"wu": u_arr[first], "wv": v_arr[first],
                             "ww": v_arr[second]})

    wedge_ds = mat(oriented.groupby("__bk").map_groups(
        wedges, batch_format="pandas"))
    sup = None
    if wedge_ds.count():
        closed = hash_join(
            wedge_ds,
            oriented.map_batches(lambda bt: bt[["u", "v"]],
                                 batch_format="pandas"),
            on=["wv", "ww"], right_on=["u", "v"])

        def credit(bt: pd.DataFrame) -> pd.DataFrame:
            # each closed triangle credits its three canonical edges
            pairs = []
            for x, y in (("wu", "wv"), ("wu", "ww"), ("wv", "ww")):
                p = bt[[x, y]].to_numpy(object)
                loe = np.minimum(p[:, 0], p[:, 1])
                hie = np.maximum(p[:, 0], p[:, 1])
                pairs.append(pd.DataFrame({"a": loe, "b": hie}))
            return pd.concat(pairs, ignore_index=True)

        sup = mat(groupby_agg(
            closed.map_batches(credit, batch_format="pandas"),
            ["a", "b"], [("a", "count", "cn")]))
    se = hash_join(mat(abd), sup, on=["a", "b"],
                   how="left_outer", empty_safe=True) if sup is not None \
        else abd.map_batches(lambda bt: bt.assign(cn=np.int64(0)),
                             batch_format="pandas")

    def simtest(bt: pd.DataFrame) -> pd.DataFrame:
        cn = bt["cn"].fillna(0).to_numpy("int64") + 2
        da = bt["deg_a"].to_numpy("int64") + 1
        db = bt["deg_b"].to_numpy("int64") + 1
        ok = (eps_den * eps_den) * cn * cn >= \
            (eps_num * eps_num) * da * db
        return bt[["a", "b"]][ok]

    import pyarrow as pa
    sim = typed_or(mat(se.map_batches(simtest, batch_format="pandas")),
                   a=pa.large_string(), b=pa.large_string())
    simcnt = groupby_agg(
        sim.map_batches(
            lambda bt: pd.DataFrame({"node": pd.concat(
                [bt["a"], bt["b"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "sc")])
    cores = typed_or(mat(simcnt.map_batches(
        lambda bt: bt[bt["sc"] + 1 >= mu][["node"]].assign(
            is_core=True),
        batch_format="pandas")),
        node=pa.large_string(), is_core=pa.bool_())
    # core-core similar edges -> bounded min-label rounds
    # int8 flags immediately after each left join: an all-NaN block
    # otherwise lands as Arrow null-typed and crashes the NEXT join
    # (the Ray 2.49 sparse-partition defect, sentinel discipline)
    sc1 = hash_join(sim, cores, on="a", right_on="node",
                    how="left_outer", empty_safe=True).map_batches(
        lambda bt: bt.assign(
            core_a=bt["is_core"].notna().astype("int8")).drop(
            columns=["is_core"]),
        batch_format="pandas")
    sc2 = hash_join(mat(sc1), cores, on="b", right_on="node",
                    how="left_outer", empty_safe=True).map_batches(
        lambda bt: bt.assign(
            core_b=bt["is_core"].notna().astype("int8")).drop(
            columns=["is_core"]),
        batch_format="pandas")
    sc2 = mat(sc2)
    cc = sc2.map_batches(
        lambda bt: bt[(bt["core_a"] == 1) & (bt["core_b"] == 1)]
        [["a", "b"]], batch_format="pandas")
    have_core_edges = bool(cc.count())
    if have_core_edges:
        lab = mat(label_components(cc, src="a", dst="b",
                                   rounds=rounds,
                                   mode="shuffle").map_batches(
            lambda bt: bt[["entity", "component"]].rename(
                columns={"entity": "node", "component": "lbl"}),
            batch_format="pandas"))
    else:
        import pyarrow as pa
        import ray.data as rd
        lab = rd.from_arrow(pa.table({
            "node": pa.array([], pa.large_string()),
            "lbl": pa.array([], pa.large_string())}))
    # isolated cores (no core-core similar edge) label themselves
    solo = mat(hash_join(cores, lab, on="node", how="left_outer",
                         empty_safe=True).map_batches(
        lambda bt: pd.DataFrame({
            "node": bt["node"],
            "lbl": bt["lbl"].where(bt["lbl"].notna(),
                                   bt["node"]).astype(str)}),
        batch_format="pandas"))
    # members: non-core endpoint of a similar edge to a core
    ms = hash_join(sc2, solo, on="a", right_on="node",
                   how="left_outer", empty_safe=True).map_batches(
        lambda bt: bt.assign(
            lbl_a=bt["lbl"].fillna("").astype(str)).drop(
            columns=["lbl"]),
        batch_format="pandas")
    ms2 = hash_join(mat(ms), solo, on="b", right_on="node",
                    how="left_outer", empty_safe=True).map_batches(
        lambda bt: bt.assign(
            lbl_b=bt["lbl"].fillna("").astype(str)).drop(
            columns=["lbl"]),
        batch_format="pandas")
    ms2 = mat(ms2)

    def member_rows(bt: pd.DataFrame) -> pd.DataFrame:
        ca = (bt["core_a"] == 1).to_numpy()
        cb = (bt["core_b"] == 1).to_numpy()
        one = ca ^ cb
        # the core side's label is always non-'' (solo covers cores)
        node = np.where(ca, bt["b"], bt["a"])[one]
        lblc = np.where(ca, bt["lbl_a"], bt["lbl_b"])[one]
        return pd.DataFrame({"node": node, "clab": lblc})

    # the member/core label tables are renamed BEFORE typed_or: a
    # map_batches over a 0-row dataset emits ZERO blocks, which blinds
    # hash_join's empty_safe schema recovery and silently collapses
    # the left_outer null-extension to an empty result
    memb = typed_or(mat(groupby_agg(
        ms2.map_batches(member_rows, batch_format="pandas"),
        ["node"], [("clab", "min", "memb_lbl")])),
        node=pa.large_string(), memb_lbl=pa.large_string())
    # hub test over plain edges: distinct core-neighbor clusters >= 2
    sym = ce.map_batches(
        lambda bt: pd.DataFrame({
            "s": np.concatenate([bt["a"].to_numpy(object),
                                 bt["b"].to_numpy(object)]),
            "t": np.concatenate([bt["b"].to_numpy(object),
                                 bt["a"].to_numpy(object)])}),
        batch_format="pandas")
    hn = hash_join(sym, solo, on="t", right_on="node",
                   how="inner", empty_safe=True)
    hub_count = None
    if bool(hn.count()):
        hub_count = mat(groupby_agg(
            distinct_on(hn.map_batches(
                lambda bt: bt[["s", "lbl"]], batch_format="pandas"),
                ["s", "lbl"]),
            ["s"], [("lbl", "count", "k")]))
    # assemble per-node roles
    nodes_ds = deg.map_batches(lambda bt: bt[["node"]],
                               batch_format="pandas")
    solo_r = typed_or(mat(solo.map_batches(
        lambda bt: bt.rename(columns={"lbl": "core_lbl"}),
        batch_format="pandas")),
        node=pa.large_string(), core_lbl=pa.large_string())
    r1 = hash_join(nodes_ds, solo_r, on="node", how="left_outer",
                   empty_safe=True).map_batches(
        lambda bt: bt.assign(
            core_lbl=bt["core_lbl"].fillna("").astype(str)),
        batch_format="pandas")
    r2 = hash_join(mat(r1), memb, on="node", how="left_outer",
                   empty_safe=True).map_batches(
        lambda bt: bt.assign(
            memb_lbl=bt["memb_lbl"].fillna("").astype(str)),
        batch_format="pandas")
    if hub_count is not None:
        r3 = hash_join(mat(r2), hub_count.map_batches(
            lambda bt: bt.rename(columns={"s": "node"}),
            batch_format="pandas"), on="node", how="left_outer",
            empty_safe=True).map_batches(
            lambda bt: bt.assign(
                k=bt["k"].fillna(0).astype("int64")),
            batch_format="pandas")
    else:
        r3 = r2.map_batches(lambda bt: bt.assign(k=np.int64(0)),
                            batch_format="pandas")

    def finish(bt: pd.DataFrame) -> pd.DataFrame:
        corel = bt["core_lbl"].to_numpy(object)
        membl = bt["memb_lbl"].to_numpy(object)
        k = bt["k"].to_numpy("int64")
        role = np.where(corel != "", "core",
                        np.where(membl != "", "member",
                                 np.where(k >= 2, "hub", "outlier")))
        cluster = np.where(corel != "", corel,
                           np.where(membl != "", membl, ""))
        return pd.DataFrame({"entity": bt["node"],
                             "role": pd.Series(role, dtype=object),
                             "cluster": pd.Series(cluster,
                                                  dtype=object)})

    out = r3.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values("entity").reset_index(drop=True)


def heavy_edge_matching(edges_ds, *, src: str = "src", dst: str = "dst",
                        mode: str = "auto",
                        driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """One round of deterministic HEAVY-EDGE MATCHING (the METIS
    multilevel coarsening primitive, Karypis & Kumar 1998, public)
    over the weighted undirected entity graph: edge weight = triple
    multiplicity per unordered pair; every node PROPOSES to its
    max-weight neighbor (ties → lexicographically smallest neighbor);
    an edge matches iff the proposals are MUTUAL — the classic
    one-round parallel matching that needs no sequential visit order.
    Matched pairs contract to supernode = min(u, v); unmatched nodes
    keep themselves.  Mutual-proposal matching is maximal-in-practice
    (≈ half of a maximum matching in the worst case) and every step is
    an argmax or a join — exact on any engine.

    Scale shape: ONE pre-combined pair-count exchange (the weight
    table), one grouped top-1 (algebraic combiner, no map_groups on
    the hot path), one self-join of the node-sized proposal table.
    Differs from maximal_independent_set: matching pairs NODES via
    mutual argmax (coarsening), MIS selects an antichain via hash
    priorities (symmetry breaking).

    Returns a Dataset of ``(entity, supernode, matched bool)`` sorted
    by entity."""
    import ray.data as rd

    from .relational import distinct_on, groupby_agg, grouped_topk, hash_join

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[src] != b[dst]]
        a = b[src].to_numpy(dtype=object)
        c = b[dst].to_numpy(dtype=object)
        lo = np.where(a < c, a, c)
        hi = np.where(a < c, c, a)
        return pd.DataFrame({"a": lo, "b": hi})

    pw = groupby_agg(
        edges_ds.map_batches(pairs, batch_format="pandas"),
        ["a", "b"], [("a", "count", "w")])

    if mode in ("driver", "auto"):
        try:
            parts, total = [], 0
            for part in pw.iter_batches(batch_format="pandas",
                                        batch_size=None):
                total += len(part)
                if total > driver_edge_limit:
                    raise GuardExceeded(
                        f"heavy_edge_matching: > {driver_edge_limit} "
                        "weighted edges; use mode='shuffle'")
                parts.append(part)
            df = (pd.concat(parts, ignore_index=True) if parts
                  else pd.DataFrame({"a": pd.Series([], dtype=object),
                                     "b": pd.Series([], dtype=object),
                                     "w": pd.Series([], dtype="int64")}))
            sym = pd.DataFrame({
                "node": np.concatenate([df["a"].to_numpy(object),
                                        df["b"].to_numpy(object)]),
                "nbr": np.concatenate([df["b"].to_numpy(object),
                                       df["a"].to_numpy(object)]),
                "w": np.concatenate([df["w"].to_numpy(np.int64)] * 2)
                if len(df) else np.array([], dtype=np.int64),
            })
            sym = sym.sort_values(["w", "nbr"],
                                  ascending=[False, True],
                                  kind="mergesort")
            prop = sym.groupby("node", sort=False).head(1)
            back = prop.set_index("node")["nbr"]
            mutual = prop["nbr"].map(back).to_numpy(object) \
                == prop["node"].to_numpy(object)
            node = prop["node"].to_numpy(object)
            nbr = prop["nbr"].to_numpy(object)
            sup = np.where(mutual, np.where(node < nbr, node, nbr), node)
            out = pd.DataFrame({"entity": node, "supernode": sup,
                                "matched": mutual})
            out = out.sort_values("entity").reset_index(drop=True)
            return rd.from_pandas(out)
        except GuardExceeded:
            if mode == "driver":
                raise
    sym = pw.map_batches(
        lambda b: pd.DataFrame({
            "node": pd.concat([b["a"], b["b"]], ignore_index=True),
            "nbr": pd.concat([b["b"], b["a"]], ignore_index=True),
            "w": pd.concat([b["w"], b["w"]], ignore_index=True),
        }),
        batch_format="pandas",
    ).materialize()
    prop = grouped_topk(sym, ["node"], "w", 1, descending=True,
                        tie_break="nbr", mode="shuffle").materialize()
    other = prop.map_batches(
        lambda b: pd.DataFrame({"o_node": b["node"],
                                "o_nbr": b["nbr"]}),
        batch_format="pandas").materialize()
    joined = hash_join(prop, other, on="nbr", right_on="o_node",
                       how="left_outer", empty_safe=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        node = b["node"].to_numpy(object)
        nbr = b["nbr"].to_numpy(object)
        mutual = b["o_nbr"].to_numpy(object) == node
        sup = np.where(mutual, np.where(node < nbr, node, nbr), node)
        return pd.DataFrame({"entity": node, "supernode": sup,
                             "matched": mutual})

    return joined.map_batches(finish, batch_format="pandas") \
        .sort("entity")


def slashburn(edges_ds, *, src: str = "src", dst: str = "dst",
              k: int = 5, rounds: int = 3, label_rounds: int = 8,
              mode: str = "auto",
              driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """SlashBurn hub-removal ordering (Kang & Faloutsos, ICDM 2011,
    public — the "no good cut" answer for power-law graphs): per
    round, remove the k highest-degree hubs (ties → lexicographically
    smallest entity), let the graph shatter, set aside every node
    outside the giant connected component as a SPOKE, and recurse on
    the GCC.  The hub/spoke order concentrates the adjacency matrix's
    nonzeros — the compression / cache-layout ordering for graphs
    where balanced cuts don't exist.

    Determinism: hub selection (degree desc, entity asc), components
    by ``label_rounds`` bounded synchronous min-label rounds, GCC by
    (size desc, min label asc) — every tie explicit, so the generated
    unrolled SQL twin is bit-identical.  Nodes isolated by hub removal
    become singleton components, i.e. spokes.

    Returns (entity, round int64, role) — role ∈ 'hub' | 'spoke' for
    retired nodes (round = retirement round 1..R), 'core' (round =
    R + 1) for what remains in the final GCC.  Bounded-round caveat:
    if ``label_rounds`` has not converged, edges straddling two labels
    of one true component are dropped from the next round's induced
    subgraph — the SAME rule on both engines (and the SQL twin), so
    results stay bit-identical; raise ``label_rounds`` for graphs with
    long chains.

    Scale shape: each round is one degree groupby + a k-row top-k +
    ``label_rounds`` bounded label exchanges on a SHRINKING graph —
    mode='auto' runs the identical kernel driver-side under
    ``driver_edge_limit`` distinct edges and falls back to the
    composed Dataset ops past it."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def _driver(edges: pd.DataFrame) -> pd.DataFrame:
        und = _und_pairs_df(edges, src, dst)
        out_rows = []
        cur = und  # symmetric pair list
        for r in range(1, rounds + 1):
            if cur.empty:
                break
            nodes = np.unique(cur["src"].to_numpy(object))
            deg = cur.groupby("src", sort=False).size()
            deg = deg.reindex(nodes, fill_value=0)
            order = sorted(nodes,
                           key=lambda v: (-int(deg[v]), v))
            hubs = set(order[:k])
            for h in sorted(hubs):
                out_rows.append((h, r, "hub"))
            rest = cur[~cur["src"].isin(hubs)
                       & ~cur["dst"].isin(hubs)]
            rest_nodes = np.array(
                sorted(set(nodes) - hubs), dtype=object)
            if not len(rest_nodes):
                cur = rest.iloc[0:0]
                continue
            # bounded synchronous min-label
            lbl = {v: v for v in rest_nodes}
            e_pairs = list(zip(rest["src"], rest["dst"]))
            for _ in range(label_rounds):
                nxt = dict(lbl)
                for a, b in e_pairs:
                    if lbl[b] < nxt[a]:
                        nxt[a] = lbl[b]
                changed = nxt != lbl
                lbl = nxt
                if not changed:
                    break
            comp = pd.Series(lbl)
            sizes = comp.value_counts()
            gcc = sorted(sizes.index[sizes == sizes.max()])[0]
            spokes = comp[comp != gcc].index
            for v in sorted(spokes):
                out_rows.append((v, r, "spoke"))
            keep = set(comp[comp == gcc].index)
            # filter BOTH endpoints: with bounded label rounds two
            # connected nodes can carry different labels, so a
            # src-only filter would leave asymmetric cross-label edges
            cur = rest[rest["src"].isin(keep)
                       & rest["dst"].isin(keep)]
        for v in sorted(set(cur["src"]) | set(cur["dst"])) \
                if len(cur) else []:
            out_rows.append((v, rounds + 1, "core"))
        return pd.DataFrame(out_rows,
                            columns=["entity", "round", "role"]) \
            .astype({"round": "int64"}) \
            .sort_values(["round", "role", "entity"]) \
            .reset_index(drop=True)

    if mode in ("driver", "auto"):
        try:
            return rd.from_pandas(_driver(
                _edges_to_driver(edges_ds, src, dst,
                                 driver_edge_limit)))
        except GuardExceeded:
            if mode == "driver":
                raise
    # composed-Dataset fallback: same kernel over Dataset primitives
    from .relational import groupby_agg

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "src": pd.concat([b[src], b[dst]], ignore_index=True),
            "dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["src"] != d["dst"]].drop_duplicates(),
        batch_format="pandas")
    from .relational import distinct_on
    cur = distinct_on(und, ["src", "dst"]).materialize()
    out_frames = []
    for r in range(1, rounds + 1):
        if cur.count() == 0:
            break
        deg = groupby_agg(cur, ["src"],
                          [("dst", "count", "deg")]).to_pandas()
        deg = deg.sort_values(["deg", "src"],
                              ascending=[False, True],
                              kind="mergesort")
        hubs = set(deg["src"].head(k))
        out_frames.append(pd.DataFrame(
            {"entity": sorted(hubs), "round": np.int64(r),
             "role": "hub"}))
        hub_list = sorted(hubs)
        rest = cur.map_batches(
            lambda b, hl=tuple(hub_list): b[
                ~b["src"].isin(hl) & ~b["dst"].isin(hl)],
            batch_format="pandas").materialize()
        rest_nodes = set(deg["src"]) - hubs
        if not rest_nodes:
            cur = rest
            continue
        comp = label_components(
            rest, src="src", dst="dst",
            rounds=label_rounds).to_pandas()
        lbl = dict(zip(comp["entity"], comp["component"]))
        series = pd.Series({v: lbl.get(v, v) for v in rest_nodes})
        sizes = series.value_counts()
        gcc = sorted(sizes.index[sizes == sizes.max()])[0]
        spokes = sorted(series[series != gcc].index)
        out_frames.append(pd.DataFrame(
            {"entity": spokes, "round": np.int64(r),
             "role": "spoke"}))
        keep = tuple(sorted(series[series == gcc].index))
        cur = rest.map_batches(
            lambda b, kp=keep: b[b["src"].isin(kp)
                                 & b["dst"].isin(kp)],
            batch_format="pandas").materialize()
    tail = cur.to_pandas()
    core = sorted(set(tail["src"]) | set(tail["dst"])) \
        if len(tail) else []
    out_frames.append(pd.DataFrame(
        {"entity": core, "round": np.int64(rounds + 1),
         "role": "core"}))
    out = pd.concat(out_frames, ignore_index=True) \
        .astype({"round": "int64"}) \
        .sort_values(["round", "role", "entity"]) \
        .reset_index(drop=True)
    return rd.from_pandas(out)


def bowtie(edges_ds, *, src: str = "src", dst: str = "dst",
           rounds: int = 8, mode: str = "auto",
           driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Web bow-tie decomposition (Broder et al., WWW 2000, public) of
    the directed entity graph with bounded deterministic semantics:

    - pivot p = the max-(in+out)-degree node over the distinct edge
      set, ties → lexicographically smallest (on a web-shaped graph p
      sits in the giant SCC);
    - CORE = forward-reach(p) ∩ backward-reach(p), both closures run
      ``rounds`` bounded BFS rounds; since p reaches all of CORE,
      fwd(p) = fwd(CORE) — the two reaches classify everything:
    - OUT = fwd(p) \\ CORE, IN = bwd(p) \\ CORE, other = the rest
      (tendrils/tubes/disconnected — the census most curation
      decisions don't need split further).

    Returns (entity, cls) with cls ∈ 'core' | 'in' | 'out' | 'other',
    sorted by entity.  Scale shape: one degree groupby for the pivot +
    2×``rounds`` frontier exchanges (directed join + pre-combined
    distinct per round); driver mode runs the identical kernel under
    ``driver_edge_limit``."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def classify(nodes, fwd: set, bwd: set) -> pd.DataFrame:
        core = fwd & bwd
        cls = []
        for v in nodes:
            if v in core:
                cls.append("core")
            elif v in fwd:
                cls.append("out")
            elif v in bwd:
                cls.append("in")
            else:
                cls.append("other")
        return pd.DataFrame({"entity": nodes, "cls": cls}) \
            .sort_values("entity").reset_index(drop=True)

    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit)
            if edges.empty:
                return rd.from_pandas(pd.DataFrame(
                    {"entity": pd.Series([], dtype=object),
                     "cls": pd.Series([], dtype=object)}))
            a = edges[src].to_numpy(object)
            b = edges[dst].to_numpy(object)
            nodes = np.unique(np.concatenate([a, b]))
            deg = pd.concat([pd.Series(a), pd.Series(b)]) \
                .value_counts()
            top = deg[deg == deg.max()].index
            pivot = sorted(top)[0]
            fw = {}
            for s_, d_ in zip(a, b):
                fw.setdefault(s_, []).append(d_)
            bw = {}
            for s_, d_ in zip(a, b):
                bw.setdefault(d_, []).append(s_)

            def reach(adj) -> set:
                seen = {pivot}
                frontier = [pivot]
                for _ in range(rounds):
                    nxt = []
                    for v in frontier:
                        for w in adj.get(v, ()):
                            if w not in seen:
                                seen.add(w)
                                nxt.append(w)
                    if not nxt:
                        break
                    frontier = nxt
                return seen

            return rd.from_pandas(classify(nodes, reach(fw), reach(bw)))
        except GuardExceeded:
            if mode == "driver":
                raise
    from .relational import bcast_get, distinct_on, groupby_agg, hash_join

    pairs = distinct_on(
        edges_ds.map_batches(
            lambda t: t[t[src] != t[dst]].rename(
                columns={src: "e_src", dst: "e_dst"})[["e_src",
                                                       "e_dst"]],
            batch_format="pandas"),
        ["e_src", "e_dst"]).materialize()
    deg = groupby_agg(
        pairs.map_batches(
            lambda t: pd.DataFrame({"node": pd.concat(
                [t["e_src"], t["e_dst"]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], [("node", "count", "d")]).to_pandas()
    if not len(deg):
        return rd.from_pandas(pd.DataFrame(
            {"entity": pd.Series([], dtype=object),
             "cls": pd.Series([], dtype=object)}))
    deg = deg.sort_values(["d", "node"], ascending=[False, True],
                          kind="mergesort")
    pivot = deg["node"].iloc[0]

    def reach_ds(from_col: str, to_col: str) -> set:
        seen = {pivot}
        frontier = rd.from_pandas(pd.DataFrame({"node": [pivot]}))
        for _ in range(rounds):
            nxt = distinct_on(
                hash_join(pairs, frontier.materialize(),
                          on=from_col, right_on="node",
                          empty_safe=True).map_batches(
                    lambda t, tc=to_col: pd.DataFrame(
                        {"node": t[tc]}),
                    batch_format="pandas"),
                ["node"])
            ndf = nxt.to_pandas()
            # a 0-row map_batches emits ZERO blocks and loses the
            # schema — treat a column-less frame as an empty frontier
            col = ndf["node"] if "node" in ndf.columns else []
            new_nodes = [v for v in col if v not in seen]
            if not new_nodes:
                break
            seen.update(new_nodes)
            frontier = rd.from_pandas(pd.DataFrame({"node": new_nodes}))
        return seen

    fwd = reach_ds("e_src", "e_dst")
    bwd = reach_ds("e_dst", "e_src")
    nodes = deg["node"].sort_values().to_numpy(object)
    return rd.from_pandas(classify(nodes, fwd, bwd))


def coreness(edges_ds, *, src: str = "src", dst: str = "dst",
             rounds: int = 6, mode: str = "auto",
             driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Full core decomposition by the H-INDEX fixpoint (Lü, Zhou,
    Zhang & Stanley, Nature Comm. 2016, public): start every node at
    its degree; each round replace a node's value with the H-INDEX of
    its neighbors' values (the largest h with ≥ h neighbors valued
    ≥ h); the fixpoint is exactly the node's CORENESS (the largest k
    with the node inside the k-core).  Unlike the sequential
    min-degree peel, every round is a uniform vectorized pass — the
    parallel-friendly formulation — and a BOUNDED round count gives
    deterministic intermediate values any engine replays.

    Returns (entity, coreness int64, converged bool) sorted by entity;
    ``converged`` reports whether one more round would change any
    value (h-index iteration is monotone non-increasing from degree).

    Scale shape: per round ONE join (edges ⋈ values on dst) + a
    per-src h-index reduce — rank neighbors by value desc inside the
    exchange, h = max(min(rank, value)); driver mode is the identical
    kernel via lexsort + reduceat under ``driver_edge_limit``."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def h_pass_np(s_i, vals_at_dst, n):
        """h-index per src from (src_idx, neighbor value) arrays."""
        order = np.lexsort((-vals_at_dst, s_i))
        ss, vv = s_i[order], vals_at_dst[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        rank = np.arange(len(ss), dtype=np.int64)
        rank -= np.repeat(starts, np.diff(np.r_[starts, len(ss)]))
        cand = np.minimum(rank + 1, vv)
        h = np.zeros(n, dtype=np.int64)
        np.maximum.at(h, ss, cand)
        return h

    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit)
            und = _und_pairs_df(edges, src, dst)
            if und.empty:
                return rd.from_pandas(pd.DataFrame(
                    {"entity": pd.Series([], dtype=object),
                     "coreness": pd.Series([], dtype="int64"),
                     "converged": pd.Series([], dtype="bool")}))
            nodes, s_i, d_i = _index_graph(und, "src", "dst")
            n = len(nodes)
            val = np.bincount(s_i, minlength=n).astype(np.int64)
            for _ in range(rounds):
                val = h_pass_np(s_i, val[d_i], n)
            probe = h_pass_np(s_i, val[d_i], n)
            return rd.from_pandas(pd.DataFrame(
                {"entity": nodes, "coreness": val,
                 "converged": bool((probe == val).all())}))
        except GuardExceeded:
            if mode == "driver":
                raise
    from .relational import distinct_on, groupby_agg, hash_join

    und = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "__src": pd.concat([b[src], b[dst]], ignore_index=True),
            "__dst": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["__src"] != d["__dst"]],
        batch_format="pandas")
    und = distinct_on(und, ["__src", "__dst"]).materialize()
    vals = groupby_agg(und, ["__src"],
                       [("__dst", "count", "v")]).materialize()

    def h_pass_ds(vals_ds):
        joined = hash_join(und, vals_ds, on="__dst",
                           right_on="__src", empty_safe=True)
        nb_ = None

        def hix(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame(
                    {"__src": pd.Series([], dtype=object),
                     "v": pd.Series([], dtype="int64")})
            g = g.sort_values(["__src", "v"],
                              ascending=[True, False],
                              kind="mergesort")
            ss = g["__src"].to_numpy(object)
            vv = g["v"].to_numpy(np.int64)
            new = np.r_[True, ss[1:] != ss[:-1]]
            rank = np.arange(len(ss), dtype=np.int64)
            rank -= np.maximum.accumulate(np.where(new, rank, -1))
            cand = np.minimum(rank + 1, vv)
            f = pd.DataFrame({"__src": ss, "cand": cand})
            h = f.groupby("__src", sort=False)["cand"].max()
            return pd.DataFrame({"__src": h.index,
                                 "v": h.to_numpy(np.int64)})

        from .relational import default_n_buckets
        nb_ = default_n_buckets()
        import zlib

        def bk(b: pd.DataFrame) -> pd.DataFrame:
            key = b["__src"].astype(str).map(
                lambda x: zlib.crc32(x.encode()) % nb_)
            return b.assign(__bucket=key.astype("int32"))

        return joined.map_batches(bk, batch_format="pandas") \
            .groupby("__bucket").map_groups(
                lambda g: hix(g.drop(columns="__bucket")),
                batch_format="pandas").materialize()

    for _ in range(rounds):
        vals = h_pass_ds(vals)
    probe = h_pass_ds(vals)
    a = vals.to_pandas().rename(columns={"v": "coreness"})
    b_ = probe.to_pandas().rename(columns={"v": "probe"})
    m = a.merge(b_, on="__src")
    conv = bool((m["coreness"] == m["probe"]).all())
    out = pd.DataFrame({"entity": m["__src"],
                        "coreness": m["coreness"].astype("int64"),
                        "converged": conv})
    return rd.from_pandas(
        out.sort_values("entity").reset_index(drop=True))


def densest_subgraph_peel(edges_ds, *, src: str = "src",
                          dst: str = "dst", rounds: int = 6,
                          mode: str = "auto",
                          driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Parallel densest-subgraph peeling (Bahmani, Kumar & Vassilvitskii,
    VLDB 2012, public — the canonical MapReduce graph algorithm): per
    round, on the surviving undirected graph remove EVERY node whose
    degree is below the average (deg·n < 2·m, exact integer
    cross-multiplication — no rational ever floats), recording each
    round's (nodes, edges, density).  With ε=0 this is the classic
    2-approximation sweep; the density-max round's subgraph is the
    certificate.  Returns one row per observed round:
    (round, n_nodes, n_pairs, density_milli = 1000·m // n) — the round
    census a curation pipeline reads to find the densest community
    scale.  Stops early when no node falls below average (e.g. a
    regular graph).

    Scale shape: per round one degree groupby + a broadcast removal
    filter; driver mode runs the identical kernel under
    ``driver_edge_limit``."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")

    def census(rows):
        return pd.DataFrame(
            rows, columns=["round", "n_nodes", "n_pairs",
                           "density_milli"]).astype(
            {"round": "int64", "n_nodes": "int64",
             "n_pairs": "int64", "density_milli": "int64"})

    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit)
            und = _und_pairs_df(edges, src, dst)
            # unordered pair list
            a = und["src"].to_numpy(object)
            b = und["dst"].to_numpy(object)
            keep = a < b
            pairs = pd.DataFrame({"a": a[keep], "b": b[keep]})
            rows = []
            for r in range(1, rounds + 1):
                if pairs.empty:
                    break
                deg = pd.concat([pairs["a"], pairs["b"]]) \
                    .value_counts()
                n = int(len(deg))
                m = int(len(pairs))
                rows.append((r, n, m, 1000 * m // n))
                low = set(deg.index[deg.to_numpy() * n < 2 * m])
                if not low:
                    break
                pairs = pairs[~pairs["a"].isin(low)
                              & ~pairs["b"].isin(low)]
            return rd.from_pandas(census(rows))
        except GuardExceeded:
            if mode == "driver":
                raise
    from .relational import distinct_on, groupby_agg

    und = edges_ds.map_batches(
        lambda t: (lambda f: (lambda aa, bb: pd.DataFrame(
            {"a": np.where(aa < bb, aa, bb),
             "b": np.where(aa < bb, bb, aa)}))(
            f[src].to_numpy(object), f[dst].to_numpy(object)))(
            t[t[src] != t[dst]]),
        batch_format="pandas")
    pairs = distinct_on(und, ["a", "b"]).materialize()
    rows = []
    for r in range(1, rounds + 1):
        m = int(pairs.count())
        if not m:
            break
        deg = groupby_agg(
            pairs.map_batches(
                lambda t: pd.DataFrame({"node": pd.concat(
                    [t["a"], t["b"]], ignore_index=True)}),
                batch_format="pandas"),
            ["node"], [("node", "count", "d")]).to_pandas()
        n = int(len(deg))
        rows.append((r, n, m, 1000 * m // n))
        low = tuple(sorted(
            deg.loc[deg["d"].to_numpy("int64") * n < 2 * m, "node"]))
        if not low:
            break
        pairs = pairs.map_batches(
            lambda t, lo=low: t[~t["a"].isin(lo) & ~t["b"].isin(lo)],
            batch_format="pandas").materialize()
    return rd.from_pandas(census(rows))


def k4_census(edges_ds, *, src: str = "src", dst: str = "dst",
              mode: str = "auto",
              driver_edge_limit: int = _DEF_EDGE_LIMIT,
              bitset_budget: int = 200_000_000) -> pd.DataFrame:
    """4-clique (K4) census of the undirected distinct graph — the
    minimal dense-motif beyond triangles (cohesive-subgroup signal
    k-truss thresholds but never counts).  Each K4 {a<b<c<d} is
    counted exactly once by closing every ordered triangle (a,b,c)
    against the common neighborhood above c.  Exact int64 end to end.

    Returns ONE row: (n_nodes, n_edges, triangles, k4).

    Scale shape: no orientation rescue exists for K4 (every clique
    must close through all four triangles), so driver mode bounds BOTH
    the distinct edge pull (``driver_edge_limit``) and the n²/8-byte
    adjacency bitset (``bitset_budget`` bytes, GuardExceeded past
    either — the ADVICE-r4 lesson: gate on the allocation, not the
    edge count alone); mode='auto' degrades to the shuffle path —
    a 5-join chain (wedge → triangle → extend → two closure checks),
    each join hash-partitioned and ``empty_safe`` against the Ray
    2.49 empty-intermediate defect, so only census partials reach the
    driver."""
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode in ("driver", "auto"):
        try:
            e = _edges_to_driver(edges_ds, src, dst, driver_edge_limit)
            return _k4_driver(e, src, dst, bitset_budget=bitset_budget)
        except GuardExceeded:
            if mode == "driver":
                raise
    return _k4_shuffle(edges_ds, src, dst)


def _k4_driver(e: pd.DataFrame, src: str, dst: str, *,
               bitset_budget: int) -> pd.DataFrame:
    a = e[src].to_numpy(object)
    b = e[dst].to_numpy(object)
    lo = np.where(a < b, a, b)
    hi = np.where(a < b, b, a)
    ce = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
    nodes = pd.unique(np.concatenate([ce["a"].to_numpy(object),
                                      ce["b"].to_numpy(object)]))
    nodes.sort()
    idx = {v: i for i, v in enumerate(nodes.tolist())}
    n = len(nodes)
    w = (n + 63) // 64
    if n * w * 8 > bitset_budget:
        raise GuardExceeded(
            f"k4_census(mode='driver'): adjacency bitset {n}x{w} "
            "words past bitset_budget; use mode='shuffle'")
    u = ce["a"].map(idx).to_numpy(np.int64)
    v = ce["b"].map(idx).to_numpy(np.int64)
    adj = np.zeros((n, w), np.uint64)
    # bitwise_or.at, NOT fancy |= — duplicate (row, word) targets
    # drop bits under buffered fancy assignment
    np.bitwise_or.at(adj, (u, v >> 6),
                     np.uint64(1) << (v & 63).astype(np.uint64))
    np.bitwise_or.at(adj, (v, u >> 6),
                     np.uint64(1) << (u & 63).astype(np.uint64))
    pop = np.array([bin(i).count("1") for i in range(256)], np.uint16)

    def bits_above(row: np.ndarray, k: int) -> np.ndarray:
        """Indices of set bits strictly above position k."""
        m = row.copy()
        m[: k >> 6] = 0
        m[k >> 6] &= ~(np.uint64((1 << ((k & 63) + 1)) - 1))
        u8 = np.unpackbits(m.view(np.uint8), bitorder="little")
        return np.flatnonzero(u8)

    tri = 0
    k4 = 0
    for eu, ev in zip(u.tolist(), v.tolist()):
        common = adj[eu] & adj[ev]
        ws = bits_above(common, ev)
        tri += len(ws)
        for wn in ws.tolist():
            cc = common & adj[wn]
            m = cc.copy()
            m[: wn >> 6] = 0
            m[wn >> 6] &= ~(np.uint64((1 << ((wn & 63) + 1)) - 1))
            k4 += int(pop[m.view(np.uint8)].sum())
    return pd.DataFrame({
        "n_nodes": pd.Series([n], dtype="int64"),
        "n_edges": pd.Series([len(ce)], dtype="int64"),
        "triangles": pd.Series([tri], dtype="int64"),
        "k4": pd.Series([k4], dtype="int64")})


def _k4_shuffle(edges_ds, src: str, dst: str) -> pd.DataFrame:
    from .relational import distinct_on, groupby_agg, hash_join

    def canon(bt: pd.DataFrame) -> pd.DataFrame:
        d = bt[bt[src] != bt[dst]]
        aa = d[src].to_numpy(object)
        bb = d[dst].to_numpy(object)
        return pd.DataFrame({"a": np.where(aa < bb, aa, bb),
                             "b": np.where(aa < bb, bb, aa)})

    ce = distinct_on(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"]).materialize()
    n_edges = int(ce.count())
    n_nodes = int(groupby_agg(
        ce.map_batches(
            lambda bt: pd.DataFrame({
                "v": np.concatenate([bt["a"].to_numpy(object),
                                     bt["b"].to_numpy(object)])}),
            batch_format="pandas"),
        ["v"], [("v", "count", "d")]).count())

    # wedge (a, b, c): (a,b) ⋈ (a,c), b < c
    left = ce.map_batches(lambda bt: bt.rename(columns={"b": "c"}),
                          batch_format="pandas")
    wedges = hash_join(ce, left, on="a", empty_safe=True).filter(
        lambda r: r["b"] < r["c"])
    # triangle: (b, c) must be an edge
    tri = hash_join(
        wedges, ce.map_batches(
            lambda bt: bt.rename(columns={"a": "b", "b": "c"}),
            batch_format="pandas"),
        on=["b", "c"], empty_safe=True).materialize()
    n_tri = int(tri.count())
    # extend by (c, d), d > c by canonical order
    ext = hash_join(
        tri, ce.map_batches(
            lambda bt: bt.rename(columns={"a": "c", "b": "d"}),
            batch_format="pandas"),
        on="c", empty_safe=True)
    # closure checks (b, d) and (a, d)
    bd = hash_join(
        ext, ce.map_batches(
            lambda bt: bt.rename(columns={"a": "b", "b": "d"}),
            batch_format="pandas"),
        on=["b", "d"], empty_safe=True)
    ad = hash_join(
        bd, ce.map_batches(
            lambda bt: bt.rename(columns={"a": "a", "b": "d"}),
            batch_format="pandas"),
        on=["a", "d"], empty_safe=True)
    k4 = int(ad.count())
    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "triangles": pd.Series([n_tri], dtype="int64"),
        "k4": pd.Series([k4], dtype="int64")})


def onion_layers(edges_ds, *, src: str = "src", dst: str = "dst",
                 mode: str = "auto", max_rounds: int = 256,
                 driver_edge_limit: int = _DEF_EDGE_LIMIT):
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard, Sci.
    Rep. 2016, public): the LAYER ORDER of the k-core peel that
    coreness values erase.  Each round removes EVERY node whose
    remaining degree is ≤ the current threshold k, where k only ever
    rises to the minimum remaining degree (so consecutive empty peel
    stages collapse into one round — the round census is identical on
    any engine); a removed node records (layer, core=k-at-removal).
    Core values equal classic coreness; layers add the centre-to-
    periphery ordering (spokes vs deep core at equal k).

    Returns (entity, layer int64, core int64) sorted by entity.

    Scale shape: each round is one degree census over the remaining
    symmetric edge set + one threshold broadcast + one removal filter.
    Driver mode runs the identical kernel in numpy bincounts under
    ``driver_edge_limit``; shuffle mode keeps edges distributed —
    per round one pre-combined degree groupby, a scalar min-reduce,
    and a broadcast-removal semi filter (removed set is layer-sized,
    never corpus-sized); ``max_rounds`` bounds the loop
    (GuardExceeded past it — peel layers grow like the graph's
    degeneracy ordering depth, not |V|)."""
    import ray.data as rd

    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    empty = pd.DataFrame({"entity": pd.Series([], dtype=object),
                          "layer": pd.Series([], dtype="int64"),
                          "core": pd.Series([], dtype="int64")})
    if mode in ("driver", "auto"):
        try:
            edges = _edges_to_driver(edges_ds, src, dst,
                                     driver_edge_limit)
            und = _und_pairs_df(edges, src, dst)
            if und.empty:
                return rd.from_pandas(empty)
            nodes, s_i, d_i = _index_graph(und, "src", "dst")
            n = len(nodes)
            alive = np.ones(n, bool)
            ealive = np.ones(len(s_i), bool)
            layer = np.zeros(n, np.int64)
            core = np.zeros(n, np.int64)
            k = 0
            lyr = 0
            while alive.any():
                lyr += 1
                if lyr > max_rounds:
                    raise GuardExceeded(
                        f"onion_layers: > {max_rounds} peel rounds")
                deg = np.bincount(s_i[ealive], minlength=n)
                k = max(k, int(deg[alive].min()))
                s_mask = alive & (deg <= k)
                layer[s_mask] = lyr
                core[s_mask] = k
                alive &= ~s_mask
                ealive &= alive[s_i] & alive[d_i]
            return rd.from_pandas(pd.DataFrame(
                {"entity": nodes, "layer": layer, "core": core}))
        except GuardExceeded:
            if mode == "driver":
                raise
    from .relational import distinct_on, groupby_agg

    und = distinct_on(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({
                "s": pd.concat([b[src], b[dst]], ignore_index=True),
                "t": pd.concat([b[dst], b[src]], ignore_index=True),
            }).loc[lambda d: d["s"] != d["t"]],
            batch_format="pandas"),
        ["s", "t"]).materialize()
    # node state lives on the driver (V-sized, the kg_msf per-round
    # label-map regime: edges stay distributed, node maps broadcast);
    # WITHOUT it a node whose last edge is peeled away would vanish
    # from the edge census and never receive its layer
    import ray as _ray

    from .relational import bcast_get

    alive = groupby_agg(und, ["s"], [("t", "count", "d")]) \
        .to_pandas().rename(columns={"s": "node"})
    out_parts: list[pd.DataFrame] = []
    k = 0
    lyr = 0
    while len(alive):
        lyr += 1
        if lyr > max_rounds:
            raise GuardExceeded(
                f"onion_layers: > {max_rounds} peel rounds")
        k = max(k, int(alive["d"].min()))
        gone_mask = (alive["d"] <= k).to_numpy()
        gone = alive.loc[gone_mask, "node"]
        out_parts.append(pd.DataFrame(
            {"entity": gone.to_numpy(object),
             "layer": np.full(len(gone), lyr, np.int64),
             "core": np.full(len(gone), k, np.int64)}))
        alive = alive.loc[~gone_mask].copy()
        if not len(alive):
            break
        ref = _ray.put(frozenset(gone.tolist()))

        def drop(b: pd.DataFrame, _r=ref) -> pd.DataFrame:
            gs = bcast_get(_r)
            return b[~b["s"].isin(gs) & ~b["t"].isin(gs)]

        und = und.map_batches(drop, batch_format="pandas") \
            .materialize()
        deg = groupby_agg(und, ["s"], [("t", "count", "d")]) \
            .to_pandas().rename(columns={"s": "node"})
        alive = alive[["node"]].merge(deg, on="node", how="left")
        alive["d"] = alive["d"].fillna(0).astype("int64")
    res = (pd.concat(out_parts, ignore_index=True)
           if out_parts else empty)
    return rd.from_pandas(
        res.sort_values("entity", kind="mergesort")
        .reset_index(drop=True))


def powerlaw_alpha(edges_ds, *, src: str = "src", dst: str = "dst",
                  dmin: int = 2) -> pd.DataFrame:
    """Power-law exponent of the degree tail by the Clauset-Shalizi-
    Newman continuous MLE (SIAM Rev. 2009, public):

        α = 1 + n / Σ_{d ≥ dmin} ln(d / (dmin − 1/2))

    kept engine-exact with the floored-nano-ln discipline: each
    distinct degree contributes cnt·floor(1e9·ln(2d/(2·dmin−1)))
    (the half-shift folded as one EXACT integer ratio 2d/(2dmin−1)
    inside the ln, so both engines evaluate the identical double),
    summed as int64; α reports as alpha_milli = 1000 +
    (1000·n·1e9) // Σ.  A heavy tail reads ~2000-3000; vocabulary
    collapse / star graphs push it far out.

    Shape: one symmetric degree census (pre-combined groupby), then a
    distinct-degree-sized driver finish."""
    from .relational import groupby_agg

    sym = edges_ds.map_batches(
        lambda b: pd.DataFrame({
            "n": pd.concat([b[src], b[dst]], ignore_index=True),
            "m": pd.concat([b[dst], b[src]], ignore_index=True),
        }).loc[lambda d: d["n"] != d["m"]].drop_duplicates(),
        batch_format="pandas")
    from .relational import distinct_on

    und = distinct_on(sym, ["n", "m"])
    deg = groupby_agg(und, ["n"], [("m", "count", "d")])
    dc = groupby_agg(deg, ["d"], [("d", "count", "cnt")]).to_pandas()
    dc = dc[dc["d"] >= dmin].sort_values("d").reset_index(drop=True)
    d = dc["d"].to_numpy("int64")
    cnt = dc["cnt"].to_numpy("int64")
    n_tail = int(cnt.sum())
    ln_nano = np.floor(np.log((2 * d).astype("float64")
                              / (2 * dmin - 1)) * 1e9).astype("int64")
    s = int((cnt * ln_nano).sum())
    alpha_milli = 1000 + (1000 * n_tail * 1_000_000_000) // s \
        if s > 0 else 0
    return pd.DataFrame({
        "n_tail": pd.Series([n_tail], dtype="int64"),
        "sum_ln_nano": pd.Series([s], dtype="int64"),
        "alpha_milli": pd.Series([alpha_milli], dtype="int64")})
