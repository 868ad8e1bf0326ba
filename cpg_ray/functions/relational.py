"""Relational operator library over Ray Data Datasets: broadcast /
partitioned joins, pre-aggregated groupbys, top-k, distinct, semi/anti
joins (SURVEY.md §2.4-§2.7 mapped Ray-Data-first).

Scale notes (these choices are the point, not incidental):
- small side broadcast: ``ray.put`` once on the driver, fetched at most
  once per worker *process* via a module cache keyed by object-ref hex —
  never re-shipped per batch (reference analog: per-pass lookup maps,
  CallResolver.java:106-130);
- big×big joins go through ``Dataset.join`` (hash-partitioned shuffle);
- aggregations pre-combine inside ``map_batches`` so the shuffle moves
  one row per (key, batch), not one per input row (A2/A3 analogs);
- top-k never globally sorts the full dataset: local per-batch top-k
  (the combiner) then a tiny global sort+limit (O2 analog).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

class GuardExceeded(RuntimeError):
    """A driver-path size guard tripped (key/row limit).  The mode="auto"
    operators catch EXACTLY this to degrade to their shuffle path — a
    bare ``except RuntimeError`` would also swallow genuine task
    failures (Ray's RayTaskError dual-inherits the original exception
    class) and silently re-execute the whole DAG."""


def default_n_buckets(floor: int = 16) -> int:
    """Reducer width for bucketed exchanges (as-of/interval shuffle
    paths, context-link groupby): 2× the cluster's CPUs, floored at the
    single-node default — a fixed constant would cap the shuffle at
    ``floor`` reducers no matter how many nodes the cluster has
    (reference analog: the per-file parallelism knob,
    TranslationManager.kt:247-299)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            return max(floor, cpus * 2)
    except Exception:
        pass
    return floor


# ---- broadcast small-side cache (per worker process) ----------------------

_BCAST_CACHE: dict[str, object] = {}


def bcast_get(ref):
    """Fetch a broadcast object at most once per worker process."""
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    obj = _BCAST_CACHE.get(key)
    if obj is None:
        import ray

        obj = _BCAST_CACHE[key] = ray.get(ref)
    return obj


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Column-pruned parquet read of one testdata table."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---- joins ----------------------------------------------------------------


def broadcast_join(
    ds,
    small_df: pd.DataFrame,
    *,
    left_on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
):
    """Join a big Dataset against a small pandas side without a shuffle:
    the small side is broadcast and merged per batch (J1-J9 analog —
    probe a broadcast dictionary instead of exchanging the big side)."""
    import ray

    ref = ray.put(small_df)
    right_on = right_on or left_on

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = bcast_get(ref)
        return batch.merge(
            small, how=how, left_on=left_on, right_on=right_on, sort=False
        )

    return ds.map_batches(merge, batch_format="pandas")


def _block_schema(ds):
    """Arrow schema recovered from a MATERIALIZED dataset's first block
    (Ray's Dataset.schema() reports an empty schema for all-empty join
    outputs even though the blocks carry real columns)."""
    import pyarrow as pa

    import ray

    for ref in ds.get_internal_block_refs():
        blk = ray.get(ref)
        if isinstance(blk, pa.Table):
            if blk.num_columns:  # skip the schema-less empties
                return blk.schema
        elif hasattr(blk, "columns") and len(blk.columns):  # pandas
            return pa.Schema.from_pandas(blk, preserve_index=False)
    return None


def _empty_table(schema):
    import pyarrow as pa

    return pa.table(
        {f.name: pa.array([], type=f.type) for f in schema})


def _compact_nonempty(ds):
    """Strip zero-row blocks from a MATERIALIZED dataset.  Ray 2.49's
    hash join emits one output block per partition and the empty ones
    are SCHEMALESS; fed into a subsequent join they crash the
    aggregator with ArrowInvalid ("No match or multiple matches for
    key field ..."), which only surfaces on SPARSE data where some
    partitions are empty — dense inputs mask it.  Rebuilding from the
    non-empty block refs restores a uniformly-schema'd dataset."""
    import ray.data as rd

    refs, empties = [], 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
            else:
                empties += 1
    if empties == 0 or not refs:
        return ds
    import pyarrow as pa

    import ray

    if isinstance(ray.get(refs[0]), pa.Table):
        return rd.from_arrow_refs(refs)
    return rd.from_pandas_refs(refs)


def hash_join(left, right, *, on, right_on=None, how: str = "inner",
              num_partitions: int | None = None,
              empty_safe: bool = False):
    """Big×big hash-partitioned shuffle join (Ray-native Dataset.join).

    num_partitions=None tracks the cluster's CPU count — Ray's join
    spawns that many aggregator actors, so a count ABOVE the cluster's
    CPUs starves them into a hang while a fixed constant caps reducer
    parallelism on large clusters.

    empty_safe=True guards a Ray 2.49 defect: Dataset.join raises
    ArrowInvalid ("No match ... for key field reference") whenever one
    side is a COMPLETELY empty dataset — including a schema'd empty
    from_pandas and, critically, the output of an upstream join that
    matched nothing, so chained joins crash on legitimately-empty
    intermediates.  The guard materializes both sides (the join holds
    them whole in its aggregators anyway), short-circuits the empty
    case with the correct join semantics (inner → empty with the
    joined schema; outer → the surviving side null-extended), and
    otherwise proceeds with the already-materialized inputs.  Enabled
    on the graph-query paths where empty matches are an expected
    outcome; default off to keep hot relational paths streaming."""
    on_l = list(on) if isinstance(on, (list, tuple)) else [on]
    on_r = (list(right_on) if isinstance(right_on, (list, tuple))
            else [right_on]) if right_on is not None else on_l
    if num_partitions is None:
        try:
            import ray

            num_partitions = max(
                2, int(ray.cluster_resources().get("CPU", 16))
            )
        except Exception:
            num_partitions = 16

    if empty_safe:
        import pyarrow as pa

        import ray.data as rd

        left = _compact_nonempty(left.materialize())
        right = _compact_nonempty(right.materialize())
        ln, rn = left.count(), right.count()
        if ln == 0 or rn == 0:
            ls, rs = _block_schema(left), _block_schema(right)
            if ls is not None and rs is not None:
                lnames = set(ls.names)
                extra_r = [f for f in rs
                           if f.name not in on_r and f.name not in lnames]
                rnames = set(rs.names)
                extra_l = [f for f in ls if f.name not in rnames]
                joined = pa.schema(list(ls) + extra_r)
                if (how == "inner" or (ln == 0 and rn == 0)
                        or (how == "left_outer" and ln == 0)
                        or (how == "right_outer" and rn == 0)):
                    # the surviving side is the empty one: no rows
                    return rd.from_arrow(_empty_table(joined))
                if how in ("left_outer", "full_outer") and rn == 0:
                    def null_right(t, extra=extra_r):
                        cols = {c: t[c] for c in t.column_names}
                        for f in extra:
                            cols[f.name] = pa.nulls(len(t), type=f.type)
                        return pa.table(cols)

                    return left.map_batches(
                        null_right, batch_format="pyarrow")
                if how in ("right_outer", "full_outer") and ln == 0:
                    # right rows with left's non-key columns null; key
                    # columns taken from the right-side keys
                    def null_left(t):
                        cols = {}
                        for f in ls:
                            if f.name in on_l:
                                rk = on_r[on_l.index(f.name)]
                                cols[f.name] = t[rk].cast(f.type)
                            else:
                                cols[f.name] = pa.nulls(
                                    len(t), type=f.type)
                        for f in extra_r:
                            cols[f.name] = t[f.name]
                        return pa.table(cols)

                    return right.map_batches(
                        null_left, batch_format="pyarrow")
            # schema unrecoverable (no blocks at all): empty passthrough
            return rd.from_arrow(
                _empty_table(pa.schema([])))

    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on_l),
        right_on=None if right_on is None else tuple(on_r),
    )


def skew_join(left, right, *, on: str, right_on: str | None = None,
              how: str = "inner", hot_k: int = 64,
              hot_min_share: float = 0.005,
              right_hot_row_limit: int = 5_000_000,
              num_partitions: int | None = None):
    """Skew-aware big×big join: hot keys broadcast, cold keys shuffled.

    A hash-partitioned join routes every row of a key to ONE reducer —
    under Zipf key skew the hottest reducer is the job's wall clock
    (and, at 100 TB, its OOM).  This hybrid:

    1. finds candidate hot LEFT keys with one Misra-Gries combiner pass
       (:func:`~cpg_ray.functions.sketches.heavy_hitters` — a
       deterministic superset of every key with share > 1/(hot_k+1);
       only ≤hot_k (value, count) pairs per batch move, no shuffle),
       keeping keys whose estimated share ≥ ``hot_min_share``;
    2. splits both sides on membership in that broadcast key set
       (frozenset probe per batch, no shuffle);
    3. joins the hot slice by BROADCAST: the hot right rows are
       collected under a streaming row-limit guard
       (``right_hot_row_limit``, GuardExceeded past it — the
       dimension-side assumption, explicit) and probed per left batch;
    4. joins the cold remainder with the ordinary hash-partitioned
       shuffle join — no reducer sees a hot key anymore;
    5. unions the two result streams.

    The hot-key set is a ROUTING heuristic: any partition of keys
    yields the identical join result (tests pin skew_join ≡ hash_join
    on random + Zipf inputs), only the balance depends on it.
    ``how``: 'inner' or 'left_outer' — every left row lands in exactly
    one slice, so the union preserves outer semantics.  Returns
    ``(dataset, n_hot_keys)`` so callers can report the routing."""
    from .sketches import heavy_hitters

    if how not in ("inner", "left_outer"):
        raise ValueError("skew_join supports how='inner'|'left_outer'")
    r_on = right_on or on

    hh = heavy_hitters(left, on, k=hot_k, min_share=hot_min_share)
    hot_keys = frozenset(hh["value"])
    if not hot_keys:
        return (hash_join(left, right, on=on, right_on=right_on, how=how,
                          num_partitions=num_partitions), 0)

    left = left.materialize()      # consumed by both slices
    right = right.materialize()
    left_hot = semi_anti_filter(left, on, hot_keys)
    left_cold = semi_anti_filter(left, on, hot_keys, anti=True)
    right_hot_df = _collect_limited(
        semi_anti_filter(right, r_on, hot_keys),
        right_hot_row_limit, "skew_join")
    right_cold = semi_anti_filter(right, r_on, hot_keys, anti=True)

    merge_how = "inner" if how == "inner" else "left"
    hot = broadcast_join(left_hot, right_hot_df, left_on=on,
                         right_on=r_on, how=merge_how)
    if r_on != on:
        # align with Dataset.join output: right key column dropped
        hot = hot.map_batches(lambda b: b.drop(columns=[r_on]),
                              batch_format="pandas")
    # empty_safe: when EVERY key is hot (tiny inputs, extreme skew) the
    # cold slices are legitimately empty and Ray 2.49's join would crash
    cold = hash_join(left_cold, right_cold, on=on, right_on=right_on,
                     how=how, num_partitions=num_partitions,
                     empty_safe=True)
    # align column ORDER across the two streams (union needs one schema)
    lcols = [c for c in left.columns()]
    rextra = [c for c in right.columns() if c != r_on and c not in lcols]
    want = lcols + rextra
    hot = hot.map_batches(lambda b: b[want], batch_format="pandas")
    cold = cold.map_batches(lambda b: b[want], batch_format="pandas")
    return hot.union(cold), len(hot_keys)


def cross_join(ds, small: pd.DataFrame, *, driver_row_limit: int = 100_000):
    """CROSS JOIN against a SMALL side: the small frame is broadcast
    once (``ray.put``), each batch emits the cartesian product via one
    numpy repeat/tile — no shuffle, the big side streams.  Guarded: a
    cartesian product against a big right side is a mistake at any
    scale, so ``len(small)`` above the limit raises GuardExceeded
    rather than silently exploding the output."""
    import ray

    if len(small) > driver_row_limit:
        raise GuardExceeded(
            f"cross_join small side has {len(small)} rows "
            f"(limit {driver_row_limit}) — a cartesian product this "
            "size is almost certainly not what you want")
    overlap = set(small.columns)
    ref = ray.put(small.reset_index(drop=True))

    def cart(b: pd.DataFrame) -> pd.DataFrame:
        s = bcast_get(ref)
        if not len(b) or not len(s):
            cols = {c: b[c].iloc[:0] for c in b.columns
                    if c not in overlap}
            cols.update({c: s[c].iloc[:0] for c in s.columns})
            return pd.DataFrame(cols)
        left = b.loc[b.index.repeat(len(s))].reset_index(drop=True)
        right = pd.concat([s] * len(b), ignore_index=True)
        left = left.drop(columns=[c for c in b.columns if c in overlap])
        return pd.concat([left, right], axis=1)

    return ds.map_batches(cart, batch_format="pandas")


def semi_anti_filter(ds, key_col: str, keys, *, anti: bool = False):
    """Semi/anti join via broadcast key set (D4/J11 analog: existence
    check without moving the big side)."""
    import ray

    ref = ray.put(frozenset(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = bcast_get(ref)
        mask = batch[key_col].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(f, batch_format="pandas")


class BloomFilter:
    """Vectorized Bloom filter for semi joins whose key set is too big
    to broadcast exactly (guide: 'broadcast the key set or a Bloom
    filter of it').  Double hashing from two independently-keyed
    ``pd.util.hash_array`` passes (C-speed SipHash — the Bloom path
    exists precisely for huge key sets, so a per-value Python hash loop
    would defeat its purpose), k derived from the target
    false-positive rate; numpy bit array broadcasts as one zero-copy
    buffer."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, int(round(self.m / max(1, capacity) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
        """splitmix64 finalizer — independent avalanche per seed.
        (``pd.util.hash_array``'s hash_key only applies to OBJECT
        dtypes; numeric arrays would hash identically under different
        keys, degenerating the double hashing.)"""
        x = x ^ np.uint64(seed)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _hashes(self, values) -> tuple[np.ndarray, np.ndarray]:
        arr = np.asarray(values)
        if not np.issubdtype(arr.dtype, np.number) and arr.dtype != object:
            # non-numeric, non-object (e.g. unicode) values hash by
            # their string form as object dtype so a key list built
            # from Python strings and a probe column of object strings
            # hash identically; object arrays hash directly (same
            # result, no copy)
            arr = arr.astype(str).astype(object)
        base = pd.util.hash_array(arr, categorize=False).astype(np.uint64)
        h1 = self._mix64(base, 0x9E3779B97F4A7C15)
        h2 = self._mix64(base, 0xD1B54A32D192ED03) | np.uint64(1)
        return h1, h2

    def add_batch(self, values) -> "BloomFilter":
        h1, h2 = self._hashes(values)
        for j in range(self.k):
            idx = (h1 + np.uint64(j) * h2) % np.uint64(self.m)
            np.bitwise_or.at(
                self.bits, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return self

    def contains_batch(self, values) -> np.ndarray:
        h1, h2 = self._hashes(values)
        out = np.ones(len(h1), dtype=bool)
        for j in range(self.k):
            idx = (h1 + np.uint64(j) * h2) % np.uint64(self.m)
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word & (np.uint64(1) << (idx & np.uint64(63)))) != 0
        return out


def bloom_semi_filter(ds, key_col: str, keys, *, fp_rate: float = 0.01,
                      anti: bool = False):
    """Semi join via broadcast Bloom filter: exact for the semi side up
    to fp_rate false KEEPS (never false drops); the anti side can
    false-DROP at fp_rate — callers needing exact anti must re-verify
    survivors against the true set."""
    import ray

    keys = list(keys)
    bf = BloomFilter(len(keys), fp_rate).add_batch(keys)
    ref = ray.put(bf)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        b = bcast_get(ref)
        mask = b.contains_batch(batch[key_col].values)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(f, batch_format="pandas")


def asof_join(left, right, *, by: str, on: str, right_value_cols: list[str],
              n_buckets: int | None = None, direction: str = "backward",
              mode: str = "auto", broadcast_limit: int = 5_000_000):
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` key (guide pattern:
    sort within buckets + ``pd.merge_asof``).

    mode="broadcast": the right side is sorted once, broadcast, and
    merge_asof runs per LEFT batch — NO shuffle at all (merge_asof is
    self-contained for any subset of left rows).  The all-to-all
    bucketed exchange only pays off when the right side is too big to
    broadcast; below that it IS the cost (measured at sf0.1: the
    16-bucket groupby's sort shuffle was 6.3 s of a 7.8 s join).

    mode="shuffle": bucketed union + per-bucket merge — the scale path.
    Partitioning assumption: all rows of one ``by`` key land in the same
    bucket (bucket = hash(by) % n_buckets), so the merge is complete
    within each group; n_buckets bounds group size, not correctness.

    mode="auto" (default): broadcast while the right side is within
    ``broadcast_limit`` rows, else shuffle.  Both paths are
    oracle-verified to agree.  Callers that already know the right
    side's size (e.g. from parquet metadata) should pass the mode
    explicitly — auto pays one extra materialize barrier to count.

    n_buckets=None derives the shuffle width from the cluster's CPUs
    (:func:`default_n_buckets`) so the exchange scales with the
    cluster instead of capping at a constant."""
    if n_buckets is None:
        n_buckets = default_n_buckets()
    if mode == "auto":
        right = right.materialize()
        mode = ("broadcast" if right.count() <= broadcast_limit
                else "shuffle")
    if mode == "broadcast":
        import ray

        rvals = [f"{c}_asof" for c in right_value_cols]

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            out = b[[by, on]].copy()
            for c, rc in zip(right_value_cols, rvals):
                out[rc] = b[c].values
            return out

        rbatches = list(right.map_batches(prep, batch_format="pandas")
                        .iter_batches(batch_format="pandas", batch_size=None))
        # mode="auto" selects broadcast precisely when the right side is
        # small — INCLUDING empty, where pd.concat([]) would raise
        rdf = (
            pd.concat(rbatches, ignore_index=True)
            .sort_values(on, kind="mergesort")
            .reset_index(drop=True)
            if rbatches
            else pd.DataFrame(columns=[by, on] + rvals)
        )
        ref = ray.put(rdf)

        def merge(b: pd.DataFrame) -> pd.DataFrame:
            r = bcast_get(ref)
            b = b.sort_values(on, kind="mergesort")
            if r.empty:  # trivial no-match: every asof value is NA
                return b.assign(**{c: pd.NA for c in rvals})
            return pd.merge_asof(b, r, on=on, by=by, direction=direction)

        return left.map_batches(merge, batch_format="pandas")

    left_cols = left.schema().names
    rvals = [f"{c}_asof" for c in right_value_cols]
    # union needs one schema: pad each side with the other's columns
    common = list(dict.fromkeys(left_cols + rvals))

    def bucketize_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        for c in rvals:
            b[c] = pd.NA
        b["__bucket"] = (b[by].astype("int64") % n_buckets).astype("int32")
        b["__side"] = 0
        return b[common + ["__bucket", "__side"]]

    def bucketize_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by, on]].copy()
        for c, rc in zip(right_value_cols, rvals):
            out[rc] = b[c].values
        for c in left_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__bucket"] = (out[by].astype("int64") % n_buckets).astype("int32")
        out["__side"] = 1
        return out[common + ["__bucket", "__side"]]

    lt = left.map_batches(bucketize_left, batch_format="pandas")
    rt = right.map_batches(bucketize_right, batch_format="pandas")
    both = lt.union(rt)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g.__side == 0][left_cols]
        rhs = g[g.__side == 1][[by, on] + rvals]
        if lhs.empty:
            return lhs.assign(**{c: pd.Series(dtype="object") for c in rvals})
        lhs = lhs.sort_values(on, kind="mergesort")
        rhs = rhs.sort_values(on, kind="mergesort")
        return pd.merge_asof(lhs, rhs, on=on, by=by, direction=direction)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def interval_join(left, right, *, by: str, on: str,
                  lower: "pd.Timedelta", upper: "pd.Timedelta",
                  right_value_cols: list[str], n_buckets: int | None = None,
                  how: str = "inner", mode: str = "auto",
                  broadcast_limit: int = 5_000_000):
    """Stream-stream interval join: pair each left row with the right
    rows of the same ``by`` key whose ``on`` lies in
    [left.on + lower, left.on + upper).  Same bucketed shape as
    :func:`asof_join`; within a bucket the pairing is a pandas
    key-equi-merge followed by a vectorized window filter (quadratic
    only within one key's rows, bounded by per-key event volume).

    Like :func:`asof_join`, mode="auto" (default) broadcasts a
    small-enough right side and pairs per LEFT batch with no shuffle
    (the pairing is self-contained for any left subset); past
    ``broadcast_limit`` right rows it takes the bucketed exchange.
    n_buckets=None derives the exchange width from the cluster's CPUs
    (:func:`default_n_buckets`)."""
    if n_buckets is None:
        n_buckets = default_n_buckets()
    left_cols = left.schema().names
    rvals = [f"{c}_r" for c in right_value_cols]
    ron = f"{on}_r"
    common = list(dict.fromkeys(left_cols + rvals + [ron]))

    def pair(lhs: pd.DataFrame, rhs: pd.DataFrame) -> pd.DataFrame:
        """Window-filtered equi-merge of one left subset against all
        right rows of its keys (shared by both modes)."""
        m = lhs.merge(rhs, on=by, how="left")
        ts = pd.to_datetime(m[ron])
        in_win = (ts >= m[on] + lower) & (ts < m[on] + upper)
        if how == "inner":
            return m[in_win.fillna(False)]
        # left: keep non-matching left rows once with NA right values
        m.loc[~in_win.fillna(False), rvals + [ron]] = pd.NA
        matched = m[in_win.fillna(False)]
        keys_matched = set(map(tuple, matched[left_cols].values.tolist()))
        unmatched = m[~in_win.fillna(False)].drop_duplicates(left_cols)
        unmatched = unmatched[
            [tuple(r) not in keys_matched
             for r in unmatched[left_cols].values.tolist()]
        ]
        return pd.concat([matched, unmatched], ignore_index=True)

    if mode == "auto":
        right = right.materialize()
        mode = ("broadcast" if right.count() <= broadcast_limit
                else "shuffle")
    if mode == "broadcast":
        import ray

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            out = b[[by]].copy()
            out[ron] = b[on].values
            for c, rc in zip(right_value_cols, rvals):
                out[rc] = b[c].values
            return out

        rbatches = list(right.map_batches(prep, batch_format="pandas")
                        .iter_batches(batch_format="pandas", batch_size=None))
        # auto picks broadcast when the right side is small, incl. EMPTY
        # — pd.concat([]) raises, so fall back to an empty frame (pair()
        # handles an empty rhs as an all-NA left merge)
        rdf = (
            pd.concat(rbatches, ignore_index=True)
            if rbatches
            else pd.DataFrame(columns=[by, ron] + rvals)
        )
        ref = ray.put(rdf)

        def merge(b: pd.DataFrame) -> pd.DataFrame:
            return pair(b, bcast_get(ref))

        return left.map_batches(merge, batch_format="pandas")

    def bucketize_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        for c in rvals + [ron]:
            b[c] = pd.NA
        b["__bucket"] = (b[by].astype("int64") % n_buckets).astype("int32")
        b["__side"] = 0
        return b[common + ["__bucket", "__side"]]

    def bucketize_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by]].copy()
        out[ron] = b[on].values
        for c, rc in zip(right_value_cols, rvals):
            out[rc] = b[c].values
        for c in left_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__bucket"] = (out[by].astype("int64") % n_buckets).astype("int32")
        out["__side"] = 1
        return out[common + ["__bucket", "__side"]]

    lt = left.map_batches(bucketize_left, batch_format="pandas")
    rt = right.map_batches(bucketize_right, batch_format="pandas")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g.__side == 0][left_cols]
        rhs = g[g.__side == 1][[by, ron] + rvals]
        if lhs.empty:
            return lhs.assign(**{c: pd.Series(dtype="object")
                                 for c in rvals + [ron]})
        return pair(lhs, rhs)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


# ---- aggregation with pre-combine -----------------------------------------

_PARTIALS = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    # mean decomposes into sum+count partials, finalized after the shuffle
}


def groupby_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
                *, mode: str = "auto", driver_key_limit: int = 5_000_000):
    """Pre-aggregated groupby.

    specs: (column, fn, alias) with fn in sum/count/min/max/mean.
    Phase 1 (map_batches combiner): pandas groupby within each batch →
    ONE ROW PER (key, batch) — this is where the data shrinks, fully
    distributed.  Phase 2 merges the partials:

    - mode="driver": stream partial batches to the driver and merge
      incrementally in pandas.  Memory is O(distinct keys), NOT
      O(rows) — the combiner did the heavy lifting.  This beats Ray's
      sort-based Aggregate by ~10× on small/medium key counts (measured:
      100k rows / 1.5k keys → 15.5 s shuffle vs <1 s driver merge)
      because the all-to-all barrier never pays off at that size.
      ``driver_key_limit`` guards the assumption; crossing it raises.
    - mode="shuffle": Ray groupby over the partials — the path for
      billion-key aggregates where O(keys) driver memory won't hold.
    - mode="auto" (default): optimistic guarded driver merge that
      DEGRADES to the shuffle path when the key guard trips, instead of
      aborting a long pipeline mid-run.  The happy path is byte-for-byte
      the driver path (streaming, no extra barrier); the fallback
      re-executes the partials DAG once — the documented cost of a
      mispredicted key count, paid only past ``driver_key_limit`` keys.

    Returns a Dataset with columns keys + aliases.
    """
    partial_cols: list[tuple[str, str, str]] = []  # (partial_name, src, fn)
    for col, fn, alias in specs:
        if fn == "mean":
            partial_cols.append((f"__{alias}__s", col, "sum"))
            partial_cols.append((f"__{alias}__c", col, "count"))
        else:
            partial_cols.append((f"__{alias}", col, fn))

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        out = {}
        for pname, src, fn in partial_cols:
            out[pname] = g[src].agg(_PARTIALS[fn][0])
        return pd.DataFrame(out).reset_index()

    # whole-block combine: with HIGH-cardinality keys (per-order
    # aggregates: ~4 rows/key scattered across the file) the default
    # 1024-row batches barely combine AND pay ~600 remote pandas
    # conversions; one combine per block is the same result with 10×
    # fewer invocations (measured: 22.5 s → 6.7 s on a 600k-row /
    # 147k-key aggregate at sf0.1)
    partials = ds.map_batches(combine, batch_format="pandas",
                              batch_size=None)

    merge_map = {pname: _PARTIALS[fn][1] for pname, _src, fn in partial_cols}

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys].copy()
        for col, fn, alias in specs:
            if fn == "mean":
                out[alias] = batch[f"__{alias}__s"] / batch[f"__{alias}__c"]
            else:
                out[alias] = batch[f"__{alias}"]
        return out

    def shuffle_merge(parts):
        from ray.data.aggregate import Max, Min, Sum

        cls = {"sum": Sum, "min": Min, "max": Max}
        aggs = [cls[merge_map[p]](p, alias_name=p) for p, _s, _f in partial_cols]
        merged = parts.groupby(keys).aggregate(*aggs)
        return merged.map_batches(finalize, batch_format="pandas")

    def driver_merge(parts):
        # incremental concat+groupby keeps memory at O(keys)
        import ray.data as rd

        acc: pd.DataFrame | None = None
        buf: list[pd.DataFrame] = []
        buffered = 0

        def flush(acc, buf):
            frames = ([acc] if acc is not None else []) + buf
            if not frames:
                return pd.DataFrame(columns=keys + list(merge_map))
            cat = pd.concat(frames, ignore_index=True)
            g = cat.groupby(keys, sort=False, dropna=False)
            merged = pd.DataFrame(
                {p: g[p].agg(merge_map[p]) for p in merge_map}
            ).reset_index()
            if len(merged) > driver_key_limit:
                raise GuardExceeded(
                    f"groupby_agg(mode='driver'): {len(merged)} keys exceeds "
                    f"driver_key_limit={driver_key_limit}; use mode='shuffle'"
                )
            return merged

        # batch_size=None: pull whole blocks — re-slicing partials into
        # 1024-row batches costs one pandas conversion per slice on the
        # driver, the dominant term when partials are key-wide
        for b in parts.iter_batches(batch_format="pandas",
                                    batch_size=None):
            buf.append(b)
            buffered += len(b)
            if buffered >= 1_000_000:
                acc = flush(acc, buf)
                buf, buffered = [], 0
        acc = flush(acc, buf) if (buf or acc is None) else acc
        return rd.from_pandas(finalize(acc))

    if mode == "shuffle":
        return shuffle_merge(partials)
    if mode == "driver":
        return driver_merge(partials)
    try:  # auto
        return driver_merge(partials)
    except GuardExceeded:
        return shuffle_merge(partials)


def _collect_limited(ds, row_limit: int, op_name: str) -> pd.DataFrame:
    """Stream a (pre-combined) Dataset to one pandas frame, raising as
    soon as the cumulative row count crosses ``row_limit`` — BEFORE the
    driver has swallowed the whole result (a post-hoc check after
    to_pandas() can only fire if the driver already survived the exact
    allocation the limit exists to prevent)."""
    frames: list[pd.DataFrame] = []
    total = 0
    for b in ds.iter_batches(batch_format="pandas",
                             batch_size=None):
        total += len(b)
        if total > row_limit:
            raise GuardExceeded(
                f"{op_name}(mode='driver'): candidate rows exceed "
                f"driver_row_limit={row_limit}; use mode='shuffle'"
            )
        frames.append(b)
    if not frames:
        cols = ds.columns() or []  # schema is cached after iteration
        return pd.DataFrame(columns=cols)
    return pd.concat(frames, ignore_index=True)


# ---- order / limit --------------------------------------------------------


def topk(ds, sort_cols: list[str], k: int, *, descending=True):
    """Global top-k without a global sort: per-batch local top-k combiner,
    then sort+limit over the (tiny) survivors."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    asc = [not d for d in descending]

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(sort_cols, ascending=asc, kind="mergesort").head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .sort(sort_cols, descending=descending)
        .limit(k)
    )


def grouped_topk(ds, group_keys: list[str], sort_col: str, k: int,
                 *, descending: bool = True, tie_break: str | None = None,
                 mode: str = "auto", driver_row_limit: int = 20_000_000):
    """Top-k per group (O3 analog with explicit deterministic tie-break).

    Grouped top-k is algebraic: per-batch local top-k-per-group is a
    valid combiner, so the driver path avoids groupby().map_groups —
    Ray pays a sort shuffle plus one Python round-trip PER GROUP there
    (measured 3.5× slower even on a 2k-row table).  mode="shuffle"
    keeps the map_groups finish (over the combined candidates — the
    combiner is idempotent) for group counts too large for a driver
    finish (result size is k × groups); mode="auto" (default) runs the
    guarded driver finish and DEGRADES to the shuffle finish when the
    row guard trips instead of aborting."""
    cols = [sort_col] + ([tie_break] if tie_break else [])
    asc = [not descending] + ([True] if tie_break else [])

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(cols, ascending=asc, kind="mergesort")
            .groupby(group_keys, sort=False)
            .head(k)
        )

    cand_ds = ds.map_batches(local, batch_format="pandas")

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    def shuffle_finish(c):
        return c.groupby(group_keys).map_groups(head, batch_format="pandas")

    if mode == "shuffle":
        return shuffle_finish(cand_ds)

    def driver_finish(c):
        import ray.data as rd

        cand = _collect_limited(c, driver_row_limit, "grouped_topk")
        if cand.empty:
            return rd.from_pandas(cand)
        fin = (
            cand.sort_values(cols, ascending=asc, kind="mergesort")
            .groupby(group_keys, sort=False)
            .head(k)
            .reset_index(drop=True)
        )
        return rd.from_pandas(fin)

    if mode == "driver":
        return driver_finish(cand_ds)
    try:  # auto: guarded driver finish, shuffle fallback on breach
        return driver_finish(cand_ds)
    except GuardExceeded:
        return shuffle_finish(cand_ds)


def partitioned_rank(ds, part_cols: list[str], order_col: str, *,
                     descending: bool = False, out_col: str = "rnk",
                     dense: bool = False,
                     driver_key_limit: int = 5_000_000):
    """SQL ``RANK() OVER (PARTITION BY part ORDER BY order_col)`` (or
    DENSE_RANK with ``dense=True``) as a two-pass distributed plan that
    never co-locates a partition's rows:

    1. pre-combined (part, order-value) COUNTS — the exchange moves one
       row per distinct (partition, value), not per input row;
    2. rank of each distinct value = 1 + running count (RANK) or
       running distinct count (DENSE_RANK) of strictly-earlier values,
       computed on the driver over that small table (guarded) and
       broadcast back over the input with a per-batch merge.

    This is the scale shape for ranking inside LOW-DISTINCT-VALUE
    orderings (dates, grades, sizes); when every value is distinct the
    counts table is the data and a partition-local sort (bucket
    groupby + map_groups) is the honest plan instead."""
    import ray.data as rd  # noqa: F401

    counts = groupby_agg(
        ds, list(part_cols) + [order_col],
        [(order_col, "count", "__n")], driver_key_limit=driver_key_limit)
    small = _collect_limited(counts, driver_key_limit, "partitioned_rank")
    small = small.sort_values(
        list(part_cols) + [order_col],
        ascending=[True] * len(part_cols) + [not descending],
        kind="mergesort").reset_index(drop=True)
    grp = small.groupby(list(part_cols), sort=False)
    if dense:
        small[out_col] = grp.cumcount().astype("int64") + 1
    else:
        small[out_col] = (grp["__n"].cumsum() - small["__n"] + 1) \
            .astype("int64")
    return broadcast_join(
        ds, small.drop(columns="__n"),
        left_on=list(part_cols) + [order_col])


def partitioned_cume(ds, part_cols: list[str], order_col: str, *,
                     descending: bool = False,
                     out_cume: str = "cume_dist",
                     out_prank: str = "percent_rank",
                     driver_key_limit: int = 5_000_000):
    """``CUME_DIST()`` and ``PERCENT_RANK()`` OVER (PARTITION BY part
    ORDER BY order_col) with the same two-pass shape as
    `partitioned_rank` — both are VALUE-level window functions (every
    row tied on the order value shares the result), so the exchange
    moves one pre-combined count row per distinct (partition, value):

    - cume_dist    = rows_with_value≤current / partition_total
    - percent_rank = (rank − 1) / (partition_total − 1)  (0.0 when the
      partition has a single row — the SQL-standard edge)

    Both are a single int→double division of exact integer counts, so
    the doubles are bit-identical to any engine computing the same
    definition (the q_orders_share exact-integer trick)."""
    import numpy as np

    counts = groupby_agg(
        ds, list(part_cols) + [order_col],
        [(order_col, "count", "__n")], driver_key_limit=driver_key_limit)
    small = _collect_limited(counts, driver_key_limit, "partitioned_cume")
    small = small.sort_values(
        list(part_cols) + [order_col],
        ascending=[True] * len(part_cols) + [not descending],
        kind="mergesort").reset_index(drop=True)
    grp = small.groupby(list(part_cols), sort=False)
    n = small["__n"].to_numpy("int64")
    tot = grp["__n"].transform("sum").to_numpy("int64")
    cum = grp["__n"].cumsum().to_numpy("int64")
    rank = cum - n + 1
    small[out_cume] = cum.astype("float64") / tot.astype("float64")
    small[out_prank] = np.where(
        tot > 1, (rank - 1).astype("float64")
        / np.maximum(tot - 1, 1).astype("float64"), 0.0)
    return broadcast_join(
        ds, small.drop(columns="__n"),
        left_on=list(part_cols) + [order_col])


def partitioned_ntile(ds, part_cols: list[str], order_cols: list[str],
                      k: int, *, out_rownum: str = "row_number",
                      out_tile: str = "tile"):
    """``ROW_NUMBER()`` and ``NTILE(k)`` OVER (PARTITION BY part ORDER
    BY order_cols).  Unlike rank/cume_dist these are ROW-level — they
    need a total order within each partition — so the honest
    distributed shape is partition co-location (hash-shuffle groupby +
    map_groups), one vectorized sort + arange per partition.  Callers
    must pass `order_cols` that totally order the partition (e.g. end
    with a unique key) or the result is nondeterministic; a partition
    must fit in one worker (the inherent NTILE semantic — there is no
    pre-combinable form).  NTILE sizing follows the SQL standard: the
    first n mod k tiles get ceil(n/k) rows, the rest floor(n/k)."""
    import numpy as np

    if k < 1:
        raise ValueError(f"NTILE k must be >= 1, got {k}")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True)
        n = len(g)
        rn = np.arange(1, n + 1, dtype="int64")
        size_small = n // k
        num_big = n % k
        cut = num_big * (size_small + 1)
        tile = np.where(
            rn <= cut,
            (rn - 1) // (size_small + 1),
            num_big + (rn - 1 - cut) // max(size_small, 1),
        ) + 1
        g[out_rownum] = rn
        g[out_tile] = tile.astype("int64")
        return g

    return ds.groupby(part_cols).map_groups(fn, batch_format="pandas")


def grouping_sets(ds, cols: list[str], sets: list[tuple[str, ...]],
                  aggs: list[tuple[str, str, str]], *, fill="ALL",
                  driver_key_limit: int = 5_000_000):
    """GROUPING SETS / ROLLUP / CUBE: every aggregation level from ONE
    exchange.  The finest level (group by all of `cols`) is computed
    once with the pre-combined `groupby_agg`; every requested set is
    then a re-aggregation (sums-of-sums) of that small table on the
    driver — coarser levels never touch the input again.  Grouped-away
    columns are filled with `fill` (the ROLLUP 'ALL' convention).

    Only DECOMPOSABLE aggregates are accepted: sum/count re-aggregate
    with sum, min with min, max with max.  avg is not decomposable —
    request (sum, count) and divide.  `rollup_sets`/`cube_sets` build
    the standard set lists."""
    _REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _c, op, _o in aggs:
        if op not in _REAGG:
            raise ValueError(
                f"non-decomposable aggregate {op!r} in grouping_sets "
                "(use sum+count for avg)")
    for s in sets:
        unknown = set(s) - set(cols)
        if unknown:
            raise ValueError(f"grouping set {s} references unknown "
                             f"columns {sorted(unknown)}")

    fine = groupby_agg(ds, list(cols), aggs,
                       driver_key_limit=driver_key_limit).to_pandas()
    out_cols = [o for _c, _op, o in aggs]
    frames = []
    for s in sets:
        keep = [c for c in cols if c in s]
        if len(keep) == len(cols):
            lvl = fine[cols + out_cols].copy()
        elif keep:
            lvl = (fine.groupby(keep, as_index=False)
                   .agg({o: _REAGG[op] for _c, op, o in aggs}))
        else:
            lvl = pd.DataFrame(
                {o: [getattr(fine[o], _REAGG[op])()]
                 for _c, op, o in aggs})
        for c in cols:
            if c not in keep:
                lvl[c] = fill
        frames.append(lvl[cols + out_cols])
    return pd.concat(frames, ignore_index=True)


def rollup_sets(cols: list[str]) -> list[tuple[str, ...]]:
    """ROLLUP(a, b, c) → [(a,b,c), (a,b), (a,), ()]."""
    return [tuple(cols[:i]) for i in range(len(cols), -1, -1)]


def cube_sets(cols: list[str]) -> list[tuple[str, ...]]:
    """CUBE(a, b) → all 2^n subsets, finest first."""
    from itertools import combinations

    return [s for r in range(len(cols), -1, -1)
            for s in combinations(cols, r)]


def distinct_on(ds, keys: list[str], *, order_col: str | None = None,
                mode: str = "auto", driver_row_limit: int = 20_000_000):
    """Exact dedup: keep one row per key group — deterministically the
    min(order_col) row when given (D1/A3 keep-first with an explicit
    tie-break; plain first() is nondeterministic under parallelism).
    Driver path = per-batch keep-first combiner + driver finish
    (memory O(distinct keys)); mode="shuffle" = the same combiner + a
    hash-partitioned per-key finish (the combiner is idempotent) for
    huge key spaces; mode="auto" (default) = guarded driver finish
    degrading to the shuffle finish when the row guard trips."""

    def first_local(b: pd.DataFrame) -> pd.DataFrame:
        if order_col:
            b = b.sort_values(order_col, kind="mergesort")
        return b.drop_duplicates(keys, keep="first")

    cand_ds = ds.map_batches(first_local, batch_format="pandas")

    def shuffle_finish(c):
        def first(g: pd.DataFrame) -> pd.DataFrame:
            if order_col:
                g = g.sort_values(order_col, kind="mergesort")
            return g.head(1)

        return c.groupby(keys).map_groups(first, batch_format="pandas")

    if mode == "shuffle":
        return shuffle_finish(cand_ds)

    def driver_finish(c):
        import ray.data as rd

        cand = _collect_limited(c, driver_row_limit, "distinct_on")
        if cand.empty:
            return rd.from_pandas(cand)
        return rd.from_pandas(first_local(cand).reset_index(drop=True))

    if mode == "driver":
        return driver_finish(cand_ds)
    try:  # auto
        return driver_finish(cand_ds)
    except GuardExceeded:
        return shuffle_finish(cand_ds)


def priority_sample(ds, id_col: str, weight_col: str, *, k: int,
                    digits: int = 13) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (priority
    sampling, Duffield/Lund/Thorup 2007, public): each row gets
    priority ``h / w`` where ``h`` is the first ``digits`` hex chars of
    md5(str(id)) (13 hex → < 2^52, exactly representable as a double)
    and ``w`` its positive integer weight; the sample is the k rows
    with the SMALLEST priorities.  The per-row estimator
    ``est = max(w, τ)`` with τ the (k+1)-th smallest priority is
    unbiased for every item's weight (and Σ est estimates the
    population total).

    Cross-engine contract: one IEEE double division of exactly-
    representable integers — numpy and DuckDB produce identical bits,
    so the whole sample INCLUDING the float priorities hash-matches an
    ORDER BY h/w LIMIT k oracle.  Heavier rows sort earlier in
    expectation (h uniform, larger w shrinks h/w) — the weighted
    inclusion property.

    Scale shape: per-batch local (k+1)-smallest (a valid combiner —
    the global k+1 smallest survive any local k+1 cut), driver merge
    over ≤ (k+1)×batches candidate rows.  No shuffle, no RNG state;
    re-runs and other engines select identical rows."""
    import hashlib

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array([
            int(hashlib.md5(s.encode()).hexdigest()[:digits], 16)
            for s in b[id_col].astype(str)
        ], dtype=np.int64)
        w = b[weight_col].to_numpy(np.int64)
        if (w <= 0).any():
            raise ValueError("priority_sample weights must be positive")
        prio = h.astype(np.float64) / w.astype(np.float64)
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            weight_col: w, "priority": prio})
        return out.nsmallest(k + 1, "priority", keep="all")

    cand = pd.concat(
        list(ds.map_batches(combine, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).sort_values(["priority", id_col], kind="mergesort")
    top = cand.head(k).copy()
    if len(cand) > k:
        # DLT priorities are w/u (largest-k); ours are the inverted
        # u·SCALE/w (smallest-k), so their threshold is SCALE/τ — the
        # estimator ŵ = max(w, SCALE/τ) is unbiased per item
        tau = float(cand["priority"].iloc[k])
        top["est_weight"] = np.maximum(
            top[weight_col].to_numpy(np.float64),
            float(16 ** digits) / tau)
    else:  # population ≤ k: census, estimator degenerates to the weight
        top["est_weight"] = top[weight_col].astype(np.float64)
    return top.reset_index(drop=True)


def hash_sample(ds, id_col: str, *, rate: float | None = None,
                rates: dict | None = None, group_col: str | None = None,
                digits: int = 4):
    """Deterministic content-hash sampling: keep a row iff the first
    ``digits`` hex chars of md5(str(id)) sort below the rate's cutoff.

    This is the reproducible down-sampling step of a web-corpus
    pipeline (per-language / per-domain rate schedules): the keep
    decision is a pure function of the row id, so re-runs, resumed
    shards and OTHER ENGINES select the identical rows — the DuckDB
    oracle is ``substr(md5(id::VARCHAR), 1, 4) < '<cutoff>'`` (fixed-
    width lowercase hex compares as the number).  Contrast
    ``Dataset.random_sample``, which is seed-stable only within a Ray
    version (q_sample_events stays rows-only for exactly that reason).

    ``rates`` maps ``group_col`` values to per-group rates (missing
    groups fall back to ``rate``; rate=None keeps nothing).  Rate r
    maps to cutoff ``int(r * 16**digits)`` — granularity 1/16^digits.
    md5 per row is a C-call loop (~1 µs/row); it is the price of the
    cross-engine contract (pd.util.hash_array is not portable SQL).
    One stateless map_batches pass, no shuffle, no RNG state."""
    import hashlib

    if rates is not None and group_col is None:
        raise ValueError("rates= requires group_col=")
    span = 16 ** digits

    def cutoff(r: float | None) -> str:
        return format(int((r or 0.0) * span), f"0{digits}x")

    base_cut = cutoff(rate)
    cuts = {k: cutoff(v) for k, v in (rates or {}).items()}

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array([
            hashlib.md5(s.encode()).hexdigest()[:digits]
            for s in b[id_col].astype(str)
        ], dtype=object)
        if rates is None:
            lim = np.full(len(b), base_cut, dtype=object)
        else:
            lim = b[group_col].map(cuts).fillna(base_cut).to_numpy(
                dtype=object)
        return b[h < lim]

    return ds.map_batches(keep, batch_format="pandas")


def ordered_concat(ds, keys: list[str], val_col: str, *, sep: str = "|",
                   alias: str = "vals", mode: str = "auto",
                   driver_row_limit: int = 5_000_000):
    """Grouped ORDERED string concatenation — the distributed
    ``string_agg(x, sep ORDER BY x)`` (value-sorted, deterministic).

    Combiner: each batch emits ONE row per (key, batch) whose partial
    is already sep-joined-sorted — only concatenated strings move, not
    rows.  Driver finish splits the partials back apart and re-sorts
    once per key (memory O(total concatenated chars of the RESULT —
    the output's own size).  mode="shuffle" co-locates each group via
    a hash groupby instead (the honest shape when single groups exceed
    driver memory); mode="auto" degrades driver → shuffle at the
    guard.  Values containing ``sep`` are rejected in the combiner —
    a silent split-corruption otherwise.
    """
    import re as _re

    sep_re = _re.compile(_re.escape(sep))

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        vals = b[val_col].astype(str)
        if vals.str.contains(sep_re).any():
            raise ValueError(
                f"ordered_concat: a {val_col!r} value contains the "
                f"separator {sep!r}")
        g = b.assign(**{val_col: vals}).groupby(
            keys, sort=False, dropna=False)
        out = g[val_col].agg(lambda s: sep.join(sorted(s)))
        n = g.size()
        return pd.DataFrame({alias: out, "n": n.astype("int64")}
                            ).reset_index()

    partials = ds.map_batches(combine, batch_format="pandas")

    def finish(frame: pd.DataFrame) -> pd.DataFrame:
        g = frame.groupby(keys, sort=False, dropna=False)
        merged = g[alias].agg(
            lambda s: sep.join(sorted(sep.join(s).split(sep))))
        n = g["n"].sum()
        return pd.DataFrame({alias: merged, "n": n.astype("int64")}
                            ).reset_index()

    def shuffle_finish(parts):
        return parts.groupby(keys).map_groups(
            finish, batch_format="pandas")

    if mode == "shuffle":
        return shuffle_finish(partials)

    def driver_finish(parts):
        import ray.data as rd

        cand = _collect_limited(parts, driver_row_limit, "ordered_concat")
        if cand.empty:
            return rd.from_pandas(cand)
        return rd.from_pandas(finish(cand).reset_index(drop=True))

    if mode == "driver":
        return driver_finish(partials)
    try:  # auto
        return driver_finish(partials)
    except GuardExceeded:
        return shuffle_finish(partials)


# ---- skyline (Pareto front) -------------------------------------------------


def _skyline2d_local(b: pd.DataFrame, x: str, y: str,
                     x_dir: str, y_dir: str) -> pd.DataFrame:
    """Exact 2-D skyline of one frame by sort + scan (O(n log n)).
    Canonicalized to minimize-x / maximize-y via comparison-only sign
    flips; input VALUES pass through untouched.  Ties: equal (x, y)
    points never dominate each other, so all duplicates survive."""
    if b.empty:
        return b
    xv = b[x].to_numpy()
    yv = b[y].to_numpy()
    cx = xv if x_dir == "min" else -xv
    cy = yv if y_dir == "max" else -yv
    order = np.lexsort((-cy, cx))          # x asc, y desc
    cx_s, cy_s = cx[order], cy[order]
    # per distinct-x group: gmax = best y in group; a point survives
    # iff its y equals gmax AND gmax strictly beats every smaller-x
    # group's best (prevmax) — equal-y-smaller-x still dominates
    new_grp = np.r_[True, cx_s[1:] != cx_s[:-1]]
    gid = np.cumsum(new_grp) - 1
    gmax = cy_s[new_grp]                   # first in group = max (desc)
    run = np.maximum.accumulate(gmax)
    prevmax = np.r_[-np.inf, run[:-1]]
    keep_s = (cy_s == gmax[gid]) & (gmax[gid] > prevmax[gid])
    keep = np.zeros(len(b), dtype=bool)
    keep[order] = keep_s
    return b[keep]


def skyline_2d(ds, *, x: str, y: str, x_dir: str = "min",
               y_dir: str = "max", cand_limit: int = 5_000_000):
    """Two-dimensional skyline / Pareto front (Börzsönyi et al., ICDE
    2001): rows for which no other row is at-least-as-good in both
    dimensions and strictly better in one (``x_dir``/``y_dir`` pick
    min/max per axis; equal-point duplicates all survive, matching the
    SQL NOT-EXISTS dominance twin).

    Scale shape — the classic two-phase plan: every block computes its
    LOCAL skyline inside ``map_batches`` (dominance is transitive, so
    a globally non-dominated row is non-dominated in its own block:
    local skylines are a sound candidate superset), candidates stream
    to the driver under ``cand_limit`` (anti-correlated data has
    large skylines — the guard raises honestly rather than OOM), and
    one final local pass is exact.  Returns a pandas frame in input
    column order, sorted by (x, y) ascending."""
    for d in (x_dir, y_dir):
        if d not in ("min", "max"):
            raise ValueError(f"direction must be min/max, got {d!r}")
    local = ds.map_batches(
        lambda b: _skyline2d_local(b, x, y, x_dir, y_dir),
        batch_format="pandas")
    cand = _collect_limited(local, cand_limit, "skyline_2d")
    if cand.empty:
        return cand.reset_index(drop=True)
    out = _skyline2d_local(cand, x, y, x_dir, y_dir)
    return out.sort_values([x, y]).reset_index(drop=True)
