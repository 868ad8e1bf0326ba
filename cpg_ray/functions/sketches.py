"""Mergeable sketches for approximate aggregation at scale.

The reference computes exact aggregates only (SURVEY.md §2.5); at
100 TB, distinct counts and quantiles over high-cardinality keys are
sketch territory.  Both sketches here follow the guide's pattern: one
small sketch per batch inside ``map_batches`` (the combiner), then a
cheap driver-side merge — sketches are designed to be mergeable, so the
shuffle moves kilobytes, not keys.

- :class:`HLL` — classic HyperLogLog (dense, 2^p registers, crc32+salt
  hashing, the standard bias-corrected estimator with small/large-range
  corrections).  Relative error ≈ 1.04/√(2^p).
- quantile via deterministic uniform reservoir per batch: mergeable
  fixed-size samples; rank error shrinks with sample size.  (A KLL/
  t-digest drop-in can replace the sample without changing the
  pipeline shape.)
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values: np.ndarray) -> np.ndarray:
        """Deterministic 64-bit hashes (blake2b-8: two salted crc32
        halves are NOT independent enough — measured 21% HLL error)."""
        from hashlib import blake2b

        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            d = blake2b(str(v).encode("utf-8"), digest_size=8).digest()
            out[i] = int.from_bytes(d, "little")
        return out

    def add_batch(self, values) -> "HLL":
        h = self._hash64(np.asarray(values))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        probe = np.uint64(1) << np.uint64(63)
        mask = np.ones(len(h), dtype=bool)
        for r in range(64 - self.p + 1):
            hit = mask & ((rest & probe) != 0)
            lz[hit] = r + 1
            mask &= ~hit
            probe >>= np.uint64(1)
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        if est > (1 << 32) / 30.0:
            return -(1 << 32) * np.log(1 - est / (1 << 32))
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HLL":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT column): one HLL per
    batch, serialized sketches merged on the driver."""

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        h = HLL(p).add_batch(batch[column].values)
        return pd.DataFrame({"sketch": [h.serialize()]})

    merged = HLL(p)
    for b in ds.map_batches(sketch, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=None
    ):
        for blob in b["sketch"]:
            merged.merge(HLL.deserialize(bytes(blob)))
    return merged.estimate()


class MisraGries:
    """Misra-Gries heavy-hitters summary with k counters.  Mergeable
    (Agarwal et al., "Mergeable Summaries", PODS'12): merge = counter
    addition followed by one compress (subtract the (k+1)-th largest
    count, drop ≤0), preserving the deterministic guarantee
    ``true_count − n/(k+1) ≤ estimate ≤ true_count`` over the combined
    stream of n items — no randomness, no failure probability."""

    def __init__(self, k: int):
        self.k = k
        self.counters: dict = {}
        self.n = 0  # total items summarized

    def add_counts(self, counts: dict, n: int) -> "MisraGries":
        for v, c in counts.items():
            self.counters[v] = self.counters.get(v, 0) + int(c)
        self.n += int(n)
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        return self.add_counts(other.counters, other.n)

    def _compress(self):
        if len(self.counters) <= self.k:
            return
        vals = sorted(self.counters.values(), reverse=True)
        cut = vals[self.k]  # (k+1)-th largest
        self.counters = {v: c - cut for v, c in self.counters.items()
                         if c > cut}

    def items(self) -> list[tuple]:
        return sorted(self.counters.items(),
                      key=lambda kv: (-kv[1], str(kv[0])))

    @property
    def err_bound(self) -> float:
        """Each estimate undercounts by at most n/(k+1)."""
        return self.n / (self.k + 1)


def heavy_hitters(ds, column: str, *, k: int = 64,
                  min_share: float = 0.0) -> pd.DataFrame:
    """Distributed heavy hitters: one EXACT per-batch value_counts
    (itself a valid MG summary) compressed to k counters inside
    ``map_batches``, merged on the driver — the shuffle moves ≤k
    (value, count) pairs per batch, never the values.  Returns
    (value, est_count, n_total, err_bound) rows; every value with true
    frequency > n/(k+1) is guaranteed present, and
    true − n/(k+1) ≤ est ≤ true.  ``min_share`` drops rows whose
    LOWER-bound share (est/n) is below it."""

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[column].value_counts()
        mg = MisraGries(k).add_counts(dict(vc), len(batch))
        it = mg.items()
        return pd.DataFrame({
            "value": [v for v, _c in it],
            "count": [c for _v, c in it],
            "n": [mg.n] + [0] * (len(it) - 1) if it else [],
        })

    merged = MisraGries(k)
    for b in ds.map_batches(summarize, batch_format="pandas") \
               .iter_batches(batch_format="pandas", batch_size=None):
        if len(b):
            # iter_batches coalesces several per-batch summaries into
            # one frame — the same value can repeat, so SUM duplicates
            # before the dict (a plain dict(zip(...)) keeps only the
            # last occurrence and silently undercounts)
            g = b.groupby("value", sort=False)["count"].sum()
            merged.add_counts(dict(g), int(b["n"].sum()))
    rows = [(v, int(c)) for v, c in merged.items()
            if merged.n == 0 or c / merged.n >= min_share]
    return pd.DataFrame({
        "value": [v for v, _c in rows],
        "est_count": [c for _v, c in rows],
        "n_total": merged.n,
        "err_bound": merged.err_bound,
    })


def _batch_sample(values: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic uniform subsample of size ≤ k (hash-ordered, so the
    same rows are picked regardless of batch boundaries)."""
    if len(values) <= k:
        return values
    # key on the VALUE only — a within-batch row index would make the
    # selected sample depend on upstream batch boundaries (duplicate
    # values share a key; the stable argsort keeps them deterministic)
    keys = np.array([zlib.crc32(f"{seed}:{v}".encode()) for v in values])
    return values[np.argsort(keys, kind="stable")[:k]]


def approx_quantiles(ds, column: str, qs: list[float], *,
                     sample_per_batch: int = 4096, seed: int = 17) -> list[float]:
    """Mergeable-sample quantiles: bounded uniform sample per batch →
    driver concatenation → exact quantiles of the sample."""
    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        v = _batch_sample(batch[column].values, sample_per_batch, seed)
        return pd.DataFrame({column: v})

    parts = [
        b[column].values
        for b in ds.map_batches(sample, batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None
        )
    ]
    allv = np.concatenate(parts) if parts else np.array([])
    if not len(allv):
        return [float("nan")] * len(qs)
    return [float(np.quantile(allv, q)) for q in qs]


def cms_frequencies(ds, column: str, *, width: int = 256, depth: int = 4):
    """Count-Min sketch point-frequency estimates (Cormode & Muthu-
    krishnan 2005, public) — DETERMINISTIC (md5 row hashes) and
    therefore oracle-pairable, unlike the textbook random-hash CMS.

    Sketch build is the canonical mergeable-combiner shape: each batch
    folds its value_counts into per-(row, bucket) partial counters —
    at most ``depth × min(width, distinct)`` rows leave a batch, never
    the values — then ONE small groupby-sum produces the depth×width
    counter matrix (kilobytes on the driver regardless of corpus
    size).  Estimates are ``min`` over the depth rows; the guarantee is
    ``exact ≤ est ≤ exact + ε·n`` w.h.p. for random hashes, and the
    deterministic variant keeps the one-sided ``est ≥ exact`` bound
    unconditionally (collisions only ever ADD).

    Returns (counters, estimate) where ``counters`` is the
    depth×width int64 matrix and ``estimate(values) -> np.ndarray``
    probes it.
    """
    import hashlib

    def bucket(d: int, values) -> np.ndarray:
        return np.array(
            [int(hashlib.md5(f"{d}|{v}".encode()).hexdigest()[:8], 16)
             % width for v in values],
            dtype=np.int64,
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[column].value_counts()
        vals, cnts = vc.index.to_numpy(), vc.to_numpy(np.int64)
        rows, bks, cs = [], [], []
        for d in range(depth):
            b = bucket(d, vals)
            # fold same-bucket collisions inside the batch
            bb = np.bincount(b, weights=cnts, minlength=width)
            nz = np.flatnonzero(bb)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            bks.append(nz.astype(np.int64))
            cs.append(bb[nz].astype(np.int64))
        return pd.DataFrame({
            "d": np.concatenate(rows) if rows else np.array([], np.int64),
            "b": np.concatenate(bks) if bks else np.array([], np.int64),
            "cnt": np.concatenate(cs) if cs else np.array([], np.int64),
        })

    counters = np.zeros((depth, width), dtype=np.int64)
    for frame in (ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None)):
        if len(frame):
            g = frame.groupby(["d", "b"], sort=False)["cnt"].sum()
            idx = np.array([k for k in g.index], dtype=np.int64)
            counters[idx[:, 0], idx[:, 1]] += g.to_numpy(np.int64)

    def estimate(values) -> np.ndarray:
        vals = np.asarray(values)
        ests = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            np.minimum(ests, counters[d, bucket(d, vals)], out=ests)
        return ests

    return counters, estimate


def dsample_quantiles(ds, value_col: str, qs: list[float], *,
                      key_col: str, k: int = 512) -> pd.DataFrame:
    """Deterministic-sample quantiles, ORACLE-PAIRABLE (unlike
    :func:`approx_quantiles`, whose per-batch reservoir depends on
    batch boundaries): the sample is the k rows with the globally
    smallest ``md5(str(key))`` — a valid combiner (any local k-cut
    preserves the global k smallest), so the sample is independent of
    batching, row order, and engine.  Quantiles are the
    percentile_cont sorted-array lerp at ``h = (n−1)q`` over the
    sample values — bit-identical to SQL's formula.  ``key_col`` must
    be unique per row (duplicate VALUES stay correctly weighted; a
    value-keyed hash would collapse them and bias the sample).

    Scale shape: per-batch k-smallest partials (k rows leave a batch),
    driver merge over k × batches candidates; the sample never grows
    with the corpus."""
    import hashlib

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        h = np.array([hashlib.md5(str(v).encode()).hexdigest()
                      for v in b[key_col]], dtype=object)
        out = pd.DataFrame({"h": h, key_col: b[key_col].to_numpy(),
                            value_col: b[value_col].to_numpy()})
        return out.sort_values(["h", key_col], kind="mergesort").head(k)

    cand = pd.concat(
        list(ds.map_batches(combine, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=None)),
        ignore_index=True,
    ).sort_values(["h", key_col], kind="mergesort").head(k)
    s = np.sort(cand[value_col].to_numpy(np.float64))
    rows = []
    for q in qs:
        h = (len(s) - 1) * q
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        rows.append({"q": float(q),
                     "value": float(s[lo] + (s[hi] - s[lo]) * (h - lo)),
                     "n_sample": np.int64(len(s))})
    return pd.DataFrame(rows).astype({"n_sample": "int64"})


def kmv_distinct(ds, *, group_col: str, value_col: str, k: int = 16):
    """KMV (k-minimum-values) distinct-count sketch per group (Bar-
    Yossef et al. 2002, public), DETERMINISTIC and therefore
    oracle-pairable — unlike HLL above, whose register layout is an
    implementation detail: hash every value with md5, keep the k
    smallest DISTINCT hashes per group, estimate
    (k-1) · 2^32 / uint32(prefix of the k-th smallest); groups with
    fewer than k distinct values report their exact count.

    Scale shape: per-batch (group, distinct-hash) partials keep only
    their local k smallest — a valid combiner, so at most
    k × groups × batches candidate rows ever move; the finish dedups
    (same value hashes identically everywhere) and takes the global k
    smallest per group on the driver.  Returns a pandas DataFrame
    (group, n_used, kth_prefix, est_distinct)."""
    import hashlib

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[group_col, value_col]].drop_duplicates()
        h = d[value_col].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        out = pd.DataFrame({group_col: d[group_col], "h": h})
        return (out.sort_values("h", kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    cand = (ds.map_batches(partial, batch_format="pandas")
            .to_pandas().drop_duplicates())
    rows = []
    for g, sub in cand.groupby(group_col, sort=True):
        hs = sub["h"].drop_duplicates().sort_values().head(k)
        n = len(hs)
        if n >= k:
            prefix = int(hs.iloc[k - 1][:8], 16)
            est = float((k - 1) * 4294967296) / float(prefix)
        else:
            prefix = 0
            est = float(n)
        rows.append({group_col: g, "n_used": n, "kth_prefix": prefix,
                     "est_distinct": est})
    return pd.DataFrame(
        rows, columns=[group_col, "n_used", "kth_prefix",
                       "est_distinct"]).astype(
        {"n_used": "int64", "kth_prefix": "int64"})


def hll_distinct(ds, group_col: str, value_col: str, *, m: int = 64,
                 alpha_num: int = 709, alpha_den: int = 1000):
    """Per-group HyperLogLog distinct-count estimates (Flajolet et
    al. 2007) — the DETERMINISTIC md5 twin of :class:`HLL`, and
    therefore oracle-pairable: register j and the 32-bit rank word w
    come from disjoint md5 hex windows, rho(w) = 33 − bit_length(w)
    by exact integer comparison against a powers-of-two table (never
    float log2, whose rounding at 2^k boundaries is libm-dependent),
    and the raw estimator αm²/Z is carried as the exact integer
    Z_scaled = Σ_j 2^(33−M_j) so est = (α_num·m²·2³³) //
    (α_den·Z_scaled) reproduces bit-for-bit in SQL.

    Combiner shape: each batch emits at most groups×m (grp, register,
    max-rho) partial rows — values never leave their batch — then one
    small groupby-max; the driver sees only register tables.  Default
    α = 0.709 is the standard m=64 constant; pass the matching
    rational for other m.

    Returns a pandas DataFrame (grp, zero_registers, z_scaled,
    hll_est), one row per group.  The raw estimator is reported
    without the small-range linear-counting correction (ln is not
    cross-engine exact); ``zero_registers`` carries the signal a
    consumer needs to apply it."""
    import hashlib

    from .relational import groupby_agg

    powers = (np.int64(1) << np.arange(1, 33, dtype=np.int64))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[group_col, value_col]].drop_duplicates()
        if d.empty:
            return pd.DataFrame({
                group_col: pd.Series([], dtype=b[group_col].dtype),
                "j": pd.Series([], dtype="int64"),
                "rho": pd.Series([], dtype="int64")})
        hexes = [hashlib.md5(str(v).encode()).hexdigest()
                 for v in d[value_col].to_numpy()]
        j = np.array([int(h[:8], 16) for h in hexes],
                     dtype=np.int64) % m
        w = np.array([int(h[8:16], 16) for h in hexes], dtype=np.int64)
        bits = np.searchsorted(powers, w, side="right") + 1
        rho = np.where(w >= 1, 33 - bits, 33).astype(np.int64)
        out = pd.DataFrame({group_col: d[group_col].to_numpy(),
                            "j": j, "rho": rho})
        return (out.groupby([group_col, "j"], sort=False, as_index=False)
                .max())

    regs = groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "j"], [("rho", "max", "rho")]).to_pandas()
    rows = []
    for grp, g in regs.groupby(group_col, sort=True):
        mj = g["rho"].to_numpy(np.int64)
        z_scaled = int((np.int64(1) << (33 - mj)).sum()) \
            + (m - len(mj)) * (1 << 33)
        zeros = m - len(mj)
        est = (alpha_num * m * m * (1 << 33)) // (alpha_den * z_scaled)
        rows.append((grp, zeros, z_scaled, est))
    return pd.DataFrame(rows, columns=[group_col, "zero_registers",
                                       "z_scaled", "hll_est"])


def kmv_overlap(ds, *, group_col: str, text_col: str, n: int = 3,
                k: int = 256):
    """Corpus-slice overlap estimation via KMV sketches (Beyer et al.
    SIGMOD'07's distinct-value synopses applied to set resemblance —
    the dataset-curation question "how much of slice B is already in
    slice A" without a quadratic gram join): per group, the k smallest
    DISTINCT 60-bit md5 hashes of word n-grams (split on single
    spaces, in exact sync with the DuckDB ``string_split`` twin); per
    group pair, the k smallest of the union and the fraction of them
    present in BOTH sketches — an unbiased Jaccard estimate, reported
    as exact-integer basis points (10000·shared // k_used).

    Scale shape: per-batch partials keep only their local k smallest
    hashes per group (a valid combiner — the same gram hashes
    identically everywhere), so at most k × groups × batches rows
    move and the driver sees only sketch-sized state; the pairwise
    finish is groups²-bounded, never corpus-bounded.

    Returns a pandas DataFrame (group_a, group_b, k_used, n_shared,
    jaccard_bp), group_a < group_b, sorted."""
    import hashlib

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        best: dict = {}
        for g, t in zip(b[group_col].to_numpy(object),
                        b[text_col].to_numpy(object)):
            words = t.split(" ")
            if len(words) < n:
                continue
            s = best.setdefault(g, set())
            for i in range(len(words) - n + 1):
                s.add(" ".join(words[i:i + n]))
        if not best:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "h": pd.Series(dtype="int64")})
        frames = []
        for g, grams in best.items():
            hs = np.unique(np.array(
                [int(hashlib.md5(x.encode()).hexdigest()[:15], 16)
                 for x in grams], dtype=np.int64))[:k]
            frames.append(pd.DataFrame({group_col: g, "h": hs}))
        return pd.concat(frames, ignore_index=True)

    cand = (ds.map_batches(partial, batch_format="pandas")
            .to_pandas().drop_duplicates())
    out_cols = ["group_a", "group_b", "k_used", "n_shared",
                "jaccard_bp"]
    if not len(cand):
        return pd.DataFrame({c: pd.Series(
            dtype="object" if c.startswith("group") else "int64")
            for c in out_cols})
    mins = {g: sub["h"].drop_duplicates().sort_values()
            .head(k).to_numpy(np.int64)
            for g, sub in cand.groupby(group_col, sort=True)}
    groups = sorted(mins)
    rows = []
    for i, la in enumerate(groups):
        sa = set(mins[la].tolist())
        for lb in groups[i + 1:]:
            sb = set(mins[lb].tolist())
            merged = sorted(sa | sb)[:k]
            k_used = len(merged)
            shared = sum(1 for h in merged if h in sa and h in sb)
            rows.append((la, lb, k_used, shared,
                         10000 * shared // k_used if k_used else 0))
    out = pd.DataFrame(rows, columns=out_cols)
    for c in out_cols[2:]:
        out[c] = out[c].astype("int64")
    return out.sort_values(["group_a", "group_b"]).reset_index(
        drop=True)
