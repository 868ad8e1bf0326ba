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
        batch_format="pandas"
    ):
        for blob in b["sketch"]:
            merged.merge(HLL.deserialize(bytes(blob)))
    return merged.estimate()


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
            batch_format="pandas"
        )
    ]
    allv = np.concatenate(parts) if parts else np.array([])
    if not len(allv):
        return [float("nan")] * len(qs)
    return [float(np.quantile(allv, q)) for q in qs]
