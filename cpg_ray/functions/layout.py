"""Data-layout keys: Z-order (Morton) interleaving for
multi-dimensional file clustering.

At 100 TB the dominant cost of a selective query is how many files its
predicates can SKIP.  Sorting by one column clusters that column only;
interleaving the bits of two columns (Morton/Z-order — Morton 1966,
public; the key behind Delta/Iceberg ``OPTIMIZE ZORDER``) gives every
file a small range in BOTH dimensions, so min-max zone maps prune on
either predicate.  This module provides the vectorized key; writers
sort/range-partition by it with the existing machinery
(``Dataset.sort`` / ``ordered_scan``-style range buckets).

The spread uses the classic magic-number shifts — integer-only, so the
DuckDB oracle reproduces the key bit-for-bit from the same unrolled
shift/mask steps (see ``morton_sql``).

Reference analog: NodeComparator's location sort (SURVEY §2.6 O1) is
the reference's one layout decision; Z-order is the same move for two
query dimensions at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MASKS = (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
_SHIFTS = (8, 4, 2, 1)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 into the even bit
    positions of a 32-bit lane."""
    v = v.astype(np.int64) & 0xFFFF
    for s, m in zip(_SHIFTS, _MASKS):
        v = (v | (v << s)) & m
    return v


def morton_key(x, y) -> np.ndarray:
    """Interleave the low 16 bits of x (even positions) and y (odd
    positions) into one int64 Z-order key in [0, 2^32)."""
    return _part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << 1)


def morton_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB expression computing :func:`morton_key` bit-for-bit
    (unrolled shift/mask spread per column, integer-only)."""

    def spread(e: str) -> str:
        e = f"(({e}) & 65535)"
        for s, m in zip(_SHIFTS, _MASKS):
            e = f"((({e} | ({e} << {s})) & {m}))"
        return e

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def add_zorder_key(ds, x_col: str, y_col: str, *,
                   out_col: str = "zkey", n_buckets: int = 16):
    """Append the Z-order key plus a coarse range bucket
    (``zkey >> (32 - log2(n_buckets))``) — the partition a Z-order
    writer would send each row to.  One stateless pass; the writer's
    exchange is then an ordinary range shuffle on ``zbucket``."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = 32 - (n_buckets.bit_length() - 1)

    def add(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        z = morton_key(b[x_col].to_numpy(), b[y_col].to_numpy())
        b[out_col] = z
        b[out_col + "_bucket"] = (z >> shift).astype(np.int64)
        return b

    return ds.map_batches(add, batch_format="pandas")
