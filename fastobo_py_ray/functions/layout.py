"""Data-layout primitives: space-filling-curve (Z-order / Morton) keys.

At 100 TB, multi-dimensional locality is a LAYOUT property: sorting or
bucketing a fact table by the Morton interleave of two join/filter keys
co-locates rows that are close in BOTH dimensions, so parquet row-group
min/max statistics prune two-dimensional range predicates the way a
single-column sort only prunes one (the Delta/Iceberg OPTIMIZE ZORDER
technique).  The engine piece is the key itself — exact int64 bit
interleaving, vectorized; feed it to ``Dataset.sort`` /
``materialize_adjacency``-style partitioned writes as the layout key.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x0000FFFF0000FFFF)
_M2 = np.uint64(0x00FF00FF00FF00FF)
_M3 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M4 = np.uint64(0x3333333333333333)
_M5 = np.uint64(0x5555555555555555)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value to the even bit positions
    (the classic magic-number bit dilation, fully vectorized)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & _M1
    v = (v | (v << np.uint64(8))) & _M2
    v = (v | (v << np.uint64(4))) & _M3
    v = (v | (v << np.uint64(2))) & _M4
    v = (v | (v << np.uint64(1))) & _M5
    return v


def morton2(x, y) -> np.ndarray:
    """Interleave two non-negative integer arrays bit by bit: x takes
    the even bit positions, y the odd — the 2-D Z-order key.  For
    16-bit inputs the key fits 32 bits (int64-safe for SQL parity);
    32-bit inputs use the full uint64 range."""
    xs = np.asarray(x, dtype=np.uint64)
    ys = np.asarray(y, dtype=np.uint64)
    return _part1by1(xs) | (_part1by1(ys) << np.uint64(1))
