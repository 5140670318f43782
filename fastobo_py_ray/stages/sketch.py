"""Mergeable quantile sketch — the corpus-scale path for per-group
quantiles (:func:`..pipelines.queries.q_quantiles` is the exact
whole-group baseline).

The sketch is a t-digest-style centroid summary with a uniform size
cap: a sorted batch compresses to <= ``max_centroids`` (mean, weight)
centroids of ~equal weight; summaries MERGE associatively (concat,
re-sort, re-compress), so the whole computation is per-batch partials
plus one coarse exchange per group key — group row counts never touch
a single task. Rank error per compression is <= W/max_centroids (W =
summarized weight); merging depth is logarithmic in the block count,
so end-to-end rank error stays ~1-2% at max_centroids=256 (pytest
asserts <= 2% against the exact quantile on multimodal data).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

Summary = Tuple[np.ndarray, np.ndarray]  # sorted centroid means, weights


def compress(values: np.ndarray, weights: np.ndarray,
             max_centroids: int = 256) -> Summary:
    """(values, weights) -> sorted centroid summary of bounded size.
    Centroids are weighted means of ~equal-weight runs of the sorted
    input (uniform size function — the simplest deterministic
    t-digest variant)."""
    order = np.argsort(values, kind="stable")
    v, w = values[order].astype(np.float64), weights[order].astype(
        np.float64)
    if len(v) <= max_centroids:
        return v, w
    cum = np.cumsum(w)
    total = cum[-1]
    # bucket by cumulative weight; right edge belongs to the last bucket
    bucket = np.minimum((cum - w / 2) / total * max_centroids,
                        max_centroids - 1).astype(np.int64)
    starts = np.flatnonzero(np.diff(bucket, prepend=-1))
    wsum = np.add.reduceat(w, starts)
    vsum = np.add.reduceat(v * w, starts)
    return vsum / wsum, wsum


def merge(summaries: Sequence[Summary],
          max_centroids: int = 256) -> Summary:
    vs = np.concatenate([s[0] for s in summaries]) if summaries else \
        np.empty(0)
    ws = np.concatenate([s[1] for s in summaries]) if summaries else \
        np.empty(0)
    return compress(vs, ws, max_centroids)


def quantiles(summary: Summary, qs: Sequence[float]) -> np.ndarray:
    """Interpolated quantile estimates from a centroid summary (centroid
    at cumulative-weight midpoint, linear between midpoints)."""
    v, w = summary
    if len(v) == 0:
        return np.full(len(qs), np.nan)
    cum = np.cumsum(w)
    mid = (cum - w / 2) / cum[-1]
    return np.interp(np.asarray(qs, dtype=np.float64), mid, v)


def approx_quantiles(ds, value_col: str, qs: Sequence[float],
                     by: Optional[str] = None, max_centroids: int = 256,
                     num_buckets: int = 16) -> pd.DataFrame:
    """Distributed approximate quantiles: per-batch sketch partials ->
    one coarse exchange on the group key -> merged sketch -> estimates.
    The exchange moves <= max_centroids rows per (batch, group), never
    the raw values. Returns a DataFrame (by?, q, value)."""
    from ..functions.relops import grouped_map

    gcol = by if by is not None else "__all"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if by is None:
            df = df.assign(__all="")
        rows = []
        for g, sub in df.groupby(gcol, sort=False):
            vals = sub[value_col].to_numpy(dtype=np.float64)
            v, w = compress(vals, np.ones_like(vals), max_centroids)
            rows.append({gcol: g, "__v": v.tolist(), "__w": w.tolist()})
        return pd.DataFrame(rows,
                            columns=[gcol, "__v", "__w"])

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(gcol, sort=False):
            s = merge([(np.asarray(v), np.asarray(w))
                       for v, w in zip(sub["__v"], sub["__w"])],
                      max_centroids)
            est = quantiles(s, qs)
            for q, val in zip(qs, est):
                rows.append({gcol: g, "q": float(q),
                             "value": round(float(val), 6)})
        return pd.DataFrame(rows, columns=[gcol, "q", "value"])

    out = grouped_map(ds.map_batches(partial, batch_format="pandas"),
                      gcol, finalize, num_buckets=num_buckets).to_pandas()
    if by is None:
        out = out.drop(columns="__all")
        return out.sort_values("q").reset_index(drop=True)
    return out.sort_values([by, "q"]).reset_index(drop=True)
