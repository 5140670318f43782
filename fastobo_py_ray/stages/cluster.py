"""Distributed document/embedding clustering.

:func:`kmeans` is full-data Lloyd's — the corpus-clustering sibling of
the bounded-sample ``ann.kmeans_centroids`` (which trains IVF routing on
a driver-side sample).  Here every row participates:

* per iteration ONE streaming assignment pass — each batch computes
  squared-Euclidean argmin against the broadcast ``k x d`` centroid
  matrix and emits a ``k x (d+2)`` partial (per-centroid vector sums,
  counts, inertia).  Block partials are KB-scale regardless of corpus
  size, so the driver fold is a bounded merge, exactly like the ANN
  brute-force top-k merge.
* NO shuffle at any point, at any scale: the only data movement is the
  ``ray.put`` centroid broadcast down and the tiny partials up.
* the projected ``(id, vec)`` working set is materialized once and
  re-streamed per iteration — iterative refinement re-reads blocks from
  the object store instead of re-running the upstream pipeline per
  iteration (spill-backed; nothing corpus-scale is ever collected).

Determinism contract (cross-run AND cross-engine): init picks the k rows
with the smallest ``md5(str(id))`` (engine-independent, computed with
bounded per-batch top-k partials); argmin ties break to the lowest
centroid index; block partials fold in Dataset block order, which Ray
keeps deterministic.  Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

from .ann import _as_matrix


def _assign(m: np.ndarray, cent: np.ndarray, exact: bool = False
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Squared-Euclidean argmin of rows ``m`` against centroids ``cent``
    -> (assignment, squared distance).  The ||m||^2 term is folded in so
    the reported inertia is the true sum of squared distances.

    ``exact=True`` computes the DIRECT sum of squared differences
    (one k-length loop of ``((m - c)**2).sum``) instead of the BLAS
    ``||m||^2 - 2mc + ||c||^2`` expansion: the two forms differ in
    float roundoff, and on near-tied centroids that can flip the
    argmin relative to an oracle that sums squares directly (DuckDB's
    ``list_distance``).  Oracle-checked paths (q_kmeans_assign) use
    the exact form so engine and oracle share arithmetic; the Lloyd
    iterations keep the expansion (one GEMM, ~d/3x fewer flops —
    roundoff there only perturbs which near-tied centroid a point
    refines, not a checked answer)."""
    if exact:
        d2 = np.empty((len(m), len(cent)), dtype=np.float64)
        for j in range(len(cent)):
            diff = m - cent[j]
            d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    else:
        d2 = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ cent.T)
              + (cent * cent).sum(axis=1)[None, :])
    a = d2.argmin(axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def _kmeans_fit(ds, k: int, iters: int, vec_col: str, id_col: str):
    """Shared fit path: returns ``(centroids, work, inertia_history)``
    where ``work`` is the MATERIALIZED (id, vec) projection the
    iterations streamed over — callers that need another full pass
    (labeling, SemDeDup stamping) reuse it instead of re-executing the
    upstream pipeline."""
    import ray

    from .traindata import _md5_hex

    work = ds.map_batches(
        lambda df: df[[id_col, vec_col]], batch_format="pandas") \
        .materialize()

    # ---- deterministic init: k smallest md5(str(id)) rows ------------
    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[id_col, vec_col]].copy()
        sub["__h"] = pd.Series(_md5_hex(sub[id_col]), index=sub.index,
                               dtype="string")
        return sub.sort_values("__h").head(k)

    seeds = work.map_batches(seed_partial, batch_format="pandas") \
        .to_pandas().sort_values("__h").head(k)
    if len(seeds) < k:
        raise ValueError(f"kmeans: k={k} exceeds dataset size {len(seeds)}")
    cent = _as_matrix(seeds[vec_col])
    dim = cent.shape[1]
    scols = [f"s{j}" for j in range(dim)]

    inertia_history: List[float] = []
    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            if df.empty:
                return pd.DataFrame(
                    {"cid": pd.Series(dtype="int64"),
                     "n": pd.Series(dtype="int64"),
                     "inertia": pd.Series(dtype="float64"),
                     **{s: pd.Series(dtype="float64") for s in scols}})
            m = _as_matrix(df[vec_col])
            a, d = _assign(m, c)
            sums = np.zeros((len(c), m.shape[1]))
            np.add.at(sums, a, m)
            out = pd.DataFrame(
                {"cid": np.arange(len(c), dtype="int64"),
                 "n": np.bincount(a, minlength=len(c)).astype("int64"),
                 "inertia": np.bincount(a, weights=d, minlength=len(c))})
            for j, s in enumerate(scols):
                out[s] = sums[:, j]
            return out

        fold = work.map_batches(partial, batch_format="pandas") \
            .to_pandas().groupby("cid", sort=True).sum()
        inertia_history.append(float(fold["inertia"].sum()))
        n = fold["n"].to_numpy()
        sums = fold[scols].to_numpy()
        nz = n > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / n[nz, None]

    return cent, work, inertia_history


def _label_stage(cent, id_col: str, vec_col: str, extra_cols=(),
                 exact: bool = False):
    """Batch fn assigning rows to broadcast centroids -> (id, [extras],
    cluster).  Shared by :func:`kmeans` and :func:`semantic_dedup`;
    ``exact`` selects :func:`_assign`'s oracle-matching distance form."""
    import ray

    cent_ref = ray.put(cent)
    cols = [id_col, *extra_cols]

    def label(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = {c: df[c] if c in df.columns else pd.Series(dtype="object")
                   for c in cols}
            out["cluster"] = pd.Series(dtype="int64")
            return pd.DataFrame(out)
        a, _ = _assign(_as_matrix(df[vec_col]), ray.get(cent_ref),
                       exact=exact)
        out = {c: df[c].to_numpy() for c in cols}
        out["cluster"] = a.astype("int64")
        return pd.DataFrame(out)

    return label


def kmeans(ds, k: int = 10, iters: int = 5, vec_col: str = "embedding",
           id_col: str = "vec_id"):
    """Distributed Lloyd's k-means.  Returns
    ``(centroids, assignments_ds, inertia_history)`` where
    ``assignments_ds`` is a Dataset of ``(id_col, cluster)`` and
    ``inertia_history`` has one entry per iteration (non-increasing —
    Lloyd's monotonicity, asserted in tests)."""
    cent, work, hist = _kmeans_fit(ds, k, iters, vec_col, id_col)
    assign = work.map_batches(_label_stage(cent, id_col, vec_col),
                              batch_format="pandas")
    return cent, assign, hist


def semantic_dedup(ds, k: int = 10, iters: int = 5,
                   threshold: float = 0.95, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the distributed
    k-means above, then prune cosine near-duplicates WITHIN each
    cluster only — the published trade that turns the all-pairs O(N^2)
    cosine matrix into k blocks of O((N/k)^2), sharded across the
    cluster by ONE keyed exchange on the cluster id (cross-cluster
    near-dups are deliberately out of scope; that is the algorithm, not
    a shortcut).

    In-cluster rule (deterministic keep-first): ids ascending, a row is
    dropped iff its cosine similarity — rounded to 6 decimals, the
    engine-wide float contract — to an already-KEPT lower id reaches
    ``threshold``.  The greedy scan is per-row Python but each step is
    one numpy matvec against the kept matrix, and the loop is bounded
    by the cluster size (~N/k), which the clustering exists to bound.

    Returns a Dataset of ``(id, cluster, keep)`` covering every row."""
    from ..functions.relops import grouped_map
    from .ann import _normalize

    # fit once, then stamp clusters over the SAME materialized (id, vec)
    # working set the iterations streamed — no second upstream read
    cent, work, _hist = _kmeans_fit(ds, k, iters, vec_col, id_col)
    stamped = work.map_batches(
        _label_stage(cent, id_col, vec_col, extra_cols=(vec_col,)),
        batch_format="pandas")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cid, g in df.groupby("cluster", sort=False):
            g = g.sort_values(id_col, kind="stable")
            m = _normalize(_as_matrix(g[vec_col]))
            keep = np.zeros(len(g), dtype=bool)
            kept = np.empty_like(m)  # prefix buffer: no per-row vstack
            n_kept = 0
            for i in range(len(g)):
                if n_kept == 0 or float(
                        np.round(kept[:n_kept] @ m[i], 6).max()) \
                        < threshold:
                    keep[i] = True
                    kept[n_kept] = m[i]
                    n_kept += 1
            outs.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "cluster": np.full(len(g), cid, dtype="int64"),
                "keep": keep}))
        if not outs:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "keep": pd.Series(dtype="bool")})
        return pd.concat(outs, ignore_index=True)

    return grouped_map(stamped, "cluster", prune, num_buckets=min(k, 64))


def logreg_fit(ds, k_classes: int = 2, iters: int = 20, lr: float = 0.5,
               vec_col: str = "embedding", label_col: str = "label",
               pos_labels=None):
    """Distributed binary logistic regression by data-parallel
    FULL-BATCH gradient descent — the model-fitting sibling of
    :func:`kmeans`'s streaming partials: per iteration ONE pass where
    each batch emits its exact gradient contribution
    ``X^T (sigmoid(Xw) - y)`` plus loss/count partials ((d+2) floats
    per block regardless of corpus size), the driver folds and steps.
    No shuffle at any point; full-batch (not stochastic) because the
    summed gradient is deterministic under any block order, so runs
    reproduce bit-for-bit and the loss decreases monotonically for a
    conservative ``lr`` (both pytest-gated against a single-process
    numpy mirror).

    ``pos_labels``: the label values forming the positive class.
    Returns ``(w, b, loss_history)``."""
    import ray

    pos = set(pos_labels if pos_labels is not None else [1])

    work = ds.map_batches(
        lambda df: df[[vec_col, label_col]], batch_format="pandas") \
        .materialize()

    probe = work.take_batch(1, batch_format="pandas")
    dim = len(np.asarray(probe[vec_col].iloc[0]))
    w = np.zeros(dim)
    b = 0.0
    losses = []

    for _ in range(iters):
        ref = ray.put((w, b))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cw, cb = ray.get(ref)
            cols = {"gb": pd.Series(dtype="float64"),
                    "loss": pd.Series(dtype="float64"),
                    "n": pd.Series(dtype="int64"),
                    **{f"g{j}": pd.Series(dtype="float64")
                       for j in range(dim)}}
            if df.empty:
                return pd.DataFrame(cols)
            X = _as_matrix(df[vec_col])
            y = df[label_col].isin(pos).to_numpy().astype("float64")
            z = X @ cw + cb
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = X.T @ err
            # numerically-stable log loss: log(1+e^z) - y*z
            ll = float(np.sum(np.logaddexp(0.0, z) - y * z))
            row = {"gb": [float(err.sum())], "loss": [ll],
                   "n": [len(y)]}
            for j in range(dim):
                row[f"g{j}"] = [g[j]]
            return pd.DataFrame(row)

        fold = work.map_batches(partial, batch_format="pandas") \
            .to_pandas().sum()
        n = float(fold["n"])
        losses.append(float(fold["loss"]) / n)
        g = np.array([fold[f"g{j}"] for j in range(dim)]) / n
        w = w - lr * g
        b = b - lr * float(fold["gb"]) / n

    return w, b, losses
