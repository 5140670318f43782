"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — the exact baseline: numpy block matmul per
  Arrow batch against a broadcast query matrix (``ray.put`` once, fetched
  once per task), per-batch partial top-k, driver-side final merge of the
  tiny partials. One pass, no shuffle, scales linearly with the corpus.
* :class:`LshBucketer` / :func:`lsh_topk` — the scale path: random
  hyperplane signatures bucket vectors once; queries probe only matching
  buckets (approximate; recall grows with ``num_probes``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, query: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_ids: Optional[set] = None) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partial top-k inside map_batches, then
    a driver merge over (num_blocks * k) rows. Columns (vec_id, cos_sim)."""
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    q_ref = ray.put(q)
    excl = exclude_ids or set()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        mask = ~df[id_col].isin(excl)
        df = df[mask]
        if df.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        m = _normalize(_as_matrix(df[vec_col]))
        sims = (m @ qm.T).ravel()
        top = np.argsort(-sims, kind="stable")[:k]
        return pd.DataFrame({id_col: df[id_col].to_numpy()[top],
                             "cos_sim": np.round(sims[top], 6)})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["cos_sim", id_col], ascending=[False, True], kind="mergesort")
    return partials.head(k).reset_index(drop=True)


class LshBucketer:
    """Actor stage assigning random-hyperplane LSH bucket ids; the
    hyperplanes are derived from a fixed seed so bucketing is deterministic
    and shared across query time without shipping state."""

    def __init__(self, dim: int, num_planes: int = 8, seed: int = 42,
                 vec_col: str = "embedding", out_col: str = "bucket"):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(num_planes, dim))
        self.vec_col, self.out_col = vec_col, out_col

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.uint64) <<
                np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[self.out_col] = self.signature(
            _normalize(_as_matrix(df[self.vec_col]))).astype("int64")
        return df


def lsh_topk(ds, query: np.ndarray, k: int = 10, dim: Optional[int] = None,
             num_planes: int = 8, num_probes: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_ids: Optional[set] = None,
             num_tables: int = 1) -> pd.DataFrame:
    """Approximate top-k: score only rows whose LSH bucket is within the
    ``num_probes`` nearest probe signatures of the query (multi-probe =
    flipping the lowest-margin hyperplane bits).

    ``num_tables`` > 1 is the seed-union recall knob: each table draws an
    independent hyperplane set (seed, seed+1, ...) and a row is a
    candidate if ANY table's probe set hits its bucket — the classic
    multi-table LSH recall/cost trade (candidate set grows ~linearly,
    misses shrink ~exponentially).  One pass either way: every table's
    signature is a matmul over the same batch."""
    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    if dim is None:
        dim = q.shape[1]
    qn = _normalize(q)

    tables = []  # (bucketer, probe_sigs) per seed
    for t in range(num_tables):
        bucketer = LshBucketer(dim, num_planes, seed + t, vec_col)
        margins = (qn @ bucketer.planes.T).ravel()
        base_bits = margins > 0
        order = np.argsort(np.abs(margins))  # least-confident flips first
        probe_sigs = set()
        for flips in _probe_flip_sets(order, num_probes):
            bits = base_bits.copy()
            for bit in flips:
                bits[bit] = not bits[bit]
            probe_sigs.add(int((bits.astype(np.uint64) <<
                                np.arange(len(bits),
                                          dtype=np.uint64)).sum()))
        tables.append((bucketer, probe_sigs))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_as_matrix(df[vec_col]))
        keep = np.zeros(len(df), dtype=bool)
        for bucketer, probe_sigs in tables:
            sigs = bucketer.signature(m)
            keep |= np.isin(sigs, np.fromiter(probe_sigs, dtype=np.uint64,
                                              count=len(probe_sigs)))
        return df[keep]

    cand = ds.map_batches(candidates, batch_format="pandas")
    return brute_force_topk(cand, query, k, id_col, vec_col,
                            exclude_ids=exclude_ids)


def _probe_flip_sets(order: np.ndarray, num_probes: int):
    """Enumerate ``num_probes`` DISTINCT plane-flip combinations, cheapest
    first: no flip, then single flips in ascending-margin order, then
    pairs, triples, ... — every probe yields a unique bucket signature
    (capped at the 2^planes distinct signatures that exist)."""
    from itertools import combinations

    count = 0
    for r in range(len(order) + 1):
        for combo in combinations(range(len(order)), r):
            yield tuple(order[i] for i in combo)
            count += 1
            if count >= num_probes:
                return


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the k-means-bucketed scale path
# ---------------------------------------------------------------------------

def kmeans_centroids(sample: np.ndarray, nlist: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Spherical k-means over a (normalized) sample -> (nlist, dim)
    unit centroids. Deterministic: seeded init, fixed iteration count.
    Runs on the driver over a BOUNDED sample (IVF training is
    sample-based by construction; the full corpus never comes here)."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def build_ivf_index(ds, nlist: int = 16, train_sample: int = 4096,
                    seed: int = 42, vec_col: str = "embedding",
                    list_col: str = "__ivf_list"):
    """Train + assign ONCE, serve many queries: driver k-means over a
    bounded sample -> broadcast centroids -> one stateless pass stamps
    each row's inverted-list id -> materialized indexed Dataset.
    Returns ``(centroids, indexed_ds)``; feed both to :func:`ivf_topk`
    so per-query work is just probe-filter + partial top-k (no
    re-assignment scan)."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    centroids = kmeans_centroids(_as_matrix(sample[vec_col]), nlist,
                                 seed=seed)
    cent_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{list_col: pd.Series(dtype="int64")})
        cent = ray.get(cent_ref)
        lists = (_normalize(_as_matrix(df[vec_col])) @ cent.T) \
            .argmax(axis=1)
        return df.assign(**{list_col: lists.astype(np.int64)})

    indexed = ds.map_batches(assign,
                             batch_format="pandas").materialize()
    return centroids, indexed


def ivf_topk(ds, query: np.ndarray, k: int = 10, nlist: int = 16,
             nprobe: int = 4, train_sample: int = 4096, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: Optional[np.ndarray] = None,
             list_col: str = "__ivf_list",
             exclude_ids: Optional[set] = None) -> pd.DataFrame:
    """Approximate cosine top-k via an inverted-file index: vectors are
    assigned to their nearest of ``nlist`` k-means centroids, the query
    probes only its ``nprobe`` nearest lists.

    Scale shape: train on a bounded sample (driver k-means), broadcast
    the (nlist x dim) centroid matrix once with ``ray.put``, then ONE
    stateless ``map_batches`` pass does assign + probe-filter + partial
    top-k per block — no shuffle; the driver merges blocks x k rows.
    ``nprobe == nlist`` degenerates to the exact brute-force result
    (guarded by test). For repeated queries, pass the output of
    :func:`build_ivf_index` (``centroids`` + the indexed ``ds``): rows
    already carrying ``list_col`` skip the assignment matmul and only
    probe-filter."""
    import ray

    pre_assigned = ds.schema() is not None and \
        list_col in (ds.schema().names or [])
    if centroids is None:
        if pre_assigned:
            raise ValueError("pre-assigned index requires the centroids "
                             "returned by build_ivf_index")
        sample = ds.limit(train_sample).to_pandas()
        centroids = kmeans_centroids(_as_matrix(sample[vec_col]), nlist,
                                     seed=seed)
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    probe_lists = np.sort(np.argsort(-(q @ centroids.T).ravel())[:nprobe])

    if pre_assigned:
        candidates = ds.map_batches(
            lambda df: df[np.isin(df[list_col].to_numpy(), probe_lists)]
            .drop(columns=[list_col]),
            batch_format="pandas")
        return brute_force_topk(candidates, query, k, id_col, vec_col,
                                exclude_ids=exclude_ids)

    cent_ref = ray.put(centroids)

    def probe_filter(df: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(cent_ref)
        if df.empty:
            return df
        lists = (_normalize(_as_matrix(df[vec_col])) @ cent.T).argmax(axis=1)
        return df[np.isin(lists, probe_lists)]

    # candidates then the shared exact scorer (same shape as lsh_topk:
    # exact-parity when nprobe == nlist falls out by construction)
    candidates = ds.map_batches(probe_filter, batch_format="pandas")
    return brute_force_topk(candidates, query, k, id_col, vec_col,
                            exclude_ids=exclude_ids)


def hard_negative_topk(ds, k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding", label_col: str = "label",
                       max_corpus_rows: int = 200_000) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: for EVERY anchor
    vector, the ``k`` most cosine-similar vectors carrying a DIFFERENT
    label (similarity rounded to 6 decimals BEFORE ranking, ties broken
    by ascending neighbor id — the round-before-rank rule shared with
    tfidf/kmeans so the SQL oracle agrees bit-for-bit).

    Shape: the candidate side is collected once into three plain numpy
    arrays (ids, labels, normalized matrix) and broadcast with ONE
    ``ray.put`` — numpy arrays are zero-copy out of plasma, so the
    per-batch ``ray.get`` costs nothing (the pandas-Series deserialization
    trap ADVICE flagged on tfidf does not apply).  Anchors then STREAM
    through one shuffle-free ``map_batches`` pass: a (B x N) block matmul,
    same-label/self masking, and a stable argsort whose column order is
    the id-sorted corpus — so ``kind="stable"`` IS the ascending-id
    tie-break, no per-row lexsort loop.

    Like :func:`embedding_near_dup`, the broadcast-everything candidate
    side is the declared capped tier (``max_corpus_rows`` aborts past the
    cap, naming the scale path): at corpus scale, mine negatives per
    IVF cell — :func:`build_ivf_index` the corpus, probe each anchor's
    nearest foreign-label cells, and run this same masked-matmul kernel
    per (anchor block x probed cell), which bounds N to the cell size.
    """
    import ray

    ids: List = []
    labels: List = []
    mats: List[np.ndarray] = []
    n_seen = 0
    for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        n_seen += len(batch)
        if n_seen > max_corpus_rows:
            raise ValueError(
                f"hard_negative_topk broadcasts the whole candidate side "
                f"and is capped at max_corpus_rows={max_corpus_rows}; for "
                f"larger corpora mine per IVF cell (see docstring) or "
                f"raise the cap explicitly.")
        ids.extend(batch[id_col].tolist())
        labels.extend(batch[label_col].tolist())
        mats.append(_normalize(_as_matrix(batch[vec_col])))
    cols = [id_col, "neg_id", "neg_rank", "cos_sim"]
    if not mats:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "neg_id": pd.Series(dtype="int64"),
                             "neg_rank": pd.Series(dtype="int64"),
                             "cos_sim": pd.Series(dtype="float64")})
    order = np.argsort(np.asarray(ids), kind="stable")
    corpus_ids = np.asarray(ids)[order]
    corpus_labels = np.asarray(labels)[order]
    corpus_m = np.concatenate(mats, axis=0)[order]
    ref = ray.put((corpus_ids, corpus_labels, corpus_m))

    def mine(df: pd.DataFrame) -> pd.DataFrame:
        c_ids, c_labels, c_m = ray.get(ref)
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols[:3]}
                                ) .assign(cos_sim=pd.Series(dtype="float64"))
        a_m = _normalize(_as_matrix(df[vec_col]))
        sims = np.round(a_m @ c_m.T, 6)                     # (B, N)
        a_labels = df[label_col].to_numpy()
        a_ids = df[id_col].to_numpy()
        sims[a_labels[:, None] == c_labels[None, :]] = -np.inf
        sims[a_ids[:, None] == c_ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        # stable argsort on -sims: equal (rounded) sims keep column
        # order, and columns are id-ascending by construction
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(len(df)), kk)
        flat = top.ravel()
        keep = np.isfinite(sims[rows, flat])
        out = pd.DataFrame({
            id_col: a_ids[rows][keep],
            "neg_id": c_ids[flat][keep],
            "neg_rank": (np.tile(np.arange(1, kk + 1), len(df)))[keep],
            "cos_sim": sims[rows, flat][keep]})
        return out

    out = ds.map_batches(mine, batch_format="pandas").to_pandas()
    for c in (id_col, "neg_id", "neg_rank"):
        out[c] = out[c].astype("int64")
    out["cos_sim"] = out["cos_sim"].astype("float64")
    return out.sort_values([id_col, "neg_rank"]).reset_index(drop=True)
