"""Distributed k-means (stages/cluster.py): the engine's streaming
partial-sum Lloyd must be value-identical to a single-process numpy
mirror with the same determinism contract (md5-order init, lowest-index
tie break), and must honor Lloyd's monotonicity."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001/embeddings.parquet"


def _numpy_mirror(df: pd.DataFrame, k: int, iters: int):
    from fastobo_py_ray.stages.ann import _as_matrix
    from fastobo_py_ray.stages.cluster import _assign

    m = _as_matrix(df["embedding"])
    ids = df["vec_id"].to_numpy()
    h = np.array([hashlib.md5(str(v).encode()).hexdigest() for v in ids])
    cent = m[np.argsort(h, kind="stable")[:k]].copy()
    for _ in range(iters):
        a, _ = _assign(m, cent)
        for j in range(k):
            if (a == j).any():
                cent[j] = m[a == j].mean(axis=0)
    a, _ = _assign(m, cent)
    return cent, pd.DataFrame({"vec_id": ids, "cluster": a}) \
        .sort_values("vec_id").reset_index(drop=True)


def test_kmeans_matches_numpy_mirror_and_is_monotone(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.cluster import kmeans

    ds = rd.read_parquet(SF)
    cent, assign, hist = kmeans(ds, k=10, iters=5)
    got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)

    ref_cent, ref = _numpy_mirror(pd.read_parquet(SF), k=10, iters=5)
    assert (got["cluster"].to_numpy() == ref["cluster"].to_numpy()).all()
    assert np.allclose(cent, ref_cent, atol=1e-8)
    # Lloyd's: inertia never increases
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    # every cluster id in range
    assert got["cluster"].between(0, 9).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """Duplicate seed points leave one centroid member-less after the
    first assignment (ties break to the lowest index); the empty
    cluster must keep its previous centroid, never go NaN."""
    import ray.data as rd

    from fastobo_py_ray.stages.cluster import kmeans

    df = pd.DataFrame({
        "vec_id": [1, 2, 3, 4],
        "embedding": [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0],
                      [10.0, 10.0]]})
    cent, assign, hist = kmeans(rd.from_pandas(df), k=3, iters=3)
    assert not np.isnan(cent).any()
    a = assign.to_pandas()
    assert set(a["cluster"]) <= {0, 1, 2}


def test_kmeans_k_exceeding_rows_raises(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.cluster import kmeans

    df = pd.DataFrame({"vec_id": [1, 2],
                       "embedding": [[0.0, 1.0], [1.0, 0.0]]})
    with pytest.raises(ValueError):
        kmeans(rd.from_pandas(df), k=5, iters=1)


def test_semantic_dedup_in_cluster_exact_sound_complete(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.ann import _as_matrix, _normalize
    from fastobo_py_ray.stages.cluster import semantic_dedup

    thr = 0.4
    ds = rd.read_parquet(SF)
    out = semantic_dedup(ds, k=10, iters=5, threshold=thr).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    df = pd.read_parquet(SF).sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(df)
    m = _normalize(_as_matrix(df["embedding"]))
    ids = df["vec_id"].to_numpy()
    pos = {v: i for i, v in enumerate(ids)}

    dropped = 0
    for cid, g in out.groupby("cluster"):
        rows = [pos[v] for v in g["vec_id"]]
        sub = m[rows]
        sims = np.round(sub @ sub.T, 6)
        keep = g["keep"].to_numpy()
        # mirror the greedy keep-first rule exactly
        ref = np.zeros(len(g), dtype=bool)
        kept = []
        for i in range(len(g)):
            if not kept or sims[i, kept].max() < thr:
                ref[i] = True
                kept.append(i)
        assert (keep == ref).all()
        # soundness: every dropped row is >= thr to a kept LOWER id
        for i in np.where(~keep)[0]:
            assert sims[i, :i][keep[:i]].max() >= thr
        # completeness: kept rows pairwise < thr within the cluster
        ki = np.where(keep)[0]
        if len(ki) > 1:
            kk = sims[np.ix_(ki, ki)]
            np.fill_diagonal(kk, 0)
            assert kk.max() < thr
        dropped += int((~keep).sum())
    assert dropped > 0  # threshold 0.4 does prune on this corpus


def test_semantic_dedup_drops_exact_duplicates(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.cluster import semantic_dedup

    df = pd.DataFrame({
        "vec_id": [1, 2, 3, 4, 5, 6],
        "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0],
                      [-1.0, 0.5], [0.5, -1.0]]})
    out = semantic_dedup(rd.from_pandas(df), k=2, iters=2,
                         threshold=0.99).to_pandas() \
        .set_index("vec_id")["keep"]
    assert bool(out[1]) and not bool(out[2])
    assert bool(out[3]) and not bool(out[4])


def test_logreg_matches_numpy_mirror_and_loss_decreases(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.ann import _as_matrix
    from fastobo_py_ray.stages.cluster import logreg_fit

    SF_E = "/root/testdata/sf0.001/embeddings.parquet"
    ds = rd.read_parquet(SF_E)
    w, b, losses = logreg_fit(ds, iters=10, lr=0.5, pos_labels=range(5))

    df = pd.read_parquet(SF_E)
    X = _as_matrix(df["embedding"])
    y = df["label"].isin(range(5)).to_numpy().astype("float64")
    wm = np.zeros(X.shape[1])
    bm = 0.0
    ref_losses = []
    for _ in range(10):
        z = X @ wm + bm
        p = 1.0 / (1.0 + np.exp(-z))
        ref_losses.append(float(np.mean(np.logaddexp(0.0, z) - y * z)))
        wm -= 0.5 * (X.T @ (p - y)) / len(y)
        bm -= 0.5 * float((p - y).sum()) / len(y)
    assert np.allclose(w, wm, atol=1e-9)
    assert abs(b - bm) < 1e-9
    assert np.allclose(losses, ref_losses, atol=1e-9)
    # full-batch GD with conservative lr: loss strictly decreases
    assert all(losses[i + 1] < losses[i] for i in range(len(losses) - 1))
    assert losses[-1] < np.log(2)  # better than the zero model
