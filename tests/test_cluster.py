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
