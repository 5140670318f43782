"""Quantile sketch: compression/merge invariants and rank-error bound
vs exact quantiles."""

import numpy as np
import pandas as pd


def _rank_error(data: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(np.sort(data), est) / len(data) - q)


def test_compress_preserves_weight_and_order():
    from fastobo_py_ray.stages.sketch import compress

    rng = np.random.RandomState(0)
    vals = rng.normal(size=10000)
    v, w = compress(vals, np.ones_like(vals), 128)
    assert len(v) <= 128
    assert w.sum() == 10000
    assert (np.diff(v) >= 0).all()


def test_merge_associative_rank_error():
    from fastobo_py_ray.stages.sketch import compress, merge, quantiles

    rng = np.random.RandomState(1)
    # multimodal: the regime where naive sampling misses mass
    data = np.concatenate([rng.normal(0, 1, 40000),
                           rng.normal(50, 5, 20000),
                           rng.exponential(3, 40000)])
    chunks = np.array_split(data, 37)
    s = merge([compress(c, np.ones_like(c)) for c in chunks])
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = quantiles(s, [q])[0]
        assert _rank_error(data, est, q) <= 0.02, (q, est)


def test_approx_quantiles_grouped(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.sketch import approx_quantiles

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 20000),
        "x": np.concatenate([rng.normal(0, 1, 20000),
                             rng.exponential(2, 20000)])})
    ds = rd.from_pandas(df).repartition(8)
    out = approx_quantiles(ds, "x", [0.25, 0.5, 0.95], by="g")
    assert len(out) == 6
    for g, sub in df.groupby("g"):
        data = sub["x"].to_numpy()
        for _, row in out[out.g == g].iterrows():
            assert _rank_error(data, row["value"], row["q"]) <= 0.02

    # ungrouped path
    out2 = approx_quantiles(ds, "x", [0.5])
    assert list(out2.columns) == ["q", "value"]
    assert _rank_error(df["x"].to_numpy(), out2["value"][0], 0.5) <= 0.02
