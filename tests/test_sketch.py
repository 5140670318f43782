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


def test_hll_error_bound_across_cardinalities():
    from fastobo_py_ray.stages.sketch import _hll_registers, hll_estimate

    rng = np.random.RandomState(7)
    for true_n in (50, 1000, 30000, 500000):
        vals = rng.randint(0, 1 << 62, size=true_n)
        td = len(np.unique(vals))
        est = hll_estimate(_hll_registers(vals))
        # p=12 -> ~1.6% std error; 5% is > 3 sigma
        assert abs(est - td) / td <= 0.05, (true_n, td, est)


def test_hll_merge_equals_single_pass():
    from fastobo_py_ray.stages.sketch import (_hll_registers, hll_estimate,
                                              hll_merge)

    vals = np.arange(100000)
    whole = _hll_registers(vals)
    parts = hll_merge([_hll_registers(c) for c in np.array_split(vals, 13)])
    assert np.array_equal(whole, parts)  # register-exact, not just close
    assert hll_estimate(parts) == hll_estimate(whole)


def test_approx_distinct_grouped(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.sketch import approx_distinct

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 50000),
        "u": np.concatenate([rng.randint(0, 20000, 50000),
                             rng.randint(0, 300, 50000)])})
    ds = rd.from_pandas(df).repartition(8)
    out = approx_distinct(ds, "u", by="g")
    exact = df.groupby("g")["u"].nunique()
    for _, row in out.iterrows():
        t = exact[row["g"]]
        assert abs(row["n_distinct_approx"] - t) / t <= 0.05, (row, t)


def test_mg_guarantee_and_exact_regime(ray_session):
    """Misra-Gries: (a) with capacity >= vocabulary it is exact; (b) in
    the lossy regime every value with frequency > N/(capacity+1) still
    surfaces and estimates are lower bounds."""
    import ray.data as rd

    from fastobo_py_ray.stages.sketch import heavy_hitters

    rng = np.random.RandomState(11)
    # skewed stream: 3 heavy values + long uniform tail
    heavy = np.repeat([900001, 900002, 900003], [30000, 20000, 15000])
    tail = rng.randint(0, 50000, size=60000)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    ds = rd.from_pandas(df).repartition(8)

    exact = df["v"].value_counts()
    big = heavy_hitters(ds, "v", k=5, capacity=200000)
    assert big.iloc[0]["est_count"] == exact.iloc[0]  # exact regime

    cap = 500
    lossy = heavy_hitters(ds, "v", k=5, capacity=cap)
    got = dict(zip(lossy["value"], lossy["est_count"]))
    n = len(vals)
    for hv in (900001, 900002, 900003):
        assert exact[hv] > n / (cap + 1)
        assert hv in got, (hv, lossy)
        assert got[hv] <= exact[hv]  # lower bound


def test_bloom_no_false_negatives_and_fpr():
    import numpy as np

    from fastobo_py_ray.stages.sketch import (bloom_bits, bloom_contains,
                                              bloom_merge)

    vals = np.array([f"key-{i}" for i in range(50_000)])
    w = bloom_bits(vals, 1 << 20, 4)
    assert bloom_contains(vals, w, 4).all()  # NEVER a false negative
    fresh = np.array([f"new-{i}" for i in range(50_000)])
    fpr = float(bloom_contains(fresh, w, 4).mean())
    theory = (1 - np.exp(-4 * 50_000 / (1 << 20))) ** 4
    assert fpr <= 3 * theory + 1e-4
    # associative merge == single build
    w2 = bloom_merge([bloom_bits(vals[:25_000], 1 << 20, 4),
                      bloom_bits(vals[25_000:], 1 << 20, 4)])
    assert (w2 == w).all()


def test_dedup_against_exact_flags(ray_session):
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dedup_against

    seen = rd.from_pandas(pd.DataFrame(
        {"text": ["alpha beta", "gamma delta", "epsilon"]}))
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta", "fresh text", "epsilon", "other"]}))
    out = dedup_against(new, seen).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out["dup"].tolist() == [True, False, True, False]
    # dup rows must also be bloom hits (no false negatives end-to-end)
    assert out.loc[out["dup"], "bloom_hit"].all()


def test_dedup_against_prunes_bloom_false_positives(ray_session):
    """A deliberately tiny bitmap forces Bloom false positives; the
    exact verify join must still leave `dup` correct."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dedup_against

    seen = rd.from_pandas(pd.DataFrame(
        {"text": [f"seen-{i}" for i in range(200)]}))
    new_df = pd.DataFrame({
        "doc_id": range(300),
        "text": [f"unseen-{i}" for i in range(300)]})
    out = dedup_against(rd.from_pandas(new_df), seen,
                        m_bits=256, k=2).to_pandas()
    assert len(out) == 300
    assert not out["dup"].any()          # exact despite saturation
    assert out["bloom_hit"].any()        # the tiny filter DID lie


def test_dedup_against_parity_vs_exact_set_membership(ray_session):
    """Randomized-shape parity: dup flags must equal exact set
    membership for every row, including texts duplicated WITHIN the
    new side and a bitmap small enough to generate false positives."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dedup_against

    seen_texts = [f"t{j}" for j in range(0, 150, 2)] + \
        [f"only-seen-{j}" for j in range(40)]
    new_texts = [f"t{i % 90}" for i in range(300)] + \
        [f"only-new-{i}" for i in range(200)]
    seen = rd.from_pandas(pd.DataFrame({"text": seen_texts}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(new_texts)), "text": new_texts}))
    out = dedup_against(new, seen, m_bits=1024, k=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(new_texts)
    truth = [t in set(seen_texts) for t in new_texts]
    assert out["dup"].tolist() == truth
    # bloom hits are a superset of true dups
    assert (out["bloom_hit"] | ~out["dup"]).all()


def test_dedup_against_string_ids(ray_session):
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dedup_against

    seen = rd.from_pandas(pd.DataFrame({"text": ["aa", "bb"]}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": ["x1", "x2", "x3"],
         "text": ["aa", "cc", "bb"]}))
    out = dedup_against(new, seen, id_kind="string").to_pandas() \
        .set_index("doc_id").sort_index()
    assert out["dup"].tolist() == [True, False, True]
    assert out.index.tolist() == ["x1", "x2", "x3"]


def test_cms_never_underestimates_and_bounds_error():
    import numpy as np

    from fastobo_py_ray.stages.sketch import (cms_counts, cms_merge,
                                              cms_query)

    # zipf-ish: token-i appears ~50k/(i+1) times
    vals = np.concatenate([
        np.repeat(f"tok-{i}", 50_000 // (i + 1)) for i in range(200)])
    true = {f"tok-{i}": 50_000 // (i + 1) for i in range(200)}
    width, depth = 1 << 12, 4
    m = cms_merge([cms_counts(vals[:100_000], width, depth),
                   cms_counts(vals[100_000:], width, depth)])
    assert (m == cms_counts(vals, width, depth)).all()  # merge == build
    probe = np.array(list(true))
    est = cms_query(probe, m)
    t = np.array([true[p] for p in probe])
    assert (est >= t).all()                    # never an underestimate
    # standard bound: overestimate <= (e/width) * N, here with slack 3x
    assert (est - t).max() <= 3 * np.e / width * len(vals)
