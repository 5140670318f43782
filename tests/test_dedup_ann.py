"""Dedup suite + similarity-search tests (exactness vs brute force, LSH
recall, determinism)."""

import numpy as np
import pandas as pd

from fastobo_py_ray.stages.ann import brute_force_topk, lsh_topk
from fastobo_py_ray.stages.dedup import (embedding_near_dup, jaccard,
                                         minhash_signature, _minhash_params,
                                         ngram_jaccard_pairs, shingles,
                                         simhash64)


def _clustered_vectors(n=400, dim=32, seed=3):
    """A few tight clusters + noise so top-k/near-dup is non-trivial."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(8, dim))
    rows = []
    for i in range(n):
        c = centers[i % 8]
        rows.append(c + 0.05 * rng.normal(size=dim))
    return rows


def test_minhash_estimates_jaccard():
    params = _minhash_params(256)
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    sa = minhash_signature(a, 256, params)
    sb = minhash_signature(b, 256, params)
    est = float((sa == sb).mean())
    true = jaccard(a, b)
    assert abs(est - true) < 0.15


def test_ngram_jaccard_pairs_exact(ray_session):
    import ray.data as rd

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon zeta",          # exact dup of 1
        3: "alpha beta gamma delta epsilon eta",           # near dup
        4: "completely different words entirely here now",
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    # brute-force check against the pure jaccard()
    expect = {}
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jv = round(jaccard(texts[ids[i]], texts[ids[j]]), 6)
            if jv >= 0.5:
                expect[(ids[i], ids[j])] = jv
    assert got == expect
    assert got[(1, 2)] == 1.0


def test_ngram_jaccard_max_doc_freq_is_subset(ray_session):
    """The stop-gram cap yields a subset of the exact pairs (jaccard is a
    lower bound when common shingles are dropped)."""
    import ray.data as rd

    texts = {i: "common words here plus item %d unique tail" % (i % 3)
             for i in range(1, 9)}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    exact = ngram_jaccard_pairs(ds, threshold=0.3).to_pandas()
    capped = ngram_jaccard_pairs(ds, threshold=0.3,
                                 max_doc_freq=3).to_pandas()
    e = {(a, b) for a, b in zip(exact["doc_a"], exact["doc_b"])}
    c = {(a, b) for a, b in zip(capped["doc_a"], capped["doc_b"])}
    assert c <= e
    # identical docs (same i%3 class) still pair via their rare tail
    # shingles; cross-class pairs (held together only by the ubiquitous
    # prefix shingles) are the ones the stop-gram cap drops
    assert len(c) > 0 and len(c) < len(e)


def test_lsh_topk_recall(ray_session):
    import ray.data as rd

    vecs = _clustered_vectors()
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    ds = rd.from_pandas(df).repartition(4)
    q = vecs[0]
    exact = brute_force_topk(ds, np.asarray(q), k=10,
                             exclude_ids={0})["vec_id"].tolist()
    approx = lsh_topk(ds, np.asarray(q), k=11,
                      num_probes=8)["vec_id"].tolist()
    approx = [v for v in approx if v != 0][:10]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (exact, approx)

    # seed-union: with several independent tables a candidate only needs
    # ONE table to hit, so recall can never drop below the single-table
    # configuration's floor (and the union contains its candidates)
    multi = lsh_topk(ds, np.asarray(q), k=11, num_probes=8,
                     num_tables=3)["vec_id"].tolist()
    multi = [v for v in multi if v != 0][:10]
    assert len(set(exact) & set(multi)) / 10 >= recall - 1e-9


def test_embedding_near_dup_matches_brute(ray_session):
    import ray.data as rd

    vecs = _clustered_vectors(n=120)
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    out = embedding_near_dup(rd.from_pandas(df).repartition(3),
                             threshold=0.99)
    m = np.stack(vecs)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    ia, ib = np.where(np.triu(sims, k=1) >= 0.99)
    expect = {(int(i), int(j)) for i, j in zip(ia, ib)}
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert got == expect and len(expect) > 0


def test_embedding_near_dup_lsh_recall(ray_session):
    """Bucketed (distributed) near-dup recovers most of the exact pairs
    on clustered vectors; everything it returns is a true pair."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import embedding_near_dup_lsh

    vecs = _clustered_vectors(n=200)
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    ds = rd.from_pandas(df).repartition(4)
    exact = embedding_near_dup(ds, threshold=0.99)
    approx = embedding_near_dup_lsh(ds, threshold=0.99,
                                    num_planes=4).to_pandas()
    e = {(int(a), int(b)) for a, b in zip(exact["id_a"], exact["id_b"])}
    g = {(int(a), int(b)) for a, b in zip(approx["id_a"], approx["id_b"])}
    assert g <= e                      # no false positives
    assert len(g) / max(1, len(e)) >= 0.5, (len(g), len(e))


def test_simhash_near_texts_close():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("entirely unrelated content about parquet files")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_shingles_edges():
    assert shingles("") == []
    assert shingles("one two") == ["one two"]
    assert shingles("a b c d") == ["a b c", "b c d"]


def _neardup_corpus():
    """Docs 1/2/3 near-dups (one cluster), 10/11 near-dups (rep ordering
    must be numeric-safe: '10' > '9' as strings), 4/9 singles."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    return {
        1: base,
        2: base.replace("dog", "cat"),
        3: base.replace("again and", "again or"),
        4: "completely different words entirely here now for this one doc",
        9: "another unrelated document with its very own distinct wording",
        10: "shared tail words one two three four five six seven eight nine",
        11: "shared tail words one two three four five six seven eight ten",
    }


def test_minhash_dedup_matches_driver_union_find(ray_session):
    """Distributed verify (hash_join) + clustering (connected_components)
    must equal the driver-side oracle: per-pair jaccard verify + exact
    union_find with the numeric-safe (len, str) representative order."""
    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import union_find
    from fastobo_py_ray.stages.dedup import (minhash_candidate_pairs,
                                             minhash_dedup)

    texts = _neardup_corpus()
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))

    got = minhash_dedup(ds, jaccard_threshold=0.5).to_pandas()
    assert got["doc_id"].dtype.kind == "i"  # original dtype preserved

    cand = minhash_candidate_pairs(ds).to_pandas()
    edges = [(str(a), str(b)) for a, b in zip(cand["doc_a"], cand["doc_b"])
             if jaccard(texts[a], texts[b]) >= 0.5]
    reps = union_find(edges, key=lambda s: (len(s), s))
    want = sorted({(int(n), int(r)) for n, r in reps.items()} |
                  {(int(r), int(r)) for r in reps.values()})
    assert sorted(zip(got["doc_id"], got["cluster_rep"])) == want
    assert len(want) > 2  # the corpus really produced clusters


def test_minhash_bucket_cap_bounds_pairs(ray_session):
    """An adversarial corpus where every doc shares one degenerate band
    bucket must not emit O(m^2) pairs once capped; the cap must leave
    normal near-dup recall intact (true dups share multiple buckets)."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import minhash_candidate_pairs

    # empty texts -> identical (sentinel) signatures -> one giant bucket
    n = 40
    adv = pd.DataFrame({"doc_id": range(n), "text": [""] * n})
    ds = rd.from_pandas(adv)
    uncapped = minhash_candidate_pairs(ds).to_pandas()
    assert len(uncapped) == n * (n - 1) // 2
    # oversized bucket degrades to O(m) star edges (hub = min id), so
    # the hot cluster stays CONNECTED instead of silently vanishing
    capped = minhash_candidate_pairs(ds, max_bucket_size=10).to_pandas()
    assert len(capped) == n - 1
    assert set(capped["doc_a"]) == {0}
    assert set(capped["doc_b"]) == set(range(1, n))

    # normal corpus: the cap (well above real bucket sizes) changes nothing
    texts = _neardup_corpus()
    ds2 = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    a = minhash_candidate_pairs(ds2).to_pandas()
    b = minhash_candidate_pairs(ds2, max_bucket_size=1000).to_pandas()
    assert sorted(zip(a["doc_a"], a["doc_b"])) == \
        sorted(zip(b["doc_a"], b["doc_b"]))
    assert len(a) > 0


def test_minhash_dedup_clusters_hot_identical_docs(ray_session):
    """A boilerplate cluster LARGER than max_bucket_size (identical text,
    so every band bucket is degenerate) must still come out as one full
    cluster via the star edges — the pre-star behavior dropped it
    entirely (ADVICE r2)."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import minhash_dedup

    boiler = "copyright notice all rights reserved please subscribe " \
             "to our newsletter for updates terms of service apply"
    uniq = ["completely different document number %d about topic %s"
            % (i, "abcdefgh"[i % 8]) for i in range(6)]
    df = pd.DataFrame({
        "doc_id": range(12 + len(uniq)),
        "text": [boiler] * 12 + uniq})
    out = minhash_dedup(rd.from_pandas(df).repartition(3),
                        max_bucket_size=4).to_pandas()
    members = set(out.loc[out["cluster_rep"] == 0, "doc_id"])
    assert members == set(range(12))
    assert not (set(out["doc_id"]) & set(range(12, 12 + len(uniq))))


def test_minhash_dedup_string_ids(ray_session):
    """Non-numeric ids flow through verify/clustering without casts."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import minhash_dedup

    texts = _neardup_corpus()
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [f"doc-{i}" for i in texts],
         "text": list(texts.values())}))
    got = minhash_dedup(ds, jaccard_threshold=0.5).to_pandas()
    assert got["doc_id"].dtype == object
    assert all(isinstance(v, str) for v in got["doc_id"])
    clusters = set(zip(got["doc_id"], got["cluster_rep"]))
    assert ("doc-2", "doc-1") in clusters and ("doc-1", "doc-1") in clusters


def test_embedding_near_dup_max_rows_guard(ray_session):
    import pytest
    import ray.data as rd

    vecs = _clustered_vectors(n=50)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": range(50), "embedding": [list(v) for v in vecs]}))
    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup(ds, threshold=0.9, max_rows=10)


def test_probe_flip_sets_distinct():
    """num_probes requested -> num_probes DISTINCT signatures (the old
    bit-count scheme collapsed 8 probes into 3 buckets)."""
    from fastobo_py_ray.stages.ann import _probe_flip_sets

    order = np.array([3, 0, 5, 1, 4, 2])
    flips = list(_probe_flip_sets(order, 8))
    assert len(flips) == 8
    assert len(set(flips)) == 8
    # applying each flip set to a base signature yields distinct buckets
    base = np.array([True, False, True, True, False, False])
    sigs = set()
    for fs in flips:
        bits = base.copy()
        for b in fs:
            bits[b] = not bits[b]
        sigs.add(tuple(bits))
    assert len(sigs) == 8


def test_ivf_topk_recall_and_exact_degeneration(ray_session):
    import numpy as np
    import ray.data as rd

    from fastobo_py_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(5)
    # clustered vectors (IVF's favorable and intended regime)
    centers = rng.normal(size=(8, 32)) * 3
    vecs = np.vstack([centers[i % 8] + rng.normal(size=32) * 0.3
                      for i in range(400)])
    df = pd.DataFrame({"vec_id": range(400),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)
    q = vecs[3] + rng.normal(size=32) * 0.1

    exact = brute_force_topk(ds, q, k=10)
    approx = ivf_topk(ds, q, k=10, nlist=8, nprobe=2, seed=7)
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.8, recall

    # nprobe == nlist scans every list -> exact parity
    full = ivf_topk(ds, q, k=10, nlist=8, nprobe=8, seed=7)
    pd.testing.assert_frame_equal(full, exact)


def test_exact_dedup_string_ids(ray_session):
    """String doc ids take the factor-code grouped-min path (pandas'
    per-group object min is a Python fallback) — winners identical to
    the pandas oracle."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [f"d{i:03d}" for i in range(30)],
        "text": [f"t{i % 7}" for i in range(30)]})
    got = exact_dedup(rd.from_pandas(df).repartition(4)).to_pandas()
    want = df.groupby("text", as_index=False).agg(
        doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
    m = got.merge(want, on="doc_id", suffixes=("_g", "_w"))
    assert len(m) == 7 and (m.n_copies_g == m.n_copies_w).all()


def test_minhash_dedup_snowflake_scale_ids(ray_session):
    """int64 ids above 2^53 survive the verify join exactly (pair keys
    travel as length-prefixed strings, never through a float widening
    round-trip)."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    big = 2**53
    texts = {big + 1: base, big + 3: base.replace("dog", "cat"),
             big + 5: "completely different words entirely here now ok"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    got = minhash_dedup(ds, jaccard_threshold=0.5).to_pandas()
    assert got["doc_id"].dtype.kind == "i"
    assert set(got["doc_id"]) == {big + 1, big + 3}
    assert set(got["cluster_rep"]) == {big + 1}


def test_ivf_index_reuse_matches_fresh(ray_session):
    """build_ivf_index + repeated queries == per-query fresh index
    (assignments computed once; each query only probe-filters)."""
    import numpy as np
    import ray.data as rd

    from fastobo_py_ray.stages.ann import build_ivf_index, ivf_topk

    rng = np.random.RandomState(9)
    centers = rng.normal(size=(8, 32)) * 3
    vecs = np.vstack([centers[i % 8] + rng.normal(size=32) * 0.3
                      for i in range(300)])
    df = pd.DataFrame({"vec_id": range(300),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)

    cents, indexed = build_ivf_index(ds, nlist=8, seed=7)
    for qi in (3, 17, 101):
        q = vecs[qi]
        fresh = ivf_topk(ds, q, k=5, nlist=8, nprobe=3, seed=7)
        reused = ivf_topk(indexed, q, k=5, nprobe=3, centroids=cents)
        pd.testing.assert_frame_equal(fresh, reused)

    import pytest
    with pytest.raises(ValueError, match="centroids"):
        ivf_topk(indexed, vecs[0], k=5)


def test_passage_dedup_keep_first_and_reassembly(ray_session):
    """Global keep-first at passage granularity: the duplicated window
    survives only in the smallest (doc_id, idx); documents reassemble
    from their surviving windows in order."""
    import ray.data as rd
    from fastobo_py_ray.stages.dedup import passage_dedup

    boiler = " ".join(f"b{i}" for i in range(4))      # shared 4-word block
    uniq = [" ".join(f"u{d}w{i}" for i in range(4)) for d in range(3)]
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            boiler + " " + uniq[0],       # doc 0: boiler @ idx0 (kept)
            uniq[1] + " " + boiler,       # doc 1: boiler @ idx1 (dropped)
            boiler,                       # doc 2: only boiler (dropped)
            uniq[2],                      # doc 3: untouched
        ],
    })
    out = passage_dedup(rd.from_pandas(df), passage_words=4,
                        num_buckets=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        boiler + " " + uniq[0], uniq[1], "", uniq[2]]
    assert out["n_passages"].tolist() == [2, 2, 1, 1]
    assert out["n_removed"].tolist() == [0, 1, 1, 0]


def test_passage_dedup_noop_on_unique_corpus(ray_session):
    """No shared windows -> byte-identical texts back, nothing removed."""
    import ray.data as rd
    from fastobo_py_ray.stages.dedup import passage_dedup

    texts = [" ".join(f"d{d}w{i}" for i in range(10)) for d in range(6)]
    df = pd.DataFrame({"doc_id": range(6), "text": texts})
    out = passage_dedup(rd.from_pandas(df), passage_words=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == texts
    assert (out["n_removed"] == 0).all()
    assert out["n_passages"].tolist() == [3] * 6  # 10 words -> 4+4+2


def test_q_dedup_best_keeps_max_quality_per_cluster(ray_session):
    """Every cluster keeps exactly one member: the max-quality doc
    (tie -> lowest id); singletons always keep."""
    from fastobo_py_ray.pipelines.queries import q_dedup_best

    out = q_dedup_best("/root/testdata/sf0.001")
    g = out.groupby("cluster_rep")
    assert (g["keep"].sum() == 1).all()
    for _, sub in g:
        best = sub.sort_values(["quality_score", "doc_id"],
                               ascending=[False, True]).iloc[0]
        kept = sub[sub["keep"]].iloc[0]
        assert kept["doc_id"] == best["doc_id"]
    # multi-member clusters exist on this corpus (the rule is exercised)
    assert (g.size() > 1).any()


def test_simhash_pairs_exact_at_low_hamming(ray_session):
    """Banded simhash retrieval is EXACT for hamming <= bands-1
    (pigeonhole): the distributed pair set equals the brute-force
    all-pairs scan, with exact hamming distances; the bands>hamming
    precondition is enforced."""
    import numpy as np
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import simhash64_batch, simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog near the "
            "riverbank while data pipelines hum softly in the night")
    words = base.split()
    texts = [base]
    for i in range(60):                      # small perturbations
        w = list(words)
        w[i % len(w)] = f"tok{i % 7}"
        if i % 3 == 0:
            w[(i * 5) % len(w)] = f"alt{i % 5}"
        texts.append(" ".join(w))
    df = pd.DataFrame({"doc_id": range(len(texts)),
                       "text": pd.Series(texts, dtype="string")})

    got = simhash_pairs(rd.from_pandas(df), max_hamming=3).to_pandas()
    got_set = {(int(a), int(b)): int(h) for a, b, h in
               zip(got["doc_a"], got["doc_b"], got["hamming"])}

    h = simhash64_batch(df["text"]).astype(np.uint64)
    want = {}
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = int(bin(int(h[i] ^ h[j])).count("1"))
            if d <= 3:
                want[(i, j)] = d
    assert want, "fixture must actually produce close pairs"
    assert got_set == want

    with pytest.raises(ValueError, match="exact only"):
        simhash_pairs(rd.from_pandas(df), max_hamming=4, num_bands=4)


def _cc_labels(n, pairs):
    lab = list(range(n))

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        lab[ra] = rb
    comps = {}
    for i in range(n):
        comps.setdefault(find(i), set()).add(i)
    return {frozenset(c) for c in comps.values()}


def test_simhash_pairs_cliques_star_and_guards(ray_session):
    """Identical-text cliques: pairs mode enumerates every C(m,2)
    hamming-0 pair exactly; star mode emits O(m) edges that are each a
    true <=max_hamming pair AND whose transitive closure equals the
    exact pair graph's; the mega-clique and hot-bucket guards RAISE
    instead of silently dropping (the r4 'no silent caps' finding)."""
    import numpy as np
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import simhash64_batch, simhash_pairs

    base = ("streaming batches of arrow blocks flow through the object "
            "store while actors vote on signature bits all night long")
    words = base.split()
    texts = [base] * 7                       # a 7-member exact clique
    for i in range(40):
        w = list(words)
        w[i % len(w)] = f"tok{i % 6}"
        texts.append(" ".join(w))
    texts += [texts[9]] * 3                  # second clique, m=4
    df = pd.DataFrame({"doc_id": range(len(texts)),
                       "text": pd.Series(texts, dtype="string")})
    n = len(df)

    h = simhash64_batch(df["text"]).astype(np.uint64)
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            d = int(bin(int(h[i] ^ h[j])).count("1"))
            if d <= 3:
                want[(i, j)] = d
    assert sum(1 for v in want.values() if v == 0) >= 21 + 6

    got = simhash_pairs(rd.from_pandas(df), max_hamming=3).to_pandas()
    got_set = {(int(a), int(b)): int(hv) for a, b, hv in
               zip(got["doc_a"], got["doc_b"], got["hamming"])}
    assert got_set == want                   # pairs mode: exact

    st = simhash_pairs(rd.from_pandas(df), max_hamming=3,
                       output="star").to_pandas()
    st_set = {(int(a), int(b)): int(hv) for a, b, hv in
              zip(st["doc_a"], st["doc_b"], st["hamming"])}
    # every star edge is a true pair with the true hamming ...
    assert all(want.get(k) == v for k, v in st_set.items())
    # ... and the transitive closures agree
    assert _cc_labels(n, st_set) == _cc_labels(n, want)

    with pytest.raises(ValueError, match="max_clique_pairs"):
        simhash_pairs(rd.from_pandas(df), max_hamming=3,
                      max_clique_pairs=5).to_pandas()
    with pytest.raises(Exception, match="max_bucket_size"):
        simhash_pairs(rd.from_pandas(df), max_hamming=3,
                      max_bucket_size=1).to_pandas()
    # the explicit recall/memory trade still works
    dropped = simhash_pairs(rd.from_pandas(df), max_hamming=3,
                            max_bucket_size=1,
                            on_hot_bucket="drop").to_pandas()
    assert set(map(tuple, dropped[["doc_a", "doc_b"]].to_numpy())) \
        <= set(want)


def test_meta_blocking_wnp_and_string_ids(ray_session):
    """WNP prunes below-endpoint-average edges (crafted graph) and the
    operator preserves string doc ids end to end."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import meta_blocking_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = {
        "d1": base,                                  # clique of dups
        "d2": base,
        "d3": base.replace("theta", "iota"),
        "d9": "totally different words over here now entirely",
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = meta_blocking_pairs(ds).to_pandas()
    assert out["doc_a"].map(type).eq(str).all()      # ids stay strings
    pairs = {(a, b) for a, b in zip(out["doc_a"], out["doc_b"])}
    assert ("d1", "d2") in pairs                     # strongest edge kept
    assert all("d9" not in p for p in pairs)         # no shared blocks


def test_simhash_pairs_string_doc_ids(ray_session):
    """String doc ids survive both output modes: empty exchange-bucket
    frames must carry the CALLER's id dtype (a hardcoded int64 empty
    broke block-schema unification), and pairs-mode member expansion
    must min/max via object arrays (np.minimum has no str loop)."""
    import numpy as np
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import simhash64_batch, simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog near the "
            "riverbank while data pipelines hum softly in the night")
    words = base.split()
    texts = [base, base]                     # an identical-sig clique
    for i in range(40):
        w = list(words)
        w[i % len(w)] = f"tok{i % 5}"
        texts.append(" ".join(w))
    ids = [f"doc-{i:04d}" for i in range(len(texts))]
    df = pd.DataFrame({"doc_id": pd.Series(ids, dtype="string"),
                       "text": pd.Series(texts, dtype="string")})

    got = simhash_pairs(rd.from_pandas(df), max_hamming=3).to_pandas()
    got_set = {(a, b): int(h) for a, b, h in
               zip(got["doc_a"], got["doc_b"], got["hamming"])}

    h = simhash64_batch(df["text"]).astype(np.uint64)
    want = {}
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = int(bin(int(h[i] ^ h[j])).count("1"))
            if d <= 3:
                a, b = sorted((ids[i], ids[j]))
                want[(a, b)] = d
    assert want and got_set == want

    star = simhash_pairs(rd.from_pandas(df), max_hamming=3,
                         output="star").to_pandas()
    # star covers the same transitive closure over the same nodes
    idx = {d: i for i, d in enumerate(ids)}
    want_cc = _cc_labels(len(ids), [(idx[a], idx[b]) for a, b in want])
    got_cc = _cc_labels(len(ids), [(idx[a], idx[b]) for a, b in
                                   zip(star["doc_a"], star["doc_b"])])
    singles = {c for c in want_cc if len(c) == 1}
    assert {c for c in got_cc if len(c) > 1} == want_cc - singles


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_levenshtein_batch_matches_reference_dp():
    from fastobo_py_ray.stages.dedup import _levenshtein_batch
    import random
    rng = random.Random(11)
    a = ["", "a", "héllo", "abc", "part", "kitten"] + \
        ["".join(rng.choice("abxy") for _ in range(rng.randint(0, 8)))
         for _ in range(60)]
    b = ["ab", "", "hello", "abc", "spark", "sitting"] + \
        ["".join(rng.choice("abxy") for _ in range(rng.randint(0, 8)))
         for _ in range(60)]
    got = _levenshtein_batch(a, b)
    exp = [_lev_ref(x, y) for x, y in zip(a, b)]
    assert got.tolist() == exp


def test_edit_distance_pairs_brute_force_parity(ray_session):
    import random

    import ray.data as rd

    from fastobo_py_ray.stages.dedup import edit_distance_pairs

    rng = random.Random(7)
    vocab = sorted({"".join(rng.choice("abc")
                            for _ in range(rng.randint(1, 6)))
                    for _ in range(120)})
    ds = rd.from_pandas(
        pd.DataFrame({"token": pd.Series(vocab, dtype="string")}))
    for k in (1, 2, 3):  # k=3 exercises the general pigeonhole depth
        got = edit_distance_pairs(ds, "token", k=k).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        exp = sorted((min(x, y), max(x, y), _lev_ref(x, y))
                     for i, x in enumerate(vocab)
                     for y in vocab[i + 1:] if _lev_ref(x, y) <= k)
        assert list(map(tuple, got.to_numpy())) == exp


def test_edit_distance_pairs_long_string_raises(ray_session):
    import ray.data as rd

    import pytest

    from fastobo_py_ray.stages.dedup import edit_distance_pairs

    ds = rd.from_pandas(pd.DataFrame(
        {"token": pd.Series(["ok", "x" * 100], dtype="string")}))
    with pytest.raises(Exception) as ei:
        edit_distance_pairs(ds, "token", k=1, max_len=64).to_pandas()
    assert "max_len" in str(ei.value)


def test_spell_canon_crafted_corpus(ray_session, tmp_path):
    """q_spell_canon on a crafted corpus: 'teh'/'th' fold into the
    highest-count member 'the' (k<=2 chain), ties break lexicographic,
    and far tokens stay their own canonical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_spell_canon

    docs = ["the cat sat", "teh cat", "th dog zebra", "the the zebra",
            "zzzx zzzy"]  # zzzx/zzzy: dist 1, equal count -> lex min
    pq.write_table(pa.table({"text": docs}), tmp_path / "documents.parquet")
    out = q_spell_canon(str(tmp_path))
    got = dict(zip(out["token"], out["canonical"]))
    assert got["teh"] == "the" and got["th"] == "the" \
        and got["the"] == "the"
    assert got["zebra"] == "zebra"
    # equal-count tie inside the {zzzx, zzzy} component -> lexicographic
    assert got["zzzx"] == "zzzx" and got["zzzy"] == "zzzx"
    # counts column is the token's own corpus count
    cnt = dict(zip(out["token"], out["cnt"]))
    assert cnt["the"] == 3 and cnt["teh"] == 1


def test_edit_distance_join_brute_force_parity(ray_session):
    import random

    import ray.data as rd

    from fastobo_py_ray.stages.dedup import edit_distance_join

    rng = random.Random(31)
    lvoc = sorted({"".join(rng.choice("abc")
                           for _ in range(rng.randint(1, 6)))
                   for _ in range(80)})
    rvoc = sorted({"".join(rng.choice("abcd")
                           for _ in range(rng.randint(1, 6)))
                   for _ in range(80)})
    lds = rd.from_pandas(
        pd.DataFrame({"token": pd.Series(lvoc, dtype="string")}))
    rds = rd.from_pandas(
        pd.DataFrame({"word": pd.Series(rvoc, dtype="string")}))
    for k in (1, 2):
        got = edit_distance_join(lds, rds, "token", "word", k=k) \
            .to_pandas().sort_values(["left", "right"]) \
            .reset_index(drop=True)
        exp = sorted((x, y, _lev_ref(x, y)) for x in lvoc for y in rvoc
                     if _lev_ref(x, y) <= k)
        assert list(map(tuple, got.to_numpy())) == exp
        # bipartite: identical strings on both sides appear at dist 0,
        # and (l, r) ordering is sides, not lexicographic
        both = set(lvoc) & set(rvoc)
        zero = {(a, b) for a, b, d in exp if d == 0}
        assert zero == {(w, w) for w in both}


def test_levenshtein_batch_metric_properties():
    """The DP kernel satisfies the metric axioms on random triples:
    identity, symmetry, triangle inequality, and the unit-edit bound
    |len(a)-len(b)| <= d <= max(len)."""
    import random

    from fastobo_py_ray.stages.dedup import _levenshtein_batch

    rng = random.Random(41)
    words = ["".join(rng.choice("abcde")
                     for _ in range(rng.randint(0, 10)))
             for _ in range(90)]
    a = words[:30]
    b = words[30:60]
    c = words[60:]
    dab = _levenshtein_batch(a, b)
    dba = _levenshtein_batch(b, a)
    dbc = _levenshtein_batch(b, c)
    dac = _levenshtein_batch(a, c)
    daa = _levenshtein_batch(a, a)
    assert (daa == 0).all()
    assert (dab == dba).all()
    assert (dac <= dab + dbc).all()
    for x, y, d in zip(a, b, dab):
        assert abs(len(x) - len(y)) <= d <= max(len(x), len(y), 1) \
            or (x == y and d == 0)


def test_editdist_queries_exclude_mega_tokens(ray_session, tmp_path):
    """The query layer's shared length contract (_EDITDIST_MAX_LEN,
    mirrored by length(w) <= 64 in every oracle): a URL/hash-like
    mega-token in the corpus is EXCLUDED on both sides instead of
    tripping the stage-level delete-neighbourhood guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import (q_editdist,
                                                  q_spell_canon)

    mega = "x" * 80
    docs = ["the cat sat", f"teh cat {mega}", "th dog", "the the"]
    pq.write_table(pa.table({"text": docs}), tmp_path / "documents.parquet")
    pairs = q_editdist(str(tmp_path))
    assert mega not in set(pairs["tok_a"]) | set(pairs["tok_b"])
    assert ("teh", "the") in set(zip(pairs["tok_a"], pairs["tok_b"]))
    canon = q_spell_canon(str(tmp_path))
    assert mega not in set(canon["token"])
    got = dict(zip(canon["token"], canon["canonical"]))
    assert got["teh"] == "the"


def test_hard_negative_topk_matches_brute_force(ray_session):
    """Engine output == a plain-numpy per-anchor scan with the same
    round-before-rank / ascending-id tie-break rule."""
    import ray.data as rd

    from fastobo_py_ray.stages.ann import hard_negative_topk

    rng = np.random.RandomState(7)
    n, d, k = 80, 12, 4
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [rng.normal(size=d).tolist() for _ in range(n)],
        "label": (np.arange(n) % 3).astype("int32")})
    got = hard_negative_topk(rd.from_pandas(df).repartition(4), k=k)

    m = np.stack([np.asarray(v, float) for v in df["embedding"]])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    labels = df["label"].to_numpy()
    rows = []
    for i in range(n):
        sims = np.round(m @ m[i], 6)
        cand = [(float(-sims[j]), j) for j in range(n)
                if labels[j] != labels[i]]
        for r, (neg_s, j) in enumerate(sorted(cand)[:k], start=1):
            rows.append((i, j, r, -neg_s))
    want = pd.DataFrame(rows, columns=["vec_id", "neg_id", "neg_rank",
                                       "cos_sim"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"vec_id": "int64", "neg_id": "int64",
                     "neg_rank": "int64"}).reset_index(drop=True))
    # semantic gates: never a same-label or self pair, exactly k per anchor
    lab = dict(zip(df["vec_id"], df["label"]))
    assert (got["vec_id"] != got["neg_id"]).all()
    assert all(lab[a] != lab[b]
               for a, b in zip(got["vec_id"], got["neg_id"]))
    assert (got.groupby("vec_id").size() == k).all()


def test_hard_negative_topk_caps_and_short_supply(ray_session):
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.ann import hard_negative_topk

    df = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        "label": [0, 0, 1]})
    # only one cross-label candidate exists for anchor 2 -> k=5 yields 2
    out = hard_negative_topk(rd.from_pandas(df), k=5)
    assert (out[out["vec_id"] == 2]["neg_rank"].tolist() == [1, 2])
    with pytest.raises(ValueError, match="max_corpus_rows"):
        hard_negative_topk(rd.from_pandas(df), k=1, max_corpus_rows=2)


def test_dup_substring_grams_exact_counts(ray_session):
    """Crafted corpus with a known shared 8-gram: exact doc/occurrence
    counts, singleton grams absent, short/None docs ignored."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dup_substring_grams

    shared = "abcdefgh"                      # appears in docs 0,1 (doc 1: 2x)
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [f"xx{shared}yy", f"{shared}..{shared}", "zzzzzzzzzz",
                 "short", None]})
    out = dup_substring_grams(rd.from_pandas(df).repartition(3),
                              gram_len=8).to_pandas()
    row = out[out["gram"] == shared]
    assert len(row) == 1
    assert row["n_docs"].iloc[0] == 2 and row["n_occ"].iloc[0] == 3
    # every reported gram really is duplicated across docs
    assert (out["n_docs"] >= 2).all()
    # brute-force parity on the tiny corpus
    from collections import Counter, defaultdict
    docs, occ = defaultdict(set), Counter()
    for _, r in df.iterrows():
        t = r["text"]
        if not isinstance(t, str):
            continue
        for i in range(len(t) - 7):
            g = t[i:i + 8]
            docs[g].add(r["doc_id"])
            occ[g] += 1
    want = sorted((g, len(d), occ[g]) for g, d in docs.items()
                  if len(d) >= 2)
    got = sorted(map(tuple, out[["gram", "n_docs", "n_occ"]].to_numpy()))
    assert got == want


def test_dup_substring_grams_unicode_char_semantics(ray_session):
    """Multi-byte codepoints: windows are CHARACTER-based (like SQL
    substring), so a shared 4-char gram containing non-ASCII is found."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dup_substring_grams

    g = "ké中i"                      # 4 chars, 1-3 bytes each
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": [f"__{g}__", f"{g}!!"]})
    out = dup_substring_grams(rd.from_pandas(df), gram_len=4).to_pandas()
    assert g in set(out["gram"])
    assert out.set_index("gram").loc[g, "n_docs"] == 2


def test_dup_substring_coverage_counts_and_rounding(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import dup_substring_coverage

    shared = "abcdefgh"
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [f"xx{shared}yy", f"{shared}..", "tiny"]})
    out = dup_substring_coverage(rd.from_pandas(df).repartition(2),
                                 gram_len=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 2 is shorter than the gram (no windows) and absent, like SQL
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_windows"].tolist() == [5, 3]
    assert out["n_dup_windows"].tolist() == [1, 1]
    assert out["dup_frac"].tolist() == [0.2, 0.333333]
    # half-AWAY rounding (SQL round()) where numpy's banker's rounding
    # would give 0.039062 for 20/512
    assert np.floor((20 / 512) * 1e6 + 0.5) / 1e6 == 0.039063


def test_exact_substr_removal_crafted(ray_session):
    """Crafted cut: the union of covered spans is deleted, overlapping
    hits merge, dup-free / short / window-less docs pass through with
    n_removed == 0, and every input doc appears exactly once."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import exact_substr_removal

    shared = "abcdefgh"                       # 8-char duplicated passage
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [f"xx{shared}yy",             # one hit: cut chars 2..9
                 f"{shared}{shared}",         # overlapping windows merge:
                                              # the 'hg' seam is NOT a dup
                                              # gram, but windows at 0 and
                                              # 8 cover all 16 chars
                 "zzzzzzzzzzzz",              # windows, none duplicated
                 "tiny"]})                    # shorter than gram_len
    out = exact_substr_removal(rd.from_pandas(df).repartition(2),
                               gram_len=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    assert out["clean_text"].tolist() == ["xxyy", "", "zzzzzzzzzzzz",
                                          "tiny"]
    assert out["n_removed"].tolist() == [8, 16, 0, 0]


def test_exact_substr_removal_unicode_and_parity(ray_session):
    """Brute-force parity on a random duplication-heavy corpus incl. a
    multi-byte-codepoint duplicated passage: the engine's utf-32 mask
    cut equals a plain-Python character-level reimplementation."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import exact_substr_removal

    G = 6
    rng = np.random.RandomState(5)
    passages = ["abcdefgi", "ké中i文字ab"]     # second is multi-byte
    texts = []
    for i in range(60):
        t = "".join(chr(97 + c) for c in rng.randint(0, 26, size=30))
        if i % 3 == 0:
            p = passages[i % 2]
            ins = int(rng.randint(0, len(t)))
            t = t[:ins] + p + t[ins:]
        texts.append(t)
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})

    # plain-Python reference: count distinct docs per window, cut union
    from collections import defaultdict
    docs = defaultdict(set)
    for did, t in zip(df["doc_id"], df["text"]):
        for i in range(len(t) - G + 1):
            docs[t[i:i + G]].add(did)
    dup = {g for g, d in docs.items() if len(d) >= 2}
    want = {}
    for did, t in zip(df["doc_id"], df["text"]):
        cov = [False] * len(t)
        for i in range(len(t) - G + 1):
            if t[i:i + G] in dup:
                for j in range(i, i + G):
                    cov[j] = True
        want[did] = ("".join(c for c, m in zip(t, cov) if not m),
                     sum(cov))

    out = exact_substr_removal(rd.from_pandas(df).repartition(4),
                               gram_len=G).to_pandas()
    assert len(out) == 60
    for did, clean, nrem in zip(out["doc_id"], out["clean_text"],
                                out["n_removed"]):
        assert (clean, nrem) == want[did], did
    # the multi-byte passage really was duplicated and cut
    assert any(passages[1] in t for t in texts)
    assert all(passages[1] not in c for c in out["clean_text"])


def test_winnow_guarantee_and_brute_force_parity(ray_session):
    """Robust winnowing: (1) brute-force mirror equality on random
    unicode-bearing strings; (2) the paper's guarantee — two docs
    sharing a substring of length >= w + k - 1 share at least one
    fingerprint HASH."""
    import hashlib
    import random
    import string

    import ray.data as rd

    from fastobo_py_ray.stages.dedup import winnow_fingerprints

    k, w = 8, 4
    rng = random.Random(11)
    alpha = string.ascii_lowercase + " é日"
    shared = "XSHAREDSUBSTRX"  # len 14 >= w + k - 1 = 11
    docs = {i: "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
            for i in range(1, 9)}
    docs[20] = docs[1][:10] + shared + "abcdefgh"
    docs[21] = "zyxw" + shared + docs[2][:12]

    out = winnow_fingerprints(
        rd.from_pandas(pd.DataFrame(
            {"doc_id": list(docs), "text": list(docs.values())})
            ).repartition(3),
        k=k, w=w).to_pandas()

    # brute force mirror
    exp = []
    for did, t in docs.items():
        n = len(t) - k + 1
        if n < w:
            continue
        hexes = [hashlib.md5(t[i:i + k].encode()).hexdigest()
                 for i in range(n)]
        sel = set()
        for j in range(n - w + 1):
            win = hexes[j:j + w]
            mn = min(win)
            sel.add(j + max(i for i, h in enumerate(win) if h == mn))
        for p in sorted(sel):
            exp.append((did, p + 1, hexes[p]))
    exp_df = pd.DataFrame(exp, columns=["doc_id", "pos", "fingerprint"])
    got = out.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    exp_df = exp_df.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "pos": "int64"}), exp_df.astype(
            {"doc_id": "int64", "pos": "int64"}))

    # guarantee: the two shared-substring docs share a fingerprint hash
    f20 = set(got.loc[got["doc_id"] == 20, "fingerprint"])
    f21 = set(got.loc[got["doc_id"] == 21, "fingerprint"])
    assert f20 & f21


def test_winnow_overlap_pairs_brute_force(ray_session):
    """winnow_overlap_pairs vs a pure-Python mirror: fingerprint SETS
    per doc -> pair intersection counts -> integer micro containment,
    incl. the stop-fingerprint cap (a hash planted in every doc is
    excluded from pairing but still counts toward per-doc |fp|), and
    the MOSS guarantee that a >= w+k-1 shared substring yields a pair
    at min_shared=1."""
    import hashlib
    import itertools
    import random
    import string

    import ray.data as rd

    from fastobo_py_ray.stages.dedup import winnow_overlap_pairs

    k, w = 8, 4
    rng = random.Random(7)
    alpha = string.ascii_lowercase + " é"
    hot = "ZHOTBOILERPLATEZ"     # planted in every doc -> capped out
    shared = "QSHAREDPASSAGEQ"   # len 15 >= w + k - 1
    docs = {}
    for i in range(1, 11):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(20, 80)))
        docs[i] = body + hot
    docs[3] += shared + "abc"
    docs[7] = shared + docs[7]

    def fpset(t):
        n = len(t) - k + 1
        if n < w:
            return set()
        hexes = [hashlib.md5(t[i:i + k].encode()).hexdigest()
                 for i in range(n)]
        sel = set()
        for j in range(n - w + 1):
            win = hexes[j:j + w]
            mn = min(win)
            sel.add(j + max(i for i, h in enumerate(win) if h == mn))
        return {hexes[p] for p in sel}

    sets = {d: fpset(t) for d, t in docs.items()}
    cap = 4  # < 10 docs -> every all-docs hash is stop-filtered
    freq = {}
    for s in sets.values():
        for h in s:
            freq[h] = freq.get(h, 0) + 1
    exp = []
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = sum(1 for h in sets[a] & sets[b] if freq[h] <= cap)
        if inter >= 1:
            exp.append((a, b, inter,
                        inter * 1_000_000 // min(len(sets[a]),
                                                 len(sets[b]))))
    exp_df = pd.DataFrame(
        exp, columns=["doc_a", "doc_b", "n_shared", "containment_micro"])

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())})).repartition(3)
    got = winnow_overlap_pairs(
        ds, k=k, w=w, min_shared=1, max_doc_freq=cap).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    exp_df = exp_df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp_df.astype("int64"))

    # MOSS guarantee: the shared-passage pair (3, 7) surfaces
    assert ((got["doc_a"] == 3) & (got["doc_b"] == 7)).any()
    # and the hot boilerplate hash alone never created a pair: docs
    # without any genuine overlap are absent (spot-check one)
    others = got[(got["doc_a"] == 1) & (got["doc_b"] == 2)]
    pair_inter = sum(1 for h in sets[1] & sets[2] if freq[h] <= cap)
    assert len(others) == (1 if pair_inter >= 1 else 0)


def test_dup_sources_crafted(ray_session, tmp_path):
    """q_dup_sources on a controlled Jaccard fixture (the adamic-adar
    3-doc path: X~Y and Y~Z at exactly 0.8, X~Z below threshold):
    sources chosen so the two surviving pairs land in one unordered
    source cell and the jaccard micro-sum is exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_dup_sources

    docs = {1: ("a b c d e f", "s2"),   # pair (1,2) -> (s1, s2)
            2: ("a b c d e f g", "s1"),
            3: ("b c d e f g", "s2")}   # pair (2,3) -> (s1, s2)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array([t for t, _ in docs.values()], pa.string()),
        "source": pa.array([s for _, s in docs.values()], pa.string())}),
        tmp_path / "documents.parquet")

    out = q_dup_sources(str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    # both pairs are cross-source; least/greatest folds them together
    assert (row["source_a"], row["source_b"]) == ("s1", "s2")
    assert int(row["n_pairs"]) == 2
    assert int(row["jac_micro_sum"]) == 2 * 800_000  # J = 4/5 twice


def test_jaccard_topk_neighbors_crafted(ray_session):
    """jaccard_topk_neighbors on a hand-computable 4-doc corpus:
    identical docs rank first at exactly 1_000_000 micro, the partial
    overlap ranks second at 333333 (= 1*1e6 // 3), ties break on
    neighbor id ascending, and a doc sharing no shingle is absent."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import jaccard_topk_neighbors

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "a b c d", "a b c x", "z z"]}))
    out = jaccard_topk_neighbors(docs, topk=3).to_pandas() \
        .sort_values(["doc_id", "rnk"]).reset_index(drop=True)

    assert sorted(out["doc_id"].unique().tolist()) == [1, 2, 3]
    d1 = out[out["doc_id"] == 1]
    assert d1[["nbr", "jac_micro", "rnk"]].values.tolist() == [
        [2, 1_000_000, 1], [3, 333_333, 2]]
    d3 = out[out["doc_id"] == 3]
    # tie at 333333: neighbor id ascending
    assert d3[["nbr", "jac_micro", "rnk"]].values.tolist() == [
        [1, 333_333, 1], [2, 333_333, 2]]
