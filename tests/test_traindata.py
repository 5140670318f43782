"""Training-data curation operators: decontamination, stratified
sampling, repetition stats, sequence packing (invariants + oracles the
driver's SQL gate can't express)."""

import numpy as np
import pandas as pd
import pytest


def _docs(n=200, seed=3):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.randint(5, 60)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": range(n), "text": texts})


def test_decontaminate_flags_exact_and_only_real_overlap(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import (_space_grams,
                                                 decontaminate)

    df = _docs()
    bench = df[df.doc_id % 11 == 0]
    corpus = df[df.doc_id % 11 != 0]
    out = decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench),
                        k=5).to_pandas().set_index("doc_id")

    bgrams = set()
    for t in bench.text:
        bgrams.update(_space_grams(t, 5))
    for _, row in corpus.iterrows():
        want = len(set(_space_grams(row.text, 5)) & bgrams)
        assert out.loc[row.doc_id, "n_hits"] == want
        assert out.loc[row.doc_id, "contaminated"] == int(want > 0)


def test_decontaminate_empty_benchmark(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import decontaminate

    df = _docs(50)
    out = decontaminate(rd.from_pandas(df),
                        rd.from_pandas(df.iloc[:0]), k=5).to_pandas()
    assert (out["n_hits"] == 0).all() and (out["contaminated"] == 0).all()


def test_stratified_sample_deterministic_and_sized(ray_session):
    import hashlib

    import ray.data as rd

    from fastobo_py_ray.stages.traindata import stratified_sample

    df = _docs(300)
    df["lang"] = [["en", "de", "fr"][i % 3] for i in range(len(df))]
    ds = rd.from_pandas(df).repartition(8)
    out = stratified_sample(ds, group_col="lang", n=10,
                            id_col="doc_id").to_pandas()
    assert (out.groupby("lang").size() == 10).all()
    # oracle: pandas n-smallest md5 per group
    df["__h"] = [hashlib.md5(str(v).encode()).hexdigest()
                 for v in df.doc_id]
    want = df.sort_values(["__h", "doc_id"]).groupby("lang").head(10)
    assert set(zip(out.lang, out.doc_id)) == set(zip(want.lang,
                                                     want.doc_id))
    # rerun is identical (resume-stable)
    out2 = stratified_sample(ds, group_col="lang", n=10,
                             id_col="doc_id").to_pandas()
    assert set(map(tuple, out.values)) == set(map(tuple, out2.values))


def test_repetition_stats_match_pandas_oracle(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import repetition_stats

    df = _docs(80)
    out = repetition_stats(rd.from_pandas(df)).to_pandas() \
        .set_index("doc_id")
    for _, row in df.iterrows():
        words = row.text.split(" ")
        vc = pd.Series(words).value_counts()
        assert out.loc[row.doc_id, "n_words"] == len(words)
        assert out.loc[row.doc_id, "n_distinct"] == len(vc)
        assert out.loc[row.doc_id, "top_word_frac"] == pytest.approx(
            round(vc.iloc[0] / len(words), 6))


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import pack_sequences

    df = _docs(250)
    # add a doc longer than the budget: must get its own pack
    df.loc[0, "text"] = " ".join(["x"] * 300)
    budget = 100
    ds = rd.from_pandas(df).repartition(8)
    out = pack_sequences(ds, budget=budget, num_buckets=8).to_pandas()

    # every doc packed exactly once
    assert sorted(out.doc_id) == sorted(df.doc_id)
    # token counts are the space-split lengths
    want_tokens = df.set_index("doc_id").text.str.split(" ").str.len()
    got_tokens = out.set_index("doc_id").n_tokens
    assert (got_tokens == want_tokens.loc[got_tokens.index]).all()
    # no pack over budget unless it is a single over-long doc
    sizes = out.groupby("pack_id").agg(tot=("n_tokens", "sum"),
                                       n=("n_tokens", "size"))
    over = sizes[sizes.tot > budget]
    assert (over.n == 1).all()
    # determinism across a different partitioning
    out2 = pack_sequences(rd.from_pandas(df).repartition(3),
                          budget=budget, num_buckets=8).to_pandas()
    m = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (m.pack_id_a == m.pack_id_b).all()


def test_curation_pipeline_funnel_invariants(ray_session):
    """Composed curation flow: counts only shrink, survivors carry no
    exact duplicates, no benchmark-contaminated doc survives, every
    survivor is packed exactly once within budget, split is the
    deterministic md5 rule."""
    import hashlib

    import ray.data as rd

    from fastobo_py_ray.pipelines.curation import curate
    from fastobo_py_ray.stages.traindata import _space_grams

    rng = np.random.RandomState(17)
    # function words included so the language gate recognizes the docs
    vocab = ["the", "and", "of", "to", "is"] + [f"w{i}" for i in range(55)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(120)]
    texts = base + base[:20]                       # 20 exact dups
    texts += [t + " tailword" for t in base[20:35]]  # 15 near dups
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    bench = df.iloc[:6]
    corpus = df.iloc[6:]

    packed, stats = curate(rd.from_pandas(corpus).repartition(4),
                           bench_ds=rd.from_pandas(bench),
                           min_quality=0.0, max_top_word_frac=1.0,
                           jaccard_threshold=0.6, pack_budget=128)
    out = packed.to_pandas()

    # monotone funnel
    order = ["input", "after_quality", "after_exact_dedup",
             "after_near_dedup", "after_decontam", "packed_docs"]
    vals = [stats[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert stats["after_exact_dedup"] < stats["after_quality"]  # dups died

    survivors = corpus[corpus.doc_id.isin(out.doc_id)]
    # no exact dup text among survivors
    assert survivors.text.duplicated().sum() == 0
    # no contaminated survivor (5-gram overlap with bench)
    bgrams = set()
    for t in bench.text:
        bgrams.update(_space_grams(t, 5))
    for t in survivors.text:
        assert not (set(_space_grams(t, 5)) & bgrams)
    # packing invariants
    assert out.doc_id.is_unique
    sizes = out.groupby("pack_id").agg(tot=("n_tokens", "sum"),
                                       n=("n_tokens", "size"))
    assert (sizes[sizes.tot > 128].n == 1).all()
    # split rule — identical to q_train_split's (first md5 byte < 0x1a)
    for _, r in out.iterrows():
        h2 = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2]
        assert r.split == ("val" if h2 < "1a" else "train")
    # ints survived the pack/split join (no NA-widening leak)
    assert out.n_tokens.dtype.kind == "i"


def test_chunk_documents_invariants(ray_session):
    """Every word covered, consecutive chunks overlap by
    window - stride, tails shorter, reassembly of stride-prefixes
    equals the document."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import chunk_documents

    docs = {1: "a bb ccc dd e ff g", 2: "x", 3: "one two three four"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    out = chunk_documents(ds, window=3, stride=2).to_pandas() \
        .sort_values(["doc_id", "chunk_id"])
    for did, text in docs.items():
        g = out[out["doc_id"] == did]
        words = text.split(" ")
        # chunk k covers words [2k, min(2k+3, n))
        assert g["chunk_id"].tolist() == list(range(len(g)))
        for _, r in g.iterrows():
            lo = r.chunk_id * 2
            want = words[lo:lo + 3]
            assert r.chunk_text == " ".join(want)
            assert r.n_words == len(want)
        # every word index covered by at least one chunk
        covered = set()
        for _, r in g.iterrows():
            covered |= set(range(r.chunk_id * 2,
                                 r.chunk_id * 2 + r.n_words))
        assert covered == set(range(len(words)))


def test_curate_survives_all_filtered_corpus(ray_session, tmp_path):
    """A corpus where the quality gates drop EVERYTHING must flow
    through the funnel as empty stages, not crash on Ray's deleted
    empty-write directory (datasink on_write_complete removes the dir
    when zero rows were written)."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.pipelines.curation import curate

    # texts short enough that every quality gate rejects them
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["x", "y"]}))
    packed, stats = curate(ds, work_dir=str(tmp_path / "w"))
    assert packed.count() == 0
    assert stats["after_quality"] == 0
    assert stats["packed_docs"] == 0


def test_curate_resume_skips_finished_stages(ray_session, tmp_path):
    """curate(resume=True) with a persistent work_dir must (a) skip
    stages whose _SUCCESS marker matches the parameter fingerprint —
    verified by making the skipped checkpoint's content detectably
    different from what a recompute would produce — (b) recompute
    stages whose marker is missing (simulated mid-run crash), and
    (c) invalidate everything when the parameters change."""
    import os
    import shutil

    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.pipelines.curation import curate

    rng = np.random.RandomState(5)
    vocab = ["the", "and", "of", "to", "is"] + [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(40)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    wd = str(tmp_path / "w")
    kw = dict(min_quality=0.0, max_top_word_frac=1.0, pack_budget=128)

    _, stats1 = curate(rd.from_pandas(df), work_dir=wd, **kw)

    # (a) tamper with the finished s1 checkpoint: drop one row.  A
    # resumed run must NOT recompute s1, so the tampered count flows
    # through the funnel (proof the stage was skipped, not re-run).
    s1 = os.path.join(wd, "s1_quality")
    files = [f for f in os.listdir(s1) if f.endswith(".parquet")]
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(s1, files[0]))
    pq.write_table(t.slice(1), os.path.join(s1, files[0]))
    for f in files[1:]:
        os.remove(os.path.join(s1, f))
    # crash simulation: later stages unfinished (markers gone)
    for st in ("s2_exact", "s3_neardup", "s5_tagged", "packed"):
        shutil.rmtree(os.path.join(wd, st), ignore_errors=True)

    _, stats2 = curate(rd.from_pandas(df), work_dir=wd, resume=True, **kw)
    assert stats2["after_quality"] == t.num_rows - 1  # skipped, not re-run
    assert stats2["packed_docs"] <= stats1["packed_docs"]

    # (c) changed parameters invalidate the (tampered) marker: a full
    # recompute restores the true stage-1 count
    _, stats3 = curate(rd.from_pandas(df), work_dir=wd, resume=True,
                       min_quality=0.0, max_top_word_frac=0.999,
                       pack_budget=128)
    assert stats3["after_quality"] == stats1["after_quality"]


def test_md5_hex_duckdb_tier_matches_loop_and_order():
    """The large-array DuckDB md5 path must be value- AND
    order-identical to the hashlib loop (the tier threshold is a pure
    performance crossover, never a semantic switch)."""
    import hashlib

    from fastobo_py_ray.stages import traindata as td

    ids = [f"doc-{i}" for i in range(1000)] + [123, -5, "x y z"]
    loop = [hashlib.md5(str(v).encode()).hexdigest() for v in ids]
    assert td._md5_hex(ids) == loop
    old = td._MD5_DUCKDB_MIN
    td._MD5_DUCKDB_MIN = 1  # force the DuckDB tier
    try:
        assert td._md5_hex(ids) == loop
        assert td.train_val_assign(ids) == [
            "val" if h[:2] < "1a" else "train" for h in loop]
    finally:
        td._MD5_DUCKDB_MIN = old


def test_cross_substr_decontam_parity_and_edges(ray_session):
    """Character-level ExactSubstr decontamination: brute-force parity
    on a crafted corpus (planted 20+-char benchmark passage, short doc,
    None text, reformatting that word-gram decontam misses)."""
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import cross_substr_decontam

    G = 12
    passage = "the quick brown fox!"          # 20 chars
    bench = pd.DataFrame({"doc_id": [0],
                          "text": [f"eval: {passage} end"]})
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [f"xx {passage} yy",          # verbatim overlap
                 # same chars, different WORD boundaries than bench
                 # tokens ('quick brown' intact as characters)
                 f"requick brown fox!suffix",
                 "completely clean text here",
                 "short",                     # < G: no windows
                 None]})                      # null text
    out = cross_substr_decontam(
        rd.from_pandas(corpus), rd.from_pandas(bench),
        gram_len=G).to_pandas().set_index("doc_id")

    # brute-force reference
    bgrams = {bench.text[0][i:i + G]
              for i in range(len(bench.text[0]) - G + 1)}
    for _, row in corpus.iterrows():
        t = row.text
        if not isinstance(t, str) or len(t) < G:
            assert out.loc[row.doc_id, "n_windows"] == \
                (0 if not isinstance(t, str) else max(0, len(t) - G + 1))
            assert out.loc[row.doc_id, "contaminated"] == 0
            continue
        wins = [t[i:i + G] for i in range(len(t) - G + 1)]
        want = sum(1 for w in wins if w in bgrams)
        assert out.loc[row.doc_id, "n_windows"] == len(wins)
        assert out.loc[row.doc_id, "n_contam_windows"] == want
        assert out.loc[row.doc_id, "contaminated"] == int(want > 0)
    # the verbatim doc is flagged, the clean doc isn't, and the
    # reformatted doc IS caught at character level
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[2, "contaminated"] == 1
    assert out.loc[3, "contaminated"] == 0
    # every corpus doc appears exactly once
    assert sorted(out.index) == [1, 2, 3, 4, 5]


def test_cross_substr_decontam_empty_benchmark(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.traindata import cross_substr_decontam

    df = _docs(30)
    out = cross_substr_decontam(rd.from_pandas(df),
                                rd.from_pandas(df.iloc[:0]),
                                gram_len=20).to_pandas()
    assert len(out) == 30
    assert (out["n_contam_windows"] == 0).all()
    assert (out["contaminated"] == 0).all()


def test_global_row_number_total_order(ray_session):
    """Global positions are exactly 0..N-1 in key order across many
    blocks, with no second exchange beyond the sort."""
    import ray.data as rd

    from fastobo_py_ray.functions.relops import global_row_number

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"k": rng.permutation(1000),
                       "id": np.arange(1000)})
    out = global_row_number(rd.from_pandas(df).repartition(13),
                            ["k", "id"]).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["pos"].tolist() == list(range(1000))
    # descending order flips the positions
    out2 = global_row_number(rd.from_pandas(df).repartition(5),
                             ["k", "id"], ascending=False).to_pandas()
    assert out2.sort_values("k")["pos"].tolist() == \
        list(range(999, -1, -1))


def test_seeded_shuffle_shards_determinism_and_balance(ray_session):
    """Same (seed, ids) -> identical order and shards regardless of
    input partitioning; ntile balance: first N%n shards hold N//n+1."""
    import hashlib

    import ray.data as rd

    from fastobo_py_ray.stages.traindata import seeded_shuffle_shards

    N, S = 203, 16
    df = pd.DataFrame({"doc_id": np.arange(N, dtype=np.int64)})
    a = seeded_shuffle_shards(rd.from_pandas(df).repartition(1),
                              n_shards=S).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = seeded_shuffle_shards(rd.from_pandas(df).repartition(7),
                              n_shards=S).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # brute-force reference order
    order = sorted(range(N), key=lambda i: (
        hashlib.md5(f"s1{i}".encode()).hexdigest(), i))
    want_pos = {d: p for p, d in enumerate(order)}
    assert all(a.loc[a.doc_id == d, "pos"].iloc[0] == p
               for d, p in want_pos.items())
    # ntile balance
    sizes = a["shard"].value_counts().sort_index()
    q, r = divmod(N, S)
    assert sizes.tolist() == [q + 1] * r + [q] * (S - r)
    # shards are contiguous in pos order
    by_pos = a.sort_values("pos")["shard"].to_numpy()
    assert (np.diff(by_pos) >= 0).all()


def test_dsir_scores_match_pure_python_mirror(ray_session):
    """DSIR importance weights on a crafted bench/raw split equal an
    independent pure-Python recomputation (hash -> smoothed LLR ->
    integer micro-nat sum), including a zero-token raw doc."""
    import hashlib
    import math

    import ray.data as rd

    from fastobo_py_ray.stages.traindata import (dsir_bucket_counts,
                                                 dsir_scores, dsir_weights)

    K = 16
    bench_docs = ["tree tree river", "tree stone"]
    raw_docs = {10: "tree river river", 11: "lava lava", 12: ""}

    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": bench_docs}))
    raw = rd.from_pandas(pd.DataFrame({
        "doc_id": list(raw_docs), "text": list(raw_docs.values())}))

    w = dsir_weights(dsir_bucket_counts(bench, num_buckets=K),
                     dsir_bucket_counts(raw, num_buckets=K))
    out = dsir_scores(raw, w, K).to_pandas().set_index("doc_id")

    # independent mirror
    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % K

    def counts(docs):
        c = [0] * K
        for t in docs:
            for tok in t.split(" "):
                if tok:
                    c[bucket(tok)] += 1
        return c

    ct, cr = counts(bench_docs), counts(raw_docs.values())
    nt, nr = sum(ct), sum(cr)
    wi = [round(1e6 * math.log((ct[b] + 1) * (nr + K)
                               / ((cr[b] + 1) * (nt + K))))
          for b in range(K)]
    assert list(w) == wi
    for did, text in raw_docs.items():
        toks = [t for t in text.split(" ") if t]
        assert int(out.loc[did, "dsir_score"]) == sum(
            wi[bucket(t)] for t in toks)
        assert int(out.loc[did, "n_tokens"]) == len(toks)
    # benchmark-aligned vocabulary outscores raw-only vocabulary
    assert out.loc[10, "dsir_score"] > out.loc[11, "dsir_score"]


def test_temp_mix_flattens_head_sources(ray_session, tmp_path):
    """alpha=0.5 temperature mixing: quotas follow the integer-exact
    (B * floor(sqrt(n_s*1e6))) // W formula, so the tail source keeps a
    far larger FRACTION of its docs than the head source (the
    flattening that motivates temperature sampling)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_temp_mix

    n_head, n_tail = 100, 4
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_head + n_tail), pa.int64()),
        "source": pa.array(["src9"] * n_head + ["src1"] * n_tail,
                           pa.string())}),
        tmp_path / "documents.parquet")
    out = q_temp_mix(str(tmp_path))
    sizes = out.groupby("source").size()
    # B = 104//5 = 20; w = (10000, 2000); quotas 16 head, min(4,3)=3 tail
    assert sizes["src9"] == 16 and sizes["src1"] == 3
    assert sizes["src1"] / n_tail > sizes["src9"] / n_head
