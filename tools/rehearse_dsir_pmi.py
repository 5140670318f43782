"""Corpus-scale rehearsal for the round-5 additions q_dsir and
q_cooccur_pmi:

* DSIR (stages/traindata.py dsir_*): two constant-partial distribution
  passes + one scoring pass with a skinny doc-keyed exchange.  At the
  small size the ENTIRE output is compared against a pure-pandas
  mirror (exact value equality); at the big sizes throughput and the
  invariants (row count, zero-token docs kept, weight-vector equality
  with the mirror) are checked.
* co-mention PMI (pipelines/queries.py q_cooccur_pmi): annotator pass
  + ONE doc-keyed exchange; exact pandas mirror at the small size,
  bounded-output + N-docs invariants at the big sizes.

Synthetic corpus: Zipf-weighted draws from the DOCS_OBO vocabulary
(plus stopwords) so the annotator actually fires, seeded/deterministic.

    python tools/rehearse_dsir_pmi.py [n_small] [n_big]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

K = 64
MOD = 97


def make_docs(n: int, seed: int = 7) -> pd.DataFrame:
    from fastobo_py_ray.testing.corpus import DOCS_VOCAB

    rng = np.random.default_rng(seed)
    vocab = np.array(list(DOCS_VOCAB) + ["the", "a"], dtype=object)
    w = 1.0 / np.arange(1, len(vocab) + 1)  # Zipf over the vocab
    w /= w.sum()
    lens = rng.integers(4, 12, size=n)
    toks = rng.choice(vocab, size=int(lens.sum()), p=w)
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(d) for d in np.split(toks, bounds)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": "s",
        "text": texts,
        "lang": "en"})


def bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % K


def dsir_mirror(df: pd.DataFrame):
    """Pure-pandas DSIR: (weights int64[K], per-doc scores frame)."""
    is_bench = (df["doc_id"] % MOD) == 0
    tok = df.assign(t=df["text"].str.split(" "))[["doc_id", "t"]] \
        .explode("t")
    tok = tok[tok["t"] != ""]
    uniq = pd.Index(tok["t"].unique())
    bmap = pd.Series([bucket(t) for t in uniq], index=uniq)
    tok["b"] = tok["t"].map(bmap)
    bench_tok = tok[tok["doc_id"].isin(df.loc[is_bench, "doc_id"])]
    raw_tok = tok[~tok["doc_id"].isin(df.loc[is_bench, "doc_id"])]
    ct = bench_tok["b"].value_counts().reindex(range(K), fill_value=0)
    cr = raw_tok["b"].value_counts().reindex(range(K), fill_value=0)
    nt, nr = ct.sum(), cr.sum()
    wi = np.round(1e6 * np.log(((ct.to_numpy() + 1.0) * (nr + K))
                               / ((cr.to_numpy() + 1.0) * (nt + K)))
                  ).astype("int64")
    sc = raw_tok.assign(w=wi[raw_tok["b"].to_numpy()]) \
        .groupby("doc_id")["w"].agg(["sum", "size"])
    out = pd.DataFrame({"doc_id": df.loc[~is_bench, "doc_id"]})
    out["dsir_score"] = out["doc_id"].map(sc["sum"]).fillna(0).astype("int64")
    out["n_tokens"] = out["doc_id"].map(sc["size"]).fillna(0).astype("int64")
    return wi, out.sort_values("doc_id").reset_index(drop=True)


def pmi_mirror(df: pd.DataFrame) -> pd.DataFrame:
    from fastobo_py_ray.testing.corpus import docs_canonical_word_map

    wmap = dict(docs_canonical_word_map())
    tok = df.assign(t=df["text"].str.split(" "))[["doc_id", "t"]] \
        .explode("t")
    tok["term"] = tok["t"].map(wmap)
    dt = tok.dropna(subset=["term"])[["doc_id", "term"]].drop_duplicates()
    n_total = dt["doc_id"].nunique()
    tc = dt["term"].value_counts()
    m = dt.merge(dt, on="doc_id")
    m = m[m["term_x"] < m["term_y"]]
    pc = m.groupby(["term_x", "term_y"], as_index=False).size()
    pc["pmi"] = np.round(np.log(
        (pc["size"].to_numpy(dtype="float64") * n_total)
        / (pc["term_x"].map(tc).to_numpy(dtype="float64")
           * pc["term_y"].map(tc).to_numpy(dtype="float64"))), 6)
    out = pc.rename(columns={"term_x": "term_a", "term_y": "term_b",
                             "size": "n_docs"})
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["term_a", "term_b"]).reset_index(drop=True)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.pipelines.queries import q_cooccur_pmi
    from fastobo_py_ray.stages.traindata import (dsir_bucket_counts,
                                                 dsir_scores, dsir_weights)

    for n in (n_small, n_big):
        df = make_docs(n)
        is_bench = (df["doc_id"] % MOD) == 0
        bench = rd.from_pandas(df[is_bench]).repartition(4).materialize()
        raw = rd.from_pandas(df[~is_bench]).repartition(64).materialize()

        # ---- DSIR ----
        t0 = time.perf_counter()
        w = dsir_weights(dsir_bucket_counts(bench, num_buckets=K),
                         dsir_bucket_counts(raw, num_buckets=K))
        out = dsir_scores(raw, w, K).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        dt = time.perf_counter() - t0
        wi, mir = dsir_mirror(df)
        assert np.array_equal(w, wi), "weight vector mismatch"
        assert len(out) == (~is_bench).sum()
        if n == n_small:
            pd.testing.assert_frame_equal(
                out[["doc_id", "dsir_score", "n_tokens"]].astype("int64"),
                mir[["doc_id", "dsir_score", "n_tokens"]].astype("int64"))
            tag = "EXACT vs pandas mirror"
        else:
            sample = out.sample(5000, random_state=1).set_index("doc_id")
            msam = mir.set_index("doc_id").loc[sample.index]
            assert (sample["dsir_score"] == msam["dsir_score"]).all()
            tag = "weights exact + 5k-doc sample exact"
        print(f"dsir  n={n:>9,}  wall={dt:7.2f}s  "
              f"rate={n / dt:>10,.0f} docs/s  [{tag}]")

        # ---- PMI ----
        sf = f"/tmp/rehearse_pmi_{n}"
        os.makedirs(sf, exist_ok=True)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(sf, "documents.parquet"))
        t0 = time.perf_counter()
        pmi = q_cooccur_pmi(sf)
        dt = time.perf_counter() - t0
        mir = pmi_mirror(df)
        pd.testing.assert_frame_equal(pmi, mir[pmi.columns])
        print(f"pmi   n={n:>9,}  wall={dt:7.2f}s  "
              f"rate={n / dt:>10,.0f} docs/s  [EXACT vs pandas mirror, "
              f"{len(pmi)} pairs]")

    ray.shutdown()


if __name__ == "__main__":
    main()
