"""Scale rehearsal for the round-5 additions boilerplate_stats and
jaccard_topk_neighbors on planted corpora with closed-form answers.

    python tools/rehearse_boilerplate_knn.py [n_docs ...]   # default 1M

Boilerplate leg: every doc of host h starts with the SAME 2-word
passage ("nav{h} bar{h}") followed by doc-unique filler passages — the
exact expectation is n_bp == 1 and n_passages == P for EVERY doc, so
coverage is verified to the row (no sampling), plus one host kept
below min_docs must contribute zero boilerplate.

KNN leg (n_docs // 5): docs come in disjoint 4-cliques with
group-private vocabulary — each doc's top-3 neighbors are EXACTLY its
3 group-mates (cross-group jaccard 0 never enters the pair table), so
both the row count (4*3*G) and membership are closed-form.  The pair
table is group-bounded (6 pairs per group), the shape that keeps the
inverted-index exchange linear in the corpus.

Prints one JSON line per N with wall times and docs/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

HOSTS = 1000
FILLER = 6          # unique filler passages per doc (W=2 words each)
SMALL_HOST_DOCS = 2  # host "cold" has 2 docs: below min_docs=3
GROUP = 4           # docs per planted KNN clique
GTOK = 20           # shared tokens per group


def gen_bp(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["id"].to_numpy()
    host = np.where(ids < SMALL_HOST_DOCS, -1, ids % HOSTS)
    texts = []
    for i, h in zip(ids, host):
        hh = "cold" if h < 0 else str(h)
        parts = [f"nav{hh} bar{hh}"]
        parts += [f"u{i}p{j} v{i}p{j}" for j in range(FILLER)]
        texts.append(" ".join(parts))
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "source": pd.Series(
            np.where(host < 0, "cold", host.astype(str)).astype(object),
            dtype="string"),
        "text": pd.Series(texts, dtype="string")})


def gen_knn(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["id"].to_numpy()
    g = ids // GROUP
    texts = []
    for i, gg in zip(ids, g):
        toks = [f"g{gg}t{k}" for k in range(GTOK)] + [f"m{i}"]
        texts.append(" ".join(toks))
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "text": pd.Series(texts, dtype="string")})


def run(n_docs: int) -> dict:
    import ray
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import (boilerplate_stats,
                                             jaccard_topk_neighbors)

    res = {"n_docs": n_docs}

    # ---- boilerplate leg -------------------------------------------------
    docs = rd.range(n_docs).map_batches(gen_bp, batch_format="pandas")
    t0 = time.perf_counter()
    out = boilerplate_stats(docs, passage_words=2, min_docs=3) \
        .to_pandas()
    res["wall_bp"] = round(time.perf_counter() - t0, 1)
    assert len(out) == n_docs, (len(out), n_docs)
    npass = 1 + FILLER
    assert (out["n_passages"] == npass).all()
    cold = out["doc_id"] < SMALL_HOST_DOCS
    # the 2-doc host never reaches min_docs=3 -> zero boilerplate there
    assert (out.loc[cold, "n_bp"] == 0).all()
    assert (out.loc[~cold, "n_bp"] == 1).all()
    assert (out.loc[~cold, "bp_milli"] == 1000 // npass).all()
    res["docs_per_sec_bp"] = int(n_docs / res["wall_bp"])

    # ---- knn leg ---------------------------------------------------------
    n_knn = max(GROUP, (n_docs // 5) // GROUP * GROUP)
    res["n_docs_knn"] = n_knn
    docs2 = rd.range(n_knn).map_batches(gen_knn, batch_format="pandas")
    t0 = time.perf_counter()
    knn = jaccard_topk_neighbors(docs2, topk=3).to_pandas()
    res["wall_knn"] = round(time.perf_counter() - t0, 1)
    assert len(knn) == n_knn * (GROUP - 1), (len(knn), n_knn)
    # membership: every neighbor is a group-mate (id-math, all rows)
    assert (knn["doc_id"].to_numpy() // GROUP
            == knn["nbr"].to_numpy() // GROUP).all()
    # each doc has exactly GROUP-1 neighbors ranked 1..3
    per = knn.groupby("doc_id")["rnk"].agg(["size", "min", "max"])
    assert (per["size"] == GROUP - 1).all()
    assert (per["min"] == 1).all() and (per["max"] == GROUP - 1).all()
    res["docs_per_sec_knn"] = int(n_knn / res["wall_knn"])
    return res


def main() -> None:
    import ray

    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    for n in sizes:
        print(json.dumps(run(n)), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
