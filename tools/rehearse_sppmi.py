"""SPPMI / TextRank pair-machinery scale rehearsal: Zipf-vocab random
docs (inverse-CDF sampling, vectorized) with a planted hub word
interleaved between every token in 1% of docs — the hub must rank in
the top 5% of TextRank nodes despite its 1% document frequency —
plus an EXACT analytic invariant: every L-token doc contributes
exactly sum_{o=1..W}(L-o) window pairs, so the total pair-occurrence
mass is known in closed form and must match sum(n) over the reduced
pair table to the unit.

    python tools/rehearse_sppmi.py [n_docs ...]    # default 200k, 1M

Per N prints {n, wall_pairs, wall_textrank, distinct_pairs,
docs_per_sec}; asserts the closed-form mass and the hub's structural rank
(top-5%% of nodes, above median).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

VOCAB = np.array([f"w{i}" for i in range(2000)])
_Z = 1.0 / np.arange(1, len(VOCAB) + 1)
CDF = np.cumsum(_Z / _Z.sum())
HUB = "hubword"
DOC_LEN = 40


def gen(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["id"].to_numpy()
    texts = []
    for i in ids:
        rng = np.random.RandomState(int(i) % 2**31)
        ws = VOCAB[np.searchsorted(CDF, rng.random(DOC_LEN))]
        if int(i) % 100 == 0:  # plant the hub between every token
            inter = np.empty(2 * DOC_LEN, dtype=object)
            inter[0::2] = ws
            inter[1::2] = HUB
            ws = inter
        texts.append(" ".join(ws))
    return pd.DataFrame({"doc_id": ids,
                         "text": pd.Series(texts, dtype="string")})


def run(n: int) -> dict:
    import ray.data as rd

    from fastobo_py_ray.pipelines.queries import _SPPMI_W
    from fastobo_py_ray.functions.relops import grouped_agg
    from fastobo_py_ray.stages.graph import pagerank

    src = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pandas").materialize()

    def pairs_batch(df):
        s = df["text"].astype(str).str.split(" ")
        lens = s.str.len().fillna(0).astype("int64").to_numpy()
        ids = np.repeat(df["doc_id"].to_numpy(), lens)
        toks = s.explode().to_numpy().astype("U")
        outs = []
        for o in range(1, _SPPMI_W + 1):
            if len(toks) <= o:
                break
            same = ids[:-o] == ids[o:]
            outs.append(pd.DataFrame({
                "w1": pd.Series(toks[:-o][same], dtype="string"),
                "w2": pd.Series(toks[o:][same], dtype="string")}))
        cat = pd.concat(outs, ignore_index=True)
        return cat.groupby(["w1", "w2"], as_index=False, sort=False,
                           observed=True).size() \
            .rename(columns={"size": "n"})

    t0 = time.perf_counter()
    cnt = grouped_agg(src.map_batches(pairs_batch,
                                      batch_format="pandas"),
                      ["w1", "w2"], n=("n", "sum")).materialize()
    n_pairs = cnt.count()
    mass = int(cnt.sum("n"))
    wall_pairs = time.perf_counter() - t0

    # closed-form pair mass: planted docs have 2*DOC_LEN tokens
    n_plant = len(range(0, n, 100))
    per = sum(DOC_LEN - o for o in range(1, _SPPMI_W + 1))
    per_p = sum(2 * DOC_LEN - o for o in range(1, _SPPMI_W + 1))
    expect = (n - n_plant) * per + n_plant * per_p
    assert mass == expect, (mass, expect)

    t0 = time.perf_counter()
    edges = cnt.map_batches(
        lambda df: pd.DataFrame({
            "src": pd.concat([df["w1"], df["w2"]],
                             ignore_index=True).astype(str),
            "dst": pd.concat([df["w2"], df["w1"]],
                             ignore_index=True).astype(str)}),
        batch_format="pandas")
    pr = pagerank(edges, num_iters=4).to_pandas()
    wall_tr = time.perf_counter() - t0
    pr = pr.sort_values(["rank_micro", "node"],
                        ascending=[False, True]).reset_index(drop=True)
    # at corpus scale the Zipf head saturates the unweighted graph
    # (top words tie), so the planted-hub check is structural, not
    # top-1: appearing in only 1% of docs, the hub must still land in
    # the top 5% of nodes (its interleaving links it to the whole
    # head) and strictly above the median rank
    hub_pos = int(pr.index[pr["node"] == HUB][0])
    assert hub_pos < max(1, len(pr) // 20), (hub_pos, len(pr))
    med = int(pr["rank_micro"].iloc[len(pr) // 2])
    assert int(pr.loc[hub_pos, "rank_micro"]) > med
    return {"n": n, "wall_pairs": round(wall_pairs, 1),
            "hub_pos": hub_pos,
            "wall_textrank": round(wall_tr, 1),
            "distinct_pairs": n_pairs,
            "docs_per_sec": int(n / (wall_pairs + wall_tr))}


def main() -> int:
    import ray

    ns = [int(x) for x in sys.argv[1:]] or [200_000, 1_000_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    for n in ns:
        print(json.dumps(run(n)), flush=True)
    print("closed-form pair mass + hub structural rank at every N")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
