"""winnow_overlap_pairs corpus-scale rehearsal: generate N random
60-word docs with a planted near-dup twin every 1000 docs (the twin
shares a 30-word prefix -> hundreds of shared chars >> w+k-1, so by
the winnowing guarantee every planted pair MUST surface), run the
MOSS-style overlap operator with the stop-fingerprint cap active, and
verify exact planted recovery plus throughput.

    python tools/rehearse_winnow.py [n_docs ...]    # default 100k, 500k

Prints one line per N: {n, wall_sec, pairs, planted, recovered,
min_planted_shared, docs_per_sec}; asserts recovered == planted at
every N (the cap may drop Zipf-hot boilerplate grams but never the
pair-unique planted prefixes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

WORDS = np.array(
    ("key agg row scan slow fast table value part hash merge batch "
     "window spark order data column join small line customer query "
     "filter group sort index block page store read write card lamp "
     "green stone river cloud metal paper glass wheel").split())


def gen(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["id"].to_numpy()
    texts = []
    for i in ids:
        i = int(i)
        if i % 1000 <= 1:  # planted twin pair (i0, i0+1)
            # pair-UNIQUE prefix tokens: their grams live in exactly 2
            # docs, so the stop cap can never eat the planted signal
            # (common-vocab grams ARE capped — that's the point)
            base = i - (i % 1000)
            prefix = [f"p{base}q{j}" for j in range(30)]
            rt = np.random.RandomState((i * 7 + (i % 1000)) % 2**31)
            tail = list(WORDS[rt.randint(0, len(WORDS), size=30)])
            texts.append(" ".join(prefix + tail))
        else:
            rng = np.random.RandomState(i % 2**31)
            texts.append(" ".join(WORDS[rng.randint(0, len(WORDS),
                                                    size=60)]))
    return pd.DataFrame({"doc_id": ids,
                         "text": pd.Series(texts, dtype="string")})


def run(n: int) -> dict:
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import winnow_overlap_pairs

    t0 = time.perf_counter()
    src = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pandas")
    out = winnow_overlap_pairs(src, k=8, w=4, min_shared=2,
                               max_doc_freq=50).materialize()
    n_pairs = out.count()

    # planted recovery: (b, b+1) for every b = 0, 1000, 2000, ...
    planted = {(b, b + 1) for b in range(0, n - 1, 1000)}

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["doc_b"] - df["doc_a"] == 1) & (df["doc_a"] % 1000 == 0)
        return df[m][["doc_a", "doc_b", "n_shared"]]

    got = out.map_batches(hits, batch_format="pandas").to_pandas()
    rec = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    wall = time.perf_counter() - t0
    return {"n": n, "wall_sec": round(wall, 1), "pairs": n_pairs,
            "planted": len(planted), "recovered": len(planted & rec),
            "min_planted_shared": int(got["n_shared"].min())
            if len(got) else 0,
            "docs_per_sec": int(n / wall)}


def main() -> int:
    import ray

    ns = [int(x) for x in sys.argv[1:]] or [100_000, 500_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    rows = [run(n) for n in ns]
    ok = True
    for r in rows:
        print(json.dumps(r))
        ok &= r["recovered"] == r["planted"]
    assert ok, "planted near-dup pairs NOT fully recovered"
    print("planted recovery exact at every N")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
