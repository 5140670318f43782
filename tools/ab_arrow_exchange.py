"""A/B the grouped_map exchange block format (pandas vs pyarrow) on the
two corpus-text-heaviest exchanges (VERDICT r4 ask #5):

* passage_dedup — exploded passage text moves through TWO bucket
  exchanges (mark + reassemble);
* minhash_dedup — the candidate texts move through the verify exchange
  (the corpus join itself stays pandas either way).

Synthesizes a deterministic duplicate-heavy corpus, runs each variant
in the SAME Ray session interleaved (B A B A) to cancel host drift,
asserts value parity, and prints the rows for BASELINE.md.

    python tools/ab_arrow_exchange.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

WORDS = ("key agg row scan slow fast table value part hash merge batch "
         "window spark order data column join small line customer query "
         "filter group sort index block page store read write").split()


def corpus(n_docs: int) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    texts = []
    base_pool = [" ".join(rng.choice(WORDS, size=180))
                 for _ in range(max(64, n_docs // 50))]
    for i in range(n_docs):
        t = base_pool[i % len(base_pool)]
        if i % 3 == 0:            # perturb a third -> near-dups remain
            w = t.split(" ")
            w[i % len(w)] = f"tok{i % 11}"
            t = " ".join(w)
        texts.append(t)
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": pd.Series(texts, dtype="string")})


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.stages.dedup import minhash_dedup, passage_dedup

    df = corpus(n_docs)

    def run_passage(exchange: str):
        src = rd.from_pandas(df).repartition(32)
        t0 = time.time()
        out = passage_dedup(src, exchange=exchange).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return time.time() - t0, out

    def run_minhash(exchange: str):
        src = rd.from_pandas(df).repartition(32)
        t0 = time.time()
        out = minhash_dedup(src, exchange=exchange).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return time.time() - t0, out

    for name, fn in (("passage_dedup", run_passage),
                     ("minhash_dedup", run_minhash)):
        times = {"pandas": [], "pyarrow": []}
        ref = {}
        for _ in range(2):
            for ex in ("pyarrow", "pandas"):
                dt, out = fn(ex)
                times[ex].append(dt)
                if ex in ref:
                    pd.testing.assert_frame_equal(
                        ref[ex], out, check_dtype=False)
                ref[ex] = out
        pd.testing.assert_frame_equal(ref["pandas"], ref["pyarrow"],
                                      check_dtype=False)
        pdt = min(times["pandas"])
        pat = min(times["pyarrow"])
        print(f"{name} n={n_docs}: pandas {times['pandas']} "
              f"pyarrow {times['pyarrow']} -> best {pdt:.1f}s vs "
              f"{pat:.1f}s ({pdt / pat:.2f}x, parity OK)")
    ray.shutdown()


if __name__ == "__main__":
    main()
