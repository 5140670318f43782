"""Rehearse the BPE pipeline at corpus scale: the vocab-tier claim is
that training cost is corpus-INDEPENDENT (the corpus only pays the
word-count combiner) and encode throughput is Zipf-cheap (unique words
per batch, memoized per worker).  Generate a Zipf corpus at two sizes
over the SAME vocabulary, then measure (a) word-count reduction wall,
(b) merge-training wall (should be ~constant across corpus sizes),
(c) per-doc encode throughput (should hold or improve with scale).

    python tools/rehearse_bpe.py [n_docs_small] [n_docs_big] [vocab]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_corpus(n_docs: int, vocab: list, rng: np.random.Generator,
                words_per_doc: int = 40):
    import ray.data as rd

    # Zipf-ranked draw over the fixed vocabulary
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    idx = rng.choice(len(vocab), size=(n_docs, words_per_doc), p=p)
    va = np.asarray(vocab, dtype=object)
    texts = [" ".join(va[r]) for r in idx]
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(64).materialize()


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.stages.textstats import (bpe_token_counts,
                                                 bpe_train_from_counts,
                                                 word_counts)

    rng = np.random.default_rng(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab = sorted({"".join(rng.choice(list(alphabet),
                                       size=rng.integers(3, 10)))
                    for _ in range(int(n_vocab * 1.3))})[:n_vocab]
    print(f"vocab={len(vocab)}")

    prev_merges = None
    for n_docs in (n_small, n_big):
        ds = make_corpus(n_docs, vocab, rng)
        t0 = time.perf_counter()
        wc = word_counts(ds).to_pandas()
        t_wc = time.perf_counter() - t0
        t0 = time.perf_counter()
        merges = bpe_train_from_counts(wc["word"].astype(str).tolist(),
                                       wc["cnt"].to_numpy(), 200)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = bpe_token_counts(ds, merges) \
            .map_batches(lambda df: pd.DataFrame(
                {"s": [df["n_tokens"].sum()]}), batch_format="pandas") \
            .to_pandas()["s"].sum()
        t_enc = time.perf_counter() - t0
        print(f"n_docs={n_docs}: word_counts {t_wc:.2f}s "
              f"(vocab rows {len(wc)}), train(200) {t_train:.2f}s, "
              f"encode {t_enc:.2f}s = {n_docs / t_enc:,.0f} docs/s "
              f"({int(n):,} tokens)")
        if prev_merges is not None:
            a = set(map(tuple, prev_merges[["left", "right"]].values))
            b = set(map(tuple, merges[["left", "right"]].values))
            print(f"  merge-set overlap across corpus sizes: "
                  f"{len(a & b)}/{len(b)} (tail ranks drift with "
                  f"finite-draw count noise; head merges are stable)")
        prev_merges = merges
    ray.shutdown()


if __name__ == "__main__":
    main()
