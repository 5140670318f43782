"""Rehearse the duplicated-substring family at corpus scale: generate a
duplication-heavy corpus (random per-doc text with P planted passages,
each shared by a known set of docs), run :func:`dup_substring_grams` at
two sizes and assert

  * EXACT planted recovery: every interior window of every planted
    passage is reported with n_docs == the planted assignment count;
  * EXACT inventory (small size): an independent plain-Python recount
    of every reported gram over the whole corpus must reproduce both
    counts — this also vouches for the "extra" grams beyond the planted
    set, which are REAL: straddle windows where two carriers of the
    same passage drew the same 1-2 random context chars next to it
    (expected ~ passages * C(carriers,2) * 2/26 of them);
  * throughput scales: per-doc rate holds or improves at 5x docs
    (pass-1 traffic is windows x 16 B; pass-2 is output-bounded).

Also times :func:`dup_substring_coverage` and
:func:`exact_substr_removal` at the small size (their broadcast
inventory is planted-window-scale by construction) and asserts the
removal invariant: no reported duplicated gram survives in any cleaned
text.

    python tools/rehearse_dup_substrings.py [n_small] [n_big] [n_passages]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

GRAM = 20
PASSAGE_CHARS = 48          # 29 interior windows per occurrence
DOC_CHARS = 200
SHARE_FRAC = 0.05           # docs carrying a planted passage


def rand_strings(rng: np.random.Generator, n: int, length: int):
    codes = rng.integers(97, 123, size=(n, length), dtype=np.uint8)
    return [bytes(row).decode("ascii") for row in codes]


def make_corpus(n_docs: int, passages: list, rng: np.random.Generator):
    import ray.data as rd

    texts = rand_strings(rng, n_docs, DOC_CHARS)
    n_shared = int(n_docs * SHARE_FRAC)
    carriers = rng.choice(n_docs, size=n_shared, replace=False)
    assign = rng.integers(0, len(passages), size=n_shared)
    counts = np.bincount(assign, minlength=len(passages))
    for d, p in zip(carriers, assign):
        t = texts[d]
        ins = int(rng.integers(0, DOC_CHARS - 1))
        texts[d] = t[:ins] + passages[p] + t[ins:]
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(64).materialize(), counts


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_passages = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.stages.dedup import (dup_substring_coverage,
                                             dup_substring_grams,
                                             exact_substr_removal)

    rng = np.random.default_rng(11)
    passages = rand_strings(rng, n_passages, PASSAGE_CHARS)
    interior = {p[i:i + GRAM]: k for k, p in enumerate(passages)
                for i in range(PASSAGE_CHARS - GRAM + 1)}
    print(f"passages={n_passages}, interior windows={len(interior)}")

    prev_rate = None
    for n_docs in (n_small, n_big):
        ds, counts = make_corpus(n_docs, passages, rng)
        t0 = time.perf_counter()
        inv = dup_substring_grams(ds, gram_len=GRAM).to_pandas()
        dt = time.perf_counter() - t0
        rate = n_docs / dt
        n_windows = n_docs * (DOC_CHARS - GRAM + 1) \
            + int(n_docs * SHARE_FRAC) * PASSAGE_CHARS
        print(f"n_docs={n_docs:,}: grams {dt:.2f}s = {rate:,.0f} docs/s "
              f"(~{n_windows / dt / 1e6:,.1f}M windows/s), "
              f"inventory {len(inv):,} grams")
        got = dict(zip(inv["gram"], inv["n_docs"]))
        missing = wrong = 0
        for g, k in interior.items():
            if counts[k] >= 2:
                if g not in got:
                    missing += 1
                elif got[g] != counts[k]:
                    wrong += 1
        extra = sum(1 for g in got if g not in interior)
        planted = sum(1 for g, k in interior.items() if counts[k] >= 2)
        print(f"  planted recovery: {planted - missing}/{planted} "
              f"exact-count miss={wrong} boundary-luck extras={extra}")
        assert missing == 0 and wrong == 0
        if n_docs == n_small:
            # independent recount of EVERY reported gram: plain-Python
            # window scan, no shared code with the hash path
            from collections import Counter, defaultdict
            occ: Counter = Counter()
            dcs: defaultdict = defaultdict(set)
            gset = set(got)
            for b in ds.iter_batches(batch_size=4096,
                                     batch_format="pandas"):
                for did, t in zip(b["doc_id"], b["text"]):
                    for i in range(len(t) - GRAM + 1):
                        w = t[i:i + GRAM]
                        if w in gset:
                            occ[w] += 1
                            dcs[w].add(did)
            n_occ_got = dict(zip(inv["gram"], inv["n_occ"]))
            bad = [g for g in gset
                   if occ[g] != n_occ_got[g] or len(dcs[g]) != got[g]]
            print(f"  independent recount: {len(gset) - len(bad)}"
                  f"/{len(gset)} grams exact")
            assert not bad
        if prev_rate is not None:
            print(f"  per-doc rate ratio big/small = {rate / prev_rate:.2f}")
        prev_rate = rate
        if n_docs == n_small:
            t0 = time.perf_counter()
            cov = dup_substring_coverage(ds, gram_len=GRAM)
            n_flagged = cov.map_batches(
                lambda df: pd.DataFrame(
                    {"n": [int((df["n_dup_windows"] > 0).sum())]}),
                batch_format="pandas").to_pandas()["n"].sum()
            dt = time.perf_counter() - t0
            n_carriers = int(n_docs * SHARE_FRAC)
            print(f"  coverage {dt:.2f}s = {n_docs / dt:,.0f} docs/s; "
                  f"docs with dup spans {int(n_flagged):,} "
                  f"(carriers of >=2-doc passages <= {n_carriers:,})")
            t0 = time.perf_counter()
            clean = exact_substr_removal(ds, gram_len=GRAM)
            gset2 = set(got)

            def survivors(df):
                n = sum(1 for t in df["clean_text"]
                        for i in range(len(t) - GRAM + 1)
                        if t[i:i + GRAM] in gset2)
                return pd.DataFrame({"n": [n]})

            n_surv = clean.map_batches(
                survivors, batch_format="pandas").to_pandas()["n"].sum()
            dt = time.perf_counter() - t0
            print(f"  removal {dt:.2f}s = {n_docs / dt:,.0f} docs/s "
                  f"(incl. survivor scan); dup grams surviving in "
                  f"cleaned text: {int(n_surv)}")
            assert n_surv == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
