"""Rehearse edit_distance_pairs at realistic vocabulary scale: the
FastSS claim is one variant-keyed exchange over <= sum C(len,i)
delete variants per word and a bounded chunked DP verify.  Generate a
vocabulary of random words plus PLANTED close pairs (1-2 edits), run
the self-join, verify every planted pair is recovered (completeness
is provable, so a miss is a bug) and report walls + exchange sizes.

    python tools/rehearse_editdist.py [n_words] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.stages.dedup import edit_distance_pairs

    rng = np.random.default_rng(13)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    base = sorted({"".join(rng.choice(alphabet, size=rng.integers(5, 11)))
                   for _ in range(int(n_words * 1.2))})[:n_words]

    # plant close variants of a sample of base words
    n_plant = min(2_000, n_words // 10)
    planted = []
    for w in rng.choice(np.asarray(base, dtype=object), size=n_plant,
                        replace=False):
        w = str(w)
        edits = int(rng.integers(1, k + 1))
        v = w
        for _ in range(edits):
            i = int(rng.integers(0, len(v)))
            op = int(rng.integers(0, 3))
            c = str(rng.choice(alphabet))
            if op == 0 and len(v) > 1:      # delete
                v = v[:i] + v[i + 1:]
            elif op == 1:                   # substitute
                v = v[:i] + c + v[i + 1:]
            else:                           # insert
                v = v[:i] + c + v[i:]
        if v != w:
            planted.append((min(w, v), max(w, v)))
    vocab = sorted(set(base) | {p[1] for p in planted} |
                   {p[0] for p in planted})
    print(f"vocab={len(vocab)} planted_pairs={len(set(planted))} k={k}")

    ds = rd.from_pandas(pd.DataFrame(
        {"token": pd.Series(vocab, dtype="string")})).repartition(32) \
        .materialize()
    t0 = time.perf_counter()
    pairs = edit_distance_pairs(ds, "token", k=k).to_pandas()
    wall = time.perf_counter() - t0
    got = set(zip(pairs["a"].astype(str), pairs["b"].astype(str)))
    missed = set(planted) - got
    print(f"pairs_found={len(pairs)} wall={wall:.2f}s "
          f"({len(vocab) / wall:,.0f} words/s)")
    print(f"planted recovered: {len(set(planted)) - len(missed)}"
          f"/{len(set(planted))} (missed={len(missed)})")
    assert not missed, f"completeness violated: {list(missed)[:5]}"

    # bipartite sibling: corpus-vocab side vs a dictionary side made of
    # the planted variants (every planted (w, v) must be recovered
    # across sides, whichever side each string landed on)
    from fastobo_py_ray.stages.dedup import edit_distance_join

    dict_words = sorted({p[0] for p in planted} | {p[1] for p in planted})
    rds = rd.from_pandas(pd.DataFrame(
        {"word": pd.Series(dict_words, dtype="string")})).repartition(8) \
        .materialize()
    t0 = time.perf_counter()
    jp = edit_distance_join(ds, rds, "token", "word", k=k).to_pandas()
    jwall = time.perf_counter() - t0
    jgot = set(zip(jp["left"].astype(str), jp["right"].astype(str)))
    jmissed = {(a, b) for a, b in planted
               if (a, b) not in jgot and (b, a) not in jgot}
    print(f"join: dict={len(dict_words)} pairs_found={len(jp)} "
          f"wall={jwall:.2f}s; planted recovered across sides: "
          f"{len(set(planted)) - len(jmissed)}/{len(set(planted))}")
    assert not jmissed, f"join completeness violated: {list(jmissed)[:5]}"
    ray.shutdown()


if __name__ == "__main__":
    main()
