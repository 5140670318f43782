"""Rehearse seeded_shuffle_shards / global_row_number at corpus scale:
the one exchange is a distributed sort on the md5 order key; positions
attach from sorted-block metadata (driver holds O(blocks) ints).

Asserts at each size:
  * pos is EXACTLY the permutation 0..N-1 (no second exchange drops or
    duplicates a block);
  * shard sizes are ntile-balanced (first N%S shards hold N//S+1);
  * shards are contiguous in pos order;
  * determinism: a differently-partitioned re-run yields identical
    (id, pos, shard) triples.

    python tools/rehearse_shuffle.py [n_small] [n_big] [n_shards]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.stages.traindata import seeded_shuffle_shards

    prev_rate = None
    for n in (n_small, n_big):
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
        ds = rd.from_pandas(df).repartition(64).materialize()
        t0 = time.perf_counter()
        out = seeded_shuffle_shards(ds, n_shards=n_shards)
        # consume distributed: per-shard (count, min pos, max pos)
        stats = out.map_batches(
            lambda b: b.groupby("shard", as_index=False)
            .agg(c=("pos", "size"), lo=("pos", "min"), hi=("pos", "max"),
                 ps=("pos", "sum")),
            batch_format="pandas").to_pandas() \
            .groupby("shard", as_index=False) \
            .agg(c=("c", "sum"), lo=("lo", "min"), hi=("hi", "max"),
                 ps=("ps", "sum"))
        dt = time.perf_counter() - t0
        rate = n / dt
        print(f"n={n:,}: shuffle+shard {dt:.2f}s = {rate:,.0f} rows/s "
              f"({n_shards} shards)")
        q, r = divmod(n, n_shards)
        sizes = stats.sort_values("shard")["c"].tolist()
        assert sizes == [q + 1] * r + [q] * (n_shards - r), "balance"
        # pos is exactly 0..N-1: total sum + per-shard contiguity
        assert int(stats["ps"].sum()) == n * (n - 1) // 2, "pos sum"
        s = stats.sort_values("shard").reset_index(drop=True)
        assert s.loc[0, "lo"] == 0 and s.loc[len(s) - 1, "hi"] == n - 1
        assert (s["hi"] - s["lo"] + 1 == s["c"]).all(), "contiguity"
        assert (s["lo"].to_numpy()[1:] ==
                s["hi"].to_numpy()[:-1] + 1).all(), "shard order"
        print(f"  balance + permutation + contiguity OK")
        if n == n_small:
            alt = seeded_shuffle_shards(
                rd.from_pandas(df).repartition(7).materialize(),
                n_shards=n_shards).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            base = out.to_pandas().sort_values("doc_id") \
                .reset_index(drop=True)
            assert base.equals(alt), "determinism across partitionings"
            print(f"  repartition determinism OK")
        if prev_rate is not None:
            print(f"  per-row rate ratio big/small = {rate/prev_rate:.2f}")
        prev_rate = rate
    ray.shutdown()


if __name__ == "__main__":
    main()
