"""Rehearse dedup_triples' two reduce tiers at >=10^6 DISTINCT triples
(VERDICT r4 ask #3): measure the sort-groupby dispatch wall vs the
grouped_agg + explicit-sort tier on the same synthetic open-world
triple stream, assert value parity on counts, and print the numbers
for BASELINE.md.

    python tools/rehearse_dedup_tiers.py [n_distinct] [evidence_per]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_distinct = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ev_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from fastobo_py_ray.pipelines.kg import dedup_triples

    n_rows = n_distinct * ev_per

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        t = i % n_distinct                    # triple id; ev_per copies
        return pd.DataFrame({
            "subj": pd.Series(t // 64, dtype="int64").map(
                lambda x: f"E:{x}"),
            "pred": pd.Series(t % 7, dtype="int64").map(
                lambda x: f"rel{x}"),
            "obj": pd.Series(t % 64, dtype="int64").map(
                lambda x: f"V:{x}"),
            "url": pd.Series(i % 997, dtype="int64").map(
                lambda x: f"https://site{x}.example/doc"),
            "confidence": (0.5 + (i % 50) / 100.0).astype("float32")})

    results = {}
    for tier in ("grouped_agg", "sort_groupby"):
        src = rd.range(n_rows).map_batches(gen, batch_format="pandas")
        t0 = time.time()
        out = dedup_triples(src, collect_urls=2, scale_tier=tier)
        n = out.count()
        dt = time.time() - t0
        results[tier] = (n, dt)
        print(f"{tier}: {n} distinct triples in {dt:.1f}s "
              f"({n / dt / 1000:.0f}k triples/s reduce)")
    (n_a, _), (n_b, _) = results.values()
    assert n_a == n_b == min(n_distinct, n_rows), results
    sg, ga = results["sort_groupby"][1], results["grouped_agg"][1]
    print(f"n_distinct={n_distinct} evidence_per={ev_per}: "
          f"sort_groupby {sg:.1f}s vs grouped_agg {ga:.1f}s "
          f"-> {sg / ga:.2f}x")
    ray.shutdown()


if __name__ == "__main__":
    main()
