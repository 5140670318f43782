"""simhash_pairs star-mode scale rehearsal (VERDICT r4 ask #1 closure):
re-run the r4 5M rehearsal corpus shape through the REDESIGNED operator
(identical signatures collapse before banding; output='star' emits O(m)
hub edges per clique) and verify coverage is MONOTONE in N — the r4
version silently dropped mega-cliques past max_bucket_size, so its pair
count went 78.0M @ 500k docs -> 6.2M @ 5M docs.  With the collapse +
star shape, every duplicated document must appear in exactly one clique
regardless of clique size, so covered-docs == docs-with-a-duplicate and
grows with N by construction of the generator.

    python tools/rehearse_simhash.py [n_docs ...]    # default 500k, 5M

Prints one line per N: {n, wall_sec, star_edges, covered_docs,
cliques, docs_per_sec}; asserts covered_docs is strictly increasing
across the given Ns.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def gen(batch: pd.DataFrame) -> pd.DataFrame:
    """Same modular duplicate-clique degenerate shape as the r4
    rehearsal: text repeats with period 50k, so at 5M docs each clique
    has ~100 members (mega-cliques by design — the shape that broke
    the r4 bucket cap)."""
    WORDS = np.array(
        ("key agg row scan slow fast table value part hash merge batch "
         "window spark order data column join small line customer query "
         "filter group sort index block page store read write card lamp "
         "green stone river cloud metal paper glass wheel").split())
    ids = batch["id"].to_numpy()
    texts = []
    for i in ids:
        rng = np.random.RandomState(int(i) % 50_000)
        texts.append(" ".join(WORDS[rng.randint(0, len(WORDS), size=60)]))
    return pd.DataFrame({"doc_id": ids,
                         "text": pd.Series(texts, dtype="string")})


def run(n: int) -> dict:
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import simhash_pairs

    t0 = time.perf_counter()
    src = rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pandas")
    edges = simhash_pairs(src, output="star").materialize()
    n_edges = edges.count()
    hubs = edges.groupby("doc_a").count().count()
    # covered docs = distinct endpoints (hub->member stars may also be
    # joined by cross-signature rep-rep edges, so count the union)
    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.unique(
            np.concatenate([df["doc_a"].to_numpy(),
                            df["doc_b"].to_numpy()]))})
    covered = (edges.map_batches(endpoints, batch_format="pandas")
               .groupby("node").count().count())
    wall = time.perf_counter() - t0
    return {"n": n, "wall_sec": round(wall, 1), "star_edges": n_edges,
            "covered_docs": covered, "cliques": hubs,
            "docs_per_sec": int(n / wall)}


def main() -> int:
    import ray

    ns = [int(x) for x in sys.argv[1:]] or [500_000, 5_000_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    rows = [run(n) for n in ns]
    for r in rows:
        print(json.dumps(r))
    cov = [r["covered_docs"] for r in rows]
    assert cov == sorted(cov) and len(set(cov)) == len(cov), \
        f"coverage NOT monotone in N: {cov}"
    print(f"coverage monotone in N: {cov}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
