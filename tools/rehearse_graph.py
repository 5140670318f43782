"""kcore + harmonic_centrality_k scale rehearsal on a planted-structure
graph where the exact answer is known analytically: C disjoint
5-cliques (every node degree 4, survives any k<=4 core) wired to long
chains (degree <=2, peeled by the 2-core; contribute exact n1/n2/n3
counts to harmonic centrality).

    python tools/rehearse_graph.py [n_cliques ...]   # default 20k, 100k

Per N prints {n_cliques, nodes, edges, wall_kcore, wall_harmonic,
edges_per_sec_kcore}; asserts 2-core == clique nodes EXACTLY (count +
membership sample + in-core degree 4) and spot-checks harmonic counts
on clique nodes (n1=4, n2=0, n3=0 — cliques are disjoint) and chain
interiors (n1=2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

CLIQUE = 5      # nodes per planted clique
CHAIN = 6       # nodes per chain segment


def gen(batch: pd.DataFrame) -> pd.DataFrame:
    """Edges for clique block c (node ids c*100 .. c*100+4) and a
    disjoint chain (ids c*100+10 .. c*100+15): deterministic, id-math
    verifiable."""
    out_a, out_b = [], []
    for c in batch["id"].to_numpy():
        base = int(c) * 100
        for i in range(CLIQUE):
            for j in range(i + 1, CLIQUE):
                out_a.append(base + i)
                out_b.append(base + j)
        for i in range(CHAIN - 1):
            out_a.append(base + 10 + i)
            out_b.append(base + 11 + i)
    return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                         "b": pd.Series(out_b, dtype="int64")})


def run(n_cliques: int) -> dict:
    import ray.data as rd

    from fastobo_py_ray.stages.graph import harmonic_centrality_k, kcore

    edges = rd.range(n_cliques, override_num_blocks=64).map_batches(
        gen, batch_format="pandas").materialize()
    n_edges = edges.count()

    t0 = time.perf_counter()
    core = kcore(edges, k=2)
    wall_k = time.perf_counter() - t0
    # exact: every clique node (id % 100 < CLIQUE), nothing else
    assert len(core) == n_cliques * CLIQUE, (len(core),
                                             n_cliques * CLIQUE)
    assert (core["node"].to_numpy() % 100 < CLIQUE).all()
    assert (core["degree"].to_numpy() == CLIQUE - 1).all()

    t0 = time.perf_counter()
    h = harmonic_centrality_k(edges, max_k=3).set_index("node")
    wall_h = time.perf_counter() - t0
    # clique nodes: everyone at distance 1, nothing beyond
    for c in (0, n_cliques // 2, n_cliques - 1):
        n1, n2, n3 = (int(h.loc[c * 100, x]) for x in ("n1", "n2", "n3"))
        assert (n1, n2, n3) == (CLIQUE - 1, 0, 0), (c, n1, n2, n3)
        # chain interior node base+12: 2 at d1, 2 at d2, 1+0/1 at d3
        n1i = int(h.loc[c * 100 + 12, "n1"])
        assert n1i == 2, (c, n1i)
    return {"n_cliques": n_cliques,
            "nodes": n_cliques * (CLIQUE + CHAIN),
            "edges": n_edges,
            "wall_kcore": round(wall_k, 1),
            "wall_harmonic": round(wall_h, 1),
            "edges_per_sec_kcore": int(n_edges / wall_k)}


def main() -> int:
    import ray

    ns = [int(x) for x in sys.argv[1:]] or [20_000, 100_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    for n in ns:
        print(json.dumps(run(n)), flush=True)
    print("planted 2-core exact + harmonic spot checks at every N")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
