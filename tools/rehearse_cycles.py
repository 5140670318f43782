"""cyclic_core scale rehearsal on a planted directed graph where the
exact answer is known analytically: C disjoint directed 4-cycles
(rings survive any trim), each ring node carrying one OUT-chain (a
DAG tail the out-trim peels leaf-inward) and one IN-chain (a source
tail the in-trim peels root-inward) of depth 3 — so convergence needs
several rounds and every tail node must vanish.

    python tools/rehearse_cycles.py [n_rings ...]   # default 20k, 100k

Per N prints {n_rings, nodes, edges, rounds_bound, wall, edges_per_sec};
asserts the core == ring nodes EXACTLY (count + id-math membership +
in/out degree both 1 — within the core each ring node keeps only its
ring edges).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

RING = 4        # nodes per planted directed cycle
TAIL = 3        # depth of each out-chain and in-chain


def gen(batch: pd.DataFrame) -> pd.DataFrame:
    """Edges for ring block c: ring ids c*100..c*100+3 (i -> i+1 mod
    RING), an out-chain c*100+10..+12 hanging off ring node 0, and an
    in-chain c*100+20..+22 feeding ring node 1 — deterministic,
    id-math verifiable."""
    out_s, out_d = [], []
    for c in batch["id"].to_numpy():
        base = int(c) * 100
        for i in range(RING):
            out_s.append(base + i)
            out_d.append(base + (i + 1) % RING)
        prev = base  # ring node 0 -> out-chain
        for i in range(TAIL):
            out_s.append(prev)
            out_d.append(base + 10 + i)
            prev = base + 10 + i
        prev = base + 20  # in-chain -> ring node 1
        for i in range(1, TAIL):
            out_s.append(prev)
            out_d.append(base + 20 + i)
            prev = base + 20 + i
        out_s.append(prev)
        out_d.append(base + 1)
    return pd.DataFrame({"src": pd.Series(out_s, dtype="int64"),
                         "dst": pd.Series(out_d, dtype="int64")})


def run(n_rings: int) -> dict:
    import ray.data as rd

    from fastobo_py_ray.stages.graph import cyclic_core

    edges = rd.range(n_rings, override_num_blocks=64).map_batches(
        gen, batch_format="pandas").materialize()
    n_edges = edges.count()

    t0 = time.perf_counter()
    core = cyclic_core(edges, max_rounds=12)
    wall = time.perf_counter() - t0
    # exact: every ring node (id % 100 < RING), nothing else, and
    # within the core only the ring edges remain -> degrees 1/1
    assert len(core) == n_rings * RING, (len(core), n_rings * RING)
    node = core["node"].to_numpy().astype("int64")
    assert (node % 100 < RING).all()
    assert (core["n_in"].to_numpy() == 1).all()
    assert (core["n_out"].to_numpy() == 1).all()
    return {"n_rings": n_rings,
            "nodes": n_rings * (RING + 2 * TAIL),
            "edges": n_edges,
            "wall": round(wall, 1),
            "edges_per_sec": int(n_edges / wall)}


def main() -> int:
    import ray

    ns = [int(x) for x in sys.argv[1:]] or [20_000, 100_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    for n in ns:
        print(json.dumps(run(n)), flush=True)
    print("planted cyclic core exact (membership + degrees) at every N")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
