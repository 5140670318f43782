"""Graph-extraction operator tests (reference docs/examples/graph.ipynb
semantics: DiGraph of is_a edges, DAG check, descendants subgraph)."""

import pyarrow as pa

from fastobo_py_ray.obo import load, loads
from fastobo_py_ray.stages.graph import (ancestors, descendants,
                                         descendants_ds, is_dag, isa_edges)
from fastobo_py_ray.testing.corpus import MINI_OBO

MS_OBO = "/root/reference/tests/data/ms.obo"


def test_mini_dag_and_descendants():
    onto = loads(MINI_OBO).ontology
    edges = isa_edges(onto)
    assert is_dag(edges)
    desc = descendants(edges, "TST:0000002")
    assert {"TST:0000001", "TST:0000004", "TST:0000006",
            "TST:0000007"} <= desc
    assert ancestors(edges, "TST:0000001") == {"TST:0000002"}
    # a cycle is detected
    assert not is_dag(edges + [("TST:0000002", "TST:0000001")])


def test_ms_obo_graph_goldens():
    onto = load(MS_OBO).ontology
    edges = isa_edges(onto)
    assert len(edges) == 2896  # grep golden (BASELINE.md)
    assert is_dag(edges)
    # MS:1000031 "instrument model" is a large subtree in ms.obo
    sub = descendants(edges, "MS:1000031")
    assert len(sub) > 100
    assert all(isinstance(x, str) for x in sub)


def test_distributed_descendants_matches_driver(ray_session):
    import ray.data as rd

    onto = load(MS_OBO).ontology
    edges = isa_edges(onto)
    ds = rd.from_arrow(pa.table({
        "subj": [c for c, _ in edges],
        "obj": [p for _, p in edges]})).repartition(6)
    for root in ("MS:1000031", "MS:0000000"):
        assert descendants_ds(ds, [root]) == descendants(edges, root)


def test_pagerank_modes_match_dense_reference(ray_session):
    """Broadcast and join tiers both equal a dense numpy power
    iteration with the same per-iteration rounding, on a graph with a
    cycle, a dangling node, and a source-only node."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import pagerank

    edges = pd.DataFrame({"src": list("aabbce"),
                          "dst": list("bccdda")})
    ds = rd.from_pandas(edges)
    got_b = pagerank(ds, num_iters=5, mode="broadcast").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got_j = pagerank(ds, num_iters=5, mode="join").to_pandas() \
        .sort_values("node").reset_index(drop=True)

    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s in edges["src"]:
        outdeg[ix[s]] += 1
    r = np.round(np.full(n, 1 / n), 10)
    for _ in range(5):
        s = np.zeros(n)
        for a, b in zip(edges["src"], edges["dst"]):
            s[ix[b]] += r[ix[a]] / outdeg[ix[a]]
        mass = r[outdeg == 0].sum()
        r = np.round((1.0 - 0.85) / n + 0.85 * (s + mass / n), 10)

    assert got_b["node"].tolist() == nodes
    assert got_j["node"].tolist() == nodes
    assert np.allclose(got_b["rank"], r, atol=1e-12)
    assert np.allclose(got_j["rank"], r, atol=1e-12)
    # total rank is conserved (teleport + dangling redistribution)
    assert abs(got_b["rank"].sum() - 1.0) < 1e-6


def test_pagerank_broadcast_guard(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.graph import pagerank

    ds = rd.from_pandas(pd.DataFrame({"src": ["a", "b"],
                                      "dst": ["b", "c"]}))
    with pytest.raises(ValueError, match="mode='join'"):
        pagerank(ds, max_nodes=2, mode="broadcast")
