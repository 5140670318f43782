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
