"""Graph-extraction operator tests (reference docs/examples/graph.ipynb
semantics: DiGraph of is_a edges, DAG check, descendants subgraph)."""

import pandas as pd
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


def test_descendants_ds_max_frontier_guard(ray_session):
    """The driver-unioned expansion is bounded: exceeding max_frontier
    raises (pointing at the distributed CC path) instead of silently
    materializing a corpus-scale closure on the driver."""
    import pytest
    import ray.data as rd

    onto = load(MS_OBO).ontology
    edges = isa_edges(onto)
    ds = rd.from_arrow(pa.table({
        "subj": [c for c, _ in edges],
        "obj": [p for _, p in edges]}))
    with pytest.raises(ValueError, match="max_frontier"):
        descendants_ds(ds, ["MS:1000031"], max_frontier=5)


def test_pagerank_modes_match_dense_reference(ray_session):
    """Broadcast and join tiers both EXACTLY equal a pure-Python
    fixed-point power iteration (integer units of 1e-12), on a graph
    with a cycle, a dangling node, and a source-only node — and the
    integer result approximates true float PageRank."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import PAGERANK_UNIT, pagerank

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
    outdeg = [0] * n
    for s in edges["src"]:
        outdeg[ix[s]] += 1
    # pure-Python int reference (damping 0.85 = 17/20)
    U = PAGERANK_UNIT
    r = [U // n] * n
    fr = [1.0 / n] * n  # float shadow (no rounding)
    for _ in range(5):
        s = [0] * n
        fs = [0.0] * n
        for a, b in zip(edges["src"], edges["dst"]):
            s[ix[b]] += r[ix[a]] // outdeg[ix[a]]
            fs[ix[b]] += fr[ix[a]] / outdeg[ix[a]]
        mass = sum(r[i] for i in range(n) if outdeg[i] == 0)
        fmass = sum(fr[i] for i in range(n) if outdeg[i] == 0)
        r = [(3 * U) // (20 * n) + (17 * (s[i] + mass // n)) // 20
             for i in range(n)]
        fr = [0.15 / n + 0.85 * (fs[i] + fmass / n) for i in range(n)]

    assert got_b["node"].tolist() == nodes
    assert got_j["node"].tolist() == nodes
    # EXACT integer equality, both tiers
    assert got_b["rank_micro"].tolist() == r
    assert got_j["rank_micro"].tolist() == r
    # the quantized result tracks true float PageRank to ~1e-10
    assert np.allclose(got_b["rank"], fr, atol=1e-9)
    # total rank is conserved up to quantization floor-loss
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


def test_triangle_counts_crafted_graph(ray_session):
    """Known triangle structure incl. a hub: K4 on {1,2,3,4} (4
    triangles, 3 per node) plus a star around 1 (no extra triangles)
    plus the separate triangle {10,11,12}."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    star = [(1, n) for n in range(20, 26)]
    tri = [(10, 11), (10, 12), (11, 12)]
    edges = pd.DataFrame(k4 + star + tri, columns=["a", "b"])
    out = triangle_counts(rd.from_pandas(edges)) \
        .set_index("node")["n_tri"]
    assert out.to_dict() == {1: 3, 2: 3, 3: 3, 4: 3,
                             10: 1, 11: 1, 12: 1}


def test_triangle_counts_triangle_free_graph(ray_session):
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import triangle_counts

    edges = pd.DataFrame([(1, 2), (2, 3), (3, 4)], columns=["a", "b"])
    out = triangle_counts(rd.from_pandas(edges))
    assert out.empty and list(out.columns) == ["node", "n_tri"]


def test_pagerank_join_tier_single_bucket(ray_session):
    """num_buckets=1 exercises the num_returns=1 unwrap path (Ray
    returns ONE ref to the whole 1-tuple); result must be bit-equal to
    the broadcast tier."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import pagerank

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "c", "d", "e"],
        "dst": ["b", "c", "c", "a", "a", "b"]})
    ds = rd.from_pandas(edges)
    bc = pagerank(ds, num_iters=4, mode="broadcast").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    j1 = pagerank(rd.from_pandas(edges), num_iters=4, mode="join",
                  num_buckets=1).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, j1)


def test_adamic_adar_crafted_path_graph(ray_session, tmp_path):
    """3-doc path graph via controlled 3-gram Jaccard (X~Y and Y~Z at
    exactly 0.8, X~Z at 0.6 < threshold): the single wedge (X, Z)
    through center Y (deg 2) is a PREDICTED link — is_edge=0,
    aa = round(1e6/ln 2) — and no other pair has a common neighbor."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_adamic_adar

    docs = {1: "a b c d e f",        # grams {abc bcd cde def}
            2: "a b c d e f g",      # + efg -> J(X,Y) = 4/5
            3: "b c d e f g"}        # J(Y,Z) = 4/5, J(X,Z) = 3/5
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}),
        tmp_path / "documents.parquet")
    out = q_adamic_adar(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["doc_a"]), int(r["doc_b"])) == (1, 3)
    assert int(r["n_common"]) == 1
    assert int(r["is_edge"]) == 0
    assert int(r["aa_score"]) == round(1e6 / math.log(2))


def test_clustering_coef_crafted(ray_session, tmp_path):
    """Path graph X-Y-Z (from the adamic-adar fixture): all clustering
    coefficients 0 with correct degrees; adding a triangle doc makes a
    3-clique with coefficient 1.0 everywhere."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_clustering_coef

    # three identical docs = 3-clique; plus the path fixture docs
    tri_text = "p q r s t u v w"
    docs = {1: "a b c d e f", 2: "a b c d e f g", 3: "b c d e f g",
            10: tri_text, 11: tri_text, 12: tri_text}
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}),
        tmp_path / "documents.parquet")
    out = q_clustering_coef(str(tmp_path)).set_index("node")
    # path: only Y (doc 2) has degree 2, no triangle -> clustering 0
    assert int(out.loc[2, "degree"]) == 2
    assert float(out.loc[2, "clustering"]) == 0.0
    # clique: all three nodes degree 2, one triangle, clustering 1
    for n in (10, 11, 12):
        assert int(out.loc[n, "degree"]) == 2
        assert int(out.loc[n, "n_tri"]) == 1
        assert float(out.loc[n, "clustering"]) == 1.0


def test_harmonic_centrality_crafted_and_bfs_parity(ray_session):
    """harmonic_centrality_k on a path-plus-triangle fixture checked
    against hand values, then a random graph against a pure-Python BFS
    mirror (exact int64 micro weights at every node)."""
    import random
    from collections import deque

    import ray.data as rd

    from fastobo_py_ray.stages.graph import harmonic_centrality_k

    # path 1-2-3-4-5 and a disjoint triangle 10-11-12
    edges = pd.DataFrame({
        "a": [1, 2, 3, 4, 10, 10, 11],
        "b": [2, 3, 4, 5, 11, 12, 12]})
    out = harmonic_centrality_k(
        rd.from_pandas(edges).repartition(3), max_k=3).set_index("node")
    # path ends: one node at each distance 1..3
    for n in (1, 5):
        assert tuple(out.loc[n, ["n1", "n2", "n3"]]) == (1, 1, 1)
        assert int(out.loc[n, "harmonic_micro"]) == 1_833_333
    # path center: 2 at d1, 2 at d2, nothing at d3
    assert tuple(out.loc[3, ["n1", "n2", "n3"]]) == (2, 2, 0)
    assert int(out.loc[3, "harmonic_micro"]) == 3_000_000
    # triangle: everyone 1 hop away
    for n in (10, 11, 12):
        assert tuple(out.loc[n, ["n1", "n2", "n3"]]) == (2, 0, 0)
        assert int(out.loc[n, "harmonic_micro"]) == 2_000_000

    # random-graph BFS parity
    rng = random.Random(5)
    nodes = list(range(30))
    es = sorted({(min(a, b), max(a, b))
                 for a, b in (rng.sample(nodes, 2) for _ in range(45))})
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs_counts(src, k=3):
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            if dist[u] == k:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        ns = [sum(1 for d in dist.values() if d == i)
              for i in range(1, k + 1)]
        return ns, sum(n * (1_000_000 // (i + 1))
                       for i, n in enumerate(ns))

    got = harmonic_centrality_k(
        rd.from_pandas(pd.DataFrame(es, columns=["a", "b"]))
        .repartition(4), max_k=3).set_index("node")
    assert set(got.index) == set(adj)
    for n in adj:
        ns, h = bfs_counts(n)
        assert list(got.loc[n, ["n1", "n2", "n3"]]) == ns, n
        assert int(got.loc[n, "harmonic_micro"]) == h, n


def test_degree_assortativity_crafted(ray_session):
    """degree_assortativity: a star is perfectly disassortative
    (r = -1), a clique is degree-regular (den = 0 -> assort 0.0), and
    a mixed graph matches a pure-Python moment mirror."""
    import math

    import ray.data as rd

    from fastobo_py_ray.stages.graph import degree_assortativity

    def mirror(es):
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs = [(deg[a], deg[b]) for a, b in es] \
            + [(deg[b], deg[a]) for a, b in es]
        n = len(xs)
        sxy = sum(x * y for x, y in xs)
        sx = sum(x for x, _ in xs)
        sx2 = sum(x * x for x, _ in xs)
        num, den = n * sxy - sx * sx, n * sx2 - sx * sx
        if den == 0:
            return num, den, 0.0
        x = num / den
        return num, den, math.copysign(
            math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    star = [(1, i) for i in range(2, 8)]
    out = degree_assortativity(
        rd.from_pandas(pd.DataFrame(star, columns=["a", "b"]))
        .repartition(3)).iloc[0]
    assert float(out["assort"]) == -1.0
    assert int(out["n_dir_edges"]) == 12

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = degree_assortativity(
        rd.from_pandas(pd.DataFrame(clique, columns=["a", "b"]))
        .repartition(2)).iloc[0]
    assert int(out["den"]) == 0 and float(out["assort"]) == 0.0

    mixed = sorted(set(star + clique + [(7, 9), (9, 10), (2, 3)]))
    num, den, r = mirror(mixed)
    out = degree_assortativity(
        rd.from_pandas(pd.DataFrame(mixed, columns=["a", "b"]))
        .repartition(4)).iloc[0]
    assert (int(out["num"]), int(out["den"]),
            float(out["assort"])) == (num, den, r)


def test_kcore_crafted(ray_session):
    """kcore peeling: a lollipop (triangle + tail) keeps only the
    triangle at k=2; K4 + pendant keeps only K4 at k=3; a long path
    with a tiny round budget raises instead of silently truncating."""
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.graph import kcore

    lolli = pd.DataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], columns=["a", "b"])
    out = kcore(rd.from_pandas(lolli).repartition(3), k=2)
    assert out["node"].tolist() == [1, 2, 3]
    assert out["degree"].tolist() == [2, 2, 2]

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out3 = kcore(rd.from_pandas(
        pd.DataFrame(k4 + [(4, 9)], columns=["a", "b"])), k=3)
    assert out3["node"].tolist() == [1, 2, 3, 4]
    assert out3["degree"].tolist() == [3, 3, 3, 3]

    # 2-core of any tree is empty
    path = pd.DataFrame([(i, i + 1) for i in range(1, 8)],
                        columns=["a", "b"])
    assert kcore(rd.from_pandas(path), k=2).empty

    # the same path peels ~2 nodes/round: 2 rounds cannot converge
    with pytest.raises(ValueError, match="max_rounds"):
        kcore(rd.from_pandas(path), k=2, max_rounds=2)


def test_hits_matches_pure_python_reference(ray_session):
    """stages/graph.py:hits EXACTLY equals a pure-Python fixed-point
    mirror of the integer recurrence (1e-9 units, L-inf grid rescale)
    on a graph with a hub fan-out, an authority fan-in, a cycle, and a
    sink — and the structure is right: the fan-in node tops authority,
    the fan-out node tops hubs."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import HITS_UNIT, hits

    # h1,h2,h3 all point at "star"; h1 also at x; cycle x->y->x; y->sink
    edges = pd.DataFrame({
        "src": ["h1", "h2", "h3", "h1", "x", "y", "y"],
        "dst": ["star", "star", "star", "x", "y", "x", "sink"]})
    got = hits(rd.from_pandas(edges), num_iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)

    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    U = HITS_UNIT
    pairs = list(zip(edges["src"].map(ix), edges["dst"].map(ix)))

    def half(score, rev):
        raw = [0] * n
        for s, d in pairs:
            if rev:
                raw[s] += score[d]
            else:
                raw[d] += score[s]
        sc = max(1, max(raw) // U)
        return [v // sc for v in raw]

    hub = [U] * n
    for _ in range(4):
        auth = half(hub, rev=False)
        hub = half(auth, rev=True)

    assert got["node"].tolist() == nodes
    assert got["auth_nano"].tolist() == auth   # EXACT integer equality
    assert got["hub_nano"].tolist() == hub
    by = got.set_index("node")
    # structural: star is the top authority, h1 (two targets incl. the
    # star) is the top hub; pure sources have zero authority
    assert by["auth_nano"].idxmax() == "star"
    assert by["hub_nano"].idxmax() == "h1"
    assert by.loc[["h1", "h2", "h3"], "auth_nano"].tolist() == [0, 0, 0]
    assert by.loc["sink", "hub_nano"] == 0


def test_hits_max_nodes_guard(ray_session):
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.graph import hits

    ds = rd.from_pandas(pd.DataFrame({"src": list("abc"),
                                      "dst": list("bcd")}))
    with pytest.raises(ValueError, match="max_nodes"):
        hits(ds, max_nodes=2)


def test_personalized_pagerank_hand_values(ray_session):
    """PPR with seed {A} on A<->B (plus C->A, C unreachable): two
    hand-traced integer iterations — teleport mass lands ONLY on the
    seed, the non-seed B carries pure walk mass, and C (nothing points
    at it) stays exactly 0."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import personalized_pagerank

    edges = rd.from_pandas(pd.DataFrame({
        "src": ["A", "B", "C"], "dst": ["B", "A", "A"]}))
    out = personalized_pagerank(edges, ["A"], num_iters=2) \
        .to_pandas().set_index("node")
    # unit=1e12, d=17/20, tele_A=(3*1e12)//20=150e9
    # it1: A=150e9, B=(17*1e12)//20=850e9
    # it2: A=150e9+(17*850e9)//20=872_500_000_000, B=(17*150e9)//20
    assert int(out.loc["A", "rank_micro"]) == 872_500_000_000
    assert int(out.loc["B", "rank_micro"]) == 127_500_000_000
    assert int(out.loc["C", "rank_micro"]) == 0


def test_personalized_pagerank_dangling_returns_to_seeds(ray_session):
    """Dangling mass returns to the SEED set, not uniformly: A->B with
    B dangling and seed {A} — after one iteration B holds the walk
    mass; after two, B's mass has come back to A (teleport + dangling
    return), never leaking to B as uniform teleport would."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import personalized_pagerank

    edges = rd.from_pandas(pd.DataFrame({"src": ["A"], "dst": ["B"]}))
    out = personalized_pagerank(edges, ["A"], num_iters=2) \
        .to_pandas().set_index("node")
    # it1: mass(dangling B)=0; A=tele=150e9, B=(17*1e12)//20=850e9
    # it2: dangling mass = 850e9 returns to A only:
    #   A = 150e9 + (17*850e9)//20 = 872_500_000_000; B=(17*150e9)//20
    assert int(out.loc["A", "rank_micro"]) == 872_500_000_000
    assert int(out.loc["B", "rank_micro"]) == 127_500_000_000

    import pytest

    with pytest.raises(ValueError):
        personalized_pagerank(edges, ["ZZZ"], num_iters=1)


def test_cyclic_core_crafted(ray_session):
    """Trim-fixpoint semantics: a 3-cycle with a dangling tail keeps
    exactly the cycle (the tail peels inward one node per round); a
    bridge node BETWEEN two cycles survives (documented bracket
    semantics); a pure DAG trims to EMPTY (the is_a acyclicity QA)."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import cyclic_core

    # cycle a->b->c->a with tail c->d->e
    edges = rd.from_pandas(pd.DataFrame({
        "src": ["a", "b", "c", "c", "d"],
        "dst": ["b", "c", "a", "d", "e"]}))
    out = cyclic_core(edges)
    assert out["node"].tolist() == ["a", "b", "c"]
    assert out["n_in"].tolist() == [1, 1, 1]
    assert out["n_out"].tolist() == [1, 1, 1]

    # two cycles joined by a bridge x: a<->b -> x -> c<->d
    edges2 = rd.from_pandas(pd.DataFrame({
        "src": ["a", "b", "b", "x", "c", "d"],
        "dst": ["b", "a", "x", "c", "d", "c"]}))
    out2 = cyclic_core(edges2)
    assert out2["node"].tolist() == ["a", "b", "c", "d", "x"]

    # DAG: diamond a->b, a->c, b->d, c->d
    edges3 = rd.from_pandas(pd.DataFrame({
        "src": ["a", "a", "b", "c"],
        "dst": ["b", "c", "d", "d"]}))
    out3 = cyclic_core(edges3)
    assert len(out3) == 0

    import pytest

    with pytest.raises(ValueError):
        cyclic_core(edges, max_rounds=1)


def test_flow_cycles_transitions(ray_session, tmp_path):
    """q_flow_cycles transition derivation + core: user 1 walks
    A->B->A (edges A->B, B->A: a 2-cycle, multiplicity counted), user
    2 walks C->D (acyclic, trimmed); duplicate timestamps are pinned
    by the event_id tiebreak."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_flow_cycles

    ts = pd.Timestamp("2024-01-01")
    ev = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array([ts, ts, ts + pd.Timedelta(minutes=1),
                        ts, ts + pd.Timedelta(minutes=1)]),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["A", "B", "A", "C", "D"],
                               pa.string())})
    d = tmp_path / "flow"
    d.mkdir()
    pq.write_table(ev, d / "events.parquet")
    out = q_flow_cycles(str(d))
    assert out["node"].tolist() == ["A", "B"]
    assert out["n_in"].tolist() == [1, 1]
    assert out["n_out"].tolist() == [1, 1]


def test_cyclic_core_huge_int64_ids(ray_session):
    """Regression for the semi-join NA-widening hazard: 64-bit hash
    ids above 2^53 are NOT float64-representable, so without the
    declared cast= the iterative rounds would silently round them.
    A 3-cycle at 2^60+{1,2,3} with a tail must come back bit-exact."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import cyclic_core

    base = 1 << 60
    ids = [base + 1, base + 2, base + 3]
    edges = rd.from_pandas(pd.DataFrame({
        "src": pd.Series(ids + [ids[2]], dtype="int64"),
        "dst": pd.Series(ids[1:] + [ids[0], base + 7], dtype="int64")}))
    out = cyclic_core(edges)
    assert out["node"].tolist() == ids  # bit-exact, not 2^60 rounded
