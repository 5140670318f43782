"""Ontology / adjacency graph operators — the engine form of the
reference's graph extraction pattern (``/root/reference/docs/examples/
graph.ipynb``: build a DiGraph of ``is_a`` edges, check it is a DAG, take
a descendants subgraph).

Two tiers, same semantics:

* driver-side (:func:`is_dag`, :func:`descendants`, :func:`ancestors`) —
  ontology-scale edge sets (thousands), pure Python BFS/Kahn;
* distributed (:func:`descendants_ds`) — corpus-scale adjacency
  Datasets: iterative frontier expansion where the (small) frontier is
  broadcast via ``ray.put`` each round and the edge Dataset is filtered
  with a vectorized mask — no shuffle at all; rounds = graph depth.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, List, Sequence, Set, Tuple

Edge = Tuple[str, str]  # (child, parent) — child is_a parent


def isa_edges(ontology) -> List[Edge]:
    """(child, parent) per ``is_a:`` clause (graph.ipynb cell 2)."""
    out = []
    for f in ontology.frames:
        for c in f.values("is_a"):
            out.append((f.id, c["value"]))
    return out


def is_dag(edges: Iterable[Edge]) -> bool:
    """Kahn topological sort — True iff the is_a graph is acyclic
    (graph.ipynb cell 3, ``networkx.is_directed_acyclic_graph``)."""
    children: Dict[str, List[str]] = {}
    indeg: Dict[str, int] = {}
    for child, parent in edges:
        children.setdefault(parent, []).append(child)
        indeg[child] = indeg.get(child, 0) + 1
        indeg.setdefault(parent, 0)
    q = deque(n for n, d in indeg.items() if d == 0)
    seen = 0
    while q:
        n = q.popleft()
        seen += 1
        for ch in children.get(n, ()):
            indeg[ch] -= 1
            if indeg[ch] == 0:
                q.append(ch)
    return seen == len(indeg)


def descendants(edges: Iterable[Edge], root: str) -> Set[str]:
    """All transitive children of ``root`` (graph.ipynb cell 5,
    ``networkx.descendants`` on the reversed is_a arrows)."""
    kids: Dict[str, List[str]] = {}
    for child, parent in edges:
        kids.setdefault(parent, []).append(child)
    out: Set[str] = set()
    q = deque([root])
    while q:
        n = q.popleft()
        for ch in kids.get(n, ()):
            if ch not in out:
                out.add(ch)
                q.append(ch)
    return out


def ancestors(edges: Iterable[Edge], node: str) -> Set[str]:
    """All transitive parents of ``node``."""
    return descendants([(p, c) for c, p in edges], node)


def descendants_ds(edges_ds, roots: Sequence[str],
                   child_col: str = "subj", parent_col: str = "obj",
                   max_depth: int = 64,
                   max_frontier: int = 5_000_000) -> Set[str]:
    """Distributed transitive descendants over an adjacency Dataset.

    Per round: broadcast the current frontier (``ray.put`` — small, the
    discovered set), one stateless ``map_batches`` filter emits children
    of frontier nodes, driver unions the (small) new ids.  No shuffle;
    the Dataset is scanned once per depth level, so depth-bounded
    hierarchies (ontology is_a trees are shallow) cost a few passes.
    For deep graphs switch to the pointer-doubling closure in
    :mod:`.canonicalize` keyed by component instead.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    edges = edges_ds.map_batches(
        lambda t, c=child_col, p=parent_col: pa.table(
            {"child": t[c], "parent": t[p]}),
        batch_format="pyarrow").materialize()

    seen: Set[str] = set()
    frontier: Set[str] = set(roots)
    for _ in range(max_depth):
        f_ref = ray.put(frontier)

        def expand(t: pa.Table) -> pa.Table:
            fr = ray.get(f_ref)
            mask = pc.is_in(t["parent"],
                            value_set=pa.array(sorted(fr), pa.string()))
            # per-batch distinct so the driver collect is bounded by
            # distinct children, never by edge multiplicity
            return pa.table({"child": pc.unique(t.filter(mask)["child"])})

        kids = edges.map_batches(expand, batch_format="pyarrow")
        new = {r["child"] for r in kids.take_all()} - seen - set(roots)
        if not new:
            break
        seen |= new
        if len(seen) > max_frontier:
            raise ValueError(
                f"descendants_ds frontier exceeded max_frontier="
                f"{max_frontier} ({len(seen)} nodes): this driver-unioned "
                f"expansion targets broadcast-sized closures (ontology "
                f"subtrees); for corpus-scale reachability use the "
                f"distributed connected_components / pointer-doubling "
                f"path in stages.canonicalize instead.")
        frontier = new
    return seen
