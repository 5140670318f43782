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

import math

import numpy as np
import pandas as pd

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


def _tuple_first(t):
    """Unwrap a 1-tuple: with ``num_returns=1`` Ray hands back ONE ref
    whose value is the WHOLE tuple — both bucket-splitting sites wrap
    this as a remote to normalize the B == 1 case."""
    return t[0]


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


# ---------------------------------------------------------------------------
# PageRank over an adjacency Dataset
# ---------------------------------------------------------------------------

PAGERANK_UNIT = 10 ** 12


def _partition_refs(ds, key: str, num_buckets: int) -> list:
    """ONE manual hash exchange: split every block of ``ds`` by a stable
    hash of ``key`` and concat per bucket — returns ``num_buckets``
    ObjectRefs of pandas frames that stay in the object store (the
    driver holds refs only).  This is the partition-ONCE primitive for
    iterative algorithms: pay the exchange a single time, then iterate
    with bucket-aligned task zips (see :func:`pagerank` mode="join").
    Uses the same ``_bucket_ids`` hash as :func:`hash_join`, so frames
    partitioned on the same key value co-locate across calls."""
    import ray
    from ray.data.block import BlockAccessor

    from ..functions.relops import _bucket_ids

    B = num_buckets

    @ray.remote
    def split(block):
        df = BlockAccessor.for_block(block).to_pandas()
        if key not in df.columns:
            # Ray's sort-groupby emits schema-LESS empty blocks for
            # key ranges with no rows — nothing to route
            return tuple(pd.DataFrame() for _ in range(B))
        b = _bucket_ids(df, [key], B)
        return tuple(df[b == i].reset_index(drop=True) for i in range(B))

    @ray.remote
    def cat(*parts):
        parts = [p for p in parts if len(p.columns)]
        if not parts:
            return pd.DataFrame()
        return pd.concat(parts, ignore_index=True)

    first = ray.remote(_tuple_first)

    block_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    outs = []
    for r in block_refs:
        if B == 1:
            outs.append([first.remote(split.remote(r))])
        else:
            outs.append(split.options(num_returns=B).remote(r))
    return [cat.remote(*[o[i] for o in outs]) for i in range(B)]


def pagerank(edges_ds, src_col: str = "src", dst_col: str = "dst",
             num_iters: int = 5, damping: float = 0.85,
             mode: str = "broadcast",
             max_nodes: int = 5_000_000, num_buckets: int = 64):
    """Distributed PageRank over a (src, dst) edge Dataset; returns a
    Dataset of ``(node, rank_micro, rank)`` covering every node.

    Semantics: fixed-iteration power method in FIXED-POINT integer
    arithmetic — ranks are int64 multiples of 1/``PAGERANK_UNIT``
    (1e-12), ``damping`` is taken as the exact decimal fraction of its
    string form (0.85 -> 17/20), and each round computes, in integers,

        rank'(v) = (den-num)*UNIT // (den*N)
                   + num*(sum_{(u,v)} rank(u)//outdeg(u)
                          + dangling_mass//N) // den

    with dangling mass (rank held by nodes with no out-edges)
    redistributed uniformly.  Why integers: per-iteration DECIMAL
    rounding of floats is NOT engine-independent — a sum landing
    within a few ulp of a rounding-grid midpoint resolves differently
    under different summation orders (observed as 1e-10 grid-step
    divergences at the 100k-node scale) — whereas integer sums and
    floor divisions are exact in any order, in any engine: numpy,
    pandas, and SQL BIGINT arithmetic agree bit-for-bit, and all
    intermediates stay < 2^53, so they even survive float64 transport
    (NaN-widening joins) losslessly.  ``rank = rank_micro / UNIT`` is
    derived once at the end.  Quantization floor-loss per iteration is
    < (outdeg+2)/UNIT per node — PageRank to ~12 significant digits.

    Two tiers, identical results (parity-tested):

    * ``mode="broadcast"`` — the rank vector is the small side: nodes
      are collected once (guarded by ``max_nodes``), edges are
      dictionary-encoded to int32 index pairs and materialized ONCE,
      and each iteration is a single shuffle-free ``map_batches`` pass
      emitting per-batch ``bincount`` partial sums (bounded by distinct
      dst per batch, never edge multiplicity) that the driver folds.
      The graph — the 100-TB side — never moves after the encode.
    * ``mode="join"`` — nothing node-shaped on the driver: edges and
      node/rank partitions are hash-bucketed by the SAME key hash ONCE
      (:func:`_partition_refs`), then each iteration runs bucket-aligned
      raw-task zips — a local merge per bucket produces pre-reduced
      per-dst contribution partials, and only those KB-scale partials
      (B x B tiny frames) re-exchange; the edge table never moves after
      the initial partition.  Dangling mass is B scalars per round.
      Use when the node set itself exceeds a worker's heap.
    """
    from fractions import Fraction

    import ray

    fr = Fraction(str(damping))
    num, den = fr.numerator, fr.denominator
    tele_num = den - num
    unit = PAGERANK_UNIT

    def to_sd(df: pd.DataFrame) -> pd.DataFrame:
        # "string" dtype (not object) end-to-end: Ray's size estimator
        # chokes on 0-row object columns, and empty buckets are routine
        return pd.DataFrame({
            "src": df[src_col].astype("string"),
            "dst": df[dst_col].astype("string")})

    edges = edges_ds.map_batches(to_sd, batch_format="pandas")

    if mode == "broadcast":
        # nodes + outdeg in one bounded collect (per-batch distinct /
        # per-batch value_counts partials keep the driver rows bounded
        # by distinct nodes, never edges)
        parts = edges.map_batches(
            lambda df: pd.concat(
                [df["src"].value_counts().rename_axis("node")
                 .reset_index(name="deg"),
                 pd.DataFrame({"node": df["dst"].unique(), "deg": 0})],
                ignore_index=True),
            batch_format="pandas").to_pandas()
        deg = parts.groupby("node", sort=True)["deg"].sum()
        if len(deg) > max_nodes:
            raise ValueError(
                f"pagerank(mode='broadcast') node set ({len(deg)}) "
                f"exceeds max_nodes={max_nodes}; use mode='join' (no "
                f"driver-side node vector).")
        nodes = deg.index.to_numpy()
        outdeg = deg.to_numpy().astype("int64")
        n = len(nodes)
        idx_ref = ray.put({v: i for i, v in enumerate(nodes)})

        def encode(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(idx_ref)
            return pd.DataFrame({
                "si": df["src"].map(m).astype("int32"),
                "di": df["dst"].map(m).astype("int32")})

        iedges = edges.map_batches(encode,
                                   batch_format="pandas").materialize()

        rank = np.full(n, unit // n, dtype="int64")
        dangling = outdeg == 0
        safe_deg = np.where(dangling, 1, outdeg)  # dangling w is unused
        tele = (tele_num * unit) // (den * n)
        for _ in range(num_iters):
            w_ref = ray.put(rank // safe_deg)

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                w = ray.get(w_ref)
                di = df["di"].to_numpy()
                # float64 bincount of int weights is EXACT here: every
                # partial stays < 2^53
                c = np.bincount(di, weights=w[df["si"].to_numpy()])
                nz = np.nonzero(c)[0]
                return pd.DataFrame({"di": nz.astype("int32"),
                                     "c": c[nz].astype("int64")})

            part = iedges.map_batches(contrib,
                                      batch_format="pandas").to_pandas()
            s = np.zeros(n, dtype="int64")
            np.add.at(s, part["di"].to_numpy(), part["c"].to_numpy())
            mass = int(rank[dangling].sum())
            rank = tele + (num * (s + mass // n)) // den
        out = pd.DataFrame({"node": pd.Series(nodes, dtype="string"),
                            "rank_micro": rank.astype("int64"),
                            "rank": rank / unit})
        import ray.data as rd
        return rd.from_pandas(out)

    if mode != "join":
        raise ValueError(f"unknown pagerank mode {mode!r}")

    from ..functions.relops import _bucket_ids, grouped_agg, hash_join

    nodes_raw = grouped_agg(
        edges.map_batches(
            lambda df: pd.DataFrame({"node": pd.concat(
                [df["src"], df["dst"]], ignore_index=True).unique()}),
            batch_format="pandas"),
        "node", num_buckets=num_buckets, node=("node", "first"))
    deg_ds = grouped_agg(edges, "src", num_buckets=num_buckets,
                         outdeg=("dst", "count"))
    # the dangling set is STATIC: flag it once on the node table (one
    # left join) instead of an anti-join every iteration
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "dang": df["outdeg"].isna()})

    nodes_ds = hash_join(
        nodes_raw, deg_ds.map_batches(
            lambda df: df.rename(columns={"src": "node"}),
            batch_format="pandas"),
        on="node", how="left", lcols=["node"], rcols=["node", "outdeg"],
        num_buckets=num_buckets, bucket_finalize=flag).materialize()
    n = nodes_ds.count()
    # degree rides with the edges once (cast= restores int64 after the
    # join's NA-widening so the fixed-point floor-divides stay integer)
    edeg = hash_join(edges, deg_ds, on="src",
                     lcols=["src", "dst"], rcols=["src", "outdeg"],
                     num_buckets=num_buckets,
                     cast={"outdeg": "int64"}).materialize()

    # ---- partition-once layout (the 100-TB shape): edges are hash-
    # bucketed by src ONCE and never move again; node/rank partitions
    # use the SAME hash on node, so bucket i's edges merge bucket i's
    # ranks locally.  Each iteration then exchanges only the KB-scale
    # pre-reduced per-dst contribution partials (B x B tiny frames) —
    # not the edge table (the old design re-exchanged edges every
    # iteration and was 6.5x slower than broadcast at 1M edges).  The
    # iteration itself is raw Ray tasks: a bucket-ALIGNED iterative zip
    # is the one shape Dataset pipelines cannot express without paying
    # a fresh keyed exchange per round.  Partitioning assumption: one
    # bucket's edges + ranks fit a task (num_buckets is the knob).
    B = num_buckets
    node_refs = _partition_refs(nodes_ds, "node", B)
    edge_refs = _partition_refs(edeg, "src", B)

    r0 = unit // n
    tele = (tele_num * unit) // (den * n)

    _first_of = ray.remote(_tuple_first)

    @ray.remote
    def init_ranks(nb: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": nb["node"],
                             "dang": nb["dang"].astype(bool),
                             "rank": np.int64(r0)})

    @ray.remote
    def bucket_mass(rb: pd.DataFrame) -> int:
        return int(rb.loc[rb["dang"], "rank"].sum())

    @ray.remote
    def bucket_contrib(eb: pd.DataFrame, rb: pd.DataFrame):
        # local merge: eb's src keys all hash to THIS bucket, and rb
        # holds every rank of this bucket — exact with zero exchange
        m = eb.merge(rb[["node", "rank"]].rename(columns={"node": "src"}),
                     on="src")
        c = np.floor_divide(m["rank"].to_numpy(), m["outdeg"].to_numpy())
        g = m.assign(c=c.astype("int64")).groupby(
            "dst", as_index=False, sort=False)["c"].sum()
        b = _bucket_ids(g, ["dst"], B)
        return tuple(g[b == i].reset_index(drop=True) for i in range(B))

    @ray.remote
    def bucket_apply(nb: pd.DataFrame, mass_div_n: int,
                     *parts: pd.DataFrame) -> pd.DataFrame:
        cat = pd.concat(parts, ignore_index=True)
        c = cat.groupby("dst", as_index=False, sort=False)["c"].sum()
        g = nb.merge(c.rename(columns={"dst": "node"}), on="node",
                     how="left")
        cv = g["c"].fillna(0).to_numpy().astype("int64")
        r = tele + (num * (cv + mass_div_n)) // den
        return pd.DataFrame({"node": g["node"],
                             "dang": g["dang"].astype(bool),
                             "rank": r.astype("int64")})

    rank_refs = [init_ranks.remote(nb) for nb in node_refs]
    for _ in range(num_iters):
        # dangling mass: B scalars to the driver, nothing node-shaped
        mass = sum(ray.get([bucket_mass.remote(rb) for rb in rank_refs]))
        if B == 1:
            # num_returns=1 returns ONE ref to the whole 1-tuple
            outs = [[_first_of.remote(bucket_contrib.remote(
                edge_refs[i], rank_refs[i]))] for i in range(B)]
        else:
            outs = [bucket_contrib.options(num_returns=B).remote(
                edge_refs[i], rank_refs[i]) for i in range(B)]
        rank_refs = [bucket_apply.remote(node_refs[j], mass // n,
                                         *[outs[i][j] for i in range(B)])
                     for j in range(B)]

    import ray.data as rd
    return rd.from_pandas_refs(rank_refs).map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"],
            "rank_micro": df["rank"].astype("int64"),
            "rank": df["rank"].astype("int64") / unit}),
        batch_format="pandas")


def personalized_pagerank(edges_ds, seeds, src_col: str = "src",
                          dst_col: str = "dst", num_iters: int = 4,
                          damping: float = 0.85,
                          max_nodes: int = 5_000_000):
    """Personalized PageRank (Haveliwala 2002): the random surfer
    teleports to the SEED set instead of uniformly — rank becomes
    "proximity to the seeds", the query behind related-entity lookup
    and seed-expanded topic crawling.  Same fixed-point int64
    discipline as :func:`pagerank` (ranks in 1/PAGERANK_UNIT units,
    exact floor-division recurrence, bit-equal in any engine):

        rank'(v) = [v in S] * (den-num)*UNIT // (den*|S|)
                   + num * (sum_{(u,v)} rank(u)//outdeg(u)
                            + [v in S] * dangling_mass//|S|) // den

    with r0 = UNIT//|S| on seeds, 0 elsewhere; dangling mass returns
    to the seeds (the standard PPR convention — mass must not leak to
    non-seed teleports).  Broadcast tier only: the rank vector is
    node-bounded and guarded by ``max_nodes``; a node set beyond a
    worker's heap takes :func:`pagerank`'s ``mode="join"``
    partition-once shape with the seed set broadcast as a hash set —
    the recurrence is unchanged.  Seeds absent from the graph are
    ignored; an empty intersection raises.

    Returns a Dataset of ``(node, rank_micro, rank)``.
    """
    from fractions import Fraction

    import ray

    fr = Fraction(str(damping))
    num, den = fr.numerator, fr.denominator
    tele_num = den - num
    unit = PAGERANK_UNIT

    edges = edges_ds.map_batches(
        lambda df: pd.DataFrame({
            "src": df[src_col].astype("string"),
            "dst": df[dst_col].astype("string")}),
        batch_format="pandas")

    parts = edges.map_batches(
        lambda df: pd.concat(
            [df["src"].value_counts().rename_axis("node")
             .reset_index(name="deg"),
             pd.DataFrame({"node": df["dst"].unique(), "deg": 0})],
            ignore_index=True),
        batch_format="pandas").to_pandas()
    deg = parts.groupby("node", sort=True)["deg"].sum()
    if len(deg) > max_nodes:
        raise ValueError(
            f"personalized_pagerank node set ({len(deg)}) exceeds "
            f"max_nodes={max_nodes}; take pagerank's mode='join' "
            f"partition-once shape for beyond-worker node sets.")
    nodes = deg.index.to_numpy()
    outdeg = deg.to_numpy().astype("int64")
    n = len(nodes)
    pos = {v: i for i, v in enumerate(nodes)}
    seed_idx = np.asarray(sorted(pos[s] for s in set(seeds) if s in pos),
                          dtype="int64")
    s_count = len(seed_idx)
    if s_count == 0:
        raise ValueError("personalized_pagerank: no seed is present "
                         "in the edge set")
    idx_ref = ray.put(pos)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(idx_ref)
        return pd.DataFrame({
            "si": df["src"].map(m).astype("int32"),
            "di": df["dst"].map(m).astype("int32")})

    iedges = edges.map_batches(encode,
                               batch_format="pandas").materialize()

    seed_mask = np.zeros(n, dtype=bool)
    seed_mask[seed_idx] = True
    rank = np.where(seed_mask, unit // s_count, 0).astype("int64")
    dangling = outdeg == 0
    safe_deg = np.where(dangling, 1, outdeg)
    tele_v = np.where(seed_mask,
                      (tele_num * unit) // (den * s_count),
                      0).astype("int64")
    for _ in range(num_iters):
        w_ref = ray.put(rank // safe_deg)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(w_ref)
            di = df["di"].to_numpy()
            c = np.bincount(di, weights=w[df["si"].to_numpy()])
            nz = np.nonzero(c)[0]
            return pd.DataFrame({"di": nz.astype("int32"),
                                 "c": c[nz].astype("int64")})

        part = iedges.map_batches(contrib,
                                  batch_format="pandas").to_pandas()
        s = np.zeros(n, dtype="int64")
        np.add.at(s, part["di"].to_numpy(), part["c"].to_numpy())
        mass = int(rank[dangling].sum())
        back = np.where(seed_mask, mass // s_count, 0).astype("int64")
        rank = tele_v + (num * (s + back)) // den
    out = pd.DataFrame({"node": pd.Series(nodes, dtype="string"),
                        "rank_micro": rank.astype("int64"),
                        "rank": rank / unit})
    import ray.data as rd
    return rd.from_pandas(out)


HITS_UNIT = 10 ** 9


def hits(edges_ds, src_col: str = "src", dst_col: str = "dst",
         num_iters: int = 4, max_nodes: int = 5_000_000):
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed
    (src, dst) edge Dataset; returns a Dataset of
    ``(node, auth_nano, hub_nano)`` covering every node.

    Fixed-point INTEGER recurrence (same engine-independence argument
    as :func:`pagerank` — integer sums and floor divisions are exact
    under any summation order in any engine, so numpy and SQL BIGINT
    agree bit-for-bit).  Scores are int64 multiples of 1/``HITS_UNIT``
    (1e-9); each round is

        araw(v)  = sum_{(u,v)} hub(u)
        auth(v)  = araw(v) // max(1, max_v araw(v) // UNIT)
        hraw(u)  = sum_{(u,v)} auth(v)
        hub(u)   = hraw(u) // max(1, max_u hraw(u) // UNIT)

    i.e. the classic L-inf normalization quantized to the unit grid
    (max score lands in [UNIT, 2*UNIT)); sum-normalization would need
    a raw*UNIT product that overflows int64 at web edge counts.
    Init: hub = UNIT for every node.  Bounds: scores stay < 2*UNIT =
    2e9, so per-batch float64 bincount partials are exact below
    2^53/2e9 ~ 4.5e6 rows/batch, and the driver's int64 raw fold is
    exact below 2^63/2e9 ~ 4.6e9 edges; past that, shard the fold (the
    SQL oracle already sums in HUGEINT).

    Broadcast tier only (node set collected once, guarded by
    ``max_nodes``; the edge table — the 100-TB side — is
    dictionary-encoded to int32 pairs ONCE and never moves again; each
    half-iteration is a shuffle-free ``map_batches`` pass emitting
    per-batch bincount partials bounded by distinct endpoints per
    batch).  For node sets beyond a worker's heap, the
    partition-once bucket-zip tier of :func:`pagerank` (mode="join")
    is the drop-in shape — HITS differs only in the per-bucket kernel."""
    import ray

    unit = HITS_UNIT

    def to_sd(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": df[src_col].astype("string"),
            "dst": df[dst_col].astype("string")})

    edges = edges_ds.map_batches(to_sd, batch_format="pandas")

    parts = edges.map_batches(
        lambda df: pd.DataFrame({"node": pd.concat(
            [df["src"], df["dst"]], ignore_index=True).unique()}),
        batch_format="pandas").to_pandas()
    nodes = np.sort(parts["node"].unique())
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(
            f"hits() node set ({n}) exceeds max_nodes={max_nodes}; "
            f"port the pagerank(mode='join') partition-once tier for "
            f"node sets beyond a worker's heap.")
    idx_ref = ray.put({v: i for i, v in enumerate(nodes)})

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(idx_ref)
        return pd.DataFrame({
            "si": df["src"].map(m).astype("int32"),
            "di": df["dst"].map(m).astype("int32")})

    iedges = edges.map_batches(encode,
                               batch_format="pandas").materialize()

    def half_step(score: np.ndarray, from_col: str,
                  to_col: str) -> np.ndarray:
        """One direction of the recurrence: raw(to) = sum score(from)
        over edges, then the L-inf grid rescale."""
        w_ref = ray.put(score)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(w_ref)
            ti = df[to_col].to_numpy()
            c = np.bincount(ti, weights=w[df[from_col].to_numpy()])
            nz = np.nonzero(c)[0]
            return pd.DataFrame({"ti": nz.astype("int32"),
                                 "c": c[nz].astype("int64")})

        part = iedges.map_batches(contrib,
                                  batch_format="pandas").to_pandas()
        raw = np.zeros(n, dtype="int64")
        np.add.at(raw, part["ti"].to_numpy(), part["c"].to_numpy())
        scale = max(1, int(raw.max(initial=0)) // unit)
        return raw // scale

    hub = np.full(n, unit, dtype="int64")
    auth = np.zeros(n, dtype="int64")
    for _ in range(num_iters):
        auth = half_step(hub, "si", "di")
        hub = half_step(auth, "di", "si")

    out = pd.DataFrame({"node": pd.Series(nodes, dtype="string"),
                        "auth_nano": auth.astype("int64"),
                        "hub_nano": hub.astype("int64")})
    import ray.data as rd
    return rd.from_pandas(out)


def triangle_counts(edges_ds, a_col: str = "a", b_col: str = "b",
                    num_buckets: int = 16):
    """Distributed triangle counting with per-node counts — the
    node-iterator++ / MapReduce wedge algorithm (Cohen 2009; Suri &
    Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
    Reducer"):

    1. DEGREE-ORIENT each undirected edge from its lower-(degree, id)
       endpoint to the higher — the skew remedy: a hub of degree d
       generates wedges only from neighbors that outrank it, so
       per-node wedge work is bounded by arboricity^2, not d^2 (the
       "last reducer" curse the id-orientation would keep).
    2. Per-source wedge generation inside a keyed exchange
       (vectorized index pairs, no per-wedge Python).
    3. ONE semi hash-join of wedges against the canonical edge set:
       each surviving wedge is a triangle; its three corners explode
       into (node, 1) partials and a bounded count reduce.

    Input edges must be canonical (a < b, distinct).  Returns a
    pandas DataFrame (node, n_tri) for nodes in >= 1 triangle."""
    from ..functions.relops import grouped_agg, grouped_map, hash_join

    # edges feed three consumers (degrees + both join sides) and deg
    # feeds two — materialize once so the upstream pipeline (e.g. the
    # Jaccard inverted-index shuffle) doesn't re-execute per consumer
    edges_ds = edges_ds.materialize()
    ends = edges_ds.map_batches(
        lambda df: pd.DataFrame({"node": np.concatenate(
            [df[a_col].to_numpy(), df[b_col].to_numpy()])}),
        batch_format="pandas")
    deg = grouped_agg(ends.map_batches(
        lambda df: df.groupby("node", as_index=False)
        .agg(d=("node", "size")), batch_format="pandas"),
        "node", num_buckets=num_buckets, d=("d", "sum")).materialize()

    e_a = hash_join(edges_ds, deg.map_batches(
        lambda df: df.rename(columns={"node": a_col, "d": "da"}),
        batch_format="pandas"), on=a_col,
        lcols=[a_col, b_col], rcols=[a_col, "da"],
        num_buckets=num_buckets)
    e_ab = hash_join(e_a, deg.map_batches(
        lambda df: df.rename(columns={"node": b_col, "d": "db"}),
        batch_format="pandas"), on=b_col,
        lcols=[a_col, b_col, "da"], rcols=[b_col, "db"],
        num_buckets=num_buckets)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy()
        b = df[b_col].to_numpy()
        da = df["da"].to_numpy()
        db = df["db"].to_numpy()
        fwd = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame({"src": np.where(fwd, a, b),
                             "dst": np.where(fwd, b, a)})

    oriented = e_ab.map_batches(orient, batch_format="pandas")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, g in df.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy())
            if len(nb) < 2:
                continue
            iu, iv = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({
                "u": nb[iu], "v": nb[iv],
                "apex": np.full(len(iu), src)}))
        if not outs:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64"),
                                 "apex": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    wds = grouped_map(oriented, "src", wedges, num_buckets=num_buckets)

    canon = edges_ds.map_batches(
        lambda df: df.rename(columns={a_col: "u", b_col: "v"}),
        batch_format="pandas")
    tri = hash_join(wds, canon, on=["u", "v"], how="semi",
                    lcols=["u", "v", "apex"], rcols=["u", "v"],
                    num_buckets=num_buckets)

    corners = tri.map_batches(
        lambda df: pd.DataFrame({"node": np.concatenate(
            [df["u"].to_numpy(), df["v"].to_numpy(),
             df["apex"].to_numpy()]).astype("int64")})
        if len(df) else pd.DataFrame({"node": pd.Series(dtype="int64")}),
        batch_format="pandas")
    out = grouped_agg(corners.map_batches(
        lambda df: df.groupby("node", as_index=False)
        .agg(n_tri=("node", "size")), batch_format="pandas"),
        "node", num_buckets=num_buckets,
        n_tri=("n_tri", "sum")).to_pandas()
    if out.empty:
        # a triangle-free graph yields a column-less empty frame from
        # the fold — return the typed empty contract instead
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_tri": pd.Series(dtype="int64")})
    out["node"] = out["node"].astype("int64")
    out["n_tri"] = out["n_tri"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def harmonic_centrality_k(edges_ds, max_k: int = 3, a_col: str = "a",
                          b_col: str = "b", num_buckets: int = 16):
    """Distance-truncated harmonic centrality: for every node, the
    number of nodes at distance exactly 1..``max_k`` plus the harmonic
    sum ``H_k(v) = sum_{0 < d(u,v) <= k} 1/d(u,v)`` — the standard
    reachability-robust centrality (Boldi & Vigna 2014), truncated at
    ``max_k`` hops so the computation is a fixed number of bounded
    exchanges instead of an all-pairs problem.

    Exactness across engines: per-distance weights are integerized ONCE
    (``1_000_000 // d`` micro-units) so every score is an exact int64
    sum — the q_adamic_adar discipline.

    Scale shape: level ``d`` pairs = (level ``d-1`` pairs) ⋈ adjacency
    inside one mid-keyed exchange, in-bucket distinct, then anti-joins
    against all shorter levels (BFS layering as relational algebra —
    every exchange is keyed and coarse, nothing touches the driver).
    Pair volume is O(sum of k-hop neighborhood sizes): bounded on
    cluster-shaped graphs (near-dup components), quadratic on an
    expander — same caveat class as triangle counting's arboricity
    bound.  Input edges must be canonical (a < b, distinct).  Returns
    a pandas DataFrame (node, n1..n{max_k}, harmonic_micro), node
    universe = nodes with degree >= 1."""
    from ..functions.relops import grouped_agg, grouped_map, hash_join

    edges_ds = edges_ds.materialize()
    adj = edges_ds.map_batches(
        lambda df: pd.DataFrame({
            "a": np.concatenate([df[a_col].to_numpy(),
                                 df[b_col].to_numpy()]).astype("int64"),
            "b": np.concatenate([df[b_col].to_numpy(),
                                 df[a_col].to_numpy()]).astype("int64")}),
        batch_format="pandas").materialize()

    levels = [adj]  # levels[d-1] = DIRECTED distinct pairs at distance d
    for _ in range(2, max_k + 1):
        prev = levels[-1]
        hop = adj.map_batches(
            lambda df: df.rename(columns={"a": "b", "b": "c"}),
            batch_format="pandas")

        def extend(df: pd.DataFrame) -> pd.DataFrame:
            out = df[df["a"] != df["c"]][["a", "c"]].rename(
                columns={"c": "b"})
            return out.drop_duplicates()

        cand = hash_join(prev, hop, on="b", lcols=["a", "b"],
                         rcols=["b", "c"], num_buckets=num_buckets,
                         bucket_finalize=extend)
        # global distinct: the (a, b) bucket holds every copy of a pair
        cand = grouped_map(cand, ["a", "b"],
                           lambda df: df.drop_duplicates(),
                           num_buckets=num_buckets)
        for shorter in levels:  # keep only pairs NOT already closer
            cand = hash_join(cand, shorter, on=["a", "b"], how="anti",
                             lcols=["a", "b"], rcols=["a", "b"],
                             num_buckets=num_buckets)
        # coalesce blocks before materializing: the join chain appends
        # block structure per hop (see kcore's round fix)
        levels.append(cand.repartition(num_buckets).materialize())

    parts = []
    for d, lvl in enumerate(levels, start=1):
        w = 1_000_000 // d  # integerize ONCE; exact int64 sums follow

        def tag(df: pd.DataFrame, d=d, w=w) -> pd.DataFrame:
            cols = {"node": df["a"].to_numpy().astype("int64"),
                    "w": np.full(len(df), w, dtype="int64")}
            for i in range(1, max_k + 1):
                cols[f"n{i}"] = np.full(len(df), np.int64(1 if i == d
                                                          else 0))
            return pd.DataFrame(cols)

        parts.append(lvl.map_batches(tag, batch_format="pandas"))
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    aggs = {f"n{i}": (f"n{i}", "sum") for i in range(1, max_k + 1)}
    out = grouped_agg(u, "node", num_buckets=num_buckets,
                      harmonic_micro=("w", "sum"), **aggs).to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ["node"] + [f"n{i}" for i in
                                         range(1, max_k + 1)]
                             + ["harmonic_micro"]})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    cols = ["node"] + [f"n{i}" for i in range(1, max_k + 1)] \
        + ["harmonic_micro"]
    return out[cols].sort_values("node").reset_index(drop=True)


def degree_assortativity(edges_ds, a_col: str = "a", b_col: str = "b",
                         num_buckets: int = 16) -> pd.DataFrame:
    """Degree assortativity of an undirected graph (Newman 2002): the
    Pearson correlation of endpoint degrees over DIRECTED edges (each
    undirected edge counted both ways, so the x/y marginals coincide).
    With n = 2|E|, x = deg(src), y = deg(dst):

        r = (n*S_xy - S_x^2) / (n*S_x2 - S_x^2)

    Every moment (S_xy, S_x, S_x2, n) is an exact int64 — the output
    carries them plus ``num``/``den`` so consumers can divide at any
    precision, and ``assort`` = round(num/den, 6) (0.0 when den = 0,
    i.e. a degree-regular graph) — numerator and denominator spelled
    identically in numpy and SQL.

    Scale shape: ONE degree exchange, two bucket joins to attach
    endpoint degrees (the triangle_counts pattern), then constant-size
    per-batch integer partials summed on the driver (a handful of
    rows — the BM25 pass-1 shape).  Input edges canonical (a < b,
    distinct).  Returns a one-row pandas DataFrame."""
    from ..functions.relops import grouped_agg, hash_join

    edges_ds = edges_ds.materialize()
    ends = edges_ds.map_batches(
        lambda df: pd.DataFrame({"node": np.concatenate(
            [df[a_col].to_numpy(), df[b_col].to_numpy()])}),
        batch_format="pandas")
    deg = grouped_agg(ends.map_batches(
        lambda df: df.groupby("node", as_index=False)
        .agg(d=("node", "size")), batch_format="pandas"),
        "node", num_buckets=num_buckets, d=("d", "sum")).materialize()

    e_a = hash_join(edges_ds, deg.map_batches(
        lambda df: df.rename(columns={"node": a_col, "d": "da"}),
        batch_format="pandas"), on=a_col,
        lcols=[a_col, b_col], rcols=[a_col, "da"],
        num_buckets=num_buckets)
    e_ab = hash_join(e_a, deg.map_batches(
        lambda df: df.rename(columns={"node": b_col, "d": "db"}),
        batch_format="pandas"), on=b_col,
        lcols=[a_col, b_col, "da"], rcols=[b_col, "db"],
        num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        da = df["da"].to_numpy(dtype="int64")
        db = df["db"].to_numpy(dtype="int64")
        # both directions: x-marginal = y-marginal by construction
        return pd.DataFrame({
            "n": [np.int64(2 * len(df))],
            "sxy": [np.int64(2 * (da * db).sum())],
            "sx": [np.int64(da.sum() + db.sum())],
            "sx2": [np.int64((da * da).sum() + (db * db).sum())]})

    p = e_ab.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sxy, sx, sx2 = (int(p[c].sum()) for c in ("sxy", "sx", "sx2"))
    num = n * sxy - sx * sx
    den = n * sx2 - sx * sx
    # half-AWAY-from-zero rounding matching SQL round(): integer
    # ratios can land exactly on .5 ulps where Python's banker's
    # rounding would flip the 6th decimal (r may be negative)
    if den != 0:
        x = num / den
        assort = math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
    else:
        assort = 0.0
    return pd.DataFrame({
        "n_dir_edges": pd.Series([n], dtype="int64"),
        "s_xy": pd.Series([sxy], dtype="int64"),
        "s_x": pd.Series([sx], dtype="int64"),
        "s_x2": pd.Series([sx2], dtype="int64"),
        "num": pd.Series([num], dtype="int64"),
        "den": pd.Series([den], dtype="int64"),
        "assort": pd.Series([assort], dtype="float64")})


def kcore(edges_ds, k: int = 2, a_col: str = "a", b_col: str = "b",
          num_buckets: int = 16, max_rounds: int = 12) -> pd.DataFrame:
    """k-core decomposition by iterative peeling (Batagelj-Zaversnik
    semantics, fixpoint form): repeatedly delete nodes of degree < k
    until every survivor has degree >= k within the survivor set — the
    densest-substructure filter that separates true duplicate cliques
    from chains/stars of borderline matches.

    Engine shape: each round is ONE degree reduce (grouped_agg) + two
    semi-joins filtering edges to survivor endpoints — all keyed coarse
    exchanges, nothing on the driver but the survivor COUNT (the
    convergence test).  Rounds = peeling depth; dedup graphs converge
    in a handful (cliques survive round 1, chains peel inward at 2
    nodes/round), and ``max_rounds`` raises rather than silently
    truncating (no-silent-caps rule) — the SQL oracle unrolls the same
    round count, and extra unrolled rounds past the fixpoint are
    no-ops, so converged results are equal by construction.

    Input edges canonical (a < b, distinct).  Returns a pandas
    DataFrame (node, degree) of k-core members with their in-core
    degree."""
    from ..functions.relops import grouped_agg, hash_join

    # int64 edge ids are converted ONCE to pandas nullable Int64:
    # hash_join's tagged union NA-widens plain int64 to float64, which
    # silently ROUNDS 64-bit hash ids above 2^53 at web scale (cast=
    # alone cannot un-round — it only restores the dtype); nullable
    # Int64 carries pd.NA through the union bit-exactly
    _d = edges_ds.take_batch(1, batch_format="pandas").dtypes
    _ints = [c for c in (a_col, b_col)
             if pd.api.types.is_integer_dtype(_d[c])]
    cast = {c: "Int64" for c in _ints}

    def _nullable(df, cols=tuple(_ints)):
        df = df.copy()
        for c in cols:
            df[c] = df[c].astype("Int64")
        return df

    edges = edges_ds.map_batches(
        _nullable, batch_format="pandas").materialize()         if _ints else edges_ds.materialize()
    n_prev = None
    for _ in range(max_rounds):
        ends = edges.map_batches(
            lambda df: pd.DataFrame({"node": np.concatenate(
                [df[a_col].to_numpy(), df[b_col].to_numpy()])}),
            batch_format="pandas")
        deg = grouped_agg(ends.map_batches(
            lambda df: df.groupby("node", as_index=False)
            .agg(d=("node", "size")), batch_format="pandas"),
            "node", num_buckets=num_buckets, d=("d", "sum"))
        surv = deg.map_batches(
            lambda df: df[df["d"] >= k], batch_format="pandas") \
            .materialize()
        n_surv = surv.count()
        if n_surv == n_prev:
            out = surv.to_pandas()
            if out.empty:
                return pd.DataFrame({
                    "node": pd.Series(dtype="int64"),
                    "degree": pd.Series(dtype="int64")})
            out = out.rename(columns={"d": "degree"})
            out["node"] = out["node"].astype("int64")
            out["degree"] = out["degree"].astype("int64")
            return out[["node", "degree"]].sort_values("node") \
                .reset_index(drop=True)
        n_prev = n_surv
        if n_surv == 0:
            continue  # one more pass confirms the empty fixpoint
        keep = surv.map_batches(
            lambda df: df[["node"]], batch_format="pandas")
        edges = hash_join(
            edges, keep.map_batches(
                lambda df: df.rename(columns={"node": a_col}),
                batch_format="pandas"),
            on=a_col, how="semi", lcols=[a_col, b_col],
            rcols=[a_col], num_buckets=num_buckets, cast=cast)
        # repartition BEFORE materializing: each hash_join appends its
        # input's block structure to the output (~+|blocks| per round),
        # so without coalescing the per-round fixed cost grows with the
        # round number — measured 500s -> 13s at 300k edges x 4 rounds
        # (tools/rehearse_graph.py caught this)
        edges = hash_join(
            edges, keep.map_batches(
                lambda df: df.rename(columns={"node": b_col}),
                batch_format="pandas"),
            on=b_col, how="semi", lcols=[a_col, b_col],
            rcols=[b_col], num_buckets=num_buckets, cast=cast) \
            .repartition(num_buckets).materialize()
    raise ValueError(
        f"kcore did not converge within max_rounds={max_rounds}; "
        f"raise max_rounds (peeling depth exceeds the unrolled SQL "
        f"oracle's round budget)")


def cyclic_core(edges_ds, src_col: str = "src", dst_col: str = "dst",
                num_buckets: int = 16, max_rounds: int = 16
                ) -> pd.DataFrame:
    """Cyclic core of a DIRECTED graph by trim fixpoint — the standard
    forward/backward trim that SCC algorithms (Hong et al. 2013) run
    first, and the acyclicity QA a KG is_a hierarchy needs: repeatedly
    delete nodes lacking an in-edge or an out-edge within the survivor
    set.  Every node on a directed cycle survives; a pure DAG trims to
    EMPTY (the is_a validity check); survivors that are not on a cycle
    themselves lie on a path between two cycles (documented semantics
    — exact on-cycle membership is SCC-size-2+, which this fixpoint
    brackets from above).

    Engine shape (the kcore discipline): each round is ONE node-keyed
    degree exchange of batch-local (node, in, out) pre-reduced
    partials + two semi-joins restricting edges to survivor endpoints;
    the driver holds only the survivor COUNT.  Multi-edges are kept
    (degrees are transition multiplicities), mirrored in the SQL
    oracle.  ``max_rounds`` raises rather than silently truncating
    (no-silent-caps rule); the oracle unrolls the same rounds and
    post-fixpoint rounds are no-ops, so converged results are equal
    by construction.

    Returns (node, n_in, n_out) — in/out degree within the core."""
    from ..functions.relops import grouped_agg, hash_join

    # int64 node ids -> nullable Int64 once (see kcore: hash_join's
    # tagged union NA-widens plain int64 to float64, silently rounding
    # 64-bit hash ids above 2^53; Int64 carries pd.NA bit-exactly)
    _d = edges_ds.take_batch(1, batch_format="pandas").dtypes
    _ints = [c for c in (src_col, dst_col)
             if pd.api.types.is_integer_dtype(_d[c])]
    cast = {c: "Int64" for c in _ints}

    def _nullable(df, cols=tuple(_ints)):
        df = df.copy()
        for c in cols:
            df[c] = df[c].astype("Int64")
        return df

    edges = edges_ds.map_batches(
        _nullable, batch_format="pandas").materialize()         if _ints else edges_ds.materialize()
    n_prev = None
    for _ in range(max_rounds):
        def ends(df, s=src_col, d=dst_col):
            part = pd.concat([
                pd.DataFrame({"node": df[d], "ind": 1, "outd": 0}),
                pd.DataFrame({"node": df[s], "ind": 0, "outd": 1})])
            return part.groupby("node", as_index=False).agg(
                ind=("ind", "sum"), outd=("outd", "sum"))

        deg = grouped_agg(
            edges.map_batches(ends, batch_format="pandas"),
            "node", num_buckets=num_buckets,
            ind=("ind", "sum"), outd=("outd", "sum"))
        surv = deg.map_batches(
            lambda df: df[(df["ind"] > 0) & (df["outd"] > 0)],
            batch_format="pandas").materialize()
        n_surv = surv.count()
        if n_surv == n_prev:
            out = surv.to_pandas()
            if out.empty:
                return pd.DataFrame({
                    "node": pd.Series(dtype="string"),
                    "n_in": pd.Series(dtype="int64"),
                    "n_out": pd.Series(dtype="int64")})
            out = out.rename(columns={"ind": "n_in", "outd": "n_out"})
            out["n_in"] = out["n_in"].astype("int64")
            out["n_out"] = out["n_out"].astype("int64")
            return out[["node", "n_in", "n_out"]] \
                .sort_values("node").reset_index(drop=True)
        n_prev = n_surv
        if n_surv == 0:
            continue  # one more pass confirms the empty fixpoint
        keep = surv.map_batches(
            lambda df: df[["node"]], batch_format="pandas")
        edges = hash_join(
            edges, keep.map_batches(
                lambda df, s=src_col: df.rename(columns={"node": s}),
                batch_format="pandas"),
            on=src_col, how="semi", lcols=[src_col, dst_col],
            rcols=[src_col], num_buckets=num_buckets, cast=cast)
        # repartition before materializing — the kcore block-accretion
        # fix (each hash_join appends its input's block structure)
        edges = hash_join(
            edges, keep.map_batches(
                lambda df, d=dst_col: df.rename(columns={"node": d}),
                batch_format="pandas"),
            on=dst_col, how="semi", lcols=[src_col, dst_col],
            rcols=[dst_col], num_buckets=num_buckets, cast=cast) \
            .repartition(num_buckets).materialize()
    raise ValueError(
        f"cyclic_core did not converge within max_rounds={max_rounds}; "
        f"raise max_rounds (trim depth exceeds the unrolled SQL "
        f"oracle's round budget)")
