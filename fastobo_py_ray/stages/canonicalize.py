"""S7 — distributed canonicalization: union-find as iterative shuffles.

Equivalence classes are induced by ``alt_id`` + ``replaced_by`` + xrefs
under ``treat-xrefs-as-equivalent`` (``/root/reference/src/py/header/
clause.rs:1212-1286``); the class representative is the minimum canonical
identifier under the reference ordering (``src/py/id.rs:308-335``), which
plain string order on canonical id strings reproduces.

Four implementations with identical results (pick by scale):

* :func:`union_find` — exact driver-side union-find for small edge sets
  (an ontology's identity edges are tiny relative to the corpus). Used to
  seed the broadcast representative map and as the test oracle.
* :func:`connected_components_contract` — DEFAULT distributed path:
  tree-reduce of per-block union-finds, no keyed shuffle; bounded by one
  worker holding a star edge per distinct node at the root.
* :func:`connected_components_bigstar` — beyond-single-task-heap path:
  alternating large-star/small-star rounds (published MapReduce CC
  algorithm), two coarse exchanges per round, per-task memory = one
  edge bucket, hub degree self-heals geometrically.
* :func:`connected_components` — distributed min-label propagation over a
  Ray ``Dataset`` of edges, for corpus-scale identity graphs (e.g. LSH
  near-dup clusters over 10^12 documents). Each round is
  ``union -> grouped_map(node,salt) propagate -> grouped_agg(node) min``
  — coarse hash-bucket exchanges (node cardinality never touches Ray's
  per-group sort-groupby machinery; in-bucket work is vectorized pandas
  groupby/merge, no per-node Python). Skew notes: per-batch
  combiners pre-reduce (node, label) pairs to per-batch minima before each
  shuffle, so a head entity with millions of edges contributes at most one
  row per upstream block per round; converges in O(graph diameter) rounds
  (identity clusters are shallow: alt_id/xref stars), with convergence
  detected by a label checksum instead of a driver-side materialization.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import pandas as pd
import pyarrow as pa

from ..obo import ids as obo_ids


# ---------------------------------------------------------------------------
# exact driver-side union-find (small inputs; also the test oracle)
# ---------------------------------------------------------------------------

def union_find(edges: Iterable[Tuple[str, str]],
               key=obo_ids.sort_key) -> Dict[str, str]:
    """Edges -> {node: representative}; representative = min(key) of its
    component. Non-trivial entries only (identity mappings omitted)."""
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by canonical order so the min id is always the root
            lo, hi = (ra, rb) if key(ra) <= key(rb) else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent) if find(x) != x}


# ---------------------------------------------------------------------------
# distributed connected components (min-label propagation)
# ---------------------------------------------------------------------------

# string-safe grouped min (factor-code path) — shared engine primitive
from ..functions.relops import group_min as _group_min_str  # noqa: E402


def _batch_min_label(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: keep the minimum label per node (skew defusal —
    runs before each shuffle so hot nodes shrink to one row per block)."""
    if df.empty:
        return pd.DataFrame({"node": pd.Series(dtype="string"),
                             "label": pd.Series(dtype="string")})
    out = _group_min_str(df, ["node"], "label")
    return out.astype({"node": "string", "label": "string"})


def _lab_frame(nodes, labels, salts, nbrs=None) -> pd.DataFrame:
    """All columns explicitly string-typed ('' = absent) — a block whose
    column Arrow types as null (all-None or empty) breaks sort-boundary
    computation in the shuffle (float vs str searchsorted)."""
    n = len(nodes)
    return pd.DataFrame({
        "node": pd.Series(list(nodes), dtype="string"),
        "salt": pd.Series(list(salts), dtype="int64"),
        "label": pd.Series([l if l is not None else "" for l in labels],
                           dtype="string"),
        "nbr": pd.Series(list(nbrs) if nbrs is not None else [""] * n,
                         dtype="string"),
    })


def connected_components(edges_ds, col_a: str = "a", col_b: str = "b",
                         max_rounds: int = 25, salt: int = 4):
    """Distributed connected components over a Dataset of string edges.

    Returns a Dataset with columns (node, label) where ``label`` is the
    component's minimum node id. Min-label propagation:

        labels <- node -> node
        repeat: every node sends its label to every neighbor;
                labels <- min(received, own)
        until the global label checksum stops changing.

    **Head-entity skew defusal (north-rule "salted entity hash")**: the
    propagate shuffle is keyed on ``(node, hash(nbr) % salt)`` rather than
    the bare node, so a hub with millions of neighbors fans out over
    ``salt`` independent groups instead of one giant straggler group; the
    node's label row is replicated to every salt lane (``salt`` rows per
    node per round — constant, vs O(degree) group size without it).  The
    per-batch min-label combiner then pre-reduces messages before the
    label reduce, so hot nodes also shrink to one row per block there.
    """
    import zlib

    from ..context import tune_data_context
    from ..functions.relops import grouped_map

    tune_data_context()
    salt = max(1, salt)

    def explode(batch: pa.Table) -> pa.Table:
        a = batch[col_a].to_pylist()
        b = batch[col_b].to_pylist()
        nodes, nbrs = a + b, b + a
        salts = [zlib.crc32(x.encode()) % salt for x in nbrs]
        return pa.table({"node": nodes, "nbr": nbrs, "salt": salts})

    adj = edges_ds.map_batches(explode, batch_format="pyarrow").materialize()
    # labels block count sized to the node-row volume (not inherited from
    # the upstream task count, which is often dozens of near-empty blocks
    # whose per-block overhead then taxes every propagation round)
    import math

    import ray

    num_label_blocks = max(1, min(adj.num_blocks(),
                                  math.ceil(adj.count() / 65536)))
    # exchange width: label blocks may be few (small graphs), but the
    # coarse-bucket exchanges should still spread over the cluster's cores
    num_buckets = max(num_label_blocks,
                      int(ray.cluster_resources().get("CPU", 8)))
    labels = adj.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"].drop_duplicates(),
            }).assign(label=lambda x: x["node"])
        .astype({"node": "string", "label": "string"}),
        batch_format="pandas")

    def checksum(lab) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            s = sum(zlib.crc32(f"{n}\x00{l}".encode())
                    for n, l in zip(df["node"], df["label"]))
            return pd.DataFrame({"c": [s]})
        parts = lab.map_batches(h, batch_format="pandas").to_pandas()
        return int(parts["c"].sum())

    def propagate_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """One coarse bucket's (node,salt) groups, fully vectorized:
        per-lane min own label (C groupby), then a merge fans it out to
        the lane's neighbors (edge rows whose node has no label row are
        dropped by the inner merge, as in the per-group original)."""
        own = df[df["nbr"] == ""]
        own_min = _group_min_str(own, ["node", "salt"], "label")
        adj_r = df[df["nbr"] != ""]
        sent = adj_r.merge(own_min[["node", "salt", "label"]],
                           on=["node", "salt"], how="inner",
                           suffixes=("_drop", ""))
        out = pd.concat(
            [own_min[["node", "label"]],
             sent[["nbr", "label"]].rename(columns={"nbr": "node"})],
            ignore_index=True)
        return pd.DataFrame({
            "node": out["node"].astype("string"),
            "label": out["label"].astype("string")})

    def replicate_labels(df: pd.DataFrame) -> pd.DataFrame:
        """One label row per (node, salt lane)."""
        reps = []
        for s in range(salt):
            reps.append(_lab_frame(df["node"], df["label"],
                                   [s] * len(df)))
        return pd.concat(reps, ignore_index=True)

    def pointer_double(lab):
        """labels[node] <- labels[labels[node]] — one shuffle keyed on the
        looked-up label; shortcuts chains so convergence needs
        O(log diameter) propagate+double iterations instead of
        O(diameter) propagates (SURVEY §2.2 S7 pointer-jump)."""
        # explicit string schema on both sides ("" sentinel + is_ask flag)
        # so no block carries an all-null column that Arrow would type as
        # null and pandas as float (mixed-type sort keys break the shuffle)
        asks = lab.map_batches(
            lambda df: pd.DataFrame({"key": df["label"].astype(str),
                                     "node": df["node"].astype(str),
                                     "val": [""] * len(df),
                                     "is_ask": [True] * len(df)}),
            batch_format="pandas")
        answers = lab.map_batches(
            lambda df: pd.DataFrame({"key": df["node"].astype(str),
                                     "node": [""] * len(df),
                                     "val": df["label"].astype(str),
                                     "is_ask": [False] * len(df)}),
            batch_format="pandas")

        def resolve_bucket(df: pd.DataFrame) -> pd.DataFrame:
            """Vectorized: answers give key -> val (one row per node from
            the label reduce; min() collapses defensively), a left merge
            resolves asks; a key with no label row is already a root."""
            ask = df[df["is_ask"]]
            ans = _group_min_str(df[~df["is_ask"]], ["key"], "val")
            m = ask.merge(ans, on="key", how="left",
                          suffixes=("_drop", ""))
            lab = m["val"].where(m["val"].notna() & (m["val"] != ""),
                                 m["key"])
            return pd.DataFrame({"node": m["node"].astype("string"),
                                 "label": lab.astype("string")})

        return grouped_map(asks.union(answers), "key", resolve_bucket,
                           num_buckets=num_buckets)

    prev = checksum(labels)
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(replicate_labels,
                                      batch_format="pandas")
        adj_rows = adj.map_batches(
            lambda df: _lab_frame(df["node"], [None] * len(df),
                                  df["salt"], df["nbr"]),
            batch_format="pandas")
        msgs = grouped_map(lab_rows.union(adj_rows), ["node", "salt"],
                           propagate_bucket, num_buckets=num_buckets)
        # materialize: pointer_double reads `merged` twice (asks+answers);
        # an unmaterialized handle would re-execute the whole round twice
        merged = grouped_map(
            msgs.map_batches(_batch_min_label, batch_format="pandas"),
            "node", lambda df: _group_min_str(df, ["node"], "label"),
            num_buckets=num_buckets).materialize()
        # resolve() emits exactly one row per node, so no extra reduce.
        # repartition caps the block count: union+sort inherit the SUM of
        # input block counts, so without the coalesce labels blocks double
        # every round (B -> 2B+|adj|) and round cost grows exponentially.
        labels = pointer_double(merged) \
            .repartition(num_label_blocks).materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def connected_components_bigstar(edges_ds, col_a: str = "a",
                                 col_b: str = "b", max_rounds: int = 32,
                                 num_buckets: Optional[int] = None):
    """Distributed connected components by alternating large-star /
    small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014 — public algorithm, reimplemented
    here on Ray Data):

        large-star: per node u, every neighbor v > u re-points to
                    m = min(N(u) + {u});
        small-star: per node u (edges canonicalized u > v), every
                    neighbor and u itself re-point to m.

    Each round is ONE coarse hash-bucket exchange keyed on the node
    (:func:`~..functions.relops.grouped_map`; in-bucket work is
    vectorized merge/group-min, no per-node Python), converging in
    O(log^2 n) rounds to a star per component rooted at its minimum
    label. Per-task memory is one bucket's edges — never the node set
    — making this the beyond-single-task-heap path (preferred over the
    min-label propagation in :func:`connected_components`, which it
    matches result-for-result by test). Hub skew self-heals: large-star
    rounds cut the maximum degree geometrically.

    Returns (node, label) for every node of the edge set, roots
    included.
    """
    import zlib

    import ray

    from ..context import tune_data_context
    from ..functions.relops import group_min, grouped_map

    tune_data_context()
    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def explode_both(df: pd.DataFrame, ca: str = None,
                     cb: str = None) -> pd.DataFrame:
        a = df[ca or col_a].astype(str)
        b = df[cb or col_b].astype(str)
        return pd.DataFrame({
            "u": pd.concat([a, b], ignore_index=True).astype("string"),
            "v": pd.concat([b, a], ignore_index=True).astype("string")})

    def large_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        mins = group_min(df, ["u"], "v").rename(columns={"v": "__mv"})
        m = df.merge(mins, on="u")
        m["__m"] = m[["__mv", "u"]].min(axis=1)
        out = m.loc[m["v"] > m["u"], ["v", "__m"]].rename(
            columns={"v": "u", "__m": "v"})
        return out.drop_duplicates().astype(
            {"u": "string", "v": "string"})

    def canonicalize_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """(u,v) -> (max,min), self-loops dropped, deduped per bucket."""
        df = df[df["u"] != df["v"]]
        hi = df[["u", "v"]].max(axis=1)
        lo = df[["u", "v"]].min(axis=1)
        return pd.DataFrame({"u": hi, "v": lo}).drop_duplicates() \
            .astype({"u": "string", "v": "string"})

    def small_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        mins = group_min(df, ["u"], "v").rename(columns={"v": "__m"})
        m = df.merge(mins, on="u")
        nbr = m.loc[m["v"] != m["__m"], ["v", "__m"]].rename(
            columns={"v": "u", "__m": "v"})
        selfrow = mins.rename(columns={"u": "u", "__m": "v"})
        out = pd.concat([nbr, selfrow], ignore_index=True)
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates().astype(
            {"u": "string", "v": "string"})

    def checksum(ds_edges):
        """(row count, crc32 sum) — the count guards the (already tiny)
        odds of a sum-of-CRC collision between different edge sets."""
        def h(df: pd.DataFrame) -> pd.DataFrame:
            s = sum(zlib.crc32(f"{a}\x00{b}".encode())
                    for a, b in zip(df["u"], df["v"]))
            return pd.DataFrame({"c": [s], "n": [len(df)]})
        parts = ds_edges.map_batches(h, batch_format="pandas").to_pandas()
        if parts.empty:  # zero-row dataset: no batch ever ran
            return (0, 0)
        return (int(parts["n"].sum()), int(parts["c"].sum()))

    edges = edges_ds.map_batches(explode_both,
                                 batch_format="pandas").materialize()
    prev = None
    converged = False
    for _ in range(max_rounds):
        # large star: the u-group needs BOTH directions of each edge
        # (maintained by the re-explode at the bottom of the loop)
        ls = grouped_map(edges, "u", large_star_bucket,
                         num_buckets=num_buckets)
        # canonicalization is per-edge (stateless map, no exchange);
        # the small-star grouped_map is the round's second exchange
        canon = ls.map_batches(canonicalize_bucket, batch_format="pandas")
        ss = grouped_map(canon, "u", small_star_bucket,
                         num_buckets=num_buckets).materialize()
        cur = checksum(ss)
        # re-explode for the next large-star round (lazy: consumed once,
        # by the next round's grouped_map — or not at all on the last)
        edges = ss.map_batches(lambda df: explode_both(df, "u", "v"),
                               batch_format="pandas")
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_bigstar did not converge within "
            f"max_rounds={max_rounds} (expected O(log^2 n) rounds); "
            f"raise max_rounds or use connected_components_contract")

    # converged: ss rows are (node, root) star edges with u > v == root.
    # Roots, isolated nodes and self-loop-only nodes appear in the input
    # node set but not as ss.u — union the node set in and emit identity
    # labels for exactly those (a labeled node keeps its star label).
    star = ss.map_batches(
        lambda df: pd.DataFrame({"node": df["u"], "label": df["v"]}),
        batch_format="pandas")
    all_nodes = edges_ds.map_batches(
        lambda df: pd.DataFrame({
            "node": pd.concat([df[col_a].astype(str),
                               df[col_b].astype(str)],
                              ignore_index=True).astype("string"),
            "label": pd.Series([""] * (2 * len(df)), dtype="string")}),
        batch_format="pandas")

    def finalize_labels(df: pd.DataFrame) -> pd.DataFrame:
        labeled = df[df["label"] != ""].drop_duplicates()
        rootish = df.loc[~df["node"].isin(labeled["node"]),
                         ["node"]].drop_duplicates()
        ident = pd.DataFrame({"node": rootish["node"],
                              "label": rootish["node"]})
        out = pd.concat([labeled, ident], ignore_index=True)
        return out.astype({"node": "string", "label": "string"})

    return grouped_map(star.union(all_nodes), "node", finalize_labels,
                       num_buckets=num_buckets)


def connected_components_contract(edges_ds, col_a: str = "a",
                                  col_b: str = "b", fan_in: int = 8,
                                  key=None, direct_rows: int = 1_000_000):
    """Distributed connected components by associative DSU contraction.

    Union-find over an edge list is a commutative monoid: each task runs
    an EXACT union-find over its block's edges and emits star edges
    (node -> block-local root); star edges from several blocks merged by
    another union-find yield the components of the union.  So the whole
    computation is a k-ary tree reduce —

        per-block contract -> coalesce blocks ``fan_in``:1 -> re-contract
        -> ... -> single block = global components

    — with NO sort shuffle anywhere: each round is a block coalesce
    (``repartition`` without key exchange) plus an embarrassingly
    parallel map task, and there are ``log_fan_in(num_blocks)`` rounds.
    This makes it ~20x cheaper than per-round keyed shuffles for sparse
    edge sets (measured: 40s -> <2s on a 32-cpu box).

    Memory bound: the final task holds one star edge per distinct node of
    the edge set (NOT per corpus row).  When even that exceeds a single
    worker's heap (>~10^8 nodes in near-dup clusters), use the
    shuffle-based :func:`connected_components` min-label propagation
    instead — same results, bounded per-task memory.

    ``key`` orders representatives (min under ``key`` wins; default plain
    value order).  Returns a Dataset with columns (node, label) covering
    every node that appears in an edge.
    """
    import math

    from ..context import tune_data_context

    tune_data_context()
    k = key if key is not None else (lambda x: x)

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({col_a: pd.Series(dtype="string"),
                                 col_b: pd.Series(dtype="string")})
        reps = union_find(zip(df[col_a], df[col_b]), key=k)
        nodes = sorted(set(df[col_a]) | set(df[col_b]), key=k)
        return pd.DataFrame({
            col_a: pd.Series(nodes, dtype="string"),
            col_b: pd.Series([reps.get(n, n) for n in nodes],
                             dtype="string")})

    # batch_size=None: one batch per block — the contraction must see the
    # whole block to collapse it
    star = edges_ds.map_batches(contract, batch_format="pandas",
                                batch_size=None).materialize()
    # Star sets at or under ``direct_rows`` collapse in ONE coalesce: the
    # final task holds every distinct node of the edge set regardless of
    # tree shape, so once the total star-edge count fits a single
    # worker's heap the fan-in tree only adds materialize rounds (each
    # ~0.1-0.3s of executor latency) without improving the memory bound.
    while star.num_blocks() > 1:
        nb = 1 if star.count() <= direct_rows \
            else max(1, math.ceil(star.num_blocks() / fan_in))
        star = star.repartition(nb).map_batches(
            contract, batch_format="pandas",
            batch_size=None).materialize()
        if nb == 1:
            # the single coalesced task saw EVERY star edge, so its
            # output is the global fixpoint — terminate on that fact,
            # NOT on num_blocks()==1: once the star set outgrows
            # target_max_block_size Ray re-splits the one task's output
            # into several blocks, and a block-count test would re-run
            # the full contraction forever (caught by the 5M-doc scale
            # rehearsal; regression-tested with a shrunken block size)
            break
    return star.map_batches(
        lambda df: df.rename(columns={col_a: "node", col_b: "label"}),
        batch_format="pandas")


def representatives_from_labels(labels_ds) -> Dict[str, str]:
    """Collect a (small) labels Dataset into a {node: rep} dict, dropping
    identity rows. Only for broadcast-sized outputs (ontology identity
    graphs); corpus-scale outputs stay Datasets and are applied with a
    distributed join instead."""
    out = {}
    for row in labels_ds.take_all():
        if row["node"] != row["label"]:
            out[row["node"]] = row["label"]
    return out


# ---------------------------------------------------------------------------
# applying representatives
# ---------------------------------------------------------------------------

def _map_unique(batch: pa.Table, cols: List[str], fn) -> pa.Table:
    """Apply a per-value Python function to id columns via the column's
    DICTIONARY: id columns are ontology-bounded (thousands of distinct
    values across millions of rows), so ``fn`` runs once per distinct
    value and a C-speed take() fans the results back out — never a
    Python call per row."""
    import pyarrow.compute as pc

    for c in cols:
        col = batch[c]
        enc = pc.dictionary_encode(col.combine_chunks()
                                   if col.num_chunks > 1 else col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        mapped = pa.array([fn(v) if v is not None else None
                           for v in uniq], type=pa.string())
        new = mapped.take(enc.indices)
        batch = batch.set_column(batch.column_names.index(c), c, new)
    return batch


def apply_representatives_batch(batch: pa.Table, cols: List[str],
                                rep: Dict[str, str]) -> pa.Table:
    """Rewrite id columns through a broadcast representative map."""
    return _map_unique(batch, cols, lambda v: rep.get(v, v))


def compact_ids_batch(batch: pa.Table, cols: List[str],
                      idspaces: Optional[Dict[str, str]] = None) -> pa.Table:
    """S3 vectorized canonicalizer: IDspace compaction over id columns
    (``OboDoc.compact_ids`` semantics, ``src/py/doc.rs:241-248``)."""
    return _map_unique(batch, cols,
                       lambda v: obo_ids.compact(v, idspaces))


def decompact_ids_batch(batch: pa.Table, cols: List[str],
                        idspaces: Optional[Dict[str, str]] = None) -> pa.Table:
    """Inverse of :func:`compact_ids_batch` (``src/py/doc.rs:278-285``)."""
    return _map_unique(batch, cols,
                       lambda v: obo_ids.decompact(v, idspaces))
