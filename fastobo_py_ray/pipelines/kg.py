"""End-to-end KG-construction pipeline (north star).

Stage plan (SURVEY.md §2.2), expressed Ray-Data-first:

    S0 read_pages        ray.data.read_parquet (column-pruned)
    S1 extract_text      stateless map_batches (skip rows with text)
    S2 parse_ontology    driver-side (ontology << corpus) + ray.put
    S3 canonicalize_ids  IDspace compaction inside the index build
    S7a union-find       distributed connected_components over the
                         ontology identity edges -> representative map
    S4-S6 annotate       ONE actor-pool map_batches (detect + link + emit)
                         — page-local, zero shuffles
    S8 dedup_triples     partial per-batch counts -> groupby(s,p,o).sum
                         (the only corpus-wide shuffle)
    S9 materialize       sort(subj,pred,obj) -> partitioned write_parquet

The ontology payload (dictionary automaton + profiles + canonical edges) is
broadcast once via ``ray.put`` and fetched once per actor in ``__init__`` —
never re-shipped per batch.
"""

from __future__ import annotations

import os

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..obo import loads as obo_loads
from ..obo.model import Ontology
from ..stages.canonicalize import union_find
from ..stages.extract import extract_text_batch
from ..stages.mentions import OntologyIndex, PageAnnotator, build_index


def prepare_index(obo_text: str,
                  distributed_uf: bool = False) -> OntologyIndex:
    """Parse + compact an ontology and resolve identity clusters.

    ``distributed_uf=True`` runs the union-find as the distributed
    min-label propagation (requires an active Ray session); the default
    driver-side union-find is exact and appropriate for ontology-sized
    identity graphs (both are tested to agree).
    """
    ontology = obo_loads(obo_text).ontology
    eq = ontology.equivalence_edges()
    if distributed_uf and eq:
        import ray.data as rd

        from ..stages.canonicalize import (connected_components,
                                           representatives_from_labels)
        edges_ds = rd.from_arrow(pa.table({
            "a": [a for a, _ in eq], "b": [b for _, b in eq]}))
        reps = representatives_from_labels(connected_components(edges_ds))
    else:
        reps = union_find(eq)
    return build_index(ontology, reps)


def annotate_pages(pages_ds, index_ref, emit: str = "triples",
                   concurrency=None, batch_size: int = 1024,
                   langs: Optional[list] = None, use_actors: bool = False):
    """pages -> mentions or raw triples.

    Default path: ONE fused stateless ``map_batches`` (lang filter +
    extract_text + detect/link/emit) with the ontology index cached per
    worker process — elastic task parallelism, no actor-pool spin-up (see
    the measurement note in :mod:`fastobo_py_ray.stages.mentions`).
    ``use_actors=True`` switches to the :class:`PageAnnotator` actor pool
    (pass ``concurrency``), appropriate for long-lived cluster runs with
    heavy per-actor state.
    """
    from ..stages.mentions import make_page_annotator

    if use_actors:
        import pyarrow.compute as pc

        ds = pages_ds
        if langs:
            ds = ds.map_batches(
                lambda t, L=tuple(langs): t.filter(pc.is_in(
                    t["lang"], value_set=pa.array(L))),
                batch_format="pyarrow")
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
        return ds.map_batches(
            PageAnnotator, batch_format="pyarrow",
            fn_constructor_kwargs={"index_ref": index_ref, "emit": emit},
            concurrency=concurrency or 4, batch_size=batch_size)
    fn = make_page_annotator(index_ref, emit=emit, langs=langs)
    return pages_ds.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size)


def _split_urls_column(t: pa.Table) -> pa.Table:
    """\x1f-joined urls STRING column -> ``list<string>`` (exchange
    wire form -> adjacency schema).  Shared by both dedup reduce
    tiers, the incremental update path and the release refresh —
    building the list column in Arrow keeps every later stage
    (bucket map, parquet write) zero-copy-safe; ragged Python lists
    in a PANDAS block would break the block->Arrow conversion."""
    lists = [s.split("\x1f") if s else []
             for s in t["urls"].to_pylist()]
    return t.drop_columns(["urls"]).append_column(
        "urls", pa.array(lists, pa.list_(pa.string())))


def dedup_triples(triples_ds, num_partitions: Optional[int] = 32,
                  collect_urls: int = 0, scale_tier: str = "auto",
                  distinct_tier_threshold: int = 100_000):
    """S8 — exact dedup with evidence aggregation.

    Combiner pattern: per-batch partial counts (one row per distinct triple
    per batch) BEFORE the hash shuffle, so the all-to-all moves pre-reduced
    rows; the partials are coalesced to ``num_partitions`` blocks so the
    grouped reduce runs O(num_partitions) tasks — without it the sort
    shuffle inherits one partition per upstream page block (~900 tiny
    reduce tasks for a 2.4M-page corpus; measured 8.7s vs 6.6s e2e at 32
    CPUs).  At cluster scale set it to the intended reduce width.

    ``collect_urls=K`` additionally carries a deterministic evidence
    sample per triple (the K lexicographically-smallest source urls —
    min-merge is order-independent, so results don't depend on block
    arrival order), giving the SURVEY §1.2 adjacency
    ``urls:list<string>`` column at a bounded per-key cost.

    TWO reduce tiers, parity-tested value-identical
    (tests/test_kg_pipeline.py), both emitting globally
    (subj, pred, obj)-sorted output:

    * ``"sort_groupby"`` — Ray's sort-based groupby: ONE exchange that
      reduces AND range-orders.  Its per-distinct-group Python
      dispatch (~0.1 ms/group measured) is ideal while the distinct
      triple space stays ontology-bounded (the common KG case).
    * ``"grouped_agg"`` — coarse hash-bucket exchange with C-speed
      in-bucket pandas reduction (functions/relops.grouped_map shape)
      followed by an explicit range sort: two exchanges, NO per-group
      Python, the tier for open-world ontologies whose distinct
      triple space outgrows the ontology-bounded case (measured,
      BASELINE.md / tools/rehearse_dedup_tiers.py: crossover at
      ~10-20k distinct with url collection on; 4.7x at 50k, 13x at
      200k, and sort-groupby is unusable at 10^6+).
    * ``"auto"`` (default): the partials are materialized (pre-reduced,
      KB-scale per input block — a small spillable fraction of corpus
      bytes) and the tier picked by comparing their row count, an
      upper bound on distinct triples, to ``distinct_tier_threshold``
      (default 100k partial rows: comfortably above the headline
      corpus's ~13k block-diluted partials, below the measured
      degradation band — overestimation only errs toward the tier
      with no per-group cost).

    Output: (subj, pred, obj, n_evidence, confidence=max[, urls]).
    """
    from ray.data.aggregate import AggregateFn, Max, Sum

    k = collect_urls

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {"subj": [], "pred": [], "obj": [],
                    "n_evidence": [], "confidence": []}
            if k:
                cols["urls"] = pd.Series(dtype="string")
            return pd.DataFrame(cols)
        aggs = dict(n_evidence=("url", "size"),
                    confidence=("confidence", "max"))
        if k:
            # drop empty-string urls at the SOURCE so both reduce
            # tiers see the same evidence set (_merge_triple_frames
            # and the grouped_agg tier filter '' when re-merging; an
            # unfiltered partial here would let '' consume a head-k
            # slot in the sort-groupby tier only — tier-parity bug)
            aggs["urls"] = ("url", lambda s: "\x1f".join(
                sorted({u for u in s if u})[:k]))
        return df.groupby(["subj", "pred", "obj"], as_index=False).agg(
            **aggs)

    if scale_tier not in ("auto", "sort_groupby", "grouped_agg"):
        raise ValueError(f"scale_tier must be auto|sort_groupby|"
                         f"grouped_agg: {scale_tier!r}")

    partials = triples_ds.map_batches(partial, batch_format="pandas")
    if num_partitions:
        partials = partials.repartition(num_partitions)
    if scale_tier == "auto":
        partials = partials.materialize()
        scale_tier = ("grouped_agg"
                      if partials.count() > distinct_tier_threshold
                      else "sort_groupby")
    if scale_tier == "grouped_agg":
        return _dedup_triples_grouped_agg(partials, k)
    aggs = [Sum("n_evidence", alias_name="n_evidence"),
            Max("confidence", alias_name="confidence")]
    if k:
        def _merge(a: str, b: str) -> str:
            if not a:
                return b
            if not b:
                return a
            both = set(a.split("\x1f")) | set(b.split("\x1f"))
            return "\x1f".join(sorted(both)[:k])

        aggs.append(AggregateFn(
            init=lambda key: "",
            accumulate_row=lambda a, row: _merge(a, row["urls"]),
            merge=_merge, name="urls"))
    # scale note: this Ray sort-groupby both reduces AND globally
    # range-orders the output in ONE exchange — the adjacency writer's
    # sort elision rides that order (tripwire-asserted downstream). Its
    # per-distinct-group Python cost (~0.1 ms) is fine while the triple
    # space stays ontology-bounded (the pre-reduce above already
    # collapsed corpus volume); scale_tier="auto" dispatches to
    # _dedup_triples_grouped_agg past distinct_tier_threshold.
    out = partials.groupby(["subj", "pred", "obj"]).aggregate(*aggs)
    if k:
        out = out.map_batches(_split_urls_column, batch_format="pyarrow")
    return out


def _dedup_triples_grouped_agg(partials, k: int):
    """The >=10^6-distinct-triples reduce tier of :func:`dedup_triples`
    (see its docstring): coarse hash-bucket exchange + C-speed pandas
    reduction per bucket, then one explicit range sort so the output
    order contract matches the sort-groupby tier (the adjacency
    writer's sort-elision tripwire rides it).

    No per-group Python in the reduce: sums/maxes are pandas C
    kernels; the urls merge explodes the joined partial strings,
    dedups + sorts + head-k's in C (cumcount), and the final per-key
    join costs one O(<=k)-element ``str.join`` per DISTINCT triple —
    ~1 us/group in-task, 5 orders below the ~0.1 ms/group exchange
    dispatch this tier exists to avoid, and parallel across buckets.
    A bucket holds every partial of its keys (grouped_map contract),
    so head-k per bucket IS the global lexicographic head-k.
    """
    from ..functions.relops import grouped_map

    keys = ["subj", "pred", "obj"]

    def bucket_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, as_index=False, sort=False).agg(
            n_evidence=("n_evidence", "sum"),
            confidence=("confidence", "max"))
        # Ray's Max aggregate (the sort-groupby tier) widens to
        # float64; match it so the tiers are schema-identical
        out["confidence"] = out["confidence"].astype("float64")
        if k:
            e = df.loc[:, keys].copy()
            e["url"] = df["urls"].str.split("\x1f")
            e = e.explode("url", ignore_index=True)
            e = e[e["url"].notna() & (e["url"] != "")] \
                .drop_duplicates(keys + ["url"]) \
                .sort_values(keys + ["url"], kind="stable")
            e = e[e.groupby(keys, sort=False).cumcount() < k]
            codes = e.groupby(keys, sort=False).ngroup().to_numpy()
            if len(e):
                starts = np.flatnonzero(
                    np.r_[True, codes[1:] != codes[:-1]])
                bounds = np.r_[starts, len(e)]
                urls_arr = e["url"].to_numpy()
                u = e.iloc[starts][keys].assign(
                    urls=["\x1f".join(urls_arr[a:b])
                          for a, b in zip(bounds[:-1], bounds[1:])])
                out = out.merge(u, on=keys, how="left")
                out["urls"] = out["urls"].fillna("")
            else:
                out["urls"] = ""
        return out

    out = grouped_map(partials, keys, bucket_reduce, num_buckets=64) \
        .sort(keys)
    if k:
        out = out.map_batches(_split_urls_column, batch_format="pyarrow")
    return out


def materialize_adjacency(deduped_ds, out_dir: str,
                          presorted: bool = False,
                          subj_buckets: int = 0):
    """S9 — sorted, partitioned parquet adjacency (graph.ipynb DiGraph
    semantics, ``/root/reference/docs/examples/graph.ipynb``).

    ``presorted=True`` skips the sort shuffle: Ray Data's
    groupby-aggregate runs a sort-based shuffle over the same key tuple,
    so ``dedup_triples`` output is already globally range-ordered by
    (subj, pred, obj) — re-sorting would add a pure-overhead all-to-all.
    (Guarded by tests/test_kg_pipeline.py asserting sorted output.)

    ``subj_buckets=P`` writes hive-partitioned output keyed by
    ``subj_bucket = stable_hash(subj) % P`` (SURVEY §1.2 adjacency
    layout): all edges of a subject land in one directory, so graph
    consumers read a single bucket per entity and a resumable downstream
    job can process bucket directories independently.
    """
    if presorted:
        # tripwire for the range-ordered-aggregate contract: if a Ray
        # upgrade switches groupby to a hash shuffle, blocks stop being
        # internally sorted and this fails loudly instead of silently
        # writing unsorted adjacency (cross-block order is additionally
        # covered by tests/test_kg_pipeline.py).
        def _assert_block_sorted(t: pa.Table) -> pa.Table:
            keys = list(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                            t["obj"].to_pylist()))
            if keys != sorted(keys):
                raise AssertionError(
                    "dedup output is no longer range-sorted; drop "
                    "presorted=True (Ray groupby shuffle changed?)")
            return t

        ds = deduped_ds.map_batches(_assert_block_sorted,
                                    batch_format="pyarrow")
    else:
        ds = deduped_ds.sort(["subj", "pred", "obj"])
    if subj_buckets:
        import zlib

        # pyarrow batch fn: keeps a list<string> urls column (when
        # collect_urls was used) Arrow-native through the write
        def bucket(t: pa.Table) -> pa.Table:
            vals = [zlib.crc32(s.encode()) % subj_buckets
                    for s in t["subj"].to_pylist()]
            return t.append_column("subj_bucket",
                                   pa.array(vals, pa.int64()))

        ds.map_batches(bucket, batch_format="pyarrow") \
            .write_parquet(out_dir, partition_cols=["subj_bucket"])
        return
    ds.write_parquet(out_dir)


def _subj_bucket_series(subjs, p: int):
    import zlib

    return [zlib.crc32(s.encode()) % p for s in subjs]


def _merge_triple_frames(df: pd.DataFrame, k_urls: int = 0
                         ) -> pd.DataFrame:
    """Combine old-adjacency and delta rows of the SAME bucket: per
    (subj, pred, obj) the evidence count is additive, confidence is a
    max, the urls evidence sample re-min-merges (all three rules are
    associative, so incremental == full rebuild exactly).  ``urls``
    travels through the exchange as the ``\\x1f``-joined STRING form
    (ragged lists in pandas blocks don't survive block->Arrow)."""
    aggs = dict(n_evidence=("n_evidence", "sum"),
                confidence=("confidence", "max"))
    if k_urls:
        aggs["urls"] = ("urls", lambda s: "\x1f".join(sorted(
            {u for j in s for u in j.split("\x1f") if u})[:k_urls]))
    out = df.groupby(["subj", "pred", "obj"], as_index=False).agg(**aggs)
    return out.sort_values(["subj", "pred", "obj"], kind="stable") \
        .reset_index(drop=True)


def _k_urls_guard(adjacency_dir: str, k_urls: int) -> None:
    """k_urls schema guard (one parquet footer, milliseconds) — against
    ANY existing bucket, not just touched ones, so a delta landing only
    in brand-new buckets cannot write mixed schemas.  Legacy pre-lock
    stores may hold 'subj_bucket=K.trash' leftovers that this glob
    would match — exclude them (current swaps name trash
    '.trash.subj_bucket=K', which the glob never matches)."""
    import glob as _glob

    any_existing = sorted(
        f for f in _glob.glob(os.path.join(
            adjacency_dir, "subj_bucket=*", "*.parquet"))
        if ".trash" not in f)
    if any_existing:
        import pyarrow.parquet as _pq

        old_has_urls = "urls" in _pq.ParquetFile(any_existing[0]) \
            .schema_arrow.names
        if old_has_urls != bool(k_urls):
            raise ValueError(
                f"k_urls={k_urls} does not match the existing "
                f"adjacency ({'has' if old_has_urls else 'lacks'} a "
                "urls column): pass the same k_urls the base build "
                "used (run --k-urls)")


def _bucket_and_join_fn(subj_buckets: int, k_urls: int):
    """pyarrow batch fn: recompute the int64 subj_bucket key from subj
    (hive reads surface the partition col, often as string) and, when
    ``k_urls``, re-join the urls list to its \\x1f string form so the
    exchange moves plain string columns (see _merge_triple_frames)."""
    def bucket_and_join(t: pa.Table) -> pa.Table:
        out = t
        if "subj_bucket" in out.column_names:
            out = out.drop_columns(["subj_bucket"])
        if k_urls and "urls" in t.column_names:
            joined = ["\x1f".join(lst) for lst in
                      t["urls"].to_pylist()]
            out = out.drop_columns(["urls"]).append_column(
                "urls", pa.array(joined, pa.string()))
        vals = _subj_bucket_series(out["subj"].to_pylist(),
                                   subj_buckets)
        return out.append_column("subj_bucket",
                                 pa.array(vals, pa.int64()))

    return bucket_and_join


def update_adjacency(new_pages_ds, obo_text: str, adjacency_dir: str,
                     subj_buckets: int, batch_size: int = 1024,
                     langs: Optional[list] = ("en",),
                     k_urls: int = 0,
                     delta_id: Optional[str] = None) -> dict:
    """INCREMENTAL crawl ingestion: merge a NEW page batch into an
    existing subject-bucketed adjacency (written by
    ``materialize_adjacency(subj_buckets=P)``) rewriting ONLY the
    buckets the delta touches — at corpus scale a daily crawl delta
    touches a fraction of buckets, and rebuilding the whole graph for
    it is exactly the waste this path avoids.

    Equality contract (pytest-gated): ``pipeline(A) then update(B)``
    produces byte-identical per-bucket tables to ``pipeline(A + B)`` —
    evidence counts are additive, confidence is a max, and the
    evidence-url sample min-merges, all associative.

    IDEMPOTENCY: pass ``delta_id`` (a caller-chosen key per page
    batch, e.g. the crawl-segment name) and an at-least-once retry
    loop becomes exactly-once: an id already in the adjacency's
    applied-delta ledger makes the call a no-op
    (``{"skipped": delta_id}``), and the ledger commit rides the swap
    plan's completion — see :func:`_apply_swap_plan` for the crash
    ordering.  Without a ``delta_id`` the caller owns at-most-once
    delivery (re-ingesting the same pages double-counts evidence).

    Crash safety — the swap phase is RESUMABLE, not just per-bucket
    atomic: the merged buckets are fully written to a staging dir with
    a ``_PLAN`` file (the touched-bucket list) BEFORE any live bucket
    moves, then each bucket swaps via two renames (live ->
    ``.trash.subj_bucket=K``, staged -> live, delete trash; the '.'
    prefix keeps pyarrow hive discovery from ever parsing a trash dir
    as a partition during the crash window).  A crash anywhere in the
    swap loop leaves the plan + remaining staged buckets on disk, and
    :func:`repair_adjacency` FINISHES the interrupted swaps from the
    staging dir (never re-merging — so a crashed update is completed,
    not re-applied, and evidence counts cannot double).  A direct
    re-run is equally safe: update_adjacency FINISHES any pending
    complete plan before reading the live buckets (a leftover
    incomplete staging dir — crash during the staging write, no live
    bucket touched yet — is discarded and the update recomputes).

    CONCURRENCY: the whole ledger-check -> merge -> swap -> commit
    span holds an exclusive inter-process :class:`_adjacency_lock`
    (flock on ``<adjacency_dir>/_LOCK``), so concurrent updates —
    including an at-least-once retry of the SAME delta_id racing the
    original — serialize; the loser then sees the committed ledger
    and no-ops.  Exactly-once therefore holds under concurrent
    writers, not just single-writer discipline.

    Returns ``{"touched_buckets": [...], "delta_triples": n}``.
    """
    with _adjacency_lock(adjacency_dir):
        return _update_adjacency_locked(
            new_pages_ds, obo_text, adjacency_dir, subj_buckets,
            batch_size=batch_size, langs=langs, k_urls=k_urls,
            delta_id=delta_id)


def _update_adjacency_locked(new_pages_ds, obo_text: str,
                             adjacency_dir: str, subj_buckets: int,
                             batch_size: int = 1024,
                             langs: Optional[list] = ("en",),
                             k_urls: int = 0,
                             delta_id: Optional[str] = None) -> dict:
    """Body of :func:`update_adjacency`; caller holds the store lock."""
    import glob as _glob
    import shutil

    import ray
    import ray.data as rd

    from ..context import tune_data_context

    # a pending COMPLETE plan from a crashed update must be finished
    # (not destroyed) before a new merge reads the live buckets —
    # otherwise the delta that plan carried would be double-applied
    tmp_root = os.path.join(adjacency_dir, ".delta_merge_tmp")
    if os.path.exists(os.path.join(tmp_root, "_PLAN")):
        _repair_adjacency_locked(adjacency_dir)
    else:
        shutil.rmtree(tmp_root, ignore_errors=True)  # incomplete stage

    if delta_id is not None and delta_id in applied_delta_ids(
            adjacency_dir):
        return {"touched_buckets": [], "delta_triples": 0,
                "skipped": delta_id}

    _k_urls_guard(adjacency_dir, k_urls)

    tune_data_context()
    index_ref = ray.put(prepare_index(obo_text))
    triples = annotate_pages(new_pages_ds, index_ref, emit="triples",
                             batch_size=batch_size,
                             langs=list(langs) if langs else None)
    delta = dedup_triples(triples, collect_urls=k_urls)

    bucket_and_join = _bucket_and_join_fn(subj_buckets, k_urls)

    # materialized: the delta is ontology-bounded (dedup_triples
    # pre-reduced it) and consumed three times (touched-bucket scan,
    # count, merge input) — without this the corpus-scale annotate +
    # dedup pipeline would re-execute per consumer
    delta = delta.map_batches(bucket_and_join,
                              batch_format="pyarrow").materialize()
    touched = sorted({r["subj_bucket"] for r in
                      delta.select_columns(["subj_bucket"]).take_all()})
    delta_rows = delta.count()
    if not touched:
        return {"touched_buckets": [], "delta_triples": 0}

    old_dirs = [os.path.join(adjacency_dir, f"subj_bucket={b}")
                for b in touched]
    existing = [f for d in old_dirs if os.path.isdir(d)
                for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    merged = delta
    if existing:
        # (k_urls schema compatibility was guarded up front)
        old = rd.read_parquet(existing)
        merged = delta.union(old.map_batches(bucket_and_join,
                                             batch_format="pyarrow"))

    from ..functions.relops import grouped_map

    # an exchange bucket can hold SEVERAL subj_buckets — recompute the
    # partition key from subj after the merge rather than assuming one
    merged = grouped_map(
        merged, "subj_bucket",
        lambda df: _merge_triple_frames(df, k_urls=k_urls)
        .assign(subj_bucket=lambda d: _subj_bucket_series(
            d["subj"], subj_buckets)),
        num_buckets=min(16, max(1, len(touched))))
    if k_urls:
        merged = merged.map_batches(_split_urls_column,
                                    batch_format="pyarrow")
    merged.write_parquet(tmp_root, partition_cols=["subj_bucket"])
    # the plan marks staging COMPLETE: from here a crash is finished
    # (never re-merged) by repair_adjacency.  Written ATOMICALLY
    # (tmp + rename) so plan existence implies a complete plan — a
    # truncated _PLAN would wedge every later repair
    import json as _json
    plan = os.path.join(tmp_root, "_PLAN")
    with open(plan + ".tmp", "w") as fh:
        _json.dump({"touched_buckets": touched,
                    "delta_id": delta_id}, fh)
    os.rename(plan + ".tmp", plan)

    _apply_swap_plan(adjacency_dir, tmp_root, touched,
                     delta_id=delta_id)
    return {"touched_buckets": touched, "delta_triples": delta_rows}


_DELTA_LEDGER = "_APPLIED_DELTAS"
_LOCK_FILE = "_LOCK"


class _adjacency_lock:
    """Exclusive inter-process lock on an adjacency store (flock on
    ``<adjacency_dir>/_LOCK``) held for the whole ledger-check ->
    merge -> swap -> ledger-commit span of :func:`update_adjacency`
    and for :func:`repair_adjacency`.  Without it two concurrent runs
    of the SAME delta_id (a scheduler retry firing while the original
    is still alive) both see an empty ledger and double-count
    evidence, and a concurrent unrelated update can rmtree the other
    run's staging dir — the exactly-once contract assumes one writer,
    and this makes that assumption mechanical instead of operational.
    Blocking by default: the loser waits, then re-reads the ledger and
    no-ops.  flock is advisory, per open-file-description, and
    released by the kernel on crash — no stale-lock recovery needed.
    (Caveat shared by every flock user: on NFS<4 or other
    non-flock-coherent filesystems this degrades to per-node locking;
    run single-writer per store there.)"""

    def __init__(self, adjacency_dir: str, blocking: bool = True):
        self._path = os.path.join(adjacency_dir, _LOCK_FILE)
        self._blocking = blocking
        self._fh = None

    def __enter__(self):
        import fcntl

        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        self._fh = open(self._path, "a")
        flags = fcntl.LOCK_EX | (0 if self._blocking else fcntl.LOCK_NB)
        fcntl.flock(self._fh, flags)   # raises BlockingIOError if NB
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._fh, fcntl.LOCK_UN)
        self._fh.close()
        self._fh = None


def applied_delta_ids(adjacency_dir: str) -> list:
    """delta_ids already merged into this adjacency (the idempotency
    ledger :func:`update_adjacency` appends to on plan completion)."""
    import json as _json

    path = os.path.join(adjacency_dir, _DELTA_LEDGER)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return _json.load(fh)


def _apply_swap_plan(adjacency_dir: str, tmp_root: str,
                     touched, delta_id=None) -> list:
    """Finish (or resume) the bucket swaps of a staged merge: for each
    planned bucket still present in the staging dir, two renames
    (live -> trash, staged -> live) then drop the trash; a bucket
    absent from staging already swapped on a previous attempt.  When
    the plan carries a ``delta_id``, it is appended to the adjacency's
    idempotency ledger (atomic tmp+rename) BEFORE the staging dir is
    removed — the rmtree is the commit point, so any crash up to it
    leaves a resumable plan and any crash after it leaves the ledger
    entry that makes a retry a no-op.  Returns the buckets swapped by
    THIS call."""
    import json as _json
    import shutil

    done = []
    for b in touched:
        live = os.path.join(adjacency_dir, f"subj_bucket={b}")
        new = os.path.join(tmp_root, f"subj_bucket={b}")
        if not os.path.isdir(new):
            continue                      # swapped before a crash
        # '.'-prefixed so pyarrow dataset discovery ignores it: a plain
        # read_parquet(adjacency_dir) hitting the crash window must not
        # hive-parse a trash dir as a partition and double-count bucket b
        trash = os.path.join(adjacency_dir, f".trash.subj_bucket={b}")
        shutil.rmtree(trash, ignore_errors=True)
        if os.path.isdir(live):
            os.rename(live, trash)
        os.rename(new, live)
        shutil.rmtree(trash, ignore_errors=True)
        done.append(b)
    if delta_id is not None:
        ledger = applied_delta_ids(adjacency_dir)
        if delta_id not in ledger:
            ledger.append(delta_id)
            path = os.path.join(adjacency_dir, _DELTA_LEDGER)
            with open(path + ".tmp", "w") as fh:
                _json.dump(ledger, fh)
            os.rename(path + ".tmp", path)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return done


def verify_adjacency(adjacency_dir: str, subj_buckets: int) -> dict:
    """fsck for a bucketed adjacency store — the operational check a
    100TB graph needs before trusting a resume: per bucket dir,
    (a) every row's subject hashes to ITS bucket (misplaced rows break
    khop pruning and incremental merges silently), (b) rows are sorted
    by (subj, pred, obj) within each file AND files within a bucket
    dir cover non-overlapping key ranges (an interleaved multi-file
    bucket is unsorted to any reader that concatenates in file order),
    (c) FULL Arrow schemas — names and types — agree across buckets
    (dtype drift from a bad writer is schema drift too); plus (d) no
    leftover staging / trash dirs (a pending repair).  Reads
    bucket-by-bucket with pyarrow — driver memory is one bucket,
    never the store.

    Returns ``{"buckets": n, "rows": n, "problems": [...]}`` —
    empty ``problems`` means clean."""
    import glob as _glob

    import pyarrow.parquet as _pq

    problems = []
    ref_schema = None
    n_rows = 0
    bucket_dirs = sorted(_glob.glob(
        os.path.join(adjacency_dir, "subj_bucket=*")))
    bucket_dirs = [d for d in bucket_dirs if not d.endswith(".trash")]
    for d in bucket_dirs:
        b = int(os.path.basename(d).split("=")[1])
        ranges = []                       # (min_key, max_key, file)
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
            t = _pq.read_table(f)
            n_rows += t.num_rows
            sch = pa.schema([fld for fld in t.schema
                             if fld.name != "subj_bucket"])
            if ref_schema is None:
                ref_schema = sch
            elif not sch.equals(ref_schema):
                problems.append(f"schema mismatch in {f}: {sch} != "
                                f"{ref_schema}")
            subs = t["subj"].to_pylist()
            bad = [s for s in subs
                   if _subj_bucket_series([s], subj_buckets)[0] != b]
            if bad:
                problems.append(
                    f"{len(bad)} misplaced subjects in {f} "
                    f"(e.g. {bad[0]!r} does not hash to bucket {b})")
            keys = list(zip(subs, t["pred"].to_pylist(),
                            t["obj"].to_pylist()))
            if keys != sorted(keys):
                problems.append(f"rows not (subj,pred,obj)-sorted: {f}")
            if keys:
                ranges.append((keys[0], keys[-1], f))
        # cross-file order within the bucket: sort by min key, assert
        # ranges don't overlap (order-insensitive, so it holds whatever
        # the writer's file-naming scheme is)
        ranges.sort()
        for (lo_a, hi_a, fa), (lo_b, _hi_b, fb) in zip(ranges,
                                                       ranges[1:]):
            if hi_a > lo_b:
                problems.append(
                    f"interleaved key ranges within bucket {b}: "
                    f"{fa} max {hi_a!r} > {fb} min {lo_b!r}")
    for leftover in ("*.trash", ".trash.subj_bucket=*",
                     ".delta_merge_tmp"):
        hits = _glob.glob(os.path.join(adjacency_dir, leftover))
        if hits:
            problems.append(
                f"pending repair artifacts: {sorted(hits)} — run "
                "repair_adjacency")
    return {"buckets": len(bucket_dirs), "rows": n_rows,
            "problems": problems}


def khop_subgraph(adjacency_dir: str, seeds, k: int,
                  subj_buckets: int, max_frontier: int = 1_000_000
                  ) -> pd.DataFrame:
    """k-hop ego subgraph from a SUBJECT-BUCKETED adjacency, reading
    ONLY the bucket directories each hop's frontier hashes into — the
    consumer-side payoff of the hive layout: a 3-hop query around a few
    entities touches a handful of buckets, never the corpus-scale
    graph.  Per hop: hash the frontier to its buckets, scan just those
    parquet dirs with a vectorized ``isin`` on ``subj`` (a bucket holds
    EVERY edge of its subjects, so the hop is exact), append the edges,
    advance the frontier to the unvisited objects.

    ``max_frontier`` guards the driver-resident frontier set (raise it
    or switch to an iterative bucketed join for supernode-dense
    graphs; the guard raises rather than silently truncating).

    Returns the edge table ``(subj, pred, obj, hop)`` with ``hop`` =
    the BFS depth at which the edge was expanded (1-based).
    """
    import glob as _glob

    import ray.data as rd

    frontier = {str(s) for s in seeds}
    visited = set(frontier)
    out_frames = []
    for hop in range(1, k + 1):
        if not frontier:
            break
        if len(frontier) > max_frontier:
            raise ValueError(
                f"khop frontier {len(frontier)} exceeds max_frontier="
                f"{max_frontier} at hop {hop}; raise the guard or use "
                "a bucketed-join traversal for supernode graphs")
        buckets = sorted({b for b in _subj_bucket_series(
            sorted(frontier), subj_buckets)})
        files = [f for b in buckets for f in sorted(_glob.glob(
            os.path.join(adjacency_dir, f"subj_bucket={b}",
                         "*.parquet")))]
        if not files:
            break
        fr = frontier

        def pick(df: pd.DataFrame, fr=fr, hop=hop) -> pd.DataFrame:
            hit = df[df["subj"].isin(fr)]
            return pd.DataFrame({
                "subj": hit["subj"].astype(str),
                "pred": hit["pred"].astype(str),
                "obj": hit["obj"].astype(str),
                "hop": np.full(len(hit), hop, dtype="int64")})

        edges = rd.read_parquet(files, columns=["subj", "pred", "obj"]) \
            .map_batches(pick, batch_format="pandas").to_pandas()
        out_frames.append(edges)
        frontier = set(edges["obj"]) - visited
        visited |= frontier
    if not out_frames:
        return pd.DataFrame({"subj": pd.Series(dtype=str),
                             "pred": pd.Series(dtype=str),
                             "obj": pd.Series(dtype=str),
                             "hop": pd.Series(dtype="int64")})
    return pd.concat(out_frames, ignore_index=True) \
        .sort_values(["hop", "subj", "pred", "obj"]) \
        .reset_index(drop=True)


def repair_adjacency(adjacency_dir: str) -> list:
    """Recover from a crash anywhere in :func:`update_adjacency`:

    1. if a COMPLETE staging dir exists (``.delta_merge_tmp`` with its
       ``_PLAN``), FINISH the interrupted swaps from the staged merged
       buckets — the crashed update is completed, never re-applied;
    2. an incomplete staging dir (no plan: the crash hit during the
       staging write, before any live bucket moved) is deleted — the
       caller re-runs the update from scratch safely;
    3. any still-stranded trash dir (``.trash.subj_bucket=K``, or the
       legacy pre-lock ``subj_bucket=K.trash`` name) whose live dir is
       missing (crash between the two renames, pre-plan-era layouts)
       is renamed back; a trash beside a live dir is a completed
       swap's leftover and is deleted.

    Takes the store's exclusive :class:`_adjacency_lock` first — a
    repair racing a live update would otherwise rmtree its staging
    dir mid-write.  Returns the bucket dirs this call completed or
    restored."""
    with _adjacency_lock(adjacency_dir):
        return _repair_adjacency_locked(adjacency_dir)


def _repair_adjacency_locked(adjacency_dir: str) -> list:
    """Body of :func:`repair_adjacency`; caller holds the store lock."""
    import glob
    import json as _json
    import shutil

    changed = []
    tmp_root = os.path.join(adjacency_dir, ".delta_merge_tmp")
    plan_file = os.path.join(tmp_root, "_PLAN")
    if os.path.exists(plan_file):
        with open(plan_file) as fh:
            plan = _json.load(fh)
        changed += [os.path.join(adjacency_dir, f"subj_bucket={b}")
                    for b in _apply_swap_plan(
                        adjacency_dir, tmp_root,
                        plan["touched_buckets"],
                        delta_id=plan.get("delta_id"))]
    else:
        shutil.rmtree(tmp_root, ignore_errors=True)

    stranded = [
        (t, t[:-len(".trash")]) for t in glob.glob(
            os.path.join(adjacency_dir, "subj_bucket=*.trash"))
    ] + [
        (t, os.path.join(adjacency_dir,
                         os.path.basename(t)[len(".trash."):]))
        for t in glob.glob(os.path.join(
            adjacency_dir, ".trash.subj_bucket=*"))
    ]
    for trash, live in sorted(stranded):
        if os.path.isdir(live):
            shutil.rmtree(trash)
        else:
            os.rename(trash, live)
            changed.append(live)
    return changed


def run_kg_pipeline(pages_ds, obo_text: str, out_dir: Optional[str] = None,
                    concurrency=None, batch_size: int = 1024,
                    langs: Optional[list] = ("en",),
                    use_actors: bool = False, subj_buckets: int = 0,
                    k_urls: int = 0):
    """Full pipeline: pages Dataset + OBO text -> deduped triples Dataset
    (written to ``out_dir`` when given; ``subj_buckets=P`` writes the
    hive-bucketed layout :func:`update_adjacency` ingests increments
    into, ``k_urls=K`` carries the evidence-url sample)."""
    import ray

    from ..context import tune_data_context

    tune_data_context()
    index = prepare_index(obo_text)
    index_ref = ray.put(index)
    triples = annotate_pages(pages_ds, index_ref, emit="triples",
                             concurrency=concurrency, batch_size=batch_size,
                             langs=list(langs) if langs else None,
                             use_actors=use_actors)
    deduped = dedup_triples(triples, collect_urls=k_urls)
    if out_dir:
        materialize_adjacency(deduped, out_dir, presorted=True,
                              subj_buckets=subj_buckets)
    return deduped
