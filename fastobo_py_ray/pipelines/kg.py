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

from typing import Dict, Optional

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


def dedup_triples(triples_ds, num_partitions: Optional[int] = 32,
                  collect_urls: int = 0):
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
            aggs["urls"] = ("url",
                            lambda s: "\x1f".join(sorted(set(s))[:k]))
        return df.groupby(["subj", "pred", "obj"], as_index=False).agg(
            **aggs)

    partials = triples_ds.map_batches(partial, batch_format="pandas")
    if num_partitions:
        partials = partials.repartition(num_partitions)
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
    # collapsed corpus volume); for an ontology whose distinct-triple
    # space reaches ~10^6+, switch to grouped_agg + an explicit sort
    # (two exchanges, no per-group Python) — crossover ~100s of
    # group-dispatch per million distinct triples.
    out = partials.groupby(["subj", "pred", "obj"]).aggregate(*aggs)
    if k:
        def split_urls(df: pd.DataFrame) -> pd.DataFrame:
            df["urls"] = [s.split("\x1f") if s else []
                          for s in df["urls"]]
            return df

        out = out.map_batches(split_urls, batch_format="pandas")
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

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["subj_bucket"] = [zlib.crc32(s.encode()) % subj_buckets
                                 for s in df["subj"]]
            return df

        ds.map_batches(bucket, batch_format="pandas") \
            .write_parquet(out_dir, partition_cols=["subj_bucket"])
        return
    ds.write_parquet(out_dir)


def run_kg_pipeline(pages_ds, obo_text: str, out_dir: Optional[str] = None,
                    concurrency=None, batch_size: int = 1024,
                    langs: Optional[list] = ("en",),
                    use_actors: bool = False):
    """Full pipeline: pages Dataset + OBO text -> deduped triples Dataset
    (written to ``out_dir`` when given)."""
    import ray

    from ..context import tune_data_context

    tune_data_context()
    index = prepare_index(obo_text)
    index_ref = ray.put(index)
    triples = annotate_pages(pages_ds, index_ref, emit="triples",
                             concurrency=concurrency, batch_size=batch_size,
                             langs=list(langs) if langs else None,
                             use_actors=use_actors)
    deduped = dedup_triples(triples)
    if out_dir:
        materialize_adjacency(deduped, out_dir, presorted=True)
    return deduped
