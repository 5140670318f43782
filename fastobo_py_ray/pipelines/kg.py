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
                   concurrency: int = 4, batch_size: int = 256,
                   langs: Optional[list] = None):
    """pages -> mentions or raw triples via the PageAnnotator actor pool."""
    import pyarrow.compute as pc

    ds = pages_ds
    if langs:
        ds = ds.map_batches(
            lambda t, L=tuple(langs): t.filter(pc.is_in(
                t["lang"], value_set=pa.array(L))),
            batch_format="pyarrow")
    if "html" in ds.schema().names:
        ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    return ds.map_batches(
        PageAnnotator, batch_format="pyarrow",
        fn_constructor_kwargs={"index_ref": index_ref, "emit": emit},
        concurrency=concurrency, batch_size=batch_size)


def dedup_triples(triples_ds):
    """S8 — exact dedup with evidence aggregation.

    Combiner pattern: per-batch partial counts (one row per distinct triple
    per batch) BEFORE the hash shuffle, so the all-to-all moves pre-reduced
    rows; then ``groupby(subj,pred,obj).sum``. Output columns:
    (subj, pred, obj, n_evidence, confidence = max over evidence).
    """
    from ray.data.aggregate import Max, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"subj": [], "pred": [], "obj": [],
                                 "n_evidence": [], "confidence": []})
        g = df.groupby(["subj", "pred", "obj"], as_index=False).agg(
            n_evidence=("url", "size"), confidence=("confidence", "max"))
        return g

    partials = triples_ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("n_evidence", alias_name="n_evidence"),
        Max("confidence", alias_name="confidence"))


def materialize_adjacency(deduped_ds, out_dir: str):
    """S9 — sorted, partitioned parquet adjacency (graph.ipynb DiGraph
    semantics, ``/root/reference/docs/examples/graph.ipynb``)."""
    deduped_ds.sort(["subj", "pred", "obj"]).write_parquet(out_dir)


def run_kg_pipeline(pages_ds, obo_text: str, out_dir: Optional[str] = None,
                    concurrency: int = 4, batch_size: int = 256,
                    langs: Optional[list] = ("en",)):
    """Full pipeline: pages Dataset + OBO text -> deduped triples Dataset
    (written to ``out_dir`` when given)."""
    import ray

    index = prepare_index(obo_text)
    index_ref = ray.put(index)
    triples = annotate_pages(pages_ds, index_ref, emit="triples",
                             concurrency=concurrency, batch_size=batch_size,
                             langs=list(langs) if langs else None)
    deduped = dedup_triples(triples)
    if out_dir:
        materialize_adjacency(deduped, out_dir)
    return deduped
