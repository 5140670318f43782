"""Ontology version diff — frame-level delta between two OBO documents.

Ontologies are living artifacts (monthly releases); a KG built over a
trillion-page corpus must answer "what changed between release A and
release B, and which parts of the graph does that invalidate?" without
re-reading the corpus.  The reference exposes parse + serialize
(``fastobo.load`` / ``str(doc)``, ``/root/reference/src/py/mod.rs:62-134``)
and users diff the serialized output by hand; this module makes the diff
a first-class distributed operator:

* frames are compared by their CANONICAL serialization
  (:func:`~fastobo_py_ray.obo.serializer.frame_to_text`) — whitespace /
  clause-formatting noise cancels because both sides re-serialize, so
  only semantic clause changes surface (the same canonicalization that
  makes the engine's three-format roundtrips byte-exact);
* identity is ``(frame_type, id)`` — the reference's frame-by-id view
  (``src/py/doc.rs``), so an id moving between documents is one
  `changed` row, not an add+remove pair;
* the distributed path (:func:`obo_diff_ds`) splits each document at
  frame boundaries on the driver (cheap string scan — the documents are
  MBs-to-100s-of-MBs; the corpus is the TBs), parses + canonicalizes
  frames in parallel ``map_batches`` blocks, and classifies with ONE
  full-outer :func:`~fastobo_py_ray.functions.relops.hash_join` keyed
  by frame identity.  A 300k-frame release pair diffs with the same
  machinery the 2941-frame ms.obo uses.

The driver path (:func:`obo_diff`) is the exact reference
implementation for ontology-sized inputs; the two are parity-tested.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import pandas as pd

DIFF_COLUMNS = ["frame_type", "id", "status"]


def _frame_rows(obo_text: str) -> Tuple[str, List[Tuple[str, str, str]]]:
    """(canonical header text, [(frame_type, id, canonical_text), ...])
    for one document — the driver-side canonicalizer both paths share."""
    from .parser import loads
    from .serializer import frame_to_text, header_to_text

    onto = loads(obo_text).ontology
    rows = [(f.kind, f.id, frame_to_text(f)) for f in onto.frames]
    return header_to_text(onto.header), rows


def _classify(merged: pd.DataFrame) -> pd.DataFrame:
    """(canon_a, canon_b) full-outer rows -> added/removed/changed."""
    a, b = merged["canon_a"], merged["canon_b"]
    status = pd.Series("changed", index=merged.index, dtype="string")
    status[a.isna()] = "added"
    status[b.isna()] = "removed"
    out = merged.assign(status=status)
    out = out[(a.isna()) | (b.isna()) | (a != b)]
    return (out[DIFF_COLUMNS].astype({"frame_type": "string",
                                      "id": "string", "status": "string"})
            .sort_values(DIFF_COLUMNS).reset_index(drop=True))


@dataclass
class OboDiff:
    """Result of a version diff.

    ``frames``: one row per added / removed / changed frame
    (``frame_type, id, status``).  ``header_changed``: whether the two
    headers differ canonically — header clauses (idspaces,
    treat-xrefs-as-* macros, default-namespace) change the meaning of
    EVERY frame, so consumers like
    :func:`~fastobo_py_ray.pipelines.refresh.refresh_adjacency` treat a
    header delta as "everything is affected".
    """

    frames: pd.DataFrame
    header_changed: bool

    @property
    def changed_ids(self) -> List[str]:
        return self.frames["id"].tolist()


def obo_diff(text_a: str, text_b: str) -> OboDiff:
    """Driver-side frame diff of two OBO documents (reference path)."""
    from .parser import loads

    return obo_diff_parsed(loads(text_a).ontology,
                           loads(text_b).ontology)


def obo_diff_parsed(onto_a, onto_b) -> OboDiff:
    """:func:`obo_diff` over ALREADY-parsed ontologies — callers that
    hold both versions parsed (pipelines/refresh.py needs the Ontology
    objects anyway) skip a second full parse of each document."""
    from .serializer import frame_to_text, header_to_text

    def rows(onto):
        return [(f.kind, f.id, frame_to_text(f)) for f in onto.frames]

    da = pd.DataFrame(rows(onto_a),
                      columns=["frame_type", "id", "canon_a"])
    db = pd.DataFrame(rows(onto_b),
                      columns=["frame_type", "id", "canon_b"])
    # a duplicated frame id within one document keeps its LAST stanza,
    # matching frame_by_id (dict insertion overwrite) semantics
    da = da.drop_duplicates(["frame_type", "id"], keep="last")
    db = db.drop_duplicates(["frame_type", "id"], keep="last")
    merged = da.merge(db, on=["frame_type", "id"], how="outer")
    return OboDiff(frames=_classify(merged),
                   header_changed=(header_to_text(onto_a.header)
                                   != header_to_text(onto_b.header)))


def _frames_dataset(obo_text: str, num_blocks: int = 8):
    """Document -> Dataset of (frame_type, id, canon): frame-boundary
    split on the driver, parse + canonical re-serialization distributed.
    Each chunk parses WITH the shared header so header-derived semantics
    (default-namespace fill) match the whole-doc parse — the
    read_obo_frames discipline (sources/obo_source.py)."""
    import pyarrow as pa
    import ray.data as rd

    from ..sources.obo_source import header_prefixed_chunks

    _header, frames, chunks = header_prefixed_chunks(obo_text,
                                                     num_blocks)
    if not frames:
        return rd.from_arrow(pa.table({
            "frame_type": pa.array([], pa.string()),
            "id": pa.array([], pa.string()),
            "canon": pa.array([], pa.string()),
            "doc_order": pa.array([], pa.int64())}))

    def parse_chunk(batch: pa.Table) -> pa.Table:
        types, ids, canons, orders = [], [], [], []
        for start, chunk in zip(batch["start"].to_pylist(),
                                batch["chunk"].to_pylist()):
            for k, (kind, fid, canon) in enumerate(_frame_rows(chunk)[1]):
                types.append(kind)
                ids.append(fid)
                canons.append(canon)
                orders.append(start + k)
        return pa.table({"frame_type": pa.array(types, pa.string()),
                         "id": pa.array(ids, pa.string()),
                         "canon": pa.array(canons, pa.string()),
                         "doc_order": pa.array(orders, pa.int64())})

    return rd.from_items(chunks).map_batches(parse_chunk,
                                             batch_format="pyarrow")


def obo_diff_ds(text_a: str, text_b: str, num_blocks: int = 8,
                num_buckets: int = 8):
    """Distributed frame diff: returns a Dataset of
    ``(frame_type, id, status)`` rows (added / removed / changed),
    parity-tested against :func:`obo_diff`.

    One full-outer hash exchange keyed by frame identity; per-bucket
    classification is exact because a bucket holds every row of its
    keys on both sides.  Header comparison stays on the driver (two
    small strings).
    """
    from ..functions.relops import hash_join

    da = _frames_dataset(text_a, num_blocks).map_batches(
        lambda t: t.rename_columns(
            ["frame_type", "id", "canon_a", "ord_a"]),
        batch_format="pyarrow")
    db = _frames_dataset(text_b, num_blocks).map_batches(
        lambda t: t.rename_columns(
            ["frame_type", "id", "canon_b", "ord_b"]),
        batch_format="pyarrow")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # a duplicated frame id within ONE document keeps its LAST
        # stanza (frame_by_id dict-overwrite semantics, matching the
        # driver path); the outer join cross-multiplies duplicates, so
        # keep the max-doc_order row per identity on each side
        df = df.sort_values(["ord_a", "ord_b"], na_position="first")
        df = df.drop_duplicates(["frame_type", "id"], keep="last")
        return _classify(df)

    return hash_join(da, db, on=["frame_type", "id"], how="outer",
                     num_buckets=num_buckets,
                     lcols=["frame_type", "id", "canon_a", "ord_a"],
                     rcols=["frame_type", "id", "canon_b", "ord_b"],
                     bucket_finalize=finalize)
