"""Streaming OBO frame source — the engine form of ``fastobo.iter``
(``/root/reference/src/py/mod.rs:110-134`` + ``src/iter.rs:174-250``).

The reference hand-rolls a producer/consumer thread pool that parses
frames off a shared channel; here the same shape is expressed Ray-Data-
first: the file is split at frame boundaries on the driver (cheap string
scan — ontologies are MBs, pages are the TBs), the chunks become Dataset
blocks, and frame parsing runs as a parallel ``map_batches`` with Ray's
streaming executor providing the ordering/backpressure the reference's
``ordered``/channel machinery implements by hand (``src/iter.rs:151-161``).

Header-first semantics (``src/iter.rs:184-195``): ``read_obo_header``
parses just the header eagerly; ``read_obo_frames`` returns the frame
rows as a Dataset in document order (one row per frame,
``ontology_terms`` schema).  Gzip inputs supported like the reference's
gzip-wrapped handles (``src/py/mod.rs:176-213``).
"""

from __future__ import annotations

import gzip
from typing import List, Tuple

import pyarrow as pa


def _read_text(path: str) -> str:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as fh:
        return fh.read().decode("utf-8")


def split_obo(text: str) -> Tuple[str, List[str]]:
    """(header_text, [frame_text, ...]) split at ``[...]`` stanza lines."""
    lines = text.splitlines()
    starts = [i for i, ln in enumerate(lines)
              if ln.startswith("[") and ln.rstrip().endswith("]")]
    if not starts:
        return text, []
    header = "\n".join(lines[:starts[0]])
    frames = ["\n".join(lines[s:e])
              for s, e in zip(starts, starts[1:] + [len(lines)])]
    return header, frames


def header_prefixed_chunks(text: str, num_blocks: int):
    """``(header_text, frames, chunks)`` — frame-boundary split with
    the (tiny, shared) header PREFIXED to every chunk, so
    header-derived frame semantics (default-namespace fill of
    ``namespace``, idspace compaction) match the whole-doc parse
    exactly.  The one chunking discipline shared by
    :func:`read_obo_frames` and the ontology-diff distributed path
    (``obo/diff.py``) — asserted by the 300k-frame full-table parity
    test and the diff parity test respectively."""
    header_text, frames = split_obo(text)
    prefix = header_text + "\n\n" if header_text.strip() else ""
    per = max(1, (len(frames) + num_blocks - 1) // num_blocks)
    chunks = [{"start": i, "chunk": prefix + "\n".join(frames[i:i + per])}
              for i in range(0, len(frames), per)]
    return header_text, frames, chunks


def read_obo_header(path: str):
    """Eager header parse (header-first, src/iter.rs:184-195)."""
    from ..obo.parser import loads

    header_text, _ = split_obo(_read_text(path))
    return loads(header_text).ontology.header


def read_obo_frames(path: str, num_blocks: int = 8):
    """OBO file -> Dataset of frame rows (``ontology_terms`` schema plus
    ``doc_order``), one row per entity frame.

    Ray's streaming executor emits blocks as they finish (the reference's
    ``ordered=False`` fast path, ``src/py/mod.rs:83-87``); the
    ``doc_order`` ordinal recovers exact document order when a consumer
    needs it (``ds.sort("doc_order")`` or a driver-side sort of the small
    result), rather than forcing ``preserve_order`` on the whole session.

    Malformed clause lines inside a frame are collected (never raised) by
    the parser and surface as a ``n_parse_errors`` column (count per
    source chunk) — the dead-letter discipline of op 17
    (``src/error.rs:38-187``).
    """
    import ray.data as rd

    # header-first semantics (src/iter.rs:184-195): shared chunking
    # discipline with the diff path — see header_prefixed_chunks
    header_text, frames, chunks = header_prefixed_chunks(
        _read_text(path), num_blocks)
    if not frames:
        from ..obo.parser import loads

        t = loads(header_text).ontology.terms_table()
        t = t.append_column("n_parse_errors", pa.array([], pa.int32()))
        t = t.append_column("doc_order", pa.array([], pa.int64()))
        return rd.from_arrow(t)
    ds = rd.from_items(chunks)

    def parse_chunk(batch: pa.Table) -> pa.Table:
        from ..obo.parser import loads

        tables = []
        for start, chunk in zip(batch["start"].to_pylist(),
                                batch["chunk"].to_pylist()):
            res = loads(chunk)
            t = res.ontology.terms_table()
            t = t.append_column(
                "n_parse_errors",
                pa.array([len(res.errors)] * t.num_rows, pa.int32()))
            t = t.append_column(
                "doc_order",
                pa.array(range(start, start + t.num_rows), pa.int64()))
            tables.append(t)
        return pa.concat_tables(tables)

    return ds.map_batches(parse_chunk, batch_format="pyarrow")
