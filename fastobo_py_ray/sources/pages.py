"""S0 — page-corpus sources and adapters.

Input shape per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``. Reads prune columns at the parquet scan so a stage that
only needs ``text`` never ships ``html`` through the object store.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import pyarrow as pa

from ..testing.corpus import EPOCH_US


def read_pages(path: str, columns: Optional[List[str]] = None,
               langs: Optional[List[str]] = None, **kwargs):
    """Read a pages parquet file/directory into a Dataset.

    ``columns`` prunes at the read (scan-level projection); ``langs``
    pushes a row filter into the parquet scan (row-group pruning).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    paths = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else path
    filt = pc.field("lang").isin(langs) if langs else None
    return rd.read_parquet(paths, columns=columns, filter=filt, **kwargs)


def documents_as_pages(sf_dir: str, columns: Optional[List[str]] = None):
    """Adapter: the driver's ``documents`` table -> the pages shape
    (FIXTURES.md F1 note): ``url := source || '/' || doc_id``, fixed
    ``warc_ts`` epoch, ``html := NULL``, ``text``/``lang`` pass through.
    ``doc_id`` is retained so DuckDB-oracle queries can key on it."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_id = batch["doc_id"]
        url = pa.array([f"{s}/{d}" for s, d in
                        zip(batch["source"].to_pylist(), doc_id.to_pylist())],
                       type=pa.string())
        out = pa.table({
            "doc_id": doc_id,
            "url": url,
            "warc_ts": pa.array([EPOCH_US] * n, type=pa.timestamp("us")),
            "html": pa.array([None] * n, type=pa.binary()),
            "text": batch["text"],
            "lang": batch["lang"],
        })
        if columns:
            out = out.select(columns)
        return out

    return ds.map_batches(adapt, batch_format="pyarrow")
