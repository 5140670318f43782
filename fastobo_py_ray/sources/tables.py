"""Generic table sources beyond parquet: JSONL and CSV readers with the
same pruned-projection contract as the parquet path.

Parquet remains the scale format (columnar, scan-level projection and
row-group pruning); JSONL/CSV are the ingestion formats a real corpus
arrives in.  Neither can prune columns AT THE SCAN (both are row-major
text), so the projection here happens in the first batch transform —
the bytes are read once, but nothing beyond the requested columns
enters the object store or any downstream exchange, which is the
invariant the engine's stages rely on.

Schema normalization: CSV (and JSON floats) widen or narrow dtypes the
parquet schema would pin.  ``schema`` accepts a pyarrow schema whose
matching columns are cast after the read, so a pipeline written against
the parquet tables runs unmodified on a JSONL/CSV drop of the same
table (roundtrip-tested in tests/test_sources_tables.py).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa


def _project_and_cast(columns: Optional[List[str]],
                      schema: Optional[pa.Schema]):
    def fn(t: pa.Table) -> pa.Table:
        if columns is not None:
            t = t.select(columns)
        if schema is not None:
            fields = []
            for n in t.column_names:
                idx = schema.get_field_index(n)
                fields.append(pa.field(n, schema.field(idx).type)
                              if idx >= 0 else t.schema.field(n))
            t = t.cast(pa.schema(fields))
        return t
    return fn


def read_table(path: str, format: str = "parquet",
               columns: Optional[List[str]] = None,
               schema: Optional[pa.Schema] = None, **kwargs):
    """Read a table in ``parquet`` / ``jsonl`` / ``csv`` format into a
    Dataset with a uniform (columns, schema) projection contract.
    Parquet prunes at the scan; the text formats project in the first
    batch transform (see module docstring)."""
    import ray.data as rd

    if format == "parquet":
        ds = rd.read_parquet(path, columns=columns, **kwargs)
        # columns already pruned at the scan; the schema cast must
        # still apply or the contract is asymmetric across formats
        if schema is None:
            return ds
        return ds.map_batches(_project_and_cast(None, schema),
                              batch_format="pyarrow")
    if format == "jsonl":
        ds = rd.read_json(path, **kwargs)
    elif format == "csv":
        ds = rd.read_csv(path, **kwargs)
    else:
        raise ValueError(
            f"format must be parquet|jsonl|csv, got {format!r}")
    if columns is None and schema is None:
        return ds
    return ds.map_batches(_project_and_cast(columns, schema),
                          batch_format="pyarrow")


def write_table(ds, path: str, format: str = "parquet", **kwargs):
    """Sink twin of :func:`read_table`: ``parquet`` (the scale format —
    columnar, partitioned, resumable) or ``jsonl`` / ``csv`` (the
    export formats downstream training stacks ingest).  All three are
    Ray-native distributed writes (one file per block, never one giant
    file)."""
    if format == "parquet":
        return ds.write_parquet(path, **kwargs)
    if format == "jsonl":
        return ds.write_json(path, **kwargs)
    if format == "csv":
        return ds.write_csv(path, **kwargs)
    raise ValueError(f"format must be parquet|jsonl|csv, got {format!r}")
