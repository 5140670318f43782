"""Generate the zlib ground-truth fixture for q_compress_ratio's
SQL oracle (tests/fixtures/zlib_lens.parquet).

zlib output is DETERMINISTIC given (bytes, level) — a universal
constant, not an engine artifact — but has no ANSI-SQL form, so the
oracle joins md5(text) against this precomputed column instead
(`VERDICT r4 ask #9: "a precomputed-column oracle works"`).  The
fixture is produced HERE, straight from the corpus parquet files with
stdlib zlib — it never passes through the engine pipeline, so the
oracle remains independent: any engine bug in batching, text
plumbing, doc alignment or the ratio arithmetic shows up as a
mismatch, and a corpus text absent from the fixture drops the row
(row-count FAIL, never a false pass).

Run after the driver regenerates test data:

    python tools/make_compress_fixture.py
"""

from __future__ import annotations

import glob
import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "fixtures", "zlib_lens.parquet")
LEVEL = 6  # compression_ratio_batch default


def main() -> None:
    seen: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        for t in pq.read_table(path, columns=["text"])["text"].to_pylist():
            b = (t or "").encode()
            key = hashlib.md5(b).hexdigest()
            if key not in seen:
                seen[key] = (len(zlib.compress(b, LEVEL)) if b else 0,
                             len(b))
    md5s = sorted(seen)
    comp = np.array([seen[k][0] for k in md5s], dtype=np.int64)
    raw = np.array([seen[k][1] for k in md5s], dtype=np.int64)
    ratio = np.where(raw > 0, np.round(comp / np.maximum(raw, 1), 6), 0.0)
    tbl = pa.table({
        "text_md5": pa.array(md5s, pa.string()),
        "compressed_len": pa.array(comp),
        "n_bytes": pa.array(raw),
        "compress_ratio": pa.array(ratio)})
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    pq.write_table(tbl, OUT)
    print(f"wrote {len(md5s)} distinct texts -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
