"""S1 — trafilatura-style boilerplate-stripped text extraction.

Pure, versioned function of the ``html`` bytes (BASELINE.json input_hint:
extracted ``text`` must be byte-identical per url across runs, partitionings
and resumes). Regex-based so the hot loop stays in C; no DOM construction.

Pipeline shape: stateless ``map_batches`` over Arrow batches; rows whose
``text`` column is already non-null are passed through untouched (the
reference corpus ships pre-extracted text for most rows).
"""

from __future__ import annotations

import html as _html
import re
from typing import Optional

import pyarrow as pa

EXTRACTOR_VERSION = 1

# boilerplate containers dropped wholesale (trafilatura's default exclusions)
_DROP_RE = re.compile(
    r"<(script|style|noscript|nav|footer|header|aside|head|template|svg|form)\b"
    r".*?</\1\s*>",
    re.S | re.I,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# block-level boundaries become newlines so sentences don't fuse
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|article|section|blockquote|"
    r"pre|figure|figcaption|main)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_SPACES_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str) -> str:
    """html -> main text. Deterministic; version EXTRACTOR_VERSION."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", html)
    s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    # one whole-string space squeeze (the class excludes \n), then per-line
    # strip — identical output to a per-line sub at 1/30th the regex calls
    s = _SPACES_RE.sub(" ", s)
    return "\n".join(ln for ln in map(str.strip, s.split("\n")) if ln)


def extract_text_batch(batch: pa.Table,
                       html_col: str = "html",
                       text_col: str = "text") -> pa.Table:
    """Arrow batch transform: fill ``text`` from ``html`` where missing.

    Vectorization note: the regex pipeline runs per row (C-level regex over
    one string each); at 100 TB this stage is CPU-bound and embarrassingly
    parallel — scale via task parallelism, not row batching.
    """
    if html_col not in batch.column_names:
        return batch
    # one bulk to_pylist per column (a per-element .as_py() loop pays an
    # Arrow scalar-wrapper allocation per cell)
    htmls = batch[html_col].to_pylist()
    have_text = text_col in batch.column_names
    texts = batch[text_col].to_pylist() if have_text \
        else [None] * batch.num_rows
    out = [t if t else (extract_text(h) if h is not None else "")
           for t, h in zip(texts, htmls)]
    col = pa.array(out, type=pa.string())
    if have_text:
        idx = batch.column_names.index(text_col)
        return batch.set_column(idx, text_col, col)
    return batch.append_column(text_col, col)
