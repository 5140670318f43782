"""PII redaction for training-data curation: scrub emails, IPv4
addresses and phone numbers from a text column before the corpus is
packed (the standard pre-training privacy pass, e.g. the BigScience
ROOTS / FineWeb PII pipelines).

Scale shape: a stateless vectorized ``map_batches`` — patterns are
compiled once at module import, each batch is a handful of pandas
``str.count`` / ``str.replace`` C-loop calls over the compiled
programs, and no state, no shuffle, no driver round-trip is involved.
At 100 TB this stage is embarrassingly parallel and IO-bound.

Pattern-dialect note: every pattern below is written in the common
subset of Python ``re`` and RE2 (no backreferences, no lookbehind,
ASCII classes) with identical leftmost-first greedy semantics, so the
DuckDB ``regexp_replace(..., 'g')`` oracle replays the exact same
matches — that compatibility is driver-contract-tested
(``q_pii_redact``).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pandas as pd

# (name, pattern, replacement) applied IN ORDER — emails first so an
# address's digit runs can never be half-eaten by the IP/phone rules.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ .-]\d{3}[ .-]\d{4}", "<PHONE>"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def redact_pii_batch(df: pd.DataFrame, text_col: str = "text",
                     patterns=None) -> pd.DataFrame:
    """Redact PII in ``df[text_col]`` in place of the column; adds one
    ``n_<name>`` int64 count column per pattern (matches counted BEFORE
    replacement, non-overlapping, exactly ``re.findall`` semantics)."""
    comp = [(n, re.compile(p), r) for n, p, r in patterns] if patterns \
        else _COMPILED
    out = df.copy()
    s = out[text_col].astype(str)
    for name, prog, repl in comp:
        out[f"n_{name}"] = s.str.count(prog).astype("int64")
        s = s.str.replace(prog, repl, regex=True)
    out[text_col] = s
    return out


def redact_pii(ds, text_col: str = "text", patterns=None):
    """Dataset wrapper: stateless vectorized scrub stage."""
    return ds.map_batches(
        lambda df: redact_pii_batch(df, text_col, patterns),
        batch_format="pandas")
