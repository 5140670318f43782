"""Typed date conversions — engine projection of the reference's
``src/date.rs:15-123`` (+ the clause-level semantics exercised by
``tests/common.py:167-193`` and ``tests/test_header.py:144-156``):

* header ``date:`` uses the OBO *naive* datetime format
  ``dd:MM:yyyy HH:mm`` (``date: 08:04:2019 16:51`` <->
  ``datetime(2019, 4, 8, 16, 51)``);
* ``creation_date:`` is ISO 8601: a bare date (``2021-01-23`` ->
  ``datetime.date``), a naive datetime (``2021-01-23T12:00:00``), or a
  timezone-aware one (``2021-02-15T12:30:00Z`` / ``...+02:00``), and
  ``str()`` round-trips each form (``Z`` for UTC, not ``+00:00``).

For columnar use, :func:`to_timestamp_us` projects any of these onto a
single ``timestamp[us]`` instant (aware values normalized to UTC, naive
taken as-is, bare dates at midnight) — the lossy-but-sortable column
form; the exact text round-trips through :func:`format_creation_date`.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Optional, Union

# --------------------------------------------------------------------------
# header `date:` — OBO naive datetime (dd:MM:yyyy HH:mm)
# --------------------------------------------------------------------------

_OBO_DT_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{4})\s+(\d{2}):(\d{2})$")


def parse_obo_datetime(s: str) -> dt.datetime:
    """``'08:04:2019 16:51'`` -> naive ``datetime(2019, 4, 8, 16, 51)``."""
    m = _OBO_DT_RE.match(s.strip())
    if not m:
        raise ValueError(f"not an OBO datetime (dd:MM:yyyy HH:mm): {s!r}")
    day, month, year, hour, minute = map(int, m.groups())
    return dt.datetime(year, month, day, hour, minute)


def format_obo_datetime(d: dt.datetime) -> str:
    return f"{d.day:02d}:{d.month:02d}:{d.year:04d} {d.hour:02d}:{d.minute:02d}"


# --------------------------------------------------------------------------
# `creation_date:` — ISO 8601 date / datetime, optional timezone
# --------------------------------------------------------------------------

def parse_creation_date(s: str) -> Union[dt.date, dt.datetime]:
    """ISO 8601 text -> ``datetime.date`` (bare date) or
    ``datetime.datetime`` (naive or timezone-aware)."""
    s = s.strip()
    if "T" not in s and ":" not in s:
        return dt.date.fromisoformat(s)
    # datetime.fromisoformat handles fractions and ±HH:MM offsets but
    # (pre-3.11-compat) not a literal 'Z'
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))


def format_creation_date(d: Union[dt.date, dt.datetime]) -> str:
    """Inverse of :func:`parse_creation_date`; UTC renders as ``Z``
    (parity with the reference's ``str(CreationDateClause)``)."""
    if isinstance(d, dt.datetime):
        out = d.isoformat()
        return out[:-6] + "Z" if out.endswith("+00:00") else out
    return d.isoformat()


# --------------------------------------------------------------------------
# columnar projection
# --------------------------------------------------------------------------

def to_timestamp_us(d: Union[None, str, dt.date, dt.datetime]
                    ) -> Optional[dt.datetime]:
    """Any supported date form (or its raw text) -> a naive UTC instant
    suitable for an Arrow ``timestamp[us]`` column; None/unparseable ->
    None (dead-letter the raw value upstream if it matters)."""
    if d is None:
        return None
    if isinstance(d, str):
        try:
            d = parse_creation_date(d)
        except ValueError:
            try:
                d = parse_obo_datetime(d)
            except ValueError:
                return None
    if isinstance(d, dt.datetime):
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d
    return dt.datetime(d.year, d.month, d.day)
