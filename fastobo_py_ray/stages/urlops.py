"""URL operators for web-page corpora (the input_hint's ``url``
column): canonicalization and host extraction — the keys CCNet /
RefinedWeb-style pipelines dedup and shard web pages by.

Rule set (applied in order, chosen to be exactly mirrorable in ANSI
SQL so the queries carry value-bearing DuckDB oracles):

1. drop the fragment (everything from the first ``#``);
2. parse ``scheme://authority rest``; a URL without a scheme is left
   as-is (fragment-stripped) with an empty host;
3. lowercase the scheme and the host (paths stay case-sensitive);
4. drop the default port (``http:80`` / ``https:443``); other ports
   survive;
5. strip ALL trailing ``/`` from the rest (so ``.../a/`` ==
   ``.../a//`` == ``.../a`` and a bare ``host/`` == ``host`` —
   all-trailing, not one, so canonicalization is idempotent,
   hypothesis-gated).

6. drop userinfo (``user:pass@host`` -> ``host``) — credentials are
   never an identity key for sharding or dedup.

Deliberately NOT done here (documented non-goals, they need tables or
policy): tracking-param removal (utm_*), IDN/punycode folding, IPv6
authority brackets, scheme-relative ``//host`` URLs.

Everything is vectorized pandas ``.str`` ops — one regex extract per
batch, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$"


def url_canonicalize_batch(df: pd.DataFrame, url_col: str = "url"
                           ) -> pd.DataFrame:
    """Batch fn: adds ``url_canon`` and ``host`` columns per the module
    rule set.  Pure function of the url column; safe under any batch
    slicing."""
    s = df[url_col].astype(str).str.split("#").str[0]
    parts = s.str.extract(_URL_RE)
    scheme = parts[0].str.lower()
    auth = parts[1].fillna("")
    rest = parts[2].fillna("").str.replace(r"/+$", "", regex=True)

    # userinfo ('user:pass@host') is dropped before the host:port
    # split — it is NOT an identity key for sharding/dedup
    hostport = auth.str.split("@").str[-1]
    split = hostport.str.split(":")
    host = split.str[0].str.lower()
    # "string" dtype keeps a typed NA when no row carries a port (a
    # float64-NaN series would break the concat below)
    port = split.str[1].astype("string")
    default = (((scheme == "http") & (port == "80"))
               | ((scheme == "https") & (port == "443"))).fillna(False)
    port_sfx = pd.Series(
        np.where(port.notna() & ~default,
                 (":" + port.fillna("")).to_numpy(dtype=object), ""),
        index=df.index, dtype="string")

    canon = (scheme + "://" + host + port_sfx + rest).where(
        parts[0].notna(), s)
    out = df.copy()
    out["url_canon"] = pd.Series(canon, dtype="string")
    out["host"] = pd.Series(host.where(parts[0].notna(), ""),
                            dtype="string")
    return out


# the SQL mirror of url_canonicalize_batch: wraps ``inner_sql`` (any
# SELECT producing a ``url`` column) in the canonicalization pipeline
# (DuckDB str_split is 1-indexed)
def url_canon_sql(inner_sql: str) -> str:
    return f"""
    WITH _url_input AS ({inner_sql}),
    u0 AS (SELECT *, str_split(url, '#')[1] AS _nofrag
           FROM _url_input),
    p AS (SELECT *,
                 regexp_matches(_nofrag,
                     '^[A-Za-z][A-Za-z0-9+.-]*://') AS _has_scheme,
                 lower(regexp_extract(_nofrag,
                     '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS _scheme,
                 regexp_extract(_nofrag,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS _auth,
                 regexp_replace(regexp_extract(_nofrag,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
                     '/+$', '') AS _rest
          FROM u0),
    hp AS (SELECT *,
                  regexp_extract(_auth, '([^@]*)$', 1) AS _hostport
           FROM p),
    c AS (SELECT *,
                 lower(str_split(_hostport, ':')[1]) AS _host,
                 CASE WHEN _hostport LIKE '%:%'
                      THEN str_split(_hostport, ':')[2] ELSE NULL
                 END AS _port
          FROM hp)
    SELECT * EXCLUDE (_nofrag, _has_scheme, _scheme, _auth, _rest,
                      _hostport, _host, _port),
           CASE WHEN _has_scheme THEN
                _scheme || '://' || _host ||
                CASE WHEN _port IS NOT NULL
                      AND NOT ((_scheme = 'http' AND _port = '80') OR
                               (_scheme = 'https' AND _port = '443'))
                     THEN ':' || _port ELSE '' END || _rest
                ELSE _nofrag END AS url_canon,
           CASE WHEN _has_scheme THEN _host ELSE '' END AS host
    FROM c
    """
