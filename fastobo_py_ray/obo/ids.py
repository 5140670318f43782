"""OBO identifier semantics, re-expressed as vectorizable pure functions.

Mirrors the behavior of the reference's identifier module
(``/root/reference/src/py/id.rs``):

* three-way dispatch Url | Prefixed | Unprefixed (``src/py/id.rs:53-63``),
* validity check (``src/py/id.rs:85-93``),
* escape/unescape (``src/py/id.rs:487-497``),
* ordering — lexicographic on (prefix, local) for prefixed idents
  (``src/py/id.rs:308-335``); because ``":"`` sorts below every character
  allowed in a prefix, plain string comparison of the canonical form
  ``prefix:local`` reproduces the tuple ordering, so canonical strings are
  usable directly as Ray Data sort/partition keys,
* IDspace compaction / decompaction per OBO 1.4 §5.9 as exercised by
  ``OboDoc.compact_ids`` / ``decompact_ids`` (``src/py/doc.rs:219-285``).

Identifiers are stored engine-wide as canonical strings (the reference's
``__str__`` semantics); these helpers parse/validate/rewrite those strings.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, Optional, Tuple

# Default OBO Foundry PURL rule (OBO 1.4 §5.9): CURIE PREFIX:LOCAL <->
# http://purl.obolibrary.org/obo/PREFIX_LOCAL . Used by compact_ids when no
# explicit header `idspace:` rule matches (src/py/doc.rs:219-248 doctest).
OBO_PURL = "http://purl.obolibrary.org/obo/"

_URL_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://\S+$")
# A prefix is canonical if alphanumeric/underscore/dash/dot (no colon, space).
_PREFIX_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")
_WS_RE = re.compile(r"\s")

KIND_URL = "url"
KIND_PREFIXED = "prefixed"
KIND_UNPREFIXED = "unprefixed"


def _split_unescaped_colon(s: str) -> Optional[Tuple[str, str]]:
    """Split at the first unescaped ':' or return None."""
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == ":":
            return s[:i], s[i + 1 :]
        i += 1
    return None


def unescape(s: str) -> str:
    """Undo OBO identifier escaping (mirrors src/py/id.rs:487-497)."""
    if "\\" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t", "W": " "}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def escape_local(s: str) -> str:
    """Escape characters not allowed raw in an unprefixed ident / local part."""
    out = []
    for c in s:
        if c in ' :,"\\()[]{}':
            out.append("\\" + c)
        elif c == "\n":
            out.append("\\n")
        elif c == "\t":
            out.append("\\t")
        else:
            out.append(c)
    return "".join(out)


def parse(s: str) -> Tuple[str, str, str]:
    """Parse an identifier string into (kind, prefix, local).

    Three-way dispatch exactly as ``fastobo.id.parse``
    (``src/py/id.rs:53-63``): URL first, then prefixed on an unescaped
    colon, otherwise unprefixed. For URL / unprefixed idents prefix is ""
    and local is the whole (unescaped) string.

    Example (mirrors the ``src/py/id.rs:46-51`` doctest):
        >>> parse("MS:1000031")
        ('prefixed', 'MS', '1000031')
        >>> parse("part_of")
        ('unprefixed', '', 'part_of')
        >>> parse("http://purl.obolibrary.org/obo/IAO_0000231")
        ('url', '', 'http://purl.obolibrary.org/obo/IAO_0000231')
    """
    if _URL_RE.match(s):
        return (KIND_URL, "", s)
    split = _split_unescaped_colon(s)
    if split is not None:
        prefix, local = split
        return (KIND_PREFIXED, unescape(prefix), unescape(local))
    return (KIND_UNPREFIXED, "", unescape(s))


def is_valid(s: str) -> bool:
    """Full-match validity, mirroring ``fastobo.id.is_valid``
    (``src/py/id.rs:85-93``): a string is a valid ident iff it is a URL, a
    prefixed ident, or an unprefixed ident with no raw whitespace and no
    unescaped reserved characters.

    Example (mirrors the ``src/py/id.rs:77-84`` doctest):
        >>> is_valid("MS:1000031")
        True
        >>> is_valid("https://purl.obolibrary.org/obo/MS_1000031")
        True
        >>> is_valid("related_to")
        True
        >>> is_valid("definitely not an identifier")
        False
    """
    if not s:
        return False
    if _URL_RE.match(s):
        return True
    if _WS_RE.search(s):
        # raw (unescaped) whitespace is invalid; escaped "\ " / "\W" is fine
        i = 0
        while i < len(s):
            if s[i] == "\\":
                i += 2
                continue
            if _WS_RE.match(s[i]):
                return False
            i += 1
    # reserved chars must be escaped
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c in '",()[]{}':
            return False
        i += 1
    return True


def canonical(s: str) -> str:
    """Canonical string form (the reference's ``__str__`` semantics,
    ``src/py/id.rs:296-306``): prefixed -> ``prefix:local`` with escaping,
    others unchanged."""
    kind, prefix, local = parse(s)
    if kind == KIND_PREFIXED:
        return f"{prefix}:{escape_local(local)}" if _needs_escape(local) else f"{prefix}:{local}"
    return s


def _needs_escape(local: str) -> bool:
    return any(c in ' :,"\\()[]{}\n\t' for c in local)


@lru_cache(maxsize=65536)
def sort_key(s: str) -> str:
    """Ordering key reproducing PrefixedIdent ordering
    (``src/py/id.rs:308-335``): lexicographic on (prefix, local) == plain
    string order of the canonical form (':' < all ident chars).

    Cached: the hot caller is the entity-linking tie-break, which keys on
    the bounded set of ontology term ids millions of times per block.
    """
    return canonical(s)


def compact(s: str, idspaces: Optional[Dict[str, str]] = None) -> str:
    """URL -> CURIE using header ``idspace:`` rules, then the OBO PURL
    default. Mirrors ``OboDoc.compact_ids`` (``src/py/doc.rs:241-248``).

    Non-URL identifiers are returned unchanged (idempotent).

    Example (the ``src/py/doc.rs:219-248`` CHEBI purl doctest):
        >>> compact("http://purl.obolibrary.org/obo/CHEBI_27958")
        'CHEBI:27958'
        >>> compact("CHEBI:27958")
        'CHEBI:27958'
        >>> compact("http://example.com/x/27958",
        ...         idspaces={"EX": "http://example.com/x/"})
        'EX:27958'
    """
    if "://" not in s:
        return s
    if idspaces:
        # longest-match first so nested prefixes resolve deterministically
        for prefix, base in sorted(idspaces.items(), key=lambda kv: -len(kv[1])):
            if s.startswith(base) and len(s) > len(base):
                return f"{prefix}:{s[len(base):]}"
    if s.startswith(OBO_PURL):
        rest = s[len(OBO_PURL):]
        if "_" in rest:
            prefix, local = rest.split("_", 1)
            if _PREFIX_RE.match(prefix) and local:
                return f"{prefix}:{local}"
    return s


def decompact(s: str, idspaces: Optional[Dict[str, str]] = None) -> str:
    """CURIE -> URL; inverse of :func:`compact`
    (``OboDoc.decompact_ids``, ``src/py/doc.rs:278-285``).

    Example:
        >>> decompact("CHEBI:27958")
        'http://purl.obolibrary.org/obo/CHEBI_27958'
        >>> decompact("EX:27958", idspaces={"EX": "http://example.com/x/"})
        'http://example.com/x/27958'
        >>> decompact(compact("http://purl.obolibrary.org/obo/MS_1000031"))
        'http://purl.obolibrary.org/obo/MS_1000031'
    """
    kind, prefix, local = parse(s)
    if kind != KIND_PREFIXED:
        return s
    if idspaces and prefix in idspaces:
        return idspaces[prefix] + local
    return f"{OBO_PURL}{prefix}_{local}"
