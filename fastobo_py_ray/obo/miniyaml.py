"""Minimal block-style YAML subset parser (stdlib-only fallback).

The reference accepts OBO graphs in YAML natively (serde_yaml,
``src/py/mod.rs:300-301``); this container has no PyYAML, so
:func:`safe_load` implements the subset obograph YAML documents actually
use — block mappings and sequences by indentation, compact ``- key: val``
sequence-of-mappings items, quoted/unquoted scalars with int/float/bool/
null coercion, ``#`` comments, and JSON-compatible flow collections.
:mod:`.graphjson` prefers real PyYAML when importable and falls back
here.  Not a general YAML implementation (no anchors, tags, multi-doc,
block scalars) — unsupported constructs raise ``ValueError``.
"""

from __future__ import annotations

import json
import re
from typing import Any, List, Tuple

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")


def _strip_comment(line: str) -> str:
    """Drop a trailing ``# comment`` (outside quotes; '#' must be at line
    start or preceded by whitespace per YAML)."""
    in_s = in_d = False
    for i, c in enumerate(line):
        if c == "'" and not in_d:
            in_s = not in_s
        elif c == '"' and not in_s:
            in_d = not in_d
        elif c == "#" and not in_s and not in_d and \
                (i == 0 or line[i - 1] in " \t"):
            return line[:i]
    return line


def _scalar(s: str) -> Any:
    s = s.strip()
    if s in ("", "~", "null", "Null", "NULL"):
        return None
    if s in ("true", "True", "TRUE"):
        return True
    if s in ("false", "False", "FALSE"):
        return False
    if s[0] == '"':
        # YAML double-quoted scalars allow literal tabs; JSON does not —
        # escape them so json.loads round-trips the content
        return json.loads(s.replace("\t", "\\t"))
    if s[0] == "'":
        if not (len(s) >= 2 and s[-1] == "'"):
            raise ValueError(f"unterminated single-quoted scalar: {s!r}")
        return s[1:-1].replace("''", "'")
    if s[0] in "[{":
        try:
            return json.loads(s)  # JSON-compatible flow collection
        except json.JSONDecodeError as exc:
            raise ValueError(
                f"unsupported flow collection (non-JSON): {s!r}") from exc
    if s[0] in "&*|>":
        raise ValueError(f"unsupported YAML construct: {s!r}")
    if _INT_RE.match(s):
        return int(s)
    if _FLOAT_RE.match(s):
        return float(s)
    return s


def _split_key(s: str) -> Tuple[str, str] | None:
    """Split ``key: rest`` at the first ': ' (or trailing ':') outside
    quotes; None if the line is not a mapping entry."""
    in_s = in_d = False
    for i, c in enumerate(s):
        if c == "'" and not in_d:
            in_s = not in_s
        elif c == '"' and not in_s:
            in_d = not in_d
        elif c == ":" and not in_s and not in_d:
            if i + 1 == len(s) or s[i + 1] in " \t":
                key = s[:i].strip()
                return _scalar(key) if key and key[0] in "'\"" else key, \
                    s[i + 1:].strip()
    return None


def safe_load(text: str) -> Any:
    toks: List[Tuple[int, str]] = []
    for raw in text.splitlines():
        # tabs may not indent YAML blocks (spec §6.1); tabs INSIDE the
        # line body are legal scalar content and pass through untouched
        if raw.lstrip(" ").startswith("\t"):
            raise ValueError(
                "tab indentation is not valid YAML; install PyYAML for "
                "full-spec parsing — this minimal loader rejects it like "
                "its other unsupported constructs")
        line = _strip_comment(raw).rstrip()
        if not line.strip():
            continue
        if line.strip() == "---":
            continue
        body = line.strip()
        # a tab AFTER the block-sequence dash is legal separation
        # white space (unlike tab indentation) — normalize to "- "
        if body.startswith("-\t"):
            body = "- " + body[2:].lstrip(" \t")
        toks.append((len(line) - len(line.lstrip(" ")), body))
    if not toks:
        return None
    val, i = _parse(toks, 0, toks[0][0])
    if i != len(toks):
        raise ValueError(f"trailing content at line token {i}: {toks[i]!r}")
    return val


def _parse(toks: List[Tuple[int, str]], i: int, indent: int):
    ind, s = toks[i]
    if s == "-" or s.startswith("- "):
        seq: List[Any] = []
        while i < len(toks) and toks[i][0] == indent and \
                (toks[i][1] == "-" or toks[i][1].startswith("- ")):
            item = toks[i][1][1:].strip()
            if not item:
                # nested block starts on the following (deeper) line
                if i + 1 < len(toks) and toks[i + 1][0] > indent:
                    val, i = _parse(toks, i + 1, toks[i + 1][0])
                else:
                    val, i = None, i + 1
            elif item == "-" or item.startswith(("- ", "-\t")):
                # nested compact sequence ("- - a"): unsupported — raise
                # per the module contract instead of silently yielding
                # the literal string "- a"
                raise ValueError(
                    f"nested compact sequences are not supported by the "
                    f"built-in YAML subset: {toks[i][1]!r} (install "
                    f"PyYAML for full YAML)")
            elif _split_key(item) is not None:
                # compact "- key: val" mapping item: continuation keys sit
                # two columns deeper (aligned after the dash) — re-tag the
                # token and parse the mapping in place
                toks[i] = (indent + 2, item)
                val, i = _parse(toks, i, indent + 2)
            else:
                val, i = _scalar(item), i + 1
            seq.append(val)
        return seq, i
    out = {}
    while i < len(toks) and toks[i][0] == indent and \
            not (toks[i][1] == "-" or toks[i][1].startswith("- ")):
        kv = _split_key(toks[i][1])
        if kv is None:
            raise ValueError(f"expected 'key:' mapping entry: {toks[i][1]!r}")
        key, rest = kv
        if rest:
            out[key] = _scalar(rest)
            i += 1
        elif i + 1 < len(toks) and toks[i + 1][0] > indent:
            out[key], i = _parse(toks, i + 1, toks[i + 1][0])
        elif i + 1 < len(toks) and toks[i + 1][0] == indent and \
                (toks[i + 1][1] == "-" or toks[i + 1][1].startswith("- ")):
            # sequences are commonly indented at the SAME level as their key
            out[key], i = _parse(toks, i + 1, indent)
        else:
            out[key], i = None, i + 1
    return out, i
