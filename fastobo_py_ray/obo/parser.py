"""Pure-Python OBO 1.4 parser producing :class:`~.model.Ontology`.

A from-scratch reimplementation of the parse semantics the engine needs from
the reference (``fastobo.load`` / ``fastobo.loads``,
``/root/reference/src/py/mod.rs:167-296``): header frame first
(``src/iter.rs:186-194``), then ``[Term]`` / ``[Typedef]`` / ``[Instance]``
entity frames, with

* trailing ``! comment`` stripping (quote- and escape-aware),
* trailing ``{qualifier list}`` parsing (``src/py/qual.rs:42-47``,
  attachment point ``src/py/abc.rs:158-165``),
* backslash escapes in tags/values (``src/py/id.rs:487-497``),
* quoted strings and ``[xref lists]`` in clause values
  (``src/py/syn.rs:121-129``, ``src/py/xref.rs:169-173``),
* synonym scopes EXACT|BROAD|NARROW|RELATED (``src/py/syn.rs:68-82``),
* the 22 header clause types incl. ``idspace:``, ``synonymtypedef:`` and the
  six TreatXrefsAs* macros (``src/py/header/clause.rs:46-69``).

This parser runs driver-side (ontologies are ~MBs; the page corpus is the
distributed input), but is also exposed as a Ray ``flat_map``-able frame
splitter in :mod:`fastobo_py_ray.sources.obo_source` for tests and for
parsing many ontologies in parallel.

Errors are collected per line with (path, line number) context, mirroring the
reference error taxonomy (``src/error.rs:38-187``) but as data (dead-letter
rows) instead of raised exceptions, per SURVEY.md op 17.
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .model import (SYNONYM_SCOPES, TREAT_XREFS_TAGS, Clause, Frame,
                    HeaderMeta, Ontology)

FRAME_HEADS = {"[Term]": "term", "[Typedef]": "typedef",
               "[Instance]": "instance"}


@dataclass
class ParseError:
    """One dead-letter row.  ``error_code`` mirrors the reference error
    taxonomy (``src/error.rs:38-187`` / ``src/py/exceptions.rs:29-163``):

    * ``syntax``            — PySyntaxError (malformed line/stanza)
    * ``missing_clause``    — MissingClauseError (required clause absent)
    * ``duplicate_clauses`` — DuplicateClausesError (max-cardinality-1
      clause appears more than once in a frame)
    * ``single_clause``     — SingleClauseError (clause requiring >= 2
      entries — intersection_of / union_of — appears exactly once)

    ``col`` is the 1-based column of the offending token (path + line +
    column parity with the reference ``SyntaxError`` location,
    ``src/error.rs:38-60``); 0 for frame-level errors with no single
    source position.
    """
    path: str
    line_no: int
    line: str
    message: str
    error_code: str = "syntax"
    col: int = 0


@dataclass
class ParseResult:
    ontology: Ontology
    errors: List[ParseError] = field(default_factory=list)


# --------------------------------------------------------------------------
# low-level line handling
# --------------------------------------------------------------------------

def _scan_unquoted(s: str, targets: str) -> int:
    """Index of the first unescaped, unquoted occurrence of any char in
    *targets*, or -1."""
    in_quote = False
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            in_quote = not in_quote
        elif not in_quote and c in targets:
            return i
        i += 1
    return -1


def strip_comment(line: str) -> Tuple[str, Optional[str]]:
    """Split off a trailing ``! comment`` (unescaped, outside quotes).

    Only a ``!`` preceded by whitespace (or at line start) opens a
    comment — a mid-token ``!`` is literal content, matching the
    reference parser on ms.obo names like ``X!Tandem`` and regex values
    like ``(?<=K)(?!P)``.
    """
    start = 0
    while True:
        idx = _scan_unquoted(line[start:], "!")
        if idx < 0:
            return line, None
        idx += start
        if idx == 0 or line[idx - 1] in " \t":
            return line[:idx].rstrip(), line[idx + 1:].strip()
        start = idx + 1


def split_qualifiers(line: str) -> Tuple[str, List[Tuple[str, str]]]:
    """Split off a trailing ``{key="value", ...}`` qualifier list."""
    s = line.rstrip()
    if not s.endswith("}"):
        return line, []
    idx = _scan_unquoted(s, "{")
    if idx < 0:
        return line, []
    body = s[idx + 1:-1]
    quals: List[Tuple[str, str]] = []
    for part in _split_top_level(body, ","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            v = v.strip()
            if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
                v = _unescape_quoted(v[1:-1])
            quals.append((k.strip(), v))
        else:
            quals.append((part, ""))
    return s[:idx].rstrip(), quals


def _split_top_level(s: str, sep: str) -> List[str]:
    out, buf, in_quote, i = [], [], False, 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            buf.append(c); buf.append(s[i + 1]); i += 2
            continue
        if c == '"':
            in_quote = not in_quote
        if c == sep and not in_quote:
            out.append("".join(buf)); buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return out


def _unescape_quoted(s: str) -> str:
    if "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize_value(value: str) -> List[Tuple[str, str]]:
    """Tokenize a clause value into (kind, text) where kind is ``quoted``
    (content of a ``"..."`` string), ``bracket`` (content of a top-level
    ``[...]`` group) or ``word`` (whitespace-delimited, escape-aware)."""
    toks: List[Tuple[str, str]] = []
    i, n = 0, len(value)
    while i < n:
        c = value[i]
        if c in " \t":  # OBO separators are ASCII; \xa0 etc. are content
            i += 1
            continue
        if c == '"':
            j, buf = i + 1, []
            while j < n:
                if value[j] == "\\" and j + 1 < n:
                    buf.append(value[j:j + 2]); j += 2
                    continue
                if value[j] == '"':
                    break
                buf.append(value[j]); j += 1
            toks.append(("quoted", _unescape_quoted("".join(buf))))
            i = j + 1
        elif c == "[":
            depth, j, buf, in_quote = 1, i + 1, [], False
            while j < n and depth:
                ch = value[j]
                if ch == "\\" and j + 1 < n:
                    buf.append(value[j:j + 2]); j += 2
                    continue
                if ch == '"':
                    in_quote = not in_quote
                elif not in_quote:
                    if ch == "[":
                        depth += 1
                    elif ch == "]":
                        depth -= 1
                        if depth == 0:
                            break
                buf.append(ch); j += 1
            toks.append(("bracket", "".join(buf)))
            i = j + 1
        else:
            j, buf = i, []
            while j < n and value[j] not in " \t":
                if value[j] == "\\" and j + 1 < n:
                    buf.append(value[j:j + 2]); j += 2
                    continue
                buf.append(value[j]); j += 1
            toks.append(("word", "".join(buf)))
            i = j
    return toks


def parse_xref_list(body: str) -> List[str]:
    """Parse the inside of an ``[...]`` xref list -> list of xref id strings
    (descriptions and modifiers dropped; ``src/py/xref.rs:169-173``)."""
    out = []
    for part in _split_top_level(body, ","):
        part = part.strip(" \t")
        if not part:
            continue
        toks = tokenize_value(part)
        if toks and toks[0][0] == "word":
            out.append(toks[0][1])
    return out


# --------------------------------------------------------------------------
# clause parsing
# --------------------------------------------------------------------------

_SINGLE_ID_TAGS = {
    "is_a", "alt_id", "replaced_by", "consider", "union_of", "equivalent_to",
    "disjoint_from", "instance_of",
    # typedef-only (src/py/typedef/clause.rs)
    "domain", "range", "inverse_of", "transitive_over", "disjoint_over",
}
_BOOL_TAGS = {
    "is_anonymous", "builtin", "is_obsolete",
    "is_anti_symmetric", "is_cyclic", "is_reflexive", "is_symmetric",
    "is_asymmetric", "is_transitive", "is_functional",
    "is_inverse_functional", "is_metadata_tag", "is_class_level",
}
_CHAIN_TAGS = {"holds_over_chain", "equivalent_to_chain"}


def parse_clause(tag: str, value: str,
                 qualifiers: List[Tuple[str, str]],
                 comment: Optional[str]) -> Clause:
    """Parse one entity-frame clause line into a clause dict.

    Always records raw ``tag`` / ``value`` (the reference's
    ``raw_tag``/``raw_value`` projection, ``src/py/abc.rs:121-155``) plus
    structured fields for consumed tags.
    """
    c: Clause = {"tag": tag, "value": value}
    if qualifiers:
        c["qualifiers"] = qualifiers
    if comment:
        c["comment"] = comment
    if tag in _SINGLE_ID_TAGS or tag in _BOOL_TAGS or tag in (
            "name", "namespace", "comment", "subset", "created_by",
            "creation_date"):
        return c
    if tag == "def":
        toks = tokenize_value(value)
        for kind, text in toks:
            if kind == "quoted" and "text" not in c:
                c["text"] = text
            elif kind == "bracket":
                c["xrefs"] = parse_xref_list(text)
        return c
    if tag == "synonym":
        toks = tokenize_value(value)
        scope, stype, xrefs, text = "RELATED", None, [], ""
        seen_scope = False
        for kind, t in toks:
            if kind == "quoted" and not text:
                text = t
            elif kind == "word":
                if t in SYNONYM_SCOPES and not seen_scope:
                    scope, seen_scope = t, True
                elif seen_scope and stype is None:
                    stype = t
            elif kind == "bracket":
                xrefs = parse_xref_list(t)
        c.update(text=text, scope=scope, type=stype, xrefs=xrefs)
        return c
    if tag == "xref":
        toks = tokenize_value(value)
        if toks and toks[0][0] == "word":
            c["xref_id"] = toks[0][1]
        for kind, t in toks[1:]:
            if kind == "quoted":
                c["desc"] = t
                break
        return c
    if tag == "relationship":
        toks = [t for k, t in tokenize_value(value) if k == "word"]
        if len(toks) >= 2:
            c["relation"], c["target"] = toks[0], toks[1]
        return c
    if tag == "intersection_of":
        toks = [t for k, t in tokenize_value(value) if k == "word"]
        if len(toks) >= 2:
            c["relation"], c["target"] = toks[0], toks[1]
        elif len(toks) == 1:
            c["relation"], c["target"] = None, toks[0]
            c["value"] = toks[0]
        return c
    if tag == "property_value":
        toks = tokenize_value(value)
        if toks:
            c["relation"] = toks[0][1]
            rest = toks[1:]
            if rest and rest[0][0] == "quoted":
                c["pv_value"] = rest[0][1]
                if len(rest) > 1 and rest[1][0] == "word":
                    c["datatype"] = rest[1][1]
                c["pv_kind"] = "literal"  # src/py/pv.rs:89-96
            elif rest:
                c["pv_value"] = rest[0][1]
                c["pv_kind"] = "resource"  # src/py/pv.rs:36-41
        return c
    if tag in _CHAIN_TAGS:
        toks = [t for k, t in tokenize_value(value) if k == "word"]
        c["chain"] = toks
        return c
    if tag in ("expand_assertion_to", "expand_expression_to"):
        toks = tokenize_value(value)
        for kind, t in toks:
            if kind == "quoted":
                c["template"] = t
            elif kind == "bracket":
                c["xrefs"] = parse_xref_list(t)
        return c
    return c  # unknown tag kept raw (Unreserved, src/py/header/clause.rs:2026)


def _parse_header_clause(header: HeaderMeta, tag: str, value: str,
                         qualifiers: List[Tuple[str, str]],
                         comment: Optional[str]) -> None:
    c: Clause = {"tag": tag, "value": value}
    if qualifiers:
        c["qualifiers"] = qualifiers
    if comment:
        c["comment"] = comment
    header.clauses.append(c)
    if tag == "format-version":
        header.format_version = value
    elif tag == "data-version":
        header.data_version = value
    elif tag == "date":
        header.date = value
    elif tag == "ontology":
        header.ontology = value
    elif tag == "default-namespace":
        header.default_namespace = value
    elif tag == "saved-by":
        header.saved_by = value
    elif tag == "auto-generated-by":
        header.auto_generated_by = value
    elif tag == "import":
        header.imports.append(value)
    elif tag == "remark":
        header.remarks.append(value)
    elif tag == "subsetdef":
        toks = tokenize_value(value)
        sid = toks[0][1] if toks else value
        desc = next((t for k, t in toks[1:] if k == "quoted"), "")
        header.subsetdefs.append((sid, desc))
        c.update(subset_id=sid, desc=desc)
    elif tag == "synonymtypedef":
        # id "description" [SCOPE] (src/py/header/clause.rs:756-912)
        toks = tokenize_value(value)
        sid = toks[0][1] if toks else value
        desc = next((t for k, t in toks[1:] if k == "quoted"), "")
        scope = next((t for k, t in toks[1:]
                      if k == "word" and t in SYNONYM_SCOPES), "")
        header.synonym_typedefs[sid] = (desc, scope)
        c.update(type_id=sid, desc=desc, scope=scope)
    elif tag == "idspace":
        # prefix url ["description"] (src/py/header/clause.rs:1076-1203)
        toks = tokenize_value(value)
        words = [t for k, t in toks if k == "word"]
        if len(words) >= 2:
            header.idspaces[words[0]] = words[1]
            c.update(prefix=words[0], url=words[1])
    elif tag in TREAT_XREFS_TAGS:
        # ';' separates multiple declarations on one line, as in plana.obo
        # line 6: "treat-xrefs-as-genus-differentia: CARO part_of
        # NCBITaxon:79327; CL part_of NCBITaxon:79327"
        macro = TREAT_XREFS_TAGS[tag]
        entries = []
        for part in value.split(";"):
            part = part.strip()
            if not part:
                continue
            words = [t for k, t in tokenize_value(part) if k == "word"]
            idspace = words[0] if words else ""
            relation = words[1] if len(words) > 1 else ""
            filler = words[2] if len(words) > 2 else ""
            header.treat_xrefs.append((macro, idspace, relation, filler))
            entries.append((idspace, relation, filler))
        first = entries[0] if entries else ("", "", "")
        c.update(macro=macro, idspace=first[0], relation=first[1],
                 filler=first[2], entries=entries)
    # property_value / namespace-id-rule / owl-axioms / remark etc. stay raw


# --------------------------------------------------------------------------
# document parsing
# --------------------------------------------------------------------------

def split_tag_value(line: str) -> Optional[Tuple[str, str]]:
    """Split ``tag: value`` at the first unescaped colon."""
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\":
            i += 2
            continue
        if c == ":":
            return line[:i].strip(), line[i + 1:].strip()
        i += 1
    return None


def loads(text: str, path: str = "<str>") -> ParseResult:
    """Parse an OBO document string (mirrors ``fastobo.loads``,
    ``src/py/mod.rs:280-296``: header first, then entity frames).

    Example (mirrors the ``fastobo.loads`` doctest in
    ``src/py/mod.rs``):
        >>> r = loads("format-version: 1.2\\n\\n"
        ...           "[Term]\\nid: MS:1000031\\nname: instrument model\\n")
        >>> len(r.ontology.frames), r.errors
        (1, [])
        >>> f = r.ontology.frames[0]
        >>> f.kind, f.id, f.name
        ('term', 'MS:1000031', 'instrument model')
    """
    header = HeaderMeta()
    frames: List[Frame] = []
    errors: List[ParseError] = []
    current: Optional[Frame] = None
    in_header = True

    for line_no, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line:
            continue
        if line in FRAME_HEADS:
            in_header = False
            current = Frame(kind=FRAME_HEADS[line], id="")
            frames.append(current)
            continue
        if line.startswith("[") and line.endswith("]"):
            # unknown stanza type: tolerated, clauses ignored
            in_header = False
            current = None
            errors.append(ParseError(path, line_no, line,
                                     f"unknown frame head {line!r}",
                                     col=raw.find("[") + 1))
            continue
        if line.startswith("!"):
            continue
        body, comment = strip_comment(line)
        body, qualifiers = split_qualifiers(body)
        tv = split_tag_value(body)
        if tv is None:
            errors.append(ParseError(
                path, line_no, raw, "expected 'tag: value'",
                col=len(raw) - len(raw.lstrip()) + 1))
            continue
        tag, value = tv
        if in_header:
            _parse_header_clause(header, tag, value, qualifiers, comment)
            continue
        if current is None:
            continue
        if tag == "id" and not current.id:
            current.id = value
            continue
        current.clauses.append(parse_clause(tag, value, qualifiers, comment))

    return ParseResult(Ontology(header, frames), errors)


# max-cardinality-1 clause tags per the OBO 1.4 spec (the set fastobo's
# CardinalityError::DuplicateClauses guards; term + typedef frames)
_CARD_ONE_TAGS = frozenset({
    "name", "def", "comment", "namespace", "is_anonymous", "is_obsolete",
    "created_by", "creation_date", "domain", "range", "is_cyclic",
    "is_reflexive", "is_symmetric", "is_asymmetric", "is_anti_symmetric",
    "is_transitive", "is_functional", "is_inverse_functional",
    "is_metadata_tag", "is_class_level",
})

# clause tags requiring >= 2 entries when present (SingleClause)
_CARD_TWO_TAGS = frozenset({"intersection_of", "union_of"})


def validate_cardinality(ontology: Ontology,
                         path: str = "<str>") -> List[ParseError]:
    """Frame-level cardinality checks as dead-letter rows (the engine
    projection of the reference's CardinalityError raises,
    ``src/error.rs:140-160``): the reference surfaces these lazily on
    attribute access / OWL conversion; here they are a validation scan a
    pipeline can run over parsed frames and route to a dead-letter sink.

    Emits one coded :class:`ParseError` per violation; ``line`` carries
    the offending frame id (matching the ``id`` payload of the reference
    exception classes, ``src/py/exceptions.rs:44-137``)."""
    out: List[ParseError] = []
    # header: `ontology` is required for OWL emission — the reference
    # raises MissingClauseError("ontology", "header") from dump_owl
    # (src/error.rs:166-180 via fastobo_owl::Error::Cardinality)
    if not ontology.header.ontology:
        out.append(ParseError(path, 0, "header",
                              "missing clause 'ontology' in header frame",
                              error_code="missing_clause"))
    for f in ontology.frames:
        if not f.id:
            out.append(ParseError(path, 0, f"[{f.kind}]",
                                  f"missing clause 'id' in {f.kind} frame",
                                  error_code="missing_clause"))
        counts: Dict[str, int] = {}
        for c in f.clauses:
            counts[c["tag"]] = counts.get(c["tag"], 0) + 1
        for tag, n in sorted(counts.items()):
            if n > 1 and tag in _CARD_ONE_TAGS:
                out.append(ParseError(
                    path, 0, f.id,
                    f"duplicate clauses '{tag}' in frame {f.id!r}",
                    error_code="duplicate_clauses"))
            if n == 1 and tag in _CARD_TWO_TAGS:
                out.append(ParseError(
                    path, 0, f.id,
                    f"clause '{tag}' appears only once in frame {f.id!r} "
                    f"(at least two expected)",
                    error_code="single_clause"))
    return out


def dead_letter_table(errors: List[ParseError]):
    """Dead-letter rows as an Arrow table (path, line_no, col, line,
    message, error_code) — the sink-able form of the op-17 error
    taxonomy, with full path+line+column source locations
    (``src/error.rs:38-60`` parity)."""
    import pyarrow as pa

    return pa.table({
        "path": pa.array([e.path for e in errors], pa.string()),
        "line_no": pa.array([e.line_no for e in errors], pa.int64()),
        "col": pa.array([e.col for e in errors], pa.int64()),
        "line": pa.array([e.line for e in errors], pa.string()),
        "message": pa.array([e.message for e in errors], pa.string()),
        "error_code": pa.array([e.error_code for e in errors],
                               pa.string()),
    })


def load(path: str) -> ParseResult:
    """Parse an OBO file from a path; transparently handles ``.gz``
    (mirrors ``fastobo.load``'s gzip sniffing, ``src/py/mod.rs:176-213``)."""
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        data = gzip.open(fh).read() if head == b"\x1f\x8b" else fh.read()
    return loads(data.decode("utf-8"), path=os.fspath(path))
