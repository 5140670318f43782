"""OBO serialization: frames/clauses -> OBO text.

Reimplements the reference's ``__str__`` writers (``OboDoc.__str__``
``/root/reference/src/py/doc.rs:124-129``, ``TermFrame.__str__``
``src/py/term/frame.rs:55-61``, clause Display impls throughout
``src/py/*/clause.rs``) as pure functions over clause dicts. The correctness
oracle is the reference's roundtrip discipline
(``tests/common.py:157-159``): ``loads(dumps(loads(text)))`` must equal
``loads(text)`` at the table level, and byte-exact on the engine's own
fixtures.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .model import Clause, Frame, HeaderMeta, Ontology


def _escape_quoted(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("\n", "\\n").replace("\t", "\\t"))


def _fmt_qualifiers(quals: List[Tuple[str, str]]) -> str:
    inner = ", ".join(f'{k}="{_escape_quoted(v)}"' for k, v in quals)
    return " {" + inner + "}"


def clause_to_line(c: Clause) -> str:
    """One clause dict -> one OBO line (tag: value [{quals}] [! comment])."""
    tag = c["tag"]
    if tag == "synonym" and "text" in c:
        parts = [f'"{_escape_quoted(c["text"])}"']
        if c.get("scope"):
            parts.append(c["scope"])
        if c.get("type"):
            parts.append(c["type"])
        parts.append("[" + ", ".join(c.get("xrefs", [])) + "]")
        value = " ".join(parts)
    elif tag == "def" and "text" in c:
        value = f'"{_escape_quoted(c["text"])}"'
        if "xrefs" in c:
            value += " [" + ", ".join(c["xrefs"]) + "]"
    elif tag in ("relationship", "intersection_of") and c.get("relation"):
        value = f'{c["relation"]} {c["target"]}'
    elif tag == "intersection_of" and c.get("target"):
        value = c["target"]
    elif tag == "xref" and "xref_id" in c:
        value = c["xref_id"]
        if c.get("desc"):
            value += f' "{_escape_quoted(c["desc"])}"'
    else:
        value = c["value"]
    line = f"{tag}: {value}" if value != "" else f"{tag}:"
    if c.get("qualifiers"):
        line += _fmt_qualifiers(c["qualifiers"])
    if c.get("comment"):
        line += f" ! {c['comment']}"
    return line


def header_to_text(header: HeaderMeta) -> str:
    return "\n".join(clause_to_line(c) for c in header.clauses)


def frame_to_text(frame: Frame) -> str:
    head = {"term": "[Term]", "typedef": "[Typedef]",
            "instance": "[Instance]"}[frame.kind]
    lines = [head, f"id: {frame.id}"]
    lines.extend(clause_to_line(c) for c in frame.clauses)
    return "\n".join(lines)


def dumps(ontology: Ontology) -> str:
    """Serialize a whole document (header, blank line, frames separated by
    blank lines, trailing newline) — the reference's ``str(doc)`` layout.

    Example (parse -> serialize roundtrip is byte-stable):
        >>> from .parser import loads
        >>> text = ("format-version: 1.2\\n\\n"
        ...         "[Term]\\nid: MS:1000031\\nname: instrument model\\n")
        >>> dumps(loads(text).ontology) == text
        True
    """
    parts = [header_to_text(ontology.header)]
    parts.extend(frame_to_text(f) for f in ontology.frames)
    return "\n\n".join(p for p in parts if p) + "\n"


def dump(ontology: Ontology, path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(dumps(ontology))
