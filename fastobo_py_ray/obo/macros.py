"""TreatXrefsAs* header-macro expansion.

Matches the semantics of the six macro header clauses in the reference
(``/root/reference/src/py/header/clause.rs:1212-1716``; OBO 1.4 §6.1): a
header clause declares that every term-level ``xref:`` whose identifier
prefix equals the macro's IDspace is re-interpreted as an ontology axiom:

* ``treat-xrefs-as-equivalent IDSPACE``         -> term equivalent_to xref
* ``treat-xrefs-as-is_a IDSPACE``               -> term is_a xref
* ``treat-xrefs-as-has-subclass IDSPACE``       -> xref is_a term
* ``treat-xrefs-as-relationship IDSPACE REL``   -> term REL xref
* ``treat-xrefs-as-genus-differentia IDSPACE REL FILLER``
      -> term intersection_of xref  +  term REL FILLER
* ``treat-xrefs-as-reverse-genus-differentia IDSPACE REL FILLER``
      -> xref intersection_of term  +  xref REL FILLER

All emitted edges carry ``origin="xref_macro"`` so downstream stages can
distinguish macro-derived triples from directly asserted ones.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable, List, Set, Tuple

from . import ids as obo_ids

if TYPE_CHECKING:  # pragma: no cover
    from .model import HeaderMeta, Ontology

Edge = Tuple[str, str, str, str]  # subj, pred, obj, origin


def equivalent_idspaces(header: "HeaderMeta") -> Set[str]:
    """IDspaces declared treat-xrefs-as-equivalent (feeds union-find)."""
    return {idspace for macro, idspace, _, _ in header.treat_xrefs
            if macro == "equivalent"}


def expand_treat_xrefs(ontology: "Ontology") -> Iterable[Edge]:
    """Expand header ``treat-xrefs-as-*`` macros into typed edges
    (``src/py/header/clause.rs:1212-1286`` semantics).

    Example:
        >>> from .parser import loads
        >>> r = loads("format-version: 1.2\\n"
        ...           "treat-xrefs-as-is_a: CHEBI\\n\\n"
        ...           "[Term]\\nid: MS:1\\nxref: CHEBI:27958\\n")
        >>> list(expand_treat_xrefs(r.ontology))
        [('MS:1', 'is_a', 'CHEBI:27958', 'xref_macro')]
    """
    macros = ontology.header.treat_xrefs
    if not macros:
        return []
    out: List[Edge] = []
    for frame in ontology.frames:
        if frame.kind != "term":
            continue
        xref_clauses = frame.values("xref")
        if not xref_clauses:
            continue
        for clause in xref_clauses:
            xid = clause.get("xref_id", clause["value"])
            kind, prefix, _local = obo_ids.parse(xid)
            if kind != obo_ids.KIND_PREFIXED:
                continue
            for macro, idspace, relation, filler in macros:
                if prefix != idspace:
                    continue
                if macro == "equivalent":
                    out.append((frame.id, "equivalent_to", xid, "xref_macro"))
                elif macro == "is_a":
                    out.append((frame.id, "is_a", xid, "xref_macro"))
                elif macro == "has-subclass":
                    out.append((xid, "is_a", frame.id, "xref_macro"))
                elif macro == "relationship":
                    out.append((frame.id, relation, xid, "xref_macro"))
                elif macro == "genus-differentia":
                    out.append((frame.id, "intersection_of", xid, "xref_macro"))
                    out.append((frame.id, relation, filler, "xref_macro"))
                elif macro == "reverse-genus-differentia":
                    out.append((xid, "intersection_of", frame.id, "xref_macro"))
                    out.append((xid, relation, filler, "xref_macro"))
    return out
