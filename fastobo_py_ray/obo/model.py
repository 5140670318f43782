"""Ontology data model: frames/clauses as plain Python structures plus the
Arrow projections used by the Ray Data engine.

Reimagines the reference AST (``/root/reference/src/py/doc.rs:95-102`` OboDoc,
``src/py/term/frame.rs:27-34`` TermFrame, ``src/py/typedef/frame.rs:28-35``
TypedefFrame, ``src/py/syn.rs:121-129`` Synonym, ``src/py/xref.rs:49-55``
Xref) as:

* ``Frame`` — (kind, id, clauses) where each clause is a dict with at least
  ``tag`` and ``value`` (the reference's ``raw_tag()`` / ``raw_value()``
  projection, ``src/py/abc.rs:121-155``) plus structured fields for the
  clauses the engine consumes;
* ``HeaderMeta`` — the broadcastable header digest (idspaces, synonym
  typedefs, treat-xrefs macros; enum ``src/py/header/clause.rs:46-69``);
* ``Ontology`` — parsed document + derived lookup structures, convertible to
  the Arrow tables ``ontology_terms`` / ``ontology_edges`` (SURVEY.md §1.2).

The ontology is always small relative to the page corpus, so these objects
live on the driver and are broadcast once via ``ray.put``; per-batch stages
only ever see the Arrow projections or derived dicts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import pyarrow as pa

from . import ids as obo_ids

Clause = Dict[str, Any]

SYNONYM_SCOPES = ("EXACT", "BROAD", "NARROW", "RELATED")  # src/py/syn.rs:68-82

# header macro clause tags -> canonical macro name
# (src/py/header/clause.rs:1212-1716)
TREAT_XREFS_TAGS = {
    "treat-xrefs-as-equivalent": "equivalent",
    "treat-xrefs-as-genus-differentia": "genus-differentia",
    "treat-xrefs-as-reverse-genus-differentia": "reverse-genus-differentia",
    "treat-xrefs-as-relationship": "relationship",
    "treat-xrefs-as-is_a": "is_a",
    "treat-xrefs-as-has-subclass": "has-subclass",
}


@dataclass
class HeaderMeta:
    """Broadcastable digest of the header frame."""

    format_version: Optional[str] = None
    data_version: Optional[str] = None
    date: Optional[str] = None
    ontology: Optional[str] = None
    default_namespace: Optional[str] = None
    saved_by: Optional[str] = None
    auto_generated_by: Optional[str] = None
    imports: List[str] = field(default_factory=list)
    remarks: List[str] = field(default_factory=list)
    subsetdefs: List[Tuple[str, str]] = field(default_factory=list)
    # id -> (description, scope or "") (src/py/header/clause.rs:756-912)
    synonym_typedefs: Dict[str, Tuple[str, str]] = field(default_factory=dict)
    # prefix -> url base (src/py/header/clause.rs:1076-1203)
    idspaces: Dict[str, str] = field(default_factory=dict)
    # (macro, idspace, relation, filler) (src/py/header/clause.rs:1212-1716)
    treat_xrefs: List[Tuple[str, str, str, str]] = field(default_factory=list)
    clauses: List[Clause] = field(default_factory=list)  # full ordered list


@dataclass
class Frame:
    """One OBO stanza as (kind, id, raw clause dicts).

    Example (``raw_tag``/``raw_value`` projection semantics,
    ``src/py/term/clause.rs`` getters):
        >>> f = Frame(kind="term", id="MS:1000031",
        ...           clauses=[{"tag": "name", "value": "instrument model"},
        ...                    {"tag": "synonym", "value": "vendor model"}])
        >>> f.first("name")["value"]
        'instrument model'
        >>> [c["tag"] for c in f.values("synonym")]
        ['synonym']
        >>> f.name
        'instrument model'
    """
    kind: str  # "term" | "typedef" | "instance" (src/py/doc.rs:47-53)
    id: str
    clauses: List[Clause] = field(default_factory=list)

    def values(self, tag: str) -> List[Any]:
        return [c for c in self.clauses if c["tag"] == tag]

    def first(self, tag: str) -> Optional[Clause]:
        for c in self.clauses:
            if c["tag"] == tag:
                return c
        return None

    @property
    def name(self) -> Optional[str]:
        c = self.first("name")
        return c["value"] if c else None


@dataclass
class Ontology:
    header: HeaderMeta
    frames: List[Frame]

    # ------------------------------------------------------------------ views
    def terms(self) -> List[Frame]:
        return [f for f in self.frames if f.kind == "term"]

    def typedefs(self) -> List[Frame]:
        return [f for f in self.frames if f.kind == "typedef"]

    def frame_by_id(self) -> Dict[str, Frame]:
        return {f.id: f for f in self.frames}

    # --------------------------------------------------------------- ontology_terms
    def terms_table(self) -> pa.Table:
        """Arrow ``ontology_terms`` table (SURVEY.md §1.2)."""
        from .dates import to_timestamp_us

        rows: Dict[str, list] = {
            "term_id": [], "kind": [], "name": [], "namespace": [],
            "def": [], "is_obsolete": [], "replaced_by": [], "alt_ids": [],
            "synonyms": [], "xrefs": [], "creation_date": [],
        }
        for f in self.frames:
            cd = f.first("creation_date")
            # typed projection (src/date.rs:15-123): ISO text -> UTC
            # instant; the exact raw text stays on the clause
            rows["creation_date"].append(
                to_timestamp_us(cd["value"]) if cd else None)
            rows["term_id"].append(f.id)
            rows["kind"].append(f.kind)
            rows["name"].append(f.name)
            ns = f.first("namespace")
            rows["namespace"].append(
                ns["value"] if ns else self.header.default_namespace)
            d = f.first("def")
            rows["def"].append(d.get("text") if d else None)
            obs = f.first("is_obsolete")
            rows["is_obsolete"].append(
                bool(obs and str(obs["value"]).lower() == "true"))
            rows["replaced_by"].append([c["value"] for c in f.values("replaced_by")])
            rows["alt_ids"].append([c["value"] for c in f.values("alt_id")])
            rows["synonyms"].append([
                {"text": c.get("text", ""), "scope": c.get("scope", "RELATED"),
                 "type": c.get("type") or "", "xrefs": c.get("xrefs", [])}
                for c in f.values("synonym")])
            rows["xrefs"].append([
                {"id": c.get("xref_id", c["value"]), "desc": c.get("desc") or ""}
                for c in f.values("xref")])
        syn_t = pa.list_(pa.struct([("text", pa.string()), ("scope", pa.string()),
                                    ("type", pa.string()),
                                    ("xrefs", pa.list_(pa.string()))]))
        xref_t = pa.list_(pa.struct([("id", pa.string()), ("desc", pa.string())]))
        schema = pa.schema([
            ("term_id", pa.string()), ("kind", pa.string()),
            ("name", pa.string()), ("namespace", pa.string()),
            ("def", pa.string()), ("is_obsolete", pa.bool_()),
            ("replaced_by", pa.list_(pa.string())),
            ("alt_ids", pa.list_(pa.string())),
            ("synonyms", syn_t), ("xrefs", xref_t),
            ("creation_date", pa.timestamp("us")),
        ])
        return pa.table(rows, schema=schema)

    # --------------------------------------------------------------- ontology_edges
    def edges_table(self) -> pa.Table:
        """Arrow ``ontology_edges`` (subj, pred, obj, origin).

        Direct edges: ``is_a`` (``src/py/term/clause.rs:1067-1131``), typed
        ``relationship`` (``:1479-1553``), ``union_of``/``intersection_of``/
        ``equivalent_to``/``disjoint_from`` (``:1166-1404``); plus xref-macro
        edges from the header TreatXrefsAs* clauses
        (``src/py/header/clause.rs:1212-1716``), see :mod:`.macros`.
        """
        from .macros import expand_treat_xrefs  # local import, avoids cycle

        subj, pred, obj, origin = [], [], [], []

        def add(s: str, p: str, o: str, org: str) -> None:
            subj.append(s); pred.append(p); obj.append(o); origin.append(org)

        for f in self.frames:
            for c in f.clauses:
                t = c["tag"]
                if t == "is_a":
                    add(f.id, "is_a", c["value"], "is_a")
                elif t == "relationship":
                    add(f.id, c["relation"], c["target"], "relationship")
                elif t == "union_of":
                    add(f.id, "union_of", c["value"], "union_of")
                elif t == "intersection_of":
                    if c.get("relation"):
                        add(f.id, c["relation"], c["target"], "intersection_of")
                    else:
                        add(f.id, "intersection_of", c["value"], "intersection_of")
                elif t == "equivalent_to":
                    add(f.id, "equivalent_to", c["value"], "equivalent_to")
                elif t == "disjoint_from":
                    add(f.id, "disjoint_from", c["value"], "disjoint_from")
        for s, p, o, org in expand_treat_xrefs(self):
            add(s, p, o, org)
        return pa.table({"subj": subj, "pred": pred, "obj": obj,
                         "origin": origin})

    # --------------------------------------------------------- canonicalization
    def equivalence_edges(self) -> List[Tuple[str, str]]:
        """Undirected identity edges feeding the union-find canonicalizer:
        ``alt_id`` (``src/py/term/clause.rs:410``), ``replaced_by``
        (``:1630``), and TreatXrefsAsEquivalent xrefs
        (``src/py/header/clause.rs:1212-1286``)."""
        from .macros import equivalent_idspaces

        eq_spaces = equivalent_idspaces(self.header)
        out: List[Tuple[str, str]] = []
        for f in self.frames:
            for c in f.values("alt_id"):
                out.append((f.id, c["value"]))
            for c in f.values("replaced_by"):
                out.append((f.id, c["value"]))
            if eq_spaces:
                for c in f.values("xref"):
                    xid = c.get("xref_id", c["value"])
                    kind, prefix, _ = obo_ids.parse(xid)
                    if kind == obo_ids.KIND_PREFIXED and prefix in eq_spaces:
                        out.append((f.id, xid))
        return out
