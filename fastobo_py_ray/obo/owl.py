"""OWL sink — engine projection of ``fastobo.dump_owl``
(``/root/reference/src/py/mod.rs:464-511``).

The reference converts through horned-owl with formats ofn/owx/rdf; here
all three — ``ofn`` (OWL Functional-Style Syntax), ``owx`` (OWL/XML) and
``rdf`` (RDF/XML per the OWL 2 RDF mapping), the XML ones via stdlib
``xml.etree`` — are emitted natively from ONE structured axiom list, so
the formats carry the identical axiom set by construction (guarded by
re-parse tests on ms.obo).

Mapping (OBO -> OWL per the OBO 1.4 / oboInOwl conventions):

* term frame -> ``Declaration(Class(<iri>))``; typedef ->
  ``Declaration(ObjectProperty(<iri>))``;
* ``name:`` -> ``AnnotationAssertion(rdfs:label ...)``;
* ``def:`` -> ``AnnotationAssertion(obo:IAO_0000115 ...)``;
* ``is_a:`` -> ``SubClassOf`` / ``SubObjectPropertyOf``;
* ``relationship: R T`` -> ``SubClassOf(C ObjectSomeValuesFrom(R T))``;
* ``is_obsolete: true`` -> ``AnnotationAssertion(owl:deprecated ...)``.
"""

from __future__ import annotations

from typing import List, Tuple

from . import ids as obo_ids
from .model import Frame, Ontology

_PREFIXES = (
    'Prefix(:=<http://purl.obolibrary.org/obo/>)\n'
    'Prefix(owl:=<http://www.w3.org/2002/07/owl#>)\n'
    'Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)\n'
    'Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)\n'
)

_RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_OWL_DEPRECATED = "http://www.w3.org/2002/07/owl#deprecated"
_IAO_DEF = "http://purl.obolibrary.org/obo/IAO_0000115"
_XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"

# structured axiom kinds (shared by the ofn and owx renderers):
#   ("decl",       is_class, iri)
#   ("ann",        prop_iri, iri, literal, datatype_iri_or_None)
#   ("sub",        is_class, iri, parent_iri)
#   ("svf",        iri, relation_iri, target_iri)
#   ("transitive", iri)
Axiom = Tuple


def _iri(ident: str) -> str:
    url = obo_ids.decompact(ident)
    if "://" in url:
        return url
    # unprefixed relation idents (part_of) live in the ontology's namespace
    return f"http://purl.obolibrary.org/obo/{url}"


def _lit(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def frame_axioms(f: Frame) -> List[Axiom]:
    """One entity frame -> its structured OWL axioms."""
    iri = _iri(f.id)
    cls = f.kind != "typedef"
    out: List[Axiom] = [("decl", cls, iri)]
    if f.name:
        out.append(("ann", _RDFS_LABEL, iri, f.name, None))
    d = f.first("def")
    if d is not None:
        out.append(("ann", _IAO_DEF, iri, d.get("text", d["value"]), None))
    obs = f.first("is_obsolete")
    if obs and str(obs["value"]).lower() == "true":
        out.append(("ann", _OWL_DEPRECATED, iri, "true", _XSD_BOOLEAN))
    for c in f.clauses:
        if c["tag"] == "is_a":
            out.append(("sub", cls, iri, _iri(c["value"])))
        elif c["tag"] == "relationship" and cls:
            out.append(("svf", iri, _iri(c["relation"]),
                        _iri(c["target"])))
        elif c["tag"] == "is_transitive" and not cls \
                and str(c["value"]).lower() == "true":
            out.append(("transitive", iri))
    return out


def ontology_axioms(ontology: Ontology) -> List[Axiom]:
    out: List[Axiom] = []
    for f in ontology.frames:
        out.extend(frame_axioms(f))
    return out


# --------------------------------------------------------------------------
# ofn (functional syntax)
# --------------------------------------------------------------------------

def _ofn_ann_prop(prop: str) -> str:
    if prop == _RDFS_LABEL:
        return "rdfs:label"
    if prop == _OWL_DEPRECATED:
        return "owl:deprecated"
    return f"<{prop}>"


def _render_ofn(ax: Axiom) -> str:
    kind = ax[0]
    if kind == "decl":
        _, cls, iri = ax
        return f"Declaration({'Class' if cls else 'ObjectProperty'}(<{iri}>))"
    if kind == "ann":
        _, prop, iri, text, dtype = ax
        lit = _lit(text) + ("^^xsd:boolean" if dtype == _XSD_BOOLEAN else "")
        return f"AnnotationAssertion({_ofn_ann_prop(prop)} <{iri}> {lit})"
    if kind == "sub":
        _, cls, iri, parent = ax
        op = "SubClassOf" if cls else "SubObjectPropertyOf"
        return f"{op}(<{iri}> <{parent}>)"
    if kind == "svf":
        _, iri, rel, tgt = ax
        return (f"SubClassOf(<{iri}> ObjectSomeValuesFrom("
                f"<{rel}> <{tgt}>))")
    if kind == "transitive":
        return f"TransitiveObjectProperty(<{ax[1]}>)"
    raise ValueError(f"unknown axiom kind {kind!r}")


# --------------------------------------------------------------------------
# owx (OWL/XML, stdlib ElementTree)
# --------------------------------------------------------------------------

_OWL_NS = "http://www.w3.org/2002/07/owl#"


def _render_owx(axioms: List[Axiom], ontology_iri: str) -> str:
    import xml.etree.ElementTree as ET

    root = ET.Element("Ontology", {
        "xmlns": _OWL_NS,
        "ontologyIRI": ontology_iri,
    })

    def sub(parent, tag, attrib=None, text=None):
        e = ET.SubElement(parent, tag, attrib or {})
        if text is not None:
            e.text = text
        return e

    def entity(parent, cls: bool, iri: str):
        sub(parent, "Class" if cls else "ObjectProperty", {"IRI": iri})

    for ax in axioms:
        kind = ax[0]
        if kind == "decl":
            _, cls, iri = ax
            entity(sub(root, "Declaration"), cls, iri)
        elif kind == "ann":
            _, prop, iri, text, dtype = ax
            e = sub(root, "AnnotationAssertion")
            sub(e, "AnnotationProperty", {"IRI": prop})
            sub(e, "IRI", text=iri)
            attrib = {"datatypeIRI": dtype} if dtype else {}
            sub(e, "Literal", attrib, text=text)
        elif kind == "sub":
            _, cls, iri, parent = ax
            e = sub(root, "SubClassOf" if cls else "SubObjectPropertyOf")
            entity(e, cls, iri)
            entity(e, cls, parent)
        elif kind == "svf":
            _, iri, rel, tgt = ax
            e = sub(root, "SubClassOf")
            entity(e, True, iri)
            svf = sub(e, "ObjectSomeValuesFrom")
            entity(svf, False, rel)
            entity(svf, True, tgt)
        elif kind == "transitive":
            entity(sub(root, "TransitiveObjectProperty"), False, ax[1])
        else:
            raise ValueError(f"unknown axiom kind {kind!r}")

    ET.indent(root)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            + ET.tostring(root, encoding="unicode") + "\n")


def parse_owx_axioms(text: str) -> List[Axiom]:
    """Re-parse an owx document back into structured axioms (the owx
    side of the ofn/owx equivalence test)."""
    import xml.etree.ElementTree as ET

    def strip(t):  # drop the default-namespace prefix ElementTree adds
        return t.split("}", 1)[-1]

    root = ET.fromstring(text)
    out: List[Axiom] = []
    for e in root:
        tag = strip(e.tag)
        kids = [(strip(k.tag), k) for k in e]
        if tag == "Declaration":
            ktag, k = kids[0]
            out.append(("decl", ktag == "Class", k.get("IRI")))
        elif tag == "AnnotationAssertion":
            prop = kids[0][1].get("IRI")
            iri = kids[1][1].text
            lit = kids[2][1]
            out.append(("ann", prop, iri, lit.text or "",
                        lit.get("datatypeIRI")))
        elif tag in ("SubClassOf", "SubObjectPropertyOf"):
            if len(kids) == 2 and kids[1][0] == "ObjectSomeValuesFrom":
                svf = [(strip(k.tag), k) for k in kids[1][1]]
                out.append(("svf", kids[0][1].get("IRI"),
                            svf[0][1].get("IRI"), svf[1][1].get("IRI")))
            else:
                out.append(("sub", tag == "SubClassOf",
                            kids[0][1].get("IRI"), kids[1][1].get("IRI")))
        elif tag == "TransitiveObjectProperty":
            out.append(("transitive", kids[0][1].get("IRI")))
    return out


# --------------------------------------------------------------------------
# rdf (RDF/XML, OWL 2 RDF mapping, stdlib ElementTree)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
_OWL_TRANSITIVE = _OWL_NS + "TransitiveProperty"


def _split_iri(iri: str):
    """IRI -> (namespace, NCName local) at the last '#' or '/'."""
    for sep in ("#", "/"):
        i = iri.rfind(sep)
        if 0 <= i < len(iri) - 1:
            return iri[:i + 1], iri[i + 1:]
    return iri, ""


def _render_rdf(axioms: List[Axiom], ontology_iri: str) -> str:
    """Structured axioms -> RDF/XML per the OWL 2 RDF mapping: one typed
    node per declared entity carrying its annotation, subclass,
    existential-restriction and transitivity triples."""
    import xml.etree.ElementTree as ET

    for pfx, ns in (("rdf", _RDF_NS), ("rdfs", _RDFS_NS),
                    ("owl", _OWL_NS),
                    ("obo", "http://purl.obolibrary.org/obo/")):
        ET.register_namespace(pfx, ns)

    root = ET.Element(f"{{{_RDF_NS}}}RDF")
    ET.SubElement(root, f"{{{_OWL_NS}}}Ontology",
                  {f"{{{_RDF_NS}}}about": ontology_iri})

    # group per subject so each entity renders as one typed node
    order: List[str] = []
    ent: dict = {}
    for ax in axioms:
        if ax[0] == "decl":
            _, cls, iri = ax
            if iri not in ent:
                order.append(iri)
                ent[iri] = {"cls": cls, "rest": []}
            ent[iri]["cls"] = cls
    for ax in axioms:
        if ax[0] == "decl":
            continue
        iri = ax[2] if ax[0] in ("ann", "sub") else ax[1]
        if iri not in ent:  # annotation on an undeclared id: typed node
            order.append(iri)
            ent[iri] = {"cls": True, "rest": []}
        ent[iri]["rest"].append(ax)

    for iri in order:
        e = ent[iri]
        node = ET.SubElement(
            root, f"{{{_OWL_NS}}}{'Class' if e['cls'] else 'ObjectProperty'}",
            {f"{{{_RDF_NS}}}about": iri})
        for ax in e["rest"]:
            if ax[0] == "ann":
                _, prop, _iri_, text, dtype = ax
                ns, local = _split_iri(prop)
                a = ET.SubElement(node, f"{{{ns}}}{local}")
                a.text = text
                if dtype:
                    a.set(f"{{{_RDF_NS}}}datatype", dtype)
            elif ax[0] == "sub":
                _, cls, _iri_, parent = ax
                tag = "subClassOf" if cls else "subPropertyOf"
                ET.SubElement(node, f"{{{_RDFS_NS}}}{tag}",
                              {f"{{{_RDF_NS}}}resource": parent})
            elif ax[0] == "svf":
                _, _iri_, rel, tgt = ax
                sc = ET.SubElement(node, f"{{{_RDFS_NS}}}subClassOf")
                r = ET.SubElement(sc, f"{{{_OWL_NS}}}Restriction")
                ET.SubElement(r, f"{{{_OWL_NS}}}onProperty",
                              {f"{{{_RDF_NS}}}resource": rel})
                ET.SubElement(r, f"{{{_OWL_NS}}}someValuesFrom",
                              {f"{{{_RDF_NS}}}resource": tgt})
            elif ax[0] == "transitive":
                ET.SubElement(node, f"{{{_RDF_NS}}}type",
                              {f"{{{_RDF_NS}}}resource": _OWL_TRANSITIVE})

    ET.indent(root)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            + ET.tostring(root, encoding="unicode") + "\n")


def parse_rdf_axioms(text: str) -> List[Axiom]:
    """Re-parse RDF/XML back into structured axioms (the rdf side of the
    three-format axiom-set equivalence test)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    out: List[Axiom] = []
    for node in root:
        if node.tag == f"{{{_OWL_NS}}}Ontology":
            continue
        cls = node.tag == f"{{{_OWL_NS}}}Class"
        iri = node.get(f"{{{_RDF_NS}}}about")
        out.append(("decl", cls, iri))
        for child in node:
            if child.tag == f"{{{_RDFS_NS}}}subClassOf" or \
                    child.tag == f"{{{_RDFS_NS}}}subPropertyOf":
                res = child.get(f"{{{_RDF_NS}}}resource")
                if res is not None:
                    out.append(("sub", cls, iri, res))
                else:  # nested owl:Restriction = existential
                    r = child[0]
                    rel = r.find(f"{{{_OWL_NS}}}onProperty") \
                        .get(f"{{{_RDF_NS}}}resource")
                    tgt = r.find(f"{{{_OWL_NS}}}someValuesFrom") \
                        .get(f"{{{_RDF_NS}}}resource")
                    out.append(("svf", iri, rel, tgt))
            elif child.tag == f"{{{_RDF_NS}}}type":
                if child.get(f"{{{_RDF_NS}}}resource") == _OWL_TRANSITIVE:
                    out.append(("transitive", iri))
            else:
                ns = child.tag.rsplit("}", 1)
                prop = ns[0][1:] + ns[1]
                out.append(("ann", prop, iri, child.text or "",
                            child.get(f"{{{_RDF_NS}}}datatype")))
    return out


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def dumps_owl(ontology: Ontology, format: str = "ofn") -> str:
    """Ontology -> OWL text (``ofn``, ``owx`` or ``rdf`` — the
    reference's three formats, ``src/py/mod.rs:464-511``; all three
    carry the identical structured axiom set by construction, guarded
    by re-parse tests on ms.obo)."""
    oid = ontology.header.ontology or "ontology"
    ontology_iri = f"http://purl.obolibrary.org/obo/{oid}.owl"
    axioms = ontology_axioms(ontology)
    if format == "ofn":
        lines = [_PREFIXES, f"Ontology(<{ontology_iri}>"]
        lines.extend(_render_ofn(ax) for ax in axioms)
        lines.append(")")
        return "\n".join(lines) + "\n"
    if format == "owx":
        return _render_owx(axioms, ontology_iri)
    if format == "rdf":
        return _render_rdf(axioms, ontology_iri)
    raise ValueError(
        f"dump_owl format {format!r}: expected 'ofn', 'owx' or 'rdf' "
        "(reference: src/py/mod.rs:464-511)")


def dump_owl(ontology: Ontology, file, format: str = "ofn") -> None:
    text = dumps_owl(ontology, format)
    if hasattr(file, "write"):
        file.write(text)
        return
    with open(file, "w") as fh:
        fh.write(text)
