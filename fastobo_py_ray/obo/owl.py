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
* ``is_obsolete: true`` -> ``AnnotationAssertion(owl:deprecated ...)``;
* ``synonym: "t" SCOPE`` -> ``AnnotationAssertion(oboInOwl:has*Synonym)``
  (scope-specific property, ``src/py/syn.rs:68-82`` scopes);
* ``xref:`` / ``alt_id:`` -> ``AnnotationAssertion(oboInOwl:hasDbXref /
  :hasAlternativeId)``;
* typedef algebra (``src/py/typedef/clause.rs:1373-1901``):
  ``is_transitive/symmetric/asymmetric/reflexive/functional/
  inverse_functional`` -> the matching ``*ObjectProperty`` axiom;
  ``inverse_of`` (``:2280``) -> ``InverseObjectProperties``;
  ``holds_over_chain`` (``:1285``) / ``transitive_over`` (``:2356``) ->
  ``SubObjectPropertyOf(ObjectPropertyChain(..) P)``;
  ``domain``/``range`` (``:1066``/``:1142``) ->
  ``ObjectPropertyDomain/Range``;
* class expressions (``src/py/term/clause.rs:1166-1404``):
  >=2 ``intersection_of`` -> ``EquivalentClasses(C
  ObjectIntersectionOf(genus, ObjectSomeValuesFrom(diff)...))``
  (genus-differentia); >=2 ``union_of`` -> ``EquivalentClasses(C
  ObjectUnionOf(..))``; ``equivalent_to`` -> ``EquivalentClasses``;
  ``disjoint_from`` -> ``DisjointClasses``.
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

# structured axiom kinds (shared by the ofn/owx/rdf renderers); every
# axiom is a flat hashable tuple so format-equivalence tests can compare
# multisets:
#   ("decl",     is_class, iri)
#   ("ann",      prop_iri, iri, literal, datatype_iri_or_None)
#   ("sub",      is_class, iri, parent_iri)
#   ("svf",      iri, relation_iri, target_iri)
#   ("char",     name, iri)            property characteristic; name in
#                                      _CHAR_TAGS.values()
#   ("inverse",  iri, other_iri)       InverseObjectProperties
#   ("domain",   iri, class_iri)       ObjectPropertyDomain
#   ("range",    iri, class_iri)       ObjectPropertyRange
#   ("chain",    iri, (p1, p2, ...))   SubObjectPropertyOf(
#                                        ObjectPropertyChain(p1 p2 ..) iri)
#   ("equiv",    iri, other_iri)       EquivalentClasses (two named)
#   ("disjoint", iri, other_iri)       DisjointClasses
#   ("nary",     op, iri, (operand, ...))  EquivalentClasses(iri
#                                      ObjectIntersectionOf/UnionOf(..));
#                op in {"intersection", "union"}; operand is
#                ("cls", iri) or ("svf", rel_iri, target_iri)
Axiom = Tuple

_CHAR_TAGS = {
    "is_transitive": "transitive",
    "is_symmetric": "symmetric",
    "is_asymmetric": "asymmetric",
    "is_reflexive": "reflexive",
    "is_functional": "functional",
    "is_inverse_functional": "inverse_functional",
}
# OWL names per characteristic (ofn operator / owx element = this name;
# rdf type = owl:<this name minus 'Object'> per the OWL 2 RDF mapping)
_CHAR_OFN = {
    "transitive": "TransitiveObjectProperty",
    "symmetric": "SymmetricObjectProperty",
    "asymmetric": "AsymmetricObjectProperty",
    "reflexive": "ReflexiveObjectProperty",
    "functional": "FunctionalObjectProperty",
    "inverse_functional": "InverseFunctionalObjectProperty",
}

_OBOINOWL = "http://www.geneontology.org/formats/oboInOwl#"
_SYN_PROPS = {
    "EXACT": _OBOINOWL + "hasExactSynonym",
    "BROAD": _OBOINOWL + "hasBroadSynonym",
    "NARROW": _OBOINOWL + "hasNarrowSynonym",
    "RELATED": _OBOINOWL + "hasRelatedSynonym",
}
_HAS_DBXREF = _OBOINOWL + "hasDbXref"
_HAS_ALT_ID = _OBOINOWL + "hasAlternativeId"


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
    inter_ops: List[Tuple] = []
    union_ops: List[Tuple] = []
    for c in f.clauses:
        tag = c["tag"]
        if tag == "is_a":
            out.append(("sub", cls, iri, _iri(c["value"])))
        elif tag == "relationship" and cls and "relation" in c:
            out.append(("svf", iri, _iri(c["relation"]),
                        _iri(c["target"])))
        elif tag == "synonym":
            out.append(("ann",
                        _SYN_PROPS.get(c.get("scope") or "RELATED",
                                       _SYN_PROPS["RELATED"]),
                        iri, c.get("text", c["value"]), None))
        elif tag == "xref":
            out.append(("ann", _HAS_DBXREF, iri,
                        c.get("xref_id", c["value"]), None))
        elif tag == "alt_id":
            out.append(("ann", _HAS_ALT_ID, iri, c["value"], None))
        elif tag in _CHAR_TAGS and not cls \
                and str(c["value"]).lower() == "true":
            out.append(("char", _CHAR_TAGS[tag], iri))
        elif tag == "inverse_of" and not cls:
            out.append(("inverse", iri, _iri(c["value"])))
        elif tag == "domain" and not cls:
            out.append(("domain", iri, _iri(c["value"])))
        elif tag == "range" and not cls:
            out.append(("range", iri, _iri(c["value"])))
        elif tag == "holds_over_chain" and not cls \
                and len(c.get("chain", ())) >= 2:
            out.append(("chain", iri,
                        tuple(_iri(p) for p in c["chain"])))
        elif tag == "transitive_over" and not cls:
            # P o R -> P (src/py/typedef/clause.rs:2356 semantics)
            out.append(("chain", iri, (iri, _iri(c["value"]))))
        elif tag == "intersection_of" and cls:
            if c.get("relation"):
                inter_ops.append(("svf", _iri(c["relation"]),
                                  _iri(c["target"])))
            else:
                inter_ops.append(("cls", _iri(c.get("target",
                                                    c["value"]))))
        elif tag == "union_of" and cls:
            union_ops.append(("cls", _iri(c["value"])))
        elif tag == "equivalent_to" and cls:
            out.append(("equiv", iri, _iri(c["value"])))
        elif tag == "disjoint_from" and cls:
            out.append(("disjoint", iri, _iri(c["value"])))
    # OBO 1.4 cardinality: a lone intersection_of/union_of clause is
    # invalid (SingleClauseError in the reference) — no axiom emitted
    if len(inter_ops) >= 2:
        out.append(("nary", "intersection", iri, tuple(inter_ops)))
    if len(union_ops) >= 2:
        out.append(("nary", "union", iri, tuple(union_ops)))
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
    if kind == "char":
        _, name, iri = ax
        return f"{_CHAR_OFN[name]}(<{iri}>)"
    if kind == "inverse":
        return f"InverseObjectProperties(<{ax[1]}> <{ax[2]}>)"
    if kind == "domain":
        return f"ObjectPropertyDomain(<{ax[1]}> <{ax[2]}>)"
    if kind == "range":
        return f"ObjectPropertyRange(<{ax[1]}> <{ax[2]}>)"
    if kind == "chain":
        _, iri, props = ax
        inner = " ".join(f"<{p}>" for p in props)
        return (f"SubObjectPropertyOf(ObjectPropertyChain({inner}) "
                f"<{iri}>)")
    if kind == "equiv":
        return f"EquivalentClasses(<{ax[1]}> <{ax[2]}>)"
    if kind == "disjoint":
        return f"DisjointClasses(<{ax[1]}> <{ax[2]}>)"
    if kind == "nary":
        _, op, iri, ops = ax
        name = ("ObjectIntersectionOf" if op == "intersection"
                else "ObjectUnionOf")
        inner = " ".join(
            f"<{o[1]}>" if o[0] == "cls"
            else f"ObjectSomeValuesFrom(<{o[1]}> <{o[2]}>)" for o in ops)
        return f"EquivalentClasses(<{iri}> {name}({inner}))"
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
        elif kind == "char":
            entity(sub(root, _CHAR_OFN[ax[1]]), False, ax[2])
        elif kind == "inverse":
            e = sub(root, "InverseObjectProperties")
            entity(e, False, ax[1])
            entity(e, False, ax[2])
        elif kind in ("domain", "range"):
            e = sub(root, "ObjectPropertyDomain" if kind == "domain"
                    else "ObjectPropertyRange")
            entity(e, False, ax[1])
            entity(e, True, ax[2])
        elif kind == "chain":
            _, iri, props = ax
            e = sub(root, "SubObjectPropertyOf")
            ch = sub(e, "ObjectPropertyChain")
            for p in props:
                entity(ch, False, p)
            entity(e, False, iri)
        elif kind in ("equiv", "disjoint"):
            e = sub(root, "EquivalentClasses" if kind == "equiv"
                    else "DisjointClasses")
            entity(e, True, ax[1])
            entity(e, True, ax[2])
        elif kind == "nary":
            _, op, iri, ops = ax
            e = sub(root, "EquivalentClasses")
            entity(e, True, iri)
            box = sub(e, "ObjectIntersectionOf" if op == "intersection"
                      else "ObjectUnionOf")
            for o in ops:
                if o[0] == "cls":
                    entity(box, True, o[1])
                else:
                    svf = sub(box, "ObjectSomeValuesFrom")
                    entity(svf, False, o[1])
                    entity(svf, True, o[2])
        else:
            raise ValueError(f"unknown axiom kind {kind!r}")

    ET.indent(root)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            + ET.tostring(root, encoding="unicode") + "\n")


_OWX_CHAR_TAGS = {v: k for k, v in _CHAR_OFN.items()}


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
            if kids[0][0] == "ObjectPropertyChain":
                props = tuple(k.get("IRI") for k in kids[0][1])
                out.append(("chain", kids[1][1].get("IRI"), props))
            elif len(kids) == 2 and kids[1][0] == "ObjectSomeValuesFrom":
                svf = [(strip(k.tag), k) for k in kids[1][1]]
                out.append(("svf", kids[0][1].get("IRI"),
                            svf[0][1].get("IRI"), svf[1][1].get("IRI")))
            else:
                out.append(("sub", tag == "SubClassOf",
                            kids[0][1].get("IRI"), kids[1][1].get("IRI")))
        elif tag in _OWX_CHAR_TAGS:
            out.append(("char", _OWX_CHAR_TAGS[tag], kids[0][1].get("IRI")))
        elif tag == "InverseObjectProperties":
            out.append(("inverse", kids[0][1].get("IRI"),
                        kids[1][1].get("IRI")))
        elif tag in ("ObjectPropertyDomain", "ObjectPropertyRange"):
            out.append(("domain" if tag.endswith("Domain") else "range",
                        kids[0][1].get("IRI"), kids[1][1].get("IRI")))
        elif tag in ("EquivalentClasses", "DisjointClasses"):
            if len(kids) == 2 and kids[1][0] in ("ObjectIntersectionOf",
                                                 "ObjectUnionOf"):
                op = ("intersection" if kids[1][0].endswith(
                    "IntersectionOf") else "union")
                ops = []
                for k in kids[1][1]:
                    ktag = strip(k.tag)
                    if ktag == "Class":
                        ops.append(("cls", k.get("IRI")))
                    else:  # ObjectSomeValuesFrom
                        inner = list(k)
                        ops.append(("svf", inner[0].get("IRI"),
                                    inner[1].get("IRI")))
                out.append(("nary", op, kids[0][1].get("IRI"),
                            tuple(ops)))
            else:
                out.append(("equiv" if tag == "EquivalentClasses"
                            else "disjoint",
                            kids[0][1].get("IRI"), kids[1][1].get("IRI")))
    return out


def _ofn_tokens(text: str):
    """Tokenize OWL functional-syntax text: call openers ``Name(``,
    closers ``)``, IRI refs ``<...>``, string literals with ``\\``/
    ``\"`` escapes and an optional ``^^datatype`` suffix, and prefixed
    names.  ``=`` (inside Prefix declarations) is trivia."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n=":
            i += 1
            continue
        if c == "<":
            j = text.index(">", i)
            yield ("iri", text[i + 1:j])
            i = j + 1
            continue
        if c == '"':
            j, buf = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\":
                    if j + 1 >= n:      # escape at end-of-document
                        raise ValueError(
                            "ofn: unterminated string literal")
                    buf.append(text[j + 1])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ValueError("ofn: unterminated string literal")
            i = j + 1
            dtype = None
            if text[i:i + 2] == "^^":
                i += 2
                if i < n and text[i] == "<":
                    j = text.index(">", i)
                    dtype = text[i + 1:j]
                    i = j + 1
                else:
                    j = i
                    while j < n and (text[j].isalnum()
                                     or text[j] in ":_-."):
                        j += 1
                    dtype = text[i:j]
                    i = j
            yield ("lit", ("".join(buf), dtype))
            continue
        if c == ")":
            yield ("close", None)
            i += 1
            continue
        j = i
        while j < n and (text[j].isalnum() or text[j] in ":_-."):
            j += 1
        if j == i:
            raise ValueError(f"ofn: unexpected byte {text[i:i + 1]!r} "
                             f"at offset {i}")
        word = text[i:j]
        if j < n and text[j] == "(":
            yield ("open", word)
            i = j + 1
        else:
            yield ("pname", word)
            i = j


# prefixed-name -> full IRI for the handful of pnames the renderer emits
_OFN_PNAMES = {
    "rdfs:label": _RDFS_LABEL,
    "owl:deprecated": _OWL_DEPRECATED,
    "xsd:boolean": _XSD_BOOLEAN,
}
_OFN_CHAR_NAMES = {v: k for k, v in _CHAR_OFN.items()}


def _ofn_iri(node) -> str:
    if node[0] == "iri":
        return node[1]
    raise ValueError(f"ofn: expected an IRI, got {node!r}")


def parse_ofn_axioms(text: str) -> List[Axiom]:
    """Re-parse an OWL functional-syntax document back into structured
    axioms — the third leg of the ofn/owx/rdf equivalence fixpoint
    (the reference dumps but never reads ofn, ``src/py/mod.rs:464``;
    this parser closes OUR roundtrip test through all three formats).
    Recursive-descent over :func:`_ofn_tokens`; ``Prefix``/``Ontology``
    wrappers are structural, every nested call becomes a node."""
    # build the node forest: ("call", name, children) | leaf tokens
    stack: List = [("call", "<root>", [])]
    for t, v in _ofn_tokens(text):
        if t == "open":
            stack.append(("call", v, []))
        elif t == "close":
            node = stack.pop()
            if not stack:
                raise ValueError("ofn: unbalanced ')'")
            stack[-1][2].append(node)
        else:
            stack[-1][2].append((t, v))
    if len(stack) != 1:
        raise ValueError("ofn: unbalanced '('")

    def ann_prop(node) -> str:
        if node[0] == "iri":
            return node[1]
        if node[0] == "pname" and node[1] in _OFN_PNAMES:
            return _OFN_PNAMES[node[1]]
        raise ValueError(f"ofn: unknown annotation property {node!r}")

    out: List[Axiom] = []

    def convert(node) -> None:
        kind, name, kids = node
        if name == "Prefix":
            return
        if name == "Ontology":
            for k in kids[1:]:           # kids[0] is the ontology IRI
                convert(k)
            return
        if name == "Declaration":
            _, dname, dkids = kids[0]
            out.append(("decl", dname == "Class", _ofn_iri(dkids[0])))
        elif name == "AnnotationAssertion":
            prop = ann_prop(kids[0])
            iri = _ofn_iri(kids[1])
            lit, dtype = kids[2][1]
            out.append(("ann", prop, iri, lit,
                        _OFN_PNAMES.get(dtype, dtype)))
        elif name in ("SubClassOf", "SubObjectPropertyOf"):
            if kids[0][0] == "call" and kids[0][1] == "ObjectPropertyChain":
                props = tuple(_ofn_iri(k) for k in kids[0][2])
                out.append(("chain", _ofn_iri(kids[1]), props))
            elif kids[1][0] == "call" and \
                    kids[1][1] == "ObjectSomeValuesFrom":
                svf = kids[1][2]
                out.append(("svf", _ofn_iri(kids[0]),
                            _ofn_iri(svf[0]), _ofn_iri(svf[1])))
            else:
                out.append(("sub", name == "SubClassOf",
                            _ofn_iri(kids[0]), _ofn_iri(kids[1])))
        elif name in _OFN_CHAR_NAMES:
            out.append(("char", _OFN_CHAR_NAMES[name],
                        _ofn_iri(kids[0])))
        elif name == "InverseObjectProperties":
            out.append(("inverse", _ofn_iri(kids[0]), _ofn_iri(kids[1])))
        elif name in ("ObjectPropertyDomain", "ObjectPropertyRange"):
            out.append(("domain" if name.endswith("Domain") else "range",
                        _ofn_iri(kids[0]), _ofn_iri(kids[1])))
        elif name in ("EquivalentClasses", "DisjointClasses"):
            if kids[1][0] == "call" and kids[1][1] in (
                    "ObjectIntersectionOf", "ObjectUnionOf"):
                op = ("intersection" if kids[1][1].endswith(
                    "IntersectionOf") else "union")
                ops = []
                for k in kids[1][2]:
                    if k[0] == "iri":
                        ops.append(("cls", k[1]))
                    elif k[0] == "call" and k[1] == "ObjectSomeValuesFrom":
                        ops.append(("svf", _ofn_iri(k[2][0]),
                                    _ofn_iri(k[2][1])))
                    else:
                        raise ValueError(
                            f"ofn: unexpected {k!r} in {kids[1][1]}")
                out.append(("nary", op, _ofn_iri(kids[0]), tuple(ops)))
            else:
                out.append(("equiv" if name == "EquivalentClasses"
                            else "disjoint",
                            _ofn_iri(kids[0]), _ofn_iri(kids[1])))
        else:
            raise ValueError(f"ofn: unsupported axiom {name!r}")

    for node in stack[0][2]:
        if node[0] == "call":
            convert(node)
    return out


# --------------------------------------------------------------------------
# rdf (RDF/XML, OWL 2 RDF mapping, stdlib ElementTree)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
# OWL 2 RDF mapping: property characteristic -> rdf:type object
_CHAR_RDF = {
    "transitive": _OWL_NS + "TransitiveProperty",
    "symmetric": _OWL_NS + "SymmetricProperty",
    "asymmetric": _OWL_NS + "AsymmetricProperty",
    "reflexive": _OWL_NS + "ReflexiveProperty",
    "functional": _OWL_NS + "FunctionalProperty",
    "inverse_functional": _OWL_NS + "InverseFunctionalProperty",
}
_RDF_CHAR = {v: k for k, v in _CHAR_RDF.items()}
# axiom kind -> index of its subject IRI in the tuple (default 1)
_SUBJ_POS = {"ann": 2, "sub": 2, "nary": 2, "char": 2}


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
                    ("owl", _OWL_NS), ("oboInOwl", _OBOINOWL),
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
        iri = ax[_SUBJ_POS.get(ax[0], 1)]
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
            elif ax[0] == "char":
                ET.SubElement(node, f"{{{_RDF_NS}}}type",
                              {f"{{{_RDF_NS}}}resource": _CHAR_RDF[ax[1]]})
            elif ax[0] == "inverse":
                ET.SubElement(node, f"{{{_OWL_NS}}}inverseOf",
                              {f"{{{_RDF_NS}}}resource": ax[2]})
            elif ax[0] in ("domain", "range"):
                ET.SubElement(node, f"{{{_RDFS_NS}}}{ax[0]}",
                              {f"{{{_RDF_NS}}}resource": ax[2]})
            elif ax[0] == "chain":
                ch = ET.SubElement(
                    node, f"{{{_OWL_NS}}}propertyChainAxiom",
                    {f"{{{_RDF_NS}}}parseType": "Collection"})
                for p in ax[2]:
                    ET.SubElement(ch, f"{{{_RDF_NS}}}Description",
                                  {f"{{{_RDF_NS}}}about": p})
            elif ax[0] == "equiv":
                ET.SubElement(node, f"{{{_OWL_NS}}}equivalentClass",
                              {f"{{{_RDF_NS}}}resource": ax[2]})
            elif ax[0] == "disjoint":
                ET.SubElement(node, f"{{{_OWL_NS}}}disjointWith",
                              {f"{{{_RDF_NS}}}resource": ax[2]})
            elif ax[0] == "nary":
                _, op, _iri_, ops = ax
                eq = ET.SubElement(node,
                                   f"{{{_OWL_NS}}}equivalentClass")
                box = ET.SubElement(eq, f"{{{_OWL_NS}}}Class")
                coll = ET.SubElement(
                    box,
                    f"{{{_OWL_NS}}}"
                    + ("intersectionOf" if op == "intersection"
                       else "unionOf"),
                    {f"{{{_RDF_NS}}}parseType": "Collection"})
                for o in ops:
                    if o[0] == "cls":
                        ET.SubElement(coll,
                                      f"{{{_RDF_NS}}}Description",
                                      {f"{{{_RDF_NS}}}about": o[1]})
                    else:
                        r = ET.SubElement(coll,
                                          f"{{{_OWL_NS}}}Restriction")
                        ET.SubElement(
                            r, f"{{{_OWL_NS}}}onProperty",
                            {f"{{{_RDF_NS}}}resource": o[1]})
                        ET.SubElement(
                            r, f"{{{_OWL_NS}}}someValuesFrom",
                            {f"{{{_RDF_NS}}}resource": o[2]})

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
        def _restriction(r):
            rel = r.find(f"{{{_OWL_NS}}}onProperty") \
                .get(f"{{{_RDF_NS}}}resource")
            tgt = r.find(f"{{{_OWL_NS}}}someValuesFrom") \
                .get(f"{{{_RDF_NS}}}resource")
            return rel, tgt

        for child in node:
            res = child.get(f"{{{_RDF_NS}}}resource")
            if child.tag == f"{{{_RDFS_NS}}}subClassOf" or \
                    child.tag == f"{{{_RDFS_NS}}}subPropertyOf":
                if res is not None:
                    out.append(("sub", cls, iri, res))
                else:  # nested owl:Restriction = existential
                    out.append(("svf", iri) + _restriction(child[0]))
            elif child.tag == f"{{{_RDF_NS}}}type":
                name = _RDF_CHAR.get(res)
                if name is not None:
                    out.append(("char", name, iri))
            elif child.tag == f"{{{_OWL_NS}}}inverseOf":
                out.append(("inverse", iri, res))
            elif child.tag in (f"{{{_RDFS_NS}}}domain",
                               f"{{{_RDFS_NS}}}range"):
                kind = "domain" if child.tag.endswith("domain") else "range"
                out.append((kind, iri, res))
            elif child.tag == f"{{{_OWL_NS}}}propertyChainAxiom":
                props = tuple(d.get(f"{{{_RDF_NS}}}about") for d in child)
                out.append(("chain", iri, props))
            elif child.tag == f"{{{_OWL_NS}}}equivalentClass":
                if res is not None:
                    out.append(("equiv", iri, res))
                else:  # nested owl:Class with an n-ary set operation
                    box = child.find(f"{{{_OWL_NS}}}Class")
                    coll = box[0]
                    op = ("intersection" if coll.tag.endswith(
                        "intersectionOf") else "union")
                    ops = []
                    for o in coll:
                        if o.tag == f"{{{_OWL_NS}}}Restriction":
                            ops.append(("svf",) + _restriction(o))
                        else:
                            ops.append(("cls",
                                        o.get(f"{{{_RDF_NS}}}about")))
                    out.append(("nary", op, iri, tuple(ops)))
            elif child.tag == f"{{{_OWL_NS}}}disjointWith":
                out.append(("disjoint", iri, res))
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
