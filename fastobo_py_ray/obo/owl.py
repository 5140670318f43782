"""OWL sink — engine projection of ``fastobo.dump_owl``
(``/root/reference/src/py/mod.rs:464-511``).

The reference converts through horned-owl with formats ofn/owx/rdf; here
the OWL *Functional-Style Syntax* (``format="ofn"``) emitter is
implemented natively (deterministic, line-per-axiom), while ``owx`` and
``rdf`` raise ``NotImplementedError`` (they need an XML/RDF stack that
adds nothing to the engine's Ray-side value).

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

from . import ids as obo_ids
from .model import Frame, Ontology

_PREFIXES = (
    'Prefix(:=<http://purl.obolibrary.org/obo/>)\n'
    'Prefix(owl:=<http://www.w3.org/2002/07/owl#>)\n'
    'Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)\n'
    'Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)\n'
)


def _iri(ident: str) -> str:
    url = obo_ids.decompact(ident)
    if "://" in url:
        return f"<{url}>"
    # unprefixed relation idents (part_of) live in the ontology's namespace
    return f"<http://purl.obolibrary.org/obo/{url}>"


def _lit(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _frame_axioms(f: Frame) -> list:
    iri = _iri(f.id)
    cls = f.kind != "typedef"
    out = [f"Declaration({'Class' if cls else 'ObjectProperty'}({iri}))"]
    if f.name:
        out.append("AnnotationAssertion(rdfs:label "
                   f"{iri} {_lit(f.name)})")
    d = f.first("def")
    if d is not None:
        out.append("AnnotationAssertion(<http://purl.obolibrary.org/obo/"
                   f"IAO_0000115> {iri} {_lit(d.get('text', d['value']))})")
    obs = f.first("is_obsolete")
    if obs and str(obs["value"]).lower() == "true":
        out.append(f"AnnotationAssertion(owl:deprecated {iri} "
                   '"true"^^xsd:boolean)')
    for c in f.clauses:
        if c["tag"] == "is_a":
            ax = "SubClassOf" if cls else "SubObjectPropertyOf"
            out.append(f"{ax}({iri} {_iri(c['value'])})")
        elif c["tag"] == "relationship" and cls:
            out.append(f"SubClassOf({iri} ObjectSomeValuesFrom("
                       f"{_iri(c['relation'])} {_iri(c['target'])}))")
        elif c["tag"] == "is_transitive" and not cls \
                and str(c["value"]).lower() == "true":
            out.append(f"TransitiveObjectProperty({iri})")
    return out


def dumps_owl(ontology: Ontology, format: str = "ofn") -> str:
    """Ontology -> OWL text; only functional syntax is implemented."""
    if format != "ofn":
        raise NotImplementedError(
            f"dump_owl format {format!r}: only 'ofn' (functional syntax) "
            "is implemented; 'owx'/'rdf' need an XML/RDF stack "
            "(reference: src/py/mod.rs:464-511)")
    oid = ontology.header.ontology or "ontology"
    lines = [_PREFIXES,
             f"Ontology(<http://purl.obolibrary.org/obo/{oid}.owl>"]
    for f in ontology.frames:
        lines.extend(_frame_axioms(f))
    lines.append(")")
    return "\n".join(lines) + "\n"


def dump_owl(ontology: Ontology, file, format: str = "ofn") -> None:
    text = dumps_owl(ontology, format)
    if hasattr(file, "write"):
        file.write(text)
        return
    with open(file, "w") as fh:
        fh.write(text)
