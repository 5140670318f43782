"""OBO Graph JSON (obographs) reader/writer.

Engine projection of ``fastobo.load_graph`` (``/root/reference/src/py/
mod.rs:333-365``) and ``fastobo.dump_graph`` (``:389-422``): the obographs
``{"graphs":[{"nodes":[...],"edges":[...]}]}`` document model mapped onto
our :class:`~fastobo_py_ray.obo.model.Ontology`.

Mapping (subset sufficient for roundtrip + obographs interop):

* node ``id`` — OBO PURL URLs are compacted to CURIEs
  (``fastobo.id`` semantics, ``src/py/id.rs:53-63`` + OBO 1.4 §5.9);
* node ``type`` CLASS -> term frame, PROPERTY -> typedef frame;
* ``lbl`` -> ``name:``; ``meta.definition`` -> ``def:`` (+xrefs);
* ``meta.synonyms[].pred`` hasExactSynonym/hasBroadSynonym/
  hasNarrowSynonym/hasRelatedSynonym -> synonym scopes
  (``src/py/syn.rs:68-82``);
* ``meta.deprecated`` -> ``is_obsolete: true``;
* ``meta.xrefs[].val`` -> ``xref:``;
* edge ``pred`` ``is_a`` -> ``is_a:`` clause; anything else ->
  ``relationship: <pred> <obj>``.

YAML input (the reference accepts it via serde-yaml) is parsed with a
try-import of PyYAML and raises ``NotImplementedError`` when absent —
JSON is the canonical interchange here.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

from . import ids as obo_ids
from .model import Frame, HeaderMeta, Ontology

_SYN_PRED_TO_SCOPE = {
    "hasExactSynonym": "EXACT",
    "hasBroadSynonym": "BROAD",
    "hasNarrowSynonym": "NARROW",
    "hasRelatedSynonym": "RELATED",
}
_SCOPE_TO_SYN_PRED = {v: k for k, v in _SYN_PRED_TO_SCOPE.items()}


def _compact(s: str) -> str:
    return obo_ids.compact(s)


def _node_to_frame(node: Dict[str, Any]) -> Optional[Frame]:
    nid = _compact(node.get("id", ""))
    if not nid:
        return None
    kind = "typedef" if node.get("type") == "PROPERTY" else "term"
    clauses: List[Dict[str, Any]] = []
    if node.get("lbl"):
        clauses.append({"tag": "name", "value": node["lbl"]})
    meta = node.get("meta") or {}
    d = meta.get("definition")
    if d and d.get("val") is not None:
        clauses.append({"tag": "def", "value": d["val"], "text": d["val"],
                        "xrefs": [_compact(x) for x in
                                  (d.get("xrefs") or [])]})
    for syn in meta.get("synonyms") or []:
        scope = _SYN_PRED_TO_SCOPE.get(syn.get("pred", ""), "RELATED")
        clauses.append({"tag": "synonym", "value": syn.get("val", ""),
                        "text": syn.get("val", ""), "scope": scope,
                        "type": syn.get("synonymType") or None,
                        "xrefs": [_compact(x) for x in
                                  (syn.get("xrefs") or [])]})
    for x in meta.get("xrefs") or []:
        xid = _compact(x.get("val", ""))
        if xid:
            clauses.append({"tag": "xref", "value": xid, "xref_id": xid,
                            "desc": None})
    if meta.get("deprecated"):
        clauses.append({"tag": "is_obsolete", "value": "true"})
    for pv in meta.get("basicPropertyValues") or []:
        clauses.append({"tag": "property_value",
                        "value": f"{_compact(pv.get('pred',''))} "
                                 f"{pv.get('val','')}",
                        "relation": _compact(pv.get("pred", "")),
                        "target": pv.get("val", "")})
    return Frame(kind=kind, id=nid, clauses=clauses)


def loads_graph(document: str) -> Ontology:
    """OBO Graph JSON string -> Ontology (mirrors fastobo.load_graph)."""
    doc = json.loads(document)
    graphs = doc.get("graphs") or []
    header = HeaderMeta()
    frames: List[Frame] = []
    by_id: Dict[str, Frame] = {}
    for g in graphs:
        if header.ontology is None and g.get("id"):
            # http://purl.obolibrary.org/obo/tst.owl -> tst
            oid = g["id"].rsplit("/", 1)[-1]
            header.ontology = oid[:-4] if oid.endswith(".owl") else oid
        for node in g.get("nodes") or []:
            f = _node_to_frame(node)
            if f is not None:
                frames.append(f)
                by_id[f.id] = f
        for e in g.get("edges") or []:
            s = _compact(e.get("sub", ""))
            p = e.get("pred", "")
            o = _compact(e.get("obj", ""))
            if not (s and p and o):
                continue
            f = by_id.get(s)
            if f is None:
                f = Frame(kind="term", id=s, clauses=[])
                frames.append(f)
                by_id[s] = f
            if p == "is_a":
                f.clauses.append({"tag": "is_a", "value": o})
            else:
                rel = _compact(p)
                f.clauses.append({"tag": "relationship",
                                  "value": f"{rel} {o}",
                                  "relation": rel, "target": o})
    return Ontology(header=header, frames=frames)


def load_graph(path_or_file) -> Ontology:
    """Path / file handle -> Ontology; `.yaml`/`.yml` requires PyYAML."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
        if isinstance(data, bytes):
            data = data.decode("utf-8")
        return loads_graph(data)
    path = str(path_or_file)
    with open(path, "rb") as fh:
        raw = fh.read().decode("utf-8")
    if path.endswith((".yaml", ".yml")):
        # PyYAML when available; otherwise the vendored block-YAML subset
        # parser (obograph YAML documents use only that subset) — parity
        # with the reference's native YAML support (src/py/mod.rs:300-301)
        try:
            import yaml
            return _from_obj(yaml.safe_load(raw))
        except ImportError:
            from . import miniyaml
            return _from_obj(miniyaml.safe_load(raw))
    return loads_graph(raw)


def _from_obj(doc) -> Ontology:
    return loads_graph(json.dumps(doc))


def _frame_to_node(f: Frame) -> Dict[str, Any]:
    meta: Dict[str, Any] = {}
    d = f.first("def")
    if d is not None:
        meta["definition"] = {"val": d.get("text", d["value"]),
                              "xrefs": d.get("xrefs", [])}
    syns = []
    for c in f.values("synonym"):
        syns.append({"pred": _SCOPE_TO_SYN_PRED.get(
            c.get("scope", "RELATED"), "hasRelatedSynonym"),
            "val": c.get("text", c["value"]),
            "xrefs": c.get("xrefs", [])})
    if syns:
        meta["synonyms"] = syns
    xrefs = [{"val": c.get("xref_id", c["value"])} for c in f.values("xref")]
    if xrefs:
        meta["xrefs"] = xrefs
    obs = f.first("is_obsolete")
    if obs and str(obs["value"]).lower() == "true":
        meta["deprecated"] = True
    pvs = [{"pred": c.get("relation", ""),
            "val": c.get("pv_value", c.get("target", ""))}
           for c in f.values("property_value")]
    if pvs:
        meta["basicPropertyValues"] = pvs
    node = {"id": f.id, "type": "PROPERTY" if f.kind == "typedef"
            else "CLASS"}
    if f.name:
        node["lbl"] = f.name
    if meta:
        node["meta"] = meta
    return node


def dumps_graph(ontology: Ontology) -> str:
    """Ontology -> OBO Graph JSON string (mirrors fastobo.dump_graph).

    Example (roundtrips through :func:`loads_graph`):
        >>> from .parser import loads
        >>> r = loads("format-version: 1.2\\n\\n"
        ...           "[Term]\\nid: MS:1\\nname: one\\nis_a: MS:2\\n\\n"
        ...           "[Term]\\nid: MS:2\\nname: two\\n")
        >>> back = loads_graph(dumps_graph(r.ontology))
        >>> [(f.id, f.name) for f in back.frames]
        [('MS:1', 'one'), ('MS:2', 'two')]
        >>> back.frames[0].first("is_a")["value"]
        'MS:2'
    """
    nodes = [_frame_to_node(f) for f in ontology.frames]
    edges = []
    for f in ontology.frames:
        for c in f.clauses:
            if c["tag"] == "is_a":
                edges.append({"sub": f.id, "pred": "is_a",
                              "obj": c["value"]})
            elif c["tag"] == "relationship":
                edges.append({"sub": f.id, "pred": c["relation"],
                              "obj": c["target"]})
    gid = ontology.header.ontology or "graph"
    return json.dumps({"graphs": [{
        "id": f"http://purl.obolibrary.org/obo/{gid}.owl",
        "nodes": nodes, "edges": edges}]}, indent=1, sort_keys=False)


def dump_graph(ontology: Ontology, file) -> None:
    text = dumps_graph(ontology)
    if hasattr(file, "write"):
        out = file.write(text)
        return
    with open(file, "w") as fh:
        fh.write(text)
