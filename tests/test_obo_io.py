"""OBO Graph JSON / OWL sink / streaming frame source tests (reference
ops 4-6 and 3: src/py/mod.rs:110-134, 333-365, 389-422, 464-511)."""

import json

import pytest

from fastobo_py_ray.obo import loads
from fastobo_py_ray.obo.graphjson import (dump_graph, dumps_graph,
                                          load_graph, loads_graph)
from fastobo_py_ray.obo.owl import dumps_owl
from fastobo_py_ray.sources.obo_source import (read_obo_frames,
                                               read_obo_header, split_obo)
from fastobo_py_ray.testing.corpus import MINI_OBO

MS_OBO = "/root/reference/tests/data/ms.obo"


def test_graph_json_roundtrip():
    from fastobo_py_ray.obo import ids as obo_ids

    onto = loads(MINI_OBO).ontology
    doc = dumps_graph(onto)
    back = loads_graph(doc)
    # load_graph canonicalizes OBO-PURL URLs to CURIEs (src/py/id.rs:53-63
    # + OBO 1.4 §5.9), so compare compacted ids
    assert [f.id for f in back.frames] == \
        [obo_ids.compact(f.id) for f in onto.frames]
    by_id = back.frame_by_id()
    alpha = by_id["TST:0000001"]
    assert alpha.name == "alpha factor"
    syn = alpha.values("synonym")
    assert {(s["text"], s["scope"]) for s in syn} == \
        {("alpha", "EXACT"), ("a-factor", "RELATED")}
    # is_a and relationship edges survive
    assert back.frame_by_id()["TST:0000002"].values("relationship")[0][
        "target"] == "TST:0000003"
    assert alpha.values("is_a")[0]["value"] == "TST:0000002"
    # obsolete -> deprecated -> obsolete
    old = by_id["TST:0000010"]
    assert str(old.first("is_obsolete")["value"]).lower() == "true"


def test_graph_json_node_shape():
    onto = loads(MINI_OBO).ontology
    doc = json.loads(dumps_graph(onto))
    g = doc["graphs"][0]
    nodes = {n["id"]: n for n in g["nodes"]}
    assert nodes["part_of"]["type"] == "PROPERTY"
    assert nodes["TST:0000001"]["type"] == "CLASS"
    assert any(e == {"sub": "TST:0000001", "pred": "is_a",
                     "obj": "TST:0000002"} for e in g["edges"])


def test_graph_json_purl_compaction():
    doc = json.dumps({"graphs": [{"nodes": [
        {"id": "http://purl.obolibrary.org/obo/GO_0005575,",
         "type": "CLASS"},
        {"id": "http://purl.obolibrary.org/obo/GO_0008150",
         "lbl": "biological_process", "type": "CLASS"}],
        "edges": [{"sub": "http://purl.obolibrary.org/obo/GO_0008150",
                   "pred": "is_a",
                   "obj": "http://purl.obolibrary.org/obo/GO_0005575"}]}]})
    onto = loads_graph(doc)
    ids = [f.id for f in onto.frames]
    assert "GO:0008150" in ids
    f = onto.frame_by_id()["GO:0008150"]
    assert f.values("is_a")[0]["value"] == "GO:0005575"


def test_dump_graph_file(tmp_path):
    onto = loads(MINI_OBO).ontology
    p = tmp_path / "g.json"
    dump_graph(onto, str(p))
    assert load_graph(str(p)).frame_by_id()["TST:0000004"].name == \
        "beta factor"


def test_owl_ofn_sink():
    onto = loads(MINI_OBO).ontology
    owl = dumps_owl(onto)
    assert "Declaration(Class(<http://purl.obolibrary.org/obo/" \
        "TST_0000001>))" in owl
    assert "SubClassOf(<http://purl.obolibrary.org/obo/TST_0000001> " \
        "<http://purl.obolibrary.org/obo/TST_0000002>)" in owl
    assert 'AnnotationAssertion(rdfs:label <http://purl.obolibrary.org/' \
        'obo/TST_0000001> "alpha factor")' in owl
    assert "ObjectSomeValuesFrom" in owl        # relationship
    assert "TransitiveObjectProperty" in owl    # typedef flag
    with pytest.raises(NotImplementedError):
        dumps_owl(onto, format="owx")


def test_byte_exact_roundtrip_reference_corpora():
    """The reference's roundtrip discipline (str(doc) reproduces the OBO
    text, tests/common.py:157-159) holds BYTE-FOR-BYTE on both reference
    corpora: every non-blank line of ms.obo and plana.obo is reproduced
    at its position (incl. mid-token '!' names like X!Tandem and
    non-breaking spaces inside xref ids)."""
    from fastobo_py_ray.obo import dumps, load

    for path in (MS_OBO, "/root/reference/tests/data/plana.obo"):
        orig = [l for l in open(path).read().splitlines() if l.strip()]
        r = load(path)
        assert not r.errors
        ours = [l for l in dumps(r.ontology).splitlines() if l.strip()]
        assert ours == orig


def test_plana_golden_counts_and_macros():
    """plana.obo goldens (reference's second corpus): 577 frames (495 Term
    + 82 Typedef), ';'-separated multi-entry genus-differentia macro at
    header line 6, zero parse errors, table roundtrip."""
    from fastobo_py_ray.obo import dumps, load

    r = load("/root/reference/tests/data/plana.obo")
    assert not r.errors
    o = r.ontology
    assert len(o.frames) == 577
    assert sum(f.kind == "term" for f in o.frames) == 495
    assert sum(f.kind == "typedef" for f in o.frames) == 82
    assert o.header.treat_xrefs == [
        ("genus-differentia", "CARO", "part_of", "NCBITaxon:79327"),
        ("genus-differentia", "CL", "part_of", "NCBITaxon:79327")]
    origins = o.edges_table()["origin"].to_pylist()
    assert origins.count("relationship") == 1946
    assert origins.count("xref_macro") == 96
    rt = loads(dumps(o))
    assert not rt.errors
    assert o.terms_table().equals(rt.ontology.terms_table())
    assert rt.ontology.header.treat_xrefs == o.header.treat_xrefs


def test_split_obo_boundaries():
    header, frames = split_obo(MINI_OBO)
    assert "format-version: 1.4" in header
    assert len(frames) == 11  # 9 terms + 2 typedefs
    assert frames[0].startswith("[Term]")


def test_streaming_frame_source_golden_count(ray_session):
    """The MS_FRAMES=2941 golden-count discipline
    (/root/reference/tests/test_fastobo.py:10-139) through the parallel
    source."""
    header = read_obo_header(MS_OBO)
    assert header.format_version is not None
    ds = read_obo_frames(MS_OBO, num_blocks=8)
    df = ds.to_pandas().sort_values("doc_order").reset_index(drop=True)
    assert len(df) == 2941
    assert (df["kind"] == "term").sum() == 2936
    assert (df["kind"] == "typedef").sum() == 5
    assert int(df["n_parse_errors"].sum()) == 0
    # doc_order recovers exact document order (first frame of ms.obo)
    assert df.iloc[0]["term_id"] == "MS:0000000"
    # matches the driver-side whole-doc parse
    whole = loads(open(MS_OBO).read()).ontology
    assert df["term_id"].tolist() == [f.id for f in whole.frames]
