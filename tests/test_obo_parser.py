"""OBO parser golden counts + roundtrip, projected from the reference's
test discipline (/root/reference/tests/test_fastobo.py:10-139 golden counts,
tests/common.py:157-159 roundtrip equality)."""

import os

import pytest

from fastobo_py_ray.obo import dumps, load, loads

MS_OBO = "/root/reference/tests/data/ms.obo"
PLANA_OBO = "/root/reference/tests/data/plana.obo"
MS_FRAMES = 2941  # tests/test_fastobo.py:11
PLANA_FRAMES = 577

needs_ref = pytest.mark.skipif(not os.path.exists(MS_OBO),
                               reason="reference corpus not available")

MINI = """\
format-version: 1.4
data-version: 0.1.0
date: 05:12:2025 00:00
default-namespace: TST
idspace: MassBank http://www.massbank.jp/jsp/FwdRecord.jsp?id= "MassBank records"
synonymtypedef: abbrev "abbreviation" EXACT
treat-xrefs-as-equivalent: ALT
treat-xrefs-as-is_a: UP
treat-xrefs-as-relationship: REG regulates
ontology: tst

[Term]
id: TST:0000001
name: alpha factor
def: "A test factor." [PSI:MS]
synonym: "alpha" EXACT abbrev []
synonym: "a-factor" RELATED []
xref: ALT:9000001
is_a: TST:0000002 ! parent

[Term]
id: TST:0000002
name: parent thing
alt_id: TST:0009002
relationship: part_of TST:0000003 {source="ISBN:0321842685"}

[Term]
id: TST:0000010
name: old name
is_obsolete: true
replaced_by: TST:0000001

[Typedef]
id: part_of
name: part of
is_transitive: true
"""


@needs_ref
def test_ms_golden_counts():
    r = load(MS_OBO)
    assert not r.errors
    assert len(r.ontology.frames) == MS_FRAMES
    kinds = [f.kind for f in r.ontology.frames]
    assert kinds.count("term") == 2936 and kinds.count("typedef") == 5
    tags = [c["tag"] for f in r.ontology.frames for c in f.clauses]
    assert tags.count("is_a") == 2896
    assert tags.count("xref") == 1094
    assert tags.count("relationship") == 454
    assert tags.count("synonym") == 208


@needs_ref
def test_plana_golden_counts_and_macro_header():
    r = load(PLANA_OBO)
    assert not r.errors
    assert len(r.ontology.frames) == PLANA_FRAMES
    assert any(m[0] == "genus-differentia" for m in r.ontology.header.treat_xrefs)


@needs_ref
def test_ms_roundtrip_table_equality():
    r = load(MS_OBO)
    rt = loads(dumps(r.ontology))
    assert not rt.errors
    assert r.ontology.terms_table().equals(rt.ontology.terms_table())
    assert r.ontology.edges_table().equals(rt.ontology.edges_table())


def test_mini_fixture_structure():
    r = loads(MINI)
    assert not r.errors
    o = r.ontology
    assert len(o.frames) == 4
    assert o.header.idspaces == {
        "MassBank": "http://www.massbank.jp/jsp/FwdRecord.jsp?id="}
    assert o.header.synonym_typedefs == {"abbrev": ("abbreviation", "EXACT")}
    assert ("equivalent", "ALT", "", "") in o.header.treat_xrefs
    assert ("relationship", "REG", "regulates", "") in o.header.treat_xrefs
    t1 = o.frames[0]
    syns = t1.values("synonym")
    assert [(s["text"], s["scope"], s["type"]) for s in syns] == [
        ("alpha", "EXACT", "abbrev"), ("a-factor", "RELATED", None)]
    isa = t1.first("is_a")
    assert isa["value"] == "TST:0000002" and isa["comment"] == "parent"
    rel = o.frames[1].first("relationship")
    assert rel["relation"] == "part_of" and rel["target"] == "TST:0000003"
    assert rel["qualifiers"] == [("source", "ISBN:0321842685")]


def test_mini_roundtrip_byte_exact():
    r = loads(MINI)
    assert dumps(r.ontology) == MINI


def test_edges_and_equivalences():
    o = loads(MINI).ontology
    edges = o.edges_table().to_pylist()
    trip = {(e["subj"], e["pred"], e["obj"], e["origin"]) for e in edges}
    assert ("TST:0000001", "is_a", "TST:0000002", "is_a") in trip
    assert ("TST:0000002", "part_of", "TST:0000003", "relationship") in trip
    # alt_id / replaced_by / equivalent-xref feed union-find
    eq = set(map(tuple, o.equivalence_edges()))
    assert ("TST:0000002", "TST:0009002") in eq
    assert ("TST:0000010", "TST:0000001") in eq
    assert ("TST:0000001", "ALT:9000001") in eq


def test_error_taxonomy_codes():
    """Each reference error class (src/py/exceptions.rs:29-163 /
    src/error.rs:38-187) maps to a coded dead-letter row:
    PySyntaxError -> syntax, MissingClauseError -> missing_clause,
    DuplicateClausesError -> duplicate_clauses, SingleClauseError ->
    single_clause."""
    from fastobo_py_ray.obo.parser import (dead_letter_table, loads,
                                           validate_cardinality)

    doc = "\n".join([
        "format-version: 1.2",          # no ontology: -> missing_clause
        "not a clause line",            # -> syntax
        "",
        "[Term]",
        "id: T:1",
        "name: first",
        "name: second",                 # -> duplicate_clauses (name x2)
        "intersection_of: T:9",         # -> single_clause (only one)
        "",
        "[Term]",
        "id: T:2",
        "union_of: T:1",
        "union_of: T:3",                # two union_of entries: fine
    ])
    res = loads(doc, path="mini.obo")
    syntax = [e for e in res.errors]
    assert [e.error_code for e in syntax] == ["syntax"]
    assert "tag: value" in syntax[0].message
    assert (syntax[0].line_no, syntax[0].col) == (2, 1)

    # column points at the offending token (path+line+col parity with
    # the reference SyntaxError, src/error.rs:38-60)
    res2 = loads("format-version: 1.2\n   bad indented line\n",
                 path="c.obo")
    assert [(e.line_no, e.col) for e in res2.errors] == [(2, 4)]
    res3 = loads("format-version: 1.2\n  [Oddity]\nx: y\n", path="c.obo")
    assert [(e.line_no, e.col, e.error_code) for e in res3.errors] == \
        [(2, 3, "syntax")]

    card = validate_cardinality(res.ontology, path="mini.obo")
    codes = sorted((e.error_code, e.line) for e in card)
    assert codes == [("duplicate_clauses", "T:1"),
                     ("missing_clause", "header"),
                     ("single_clause", "T:1")]

    t = dead_letter_table(res.errors + card)
    assert t.column_names == ["path", "line_no", "col", "line", "message",
                              "error_code"]
    assert t.num_rows == 4
    assert set(t["error_code"].to_pylist()) == {
        "syntax", "missing_clause", "duplicate_clauses", "single_clause"}


def test_reference_corpora_pass_cardinality_validation():
    """ms.obo parses with zero cardinality violations (parity: the
    reference loads it without raising)."""
    from fastobo_py_ray.obo.parser import load, validate_cardinality

    res = load("/root/reference/tests/data/ms.obo")
    assert res.errors == []
    assert validate_cardinality(res.ontology) == []


def test_qa_scan_ms_obo_grep_goldens():
    """QA scans value-checked against independent grep-derived counts on
    the reference's ms.obo corpus (2936 terms: 282 obsolete, 275 of
    them without replaced_by/consider, 20 without a def)."""
    from fastobo_py_ray.obo import load
    from fastobo_py_ray.pipelines.queries import qa_scan

    df = qa_scan(load("/root/reference/tests/data/ms.obo").ontology)
    assert len(df) == 2936
    assert int(df["obsolete_without_replacement"].sum()) == 275
    assert int(df["missing_def"].sum()) == 20
