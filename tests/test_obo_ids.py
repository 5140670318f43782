"""Identifier semantics vs the reference doctests.

Mirrors /root/reference/src/py/id.rs:45-93 (parse/is_valid) and
/root/reference/src/py/doc.rs:219-285 (compact_ids/decompact_ids doctests).
"""

from fastobo_py_ray.obo import ids


def test_parse_three_way_dispatch():
    assert ids.parse("MS:1000031")[0] == ids.KIND_PREFIXED
    assert ids.parse("MS:1000031")[1:] == ("MS", "1000031")
    assert ids.parse("part_of")[0] == ids.KIND_UNPREFIXED
    assert ids.parse("http://purl.obolibrary.org/obo/MS_1000031")[0] == ids.KIND_URL
    # escaped colon stays unprefixed-ish local (escape semantics id.rs:487-497)
    kind, prefix, local = ids.parse("value-type:xsd\\:string")
    assert (kind, prefix, local) == (ids.KIND_PREFIXED, "value-type", "xsd:string")


def test_is_valid():
    assert ids.is_valid("MS:1000031")
    assert ids.is_valid("part_of")
    assert ids.is_valid("http://purl.obolibrary.org/obo/MS_1000031")
    assert not ids.is_valid("definitely not an identifier")
    assert not ids.is_valid("")
    assert ids.is_valid("has\\ space")


def test_compact_decompact_purl_default():
    # doctest at src/py/doc.rs:219-248: CHEBI purl <-> CHEBI:27958
    url = "http://purl.obolibrary.org/obo/CHEBI_27958"
    assert ids.compact(url) == "CHEBI:27958"
    assert ids.decompact("CHEBI:27958") == url
    # idempotence
    assert ids.compact(ids.compact(url)) == "CHEBI:27958"
    assert ids.decompact(ids.decompact("CHEBI:27958")) == url


def test_compact_header_idspace():
    spaces = {"MassBank": "http://www.massbank.jp/jsp/FwdRecord.jsp?id="}
    url = "http://www.massbank.jp/jsp/FwdRecord.jsp?id=EA281701"
    assert ids.compact(url, spaces) == "MassBank:EA281701"
    assert ids.decompact("MassBank:EA281701", spaces) == url


def test_unprefixed_passthrough():
    assert ids.compact("part_of") == "part_of"
    assert ids.decompact("part_of") == "part_of"


def test_ordering_matches_prefix_local_tuples():
    # src/py/id.rs:308-335 — lexicographic on (prefix, local)
    samples = ["MS:1000031", "MS:1000001", "A:z", "AB:x", "PSI:MS"]
    by_key = sorted(samples, key=ids.sort_key)
    by_tuple = sorted(samples, key=lambda s: (ids.parse(s)[1], ids.parse(s)[2]))
    assert by_key == by_tuple
