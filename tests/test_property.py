"""Property-based tests (hypothesis) for identifier semantics and OBO
roundtrips — goes beyond the reference's example-based suite (it has no
property tests) while pinning the same invariants (escape semantics
src/py/id.rs:487-497, compact/decompact inverse src/py/doc.rs:219-285,
serializer/parser roundtrip tests/common.py:157-159)."""

import string

from hypothesis import given, settings

settings.register_profile("ci", deadline=None)
settings.load_profile("ci")
from hypothesis import strategies as st

from fastobo_py_ray.obo import ids, loads, dumps
from fastobo_py_ray.obo.serializer import clause_to_line

_IDCHARS = string.ascii_letters + string.digits + "_-."
prefixes = st.text(alphabet=_IDCHARS, min_size=1, max_size=12)
# locals may contain characters that need escaping
locals_ = st.text(alphabet=_IDCHARS + ' :,"\\()[]{}', min_size=1,
                  max_size=16)


@given(locals_)
def test_escape_unescape_roundtrip(s):
    assert ids.unescape(ids.escape_local(s)) == s


@given(prefixes, locals_)
def test_prefixed_parse_canonical_roundtrip(prefix, local):
    ident = f"{prefix}:{ids.escape_local(local)}"
    kind, p, l = ids.parse(ident)
    assert (kind, p, l) == (ids.KIND_PREFIXED, prefix, local)
    # canonical form re-parses to the same (prefix, local)
    canon = ids.canonical(ident)
    assert ids.parse(canon)[1:] == (prefix, local)
    # canonical is a fixpoint
    assert ids.canonical(canon) == canon


# OBO PURL idspaces: letter-initial, no underscore (the underscore is the
# PREFIX_LOCAL separator in purl.obolibrary.org URLs)
purl_prefixes = st.builds(
    lambda h, t: h + t,
    st.sampled_from(string.ascii_letters),
    st.text(alphabet=string.ascii_letters + string.digits + ".-",
            max_size=11))


@given(purl_prefixes, st.text(alphabet=string.ascii_letters + string.digits,
                              min_size=1, max_size=12))
def test_compact_decompact_inverse_purl(prefix, local):
    url = f"http://purl.obolibrary.org/obo/{prefix}_{local}"
    curie = ids.compact(url)
    assert curie == f"{prefix}:{local}"
    assert ids.decompact(curie) == url
    assert ids.compact(curie) == curie          # idempotent
    assert ids.decompact(ids.decompact(curie)) == url


@given(st.lists(st.sampled_from([
    ("name", "some name"),
    ("comment", "a comment with ! no cut"),
    ("is_obsolete", "true"),
    ("namespace", "NS"),
    ("created_by", "someone"),
]), min_size=0, max_size=5))
@settings(max_examples=50)
def test_term_frame_roundtrip(clauses):
    text = "format-version: 1.4\n\n[Term]\nid: TST:0000001\n"
    for tag, value in clauses:
        text += f"{tag}: {value}\n"
    res = loads(text)
    assert not res.errors
    out = dumps(res.ontology)
    back = loads(out)
    assert not back.errors
    assert res.ontology.terms_table().equals(back.ontology.terms_table())


@given(st.text(alphabet=string.ascii_letters + string.digits +
               string.punctuation + " \t", max_size=40))
@settings(max_examples=100)
def test_def_text_roundtrips_through_quoting(s):
    # quoted-string escaping: def text with quotes/backslashes/tabs
    # (line-breaking characters cannot appear inside a clause line)
    text = ("format-version: 1.4\n\n[Term]\nid: TST:0000001\n"
            f'def: "{_q(s)}" []\n')
    res = loads(text)
    assert not res.errors
    d = res.ontology.frames[0].first("def")
    assert d["text"] == s
    back = loads(dumps(res.ontology))
    assert back.ontology.frames[0].first("def")["text"] == s


def _q(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')
