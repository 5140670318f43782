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


# ---------------------------------------------------------------------------
# engine primitives (round 2): grouped min, quantile sketch, minhash
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd

keys_st = st.lists(st.sampled_from(["k1", "k2", "k3", "k4"]),
                   min_size=1, max_size=40)
vals_st = st.lists(st.text(alphabet=string.ascii_lowercase + "0123456789",
                           min_size=0, max_size=8),
                   min_size=1, max_size=40)


@given(keys_st, vals_st)
def test_group_min_matches_pandas_object_min(ks, vs):
    from fastobo_py_ray.functions.relops import group_min

    n = min(len(ks), len(vs))
    df = pd.DataFrame({"k": ks[:n], "v": vs[:n]})
    got = group_min(df, ["k"], "v").sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].min() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=500),
       st.integers(min_value=2, max_value=64))
def test_sketch_compress_invariants(vals, max_c):
    from fastobo_py_ray.stages.sketch import compress, quantiles

    a = np.asarray(vals)
    v, w = compress(a, np.ones_like(a), max_c)
    assert len(v) <= max_c
    assert w.sum() == len(a)
    assert (np.diff(v) >= 0).all()
    qs = quantiles((v, w), [0.0, 0.25, 0.5, 0.75, 1.0])
    assert (np.diff(qs) >= -1e-9).all()          # monotone in q
    assert a.min() - 1e-9 <= qs[0] and qs[-1] <= a.max() + 1e-9


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=12))
def test_minhash_segmented_matches_per_doc(texts):
    from fastobo_py_ray.stages.dedup import (_hash_tokens, _minhash_params,
                                             _signatures_segmented,
                                             minhash_signature, shingles)

    params = _minhash_params(16)
    sh, offs = [], [0]
    for t in texts:
        s = shingles(t)
        sh.extend(s)
        offs.append(len(sh))
    sigs = _signatures_segmented(_hash_tokens(sh), np.asarray(offs), 16,
                                 params)
    for i, t in enumerate(texts):
        assert (sigs[i] == minhash_signature(t, 16, params)).all()


class _FakeDS:
    """Minimal map_batches shim so batch-local stages are property-
    testable without a Ray session."""

    def __init__(self, df):
        self.df = df

    def map_batches(self, fn, **kw):
        return _FakeDS(fn(self.df))


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " ",
                        max_size=60), min_size=1, max_size=8),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=1, max_value=6))
def test_chunk_documents_covers_every_word(texts, window, stride):
    import pandas as pd
    import pytest

    from fastobo_py_ray.stages.traindata import chunk_documents

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    if stride > window:
        # gap-producing configs are rejected, not silently lossy
        with pytest.raises(ValueError, match="stride"):
            chunk_documents(_FakeDS(df), window=window, stride=stride)
        return
    out = chunk_documents(_FakeDS(df), window=window, stride=stride).df
    for did, text in enumerate(texts):
        words = str(text).split(" ")
        g = out[out["doc_id"] == did].sort_values("chunk_id")
        # chunk ids are dense from 0; every chunk is the exact slice
        assert g["chunk_id"].tolist() == list(range(len(g)))
        covered = set()
        for r in g.itertuples():
            lo = r.chunk_id * stride
            want = words[lo:lo + window]
            assert r.chunk_text == " ".join(want)
            assert r.n_words == len(want)
            covered |= set(range(lo, lo + r.n_words))
        assert covered == set(range(len(words)))


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                min_size=1, max_size=20))
def test_pagerank_fixed_point_matches_reference(ray_session, edge_list):
    """Random small graphs: the distributed broadcast tier equals the
    pure-Python integer recurrence EXACTLY (no tolerance)."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.stages.graph import PAGERANK_UNIT, pagerank

    edges = pd.DataFrame(
        {"src": [f"n{a}" for a, _ in edge_list],
         "dst": [f"n{b}" for _, b in edge_list]})
    got = pagerank(rd.from_pandas(edges), num_iters=3,
                   mode="broadcast").to_pandas() \
        .sort_values("node").reset_index(drop=True)

    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = [0] * n
    for a in edges["src"]:
        deg[ix[a]] += 1
    U = PAGERANK_UNIT
    r = [U // n] * n
    for _ in range(3):
        s = [0] * n
        for a, b in zip(edges["src"], edges["dst"]):
            s[ix[b]] += r[ix[a]] // deg[ix[a]]
        mass = sum(r[i] for i in range(n) if deg[i] == 0)
        r = [(3 * U) // (20 * n) + (17 * (s[i] + mass // n)) // 20
             for i in range(n)]
    assert got["node"].tolist() == nodes
    assert got["rank_micro"].tolist() == r
