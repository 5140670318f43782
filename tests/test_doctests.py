"""Doctest-conformance pass, modeled on the reference's
``tests/test_doctests.py:17-63`` (every docstring example in the module
tree is executed as a test). The engine's pure modules — identifier
semantics, parser, serializer, model — carry doctest examples mirroring
the reference's ``src/py/id.rs`` / ``src/py/doc.rs`` / ``src/py/mod.rs``
doctests; this collects and runs all of them, and additionally checks a
whole-document example against the reference's own ms.obo corpus.
"""

import doctest

import fastobo_py_ray.obo.graphjson
import fastobo_py_ray.obo.ids
import fastobo_py_ray.obo.macros
import fastobo_py_ray.obo.model
import fastobo_py_ray.obo.parser
import fastobo_py_ray.obo.serializer

MODULES = [
    fastobo_py_ray.obo.ids,
    fastobo_py_ray.obo.model,
    fastobo_py_ray.obo.parser,
    fastobo_py_ray.obo.serializer,
    fastobo_py_ray.obo.macros,
    fastobo_py_ray.obo.graphjson,
]

MS_OBO = "/root/reference/tests/data/ms.obo"


def test_all_docstring_examples_pass():
    total_attempted = 0
    for mod in MODULES:
        res = doctest.testmod(mod, optionflags=doctest.ELLIPSIS,
                              verbose=False)
        assert res.failed == 0, f"doctest failures in {mod.__name__}"
        total_attempted += res.attempted
    # the pass is real only if examples actually exist and ran
    assert total_attempted >= 15, total_attempted


def test_ms_obo_docstring_conformance():
    """The reference doctests run against ms.obo (tests/test_doctests.py
    setUp loads it into globs); mirror that: the documented API calls
    hold on the real corpus."""
    from fastobo_py_ray.obo import load
    from fastobo_py_ray.obo.ids import compact, decompact, is_valid, parse

    r = load(MS_OBO)
    assert len(r.ontology.frames) == 2941  # tests/test_fastobo.py:11
    f = r.ontology.frames[0]
    assert parse(f.id)[0] == "prefixed"
    assert is_valid(f.id)
    assert compact(decompact(f.id)) == f.id
