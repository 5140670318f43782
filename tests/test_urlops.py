"""url canonicalization rule-set tests (stages/urlops.py) — pure
batch-fn, no Ray needed."""

import pandas as pd

from fastobo_py_ray.stages.urlops import url_canonicalize_batch


def _canon(urls):
    out = url_canonicalize_batch(pd.DataFrame({"url": urls}))
    return list(zip(out["url_canon"], out["host"]))


def test_rule_set_edges():
    got = _canon([
        "HTTP://WWW.Example.COM:80/A/B/#frag",   # default port + frag
        "https://Example.com:443/x",             # https default port
        "https://example.com:8443/x/",           # exotic port survives
        "http://example.com:443/x",              # 443 is NOT http's default
        "HTTPS://EXAMPLE.COM",                   # no path at all
        "http://h/",                             # bare root slash
        "ftp://Mixed.Case/Path/",                # non-http scheme: port
                                                 # rules don't apply
        "no-scheme/path#frag",                   # schemeless passthrough
    ])
    assert got[0] == ("http://www.example.com/A/B", "www.example.com")
    assert got[1] == ("https://example.com/x", "example.com")
    assert got[2] == ("https://example.com:8443/x", "example.com")
    assert got[3] == ("http://example.com:443/x", "example.com")
    assert got[4] == ("https://example.com", "example.com")
    assert got[5] == ("http://h", "h")
    assert got[6] == ("ftp://mixed.case/Path", "mixed.case")
    assert got[7] == ("no-scheme/path", "")


def test_path_case_preserved_and_idempotent():
    urls = ["HTTPS://A.B:443/CaseSensitive/Path/?q=UPPER#x"]
    once = _canon(urls)
    assert once[0][0] == "https://a.b/CaseSensitive/Path/?q=UPPER"
    # wait: the trailing-slash rule strips only a TRAILING slash; the
    # '?' query follows the path here, so nothing is stripped — and a
    # second canonicalization must be a fixpoint
    again = _canon([once[0][0]])
    assert again[0][0] == once[0][0]
