"""Deterministic test fixtures: mini ontologies + synthetic page corpus.

Implements FIXTURES.md F1/F2: a Common-Crawl-shaped ``pages`` table whose
``text`` is by construction byte-identical to ``extract_text(html)`` (the
input_hint per-row invariant), and two OBO fixtures:

* ``MINI_OBO`` — rich fixture modeled on the reference corpora
  (``/root/reference/tests/data/ms.obo`` header shape, ``plana.obo`` macro
  header): synonym scopes + typedef, idspace, the three TreatXrefsAs macros,
  alt_id, obsolete + replaced_by, a URL-identified term, an ambiguous
  surface ("delta") shared by two terms to exercise the context linker.
* ``DOCS_OBO`` — ontology over the 31-word vocabulary of the driver's
  ``documents.parquet`` tables so the full KG pipeline runs on driver data
  with an exact DuckDB oracle (single-word surfaces only).

Everything is seed-fixed; no wall clock, no ambient randomness.
"""

from __future__ import annotations

import os
import random
from typing import List, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.extract import extract_text

EPOCH_US = 1_764_892_800_000_000  # 2025-12-05T00:00:00Z in microseconds

MINI_OBO = """\
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
def: "A test factor that does alpha things." [PSI:MS]
synonym: "alpha" EXACT abbrev []
synonym: "a-factor" RELATED []
xref: ALT:9000001
is_a: TST:0000002 ! parent

[Term]
id: TST:0000002
name: parent thing
alt_id: TST:0009002
relationship: part_of TST:0000003

[Term]
id: TST:0000003
name: container complex
synonym: "holder" BROAD []

[Term]
id: TST:0000004
name: beta factor
def: "A factor for beta signals."
synonym: "beta" EXACT abbrev []
xref: UP:1111
is_a: TST:0000002

[Term]
id: TST:0000005
name: delta region
def: "A region of the delta kind."
synonym: "delta" EXACT []
is_a: TST:0000003

[Term]
id: TST:0000006
name: delta factor
def: "A factor of the delta kind."
synonym: "delta" EXACT []
is_a: TST:0000002

[Term]
id: TST:0000007
name: gamma regulator
def: "Regulates gamma."
xref: REG:4242
is_a: TST:0000002

[Term]
id: TST:0000010
name: old alpha
is_obsolete: true
replaced_by: TST:0000001

[Term]
id: http://purl.obolibrary.org/obo/TST_0000011
name: url thing
xref: MassBank:EA281701
is_a: TST:0000003

[Typedef]
id: part_of
name: part of
is_transitive: true

[Typedef]
id: regulates
name: regulates
"""

# ---------------------------------------------------------------------------
# DOCS_OBO — ontology over the driver documents vocabulary
# ---------------------------------------------------------------------------

# the 31-word vocabulary of /root/testdata/*/documents.parquet, minus
# stopwords {"the", "a"}; ids assigned alphabetically.
DOCS_VOCAB = [
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window",
]
DOCS_STOPWORDS = {"the", "a"}


def _docs_id(word: str) -> str:
    return f"DB:{DOCS_VOCAB.index(word) + 1:07d}"


_DOCS_ISA = [("hash", "join"), ("merge", "join"), ("sort", "order"),
             ("scan", "query"), ("filter", "query"), ("window", "agg"),
             ("group", "agg")]
_DOCS_PART_OF = [("column", "table"), ("row", "table"), ("key", "row"),
                 ("line", "order"), ("part", "order")]
_DOCS_RELATED = [("spark", "query"), ("vector", "column"), ("data", "value")]


def docs_obo() -> str:
    """OBO text of the driver-documents ontology (deterministic)."""
    lines = [
        "format-version: 1.4",
        "default-namespace: DB",
        "treat-xrefs-as-equivalent: ALT",
        "ontology: sparkdb",
    ]
    edges = {}
    for s, o in _DOCS_ISA:
        edges.setdefault(s, []).append(("is_a", _docs_id(o)))
    for s, o in _DOCS_PART_OF:
        edges.setdefault(s, []).append(("relationship: part_of", _docs_id(o)))
    for s, o in _DOCS_RELATED:
        edges.setdefault(s, []).append(("relationship: related_to", _docs_id(o)))
    for word in DOCS_VOCAB:
        lines += ["", "[Term]", f"id: {_docs_id(word)}", f"name: {word}"]
        if word == "stream":  # obsolete, redirects to batch
            lines += ["is_obsolete: true", f"replaced_by: {_docs_id('batch')}"]
        if word == "data":  # alt_id merge
            lines += ["alt_id: DB:0009006"]
        if word in ("value", "vector"):  # shared ALT xref -> equivalent pair
            lines += ["xref: ALT:0000001"]
        for pred, obj in edges.get(word, []):
            if pred == "is_a":
                lines.append(f"is_a: {obj}")
            else:
                lines.append(f"{pred} {obj}")
    for td in ("part_of", "related_to"):
        lines += ["", "[Typedef]", f"id: {td}", f"name: {td.replace('_', ' ')}"]
    return "\n".join(lines) + "\n"


def docs_canonical_word_map() -> List[Tuple[str, str]]:
    """(word, canonical term id) after alt_id/replaced_by/xref union-find —
    the hand-derived golden mapping used by the DuckDB oracles.

    'stream' redirects to batch via replaced_by at dictionary-build time;
    'value'/'vector' collapse to their cluster representative, which is the
    minimum canonical id ALT:0000001 (ordering /root/reference/src/py/id.rs:308-335).
    """
    out = []
    for w in DOCS_VOCAB:
        if w == "stream":
            out.append((w, _docs_id("batch")))
        elif w in ("value", "vector"):
            out.append((w, "ALT:0000001"))
        else:
            out.append((w, _docs_id(w)))
    return out


def docs_canonical_edges() -> List[Tuple[str, str, str]]:
    """Ontology edges with subj/obj rewritten to canonical representatives."""
    rep = dict(docs_canonical_word_map())

    def c(w: str) -> str:
        return rep[w]

    edges = [(c(s), "is_a", c(o)) for s, o in _DOCS_ISA]
    edges += [(c(s), "part_of", c(o)) for s, o in _DOCS_PART_OF]
    edges += [(c(s), "related_to", c(o)) for s, o in _DOCS_RELATED]
    return sorted(set(edges))


# ---------------------------------------------------------------------------
# DOCS_OBO v2 — a deterministic "next release" of the documents ontology
# (fixture for the ontology-delta refresh + diff operators)
# ---------------------------------------------------------------------------

# the four mutation classes a real release cycle produces, each chosen so
# the DuckDB oracle stays hand-derivable (single-token surfaces, no
# ambiguous candidates):
#   1. term REMOVED: 'window' (drops its surface and its is_a edge)
#   2. edge RETARGET: sort is_a order -> sort is_a agg
#   3. surface ADDED: 'spark' gains EXACT synonym "the" (a v1 stopword —
#      a high-frequency token starts hitting an existing term)
#   4. identity-cluster SPLIT: 'vector' loses its ALT xref, so the
#      v1 {value, vector, ALT:0000001} cluster splits and vector's
#      canonical id reverts to its own DB id


def docs_obo_v2() -> str:
    """The v2 release text, derived from :func:`docs_obo` by the four
    mutations above (textual, deterministic)."""
    v1 = docs_obo()
    win = _docs_id("window")
    v2 = v1.replace(
        f"\n[Term]\nid: {win}\nname: window\nis_a: {_docs_id('agg')}\n",
        "\n")
    v2 = v2.replace(
        f"name: sort\nis_a: {_docs_id('order')}",
        f"name: sort\nis_a: {_docs_id('agg')}")
    v2 = v2.replace(
        "name: spark\n",
        'name: spark\nsynonym: "the" EXACT []\n')
    # vector keeps its stanza but loses the shared ALT xref (value keeps
    # its own) — count on 'vector' appearing after 'value' in DOCS_VOCAB
    # order, so the SECOND xref line is vector's
    first = v2.index("xref: ALT:0000001\n")
    second = v2.index("xref: ALT:0000001\n", first + 1)
    v2 = v2[:second] + v2[second + len("xref: ALT:0000001\n"):]
    return v2


def docs_canonical_word_map_v2() -> List[Tuple[str, str]]:
    """Hand-derived (word -> canonical id) golden for v2 — the oracle's
    independent derivation of the four mutations' dictionary effect."""
    out = []
    for w, t in docs_canonical_word_map():
        if w == "window":
            continue                      # removed term
        if w == "vector":
            out.append((w, _docs_id(w)))  # cluster split: own id again
            continue
        out.append((w, t))
    out.append(("the", _docs_id("spark")))  # new synonym surface
    return out


def docs_canonical_edges_v2() -> List[Tuple[str, str, str]]:
    rep = dict(docs_canonical_word_map_v2())

    def c(w: str) -> str:
        return rep[w]

    isa = [e for e in _DOCS_ISA if e != ("window", "agg")
           and e != ("sort", "order")] + [("sort", "agg")]
    edges = [(c(s), "is_a", c(o)) for s, o in isa]
    edges += [(c(s), "part_of", c(o)) for s, o in _DOCS_PART_OF]
    edges += [(c(s), "related_to", c(o)) for s, o in _DOCS_RELATED]
    return sorted(set(edges))


# ---------------------------------------------------------------------------
# pages corpus (FIXTURES.md F1)
# ---------------------------------------------------------------------------

_NAV = ('<nav><ul><li><a href="/">Home</a></li>'
        '<li><a href="/about">About</a></li></ul></nav>')
_FOOTER = ('<footer>&#169; 2025 Example Corp &mdash; '
           '<a href="/tos">Terms</a></footer>')


def make_html(title: str, paragraphs: Sequence[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        "<!DOCTYPE html><html><head><title>{t}</title>"
        '<meta charset="utf-8"><style>body{{font-size:14px}}</style>'
        "<script>var x=1;</script></head><body>{nav}"
        "<article>{body}</article>{foot}</body></html>"
    ).format(t=title, nav=_NAV, body=body, foot=_FOOTER).encode("utf-8")


# (url_suffix, lang, paragraphs) — hand-enumerated golden corpus; expected
# mentions/triples are asserted in tests/test_kg_pipeline.py.
GOLDEN_PAGES: List[Tuple[str, str, List[str]]] = [
    ("p0", "en", ["The alpha factor binds the parent thing."]),
    ("p1", "en", ["Alpha, also called a-factor, is part of the container complex."]),
    ("p2", "en", ["The parent thing is part of the container complex."]),
    ("p3", "en", ["Old alpha was replaced; the parent thing remains."]),
    ("p4", "en", ["The delta region lies in the container complex, and delta too."]),
    ("p5", "en", ["Delta factor and beta factor act on the parent thing."]),
    ("p6", "en", ["The gamma regulator controls the parent thing."]),
    ("p7", "en", ["delta appears alone."]),
    ("p8", "en", ["The url thing sits in the container complex."]),
    ("p9", "en", ["Beta binds alpha."]),
    ("p10", "de", ["Das alpha factor Ding bleibt unerkannt."]),
]

_FILLER = [
    "Nothing of ontological interest happens here.",
    "Weather, sports and other boilerplate filler text.",
    "An unrelated paragraph about cooking pasta.",
]


def golden_pages_table() -> pa.Table:
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i, (suffix, lang, paras) in enumerate(GOLDEN_PAGES):
        html = make_html(f"t-{suffix}", paras)
        rows["url"].append(f"https://site{i % 5}.example/doc/{suffix}")
        rows["warc_ts"].append(EPOCH_US + i * 1_000_000)
        rows["html"].append(html)
        rows["text"].append(extract_text(html))
        rows["lang"].append(lang)
    return pa.table(rows, schema=pages_schema())


def pages_schema() -> pa.Schema:
    return pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])


def synth_pages_table(n_rows: int, seed: int = 42, max_paras: int = 3,
                      fill_text: bool = True) -> pa.Table:
    """Bulk deterministic corpus: golden sentences + filler, cycled.
    ``max_paras`` controls page weight (bench uses heavier pages to
    approximate real Common-Crawl documents).  ``fill_text=False`` leaves
    the ``text`` column null so pipelines actually run the S1 extraction
    stage (the bench uses this; pre-filled text would silently skip it)."""
    rng = random.Random(seed)
    pool = [p for _, _, paras in GOLDEN_PAGES for p in paras] + _FILLER
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i in range(n_rows):
        k = 1 + (i % max_paras)
        paras = [pool[rng.randrange(len(pool))] for _ in range(k)]
        lang = "en" if i % 20 else ("de" if (i // 20) % 2 else "fr")
        html = make_html(f"t{i}", paras)
        rows["url"].append(f"https://site{i % 50}.example/doc/{i:08d}")
        rows["warc_ts"].append(EPOCH_US + i * 1_000_000)
        rows["html"].append(html)
        rows["text"].append(extract_text(html) if fill_text else None)
        rows["lang"].append(lang)
    return pa.table(rows, schema=pages_schema())


def tile_pages_table(base: pa.Table, tile: int) -> pa.Table:
    """Vectorized corpus tiling: same html/text/lang (zero-copy column
    reuse), distinct urls and shifted timestamps per tile.  Lets the bench
    build a multi-million-page corpus from one Python-generated slab."""
    import pyarrow.compute as pc

    if tile == 0:
        return base
    urls = pc.binary_join_element_wise(
        pa.scalar(f"https://tile{tile}."),
        pc.utf8_slice_codeunits(base["url"], 8, 2**30), "")
    ts = pc.add(base["warc_ts"],
                pa.scalar(tile * 86_400_000_000, type=pa.duration("us")))
    return pa.table({"url": urls, "warc_ts": ts, "html": base["html"],
                     "text": base["text"], "lang": base["lang"]},
                    schema=pages_schema())


def write_pages_corpus(out_dir: str, n_rows: int = 500, n_files: int = 4,
                       seed: int = 42, include_golden: bool = True,
                       max_paras: int = 3, n_tiles: int = 1,
                       fill_text: bool = True) -> List[str]:
    """Write the corpus as >=n_files parquet files (partition-resume tests
    need multiple input shards).  Total pages = n_rows * n_tiles; tiles > 0
    are vectorized rewrites of the base slab.  Returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    tables = []
    if include_golden:
        tables.append(golden_pages_table())
    bulk = synth_pages_table(n_rows, seed=seed, max_paras=max_paras,
                             fill_text=fill_text)
    per = max(1, n_rows // n_files)
    for tile in range(n_tiles):
        t = tile_pages_table(bulk, tile)
        for start in range(0, n_rows, per):
            tables.append(t.slice(start, per))
    paths = []
    for i, t in enumerate(tables):
        p = os.path.join(out_dir, f"pages-{i:04d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths
