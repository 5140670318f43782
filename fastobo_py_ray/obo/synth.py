"""Deterministic synthetic OBO corpus generator — pato-scale test/bench
input.

The reference ships a large-graph corpus (``tests/data/pato.json``) that
is absent from this sandbox (``.MISSING_LARGE_BLOBS:1``), so scale tests
synthesize instead: :func:`synth_obo` emits an OBO 1.4 document with the
clause mix of the reference's ``tests/data/ms.obo`` (per-frame rates:
is_a ~0.98, xref ~0.37, relationship ~0.15, synonym ~0.07, defs on
half), formatted exactly as :mod:`.serializer` writes it so
``dumps(loads(synth_obo(n)).ontology) == synth_obo(n)`` is BYTE-exact —
the roundtrip oracle at any n.  Pure arithmetic on the frame index; no
RNG, no I/O; ~33 MB / 300k frames.
"""

from __future__ import annotations

TYPEDEFS = (
    ("part_of", "part of", "is_transitive: true"),
    ("regulates", "regulates", "is_anti_symmetric: true"),
    ("has_part", "has part", "is_transitive: true"),
    ("develops_from", "develops from", "is_transitive: true"),
    ("located_in", "located in", "is_reflexive: true"),
)

HEADER = """\
format-version: 1.4
data-version: 99.0.0
default-namespace: SYN
synonymtypedef: abbrev "abbreviation" EXACT
ontology: synthetic"""


def synth_obo(n_frames: int) -> str:
    """An n_frames-frame OBO document (``n_frames - len(TYPEDEFS)``
    terms + the fixed typedef tail, mirroring ms.obo's 2936/5 split)."""
    n_terms = n_frames - len(TYPEDEFS)
    if n_terms < 1:
        raise ValueError(f"n_frames must be > {len(TYPEDEFS)}")
    rels = [t[0] for t in TYPEDEFS]
    parts = [HEADER]
    for i in range(n_terms):
        lines = [f"[Term]\nid: SYN:{i:07d}\nname: synthetic term {i}"]
        if i % 2 == 0:
            lines.append(f'def: "Definition of synthetic term {i}." '
                         f'[REF:{i % 997}]')
        if i % 50 == 17:
            lines.append(f"alt_id: SYN:9{i:06d}")
        if i % 14 == 5:
            lines.append(f'synonym: "st{i}" EXACT abbrev []')
        if i % 29 == 11:
            lines.append(f'synonym: "alt form {i}" RELATED []')
        if i % 3 == 0:
            lines.append(f"xref: EXT:{i % 9973}")
        if i > 0:
            lines.append(f"is_a: SYN:{(i - 1) // 2:07d}")
        if i % 7 == 3:
            lines.append(f"relationship: {rels[i % len(rels)]} "
                         f"SYN:{i // 3:07d}")
        if i % 100 == 99:
            lines.append("is_obsolete: true")
            lines.append(f"replaced_by: SYN:{i - 1:07d}")
        parts.append("\n".join(lines))
    for tid, tname, flag in TYPEDEFS:
        parts.append(f"[Typedef]\nid: {tid}\nname: {tname}\n{flag}")
    return "\n\n".join(parts) + "\n"


def expected_counts(n_frames: int) -> dict:
    """Closed-form golden clause counts for ``synth_obo(n_frames)`` —
    the test oracle, derived independently of the parser."""
    n_terms = n_frames - len(TYPEDEFS)

    def hits(mod: int, rem: int) -> int:
        # |{i in [0, n_terms) : i % mod == rem}|
        return (n_terms - rem + mod - 1) // mod if rem < n_terms else 0

    return {
        "frames": n_frames,
        "terms": n_terms,
        "typedefs": len(TYPEDEFS),
        "def": hits(2, 0),
        "alt_id": hits(50, 17),
        "synonym": hits(14, 5) + hits(29, 11),
        "xref": hits(3, 0),
        "is_a": n_terms - 1,
        "relationship": hits(7, 3),
        "is_obsolete": hits(100, 99),
    }
