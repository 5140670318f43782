"""Ontology version diff (obo/diff.py) + ontology-delta incremental
refresh (pipelines/refresh.py).

The refresh exactness contract —
``refresh(build(corpus, v1), v1 -> v2) == build(corpus, v2)`` value-
identically — is asserted per mutation class, each class chosen to
exercise one closure rule (frame edit, replaced_by target, identity
cluster, surface-token overlap / leftmost-longest span consumption,
ambiguous-surface idf coupling, header fallback)."""

import os

import pandas as pd
import pytest

from fastobo_py_ray.obo.diff import obo_diff, obo_diff_ds
from fastobo_py_ray.pipelines.kg import (annotate_pages, dedup_triples,
                                         materialize_adjacency,
                                         prepare_index)
from fastobo_py_ray.pipelines.refresh import (affected_closure,
                                              refresh_adjacency)
from fastobo_py_ray.testing.corpus import MINI_OBO, synth_pages_table

V1 = MINI_OBO

# one mutation per closure rule (see module docstring)
MUTATIONS = {
    "isa_retarget": V1.replace(
        "is_a: TST:0000002\n\n[Term]\nid: TST:0000005",
        "is_a: TST:0000003\n\n[Term]\nid: TST:0000005"),
    "remove_term": V1.replace(
        '[Term]\nid: TST:0000004\nname: beta factor\n'
        'def: "A factor for beta signals."\n'
        'synonym: "beta" EXACT abbrev []\nxref: UP:1111\n'
        'is_a: TST:0000002\n\n', ""),
    # new surface "container" is a token-overlapping PREFIX of the
    # existing "container complex" -> leftmost-longest interaction
    "add_overlapping_synonym": V1.replace(
        'synonym: "holder" BROAD []',
        'synonym: "holder" BROAD []\nsynonym: "container" EXACT []'),
    # def edit shifts the idf table -> the ambiguous "delta" surface's
    # TST:0000005-vs-0000006 linking can flip
    "profile_change_ambiguous": V1.replace(
        'def: "A region of the delta kind."',
        'def: "A region of the delta alpha kind."'),
    # alpha loses its ALT xref -> the treat-xrefs-as-equivalent cluster
    # splits and alpha's canonical rep changes
    "xref_cluster_split": V1.replace("xref: ALT:9000001\n", ""),
    # a longer new surface CONSUMES spans "alpha factor" used to win
    "new_term_consuming_spans": V1 + (
        "\n[Term]\nid: TST:0000042\nname: alpha factor complex\n"
        "is_a: TST:0000003\n"),
}

P, K = 4, 2


def _build(ray, rd, pages, obo, out):
    idx = ray.put(prepare_index(obo))
    d = dedup_triples(annotate_pages(rd.from_arrow(pages), idx,
                                     batch_size=16, langs=["en"]),
                      collect_urls=K)
    materialize_adjacency(d, out, presorted=True, subj_buckets=P)


def _load(rd, d):
    df = rd.read_parquet(d).to_pandas()
    if df.empty:
        return df
    df["urls"] = df["urls"].map(tuple)
    df["confidence"] = df["confidence"].astype("float64").round(6)
    cols = ["subj", "pred", "obj", "n_evidence", "confidence", "urls"]
    return df[cols].sort_values(["subj", "pred", "obj"]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# obo_diff
# ---------------------------------------------------------------------------

def test_obo_diff_classification_and_self_diff():
    v2 = MUTATIONS["remove_term"] + (
        "\n[Term]\nid: TST:0000050\nname: brand new\n")
    v2 = v2.replace("name: container complex",
                    "name: container complex renamed")
    d = obo_diff(V1, v2)
    st = dict(zip(d.frames["id"], d.frames["status"]))
    assert st["TST:0000004"] == "removed"
    assert st["TST:0000050"] == "added"
    assert st["TST:0000003"] == "changed"
    assert not d.header_changed

    s = obo_diff(V1, V1)
    assert s.frames.empty and not s.header_changed

    # formatting noise cancels under canonical re-serialization
    noisy = V1.replace("name: parent thing",
                       "name: parent thing ! a comment")
    assert obo_diff(V1, noisy).frames["id"].tolist() == ["TST:0000002"]

    h = obo_diff(V1, V1.replace("ontology: tst", "ontology: tst2"))
    assert h.header_changed and h.frames.empty


def test_obo_diff_ds_parity(ray_session):
    v2 = MUTATIONS["xref_cluster_split"] + (
        "\n[Term]\nid: TST:0000051\nname: another new\n")
    driver = obo_diff(V1, v2).frames
    dist = (obo_diff_ds(V1, v2).to_pandas()
            .sort_values(["frame_type", "id", "status"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(driver, dist)


def test_obo_diff_duplicate_id_keeps_last_stanza(ray_session):
    dup_a = V1 + "\n[Term]\nid: TST:0000001\nname: shadow alpha\n"
    # v1's LAST TST:0000001 stanza is 'shadow alpha'; v2 keeps the
    # original single stanza -> the id must read as CHANGED, comparing
    # against the shadow (dict-overwrite frame_by_id semantics)
    d = obo_diff(dup_a, V1)
    st = dict(zip(d.frames["id"], d.frames["status"]))
    assert st["TST:0000001"] == "changed"
    dist = (obo_diff_ds(dup_a, V1, num_blocks=5).to_pandas()
            .sort_values(["frame_type", "id", "status"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(d.frames, dist)


# ---------------------------------------------------------------------------
# affected_closure
# ---------------------------------------------------------------------------

def test_affected_closure_rules():
    from fastobo_py_ray.obo import loads as obo_loads
    from fastobo_py_ray.stages.canonicalize import union_find
    from fastobo_py_ray.stages.mentions import build_index

    def parts(v2):
        d = obo_diff(V1, v2)
        oo = obo_loads(V1).ontology
        on = obo_loads(v2).ontology
        io = build_index(oo, union_find(oo.equivalence_edges()))
        inn = build_index(on, union_find(on.equivalence_edges()))
        return affected_closure(d, oo, on, io, inn)

    # token overlap: the new "container" surface pulls in the owner of
    # "container complex" (TST:0000003) — and every closure includes
    # the ambiguous delta pair (idf coupling)
    c = parts(MUTATIONS["add_overlapping_synonym"])
    assert "TST:0000003" in c["terms"]
    assert {"TST:0000005", "TST:0000006"} <= c["terms"]

    # cluster closure: splitting alpha's ALT xref affects alpha AND its
    # v1 cluster rep ALT:9000001
    c = parts(MUTATIONS["xref_cluster_split"])
    assert "TST:0000001" in c["terms"] and "ALT:9000001" in c["terms"]

    # typedef change lands in preds, not terms
    c = parts(V1.replace("name: part of", "name: part of things"))
    assert c["preds"] == {"part_of"}
    assert 0 < c["fraction"] <= 1


# ---------------------------------------------------------------------------
# refresh_adjacency — exactness per mutation class
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(MUTATIONS))
def test_refresh_equals_full_rebuild(ray_session, tmp_path, name):
    import ray
    import ray.data as rd

    v2 = MUTATIONS[name]
    pages = synth_pages_table(120, seed=3)
    full2 = str(tmp_path / "full2")
    inc = str(tmp_path / "inc")
    _build(ray, rd, pages, v2, full2)
    _build(ray, rd, pages, V1, inc)

    pre = {d: os.stat(os.path.join(inc, d)).st_mtime_ns
           for d in os.listdir(inc) if d.startswith("subj_")}
    info = refresh_adjacency(rd.from_arrow(pages), V1, v2, inc,
                             subj_buckets=P, batch_size=16,
                             langs=["en"], k_urls=K,
                             max_affected_fraction=1.0)
    assert info["mode"] == "selective"
    pd.testing.assert_frame_equal(_load(rd, full2), _load(rd, inc))

    untouched = [d for d in pre
                 if int(d.split("=")[1]) not in info["touched_buckets"]]
    for d in untouched:
        assert os.stat(os.path.join(inc, d)).st_mtime_ns == pre[d]


def test_refresh_header_change_full_fallback(ray_session, tmp_path):
    import ray
    import ray.data as rd

    v2 = V1.replace("treat-xrefs-as-equivalent: ALT\n", "")
    pages = synth_pages_table(100, seed=7)
    full2 = str(tmp_path / "full2")
    inc = str(tmp_path / "inc")
    _build(ray, rd, pages, v2, full2)
    _build(ray, rd, pages, V1, inc)
    info = refresh_adjacency(rd.from_arrow(pages), V1, v2, inc,
                             subj_buckets=P, batch_size=16,
                             langs=["en"], k_urls=K)
    assert info["mode"] == "full"
    pd.testing.assert_frame_equal(_load(rd, full2), _load(rd, inc))


def test_refresh_noop_and_exactly_once(ray_session, tmp_path):
    import ray
    import ray.data as rd

    pages = synth_pages_table(60, seed=9)
    inc = str(tmp_path / "inc")
    _build(ray, rd, pages, V1, inc)

    assert refresh_adjacency(rd.from_arrow(pages), V1, V1, inc,
                             subj_buckets=P, langs=["en"],
                             k_urls=K)["mode"] == "noop"

    v2 = MUTATIONS["isa_retarget"]
    info = refresh_adjacency(rd.from_arrow(pages), V1, v2, inc,
                             subj_buckets=P, batch_size=16,
                             langs=["en"], k_urls=K,
                             refresh_id="rel-2026-02",
                             max_affected_fraction=1.0)
    assert info["touched_buckets"]
    again = refresh_adjacency(rd.from_arrow(pages), V1, v2, inc,
                              subj_buckets=P, batch_size=16,
                              langs=["en"], k_urls=K,
                              refresh_id="rel-2026-02",
                              max_affected_fraction=1.0)
    assert again == {"mode": "noop", "touched_buckets": [],
                     "delta_triples": 0, "skipped": "rel-2026-02"}


def test_refresh_empties_buckets_cleanly(ray_session, tmp_path):
    """A v2 whose dictionary never matches the corpus empties EVERY
    bucket: the staged swap must still replace the live dirs (empty
    staged dirs), and the store must read back as zero rows."""
    import ray
    import ray.data as rd

    v2 = ("format-version: 1.4\ndata-version: 0.1.0\n"
          "date: 05:12:2025 00:00\ndefault-namespace: TST\n"
          "idspace: MassBank http://www.massbank.jp/jsp/FwdRecord.jsp"
          "?id= \"MassBank records\"\n"
          "synonymtypedef: abbrev \"abbreviation\" EXACT\n"
          "treat-xrefs-as-equivalent: ALT\n"
          "treat-xrefs-as-is_a: UP\n"
          "treat-xrefs-as-relationship: REG regulates\n"
          "ontology: tst\n\n"
          "[Term]\nid: TST:0000099\nname: zzz unmatchable zzz\n")
    pages = synth_pages_table(60, seed=11)
    inc = str(tmp_path / "inc")
    _build(ray, rd, pages, V1, inc)
    info = refresh_adjacency(rd.from_arrow(pages), V1, v2, inc,
                             subj_buckets=P, batch_size=16,
                             langs=["en"], k_urls=K)
    assert info["mode"] == "full"
    import glob
    live = [d for d in os.listdir(inc) if d.startswith("subj_bucket=")]
    assert live, "live bucket dirs must survive the swap"
    assert not glob.glob(os.path.join(inc, "subj_bucket=*", "*.parquet"))


def test_refresh_tolerates_legacy_trash_dirs(ray_session, tmp_path):
    """Legacy pre-lock stores can hold stranded 'subj_bucket=K.trash'
    dirs; the touched-bucket scan must skip them (int('3.trash') used
    to raise AFTER the re-annotation had already run)."""
    import ray
    import ray.data as rd

    pages = synth_pages_table(60, seed=13)
    inc = str(tmp_path / "inc")
    _build(ray, rd, pages, V1, inc)
    os.makedirs(os.path.join(inc, "subj_bucket=3.trash"))
    info = refresh_adjacency(rd.from_arrow(pages), V1,
                             MUTATIONS["isa_retarget"], inc,
                             subj_buckets=P, batch_size=16,
                             langs=["en"], k_urls=K,
                             max_affected_fraction=1.0)
    assert info["touched_buckets"]


def test_refresh_randomized_mutations(ray_session, tmp_path):
    """Adversarial soundness gate for the affected closure: random
    small ontologies with DELIBERATELY overlapping multi-word surfaces
    (contained names, shared prefixes/suffixes, shared synonyms =
    ambiguity) x random release mutations x random corpora — refresh
    must equal a from-scratch rebuild on every seed.  A counterexample
    here means a closure rule is missing, not a flaky test (everything
    is seed-fixed)."""
    import random

    import pyarrow as pa
    import ray
    import ray.data as rd

    from fastobo_py_ray.testing.corpus import EPOCH_US, pages_schema

    POOL = ["alpha", "beta", "gamma", "delta", "factor", "complex",
            "region", "signal", "core", "unit"]

    def gen_onto(rng):
        n = 8
        lines = ["format-version: 1.4", "default-namespace: RT",
                 "treat-xrefs-as-equivalent: ALT", "ontology: rnd"]
        names = []
        for i in range(n):
            k = rng.randint(1, 3)
            names.append(" ".join(rng.choice(POOL) for _ in range(k)))
        for i in range(n):
            lines += ["", "[Term]", f"id: RT:{i:07d}",
                      f"name: {names[i]}"]
            if rng.random() < 0.4:
                lines.append(
                    f'synonym: "{rng.choice(POOL)}" EXACT []')
            if rng.random() < 0.25:
                lines.append("xref: ALT:0000007")
            if i and rng.random() < 0.8:
                lines.append(f"is_a: RT:{rng.randrange(i):07d}")
        return "\n".join(lines) + "\n"

    def mutate(rng, v1):
        stanzas = v1.split("\n\n")
        kind = rng.choice(["remove", "add", "rename", "synonym",
                           "retarget", "xref"])
        i = rng.randrange(1, len(stanzas))          # 0 is the header
        if kind == "remove":
            del stanzas[i]
        elif kind == "add":
            nm = " ".join(rng.choice(POOL)
                          for _ in range(rng.randint(1, 3)))
            stanzas.append(f"[Term]\nid: RT:0000099\nname: {nm}")
        elif kind == "rename":
            lines = stanzas[i].splitlines()
            lines[2] = ("name: "
                        + " ".join(rng.choice(POOL)
                                   for _ in range(rng.randint(1, 3))))
            stanzas[i] = "\n".join(lines)
        elif kind == "synonym":
            stanzas[i] += f'\nsynonym: "{rng.choice(POOL)}" EXACT []'
        elif kind == "retarget":
            stanzas[i] = "\n".join(
                ln for ln in stanzas[i].splitlines()
                if not ln.startswith("is_a:"))
            stanzas[i] += f"\nis_a: RT:{rng.randrange(8):07d}"
        else:
            if "xref: ALT:0000007" in stanzas[i]:
                stanzas[i] = stanzas[i].replace(
                    "\nxref: ALT:0000007", "")
            else:
                stanzas[i] += "\nxref: ALT:0000007"
        return "\n\n".join(stanzas) + ("" if v1.endswith("\n") else "\n")

    def gen_pages(rng):
        rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                "lang": []}
        for i in range(80):
            words = [rng.choice(POOL) for _ in range(25)]
            rows["url"].append(f"https://r.example/{i:05d}")
            rows["warc_ts"].append(EPOCH_US + i)
            rows["html"].append("<html></html>")
            rows["text"].append(" ".join(words))
            rows["lang"].append("en")
        return pa.table(rows, schema=pages_schema())

    for seed in range(8):
        rng = random.Random(seed)
        v1 = gen_onto(rng)
        v2 = mutate(rng, v1)
        pages = gen_pages(rng)
        full2 = str(tmp_path / f"full{seed}")
        inc = str(tmp_path / f"inc{seed}")
        _build(ray, rd, pages, v2, full2)
        _build(ray, rd, pages, V1 if False else v1, inc)
        refresh_adjacency(rd.from_arrow(pages), v1, v2, inc,
                          subj_buckets=P, batch_size=16,
                          langs=["en"], k_urls=K,
                          max_affected_fraction=1.0)
        a, b = _load(rd, full2), _load(rd, inc)
        assert a.equals(b), (
            f"seed {seed}: refresh != rebuild\nmutation v1->v2 diff:\n"
            f"{obo_diff(v1, v2).frames}\nrebuild:\n{a}\nrefresh:\n{b}")


def test_refresh_crash_mid_swap_is_completed_not_reapplied(
        ray_session, tmp_path, monkeypatch):
    """A crash in the middle of refresh's swap loop (staging complete,
    one bucket swapped) must be FINISHED from the staged merge by
    repair_adjacency — landing on exactly the refreshed state, never a
    mixed v1/v2 store or a re-applied merge."""
    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines import kg as kgmod
    from fastobo_py_ray.pipelines import refresh as rmod

    v2 = MUTATIONS["isa_retarget"]
    pages = synth_pages_table(120, seed=3)
    full2 = str(tmp_path / "full2")
    crash = str(tmp_path / "crash")
    _build(ray, rd, pages, v2, full2)
    _build(ray, rd, pages, V1, crash)

    real_apply = rmod._apply_swap_plan

    def crashy(adjacency_dir, tmp_root, touched, delta_id=None):
        import shutil
        b = touched[0]
        live = os.path.join(adjacency_dir, f"subj_bucket={b}")
        new = os.path.join(tmp_root, f"subj_bucket={b}")
        trash = os.path.join(adjacency_dir, f".trash.subj_bucket={b}")
        if os.path.isdir(live):
            os.rename(live, trash)
        os.rename(new, live)
        shutil.rmtree(trash, ignore_errors=True)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(rmod, "_apply_swap_plan", crashy)
    with pytest.raises(RuntimeError, match="simulated"):
        refresh_adjacency(rd.from_arrow(pages), V1, v2, crash,
                          subj_buckets=P, batch_size=16, langs=["en"],
                          k_urls=K, refresh_id="rel-x",
                          max_affected_fraction=1.0)
    monkeypatch.setattr(rmod, "_apply_swap_plan", real_apply)

    assert os.path.exists(os.path.join(crash, ".delta_merge_tmp",
                                       "_PLAN"))
    assert kgmod.repair_adjacency(crash)
    assert not os.path.exists(os.path.join(crash, ".delta_merge_tmp"))
    # the ledger committed on completion: a retry is a no-op
    again = refresh_adjacency(rd.from_arrow(pages), V1, v2, crash,
                              subj_buckets=P, batch_size=16,
                              langs=["en"], k_urls=K,
                              refresh_id="rel-x",
                              max_affected_fraction=1.0)
    assert again.get("skipped") == "rel-x"
    pd.testing.assert_frame_equal(_load(rd, full2), _load(rd, crash))
