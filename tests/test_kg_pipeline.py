"""End-to-end KG pipeline golden tests (the MS_FRAMES-style golden-count
discipline of /root/reference/tests/test_fastobo.py:10-139 projected onto
emitted triples, per SURVEY.md §5)."""

import pandas as pd
import pytest

from fastobo_py_ray.pipelines.kg import (dedup_triples, prepare_index,
                                         run_kg_pipeline)
from fastobo_py_ray.stages.extract import extract_text
from fastobo_py_ray.stages.mentions import annotate_page
from fastobo_py_ray.testing.corpus import (GOLDEN_PAGES, MINI_OBO,
                                           golden_pages_table, make_html)

# hand-enumerated golden triples for the golden corpus (canonical ids;
# representative = min canonical ident, /root/reference/src/py/id.rs:308-335)
GOLDEN_TRIPLES = {
    ("ALT:9000001", "is_a", "TST:0000002"): 2,        # p0, p3
    ("TST:0000002", "part_of", "TST:0000003"): 1,     # p2
    ("TST:0000005", "is_a", "TST:0000003"): 1,        # p4
    ("TST:0000006", "is_a", "TST:0000002"): 1,        # p5
    ("TST:0000004", "is_a", "TST:0000002"): 1,        # p5
    ("TST:0000007", "is_a", "TST:0000002"): 1,        # p6
    ("TST:0000011", "is_a", "TST:0000003"): 1,        # p8
}


def test_golden_mentions_pure():
    """Per-page detection/linking semantics, no Ray."""
    idx = prepare_index(MINI_OBO)
    # xref-equivalent cluster: TST:0000001 ~ ALT:9000001, rep is min id
    assert idx.representatives["TST:0000001"] == "ALT:9000001"
    # alt_id cluster
    assert idx.representatives["TST:0009002"] == "TST:0000002"
    # obsolete redirect at dictionary level: "old alpha" -> TST:0000001
    assert idx.surfaces["old alpha"] == [("TST:0000001", "NAME")]

    text = extract_text(make_html("t", GOLDEN_PAGES[4][2]))  # p4: ambiguity
    m, _ = annotate_page(idx, "p4", text)
    delta = [x for x in m if x[3].lower() == "delta"]
    assert delta and delta[0][1] == "TST:0000005"  # context "region" wins

    text7 = extract_text(make_html("t", GOLDEN_PAGES[7][2]))  # p7: tie
    m7, _ = annotate_page(idx, "p7", text7)
    assert m7[0][1] == "TST:0000005"  # tie-break = min canonical id


def test_kg_pipeline_golden_counts(ray_session, tmp_path):
    import ray.data as rd

    pages = rd.from_arrow(golden_pages_table())
    out = run_kg_pipeline(pages, MINI_OBO, concurrency=2, batch_size=4)
    df = out.to_pandas().sort_values(["subj", "pred", "obj"])
    got = {(r.subj, r.pred, r.obj): int(r.n_evidence)
           for r in df.itertuples()}
    assert got == GOLDEN_TRIPLES


def test_dedup_collect_urls(ray_session):
    """collect_urls=K: deterministic K-smallest evidence urls per triple."""
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import annotate_pages
    from fastobo_py_ray.pipelines.kg import prepare_index
    import ray

    t = golden_pages_table()
    index_ref = ray.put(prepare_index(MINI_OBO))
    triples = annotate_pages(rd.from_arrow(t).repartition(4), index_ref,
                             emit="triples", batch_size=3)
    out = dedup_triples(triples, collect_urls=2).to_pandas()
    got = {(r.subj, r.pred, r.obj): (int(r.n_evidence), list(r.urls))
           for r in out.itertuples()}
    # alpha is_a parent has evidence on p0 (site0) and p3 (site3)
    n, urls = got[("ALT:9000001", "is_a", "TST:0000002")]
    assert n == 2
    assert urls == sorted(urls) and len(urls) == 2
    assert all("/doc/p" in u for u in urls)
    for (s, p, o), cnt in GOLDEN_TRIPLES.items():
        n, urls = got[(s, p, o)]
        assert n == cnt and 1 <= len(urls) <= 2


def test_dedup_triples_tier_parity(ray_session):
    """The grouped_agg reduce tier (>=10^6-distinct-triples shape) is
    VALUE-IDENTICAL to the sort-groupby tier — counts, confidences,
    head-k url samples and the global (subj,pred,obj) output order —
    on a synthetic corpus with multi-partial triples, url ties and
    more urls than k; and auto-tier dispatches by partial row count."""
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import annotate_pages, prepare_index
    import ray

    index_ref = ray.put(prepare_index(MINI_OBO))

    def run(tier, **kw):
        triples = annotate_pages(
            rd.from_arrow(golden_pages_table()).repartition(4),
            index_ref, emit="triples", batch_size=3)
        df = dedup_triples(triples, collect_urls=2, scale_tier=tier,
                           **kw).to_pandas()
        df["urls"] = df["urls"].map(list)
        return df.reset_index(drop=True)

    small = run("sort_groupby")
    big = run("grouped_agg")
    pd.testing.assert_frame_equal(small, big)
    # output of the big tier is globally sorted (the adjacency
    # writer's sort-elision tripwire rides this)
    keys = list(zip(big["subj"], big["pred"], big["obj"]))
    assert keys == sorted(keys)
    # auto with a tiny threshold dispatches to the big tier
    forced_auto = run("auto", distinct_tier_threshold=1)
    pd.testing.assert_frame_equal(small, forced_auto)
    import pytest
    with pytest.raises(ValueError, match="scale_tier"):
        run("bogus")


def test_adjacency_written_sorted(ray_session, tmp_path):
    """materialize_adjacency(presorted=True) relies on Ray Data's
    groupby-aggregate emitting globally range-ordered output over the group
    key; assert the written adjacency really is sorted by (subj,pred,obj)."""
    import ray.data as rd

    out_dir = str(tmp_path / "adj")
    pages = rd.from_arrow(golden_pages_table()).repartition(5)
    run_kg_pipeline(pages, MINI_OBO, out_dir=out_dir, batch_size=4)
    back = rd.read_parquet(out_dir).to_pandas()
    keys = list(zip(back["subj"], back["pred"], back["obj"]))
    assert keys == sorted(keys)
    assert {(s, p, o): 0 for s, p, o in keys}.keys() == GOLDEN_TRIPLES.keys()


def test_adjacency_subj_bucket_partitioning(ray_session, tmp_path):
    """subj_buckets=P writes hive-partitioned dirs; every subject's edges
    live in exactly one bucket and the union equals the flat output."""
    import os

    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import (annotate_pages,
                                             materialize_adjacency,
                                             prepare_index)

    out_dir = str(tmp_path / "adj_bucketed")
    index_ref = ray.put(prepare_index(MINI_OBO))
    triples = annotate_pages(
        rd.from_arrow(golden_pages_table()).repartition(3), index_ref,
        emit="triples", batch_size=4)
    materialize_adjacency(dedup_triples(triples), out_dir, presorted=True,
                          subj_buckets=4)
    assert any(d.startswith("subj_bucket=") for d in os.listdir(out_dir))
    back = rd.read_parquet(out_dir).to_pandas()
    got = {(r.subj, r.pred, r.obj): int(r.n_evidence)
           for r in back.itertuples()}
    assert got == GOLDEN_TRIPLES
    per_subj = back.groupby("subj")["subj_bucket"].nunique()
    assert (per_subj == 1).all()


def test_kg_pipeline_invariance_across_partitioning(ray_session):
    """Results identical across partition counts and batch sizes
    (parallelism invariance, SURVEY.md §5)."""
    import ray.data as rd

    t = golden_pages_table()
    a = run_kg_pipeline(rd.from_arrow(t).repartition(1), MINI_OBO,
                        concurrency=1, batch_size=64).to_pandas()
    b = run_kg_pipeline(rd.from_arrow(t).repartition(7), MINI_OBO,
                        concurrency=3, batch_size=2).to_pandas()
    a = a.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = b.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_text_extraction_invariant(ray_session):
    """Per-row invariant (input_hint): extracted text byte-identical to the
    stored text column for every url."""
    t = golden_pages_table()
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html) == text
    # boilerplate is actually stripped
    assert "Home" not in t["text"][0].as_py()
    assert "Example Corp" not in t["text"][0].as_py()


def test_real_ontology_index_and_emission():
    """The full mention->triple path against the reference's own ms.obo
    (2 936 terms, 2 815 surfaces): index build + automaton compile stay
    sub-second, detection finds real instrument terms, and a parent-child
    co-mention emits the is_a triple."""
    from fastobo_py_ray.obo import load
    from fastobo_py_ray.stages.canonicalize import union_find
    from fastobo_py_ray.stages.mentions import build_index

    onto = load("/root/reference/tests/data/ms.obo").ontology
    idx = build_index(onto, union_find(onto.equivalence_edges()))
    assert len(idx.surfaces) > 2500
    idx.compile()
    text = ("The Orbitrap mass analyzer acquired a selected ion "
            "monitoring scan with collision-induced dissociation.")
    m, _ = annotate_page(idx, "u", text)
    found = {x[1] for x in m}
    assert {"MS:1000484", "MS:1000205", "MS:1000133"} <= found
    # co-mentioned is_a pair emits the edge (MS:1000001 is_a MS:1000548)
    m2, t2 = annotate_page(
        idx, "u", "The sample number is a kind of sample attribute.")
    assert ("MS:1000001", "is_a", "MS:1000548") in {
        (s, p, o) for s, p, o, *_ in t2}


def test_distributed_union_find_matches_exact(ray_session):
    import random

    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import (
        connected_components, representatives_from_labels, union_find)

    rng = random.Random(7)
    nodes = [f"N:{i:04d}" for i in range(120)]
    edges = []
    for _ in range(150):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    # long chain: worst-case diameter; pointer doubling converges it in
    # O(log diameter) propagate+double rounds
    chain = [f"C:{i:03d}" for i in range(12)]
    edges += list(zip(chain, chain[1:]))

    exact = union_find(edges)
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges]).repartition(5)
    labels = connected_components(ds)
    dist = representatives_from_labels(labels)
    assert dist == exact


def test_contract_cc_matches_exact_and_minlabel(ray_session):
    """Tree-reduce DSU contraction == min-label propagation == driver
    union_find on a graph with chains, stars, and singleton pairs."""
    import random

    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import (
        connected_components_contract, representatives_from_labels,
        union_find)

    rng = random.Random(11)
    nodes = [f"N:{i:04d}" for i in range(200)]
    edges = []
    for _ in range(220):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    chain = [f"C:{i:03d}" for i in range(17)]
    edges += list(zip(chain, chain[1:]))
    hub = "H:000"
    edges += [(hub, f"S:{i:03d}") for i in range(25)]

    exact = union_find(edges, key=lambda s: s)
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges]).repartition(7)
    labels = connected_components_contract(ds)
    dist = representatives_from_labels(labels)
    assert dist == exact
    # every edge endpoint got a label row (roots included)
    got_nodes = {r["node"] for r in labels.take_all()}
    want_nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert got_nodes == want_nodes
    # direct_rows=0 forces the fan-in tree even on this small star set
    # (the default shortcut collapses it in one coalesce) — both routes
    # must pick identical representatives
    tree = connected_components_contract(ds, direct_rows=0, fan_in=2)
    assert representatives_from_labels(tree) == exact

    # regression (5M-doc rehearsal): when the star set exceeds
    # target_max_block_size, repartition(1)'s OUTPUT re-splits into
    # several blocks — the loop must terminate on "one task saw every
    # edge", not on num_blocks()==1, or it re-contracts forever.
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 2048  # force output splitting
    try:
        split = connected_components_contract(ds, fan_in=2)
        assert representatives_from_labels(split) == exact
    finally:
        ctx.target_max_block_size = old


def test_fused_batch_annotate_matches_per_page():
    """annotate_batch_fused is byte-identical to the per-page
    annotate_page reference on a golden corpus batch (incl. ambiguous
    mentions whose link() window would bleed across page boundaries if
    the fused path used the concatenated text)."""
    from fastobo_py_ray.obo import loads as obo_loads
    from fastobo_py_ray.stages.mentions import (annotate_batch_fused,
                                                annotate_page, build_index)
    from fastobo_py_ray.testing.corpus import MINI_OBO, synth_pages_table

    index = build_index(obo_loads(MINI_OBO).ontology)
    t = synth_pages_table(64, seed=5, max_paras=4)
    urls = t["url"].to_pylist()
    texts = t["text"].to_pylist()
    texts[3] = ""          # empty page in the middle

    for emit in ("both", "triples", "mentions"):
        want_m, want_t = [], []
        for u, t in zip(urls, texts):
            if not t:
                continue
            m, tr = annotate_page(index, u, t,
                                  want_mentions=(emit != "triples"))
            want_m.extend(m)
            want_t.extend(tr)
        got_m, got_t = annotate_batch_fused(index, urls, texts, emit=emit)
        if emit != "triples":
            assert got_m == want_m
        if emit != "mentions":
            assert got_t == want_t
    assert want_m and want_t  # the corpus really exercises both outputs


def test_connected_components_bigstar_matches_contract(ray_session):
    """Large-star/small-star rounds (published MapReduce CC algorithm)
    produce the identical (node, label) set as the exact tree-reduce
    contraction on a chain + hot-star graph."""
    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import (
        connected_components_bigstar, connected_components_contract)

    chains = [(f"n{c * 4 + i:05d}", f"n{c * 4 + i + 1:05d}")
              for c in range(120) for i in range(3)]
    star = [("hub", f"s{i:04d}") for i in range(400)]
    edges = pd.DataFrame(chains + star, columns=["a", "b"])
    ds = rd.from_pandas(edges).repartition(8)

    big = connected_components_bigstar(ds, num_buckets=8).to_pandas()
    ref = connected_components_contract(ds).to_pandas()
    m = big.merge(ref, on="node", suffixes=("_b", "_r"), how="outer")
    assert len(m) == len(ref)
    assert (m.label_b == m.label_r).all()
    # hot star resolved to its min label
    assert big.set_index("node").loc["hub", "label"] == "hub"
    assert big.set_index("node").loc["s0000", "label"] == "hub"


def test_connected_components_bigstar_selfloops_and_isolated(ray_session):
    """Self-loop-only nodes keep identity labels (parity with the
    contract implementation), and bigstar raises instead of returning
    unconverged labels when max_rounds is too small."""
    import pytest
    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import (
        connected_components_bigstar, connected_components_contract)

    edges = pd.DataFrame({"a": ["z", "a", "p"],
                          "b": ["z", "b", "p"]})
    ds = rd.from_pandas(edges)
    big = connected_components_bigstar(ds).to_pandas() \
        .set_index("node")["label"].to_dict()
    ref = connected_components_contract(ds).to_pandas() \
        .set_index("node")["label"].to_dict()
    assert big == ref == {"z": "z", "p": "p", "a": "a", "b": "a"}

    # a long chain cannot finish in one round
    chain = pd.DataFrame({"a": [f"c{i:03d}" for i in range(40)],
                          "b": [f"c{i + 1:03d}" for i in range(40)]})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_bigstar(rd.from_pandas(chain), max_rounds=1)


def test_connected_components_bigstar_empty_edges(ray_session):
    import ray.data as rd

    from fastobo_py_ray.stages.canonicalize import \
        connected_components_bigstar

    empty = pd.DataFrame({"a": pd.Series(dtype="string"),
                          "b": pd.Series(dtype="string")})
    out = connected_components_bigstar(rd.from_pandas(empty)).to_pandas()
    assert len(out) == 0


def test_update_adjacency_incremental_equals_full(ray_session, tmp_path):
    """Incremental crawl ingestion: pipeline(A) then update_adjacency(B)
    must be VALUE-identical per bucket to pipeline(A+B) — evidence
    counts additive, confidence max, url samples min-merged — and must
    rewrite only the buckets the delta touches."""
    import os

    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import (annotate_pages,
                                             materialize_adjacency,
                                             update_adjacency)
    from fastobo_py_ray.testing.corpus import synth_pages_table

    P, K = 4, 2
    t = synth_pages_table(120, seed=3)
    A, B = t.slice(0, 80), t.slice(80)

    def build(pages, out):
        idx_ref = ray.put(prepare_index(MINI_OBO))
        d = dedup_triples(annotate_pages(rd.from_arrow(pages), idx_ref,
                                         batch_size=16, langs=["en"]),
                          collect_urls=K)
        materialize_adjacency(d, out, presorted=True, subj_buckets=P)

    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    build(t, full_dir)
    build(A, inc_dir)

    # snapshot untouched-bucket mtimes to prove only touched dirs moved
    pre_mtime = {d: os.stat(os.path.join(inc_dir, d)).st_mtime_ns
                 for d in os.listdir(inc_dir) if d.startswith("subj_")}

    info = update_adjacency(rd.from_arrow(B), MINI_OBO, inc_dir,
                            subj_buckets=P, batch_size=16,
                            langs=["en"], k_urls=K)
    assert info["delta_triples"] > 0 and info["touched_buckets"]

    def load(d):
        df = rd.read_parquet(d).to_pandas()
        df["urls"] = df["urls"].map(tuple)
        df["confidence"] = df["confidence"].astype("float64").round(6)
        cols = ["subj", "pred", "obj", "n_evidence", "confidence",
                "urls"]
        return df[cols].sort_values(["subj", "pred", "obj"]) \
            .reset_index(drop=True)

    pd.testing.assert_frame_equal(load(full_dir), load(inc_dir))

    untouched = [d for d in pre_mtime
                 if int(d.split("=")[1]) not in info["touched_buckets"]]
    for d in untouched:
        assert os.stat(os.path.join(inc_dir, d)).st_mtime_ns \
            == pre_mtime[d]


def test_repair_adjacency_restores_stranded_trash(ray_session, tmp_path):
    """Crash between update_adjacency's two renames leaves
    subj_bucket=K.trash with no live dir; repair must restore it.  A
    trash NEXT TO a live dir is a completed swap's leftover -> deleted."""
    import os
    import shutil

    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import (annotate_pages,
                                             materialize_adjacency,
                                             repair_adjacency)
    from fastobo_py_ray.testing.corpus import synth_pages_table

    out = str(tmp_path / "adj")
    idx_ref = ray.put(prepare_index(MINI_OBO))
    d = dedup_triples(annotate_pages(
        rd.from_arrow(synth_pages_table(60, seed=5)), idx_ref,
        batch_size=16, langs=["en"]))
    materialize_adjacency(d, out, presorted=True, subj_buckets=4)

    buckets = sorted(b for b in os.listdir(out) if b.startswith("subj_"))
    crashed = os.path.join(out, buckets[0])
    os.rename(crashed, crashed + ".trash")          # mid-swap crash
    survivor = os.path.join(out, buckets[1])
    shutil.copytree(survivor, survivor + ".trash")  # completed-swap junk

    restored = repair_adjacency(out)
    assert restored == [crashed]
    assert os.path.isdir(crashed)
    assert not os.path.exists(crashed + ".trash")
    assert not os.path.exists(survivor + ".trash")


def test_khop_subgraph_matches_bfs_reference(ray_session, tmp_path):
    """khop_subgraph over the bucketed adjacency equals a plain BFS
    over the full triple table (same seeds/k), and the guard raises
    rather than truncating."""
    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import (annotate_pages,
                                             khop_subgraph,
                                             materialize_adjacency)
    from fastobo_py_ray.testing.corpus import synth_pages_table

    P = 4
    idx_ref = ray.put(prepare_index(MINI_OBO))
    d = dedup_triples(annotate_pages(
        rd.from_arrow(synth_pages_table(150, seed=9)), idx_ref,
        batch_size=16, langs=["en"]))
    full = d.to_pandas()
    out = str(tmp_path / "adj")
    materialize_adjacency(d, out, presorted=True, subj_buckets=P)

    seeds = sorted(full["subj"].unique())[:1]
    for k in (1, 2, 3):
        got = khop_subgraph(out, seeds, k=k, subj_buckets=P)

        # reference BFS over the collected triple table
        frontier, visited, ref_rows = set(seeds), set(seeds), []
        for hop in range(1, k + 1):
            hit = full[full["subj"].isin(frontier)]
            for r in hit.itertuples():
                ref_rows.append((r.subj, r.pred, r.obj, hop))
            frontier = set(hit["obj"]) - visited
            visited |= frontier
            if not frontier:
                break
        ref = pd.DataFrame(ref_rows, columns=["subj", "pred", "obj",
                                              "hop"]) \
            .sort_values(["hop", "subj", "pred", "obj"]) \
            .reset_index(drop=True)
        got["hop"] = got["hop"].astype("int64")
        ref["hop"] = ref["hop"].astype("int64")
        pd.testing.assert_frame_equal(got, ref)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_frontier"):
        khop_subgraph(out, sorted(full["subj"].unique()), k=2,
                      subj_buckets=P, max_frontier=1)


def test_update_crash_mid_swap_is_completed_not_reapplied(
        ray_session, tmp_path, monkeypatch):
    """A crash in the middle of the swap loop (staging complete, some
    buckets swapped) must be FINISHED by repair_adjacency from the
    staged merge — producing exactly the committed-update state, with
    no double-applied evidence counts."""
    import os

    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines import kg as kgmod
    from fastobo_py_ray.testing.corpus import synth_pages_table

    P = 4
    t = synth_pages_table(120, seed=3)
    A, B = t.slice(0, 80), t.slice(80)

    def build(pages, out):
        idx_ref = ray.put(prepare_index(MINI_OBO))
        d = dedup_triples(kgmod.annotate_pages(
            rd.from_arrow(pages), idx_ref, batch_size=16, langs=["en"]))
        kgmod.materialize_adjacency(d, out, presorted=True,
                                    subj_buckets=P)

    good = str(tmp_path / "good")
    crash = str(tmp_path / "crash")
    build(A, good)
    build(A, crash)

    kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, good,
                           subj_buckets=P, batch_size=16, langs=["en"])

    real_apply = kgmod._apply_swap_plan

    # stage-preserving crash: swap bucket 0 by hand, then die
    def crashy2(adjacency_dir, tmp_root, touched, delta_id=None):
        import shutil
        b = touched[0]
        live = os.path.join(adjacency_dir, f"subj_bucket={b}")
        new = os.path.join(tmp_root, f"subj_bucket={b}")
        trash = live + ".trash"
        if os.path.isdir(live):
            os.rename(live, trash)
        os.rename(new, live)
        shutil.rmtree(trash, ignore_errors=True)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(kgmod, "_apply_swap_plan", crashy2)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated"):
        kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, crash,
                               subj_buckets=P, batch_size=16,
                               langs=["en"])
    monkeypatch.setattr(kgmod, "_apply_swap_plan", real_apply)

    # the staging dir + plan must still be there; repair completes it
    assert os.path.exists(os.path.join(crash, ".delta_merge_tmp",
                                       "_PLAN"))
    completed = kgmod.repair_adjacency(crash)
    assert completed
    assert not os.path.exists(os.path.join(crash, ".delta_merge_tmp"))

    def load(d):
        df = rd.read_parquet(d).to_pandas()
        cols = ["subj", "pred", "obj", "n_evidence"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(load(crash), load(good))


def test_update_delta_id_makes_retry_exactly_once(ray_session, tmp_path,
                                                  monkeypatch):
    """With a delta_id, an at-least-once retry loop is exactly-once:
    (a) a plain re-run with the same id is a no-op, (b) a crash
    mid-swap followed by a RE-RUN (not repair) finishes the pending
    plan, records the ledger, and skips the re-application — final
    state equals a single application."""
    import os

    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines import kg as kgmod
    from fastobo_py_ray.testing.corpus import synth_pages_table

    P = 4
    t = synth_pages_table(120, seed=3)
    A, B = t.slice(0, 80), t.slice(80)

    def build(pages, out):
        idx_ref = ray.put(prepare_index(MINI_OBO))
        d = dedup_triples(kgmod.annotate_pages(
            rd.from_arrow(pages), idx_ref, batch_size=16, langs=["en"]))
        kgmod.materialize_adjacency(d, out, presorted=True,
                                    subj_buckets=P)

    good = str(tmp_path / "good")
    retry = str(tmp_path / "retry")
    build(A, good)
    build(A, retry)
    kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, good,
                           subj_buckets=P, batch_size=16, langs=["en"])

    # (a) plain double-apply with the same id: second call no-ops
    info1 = kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, retry,
                                   subj_buckets=P, batch_size=16,
                                   langs=["en"], delta_id="seg-001")
    assert info1["touched_buckets"]
    info2 = kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, retry,
                                   subj_buckets=P, batch_size=16,
                                   langs=["en"], delta_id="seg-001")
    assert info2.get("skipped") == "seg-001"

    def load(d):
        df = rd.read_parquet(d).to_pandas()
        cols = ["subj", "pred", "obj", "n_evidence"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(load(retry), load(good))

    # (b) crash mid-swap then RE-RUN with the same id
    crash = str(tmp_path / "crash")
    build(A, crash)
    real_apply = kgmod._apply_swap_plan

    def crashy(adjacency_dir, tmp_root, touched, delta_id=None):
        import shutil
        b = touched[0]
        live = os.path.join(adjacency_dir, f"subj_bucket={b}")
        os.rename(os.path.join(tmp_root, f"subj_bucket={b}"),
                  live + ".new")
        shutil.rmtree(live, ignore_errors=True)
        os.rename(live + ".new", live)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(kgmod, "_apply_swap_plan", crashy)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated"):
        kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, crash,
                               subj_buckets=P, batch_size=16,
                               langs=["en"], delta_id="seg-002")
    monkeypatch.setattr(kgmod, "_apply_swap_plan", real_apply)

    info3 = kgmod.update_adjacency(rd.from_arrow(B), MINI_OBO, crash,
                                   subj_buckets=P, batch_size=16,
                                   langs=["en"], delta_id="seg-002")
    assert info3.get("skipped") == "seg-002"   # plan finished -> ledgered
    pd.testing.assert_frame_equal(load(crash), load(good))


def test_verify_adjacency_detects_each_problem(ray_session, tmp_path):
    """fsck: clean store passes; misplaced subjects, unsorted rows,
    schema drift and pending repair artifacts are each reported."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import (annotate_pages,
                                             materialize_adjacency,
                                             verify_adjacency)
    from fastobo_py_ray.testing.corpus import synth_pages_table

    P = 4
    out = str(tmp_path / "adj")
    idx_ref = ray.put(prepare_index(MINI_OBO))
    d = dedup_triples(annotate_pages(
        rd.from_arrow(synth_pages_table(80, seed=7)), idx_ref,
        batch_size=16, langs=["en"]))
    materialize_adjacency(d, out, presorted=True, subj_buckets=P)

    rep = verify_adjacency(out, subj_buckets=P)
    assert rep["problems"] == [] and rep["rows"] > 0

    # (a) misplaced subject: copy a row into the WRONG bucket
    dirs = sorted(os.listdir(out))
    f0 = [os.path.join(out, dirs[0], f)
          for f in os.listdir(os.path.join(out, dirs[0]))
          if f.endswith(".parquet")][0]
    f1dir = os.path.join(out, dirs[1])
    t = pq.read_table(f0)
    pq.write_table(t.slice(0, 1), os.path.join(f1dir, "evil.parquet"))
    rep = verify_adjacency(out, subj_buckets=P)
    assert any("misplaced" in p for p in rep["problems"])
    os.remove(os.path.join(f1dir, "evil.parquet"))

    # (b) unsorted rows
    rev = t.take(list(range(t.num_rows - 1, -1, -1)))
    pq.write_table(rev, f0)
    rep = verify_adjacency(out, subj_buckets=P)
    assert t.num_rows < 2 or any("not (subj,pred,obj)-sorted" in p
                                 for p in rep["problems"])
    pq.write_table(t, f0)

    # (c) schema drift
    extra = t.append_column("rogue", pa.array([1] * t.num_rows))
    pq.write_table(extra, os.path.join(f1dir, "drift.parquet"))
    rep = verify_adjacency(out, subj_buckets=P)
    assert any("schema mismatch" in p for p in rep["problems"])
    os.remove(os.path.join(f1dir, "drift.parquet"))

    # (d) pending repair artifacts
    shutil.copytree(os.path.join(out, dirs[0]),
                    os.path.join(out, dirs[0]) + ".trash")
    rep = verify_adjacency(out, subj_buckets=P)
    assert any("pending repair" in p for p in rep["problems"])


def test_adjacency_lock_mutual_exclusion(tmp_path):
    """The exactly-once ledger span is guarded by an inter-process
    flock (_adjacency_lock): while one process holds it, a second
    process's non-blocking acquire fails, and after release it
    succeeds.  (ADVICE r4: two concurrent updates of the same delta_id
    must not both see an empty ledger.)"""
    import subprocess
    import sys
    import textwrap

    from fastobo_py_ray.pipelines.kg import _adjacency_lock

    adj = str(tmp_path / "adj")
    probe = textwrap.dedent("""
        import sys
        from fastobo_py_ray.pipelines.kg import _adjacency_lock
        try:
            with _adjacency_lock(sys.argv[1], blocking=False):
                print("ACQUIRED")
        except BlockingIOError:
            print("BLOCKED")
    """)

    def probe_once() -> str:
        out = subprocess.run(
            [sys.executable, "-c", probe, adj], capture_output=True,
            text=True, timeout=60)
        assert out.returncode == 0, out.stderr
        return out.stdout.strip()

    with _adjacency_lock(adj):
        assert probe_once() == "BLOCKED"
    assert probe_once() == "ACQUIRED"


def test_dedup_triples_empty_url_tier_parity(ray_session):
    """Evidence rows with url='' must produce IDENTICAL url samples in
    both reduce tiers (the sort-groupby partial used to keep '' — it
    consumed a head-k slot in that tier only)."""
    import ray.data as rd

    rows = pd.DataFrame({
        "subj": ["A"] * 3, "pred": ["is_a"] * 3, "obj": ["B"] * 3,
        "url": ["", "http://b", "http://a"],
        "confidence": [0.5, 0.9, 0.7]})

    out = {}
    for tier in ("sort_groupby", "grouped_agg"):
        df = dedup_triples(rd.from_pandas(rows).repartition(3),
                           collect_urls=2, scale_tier=tier).to_pandas()
        df["urls"] = df["urls"].map(list)
        out[tier] = df.reset_index(drop=True)
    pd.testing.assert_frame_equal(out["sort_groupby"],
                                  out["grouped_agg"])
    assert out["sort_groupby"]["urls"].iloc[0] == ["http://a", "http://b"]
    assert int(out["sort_groupby"]["n_evidence"].iloc[0]) == 3


def test_cooccur_pmi_and_term_ic_crafted(tmp_path, ray_session):
    """Hand-computable corpus grounds both KG mention-layer analytics:
    doc-level PMI over co-mentions and Resnik information content with
    descendant folding (hash is_a join, sort is_a order in DOCS_OBO)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_cooccur_pmi, q_term_ic
    from fastobo_py_ray.testing.corpus import _docs_id

    docs = ["hash join", "hash", "sort order", "the a"]  # doc 4: no terms
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["s"] * 4, pa.string()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string())}),
        tmp_path / "documents.parquet")

    h, j = _docs_id("hash"), _docs_id("join")
    s, o = _docs_id("sort"), _docs_id("order")

    pmi = q_cooccur_pmi(str(tmp_path))
    got = {(a, b): (int(n), float(p)) for a, b, n, p in
           zip(pmi["term_a"], pmi["term_b"], pmi["n_docs"], pmi["pmi"])}
    # N = 3 docs with >=1 mention; pair counts 1 each
    assert got == {
        (min(h, j), max(h, j)): (1, round(math.log(3 / 2), 6)),
        (min(s, o), max(s, o)): (1, round(math.log(3 / 1), 6))}

    ic = q_term_ic(str(tmp_path))
    gic = {t: (int(c), float(v)) for t, c, v in
           zip(ic["term_id"], ic["cum_mentions"], ic["ic"])}
    # mention counts: hash 2, join 1, sort 1, order 1 -> total 5;
    # cum folds strict descendants: join <- hash, order <- sort
    assert gic == {
        h: (2, round(-math.log(2 / 5), 6)),
        j: (3, round(-math.log(3 / 5), 6)),
        s: (1, round(-math.log(1 / 5), 6)),
        o: (2, round(-math.log(2 / 5), 6))}

    from fastobo_py_ray.pipelines.queries import q_resnik_sim

    rs = q_resnik_sim(str(tmp_path))
    grs = {(a, b): (int(n), float(v)) for a, b, n, v in
           zip(rs["term_a"], rs["term_b"], rs["n_docs"], rs["resnik"])}
    # (hash, join): common subsumer-or-self = {join}, cum(join)=3;
    # (order, sort): common = {order}, cum(order)=2
    assert grs == {
        (min(h, j), max(h, j)): (1, round(-math.log(3 / 5), 6)),
        (min(s, o), max(s, o)): (1, round(-math.log(2 / 5), 6))}

    from fastobo_py_ray.pipelines.queries import q_lin_sim

    ls = q_lin_sim(str(tmp_path))
    gls = {(a, b): (int(n), float(v)) for a, b, n, v in
           zip(ls["term_a"], ls["term_b"], ls["n_docs"], ls["lin"])}
    # lin = 2*ln(p_mica) / (ln(p_a) + ln(p_b)) with the cums above
    assert gls == {
        (min(h, j), max(h, j)): (1, round(
            2 * math.log(3 / 5) / (math.log(2 / 5) + math.log(3 / 5)), 6)),
        (min(s, o), max(s, o)): (1, round(
            2 * math.log(2 / 5) / (math.log(1 / 5) + math.log(2 / 5)), 6))}
    # Lin is bounded: every pair lands in [0, 1]
    assert ((ls["lin"] >= 0) & (ls["lin"] <= 1)).all()


def test_mention_depth_crafted(tmp_path, ray_session):
    """q_mention_depth on hand-derivable is_a depths: join/order are
    roots (depth 0), hash/sort sit one level down (depth 1); docs with
    no mentions are absent (inner-join contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_ray.pipelines.queries import q_mention_depth

    docs = ["hash join", "hash hash sort", "the a", "order"]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(docs, pa.string())}),
        tmp_path / "documents.parquet")

    out = q_mention_depth(str(tmp_path))
    got = {int(d): (int(n), int(s), float(v)) for d, n, s, v in
           zip(out["doc_id"], out["n_mentions"], out["depth_sum"],
               out["specificity"])}
    assert got == {1: (2, 1, 0.5),    # hash(1) + join(0)
                   2: (3, 3, 1.0),    # hash(1)*2 + sort(1)
                   4: (1, 0, 0.0)}    # order is a root
