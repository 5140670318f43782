"""CLI smoke test: run -> resume -> report in subprocesses (each owns its
Ray session, mirroring `ray job submit` usage)."""

import json
import os
import subprocess
import sys

from fastobo_py_ray.testing.corpus import MINI_OBO, write_pages_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args):
    r = subprocess.run([sys.executable, "-m", "fastobo_py_ray.cli", *args],
                       capture_output=True, text=True, cwd=REPO,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    return r.stdout.strip().splitlines()


def test_cli_run_resume_report(tmp_path):
    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, n_rows=200, n_files=4)
    obo = tmp_path / "mini.obo"
    obo.write_text(MINI_OBO)

    out = json.loads(_cli("run", "--corpus", corpus, "--obo", str(obo),
                          "--out", str(tmp_path / "adj"),
                          "--langs", "")[-1])
    assert out["n_triples"] > 0

    ck = json.loads(_cli("resume", "--corpus", corpus, "--obo", str(obo),
                         "--out", str(tmp_path / "ckpt"), "--langs", "",
                         "--files-per-partition", "2")[-1])
    assert ck["finalized"] and len(ck["processed"]) >= 2

    # second resume: everything skipped
    ck2 = json.loads(_cli("resume", "--corpus", corpus, "--obo", str(obo),
                          "--out", str(tmp_path / "ckpt"), "--langs", "",
                          "--files-per-partition", "2")[-1])
    assert not ck2["processed"] and ck2["skipped"] == ck["processed"]

    report = _cli("report", "--out", str(tmp_path / "ckpt"))
    manifests = [json.loads(l) for l in report]
    assert len(manifests) == len(ck["processed"])
    assert all(m["n_pages"] > 0 and m["url_min"] for m in manifests)


def test_cli_run_is_atomic_on_rerun(tmp_path):
    """Re-running `run` into the same --out must not mix old and new
    parquet files (old dir is swapped out atomically)."""
    import json
    import subprocess
    import sys

    from fastobo_py_ray.testing.corpus import MINI_OBO, write_pages_corpus

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, n_rows=120, n_files=2)
    obo = tmp_path / "mini.obo"
    obo.write_text(MINI_OBO)
    out = str(tmp_path / "adj")
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(
        [sys.executable, "-m", "fastobo_py_ray.cli", "run", "--corpus",
         corpus, "--obo", str(obo), "--out", out, "--langs", ""],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    n1 = json.loads(r1.stdout.strip().splitlines()[-1])["n_triples"]
    files1 = sorted(os.listdir(out))
    r2 = subprocess.run(
        [sys.executable, "-m", "fastobo_py_ray.cli", "run", "--corpus",
         corpus, "--obo", str(obo), "--out", out, "--langs", ""],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    n2 = json.loads(r2.stdout.strip().splitlines()[-1])["n_triples"]
    assert n2 == n1
    # no .tmp residue, and no accumulation of stale files
    assert sorted(os.listdir(out)) and not os.path.isdir(out + ".tmp")
    assert len(os.listdir(out)) == len(files1)


def test_cli_curate(tmp_path):
    """curate subcommand: funnel counts printed, packed parquet written,
    atomic overwrite on re-run."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(5)
    vocab = ["the", "and", "of", "to", "is"] + [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(80)]
    texts += texts[:10]  # exact dups
    docs = tmp_path / "docs"
    docs.mkdir()
    pq.write_table(pa.table({"doc_id": list(range(len(texts))),
                             "text": texts}),
                   docs / "part0.parquet")

    out = json.loads(_cli("curate", "--corpus", str(docs),
                          "--out", str(tmp_path / "packed"),
                          "--min-quality", "0.0")[-1])
    assert out["input"] == 90
    assert out["after_exact_dedup"] == 80          # dups removed
    assert out["packed_docs"] == out["after_decontam"]
    got = pq.read_table(str(tmp_path / "packed")).to_pandas()
    assert sorted(got.columns) == ["doc_id", "n_tokens", "pack_id",
                                   "split"]
    assert len(got) == out["packed_docs"]

    # re-run overwrites atomically (no stale files mixed in)
    out2 = json.loads(_cli("curate", "--corpus", str(docs),
                           "--out", str(tmp_path / "packed"),
                           "--min-quality", "0.0")[-1])
    got2 = pq.read_table(str(tmp_path / "packed")).to_pandas()
    assert len(got2) == out2["packed_docs"] == out["packed_docs"]

    # --bench wiring: a benchmark sharing grams with the corpus drops
    # contaminated docs at the decontamination stage
    bench = tmp_path / "bench"
    bench.mkdir()
    pq.write_table(pa.table({"doc_id": [10_000],
                             "text": [texts[20]]}),
                   bench / "b.parquet")
    out3 = json.loads(_cli("curate", "--corpus", str(docs),
                           "--out", str(tmp_path / "packed2"),
                           "--bench", str(bench),
                           "--min-quality", "0.0")[-1])
    assert out3["after_decontam"] < out3["after_near_dedup"]


def test_cli_run_bucketed_then_update(tmp_path):
    """`run --subj-buckets P` writes the hive layout; `update` merges a
    new page batch touching only delta buckets; total evidence equals a
    single run over both corpora."""
    base = str(tmp_path / "base")
    delta = str(tmp_path / "delta")
    write_pages_corpus(base, n_rows=150, n_files=3)
    write_pages_corpus(delta, n_rows=80, n_files=2, seed=99)
    obo = tmp_path / "mini.obo"
    obo.write_text(MINI_OBO)
    adj = str(tmp_path / "adj")

    out = json.loads(_cli("run", "--corpus", base, "--obo", str(obo),
                          "--out", adj, "--langs", "",
                          "--subj-buckets", "4")[-1])
    assert out["n_triples"] > 0

    up = json.loads(_cli("update", "--corpus", delta, "--obo", str(obo),
                         "--out", adj, "--subj-buckets", "4",
                         "--langs", "")[-1])
    assert up["delta_triples"] > 0 and up["touched_buckets"]
    assert up["repaired"] == []

    # evidence totals equal a from-scratch run over base + delta
    full = str(tmp_path / "full")
    both = str(tmp_path / "both")
    os.makedirs(both)
    for src in (base, delta):
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(src, f),
                           os.path.join(both, f"{os.path.basename(src)}-{f}"))
    _cli("run", "--corpus", both, "--obo", str(obo), "--out", full,
         "--langs", "", "--subj-buckets", "4")

    import pyarrow.parquet as pq

    cols = ["subj", "pred", "obj", "n_evidence"]
    a = pq.read_table(adj).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    b = pq.read_table(full).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_cli_refresh(tmp_path):
    """`refresh --old-obo v1 --new-obo v2` rewrites a bucketed store to
    the new release; result equals a from-scratch run under v2, and a
    retried --refresh-id is a ledgered no-op."""
    base = str(tmp_path / "base")
    write_pages_corpus(base, n_rows=120, n_files=3)
    v1 = tmp_path / "v1.obo"
    v1.write_text(MINI_OBO)
    v2_text = MINI_OBO.replace(
        "is_a: TST:0000002\n\n[Term]\nid: TST:0000005",
        "is_a: TST:0000003\n\n[Term]\nid: TST:0000005")
    v2 = tmp_path / "v2.obo"
    v2.write_text(v2_text)
    adj = str(tmp_path / "adj")
    full2 = str(tmp_path / "full2")

    _cli("run", "--corpus", base, "--obo", str(v1), "--out", adj,
         "--langs", "", "--subj-buckets", "4")
    ref = json.loads(_cli(
        "refresh", "--corpus", base, "--old-obo", str(v1),
        "--new-obo", str(v2), "--out", adj, "--subj-buckets", "4",
        "--langs", "", "--refresh-id", "rel-2",
        "--max-affected-fraction", "1.0")[-1])
    assert ref["mode"] == "selective" and ref["touched_buckets"]

    _cli("run", "--corpus", base, "--obo", str(v2), "--out", full2,
         "--langs", "", "--subj-buckets", "4")

    import pyarrow.parquet as pq

    cols = ["subj", "pred", "obj", "n_evidence"]
    a = pq.read_table(adj).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    b = pq.read_table(full2).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    again = json.loads(_cli(
        "refresh", "--corpus", base, "--old-obo", str(v1),
        "--new-obo", str(v2), "--out", adj, "--subj-buckets", "4",
        "--langs", "", "--refresh-id", "rel-2",
        "--max-affected-fraction", "1.0")[-1])
    assert again["skipped"] == "rel-2"
