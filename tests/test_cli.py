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
