"""S10 checkpoint/lineage/resume tests (north-rule: resume mid-run by
skipping completed partitions; no double-counted evidence)."""

import json
import os
import time

import pandas as pd

from fastobo_py_ray.pipelines.checkpoint import (completed_partitions,
                                                 partition_input_files,
                                                 run_kg_pipeline_resumable)
from fastobo_py_ray.pipelines.kg import run_kg_pipeline
from fastobo_py_ray.testing.corpus import MINI_OBO, write_pages_corpus


def _triples(df: pd.DataFrame) -> dict:
    return {(r.subj, r.pred, r.obj): int(r.n_evidence)
            for r in df.itertuples()}


def test_resume_skips_completed_and_matches_direct(ray_session, tmp_path):
    import ray.data as rd

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=400, n_files=8)
    out_root = str(tmp_path / "ckpt")

    # "crash" after 2 of 4 partitions (fault injection)
    r1 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=3, langs=None,
                                   max_partitions=2)
    assert len(r1["processed"]) == 2 and not r1["finalized"]
    done = completed_partitions(out_root)
    assert set(done) == set(r1["processed"])
    mtimes = {k: os.path.getmtime(
        os.path.join(out_root, "manifests", f"{k}.json")) for k in done}

    # resume: completes the rest, does NOT recompute finished partitions
    r2 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=3, langs=None)
    assert set(r2["skipped"]) == set(r1["processed"])
    assert r2["finalized"]
    for k, t in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out_root, "manifests", f"{k}.json")) == t

    # lineage manifests carry url ranges, counts and timings
    n_parts = len(partition_input_files(files, 3))
    assert len(r2["manifests"]) == n_parts
    for m in r2["manifests"].values():
        assert m["url_min"] and m["url_max"] and m["n_pages"] > 0
        assert m["wall_s"] >= 0 and m["input_files"]
        # per-operator stage timings (north-rule lineage field)
        assert m["stage_timings"] and all(
            v >= 0 for v in m["stage_timings"].values())

    # final adjacency == the non-checkpointed pipeline, evidence counts
    # included (idempotent resume, no double counting)
    direct = run_kg_pipeline(rd.read_parquet(files), MINI_OBO,
                             langs=None).to_pandas()
    resumed = rd.read_parquet(r2["adjacency_dir"]).to_pandas()
    assert _triples(resumed) == _triples(direct)

    # re-invoking on a complete run is a no-op apart from stage B
    r3 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=3, langs=None)
    assert not r3["processed"] and len(r3["skipped"]) == n_parts


def test_changed_partition_width_invalidates_stale_manifests(ray_session,
                                                             tmp_path):
    """Re-invoking with a different files_per_partition must NOT reuse
    manifests whose input file sets no longer match — stale partials
    would double-count evidence."""
    import ray.data as rd

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=240, n_files=6)
    out_root = str(tmp_path / "ckpt")
    # partial run at width 4, crash after 1 partition
    r1 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=4, langs=None,
                                   max_partitions=1)
    assert len(r1["processed"]) == 1
    # resume at width 2: every stale manifest is discarded and re-run
    r2 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=2, langs=None)
    assert r2["finalized"] and not r2["skipped"]
    direct = run_kg_pipeline(rd.read_parquet(files), MINI_OBO,
                             langs=None).to_pandas()
    resumed = rd.read_parquet(r2["adjacency_dir"]).to_pandas()
    assert _triples(resumed) == _triples(direct)  # no double counting


def test_crashed_tmp_partial_is_ignored_and_rerun(ray_session, tmp_path):
    """A partition that crashed mid-write leaves part-XXX.tmp and no
    manifest; resume must re-run it and finalize must never read the
    stray tmp dir."""
    import pyarrow.parquet as pq
    import ray.data as rd

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=200, n_files=4)
    out_root = str(tmp_path / "ckpt")
    # simulate a crash: garbage half-written partial, no manifest
    tmpdir = os.path.join(out_root, "parts", "part-00001.tmp")
    os.makedirs(tmpdir)
    pq.write_table(pd.DataFrame({"subj": ["junk"], "pred": ["junk"],
                                 "obj": ["junk"], "n_evidence": [999],
                                 "confidence": [0.0]}).pipe(
        lambda df: __import__("pyarrow").Table.from_pandas(df)),
        os.path.join(tmpdir, "junk.parquet"))

    n_parts = len(partition_input_files(files, 2))
    r = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                  files_per_partition=2, langs=None)
    assert r["finalized"] and len(r["processed"]) == n_parts
    adj = rd.read_parquet(r["adjacency_dir"]).to_pandas()
    assert "junk" not in set(adj["subj"])
    direct = run_kg_pipeline(rd.read_parquet(files), MINI_OBO,
                             langs=None).to_pandas()
    assert _triples(adj) == _triples(direct)


def test_resume_invariant_across_partition_width(ray_session, tmp_path):
    """Final adjacency identical whatever the partition granularity
    (north-rule invariance: results independent of partitioning)."""
    import ray.data as rd

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=300, n_files=6)
    outs = []
    for i, width in enumerate((1, 5)):
        root = str(tmp_path / f"ckpt{i}")
        r = run_kg_pipeline_resumable(files, MINI_OBO, root,
                                      files_per_partition=width,
                                      langs=None)
        assert r["finalized"]
        outs.append(_triples(rd.read_parquet(r["adjacency_dir"])
                             .to_pandas()))
    assert outs[0] == outs[1]


def test_partitioning_is_deterministic(tmp_path):
    files = [f"/x/pages-{i:04d}.parquet" for i in range(10)]
    a = partition_input_files(files, 4)
    b = partition_input_files(list(reversed(files)), 4)
    assert a == b
    assert [len(v) for v in a.values()] == [4, 4, 2]


def test_orphan_part_dir_excluded_from_finalize(ray_session, tmp_path):
    """A part dir committed via os.replace whose manifest write crashed
    (or left over from a different files_per_partition) must not leak
    into the global reduce; a manifest whose part dir vanished must fail
    loudly instead of silently under-counting."""
    import shutil

    import pytest
    import ray.data as rd

    from fastobo_py_ray.pipelines.checkpoint import finalize_adjacency

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=200, n_files=4)
    out_root = str(tmp_path / "ckpt")
    res = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                    files_per_partition=2, langs=None)
    assert res["finalized"]
    clean = rd.read_parquet(res["adjacency_dir"]).to_pandas()

    # orphan: duplicate an existing part dir under a key with no manifest
    parts = os.path.join(out_root, "parts")
    some = sorted(d for d in os.listdir(parts) if d.startswith("part-"))[0]
    orphan = os.path.join(parts, "part-99999")
    shutil.copytree(os.path.join(parts, some), orphan)
    # a FRESH orphan may be a concurrent writer mid-commit (dir renamed,
    # manifest not yet written): excluded from the reduce but NOT deleted
    finalize_adjacency(out_root, res["adjacency_dir"])
    refinal = rd.read_parquet(res["adjacency_dir"]).to_pandas()
    assert _triples(refinal) == _triples(clean)  # no double counting
    assert os.path.isdir(orphan)                 # writer-safe: kept
    # once quiet past the grace period it is garbage and gets collected
    old = time.time() - 3600
    os.utime(orphan, (old, old))
    finalize_adjacency(out_root, res["adjacency_dir"])
    assert _triples(rd.read_parquet(res["adjacency_dir"]).to_pandas()) \
        == _triples(clean)
    assert not os.path.isdir(orphan)             # orphan cleaned up

    # manifests whose input files OVERLAP (mixed partitioning history,
    # e.g. leftovers from another files_per_partition) -> loud failure,
    # never a silent double-count
    first = sorted(completed_partitions(out_root))[0]
    mdir = os.path.join(out_root, "manifests")
    with open(os.path.join(mdir, f"{first}.json")) as fh:
        stale = json.load(fh)
    stale["key"] = "zzzzz"
    with open(os.path.join(mdir, "zzzzz.json"), "w") as fh:
        json.dump(stale, fh)
    shutil.copytree(os.path.join(parts, f"part-{first}"),
                    os.path.join(parts, "part-zzzzz"))
    with pytest.raises(RuntimeError, match="covered by manifests"):
        finalize_adjacency(out_root, res["adjacency_dir"])
    os.remove(os.path.join(mdir, "zzzzz.json"))
    shutil.rmtree(os.path.join(parts, "part-zzzzz"))

    # manifest without part dir -> loud failure
    victim = sorted(completed_partitions(out_root))[0]
    shutil.rmtree(os.path.join(parts, f"part-{victim}"))
    with pytest.raises(RuntimeError, match="part dirs are gone"):
        finalize_adjacency(out_root, res["adjacency_dir"])


def test_incremental_append_processes_only_new_partitions(ray_session,
                                                          tmp_path):
    """The 'new crawl arrives' flow: after a finalized run, appending
    input files and re-invoking processes ONLY the new partitions (old
    manifests stay valid because partition file lists are contiguous
    chunks of the sorted name order), and the refreshed adjacency
    equals the direct pipeline over the full corpus."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from fastobo_py_ray.pipelines.kg import run_kg_pipeline

    corpus = str(tmp_path / "pages")
    files = write_pages_corpus(corpus, n_rows=200, n_files=4)
    out_root = str(tmp_path / "ckpt")
    r1 = run_kg_pipeline_resumable(files, MINI_OBO, out_root,
                                   files_per_partition=2, langs=None)
    assert r1["finalized"]
    old_keys = set(r1["processed"])

    # appended files sort AFTER the existing ones (crawl batches do)
    extra_dir = str(tmp_path / "extra")
    extra = write_pages_corpus(extra_dir, n_rows=100, n_files=2,
                               seed=7, include_golden=False)
    appended = []
    for i, f in enumerate(extra):
        dst = os.path.join(corpus, f"pages-z{i:04d}.parquet")
        shutil.copy(f, dst)
        appended.append(dst)

    all_files = sorted(files + appended)
    # partitions whose file list is unchanged by the append are skipped;
    # a trailing partial partition that absorbed a new file is correctly
    # invalidated and re-run (its input set changed)
    old_parts = partition_input_files(files, 2)
    new_parts = partition_input_files(all_files, 2)
    unchanged = {k for k, v in new_parts.items()
                 if old_parts.get(k) == v}
    assert unchanged  # the append must leave some prefix intact
    r2 = run_kg_pipeline_resumable(all_files, MINI_OBO, out_root,
                                   files_per_partition=2, langs=None)
    assert set(r2["skipped"]) == unchanged
    assert set(r2["processed"]) == set(new_parts) - unchanged
    assert r2["finalized"]

    direct = run_kg_pipeline(rd.read_parquet(all_files), MINI_OBO,
                             langs=None).to_pandas()
    resumed = pq.read_table(r2["adjacency_dir"]).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        resumed.sort_values(key).reset_index(drop=True)[
            ["subj", "pred", "obj", "n_evidence"]],
        direct.sort_values(key).reset_index(drop=True)[
            ["subj", "pred", "obj", "n_evidence"]])
