"""S10 — checkpointed, resumable KG pipeline with per-partition lineage.

North-rule requirement: "checkpoints per-partition with lineage manifests
(input url ranges, triple counts, stage timings), and resumes mid-run by
skipping completed partitions" (BASELINE.json north_star).

Design (scale-first):

* A **partition** is a deterministic group of input parquet files (the
  unit of resume).  At 10^12-doc scale each partition is one Common-Crawl
  segment / file range; here it's ``files_per_partition`` shards.
* **Stage A (expensive, resumable)**: per partition, run the page-local
  part of the pipeline (fused extract+annotate) plus the per-partition
  triple pre-reduce, and write the partial counts to
  ``out_root/parts/part-<key>/``.  The write is atomic (tmp dir +
  ``os.replace``) and the lineage manifest is written last, so a crash
  mid-partition leaves no manifest and the partition simply re-runs —
  idempotent, no double-counted evidence.
* **Stage B (cheap, global)**: read every partition's partials, final
  ``groupby(subj,pred,obj).sum`` and range-sorted adjacency write.  Stage
  B moves only pre-reduced rows (KB-to-MB per partition), so re-running
  it on resume costs ~nothing; correctness never depends on how many
  times it ran.

Manifest row (one JSON file per partition under ``out_root/manifests/``):
``{key, input_files, url_min, url_max, n_pages, n_triples_partial,
wall_s, stage: "annotate+partial_dedup"}``.

The reference has no checkpointing (single-process library); this is the
engine projection of its error-taxonomy discipline
(``/root/reference/src/error.rs:38-60``) onto partition-grained fault
tolerance.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

from .kg import annotate_pages, dedup_triples, materialize_adjacency, \
    prepare_index

MANIFEST_DIR = "manifests"
PARTS_DIR = "parts"


def partition_input_files(files: Sequence[str],
                          files_per_partition: int = 4
                          ) -> Dict[str, List[str]]:
    """Deterministic partition key -> file list (sorted, contiguous)."""
    files = sorted(files)
    out = {}
    for i in range(0, len(files), files_per_partition):
        chunk = files[i:i + files_per_partition]
        out[f"{i // files_per_partition:05d}"] = chunk
    return out


def completed_partitions(out_root: str) -> Dict[str, dict]:
    """key -> manifest for every partition with a committed manifest."""
    mdir = os.path.join(out_root, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                m = json.load(fh)
            out[m["key"]] = m
    return out


_OP_STATS_RE = None


def _stage_timings(ds) -> dict:
    """Per-operator wall seconds for an EXECUTED dataset, parsed from
    ``ds.stats()`` (lines like ``Operator 2 MapBatches(f)->Write: 16
    tasks executed, 16 blocks produced in 0.35s``) — the north-rule's
    per-partition 'stage timings' lineage field. Best-effort: an
    unrecognized stats format yields {} rather than failing the
    partition commit."""
    global _OP_STATS_RE
    import re

    if _OP_STATS_RE is None:
        _OP_STATS_RE = re.compile(
            r"^Operator \d+ (.+?): .*? in ([0-9.]+)s", re.MULTILINE)
    try:
        out: dict = {}
        for name, sec in _OP_STATS_RE.findall(ds.stats()):
            # identically-named operators (two MapBatches(<lambda>)
            # stages) sum rather than silently overwriting
            out[name] = round(out.get(name, 0.0) + float(sec), 4)
        return out
    except Exception:
        return {}


def _run_partition(key: str, files: List[str], index_ref, out_root: str,
                   batch_size: int, langs) -> dict:
    """Stage A for one partition: annotate -> partial dedup -> atomic
    write -> manifest.  Returns the manifest dict."""
    import ray.data as rd

    t0 = time.perf_counter()
    part_final = os.path.join(out_root, PARTS_DIR, f"part-{key}")
    part_tmp = part_final + ".tmp"
    import shutil

    shutil.rmtree(part_tmp, ignore_errors=True)
    shutil.rmtree(part_final, ignore_errors=True)

    pages = rd.read_parquet(files)
    triples = annotate_pages(pages, index_ref, emit="triples",
                             batch_size=batch_size,
                             langs=list(langs) if langs else None)
    # per-partition pre-reduce only — the global reduce is stage B
    partial = dedup_triples(triples, num_partitions=1)
    partial.write_parquet(part_tmp)
    os.replace(part_tmp, part_final)

    # lineage: url range + counts from the written partials / input meta
    import pyarrow.dataset as pds

    n_pages = pds.dataset(files).count_rows()
    part_ds = pds.dataset(part_final)
    n_triples = part_ds.count_rows()
    url_range = _url_range(files)
    manifest = {
        "key": key,
        "input_files": [os.path.basename(f) for f in files],
        "url_min": url_range[0], "url_max": url_range[1],
        "n_pages": int(n_pages),
        "n_triples_partial": int(n_triples),
        "wall_s": round(time.perf_counter() - t0, 3),
        "stage": "annotate+partial_dedup",
        "stage_timings": _stage_timings(partial),
    }
    mdir = os.path.join(out_root, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f"{key}.json.tmp")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(mtmp, os.path.join(mdir, f"{key}.json"))
    return manifest


def _url_range(files: List[str], column: str = "url"):
    """Min/max of ``column`` per partition from parquet column statistics
    — lineage without scanning data.  The column is located BY NAME in
    each file's schema (never positionally)."""
    import pyarrow.parquet as pq

    lo = hi = None
    for f in files:
        pf = pq.ParquetFile(f)
        try:
            ci = pf.schema_arrow.names.index(column)
        except ValueError:
            continue
        md = pf.metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            if col.statistics is None:
                continue
            mn, mx = col.statistics.min, col.statistics.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
    return lo, hi


def run_kg_pipeline_resumable(corpus_files: Sequence[str], obo_text: str,
                              out_root: str, files_per_partition: int = 4,
                              batch_size: int = 1024,
                              langs: Optional[Sequence[str]] = ("en",),
                              max_partitions: Optional[int] = None,
                              skip_finalize: bool = False) -> dict:
    """Checkpointed end-to-end run.  Safe to re-invoke after a crash: Stage
    A partitions with a committed manifest are skipped; Stage B always
    re-runs (cheap, idempotent).

    ``max_partitions`` stops after N newly-processed partitions (fault-
    injection hook for tests); ``skip_finalize`` skips stage B.

    Returns {"processed": [...keys...], "skipped": [...], "manifests":
    {...}, "adjacency_dir": ...}.
    """
    import shutil

    import ray

    from ..context import tune_data_context

    tune_data_context()
    parts = partition_input_files(corpus_files, files_per_partition)
    done = completed_partitions(out_root)
    # A manifest only counts if its recorded input files match THIS run's
    # partitioning — changing files_per_partition or the corpus between
    # invocations must re-run (and stale part dirs must not leak into the
    # finalize glob), otherwise evidence would be double-counted.
    valid: Dict[str, dict] = {}
    for key, files in parts.items():
        m = done.get(key)
        if m and m.get("input_files") == [os.path.basename(f)
                                          for f in files]:
            valid[key] = m
    stale = set(done) - set(valid)
    for key in stale:
        shutil.rmtree(os.path.join(out_root, PARTS_DIR, f"part-{key}"),
                      ignore_errors=True)
        try:
            os.remove(os.path.join(out_root, MANIFEST_DIR, f"{key}.json"))
        except FileNotFoundError:
            pass
    index_ref = None
    processed, skipped = [], []
    for key, files in parts.items():
        if key in valid:
            skipped.append(key)
            continue
        if max_partitions is not None and len(processed) >= max_partitions:
            break
        if index_ref is None:  # broadcast once, lazily
            index_ref = ray.put(prepare_index(obo_text))
        valid[key] = _run_partition(key, files, index_ref, out_root,
                                    batch_size, langs)
        processed.append(key)
    adjacency_dir = os.path.join(out_root, "adjacency")
    finalized = False
    if not skip_finalize and len(valid) == len(parts):
        finalize_adjacency(out_root, adjacency_dir)
        finalized = True
    return {"processed": processed, "skipped": skipped,
            "manifests": valid, "finalized": finalized,
            "adjacency_dir": adjacency_dir}


def finalize_adjacency(out_root: str, adjacency_dir: str,
                       orphan_grace_s: float = 300.0):
    """Stage B: global reduce over all partition partials -> sorted
    partitioned adjacency parquet.

    Only part dirs backed by a committed manifest participate.  Three
    guards against double/under-counted evidence:

    * the manifests' recorded input files must be pairwise DISJOINT —
      leftovers from a run with a different ``files_per_partition``
      overlap the new partitioning's coverage and would double-count
      n_evidence, so finalize refuses loudly (the resumable runner
      cleans such leftovers itself; this guard covers standalone
      finalize calls against a mixed-history out_root);
    * an orphan part dir (no manifest) is deleted only after
      ``orphan_grace_s`` seconds of mtime-quiet — a concurrent writer
      that has renamed its dir but not yet written the manifest is
      left alone.  The grace period is a heuristic, not a lock: a
      writer whose manifest write stalls LONGER than ``orphan_grace_s``
      (e.g. a slow shared filesystem) would still lose its partition,
      so finalize must not run concurrently with active writers —
      run it after the writer pool has drained (the resumable runner
      does), or raise ``orphan_grace_s`` to the filesystem's worst
      observed stall;
    * a manifest whose part dir is missing fails loudly (silent
      under-count otherwise)."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    manifests = completed_partitions(out_root)
    seen: Dict[str, str] = {}
    for key, m in sorted(manifests.items()):
        for f in m.get("input_files", ()):
            if f in seen:
                raise RuntimeError(
                    f"finalize_adjacency: input file {f!r} is covered by "
                    f"manifests {seen[f]!r} and {key!r} — mixed "
                    f"partitioning history (files_per_partition changed "
                    f"between runs?); re-run the resumable pipeline (it "
                    f"cleans stale partitions) or delete the stale "
                    f"manifests+part dirs before finalizing.")
            seen[f] = key
    valid_keys = set(manifests)
    parts_glob = os.path.join(out_root, PARTS_DIR)
    part_files = []
    present = set()
    for d in sorted(os.listdir(parts_glob)):
        if not d.startswith("part-"):
            continue
        full = os.path.join(parts_glob, d)
        key = d[len("part-"):]
        if d.endswith(".tmp") or key not in valid_keys:
            # orphan: manifest missing.  Delete only when quiet — a
            # writer mid-commit (dir renamed, manifest not yet written)
            # must not lose its partition.
            try:
                quiet = time.time() - os.path.getmtime(full)
            except OSError:
                continue
            if quiet >= orphan_grace_s:
                shutil.rmtree(full, ignore_errors=True)
            continue
        present.add(key)
        part_files += [os.path.join(full, f)
                       for f in sorted(os.listdir(full))
                       if f.endswith(".parquet")]
    missing = valid_keys - present
    if missing:
        raise RuntimeError(
            f"finalize_adjacency: manifests exist for partitions "
            f"{sorted(missing)} but their part dirs are gone; delete the "
            f"stale manifests and re-run to reprocess those partitions.")
    partials = rd.read_parquet(part_files)
    final = partials.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("n_evidence", alias_name="n_evidence"),
        Max("confidence", alias_name="confidence"))
    tmp = adjacency_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(adjacency_dir, ignore_errors=True)
    materialize_adjacency(final, tmp, presorted=True)
    os.replace(tmp, adjacency_dir)
