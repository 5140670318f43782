"""CLI — the `ray job submit` entry point of the engine.

    python -m fastobo_py_ray.cli run --corpus DIR --obo FILE --out DIR
    python -m fastobo_py_ray.cli resume --corpus DIR --obo FILE --out DIR
    python -m fastobo_py_ray.cli report --out DIR
    python -m fastobo_py_ray.cli curate --corpus DIR --out DIR [--bench DIR]

`run` executes the full KG pipeline in one pass; `resume` is the
checkpointed S10 path (safe to re-invoke after a crash — finished
partitions are skipped via their lineage manifests); `report` prints the
per-partition manifest metrics (url ranges, counts, stage timings).

Owns its Ray session (guarded init) per the driver contract: library code
never calls ray.init, CLI entry points do.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")


def _swap_in(tmp: str, out: str) -> None:
    """Crash-safe output swap: the previous run's directory is renamed
    aside (cheap) before the new one replaces it, so a kill between the
    two renames leaves EITHER the old output at ``out`` or the old at
    ``.old`` + new at ``.tmp`` — never a destroyed output with nothing
    in its place (plain rmtree-then-replace has that window)."""
    import shutil

    old = out.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out):
        os.replace(out, old)
    os.replace(tmp, out)
    shutil.rmtree(old, ignore_errors=True)


def cmd_run(args) -> int:
    import shutil

    import ray.data as rd

    from .pipelines.kg import run_kg_pipeline

    _init_ray()
    pages = rd.read_parquet(args.corpus)
    obo_text = open(args.obo).read()
    # atomic output (mirrors the checkpoint path): write to .tmp, then
    # swap — re-running into a non-empty --out must never leave old
    # parquet beside new (a reader of the dir would mix both runs)
    tmp = args.out.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    run_kg_pipeline(pages, obo_text, out_dir=tmp,
                    batch_size=args.batch_size,
                    langs=args.langs.split(",") if args.langs else None,
                    subj_buckets=args.subj_buckets,
                    k_urls=args.k_urls)
    _swap_in(tmp, args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"adjacency_dir": args.out, "n_triples": int(n)}))
    return 0


def cmd_resume(args) -> int:
    from .pipelines.checkpoint import run_kg_pipeline_resumable

    _init_ray()
    files = sorted(os.path.join(args.corpus, f)
                   for f in os.listdir(args.corpus)
                   if f.endswith(".parquet"))
    obo_text = open(args.obo).read()
    res = run_kg_pipeline_resumable(
        files, obo_text, args.out,
        files_per_partition=args.files_per_partition,
        batch_size=args.batch_size,
        langs=args.langs.split(",") if args.langs else None)
    print(json.dumps({"processed": res["processed"],
                      "skipped": res["skipped"],
                      "finalized": res["finalized"],
                      "adjacency_dir": res["adjacency_dir"]}))
    return 0


def cmd_curate(args) -> int:
    """Training-data curation funnel over a documents parquet dir:
    quality gates -> exact dedup -> near-dup removal ->
    [decontamination vs --bench] -> split + packing; writes the packed
    assignment as partitioned parquet and prints the funnel counts."""
    import shutil

    import ray.data as rd

    from .pipelines.curation import curate

    _init_ray()
    docs = rd.read_parquet(args.corpus, columns=["doc_id", "text"])
    bench = rd.read_parquet(args.bench, columns=["doc_id", "text"]) \
        if args.bench else None
    packed, stats = curate(docs, bench_ds=bench,
                           min_quality=args.min_quality,
                           pack_budget=args.pack_budget,
                           work_dir=args.work_dir, resume=args.resume,
                           input_fingerprint=args.input_fingerprint)
    tmp = args.out.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # hive-partitioned by split so a training consumer reads only
    # split=train without touching the val files
    packed.write_parquet(tmp, partition_cols=["split"])
    _swap_in(tmp, args.out)
    print(json.dumps({"out": args.out, **stats}))
    return 0


def cmd_update(args) -> int:
    """Incremental crawl ingestion: merge a NEW page batch into an
    existing subject-bucketed adjacency (written by a prior run with
    bucketed output), rewriting only the touched buckets.  Runs
    repair first so a previously crashed update never loses a
    bucket."""
    import ray.data as rd

    from .pipelines.kg import repair_adjacency, update_adjacency

    _init_ray()
    restored = repair_adjacency(args.out)
    pages = rd.read_parquet(args.corpus)
    obo_text = open(args.obo).read()
    info = update_adjacency(
        pages, obo_text, args.out, subj_buckets=args.subj_buckets,
        batch_size=args.batch_size,
        langs=args.langs.split(",") if args.langs else None,
        k_urls=args.k_urls, delta_id=args.delta_id)
    print(json.dumps({"adjacency_dir": args.out,
                      "repaired": restored, **info}))
    return 0


def cmd_refresh(args) -> int:
    """Ontology-release refresh: diff the old/new OBO releases, close
    the affected-term set, re-annotate the corpus with the new
    ontology, and rewrite only the adjacency buckets the delta touches
    (full staged rebuild on header change or past
    --max-affected-fraction).  Same corpus as the store was built from;
    crawl deltas go through ``update`` first."""
    import ray.data as rd

    from .pipelines.kg import repair_adjacency
    from .pipelines.refresh import refresh_adjacency

    _init_ray()
    restored = repair_adjacency(args.out)
    pages = rd.read_parquet(args.corpus)
    info = refresh_adjacency(
        pages, open(args.old_obo).read(), open(args.new_obo).read(),
        args.out, subj_buckets=args.subj_buckets,
        batch_size=args.batch_size,
        langs=args.langs.split(",") if args.langs else None,
        k_urls=args.k_urls, refresh_id=args.refresh_id,
        max_affected_fraction=args.max_affected_fraction)
    print(json.dumps({"adjacency_dir": args.out,
                      "repaired": restored, **info}))
    return 0


def cmd_fsck(args) -> int:
    """Integrity check for a bucketed adjacency store (misplaced
    subjects, unsorted rows, schema drift, pending repair artifacts);
    exit 1 when problems are found."""
    from .pipelines.kg import verify_adjacency

    rep = verify_adjacency(args.out, subj_buckets=args.subj_buckets)
    print(json.dumps(rep))
    return 1 if rep["problems"] else 0


def cmd_report(args) -> int:
    from .pipelines.checkpoint import completed_partitions

    for key, m in sorted(completed_partitions(args.out).items()):
        print(json.dumps(m))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fastobo_py_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("run", cmd_run), ("resume", cmd_resume)):
        s = sub.add_parser(name)
        s.add_argument("--corpus", required=True)
        s.add_argument("--obo", required=True)
        s.add_argument("--out", required=True)
        s.add_argument("--batch-size", type=int, default=1024,
                       dest="batch_size")
        s.add_argument("--langs", default="en")
        if name == "resume":
            s.add_argument("--files-per-partition", type=int, default=4,
                           dest="files_per_partition")
        if name == "run":
            s.add_argument("--subj-buckets", type=int, default=0,
                           dest="subj_buckets")
            s.add_argument("--k-urls", type=int, default=0,
                           dest="k_urls")
        s.set_defaults(fn=fn)
    s = sub.add_parser("update")
    s.add_argument("--corpus", required=True)
    s.add_argument("--obo", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--subj-buckets", type=int, required=True,
                   dest="subj_buckets")
    s.add_argument("--batch-size", type=int, default=1024,
                   dest="batch_size")
    s.add_argument("--langs", default="en")
    s.add_argument("--k-urls", type=int, default=0, dest="k_urls")
    # idempotency key: a retried update with the same --delta-id is a
    # no-op once the ledger records it (exactly-once ingestion)
    s.add_argument("--delta-id", default=None, dest="delta_id")
    s.set_defaults(fn=cmd_update)
    s = sub.add_parser("refresh")
    s.add_argument("--corpus", required=True)
    s.add_argument("--old-obo", required=True, dest="old_obo")
    s.add_argument("--new-obo", required=True, dest="new_obo")
    s.add_argument("--out", required=True)
    s.add_argument("--subj-buckets", type=int, required=True,
                   dest="subj_buckets")
    s.add_argument("--batch-size", type=int, default=1024,
                   dest="batch_size")
    s.add_argument("--langs", default="en")
    s.add_argument("--k-urls", type=int, default=0, dest="k_urls")
    # idempotency key (shares the update ledger): a retried refresh
    # with the same --refresh-id is a no-op once committed
    s.add_argument("--refresh-id", default=None, dest="refresh_id")
    s.add_argument("--max-affected-fraction", type=float, default=0.5,
                   dest="max_affected_fraction")
    s.set_defaults(fn=cmd_refresh)
    s = sub.add_parser("fsck")
    s.add_argument("--out", required=True)
    s.add_argument("--subj-buckets", type=int, required=True,
                   dest="subj_buckets")
    s.set_defaults(fn=cmd_fsck)
    s = sub.add_parser("report")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_report)
    s = sub.add_parser("curate")
    s.add_argument("--corpus", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--bench", default=None)
    s.add_argument("--min-quality", type=float, default=0.5,
                   dest="min_quality")
    s.add_argument("--pack-budget", type=int, default=256,
                   dest="pack_budget")
    # resumable funnel: persistent stage dir + skip-finished markers;
    # pass --input-fingerprint (e.g. corpus snapshot id) so a changed
    # corpus invalidates the markers (see curation.curate docstring)
    s.add_argument("--work-dir", default=None, dest="work_dir")
    s.add_argument("--resume", action="store_true")
    s.add_argument("--input-fingerprint", default="",
                   dest="input_fingerprint")
    s.set_defaults(fn=cmd_curate)
    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
