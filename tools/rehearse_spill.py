"""Memory-pressure / spill rehearsal (VERDICT r4 ask #4): run the
headline KG pipeline and minhash_dedup with Ray's object store capped
far below the working set, so the plasma store actually spills to disk,
and record (a) wall-time degradation vs uncapped and (b) zero
correctness drift (identical triple-evidence sum / identical kept-doc
count).  At 100 TB spill is the steady state, not the edge case — an
operator that only works when every intermediate fits the store is
wrong.

Each (workload, cap) combo runs in a FRESH subprocess so the object
store size really differs per run:

    python tools/rehearse_spill.py --all [kg_pages] [minhash_docs]
    python tools/rehearse_spill.py kg|minhash <cap_gb|0=uncapped> <n>

Child prints one JSON line: {workload, cap_gb, n, wall_sec, check,
spilled_mb, restored_mb}.  Spill volume is read from Ray's own memory
summary, so "it spilled" is evidenced, not assumed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GiB = 1024 ** 3


def spill_stats() -> tuple:
    """(spilled_mb, restored_mb) — parsed from the session's raylet
    log (cumulative "Spilled N MiB" / "Restored N MiB" progress lines,
    take the max).  This container lacks grpc so Ray's memory_summary
    API is unavailable, and spill FILES are deleted as objects free,
    so the log is the reliable cumulative record."""
    import glob
    import re

    import ray._private.worker as w
    sess = w._global_node.get_session_dir_path()
    spilled = restored = 0.0
    for path in glob.glob(os.path.join(sess, "logs", "raylet*")):
        try:
            with open(path, errors="replace") as fh:
                txt = fh.read()
        except OSError:
            continue
        for pat, idx in ((r"Spilled (\d+) MiB", 0),
                         (r"Restored (\d+) MiB", 1)):
            vals = [float(x) for x in re.findall(pat, txt)]
            if vals:
                if idx == 0:
                    spilled = max(spilled, max(vals))
                else:
                    restored = max(restored, max(vals))
    return spilled, restored


def run_kg(n_pages: int) -> tuple:
    """Headline pipeline at bench scale; check = total evidence count
    (value-level: same corpus must yield the identical sum capped or
    not)."""
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from bench import ensure_corpus
    from fastobo_py_ray.pipelines.kg import run_kg_pipeline
    from fastobo_py_ray.testing.corpus import MINI_OBO

    corpus = ensure_corpus(n_pages)
    out_dir = "/tmp/fastobo_spill_out"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    pages = rd.read_parquet(corpus)
    run_kg_pipeline(pages, MINI_OBO, out_dir=out_dir,
                    batch_size=1024, langs=("en",))
    wall = time.perf_counter() - t0
    check = int(sum(r["n_evidence"]
                    for r in rd.read_parquet(out_dir).take_all()))
    return wall, check


def ensure_minhash_corpus(n_docs: int) -> str:
    """Synthetic near-dup corpus materialized to parquet ONCE (generation
    is row-wise and expensive; it must not pollute the capped-vs-uncapped
    wall comparison, and every leg must read identical bytes)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    out = f"/tmp/fastobo_spill_minhash_{n_docs}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out

    WORDS = np.array(
        ("key agg row scan slow fast table value part hash merge batch "
         "window spark order data column join small line customer query "
         "filter group sort index block page store read write card lamp "
         "green stone river cloud metal paper glass wheel").split())

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        texts = []
        for i in ids:
            rng = np.random.RandomState(int(i) % 50_000)  # 20x dup factor
            w = WORDS[rng.randint(0, len(WORDS), size=60)].tolist()
            if i % 3 == 0:             # perturb a third -> near-dups
                w[int(i) % 60] = f"tok{int(i) % 13}"
            texts.append(" ".join(w))
        return pd.DataFrame({"doc_id": ids,
                             "text": pd.Series(texts, dtype="string")})

    import shutil
    shutil.rmtree(out, ignore_errors=True)
    (rd.range(n_docs, override_num_blocks=64)
       .map_batches(gen, batch_format="pandas")
       .write_parquet(out))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def run_minhash(n_docs: int) -> tuple:
    """minhash_dedup over the pre-materialized near-dup corpus; check =
    (cluster-member rows, distinct cluster reps) — a value-level pair
    that would catch spill-induced drift in either the pair-verify
    exchange or the CC contraction."""
    import ray.data as rd

    from fastobo_py_ray.stages.dedup import minhash_dedup

    corpus = ensure_minhash_corpus(n_docs)
    t0 = time.perf_counter()
    src = rd.read_parquet(corpus)
    clusters = minhash_dedup(src).materialize()   # skinny (id, rep) rows
    members = clusters.count()
    n_reps = clusters.groupby("cluster_rep").count().count()
    wall = time.perf_counter() - t0
    return wall, (members, n_reps)


def child(workload: str, cap_gb: float, n: int) -> None:
    import ray

    kw = {}
    if cap_gb:
        kw["object_store_memory"] = int(cap_gb * GiB)
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    # A store cap below the blocking-exchange working set collapses the
    # executor's LOGICAL budget (plasma x 0.25) long before physical
    # spill helps; overcommit the bookkeeping so plasma's disk spill is
    # actually exercised (see context.allow_store_overcommit).
    overcommit = float(os.environ.get("SPILL_OVERCOMMIT", "0"))
    if overcommit:
        from fastobo_py_ray.context import allow_store_overcommit
        allow_store_overcommit(overcommit)

    wall, check = (run_kg if workload == "kg" else run_minhash)(n)
    spilled, restored = spill_stats()
    print(json.dumps({"workload": workload, "cap_gb": cap_gb, "n": n,
                      "overcommit": overcommit,
                      "wall_sec": round(wall, 1), "check": check,
                      "spilled_mb": spilled, "restored_mb": restored}))
    ray.shutdown()


def main() -> int:
    if sys.argv[1] == "--all":
        kg_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000
        mh_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
        # Caps per workload (measured round 5): the kg headline's
        # streaming backpressure keeps its working set ~1 GiB at ANY
        # corpus size (zero spill even capped to 1 GiB), so its spill
        # leg runs at 0.25 GiB; minhash's blocking verify exchange has
        # a ~10 GiB working set, so 1 GiB is a deep-spill cap.  Capped
        # legs run with allow_store_overcommit(12): without it the
        # executor's LOGICAL budget (plasma x 0.25) starves producers
        # at <=1 task and the job never reaches the spill path (>20x
        # collapse, killed after 55 min at 1-4 GiB caps).
        cap_gb = float(os.environ.get("SPILL_CAP_GB", "1"))
        overcommit = os.environ.get("SPILL_OVERCOMMIT", "12")
        rows = []
        for workload, n, caps in (("kg", kg_n, (0, min(cap_gb, 0.25))),
                                  ("minhash", mh_n, (0, cap_gb))):
            for cap in caps:
                env = dict(os.environ)
                env["SPILL_OVERCOMMIT"] = overcommit if cap else "0"
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     workload, str(cap), str(n)],
                    capture_output=True, text=True, env=env)
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("{")]
                if not line:
                    print(f"CHILD FAILED {workload} cap={cap}:\n"
                          f"{out.stderr[-2000:]}")
                    return 1
                rows.append(json.loads(line[-1]))
                print(rows[-1])
        by = {(r["workload"], r["cap_gb"]): r for r in rows}
        for w in ("kg", "minhash"):
            a, b = by[(w, 0)], by[(w, min(cap_gb, 0.25) if w == "kg"
                                   else cap_gb)]
            assert a["check"] == b["check"], \
                f"{w}: CORRECTNESS DRIFT under spill: " \
                f"{a['check']} != {b['check']}"
            print(f"{w}: uncapped {a['wall_sec']}s "
                  f"(spilled {a['spilled_mb']} MB) vs {cap_gb}GiB-capped "
                  f"{b['wall_sec']}s (spilled {b['spilled_mb']} MB) "
                  f"-> {b['wall_sec'] / a['wall_sec']:.2f}x, "
                  f"check identical ({a['check']})")
        return 0
    child(sys.argv[1], float(sys.argv[2]), int(sys.argv[3]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
