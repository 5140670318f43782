"""Ontology-delta refresh rehearsal at bench scale: build the 64-bucket
adjacency over the page corpus under v1, then (a) refresh to a
one-edge-retarget v2 release, (b) rebuild from scratch under v2, and
compare wall, touched buckets, and value-equality of the stores.

Two ontology regimes:

    python tools/rehearse_refresh.py [n_pages]          # MINI_OBO (10 terms)
    python tools/rehearse_refresh.py [n_pages] --synth N  # synth_obo(N)

The MINI leg shows the floor (a 10-term automaton costs the same
restricted or not, so refresh ~ rebuild); the synth leg shows the
point: at an N-term ontology a one-edge release delta re-annotates
with a DELTA-sized automaton (_restricted_index), so refresh wall
decouples from ontology size while rebuild pays the full trie scan.

Prints one JSON line per leg: {n, onto_terms, build_sec, refresh_sec,
rebuild_sec, automaton_surfaces, full_surfaces, touched,
total_buckets, affected_fraction, equal}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_synth_corpus(n_pages: int, n_terms: int) -> str:
    """Pages corpus whose text mentions a (child, parent) synth-term
    pair per page — every page emits an is_a triple, so the rehearsal
    measures real mention/emission work, not just automaton scans.
    Text is pre-filled (the extraction stage skips filled rows; the
    automaton-scan cost under comparison is downstream of S1)."""
    import pandas as pd
    import ray.data as rd

    from fastobo_py_ray.testing.corpus import EPOCH_US, pages_schema

    out = f"/tmp/fastobo_synth_corpus_{n_pages}_{n_terms}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)

    # ~2 KB of body text per page, Common-Crawl-ish weight, so the
    # rebuild leg pays a realistic full-automaton scan per page
    filler = ("the quick brown fox jumps over the lazy dog while "
              "reading web pages about ontology construction and "
              "knowledge graphs built from large crawled corpora with "
              "terms entities relations and mentions everywhere ") * 12

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        ids = batch["id"].to_numpy()
        rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                "lang": []}
        for i in ids:
            child = 1 + int(i) % (n_terms - 10)
            parent = (child - 1) // 2
            text = (f"{filler}synthetic term {child} interacts with "
                    f"synthetic term {parent} in this document. {filler}")
            rows["url"].append(f"https://synth.example/doc/{int(i):09d}")
            rows["warc_ts"].append(EPOCH_US + int(i) * 1_000_000)
            rows["html"].append("<html></html>")
            rows["text"].append(text)
            rows["lang"].append("en")
        return pa.table(rows, schema=pages_schema()).to_pandas()

    (rd.range(n_pages, override_num_blocks=64)
       .map_batches(gen, batch_format="pandas")
       .write_parquet(out))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from bench import ensure_corpus
    from fastobo_py_ray.pipelines.kg import run_kg_pipeline
    from fastobo_py_ray.pipelines.refresh import refresh_adjacency
    from fastobo_py_ray.testing.corpus import MINI_OBO

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2_400_000
    P = 64
    if "--synth" in sys.argv:
        from fastobo_py_ray.obo.synth import synth_obo

        n_terms = int(sys.argv[sys.argv.index("--synth") + 1])
        v1 = synth_obo(n_terms)
        # one-edge release delta: retarget term 1000's is_a (the
        # stanza is located by id so the clause mix around it doesn't
        # matter)
        at = v1.index("id: SYN:0001000\n")
        end = v1.index("\n\n", at)
        stanza = v1[at:end]
        assert "is_a: SYN:0000499" in stanza
        v2 = (v1[:at]
              + stanza.replace("is_a: SYN:0000499", "is_a: SYN:0000400")
              + v1[end:])
    else:
        v1 = MINI_OBO
        v2 = MINI_OBO.replace(
            "is_a: TST:0000002\n\n[Term]\nid: TST:0000005",
            "is_a: TST:0000003\n\n[Term]\nid: TST:0000005")

    if "--synth" in sys.argv:
        corpus = ensure_synth_corpus(n, n_terms)
    else:
        corpus = ensure_corpus(n)
    root = "/tmp/fastobo_refresh_rehearsal"
    shutil.rmtree(root, ignore_errors=True)
    adj = os.path.join(root, "adj")
    full2 = os.path.join(root, "full2")

    def build(obo, out):
        t0 = time.perf_counter()
        run_kg_pipeline(rd.read_parquet(corpus), obo, out_dir=out,
                        batch_size=1024, langs=("en",), subj_buckets=P)
        return time.perf_counter() - t0

    build_sec = build(v1, adj)
    t0 = time.perf_counter()
    info = refresh_adjacency(rd.read_parquet(corpus), v1, v2, adj,
                             subj_buckets=P, batch_size=1024,
                             langs=("en",), max_affected_fraction=1.0)
    refresh_sec = time.perf_counter() - t0
    rebuild_sec = build(v2, full2)

    def load(d):
        import pandas as pd

        df = rd.read_parquet(d).to_pandas()
        cols = ["subj", "pred", "obj", "n_evidence"]
        if df.empty:
            return pd.DataFrame(columns=cols)
        return df[cols].sort_values(cols).reset_index(drop=True)

    equal = load(adj).equals(load(full2))
    print(json.dumps({
        "n": n,
        "onto_terms": v1.count("[Term]"),
        "build_sec": round(build_sec, 1),
        "refresh_sec": round(refresh_sec, 1),
        "rebuild_sec": round(rebuild_sec, 1),
        "mode": info["mode"], "touched": len(info["touched_buckets"]),
        "total_buckets": P,
        "affected_fraction": info["affected_fraction"],
        "automaton_surfaces": info.get("automaton_surfaces"),
        "full_surfaces": info.get("full_surfaces"),
        "equal": equal}))
    assert equal, "refresh != rebuild at bench scale"
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
