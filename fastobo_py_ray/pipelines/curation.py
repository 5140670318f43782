"""End-to-end training-data curation pipeline — the composite a corpus
curator actually runs, chaining the engine's operators as ONE streaming
flow with disk checkpoints at stage boundaries:

    quality gates (langid + heuristics + repetition, fused stateless map)
    -> exact dedup         (content-hash winners, semi join)
    -> near-dup removal    (minhash/LSH clusters, keep representatives)
    -> decontamination     (broadcast benchmark n-gram scan)
    -> deterministic train/val split + sequence packing

Every stage is one of the already-oracle-checked operators; the
composition adds only semi/anti joins on doc_id (each one keyed
exchange).

Scale design: the kept set is CHECKPOINTED TO PARQUET between stages
(``work_dir``), never pinned in the object store and never counted with
a driver barrier — the funnel counts come free from parquet row-group
metadata.  Checkpointing also makes every fan-out cheap (the dedup
stages consume their input twice: once to derive winners/losers, once
as the join's left side — two streaming reads of a parquet dir instead
of a recompute or an object-store materialization) and the whole funnel
resumable mid-run via per-stage ``_SUCCESS`` markers (opt-in
``curate(resume=True)`` with a persistent ``work_dir`` — finished
stages are skipped, unfinished ones recompute), the same story as the
KG pipeline's S10 lineage (:mod:`.checkpoint`).  This is the shape large curation pipelines ship
with: stage-to-storage, restartable, O(corpus) disk per stage and O(1)
driver memory.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd


def _pq_rows(path: str) -> int:
    """Row count of a parquet dir from file metadata (no scan)."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, name)) \
                .metadata.num_rows
    return total


def _ckpt(ds, path: str, empty_cols=None, fingerprint="",
          resume=False):
    """Write a stage boundary to parquet; return (re-read handle, rows).

    The count is parquet metadata — zero-cost, no execution barrier
    beyond the write that the stage needs anyway for resumability.

    RESUME: a ``_SUCCESS`` marker (containing the funnel's parameter
    fingerprint) is written after each completed stage.  When
    ``fingerprint`` is passed and the marker exists with MATCHING
    content, the stage is skipped entirely and the checkpoint is
    re-read — a restarted ``curate(resume=True)`` recomputes only the
    stages that had not finished.  A mismatched fingerprint (different
    funnel parameters aimed at the same work_dir) recomputes rather
    than silently reusing stale data.  The input Dataset is lazy, so a
    skipped stage never executes its upstream.

    Zero-row stages are first-class: Ray's parquet datasink DELETES the
    output directory when nothing was written (file_datasink
    ``on_write_complete``), which would crash the immediate re-read —
    so an all-empty write is replaced by one schema-typed empty file
    and the funnel continues with an empty Dataset.
    """
    import ray.data as rd

    marker = os.path.join(path, "_SUCCESS")
    if resume and os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:
                return rd.read_parquet(path), _pq_rows(path)

    shutil.rmtree(path, ignore_errors=True)
    ds.write_parquet(path)
    if not os.path.isdir(path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        # an all-empty dataset has NO recoverable schema
        # (ds.schema() is None), so the stage declares its output
        # columns via empty_cols
        os.makedirs(path, exist_ok=True)
        tbl = pa.Table.from_pandas(pd.DataFrame({
            n: pd.Series(dtype=t) for n, t in (empty_cols or {}).items()
        }), preserve_index=False)
        pq.write_table(tbl, os.path.join(path, "empty.parquet"))
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write(fingerprint)
    return rd.read_parquet(path), _pq_rows(path)


def curate(ds, bench_ds=None, id_col: str = "doc_id",
           text_col: str = "text", min_quality: float = 0.5,
           max_top_word_frac: float = 0.5, jaccard_threshold: float = 0.8,
           decontam_k: int = 5, pack_budget: int = 256,
           work_dir: str | None = None, resume: bool = False,
           input_fingerprint: str = ""):
    """documents -> (packed kept docs Dataset, funnel stats dict).

    ``bench_ds`` is the (small) eval-benchmark Dataset for the
    decontamination stage; ``None`` skips it. The val split uses the
    SAME rule as ``q_train_split`` (~10% val via first md5 byte
    ``< 0x1a``) so split membership is consistent engine-wide.

    ``work_dir`` hosts the per-stage parquet checkpoints (a fresh temp
    dir under /tmp when omitted; pass a persistent path to make the
    funnel resumable / auditable).  The returned Dataset reads from
    ``work_dir/packed`` — re-consumable without recompute.

    ``resume=True`` (with a persistent ``work_dir``) skips every stage
    whose ``_SUCCESS`` marker matches this call's parameter
    fingerprint — a restarted funnel recomputes only unfinished stages
    (see :func:`_ckpt`); parameter changes invalidate the markers.
    CAUTION: the fingerprint covers PARAMETERS, not corpus content —
    the markers cannot see that ``ds`` or ``bench_ds`` changed, so a
    resume against a different input silently returns the old stages.
    Pass ``input_fingerprint`` (e.g. the corpus path + mtime or a
    snapshot id) whenever the same ``work_dir`` may outlive one input;
    it is folded into every stage marker and any change forces a full
    recompute.
    """
    import ray.data as rd

    from ..functions.relops import hash_join
    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.textstats import LangId, quality_score_batch
    from ..stages.traindata import (decontaminate, pack_sequences,
                                    repetition_stats_batch)

    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="fastobo_curate_")

    # stage-skip guard: markers only match runs with identical funnel
    # parameters (bench presence included — it changes the stage list)
    fp = repr((id_col, text_col, min_quality, max_top_word_frac,
               jaccard_threshold, decontam_k, pack_budget,
               bench_ds is not None, input_fingerprint))

    stats = {}
    # metadata-only for parquet-backed / materialized inputs (the usual
    # case); a lazy non-parquet upstream pays one extra pass here.
    stats["input"] = ds.count()
    # declared stage schema for the all-empty checkpoint path (_ckpt)
    doc_cols = {id_col: "int64", text_col: "string"}

    # -- stage 1: fused quality gates (stateless; one pass) -----------
    langid = LangId(text_col=text_col)

    def gates(df: pd.DataFrame) -> pd.DataFrame:
        df = langid(df)
        df = quality_score_batch(df, text_col)
        # merge, not index-map: a dirty corpus may repeat doc ids within
        # a batch (the dedup stages downstream handle them; the gate
        # must not crash on a non-unique index)
        rep = repetition_stats_batch(df, id_col, text_col)[
            [id_col, "top_word_frac"]].drop_duplicates(id_col)
        df = df.merge(rep, on=id_col, how="left")
        df = df[(df["quality_score"] >= min_quality) &
                (df["top_word_frac"] <= max_top_word_frac) &
                (df["lang_pred"] != "und")]
        return df[[id_col, text_col]]

    kept, stats["after_quality"] = _ckpt(
        ds.map_batches(gates, batch_format="pandas"),
        os.path.join(work_dir, "s1_quality"), empty_cols=doc_cols, fingerprint=fp, resume=resume)

    # -- stage 2: exact dedup (winners -> semi join) ------------------
    winners = exact_dedup(kept, id_col=id_col, text_col=text_col) \
        .map_batches(lambda df: df[["doc_id"]].rename(
            columns={"doc_id": id_col}), batch_format="pandas")
    kept, stats["after_exact_dedup"] = _ckpt(
        hash_join(kept, winners, on=id_col, how="semi",
                  lcols=[id_col, text_col], rcols=[id_col]),
        os.path.join(work_dir, "s2_exact"), empty_cols=doc_cols, fingerprint=fp, resume=resume)

    # -- stage 3: near-dup removal (keep cluster representatives) -----
    clusters = minhash_dedup(kept, id_col=id_col, text_col=text_col,
                             jaccard_threshold=jaccard_threshold)
    losers = clusters.map_batches(
        lambda df: df.loc[df[id_col] != df["cluster_rep"], [id_col]],
        batch_format="pandas")
    kept, stats["after_near_dedup"] = _ckpt(
        hash_join(kept, losers, on=id_col, how="anti",
                  lcols=[id_col, text_col], rcols=[id_col]),
        os.path.join(work_dir, "s3_neardup"), empty_cols=doc_cols, fingerprint=fp, resume=resume)

    # -- stage 4: decontamination -------------------------------------
    if bench_ds is not None:
        flags = decontaminate(kept, bench_ds, id_col=id_col,
                              text_col=text_col, k=decontam_k)
        contaminated = flags.map_batches(
            lambda df: df.loc[df["contaminated"] == 1, [id_col]],
            batch_format="pandas")
        kept, stats["after_decontam"] = _ckpt(
            hash_join(kept, contaminated, on=id_col, how="anti",
                      lcols=[id_col, text_col], rcols=[id_col]),
            os.path.join(work_dir, "s4_decontam"), empty_cols=doc_cols, fingerprint=fp, resume=resume)
    else:
        stats["after_decontam"] = stats["after_near_dedup"]

    # -- stage 5: split + packing -------------------------------------
    from ..stages.traindata import train_val_assign

    def split(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(split=train_val_assign(df[id_col]))

    tagged, _ = _ckpt(kept.map_batches(split, batch_format="pandas"),
                      os.path.join(work_dir, "s5_tagged"),
                      empty_cols={**doc_cols, "split": "string"}, fingerprint=fp, resume=resume)
    packs = pack_sequences(tagged, id_col=id_col, text_col=text_col,
                           budget=pack_budget)
    packed, stats["packed_docs"] = _ckpt(
        hash_join(packs, tagged.map_batches(
            lambda df: df[[id_col, "split"]], batch_format="pandas"),
            on=id_col, lcols=[id_col, "n_tokens", "pack_id"],
            rcols=[id_col, "split"]).map_batches(
            # restore the ints the join's NA-widening floated
            lambda df: df.astype({"n_tokens": "int64"}),
            batch_format="pandas"),
        os.path.join(work_dir, "packed"),
        empty_cols={id_col: "int64", "n_tokens": "int64",
                    "pack_id": "string", "split": "string"},
        fingerprint=fp, resume=resume)
    return packed, stats
