"""End-to-end training-data curation pipeline — the composite a corpus
curator actually runs, chaining the engine's operators as ONE lazy Ray
Data flow:

    quality gates (langid + heuristics + repetition, fused stateless map)
    -> exact dedup         (content-hash winners, semi join)
    -> near-dup removal    (minhash/LSH clusters, keep representatives)
    -> decontamination     (broadcast benchmark n-gram scan)
    -> deterministic train/val split + sequence packing

Every stage is one of the already-oracle-checked operators; the
composition adds only semi/anti joins on doc_id (each one keyed
exchange). Returned per-stage counts make the funnel auditable; the
kept-document Dataset stays distributed end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def curate(ds, bench_ds=None, id_col: str = "doc_id",
           text_col: str = "text", min_quality: float = 0.5,
           max_top_word_frac: float = 0.5, jaccard_threshold: float = 0.8,
           decontam_k: int = 5, pack_budget: int = 256):
    """documents -> (packed kept docs Dataset, funnel stats dict).

    ``bench_ds`` is the (small) eval-benchmark Dataset for the
    decontamination stage; ``None`` skips it. The val split uses the
    SAME rule as ``q_train_split`` (~10% val via first md5 byte
    ``< 0x1a``) so split membership is consistent engine-wide.
    """
    from ..functions.relops import hash_join
    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.textstats import LangId, quality_score_batch
    from ..stages.traindata import (decontaminate, pack_sequences,
                                    repetition_stats_batch)

    # one materialization up front: the input handle is consumed twice
    # (count + stage-1 map), and a lazy handle would re-run its whole
    # upstream per consumer
    ds = ds.materialize()
    stats = {}
    stats["input"] = ds.count()

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

    kept = ds.map_batches(gates, batch_format="pandas").materialize()
    stats["after_quality"] = kept.count()

    # -- stage 2: exact dedup (winners -> semi join) ------------------
    winners = exact_dedup(kept, id_col=id_col, text_col=text_col) \
        .map_batches(lambda df: df[["doc_id"]].rename(
            columns={"doc_id": id_col}), batch_format="pandas")
    kept = hash_join(kept, winners, on=id_col, how="semi",
                     lcols=[id_col, text_col],
                     rcols=[id_col]).materialize()
    stats["after_exact_dedup"] = kept.count()

    # -- stage 3: near-dup removal (keep cluster representatives) -----
    clusters = minhash_dedup(kept, id_col=id_col, text_col=text_col,
                             jaccard_threshold=jaccard_threshold)
    losers = clusters.map_batches(
        lambda df: df.loc[df[id_col] != df["cluster_rep"], [id_col]],
        batch_format="pandas")
    kept = hash_join(kept, losers, on=id_col, how="anti",
                     lcols=[id_col, text_col],
                     rcols=[id_col]).materialize()
    stats["after_near_dedup"] = kept.count()

    # -- stage 4: decontamination -------------------------------------
    if bench_ds is not None:
        flags = decontaminate(kept, bench_ds, id_col=id_col,
                              text_col=text_col, k=decontam_k)
        contaminated = flags.map_batches(
            lambda df: df.loc[df["contaminated"] == 1, [id_col]],
            batch_format="pandas")
        kept = hash_join(kept, contaminated, on=id_col, how="anti",
                         lcols=[id_col, text_col],
                         rcols=[id_col]).materialize()
    stats["after_decontam"] = kept.count()

    # -- stage 5: split + packing -------------------------------------
    from ..stages.traindata import train_val_assign

    def split(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(split=train_val_assign(df[id_col]))

    tagged = kept.map_batches(split, batch_format="pandas").materialize()
    packs = pack_sequences(tagged, id_col=id_col, text_col=text_col,
                           budget=pack_budget)
    packed = hash_join(packs, tagged.map_batches(
        lambda df: df[[id_col, "split"]], batch_format="pandas"),
        on=id_col, lcols=[id_col, "n_tokens", "pack_id"],
        rcols=[id_col, "split"]).map_batches(
        # restore the ints the join's NA-widening floated
        lambda df: df.astype({"n_tokens": "int64"}),
        batch_format="pandas").materialize()
    stats["packed_docs"] = packed.count()
    return packed, stats
