"""Ontology-delta incremental refresh — the dual of crawl-delta ingestion.

:func:`~fastobo_py_ray.pipelines.kg.update_adjacency` (round 4) handles
"the CORPUS grew, the ontology stayed": merge new pages, rewrite only
delta-touched buckets.  This module handles "the ONTOLOGY changed, the
corpus stayed" — the monthly-release case a living KG hits constantly:

    1. :func:`~fastobo_py_ray.obo.diff.obo_diff` the two releases
       (frame-level, canonical-serialization compare);
    2. close the changed frame set into the full AFFECTED-term set
       (:func:`affected_closure`) — every term whose mention, linking,
       canonicalization or edge behavior can differ between releases;
    3. re-annotate the corpus with the NEW ontology's full automaton,
       keeping only triples that touch the affected set — the corpus
       scan is unavoidable without a doc->term inverted index, but the
       dedup exchange and the bucket rewrites shrink from
       ontology-sized to |affected|-sized;
    4. rewrite only the adjacency buckets that hold an affected row or
       receive a recomputed one, through the SAME staged ``_PLAN`` +
       two-rename swap + idempotency-ledger machinery as
       ``update_adjacency`` (crash-resumable, exactly-once under
       ``refresh_id``, inter-process locked).

Exactness contract (pytest-gated per mutation class):
``refresh(build(corpus, v1), v1 -> v2) == build(corpus, v2)``
value-identically, because the affected closure is SOUND: a triple can
differ between v1 and v2 only if one of its endpoints/pred is affected.

Why each closure rule exists (matching semantics in stages/mentions.py):

* **frame edits** — changed/added/removed term frames (and the targets
  their ``replaced_by`` redirects feed) obviously change their own
  mentions/edges.
* **identity clusters** — canonical ids are union-find representatives
  over xref/alt equivalence edges; a changed frame can re-cluster every
  member, so clusters containing a changed id are wholly affected (in
  EITHER version — a split is as invalidating as a merge).
* **surface-overlap interaction (fixpoint)** — detection is
  leftmost-longest NON-OVERLAPPING: adding/removing a surface changes
  which spans other surfaces can win.  Two word-boundary-anchored
  surfaces can contest a span IFF their token sequences overlap
  boundary-aligned: one contains the other as a contiguous
  subsequence, or a proper suffix of one equals a proper prefix of
  the other (matches start/end only at ``\\b``, and inside a matched
  surface the only ``\\b`` positions are its token boundaries).  The
  closure adds every term reachable from an affected term through
  this interaction graph (consumption chains propagate through the
  fixpoint).  Mere token SHARING is not enough to interact —
  "synthetic term 5" and "synthetic term 6" share two tokens but can
  never overlap in text — which keeps the closure delta-sized on
  real ontologies where most names share common words.
* **ambiguous surfaces** — TF-IDF linking of multi-candidate surfaces
  depends on the GLOBAL idf table, which shifts under any frame edit;
  all terms reachable from a multi-candidate surface are therefore
  affected whenever the diff is non-empty.  (Single-candidate
  surfaces never consult idf — the fast path — so they stay exact.)

A HEADER change (idspaces, treat-xrefs-as-* macros, default-namespace)
re-interprets every frame; :func:`refresh_adjacency` then falls back to
a FULL recompute through the same staged-swap machinery, as it does
when the closure exceeds ``max_affected_fraction`` (past that point
selective rewrite moves more bytes than a rebuild saves).  The fallback
is reported in the returned ``mode`` — never applied silently.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Set

import pandas as pd
import pyarrow as pa

from ..obo import ids as obo_ids
from ..obo import loads as obo_loads
from ..obo.diff import OboDiff, obo_diff_parsed
from ..stages.canonicalize import union_find
from ..stages.mentions import _TOKEN_RE, OntologyIndex, build_index
from .kg import (_adjacency_lock, _apply_swap_plan, _bucket_and_join_fn,
                 _k_urls_guard, _merge_triple_frames,
                 _repair_adjacency_locked, _subj_bucket_series,
                 annotate_pages, applied_delta_ids, dedup_triples)


def _term_targets_surfaces(ontology) -> Dict[str, tuple]:
    """term id -> (dictionary target id, [lowercase surfaces]) under one
    version — the same target/redirect/surface rules build_index applies
    (stages/mentions.py:131-147), so the closure reasons about exactly
    the dictionary the annotator will run."""
    spaces = ontology.header.idspaces

    def cid(i: str) -> str:
        return obo_ids.compact(i, spaces)

    out: Dict[str, tuple] = {}
    for f in ontology.terms():
        tid = cid(f.id)
        target = tid
        obs = f.first("is_obsolete")
        if obs and str(obs["value"]).lower() == "true":
            rb = f.values("replaced_by")
            if not rb:
                continue          # obsolete without replacement: no dict
            target = cid(rb[0]["value"])
        surfaces = []
        if f.name:
            surfaces.append(f.name.lower())
        for syn in f.values("synonym"):
            if syn.get("text"):
                surfaces.append(syn["text"].lower())
        out[tid] = (target, surfaces)
    return out


def _surface_interaction_graph(maps) -> Dict[str, Set[str]]:
    """Symmetric term-level interaction graph over both versions'
    dictionaries: an edge means two terms own surfaces that can occupy
    OVERLAPPING \\b-aligned spans in some text, i.e. leftmost-longest
    span consumption can couple their mention sets.  Criterion on the
    lowercased token sequences (matches start/end only at ``\\b``;
    inside a matched surface the only ``\\b`` positions are its token
    boundaries):

    * equality or contiguous-subsequence containment, or
    * a proper suffix of one equals a proper prefix of the other.

    Token SHARING alone is deliberately not an edge ("synthetic term 5"
    / "synthetic term 6" share two tokens but no text can overlap
    them), so common words do not weld a real ontology into one giant
    component.  Cost: O(surfaces x k^2) dict ops for k-token surfaces
    (k is small), run once per refresh on the driver.
    """
    full: Dict[tuple, Set[str]] = {}      # token tuple -> owner targets
    subs: Dict[tuple, Set[str]] = {}      # proper contiguous subtuple
    prefixes: Dict[tuple, Set[str]] = {}  # proper prefixes
    rows = []                             # (tuple, target)
    seen = set()
    adj: Dict[str, Set[str]] = {}
    for m in maps:
        for _tid, (target, surfs) in m.items():
            adj.setdefault(target, set())
            for s in surfs:
                tup = tuple(_TOKEN_RE.findall(s))
                if not tup or (tup, target) in seen:
                    continue
                seen.add((tup, target))
                rows.append((tup, target))
                full.setdefault(tup, set()).add(target)
                k = len(tup)
                for i in range(k):
                    for j in range(i + 1, k + 1):
                        if j - i < k:
                            subs.setdefault(tup[i:j], set()).add(target)
                for j in range(1, k):
                    prefixes.setdefault(tup[:j], set()).add(target)

    suffixes: Dict[tuple, Set[str]] = {}
    for tup, target in rows:
        for j in range(1, len(tup)):
            suffixes.setdefault(tup[j:], set()).add(target)

    for tup, target in rows:
        hits = set(full.get(tup, ()))          # same token sequence
        hits |= subs.get(tup, set())           # I am inside another
        k = len(tup)
        for i in range(k):                     # another is inside me
            for j in range(i + 1, k + 1):
                if j - i < k:
                    hits |= full.get(tup[i:j], set())
        for j in range(1, k):                  # staggered overlaps
            hits |= prefixes.get(tup[j:], set())
            hits |= suffixes.get(tup[:j], set())
        hits.discard(target)
        if hits:
            adj.setdefault(target, set()).update(hits)
            for h in hits:
                adj.setdefault(h, set()).add(target)
    return adj


def affected_closure(diff: OboDiff, onto_old, onto_new,
                     idx_old: OntologyIndex, idx_new: OntologyIndex
                     ) -> Dict[str, object]:
    """Changed frames -> the full affected set (see module docstring for
    the soundness argument of each rule).

    Returns ``{"terms": set, "preds": set, "fraction": float}`` where
    ``terms`` holds compacted term ids (cluster members AND canonical
    representatives included), ``preds`` the changed typedef ids, and
    ``fraction`` = |affected terms| / |all known terms| — the caller's
    full-rebuild tripwire.
    """
    spaces = onto_old.header.idspaces  # == new (caller checked header)

    def cid(i: str) -> str:
        return obo_ids.compact(i, spaces)

    frames = diff.frames
    term_ids = {cid(i) for i in
                frames.loc[frames["frame_type"] == "term", "id"]}
    pred_ids = {cid(i) for i in
                frames.loc[frames["frame_type"] == "typedef", "id"]}

    maps_old = _term_targets_surfaces(onto_old)
    maps_new = _term_targets_surfaces(onto_new)

    affected: Set[str] = set(term_ids)
    for m in (maps_old, maps_new):
        for t in term_ids:
            if t in m:
                affected.add(m[t][0])      # replaced_by redirect target

    # co-cluster adjacency over BOTH versions' identity clusters
    co: Dict[str, Set[str]] = {}
    for idx in (idx_old, idx_new):
        members: Dict[str, Set[str]] = {}
        for raw, rep in idx.representatives.items():
            members.setdefault(rep, {rep}).add(raw)
        for mem in members.values():
            for x in mem:
                co.setdefault(x, set()).update(mem)

    # surface-overlap interaction graph keyed by dictionary TARGET
    # (what detection emits): term A interacts with term B iff some
    # surface of A and some surface of B can occupy overlapping
    # \b-aligned spans — token-sequence containment or proper
    # suffix == proper prefix (see module docstring)
    inter = _surface_interaction_graph((maps_old, maps_new))

    # idf coupling: multi-candidate surfaces in either version
    if not frames.empty:
        for idx in (idx_old, idx_new):
            for cands in idx.surfaces.values():
                tgts = {t for t, _ in cands}
                if len(tgts) > 1:
                    affected |= tgts

    frontier = set(affected)
    while frontier:
        nxt: Set[str] = set()
        for x in frontier:
            nxt |= co.get(x, set())
            nxt |= inter.get(x, set())
        nxt -= affected
        affected |= nxt
        frontier = nxt

    all_terms = (set(inter) | set(maps_old) | set(maps_new))
    fraction = (len(affected & all_terms) / len(all_terms)
                if all_terms else 1.0)
    return {"terms": affected, "preds": pred_ids, "fraction": fraction,
            "inter": inter}   # interaction graph, reused for the
    # restricted annotation automaton (_restricted_index)


def _restricted_index(idx: OntologyIndex, F: Set[str], P: Set[str],
                      inter: Dict[str, Set[str]]) -> OntologyIndex:
    """Annotation index restricted to the refresh delta — the automaton
    shrinks from ontology-sized to delta-sized while every produced
    value stays EXACT (the rebuild-equality pytest covers all mutation
    classes through this path):

    * ``edges_by_subj`` keeps only edges touching the affected set
      (subj/obj in ``F`` or pred in ``P``): emission yields exactly the
      triples the refresh must recompute;
    * ``surfaces`` keeps a surface iff one of its candidate targets is
      an affected term, an endpoint of a kept edge (the partner whose
      co-mention the triple needs), or reachable from one through the
      surface-interaction graph — the BLOCKERS whose presence preserves
      leftmost-longest span consumption for the terms we keep (F itself
      is interaction-closed; partners need their own closure here);
      kept surfaces keep their FULL candidate lists so multi-candidate
      linking sees the same choice set;
    * ``profiles`` / ``idf`` / ``representatives`` are kept WHOLE (they
      are broadcast payload, not automaton size) so link() scores are
      bit-identical to the full index's.
    """
    rep = idx.representatives
    kept_edges: Dict[str, list] = {}
    needed: Set[str] = set()
    for s, pos in idx.edges_by_subj.items():
        kept = [(p, o) for p, o in pos
                if s in F or o in F or p in P]
        if kept:
            kept_edges[s] = kept
            needed.add(s)
            needed.update(o for _, o in kept)

    allow = {t for t in inter if rep.get(t, t) in needed} | set(F)
    frontier = set(allow)
    while frontier:
        nxt: Set[str] = set()
        for x in frontier:
            nxt |= inter.get(x, set())
        nxt -= allow
        allow |= nxt
        frontier = nxt

    surfaces = {s: cands for s, cands in idx.surfaces.items()
                if any(t in allow for t, _ in cands)}
    return OntologyIndex(surfaces=surfaces, profiles=idx.profiles,
                         idf=idx.idf, edges_by_subj=kept_edges,
                         representatives=rep)


def refresh_adjacency(pages_ds, old_obo: str, new_obo: str,
                      adjacency_dir: str, subj_buckets: int,
                      batch_size: int = 1024,
                      langs: Optional[list] = ("en",),
                      k_urls: int = 0,
                      refresh_id: Optional[str] = None,
                      max_affected_fraction: float = 0.5) -> dict:
    """Ontology-release refresh of a bucketed adjacency store (see the
    module docstring for the algorithm and exactness contract).

    ``pages_ds`` must be the SAME corpus the store was built from
    (corpus deltas are :func:`~fastobo_py_ray.pipelines.kg
    .update_adjacency`'s job; compose the two for "new crawl AND new
    release": update first, then refresh).

    Crash safety, exactly-once (via ``refresh_id``, sharing the
    applied-delta ledger) and locking are inherited from the update
    path's staged ``_PLAN`` swap machinery — a crashed refresh is
    FINISHED by ``repair_adjacency`` / the next run, never re-applied.

    Returns ``{"mode": "noop"|"selective"|"full", "touched_buckets":
    [...], "delta_triples": n, "affected_terms": n, "affected_fraction":
    f}``.
    """
    with _adjacency_lock(adjacency_dir):
        return _refresh_locked(
            pages_ds, old_obo, new_obo, adjacency_dir, subj_buckets,
            batch_size=batch_size, langs=langs, k_urls=k_urls,
            refresh_id=refresh_id,
            max_affected_fraction=max_affected_fraction)


def _refresh_locked(pages_ds, old_obo: str, new_obo: str,
                    adjacency_dir: str, subj_buckets: int,
                    batch_size: int, langs, k_urls: int,
                    refresh_id, max_affected_fraction: float) -> dict:
    import glob as _glob
    import json as _json
    import shutil

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..context import tune_data_context
    from ..functions.relops import grouped_map

    tmp_root = os.path.join(adjacency_dir, ".delta_merge_tmp")
    if os.path.exists(os.path.join(tmp_root, "_PLAN")):
        _repair_adjacency_locked(adjacency_dir)
    else:
        shutil.rmtree(tmp_root, ignore_errors=True)

    if refresh_id is not None and refresh_id in applied_delta_ids(
            adjacency_dir):
        return {"mode": "noop", "touched_buckets": [],
                "delta_triples": 0, "skipped": refresh_id}

    _k_urls_guard(adjacency_dir, k_urls)

    onto_old = obo_loads(old_obo).ontology
    onto_new = obo_loads(new_obo).ontology
    diff = obo_diff_parsed(onto_old, onto_new)
    if diff.frames.empty and not diff.header_changed:
        return {"mode": "noop", "touched_buckets": [],
                "delta_triples": 0}

    idx_old = build_index(onto_old, union_find(
        onto_old.equivalence_edges()))
    idx_new = build_index(onto_new, union_find(
        onto_new.equivalence_edges()))

    selective = not diff.header_changed
    # the interaction-graph build is O(surfaces x k^2) DRIVER memory;
    # past this bound a full staged rebuild is cheaper than risking
    # the closure build itself (reported in mode, like every fallback)
    max_interaction_surfaces = 5_000_000
    if (len(idx_old.surfaces) + len(idx_new.surfaces)
            > max_interaction_surfaces):
        selective = False
    clo = {"terms": set(), "preds": set(), "fraction": 1.0}
    if selective:
        clo = affected_closure(diff, onto_old, onto_new, idx_old,
                               idx_new)
        if clo["fraction"] > max_affected_fraction:
            selective = False

    F = pa.array(sorted(clo["terms"]), pa.string())
    P = pa.array(sorted(clo["preds"]), pa.string())

    def touching(t: pa.Table):
        m = pc.or_(pc.is_in(t["subj"], value_set=F),
                   pc.is_in(t["obj"], value_set=F))
        if len(P):
            m = pc.or_(m, pc.is_in(t["pred"], value_set=P))
        return m

    tune_data_context()
    annot_idx = idx_new
    if selective:
        # delta-sized automaton: exact by construction (blockers keep
        # leftmost-longest outcomes; idf/profiles shipped whole) — the
        # scan cost of the corpus re-annotation now scales with the
        # RELEASE DELTA, not the ontology
        annot_idx = _restricted_index(idx_new, clo["terms"],
                                      clo["preds"], clo["inter"])
    index_ref = ray.put(annot_idx)
    triples = annotate_pages(pages_ds, index_ref, emit="triples",
                             batch_size=batch_size,
                             langs=list(langs) if langs else None)
    if selective:
        # guard: the restricted emission already yields only affected-
        # touching triples; keep the filter as the declared invariant
        triples = triples.map_batches(
            lambda t: t.filter(touching(t)), batch_format="pyarrow")
    delta = dedup_triples(triples, collect_urls=k_urls)

    bj = _bucket_and_join_fn(subj_buckets, k_urls)
    # materialized: ontology-bounded after dedup, consumed three times
    delta = delta.map_batches(bj, batch_format="pyarrow").materialize()
    delta_buckets = {r["subj_bucket"] for r in
                     delta.select_columns(["subj_bucket"]).take_all()}
    delta_rows = delta.count()

    # legacy pre-lock stores may hold stranded 'subj_bucket=K.trash'
    # dirs (current swaps use the '.'-prefixed name); skip anything
    # whose bucket id isn't a plain integer rather than crash AFTER
    # the re-annotation already ran — repair_adjacency restores them
    existing = {
        int(p.split("=", 1)[1])
        for p in os.listdir(adjacency_dir)
        if p.startswith("subj_bucket=")
        and p.split("=", 1)[1].isdigit()}
    bucket_files = {
        b: sorted(_glob.glob(os.path.join(
            adjacency_dir, f"subj_bucket={b}", "*.parquet")))
        for b in existing}

    if selective:
        # buckets holding affected OLD rows (the store is
        # ontology^2-bounded — orders of magnitude below corpus scale —
        # so this filtered scan is cheap relative to the re-annotation)
        all_files = [f for fs in bucket_files.values() for f in fs]
        aff_buckets: Set[int] = set()
        if all_files:
            aff = (rd.read_parquet(all_files)
                   .map_batches(bj, batch_format="pyarrow")
                   .map_batches(lambda t: t.filter(touching(t)),
                                batch_format="pyarrow"))
            aff_buckets = {r["subj_bucket"] for r in
                           aff.select_columns(["subj_bucket"])
                           .take_all()}
        touched = sorted(delta_buckets | aff_buckets)
    else:
        touched = sorted(existing | delta_buckets)

    info = {"mode": "selective" if selective else "full",
            "delta_triples": delta_rows,
            "affected_terms": len(clo["terms"]),
            "affected_fraction": round(clo["fraction"], 4),
            "automaton_surfaces": len(annot_idx.surfaces),
            "full_surfaces": len(idx_new.surfaces)}
    if not touched:
        return {**info, "touched_buckets": []}

    merged_in = delta
    touched_files = [f for b in touched for f in bucket_files.get(b, [])]
    if selective and touched_files:
        kept = (rd.read_parquet(touched_files)
                .map_batches(bj, batch_format="pyarrow")
                .map_batches(lambda t: t.filter(pc.invert(touching(t))),
                             batch_format="pyarrow"))
        merged_in = delta.union(kept)
    # non-selective: every old row is superseded by the full recompute

    merged = grouped_map(
        merged_in, "subj_bucket",
        lambda df: _merge_triple_frames(df, k_urls=k_urls)
        .assign(subj_bucket=lambda d: _subj_bucket_series(
            d["subj"], subj_buckets)),
        num_buckets=min(16, max(1, len(touched))))
    if k_urls:
        from .kg import _split_urls_column

        merged = merged.map_batches(_split_urls_column,
                                    batch_format="pyarrow")
    merged.write_parquet(tmp_root, partition_cols=["subj_bucket"])
    # a touched bucket whose every row was affected and re-emitted
    # nowhere ends up EMPTY: write_parquet creates no dir for it, but
    # the swap must still replace the live bucket — stage an empty dir
    for b in touched:
        os.makedirs(os.path.join(tmp_root, f"subj_bucket={b}"),
                    exist_ok=True)
    plan = os.path.join(tmp_root, "_PLAN")
    with open(plan + ".tmp", "w") as fh:
        _json.dump({"touched_buckets": touched,
                    "delta_id": refresh_id}, fh)
    os.rename(plan + ".tmp", plan)
    _apply_swap_plan(adjacency_dir, tmp_root, touched,
                     delta_id=refresh_id)
    return {**info, "touched_buckets": touched}
