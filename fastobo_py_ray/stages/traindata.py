"""Training-data curation operators beyond the dedup/textstats suites:
benchmark decontamination, stratified sampling, repetition statistics,
and sequence packing (driver brief "operations a large-scale
training-data pipeline would need").

Scale shapes:

* decontamination — the benchmark side is eval-scale (MBs, not corpus
  scale) so its n-gram set is collected once and broadcast with
  ``ray.put``; the corpus side is one stateless vectorized
  ``map_batches`` membership scan (numpy ``isin`` against the sorted
  benchmark gram-hash array). No shuffle at all.
* stratified sampling — per-batch partial top-n per stratum, then one
  coarse exchange over the (bounded) stratum key to finalize: the
  all-to-all moves at most ``n x |strata|`` pre-reduced rows.
* repetition stats — stateless vectorized ``map_batches`` (explode +
  C-speed groupby inside the batch), no shuffle.
* sequence packing — one coarse hash-bucket exchange, greedy first-fit
  -decreasing inside each bucket; packing quality needs only
  bucket-local optimality (training packs, not bin-packing proofs), so
  buckets never coordinate.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _space_grams(text: str, k: int) -> List[str]:
    """Contiguous k-grams over simple space-split tokens (kept exactly
    equal to the SQL oracle's ``string_split(text, ' ')`` semantics —
    NOT the ``\\w+`` shingles used by minhash)."""
    w = (text or "").split(" ")
    if len(w) < k:
        return []
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


def benchmark_gram_set(ds, text_col: str = "text", k: int = 5
                       ) -> "set[str]":
    """Distinct k-grams of a (small, eval-benchmark-sized) Dataset,
    collected to the driver for broadcast. Corpus-scale inputs must NOT
    go through here — this is the deliberately-small side of the
    decontamination join."""
    grams: set = set()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out: set = set()
        for t in df[text_col]:
            out.update(_space_grams(t, k))
        return pd.DataFrame({"g": sorted(out)})

    for batch in ds.map_batches(explode, batch_format="pandas") \
                   .iter_batches(batch_format="pandas"):
        grams.update(batch["g"])
    return grams


class Decontaminator:
    """Membership-scan stage (used task-based by default, actor-pool on
    request): flags documents sharing any k-gram with a broadcast
    benchmark gram set (training-eval contamination scan).

    The benchmark arrives as a pre-hashed, pre-sorted uint64 array
    (built once on the driver — 8 bytes/gram in the object store, no
    per-worker re-hash) and is fetched zero-copy in ``__init__``;
    each batch then runs one vectorized ``searchsorted`` membership
    test. Emits (id_col, n_hits, contaminated) where ``n_hits`` counts
    the DISTINCT contaminated grams of the document.
    """

    def __init__(self, bench_ref, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 5):
        import ray

        self.id_col, self.text_col, self.k = id_col, text_col, k
        bench = ray.get(bench_ref) if not isinstance(bench_ref,
                                                     np.ndarray) \
            else bench_ref
        self._bench = np.asarray(bench, dtype=np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_hits = np.zeros(len(df), dtype=np.int64)
        if len(self._bench) and len(df):
            # whole-batch vectorization: explode every document's
            # k-gram windows at once, hash the batch's DISTINCT grams
            # in ONE hash_array call, one searchsorted for membership,
            # distinct (doc, gram) pairs via combined-key np.unique —
            # no per-document Python beyond the gram join itself
            rows_l, grams_l = [], []
            for i, t in enumerate(df[self.text_col]):
                gs = _space_grams(t, self.k)
                if gs:
                    rows_l.append(np.full(len(gs), i, dtype=np.int64))
                    grams_l.append(gs)
            if rows_l:
                rows = np.concatenate(rows_l)
                grams = np.concatenate(grams_l).astype(object)
                codes, uniques = pd.factorize(grams)
                uk = np.unique(rows * len(uniques) + codes)
                urow, ucode = uk // len(uniques), uk % len(uniques)
                h = _hash_grams(list(uniques))
                idx = np.searchsorted(self._bench, h)
                idx[idx == len(self._bench)] = 0
                member = self._bench[idx] == h
                n_hits = np.bincount(urow[member[ucode]],
                                     minlength=len(df)).astype(np.int64)
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "n_hits": n_hits,
            "contaminated": (n_hits > 0).astype(np.int64)})


def _hash_grams(grams: List[str]) -> np.ndarray:
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(grams, dtype=object),
                              hash_key="fastobomray-dc00")


# per-worker-process Decontaminator cache (keyed by benchmark ObjectRef +
# scan params) — see decontaminate() docstring
_WORKER_DECON_CACHE: dict = {}


def decontaminate(ds, bench_ds, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 5,
                  concurrency=None):
    """Corpus Dataset + benchmark Dataset -> (id, n_hits, contaminated).

    64-bit gram hashes on both sides: collision odds for a corpus of G
    grams against a benchmark of B grams are ~G*B/2^64 (negligible at
    eval-benchmark B). The scan is shuffle-free — the benchmark set is
    the broadcast small side.

    Task-based by default: the benchmark array is pre-hashed/sorted on
    the driver and CACHED PER WORKER PROCESS (the ``resolve_index``
    pattern, `stages/mentions.py`), so the ``ray.get`` + Decontaminator
    construction runs once per worker, not once per batch — every later
    batch in the same process reuses the instance.  Pass
    ``concurrency=(lo, hi)`` to force the actor-pool form anyway (e.g.
    to pin a long-running scan's worker count)."""
    import ray

    bench_ref = ray.put(np.sort(_hash_grams(
        sorted(benchmark_gram_set(bench_ds, text_col, k)))))
    if concurrency is not None:
        return ds.map_batches(
            Decontaminator, batch_format="pandas",
            concurrency=concurrency,
            fn_constructor_kwargs={"bench_ref": bench_ref,
                                   "id_col": id_col,
                                   "text_col": text_col, "k": k})

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        key = (bench_ref.hex(), id_col, text_col, k)
        dc = _WORKER_DECON_CACHE.get(key)
        if dc is None:
            # bounded like resolve_index: repeated jobs ship fresh
            # ObjectRefs; evict before insert so a long-lived worker
            # holds at most a couple of benchmark arrays
            if len(_WORKER_DECON_CACHE) >= 2:
                _WORKER_DECON_CACHE.clear()
            dc = Decontaminator(bench_ref, id_col=id_col,
                                text_col=text_col, k=k)
            _WORKER_DECON_CACHE[key] = dc
        return dc(df)

    return ds.map_batches(scan, batch_format="pandas")


def cross_substr_decontam(ds, bench_ds, gram_len: int = 20,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          max_bench_grams: int = 5_000_000):
    """CHARACTER-level ExactSubstr decontamination (Lee et al. 2022's
    cross-corpus application: dedup train against eval): flag every
    corpus document sharing at least one ``gram_len``-character
    substring with ANY benchmark document, with the count and fraction
    of its windows that are contaminated.  Complements
    :func:`decontaminate` (word k-grams): character windows survive
    whitespace/punctuation reformatting that shifts word boundaries,
    the classic way benchmark text sneaks past token-level scans.

    Scale shape: the benchmark is the eval-scale broadcast side — its
    DISTINCT window grams are collected once (guarded by
    ``max_bench_grams``, which raises naming the hash-join scale path
    rather than OOMing) and shipped as (sorted hash array, exact gram
    frozenset), resolved once per worker process
    (``functions/broadcast.worker_cached``).  The corpus side is ONE
    stateless streaming ``map_batches`` scan — vectorized rolling
    hashes, ``searchsorted`` prefilter, exact string verify on hits
    only, so the flag is collision-exact.  Zero exchanges over corpus
    text; the corpus never materializes.

    Returns a DATASET of (id_col, n_windows, n_contam_windows,
    contam_frac, contaminated) with EVERY corpus doc present — docs
    shorter than ``gram_len`` (or with null text) carry
    ``n_windows == 0`` and are clean, matching the all-train-docs
    contract of :func:`decontaminate`."""
    import ray

    from .dedup import _gram_hashes

    grams: set = set()
    for b in bench_ds.map_batches(
            lambda df: pd.DataFrame({"g": sorted({
                t[i:i + gram_len]
                for t in df[text_col] if isinstance(t, str)
                for i in range(len(t) - gram_len + 1)})}),
            batch_format="pandas").iter_batches(batch_format="pandas"):
        grams.update(b["g"])
        if len(grams) > max_bench_grams:
            raise ValueError(
                f"cross_substr_decontam broadcasts the benchmark's "
                f"distinct {gram_len}-grams and is capped at "
                f"max_bench_grams={max_bench_grams}; for larger "
                f"benchmarks hash-join the corpus window stream against "
                f"the benchmark grams instead, or raise the cap "
                f"explicitly.")
    gram_set = frozenset(grams)
    hs = np.sort(np.asarray(
        [_gram_hashes(g, gram_len)[0] for g in grams],
        dtype=np.uint64)) if grams else np.empty(0, dtype=np.uint64)
    ref = ray.put((hs, gram_set))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import worker_cached
        hsorted, gset = worker_cached(ref)
        ids: List = []
        n_win: List[int] = []
        n_hit: List[int] = []
        for did, t in zip(df[id_col], df[text_col]):
            ids.append(did)
            if not isinstance(t, str):
                n_win.append(0)
                n_hit.append(0)
                continue
            h = _gram_hashes(t, gram_len)
            n_win.append(len(h))
            if len(h) == 0 or len(hsorted) == 0:
                n_hit.append(0)
                continue
            pos = np.searchsorted(hsorted, h)
            pos[pos == len(hsorted)] = 0
            cand = np.nonzero(hsorted[pos] == h)[0]
            n_hit.append(sum(1 for p in cand
                             if t[p:p + gram_len] in gset))
        nw = pd.Series(n_win, dtype="int64")
        nh = pd.Series(n_hit, dtype="int64")
        # half-AWAY rounding matching SQL round(); 0.0 for window-less
        frac = np.where(nw > 0,
                        np.floor((nh / nw.replace(0, 1)) * 1e6 + 0.5)
                        / 1e6, 0.0)
        return pd.DataFrame({id_col: pd.Series(ids),
                             "n_windows": nw,
                             "n_contam_windows": nh,
                             "contam_frac": frac,
                             "contaminated": (nh > 0).astype("int64")})

    return ds.map_batches(scan, batch_format="pandas")


def seeded_shuffle_shards(ds, id_col: str = "doc_id", seed: str = "s1",
                          n_shards: int = 16):
    """Deterministic seeded GLOBAL shuffle with balanced contiguous
    shard assignment — the training-order primitive: every epoch/run
    reproduces the identical order and shard layout from (seed, id)
    alone, stable under re-runs, resumes and repartitioning (no RNG
    state, no row-order dependence — the same property
    :func:`train_val_assign` gives the split).

    Order key is ``md5(seed || id)`` (SQL parity: DuckDB
    ``md5(seed || id::VARCHAR)``); ``pos`` is the global 0-based
    position in that order (:func:`~fastobo_py_ray.functions.relops.
    global_row_number` — ONE distributed sort, positions attached from
    block metadata without a second exchange); ``shard`` is SQL
    ``ntile(n_shards)``'s contiguous balanced tiling (the first
    ``N % n`` shards take ``N//n + 1`` rows), computed closed-form from
    ``pos`` so the two engines agree exactly.  Writing each shard as
    one output partition gives resumable, skew-free training input.

    Returns a DATASET of (id_col, pos, shard)."""
    from ..functions.relops import global_row_number

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col]
        return pd.DataFrame({
            id_col: ids,
            "__k": _md5_hex([seed + str(v) for v in ids])})

    keyed = ds.map_batches(key, batch_format="pandas")
    pos = global_row_number(keyed, ["__k", id_col], pos_col="pos")
    n_total = ds.count()

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.relops import ntile_from_pos
        return pd.DataFrame({id_col: df[id_col],
                             "pos": df["pos"].astype("int64"),
                             "shard": ntile_from_pos(
                                 df["pos"].to_numpy(), n_total,
                                 n_shards)})

    return pos.map_batches(shard, batch_format="pandas")


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

# Measured crossover (this box): DuckDB's vectorized C md5 costs ~4 ms
# fixed per call but 0.36 us/row vs the hashlib loop's 0.83 us/row, so
# it only wins once the array is tens of thousands of rows — i.e. never
# at map_batches batch sizes, but 2.3x on driver-side whole-column work.
_MD5_DUCKDB_MIN = 32_768


def _md5_hex(vals) -> List[str]:
    """md5 hex of ``str(v)`` per element, order-preserving — the
    engine-wide deterministic uniform-order key (SQL parity: DuckDB
    ``md5(v::VARCHAR)``).  Tiered: small inputs use the hashlib loop,
    large arrays route through DuckDB's vectorized md5 (relies on
    DuckDB's default ``preserve_insertion_order=true``; parity +
    order asserted in tests/test_traindata.py)."""
    n = len(vals)
    if n >= _MD5_DUCKDB_MIN:
        import duckdb

        _in = pd.DataFrame({"v": pd.Series(list(vals)).astype(str)})
        return duckdb.query("SELECT md5(v) AS h FROM _in") \
            .fetchnumpy()["h"].tolist()
    return [hashlib.md5(str(v).encode()).hexdigest() for v in vals]


def train_val_assign(ids) -> List[str]:
    """THE engine-wide deterministic train/val rule (~10% val): 'val'
    iff the first md5 byte of str(id) is < 0x1a. Single source of truth
    for q_train_split, the curation pipeline, and any caller needing
    split membership consistent across pipelines."""
    return ["val" if h[:2] < "1a" else "train" for h in _md5_hex(ids)]


def stratified_sample(ds, group_col: str = "lang", n: int = 50,
                      id_col: str = "doc_id"):
    """Deterministic n-per-stratum sample: order within each stratum by
    ``md5(str(id))`` (uniform, resume-stable, identical to the SQL
    ``row_number() OVER (... ORDER BY md5(...))`` oracle) and keep the
    first n.

    Per-batch partial top-n per stratum first, so the exchange moves at
    most ``n x strata-per-batch`` rows; the finalize is a coarse
    :func:`~..functions.relops.grouped_map` over the stratum key."""
    from ..functions.relops import grouped_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[group_col, id_col]].copy()
        sub["__h"] = _md5_hex(sub[id_col])
        sub = sub.sort_values(["__h", id_col])
        return sub.groupby(group_col, sort=False, group_keys=False) \
                  .head(n)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.sort_values(["__h", id_col])
        out = sub.groupby(group_col, sort=False, group_keys=False).head(n)
        return out.drop(columns="__h")

    return grouped_map(ds.map_batches(partial, batch_format="pandas"),
                       group_col, finalize, num_buckets=16)


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def repetition_stats_batch(df: pd.DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> pd.DataFrame:
    """Per-document word-repetition signals, fully vectorized inside the
    batch (explode -> C groupby; no per-doc Python):

    * ``n_words`` — space-split token count,
    * ``n_distinct`` — distinct words,
    * ``top_word_frac`` — most frequent word's share (high = repetitive
      boilerplate, the Gopher repetition filter signal),
    * ``distinct_frac`` — type/token ratio.
    """
    words = df[text_col].fillna("").str.split(" ")
    ex = pd.DataFrame({id_col: df[id_col].to_numpy()}) \
        .assign(__w=list(words)).explode("__w")
    cnt = ex.groupby([id_col, "__w"], sort=False, as_index=False).size()
    agg = cnt.groupby(id_col, sort=False, as_index=False).agg(
        top_c=("size", "max"), n_distinct=("size", "size"),
        n_words=("size", "sum"))
    return pd.DataFrame({
        id_col: agg[id_col],
        "n_words": agg["n_words"].astype("int64"),
        "n_distinct": agg["n_distinct"].astype("int64"),
        "top_word_frac": (agg["top_c"] / agg["n_words"]).round(6),
        "distinct_frac": (agg["n_distinct"] / agg["n_words"]).round(6)})


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda df: repetition_stats_batch(df, id_col, text_col),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(ds, id_col: str = "doc_id", text_col: str = "text",
                   budget: int = 256, num_buckets: int = 32):
    """Greedy sequence packing for training batches: assign each document
    to a pack such that a pack's total token count stays <= ``budget``
    (a document longer than the budget gets a pack of its own).

    Documents are hash-bucketed by id (deterministic, resume-stable),
    and each bucket packs its own documents first-fit-decreasing —
    bucket-local packing is the scale shape: packing efficiency only
    needs enough documents per bucket to mix lengths, never global
    coordination. Returns (id_col, n_tokens, pack_id) with
    ``pack_id = "<bucket>-<seq>"`` unique across buckets.
    """
    from ..functions.relops import grouped_map

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.relops import _bucket_ids

        n = df[text_col].fillna("").str.split(" ").str.len()
        out = df[[id_col]].copy()
        out["n_tokens"] = n.astype("int64")
        # same bucket-hash convention (incl. numeric widening) as every
        # other keyed exchange in the engine
        out["__pb"] = _bucket_ids(out, [id_col], num_buckets)
        return out

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pb, g in df.groupby("__pb", sort=False):
            g = g.sort_values(["n_tokens", id_col],
                              ascending=[False, True])
            open_room: List[int] = []   # remaining room per open pack
            assign = np.empty(len(g), dtype=np.int64)
            # first-fit-decreasing over a bounded window of the most
            # recently opened packs: an unbounded scan is O(packs) per
            # doc (quadratic in the bucket); the window keeps it linear
            # and only costs a little fill efficiency
            window = 64
            for i, t in enumerate(g["n_tokens"].to_numpy()):
                placed = False
                lo = max(0, len(open_room) - window)
                for p in range(lo, len(open_room)):
                    if t <= open_room[p]:
                        open_room[p] -= t
                        assign[i] = p
                        placed = True
                        break
                if not placed:
                    open_room.append(max(0, budget - t))
                    assign[i] = len(open_room) - 1
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(),
                "pack_id": [f"{pb}-{a}" for a in assign]}))
        if not out:
            return pd.DataFrame({id_col: df[id_col],
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "pack_id": pd.Series(dtype="object")})
        return pd.concat(out, ignore_index=True)

    return grouped_map(ds.map_batches(tokens, batch_format="pandas"),
                       "__pb", pack_bucket, num_buckets=num_buckets)


def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                    window: int = 32, stride: int = 24):
    """Overlapping word-window chunking — the context-window splitting
    step ahead of tokenize/pack in a training-data pipeline.  Each
    document emits one chunk per ``stride`` offset (``chunk_id`` 0, 1,
    ...), each covering up to ``window`` words; the final chunks are
    the (shorter) tails, so every word of every document is covered
    and consecutive chunks overlap by ``window - stride`` words.

    Fully batch-local (a document lives in one row, so no exchange at
    all — the embarrassingly parallel shape).  The chunk text is
    sliced from the ORIGINAL string by precomputed character offsets
    (one C-level slice per chunk), never re-joined token by token, and
    all offset arithmetic is vectorized over the exploded token table.

    Returns columns ``(id_col, chunk_id, n_words, chunk_text)``.
    ``stride > window`` would silently skip words between chunks, so it
    is rejected.
    """
    from ..functions.relops import typed_empty

    if stride > window or stride < 1:
        raise ValueError(
            f"chunk_documents requires 1 <= stride <= window "
            f"(got stride={stride}, window={window}); a stride larger "
            f"than the window leaves words covered by no chunk.")

    def chunk_batch(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].astype(str)
        s = texts.str.split(" ")
        nw = s.str.len().fillna(0).astype("int64").to_numpy()
        n_chunks = (nw + stride - 1) // stride  # ceil(nw/stride), >=1
        n_chunks = np.maximum(n_chunks, 1)
        total = int(n_chunks.sum())
        if total == 0:
            return typed_empty(pd.DataFrame({
                id_col: df[id_col].iloc[:0],
                "chunk_id": pd.Series(dtype="int64"),
                "n_words": pd.Series(dtype="int64"),
                "chunk_text": pd.Series(dtype="string")}))
        doc_ix = np.repeat(np.arange(len(df)), n_chunks)
        # chunk_id = position within its document
        chunk_id = np.arange(total) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks)
        w_start = chunk_id * stride                      # 0-based word
        w_stop = np.minimum(w_start + window, nw[doc_ix])
        # char offset of each word boundary: cumulative token lengths
        # (+1 per separating space), concatenated across the batch
        toks = s.explode()
        tlen = toks.str.len().fillna(0).astype("int64").to_numpy()
        ends = np.cumsum(tlen + 1)   # position AFTER word i's space
        starts_all = ends - tlen - 1  # char start of word i
        doc_off = np.repeat(np.cumsum(nw) - nw, n_chunks)  # word base
        doc_char0 = starts_all[doc_off]  # char 0 of the doc's slab
        c_start = starts_all[doc_off + w_start] - doc_char0
        c_stop = ends[doc_off + w_stop - 1] - 1 - doc_char0
        tx = texts.to_numpy()
        chunk_text = [tx[d][a:b] for d, a, b in
                      zip(doc_ix, c_start, c_stop)]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[doc_ix],
            "chunk_id": chunk_id.astype("int64"),
            "n_words": (w_stop - w_start).astype("int64"),
            "chunk_text": pd.Series(chunk_text, dtype="string")})

    return ds.map_batches(chunk_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023) —
# hashed-unigram log-likelihood-ratio scoring of a raw corpus against a
# small target (benchmark) distribution
# ---------------------------------------------------------------------------

def hashed_ngram_buckets(words: np.ndarray, num_buckets: int) -> np.ndarray:
    """md5-prefix hash bucket per word — the DSIR hashed feature map.

    md5 (not Python's salted ``hash`` or murmur) so the DuckDB oracle can
    reproduce the bucket EXACTLY: ``CAST(('0x' || substr(md5(w), 1, 8))
    AS UBIGINT) % K``.  Called on the batch's UNIQUE tokens only (Zipf:
    a vocab-tier loop, never the token stream)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(w).encode("utf-8")).hexdigest()[:8], 16)
         % num_buckets for w in words),
        dtype="int64", count=len(words))


def dsir_bucket_counts(ds, text_col: str = "text",
                       num_buckets: int = 64) -> np.ndarray:
    """Token-occurrence counts per hashed bucket over a Dataset — ONE
    streaming pass; every batch reduces to a constant ``num_buckets``-row
    partial (the exchange is blocks x K rows, corpus-independent), so
    the driver-side sum is bounded regardless of corpus size."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].astype(str).str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        c = toks.value_counts()
        counts = np.zeros(num_buckets, dtype="int64")
        if len(c):
            b = hashed_ngram_buckets(c.index.to_numpy(dtype=object),
                                     num_buckets)
            counts = np.bincount(
                b, weights=c.to_numpy(dtype="float64"),
                minlength=num_buckets).astype("int64")
        return pd.DataFrame({
            "b": np.arange(num_buckets, dtype="int64"), "n": counts})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    return parts.groupby("b")["n"].sum() \
        .reindex(range(num_buckets), fill_value=0).to_numpy()


def dsir_weights(target_counts: np.ndarray,
                 raw_counts: np.ndarray) -> np.ndarray:
    """Per-bucket importance weight in INTEGER micro-nats:
    round(1e6 * ln( (ct+1)(Nr+K) / ((cr+1)(Nt+K)) )) — add-1-smoothed
    log-likelihood ratio of the target vs raw hashed-unigram models.

    Integerizing at the BUCKET level (K values) makes the per-document
    score an exact int64 sum, immune to float summation order across
    engines; the oracle computes the identical arithmetic form (exact
    integer products -> one double division -> ln -> round), same
    oracle-form discipline as q_kmeans_assign's distance."""
    t = np.asarray(target_counts, dtype="float64")
    r = np.asarray(raw_counts, dtype="float64")
    k = len(t)
    ratio = ((t + 1.0) * (r.sum() + k)) / ((r + 1.0) * (t.sum() + k))
    return np.round(1e6 * np.log(ratio)).astype("int64")


def dsir_scores(raw_ds, weights: np.ndarray, num_buckets: int,
                id_col: str = "doc_id", text_col: str = "text"):
    """Per-document DSIR score: integer sum of bucket weights over the
    doc's token occurrences (+ token count).  Streaming: the weight
    vector is a broadcast numpy array (zero-copy plasma read per task);
    batches reduce to per-doc partials and ONE skinny keyed exchange
    (:func:`~..functions.relops.grouped_agg`) makes docs split across
    batches exact.  Docs with zero tokens score 0 (kept, not dropped)."""
    import ray

    from ..functions.relops import grouped_agg

    wref = ray.put(np.ascontiguousarray(weights, dtype="int64"))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wref)  # numpy: zero-copy from plasma
        s = df[text_col].astype(str).str.split(" ")
        ex = s.explode()
        ex = ex[ex.notna() & (ex != "")]
        if len(ex):
            uniq, inv = np.unique(ex.to_numpy(dtype=object),
                                  return_inverse=True)
            wt = w[hashed_ngram_buckets(uniq, num_buckets)][inv]
            ids = df[id_col].loc[ex.index].to_numpy()
            g = pd.DataFrame({id_col: ids, "wt": wt}) \
                .groupby(id_col, as_index=True)["wt"] \
                .agg(["sum", "size"])
        else:
            g = pd.DataFrame(columns=["sum", "size"])
        # every batch doc emits a partial (zero-token docs -> 0/0)
        out = pd.DataFrame({id_col: df[id_col].drop_duplicates()})
        out["s"] = out[id_col].map(g["sum"]).fillna(0).astype("int64")
        out["n"] = out[id_col].map(g["size"]).fillna(0).astype("int64")
        return out

    parts = raw_ds.map_batches(score, batch_format="pandas")
    return grouped_agg(parts, id_col,
                       dsir_score=("s", "sum"), n_tokens=("n", "sum"))
