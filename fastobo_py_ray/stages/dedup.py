"""Deduplication suite for training-data pipelines (driver brief):

* exact — content-hash partition + per-group min-id winner;
* MinHash + LSH — shingle -> minhash signature -> banded bucket groupby ->
  candidate pairs -> Jaccard verify -> connected components;
* SimHash — 64-bit hyperplane-free simhash over token hashes;
* n-gram Jaccard — exact pairwise verify (used inside LSH buckets);
* embedding cosine near-dup — LSH-free bucketed cosine over normalized
  vectors.

Scale notes: every exchange here is a coarse hash-bucket shuffle
(``grouped_map`` — high-cardinality keys never touch Ray's per-group
sort-groupby); signatures are computed whole-batch (vectorized numpy) so
the shuffle moves fixed-width signatures, never the documents; candidate
verification joins the texts back with ONE partitioned hash join of the
exploded (sparse) pair list against the corpus, and clustering is the
distributed connected-components family from :mod:`.canonicalize` —
nothing corpus-sized is ever collected or broadcast.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# deterministic 64-bit universal hash family for minhash
_MERSENNE = (1 << 61) - 1


def _hash_tokens(tokens: List[str]) -> np.ndarray:
    """Vectorized, process-stable 61-bit hash of a token/shingle list
    (pandas siphash with a fixed key — one C call for the whole array,
    never a per-string Python hash loop)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(tokens, dtype=object),
                           hash_key="fastobomray-mh00")
    return h & np.uint64(_MERSENNE)


def shingles(text: str, k: int = 3) -> List[str]:
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def _minhash_params(num_perm: int, seed: int = 42
                    ) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, params) -> np.ndarray:
    a, b = params
    hs = _hash_tokens(shingles(text))
    if len(hs) == 0:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    # (a * h + b) mod p, min over shingles — vectorized outer product
    vals = (np.multiply.outer(hs, a) + b) % _MERSENNE
    return vals.min(axis=0)


_SIG_CHUNK_SHINGLES = 1 << 19  # caps the (shingles x num_perm) scratch


def _signatures_segmented(hs: np.ndarray, offsets: np.ndarray,
                          num_perm: int, params) -> np.ndarray:
    """Per-doc minhash signatures over a concatenated shingle-hash array
    (``hs[offsets[i]:offsets[i+1]]`` = doc i). Identical results to
    :func:`minhash_signature` per doc (parity guarded by test); empty
    docs get the sentinel all-``_MERSENNE`` signature. Processed in doc
    chunks so the (shingles x num_perm) scratch stays bounded."""
    a, b = params
    n = len(offsets) - 1
    sigs = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
    lo_doc = 0
    while lo_doc < n:
        hi_doc = lo_doc
        while (hi_doc < n and
               offsets[hi_doc + 1] - offsets[lo_doc] <= _SIG_CHUNK_SHINGLES):
            hi_doc += 1
        hi_doc = max(hi_doc, lo_doc + 1)  # never stall on one huge doc
        seg = hs[offsets[lo_doc]:offsets[hi_doc]]
        if len(seg):
            vals = (np.multiply.outer(seg, a) + b) % _MERSENNE
            starts = offsets[lo_doc:hi_doc] - offsets[lo_doc]
            nonempty = np.diff(offsets[lo_doc:hi_doc + 1]) > 0
            if nonempty.any():
                mins = np.minimum.reduceat(vals, starts[nonempty], axis=0)
                sigs[lo_doc:hi_doc][nonempty] = mins
        lo_doc = hi_doc
    return sigs


def _band_hashes(sigs: np.ndarray, bands: int, rows_per_band: int
                 ) -> np.ndarray:
    """(n_docs, num_perm) signatures -> (n_docs, bands) uint64 band keys:
    vectorized FNV-1a fold over each band's rows (equal band key <=>
    equal band chunk up to negligible 64-bit collision odds)."""
    n = sigs.shape[0]
    out = np.empty((n, bands), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    basis = np.uint64(14695981039346656037)
    for bi in range(bands):
        acc = np.full(n, basis, dtype=np.uint64)
        chunk = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
        for j in range(rows_per_band):
            acc = (acc ^ chunk[:, j]) * prime
        out[:, bi] = acc
    return out


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(shingles(text_a, k)), set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


_SIMHASH_KEY = "fastobomray-sh00"


def simhash64_batch(texts) -> np.ndarray:
    """SimHash for a whole batch of texts, fully vectorized: ONE siphash
    call over every token in the batch (``pd.util.hash_array``), then
    per-bit vote sums via segmented ``np.add.reduceat`` — no per-token
    Python hashing in the hot path.  63 bit planes (the sign bit is
    left clear so the value round-trips through int64 columns).

    Returns an int64 array; empty/whitespace-only texts hash to 0.
    """
    toks = [_WORD_RE.findall((t or "").lower()) for t in texts]
    n = len(toks)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.fromiter((len(ws) for ws in toks), dtype=np.int64, count=n)
    flat = [w for ws in toks for w in ws]
    if not flat:
        return out.astype(np.int64)
    h = pd.util.hash_array(np.asarray(flat, dtype=object),
                           hash_key=_SIMHASH_KEY)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nonempty = lens > 0
    ne_off = offsets[nonempty]
    half = lens[nonempty].astype(np.float64) / 2.0
    acc = np.zeros(ne_off.size, dtype=np.uint64)
    for k in range(63):
        bits = ((h >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
        # reduceat over nonempty segment starts only (an empty segment
        # would alias its neighbor's first element)
        ones = np.add.reduceat(bits, ne_off)
        acc |= (ones > half).astype(np.uint64) << np.uint64(k)
    out[nonempty] = acc
    return out.astype(np.int64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes (sign of per-bit vote sums).
    Scalar convenience; batches go through :func:`simhash64_batch`."""
    return int(simhash64_batch([text])[0])


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                keep: str = "min"):
    """Exact dedup by content hash: winner = min(id) per identical text.

    Pattern: vectorized content-hash inside map_batches, then ONE hash
    shuffle ``groupby(hash)`` with per-batch partial (hash -> min id,
    count) combiners so duplicate-heavy corpora pre-reduce before the
    exchange. Returns (hash groups) Dataset with columns
    (content_md5, doc_id, n_copies).
    """
    from ..functions.relops import group_min, grouped_map
    from .textstats import content_hash_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = content_hash_batch(df, text_col)
        if id_col != "doc_id":
            # a pre-existing unrelated doc_id column would otherwise
            # duplicate the label after the rename and break the groupby
            df = df.drop(columns=["doc_id"], errors="ignore") \
                .rename(columns={id_col: "doc_id"})
        counts = df.groupby("content_md5", as_index=False,
                            sort=False).size().rename(
            columns={"size": "n_copies"})
        mins = group_min(df, ["content_md5"], "doc_id")
        return mins.merge(counts, on="content_md5")[
            ["content_md5", "doc_id", "n_copies"]]

    # content_md5 is ~one group per distinct document — far too many for
    # Ray's sort-groupby (per-group Python cost); one coarse hash-bucket
    # exchange + in-task pandas agg instead (exact: a bucket holds every
    # partial of its hashes). group_min keeps string doc ids off
    # pandas' per-group object-min fallback.
    def final(df: pd.DataFrame) -> pd.DataFrame:
        sums = df.groupby("content_md5", as_index=False,
                          sort=False)["n_copies"].sum()
        mins = group_min(df, ["content_md5"], "doc_id")
        return mins.merge(sums, on="content_md5")[
            ["content_md5", "doc_id", "n_copies"]]

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_map(partials, "content_md5", final)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool signature stage: permutation params built once per actor."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.params = _minhash_params(num_perm, seed)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """doc rows -> exploded (band_id, band_hash, doc_id) rows.

        Whole-batch vectorized: one C-speed hash call over every shingle
        in the batch, one (shingles x num_perm) affine transform with
        segmented per-doc minima, one FNV fold per band — the only
        per-doc Python is shingle construction."""
        texts = df[self.text_col].tolist()
        sh: List[str] = []
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            s = shingles(t)
            sh.extend(s)
            offsets[i + 1] = len(sh)
        sigs = _signatures_segmented(_hash_tokens(sh), offsets,
                                     self.num_perm, self.params)
        bh = _band_hashes(sigs, self.bands, self.rows_per_band)
        n = len(texts)
        return pd.DataFrame({
            "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n),
            "band_hash": bh.ravel(),
            "doc_id": np.repeat(df[self.id_col].to_numpy(), self.bands)})


def minhash_candidate_pairs(ds, id_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, seed: int = 42,
                            max_bucket_size: Optional[int] = None,
                            num_buckets: int = 64,
                            dedup_pairs: bool = True):
    """documents -> candidate near-dup pairs (doc_a < doc_b) via LSH
    banding: signature map_batches -> coarse hash-bucket exchange on
    (band_id, band_hash) -> within-band-bucket pair explosion. Band
    buckets are one group per distinct band signature (~docs x bands of
    them), so this rides :func:`grouped_map` rather than Ray's
    sort-groupby; ``num_buckets`` coarse groups move, the per-signature
    loop runs in-task at pandas speed.

    ``max_bucket_size=M`` caps band buckets larger than M (degenerate
    signatures — e.g. boilerplate docs all hashing identically — would
    otherwise emit O(m^2) pairs from a single hot bucket): an oversized
    bucket emits O(m) STAR edges (every id -> the bucket's min id)
    instead of the full pair explosion.  The downstream union-find only
    needs connectivity, so the star keeps the whole hot cluster
    clusterable — the failure mode of silently dropping it (a >=M-copy
    cluster has the SAME degenerate signature in every band, so no
    other band would rescue it) cannot occur.  Star pairs still pass
    through the Jaccard verify like any candidate pair."""
    from ..functions.relops import grouped_map

    # task-based, not an actor pool: the hasher's state is two tiny
    # numpy permutation arrays, cheaper to ship in the task closure than
    # to pay actor-pool startup (the actor form is for stages whose
    # __init__ builds real state — model, trie, compiled index)
    sigs = ds.map_batches(
        MinHasher(id_col=id_col, text_col=text_col, num_perm=num_perm,
                  bands=bands, seed=seed),
        batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Pair explosion for one coarse bucket, vectorized end to end.

        Almost every band signature is unique (one doc) and almost every
        collision group has exactly 2 docs, so per-group Python here
        would dominate the whole operator at corpus scale (measured:
        8M band rows -> ~8M groups -> tens of seconds of pure group
        dispatch).  Instead: one C sort, boundary detection by
        shift-compare, size-2 groups exploded with pure numpy, and a
        Python loop ONLY over the rare size>=3 collision groups."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype=df["doc_id"].dtype),
                              "doc_b": pd.Series(dtype=df["doc_id"].dtype)})
        if not len(df):
            return empty
        df = df.drop_duplicates(subset=["band_id", "band_hash", "doc_id"])
        # signatures seen once can't pair: C-speed pre-filter
        df = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        if not len(df):
            return empty
        # doc_id ascending within each group => doc_a < doc_b for free
        df = df.sort_values(["band_id", "band_hash", "doc_id"],
                            kind="mergesort")
        b = df["band_id"].to_numpy()
        h = df["band_hash"].to_numpy()
        ids = df["doc_id"].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = (b[1:] != b[:-1]) | (h[1:] != h[:-1])
        sizes = np.diff(np.append(np.flatnonzero(new), len(df)))
        starts = np.append(0, np.cumsum(sizes[:-1]))
        out = []
        two = sizes == 2
        if two.any():
            s2 = starts[two]
            out.append(pd.DataFrame({"doc_a": ids[s2],
                                     "doc_b": ids[s2 + 1]}))
        for g in np.flatnonzero(sizes > 2):
            gi = ids[starts[g]:starts[g] + sizes[g]]
            if max_bucket_size is not None and len(gi) > max_bucket_size:
                # degenerate bucket: O(m) star to the min id, not O(m^2)
                out.append(pd.DataFrame({
                    "doc_a": gi[:1].repeat(len(gi) - 1), "doc_b": gi[1:]}))
                continue
            ia, ib = np.triu_indices(len(gi), k=1)
            out.append(pd.DataFrame({"doc_a": gi[ia], "doc_b": gi[ib]}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    cand = grouped_map(sigs, ["band_id", "band_hash"], bucket_pairs,
                       num_buckets=num_buckets)

    # cross-band duplicate pairs: per-batch combiner, then (unless the
    # caller piggybacks the global dedup on a downstream keyed exchange,
    # as minhash_dedup does on its verify join) one coarse exchange
    # keyed on the pair, where all copies of a pair co-locate
    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_a", "doc_b"])

    cand = cand.map_batches(dd, batch_format="pandas")
    if not dedup_pairs:
        return cand
    return grouped_map(cand, ["doc_a", "doc_b"], dd,
                       num_buckets=num_buckets)


def _len_key(v) -> str:
    """Length-prefixed string encoding whose plain-string order equals the
    numeric-safe (len(s), s) order used by ``union_find`` — so the
    distributed min-label clustering picks the SAME representative as the
    driver-side oracle ('9' < '10' for int ids)."""
    s = str(v)
    return f"{len(s):04d}{s}"


def _len_key_inv(s: str) -> str:
    return s[4:]


def _arrow_type(t) -> pa.DataType:
    """Dataset.schema() yields Arrow types for Arrow blocks but numpy
    dtypes for pandas blocks — normalize to Arrow (object -> string)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def minhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  num_perm: int = 64, bands: int = 16,
                  jaccard_threshold: float = 0.8, seed: int = 42,
                  max_bucket_size: Optional[int] = 1000,
                  num_join_buckets: int = 32, exchange: str = "pandas"):
    """Full near-dup pipeline, fully distributed — no document text ever
    lands on the driver:

        LSH candidate pairs (banded signature shuffle, hot-bucket capped)
        -> Jaccard verify via ONE :func:`hash_join` of the exploded
           (pair, side) rows against the corpus plus a pair-keyed
           re-assembly exchange (texts travel worker-to-worker only;
           the corpus text column moves through a single exchange)
        -> distributed :func:`connected_components_contract` (tree-reduce
           of per-block union-finds; the large-star/small-star rounds
           (`connected_components_bigstar`) are the fallback for node
           sets beyond one worker's heap) over the verified edge set
        -> Dataset of (id_col, cluster_rep): every member of a verified
           near-dup cluster, representatives mapping to themselves.

    The representative is the cluster's minimum id under the numeric-safe
    (len, str) order — identical to the driver ``union_find`` oracle
    (parity guarded by test).  Ids keep their original dtype (restored
    from the input schema after the string-keyed clustering rounds).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.relops import hash_join
    from .canonicalize import connected_components_contract

    schema = ds.schema()
    if schema is not None:
        id_type = _arrow_type(dict(zip(schema.names, schema.types))[id_col])
    else:
        # schema can be indeterminate when upstream filters left empty
        # object-dtype pandas blocks; sniff one row instead
        sample = ds.take(1)
        if not sample:
            id_type = pa.string()
        else:
            id_type = pa.array([sample[0][id_col]]).type

    def _empty():
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "cluster_rep": pa.array([], type=id_type)}))

    # dedup_pairs=True: a true near-dup pair collides in MOST of its
    # bands, so the raw candidate stream carries a ~bands-fold copy
    # amplification (measured at 500k docs: 2.05M raw pair rows for
    # 150k distinct pairs). Deduping on a skinny (doc_a, doc_b)
    # exchange BEFORE the text join keeps that amplification out of
    # the corpus-text exchange and the verify exchange (interleaved A/B
    # at 500k docs/32cpu: full pipeline 48.1/48.4s pre-deduped vs
    # 59.9/54.7s riding the dedup on the verify join — the round-2
    # design — and the gap grows with the band count at scale).
    cand = minhash_candidate_pairs(
        ds, id_col, text_col, num_perm, bands, seed,
        max_bucket_size=max_bucket_size, dedup_pairs=True).materialize()
    if cand.count() == 0:
        return _empty()

    # texts attach in ONE corpus join: each pair explodes to two
    # (pair, side) rows keyed by its member doc, the corpus is joined
    # once on doc_id, and the pair re-assembles in the verify exchange.
    # (Two per-side joins would stream the whole corpus text through the
    # exchange twice; this moves it once plus the sparse pair texts.)
    def to_long(df: pd.DataFrame) -> pd.DataFrame:
        # pair keys travel as length-prefixed STRINGS: the join's
        # NA-widening floats side-exclusive numeric columns, and an
        # int64 id above 2^53 would come back corrupted from the float
        # round-trip; string keys are widening-proof, and _len_key order
        # is exactly the numeric-safe representative order downstream.
        # doc_id (the join key) keeps the corpus dtype — both sides
        # carry it, so it never widens.
        ka = [_len_key(v) for v in df["doc_a"]]
        kb = [_len_key(v) for v in df["doc_b"]]
        n = len(df)
        return pd.DataFrame({
            "ka": pd.Series(ka + ka, dtype="string"),
            "kb": pd.Series(kb + kb, dtype="string"),
            "side": ["a"] * n + ["b"] * n,
            "doc_id": np.concatenate([df["doc_a"].to_numpy(),
                                      df["doc_b"].to_numpy()])})

    docs = ds.map_batches(
        lambda df: df[[id_col, text_col]].rename(
            columns={id_col: "doc_id", text_col: "__text"}),
        batch_format="pandas")
    joined = hash_join(cand.map_batches(to_long, batch_format="pandas"),
                       docs, on="doc_id",
                       num_buckets=num_join_buckets,
                       lcols=["ka", "kb", "side", "doc_id"],
                       rcols=["doc_id", "__text"])

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Re-pair sides, dedup cross-band pair copies (exact here: all
        copies of a pair co-locate), Jaccard in the worker; pair keys
        are already the length-prefixed edge encoding."""
        empty = pd.DataFrame({"a": pd.Series(dtype="string"),
                              "b": pd.Series(dtype="string")})
        df = df.drop_duplicates(subset=["ka", "kb", "side"])
        a = df[df["side"] == "a"][["ka", "kb", "__text"]]
        b = df[df["side"] == "b"][["ka", "kb", "__text"]]
        m = a.merge(b, on=["ka", "kb"], suffixes=("_a", "_b"))
        if m.empty:
            return empty
        ok = np.fromiter(
            (jaccard(x, y) >= jaccard_threshold
             for x, y in zip(m["__text_a"], m["__text_b"])),
            dtype=bool, count=len(m))
        kept = m[ok]
        return pd.DataFrame({
            "a": kept["ka"].astype("string"),
            "b": kept["kb"].astype("string")})

    from ..functions.relops import grouped_map

    edges = grouped_map(joined, ["ka", "kb"], verify_bucket,
                        num_buckets=num_join_buckets,
                        exchange=exchange).materialize()
    if edges.count() == 0:
        return _empty()

    # edges are _len_key-encoded, so plain string order IS the
    # numeric-safe (len, str) representative order
    labels = connected_components_contract(edges, "a", "b")

    def decode(t: pa.Table) -> pa.Table:
        node = pa.array([_len_key_inv(v) for v in t["node"].to_pylist()],
                        type=pa.string())
        lab = pa.array([_len_key_inv(v) for v in t["label"].to_pylist()],
                       type=pa.string())
        return pa.table({id_col: pc.cast(node, id_type),
                         "cluster_rep": pc.cast(lab, id_type)})

    return labels.map_batches(decode, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, threshold: float = 0.8,
                        max_doc_freq: Optional[int] = None):
    """EXACT n-gram Jaccard near-dup pairs via a distributed shingle
    inverted index (no LSH approximation):

        explode distinct (shingle, doc, |doc shingles|) -> groupby(shingle)
        pair partials -> groupby(doc_a, doc_b [, sizes]) sum = |A∩B| ->
        vectorized jaccard filter.

    The per-doc shingle count ``n`` is attached at explode time and rides
    the shuffles as two extra int columns (functionally dependent on the
    doc id, so grouping on it is exact) — no driver-side size map, no
    second pass over the corpus, and the result is a Dataset.  Both
    exchanges are coarse hash-bucket shuffles (:func:`grouped_map`) —
    the shingle key has ~corpus-size x doc-length cardinality, which
    Ray's sort-groupby handles at a fixed Python cost per group; inside
    a bucket the pair partials come from one C-speed self-merge on the
    shingle column, pre-summed per pair before the second exchange.

    Skew note: a shingle shared by m docs emits O(m^2) pairs —
    ``max_doc_freq=M`` drops shingle groups larger than M (stop-gram
    filtering, the corpus-scale path): intersections lose only ubiquitous
    shingles, so reported jaccard is a lower bound and the result is a
    SUBSET of the exact pairs (guarded by test); leave ``None`` for the
    oracle-checkable exact baseline, or use
    :func:`minhash_candidate_pairs` (probabilistic) instead.
    Returns a Dataset of (doc_a, doc_b, jaccard >= threshold), ids ordered.
    """
    inter = _jaccard_inter(ds, id_col, text_col, k, max_doc_freq)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": df.get("doc_a", pd.Series(dtype="int64")),
                                 "doc_b": df.get("doc_b", pd.Series(dtype="int64")),
                                 "jaccard": pd.Series(dtype="float64")})
        jac = (df["inter"] / (df["n_a"] + df["n_b"] - df["inter"])).round(6)
        out = df.assign(jaccard=jac)
        out = out[out["jaccard"] >= threshold]
        return out[["doc_a", "doc_b", "jaccard"]]

    return inter.map_batches(finish, batch_format="pandas")


def _jaccard_inter(ds, id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3, max_doc_freq: Optional[int] = None):
    """The shared exact-Jaccard intersection pipeline behind
    :func:`ngram_jaccard_pairs` and :func:`jaccard_topk_neighbors`:
    distinct-shingle explode -> shingle-keyed pair partials (C-speed
    in-bucket self-merge, pre-summed per pair) -> pair-keyed reduce.
    Returns a Dataset of ``(doc_a, doc_b, n_a, n_b, inter)`` with
    doc_a < doc_b — every pair sharing >= 1 shingle."""
    from ..functions.relops import grouped_agg, grouped_map

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rid, rsh, rn = [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            ss = set(shingles(t, k))
            for s in ss:
                rid.append(i)
                rsh.append(s)
                rn.append(len(ss))
        return pd.DataFrame({"shingle": rsh, "doc": rid,
                             "n": pd.Series(rn, dtype="int64")})

    sh = ds.map_batches(explode, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (shingle, doc) by construction; a self-merge
        # on shingle explodes each shingle group's doc pairs in C, then
        # an in-task pre-sum collapses them to one partial per pair
        sub = df
        if max_doc_freq is not None:
            cnt = sub.groupby("shingle", sort=False)["doc"].transform("size")
            sub = sub[cnt <= max_doc_freq]  # stop-gram: too common
        m = sub.merge(sub, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        if m.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype=df["doc"].dtype),
                                 "doc_b": pd.Series(dtype=df["doc"].dtype),
                                 "n_a": pd.Series(dtype="int64"),
                                 "n_b": pd.Series(dtype="int64"),
                                 "inter": pd.Series(dtype="int64")})
        g = m.groupby(["doc_a", "doc_b", "n_a", "n_b"], as_index=False,
                      sort=False).size().rename(columns={"size": "inter"})
        return g.astype({"inter": "int64"})

    return grouped_agg(
        grouped_map(sh, "shingle", bucket_pairs),
        ["doc_a", "doc_b", "n_a", "n_b"], inter=("inter", "sum"))


def jaccard_topk_neighbors(ds, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 3,
                           topk: int = 3,
                           max_doc_freq: Optional[int] = None,
                           num_buckets: int = 64):
    """Per-document top-``topk`` nearest neighbors by EXACT word-k-gram
    Jaccard — the k-NN near-dup graph construction that feeds cluster
    canonicalization and SemDeDup-style pruning with an exact edge
    list instead of LSH candidates.

    Rides :func:`_jaccard_inter` (two coarse exchanges), then
    symmetrizes each pair into both endpoint rows and runs ONE skinny
    doc-keyed exchange whose in-bucket C sort + cumcount takes the
    top-k.  Similarity is the exact integer
    ``jac_micro = inter * 1_000_000 // union`` — ranking on the
    integer grid (round-before-rank) so engine and SQL argsort
    identically; ties break on neighbor id ascending.  Docs with no
    positive-intersection neighbor are absent from the output.

    Returns a Dataset of ``(doc_id, nbr, jac_micro, rnk)`` with
    ``rnk`` in 1..topk.  Skew note: the symmetric edge list is the
    pair table doubled — corpus-bounded for near-dup-shaped corpora;
    ``max_doc_freq`` is the stop-gram cap when shingle groups explode.
    """
    from ..functions.relops import grouped_map

    inter = _jaccard_inter(ds, id_col, text_col, k, max_doc_freq)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "jac_micro": pd.Series(dtype="int64")})
        union = (df["n_a"] + df["n_b"] - df["inter"]).to_numpy()
        jm = (df["inter"].to_numpy() * 1_000_000) // union
        return pd.DataFrame({
            "doc_id": pd.concat([df["doc_a"], df["doc_b"]],
                                ignore_index=True),
            "nbr": pd.concat([df["doc_b"], df["doc_a"]],
                             ignore_index=True),
            "jac_micro": np.concatenate([jm, jm]).astype("int64")})

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "jac_micro", "nbr"],
                            ascending=[True, False, True], kind="stable")
        rnk = df.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        out = df.assign(rnk=rnk.astype("int64"))
        return out[out["rnk"] <= topk]

    edges = inter.map_batches(symmetrize, batch_format="pandas")
    return grouped_map(edges, "doc_id", top, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         "cos_sim": pd.Series(dtype="float64")})


def _cosine_pairs(ids: np.ndarray, normalized: np.ndarray,
                  threshold: float) -> pd.DataFrame:
    """Shared pair extraction (exact + LSH paths): 6-decimal-rounded sims
    thresholded on the rounded value (oracle parity), ids ordered."""
    sims = np.round(normalized @ normalized.T, 6)
    ia, ib = np.where(np.triu(sims, k=1) >= threshold)
    if len(ia) == 0:
        return _empty_pairs()
    a, b = ids[ia], ids[ib]
    swap = a > b
    return pd.DataFrame({"id_a": np.where(swap, b, a),
                         "id_b": np.where(swap, a, b),
                         "cos_sim": sims[ia, ib]})


def embedding_near_dup_lsh(ds, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.9, num_planes: int = 6,
                           seed: int = 42,
                           dim: Optional[int] = None) -> pd.DataFrame:
    """Scale path for cosine near-dup: random-hyperplane LSH bucketing
    (one hash shuffle) then within-bucket pairwise cosine — O(sum b_i^2)
    instead of O(N^2), fully distributed.  Approximate: pairs whose
    vectors land in different buckets are missed (recall rises with fewer
    planes / by unioning multiple seeds); exactness-checked against
    :func:`embedding_near_dup` on clustered data in tests.
    Pass ``dim`` to avoid the schema-sniffing partial execution.
    Returns a DATASET of (id_a, id_b, cos_sim >= threshold) — the pair
    list is corpus-scale on a near-dup-heavy corpus and must never be
    collected to the driver by the operator itself."""
    from .ann import LshBucketer, _as_matrix, _normalize

    if dim is None:
        sample = ds.take(1)
        if not sample:
            return _empty_pairs()
        dim = len(sample[0][vec_col])
    bucketer = LshBucketer(dim, num_planes, seed, vec_col)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs()
        return _cosine_pairs(g[id_col].to_numpy(),
                             _normalize(_as_matrix(g[vec_col])), threshold)

    from ..functions.relops import grouped_map

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = [pairs(g) for _, g in df.groupby("bucket", sort=False)]
        return pd.concat(out, ignore_index=True) if out else _empty_pairs()

    return grouped_map(ds.map_batches(bucketer, batch_format="pandas"),
                       "bucket", bucket_pairs)


def embedding_near_dup(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                       threshold: float = 0.95, block: int = 2048,
                       max_rows: int = 100_000):
    """Near-duplicate pairs by cosine similarity — EXACT O(N^2) BASELINE.

    This is the oracle/verification path only: an all-pairs block-matmul
    driver consume over ``iter_batches``.  The production-scale default is
    :func:`embedding_near_dup_lsh` (one hash shuffle, O(sum b_i^2) within
    buckets, fully distributed).  ``max_rows`` guards against accidentally
    pointing the N^2 baseline at a corpus-scale table: the collect aborts
    as soon as the cap is crossed, naming the scale path.

    .. versionchanged:: round 2
       Previously unbounded; callers that relied on running this baseline
       past 100k rows (slow, but it completed) must now pass ``max_rows``
       explicitly — a deliberate contract break so the quadratic path is
       always an informed choice.
    Returns pandas (id_a, id_b, cos_sim>=threshold)."""
    ids: List = []
    mats: List[np.ndarray] = []
    n_seen = 0
    for batch in ds.iter_batches(batch_size=block, batch_format="pandas"):
        n_seen += len(batch)
        if n_seen > max_rows:
            raise ValueError(
                f"embedding_near_dup is the exact O(N^2) baseline and is "
                f"capped at max_rows={max_rows} rows; use "
                f"embedding_near_dup_lsh (distributed, bucketed) for "
                f"larger corpora, or raise max_rows explicitly.")
        ids.extend(batch[id_col].tolist())
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch[vec_col]])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        mats.append(m)
    if not mats:
        return _empty_pairs()
    # block the N x N similarity scan: one (block x N) strip at a time,
    # so peak scratch is block*N*8 bytes (~1.6 GB at the 100k cap with
    # block=2048), never an N^2 allocation
    idv = np.asarray(ids)
    mat = np.vstack(mats)
    parts = []
    for lo in range(0, len(mat), block):
        hi = min(lo + block, len(mat))
        sims = np.round(mat[lo:hi] @ mat.T, 6)
        ia, ib = np.where(sims >= threshold)
        keep = (ia + lo) < ib  # upper triangle only, no self-pairs
        if keep.any():
            parts.append(pd.DataFrame({
                "id_a": idv[(ia + lo)[keep]],
                "id_b": idv[ib[keep]],
                "cos_sim": sims[ia[keep], ib[keep]]}))
    if not parts:
        return _empty_pairs()
    out = pd.concat(parts, ignore_index=True)
    a, b = out["id_a"].to_numpy(), out["id_b"].to_numpy()
    swap = a > b
    out["id_a"], out["id_b"] = np.where(swap, b, a), np.where(swap, a, b)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# passage-level exact dedup (sub-document granularity)
# ---------------------------------------------------------------------------

def _hamming64(ha: np.ndarray, hb: np.ndarray) -> np.ndarray:
    """Vectorized XOR-popcount between two int64 signature arrays."""
    x = ha.astype(np.uint64) ^ hb.astype(np.uint64)
    ham = np.zeros(len(x), dtype=np.int64)
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return ham


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, num_bands: int = 4,
                  max_bucket_size: int = 2000, sig_col: str = None,
                  output: str = "pairs", max_clique_pairs: int = 25_000_000,
                  on_hot_bucket: str = "error"):
    """SimHash near-dup PAIRS with EXACT retrieval for
    ``hamming <= num_bands - 1``: the 63 signature bits are split into
    ``num_bands`` bands and candidates bucket on (band, band-value) —
    by pigeonhole, a pair differing in fewer bits than there are bands
    must agree on at least one whole band, so banding misses NOTHING
    at ``max_hamming <= num_bands - 1`` (exactness pytest-gated vs
    brute force; default 4 bands / hamming 3).  Verification is a
    vectorized XOR-popcount.  ``sig_col`` supplies a precomputed
    int64 signature column instead of hashing ``text_col`` (the
    SQL-oracle regime of q_simhash_pairs uses a DuckDB-replicable
    signature so the whole retrieval machinery is oracle-checked).

    Identical signatures COLLAPSE FIRST (one h-keyed exchange): an
    m-document exact-duplicate clique becomes ONE representative row
    before banding, so mega-cliques can never inflate a band bucket —
    the non-monotone pair counts the r4 5M rehearsal measured (78.0M
    pairs at 500k docs vs 6.2M at 5M, silent bucket drops) are
    structurally impossible now.  Within-clique edges are emitted at
    the collapse:

    * ``output="pairs"`` (default): the full C(m,2) hamming-0 pair
      list per clique — exact enumeration; a clique whose pair count
      exceeds ``max_clique_pairs`` RAISES (pointing here) instead of
      truncating, because the blowup is inherent to the exact output.
    * ``output="star"``: O(m) star edges (min-id hub -> member,
      hamming 0) per clique, and cross-signature matches emit one
      representative-representative edge — every emitted edge is a
      true <=``max_hamming`` pair and the transitive closure equals
      the exact pair graph's (pytest-gated), which is what clustering
      consumers need; this is the 100-TB mode.

    Scale shape: per-batch signatures (one siphash pass), the h-keyed
    collapse exchange, banding over DISTINCT signatures only, a
    (band, value)-keyed exchange whose groups self-merge in C, then
    one pair-keyed exchange deduping the <=num_bands copies of each
    cross-signature pair (pairs mode carries each signature's member
    ids through banding and expands matched signature pairs to member
    pairs inside the bucket task).  No silent caps: a band bucket
    holding more than ``max_bucket_size`` DISTINCT signatures raises
    by default (``on_hot_bucket="error"``); pass ``"drop"`` to trade
    recall for memory explicitly.  Returns ``(doc_a, doc_b,
    hamming)``, ids ordered.
    """
    from ..functions.relops import grouped_agg, grouped_map

    if max_hamming > num_bands - 1:
        raise ValueError(
            f"banding is exact only for max_hamming <= num_bands - 1 "
            f"({num_bands - 1}); got {max_hamming}")
    if output not in ("pairs", "star"):
        raise ValueError(f"output must be 'pairs' or 'star': {output!r}")
    if on_hot_bucket not in ("error", "drop"):
        raise ValueError(f"on_hot_bucket must be 'error' or 'drop': "
                         f"{on_hot_bucket!r}")
    width = 64 // num_bands
    star = output == "star"

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        if sig_col is not None:
            h = df[sig_col].to_numpy().astype(np.int64)
        else:
            h = simhash64_batch(df[text_col])
        return pd.DataFrame({"doc": df[id_col].to_numpy(), "h": h})

    signed = ds.map_batches(sign, batch_format="pandas")

    # --- collapse identical signatures: one row per distinct h, plus
    # the within-clique edges (star or full enumeration) --------------
    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["h", "doc"], kind="stable")
        h = g["h"].to_numpy()
        docs = g["doc"].to_numpy()
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        sizes = np.diff(np.r_[starts, len(h)])
        reps = docs[starts]               # min doc id per clique
        out_a, out_b = [], []
        if star:
            # O(m) star edges per clique
            hub = np.repeat(reps, sizes)
            keep = hub != docs
            out_a.append(hub[keep])
            out_b.append(docs[keep])
        else:
            n_pairs = (sizes.astype(np.int64) *
                       (sizes.astype(np.int64) - 1)) // 2
            too_big = n_pairs > max_clique_pairs
            if too_big.any():
                m = int(sizes[too_big].max())
                raise ValueError(
                    f"simhash_pairs(output='pairs'): an identical-"
                    f"signature clique of {m} documents needs "
                    f"{m * (m - 1) // 2} pairs (> max_clique_pairs="
                    f"{max_clique_pairs}); the exact pair list is "
                    f"inherently O(m^2) — use output='star' (O(m), "
                    f"same transitive closure) or raise the limit")
            for s, z in zip(starts[sizes > 1], sizes[sizes > 1]):
                mem = docs[s:s + z]
                ia, ib = np.triu_indices(z, k=1)
                out_a.append(mem[ia])
                out_b.append(mem[ib])
        if out_a:
            ea, eb = np.concatenate(out_a), np.concatenate(out_b)
        else:
            ea = eb = docs[:0]
        # single frame, two row kinds, with every column FILLED on both
        # kinds (same-dtype placeholders, never NaN — a NaN hole would
        # promote int64 doc ids to float64 across the pd.concat)
        edges = pd.DataFrame({
            "kind": np.repeat("edge", len(ea)),
            "doc_a": ea, "doc_b": eb,
            "hamming": np.zeros(len(ea), dtype=np.int64),
            "h": np.zeros(len(ea), dtype=np.int64),
            "rep": ea})
        sig_rows = pd.DataFrame({
            "kind": np.repeat("sig", len(reps)),
            "doc_a": reps, "doc_b": reps,
            "hamming": np.zeros(len(reps), dtype=np.int64),
            "h": h[starts], "rep": reps})
        if not star:
            # carry the member ids (ids only, never text) so a matched
            # signature pair can expand to member pairs in-bucket
            edges["members"] = [docs[:0]] * len(edges)
            sig_rows["members"] = [docs[s:s + z]
                                   for s, z in zip(starts, sizes)]
        return pd.concat([edges, sig_rows], ignore_index=True)

    # materialize the skinny post-collapse stream (ids + signatures
    # only, never text — a small fraction of corpus bytes, spillable):
    # it has TWO consumers below, and without pinning the blocks each
    # would re-execute the full sign+collapse lineage
    collapsed = grouped_map(signed, "h", collapse,
                            num_buckets=32).materialize()
    clique_edges = collapsed.map_batches(
        lambda df: df.loc[df["kind"] == "edge",
                          ["doc_a", "doc_b", "hamming"]],
        batch_format="pandas")
    sigs = collapsed.map_batches(
        lambda df: df.loc[df["kind"] == "sig",
                          ["h", "rep"] + (["members"] if not star
                                          else [])],
        batch_format="pandas")

    # --- band DISTINCT signatures -------------------------------------
    def band(df: pd.DataFrame) -> pd.DataFrame:
        h = df["h"].to_numpy().astype(np.int64).astype(np.uint64)
        n = len(df)
        parts = {
            "bkey": np.concatenate([
                b * (1 << width) + ((h >> np.uint64(b * width))
                                    & np.uint64((1 << width) - 1))
                .astype(np.int64)
                for b in range(num_bands)]) if n else
            np.empty(0, dtype=np.int64),
            "h": np.tile(h.astype(np.int64), num_bands),
            "rep": np.tile(df["rep"].to_numpy(), num_bands)}
        if not star:
            parts["members"] = np.tile(
                df["members"].to_numpy(dtype=object), num_bands)
        return pd.DataFrame(parts)

    banded = sigs.map_batches(band, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # empty frames must carry the CALLER's id dtype (string doc
        # ids travel as object) — a hardcoded int64 empty would break
        # block-schema unification against non-empty string buckets
        rep_dtype = (df["rep"].dtype if "rep" in df.columns
                     else np.dtype("int64"))
        empty = pd.DataFrame({
            "doc_a": pd.Series(dtype=rep_dtype),
            "doc_b": pd.Series(dtype=rep_dtype),
            "hamming": pd.Series(dtype="int64")})
        cnt = df.groupby("bkey", sort=False)["rep"].transform("size")
        if (cnt > max_bucket_size).any():
            if on_hot_bucket == "error":
                raise ValueError(
                    f"simhash_pairs: a band bucket holds "
                    f"{int(cnt.max())} DISTINCT signatures (> "
                    f"max_bucket_size={max_bucket_size}); candidate "
                    f"verification is quadratic in that count — raise "
                    f"max_bucket_size or pass on_hot_bucket='drop' to "
                    f"trade recall for memory explicitly")
            df = df[cnt <= max_bucket_size]
        cols = ["bkey", "h", "rep"] + ([] if star else ["members"])
        m = df[cols].merge(df[cols], on="bkey", suffixes=("_a", "_b"))
        m = m[m["rep_a"] < m["rep_b"]]
        if m.empty:
            return empty
        ham = _hamming64(m["h_a"].to_numpy(), m["h_b"].to_numpy())
        m = m.assign(hamming=ham)
        # distinct signatures: hamming >= 1 always, <= max kept
        m = m[m["hamming"] <= max_hamming] \
            .drop_duplicates(["rep_a", "rep_b"])
        if m.empty:
            return empty
        if star:
            return m.rename(columns={"rep_a": "doc_a",
                                     "rep_b": "doc_b"})[
                ["doc_a", "doc_b", "hamming"]]
        # pairs mode: expand each matched signature pair to the full
        # member cross product (the hamming between any two member
        # docs IS the signature hamming)
        out_a, out_b, out_h = [], [], []
        for ma, mb, hv in zip(m["members_a"], m["members_b"],
                              m["hamming"]):
            a = np.repeat(np.asarray(ma), len(mb))
            b = np.tile(np.asarray(mb), len(ma))
            if a.dtype.kind in "US":   # np.minimum has no str loop
                a = a.astype(object)
                b = b.astype(object)
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_h.append(np.full(len(a), hv, dtype=np.int64))
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h)}) \
            .drop_duplicates(["doc_a", "doc_b"])

    pairs = grouped_map(banded, "bkey", bucket_pairs, num_buckets=32)
    # a signature pair can surface from up to num_bands bands -> dedup,
    # then union the (already-unique) within-clique edges
    cross = grouped_agg(pairs, ["doc_a", "doc_b"],
                        hamming=("hamming", "min"))
    return cross.union(clique_edges)


def meta_blocking_pairs(ds, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        max_doc_freq: Optional[int] = None):
    """Entity-resolution META-BLOCKING with weighted-node pruning —
    the blocking-graph shape of SparkER (EDBT 2019; public pattern):
    blocks are 3-gram shingles, the blocking graph weights each
    candidate pair by its common-block count, and WNP keeps an edge
    iff its weight reaches the MEAN edge weight of its two endpoints
    averaged — pruning the quadratic candidate set to the pairs worth
    running an expensive matcher on.

    Scale shape: identical to :func:`ngram_jaccard_pairs` up to the
    weighted pair list (distinct-shingle explode, in-bucket self-merge
    pre-summed per pair, one skinny pair exchange; ``max_doc_freq``
    stop-gram cap for hot blocks), then the endpoint statistics are a
    doc-keyed KB-scale aggregate joined back onto the pair list.
    Pair volume is bounded by (blocks under the cap) x M^2 — fine on
    real web corpora where shingle document-frequency is Zipf with a
    df~1 tail, but a SMALL shingle space (short synthetic vocab, tiny
    alphabets) makes every block hot and the blocking graph inherently
    quadratic: raise ``k`` or lower ``max_doc_freq`` below the mean df
    there (measured: the 40-word/64k-trigram rehearsal corpus needs
    M << its mean df ~360 or the pair list explodes).

    The WNP threshold compare is INTEGER-exact on both engine and
    oracle: ``w >= (sum_a/cnt_a + sum_b/cnt_b) / 2`` is evaluated as
    ``2*w*cnt_a*cnt_b >= sum_a*cnt_b + sum_b*cnt_a`` so float division
    can never flip a boundary pair between engines.

    Returns a Dataset of ``(doc_a, doc_b, weight)``, ids ordered.
    """
    from ..functions.relops import grouped_agg, grouped_map, hash_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rid, rsh = [], []
        for i, t in zip(df[id_col], df[text_col]):
            for s in set(shingles(t, k)):
                rid.append(i)
                rsh.append(s)
        return pd.DataFrame({"shingle": rsh, "doc": rid})

    sh = ds.map_batches(explode, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df
        if max_doc_freq is not None:
            cnt = sub.groupby("shingle", sort=False)["doc"] \
                .transform("size")
            sub = sub[cnt <= max_doc_freq]
        m = sub.merge(sub, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        if m.empty:
            return pd.DataFrame({
                "doc_a": pd.Series(dtype=df["doc"].dtype),
                "doc_b": pd.Series(dtype=df["doc"].dtype),
                "weight": pd.Series(dtype="int64")})
        return m.groupby(["doc_a", "doc_b"], as_index=False,
                         sort=False).size() \
            .rename(columns={"size": "weight"}).astype({"weight": "int64"})

    # materialized: the skinny pair list is consumed twice (endpoint
    # stats + join left side) — without this the shingle exchange
    # would re-run for each consumer
    pairs = grouped_agg(grouped_map(sh, "shingle", bucket_pairs),
                        ["doc_a", "doc_b"],
                        weight=("weight", "sum")).materialize()

    # endpoint stats: each pair contributes its weight to BOTH docs
    def both_ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": np.concatenate([df["doc_a"].to_numpy(),
                                   df["doc_b"].to_numpy()]),
            "w": np.concatenate([df["weight"].to_numpy()] * 2)})

    ends = grouped_agg(
        pairs.map_batches(both_ends, batch_format="pandas"),
        "doc", s=("w", "sum"), c=("w", "size"))

    j = hash_join(
        pairs.map_batches(lambda df: df.rename(columns={"doc_a": "doc"}),
                          batch_format="pandas"),
        ends, on="doc", lcols=["doc", "doc_b", "weight"],
        rcols=["doc", "s", "c"])
    j = hash_join(
        j.map_batches(lambda df: df.rename(
            columns={"doc": "doc_a", "s": "s_a", "c": "c_a",
                     "doc_b": "doc"}), batch_format="pandas"),
        ends, on="doc", lcols=["doc_a", "doc", "weight", "s_a", "c_a"],
        rcols=["doc", "s", "c"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        w = df["weight"].astype("int64")
        keep = 2 * w * df["c_a"].astype("int64") \
            * df["c"].astype("int64") \
            >= df["s_a"].astype("int64") * df["c"].astype("int64") \
            + df["s"].astype("int64") * df["c_a"].astype("int64")
        out = df[keep]
        # ids keep their input dtype (string ids are first-class —
        # only the derived columns are cast)
        return pd.DataFrame({"doc_a": out["doc_a"].to_numpy(),
                             "doc_b": out["doc"].to_numpy(),
                             "weight": out["weight"].astype("int64")})

    return j.map_batches(prune, batch_format="pandas")


def passage_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  passage_words: int = 16, num_buckets: int = 64,
                  exchange: str = "pandas"):
    """Passage-level EXACT dedup — the sub-document granularity large web
    curation pipelines apply after document-level dedup (boilerplate
    paragraphs, license blocks, navigation text repeated across pages).

    Each document's space-token stream is cut into non-overlapping
    windows of ``passage_words`` tokens (the short tail window kept);
    every repeated occurrence of an identical passage string across the
    WHOLE corpus is dropped — the single surviving copy is the one with
    the globally smallest ``(id, window index)`` — and each document is
    reassembled from its surviving passages in order.  Deterministic,
    and exactly expressible in SQL (window ``row_number`` over the
    exploded passages), which is the driver-contract oracle.

    Scale shape: two coarse hash-bucket exchanges and nothing else —
    (1) passages keyed by their text: a bucket holds every occurrence
    of its passage strings, so the keep-first decision
    (``sort + duplicated()``, all C) is globally exact with no join;
    (2) surviving rows keyed by the document id for in-order
    reassembly.  Both move ~corpus-text bytes once; no driver
    materialization, no per-group Python dispatch
    (:func:`~fastobo_py_ray.functions.relops.grouped_map`).

    Returns a Dataset of ``(id_col, text, n_passages, n_removed)`` —
    one row per input document (``text`` may be ``""`` when every
    passage of a document lost its keep-first race).
    """
    from ..functions.relops import grouped_map

    P = int(passage_words)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids_out: List = []
        idx_out: List[int] = []
        texts_out: List[str] = []
        for did, t in zip(df[id_col].tolist(), df[text_col].tolist()):
            w = (t or "").split(" ")
            for j in range(0, (len(w) + P - 1) // P):
                ids_out.append(did)
                idx_out.append(j)
                texts_out.append(" ".join(w[j * P:(j + 1) * P]))
        return pd.DataFrame({
            id_col: pd.Series(ids_out, dtype=df[id_col].dtype),
            "idx": pd.Series(idx_out, dtype="int64"),
            "passage": pd.Series(texts_out, dtype="string")})

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        # bucket = all rows of its passage strings -> global keep-first
        df = df.sort_values([id_col, "idx"], kind="stable")
        df["keep"] = ~df.duplicated("passage", keep="first")
        return df

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "idx"], kind="stable")
        grp = df.groupby(id_col, sort=False)
        n_passages = grp.size()
        n_removed = grp["keep"].sum().rsub(n_passages)
        kept = df[df["keep"]]
        texts = kept.groupby(id_col, sort=False)["passage"].agg(" ".join)
        out = pd.DataFrame({id_col: n_passages.index.to_numpy()})
        out["text"] = pd.Series(
            texts.reindex(n_passages.index).fillna("").to_numpy(),
            dtype="string")
        out["n_passages"] = n_passages.to_numpy().astype("int64")
        out["n_removed"] = n_removed.to_numpy().astype("int64")
        return out

    passages = ds.map_batches(explode, batch_format="pandas")
    marked = grouped_map(passages, "passage", mark,
                         num_buckets=num_buckets, exchange=exchange)
    return grouped_map(marked, id_col, reassemble,
                       num_buckets=num_buckets, exchange=exchange)


def boilerplate_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                      group_col: str = "source", passage_words: int = 2,
                      min_docs: int = 3, num_buckets: int = 64):
    """Per-host boilerplate share — CCNet-style repeated-paragraph
    detection scoped to the source: a passage (non-overlapping
    ``passage_words``-token window, the :func:`passage_dedup` chunking)
    is *boilerplate* when it occurs in >= ``min_docs`` DISTINCT
    documents of the SAME ``group_col``.  Navigation chrome, footers
    and license blocks repeat within a host, not across the web —
    which is why CCNet hashes paragraphs per shard and RefinedWeb
    filters per domain rather than globally.

    Returns one row per document: ``(id_col, n_passages, n_bp,
    bp_milli)`` where ``n_bp`` counts the document's passage
    occurrences (multiplicity included) whose ``(group, passage)`` key
    crossed the distinct-doc threshold, and
    ``bp_milli = n_bp * 1000 // n_passages`` (exact integer floor).

    Scale shape: passages pre-reduce batch-locally to distinct
    ``(group, passage, id, c)`` occurrence rows (documents are whole
    per input row, so per-doc counts are exact batch-locally); ONE
    (group, passage)-keyed exchange holds every occurrence row of a
    key, so the distinct-doc threshold is decided exactly in-bucket
    with no join and re-emits per-doc boilerplate partials; ONE skinny
    id-keyed reduce merges those with batch-local passage totals.  Two
    coarse exchanges — the :func:`passage_dedup` budget — and the
    second moves at most one row per (doc, boilerplate-hit) plus one
    base row per doc.
    """
    from ..functions.relops import grouped_agg, grouped_map

    P = int(passage_words)

    def occurrences(df: pd.DataFrame) -> pd.DataFrame:
        ids: List = []
        grps: List = []
        texts: List[str] = []
        for did, g, t in zip(df[id_col].tolist(), df[group_col].tolist(),
                             df[text_col].tolist()):
            w = (t or "").split(" ")
            for j in range(0, (len(w) + P - 1) // P):
                ids.append(did)
                grps.append(g)
                texts.append(" ".join(w[j * P:(j + 1) * P]))
        out = pd.DataFrame({
            id_col: pd.Series(ids, dtype=df[id_col].dtype),
            group_col: pd.Series(grps, dtype="string"),
            "passage": pd.Series(texts, dtype="string")})
        return out.groupby([group_col, "passage", id_col],
                           as_index=False, sort=False).size() \
            .rename(columns={"size": "c"})

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        # split(" ") of "" is [''] -> every doc has >= 1 passage
        n_words = df[text_col].astype(str).str.count(" ").to_numpy() + 1
        return pd.DataFrame({
            id_col: df[id_col],
            "bp": np.zeros(len(df), dtype="int64"),
            "np_": ((n_words + P - 1) // P).astype("int64")})

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct per (group, passage, id): a plain count IS
        # the distinct-doc count for the key
        nd = df.groupby([group_col, "passage"], sort=False)[id_col] \
            .transform("count")
        hit = df[nd.to_numpy() >= min_docs]
        return pd.DataFrame({
            id_col: hit[id_col],
            "bp": hit["c"].astype("int64"),
            "np_": np.zeros(len(hit), dtype="int64")})

    occ = ds.map_batches(occurrences, batch_format="pandas")
    hits = grouped_map(occ, [group_col, "passage"], bucket,
                       num_buckets=num_buckets)
    base = ds.map_batches(totals, batch_format="pandas")
    per_doc = grouped_agg(hits.union(base), id_col,
                          num_buckets=num_buckets,
                          n_bp=("bp", "sum"), n_passages=("np_", "sum"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        nb = df["n_bp"].to_numpy().astype("int64")
        npas = df["n_passages"].to_numpy().astype("int64")
        return pd.DataFrame({
            id_col: df[id_col],
            "n_passages": npas,
            "n_bp": nb,
            "bp_milli": (nb * 1000) // npas})

    return per_doc.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# incremental (cross-corpus) dedup — Bloom + exact-verify
# ---------------------------------------------------------------------------

def dedup_against(new_ds, seen_ds, text_col: str = "text",
                  id_col: str = "doc_id", m_bits: int = 1 << 20,
                  k: int = 4, id_kind: str = "numeric"):
    """Drop-new-docs-already-seen (continual-training ingestion): flag
    each row of ``new_ds`` whose ``text_col`` already occurs in
    ``seen_ds`` — the BLOOM + EXACT-VERIFY scale pattern.

    Why not a plain anti-join: at 100 TB the seen side is too big to
    broadcast and a full text-keyed exchange moves BOTH corpora.  Here
    a constant-size Bloom bitmap (``m_bits/8`` bytes regardless of
    corpus size) is built over the seen side DISTRIBUTED (per-batch
    bitmap partials, associative OR fold — `stages/sketch.py`),
    broadcast once with ``ray.put``, and probed in-batch on the new
    side.  Bloom-NEGATIVE rows (the overwhelming majority; no false
    negatives by construction) never enter any exchange; only the
    bloom-positive candidates — true dups plus ~(1-e^(-kn/m))^k false
    positives — pay the exact text-keyed verification exchange.

    The verify leg is symmetric: the (tiny) candidate set is itself
    Bloom-summarized, so SEEN rows that cannot match any candidate are
    filtered IN-SCAN and never exchange either — the one all-to-all
    moves only candidates + seen-side survivors (true dups and two
    sketches' worth of false positives), KB-scale against a 100 TB
    corpus on either side.  Multiply-consumed corpus-scale datasets are
    re-scanned, never materialized (two cheap scans beat pinning a
    corpus in the object store — engine-wide policy); only the bounded
    candidate set is pinned.

    Returns a Dataset of ``(id_col, bloom_hit, dup)`` covering every
    new row: ``dup`` is EXACT (the verify exchange removes Bloom FPs).

    ``id_kind`` ("numeric" | "string") fixes ONE id dtype across every
    block BEFORE the union (Ray's exchange wants uniform block
    schemas, the same widen-before-union rule as ``hash_join.tag``):
    numeric ids transport as float64 (< 2^53 exact — the engine's join
    idiom; cast back at the call site), string ids as Arrow string.
    """
    import ray

    from ..functions.relops import grouped_map
    from .sketch import bloom_build, bloom_contains

    if id_kind not in ("numeric", "string"):
        raise ValueError(f"id_kind must be numeric|string, got {id_kind!r}")

    def _id(vals) -> pd.Series:
        return pd.Series(vals).astype(
            "float64" if id_kind == "numeric" else "string") \
            .reset_index(drop=True)

    seen_txt = seen_ds.map_batches(
        lambda df: df[[text_col]].drop_duplicates(),
        batch_format="pandas")
    words_ref = ray.put(bloom_build(seen_txt, text_col,
                                    m_bits=m_bits, k=k))

    def split(hit_side: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            hit = bloom_contains(df[text_col].to_numpy(),
                                 ray.get(words_ref), k=k)
            sub = df.loc[hit == hit_side]
            if hit_side:
                return pd.DataFrame(
                    {id_col: _id(sub[id_col].to_numpy()),
                     text_col: pd.Series(sub[text_col].to_numpy(),
                                         dtype="string"),
                     "__seen": np.zeros(len(sub), dtype=bool)})
            return pd.DataFrame(
                {id_col: _id(sub[id_col].to_numpy()),
                 "bloom_hit": np.zeros(len(sub), dtype=bool),
                 "dup": np.zeros(len(sub), dtype=bool)})
        return fn

    # scan new #1: bloom-negative rows are finished — no exchange ever
    clear = new_ds.map_batches(split(False), batch_format="pandas")
    # scan new #2: candidates are bounded (true dups + FPR x corpus);
    # pin THEM, not the corpus
    cand = new_ds.map_batches(split(True), batch_format="pandas") \
        .materialize()

    # summarize the candidates and filter the SEEN scan by it, so the
    # seen corpus never exchanges either
    cwords_ref = ray.put(bloom_build(cand, text_col,
                                     m_bits=m_bits, k=k))

    def seen_survivors(df: pd.DataFrame) -> pd.DataFrame:
        hit = bloom_contains(df[text_col].to_numpy(),
                             ray.get(cwords_ref), k=k)
        sub = df.loc[hit]
        # marker rows carry a null id in the SAME dtype as candidates
        # (id_kind) so every block entering the union has one schema
        return pd.DataFrame(
            {id_col: _id([np.nan] * len(sub)) if id_kind == "numeric"
             else pd.Series([pd.NA] * len(sub), dtype="string"),
             text_col: pd.Series(sub[text_col].to_numpy(),
                                 dtype="string"),
             "__seen": np.ones(len(sub), dtype=bool)})

    survivors = seen_txt.map_batches(seen_survivors,
                                     batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # a text group holds all its candidate rows plus any marker
        # rows from the seen side: dup iff a marker is present
        dup = df.groupby(text_col, sort=False)["__seen"] \
            .transform("max").to_numpy().astype(bool)
        keep = ~df["__seen"].to_numpy().astype(bool)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy()[keep],
             "bloom_hit": np.ones(int(keep.sum()), dtype=bool),
             "dup": dup[keep]})

    flagged = grouped_map(cand.union(survivors), text_col, verify,
                          num_buckets=8)
    return clear.union(flagged)


# ---------------------------------------------------------------------------
# Exact edit-distance (Levenshtein <= k) similarity self-join
# ---------------------------------------------------------------------------

def _levenshtein_batch(a_strs, b_strs, max_len: int = 256) -> np.ndarray:
    """Exact Levenshtein distances for aligned string lists, vectorized
    across the PAIR axis: full Wagner-Fischer DP with the two length
    axes as (small, bounded) Python loops and every cell update an
    O(n_pairs) numpy op.  Strings are padded with per-side sentinels
    that can never match; each pair's answer is harvested at its own
    (len_a, len_b) corner.  Intended for verifying candidate pairs of
    SHORT strings (tokens / names / hosts) — cost O(Lmax^2) vector ops."""
    n = len(a_strs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_strs), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_strs), dtype=np.int64, count=n)
    La, Lb = int(la.max()), int(lb.max())
    if La > max_len or Lb > max_len:
        raise ValueError(
            f"_levenshtein_batch: string length {max(La, Lb)} exceeds "
            f"max_len={max_len}; this DP verifier targets short strings "
            f"(use ngram_jaccard / minhash for long text)")
    # code-point matrices; -1 / -2 sentinels never compare equal
    A = np.full((n, max(La, 1)), -1, dtype=np.int64)
    B = np.full((n, max(Lb, 1)), -2, dtype=np.int64)
    for i, s in enumerate(a_strs):
        if s:
            A[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    for i, s in enumerate(b_strs):
        if s:
            B[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)

    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64),
                           (n, Lb + 1)).copy()
    # rows whose a-side is empty are harvested by the init above; the
    # DP rows below harvest at i == len_a
    out = np.where(la == 0, lb, -1)
    cur = np.empty_like(prev)
    for i in range(1, La + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return out.astype(np.int64)


def _delete_variants(s: str, k: int) -> set:
    """All strings reachable from ``s`` by deleting up to ``k``
    characters (the FastSS / SymSpell symmetric-delete neighbourhood)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_pairs(ds, column: str = "token", k: int = 2,
                        num_buckets: int = 32, max_len: int = 64):
    """EXACT edit-distance (Levenshtein <= k) similarity self-join over
    a column of DISTINCT short strings — the spelling-variant / entity-
    resolution primitive (FastSS / SymSpell symmetric-delete shape).

    Candidate generation is COMPLETE: fix an optimal alignment of a and
    b with ed(a,b) <= k; its matched positions form a common string
    reachable from a by deleting the <= k characters a loses to
    deletions/substitutions and from b by deleting the <= k characters
    b loses to insertions/substitutions (each edit op consumes at most
    one character per side).  The delete-neighbourhoods D_{<=k}(a) and
    D_{<=k}(b) therefore intersect, so every true pair shares at least
    one variant bucket; the full-DP verify (:func:`_levenshtein_batch`)
    then makes the result exact — the index only PRUNES, never decides.

    Scale shape: the input is a VOCABULARY-scale dataset (distinct
    tokens / names / hosts — cardinality grows with the vocabulary, not
    the corpus; same tier contract as tfidf's df table).  Each string
    explodes into <= sum_{i<=k} C(len, i) delete variants, one
    variant-keyed coarse exchange (:func:`~..functions.relops.grouped_map`)
    emits in-bucket candidate pairs pre-deduped per bucket, the bounded
    DP verify runs inside the same task, and ONE pair-keyed
    ``grouped_agg(min)`` dedupes pairs that met in several variant
    buckets (dist is deterministic, so min == the value).  A variant
    shared by m strings emits O(m^2) candidates — inherent to
    completeness (those strings genuinely are mutually close); strings
    longer than ``max_len`` RAISE rather than silently truncating
    (C(len,2) variant blow-up — use ngram_jaccard / minhash for long
    text).

    Returns a Dataset of (a, b, dist) with a < b and dist <= k.
    """
    from ..functions.relops import grouped_agg, grouped_map

    if k < 1:
        raise ValueError("edit_distance_pairs: k must be >= 1")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks, variants = [], []
        for s in df[column].astype(str):
            if len(s) > max_len:
                raise ValueError(
                    f"edit_distance_pairs: string of length {len(s)} "
                    f"exceeds max_len={max_len} (delete-neighbourhood "
                    f"blow-up); filter long strings or use "
                    f"ngram_jaccard_pairs / minhash_candidate_pairs")
            for v in _delete_variants(s, k):
                toks.append(s)
                variants.append(v)
        return pd.DataFrame({
            "variant": pd.Series(variants, dtype="string"),
            "s": pd.Series(toks, dtype="string")})

    var = ds.map_batches(explode, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="variant", suffixes=("_l", "_r"))
        m = m[m["s_l"] < m["s_r"]]
        m = m.drop_duplicates(["s_l", "s_r"])
        if m.empty:
            return pd.DataFrame({"a": pd.Series(dtype="string"),
                                 "b": pd.Series(dtype="string"),
                                 "dist": pd.Series(dtype="int64")})
        a = m["s_l"].tolist()
        b = m["s_r"].tolist()
        # chunk the pair axis: the DP holds O(chunk x Lmax) int64
        # scratch, so a hot-variant bucket with millions of candidate
        # pairs stays at a bounded working set instead of one
        # n_pairs-wide allocation
        chunk = 1 << 16
        dist = np.concatenate(
            [_levenshtein_batch(a[i:i + chunk], b[i:i + chunk])
             for i in range(0, len(a), chunk)])
        keep = dist <= k
        return pd.DataFrame({"a": pd.Series(np.asarray(a, dtype=object)[keep],
                                            dtype="string"),
                             "b": pd.Series(np.asarray(b, dtype=object)[keep],
                                            dtype="string"),
                             "dist": dist[keep]})

    cand = grouped_map(var, "variant", bucket_pairs,
                       num_buckets=num_buckets)
    return grouped_agg(cand, ["a", "b"], num_buckets=num_buckets,
                       dist=("dist", "min"))


def edit_distance_join(left_ds, right_ds, left_col: str = "token",
                       right_col: str = "token", k: int = 2,
                       num_buckets: int = 32, max_len: int = 64):
    """EXACT bipartite edit-distance (Levenshtein <= k) join — fuzzy
    DICTIONARY matching: every (left, right) string pair within ``k``
    edits, e.g. noisy web-text tokens against a reference vocabulary
    of entity surfaces (the typo-tolerant lookup an entity-linking
    pipeline runs before exact automaton matching).

    Same COMPLETE FastSS symmetric-delete candidate scheme as
    :func:`edit_distance_pairs` (the completeness argument there is
    side-agnostic), with the two inputs tagged and paired only ACROSS
    sides inside each variant bucket; the chunked DP verify makes the
    result exact.  Both inputs are vocabulary-tier (distinct short
    strings); corpora reduce to that tier via the word-count combiner
    first.  One variant-keyed exchange over both exploded sides + one
    pair-keyed dedupe; ``max_len`` RAISES (no silent cap).

    Returns a Dataset of (left, right, dist), dist <= k.
    """
    from ..functions.relops import grouped_agg, grouped_map

    if k < 1:
        raise ValueError("edit_distance_join: k must be >= 1")

    def explode_side(col, side):
        def explode(df: pd.DataFrame) -> pd.DataFrame:
            toks, variants = [], []
            for s in df[col].astype(str):
                if len(s) > max_len:
                    raise ValueError(
                        f"edit_distance_join: string of length {len(s)} "
                        f"exceeds max_len={max_len} (delete-neighbourhood "
                        f"blow-up); filter long strings or use "
                        f"ngram_jaccard_pairs / minhash_candidate_pairs")
                for v in _delete_variants(s, k):
                    toks.append(s)
                    variants.append(v)
            return pd.DataFrame({
                "variant": pd.Series(variants, dtype="string"),
                "s": pd.Series(toks, dtype="string"),
                "side": pd.Series([side] * len(toks), dtype="string")})
        return explode

    var = left_ds.map_batches(explode_side(left_col, "L"),
                              batch_format="pandas") \
        .union(right_ds.map_batches(explode_side(right_col, "R"),
                                    batch_format="pandas"))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df.loc[df["side"] == "L", ["variant", "s"]]
        rhs = df.loc[df["side"] == "R", ["variant", "s"]]
        m = lhs.merge(rhs, on="variant", suffixes=("_l", "_r"))
        m = m.drop_duplicates(["s_l", "s_r"])
        if m.empty:
            return pd.DataFrame({"left": pd.Series(dtype="string"),
                                 "right": pd.Series(dtype="string"),
                                 "dist": pd.Series(dtype="int64")})
        a = m["s_l"].tolist()
        b = m["s_r"].tolist()
        chunk = 1 << 16
        dist = np.concatenate(
            [_levenshtein_batch(a[i:i + chunk], b[i:i + chunk])
             for i in range(0, len(a), chunk)])
        keep = dist <= k
        return pd.DataFrame({
            "left": pd.Series(np.asarray(a, dtype=object)[keep],
                              dtype="string"),
            "right": pd.Series(np.asarray(b, dtype=object)[keep],
                               dtype="string"),
            "dist": dist[keep]})

    cand = grouped_map(var, "variant", bucket_pairs,
                       num_buckets=num_buckets)
    return grouped_agg(cand, ["left", "right"], num_buckets=num_buckets,
                       dist=("dist", "min"))


# ---------------------------------------------------------------------------
# Duplicated-substring inventory (the ExactSubstr building block of
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better"): every character n-gram that occurs in >= min_docs distinct
# documents, with its exact doc and occurrence counts.
# ---------------------------------------------------------------------------

_GRAM_HASH_BASE = np.uint64(1099511628211)  # FNV-1a prime, odd => bijective *


def _gram_hashes(text: str, gram_len: int) -> np.ndarray:
    """Rolling 64-bit polynomial hash of every ``gram_len``-char window,
    CHARACTER-based (utf-32 codepoints, matching Python slicing and SQL
    ``substring`` semantics, not bytes): ~``gram_len`` vectorized numpy
    ops per document, no per-character Python loop."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    w = len(codes) - gram_len + 1
    if w <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(w, dtype=np.uint64)
    for j in range(gram_len):  # Horner: h_i = ((c_i*B + c_{i+1})*B + ...)
        h = h * _GRAM_HASH_BASE + codes[j:j + w].astype(np.uint64)
    return h


def dup_substring_grams(ds, gram_len: int = 20, min_docs: int = 2,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int = 64):
    """Exact duplicated-substring inventory: all ``gram_len``-char
    substrings occurring in >= ``min_docs`` DISTINCT documents, with
    distinct-doc and total-occurrence counts.  Two hash-then-verify
    passes so corpus text never rides the exchange:

    1. Per batch, per doc: rolling-hash every window (vectorized),
       per-doc ``np.unique``, then ONE coarse hash-bucket exchange of a
       single bare uint64 column (8 B per (doc, window) pair, Arrow
       blocks — measured 1.8x over the previous (hash, count) pandas
       partial exchange at 1M docs / 181M windows, quiet-epoch
       interleaved A/B in BASELINE.md; a raw-Ray numpy shard exchange
       was also measured and was a wash vs this shape while losing
       streaming backpressure, so Dataset groupby stays): because each
       doc contributes a hash at most once, the bucket task's
       ``np.unique(return_counts)`` IS the global per-hash doc count;
       hashes reaching ``min_docs`` are the candidates
       (duplicated-output-scale, broadcast back sorted via ``ray.put``).
    2. Second streaming pass extracts the ACTUAL gram strings only at
       candidate-hash positions (``np.searchsorted`` membership), then a
       gram-keyed exchange of the candidate-only rows re-counts exactly
       — 64-bit collisions are resolved here, so the result is exact,
       never probabilistic.

    Scale: pass-1 traffic is bounded by per-doc-distinct window count
    x 8 B, spread over ``num_buckets`` skew-free hash buckets; pass-2
    traffic by the duplicated-gram volume (the output, which is what
    any consumer must hold anyway).  Returns a DATASET of
    (gram, n_docs, n_occ) — corpus-scale on a duplication-heavy corpus,
    so the operator never collects it to the driver itself."""
    import ray

    from ..functions.relops import grouped_agg, grouped_map

    def hash_stream(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = [np.unique(_gram_hashes(t, gram_len))
                   for t in df[text_col] if isinstance(t, str)]
        per_doc = [h for h in per_doc if len(h)]
        if not per_doc:
            return pd.DataFrame({"h": pd.Series(dtype="uint64")})
        return pd.DataFrame({"h": np.concatenate(per_doc)})

    def bucket_candidates(df: pd.DataFrame) -> pd.DataFrame:
        hs, counts = np.unique(df["h"].to_numpy(), return_counts=True)
        return pd.DataFrame({"h": hs[counts >= min_docs]})

    cand = grouped_map(ds.map_batches(hash_stream, batch_format="pandas"),
                       "h", bucket_candidates, num_buckets=num_buckets,
                       exchange="pyarrow").to_pandas()
    cand_sorted = np.sort(cand["h"].to_numpy(dtype=np.uint64))
    cand_ref = ray.put(cand_sorted)  # numpy: zero-copy per-task get

    empty = pd.DataFrame({"gram": pd.Series(dtype="object"),
                          "n_docs": pd.Series(dtype="int64"),
                          "n_occ": pd.Series(dtype="int64")})

    def verify_partials(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        if len(cs) == 0:
            return empty
        grams: List[str] = []
        occs: List[int] = []
        docs: List[int] = []
        for t in df[text_col]:
            if not isinstance(t, str):
                continue
            h = _gram_hashes(t, gram_len)
            pos = np.searchsorted(cs, h)
            pos[pos == len(cs)] = 0
            hit = np.nonzero(cs[pos] == h)[0]
            if len(hit) == 0:
                continue
            vc = pd.Series([t[p:p + gram_len] for p in hit]).value_counts()
            grams.extend(vc.index.tolist())
            occs.extend(vc.to_numpy().tolist())
            docs.extend([1] * len(vc))
        out = pd.DataFrame({"gram": pd.Series(grams, dtype="object"),
                            "n_docs": pd.Series(docs, dtype="int64"),
                            "n_occ": pd.Series(occs, dtype="int64")})
        # combine across the batch's docs before the exchange
        return out.groupby("gram", as_index=False, sort=False).sum()

    verified = grouped_agg(
        ds.map_batches(verify_partials, batch_format="pandas"),
        "gram", num_buckets=num_buckets,
        n_docs=("n_docs", "sum"), n_occ=("n_occ", "sum"))
    return verified.map_batches(
        lambda df: df[df["n_docs"] >= min_docs],
        batch_format="pandas")


def _dup_inventory_ref(ds, gram_len: int, min_docs: int, id_col: str,
                       text_col: str, num_buckets: int,
                       max_dup_grams: int, caller: str):
    """Compute the duplicated-gram inventory distributed
    (:func:`dup_substring_grams`) and broadcast it ONCE as
    ``ray.put((sorted hash array, exact gram frozenset))`` — the shared
    decision structure of the ExactSubstr consumers (coverage /
    removal).  Membership tests downstream are a vectorized
    ``searchsorted`` prefilter plus an exact string check on hits only,
    so consumers stay collision-exact.  The broadcast is
    duplicated-VOCABULARY-scale, not corpus-scale; ``max_dup_grams``
    aborts past the cap naming the scale path (hash-join doc windows
    against the inventory — one more exchange, same exactness) rather
    than silently OOMing a worker."""
    import ray

    dup = dup_substring_grams(ds, gram_len=gram_len, min_docs=min_docs,
                              id_col=id_col, text_col=text_col,
                              num_buckets=num_buckets)
    grams: List[str] = []
    for b in dup.iter_batches(batch_size=65536, batch_format="pandas"):
        grams.extend(b["gram"].tolist())
        if len(grams) > max_dup_grams:
            raise ValueError(
                f"{caller} broadcasts the duplicated-gram inventory and "
                f"is capped at max_dup_grams={max_dup_grams}; for larger "
                f"inventories hash-join the window stream against the "
                f"inventory instead, or raise the cap explicitly.")
    gram_set = frozenset(grams)
    hs = np.sort(np.asarray([_gram_hashes(g, gram_len)[0] for g in grams],
                            dtype=np.uint64)) if grams else \
        np.empty(0, dtype=np.uint64)
    return ray.put((hs, gram_set))


def dup_substring_coverage(ds, gram_len: int = 20, min_docs: int = 2,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_buckets: int = 64,
                           max_dup_grams: int = 5_000_000) -> pd.DataFrame:
    """Per-document duplicated-span coverage — the decision signal of
    ExactSubstr dedup (Lee et al. 2022) and a standard curation filter:
    for every doc with at least one ``gram_len`` window, the fraction of
    its windows whose gram occurs in >= ``min_docs`` distinct docs.

    Built on :func:`dup_substring_grams`: the duplicated-gram inventory
    is computed distributed, then broadcast ONCE as (sorted hash array,
    exact gram set) — membership is a vectorized ``searchsorted``
    prefilter plus an exact string check on hits only, so the result is
    collision-exact.  The broadcast is duplicated-VOCABULARY-scale, not
    corpus-scale; ``max_dup_grams`` aborts past the cap naming the scale
    path (hash-join doc windows against the inventory — one more
    exchange, same exactness) rather than silently OOMing a worker.
    Returns a DATASET of (doc_id, n_windows, n_dup_windows, dup_frac)
    — one row per doc is corpus-scale, so the operator never collects
    it to the driver itself (docs shorter than ``gram_len`` have no
    windows and are absent, matching SQL's empty GROUP BY group)."""
    ref = _dup_inventory_ref(ds, gram_len, min_docs, id_col, text_col,
                             num_buckets, max_dup_grams,
                             "dup_substring_coverage")

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import worker_cached
        hsorted, gset = worker_cached(ref)  # frozenset: once per worker
        ids: List = []
        n_win: List[int] = []
        n_dup: List[int] = []
        for did, t in zip(df[id_col], df[text_col]):
            if not isinstance(t, str):
                continue
            h = _gram_hashes(t, gram_len)
            if len(h) == 0:
                continue
            ids.append(did)
            n_win.append(len(h))
            if len(hsorted) == 0:
                n_dup.append(0)
                continue
            pos = np.searchsorted(hsorted, h)
            pos[pos == len(hsorted)] = 0
            cand = np.nonzero(hsorted[pos] == h)[0]
            n_dup.append(sum(1 for p in cand
                             if t[p:p + gram_len] in gset))
        nw = pd.Series(n_win, dtype="int64")
        nd = pd.Series(n_dup, dtype="int64")
        # half-AWAY rounding to match SQL round(): ratios of small
        # integers land exactly on .5 ulps (20/512 = .0390625), where
        # numpy's banker's rounding would flip the 6th decimal
        frac = np.floor((nd / nw) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({id_col: pd.Series(ids),
                             "n_windows": nw, "n_dup_windows": nd,
                             "dup_frac": frac})

    # one row per doc -> corpus-scale output; stays a Dataset
    return ds.map_batches(coverage, batch_format="pandas")


def exact_substr_removal(ds, gram_len: int = 20, min_docs: int = 2,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_buckets: int = 64,
                         max_dup_grams: int = 5_000_000):
    """ExactSubstr deduplication TRANSFORM (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", the
    exact-substring variant): delete from every document each character
    covered by at least one ``gram_len``-char window that occurs in
    >= ``min_docs`` DISTINCT documents.  This is the removal step the
    inventory (:func:`dup_substring_grams`) and the decision signal
    (:func:`dup_substring_coverage`) build toward.

    Shape: the duplicated-gram inventory is computed distributed and
    broadcast once (:func:`_dup_inventory_ref` — duplicated-vocabulary-
    scale, collision-exact via hash prefilter + string verify); the cut
    itself is a stateless streaming ``map_batches`` pass, zero
    exchanges over corpus text.  Per doc the covered-character mask is
    built vectorized (delta array over hit starts, ``cumsum`` > 0) and
    the kept characters are sliced in utf-32 code space — CHARACTER
    semantics matching Python slicing and SQL ``substring``, so
    surrogate-free unicode is cut exactly like the oracle.

    Returns a DATASET of (id_col, clean_text, n_removed): every input
    doc appears exactly once — docs with no duplicated window (or
    shorter than ``gram_len``) pass through with ``n_removed == 0``.
    Note the standard ExactSubstr caveat applies: removal can splice
    previously-distant characters together, creating windows that did
    not exist in the input (Lee et al. accept this; a fixpoint loop is
    the caller's choice)."""
    ref = _dup_inventory_ref(ds, gram_len, min_docs, id_col, text_col,
                             num_buckets, max_dup_grams,
                             "exact_substr_removal")

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import worker_cached
        hsorted, gset = worker_cached(ref)  # frozenset: once per worker
        ids: List = []
        cleans: List[str] = []
        removed: List[int] = []
        for did, t in zip(df[id_col], df[text_col]):
            if not isinstance(t, str):
                continue
            ids.append(did)
            h = _gram_hashes(t, gram_len)
            if len(h) == 0 or len(hsorted) == 0:
                cleans.append(t)
                removed.append(0)
                continue
            pos = np.searchsorted(hsorted, h)
            pos[pos == len(hsorted)] = 0
            cand = np.nonzero(hsorted[pos] == h)[0]
            hits = np.asarray([p for p in cand
                               if t[p:p + gram_len] in gset],
                              dtype=np.int64)
            if len(hits) == 0:
                cleans.append(t)
                removed.append(0)
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4")
            delta = np.zeros(len(codes) + 1, dtype=np.int32)
            np.add.at(delta, hits, 1)
            np.add.at(delta, hits + gram_len, -1)
            covered = np.cumsum(delta[:-1]) > 0
            cleans.append(codes[~covered].tobytes()
                          .decode("utf-32-le"))
            removed.append(int(covered.sum()))
        return pd.DataFrame({id_col: pd.Series(ids),
                             "clean_text": pd.Series(cleans,
                                                     dtype="object"),
                             "n_removed": pd.Series(removed,
                                                    dtype="int64")})

    # one row per doc -> corpus-scale output; stays a Dataset
    return ds.map_batches(cut, batch_format="pandas")


# ---------------------------------------------------------------------------
# Robust winnowing (Schleimer, Wilkerson & Aiken 2003) — the MOSS
# document-fingerprint selection
# ---------------------------------------------------------------------------

def _winnow_select(t, k: int, w: int, memo: dict):
    """Shared winnowing kernel: return ``(sel, arr)`` where ``arr`` is
    the md5-hex hash of every k-gram of ``t`` (object ndarray) and
    ``sel`` the 0-based selected positions (rightmost window-min of
    each w-window of consecutive hashes), or ``None`` when the text is
    shorter than one full window.  ``memo`` caches gram->md5 across
    calls (Zipf: vocab-tier md5 cost, not positions-scale)."""
    import hashlib

    if not isinstance(t, str):
        return None
    n = len(t) - k + 1
    if n < w:  # shorter than one full window: no selection
        return None
    hexes = []
    for i in range(n):
        g = t[i:i + k]
        h = memo.get(g)
        if h is None:
            h = hashlib.md5(g.encode("utf-8")).hexdigest()
            memo[g] = h
        hexes.append(h)
    arr = np.asarray(hexes, dtype=object)
    # value-ranked int codes (np.unique sorts lexicographically, which
    # IS md5-hex value order), then rightmost window argmin = first
    # argmin of the reversed window
    _, codes = np.unique(arr, return_inverse=True)
    wv = np.lib.stride_tricks.sliding_window_view(codes, w)
    a = wv[:, ::-1].argmin(axis=1)
    pos = np.arange(n - w + 1, dtype="int64") + (w - 1 - a)
    return np.unique(pos), arr


def winnow_fingerprints(ds, k: int = 8, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Robust winnowing fingerprint selection: hash every ``k``-char
    window, then in each window of ``w`` consecutive hashes keep the
    RIGHTMOST position holding the window minimum; the distinct
    selected positions are the document's fingerprints.  Guarantee
    (the paper's correctness property): any substring shared between
    two documents of length >= ``w + k - 1`` contributes at least one
    SHARED fingerprint hash — the basis of MOSS-style overlap
    detection at a fraction of the all-windows cost.

    Engine shape: entirely BATCH-LOCAL (zero exchanges — selection is a
    per-document function); the hash is md5 (not a seeded rolling hash)
    so a SQL oracle reproduces the selection exactly, with a per-batch
    memo over unique grams (Zipf: vocab-tier md5 calls, not
    positions-scale) and the per-doc window scan vectorized via
    ``sliding_window_view`` on value-ranked codes (rightmost-argmin =
    first-argmin of the reversed window).  Positions are 1-based
    code-point offsets (DuckDB ``substring`` semantics)."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        memo: dict = {}
        docs, poss, fps = [], [], []
        for did, t in zip(df[id_col], df[text_col]):
            r = _winnow_select(t, k, w, memo)
            if r is None:
                continue
            sel, arr = r
            docs.append(np.full(len(sel), did, dtype="int64"))
            poss.append(sel + 1)  # 1-based
            fps.extend(arr[sel])
        if not docs:
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "pos": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="object")})
        return pd.DataFrame({
            id_col: np.concatenate(docs),
            "pos": np.concatenate(poss),
            "fingerprint": fps})

    return ds.map_batches(per_batch, batch_format="pandas")


def winnow_overlap_pairs(ds, k: int = 8, w: int = 4,
                         id_col: str = "doc_id", text_col: str = "text",
                         min_shared: int = 2,
                         max_doc_freq: Optional[int] = None):
    """MOSS-style document-overlap detection: the dedup payoff of
    :func:`winnow_fingerprints`.  For every ordered doc pair sharing
    fingerprints, report ``n_shared`` (distinct shared fingerprint
    hashes) and ``containment_micro = (n_shared * 1_000_000) //
    min(|fp_a|, |fp_b|)`` — MOSS's shared/min containment as a pure
    int64 (exact in both engines, no float anywhere).  By the winnowing
    guarantee any substring shared between two docs of length
    >= ``w + k - 1`` yields at least one shared fingerprint, so true
    near-dups always surface.

    Engine shape (the :func:`ngram_jaccard_pairs` inverted-index
    pattern over the WINNOWED set — ~1/w the postings of the
    all-grams index): per-doc distinct fingerprints + per-doc count
    ``n`` exploded batch-locally, ONE coarse fingerprint-keyed
    exchange whose in-bucket self-merge emits pre-summed pair
    partials, ONE pair-keyed reduce.  A fingerprint's full group
    lands in one bucket, so ``max_doc_freq=M`` (stop-fingerprint cap:
    drop hashes in > M docs before pairing) is an EXACT global
    filter the SQL oracle reproduces with HAVING; like stop-gram
    filtering, the capped result is a subset with lower-bound counts
    — the corpus-scale path for Zipf-hot boilerplate grams.
    Returns a Dataset of (doc_a < doc_b, n_shared, containment_micro)
    with ``n_shared >= min_shared``."""
    from ..functions.relops import grouped_agg, grouped_map

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        memo: dict = {}
        ids, hhs, ns = [], [], []
        for did, t in zip(df[id_col], df[text_col]):
            r = _winnow_select(t, k, w, memo)
            if r is None:
                continue
            sel, arr = r
            uniq = np.unique(arr[sel])  # distinct fingerprint hashes
            ids.append(np.full(len(uniq), did, dtype="int64"))
            hhs.extend(uniq)
            ns.append(np.full(len(uniq), len(uniq), dtype="int64"))
        if not ids:
            return pd.DataFrame({"fingerprint": pd.Series(dtype="object"),
                                 "doc": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"fingerprint": hhs,
                             "doc": np.concatenate(ids),
                             "n": np.concatenate(ns)})

    fp = ds.map_batches(explode, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (fingerprint, doc) by construction; the
        # self-merge explodes each fingerprint group's doc pairs in C,
        # then an in-task pre-sum collapses them to one partial per pair
        sub = df
        if max_doc_freq is not None:
            cnt = sub.groupby("fingerprint",
                              sort=False)["doc"].transform("size")
            sub = sub[cnt <= max_doc_freq]  # stop-fingerprint: too common
        m = sub.merge(sub, on="fingerprint", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        if m.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "n_a": pd.Series(dtype="int64"),
                                 "n_b": pd.Series(dtype="int64"),
                                 "n_shared": pd.Series(dtype="int64")})
        g = m.groupby(["doc_a", "doc_b", "n_a", "n_b"], as_index=False,
                      sort=False).size().rename(columns={"size": "n_shared"})
        return g.astype({"n_shared": "int64"})

    inter = grouped_agg(
        grouped_map(fp, "fingerprint", bucket_pairs),
        ["doc_a", "doc_b", "n_a", "n_b"], n_shared=("n_shared", "sum"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "n_shared": pd.Series(dtype="int64"),
                "containment_micro": pd.Series(dtype="int64")})
        df = df[df["n_shared"] >= min_shared]
        den = np.minimum(df["n_a"].to_numpy(), df["n_b"].to_numpy())
        cm = (df["n_shared"].to_numpy() * 1_000_000) // den
        out = df[["doc_a", "doc_b", "n_shared"]].copy()
        out["containment_micro"] = cm.astype("int64")
        return out

    return inter.map_batches(finish, batch_format="pandas")
