"""Text-analysis stages for training-data pipelines (driver brief):
token counting, quality scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` transforms over the ``documents``
/ ``pages`` text column; the language-ID profile table and stopword sets
are compiled once per actor (callable classes), never per batch.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish token regex (GPT-2 style word/number/punct split, simplified)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

DEFAULT_STOPWORDS = frozenset({"the", "a", "an", "and", "of", "to", "in"})


def compression_ratio_batch(df: pd.DataFrame, text_col: str = "text",
                            level: int = 6) -> pd.DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap quality/repetition signal for web curation: heavily
    templated or repeated text compresses far below natural prose, and
    random bytes sit near (slightly above) 1.0.  Stdlib zlib, one C
    call per row, no Python token work; empty/null docs report 0.0.
    Adds ``compress_ratio`` (round 6)."""
    import zlib

    ratios = np.zeros(len(df), dtype="float64")
    for i, t in enumerate(df[text_col].fillna("").astype(str)):
        b = t.encode()
        if b:
            ratios[i] = len(zlib.compress(b, level)) / len(b)
    out = df.copy()
    out["compress_ratio"] = np.round(ratios, 6)
    return out


def token_stats_batch(df: pd.DataFrame, text_col: str = "text",
                      stopwords=DEFAULT_STOPWORDS) -> pd.DataFrame:
    """Whitespace tokens, BPE-ish tokens, stopword count, punct count.

    Integer-valued outputs so the DuckDB oracle can reproduce them exactly
    (float ratios are derivable downstream).
    """
    texts = df[text_col].fillna("")
    out = df.copy()
    toks = [_WS_RE.split(t.strip()) if t.strip() else [] for t in texts]
    out["n_tokens"] = [len(t) for t in toks]
    out["n_stopwords"] = [sum(1 for w in t if w.lower() in stopwords)
                          for t in toks]
    out["n_bpe_tokens"] = [len(_BPE_RE.findall(t)) for t in texts]
    out["n_chars_computed"] = [len(t) for t in texts]
    return out


def quality_score_batch(df: pd.DataFrame, text_col: str = "text"
                        ) -> pd.DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence +
    punctuation sanity (Gopher/C4-style rules, integer-free float)."""
    s = token_stats_batch(df, text_col)
    n_tok = s["n_tokens"].to_numpy(dtype=float)
    n_stop = s["n_stopwords"].to_numpy(dtype=float)
    n_char = s["n_chars_computed"].to_numpy(dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
        mean_len = np.where(n_tok > 0, n_char / n_tok, 0.0)
    score = (
        0.4 * ((n_tok >= 10) & (n_tok <= 100000)).astype(float)
        + 0.3 * (stop_ratio > 0.01).astype(float)
        + 0.3 * ((mean_len >= 2.0) & (mean_len <= 15.0)).astype(float)
    )
    out = df.copy()
    out["quality_score"] = np.round(score, 4)
    return out


# ---------------------------------------------------------------------------
# language identification (n-gram heuristic)
# ---------------------------------------------------------------------------

_LANG_PROFILES: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour"),
    "es": ("el", "la", "los", "que", "y", "es", "una", "por", "con"),
    "it": ("il", "che", "di", "non", "sono", "per", "come", "questo",
           "alla"),
    "pt": ("o", "que", "do", "da", "em", "um", "para", "como", "mais"),
    "nl": ("het", "een", "van", "dat", "niet", "op", "zijn", "voor",
           "maar"),
}

# non-Latin scripts identify by codepoint range, not stopwords
# (lang, range_start, range_end) — checked on a bounded text prefix
_SCRIPT_RANGES: Tuple[Tuple[str, int, int], ...] = (
    ("zh", 0x4E00, 0x9FFF),   # CJK unified ideographs
    ("ja", 0x3040, 0x30FF),   # hiragana + katakana
    ("ko", 0xAC00, 0xD7AF),   # hangul syllables
    ("ru", 0x0400, 0x04FF),   # cyrillic
    ("ar", 0x0600, 0x06FF),   # arabic
    ("el", 0x0370, 0x03FF),   # greek
)
_SCRIPT_SAMPLE_CHARS = 400
_SCRIPT_MIN_FRAC = 0.25


class LangId:
    """Actor-pool language-ID stage: codepoint-script vote for
    non-Latin scripts (vectorized over a bounded prefix), then
    stopword-profile voting across the Latin-script profiles; profiles
    compiled once per actor."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {lang: frozenset(ws)
                         for lang, ws in _LANG_PROFILES.items()}

    @staticmethod
    def _script_vote(text: str) -> Optional[str]:
        sample = text[:_SCRIPT_SAMPLE_CHARS]
        # pure-ASCII text can never pass the threshold: skip the encode
        # and range scans on the dominant Latin-corpus path (C-speed)
        if not sample or sample.isascii():
            return None
        cps = np.frombuffer(sample.encode("utf-32-le"), dtype=np.uint32)
        # kana are ja-exclusive, so ANY meaningful kana presence decides
        # ja before ideograph counting (kanji-heavy Japanese would
        # otherwise tie-break to zh, which shares the CJK range)
        kana = float(((cps >= 0x3040) & (cps <= 0x30FF)).mean())
        if kana >= 0.05:
            return "ja"
        best, frac = None, 0.0
        for lang, lo, hi in _SCRIPT_RANGES:
            f = float(((cps >= lo) & (cps <= hi)).mean())
            if f > frac:
                best, frac = lang, f
        return best if frac >= _SCRIPT_MIN_FRAC else None

    def predict(self, text: str) -> str:
        text = text or ""
        script = self._script_vote(text)
        if script is not None:
            return script
        words = [w.lower() for w in _WORD_RE.findall(text)]
        if not words:
            return "und"
        scores = {lang: sum(1 for w in words if w in prof)
                  for lang, prof in self.profiles.items()}
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        return best[0] if best[1] > 0 else "und"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[self.out_col] = [self.predict(t) for t in df[self.text_col]]
        return df


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def content_hash_batch(df: pd.DataFrame, text_col: str = "text",
                       out_col: str = "content_md5") -> pd.DataFrame:
    """Exact-content fingerprint; hex MD5 so ``duckdb md5(text)`` is the
    oracle."""
    df = df.copy()
    df[out_col] = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                   for t in df[text_col]]
    return df


_FP_KEY = "fastobomray-fp00"


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text",
                      window: int = 5, out_col: str = "fingerprint"
                      ) -> pd.DataFrame:
    """Winnowing-style document fingerprint: min 64-bit hash over
    ``window``-gram word shingles (deterministic).

    Vectorized: ONE siphash call (``pd.util.hash_array``) over every
    shingle in the batch, then per-document segmented mins via
    ``np.minimum.reduceat`` — never a per-shingle Python hash loop.
    Texts shorter than ``window`` words fingerprint their whole token
    run (empty text hashes the empty string)."""
    sh_lists = []
    for t in df[text_col]:
        words = _WORD_RE.findall((t or "").lower())
        if len(words) < window:
            sh_lists.append([" ".join(words)])
        else:
            sh_lists.append([" ".join(words[i:i + window])
                             for i in range(len(words) - window + 1)])
    lens = np.fromiter((len(s) for s in sh_lists), dtype=np.int64,
                       count=len(sh_lists))
    df = df.copy()
    if not len(df):
        df[out_col] = pd.Series([], dtype="int64")
        return df
    flat = [s for sl in sh_lists for s in sl]
    h = (pd.util.hash_array(np.asarray(flat, dtype=object),
                            hash_key=_FP_KEY)
         >> np.uint64(1)).astype(np.int64)  # clear sign bit: int64-safe
    offsets = np.zeros(len(sh_lists), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    # every segment has >= 1 shingle (short texts contribute one), so
    # reduceat never sees an empty segment
    df[out_col] = np.minimum.reduceat(h, offsets)
    return df


# ---------------------------------------------------------------------------
# hashed text embeddings (feature hashing; model-free)
# ---------------------------------------------------------------------------

def hashed_tf_embed_batch(df: pd.DataFrame, text_col: str = "text",
                          dim: int = 256, out_col: str = "embedding"
                          ) -> pd.DataFrame:
    """Deterministic text -> dense vector via feature hashing: token
    hash buckets to ``dim`` counts per document, l2-normalized — the
    model-free embedding that lets the text corpus ride the embedding
    operators (cosine near-dup, ANN, SemDeDup-style clustering) without
    any external model.

    Fully vectorized: one siphash call over every token in the batch,
    one ``np.add.at`` scatter into the (docs x dim) count matrix.
    Output column is a list<float> compatible with the embedding suite.
    """
    texts = df[text_col].fillna("")
    toks = [_WORD_RE.findall(t.lower()) for t in texts]
    n = len(df)
    mat = np.zeros((n, dim), dtype=np.float64)
    flat = [w for ws in toks for w in ws]
    if flat:
        h = (pd.util.hash_array(np.asarray(flat, dtype=object),
                                hash_key="fastobomray-fh00")
             % np.uint64(dim)).astype(np.int64)
        rows = np.repeat(np.arange(n),
                         np.fromiter((len(ws) for ws in toks),
                                     dtype=np.int64, count=n))
        np.add.at(mat, (rows, h), 1.0)
    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat /= norms
    out = df.copy()
    out[out_col] = list(mat)
    return out


def hashed_tf_embed(ds, text_col: str = "text", dim: int = 256,
                    out_col: str = "embedding"):
    return ds.map_batches(
        lambda df: hashed_tf_embed_batch(df, text_col, dim, out_col),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def token_counts_batch(df: pd.DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> pd.DataFrame:
    """Per-batch exact ``(id_col, word, tf)`` term-frequency partials
    over space-tokenized text (a document lives in one row, so the
    per-batch count is globally exact).  THE single tokenization used
    by tfidf_topk and the unigram-LM query — keep any tokenizer change
    here so every consumer stays value-identical to the shared SQL
    ``string_split(text, ' ')`` contract."""
    s = df[text_col].astype(str).str.split(" ")
    lens = s.str.len().fillna(0).astype("int64").to_numpy()
    ids = np.repeat(df[id_col].to_numpy(), lens)
    out = pd.DataFrame({id_col: ids,
                        "word": pd.Series(s.explode().to_numpy(),
                                          dtype="string")})
    return out.groupby([id_col, "word"], as_index=False,
                       sort=False, observed=True).size() \
        .rename(columns={"size": "tf"})


def tfidf_topk(ds, n_docs: int, text_col: str = "text",
               id_col: str = "doc_id", k: int = 3,
               num_buckets: int = 64, round_to: int = 6,
               df_broadcast_limit: int = 2_000_000):
    """Per-document top-``k`` TF-IDF keywords over a space-tokenized
    corpus; returns a Dataset of ``(id_col, word, score)``.

    Scale shape — TIERED on vocabulary size, stopword-skew-proof
    (the r4 rehearsal showed the old word-keyed corpus exchange
    collapsing 2x per-doc at 5M docs: every occurrence of a hot word
    lands in one bucket task, and real corpora are Zipf-hot):

    1. df pass: per-batch ``(word, partial_df)`` combiners (a hot word
       collapses to ONE row per batch) -> a KB-scale keyed exchange
       sums them into the ``(word, df)`` table.  No corpus bytes move.
    2. score+top-k pass, tiered on the vocabulary row count:

       * vocab <= ``df_broadcast_limit`` (common case): the idf table
         is broadcast ONCE via ``ray.put`` as two aligned numpy
         arrays and resolved once per WORKER via the per-worker
         cache (functions/broadcast.py) — never per batch.
         Tokenize+score+top-k are FUSED into one batch fn
         over whole-document rows (a row can never split across
         batches, so the per-doc top-k is exact — separate tf/score
         stages would let Ray's batch re-slicing split a document's tf
         rows, the off-by-187 the 5M rehearsal caught) — ZERO
         corpus-scale exchanges end-to-end.
       * above the limit: salted word-keyed :func:`hash_join` against
         the df table (right side is one row per word; the salt
         defuses hot-word skew on the left), then one doc-keyed
         exchange for the top-k.

    The two passes re-stream the tokenization rather than pinning the
    corpus-scale tf table in the object store (same two-streaming-reads
    trade the curation funnel documents).

    ``score = round(tf * ln(n_docs / df), round_to)`` — rounded BEFORE
    ranking so distributed float summation order can never flip a rank
    across engines. ``n_docs`` is passed in (a metadata-only count).
    """
    import ray

    from ..functions.relops import grouped_agg, grouped_map, hash_join

    # pass 1 — document frequency from pre-combined partials:
    # token_counts_batch rows are distinct (doc, word), so the
    # per-batch group SIZE is a df partial and the exchange moves
    # <= batches x batch-vocab rows
    def _tokens(df: pd.DataFrame):
        """(row_index_repeated, word_codes, unique_words) for a batch —
        the shared factorize layout both passes build on (2.5x faster
        than a pandas groupby for these kernels, measured)."""
        s = df[text_col].astype(str).str.split(" ")
        lens = s.str.len().fillna(0).astype("int64").to_numpy()
        rows = np.repeat(np.arange(len(df)), lens)
        codes, uniques = pd.factorize(s.explode().to_numpy())
        return rows, codes, uniques

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows, codes, uniques = _tokens(df)
        if len(uniques) == 0:
            return pd.DataFrame({"word": pd.Series(dtype="string"),
                                 "df": pd.Series(dtype="int64")})
        # distinct (doc, word) pairs via one np.unique on combined keys
        uk = np.unique(rows * len(uniques) + codes)
        wc = np.bincount(uk % len(uniques), minlength=len(uniques))
        return pd.DataFrame({"word": pd.Series(uniques, dtype="string"),
                             "df": wc.astype("int64")})

    # materialized: df_tbl is vocabulary-sized (KB-scale) and consumed
    # twice (count + broadcast/join) — without this the corpus-scale
    # df pass would re-execute per consumer
    df_tbl = grouped_agg(
        ds.map_batches(df_partial, batch_format="pandas"),
        "word", num_buckets=min(num_buckets, 16),
        df=("df", "sum")).materialize()

    n_vocab = df_tbl.count()
    if n_vocab <= df_broadcast_limit:
        vocab_pd = df_tbl.to_pandas().sort_values("word")
        # broadcast as a SORTED word array + aligned idf array: a
        # pandas Series is not zero-copy out of plasma, so a per-batch
        # ray.get would re-deserialize the whole vocabulary each batch;
        # the per-worker cache (functions/broadcast.py) makes the
        # fetch+index build once per worker process, and batch lookups
        # are an O(u log V) searchsorted against the sorted words
        idf_ref = ray.put((
            vocab_pd["word"].to_numpy(dtype=object),
            np.log(n_docs / vocab_pd["df"].to_numpy(dtype="float64"))))

        # FUSED tokenize+score+topk over whole-document rows: batch
        # re-slicing can split a doc's TF rows across batches (the r4
        # 5M rehearsal caught exactly that as 187 surplus rows), but it
        # can never split a row, so computing everything from the text
        # row keeps the per-doc top-k exact with zero exchanges.  All
        # numpy: tf via np.unique on combined (row, word-code) keys,
        # idf via ONE tiny hashtable probe over the batch vocabulary,
        # per-doc top-k via lexsort + group-offset mask.
        def score_topk(df: pd.DataFrame) -> pd.DataFrame:
            from ..functions.broadcast import worker_cached

            rows, codes, uniques = _tokens(df)
            words, idf = worker_cached(idf_ref)  # once per worker
            nu = len(uniques)
            if nu == 0:
                return pd.DataFrame({
                    id_col: pd.Series(dtype=df[id_col].dtype),
                    "word": pd.Series(dtype="string"),
                    "score": pd.Series(dtype="float64")})
            uk, tf = np.unique(rows * nu + codes, return_counts=True)
            row_i, code = uk // nu, uk % nu
            # every batch word came from the same corpus the df pass
            # saw, so searchsorted against the sorted vocab is exact
            idf_u = idf[np.searchsorted(words, uniques)]
            score = (tf * idf_u[code]).round(round_to)
            # word-asc tie-break: lexicographic rank of each unique
            word_rank = np.empty(nu, dtype=np.int64)
            word_rank[np.argsort(uniques, kind="stable")] = \
                np.arange(nu)
            order = np.lexsort((word_rank[code], -score, row_i))
            row_s, score_s, code_s = \
                row_i[order], score[order], code[order]
            starts = np.r_[0, np.flatnonzero(np.diff(row_s)) + 1]
            sizes = np.diff(np.r_[starts, len(row_s)])
            keep = (np.arange(len(row_s))
                    - np.repeat(starts, sizes)) < k
            return pd.DataFrame({
                id_col: df[id_col].to_numpy()[row_s[keep]],
                "word": pd.Series(uniques[code_s[keep]],
                                  dtype="string"),
                "score": score_s[keep]})

        return ds.map_batches(score_topk, batch_format="pandas")

    # big-vocab tier: salted join (right side one row/word), then one
    # doc-keyed exchange for the per-document top-k
    tf = ds.map_batches(
        lambda df: token_counts_batch(df, id_col, text_col),
        batch_format="pandas")
    scored = hash_join(tf, df_tbl, on="word", how="inner",
                       lcols=[id_col, "word", "tf"],
                       rcols=["word", "df"],
                       num_buckets=num_buckets, salt=16) \
        .map_batches(
            lambda df: df.assign(score=(df["tf"] * np.log(
                n_docs / df["df"].to_numpy())).round(round_to))
            [[id_col, "word", "score"]],
            batch_format="pandas")

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "score", "word"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby(id_col, sort=False).head(k)

    return grouped_map(scored, id_col, topk_bucket,
                       num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# BPE subword tokenizer: distributed word-count reduction, vocab-tier
# merge training, broadcast rank-greedy encode
# ---------------------------------------------------------------------------

def word_counts(ds, text_col: str = "text"):
    """Corpus -> exact ``(word, cnt)`` table on the vocabulary tier:
    per-batch ``value_counts`` combiners (a hot word collapses to ONE
    row per batch, so the exchange moves pre-reduced KB-scale partials,
    never the token stream) -> one keyed ``grouped_agg`` sum.  Same
    tier contract as tfidf's df pass — the ONLY corpus-scale work any
    vocab-tier consumer (BPE training, edit-distance joins, spelling
    canonicalization) ever does."""
    from ..functions.relops import grouped_agg

    def batch_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].astype(str).str.split(" ").explode()
        toks = toks[toks != ""]
        c = toks.value_counts()
        return pd.DataFrame({
            "word": pd.Series(c.index.to_numpy(), dtype="string"),
            "n": c.to_numpy().astype("int64")})

    part = ds.map_batches(batch_counts, batch_format="pandas")
    return grouped_agg(part, "word", cnt=("n", "sum"))


def bpe_train_from_counts(words, counts, num_merges: int,
                          end_token: str = "</w>") -> pd.DataFrame:
    """Deterministic byte-pair-encoding merge training over a word
    frequency table (Sennrich et al. 2016 shape, the algorithm behind
    GPT-2/SentencePiece-BPE vocabularies).  Each iteration merges the
    adjacent symbol pair with the highest corpus count; ties break on
    the lexicographically smallest ``(left, right)`` pair so the merge
    list is identical regardless of input order or parallelism.

    Incremental maintenance: a pair->word-set index means each merge
    re-segments only the words CONTAINING the merged pair, and the
    argmax rides a lazy-deletion heap keyed ``(-count, pair)`` (stale
    entries are discarded on pop by comparing against the live count),
    so per-merge cost is O(total length of affected words + heap
    churn for the pairs those words touched) — never a full scan of
    the pair table.

    Returns a DataFrame ``(rank, left, right, pair_count)``.
    """
    import heapq
    from collections import Counter, defaultdict

    order = np.argsort(np.asarray(words, dtype=object), kind="stable")
    seqs = [tuple(str(words[i])) + (end_token,) for i in order]
    cnts = [int(counts[i]) for i in order]

    pair_counts: Counter = Counter()
    where = defaultdict(set)
    heap: list = []
    dirty: set = set()

    def add_word(idx: int, sign: int) -> None:
        s, c = seqs[idx], sign * cnts[idx]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] += c
            dirty.add(p)
            if sign > 0:
                where[p].add(idx)

    for idx in range(len(seqs)):
        add_word(idx, +1)

    merges = []
    for rank in range(num_merges):
        for p in dirty:  # (re)publish every pair whose count moved
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
        dirty.clear()
        best = None
        while heap:
            negc, p = heap[0]
            if pair_counts.get(p, 0) == -negc:  # live entry
                best = (p, -negc)
                break
            heapq.heappop(heap)  # stale: count moved since push
        if best is None:
            break
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        dirty.add((a, b))  # count goes to 0 below; republish check
        new = a + b
        for idx in sorted(where.get((a, b), ())):
            add_word(idx, -1)
            s = seqs[idx]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[idx] = tuple(out)
            add_word(idx, +1)
        where.pop((a, b), None)

    return pd.DataFrame({
        "rank": pd.Series([m[0] for m in merges], dtype="int64"),
        "left": pd.Series([m[1] for m in merges], dtype="string"),
        "right": pd.Series([m[2] for m in merges], dtype="string"),
        "pair_count": pd.Series([m[3] for m in merges], dtype="int64")})


def bpe_train(ds, text_col: str = "text", num_merges: int = 200,
              end_token: str = "</w>",
              vocab_limit: int = 5_000_000) -> pd.DataFrame:
    """Train BPE merges over a corpus Dataset: the corpus reduces to
    the exact :func:`word_counts` table (the only corpus-scale work),
    and the merge loop runs on that vocabulary-bounded table — the
    shape every production tokenizer trainer uses (word counts fit one
    machine even for 100-TB corpora; vocabulary cardinality grows with
    the LANGUAGE, not the data).  ``vocab_limit`` guards the driver
    collect: past it the input needs pre-filtering (e.g. min-count
    threshold on the counts table), and we RAISE rather than silently
    sample."""
    wc = word_counts(ds, text_col).to_pandas()
    if len(wc) > vocab_limit:
        raise ValueError(
            f"bpe_train: vocabulary {len(wc)} exceeds vocab_limit="
            f"{vocab_limit}; pre-filter rare words (min-count) before "
            f"training rather than silently sampling")
    return bpe_train_from_counts(
        wc["word"].astype(str).tolist(), wc["cnt"].to_numpy(),
        num_merges, end_token)


def bpe_encode_word(word: str, ranks: dict, end_token: str = "</w>"):
    """Rank-greedy BPE encode of one word (GPT-2 ``get_pairs`` loop):
    repeatedly apply the LOWEST-rank applicable merge to all its
    non-overlapping occurrences left-to-right, until no merge applies.
    For ranks produced by :func:`bpe_train_from_counts` this is
    equivalent to replaying the merges in training order (pytest-gated
    equivalence)."""
    s = tuple(word) + (end_token,)
    while len(s) > 1:
        best_rank, best_pair = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (s[i], s[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = tuple(out)
    return s


def bpe_token_counts(ds, merges: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", end_token: str = "</w>"):
    """Per-document BPE token counts under a trained merge table —
    the token-budget accounting pass of a training-data pipeline.
    The merge ranks are broadcast ONCE (``ray.put``), resolved once
    per worker (functions/broadcast.py), and each batch encodes only
    its UNIQUE words (factorize + per-word memo shared across the
    worker's batches), so a Zipf-hot word is encoded once per worker,
    not once per occurrence.  Returns a Dataset of (id_col, n_tokens).
    """
    import ray

    from ..functions.broadcast import worker_cached

    ranks = {(l, r): int(k) for k, l, r in zip(
        merges["rank"], merges["left"].astype(str),
        merges["right"].astype(str))}
    ref = ray.put((ranks, {}))  # (ranks, shared per-worker word memo)

    def encode_batch(df: pd.DataFrame) -> pd.DataFrame:
        rk, memo = worker_cached(ref)
        s = df[text_col].astype(str).str.split(" ")
        nw = s.str.len().fillna(0).astype("int64").to_numpy()
        codes, uniq = pd.factorize(s.explode().to_numpy())
        enc = np.empty(len(uniq), dtype=np.int64)
        for u, w in enumerate(uniq):  # unique words only: Zipf-cheap
            if not isinstance(w, str) or not w:
                enc[u] = 0
                continue
            n = memo.get(w)
            if n is None:
                n = len(bpe_encode_word(w, rk, end_token))
                memo[w] = n
            enc[u] = n
        lens = np.zeros(len(df), dtype=np.int64)
        if codes.size:
            np.add.at(lens, np.repeat(np.arange(len(df)), nw),
                      enc[codes])
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_tokens": lens})

    return ds.map_batches(encode_batch, batch_format="pandas")
