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
               num_buckets: int = 64, round_to: int = 6):
    """Per-document top-``k`` TF-IDF keywords over a space-tokenized
    corpus; returns a Dataset of ``(id_col, word, score)``.

    Scale shape (two keyed exchanges, nothing on the driver):

    1. term frequencies are EXACT per batch (a document's text lives in
       one row, hence one batch), so the first exchange — bucketed on
       ``word`` — only has to reduce pre-counted ``(doc, word, tf)``
       partials and compute document frequency: a bucket holds every
       row of its words, so ``groupby(word).size`` over the distinct
       (doc, word) rows IS the global df, and the idf score is applied
       in the same task (no separate join for the idf table).
    2. the second exchange buckets on ``id_col`` and takes each
       document's top-k by (score desc, word asc) — C-speed
       sort + ``groupby.head`` inside the bucket.

    ``score = round(tf * ln(n_docs / df), round_to)`` — rounded BEFORE
    ranking so distributed float summation order can never flip a rank
    across engines. ``n_docs`` is passed in (a metadata-only count).
    """
    from ..functions.relops import grouped_map

    tf = ds.map_batches(
        lambda df: token_counts_batch(df, id_col, text_col),
        batch_format="pandas")

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (doc, word) pairs, so the group size per
        # word is the document frequency — vectorized via transform
        dfc = df.groupby("word", sort=False)["tf"].transform("size")
        df = df.copy()
        df["score"] = (df["tf"] * np.log(n_docs / dfc.to_numpy())) \
            .round(round_to)
        return df[[id_col, "word", "score"]]

    scored = grouped_map(tf, "word", score_bucket, num_buckets=num_buckets)

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "score", "word"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby(id_col, sort=False).head(k)

    return grouped_map(scored, id_col, topk_bucket,
                       num_buckets=num_buckets)
