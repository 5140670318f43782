"""BPE trainer/encoder gates: the incremental trainer against an
independent recompute-from-scratch reference, the textbook Sennrich
et al. (2016) example, rank-greedy encode vs training-order replay,
and the distributed token-budget query's exact values + invariants."""
import random
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from fastobo_py_ray.stages.textstats import (bpe_encode_word,
                                             bpe_token_counts, bpe_train,
                                             bpe_train_from_counts)

END = "</w>"


def _train_ref(word_counts, num_merges):
    """Naive reference: recompute ALL pair counts from scratch each
    merge (no incremental index) — a genuinely different algorithm
    than the trainer's pair->word-set maintenance."""
    seqs = {w: tuple(w) + (END,) for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, s in seqs.items():
            c = word_counts[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        pc += Counter()
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


def test_bpe_train_sennrich_example():
    # Sennrich et al. 2016 fig. 1 corpus (end-of-word marker variant):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe_train_from_counts(list(wc), list(wc.values()), 5)
    rows = list(zip(got["left"].astype(str), got["right"].astype(str),
                    got["pair_count"]))
    # es(9) -> est(9) -> est</w>(9) -> l o(7) -> lo w(7)
    assert rows == [("e", "s", 9), ("es", "t", 9), ("est", END, 9),
                    ("l", "o", 7), ("lo", "w", 7)]


def test_bpe_train_matches_scratch_reference_randomized():
    rng = random.Random(23)
    for trial in range(6):
        words = {"".join(rng.choice("abcd")
                         for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(5, 60))}
        wc = {w: rng.randint(1, 9) for w in words}
        n = rng.randint(1, 25)
        exp, _ = _train_ref(wc, n)
        got = bpe_train_from_counts(list(wc), list(wc.values()), n)
        assert list(map(tuple, got.to_numpy())) == exp, f"trial {trial}"


def test_bpe_encode_rank_greedy_equals_training_replay():
    rng = random.Random(5)
    words = {"".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
             for _ in range(40)}
    wc = {w: rng.randint(1, 5) for w in words}
    merges = bpe_train_from_counts(list(wc), list(wc.values()), 20)
    ranks = {(l, r): int(k) for k, l, r in zip(
        merges["rank"], merges["left"].astype(str),
        merges["right"].astype(str))}
    mlist = list(zip(merges["left"].astype(str),
                     merges["right"].astype(str)))

    def replay(word):  # apply merges strictly in training order
        s = tuple(word) + (END,)
        for a, b in mlist:
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

    for w in sorted(words) + ["cabbac", "zzz", "a"]:
        enc = bpe_encode_word(w, ranks)
        assert enc == replay(w), w
        assert "".join(enc) == w + END  # lossless segmentation


def test_bpe_token_counts_distributed_exact(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["low low lower", "newest widest", "low newest", ""]})
    ds = rd.from_pandas(docs)
    merges = bpe_train(ds, num_merges=5)
    ranks = {(l, r): int(k) for k, l, r in zip(
        merges["rank"], merges["left"].astype(str),
        merges["right"].astype(str))}
    out = bpe_token_counts(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = [sum(len(bpe_encode_word(w, ranks)) for w in t.split(" ") if w)
           for t in docs["text"]]
    assert out["n_tokens"].tolist() == exp
    # invariants: at least 1 token per word, at most chars+1
    for t, n in zip(docs["text"], out["n_tokens"]):
        ws = [w for w in t.split(" ") if w]
        assert n >= len(ws)
        assert n <= sum(len(w) + 1 for w in ws)


def test_bpe_vocab_limit_raises(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"text": ["a b c d e f"]}))
    with pytest.raises(ValueError, match="vocab_limit"):
        bpe_train(ds, num_merges=3, vocab_limit=2)
