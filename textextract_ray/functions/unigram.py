"""Unigram-LM subword tokenizer training and encoding (Kudo, ACL 2018 —
arXiv:1804.10959; the SentencePiece unigram model).

Like BPE (functions/bpe.py), the unigram model trains on the WORD
HISTOGRAM, not the corpus: the EM loop's E-step is a forward-backward
pass over each distinct word's segmentation lattice weighted by the
word's count, so one distributed (word, count) pass reduces training to
driver arithmetic over a vocabulary-scale table. The distributed
histogram + broadcast-encode pipeline lives in
pipelines/textops.train_unigram_lm / unigram_encode_corpus_ds.

Simplifications vs the reference implementation, documented:
  * plain MLE M-step (SentencePiece uses a Bayesian digamma update);
  * pruning drops the lowest-expected-count multi-char pieces each
    round (SentencePiece ranks by likelihood loss); single characters
    are never pruned, so every word stays segmentable.
Both keep the algorithm's shape (EM over the lattice, prune to target
vocab) and its determinism: ties everywhere break lexicographically.
"""

from __future__ import annotations

import math
from collections import Counter

_NEG_INF = float("-inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def seed_unigram_vocab(word_freqs: dict, seed_size: int, *, max_piece_len: int = 8):
    """Seed vocabulary: every substring up to ``max_piece_len`` scored
    by count x length (the Kudo seed heuristic), truncated to
    ``seed_size`` multi-char pieces; ALL single characters are always
    included so coverage is total. Returns {piece: logprob} normalized
    over the seed scores."""
    scores: Counter = Counter()
    for w, c in word_freqs.items():
        if not w:
            continue
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                scores[w[i:j]] += c * (j - i)
    chars = {s for s in scores if len(s) == 1}
    multi = sorted(
        (s for s in scores if len(s) > 1), key=lambda s: (-scores[s], s)
    )[: max(0, seed_size - len(chars))]
    vocab = sorted(chars) + sorted(multi)
    total = sum(scores[s] for s in vocab)
    return {s: math.log(scores[s] / total) for s in vocab}


def _forward(word: str, logp: dict, max_len: int):
    """alpha[i] = log P(word[:i]) marginalized over segmentations."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if alpha[j] == _NEG_INF:
                continue
            lp = logp.get(word[j:i])
            if lp is not None:
                alpha[i] = _logsumexp2(alpha[i], alpha[j] + lp)
    return alpha


def expected_piece_counts(word_freqs: dict, logp: dict) -> dict:
    """E-step: expected usage count of every piece under the current
    model, summed over the histogram (each word's lattice weighted by
    its corpus count). Exact forward-backward; words the model cannot
    segment (impossible while single chars remain) contribute nothing."""
    max_len = max((len(s) for s in logp), default=1)
    exp: dict = {}
    for w, c in word_freqs.items():
        if not w:
            continue
        n = len(w)
        alpha = _forward(w, logp, max_len)
        if alpha[n] == _NEG_INF:
            continue
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            for j in range(i + 1, min(i + max_len, n) + 1):
                if beta[j] == _NEG_INF:
                    continue
                lp = logp.get(w[i:j])
                if lp is not None:
                    beta[i] = _logsumexp2(beta[i], beta[j] + lp)
        z = alpha[n]
        for i in range(n):
            if alpha[i] == _NEG_INF:
                continue
            for j in range(i + 1, min(i + max_len, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] != _NEG_INF:
                    p = math.exp(alpha[i] + lp + beta[j] - z)
                    if p > 0.0:
                        piece = w[i:j]
                        exp[piece] = exp.get(piece, 0.0) + c * p
    return exp


def corpus_loglik(word_freqs: dict, logp: dict) -> float:
    """Count-weighted marginal log-likelihood of the histogram."""
    max_len = max((len(s) for s in logp), default=1)
    total = 0.0
    for w, c in word_freqs.items():
        if not w:
            continue
        a = _forward(w, logp, max_len)[len(w)]
        if a != _NEG_INF:
            total += c * a
    return total


def train_unigram(
    word_freqs: dict,
    vocab_size: int,
    *,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
):
    """EM-train a unigram LM over the word histogram and prune to
    ``vocab_size`` pieces. Returns {piece: logprob}, deterministic for
    a given histogram (no RNG anywhere; ties lexicographic)."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    logp = seed_unigram_vocab(
        word_freqs, max(vocab_size * seed_factor, vocab_size), max_piece_len=max_piece_len
    )
    n_chars = sum(1 for s in logp if len(s) == 1)
    if vocab_size < n_chars:
        raise ValueError(
            f"vocab_size {vocab_size} below the {n_chars} single characters "
            "coverage requires"
        )
    while True:
        for _ in range(em_iters):
            exp = expected_piece_counts(word_freqs, logp)
            # pieces with zero expectation keep a floor so they remain
            # prunable-by-rank rather than -inf (which would NaN the
            # normalizer)
            total = sum(exp.values())
            if total <= 0.0:
                break
            # the floor can underflow to 0.0 when the smallest expected
            # count is denormal; clamp so log() stays total
            floor = max(min(v for v in exp.values() if v > 0.0) * 1e-6, 1e-300)
            logp = {
                s: math.log(max(max(exp.get(s, 0.0), floor) / total, 1e-300))
                for s in logp
            }
        if len(logp) <= vocab_size:
            break
        exp = expected_piece_counts(word_freqs, logp)
        multi = sorted(
            (s for s in logp if len(s) > 1), key=lambda s: (exp.get(s, 0.0), s)
        )
        n_drop = min(
            len(multi),
            max(1, int(len(multi) * prune_frac)),
            len(logp) - vocab_size,
        )
        for s in multi[:n_drop]:
            del logp[s]
        # renormalize the survivors
        z = _logsumexp_all(logp.values())
        logp = {s: lp - z for s, lp in logp.items()}
    return logp


def _logsumexp_all(vals) -> float:
    vals = list(vals)
    m = max(vals)
    return m + math.log(sum(math.exp(v - m) for v in vals))


def viterbi_encode_word(word: str, logp: dict, *, max_piece_len: int | None = None):
    """Best segmentation of one word under the model. Ties break toward
    the LONGER last piece, then lexicographically — deterministic.
    Characters outside the vocabulary become themselves with a large
    penalty (coverage fallback; cannot happen for words whose chars
    were in training)."""
    if not word:
        return []
    max_len = max_piece_len or max((len(s) for s in logp), default=1)
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    unk = min(logp.values(), default=-10.0) - 10.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == _NEG_INF:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None and i - j == 1:
                lp = unk
            if lp is None:
                continue
            cand = best[j] + lp
            # strict >: j ascends, so ties keep the SMALLEST j already
            # stored — the longest last piece — deterministically
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_vocab(logp: dict) -> dict:
    """Deterministic piece -> id table: ids by (logprob desc, piece asc)
    so the table is a pure function of the trained model."""
    ordered = sorted(logp, key=lambda s: (-logp[s], s))
    return {s: i for i, s in enumerate(ordered)}
