"""Byte-pair-encoding tokenizer training and encoding (Sennrich,
Haddow & Birch, ACL 2016 — arXiv:1508.07909).

BPE trains on a WORD-FREQUENCY HISTOGRAM, not on raw text — the
insight every production trainer (subword-nmt, fastBPE, HF tokenizers)
exploits: one distributed pass builds the histogram (vocabulary-scale,
tiny next to the corpus), then the greedy merge loop runs driver-side
over that histogram. This module is the driver-side half; the
distributed histogram + broadcast-encode pipeline lives in
pipelines/textops.train_bpe / bpe_token_stats.

Determinism: the merge chosen each round is (max count, then
lexicographically smallest pair) — no dict-order dependence, so the
same histogram always yields the same merge table on any machine.
"""

from __future__ import annotations

from collections import Counter

END_OF_WORD = "</w>"


def train_bpe(word_freqs: dict, n_merges: int, *, end_of_word: str = END_OF_WORD):
    """Greedy BPE merges over a {word: count} histogram. Returns the
    ordered merge list [(sym_a, sym_b), ...] (rank = position)."""
    vocab = {}
    for w, c in word_freqs.items():
        if not w:
            continue
        syms = tuple(w) + (end_of_word,)
        vocab[syms] = vocab.get(syms, 0) + int(c)

    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def merge_ranks(merges) -> dict:
    """merge list -> {(a, b): rank} lookup for encoding."""
    return {tuple(m): r for r, m in enumerate(merges)}


def bpe_encode_word(word: str, ranks: dict, *, end_of_word: str = END_OF_WORD):
    """Encode one word: repeatedly merge the LOWEST-RANK adjacent pair
    (the canonical BPE apply order — identical to replaying the merges
    in training order)."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        best_i = -1
        best_r = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_vocab(
    merges,
    *,
    alphabet: str = "abcdefghijklmnopqrstuvwxyz",
    end_of_word: str = END_OF_WORD,
) -> dict:
    """Deterministic symbol -> id table for a trained merge list
    (subword-nmt layout): id 0 is ``<unk>``, then the base alphabet
    (every single char the ``[^a-z]+`` tokenization can produce), the
    bare end-of-word marker, then one id per merge OUTPUT in training
    order. The same merges always yield the same ids on any machine;
    symbols outside the table (impossible for in-alphabet text) map
    to ``<unk>``."""
    vocab = {"<unk>": 0}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    vocab[end_of_word] = len(vocab)
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_encode_ids(
    words, ranks, vocab, *, end_of_word: str = END_OF_WORD
) -> list:
    """Token-id encoding per word (list of int lists), memoized across
    the word list exactly like ``bpe_encode_counts`` — web text repeats
    words heavily, so the cache hit rate dominates."""
    unk = vocab.get("<unk>", 0)
    cache: dict = {}
    out = []
    for w in words:
        ids = cache.get(w)
        if ids is None:
            ids = [
                vocab.get(s, unk)
                for s in bpe_encode_word(w, ranks, end_of_word=end_of_word)
            ]
            cache[w] = ids
        out.append(ids)
    return out


def bpe_encode_counts(words, ranks, *, end_of_word: str = END_OF_WORD):
    """Number of BPE tokens per word, memoized across the (typically
    highly repetitive) word list — the batch-encode fast path."""
    cache: dict = {}
    out = []
    for w in words:
        n = cache.get(w)
        if n is None:
            n = len(bpe_encode_word(w, ranks, end_of_word=end_of_word))
            cache[w] = n
        out.append(n)
    return out
