"""Unigram-LM (SentencePiece-style) tokenizer: exact forward-backward
E-step vs segmentation enumeration, EM likelihood monotonicity, Viterbi
vs brute force, train coverage/determinism, distributed-histogram
parity, corpus encode round-trip."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from textextract_ray.functions.unigram import (
    corpus_loglik,
    expected_piece_counts,
    seed_unigram_vocab,
    train_unigram,
    unigram_vocab,
    viterbi_encode_word,
)
from textextract_ray.pipelines.textops import (
    train_unigram_lm,
    unigram_encode_corpus_ds,
)


def _segmentations(word, vocab):
    """All segmentations of word into vocab pieces."""
    if not word:
        return [[]]
    out = []
    for i in range(1, len(word) + 1):
        if word[:i] in vocab:
            for rest in _segmentations(word[i:], vocab):
                out.append([word[:i]] + rest)
    return out


def test_expected_counts_match_enumeration():
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "c": math.log(0.1),
        "ab": math.log(0.25),
        "bc": math.log(0.15),
    }
    freqs = {"abc": 5, "ab": 2, "cab": 1}
    got = expected_piece_counts(freqs, logp)

    want = {}
    for w, c in freqs.items():
        segs = _segmentations(w, logp)
        weights = [math.exp(sum(logp[p] for p in s)) for s in segs]
        z = sum(weights)
        for s, wt in zip(segs, weights):
            for p in s:
                want[p] = want.get(p, 0.0) + c * wt / z
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12)


def test_em_monotone_loglik():
    freqs = {"the": 50, "then": 10, "hen": 8, "thee": 4, "net": 6}
    logp = seed_unigram_vocab(freqs, 40)
    ll = corpus_loglik(freqs, logp)
    for _ in range(4):
        exp = expected_piece_counts(freqs, logp)
        total = sum(exp.values())
        floor = min(v for v in exp.values() if v > 0) * 1e-6
        logp = {s: math.log(max(exp.get(s, 0.0), floor) / total) for s in logp}
        ll2 = corpus_loglik(freqs, logp)
        assert ll2 >= ll - 1e-9
        ll = ll2


def test_viterbi_matches_bruteforce():
    logp = {
        "a": math.log(0.2),
        "b": math.log(0.15),
        "n": math.log(0.1),
        "an": math.log(0.25),
        "ban": math.log(0.2),
        "ana": math.log(0.1),
    }
    for word in ("banana", "ban", "aaa", "nab", "banban"):
        segs = _segmentations(word, logp)
        if not segs:
            continue
        best_score = max(sum(logp[p] for p in s) for s in segs)
        got = viterbi_encode_word(word, logp)
        assert "".join(got) == word
        assert sum(logp[p] for p in got) == pytest.approx(best_score, rel=1e-12)


def test_viterbi_oov_char_fallback():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    got = viterbi_encode_word("axb", logp)
    assert "".join(got) == "axb" and "x" in got


def test_train_coverage_vocab_size_and_determinism():
    freqs = {"banana": 20, "bandana": 10, "cabana": 5, "ana": 30, "nab": 7}
    model = train_unigram(freqs, vocab_size=10)
    assert len(model) <= 10
    # normalized distribution
    assert sum(math.exp(v) for v in model.values()) == pytest.approx(1.0, rel=1e-9)
    # every training word still segments
    for w in freqs:
        got = viterbi_encode_word(w, model)
        assert "".join(got) == w
        assert all(p in model for p in got)
    again = train_unigram(freqs, vocab_size=10)
    assert model == again
    # vocab ids deterministic from the model
    assert unigram_vocab(model) == unigram_vocab(again)
    with pytest.raises(ValueError):
        train_unigram(freqs, vocab_size=3)  # below the single-char floor


def test_distributed_train_matches_local_histogram(sf_dir, ray_session):
    model = train_unigram_lm(sf_dir, vocab_size=60, vocab_words=300, em_iters=1)

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    counts = {}
    for txt in t["text"].to_pylist():
        for tok in re.split(r"[^a-z]+", (txt or "").lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    hist = (
        pd.DataFrame({"tok": list(counts), "n": list(counts.values())})
        .sort_values(["n", "tok"], ascending=[False, True])
        .head(300)
    )
    local = train_unigram(
        dict(zip(hist["tok"], hist["n"])), 60, em_iters=1
    )
    assert set(model) == set(local)
    for p in model:
        assert model[p] == pytest.approx(local[p], rel=1e-9)


def test_encode_corpus_roundtrip(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["Banana bandana!", "a cabana, a banana", "", None], pa.string()
            ),
        }
    )
    freqs = {"banana": 20, "bandana": 10, "cabana": 5, "a": 30}
    model = train_unigram(freqs, vocab_size=12)
    out = (
        unigram_encode_corpus_ds(rd.from_arrow(docs), model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    inv = {i: p for p, i in unigram_vocab(model).items()}
    for _, row in out.iterrows():
        ids = list(row["ids"])
        assert row["n_tokens"] == len(ids)
        txt = docs["text"][int(row["doc_id"]) - 1].as_py() or ""
        words = [w for w in re.split(r"[^a-z]+", txt.lower()) if w]
        assert "".join(inv[i] for i in ids) == "".join(words)
    # layout invariance
    shards = rd.from_arrow([docs.slice(i, 1) for i in range(docs.num_rows)])
    again = (
        unigram_encode_corpus_ds(shards, model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for a, b in zip(out["ids"], again["ids"]):
        assert list(a) == list(b)
