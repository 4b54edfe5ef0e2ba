"""Sentence segmentation + sentence-boundary chunking: splitter cases
(abbreviations, decimals, quotes), brute-force next-fit chunk oracle,
never-split-a-sentence invariant, oversize flag, layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_split_sentences_cases():
    from textextract_ray.functions.text import split_sentences

    got = split_sentences(
        pa.array(
            [
                "Hello world. This is fine! Is it? Yes.",
                "Mr. Smith went to Washington. He met Dr. Jones.",
                "Pi is 3.14 exactly. The U.S. economy grew. 2024 was wild.",
                'He said "stop." Then left.',
                "No terminal punctuation here",
                "",
            ]
        )
    ).to_pylist()
    assert got[0] == ["Hello world.", "This is fine!", "Is it?", "Yes."]
    assert got[1] == ["Mr. Smith went to Washington.", "He met Dr. Jones."]
    assert got[2] == [
        "Pi is 3.14 exactly.",
        "The U.S. economy grew.",
        "2024 was wild.",
    ]
    assert got[3] == ['He said "stop."', "Then left."]
    assert got[4] == ["No terminal punctuation here"]
    assert got[5] == [""]


def _docs() -> pd.DataFrame:
    rows = [
        (0, "One two three. Four five six seven. Eight nine. Ten."),
        (1, "Short. " * 10),
        # one oversize sentence (no boundaries): must chunk alone, flagged
        (2, "word " * 40),
        (3, ""),
        (4, "Tiny."),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute(df: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    from textextract_ray.functions.text import split_sentences

    out = []
    for _, r in df.iterrows():
        sents = split_sentences(pa.array([r["text"] or ""])).to_pylist()[0]
        counts = [len(s.split()) for s in sents]
        chunks, cur, cur_n = [], [], 0
        for s, c in zip(sents, counts):
            cc = min(c, max_tokens)
            if cur and cur_n + cc > max_tokens:
                chunks.append(cur)
                cur, cur_n = [], 0
            cur.append(s)
            cur_n += cc
        if cur:
            chunks.append(cur)
        for ci, ch in enumerate(chunks):
            n = sum(len(s.split()) for s in ch)
            out.append(
                (int(r["doc_id"]), ci, " ".join(ch), n, len(ch), n > max_tokens)
            )
    return pd.DataFrame(
        out,
        columns=["doc_id", "chunk_idx", "text", "n_tokens", "n_sentences", "truncate"],
    )


def _run(df: pd.DataFrame, max_tokens: int, repartition=None) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import sentence_chunks_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    out = sentence_chunks_ds(ds, max_tokens=max_tokens).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("max_tokens", [6, 10, 128])
def test_sentence_chunks_match_brute_force(ray_session, max_tokens):
    df = _docs()
    got = _run(df, max_tokens)
    want = _brute(df, max_tokens)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_sentence_chunks_invariants(ray_session):
    got = _run(_docs(), 10)
    # a sentence never splits: every chunk's sentences re-split cleanly
    from textextract_ray.functions.text import split_sentences

    for _, r in got.iterrows():
        n = len(split_sentences(pa.array([r["text"]])).to_pylist()[0])
        assert n == r["n_sentences"]
    # only oversize single sentences exceed the cap, and they're flagged
    over = got[got["n_tokens"] > 10]
    assert (over["n_sentences"] == 1).all() and over["truncate"].all()
    assert not got[got["n_tokens"] <= 10]["truncate"].any()


def test_sentence_chunks_layout_invariant(ray_session):
    df = _docs()
    a = _run(df, 8)
    b = _run(df.sample(frac=1.0, random_state=3).reset_index(drop=True), 8,
             repartition=3)
    pd.testing.assert_frame_equal(a, b)
