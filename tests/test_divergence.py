"""Corpus distribution divergence (KL / Jensen-Shannon over unigram
token distributions)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from textextract_ray.pipelines.textops import corpus_divergence_ds


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_divergence_matches_numpy_oracle(ray_session):
    rng = np.random.RandomState(4)
    # letter-only tokens: the module's shared tokenizer splits on
    # [^a-z]+, so digit-suffixed synthetic tokens would collapse
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab_a = [f"tok{letters[i]}{letters[i]}" for i in range(26)]
    vocab_c = [f"oth{letters[i]}{letters[i]}" for i in range(26)]
    docs = []
    for g, words, n in [("a", vocab_a, 80), ("b", vocab_a, 80), ("c", vocab_c, 80)]:
        for _ in range(n):
            docs.append({"lang": g, "text": " ".join(rng.choice(words, 12))})
    df = pd.DataFrame(docs)
    out = corpus_divergence_ds(_ds(df), vocab_top=100).set_index(["group_a", "group_b"])

    # numpy oracle over the same support construction
    toks = df.assign(tok=df.text.str.lower().str.split()).explode("tok")
    vocab = sorted(toks.tok.value_counts().sort_values(ascending=False).head(100).index)
    vidx = {t: i for i, t in enumerate(vocab)}
    groups = sorted(df.lang.unique())
    V = len(vocab) + 1
    mat = np.zeros((len(groups), V))
    for g, t in zip(toks.lang, toks.tok):
        mat[groups.index(g), vidx.get(t, V - 1)] += 1
    p = (mat + 0.5) / (mat + 0.5).sum(axis=1, keepdims=True)

    def js(a, b):
        m = 0.5 * (a + b)
        return 0.5 * np.sum(a * np.log(a / m)) + 0.5 * np.sum(b * np.log(b / m))

    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            want = js(p[i], p[j])
            got = out.loc[(groups[i], groups[j]), "js"]
            assert abs(got - want) < 1e-6, (groups[i], groups[j], got, want)
            want_kl = np.sum(p[i] * np.log(p[i] / p[j]))
            assert abs(out.loc[(groups[i], groups[j]), "kl_ab"] - want_kl) < 1e-6

    # geometry: same-distribution pair ≈ 0, disjoint-vocab pair near ln 2
    assert out.loc[("a", "b"), "js"] < 0.02
    assert out.loc[("a", "c"), "js"] > 0.5


def test_divergence_layout_invariance_and_empty(ray_session):
    df = pd.DataFrame(
        {
            "lang": ["x"] * 40 + ["y"] * 40,
            "text": ["alpha beta gamma"] * 40 + ["alpha beta delta"] * 40,
        }
    )
    a = corpus_divergence_ds(_ds(df))
    b = corpus_divergence_ds(_ds(df).repartition(7))
    pd.testing.assert_frame_equal(a, b)
    empty = corpus_divergence_ds(_ds(pd.DataFrame({"lang": [], "text": []})))
    assert len(empty) == 0 and list(empty.columns) == [
        "group_a", "group_b", "kl_ab", "kl_ba", "js",
    ]
