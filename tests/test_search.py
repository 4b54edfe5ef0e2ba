"""Inverted index + BM25: brute-force oracle parity, clustered-read
pruning, determinism, analyzer agreement, edge cases."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _toks(t):
    return [w for w in re.split(r"[^a-z]+", (t or "").lower()) if w]


def _corpus(n=120):
    rng = np.random.RandomState(3)
    vocab = ("ray data engine shuffle actor parquet corpus dedup token "
             "quality web crawl html text index search score rank").split()
    rows = []
    for i in range(n):
        words = [vocab[rng.randint(len(vocab))] for _ in range(rng.randint(5, 40))]
        if i % 10 == 0:
            words += ["zebra", "quagga"]  # rare terms for idf contrast
        rows.append((i, " ".join(words)))
    rows.append((n, ""))          # empty doc
    rows.append((n + 1, "???"))   # token-free doc
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _bm25_oracle(df, query, k=10, k1=1.2, b=0.75):
    docs = {int(r.doc_id): _toks(r.text) for r in df.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = Counter()
    for toks in docs.values():
        dfreq.update(set(toks))
    scores = {}
    for term in sorted(set(_toks(query))):
        if term not in dfreq:
            continue
        idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        for d, toks in docs.items():
            tf = toks.count(term)
            if not tf:
                continue
            dl = len(toks)
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(out, columns=["doc_id", "score"])


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from textextract_ray.pipelines.search import build_text_index

    df = _corpus()
    d = str(tmp_path_factory.mktemp("bm25") / "idx")
    meta = build_text_index(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6),
        d,
        num_ranges=8,
    )
    assert meta["n_docs"] == len(df)
    return df, d


def test_bm25_matches_oracle(index_dir):
    from textextract_ray.pipelines.search import bm25_search

    df, d = index_dir
    for q in ["ray data shuffle", "zebra", "web crawl html index", "score"]:
        got = bm25_search(d, q, k=10)
        want = _bm25_oracle(df, q, k=10)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        np.testing.assert_allclose(got["score"], want["score"], rtol=1e-12)


def test_bm25_pruning_and_edges(index_dir):
    from textextract_ray.pipelines.search import bm25_search
    from textextract_ray.pipelines.storage import read_clustered_keys

    df, d = index_dir
    out = bm25_search(d, "zebra quagga", k=5)
    assert len(out) == 5
    # a 2-term query must NOT open every postings range
    read_n, total_n = read_clustered_keys.last_pruning
    assert total_n > 2 and read_n < total_n

    # unknown / empty queries
    assert bm25_search(d, "xylophonic").empty
    assert bm25_search(d, "").empty
    assert bm25_search(d, "???").empty

    # repeated query terms count once (bag-of-terms OR semantics)
    a = bm25_search(d, "zebra zebra zebra", k=5)
    b = bm25_search(d, "zebra", k=5)
    pd.testing.assert_frame_equal(a, b)


def test_bm25_rare_term_outranks_common(index_dir):
    from textextract_ray.pipelines.search import bm25_search

    df, d = index_dir
    # docs containing the rare zebra must rank above common-only docs
    got = bm25_search(d, "zebra ray", k=12)
    zebra_docs = set(df[df["text"].str.contains("zebra", na=False)]["doc_id"])
    assert set(got.head(5)["doc_id"]).issubset(zebra_docs)
