"""Deterministic text embedder + cluster-topic labeling.

Pins: (1) the embedding kernel against an independent numpy oracle
built straight from the published construction (hashed n-gram ids →
splitmix64-bit signs → sum → L2); (2) unit-norm/zero-vector contracts;
(3) batch-composition and Dataset-layout independence; (4) honest
lexical geometry (shared vocab ⇒ higher cosine); (5) end-to-end
retrieval through the existing ANN stack; (6) cluster_topics labels
recover planted topics and are layout-stable.
"""

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from textextract_ray.functions.scalar import _splitmix64
from textextract_ray.functions.text import batch_shingle_hashes
from textextract_ray.pipelines.embed import (
    _GOLDEN,
    _PROJ_SEED,
    cluster_topics,
    embed_batch,
    embed_query,
    embed_text_ds,
)

TOPICS = {
    "cook": "recipe flour oven bake sugar butter dough knead yeast simmer",
    "astro": "galaxy telescope orbit nebula photon redshift quasar parsec",
    "law": "statute plaintiff defendant verdict appeal tort clause hearing",
}


def _topic_docs(topic: str, n: int, words=24):
    vocab = TOPICS[topic].split()
    rng = np.random.RandomState(zlib.crc32(topic.encode()) % (2**31))
    return [
        " ".join(vocab[rng.randint(0, len(vocab))] for _ in range(words))
        for _ in range(n)
    ]


def _oracle_embed(text: str, dim: int, ngrams=(1, 2)) -> np.ndarray:
    """Independent re-derivation: per-occurrence sign rows from the
    hash bits, summed, L2-normalized."""
    occ = []
    for k in ngrams:
        occ.extend(batch_shingle_hashes([text], k=k)[0].tolist())
    v = np.zeros(dim, dtype=np.float64)
    n_words = (dim + 63) // 64
    mask = (1 << 64) - 1
    for h in occ:
        bits = []
        for w in range(n_words):
            mix = np.uint64((_PROJ_SEED + w * _GOLDEN) & mask)
            hw = int(_splitmix64(np.uint64(h) ^ mix))
            bits.extend((hw >> j) & 1 for j in range(64))
        row = np.array(bits[:dim], dtype=np.float64) * 2 - 1
        v += row
    nrm = np.linalg.norm(v)
    return (v / nrm if nrm else v).astype(np.float32)


def test_embed_matches_oracle():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one",
        "",
        "   ",
        _topic_docs("cook", 1, words=60)[0],
    ]
    for dim in (64, 128, 96):  # one word, two words, ragged tail
        got = embed_batch(texts, dim=dim)
        assert got.shape == (len(texts), dim) and got.dtype == np.float32
        for i, t in enumerate(texts):
            np.testing.assert_allclose(got[i], _oracle_embed(t, dim),
                                       rtol=0, atol=1e-6)


def test_embed_contracts():
    texts = ["alpha beta gamma", "", "delta"]
    m = embed_batch(texts, dim=64)
    norms = np.linalg.norm(m, axis=1)
    assert norms[0] == pytest.approx(1.0, abs=1e-6)
    assert norms[1] == 0.0  # empty doc → zero vector
    # batch-composition independence: alone vs mixed, byte-identical
    solo = embed_batch(["delta"], dim=64)[0]
    np.testing.assert_array_equal(m[2], solo)
    np.testing.assert_array_equal(embed_query("delta"), solo)
    with pytest.raises(ValueError):
        embed_batch(["x"], dim=0)


def test_embed_lexical_geometry():
    cook = embed_batch(_topic_docs("cook", 8), dim=64)
    astro = embed_batch(_topic_docs("astro", 8), dim=64)
    within = (cook @ cook.T)[np.triu_indices(8, 1)].mean()
    across = (cook @ astro.T).mean()
    assert within > across + 0.3


def test_embed_ds_layout_independence(ray_session):
    docs = _topic_docs("cook", 30) + _topic_docs("law", 30)
    ids = list(range(60))
    tbl = pa.table({"doc_id": ids, "text": docs, "lang": ["en"] * 60})

    def run(blocks):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = embed_text_ds(ds, keep_cols=("lang",)).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return out

    a, b = run(1), run(7)
    assert list(a.columns) == ["doc_id", "lang", "embedding"]
    assert a["lang"].eq("en").all()
    ma = np.array(a["embedding"].tolist())
    mb = np.array(b["embedding"].tolist())
    np.testing.assert_array_equal(ma, mb)
    np.testing.assert_allclose(ma, embed_batch(docs, dim=64), atol=1e-6)


def test_retrieval_through_ann_stack(ray_session):
    """embed → brute_force_topk: a query in topic vocabulary retrieves
    only docs of that topic."""
    from textextract_ray.stages.similarity import brute_force_topk

    docs, labels = [], []
    for t in TOPICS:
        d = _topic_docs(t, 20)
        docs.extend(d)
        labels.extend([t] * 20)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": list(range(len(docs))), "text": docs})
    ).repartition(5)
    emb = embed_text_ds(ds, id_col="vec_id")
    q = {"query_id": np.array([0], dtype=np.int64),
         "mat": embed_query("telescope orbit photon galaxy")[None, :]}
    hits = brute_force_topk(emb, q, k=10).to_pandas()
    hit_ids = hits.sort_values("score", ascending=False)["vec_id"].tolist()
    assert len(hit_ids) == 10
    assert all(labels[i] == "astro" for i in hit_ids)


def test_cluster_topics_recovers_planted_topics(ray_session):
    docs, ids = [], []
    for t in ("cook", "astro"):
        d = _topic_docs(t, 40)
        docs.extend(d)
    ids = list(range(len(docs)))
    tbl = pa.table({"doc_id": ids, "text": docs})

    def run(blocks):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        return cluster_topics(ds, n_clusters=2, top_k=5, min_count=3, seed=13)

    out = run(4)
    assert set(out.columns) == {"cluster", "term", "count", "share", "lift"}
    assert out["cluster"].nunique() == 2
    assert (out.groupby("cluster").size() <= 5).all()
    # each cluster's label terms come from exactly one topic vocabulary
    vocabs = {t: set(TOPICS[t].split()) for t in ("cook", "astro")}
    seen_topics = set()
    for cl, grp in out.groupby("cluster"):
        terms = set(grp["term"])
        owners = {t for t, v in vocabs.items() if terms <= v}
        assert len(owners) == 1, f"cluster {cl} mixes topics: {terms}"
        seen_topics |= owners
        assert (grp["lift"] >= 1.0).all()  # distinctive terms over-index
    assert seen_topics == {"cook", "astro"}
    # layout invariance (same centroids: init sample is hash-based)
    out2 = run(9)
    a = out.sort_values(["cluster", "term"]).reset_index(drop=True)
    b = out2.sort_values(["cluster", "term"]).reset_index(drop=True)
    # cluster ids may permute across layouts only if kmeans init did —
    # it must not (hash-bottom-k sample): require exact equality
    assert a.equals(b)


def test_cluster_topics_empty_corpus(ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "text": pa.array([], pa.string())}))
    with pytest.raises(Exception):
        # kmeans over an empty corpus cannot produce centroids; the
        # failure must be loud, not a silent empty frame
        cluster_topics(ds, n_clusters=2)


def test_semantic_decontaminate_flags_paraphrases(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.embed import semantic_decontaminate_against

    bench = [
        "what is the capital city of france and when was it founded",
        "solve the integral of x squared between zero and one",
    ]
    # corpus: a word-order paraphrase (few shared 5-grams, same bag of
    # words), a verbatim copy, and unrelated text
    corpus = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "when was it founded and what is the capital city of france",
                bench[1],
                "entirely unrelated document about marine biology and kelp",
                "",
            ],
        }
    )
    out = (
        semantic_decontaminate_against(
            rd.from_pandas(corpus),
            rd.from_pandas(pd.DataFrame({"text": bench})),
            threshold=0.8,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bool(out.loc[0, "contaminated"]) and out.loc[0, "bench_idx"] == 0
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "max_cosine"] == 1.0
    assert not out.loc[2, "contaminated"]
    assert not out.loc[3, "contaminated"] and out.loc[3, "bench_idx"] == -1

    # layout independence: same verdicts from a different partitioning
    out2 = (
        semantic_decontaminate_against(
            rd.from_pandas(corpus).repartition(4),
            rd.from_pandas(pd.DataFrame({"text": bench})).repartition(2),
            threshold=0.8,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_semantic_decontaminate_contracts(ray_session):
    import pytest
    import ray.data as rd

    from textextract_ray.pipelines.embed import semantic_decontaminate_against

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError, match="empty benchmark"):
        semantic_decontaminate_against(
            docs, rd.from_pandas(pd.DataFrame({"text": []}))
        )
    with pytest.raises(ValueError, match="max_bench_rows"):
        semantic_decontaminate_against(
            docs,
            rd.from_pandas(pd.DataFrame({"text": ["a", "b", "c"]})),
            max_bench_rows=2,
        )


def test_semantic_decontaminate_single_bench_execution(ray_session, tmp_path):
    """ADVICE r4: the bench pipeline must execute ONCE (one pull with a
    budget-checked limit), not count()+to_pandas() twice — double
    execution doubles upstream cost and can drift the documented
    bench_idx scan-order audit pointer."""
    import os

    import ray.data as rd

    from textextract_ray.pipelines.embed import semantic_decontaminate_against

    marker_dir = str(tmp_path / "exec_markers")
    os.makedirs(marker_dir, exist_ok=True)

    def marked(batch):
        import uuid

        open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
        return batch

    bench = rd.from_items(
        [{"text": f"benchmark question {i}"} for i in range(8)]
    ).repartition(1).map_batches(marked)
    corpus = rd.from_items(
        [{"doc_id": i, "text": f"corpus doc {i}"} for i in range(10)]
    )
    out = semantic_decontaminate_against(corpus, bench).to_pandas()
    assert len(out) == 10
    assert len(os.listdir(marker_dir)) == 1  # exactly one bench execution
