"""End-to-end RAG corpus-preparation recipe over the public surfaces:

  documents → sentence-boundary chunks → deterministic embeddings
  → disk-backed IVF vector index → vector search → hybrid (BM25+RRF)

Pins that the stack composes: chunk ids thread through the index,
retrieval returns the planted-topic chunks, and the text and vector
indexes agree through hybrid fusion. Same composition-test pattern as
test_release_recipe.py."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

TOPICS = {
    "cook": "recipe flour oven bake sugar butter dough knead yeast simmer",
    "astro": "galaxy telescope orbit nebula photon redshift quasar parsec",
    "law": "statute plaintiff defendant verdict appeal tort clause hearing",
}


def _docs(per_topic=6, sentences=5):
    rows = []
    did = 0
    for topic, vocab in TOPICS.items():
        words = vocab.split()
        rng = np.random.RandomState(zlib.crc32(topic.encode()) % (2**31))
        for _ in range(per_topic):
            sents = []
            for _ in range(sentences):
                toks = [words[rng.randint(0, len(words))] for _ in range(12)]
                sents.append(toks[0].capitalize() + " " + " ".join(toks[1:]) + ".")
            rows.append((did, " ".join(sents), topic))
            did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text", "topic"])


def test_rag_recipe_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.embed import embed_query, embed_text_ds
    from textextract_ray.pipelines.search import build_text_index
    from textextract_ray.pipelines.textops import sentence_chunks_ds
    from textextract_ray.pipelines.vecindex import (
        build_vector_index,
        hybrid_search,
        vector_search,
    )

    docs = _docs()
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))

    # 1. chunk on sentence boundaries (small cap -> several chunks/doc)
    chunks = sentence_chunks_ds(ds.repartition(3), max_tokens=30)
    cdf = chunks.to_pandas()
    assert (cdf.groupby("doc_id")["chunk_idx"].count() > 1).all()
    # a chunk id that is unique and stable: doc_id * 1000 + chunk_idx
    cdf["chunk_id"] = cdf["doc_id"] * 1000 + cdf["chunk_idx"]
    chunk_ds = rd.from_arrow(pa.Table.from_pandas(
        cdf[["chunk_id", "doc_id", "text"]], preserve_index=False
    ))

    # 2. embed chunks (persisted: build re-scans per kmeans pass)
    emb_dir = str(tmp_path / "emb")
    embed_text_ds(chunk_ds, id_col="chunk_id").write_parquet(emb_dir)
    emb = rd.read_parquet(emb_dir)

    # 3. vector index over chunk embeddings
    vix = str(tmp_path / "vix")
    meta = build_vector_index(emb, vix, id_col="chunk_id", n_clusters=6)
    assert meta["n_clusters"] == 6

    # 4. dense retrieval: top chunks for an astro query are astro chunks
    q = "telescope photon redshift"
    hits = vector_search(
        vix,
        {"query_id": np.array([0], dtype=np.int64),
         "mat": embed_query(q)[None, :]},
        k=8, nprobe=6,
    ).to_pandas()
    assert len(hits) == 8
    hit_docs = (hits["vec_id"] // 1000).astype(int)
    topics = docs.set_index("doc_id")["topic"]
    assert (topics.loc[hit_docs] == "astro").all()

    # 5. hybrid: BM25 over the same chunk ids + RRF fusion agrees
    tix = str(tmp_path / "tix")
    build_text_index(
        chunk_ds.map_batches(
            lambda b: b.select(["chunk_id", "text"]).rename_columns(
                ["doc_id", "text"]
            ),
            batch_format="pyarrow",
        ),
        tix,
        num_ranges=8,
    )
    fused = hybrid_search(tix, vix, q, k=5, nprobe=6)
    fdocs = (fused["doc_id"] // 1000).astype(int)
    assert (topics.loc[fdocs] == "astro").all()
    # the winners are ranked by BOTH systems
    assert fused.iloc[0]["bm25_rank"] is not pd.NA
    assert fused.iloc[0]["vec_rank"] is not pd.NA
