"""Disk-backed vector index (IVF-on-Parquet) + hybrid RRF search.

Pins: exactness when every cell is probed (nprobe = n_clusters ⇒
byte-parity with brute_force_topk), recall under partial probing,
that the pruned read actually prunes (cells opened < cells total),
index determinism across input layouts, and RRF fusion arithmetic
(including a doc ranked by only one system).
"""

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from textextract_ray.pipelines.embed import embed_query, embed_text_ds
from textextract_ray.pipelines.vecindex import (
    build_vector_index,
    hybrid_search,
    vector_search,
)

TOPICS = {
    "cook": "recipe flour oven bake sugar butter dough knead yeast simmer",
    "astro": "galaxy telescope orbit nebula photon redshift quasar parsec",
    "law": "statute plaintiff defendant verdict appeal tort clause hearing",
    "sail": "halyard jib spinnaker keel rudder tack mooring regatta",
}


def _corpus():
    docs, labels = [], []
    for t, vocab in TOPICS.items():
        words = vocab.split()
        rng = np.random.RandomState(zlib.crc32(t.encode()) % (2**31))
        for _ in range(25):
            docs.append(" ".join(words[rng.randint(0, len(words))]
                                 for _ in range(24)))
            labels.append(t)
    return docs, labels


def _emb_ds(docs, blocks=5):
    tbl = pa.table({"vec_id": list(range(len(docs))), "text": docs})
    return embed_text_ds(
        ray.data.from_arrow(tbl).repartition(blocks), id_col="vec_id"
    )


def _queries(texts):
    return {
        "query_id": np.arange(len(texts), dtype=np.int64),
        "mat": np.stack([embed_query(t) for t in texts]),
    }


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    docs, labels = _corpus()
    d = str(tmp_path_factory.mktemp("vecidx") / "idx")
    meta = build_vector_index(_emb_ds(docs), d, n_clusters=8, seed=13)
    assert meta["dim"] == 64 and meta["n_clusters"] == 8
    return d, docs, labels


def test_full_probe_matches_brute_force(index_dir):
    from textextract_ray.stages.similarity import brute_force_topk

    d, docs, labels = index_dir
    q = _queries(["telescope orbit photon", "halyard spinnaker keel tack"])
    got = vector_search(d, q, k=10, nprobe=8).to_pandas()
    want = brute_force_topk(_emb_ds(docs), q, k=10).to_pandas()
    key = ["query_id", "vec_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key], want[key])
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_partial_probe_prunes_and_recalls(index_dir):
    d, docs, labels = index_dir
    q = _queries(["statute verdict appeal clause"])
    st: dict = {}
    hits = vector_search(d, q, k=10, nprobe=2, stats=st).to_pandas()
    opened, total = st["cells_read"], st["cells_total"]
    assert (opened, total) == vector_search.last_pruning
    assert opened <= 2 < total == 8
    assert len(hits) == 10
    # a same-topic query must land in same-topic cells
    assert all(labels[i] == "law" for i in hits["vec_id"])


def test_index_layout_determinism(ray_session, tmp_path):
    docs, _ = _corpus()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_vector_index(_emb_ds(docs, blocks=3), a, n_clusters=8, seed=13)
    build_vector_index(_emb_ds(docs, blocks=11), b, n_clusters=8, seed=13)

    def snapshot(idx):
        import glob

        import pyarrow.parquet as pq_

        rows = []
        for f in glob.glob(f"{idx}/vectors*/**/*.parquet", recursive=True):
            t = pq_.read_table(f, columns=["vec_id", "cluster"])
            rows.extend(zip(t["vec_id"].to_pylist(), t["cluster"].to_pylist()))
        return sorted(rows)

    assert snapshot(a) == snapshot(b)


def test_query_contracts(index_dir):
    d, docs, labels = index_dir
    with pytest.raises(ValueError, match="dim"):
        vector_search(d, {"query_id": np.array([0]),
                          "mat": np.zeros((1, 32))})
    # zero-vector query: cosine 0 everywhere, still returns k rows
    out = vector_search(
        d, {"query_id": np.array([7], dtype=np.int64),
            "mat": np.zeros((1, 64))}, k=5, nprobe=8,
    ).to_pandas()
    assert len(out) == 5 and (out["score"] == 0.0).all()


def test_hybrid_rrf(index_dir, tmp_path):
    from textextract_ray.pipelines.search import build_text_index

    d, docs, labels = index_dir
    tix = str(tmp_path / "tix")
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    build_text_index(ray.data.from_arrow(tbl).repartition(4), tix,
                     num_ranges=8)
    out = hybrid_search(tix, d, "galaxy redshift quasar nebula", k=10,
                        nprobe=8)
    assert list(out.columns) == ["doc_id", "rrf", "bm25_rank", "vec_rank"]
    # fusion: every returned doc is astro, and the winners are ranked
    # by both systems
    assert all(labels[i] == "astro" for i in out["doc_id"])
    top = out.iloc[0]
    assert top["bm25_rank"] is not pd.NA and top["vec_rank"] is not pd.NA
    # rrf score arithmetic: recompute from the ranks
    for _, r in out.iterrows():
        want = 0.0
        if r["bm25_rank"] is not pd.NA:
            want += 1.0 / (60 + int(r["bm25_rank"]))
        if r["vec_rank"] is not pd.NA:
            want += 1.0 / (60 + int(r["vec_rank"]))
        assert r["rrf"] == pytest.approx(want)
    # descending rrf, deterministic ties
    assert (np.diff(out["rrf"].to_numpy()) <= 1e-12).all()


def test_rebuild_same_dir_no_stale_cells(ray_session, tmp_path):
    # pointer-commit: rebuilding into the SAME index_dir with a smaller
    # corpus and fewer clusters must leave no stale _part files behind
    docs, _ = _corpus()
    d = str(tmp_path / "rebuild")
    build_vector_index(_emb_ds(docs), d, n_clusters=8, seed=13)
    small = docs[:30]
    meta = build_vector_index(_emb_ds(small, blocks=2), d, n_clusters=3, seed=13)
    assert meta["n_clusters"] == 3
    q = _queries(["recipe dough yeast"])
    hits = vector_search(d, q, k=30, nprobe=3).to_pandas()
    # every hit id is from the SMALL corpus, no duplicates from stale dirs
    assert hits["vec_id"].is_unique
    assert hits["vec_id"].max() < len(small)
    import glob as _g

    assert len(_g.glob(d + "/vectors-*")) == 1  # superseded dir removed
