"""Indexed binary token shards: round-trip, determinism across block
layouts, dtype handling, checksum verification, and composition with
the BPE tokenizer."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _token_frame(n_docs=400, seed=7):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, 60, n_docs)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "ids": [
                rng.integers(0, 50_000, k).astype(np.int32).tolist()
                for k in lens
            ],
            "order": rng.permutation(n_docs).astype(np.int64),
        }
    )


def _to_ds(df, parts=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def test_roundtrip_and_order(ray_session, tmp_path):
    from textextract_ray.pipelines.binshards import (
        load_shard,
        read_token_shards,
        write_token_shards,
    )

    df = _token_frame()
    out = str(tmp_path / "shards")
    man = write_token_shards(
        _to_ds(df, 7), out, num_shards=4, order_col="order"
    )
    assert len(man) == 4
    assert man["n_docs"].sum() == len(df)
    assert man["n_tokens"].sum() == sum(len(x) for x in df["ids"])
    # staging directory cleaned up; bin+idx+manifest remain
    assert not os.path.exists(out + "._stage")
    assert len(glob.glob(os.path.join(out, "*.bin"))) == 4
    assert len(glob.glob(os.path.join(out, "*.idx"))) == 4

    # contiguous curriculum ranges: shard 0 holds the lowest order keys
    ids0, off0, tok0 = load_shard(out, man["bin"].iloc[0], verify=True)
    by_order = df.sort_values(["order", "doc_id"])
    want0 = by_order.head(len(ids0))
    assert ids0.tolist() == want0["doc_id"].tolist()
    # first doc's tokens are exactly its slice of the flat stream
    first = want0.iloc[0]
    assert tok0[off0[0] : off0[1]].tolist() == first["ids"]

    back = read_token_shards(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == sorted(df["doc_id"])
    got = {r.doc_id: list(r.ids) for r in back.itertuples()}
    for r in df.itertuples():
        assert got[r.doc_id] == r.ids
    assert back["n_tokens"].sum() == man["n_tokens"].sum()


def test_layout_invariance_byte_identical(ray_session, tmp_path):
    from textextract_ray.pipelines.binshards import write_token_shards

    df = _token_frame(300, seed=3)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_token_shards(_to_ds(df, 3), a, num_shards=3, order_col="order")
    shuf = df.sample(frac=1.0, random_state=11)
    write_token_shards(_to_ds(shuf, 9), b, num_shards=3, order_col="order")
    for name in sorted(os.listdir(a)):
        if name.endswith((".bin", ".idx")):
            with open(os.path.join(a, name), "rb") as fa, open(
                os.path.join(b, name), "rb"
            ) as fb:
                assert fa.read() == fb.read(), name


def test_uint16_and_range_guard(ray_session, tmp_path):
    from textextract_ray.pipelines.binshards import (
        load_shard,
        write_token_shards,
    )

    df = _token_frame(100, seed=5)
    small = df.copy()
    small["ids"] = [[v % 60000 for v in x] for x in df["ids"]]
    out = str(tmp_path / "u16")
    man = write_token_shards(_to_ds(small), out, num_shards=2, dtype="uint16")
    _ids, _off, tok = load_shard(out, man["bin"].iloc[0], verify=True)
    assert tok.dtype == np.dtype("<u2")
    # bin bytes = 2 per token
    sizes = {r["bin"]: r["n_tokens"] for r in man.to_dict("records")}
    for b, n in sizes.items():
        assert os.path.getsize(os.path.join(out, b)) == 2 * n

    big = df.copy()
    big.loc[0, "ids"] = [70000]
    with pytest.raises(Exception, match="uint16"):
        write_token_shards(_to_ds(big), str(tmp_path / "bad"), num_shards=1,
                           dtype="uint16")
    with pytest.raises(ValueError, match="dtype"):
        write_token_shards(_to_ds(df), str(tmp_path / "bad2"), dtype="float32")


def test_checksum_detects_corruption(ray_session, tmp_path):
    from textextract_ray.pipelines.binshards import (
        load_shard,
        write_token_shards,
    )

    df = _token_frame(50, seed=9)
    out = str(tmp_path / "c")
    man = write_token_shards(_to_ds(df), out, num_shards=1)
    binf = os.path.join(out, man["bin"].iloc[0])
    raw = bytearray(open(binf, "rb").read())
    raw[4] ^= 0xFF
    open(binf, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        load_shard(out, man["bin"].iloc[0], verify=True)


def test_compose_with_bpe_tokenizer(ray_session, tmp_path):
    """documents → train BPE → tokenize → binary shards → read-back
    token counts match the tokenizer's own."""
    from textextract_ray.pipelines.binshards import (
        read_token_shards,
        write_token_shards,
    )
    from textextract_ray.pipelines.textops import (
        bpe_encode_corpus_ds,
        train_bpe,
    )
    from textextract_ray.pipelines.relational import read_table

    sf = "/root/testdata/sf0.001"
    merges = train_bpe(sf)
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    toks = bpe_encode_corpus_ds(docs, merges)
    want = toks.to_pandas().sort_values("doc_id").reset_index(drop=True)

    out = str(tmp_path / "bpe_shards")
    man = write_token_shards(toks, out, num_shards=3)
    assert man["n_tokens"].sum() == want["n_tokens"].sum()
    back = (
        read_token_shards(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["n_tokens"].tolist() == want["n_tokens"].tolist()
    got = {r.doc_id: list(r.ids) for r in back.itertuples()}
    for r in want.itertuples():
        assert got[r.doc_id] == list(r.ids)
    meta = json.load(open(os.path.join(out, "_binshards.json")))
    assert meta["dtype"] == "int32" and len(meta["shards"]) == 3
