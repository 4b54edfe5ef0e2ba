"""dense_rank_ds + assign_shards_ds: pandas dense-rank parity on
sparse/duplicated keys, layout invariance, composition with the bin
packer's sparse bin ids, shard balance, and hive-partitioned reader
pruning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.pipelines.sharding import assign_shards_ds, dense_rank_ds


def _ds(df, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts else ds


def _sparse_frame(n=500, seed=3):
    rng = np.random.RandomState(seed)
    # sparse, duplicated, snowflake-scale keys (incl. the packer's
    # bucket<<32 shape)
    keys = rng.choice(
        np.concatenate(
            [
                rng.randint(0, 50, 20).astype(np.int64),
                (rng.randint(0, 40, 20).astype(np.int64) << 32)
                | rng.randint(0, 5, 20),
            ]
        ),
        n,
    )
    return pd.DataFrame({"bin_id": keys, "v": np.arange(n, dtype=np.int64)})


def test_dense_rank_matches_pandas(ray_session):
    df = _sparse_frame()
    got = (
        dense_rank_ds(_ds(df, 7), "bin_id")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = (df["bin_id"].rank(method="dense").astype(np.int64) - 1).to_numpy()
    assert got["dense_id"].to_numpy().tolist() == want.tolist()
    # dense: contiguous 0..n_distinct-1, order-preserving
    assert set(got["dense_id"]) == set(range(df["bin_id"].nunique()))


def test_dense_rank_layout_invariance(ray_session):
    df = _sparse_frame(seed=11)
    a = dense_rank_ds(_ds(df, 2), "bin_id").to_pandas().sort_values("v")
    b = dense_rank_ds(_ds(df, 13), "bin_id").to_pandas().sort_values("v")
    assert a["dense_id"].tolist() == b["dense_id"].tolist()


def test_dense_rank_empty(ray_session):
    empty = pd.DataFrame({"bin_id": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})
    assert dense_rank_ds(_ds(empty), "bin_id").count() == 0


def test_packer_composition_and_shard_balance(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.textops import pack_bins_ds

    rng = np.random.RandomState(5)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64) * 977,  # sparse ids
            "text": [" ".join(["w"] * rng.randint(1, 40)) for _ in range(400)],
        }
    )
    packed = pack_bins_ds(rd.from_pandas(docs).repartition(5), capacity=64)
    dense = dense_rank_ds(packed, "bin_id")
    world = 4
    sharded = assign_shards_ds(dense, world)
    out = sharded.to_pandas()
    n_bins = out["bin_id"].nunique()
    assert set(out["dense_id"]) == set(range(n_bins))
    # same bin -> same dense id -> same shard (a bin never splits)
    per_bin = out.groupby("bin_id")[["dense_id", "shard"]].nunique()
    assert (per_bin == 1).all().all()
    # strided balance: shard id counts within ±1
    ids_per_shard = out.drop_duplicates("dense_id")["shard"].value_counts()
    assert ids_per_shard.max() - ids_per_shard.min() <= 1
    assert set(out["shard"]) == set(range(world))

    # hive-partitioned write -> a rank reads ONLY its directory
    d = str(tmp_path / "shards")
    sharded.write_parquet(d, partition_cols=["shard"])
    import glob

    dirs = sorted(glob.glob(d + "/shard=*"))
    assert len(dirs) == world
    one = rd.read_parquet(dirs[0]).to_pandas()
    assert set(one["dense_id"]) == set(
        out[out["shard"] == out["shard"].min()]["dense_id"]
    )


def test_assign_shards_contract(ray_session):
    df = pd.DataFrame({"dense_id": np.arange(10, dtype=np.int64)})
    with pytest.raises(ValueError, match="world_size"):
        assign_shards_ds(_ds(df), 0)
    got = assign_shards_ds(_ds(df), 3).to_pandas()
    assert got["shard"].tolist() == [i % 3 for i in range(10)]
