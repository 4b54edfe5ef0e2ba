"""Arrow IPC shard sink/source: round-trip (incl. binary and list
columns JSONL can't carry), deterministic content-hash naming /
rewrite idempotency, manifest integrity, and plain-pyarrow
readability of the written shards."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _table(n=200, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"document number {i} body" for i in range(n)]),
            "payload": pa.array([bytes(rng.integers(0, 256, 16, dtype=np.uint8)) for _ in range(n)], pa.binary()),
            "embedding": pa.array(rng.random((n, 4)).astype(np.float32).tolist(), pa.list_(pa.float32())),
        }
    )


def test_arrow_shards_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.arrowshards import (
        read_arrow_shards,
        write_arrow_shards,
    )

    t = _table()
    ds = rd.from_arrow(t).repartition(3)
    out = str(tmp_path / "ipc")
    manifest = write_arrow_shards(ds, out).to_pandas()
    files = sorted(glob.glob(os.path.join(out, "part-*.arrow")))
    assert len(files) == 3
    assert sorted(manifest["path"]) == files
    assert manifest["rows"].sum() == t.num_rows
    for p, b in zip(manifest["path"], manifest["bytes"]):
        assert os.path.getsize(p) == b

    back = (
        read_arrow_shards(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas()
    pd.testing.assert_frame_equal(back, want)

    # plain pyarrow can open a shard directly (interchange contract)
    direct = pa.ipc.open_file(files[0]).read_all()
    assert direct.schema.names == ["doc_id", "text", "payload", "embedding"]


def test_arrow_shards_rewrite_idempotent(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.arrowshards import write_arrow_shards

    t = _table(50, seed=9)
    out = str(tmp_path / "ipc2")
    m1 = write_arrow_shards(rd.from_arrow(t), out).to_pandas()
    m2 = write_arrow_shards(rd.from_arrow(t), out).to_pandas()
    assert sorted(m1["path"]) == sorted(m2["path"])  # same content -> same names
    assert len(glob.glob(os.path.join(out, "part-*.arrow"))) == len(m1)
    assert not glob.glob(os.path.join(out, "*.tmp"))


def test_arrow_shards_empty_dir_raises(tmp_path):
    import pytest

    from textextract_ray.pipelines.arrowshards import read_arrow_shards

    with pytest.raises(ValueError):
        read_arrow_shards(str(tmp_path))
