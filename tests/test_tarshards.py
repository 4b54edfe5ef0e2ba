"""WebDataset-style tar shards: round-trip (binary/txt/json members),
plain-tarfile readability, deterministic archive bytes across block
layouts, key validation, and composition with the image feature
stage."""

from __future__ import annotations

import glob
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _samples(n=60, seed=0):
    from textextract_ray.png import png_encode

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, (6, 5), dtype=np.uint8)
        rows.append(
            {
                "sample_id": np.int64(i),
                "media": png_encode(px),
                "caption": f"a synthetic image number {i}",
                "meta": json.dumps({"w": 5, "h": 6, "idx": i}),
            }
        )
    return pd.DataFrame(rows)


def _ds(df, parts=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


COLS = {"media": "png", "caption": "txt", "meta": "json"}


def test_roundtrip_and_plain_tarfile(ray_session, tmp_path):
    from textextract_ray.pipelines.tarshards import (
        read_tar_shards,
        write_tar_shards,
    )

    df = _samples()
    out = str(tmp_path / "wds")
    man = write_tar_shards(
        _ds(df, 5), out, key_col="sample_id", columns=COLS, num_shards=4
    )
    assert len(man) <= 4 and man["n_samples"].sum() == len(df)
    assert man["n_members"].sum() == 3 * len(df)
    assert not os.path.exists(out + "._stage")

    # a plain tarfile consumer sees grouped members in key order
    tars = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert tars
    with tarfile.open(tars[0]) as tf:
        names = tf.getnames()
    keys = [n.split(".")[0] for n in names]
    assert keys == sorted(keys)
    assert {n.split(".", 1)[1] for n in names} == {"png", "txt", "json"}

    back = read_tar_shards(out).to_pandas()
    assert len(back) == len(df)
    back["sample_id"] = back["__key__"].astype(np.int64)
    back = back.sort_values("sample_id").reset_index(drop=True)
    for r, want in zip(back.itertuples(), df.itertuples()):
        assert bytes(r.media) == want.media
        assert r.caption == want.caption
        assert r.meta == want.meta  # json round-trips the string value


def test_layout_invariant_archive_bytes(ray_session, tmp_path):
    from textextract_ray.pipelines.tarshards import write_tar_shards

    df = _samples(40, seed=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(_ds(df, 2), a, key_col="sample_id", columns=COLS,
                     num_shards=3)
    write_tar_shards(
        _ds(df.sample(frac=1.0, random_state=5), 7), b,
        key_col="sample_id", columns=COLS, num_shards=3,
    )
    for name in sorted(os.listdir(a)):
        if name.endswith(".tar"):
            assert (
                open(os.path.join(a, name), "rb").read()
                == open(os.path.join(b, name), "rb").read()
            ), name


def test_key_validation(ray_session, tmp_path):
    from textextract_ray.pipelines.tarshards import write_tar_shards

    bad = pd.DataFrame({"k": ["a.b"], "caption": ["x"]})
    with pytest.raises(Exception, match="dot-free"):
        write_tar_shards(
            _ds(bad), str(tmp_path / "x"), key_col="k",
            columns={"caption": "txt"}, num_shards=1,
        )
    dup = pd.DataFrame({"k": ["a", "a"], "caption": ["x", "y"]})
    with pytest.raises(Exception, match="duplicate"):
        write_tar_shards(
            _ds(dup), str(tmp_path / "y"), key_col="k",
            columns={"caption": "txt"}, num_shards=1,
        )
    with pytest.raises(ValueError, match="columns"):
        write_tar_shards(_ds(bad), str(tmp_path / "z"), key_col="k",
                         columns={})


def test_compose_with_image_features(ray_session, tmp_path):
    """tar shards feed the multimodal actor stage: read back -> rename
    -> ImageFeatures runs on the decoded payloads."""
    from textextract_ray.pipelines.tarshards import (
        read_tar_shards,
        write_tar_shards,
    )
    from textextract_ray.stages.multimodal import ImageFeatures

    df = _samples(20, seed=3)
    out = str(tmp_path / "wds2")
    write_tar_shards(_ds(df, 2), out, key_col="sample_id", columns=COLS,
                     num_shards=2)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["__key__"].cast(pa.int64()),
                "media": batch["media"],
            }
        )

    feats = (
        read_tar_shards(out)
        .map_batches(rename, batch_format="pyarrow")
        .map_batches(ImageFeatures, concurrency=1, batch_size=16,
                     batch_format="pyarrow")
        .to_pandas()
    )
    assert len(feats) == len(df)
