"""Multimodal stage plumbing: schemas, batch flow, stub semantics."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data as rd

    rows = [
        {"media_id": 0, "media": b"\x89PNG\r\n\x1a\n" + b"x" * 100, "media_type": "image"},
        {"media_id": 1, "media": b"\xff\xd8\xff" + b"y" * 50, "media_type": "image"},
        {"media_id": 2, "media": b"not an image at all", "media_type": "image"},
        {"media_id": 3, "media": b"GIF89a" + b"z" * 10, "media_type": "image"},
    ]
    return rd.from_items(rows)


def test_decode_images_stub(media_ds):
    from textextract_ray.stages.multimodal import decode_images

    df = decode_images(media_ds).to_pandas().sort_values("media_id")
    assert list(df["format"]) == ["png", "jpeg", "unknown", "gif"]
    assert list(df["status"]) == ["ok", "ok", "unsupported", "ok"]
    # deterministic fake dims from byte length
    n0 = 108
    assert df["width"].iloc[0] == (n0 * 7) % 1024 + 16
    assert df["n_bytes"].iloc[0] == n0


def test_decode_strict_raises(ray_session, media_ds):
    import ray

    from textextract_ray.stages.multimodal import decode_images

    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        decode_images(media_ds, strict=True).to_pandas()


def test_features_deterministic(media_ds):
    from textextract_ray.stages.multimodal import extract_features

    a = extract_features(media_ds).to_pandas().sort_values("media_id")
    b = extract_features(media_ds.repartition(3)).to_pandas().sort_values("media_id")
    for va, vb in zip(a["embedding"], b["embedding"]):
        assert list(va) == list(vb)
        assert len(va) == 8


def test_frame_sample_flatmap(media_ds):
    from textextract_ray.stages.multimodal import sample_frames

    df = sample_frames(media_ds, n_frames=4).to_pandas()
    assert len(df) == 16  # 4 media x 4 frames
    assert set(df["frame_index"]) == {0, 1, 2, 3}
    assert (df["frame"].str.len() > 0).all()
