"""JSONL (Dolma-interchange) source/sink: gzip + plain round-trip,
content-hash deterministic shard names (resume idempotency), explicit
schema pinning, directory expansion, binary-column rejection."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=40) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"document {i} with some text content" for i in range(n)],
            "lang": ["en" if i % 2 else "de" for i in range(n)],
        }
    )


def test_jsonl_roundtrip_gzip(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.sources import read_jsonl, write_jsonl

    df = _docs()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = str(tmp_path / "sink")
    manifest = write_jsonl(ds, out).to_pandas()
    assert len(manifest) == 4 and (manifest["rows"].sum()) == 40
    shards = sorted(glob.glob(os.path.join(out, "part-*.jsonl.gz")))
    assert [os.path.basename(p) for p in shards] == sorted(
        os.path.basename(p) for p in manifest["path"]
    )
    back = (
        read_jsonl(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df.astype({"doc_id": "int64"}))


def test_jsonl_plain_and_schema_pin(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.sources import read_jsonl, write_jsonl

    df = _docs(10)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "plain")
    write_jsonl(ds, out, compression="none").to_pandas()
    assert glob.glob(os.path.join(out, "*.jsonl"))
    schema = pa.schema(
        [("doc_id", pa.int32()), ("text", pa.string()), ("lang", pa.string())]
    )
    back = read_jsonl(out, schema=schema)
    assert back.schema().base_schema.field("doc_id").type == pa.int32()
    assert back.count() == 10


def test_jsonl_deterministic_shard_names(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.sources import write_jsonl

    df = _docs(12)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    a = write_jsonl(ds, str(tmp_path / "a")).to_pandas()
    b = write_jsonl(ds, str(tmp_path / "b")).to_pandas()
    assert sorted(os.path.basename(p) for p in a["path"]) == sorted(
        os.path.basename(p) for p in b["path"]
    )
    # re-write into the SAME dir: no duplicate shards appear
    write_jsonl(ds, str(tmp_path / "a")).to_pandas()
    assert len(glob.glob(str(tmp_path / "a" / "*.jsonl.gz"))) == len(a)


def test_jsonl_rejects_binary_columns(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.sources import write_jsonl

    tbl = pa.table({"doc_id": [1], "payload": pa.array([b"\x00"], pa.binary())})
    with pytest.raises(Exception, match="binary"):
        write_jsonl(rd.from_arrow(tbl), str(tmp_path / "bin")).to_pandas()
