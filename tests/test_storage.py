"""Storage-layout operators: shard compaction (content-preserving,
streaming, deterministic grouping) and key-range clustered write with
manifest-pruned reads."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _frame(n=5000):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "host": [f"h{i % 97}.com" for i in range(n)],
            "text": [f"document body {i}" for i in range(n)],
        }
    )


@pytest.fixture()
def small_shards(ray_session, tmp_path):
    import ray.data as rd

    df = _frame()
    rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        40
    ).write_parquet(str(tmp_path / "small"))
    return df, str(tmp_path / "small")


def test_compact_preserves_content_and_reduces_files(small_shards, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.storage import compact_shards

    df, small = small_shards
    out = str(tmp_path / "compact")
    man = compact_shards(small, out, target_mb=1)

    n_in = len(glob.glob(os.path.join(small, "*.parquet")))
    n_out = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_out < n_in and n_out == len(man)
    assert man["rows"].sum() == len(df)
    back = (
        rd.read_parquet(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)
    # committed manifest matches the returned one
    meta = json.load(open(os.path.join(out, "_compaction.json")))
    assert [m["rows"] for m in meta] == man["rows"].tolist()
    # files respect the target: every output well under 1 MB + slack
    for f in glob.glob(os.path.join(out, "*.parquet")):
        assert os.path.getsize(f) < (1 << 20) * 2


def test_compact_deterministic_and_schema_guard(small_shards, tmp_path):
    from textextract_ray.pipelines.storage import compact_shards

    df, small = small_shards
    m1 = compact_shards(small, str(tmp_path / "c1"), target_mb=1)
    m2 = compact_shards(small, str(tmp_path / "c2"), target_mb=1)
    assert m1["rows"].tolist() == m2["rows"].tolist()
    assert m1["inputs"].tolist() == m2["inputs"].tolist()

    # a shard with a different schema fails loudly, not silently
    alien = pd.DataFrame({"other": [1, 2, 3]})
    pq.write_table(
        pa.Table.from_pandas(alien, preserve_index=False),
        os.path.join(small, "zz-alien.parquet"),
    )
    with pytest.raises(Exception, match="schema"):
        compact_shards(small, str(tmp_path / "c3"), target_mb=1)

    with pytest.raises(ValueError, match="no parquet"):
        compact_shards(str(tmp_path / "emptydir_nope"), str(tmp_path / "c4"))


def test_clustered_write_prunes_reads(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.storage import (
        read_clustered,
        write_clustered,
    )

    df = _frame()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    out = str(tmp_path / "clustered")
    man = write_clustered(ds, out, "doc_id", num_ranges=8)
    assert len(man) > 1  # boundaries actually split the space

    got = (
        read_clustered(out, lo=1000, hi=1500)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = df[(df["doc_id"] >= 1000) & (df["doc_id"] < 1500)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    read_n, total_n = read_clustered.last_pruning
    assert read_n < total_n  # the manifest actually pruned directories

    # unbounded read returns everything
    assert read_clustered(out).count() == len(df)
    # half-open bounds: lo only / hi only
    lo_only = read_clustered(out, lo=4900).to_pandas()
    assert sorted(lo_only["doc_id"]) == list(range(4900, 5000))
    hi_only = read_clustered(out, hi=100).to_pandas()
    assert sorted(hi_only["doc_id"]) == list(range(0, 100))


def test_clustered_string_keys_and_nulls(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.storage import (
        read_clustered,
        write_clustered,
    )

    df = _frame(2000)
    df.loc[::100, "host"] = None  # null keys land in range 0, excluded by bounds
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = str(tmp_path / "byhost")
    write_clustered(ds, out, "host", num_ranges=6)

    got = read_clustered(out, lo="h20.com", hi="h40.com").to_pandas()
    want = df[(df["host"] >= "h20.com") & (df["host"] < "h40.com")]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert got["host"].notna().all()

    # full read keeps the null-key rows
    assert read_clustered(out).count() == len(df)


def test_bloom_index_prunes_point_lookups(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.pipelines.storage import (
        read_bloom_indexed,
        write_bloom_index,
    )

    df = _frame(8000)
    layout = str(tmp_path / "plain")
    # un-clustered layout: doc_ids scattered across 32 shards
    rd.from_arrow(
        pa.Table.from_pandas(
            df.sample(frac=1.0, random_state=7), preserve_index=False
        )
    ).repartition(32).write_parquet(layout)

    man = write_bloom_index(layout, "doc_id", fpr=0.001)
    assert len(man) == len(glob.glob(os.path.join(layout, "*.parquet")))
    assert man["n_keys"].sum() == len(df)
    # sidecars exist next to every shard
    assert len(glob.glob(os.path.join(layout, "*.parquet.doc_id.bloom"))) == len(man)

    keys = [17, 4242, 7999]
    got = read_bloom_indexed(layout, keys).to_pandas().sort_values("doc_id")
    want = df[df["doc_id"].isin(keys)].sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    read_n, total_n = read_bloom_indexed.last_pruning
    # 3 keys in 32 shards at fpr 1e-3: expect a handful of shards opened
    assert 1 <= read_n <= 6 and total_n == 32

    # absent keys: every shard pruned, empty exact result
    assert read_bloom_indexed(layout, [123456789]).count() == 0
    assert read_bloom_indexed.last_pruning[0] <= 1  # at most an FP shard

    # string key column: second index coexists with the first
    man2 = write_bloom_index(layout, "host", fpr=0.01)
    assert (man2["n_keys"] > 0).all()
    got2 = read_bloom_indexed(layout, ["h13.com"], key_col="host").to_pandas()
    assert len(got2) == len(df[df["host"] == "h13.com"])
    # ambiguous: two indexes present and no key_col given
    with pytest.raises(ValueError, match="indexes"):
        read_bloom_indexed(layout, [1])


def test_clustered_layout_invariance(ray_session, tmp_path):
    """Boundaries come from the layout-invariant hash sample: the same
    rows in a different block layout produce the same manifest."""
    import ray.data as rd

    from textextract_ray.pipelines.storage import write_clustered

    df = _frame(3000)
    a = write_clustered(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        str(tmp_path / "a"),
        "doc_id",
        num_ranges=8,
    )
    b = write_clustered(
        rd.from_arrow(
            pa.Table.from_pandas(
                df.sample(frac=1.0, random_state=3), preserve_index=False
            )
        ).repartition(11),
        str(tmp_path / "b"),
        "doc_id",
        num_ranges=8,
    )
    assert a["lower_bound"].iloc[0] is None or np.isnan(a["lower_bound"].iloc[0])
    assert a["lower_bound"].tolist()[1:] == b["lower_bound"].tolist()[1:]
