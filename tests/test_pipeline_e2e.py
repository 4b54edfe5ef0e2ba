"""Conformance: the Ray pipeline's output is byte-identical per url to
the single-process oracle over the fixture corpus (FIXTURES.md §3), and
row sets match exactly after dedup.
"""

from __future__ import annotations

import pytest

from textextract_ray.datagen import page_row
from textextract_ray.oracle import extract_document


@pytest.fixture(scope="module")
def golden():
    """Oracle outputs for the 200-row corpus, keyed by url (F9 dups
    collapse to one entry — identical bytes, identical result)."""
    exp = {}
    for i in range(200):
        row = page_row(i, 1 << 18)
        if row["url"] not in exp:
            exp[row["url"]] = extract_document(row["html"])
    return exp


@pytest.fixture(scope="module")
def pipeline_df(ray_session, fixture_pages):
    from textextract_ray.pipelines.extract_pipeline import extract_dataset
    from textextract_ray.sources import read_pages

    ds = read_pages(fixture_pages)
    return extract_dataset(ds, giant_threshold=1 << 17).to_pandas()


def test_row_sets_match_exactly(pipeline_df, golden):
    assert set(pipeline_df["url"]) == set(golden)
    assert len(pipeline_df) == len(golden)  # dedup: no double urls


def test_byte_identity_per_url(pipeline_df, golden):
    for _, row in pipeline_df.iterrows():
        exp = golden[row["url"]]
        assert row["extracted_text"] == exp.text, row["url"]
        assert row["status"] == exp.status, row["url"]


def test_spans_identical(pipeline_df, golden):
    for _, row in pipeline_df.iterrows():
        got = [dict(s) for s in row["spans"]]
        assert got == golden[row["url"]].spans, row["url"]


def test_sizes_and_version_recorded(pipeline_df):
    ok = pipeline_df[pipeline_df.status == "ok"]
    assert (ok["request_size_bytes"] > 0).all()
    assert (ok["response_size_bytes"] > 0).all()
    assert (pipeline_df["extractor_version"] == "1.0.0").all()


def test_repartitioning_invariance(ray_session, fixture_pages, golden):
    """Byte-identity must not depend on batch composition: run with a
    different shard order + batch size and compare."""
    from textextract_ray.pipelines.extract_pipeline import extract_dataset
    from textextract_ray.sources import read_pages

    ds = read_pages(list(reversed(fixture_pages))).repartition(7)
    df = extract_dataset(ds, batch_size=17).to_pandas()
    assert set(df["url"]) == set(golden)
    for _, row in df.iterrows():
        assert row["extracted_text"] == golden[row["url"]].text


def test_denylist_filter(ray_session, fixture_pages):
    from textextract_ray.sources import read_pages
    from textextract_ray.stages.validate import denylist_filter

    ds = read_pages(fixture_pages)
    kept = denylist_filter(ds, ["host0.example", "host1.example"]).to_pandas()
    assert len(kept) > 0
    assert not kept["url"].str.contains("host0.example|host1.example").any()


def test_metrics_sink_written(ray_session, fixture_pages, tmp_path):
    import os

    import pyarrow.parquet as pq

    from textextract_ray.pipelines.extract_pipeline import run_job

    out = str(tmp_path / "mjob")
    run_job(fixture_pages, out, shards_per_partition=2, giant_threshold=1 << 17)
    path = os.path.join(out, "_metrics", "counters.parquet")
    assert os.path.exists(path)
    t = pq.read_table(path)
    assert t.num_rows == 2  # 4 shards / 2 per partition
    assert "parse_failures" in t.column_names
