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


def test_host_locality_extraction(ray_session, fixture_pages, golden):
    """Host-locality path: same byte-identical output, plus per-host
    cache hits for every row after a host's first."""
    from textextract_ray.pipelines.extract_pipeline import dedup_by_url
    from textextract_ray.sources import read_pages
    from textextract_ray.stages.extract import extract_pages_host_locality
    from textextract_ray.stages.validate import annotate_batch

    ds = read_pages(fixture_pages).map_batches(annotate_batch, batch_format="pyarrow")
    out = dedup_by_url(extract_pages_host_locality(ds)).to_pandas()
    assert set(out["url"]) == set(golden)
    for _, row in out.iterrows():
        assert row["extracted_text"] == golden[row["url"]].text, row["url"]
    # 200 rows over 20 hosts -> most rows are cache hits
    full = extract_pages_host_locality(
        read_pages(fixture_pages).map_batches(annotate_batch, batch_format="pyarrow")
    ).to_pandas()
    hosts = full["url"].str.extract(r"https://([^/]+)/")[0]
    assert (~full["host_cache_hit"]).sum() == hosts.nunique()


def test_q3_hashjoin_matches_broadcast(ray_session, sf_dir):
    from textextract_ray.pipelines.relational import (
        q3_top_orders,
        q3_top_orders_hashjoin,
    )

    a = q3_top_orders(sf_dir)
    b = q3_top_orders_hashjoin(sf_dir)
    assert a["o_orderkey"].tolist() == b["o_orderkey"].tolist()
    assert (a["revenue"] - b["revenue"]).abs().max() < 1e-6


def test_q3_zero_budget_fully_bucketed_parity(ray_session, sf_dir, monkeypatch):
    """With the broadcast budget forced to 0, BOTH join levels must
    take the bucketed co-partition path (customer keys never pulled to
    the driver) and the answer must match the broadcast plan."""
    import textextract_ray.pipelines.relational as rel

    a = rel.q3_top_orders(sf_dir)
    monkeypatch.setattr(rel, "Q3_BROADCAST_BUDGET_KEYS", 0)
    b = rel.q3_top_orders(sf_dir)
    assert a["o_orderkey"].tolist() == b["o_orderkey"].tolist()
    assert (a["revenue"] - b["revenue"]).abs().max() < 1e-6


def test_pdf_routing_path(ray_session, fixture_pages, golden):
    """PDF rows route to the PdfExtract pool; output stays
    byte-compatible with the default path; strict mode raises."""
    import pytest as _pytest

    from textextract_ray.sources import read_pages
    from textextract_ray.stages.extract import extract_pages_with_pdf_routing

    ds = read_pages(fixture_pages)
    out = extract_pages_with_pdf_routing(ds, concurrency=1).to_pandas()
    assert len(out) == 200  # all rows accounted for (no dedup here)
    merged_status = out.set_index("url")["status"]
    for url, res in golden.items():
        assert merged_status[url] == res.status if not isinstance(
            merged_status[url], object
        ) else res.status in set(out[out.url == url]["status"])

    from textextract_ray.stages.extract import PdfExtract

    import pyarrow as pa

    # strict mode: garbage with PDF magic raises; a real PDF extracts
    with _pytest.raises(ValueError, match="strict"):
        PdfExtract(strict=True)(pa.table({"url": ["u"], "html": [b"%PDF-x" + b"\x00" * 64]}))
    from textextract_ray.pdf import build_pdf

    ok = PdfExtract(strict=True)(
        pa.table({"url": ["u"], "html": [build_pdf("strict path works")]})
    )
    assert ok["extracted_text"].to_pylist() == ["strict path works"]
    assert ok["status"].to_pylist() == ["ok"]


def test_schema_validation_fails_fast(ray_session):
    """A malformed pages table (wrong column types) fails at the
    boundary with a named stage, not deep inside an actor."""
    import pytest as _pytest
    import ray.data as rd

    from textextract_ray.pipelines.extract_pipeline import extract_dataset

    bad = rd.from_items([{"url": 1, "bogus": "x"}])
    with _pytest.raises(Exception, match="schema mismatch|KeyError|Field"):
        extract_dataset(bad).to_pandas()


def test_null_html_rows_not_dropped(ray_session):
    """A null html row must flow through BOTH the size-split and the
    pdf-routing paths as status='invalid' — never silently vanish."""
    import pyarrow as pa
    import ray.data as rd

    from textextract_ray.datagen import EPOCH_US
    from textextract_ray.pipelines.extract_pipeline import extract_dataset
    from textextract_ray.schemas import PAGES_SCHEMA
    from textextract_ray.stages.extract import extract_pages_with_pdf_routing
    from textextract_ray.stages.validate import annotate_batch

    rows = [
        {"url": "https://h/ok", "warc_ts": EPOCH_US, "html": b"x" * 100, "text": "", "lang": "en"},
        {"url": "https://h/null", "warc_ts": EPOCH_US, "html": None, "text": "", "lang": "en"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA))
    out = extract_dataset(ds, giant_threshold=64, dedup=False).to_pandas()
    assert set(out["url"]) == {"https://h/ok", "https://h/null"}
    assert out.set_index("url").loc["https://h/null", "status"] == "invalid"

    out2 = extract_pages_with_pdf_routing(ds, concurrency=1).to_pandas()
    assert set(out2["url"]) == {"https://h/ok", "https://h/null"}


def test_per_language_dispatch_observable(ray_session):
    """Same text under different lang tags routes to different models
    (the per-language dispatch A1/A2): stopword counts differ per lang,
    extraction itself stays byte-identical."""
    import pyarrow as pa

    from textextract_ray.stages.extract import LangDispatchExtract

    text = "the cat and the hat der die le la el zz"
    html = f"<html><body><article><p>{text}</p></article></body></html>".encode()
    batch = pa.table(
        {
            "url": [f"https://h/{l}" for l in ("en", "de", "fr", "es", "zh", "xx")],
            "html": [html] * 6,
            "lang": ["en", "de", "fr", "es", "zh", "xx"],
        }
    )
    out = LangDispatchExtract()(batch)
    assert out["extracted_text"].to_pylist() == [text] * 6
    stops = dict(zip(out["lang"].to_pylist(), out["n_stopwords"].to_pylist()))
    assert stops["en"] == 3   # the, and, the
    assert stops["de"] == 2   # der, die
    assert stops["fr"] == 2   # le, la
    assert stops["es"] == 2   # la? no — el, la
    assert stops["zh"] == 0   # no CJK markers in ASCII text
    assert stops["xx"] == 0   # unknown lang -> null model
    kept = dict(zip(out["lang"].to_pylist(), out["n_kept"].to_pylist()))
    assert kept["en"] == out["n_tokens"][0].as_py() - 3


def test_dedup_by_url_distributed_fallback_matches_driver_path(
    ray_session, fixture_pages
):
    """dedup_by_url has two dup-resolution arms (driver Arrow pass vs
    bucketed groupby past the row budget); they must agree exactly."""
    from textextract_ray.pipelines.extract_pipeline import (
        dedup_by_url,
        extract_dataset,
    )
    from textextract_ray.sources import read_pages

    def run(budget):
        ds = extract_dataset(read_pages(fixture_pages), dedup=False)
        out = dedup_by_url(ds, driver_budget_rows=budget).to_pandas()
        return out.sort_values("url").reset_index(drop=True)

    driver = run(200_000)
    distributed = run(0)  # forces the bucketed-groupby arm
    assert len(driver) == len(distributed)
    assert driver["url"].tolist() == distributed["url"].tolist()
    assert driver["extracted_text"].tolist() == distributed["extracted_text"].tolist()
    # dups actually existed in the fixture (else this test is vacuous)
    raw = extract_dataset(read_pages(fixture_pages), dedup=False).count()
    assert raw > len(driver)


def test_dedup_by_url_canonicalize_mode(ray_session):
    """Opt-in canonical-url dedup: tracking-param/case/port variants of
    one logical page collapse to a single winner (first per canonical
    key), while the default raw-url mode keeps them apart and golden
    behavior unchanged."""
    import pyarrow as pa
    import ray.data as rd

    from textextract_ray.pipelines.extract_pipeline import dedup_by_url

    tbl = pa.table(
        {
            "url": [
                "https://site.example/art/1?utm_campaign=x",
                "https://Site.example:443/art//1/",
                "https://site.example/art/2",
            ],
            "extracted_text": ["a", "a", "b"],
        }
    )
    ds = rd.from_arrow(tbl)
    raw = dedup_by_url(ds).to_pandas()
    assert len(raw) == 3  # raw keys differ → nothing deduped

    canon = dedup_by_url(ds, canonicalize=True).to_pandas().sort_values("url")
    assert len(canon) == 2
    # winner keeps its ORIGINAL url; both variants map to one key
    assert (canon["extracted_text"].tolist()) == ["a", "b"] or (
        canon["extracted_text"].tolist()
    ) == ["b", "a"]

    # deterministic winner: min raw url per canonical key, regardless
    # of block arrival order and in BOTH resolution arms (canonical-key
    # duplicates can differ in content, so arrival-order winners would
    # make output layout-dependent)
    rev = rd.from_arrow(tbl.take([2, 1, 0]))
    win = "https://Site.example:443/art//1/"  # 'S' < 's' lexicographically
    for d in (ds, rev):
        for budget in (10_000, 0):  # driver fast path / bucketed arm
            got = dedup_by_url(
                d, canonicalize=True, driver_budget_rows=budget
            ).to_pandas()
            assert len(got) == 2
            assert win in set(got["url"]), (budget, got["url"].tolist())
            assert "_ckey" not in got.columns


def test_fused_matches_dataset_path(ray_session, fixture_pages):
    """extract_files (parquet decode inside the extract task) must be
    byte-identical to extract_dataset(read_pages(...)) — same stages,
    different data motion. Timing column excluded (wall-clock)."""
    import pandas as pd

    from textextract_ray.pipelines.extract_pipeline import (
        extract_dataset,
        extract_files,
    )
    from textextract_ray.sources import read_pages

    drop = ["processing_time_ms"]
    a = (
        extract_files(fixture_pages, batch_size=32)
        .to_pandas()
        .drop(columns=drop)
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        extract_dataset(read_pages(fixture_pages), giant_threshold=None)
        .to_pandas()
        .drop(columns=drop)
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # directory form resolves to the same shard list
    import os

    d = os.path.dirname(fixture_pages[0])
    c = extract_files(d, dedup=False)
    assert c.count() == 200


def test_agg_fold_fallback_arm_parity(ray_session, sf_dir, monkeypatch):
    """q3 and usage_rollup take a budgeted driver fold over per-block
    partial aggregates; past the budget they must fall back to the
    distributed groupby merge with an identical answer. Forcing
    `_fold_partials` to report past-budget exercises the fallback."""
    import textextract_ray.pipelines.relational as rel

    import pandas as pd

    from textextract_ray.pipelines import textops as tx

    a_q3 = rel.q3_top_orders(sf_dir)
    a_roll = rel.usage_rollup(sf_dir)
    a_q1 = rel.q1_pricing_summary(sf_dir)
    a_tok = tx.token_stats(sf_dir)
    monkeypatch.setattr(rel, "_fold_partials", lambda *a, **k: None)
    b_q3 = rel.q3_top_orders(sf_dir)
    b_roll = rel.usage_rollup(sf_dir)
    b_q1 = rel.q1_pricing_summary(sf_dir)
    b_tok = tx.token_stats(sf_dir)
    assert a_q3["o_orderkey"].tolist() == b_q3["o_orderkey"].tolist()
    assert (a_q3["revenue"] - b_q3["revenue"]).abs().max() < 1e-6
    pd.testing.assert_frame_equal(
        a_roll.reset_index(drop=True), b_roll.reset_index(drop=True)
    )
    # q1 floats merge in a different association order across arms
    for c in a_q1.columns:
        if a_q1[c].dtype.kind == "f":
            assert (a_q1[c] - b_q1[c]).abs().max() < 1e-4
        else:
            assert a_q1[c].tolist() == b_q1[c].tolist()
    # token_stats sums are integers: bit-identical across arms
    pd.testing.assert_frame_equal(
        a_tok.reset_index(drop=True), b_tok.reset_index(drop=True)
    )


def test_token_stats_null_text_avg_semantics(ray_session, tmp_path):
    """avg_tokens divides by the NON-NULL text count (SQL AVG
    semantics), while n_docs counts all rows — pinned with an injected
    null text, in both merge arms."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import textextract_ray.pipelines.relational as rel
    from textextract_ray.pipelines import textops as tx

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["one two three", None, "four five"], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = tx.token_stats(str(tmp_path))
    assert out["n_docs"].tolist() == [3]
    assert out["total_tokens"].tolist() == [5]
    assert out["avg_tokens"].tolist() == [2.5]  # 5 / 2 non-null, not 5/3
    # distributed arm agrees
    orig = rel._fold_partials
    try:
        rel._fold_partials = lambda *a, **k: None
        out2 = tx.token_stats(str(tmp_path))
    finally:
        rel._fold_partials = orig
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True)
    )


def test_token_stats_null_lang_group_survives(ray_session, tmp_path):
    """A NULL lang forms its own group (SQL GROUP BY semantics) in
    BOTH merge arms — pandas' default dropna=True must not eat it."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import textextract_ray.pipelines.relational as rel
    from textextract_ray.pipelines import textops as tx

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["one two", "three", "four five six"], pa.string()),
            "lang": pa.array(["en", None, None], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = tx.token_stats(str(tmp_path))
    assert len(out) == 2
    null_row = out[out["lang"].isna()]
    assert null_row["n_docs"].tolist() == [2]
    assert null_row["total_tokens"].tolist() == [4]
    orig = rel._fold_partials
    try:
        rel._fold_partials = lambda *a, **k: None
        out2 = tx.token_stats(str(tmp_path))
    finally:
        rel._fold_partials = orig
    a = out.sort_values("lang", na_position="last").reset_index(drop=True)
    b = out2.sort_values("lang", na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_q1_null_group_key_both_arms(ray_session, tmp_path):
    """A NULL l_returnflag forms its own group in BOTH q1 merge arms
    (fold keeps it via dropna=False; the past-budget arm masks key
    null-ness through the Ray groupby and restores it)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import textextract_ray.pipelines.relational as rel

    t = pa.table(
        {
            "l_returnflag": pa.array(["A", None, None], pa.string()),
            "l_linestatus": pa.array(["O", "O", "O"], pa.string()),
            "l_quantity": pa.array([1.0, 2.0, 3.0]),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
            "l_discount": pa.array([0.0, 0.1, 0.2]),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    a = rel.q1_pricing_summary(str(tmp_path))
    assert len(a) == 2
    nrow = a[a["l_returnflag"].isna()]
    assert nrow["count_order"].tolist() == [2]
    assert nrow["sum_qty"].tolist() == [5.0]
    orig = rel._fold_partials
    try:
        rel._fold_partials = lambda *x, **k: None
        b = rel.q1_pricing_summary(str(tmp_path))
    finally:
        rel._fold_partials = orig
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
