"""Link-graph analytics: href extraction parity with a brute-force re
oracle, host-graph aggregation vs pandas, PageRank vs a dense numpy
power-iteration oracle, dangling/damping semantics, determinism, and
an e2e pass over the synthesized fixture pages."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _pages() -> pd.DataFrame:
    """Hand-built mini-crawl with absolute + relative + junk hrefs."""
    rows = [
        (
            "https://a.example/p1",
            b'<html><body><a href="https://b.example/x">b</a>'
            b'<a href="/local">me</a><a href="#frag">skip</a>'
            b"<a href='https://c.example/y'>c</a>"
            b'<a href="javascript:void(0)">js</a>'
            b'<a href="mailto:x@y.z">mail</a></body></html>',
        ),
        (
            "https://a.example/p2",
            b'<a href="https://b.example/z">b again</a>'
            b'<a href="https://b.example/z2">and again</a>',
        ),
        (
            "https://b.example/q",
            b'<a class="nav" href="https://c.example/top">c</a>',
        ),
        ("https://c.example/r", b"<p>no links here</p>"),
        ("https://d.example/s", b'<a href="relative/only">rel</a>'),
    ]
    return pd.DataFrame(rows, columns=["url", "html"])


def _links(df, **kw):
    import ray.data as rd

    from textextract_ray.pipelines.linkgraph import extract_links_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return extract_links_ds(ds, **kw).to_pandas()


def test_extract_links_resolves_and_filters(ray_session):
    got = _links(_pages()).sort_values(["src_url", "dst_url"]).reset_index(drop=True)
    # junk (fragment/js/mailto) dropped; relative resolved on-host
    assert len(got) == 7
    p1 = got[got["src_url"] == "https://a.example/p1"]
    assert set(p1["dst_url"]) == {
        "https://b.example/x",
        "https://a.example/local",
        "https://c.example/y",
    }
    internal = got[got["is_internal"]]
    assert set(internal["dst_url"]) == {
        "https://a.example/local",
        "https://d.example/relative/only",
    }
    assert (got["src_host"] == got["src_url"].str.extract(r"://([^/]+)")[0]).all()


def test_host_graph_counts_match_pandas(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.linkgraph import extract_links_ds, host_graph_ds

    df = _pages()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    edges = (
        host_graph_ds(extract_links_ds(ds))
        .to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            ("a.example", "b.example", 3),
            ("a.example", "c.example", 1),
            ("b.example", "c.example", 1),
        ],
        columns=["src_host", "dst_host", "n_links"],
    )
    pd.testing.assert_frame_equal(edges.astype(want.dtypes.to_dict()), want)


def _pagerank_oracle(edges: pd.DataFrame, d=0.85, n_iter=20) -> pd.DataFrame:
    hosts = sorted(set(edges["src_host"]) | set(edges["dst_host"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    M = np.zeros((n, n))
    for _, r in edges.iterrows():
        M[idx[r["dst_host"]], idx[r["src_host"]]] += r["n_links"]
    outw = M.sum(axis=0)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        nz = outw > 0
        contrib = M[:, nz] @ (rank[nz] / outw[nz])
        rank = (1 - d) / n + d * (contrib + rank[~nz].sum() / n)
    return pd.DataFrame({"host": hosts, "rank": np.round(rank, 10)}).sort_values(
        ["rank", "host"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def test_pagerank_matches_dense_oracle():
    from textextract_ray.pipelines.linkgraph import host_pagerank

    edges = pd.DataFrame(
        [
            ("a", "b", 2),
            ("a", "c", 1),
            ("b", "c", 1),
            ("c", "a", 1),
            ("d", "a", 5),  # d is a source only; e is dangling
            ("a", "e", 1),
        ],
        columns=["src_host", "dst_host", "n_links"],
    )
    got = host_pagerank(edges, n_iter=40)
    want = _pagerank_oracle(edges, n_iter=40)
    pd.testing.assert_frame_equal(got, want)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-6)
    # c receives from both a and b: must outrank b
    ranks = dict(zip(got["host"], got["rank"]))
    assert ranks["c"] > ranks["b"]


def test_pagerank_empty_and_e2e_fixture_pages(ray_session):
    import ray.data as rd

    from textextract_ray.datagen import make_page
    from textextract_ray.pipelines.linkgraph import (
        extract_links_ds,
        host_graph_ds,
        host_pagerank,
    )

    empty = host_pagerank(pd.DataFrame(columns=["src_host", "dst_host", "n_links"]))
    assert len(empty) == 0
    # fixture pages: every link is host-internal -> external graph empty,
    # internal graph non-trivial
    rows = [
        {"url": f"https://host{i % 5}.example/doc/{i}", "html": make_page(i)}
        for i in range(40)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    links = extract_links_ds(ds)
    assert host_graph_ds(links).count() == 0
    internal = host_graph_ds(links, drop_internal=False).to_pandas()
    assert len(internal) > 0
    assert (internal["src_host"] == internal["dst_host"]).all()
    pr = host_pagerank(internal)
    assert pr["rank"].sum() == pytest.approx(1.0, abs=1e-6)
