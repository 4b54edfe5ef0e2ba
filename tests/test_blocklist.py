"""Domain-blocklist URL filtering (UT1-style): exact DuckDB parity on
planted urls (exact domain, subdomain, lookalike non-match, deep
subdomain, case, port, userinfo), audit mode, and the broadcast-once
shape (the list rides ray.put, never the batch closure)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

BLOCKLIST = ["example.com", "ads.net", "TRACKER.ORG"]

URLS = [
    (1, "https://example.com/page"),            # exact -> blocked
    (2, "https://ads.example.com/x"),           # subdomain -> blocked
    (3, "https://notexample.com/x"),            # lookalike -> kept
    (4, "https://a.b.c.ads.net/deep?q=1"),      # deep subdomain -> blocked
    (5, "HTTP://WWW.TRACKER.ORG/UP"),           # case-insensitive -> blocked
    (6, "https://example.com:8443/porty"),      # port stripped -> blocked
    (7, "https://user:pw@example.com/auth"),    # userinfo stripped -> blocked
    (8, "https://fine.example.net/ok"),         # unrelated -> kept
    (9, "https://ads.net.evil.io/ok"),          # suffix NOT label-aligned -> kept
    (10, "https://sub.notexample.com/y"),       # lookalike subdomain -> kept
]


def _df() -> pd.DataFrame:
    return pd.DataFrame(URLS, columns=["page_id", "url"])


def _oracle(df: pd.DataFrame, invert: bool = False) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("pages", df)
    con.register(
        "bl", pd.DataFrame({"domain": [d.lower() for d in BLOCKLIST]})
    )
    cond = "EXISTS" if invert else "NOT EXISTS"
    out = con.execute(
        f"""
        WITH hosts AS (
            SELECT page_id, url,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(lower(url),
                         '^[a-z][a-z0-9+.-]*://([^/?#]+).*$', '\\1'),
                       '^[^/]*@', ''),
                     ':[0-9]+$', '') AS host
            FROM pages
        )
        SELECT page_id, url FROM hosts h
        WHERE {cond} (
            SELECT 1 FROM bl
            WHERE h.host = bl.domain OR h.host LIKE '%.' || bl.domain
        )
        ORDER BY page_id
        """
    ).df()
    con.close()
    return out.reset_index(drop=True)


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import filter_blocked_hosts_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = filter_blocked_hosts_ds(ds, BLOCKLIST, **kw).to_pandas()
    return out.sort_values("page_id").reset_index(drop=True)


def test_blocklist_matches_duckdb(ray_session):
    df = _df()
    got = _run(df)
    want = _oracle(df)
    pd.testing.assert_frame_equal(got, want)
    assert set(got.page_id) == {3, 8, 9, 10}


def test_blocklist_audit_mode(ray_session):
    df = _df()
    got = _run(df, invert=True)
    want = _oracle(df, invert=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(got.page_id) == {1, 2, 4, 5, 6, 7}


def test_blocklist_tld_entry_and_empty_list(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import filter_blocked_hosts_ds

    df = _df()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    # a bare-TLD entry blocks everything under it (last-suffix level)
    got = filter_blocked_hosts_ds(ds, ["io"]).to_pandas()
    assert set(got.page_id) == set(df.page_id) - {9}
    # empty blocklist keeps everything
    got = filter_blocked_hosts_ds(ds, []).to_pandas()
    assert len(got) == len(df)
