"""Head-metadata extraction: field semantics across quoting/attribute
orders/charsets, entity unescape, absent-field nulls, bounded scan,
layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(rows, parts=None):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "html": pa.array(rows, pa.binary()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(parts) if parts else ds


PAGES = [
    # 0: everything present, double quotes
    b'<html lang="en-US"><head><title> Hello &amp; Welcome </title>'
    b'<link rel="canonical" href="https://a.com/x">'
    b'<meta property="og:title" content="OG Hello">'
    b'<meta property="og:description" content="og desc">'
    b'<meta name="description" content="plain desc"></head><body>hi</body>',
    # 1: single quotes + reversed attribute orders
    b"<html lang='fr'><head><title>Titre</title>"
    b"<link href='https://b.fr/y' rel='canonical'>"
    b"<meta content='OG Titre' property='og:title'>"
    b"<meta content='desc fr' name='description'></head>",
    # 2: nothing present
    b"<html><head></head><body>bare</body></html>",
    # 3: latin-1 bytes in the title (must not crash; lossy decode ok)
    b"<html><head><title>caf\xe9 corner</title></head>",
    # 4: title OUTSIDE the scan window (must be null)
    b"<html><head>" + b" " * 20000 + b"<title>too far</title></head>",
]


def test_head_meta_fields(ray_session):
    from textextract_ray.pipelines.textops import extract_head_meta_ds

    got = (
        extract_head_meta_ds(_ds(PAGES, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    r0 = got.iloc[0]
    assert r0["title"] == "Hello & Welcome"  # entity + whitespace squeeze
    assert r0["canonical_url"] == "https://a.com/x"
    assert r0["og_title"] == "OG Hello"
    assert r0["og_description"] == "og desc"
    assert r0["meta_description"] == "plain desc"
    assert r0["html_lang"] == "en-US"

    r1 = got.iloc[1]
    assert r1["canonical_url"] == "https://b.fr/y"  # reversed attr order
    assert r1["og_title"] == "OG Titre"
    assert r1["meta_description"] == "desc fr"
    assert r1["html_lang"] == "fr"

    r2 = got.iloc[2]
    for c in ("title", "canonical_url", "og_title", "og_description",
              "meta_description", "html_lang"):
        assert r2[c] is None or pd.isna(r2[c])

    assert "caf" in got.iloc[3]["title"]  # lossy decode, no crash
    assert got.iloc[4]["title"] is None or pd.isna(got.iloc[4]["title"])


def test_head_meta_layout_invariance(ray_session):
    from textextract_ray.pipelines.textops import extract_head_meta_ds

    rows = PAGES * 6
    a = extract_head_meta_ds(_ds(rows, 1)).to_pandas().sort_values("doc_id")
    b = extract_head_meta_ds(_ds(rows, 7)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
