"""HTML table extraction: handcrafted structural oracle (headers,
entities, nesting, recovery, script skipping), malformed-input
totality, and the long-form Dataset stage."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

HTML = b"""<html><body>
<table>
 <tr><th>Name</th><th>Age</th></tr>
 <tr><td>Alice &amp; Bob</td><td>30</td></tr>
 <tr><td>Carol<br>Jones</td><td>25</td>
</table>
<p>no table here</p>
<table><tr><td>outer <table><tr><td>inner</td></tr></table> after</td></tr></table>
<table><tr><td><script>var x = '<td>evil</td>';</script>clean</td></tr></table>
<table></table>
</body></html>"""


def test_extract_tables_structure():
    from textextract_ray.tables import extract_tables

    tables = extract_tables(HTML)
    assert len(tables) == 4  # the empty <table></table> is dropped
    t0 = tables[0]
    assert t0["rows"] == [
        ["Name", "Age"],
        ["Alice & Bob", "30"],
        ["Carol Jones", "25"],  # <br> becomes a space; unclosed tr recovers
    ]
    assert t0["header_rows"] == [True, False, False]
    # nested: outer first, inner content excluded from the outer cell
    assert tables[1]["rows"] == [["outer after"]]
    assert tables[2]["rows"] == [["inner"]]
    # script content never leaks into cells
    assert tables[3]["rows"] == [["clean"]]


def test_extract_tables_total_on_garbage():
    from textextract_ray.tables import extract_tables

    for payload in (
        None,
        b"",
        b"<table><tr><td>unclosed everything",
        b"</table></tr></td>stray closes",
        b"\xff\xfe\x00garbage bytes",
        b"<table><tr><td>a < b</td></tr></table>",
    ):
        tables = extract_tables(payload)  # must not raise
        assert isinstance(tables, list)
    assert extract_tables(b"<table><tr><td>unclosed everything")[0]["rows"] == [
        ["unclosed everything"]
    ]
    # '< b' tokenizes as an open tag 'b' (the shared tokenizer's
    # recovery, same as the main extractor); escaped form is exact
    assert extract_tables(b"<table><tr><td>a < b</td></tr></table>")[0][
        "rows"
    ] == [["a"]]
    assert extract_tables(b"<table><tr><td>a &lt; b</td></tr></table>")[0][
        "rows"
    ] == [["a < b"]]


def test_extract_tables_ds_long_form(ray_session):
    import ray.data as rd

    from textextract_ray.tables import extract_tables_ds

    pages = pa.table(
        {
            "url": ["https://a.com/1", "https://a.com/2"],
            "html": [HTML, b"<p>tableless</p>"],
        }
    )
    out = (
        extract_tables_ds(rd.from_arrow(pages))
        .to_pandas()
        .sort_values(["url", "table_idx", "row_idx"])
        .reset_index(drop=True)
    )
    assert set(out["url"]) == {"https://a.com/1"}
    assert len(out) == 3 + 1 + 1 + 1
    first = out.iloc[0]
    assert first["is_header"] and first["n_cols"] == 2
    assert list(first["cells"]) == ["Name", "Age"]
    assert out["table_idx"].max() == 3
