"""HTML table extraction (WebTables-class structured data mining).

Walks the same STYLE of streaming tokenizer the main-content extractor
uses (one regex pass, no DOM build) with a small table-context stack,
so arbitrary crawl bytes parse with the exact recovery semantics the
extractor pins (unclosed tags, implicit </td>/</tr> closes, nested
tables, script/style skipping). The token regex here is this module's
OWN pinned copy of the extractor's pre-link-farm tokenizer: the
extractor's current regex coalesces whole ``<li><a>…</a></li>`` runs
into one token because the classifier provably drops them, but a table
CELL containing such a list must keep its text — so tables keep the
two-alternative tokenizer (boundary compound + generic tag) whose
behavior the golden tests froze. Each
<table> — including tables nested inside cells, which get their own
entry — yields rows of whitespace-collapsed, entity-unescaped cell
strings; <th> anywhere in a row marks it a header row.

Deliberately NOT handled (documented, WebTables does the same in its
relation-filtering stage downstream): colspan/rowspan expansion (the
raw grid is emitted; spans stay one cell) and CSS display:table. Total
function — never raises on bytes that decode.
"""

from __future__ import annotations

import html as _htmllib

import re as _re

from .oracle import _WS_RUN_RE, _decode

# pinned pre-link-farm tokenizer (see module docstring): group 2 =
# compound attrs, 3 = close slash, 4 = tag, 6 = self-close slash
_TOKEN_RE = _re.compile(
    r"</a></li><li><a(?![a-zA-Z0-9:-])"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)\s*>"
    r"|<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|<",
    _re.DOTALL,
)

_SKIP_TAGS = frozenset({"script", "style", "template", "noscript", "svg"})
_CELL_BREAK_TAGS = frozenset({"br", "p", "div", "li"})


class _Table:
    __slots__ = ("rows", "header_flags", "row", "cell", "row_has_th")

    def __init__(self):
        self.rows = []          # list[list[str]]
        self.header_flags = []  # list[bool], parallel to rows
        self.row = None         # open row: list[str] | None
        self.cell = None        # open cell: list[str] | None
        self.row_has_th = False

    def open_row(self):
        self.close_row()
        self.row = []
        self.row_has_th = False

    def open_cell(self, is_header: bool):
        self.close_cell()
        if self.row is None:
            self.open_row()
        self.cell = []
        self.row_has_th = self.row_has_th or is_header

    def close_cell(self):
        if self.cell is not None and self.row is not None:
            text = _WS_RUN_RE.sub(" ", "".join(self.cell)).strip()
            self.row.append(text)
            self.cell = None

    def close_row(self):
        self.close_cell()
        if self.row is not None:
            if self.row:
                self.rows.append(self.row)
                self.header_flags.append(self.row_has_th)
            self.row = None

    def finish(self):
        self.close_row()
        return self


def extract_tables(html: bytes | str | None) -> list:
    """bytes/str -> list of tables; each table is a dict with ``rows``
    (list of list-of-cell-strings) and ``header_rows`` (parallel bool
    list). Empty rows are dropped; tables with zero surviving rows are
    dropped. Nested tables emit in OPEN order (outer first), and their
    content is excluded from the outer cell's text (matching how a
    reader sees nested layout tables)."""
    if html is None:
        return []
    doc = _decode(html) if isinstance(html, (bytes, bytearray)) else html
    stack: list = []        # open _Table contexts (top = innermost)
    done: list = []         # finished tables in OPEN order
    order: list = []        # ids of tables in open order, for emit order
    skip_depth = 0
    pos = 0

    def add_text(s: str) -> None:
        if skip_depth or not stack:
            return
        top = stack[-1]
        if top.cell is not None:
            top.cell.append(_htmllib.unescape(s))

    for m in _TOKEN_RE.finditer(doc):
        if m.start() > pos:
            add_text(doc[pos : m.start()])
        pos = m.end()
        tag = m.group(4)
        if tag is None:
            # compound </a></li><li><a token, comment, doctype, PI, or
            # stray '<': none affect table structure; a stray '<' is
            # literal text inside a cell
            if m.group(0) == "<":
                add_text("<")
            continue
        tag = tag.lower()
        closing = m.group(3) == "/"
        if tag in _SKIP_TAGS:
            if closing:
                skip_depth = max(0, skip_depth - 1)
            elif not m.group(6):  # self-closed <script/> opens nothing
                skip_depth += 1
            continue
        if skip_depth:
            continue
        if tag == "table":
            if closing:
                if stack:
                    t = stack.pop()
                    t.finish()
            else:
                t = _Table()
                stack.append(t)
                order.append(t)
            continue
        if not stack:
            continue
        top = stack[-1]
        if tag == "tr":
            if closing:
                top.close_row()
            else:
                top.open_row()
        elif tag in ("td", "th"):
            if closing:
                top.close_cell()
            else:
                top.open_cell(tag == "th")
        elif tag in _CELL_BREAK_TAGS and top.cell is not None:
            top.cell.append(" ")
    if pos < len(doc):
        add_text(doc[pos:])
    while stack:  # EOF closes open tables (tokenizer recovery contract)
        stack.pop().finish()

    out = []
    for t in order:
        if t.rows:
            out.append({"rows": t.rows, "header_rows": t.header_flags})
    return out


def extract_tables_ds(
    pages,
    *,
    id_col: str = "url",
    html_col: str = "html",
    batch_size: int = 64,
):
    """pages Dataset -> long-form table rows: (id_col, table_idx,
    row_idx, is_header, n_cols, cells: list<string>). Parser-class
    per-document work (the extractor's class) in a stateless task-pool
    map_batches (no per-actor state to amortize — the tokenizer regex
    is module-level), one streaming pass, ZERO shuffle; consume with
    write_parquet or aggregate."""
    import pyarrow as pa

    def kernel(batch: pa.Table) -> pa.Table:
        ids, t_idx, r_idx, headers, n_cols, cells = [], [], [], [], [], []
        id_vals = batch[id_col].to_pylist()
        for doc_id, payload in zip(id_vals, batch[html_col].to_pylist()):
            for ti, tbl in enumerate(extract_tables(payload)):
                for ri, (row, is_h) in enumerate(
                    zip(tbl["rows"], tbl["header_rows"])
                ):
                    ids.append(doc_id)
                    t_idx.append(ti)
                    r_idx.append(ri)
                    headers.append(is_h)
                    n_cols.append(len(row))
                    cells.append(row)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "table_idx": pa.array(t_idx, pa.int32()),
                "row_idx": pa.array(r_idx, pa.int32()),
                "is_header": pa.array(headers, pa.bool_()),
                "n_cols": pa.array(n_cols, pa.int32()),
                "cells": pa.array(cells, pa.list_(pa.string())),
            }
        )

    return pages.map_batches(
        kernel,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
