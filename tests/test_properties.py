"""Property-based tests (hypothesis): the total-function and
determinism guarantees hold for arbitrary inputs, not just fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from textextract_ray.functions import text as tx
from textextract_ray.oracle import extract_document
from textextract_ray.schemas import STATUSES


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_total_and_deterministic(blob):
    a = extract_document(blob)
    b = extract_document(blob)
    assert a.status in STATUSES
    assert a.text == b.text and a.spans == b.spans and a.status == b.status


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_extract_spans_index_into_text(s):
    html = f'<html><head><meta charset="utf-8"></head><body><article><p>{s}</p></article></body></html>'
    res = extract_document(html.encode("utf-8"))
    joined = "\n\n".join(res.text[sp["start"] : sp["end"]] for sp in res.spans)
    assert joined == res.text


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=500))
def test_token_count_matches_ascii_split(s):
    import re

    got = tx.token_count(pa.array([s])).to_pylist()[0]
    # pinned semantics: ASCII whitespace only (RE2 \s)
    assert got == len(re.findall(r"[^\t\n\f\r ]+", s))


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_minhash_signature_stable_shape(s):
    a, b = tx.minhash_params(32)
    sig1 = tx.minhash_signature(tx.shingle_hashes(s), a, b)
    sig2 = tx.minhash_signature(tx.shingle_hashes(s), a, b)
    assert sig1.shape == (32,)
    assert (sig1 == sig2).all()
    keys = tx.lsh_band_keys(sig1, bands=8)
    assert len(keys) == 8 and keys == tx.lsh_band_keys(sig2, bands=8)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_simhash_stable(s):
    assert tx.simhash64(s) == tx.simhash64(s)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=20))
def test_popcount_matches_bin(vals):
    arr = np.array(vals, dtype=np.uint64)
    expect = [bin(v).count("1") for v in vals]
    assert tx.popcount64(arr).tolist() == expect


_URL_PATH = st.text(
    alphabet="abcXYZ019-._~/%", max_size=40
)
_URL_QUERY = st.lists(
    st.tuples(
        st.sampled_from(
            ["q", "page", "id", "utm_source", "utm_medium", "fbclid", "gclid", "X"]
        ),
        st.text(alphabet="abc019", max_size=8),
    ),
    max_size=6,
)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    st.text(alphabet="abcDEF019.-", min_size=1, max_size=20),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _URL_PATH,
    _URL_QUERY,
    st.text(alphabet="abc#?&=", max_size=10),
)
def test_canonicalize_url_idempotent(scheme, host, port, path, query, frag):
    """canonicalize(canonicalize(u)) == canonicalize(u) for any
    absolute http(s) url — the property that makes the canonical key
    safe to store and re-canonicalize across runs/versions."""
    import pyarrow as pa

    from textextract_ray.functions.scalar import canonicalize_url

    qs = "&".join(f"{k}={v}" for k, v in query)
    u = f"{scheme}://{host}{port}/{path}" + (f"?{qs}" if qs else "") + (f"#{frag}" if frag else "")
    once = canonicalize_url(pa.array([u])).to_pylist()[0]
    twice = canonicalize_url(pa.array([once])).to_pylist()[0]
    assert once == twice, (u, once, twice)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=800))
def test_split_sentences_total_and_lossless_tokens(s):
    """Splitter totality + conservation: rejoining the sentences with
    single spaces preserves the non-whitespace token sequence."""
    sents = tx.split_sentences(pa.array([s])).to_pylist()[0]
    assert isinstance(sents, list) and len(sents) >= 1
    assert " ".join(" ".join(sents).split()) == " ".join(s.split())


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=500))
def test_compression_ratio_bounds(s):
    r = tx.compression_ratio(pa.array([s])).to_pylist()[0]
    if s:
        assert 0.0 < r  # zlib never emits zero bytes for nonempty input
    else:
        assert r == 0.0


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_tables_total_property(blob):
    from textextract_ray.tables import extract_tables

    tables = extract_tables(blob)
    assert isinstance(tables, list)
    for t in tables:
        assert len(t["rows"]) == len(t["header_rows"])
        assert all(isinstance(c, str) for row in t["rows"] for c in row)


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400))
def test_dhash_is_deterministic_and_valid(s):
    """dhash over arbitrary synthetic pixels: same pixels, same hash."""
    import numpy as np

    from textextract_ray.imageops import dhash64

    seed = abs(hash(s)) % (2**32)
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    h = dhash64(px)
    assert 0 <= h < 2**64
    assert dhash64(px) == h


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=1200))
@settings(max_examples=150, deadline=None)
def test_parse_robots_total_function(blob):
    # arbitrary bytes-as-text never crash the parser, and compiled
    # rules always evaluate over arbitrary paths
    from textextract_ray.functions.robots import (
        compile_rules,
        match_allowed,
        parse_robots,
    )

    rules = parse_robots(blob, agent="testbot")
    comp = compile_rules(rules)
    got = match_allowed(pa.array(["/", "/a/b?c=1", ""]), comp)
    assert got.dtype == bool and len(got) == 3


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["/a", "/b/c", "/d", "/b", "/a/b/c.html", "/"]),
        ),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.sampled_from(["/a", "/a/x", "/b/c/d", "/bx", "/d/e", "/", "/q"]),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=80, deadline=None)
def test_robots_disallow_only_stdlib_parity(dis, paths):
    # property form of the stdlib parity pin: any wildcard-free
    # Disallow-only file agrees with urllib.robotparser on any path
    import urllib.robotparser

    from textextract_ray.functions.robots import (
        compile_rules,
        match_allowed,
        parse_robots,
    )

    body = "User-agent: *\n" + "\n".join(f"Disallow: {d[0]}" for d in dis)
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    comp = compile_rules(parse_robots(body, "*"))
    got = match_allowed(pa.array(paths), comp).tolist()
    want = [rp.can_fetch("*", p) for p in paths]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # band_id
            st.integers(0, 6),          # band_key (stringified)
            st.integers(0, 12),         # id (small domain -> collisions)
            st.booleans(),              # droppable rank
        ),
        max_size=60,
    ),
    cap=st.integers(1, 8),
    use_rank=st.booleans(),
)
def test_group_all_pairs_matches_reference_property(rows, cap, use_rank):
    """`_group_all_pairs` == the per-group sort/dedup/cap/triu
    reference for ARBITRARY group shapes, caps, and droppable masks —
    the vectorized candidate-pair kernel behind the MinHash stages."""
    import pandas as pd

    from textextract_ray.stages.dedup import _group_all_pairs

    df = pd.DataFrame(
        {
            "band_id": [r[0] for r in rows],
            "band_key": [f"k{r[1]}" for r in rows],
            "id": [r[2] for r in rows],
            "_rank": [int(r[3]) for r in rows],
        }
    )
    order = ["_rank", "id"] if use_rank else ["id"]
    cols = ["band_id", "band_key"]

    outs = []
    d2 = df[df.duplicated(cols, keep=False)]
    for _, g in d2.groupby(cols, sort=True):
        g = g.sort_values(order, kind="stable").drop_duplicates("id").head(cap)
        ids = g["id"].to_numpy()
        lo, hi = np.triu_indices(len(ids), k=1)
        if use_rank:
            keep = (g["_rank"].to_numpy() > 0)[hi]
            outs.append(
                pd.DataFrame({"id": ids[hi[keep]], "keep_id": ids[lo[keep]]})
            )
        else:
            outs.append(pd.DataFrame({"id": ids[hi], "keep_id": ids[lo]}))
    want = (
        pd.concat(outs, ignore_index=True)
        if outs
        else pd.DataFrame({"id": [], "keep_id": []})
    )
    got = _group_all_pairs(
        df,
        cols,
        cap=cap,
        order=order,
        droppable_col="_rank" if use_rank else None,
    )
    assert sorted(map(tuple, want.to_numpy())) == sorted(
        map(tuple, got.to_numpy())
    )
