"""robots.txt compliance: RFC 9309 parser/matcher semantics (spec
examples, wildcard/$ handling, longest-match + allow-wins-ties, agent
group selection), stdlib-robotparser parity on prefix-only files, and
the bucketed pipeline filter (no-robots default, audit mode, duplicate
contract, layout invariance)."""

from __future__ import annotations

import urllib.robotparser

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.functions.robots import (
    compile_rules,
    match_allowed,
    parse_robots,
    url_path,
)


def _allowed(robots: str, path: str, agent: str = "*") -> bool:
    comp = compile_rules(parse_robots(robots, agent))
    return bool(match_allowed(pa.array([path]), comp)[0])


# --- RFC 9309 semantics --------------------------------------------------------


def test_rfc_longest_match_and_tie():
    # RFC 9309 §2.2.2: most specific (most octets) match wins;
    # equal-length tie -> allow wins
    r = "User-agent: *\nDisallow: /example/page/\nAllow: /example/page/index.html\n"
    assert not _allowed(r, "/example/page/other.html")
    assert _allowed(r, "/example/page/index.html")
    tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert _allowed(tie, "/page")


def test_wildcards_and_anchor():
    r = "User-agent: *\nDisallow: /*.gif$\nDisallow: /private*\n"
    assert not _allowed(r, "/images/cat.gif")
    assert _allowed(r, "/images/cat.gif?v=1")  # $ anchors the end
    assert not _allowed(r, "/private/docs")
    assert not _allowed(r, "/privateer")  # prefix semantics
    assert _allowed(r, "/public/cat.png")


def test_agent_group_selection():
    r = (
        "User-agent: googlebot\nDisallow: /g/\n\n"
        "User-agent: *\nDisallow: /all/\n\n"
        "User-agent: googlebot-images\nDisallow: /gi/\n"
    )
    # longest matching token wins; chosen group REPLACES *, not adds
    assert not _allowed(r, "/gi/x", agent="Googlebot-Images/1.0")
    assert _allowed(r, "/g/x", agent="Googlebot-Images/1.0")
    assert not _allowed(r, "/g/x", agent="Googlebot/2.1")
    assert _allowed(r, "/all/x", agent="Googlebot/2.1")
    assert not _allowed(r, "/all/x", agent="OtherBot")
    # no group at all -> allow everything
    assert _allowed("User-agent: onlybot\nDisallow: /\n", "/x", agent="me")


def test_shared_agent_run_and_merged_groups():
    r = (
        "User-agent: a\nUser-agent: b\nDisallow: /shared/\n\n"
        "User-agent: a\nDisallow: /more/\n"
    )
    # consecutive UA lines share one block; same-token groups merge
    assert not _allowed(r, "/shared/x", agent="a")
    assert not _allowed(r, "/more/x", agent="a")
    assert not _allowed(r, "/shared/x", agent="b")
    assert _allowed(r, "/more/x", agent="b")


def test_noise_tolerance():
    r = (
        "# comment\nSitemap: https://x.com/s.xml\n"
        "Disallow: /orphan-before-any-group/\n"
        "User-agent: *\nCrawl-delay: 10\nDisallow:\nDisallow: /real/\n"
        "NotADirective\n"
    )
    assert _allowed(r, "/orphan-before-any-group/a")
    assert _allowed(r, "/anything")  # empty Disallow = no-op
    assert not _allowed(r, "/real/a")
    assert parse_robots("", "*") == [] and parse_robots(None, "*") == []


def test_stdlib_robotparser_parity_prefix_rules():
    # on wildcard-free DISALLOW-ONLY files our matcher must agree with
    # the stdlib (with Allow rules the two legitimately diverge: the
    # stdlib implements 1997-draft first-match-in-file-order precedence,
    # RFC 9309 longest-match-with-allow-ties — the RFC case is pinned by
    # test_rfc_longest_match_and_tie above)
    rng = np.random.RandomState(7)
    segs = ["/a", "/b/c", "/d", "/e/f/g", "/b", "/h.html"]
    for trial in range(20):
        n_dis = rng.randint(1, 5)
        lines = ["User-agent: *"]
        lines += [f"Disallow: {segs[i]}" for i in rng.choice(len(segs), n_dis)]
        body = "\n".join(lines)
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        comp = compile_rules(parse_robots(body, "*"))
        paths = [s + t for s in segs for t in ("", "/x", "x", "/deep/er")]
        got = match_allowed(pa.array(paths), comp)
        want = [rp.can_fetch("*", p) for p in paths]
        assert got.tolist() == want, f"trial {trial}: {body} {paths}"


def test_url_path_extraction():
    urls = pa.array(
        [
            "https://a.com/x/y?q=1",
            "http://b.org",
            "https://c.net/",
            None,
            "ftp://d.io/file.bin",
        ]
    )
    assert url_path(urls).to_pylist() == ["/x/y?q=1", "/", "/", "/", "/file.bin"]


# --- pipeline filter -------------------------------------------------------------


def _tables():
    pages = pd.DataFrame(
        {
            "url": [
                "https://a.com/public/1",
                "https://a.com/private/2",
                "https://a.com/private.gif",
                "https://b.com/anything",
                "https://c.com/x",  # no robots row -> allowed
                "https://a.com/",
            ],
            "doc_id": np.arange(6, dtype=np.int64),
        }
    )
    robots = pd.DataFrame(
        {
            "host": ["a.com", "b.com"],
            "robots_txt": [
                "User-agent: *\nDisallow: /private\nAllow: /private.gif\n",
                "User-agent: *\nDisallow: /\n",
            ],
        }
    )
    return pages, robots


def test_robots_filter_pipeline(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import robots_filter_ds

    pages, robots = _tables()
    got = (
        robots_filter_ds(rd.from_pandas(pages).repartition(3), rd.from_pandas(robots))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 2, 4, 5]
    assert list(got.columns) == ["url", "doc_id"]

    audit = (
        robots_filter_ds(
            rd.from_pandas(pages), rd.from_pandas(robots), audit=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert audit["robots_allowed"].tolist() == [True, False, True, False, True, True]


def test_robots_filter_layout_invariance_and_dup_guard(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import robots_filter_ds

    pages, robots = _tables()
    big = pd.concat([pages] * 10, ignore_index=True)
    big["doc_id"] = np.arange(len(big), dtype=np.int64)
    a = (
        robots_filter_ds(rd.from_pandas(big).repartition(2), rd.from_pandas(robots))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        robots_filter_ds(rd.from_pandas(big).repartition(9), rd.from_pandas(robots))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)

    dup = pd.concat([robots, robots.iloc[[0]]], ignore_index=True)
    with pytest.raises(Exception, match="duplicate robots row"):
        robots_filter_ds(rd.from_pandas(pages), rd.from_pandas(dup)).to_pandas()


def test_null_urls_and_null_robots_hosts(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.textops import robots_filter_ds

    pages = pd.DataFrame(
        {
            "url": ["https://b.com/x", None, "https://a.com/private/z"],
            "doc_id": np.arange(3, dtype=np.int64),
        }
    )
    robots = pd.DataFrame(
        {
            "host": ["a.com", None],  # a null-host row applies to nothing
            "robots_txt": ["User-agent: *\nDisallow: /private\n", "junk"],
        }
    )
    got = (
        robots_filter_ds(rd.from_pandas(pages), rd.from_pandas(robots),
                         num_buckets=1)  # force every row into ONE bucket
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the null-url page is allowed (no authority -> nothing disallows it)
    assert got["doc_id"].tolist() == [0, 1]
