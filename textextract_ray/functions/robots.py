"""robots.txt parsing and path matching (RFC 9309, the Robots
Exclusion Protocol) — the fetch-compliance counterpart of the
robots-META noindex filter (`pipelines.textops.filter_noindex_ds`):
noindex governs what an indexer may keep, robots.txt governs what a
crawler may fetch, and a responsible training-data pipeline filters
on both (the RefinedWeb / CommonCrawl-derived-corpus practice).

Implemented from the public spec (RFC 9309 §2; examples §2.2.2, §5):

* groups: consecutive ``User-agent`` lines share the rule block that
  follows; groups with the same chosen token merge.
* group selection: the group whose agent token is the longest
  case-insensitive substring of the crawler's product token wins;
  ``*`` matches anything at specificity 0; no group ⇒ allow all.
* rules: ``Allow`` / ``Disallow`` path patterns with ``*`` (any char
  run) and a trailing ``$`` (end anchor); an empty Disallow value is
  a no-op. Other directives (Crawl-delay, Sitemap) are ignored.
* precedence: the matching rule with the MOST OCTETS in its pattern
  wins; on a length tie, Allow wins. No matching rule ⇒ allowed.

The matcher is vectorized for corpus use: each rule compiles once to
an RE2-safe anchored regex and evaluates over a whole Arrow path
array per call (`pc.match_substring_regex`), so cost is
O(rules × paths) C passes — rules per robots.txt are tens, paths per
host are the big axis. Determinism: pure functions of (robots_txt,
agent, path); no state.

The reference has no crawler (it OCRs local screenshots); this module
exists for the training-data-pipeline brief. Reference-shaped piece:
the validator-style pure-function surface (reference
backend/utils/validation.py) applied to a web-compliance domain.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DIRECTIVE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def parse_robots(text: str, agent: str = "*") -> list:
    """Rules for ``agent`` from a robots.txt body: a list of
    ``(pattern, allow)`` tuples from the best-matching user-agent
    group (RFC 9309 §2.2.1). Empty list = everything allowed."""
    agent_l = (agent or "*").lower()
    groups: list = []  # (tokens, rules); consecutive UA lines share rules
    cur = None
    agents_open = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0]
        m = _DIRECTIVE_RE.match(line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if not agents_open:
                cur = ([], [])
                groups.append(cur)
                agents_open = True
            cur[0].append(val.strip().lower())
        elif key in ("allow", "disallow"):
            agents_open = False
            if cur is None:
                continue  # rules before any user-agent line: ignored
            if val == "":
                continue  # empty value is a no-op (RFC 9309 §2.2.2)
            cur[1].append((val, key == "allow"))
        else:
            agents_open = False  # Crawl-delay etc. close the UA run

    def spec(tokens) -> int:
        """Group specificity for this agent: longest matching token;
        '*' matches anything at 0; -1 = group does not apply."""
        best = -1
        for tok in tokens:
            if tok == "*":
                best = max(best, 0)
            elif tok and tok in agent_l:
                best = max(best, len(tok))
        return best

    best_spec = max((spec(toks) for toks, _ in groups), default=-1)
    if best_spec < 0:
        return []
    merged: list = []
    for toks, rules in groups:
        if spec(toks) == best_spec:
            merged.extend(rules)
    return merged


def compile_rules(rules: list) -> list:
    """``(regex, octets, allow)`` triples sorted by (octets, allow)
    ascending so a vectorized forward pass implements longest-match
    with allow-wins-ties (see match_allowed)."""
    out = []
    for pattern, allow in rules:
        p = pattern
        anchored = p.endswith("$")
        if anchored:
            p = p[:-1]
        body = ".*".join(re.escape(part) for part in p.split("*"))
        rx = "^" + body + ("$" if anchored else "")
        out.append((rx, len(pattern.encode("utf-8")), allow))
    out.sort(key=lambda t: (t[1], t[2]))
    return out


def match_allowed(paths, compiled: list) -> np.ndarray:
    """Boolean allow-verdict per path (RFC 9309 §2.2.2 precedence).
    ``paths`` is an Arrow string array/chunked array; each compiled
    rule evaluates in one vectorized RE2 pass."""
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    n = len(paths)
    if not compiled or n == 0:
        return np.ones(n, dtype=bool)
    best_len = np.full(n, -1, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)
    for rx, octets, allow in compiled:
        m = pc.match_substring_regex(
            pc.fill_null(paths, "/"), pattern=rx
        ).to_numpy(zero_copy_only=False)
        # rules arrive sorted (octets, allow) ascending: a hit wins if
        # strictly longer, or equal-length when this rule allows
        take = m & (
            (octets > best_len) | ((octets == best_len) & allow)
        )
        best_allow = np.where(take, allow, best_allow)
        best_len = np.where(take, octets, best_len)
    return best_allow


def url_path(url_col) -> pa.Array:
    """Path+query component of each url (the robots match subject):
    everything from the first ``/`` after the authority; no path ⇒
    ``/``. Vectorized: one RE2 extract pass."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    ex = pc.extract_regex(
        pc.fill_null(url_col, ""), pattern=r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(?P<path>/.*)?$"
    )
    path = pc.fill_null(pc.struct_field(ex, "path"), "/")
    # an authority-only url ("http://b.org") leaves the optional group
    # empty rather than null — the robots match subject is "/"
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    return path.combine_chunks() if isinstance(path, pa.ChunkedArray) else path
