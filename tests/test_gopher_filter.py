"""Gopher document filter (Rae et al. 2021 table A1): each rule
rejects its planted violator and only it; audit mode exposes per-rule
booleans; brute-force parity for the arithmetic rules; layout
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

GOOD = " ".join(
    f"The topic{i} report describes finding{i} of the survey and "
    f"compares it with result{i} from earlier work that we have."
    for i in range(5)
)  # ~90 words of varied English prose with stopwords, no repeated n-grams


def _docs() -> pd.DataFrame:
    rows = [
        (0, GOOD),
        (1, "too short to pass"),                                  # word count
        (2, " ".join(["a"] * 80)),                                 # mean word len < 3
        (3, GOOD + " " + " ".join(["####"] * 30)),                 # symbol ratio
        (4, GOOD + "\n" + "\n".join([f"- bullet {i} item" for i in range(40)])),  # bullets
        (5, GOOD + "\n" + "\n".join([f"line {i} trails off..." for i in range(40)])),  # ellipsis
        (6, GOOD + " " + " ".join(["1234"] * 120)),                # alpha word frac
        (7, " ".join([f"w{i}rd unique{i}" for i in range(60)])),   # no stopwords
        (8, GOOD + " " + "repeat this exact phrase " * 60),        # repetition
        # a modest list (50% bullet lines) must PASS — table A1 drops
        # only when MORE than 90% of lines are bullets
        (9, GOOD + "\n" + "\n".join(
            f"- item{i} covers point{i} fully" for i in range(5)
        )),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _run(df, repartition=None, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import gopher_filter_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    out = gopher_filter_ds(ds, **kw).to_pandas()
    if len(out) == 0:
        return out
    return out.sort_values("doc_id").reset_index(drop=True)


def test_gopher_filter_each_rule_fires(ray_session):
    df = _docs()
    audit = _run(df, audit=True)
    assert len(audit) == len(df)  # audit never filters
    by_id = audit.set_index("doc_id")
    assert bool(by_id.loc[0, "gopher_pass"])
    expected_failures = {
        1: "rule_word_count",
        2: "rule_mean_word_len",
        3: "rule_symbol_ratio",
        4: "rule_bullet_lines",
        5: "rule_ellipsis_lines",
        6: "rule_alpha_words",
        7: "rule_stopwords",
    }
    for doc, rule in expected_failures.items():
        assert not bool(by_id.loc[doc, rule]), (doc, rule)
        assert not bool(by_id.loc[doc, "gopher_pass"])
    # the repetition doc fails a top-n-gram rule
    assert not (
        bool(by_id.loc[8, "rule_top_2gram"])
        and bool(by_id.loc[8, "rule_top_3gram"])
        and bool(by_id.loc[8, "rule_top_4gram"])
    )
    assert bool(by_id.loc[9, "rule_bullet_lines"]) and bool(
        by_id.loc[9, "gopher_pass"]
    )
    kept = _run(df)
    assert list(kept["doc_id"]) == [0, 9]


def test_gopher_arithmetic_rules_brute_force(ray_session):
    import re

    df = _docs()
    audit = _run(df, audit=True).set_index("doc_id")
    for _, r in df.iterrows():
        t = r["text"]
        toks = re.findall(r"\S+", t)
        n = max(len(toks), 1)
        mean_len = sum(len(x) for x in toks) / n
        row = audit.loc[r["doc_id"]]
        assert bool(row["rule_word_count"]) == (50 <= len(toks) <= 100_000)
        assert bool(row["rule_mean_word_len"]) == (3.0 <= mean_len <= 10.0)
        alpha = sum(1 for x in toks if re.search(r"[A-Za-z]", x)) / n
        assert bool(row["rule_alpha_words"]) == (alpha >= 0.8)


def test_gopher_filter_layout_invariant(ray_session):
    df = _docs()
    a = _run(df, audit=True)
    b = _run(df.sample(frac=1.0, random_state=5).reset_index(drop=True),
             repartition=4, audit=True)
    pd.testing.assert_frame_equal(a, b)
