"""Script detection, readability, and Luhn credit-card audit: kernel
semantics (known scripts, formula pin, ISO test numbers), tagger
composition through the attribute store, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from textextract_ray.functions.text import (
    cc_audit,
    luhn_valid,
    readability_features,
    script_fractions,
)


def test_script_fractions_known_texts():
    t = script_fractions(
        pa.array(
            [
                "hello world entirely latin",
                "привет мир полностью кириллица",
                "你好世界",
                "مرحبا بالعالم",
                "mixed привет hello",
                "",
                "12345 !!!",
            ]
        )
    )
    assert t["main_script"].to_pylist() == [
        "latin", "cyrillic", "han", "arabic", "latin", "none", "none",
    ]
    assert t["frac_latin"][0].as_py() == 1.0
    assert t["frac_cyrillic"][1].as_py() == 1.0
    assert t["frac_han"][2].as_py() == 1.0
    mixed_lat = t["frac_latin"][4].as_py()
    mixed_cyr = t["frac_cyrillic"][4].as_py()
    assert mixed_lat + mixed_cyr == pytest.approx(1.0)
    assert 0 < mixed_cyr < mixed_lat


def test_readability_formula_pin():
    # 2 sentences, 6 words, syllable groups counted by [aeiouy]+ runs
    text = "The cat sat. It was flat!"
    t = readability_features(pa.array([text, ""]))
    words, sents = 6.0, 2.0
    syll = 6.0  # one vowel group per word here
    want = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
    assert t["flesch_reading_ease"][0].as_py() == pytest.approx(want)
    assert t["words_per_sentence"][0].as_py() == 3.0
    assert t["flesch_reading_ease"][1].as_py() == 0.0
    # no terminal punctuation: sentence count floors at 1
    t2 = readability_features(pa.array(["three words here"]))
    assert t2["words_per_sentence"][0].as_py() == 3.0


def test_luhn_iso_numbers():
    # published ISO/IEC 7812 test numbers (valid) + off-by-one twins
    valid = ["4111111111111111", "5500005555555559", "371449635398431",
             "6011000990139424"]
    for v in valid:
        assert luhn_valid(v), v
        bad = v[:-1] + str((int(v[-1]) + 1) % 10)
        assert not luhn_valid(bad), bad


def test_cc_audit_semantics():
    t = cc_audit(
        pa.array(
            [
                "card 4111 1111 1111 1111 on file",       # valid, spaced
                "fake 4111111111111112 fails checksum",   # candidate, invalid
                "two: 4111111111111111 and 371449635398431",  # both valid
                "short 1234 5678 run",                    # too few digits
                "",
            ]
        )
    )
    assert t["n_cc_candidates"].to_pylist() == [1, 1, 2, 0, 0]
    assert t["n_cc_luhn_valid"].to_pylist() == [1, 0, 2, 0, 0]


def test_taggers_compose_through_attribute_store(ray_session):
    import ray.data as rd

    from textextract_ray.pipelines.attributes import (
        pii_audit_taggers,
        readability_taggers,
        script_taggers,
        tag_attributes_ds,
    )

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "The quick brown fox. It jumps!",
                "привет мир. это кириллица!",
                "pay with 4111111111111111 today.",
                "",
            ],
        }
    )
    taggers = {
        **script_taggers(),
        **readability_taggers(),
        **pii_audit_taggers(),
    }
    a = (
        tag_attributes_ds(rd.from_pandas(df).repartition(2), taggers)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["main_script"].tolist() == ["latin", "cyrillic", "latin", "none"]
    assert a["n_cc_luhn_valid"].tolist() == [0, 0, 1, 0]
    assert a.loc[0, "flesch_reading_ease"] != 0.0
    b = (
        tag_attributes_ds(rd.from_pandas(df).repartition(4), taggers)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
