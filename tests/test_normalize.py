"""F1–F4 pinned fixtures (FIXTURES.md §3) + idempotence properties."""

import pandas as pd

from osm_addr_tools_spark.functions import normalize as N

HN_CASES = [
    ("12 a", "12A"),
    ("012", "12"),
    ("12/3", "12/3"),
    ("12\\3", "12/3"),
    (" 7 ", "7"),
    ("12A", "12A"),
    ("", ""),
    ("12 / 3", "12/3"),
    ("007", "7"),
    ("10", "10"),
    ("100", "100"),
    ("12  b", "12B"),
]

STREET_CASES = [
    ("Ul. Długa", "długa"),
    ("ul.   Krótka 3 Maja", "krótka 3 maja"),
    ("Al. Jerozolimskie", "aleja jerozolimskie"),
    ("ULICA Długa", "długa"),
    ("Pl. Wolności", "plac wolności"),
    ("Main St.", "main st"),
    ("Park Ave.", "park ave"),
    ("Os. Zielone", "osiedle zielone"),
    ("  kwiatowa  ", "kwiatowa"),
    ("", ""),
]


def test_norm_housenumber_fixtures():
    got = N.norm_housenumber(pd.Series([c[0] for c in HN_CASES]))
    assert got.tolist() == [c[1] for c in HN_CASES]


def test_norm_street_fixtures():
    got = N.norm_street(pd.Series([c[0] for c in STREET_CASES]))
    assert got.tolist() == [c[1] for c in STREET_CASES]


def test_idempotence():
    hn = pd.Series([c[0] for c in HN_CASES])
    st = pd.Series([c[0] for c in STREET_CASES])
    assert N.norm_housenumber(N.norm_housenumber(hn)).tolist() == N.norm_housenumber(hn).tolist()
    assert N.norm_street(N.norm_street(st)).tolist() == N.norm_street(st).tolist()


def test_street_similarity_pinned():
    a = pd.Series(["długa", "długa", "abc", ""])
    b = pd.Series(["długa", "długą", "xyz", ""])
    got = N.street_similarity(a, b)
    assert got[0] == 1.0
    assert 0.7 < got[1] < 1.0
    assert got[2] == 0.0
    assert got[3] == 1.0  # both empty → ratio 1 by difflib convention


def test_addr_key_street_place_fallback():
    key = N.addr_key(
        pd.Series(["Adamowo", "Adamowo"]),
        pd.Series(["Ul. Długa", None]),
        pd.Series([None, "Os. Zielone"]),
        pd.Series(["12 a", "012"]),
    )
    assert key.tolist() == ["adamowo|długa|12A", "adamowo|osiedle zielone|12"]
