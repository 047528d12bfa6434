"""Property-based tests (hypothesis) for the pure-function layer.

The reference has no randomized testing (SURVEY.md §5.7); these guard
the invariants everything else leans on: total text extraction, key
round-trips, DuckDB-compatible rounding, whitespace-invariant
fingerprints.  No Ray involved — pure functions only.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from guacray.functions.keys import entity_key, parse_entity_key, slugify
from guacray.functions.rounding import round_half_away
from guacray.functions.text import extract_raw_triples, extract_text


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_text_total(blob):
    """Never throws, always returns str, deterministic, no outer ws."""
    out = extract_text(blob)
    assert isinstance(out, str)
    assert out == extract_text(blob)
    assert out == out.strip()


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_triples_total(text):
    for s, p, o, pr in extract_raw_triples(text):
        assert s and o and p


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_slugify_idempotent(name):
    s = slugify(name)
    assert slugify(s) == s or s == "guac-empty-@@"
    assert " " not in s


_qual_key = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
_qual_val = st.text(alphabet="0123456789xyz", min_size=0, max_size=5)


@given(st.sampled_from(["person", "org", "product", "place"]),
       st.text(min_size=1, max_size=40),
       st.dictionaries(_qual_key, _qual_val, max_size=4))
@settings(max_examples=200, deadline=None)
def test_entity_key_roundtrip(etype, name, quals):
    key = entity_key(etype, name, quals or None)
    et, slug, q = parse_entity_key(key)
    assert et == etype
    assert slug == slugify(name)
    assert q == quals


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@given(st.floats(min_value=-1e9, max_value=1e9,
                 allow_nan=False, allow_infinity=False),
       st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_round_matches_duckdb(x, dp):
    """The whole SQL-oracle parity strategy rests on this equivalence."""
    got = round_half_away(x, dp)
    exp = duckdb.sql(f"SELECT round({x!r}::DOUBLE, {dp})").fetchone()[0]
    assert got == exp or abs(got - exp) < 1e-12, (x, dp, got, exp)


@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.text(max_size=12), max_size=4))
@settings(max_examples=200, deadline=None)
def test_props_string_roundtrip(d):
    from guacray.functions.text import parse_props, props_string
    s = props_string(d)
    assert parse_props(s) == d
    # canonical: deterministic under key order
    assert s == props_string(dict(reversed(list(d.items()))))
