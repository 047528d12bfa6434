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
    """The whole SQL-oracle parity strategy rests on this equivalence.

    The value is BOUND, not embedded as a literal: DuckDB parses float
    literals through DECIMAL and silently loses precision for
    significands above 2^53 (found by hypothesis via
    900719925.5889549, whose literal parse is a DIFFERENT double) —
    the real oracles compare values read from the same parquet, which
    binding replicates."""
    got = round_half_away(x, dp)
    con = duckdb.connect()
    exp = con.execute(f"SELECT round(?, {dp})", [x]).fetchone()[0]
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


@given(st.lists(st.text(alphabet="ab xy", max_size=30), max_size=8),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=200, deadline=None)
def test_ngram_explode_matches_brute(texts, k):
    """The vectorized Arrow n-gram kernel equals the per-row Python
    definition (single-space split, k-windows within one doc, distinct
    per doc) on arbitrary text incl. empty strings and runs of
    spaces."""
    import pyarrow as pa

    from guacray.stages.ngrams import ngram_explode_batch
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = ngram_explode_batch(batch, k)
    got = set(zip(out["doc_id"].to_pylist(), out["ngram"].to_pylist()))
    want = set()
    for i, t in enumerate(texts):
        w = t.split(" ")
        for j in range(len(w) - k + 1):
            want.add((i, " ".join(w[j:j + k])))
    assert got == want
