"""Canonicalization key-function tests.

Mirrors the reference's purl/key round-trip unit tests
(/root/reference/pkg/assembler/helpers/purl_test.go, package_test.go).
Pinned literal hashes guard cross-run/cross-machine ID stability — the
property that replaces GUAC's atomic ID counter.
"""

from guacray.functions.hashing import content_id, document_ref
from guacray.functions.keys import (EMPTY, edge_id, entity_key,
                                    fallback_key, node_id, slugify)


def test_slugify():
    assert slugify("Acme Corp") == "acme-corp"
    assert slugify("  We!rd--Name  ") == "we-rd-name"
    assert slugify("") == EMPTY
    assert slugify("!!!") == EMPTY


def test_entity_key_shape():
    assert entity_key("Org", "Acme Corp") == "ent:org::acme-corp"
    k = entity_key("org", "Acme", {"b": "2", "a": "1"})
    assert k == "ent:org::acme::a=1&b=2"  # qualifiers sorted


def test_fallback_key_escaping():
    assert fallback_key("Visitor 42") == "ent:unknown::visitor%2042"


def test_ids_pinned():
    # If these change, every persisted graph breaks: treat as frozen.
    assert content_id("x") == "442a44457137672b3218c1007dc8f76a"
    assert node_id("ent:org::acme-corp") == "32955484095fa4c49e8e6be657793025"
    assert edge_id("a", "works_at", "b") == "f17a2b956c7198b414cafc284ebefa9c"
    assert document_ref(b"hello") == (
        "sha256_2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")


def test_id_injectivity_separator():
    # SEP prevents ("ab","c") colliding with ("a","bc")
    assert content_id("ab", "c") != content_id("a", "bc")


def test_parse_entity_key_roundtrip():
    from guacray.functions.keys import parse_entity_key
    assert parse_entity_key(entity_key("Org", "Acme Corp")) == \
        ("org", "acme-corp", {})
    k = entity_key("org", "Acme", {"b": "2", "a": "1"})
    assert parse_entity_key(k) == ("org", "acme", {"a": "1", "b": "2"})
    import pytest
    with pytest.raises(ValueError):
        parse_entity_key("pkg:npm/foo")
