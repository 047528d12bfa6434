"""Normalize/extract function tests — the conformance invariant layer.

Mirrors the reference's processor/guesser unit-test pattern
(/root/reference/pkg/handler/processor/guesser/guesser_test.go et al.).
"""

from guacray.data.pages import generate_pages
from guacray.functions.text import (extract_raw_triples, extract_text,
                                    sentences)


def test_extract_text_basic():
    html = (b"<html><head><title>T</title><script>x=1</script></head>"
            b"<body><h1>Head</h1><p>One two.</p><p>Three &amp; four.</p>"
            b"</body></html>")
    assert extract_text(html) == "Head\nOne two.\nThree & four."


def test_extract_text_malformed_and_entities():
    html = b"<html><body><h1>A<p>b &lt; c<div>d"
    assert extract_text(html) == "A\nb < c\nd"


def test_extract_text_deterministic_bytes():
    html = "café <p>résumé</p>".encode("utf-8")
    out1 = extract_text(html)
    out2 = extract_text(bytes(html))
    assert out1 == out2 == "café\nrésumé"


def test_text_invariant_pages_table(tiny_pages):
    """pages.text column is byte-identical to extract_text(html) per url."""
    for row in tiny_pages.to_pylist():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_sentences_and_triples():
    text = "Alpha works at Beta Corp. Noise here. Beta Corp acquired Gamma Labs."
    assert list(sentences(text)) == [
        "Alpha works at Beta Corp.", "Noise here.",
        "Beta Corp acquired Gamma Labs."]
    assert extract_raw_triples(text) == [
        ("Alpha", "works_at", "Beta Corp", ""),
        ("Beta Corp", "acquired", "Gamma Labs", "")]


def test_pages_generator_deterministic():
    a = generate_pages(32)
    b = generate_pages(32)
    assert a.equals(b)
    c = generate_pages(32, seed=7)
    assert not a.equals(c)


def test_quarantine_reconciles(tiny_pages):
    """gated + normalized == input (dead-letter completeness)."""
    import ray.data as rd
    from guacray.stages.normalize import normalize, quarantined
    ds = rd.from_arrow(tiny_pages)
    n_ok = normalize(ds).count()
    bad = quarantined(ds).to_pandas()
    assert n_ok + len(bad) == tiny_pages.num_rows
    assert (bad["reason"] == "lang_not_accepted").all()
    assert set(bad["lang"]) == {"zz"}


def test_guess_kind(tiny_pages):
    import ray.data as rd
    from guacray.stages.normalize import guess_kind, normalize
    assert guess_kind(b"<html><body><h1>x<p>y") == "malformed"
    assert guess_kind(b"<html><body><p>y</p></body></html>") == "article"
    out = normalize(rd.from_arrow(tiny_pages)).to_pandas()
    assert set(out["kind"]) <= {"article", "malformed", "page"}
    assert (out["kind"] == "malformed").sum() >= 1  # error-path fixture


def test_unicode_through_extraction_and_linking():
    """Non-ASCII surfaces survive extraction, linking, and id hashing."""
    from guacray.functions.text import extract_raw_triples, extract_text
    from guacray.stages.link import Linker
    from guacray.functions.keys import fallback_key
    import pyarrow as pa

    html = ("<html><body><p>Søren Kierkegård works at Müller GmbH. "
            "Müller GmbH is located in Zürich.</p></body></html>").encode()
    text = extract_text(html)
    triples = extract_raw_triples(text)
    assert ("Søren Kierkegård", "works_at", "Müller GmbH", "") in triples
    assert ("Müller GmbH", "located_in", "Zürich", "") in triples

    lk = Linker({"müller gmbh": ("org", "Müller GmbH")})
    batch = pa.table({
        "url": ["u"] * 2, "warc_ts": pa.array([0, 0], type=pa.timestamp("us", tz="UTC")),
        "document_ref": ["d"] * 2,
        "subj_surface": [t[0] for t in triples],
        "predicate": [t[1] for t in triples],
        "obj_surface": [t[2] for t in triples],
    })
    out = lk(batch).to_pylist()
    assert out[0]["obj_key"] == "ent:org::m-ller-gmbh"  # slug is ascii-safe
    assert out[0]["subj_key"] == fallback_key("Søren Kierkegård")
    assert all(len(r["edge_id"]) == 32 for r in out)


def test_license_minting_fnv32a_parity():
    """HashLicense parity (common/license.go:111-116): fnv-1a 32-bit,
    lowercase %x, 'LicenseRef-' prefix.  0x4f9f2cab is the published
    FNV-1a test vector for 'hello'."""
    from guacray.functions.text import fnv32a, hash_license
    assert fnv32a("hello") == 0x4F9F2CAB
    assert fnv32a("") == 0x811C9DC5  # offset basis
    assert hash_license("hello") == "LicenseRef-4f9f2cab"


def test_license_statement_extraction():
    from guacray.functions.text import extract_raw_triples, hash_license
    text = ('WidgetPro is licensed under MIT. '
            'GizmoX 2.0 is licensed under the terms '
            '"use freely without warranty".')
    got = extract_raw_triples(text)
    assert got[0] == ("WidgetPro", "licensed_under", "MIT", "")
    minted = hash_license("use freely without warranty")
    assert got[1] == ("GizmoX 2.0", "licensed_under", minted,
                      "inline=fnv32a")
    assert minted.startswith("LicenseRef-")


def test_license_surfaces_link_structurally():
    """License ids never consult the alias map and keep their exact
    surface as the canonical name — node_type 'license'."""
    from guacray.functions.keys import link_surface
    from guacray.functions.text import hash_license
    for s in ("Apache-2.0", "MIT", hash_license("some text")):
        etype, key, name = link_surface(s, {"apache-2.0": ("org", "X")})
        assert etype == "license" and name == s
        assert key.startswith("ent:license::")


def test_document_anchors_golden():
    """Hand-pinned golden for the in-document indirection (CSAF
    findPkgSpec analog): definitions collected document-globally,
    first definition wins, use-before-definition resolves, the
    definition sentence emits no statement, and resolution happens
    before derive_props."""
    from guacray.functions.text import document_anchors, extract_raw_triples

    text = ("Judy Hopps works at AC-1. "            # use BEFORE definition
            "Acme Corp is referred to as AC-1. "
            "Tyrell Labs is referred to as AC-1. "  # loser: first wins
            "AC-1 is located in Berlin. "
            "AC-1 released NanoSuite 2.0. "         # derive_props after
            "Nick Wilde works at Initech.")         # untouched direct stmt
    assert document_anchors(text) == {"AC-1": "Acme Corp"}
    assert extract_raw_triples(text) == [
        ("Judy Hopps", "works_at", "Acme Corp", ""),
        ("Acme Corp", "located_in", "Berlin", ""),
        ("Acme Corp", "released", "NanoSuite 2.0", "version=2.0"),
        ("Nick Wilde", "works_at", "Initech", ""),
    ]
    # a definition whose sides carry verb needles still emits nothing
    assert extract_raw_triples(
        "The org located in Berlin is referred to as B-9.") == []
    # no definitions -> resolution is a no-op (empty-map fast path)
    assert extract_raw_triples("Judy Hopps works at AC-1.") == [
        ("Judy Hopps", "works_at", "AC-1", "")]


def test_statement_outranks_definition():
    """Ordinary prose containing the definition phrase mid-sentence is a
    STATEMENT, not a definition: the predicate match wins, the statement
    is emitted, and no garbage anchor is minted to corrupt later
    mentions in the same document."""
    from guacray.functions.text import document_anchors, extract_raw_triples

    text = ("Acme Corp is located in the region that is referred to as "
            "the Rust Belt. Judy Hopps works at the Rust Belt.")
    # the prose sentence emits its located_in statement verbatim...
    assert extract_raw_triples(text) == [
        ("Acme Corp", "located_in",
         "the region that is referred to as the Rust Belt", ""),
        # ...and 'the Rust Belt' is NOT remapped by a phantom anchor
        ("Judy Hopps", "works_at", "the Rust Belt", ""),
    ]
    assert document_anchors(text) == {}


def test_anchored_pages_distributed_parity():
    """Distributed pipeline == single-threaded reference oracle on the
    anchored fixture, and resolved statements collapse with directly
    stated ones (same content-hash edge)."""
    import ray.data as rd

    from guacray.data.pages import generate_anchored_pages
    from guacray.data.reference import reference_triples
    from guacray.pipelines.kg import kg_datasets

    pages = generate_anchored_pages(48, seed=42)
    got = kg_datasets(rd.from_arrow(pages))["triples"].to_pandas()
    ref = reference_triples(pages)
    key = ["document_ref", "subj_key", "predicate", "obj_key", "props"]
    assert sorted(map(tuple, got[key].values)) == \
        sorted((r["document_ref"], r["subj_key"], r["predicate"],
                r["obj_key"], r["props"]) for r in ref)
    # no anchor string survives extraction: every surface resolved
    assert not got["subj_surface"].str.contains("-", regex=False) \
        .where(got["subj_type"] == "unknown", False).any()
    assert not (got["obj_surface"].str.match(r"^[A-Z]+-[0-9a-f]{2}$")).any()
    assert not (got["subj_surface"].str.match(r"^[A-Z]+-[0-9a-f]{2}$")).any()
