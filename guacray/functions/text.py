"""Deterministic HTML → text extraction and triple extraction.

These are THE reference semantics of this engine: single-threaded, pure
Python, no locale/threading dependence.  The distributed Ray pipeline
must reproduce them byte-identically per url (the conformance invariant
from BASELINE.json input_hint).  They play the role GUAC's processor +
parser stages play for SBOM documents
(/root/reference/pkg/handler/processor/process/process.go:197-221,
/root/reference/pkg/ingestor/parser/parser.go:203-231): decode/validate
a raw blob, then emit typed (subject, predicate, object) statements with
provenance.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterable

# --- HTML → text ----------------------------------------------------------

# Tags whose entire content is dropped (analog of the processor rejecting
# undecodable payloads, process.go:277-318).
_DROP_TAGS = ("script", "style", "noscript", "head")

_DROP_RE = re.compile(
    r"<(%s)\b[^>]*>.*?</\1\s*>" % "|".join(_DROP_TAGS),
    re.IGNORECASE | re.DOTALL,
)
# Block-level tags become newlines so sentence structure survives.
_BLOCK_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|article|section|header|footer|blockquote)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{2,}")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic plain-text extraction from raw HTML bytes.

    Rules (fixed forever — goldens depend on them):
      1. decode utf-8 (errors="replace")
      2. strip comments, then <script>/<style>/<noscript>/<head> subtrees
      3. block-level tags → newline; all other tags → ""
      4. unescape HTML entities
      5. collapse runs of spaces/tabs; strip each line; collapse blank
         lines; join with single "\n"; strip outer whitespace
    """
    s = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", s)
    s = _DROP_RE.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _htmllib.unescape(s)
    s = _WS_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(ln for ln in lines if ln)
    return s


# --- Sentence segmentation + mention/triple extraction --------------------

# Closed predicate vocabulary (the analog of GUAC's 17 typed edge lists,
# /root/reference/pkg/assembler/assembler.go:31-49).  Each pattern maps a
# sentence to exactly one (subj_surface, predicate, obj_surface).
# Surfaces are later entity-linked; unlinkable surfaces get fallback keys
# (the analog of GuacGenericPurl fallback minting,
# /root/reference/pkg/assembler/helpers/purl.go:258-295).
PREDICATE_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("works_at", re.compile(r"^(?P<s>.+?) works at (?P<o>.+?)$")),
    ("founded", re.compile(r"^(?P<s>.+?) founded (?P<o>.+?)$")),
    ("located_in", re.compile(r"^(?P<s>.+?) is located in (?P<o>.+?)$")),
    ("released", re.compile(r"^(?P<s>.+?) released (?P<o>.+?)$")),
    ("acquired", re.compile(r"^(?P<s>.+?) acquired (?P<o>.+?)$")),
    ("developed_by", re.compile(r"^(?P<s>.+?) is developed by (?P<o>.+?)$")),
    ("partnered_with", re.compile(r"^(?P<s>.+?) partnered with (?P<o>.+?)$")),
    ("ceo_of", re.compile(r"^(?P<s>.+?) is the CEO of (?P<o>.+?)$")),
    ("licensed_under", re.compile(
        r"^(?P<s>.+?) is licensed under (?P<o>.+?)$")),
]

PREDICATES = list(dict.fromkeys(p for p, _ in PREDICATE_PATTERNS))


def _verb_needle(pattern: re.Pattern[str]) -> str:
    """The literal verb phrase between the two capture groups — derived
    from the pattern source so a new/edited pattern can never drift
    from its pre-filter needle."""
    src = pattern.pattern
    return src[len("^(?P<s>.+?)"):-len("(?P<o>.+?)$")]


_PATTERNS_WITH_NEEDLES = [(p, pat, _verb_needle(pat))
                          for p, pat in PREDICATE_PATTERNS]

# Undirected ("equal") predicates — the HashEqual/PkgEqual semantics of
# the reference, where the edge is stored once regardless of statement
# orientation (/root/reference/pkg/assembler/assembler.go:84).
# partnered_with is symmetric in the web-text domain.
SYMMETRIC_PREDICATES = frozenset({"partnered_with"})

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def sentences(text: str) -> Iterable[str]:
    for line in text.split("\n"):
        for sent in _SENT_SPLIT_RE.split(line):
            sent = sent.strip()
            if sent:
                yield sent


# Typed statement properties — the analog of GUAC's per-edge InputSpec
# payloads (dependency type / VEX status / scan metadata,
# /root/reference/pkg/assembler/assembler.go:51-194).  Each predicate
# may derive properties from the raw object surface; properties are
# canonicalized to a sorted, URL-quoted "k=v&k=v" string (the same
# serialization entity_key uses for node qualifiers) so they sort,
# hash, and dedup as plain strings.
VERSION_RE = re.compile(r"^(?P<base>.+?) (?P<ver>\d+(?:\.\d+)+)$")


def props_string(props: dict[str, str]) -> str:
    import urllib.parse as _u
    return "&".join(f"{_u.quote(k, safe='')}={_u.quote(str(props[k]), safe='')}"
                    for k in sorted(props))


def parse_props(s: str) -> dict[str, str]:
    import urllib.parse as _u
    if not s:
        return {}
    out: dict[str, str] = {}
    for kv in s.split("&"):
        k, _, v = kv.partition("=")
        out[_u.unquote(k)] = _u.unquote(v)
    return out


# --- License statements (the CertifyLegal analog) -------------------------
#
# A licensed_under object is either a NAMED license identifier
# (KNOWN_LICENSES — the SPDX-list lookup of ParseLicenses,
# /root/reference/pkg/ingestor/parser/common/license.go:72-109) or
# INLINE license text quoted after "the terms": the object node is then
# MINTED by hashing the attached text, exactly the reference's
# ``LicenseRef-<fnv32a>`` scheme (HashLicense, license.go:111-116) — the
# one statement kind whose object identity comes from a long-text hash
# rather than a surface form.

KNOWN_LICENSES = frozenset({
    "MIT", "Apache-2.0", "GPL-3.0-only", "BSD-3-Clause", "MPL-2.0",
})

_INLINE_LICENSE_RE = re.compile(r'^the terms "(?P<t>.+)"$')


def fnv32a(data: str) -> int:
    """FNV-1a 32-bit (public-domain algorithm) — bit-identical to the
    reference's fnv.New32a() in HashLicense."""
    h = 0x811C9DC5
    for b in data.encode("utf-8"):
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def hash_license(inline_text: str) -> str:
    """``LicenseRef-<fnv32a hex>`` minting (license.go:111-116 parity:
    Go's %x — lowercase, no zero padding)."""
    return f"LicenseRef-{fnv32a(inline_text):x}"


def derive_props(pred: str, obj: str) -> tuple[str, str]:
    """(object surface, canonical props string) for a raw statement.

    works_at: a trailing " as <role>" clause becomes a ``role`` prop
    and is stripped from the object (the org surface links cleanly).
    released: a trailing version number becomes a ``version`` prop; the
    object keeps the full surface (versioned product aliases link as
    such, and the linker mints a version-qualified node).
    licensed_under: a quoted inline-text object is REPLACED by its
    minted ``LicenseRef-<fnv32a>`` identifier (HashLicense parity); the
    ``inline`` prop marks the statement as text-minted.
    """
    if pred == "works_at":
        parts = obj.rsplit(" as ", 1)
        if len(parts) == 2 and parts[0].strip() and parts[1].strip():
            return parts[0].strip(), props_string(
                {"role": parts[1].strip().lower()})
    elif pred == "released":
        m = VERSION_RE.match(obj)
        if m:
            return obj, props_string({"version": m.group("ver")})
    elif pred == "licensed_under":
        m = _INLINE_LICENSE_RE.match(obj)
        if m:
            return hash_license(m.group("t")), props_string(
                {"inline": "fnv32a"})
    return obj, ""


# --- In-document reference indirection -------------------------------------
#
# Documents can define a LOCAL anchor for an entity ("Acme Corp is
# referred to as AC-3f.") and reference the anchor in later (or
# earlier) statements.  Resolution through the per-document map happens
# BEFORE emission — the analog of CSAF's product_id → purl indirection,
# where statements name product_tree ids and the parser resolves them
# through the document's own table before building the package node
# (/root/reference/pkg/ingestor/parser/csaf/parser_csaf.go:208-228,
# ``findPkgSpec``).  Like the product_tree, the map is document-GLOBAL:
# a use before its definition still resolves.  First definition wins
# (deterministic); the definition sentence itself emits no statement.
#
# Statement patterns take PRECEDENCE over the definition pattern: a
# prose sentence that happens to contain the definition phrase but also
# matches a predicate ("Acme is located in the region that is referred
# to as the Rust Belt") is a statement, not a definition — only a
# sentence that matches NO predicate pattern can define an anchor.
# Without this rule ordinary prose would both lose its statement and
# mint a garbage anchor that corrupts later mentions in the document.

_ANCHOR_NEEDLE = " is referred to as "
_ANCHOR_DEF_RE = re.compile(
    r"^(?P<full>.+?) is referred to as (?P<a>.+?)$")


def match_statement(stripped: str):
    """First predicate pattern that matches the (punctuation-stripped)
    sentence, as ``(predicate, Match)``; None when the sentence is not a
    statement.  The verb-literal substring test is a necessary condition
    for its regex — a C-speed gate that skips the lazy-quantifier match
    attempt on the ~8 non-matching patterns per sentence (semantics
    identical; measured ~2× on the extraction UDF)."""
    for pred, pat, needle in _PATTERNS_WITH_NEEDLES:
        if needle not in stripped:
            continue
        m = pat.match(stripped)
        if m:
            return pred, m
    return None


def document_anchors(text: str) -> dict[str, str]:
    """Per-document anchor → full-surface map (the product_tree walk).
    Local definitions are authoritative within their document — they
    shadow any corpus-global meaning of the anchor string, exactly as a
    CSAF product_id is meaningless outside its document."""
    out: dict[str, str] = {}
    if _ANCHOR_NEEDLE not in text:
        return out
    for sent in sentences(text):
        stripped = sent.rstrip(".!?").strip()
        if _ANCHOR_NEEDLE not in stripped:
            continue
        if match_statement(stripped) is not None:
            continue  # statements outrank definitions
        m = _ANCHOR_DEF_RE.match(stripped)
        if m:
            out.setdefault(m.group("a").strip(), m.group("full").strip())
    return out


def extract_raw_triples(text: str) -> list[tuple[str, str, str, str]]:
    """text → [(subj_surface, predicate, obj_surface, props)], document
    order; ``props`` is the canonical sorted "k=v&k=v" string ("" when
    the statement carries none).

    Deterministic: first matching pattern wins per sentence (patterns are
    ordered); trailing sentence punctuation stripped from the object.
    Anchor mentions resolve through the per-document map before
    emission (and before ``derive_props``, so a resolved object still
    gets its role/version/license treatment) — a statement written via
    an anchor is THE SAME statement as one naming the entity directly,
    so their content-hash edges collapse downstream.
    """
    # one document-level scan gates ALL per-sentence anchor work: on a
    # corpus without definitions the hot loop pays nothing extra
    anchors = document_anchors(text) if _ANCHOR_NEEDLE in text else {}
    out: list[tuple[str, str, str, str]] = []
    for sent in sentences(text):
        stripped = sent.rstrip(".!?").strip()
        r = match_statement(stripped)
        if r is None:
            continue  # non-statements (incl. pure definitions) emit nothing
        pred, m = r
        subj = m.group("s").strip()
        obj = m.group("o").strip()
        if anchors:
            subj = anchors.get(subj, subj)
            obj = anchors.get(obj, obj)
        if subj and obj:
            obj, props = derive_props(pred, obj)
            out.append((subj, pred, obj, props))
    return out


# --- Language gate --------------------------------------------------------

# Pages whose lang is not in this set are dropped at normalize time
# (analog of the processor's validateFormat rejecting malformed docs,
# process.go:235-258).
ACCEPTED_LANGS = frozenset({"en", "de", "fr", "es"})
