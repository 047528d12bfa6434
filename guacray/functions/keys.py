"""Canonical entity-identity key functions.

Mirrors the *shape* of GUAC's node-identity scheme — a typed trie key
with sorted qualifiers and an explicit empty-component sentinel
(``guac-empty-@@``, /root/reference/pkg/assembler/helpers/package.go:26-99;
artifact keys lowercased alg:digest, helpers/artifact.go:33-43; vuln keys
lowercased type::id, helpers/vuln.go:31-44) — re-targeted at web-text
entities (person / org / product / place).

Key grammar:  ``ent:<type>::<slug>[::k=v&k=v...]``
  - <type>  lowercased entity type
  - <slug>  sanitized canonical name (lowercase, [a-z0-9_] runs joined
            by "-"); empty slug → EMPTY sentinel
  - qualifiers sorted by key (GUAC sorts qualifier keys the same way)

node_id = content_id(node_key) — deterministic 128-bit hex (never a
counter; see functions/hashing.py).
"""

from __future__ import annotations

import re
import urllib.parse

from .hashing import content_id

EMPTY = "guac-empty-@@"  # same sentinel idea as the reference

_SLUG_RE = re.compile(r"[^a-z0-9]+")

ENTITY_TYPES = ("person", "org", "product", "place", "unknown")


def slugify(name: str) -> str:
    """Deterministic sanitization of a surface/canonical name."""
    s = _SLUG_RE.sub("-", name.lower()).strip("-")
    return s or EMPTY


def entity_key(etype: str, name: str, qualifiers: dict[str, str] | None = None) -> str:
    """Canonical node key for a linked entity."""
    key = f"ent:{etype.lower()}::{slugify(name)}"
    if qualifiers:
        q = "&".join(f"{k}={qualifiers[k]}" for k in sorted(qualifiers))
        key += f"::{q}"
    return key


def fallback_key(surface: str) -> str:
    """Identity minted for an unlinkable mention — the analog of
    GuacGenericPurl fallback minting with URL-escaped segments
    (/root/reference/pkg/assembler/helpers/purl.go:258-295)."""
    return "ent:unknown::" + urllib.parse.quote(surface.strip().lower(), safe="")


def parse_entity_key(key: str) -> tuple[str, str, dict[str, str]]:
    """Inverse of ``entity_key`` — (etype, slug, qualifiers).

    The round-trip analog of PkgToPurl/PurlToPkg
    (/root/reference/pkg/assembler/helpers/purl.go:101-151): a canonical
    key must decompose losslessly so trie-level rollups (group by type,
    type+slug, …) are plain column operations.
    """
    if not key.startswith("ent:"):
        raise ValueError(f"not an entity key: {key!r}")
    body = key[4:]
    parts = body.split("::")
    etype = parts[0]
    slug = parts[1] if len(parts) > 1 else EMPTY
    quals: dict[str, str] = {}
    if len(parts) > 2 and parts[2]:
        for kv in parts[2].split("&"):
            k, _, v = kv.partition("=")
            quals[k] = v
    return etype, slug, quals


def node_id(node_key: str) -> str:
    return content_id("node", node_key)


def edge_id(subj_id: str, predicate: str, obj_id: str) -> str:
    """Content key of a canonical edge (subject, predicate, object).

    Evidence (document_ref/url/warc_ts) lives in the separate evidence
    table, keyed by this edge_id — the reference instead folds provenance
    into per-edge props and dedups on the full hash
    (keyvalue/isDependency.go:46-56); we split identity from evidence so
    the edges table stays small and the evidence table stays append-only.
    """
    return content_id("edge", subj_id, predicate, obj_id)
