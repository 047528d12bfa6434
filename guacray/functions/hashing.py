"""Deterministic content hashing.

The reference allocates node IDs from an atomic counter behind a global
lock (/root/reference/pkg/assembler/backends/keyvalue/backend.go:234-237)
and dedups edges by an fnv128a hash of identifying fields
(keyvalue/isDependency.go:46-56).  A counter cannot be reproduced under
distributed execution, so every ID here is a content hash: same inputs ⇒
same ID on any worker, any cluster size, any run.  That property is what
makes the whole pipeline idempotent (re-ingest ⇒ byte-identical tables).
"""

from __future__ import annotations

import hashlib

# Separator that cannot occur inside a sanitized key component.
SEP = "\x1f"


def content_id(*parts: str) -> str:
    """128-bit hex id of the joined parts (order-sensitive).

    blake2b(digest_size=16) — stable across platforms/python versions,
    plays the role of the reference's fnv128a edge key.
    """
    h = hashlib.blake2b(SEP.join(parts).encode("utf-8"), digest_size=16)
    return h.hexdigest()


def document_ref(blob: bytes) -> str:
    """Blob-store key of a raw document: ``sha256_<hex>``.

    Mirrors the reference's blob key scheme
    (/root/reference/pkg/events/events.go:77-90).
    """
    return "sha256_" + hashlib.sha256(blob).hexdigest()


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()
