"""Deterministic DSSE attestation fixtures.

The signed-document slice of the synthetic corpus: in-toto-style JSON
statements about catalog products, wrapped in DSSE envelopes and signed
with ed25519 keys derived deterministically from the seed.  This is the
input shape the reference's ingestor receives from sigstore-style
collectors (envelope + trusted key material,
/root/reference/pkg/ingestor/verifier/sigstore_verifier/) — here it
feeds ``sources.readers.verify_dsse_stage`` →
``dsse_identity_triples`` so verified signing identities land in the
graph as first-class nodes.

Everything is a pure function of (seed, n): envelope bytes, key
material and therefore every minted node/edge id are stable across
processes — required because the flagship store path is deterministic
per fixture size and its DuckDB oracles re-derive from the persisted
checkpoint.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

N_KEYS = 4


def _priv_bytes(seed: int, i: int) -> bytes:
    return hashlib.blake2b(f"guacray-att-key-{seed}-{i}".encode(),
                           digest_size=32).digest()


def attestation_keys(seed: int = 42) -> dict[str, bytes]:
    """keyid → raw ed25519 PUBLIC key bytes (the trust map handed to
    ``verify_dsse_stage``).  keyids mimic the short-hash form real
    tooling uses."""
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey)
    from cryptography.hazmat.primitives.serialization import (
        Encoding, PublicFormat)
    out = {}
    for i in range(N_KEYS):
        pub = Ed25519PrivateKey.from_private_bytes(
            _priv_bytes(seed, i)).public_key().public_bytes(
                Encoding.Raw, PublicFormat.Raw)
        out[f"key-{hashlib.sha256(pub).hexdigest()[:12]}"] = pub
    return out


def write_attestations(out_dir: str, n: int = 24, seed: int = 42) -> dict:
    """Write ``n`` DSSE envelope files (``att-*.dsse``) and return the
    trust map from ``attestation_keys``.

    Deterministic negatives are included so the verify gate is actually
    exercised: every 8th envelope is signed by a key OUTSIDE the trust
    map (drops), and every 11th has its payload tampered after signing
    (signature check fails, drops).
    """
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey)

    from ..sources.readers import _pae
    from .catalog import build_catalog

    os.makedirs(out_dir, exist_ok=True)
    from cryptography.hazmat.primitives.serialization import (
        Encoding, PublicFormat)
    keys = attestation_keys(seed)
    keyids = sorted(keys)
    # keyids sort lexicographically (hash-derived), so map each keyid
    # back to its private key via the public bytes, not the index order
    pub_to_priv = {}
    for i in range(N_KEYS):
        priv = Ed25519PrivateKey.from_private_bytes(_priv_bytes(seed, i))
        pub = priv.public_key().public_bytes(Encoding.Raw,
                                             PublicFormat.Raw)
        pub_to_priv[pub] = priv
    privs = {kid: pub_to_priv[keys[kid]] for kid in keyids}
    rogue = Ed25519PrivateKey.from_private_bytes(
        _priv_bytes(seed, 10_000))

    products = build_catalog(seed).by_type("product")
    ptype = "application/vnd.in-toto+json"
    for i in range(n):
        subject = products[i % len(products)].canonical
        payload = json.dumps({
            "_type": "https://in-toto.io/Statement/v1",
            "subject": [{"name": subject, "digest": {
                "sha256": hashlib.sha256(
                    f"{seed}:{subject}:{i // len(products)}".encode())
                .hexdigest()}}],
            "predicateType": "https://slsa.dev/provenance/v1",
            "predicate": {"builder": {"id": f"builder-{i % 3}"}},
        }, sort_keys=True).encode()
        if i % 8 == 7:
            kid, priv = "key-rogue", rogue          # untrusted keyid
        else:
            kid = keyids[i % len(keyids)]
            priv = privs[kid]
        sig = priv.sign(_pae(ptype, payload))
        b64 = base64.b64encode(payload).decode()
        if i % 11 == 10:                            # tamper AFTER signing
            b64 = base64.b64encode(payload + b" ").decode()
        env = json.dumps({
            "payload": b64,
            "payloadType": ptype,
            "signatures": [{"keyid": kid,
                            "sig": base64.b64encode(sig).decode()}],
        }, sort_keys=True).encode()
        with open(os.path.join(out_dir, f"att-{i:04d}.dsse"), "wb") as f:
            f.write(env)
    return keys
