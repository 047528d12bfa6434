"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct,
processed by actor-pool ``map_batches`` stages.  The decode kernels
themselves are STUBBED (no image/audio libraries in this environment):
``decoder="fake"`` gives a deterministic fake decode so the Ray-side
plumbing — schema, batch sizing, actor lifecycle, output layout — is
real and tested; ``decoder="real"`` raises NotImplementedError at actor
construction, marking exactly where a PIL/ffmpeg kernel would slot in.

Scale notes: binary payloads make rows wide — callers should use small
``batch_size`` (64-256) and let the object store spill; the feature
output is narrow (fixed-size float vector), so downstream stages are
cheap again.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class MediaDecoder:
    """Actor-pool decode/feature stage.

    __init__ loads the (stubbed) decode kernel once per actor; __call__
    maps a batch of payloads to fixed-size feature vectors.
    """

    FEAT_DIM = 32

    def __init__(self, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real media decoding needs PIL/ffmpeg — not available in "
                "this environment; plug the kernel in here")
        self.decoder = decoder

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic fake: hash-seeded feature vector, so pipelines
        # and tests have stable, content-dependent outputs
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.standard_normal(self.FEAT_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._fake_decode(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "features": pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())),
            "payload_sha256": pa.array(
                [hashlib.sha256(p).hexdigest()
                 for p in batch["payload"].to_pylist()],
                type=pa.string()),
        })


def extract_media_features(ds, *, decoder: str = "fake",
                           batch_size: int = 128, concurrency=(1, 4)):
    """media table → features table via an actor pool (small batches:
    payloads are wide)."""
    return ds.map_batches(MediaDecoder,
                          fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media fixture (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 512)))
        rows.append({
            "media_id": f"m{i:06d}", "kind": kind, "payload": payload,
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": 64 if kind != "audio" else -1,
            "height": 64 if kind != "audio" else -1,
            "duration_ms": -1 if kind == "image" else int(rng.randint(1000, 60000)),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
