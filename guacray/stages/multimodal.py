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


class MediaResizer:
    """Actor-pool image-resize stage (the preprocessing step before
    batched model inference).

    Same honest-stub contract as MediaDecoder: ``decoder="fake"``
    produces a deterministic fake raster of the TARGET size (content-
    seeded, so output bytes are a pure function of input payload +
    target dims), ``decoder="real"`` marks where the PIL kernel goes.
    Payload dims metadata is updated — downstream stages see the real
    schema contract either way.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real image resize needs PIL — plug the kernel in here")
        self.w, self.h = target_w, target_h

    def _fake_resize(self, payload: bytes) -> bytes:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[4:], "big"))
        return rng.bytes(self.w * self.h * 3)  # fake RGB raster

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_img = [k == "image" for k in batch["kind"].to_pylist()]
        payloads = batch["payload"].to_pylist()
        out = [self._fake_resize(p) if img else p
               for p, img in zip(payloads, is_img)]
        t = pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out, type=pa.binary()),
            "mime": batch["mime"],
            "width": pa.array([self.w if img else w for img, w in
                               zip(is_img, batch["width"].to_pylist())],
                              type=pa.int32()),
            "height": pa.array([self.h if img else h for img, h in
                                zip(is_img, batch["height"].to_pylist())],
                               type=pa.int32()),
            "duration_ms": batch["duration_ms"],
        })
        return t


def resize_images(ds, *, target=(224, 224), decoder: str = "fake",
                  batch_size: int = 64, concurrency=(1, 4)):
    """Image rows resized to a fixed raster; non-image rows pass
    through.  Small batches: both input and output payloads are wide."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": target[0], "target_h": target[1],
                               "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class FrameSampler:
    """Actor-pool video frame sampler: one video row → N frame rows
    (flat-map explode, like the document-tree unpack but for media).

    ``decoder="fake"`` emits deterministic content-seeded frame
    payloads at evenly spaced timestamps; ``decoder="real"`` marks the
    ffmpeg slot.
    """

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real frame sampling needs ffmpeg — plug the kernel in here")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_nos, ts_ms, payloads = [], [], [], []
        for mid, kind, payload, dur in zip(
                batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
                batch["payload"].to_pylist(),
                batch["duration_ms"].to_pylist()):
            if kind != "video":
                continue
            seed = int.from_bytes(
                hashlib.blake2b(payload, digest_size=4).digest(), "big")
            rng = np.random.RandomState(seed)
            dur = max(1, dur)
            for f in range(self.n_frames):
                ids.append(mid)
                frame_nos.append(f)
                # evenly spaced sample timestamps across the duration
                ts_ms.append(int(dur * (f + 0.5) / self.n_frames))
                payloads.append(rng.bytes(1024))  # fake decoded frame
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_no": pa.array(frame_nos, type=pa.int32()),
            "ts_ms": pa.array(ts_ms, type=pa.int32()),
            "frame": pa.array(payloads, type=pa.binary()),
        })


def sample_frames(ds, *, n_frames: int = 4, decoder: str = "fake",
                  batch_size: int = 32, concurrency=(1, 4)):
    """video rows → frame rows (1:N explode inside the actor pass).
    Very small batches: each input row fans out to n_frames wide rows."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
