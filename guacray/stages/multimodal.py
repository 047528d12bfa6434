"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct,
processed by actor-pool ``map_batches`` stages.  Two kernel modes:

``decoder="real"`` — REAL pure-Python/numpy kernels for all three
modalities: PPM (P5/P6) and uncompressed 24-bit BMP raster decode with
box-filter (area-average) resize and P6 re-encode; y4m (YUV4MPEG2)
video frame decode/sampling; RIFF/WAVE PCM audio decode with a DSP
feature summary (RMS/ZCR/log-band spectrum).  No PIL/ffmpeg needed;
containers outside these formats (jpeg/mp3/mp4/…) dead-letter per row
via the ``error`` column — that is the documented slot where the
external-lib kernel would plug in.

``decoder="fake"`` — deterministic content-seeded fake decode, so the
Ray-side plumbing (schema, batch sizing, actor lifecycle, output
layout) is testable independent of payload formats.

Scale notes: binary payloads make rows wide — callers should use small
``batch_size`` (64-256) and let the object store spill; the feature
output is narrow (fixed-size float vector), so downstream stages are
cheap again.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ------------------------------------------------ pure-Python raster io

def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 (binary RGB) / P5 (binary gray) → HxWx3 uint8 array.
    Handles whitespace/comment tokens per the netpbm spec; maxval must
    be ≤ 255 (8-bit)."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and '#' comments, then read one integer token
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace byte after maxval
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    img = data.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → HxWx3 uint8
    (RGB).  Rows are 4-byte padded; bottom-up unless height < 0."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported "
                         f"(bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_raster(payload: bytes) -> np.ndarray:
    """Format-sniffing raster decode (PPM/PGM/BMP)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unsupported raster format "
                     f"(magic={payload[:2]!r}); real kernel covers "
                     "PPM/PGM/BMP — plug PIL in here for the rest")


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def box_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Area-average (box-filter) resize, fully vectorized via
    np.add.reduceat over bucket edges.  Downscale averages each source
    region; upscale degenerates to pixel replication (empty reduceat
    slices return the single source pixel)."""
    h, w, _ = img.shape
    row_edges = (np.arange(th) * h) // th
    col_edges = (np.arange(tw) * w) // tw
    sums = np.add.reduceat(
        np.add.reduceat(img.astype(np.float64), row_edges, axis=0),
        col_edges, axis=1)
    row_n = np.maximum(np.diff(np.append(row_edges, h)), 1)
    col_n = np.maximum(np.diff(np.append(col_edges, w)), 1)
    counts = (row_n[:, None] * col_n[None, :]).astype(np.float64)
    out = sums / counts[:, :, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _yuv_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-size Y/Cb/Cr planes → HxWx3 RGB uint8 (BT.601 full-range)."""
    yf, cbf, crf = (p.astype(np.float64) for p in (y, cb, cr))
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """YUV4MPEG2 stream → (list of HxWx3 RGB frames, (fps_num, fps_den)).

    Supports C420* (chroma upsampled by replication) and C444 — the
    uncompressed interchange format of the ffmpeg/x264 toolchain, fully
    decodable without any media library."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", errors="strict")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    csp = "420"
    for tok in header.split()[1:]:
        c, v = tok[0], tok[1:]
        if c == "W":
            w = int(v)
        elif c == "H":
            h = int(v)
        elif c == "F":
            n, d = v.split(":")
            fps = (int(n), int(d))
        elif c == "C":
            csp = v
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if csp.startswith("420"):
        cw, chh = w // 2, h // 2
    elif csp.startswith("444"):
        cw, chh = w, h
    else:
        raise ValueError(f"unsupported y4m colourspace C{csp}")
    fsize = w * h + 2 * cw * chh
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed y4m FRAME marker")
        pos = fnl + 1
        if pos + fsize > len(payload):
            raise ValueError("truncated y4m frame")
        y = np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w)
        cb = np.frombuffer(payload, np.uint8, cw * chh,
                           pos + w * h).reshape(chh, cw)
        cr = np.frombuffer(payload, np.uint8, cw * chh,
                           pos + w * h + cw * chh).reshape(chh, cw)
        if cw != w:  # 4:2:0 → replicate chroma up to full size
            cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
            cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
        frames.append(_yuv_to_rgb(y, cb, cr))
        pos += fsize
    return frames, fps


def encode_y4m(frames_rgb: list[np.ndarray],
               fps: tuple[int, int] = (25, 1)) -> bytes:
    """RGB frames → YUV4MPEG2 C444 stream (BT.601 full-range forward
    transform) — the fixture writer for the real frame-sample path."""
    h, w, _ = frames_rgb[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n"
           % (w, h, fps[0], fps[1])]
    for img in frames_rgb:
        x = img.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 + (b - y) * 0.564334
        cr = 128.0 + (r - y) * 0.713267
        out.append(b"FRAME\n")
        for plane in (y, cb, cr):
            out.append(np.clip(np.rint(plane), 0, 255)
                       .astype(np.uint8).tobytes())
    return b"".join(out)


def raster_features(img: np.ndarray) -> np.ndarray:
    """Deterministic 32-dim feature vector from a decoded raster:
    per-channel mean(3) + std(3) + 8-bin histogram(24) + log-area +
    aspect ratio = 32 — the classic cheap image descriptor."""
    x = img.astype(np.float64)
    means = x.mean(axis=(0, 1)) / 255.0
    stds = x.std(axis=(0, 1)) / 255.0
    hists = [np.histogram(img[:, :, c], bins=8, range=(0, 256))[0]
             for c in range(3)]
    hist = np.concatenate(hists).astype(np.float64)
    hist = hist / max(1.0, hist.sum() / 3.0)
    h, w, _ = img.shape
    extras = np.array([np.log1p(h * w) / 20.0, w / max(1, h)])
    return np.concatenate([means, stds, hist, extras]).astype(np.float32)

# ------------------------------------------------- pure-Python audio io


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM decode via the stdlib ``wave`` module (8/16/32-bit
    PCM, any channel count) → (mono float samples in [-1, 1],
    sample_rate).  Compressed codecs (mp3/aac/…) need external libs and
    dead-letter via the caller's error column."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8)
             .astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw}")
    return x.reshape(-1, nch).mean(axis=1), sr


def encode_wav(x: np.ndarray, sr: int) -> bytes:
    """Mono float [-1, 1] → 16-bit PCM WAV bytes (fixture encoder)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1.0, 1.0) * 32767.0)
                      .astype("<i2").tobytes())
    return buf.getvalue()


def audio_features(x: np.ndarray, sr: int, dim: int = 32) -> np.ndarray:
    """Deterministic audio descriptor: duration_s, RMS, zero-crossing
    rate, peak + (dim-4) log-spaced spectral band energies (energy-
    normalized rfft magnitudes) — the classic cheap DSP summary, pure
    numpy."""
    n = len(x)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
           if n > 1 else 0.0)
    head = np.array([n / sr, float(np.sqrt(np.mean(x * x))), zcr,
                     float(np.max(np.abs(x)))])
    spec = np.abs(np.fft.rfft(x))
    nb = dim - 4
    edges = np.geomspace(1, max(len(spec), 2), nb + 1).astype(np.int64)
    bands = np.zeros(nb)
    for i in range(nb):
        lo, hi = edges[i], max(edges[i + 1], edges[i] + 1)
        if lo < len(spec):
            bands[i] = spec[lo:hi].mean()
    tot = bands.sum()
    if tot > 0:
        bands = bands / tot
    return np.concatenate([head, bands]).astype(np.float32)


def video_features(frames: list[np.ndarray]) -> np.ndarray:
    """Raster descriptor of the MEAN frame, with the two geometry
    slots repurposed for temporal structure: log frame count and mean
    absolute inter-frame difference (motion energy)."""
    mean_frame = np.mean([f.astype(np.float64) for f in frames], axis=0)
    feat = raster_features(np.clip(mean_frame, 0, 255).astype(np.uint8))
    motion = 0.0
    if len(frames) > 1:
        motion = float(np.mean([
            np.mean(np.abs(frames[i + 1].astype(np.float64)
                           - frames[i].astype(np.float64)))
            for i in range(len(frames) - 1)])) / 255.0
    feat[30] = np.float32(np.log1p(len(frames)) / 10.0)
    feat[31] = np.float32(motion)
    return feat


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
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder mode: {decoder}")
        self.decoder = decoder

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic fake: hash-seeded feature vector, so pipelines
        # and tests have stable, content-dependent outputs
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.standard_normal(self.FEAT_DIM).astype(np.float32)

    def _decode(self, payload: bytes, kind: str) -> tuple[np.ndarray, str]:
        if self.decoder == "fake":
            return self._fake_decode(payload), ""
        kernels = {
            "image": lambda p: raster_features(decode_raster(p)),
            "audio": lambda p: audio_features(*decode_wav(p),
                                              dim=self.FEAT_DIM),
            "video": lambda p: video_features(decode_y4m(p)[0]),
        }
        kernel = kernels.get(kind)
        if kernel is None:
            return (np.zeros(self.FEAT_DIM, dtype=np.float32),
                    f"NotImplementedError: no real kernel for "
                    f"kind={kind}")
        try:
            return kernel(payload), ""
        except Exception as e:
            # unsupported container/codec (e.g. mp3/mp4 need ffmpeg):
            # dead-letter per row, keep the batch going
            return (np.zeros(self.FEAT_DIM, dtype=np.float32),
                    f"{type(e).__name__}: {e}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats, errors = [], []
        for p, k in zip(payloads, kinds):
            f, err = self._decode(p, k)
            feats.append(f)
            errors.append(err)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "features": pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())),
            "payload_sha256": pa.array(
                [hashlib.sha256(p).hexdigest() for p in payloads],
                type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
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


def _encode_bmp24(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit bottom-up BMP (fixture
    writer for the real decode path)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for row in img[::-1]:  # bottom-up
        bgr = row[:, ::-1].astype(np.uint8).tobytes()
        pix += bgr + b"\x00" * (stride - len(bgr))
    off = 14 + 40
    size = off + len(pix)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
           + off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
           + b"\x00" * 16)
    return hdr + bytes(pix)


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fixture with REAL payload formats the pure-Python
    kernels decode: P6 PPM / 24-bit BMP gradient images, y4m gradient
    videos, 16-bit PCM WAV harmonic tones."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "video", "image", "audio"]
    for i in range(n):
        kind = kinds[i % 4]
        w, h = 8 + int(rng.randint(0, 9)) * 2, 8 + int(rng.randint(0, 5)) * 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * 255) // max(1, w - 1)).astype(np.uint8)
        img = np.stack([base,
                        ((yy * 255) // max(1, h - 1)).astype(np.uint8),
                        np.full((h, w), (i * 37) % 256, np.uint8)], axis=2)
        if kind == "image":
            payload = encode_ppm(img) if i % 4 == 0 else _encode_bmp24(img)
            mime = ("image/x-portable-pixmap" if i % 4 == 0
                    else "image/bmp")
            dur = -1
        elif kind == "video":
            nf = 3 + int(rng.randint(0, 4))
            frames = [np.clip(img.astype(np.int32) + 11 * f, 0, 255)
                      .astype(np.uint8) for f in range(nf)]
            payload = encode_y4m(frames, fps=(10, 1))
            mime = "video/x-yuv4mpeg"
            dur = nf * 100
        else:
            sr = 8000
            dur_s = 0.25 + float(rng.randint(0, 4)) * 0.25
            t = np.arange(int(sr * dur_s)) / sr
            f0 = 110.0 * (1 + (i % 7))
            payload = encode_wav(0.6 * np.sin(2 * np.pi * f0 * t)
                                 + 0.3 * np.sin(2 * np.pi * 2 * f0 * t),
                                 sr)
            mime = "audio/wav"
            w = h = -1
            dur = int(dur_s * 1000)
        rows.append({"media_id": f"m{i:06d}", "kind": kind,
                     "payload": payload, "mime": mime,
                     "width": w, "height": h, "duration_ms": dur})
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
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder mode: {decoder}")
        self.w, self.h = target_w, target_h
        self.decoder = decoder

    def _fake_resize(self, payload: bytes) -> bytes:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[4:], "big"))
        return rng.bytes(self.w * self.h * 3)  # fake RGB raster

    def _resize(self, payload: bytes) -> tuple[bytes, str]:
        """Returns (payload, error).  error == "" means the payload WAS
        resized; a non-empty error means pass-through — the caller must
        keep the original metadata (reporting target dims on an
        untouched payload would lie to downstream consumers)."""
        if self.decoder == "fake":
            return self._fake_resize(payload), ""
        # real kernel: decode (PPM/PGM/BMP) → box filter → P6 encode;
        # undecodable payloads pass through unchanged WITH an error mark
        # (resize is best-effort; the decoder stage owns dead-lettering)
        try:
            return encode_ppm(box_resize(decode_raster(payload),
                                         self.w, self.h)), ""
        except Exception as e:
            return payload, f"resize pass-through: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_img = [k == "image" for k in batch["kind"].to_pylist()]
        payloads = batch["payload"].to_pylist()
        out, errors = [], []
        for p, img in zip(payloads, is_img):
            o, err = self._resize(p) if img else (p, "")
            out.append(o)
            errors.append(err)
        resized = [img and not err for img, err in zip(is_img, errors)]
        mimes = batch["mime"].to_pylist()
        if self.decoder == "real":
            mimes = ["image/x-portable-pixmap" if ok and o[:2] == b"P6"
                     else m for ok, o, m in zip(resized, out, mimes)]
        t = pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            # pass-through rows KEEP their original dims — metadata must
            # describe the payload actually emitted
            "width": pa.array([self.w if ok else w for ok, w in
                               zip(resized, batch["width"].to_pylist())],
                              type=pa.int32()),
            "height": pa.array([self.h if ok else h for ok, h in
                                zip(resized, batch["height"].to_pylist())],
                               type=pa.int32()),
            "duration_ms": batch["duration_ms"],
            "error": pa.array(errors, type=pa.string()),
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

    ``decoder="real"`` decodes YUV4MPEG2 (y4m) streams — uncompressed
    interchange video, pure numpy — and emits evenly spaced REAL frames
    re-encoded as P6 PPM; non-y4m payloads (mp4 etc.) dead-letter per
    row with the ffmpeg slot named in the error.  ``decoder="fake"``
    emits deterministic content-seeded frame payloads.
    """

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder mode: {decoder}")
        self.n_frames = n_frames
        self.decoder = decoder

    def _rows_fake(self, payload: bytes, dur: int):
        seed = int.from_bytes(
            hashlib.blake2b(payload, digest_size=4).digest(), "big")
        rng = np.random.RandomState(seed)
        dur = max(1, dur)
        for f in range(self.n_frames):
            # evenly spaced sample timestamps across the duration
            yield (f, int(dur * (f + 0.5) / self.n_frames),
                   rng.bytes(1024), "")

    def _rows_real(self, payload: bytes, dur: int):
        try:
            frames, (fn, fd) = decode_y4m(payload)
        except Exception as e:
            yield (-1, -1, b"",
                   f"{type(e).__name__}: {e} (compressed formats need "
                   "the ffmpeg kernel — plug it in here)")
            return
        n = len(frames)
        take = min(self.n_frames, n)
        for f in range(take):
            i = min(int(n * (f + 0.5) / take), n - 1)
            yield (f, int(i * 1000 * fd / max(1, fn)),
                   encode_ppm(frames[i]), "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_nos, ts_ms, payloads, errors = [], [], [], [], []
        rows = self._rows_real if self.decoder == "real" else self._rows_fake
        for mid, kind, payload, dur in zip(
                batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
                batch["payload"].to_pylist(),
                batch["duration_ms"].to_pylist()):
            if kind != "video":
                continue
            for f, ts, frame, err in rows(payload, dur):
                ids.append(mid)
                frame_nos.append(f)
                ts_ms.append(ts)
                payloads.append(frame)
                errors.append(err)
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_no": pa.array(frame_nos, type=pa.int32()),
            "ts_ms": pa.array(ts_ms, type=pa.int32()),
            "frame": pa.array(payloads, type=pa.binary()),
            "error": pa.array(errors, type=pa.string()),
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
