"""Source readers — the collector layer (SURVEY.md §2.1).

GUAC's collectors push raw Documents into a channel
(/root/reference/pkg/handler/collector/collector.go:37-47); the Ray
Data equivalent is a pruned parquet/binary read producing a Dataset.
The registry pattern (collector.go:65-75) becomes a plain dict.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read_pages(path_or_dir: str, *, langs: list[str] | None = None,
               columns: list[str] | None = None):
    """Pruned pages read with optional lang pushdown at the row-group
    level — only needed columns leave storage."""
    flt = pc.field("lang").isin(langs) if langs else None
    return rd.read_parquet(path_or_dir, columns=columns, filter=flt)


def read_binary_docs(path_or_dir: str, *, filesystem=None):
    """FileCollector analog: arbitrary files → (path, bytes) rows,
    bytes RAW.

    ``rd.read_binary_files`` transparently decompresses known
    extensions (and crashes on mislabeled files, with no way to turn
    detection off — its ``compression=None`` means "detect").  The
    engine's own decode stage (``decode_compressed`` / ``unpack_tree``)
    must own the codec decision so malformed blobs dead-letter instead;
    so: enumerate files (driver, metadata only) → ``from_items`` paths
    → per-task raw read with compression disabled.  Each task reads its
    own file — same distribution as the built-in reader.

    Remote object stores (the S3/GCS collectors,
    /root/reference/pkg/handler/collector/s3/s3.go,
    .../gcs/gcs.go:103-152): a ``s3://`` / ``gs://`` URI dispatches
    through ``pafs.FileSystem.from_uri``, or pass ``filesystem=`` —
    any picklable ``pyarrow.fs.FileSystem`` (e.g. an ``S3FileSystem``
    with credentials, the same convention as
    ``ray.data.read_parquet``); it is captured by the per-task read
    closure and shipped to workers, so enumeration stays driver-side
    (metadata only) while the blob bytes are fetched inside the tasks
    that consume them."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        filesystem, root = filesystem, path_or_dir
    elif "://" in path_or_dir:
        filesystem, root = pafs.FileSystem.from_uri(path_or_dir)
    else:
        filesystem, root = pafs.LocalFileSystem(), path_or_dir
    info = filesystem.get_file_info(root)
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(root, recursive=True)
        files = sorted(f.path for f in filesystem.get_file_info(sel)
                       if f.type == pafs.FileType.File)
    else:
        files = [root]

    ds = rd.from_items([{"path": p} for p in files])

    def load(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        blobs = []
        for p in paths:
            with filesystem.open_input_stream(p, compression=None) as f:
                blobs.append(f.read())
        return pa.table({"bytes": pa.array(blobs, type=pa.binary()),
                         "path": pa.array(paths, type=pa.string())})
    return ds.map_batches(load, batch_format="pyarrow")


def explode_jsonlines(ds, blob_col: str = "bytes"):
    """JSON-Lines unpack: one document row → N child rows, children
    inherit provenance (the DocumentTree explode,
    /root/reference/pkg/handler/processor/jsonlines/jsonlines.go:45-78).
    Emits a dead-letter ``error`` column instead of dropping bad lines
    (the reference logs-and-skips; we keep poison rows queryable)."""
    def fn(batch: pa.Table) -> pa.Table:
        paths, lines, line_nos, errors = [], [], [], []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch[blob_col].to_pylist()):
            text = blob.decode("utf-8", errors="replace") \
                if isinstance(blob, (bytes, bytearray)) else str(blob)
            for i, line in enumerate(text.splitlines()):
                if not line.strip():
                    continue
                err = ""
                try:
                    json.loads(line)
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
                paths.append(path)
                lines.append(line)
                line_nos.append(i)
                errors.append(err)
        return pa.table({
            "path": pa.array(paths, type=pa.string()),
            "line_no": pa.array(line_nos, type=pa.int32()),
            "doc": pa.array(lines, type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def read_jsonl(path_or_dir: str):
    """JSON-lines source (one row per JSON object)."""
    return rd.read_json(path_or_dir)


def read_csv(path_or_dir: str, **kwargs):
    return rd.read_csv(path_or_dir, **kwargs)


def read_text_lines(path_or_dir: str):
    """One row per text line (raw-corpus ingestion)."""
    return rd.read_text(path_or_dir)


# collector registry — user-extension surface (plain dict, like the
# reference's type-keyed registries, collector.go:65-75)
READERS = {
    "pages": read_pages,
    "binary": read_binary_docs,
    "jsonl": read_jsonl,
    "csv": read_csv,
    "text": read_text_lines,
}

# (compressed/recursive sources compose: read_binary_docs →
# decode_compressed / unpack_tree below)


# ---------------------------------------------------- compressed inputs

# extension map + magic-byte sniff, mirroring the reference's
# decode-by-extension table (/root/reference/pkg/handler/processor/
# process/process.go:277-318; ext map processor/processor.go:92-101).
# gzip/bzip2/xz decode via stdlib; zstd is gated behind an import-try
# (library absent in some deploys — the row dead-letters instead of
# crashing the stage).
_COMPRESSION_EXT = {".bz2": "bzip2", ".gz": "gzip", ".gzip": "gzip",
                    ".xz": "xz", ".zst": "zstd", ".zstd": "zstd"}
_COMPRESSION_MAGIC = [
    (b"BZh", "bzip2"),
    (b"\x1f\x8b", "gzip"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
]


def sniff_compression(path: str, blob: bytes) -> str | None:
    """Codec name or None — extension first (the reference's rule),
    magic bytes as fallback for extensionless blobs."""
    import os as _os
    ext = _os.path.splitext(path.lower())[1]
    if ext in _COMPRESSION_EXT:
        return _COMPRESSION_EXT[ext]
    for magic, codec in _COMPRESSION_MAGIC:
        if blob[:len(magic)] == magic:
            return codec
    return None


def decode_blob(blob: bytes, codec: str) -> bytes:
    if codec == "bzip2":
        import bz2
        return bz2.decompress(blob)
    if codec == "gzip":
        import gzip
        return gzip.decompress(blob)
    if codec == "xz":
        import lzma
        return lzma.decompress(blob)
    if codec == "zstd":
        try:
            import zstandard
        except ImportError as e:
            raise NotImplementedError(
                "zstd input needs the 'zstandard' package") from e
        return zstandard.ZstdDecompressor().decompress(blob)
    raise ValueError(f"unknown codec: {codec}")


def decode_compressed(ds, blob_col: str = "bytes"):
    """Decode compressed blobs by extension/sniff; pass-through for
    uncompressed rows; failures dead-letter into an ``error`` column
    (the reference logs-and-skips; we keep poison rows queryable)."""
    import pyarrow as _pa

    def fn(batch: _pa.Table) -> _pa.Table:
        paths, blobs, codecs, errors = [], [], [], []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch[blob_col].to_pylist()):
            codec = sniff_compression(path, blob)
            err = ""
            out = blob
            if codec is not None:
                try:
                    out = decode_blob(blob, codec)
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
                    out = blob
            paths.append(path)
            blobs.append(out)
            codecs.append(codec or "")
            errors.append(err)
        return _pa.table({
            "path": _pa.array(paths, type=_pa.string()),
            blob_col: _pa.array(blobs, type=_pa.binary()),
            "codec": _pa.array(codecs, type=_pa.string()),
            "error": _pa.array(errors, type=_pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------- format validation

def _validate_json(blob: bytes) -> None:
    json.loads(blob)


def _validate_jsonlines(blob: bytes) -> None:
    for ln in blob.decode("utf-8").splitlines():
        if ln.strip():
            json.loads(ln)


def _validate_xml(blob: bytes) -> None:
    import xml.etree.ElementTree as ET
    ET.fromstring(blob)


# validator registry — the validateFormat table of the reference
# (/root/reference/pkg/handler/processor/process/process.go:235-258:
# JSON / JSON-Lines / XML well-formedness); user-extensible like the
# other type-keyed registries.
VALIDATORS = {
    "json": _validate_json,
    "json-lines": _validate_jsonlines,
    "xml": _validate_xml,
}


def guess_format(blob: bytes) -> str:
    """Cheap structural format guess (the FormatType guesser,
    processor/guesser/format_guesser.go analog): '<' → xml, '{'/'[' →
    json (json-lines when >1 non-empty JSON-looking line), else
    unknown."""
    head = blob.lstrip()[:1]
    if head == b"<":
        return "xml"
    if head in (b"{", b"["):
        try:
            lines = [ln for ln in blob.decode("utf-8").splitlines()
                     if ln.strip()]
        except UnicodeDecodeError:
            return "unknown"
        if len(lines) > 1 and all(ln.lstrip()[:1] in "{[" for ln in lines):
            return "json-lines"
        return "json"
    return "unknown"


def validate_format(ds, blob_col: str = "bytes", fmt: str | None = None):
    """validateFormat gate: stamp ``format`` and ``error`` columns; a
    non-empty error marks a dead-letter row (the reference rejects the
    document, process.go:235-258 — we keep it queryable).  ``fmt``
    forces a format; otherwise each blob is guessed.  Unknown formats
    pass through un-errored (the reference only validates the three
    structured formats)."""
    def fn(batch: pa.Table) -> pa.Table:
        fmts, errors = [], []
        for blob in batch[blob_col].to_pylist():
            b = blob if isinstance(blob, (bytes, bytearray)) \
                else str(blob).encode()
            f = fmt or guess_format(b)
            err = ""
            v = VALIDATORS.get(f)
            if v is not None:
                try:
                    v(b)
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
            fmts.append(f)
            errors.append(err)
        out = batch
        for name, vals in (("format", fmts), ("error", errors)):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, pa.array(vals, type=pa.string()))
        return out
    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------ recursive DocumentTree

def _unpack_compression(path: str, blob: bytes):
    """Unpacker: compressed blob → one child (decoded bytes)."""
    codec = sniff_compression(path, blob)
    if codec is None:
        return None
    # strip the codec extension so the child re-sniffs on content
    import os as _os
    base, ext = _os.path.splitext(path)
    child_path = base if ext.lower() in _COMPRESSION_EXT else path
    return [(child_path, decode_blob(blob, codec))]


def _unpack_jsonlines(path: str, blob: bytes):
    """Unpacker: JSON-Lines blob → one child per JSON line (the
    jsonlines explode, processor/jsonlines/jsonlines.go:45-78).
    Applies only when every non-empty line is a JSON value."""
    try:
        text = blob.decode("utf-8")
    except UnicodeDecodeError:
        return None
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if len(lines) < 2:
        return None
    if not all(ln.lstrip()[:1] in "{[" for ln in lines):
        return None
    out = []
    for i, ln in enumerate(lines):
        try:
            json.loads(ln)
        except Exception:
            return None  # not well-formed JSON-Lines: leave as leaf
        out.append((f"{path}#L{i}", ln.encode("utf-8")))
    return out


# registry — user-extension surface, ordered (first applicable wins),
# like the reference's documentType-keyed processor registry
UNPACKERS = [("compression", _unpack_compression),
             ("jsonlines", _unpack_jsonlines)]


def unpack_tree(ds, blob_col: str = "bytes", max_depth: int = 8):
    """Recursive DocumentTree unpack: re-apply the unpacker registry to
    children until fixpoint (process/process.go:168-195 semantics) —
    e.g. ``file.jsonl.bz2`` → decompress → explode lines → leaves.

    The tree walk happens INSIDE the row's task (a document tree is
    process-local in the reference too); a per-PATH ancestor-chain set
    of content hashes plus ``max_depth`` guard against cycles and
    decompression bombs (the parser's visited-set idea,
    ingestor/parser/parser.go:216-220).  The guard is per ancestry, not
    per document: a cycle means a blob re-appears in its OWN unpack
    chain.  Sibling duplicates (e.g. two identical JSON-Lines records)
    are legitimate documents and are all emitted — the reference's
    jsonlines processor emits every line.

    Output rows: root_path, path (child provenance chain), depth,
    doc:string (utf-8, errors=replace), error.
    """
    import hashlib

    import pyarrow as _pa

    def fn(batch: _pa.Table) -> _pa.Table:
        roots, paths, depths, docs, errors = [], [], [], [], []
        for root, blob in zip(batch["path"].to_pylist(),
                              batch[blob_col].to_pylist()):
            stack = [(root, blob, 0, frozenset())]
            while stack:
                path, b, depth, ancestors = stack.pop()
                digest = hashlib.blake2b(b, digest_size=16).hexdigest()
                if digest in ancestors:
                    continue  # blob appears in its own unpack chain
                err = ""
                children = None
                if depth < max_depth:
                    for _, unpacker in UNPACKERS:
                        try:
                            children = unpacker(path, b)
                        except Exception as e:
                            err = f"{type(e).__name__}: {e}"
                            children = None
                            break
                        if children is not None:
                            break
                if children:
                    child_anc = ancestors | {digest}
                    # reversed: stack pop order == document order
                    for c in reversed(children):
                        stack.append((c[0], c[1], depth + 1, child_anc))
                    continue
                roots.append(root)
                paths.append(path)
                depths.append(depth)
                docs.append(b.decode("utf-8", errors="replace"))
                errors.append(err)
        return _pa.table({
            "root_path": _pa.array(roots, type=_pa.string()),
            "path": _pa.array(paths, type=_pa.string()),
            "depth": _pa.array(depths, type=_pa.int32()),
            "doc": _pa.array(docs, type=_pa.string()),
            "error": _pa.array(errors, type=_pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------- DSSE envelopes

def _pae(payload_type: str, payload: bytes) -> bytes:
    """DSSE Pre-Authentication Encoding (the signed byte string) —
    public DSSE v1 spec, as used by the reference's verifier
    (/root/reference/pkg/ingestor/verifier/sigstore_verifier/
    sigstore_verifier.go)."""
    pt = payload_type.encode()
    return b"DSSEv1 %d %s %d %s" % (len(pt), pt, len(payload), payload)


def is_dsse(obj) -> bool:
    return (isinstance(obj, dict) and "payload" in obj
            and "payloadType" in obj and "signatures" in obj)


def _unpack_dsse(path: str, blob: bytes):
    """Unpacker: DSSE envelope → one child (the b64-decoded payload) —
    processor/dsse/dsse.go unwrap semantics.  Signature CHECKING is the
    separate ``verify_dsse`` step (unwrap never requires trust; gating
    on verification is the ingestor's policy decision)."""
    import base64
    s = blob.lstrip()[:1]
    if s != b"{":
        return None
    try:
        obj = json.loads(blob)
    except Exception:
        return None
    if not is_dsse(obj):
        return None
    try:
        payload = base64.b64decode(obj["payload"], validate=True)
    except Exception:
        return None
    return [(f"{path}#payload", payload)]


def verify_dsse(envelope_bytes: bytes,
                public_keys: dict[str, bytes]) -> dict:
    """Verify a DSSE envelope's ed25519 signatures against a keyid →
    raw-public-key map (the sigstore_verifier analog; ed25519 via the
    `cryptography` package, gated by import-try).

    Returns {payload: bytes, payload_type: str,
             verified: [keyid...], failed: [keyid...]}.
    """
    import base64
    try:
        from cryptography.exceptions import InvalidSignature
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PublicKey)
    except ImportError as e:  # pragma: no cover - env without crypto
        raise NotImplementedError(
            "DSSE verification needs the 'cryptography' package") from e

    obj = json.loads(envelope_bytes)
    if not is_dsse(obj):
        raise ValueError("not a DSSE envelope")
    payload = base64.b64decode(obj["payload"])
    pae = _pae(obj["payloadType"], payload)
    verified, failed = [], []
    for sig in obj["signatures"]:
        keyid = sig.get("keyid", "")
        raw = public_keys.get(keyid)
        if raw is None:
            failed.append(keyid)
            continue
        try:
            Ed25519PublicKey.from_public_bytes(raw).verify(
                base64.b64decode(sig["sig"]), pae)
            verified.append(keyid)
        except (InvalidSignature, Exception):
            failed.append(keyid)
    return {"payload": payload, "payload_type": obj["payloadType"],
            "verified": verified, "failed": failed}


def verify_dsse_stage(ds, public_keys: dict[str, bytes],
                      blob_col: str = "bytes"):
    """Actor-pool-free verification stage: envelope rows → (path,
    payload, payload_type, verified:bool, keyids, error).  Key material
    is tiny → captured in the task closure (object-store broadcast)."""
    import pyarrow as _pa

    def fn(batch: _pa.Table) -> _pa.Table:
        paths, payloads, ptypes, oks, keyids, errors = ([], [], [], [],
                                                        [], [])
        for path, blob in zip(batch["path"].to_pylist(),
                              batch[blob_col].to_pylist()):
            try:
                r = verify_dsse(blob, public_keys)
                paths.append(path)
                payloads.append(r["payload"])
                ptypes.append(r["payload_type"])
                oks.append(bool(r["verified"]))
                keyids.append(",".join(r["verified"]))
                errors.append("")
            except Exception as e:
                paths.append(path)
                payloads.append(b"")
                ptypes.append("")
                oks.append(False)
                keyids.append("")
                errors.append(f"{type(e).__name__}: {e}")
        return _pa.table({
            "path": _pa.array(paths, type=_pa.string()),
            "payload": _pa.array(payloads, type=_pa.binary()),
            "payload_type": _pa.array(ptypes, type=_pa.string()),
            "verified": _pa.array(oks, type=_pa.bool_()),
            "keyids": _pa.array(keyids, type=_pa.string()),
            "error": _pa.array(errors, type=_pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def dsse_identity_triples(verified_ds, warc_ts=None):
    """Verified DSSE envelopes → (identity)-[signed]->(document)
    statements in the canonical TRIPLES shape, ready for
    ``canonicalize.graph_tables`` (alone or unioned with extracted
    triples).

    This is the identity-propagation contract of the reference's parser
    interface — ``GetIdentities``/``TrustInformation``
    (/root/reference/pkg/ingestor/parser/common/types.go:25-41,
    parser/dsse/parser_dsse.go:60-100): each VERIFIED signature emits a
    trust statement binding the signing key identity to the signed
    artifact.  One row per (envelope, verified keyid); unverified rows
    emit nothing (the reference logs and drops them too).

    Graph shape: subj = identity node (node_type ``identity``, name =
    keyid), obj = document node (node_type ``document``, name = the
    blob-store ``document_ref`` of the signed payload), props carry the
    DSSE payloadType + signature scheme (part of edge identity — the
    same artifact attested under a different payload type is a
    different trust statement).
    """
    import pyarrow as _pa

    from ..functions.hashing import document_ref as _dref
    from ..functions.keys import entity_key
    from ..functions.text import props_string
    from ..stages.canonicalize import add_ids_batch

    ts_type = _pa.timestamp("us", tz="UTC")

    def fn(batch: _pa.Table) -> _pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "url", "document_ref", "subj_surface", "predicate",
            "obj_surface", "props", "subj_type", "subj_key",
            "subj_name", "obj_type", "obj_key", "obj_name")}
        ts_vals: list = []
        have_ts = "warc_ts" in batch.column_names
        ts_in = batch["warc_ts"].to_pylist() if have_ts else None
        for i, (path, payload, ptype, ok, keyids) in enumerate(zip(
                batch["path"].to_pylist(), batch["payload"].to_pylist(),
                batch["payload_type"].to_pylist(),
                batch["verified"].to_pylist(),
                batch["keyids"].to_pylist())):
            if not ok or not keyids:
                continue
            ref = _dref(payload)
            props = props_string({"payload_type": ptype,
                                  "scheme": "ed25519"})
            for keyid in keyids.split(","):
                cols["url"].append(path)
                cols["document_ref"].append(ref)
                cols["subj_surface"].append(keyid)
                cols["predicate"].append("signed")
                cols["obj_surface"].append(ref)
                cols["props"].append(props)
                cols["subj_type"].append("identity")
                cols["subj_key"].append(entity_key("identity", keyid))
                cols["subj_name"].append(keyid)
                cols["obj_type"].append("document")
                cols["obj_key"].append(entity_key("document", ref))
                cols["obj_name"].append(ref)
                ts_vals.append(ts_in[i] if have_ts else warc_ts)
        t = _pa.table({
            "url": _pa.array(cols["url"], type=_pa.string()),
            "warc_ts": _pa.array(ts_vals, type=ts_type),
            "document_ref": _pa.array(cols["document_ref"],
                                      type=_pa.string()),
            "subj_surface": _pa.array(cols["subj_surface"],
                                      type=_pa.string()),
            "predicate": _pa.array(cols["predicate"], type=_pa.string()),
            "obj_surface": _pa.array(cols["obj_surface"],
                                     type=_pa.string()),
            "props": _pa.array(cols["props"], type=_pa.string()),
            "subj_type": _pa.array(cols["subj_type"], type=_pa.string()),
            "subj_key": _pa.array(cols["subj_key"], type=_pa.string()),
            "subj_name": _pa.array(cols["subj_name"], type=_pa.string()),
            "obj_type": _pa.array(cols["obj_type"], type=_pa.string()),
            "obj_key": _pa.array(cols["obj_key"], type=_pa.string()),
            "obj_name": _pa.array(cols["obj_name"], type=_pa.string()),
        })
        return add_ids_batch(t)

    return verified_ds.map_batches(fn, batch_format="pyarrow")


# register the DSSE unpacker between compression and jsonlines (a DSSE
# envelope is a single JSON object; order = first-applicable-wins)
UNPACKERS.insert(1, ("dsse", _unpack_dsse))


# ------------------------------------- compressed page records → flagship

def read_pages_jsonl(path_or_dir: str):
    """Collector for Common-Crawl-style page records: (possibly
    compressed / DSSE-wrapped / nested) JSON-Lines files, one page
    object per line — fed through ``unpack_tree`` and normalized to the
    PAGES schema the flagship pipeline ingests.

    Record fields: url (str), warc_ts (ISO-8601 or unix seconds),
    html_b64 (base64 bytes), lang (str).  text is recomputed with the
    engine's own extractor, preserving the text == extract_text(html)
    invariant regardless of what the upstream record claimed.
    """
    import base64
    import datetime as _dt

    import pyarrow as _pa

    from ..functions.text import extract_text

    leaves = unpack_tree(read_binary_docs(path_or_dir))

    def to_pages(batch: _pa.Table) -> _pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for doc, err in zip(batch["doc"].to_pylist(),
                            batch["error"].to_pylist()):
            if err:
                continue
            try:
                rec = json.loads(doc)
                html = base64.b64decode(rec["html_b64"])
                ts = rec["warc_ts"]
                ts = (_dt.datetime.fromtimestamp(ts, _dt.timezone.utc)
                      if isinstance(ts, (int, float))
                      else _dt.datetime.fromisoformat(ts))
                urls.append(rec["url"])
                tss.append(ts)
                htmls.append(html)
                texts.append(extract_text(html))
                langs.append(rec.get("lang", ""))
            except Exception:
                continue  # malformed record: drop (poison rows already
                          # surfaced by unpack_tree's error column)
        return _pa.table({
            "url": _pa.array(urls, type=_pa.string()),
            "warc_ts": _pa.array(tss,
                                 type=_pa.timestamp("us", tz="UTC")),
            "html": _pa.array(htmls, type=_pa.binary()),
            "text": _pa.array(texts, type=_pa.string()),
            "lang": _pa.array(langs, type=_pa.string()),
        })

    return leaves.map_batches(to_pages, batch_format="pyarrow")


READERS["pages_jsonl"] = read_pages_jsonl
