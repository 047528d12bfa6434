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


def read_binary_docs(path_or_dir: str):
    """FileCollector analog: arbitrary files → (path, bytes) rows."""
    return rd.read_binary_files(path_or_dir, include_paths=True)


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
