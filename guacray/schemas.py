"""Canonical Arrow schemas of the materialized graph tables.

The analog of GUAC's fixed, code-defined schema (Go structs + GraphQL
SDL, /root/reference/pkg/assembler/graphql/schema/ — SURVEY.md §1.2):
no dynamic node/edge types; these schemas are the engine's contract.
"""

import pyarrow as pa

TS = pa.timestamp("us", tz="UTC")

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", TS),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

TRIPLES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", TS),
    ("document_ref", pa.string()),
    ("subj_surface", pa.string()),
    ("predicate", pa.string()),
    ("obj_surface", pa.string()),
    ("props", pa.string()),
    ("subj_type", pa.string()),
    ("subj_key", pa.string()),
    ("subj_name", pa.string()),
    ("obj_type", pa.string()),
    ("obj_key", pa.string()),
    ("obj_name", pa.string()),
    ("subj_id", pa.string()),
    ("obj_id", pa.string()),
    ("edge_id", pa.string()),
])

NODES = pa.schema([
    ("node_id", pa.string()),
    ("node_key", pa.string()),
    ("node_type", pa.string()),
    ("name", pa.string()),
    # canonical qualifiers segment of node_key ("" when none) — the
    # pkg-trie qualifier payload (helpers/package.go:26-99)
    ("qualifiers", pa.string()),
])

EDGES = pa.schema([
    ("edge_id", pa.string()),
    ("subj_id", pa.string()),
    ("predicate", pa.string()),
    ("obj_id", pa.string()),
    # typed edge properties: canonical sorted "k=v&k=v" string ("" when
    # none) — the InputSpec payload (assembler.go:51-194), part of edge
    # identity
    ("props", pa.string()),
    ("first_seen", TS),
    ("n_evidence", pa.int64()),
    # equal-edge flag (assembler.go:84): true for symmetric predicates,
    # whose (subj_id, obj_id) are stored in canonical min-first order
    ("undirected", pa.bool_()),
])

EVIDENCE = pa.schema([
    ("edge_id", pa.string()),
    ("document_ref", pa.string()),
    ("url", pa.string()),
    ("warc_ts", TS),
])
