"""Single-threaded reference implementation of the full KG pipeline.

This is the oracle the distributed Ray pipeline is tested against
(golden-triple fixtures, the analog of the reference's hand-written
expected IngestPredicates in
/root/reference/internal/testing/testdata/testdata.go and the
normalize-then-diff e2e goldens, internal/testing/e2e/e2e:112-190).
Pure Python, sequential, no Ray — deliberately simple and obviously
correct rather than fast.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import document_ref
from ..functions.keys import edge_id, link_surface, node_id, node_qualifiers
from ..functions.text import (ACCEPTED_LANGS, SYMMETRIC_PREDICATES,
                              extract_raw_triples, extract_text)
from .catalog import build_catalog


def reference_triples(pages: pa.Table, seed: int = 42) -> list[dict]:
    """pages table → linked triple rows (document order within a page).

    Row: url, warc_ts, document_ref, subj_surface, subj_type, subj_key,
    predicate, obj_surface, obj_type, obj_key.
    """
    alias_map = build_catalog(seed).alias_map()
    out: list[dict] = []
    for row in pages.to_pylist():
        if row["lang"] not in ACCEPTED_LANGS:
            continue
        text = extract_text(row["html"])
        dref = document_ref(row["html"])
        for subj_s, pred, obj_s, props in extract_raw_triples(text):
            s_type, s_key, s_name = link_surface(subj_s, alias_map)
            o_type, o_key, o_name = link_surface(obj_s, alias_map)
            out.append({
                "url": row["url"], "warc_ts": row["warc_ts"],
                "document_ref": dref,
                "subj_surface": subj_s, "subj_type": s_type,
                "subj_key": s_key, "subj_name": s_name,
                "predicate": pred, "props": props,
                "obj_surface": obj_s, "obj_type": o_type,
                "obj_key": o_key, "obj_name": o_name,
            })
    return out


def reference_graph(pages: pa.Table, seed: int = 42) -> tuple[list[dict], list[dict]]:
    """pages → (nodes, edges) after canonicalization, sorted by id.

    Dedup semantics mirror the reference backend: first occurrence wins
    for node attrs (assembler.go:196-308 noun maps), edges unique by
    content key with evidence aggregated
    (keyvalue/isDependency.go:46-56).
    """
    triples = reference_triples(pages, seed)
    nodes: dict[str, dict] = {}
    edges: dict[str, dict] = {}
    for t in triples:
        for side in ("subj", "obj"):
            key = t[f"{side}_key"]
            nid = node_id(key)
            if nid not in nodes:
                nodes[nid] = {"node_id": nid, "node_key": key,
                              "node_type": t[f"{side}_type"],
                              "name": t[f"{side}_name"],
                              "qualifiers": node_qualifiers(key)}
        sid, oid = node_id(t["subj_key"]), node_id(t["obj_key"])
        if t["predicate"] in SYMMETRIC_PREDICATES and oid < sid:
            sid, oid = oid, sid
        eid = edge_id(sid, t["predicate"], oid, t["props"])
        e = edges.get(eid)
        if e is None:
            edges[eid] = {"edge_id": eid, "subj_id": sid,
                          "predicate": t["predicate"], "obj_id": oid,
                          "props": t["props"],
                          "first_seen": t["warc_ts"], "n_evidence": 1,
                          "undirected": t["predicate"] in SYMMETRIC_PREDICATES}
        else:
            e["n_evidence"] += 1
            if t["warc_ts"] < e["first_seen"]:
                e["first_seen"] = t["warc_ts"]
    node_rows = sorted(nodes.values(), key=lambda r: r["node_id"])
    edge_rows = sorted(edges.values(), key=lambda r: r["edge_id"])
    return node_rows, edge_rows
