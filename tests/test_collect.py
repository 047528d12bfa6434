"""Collectsub loop closure: found identifiers become new collection
work, fetched documents ingest as increments (reference flow:
ingestor.go:189-201 feed + collectsub.proto:21-58 service)."""

import os

import pyarrow.parquet as pq
import ray.data as rd

from guacray.data.pages import generate_pages
from guacray.pipelines.collect import (dispatchable, pending_identifiers,
                                       run_collect_loop)
from guacray.pipelines.increment import init_incremental, read_graph_table


def _store(tmp_path, n=256):
    p = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages(n, seed=42), p)
    store = str(tmp_path / "store")
    init_incremental(p, store, num_buckets=8)
    return store


def test_collect_loop_discovers_and_ingests(tmp_path):
    store = _store(tmp_path)
    nodes1 = read_graph_table(store, "nodes").to_pandas()
    edges1 = read_graph_table(store, "edges").to_pandas()
    unknowns = nodes1.query("node_type == 'unknown'")
    assert len(unknowns) > 0, "fixture must mint fallback identities"

    # discovery = exactly the unknown fallback nodes (nothing dispatched)
    pend = pending_identifiers(store)
    assert sorted(pend) == sorted(unknowns["name"])

    res = run_collect_loop(store, max_rounds=3)
    assert res["rounds"] and res["rounds"][0]["discovered"] == len(pend)

    # discovered edges appear in the incremental store: every
    # DISPATCHABLE unknown gained profile edges via the standard merge
    edges2 = read_graph_table(store, "edges").to_pandas()
    assert len(edges2) > len(edges1)
    fetched_ids = set(
        unknowns[unknowns["name"].map(dispatchable)]["node_id"])
    prof = edges2[edges2["predicate"].isin(["works_at", "located_in"])
                  & edges2["subj_id"].isin(fetched_ids)]
    assert set(prof["subj_id"]) == fetched_ids
    # objects resolve through the store's own catalog: no new unknowns
    nodes2 = read_graph_table(store, "nodes").to_pandas()
    id2type = dict(zip(nodes2["node_id"], nodes2["node_type"]))
    assert all(id2type[o] in ("org", "place") for o in prof["obj_id"])

    # evidence rows carry the synthesized documents' provenance
    ev = rd.read_parquet(os.path.join(store, "triples")).to_pandas()
    assert ev["url"].str.startswith("https://profiles.example/").any()

    # fixpoint: rerunning discovers nothing and refetches nothing
    res2 = run_collect_loop(store, max_rounds=3)
    assert res2["rounds"] == [] and res2["dispatched_total"] == 0
    edges3 = read_graph_table(store, "edges").to_pandas()
    assert len(edges3) == len(edges2)


def test_dispatchable_sanitation():
    assert dispatchable("judy hopps")
    assert not dispatchable("")
    assert not dispatchable("acme. corp")          # sentence splitter
    assert not dispatchable('the "best" tool')     # quote handling
    assert not dispatchable("bob works at night")  # verb needle
    assert not dispatchable("x is located in y")   # verb needle
