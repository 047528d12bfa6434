"""Certifier-loop analog tests: stale-scan scheduling, feedback merge,
idempotency (reference semantics: certify.go poll loop + content-keyed
upsert, SURVEY.md §3.3)."""

import os

import pandas as pd
import ray.data as rd
import pytest

from guacray import schemas
from guacray.pipelines.enrich import (ENRICH_PREDICATE, run_enrichment)
from guacray.pipelines.kg import write_table, kg_datasets


@pytest.fixture()
def graph_dir(small_pages, tmp_path):
    d = str(tmp_path / "graph")
    out = kg_datasets(rd.from_arrow(small_pages))
    write_table(out["nodes"], os.path.join(d, "nodes"), schemas.NODES)
    write_table(out["edges"], os.path.join(d, "edges"), schemas.EDGES)
    return d


def _edges(d):
    return rd.read_parquet(os.path.join(d, "edges")).to_pandas()


def test_enrichment_loop(graph_dir):
    n_before = len(_edges(graph_dir))
    n_orgs = len(rd.read_parquet(os.path.join(graph_dir, "nodes"))
                 .to_pandas().query("node_type == 'org'"))

    r1 = run_enrichment(graph_dir, node_type="org", now=1000.0)
    assert r1["scanned"] == n_orgs
    edges = _edges(graph_dir)
    enr = edges[edges["predicate"] == ENRICH_PREDICATE]
    assert len(enr) == n_orgs  # one category edge per org
    assert len(edges) == n_before + n_orgs
    # category nodes were fed back into the nodes table
    nodes = rd.read_parquet(os.path.join(graph_dir, "nodes")).to_pandas()
    assert (nodes["node_type"] == "category").sum() >= 1

    # immediate rerun: everything fresh → nothing scanned, graph stable
    r2 = run_enrichment(graph_dir, node_type="org", now=1001.0)
    assert r2["scanned"] == 0
    assert r2["edges_total"] == len(edges)

    # horizon passed → rescan happens, but content-keyed merge is
    # idempotent: same edges, no duplicates
    r3 = run_enrichment(graph_dir, node_type="org",
                        rescan_after_s=0.5, now=2000.0)
    assert r3["scanned"] == n_orgs
    edges3 = _edges(graph_dir)
    assert len(edges3) == len(edges)
    pd.testing.assert_frame_equal(
        edges.sort_values("edge_id").reset_index(drop=True),
        edges3.sort_values("edge_id").reset_index(drop=True))


def test_enrichment_on_partitioned_layout(small_pages_path, tmp_path):
    """Certifier pass works when edges are hive-partitioned by
    predicate (dictionary-typed partition column on read)."""
    import ray.data as rd
    from guacray.pipelines.kg import run_kg
    d = str(tmp_path / "gpart")
    run_kg(small_pages_path, d, partition_edges_by_predicate=True)
    before = rd.read_parquet(os.path.join(d, "edges")).count()
    r = run_enrichment(d, node_type="org", now=5000.0)
    assert r["scanned"] > 0
    assert r["edges_total"] == before + r["scanned"]
