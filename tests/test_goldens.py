"""Checked-in golden fixtures — the drift guard.

The parity tests (test_pipeline.py) prove distributed == reference
implementation; these prove the reference implementation itself hasn't
silently changed (the analog of the reference's hand-written
testdata.go expectations, which are diffed, not recomputed).
"""

import hashlib
import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from guacray.data.pages import generate_pages
from guacray.pipelines.kg import kg_datasets

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_text_invariant(tiny_pages):
    gold = pq.read_table(os.path.join(GOLD, "golden_text.parquet")) \
        .to_pandas().set_index("url")
    assert len(gold) == tiny_pages.num_rows
    for row in tiny_pages.to_pylist():
        g = gold.loc[row["url"]]
        assert row["text"] == g["text_extracted"]
        assert hashlib.sha256(row["text"].encode()).hexdigest() \
            == g["text_sha256"]


def test_golden_triples_pr(tiny_pages):
    """P/R vs the checked-in golden triple set — exact equality expected
    on the tiny fixture (gate is ≥0.95)."""
    gold = pq.read_table(os.path.join(GOLD, "golden_triples.parquet")) \
        .to_pandas()
    got = kg_datasets(rd.from_arrow(tiny_pages))["triples"].to_pandas()
    key = ["document_ref", "subj_key", "predicate", "obj_key"]
    gold_set = set(map(tuple, gold[key].values))
    got_set = set(map(tuple, got[key].values))
    tp = len(gold_set & got_set)
    precision = tp / max(1, len(got_set))
    recall = tp / max(1, len(gold_set))
    assert precision == 1.0 and recall == 1.0, (precision, recall)


def test_golden_graph_tables(tiny_pages):
    out = kg_datasets(rd.from_arrow(tiny_pages))
    nodes = out["nodes"].to_pandas().sort_values("node_id") \
        .reset_index(drop=True)
    gn = pq.read_table(os.path.join(GOLD, "golden_nodes.parquet")) \
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(nodes[gn.columns], gn)

    edges = out["edges"].to_pandas().sort_values("edge_id") \
        .reset_index(drop=True)
    ge = pq.read_table(os.path.join(GOLD, "golden_edges.parquet")) \
        .to_pandas().sort_values("edge_id").reset_index(drop=True)
    edges["first_seen"] = pd.to_datetime(edges["first_seen"], utc=True)
    ge["first_seen"] = pd.to_datetime(ge["first_seen"], utc=True)
    pd.testing.assert_frame_equal(edges[ge.columns], ge)
