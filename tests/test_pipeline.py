"""End-to-end KG pipeline parity, idempotency and determinism tests.

Mirrors the reference's golden-predicate test pattern — run the
pipeline, compare against hand-checkable expected output
(/root/reference/internal/testing/testdata/testdata.go +
parse_spdx_test.go), and the e2e normalize-then-diff goldens
(internal/testing/e2e/e2e:112-190).  The "golden" here is the
single-threaded pure-Python reference implementation
(guacray/data/reference.py); the distributed Ray pipeline must match it
exactly (P/R = 1.0 ≥ the 0.95 gate).
"""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from guacray.data.reference import reference_graph, reference_triples
from guacray.pipelines.kg import kg_datasets, linked_triples


def _norm(df: pd.DataFrame, key: str) -> pd.DataFrame:
    df = df.sort_values(key).reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).astype("datetime64[us, UTC]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def test_triples_match_reference(small_pages):
    ds = rd.from_arrow(small_pages)
    got = linked_triples(ds).to_pandas()
    ref = pd.DataFrame(reference_triples(small_pages))

    key_cols = ["document_ref", "subj_key", "predicate", "obj_key"]
    got_set = set(map(tuple, got[key_cols].values))
    ref_set = set(map(tuple, ref[key_cols].values))
    # exact set equality on tiny fixtures (P = R = 1.0)
    assert got_set == ref_set
    assert len(got) == len(ref)


def test_nodes_edges_match_reference(small_pages):
    ds = rd.from_arrow(small_pages)
    out = kg_datasets(ds)
    ref_nodes, ref_edges = reference_graph(small_pages)

    nodes = _norm(out["nodes"].to_pandas(), "node_id")
    refn = _norm(pd.DataFrame(ref_nodes), "node_id")
    pd.testing.assert_frame_equal(nodes[refn.columns], refn)

    edges = _norm(out["edges"].to_pandas(), "edge_id")
    refe = _norm(pd.DataFrame(ref_edges), "edge_id")
    pd.testing.assert_frame_equal(edges[refe.columns], refe)


def test_idempotent_reingest(small_pages):
    """Ingesting the corpus twice yields the identical graph, with only
    evidence counts doubled — GUAC's content-keyed upsert semantics
    (keyvalue/isDependency.go:119-127)."""
    ds1 = rd.from_arrow(small_pages)
    ds2 = rd.from_arrow(pa.concat_tables([small_pages, small_pages]))
    out1, out2 = kg_datasets(ds1), kg_datasets(ds2)

    n1 = _norm(out1["nodes"].to_pandas(), "node_id")
    n2 = _norm(out2["nodes"].to_pandas(), "node_id")
    pd.testing.assert_frame_equal(n1, n2[n1.columns])

    e1 = _norm(out1["edges"].to_pandas(), "edge_id")
    e2 = _norm(out2["edges"].to_pandas(), "edge_id")
    assert list(e1["edge_id"]) == list(e2["edge_id"])
    assert (e2["n_evidence"].values == 2 * e1["n_evidence"].values).all()
    assert list(e1["first_seen"]) == list(e2["first_seen"])


def test_bucket_count_invariance(small_pages):
    """Shuffle-partitioning choice must not affect results (the salted/
    bucketed exchange is an implementation detail)."""
    ds = rd.from_arrow(small_pages)
    a = kg_datasets(ds, num_buckets=4)
    b = kg_datasets(ds, num_buckets=32)
    ea = _norm(a["edges"].to_pandas(), "edge_id")
    eb = _norm(b["edges"].to_pandas(), "edge_id")
    pd.testing.assert_frame_equal(ea, eb[ea.columns])


def test_partitioned_edges_by_predicate(small_pages_path, tmp_path):
    """Hive-partitioned edge layout: same table contents, per-predicate
    directory pruning for filtered reads (SURVEY §7.1 step 6)."""
    import os
    from guacray.pipelines.kg import run_kg
    from guacray.query.graph import GraphStore

    flat = str(tmp_path / "flat")
    part = str(tmp_path / "part")
    c1 = run_kg(small_pages_path, flat)
    c2 = run_kg(small_pages_path, part, partition_edges_by_predicate=True)
    assert c1 == c2
    dirs = os.listdir(os.path.join(part, "edges"))
    assert any(d.startswith("predicate=") for d in dirs)

    e1 = rd.read_parquet(os.path.join(flat, "edges")).to_pandas()
    e2 = rd.read_parquet(os.path.join(part, "edges")).to_pandas()
    cols = ["edge_id", "subj_id", "predicate", "obj_id", "n_evidence"]
    a = e1[cols].astype({"predicate": str}).sort_values("edge_id").reset_index(drop=True)
    b = e2[cols].astype({"predicate": str}).sort_values("edge_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # predicate-filtered query works identically on both layouts
    sa = GraphStore(flat)
    sb = GraphStore(part)
    from guacray.functions.keys import entity_key, node_id
    acme = node_id(entity_key("org", "Acme Corp"))
    na = sa.neighbors(acme, predicates=["works_at"]).to_pandas()
    nb = sb.neighbors(acme, predicates=["works_at"]).to_pandas()
    assert set(na["edge_id"]) == set(nb["edge_id"])


def test_document_summary(small_pages):
    """HasSBOM.Includes analog: per-document rollup matches reference."""
    import collections
    from guacray.data.reference import reference_triples
    from guacray.pipelines.kg import linked_triples
    from guacray.stages.canonicalize import document_summary

    tri = linked_triples(rd.from_arrow(small_pages))
    got = document_summary(tri).to_pandas().set_index("document_ref")
    ref = collections.defaultdict(lambda: {"n": 0, "edges": set(),
                                           "url": None, "ts": None})
    for t in reference_triples(small_pages):
        from guacray.functions.keys import edge_id, node_id
        r = ref[t["document_ref"]]
        r["n"] += 1
        r["edges"].add(edge_id(node_id(t["subj_key"]), t["predicate"],
                               node_id(t["obj_key"])))
        r["url"] = t["url"] if r["url"] is None else min(r["url"], t["url"])
        r["ts"] = t["warc_ts"] if r["ts"] is None else min(r["ts"], t["warc_ts"])
    assert len(got) == len(ref)
    for dref, r in ref.items():
        row = got.loc[dref]
        assert row["n_triples"] == r["n"]
        assert row["n_distinct_edges"] == len(r["edges"])
        assert row["url"] == r["url"]


def test_link_via_join_equals_actor_pool(small_pages):
    """The scale-path join-based linker produces byte-identical triples
    to the broadcast-dictionary actor pool."""
    from guacray.stages.extract import extract
    from guacray.stages.link import alias_dataset, link, link_via_join
    from guacray.stages.normalize import normalize

    raw = extract(normalize(rd.from_arrow(small_pages)))
    via_pool = link(raw).to_pandas()
    via_join = link_via_join(
        extract(normalize(rd.from_arrow(small_pages))),
        alias_dataset()).to_pandas()
    key = ["url", "subj_surface", "predicate", "obj_surface"]
    a = via_pool.sort_values(key + ["edge_id"]).reset_index(drop=True)
    b = via_join.sort_values(key + ["edge_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_pr_gate_at_larger_corpus():
    """Triple P/R vs reference at a 4096-page corpus (the ≥0.95 gate;
    exact equality expected — our extractor IS the reference)."""
    from guacray.data.pages import generate_pages
    from guacray.data.reference import reference_triples
    pages = generate_pages(4096)
    got = linked_triples(rd.from_arrow(pages)).to_pandas()
    ref = pd.DataFrame(reference_triples(pages))
    key = ["document_ref", "subj_key", "predicate", "obj_key"]
    got_set = set(map(tuple, got[key].values))
    ref_set = set(map(tuple, ref[key].values))
    tp = len(got_set & ref_set)
    precision, recall = tp / len(got_set), tp / len(ref_set)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0


def test_checkpoint_modes_equal_outputs(small_pages_path, tmp_path):
    from guacray.pipelines.kg import run_kg
    dirs = {m: str(tmp_path / m)
            for m in ("disk", "mem", "fused", "fused-sync", "disk-async")}
    counts = {m: run_kg(small_pages_path, d, checkpoint_mode=m)
              for m, d in dirs.items()}
    assert (counts["disk"] == counts["mem"] == counts["fused"]
            == counts["fused-sync"] == counts["disk-async"])
    a = dirs["disk"]
    for b in (dirs["mem"], dirs["fused"], dirs["fused-sync"],
              dirs["disk-async"]):
        for t, key in (("nodes", "node_id"), ("edges", "edge_id"),
                       ("triples", "edge_id")):
            x = rd.read_parquet(f"{a}/{t}").to_pandas() \
                .sort_values(key).reset_index(drop=True)
            y = rd.read_parquet(f"{b}/{t}").to_pandas() \
                .sort_values(key).reset_index(drop=True)
            if t == "triples":
                x = x.sort_values(["url", "edge_id"]).reset_index(drop=True)
                y = y.sort_values(["url", "edge_id"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(x, y[x.columns])


def test_fused_checkpoint_rerun_idempotent(small_pages_path, tmp_path):
    """The fused writer's side-effect files must not double on rerun
    into the same dir (deterministic content-hash filenames + atomic
    tmp-dir promotion)."""
    from guacray.pipelines.kg import run_kg
    out = str(tmp_path / "out")
    c1 = run_kg(small_pages_path, out, checkpoint_mode="fused")
    c2 = run_kg(small_pages_path, out, checkpoint_mode="fused")
    assert c1 == c2


def test_fused_checkpoint_empty_input(tmp_path):
    """Zero-row input still yields valid (0-row, canonical-schema)
    parquet dirs in fused mode."""
    import pyarrow.parquet as pq
    from guacray import schemas
    from guacray.data.pages import write_pages
    from guacray.pipelines.kg import run_kg
    pages = str(tmp_path / "pages.parquet")
    write_pages(pages, 8)
    t = pq.read_table(pages)
    pq.write_table(t.slice(0, 0), pages)  # keep schema, drop rows
    out = str(tmp_path / "out")
    counts = run_kg(pages, out, checkpoint_mode="fused")
    assert counts == {"triples": 0, "nodes": 0, "edges": 0, "evidence": 0}
    assert pq.read_table(f"{out}/triples").schema.equals(schemas.TRIPLES)


def test_auto_checkpoint_mode_dispatch(small_pages_path):
    """Width-aware mode dispatch: narrow clusters (≤ threshold CPUs)
    run fused, wide ones disk.  The test session runs 4 CPUs."""
    from guacray.pipelines.kg import _auto_checkpoint_mode
    assert _auto_checkpoint_mode(small_pages_path) == "fused"
    assert _auto_checkpoint_mode(small_pages_path, cpu_threshold=2) == "disk"
    # path is irrelevant to the width rule (kept for future rules)
    assert _auto_checkpoint_mode("/nonexistent/path") == "fused"


def test_ckpt_flush_barrier_paths():
    """The fused flush barrier's three outcomes: clean drain, surfaced
    write error, and timeout on a write that never lands."""
    import ray
    import pytest
    from guacray.pipelines.kg import _CkptFlushRegistry, _await_ckpt_flush

    reg = ray.remote(num_cpus=0)(_CkptFlushRegistry).remote()
    ray.get(reg.expect.remote("blk-a"))
    ray.get(reg.mark_done.remote("blk-a"))
    _await_ckpt_flush(reg, timeout_s=5)  # drains clean

    ray.get(reg.expect.remote("blk-b"))
    with pytest.raises(IOError, match="missing.*blk-b"):
        _await_ckpt_flush(reg, timeout_s=0.3)  # never lands → timeout

    ray.get(reg.mark_done.remote("blk-b", "disk full"))
    with pytest.raises(IOError, match="disk full"):
        _await_ckpt_flush(reg, timeout_s=5)  # error surfaces
    ray.kill(reg)


def test_bulk_ingest_knobs_dispatch(small_pages_path):
    """Light inputs keep the interactive defaults; the heavy path
    raises the pool floor (threshold forced to 0 to flip it)."""
    from guacray.pipelines.kg import bulk_ingest_knobs
    _, lc = bulk_ingest_knobs(small_pages_path)
    assert lc is None
    _, lc = bulk_ingest_knobs(small_pages_path, heavy_pages_per_cpu=0)
    assert lc is not None and lc[0] >= lc[1] // 2 and lc[1] >= lc[0]
