"""Distributed triangle counting over the canonical edge table.

Completes the graph-statistics family (degree histogram, components,
PageRank) with the classic clustering primitive.  The join formulation
is the standard scale approach: orient each undirected pair so a < b,
join the oriented set with itself on the middle vertex to enumerate
two-paths (a<b<c by construction), then semi-join the closing (a, c)
pair against the edge set.  At web scale the orientation would be by
DEGREE (low→high) so the join fan-out per vertex is bounded by its
out-orientation degree — the lexicographic orientation used here keeps
exact parity with the DuckDB oracle (LEAST/GREATEST) and is the
documented swap point.

Output: (node_id, n_triangles) for every node in ≥1 triangle — each
triangle credits all three corners.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import auto_join, grouped_agg, semi_join


def _oriented_pairs(t: pa.Table) -> pa.Table:
    """Edge rows → lexicographically oriented (a < b) simple pairs
    (self-loops dropped; multigraph collapse happens in the grouped
    dedup that follows)."""
    lo = pc.min_element_wise(t["subj_id"], t["obj_id"])
    hi = pc.max_element_wise(t["subj_id"], t["obj_id"])
    out = pa.table({"a": lo, "b": hi})
    return out.filter(pc.not_equal(lo, hi))


def _key(x: pa.ChunkedArray | pa.Array, y) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(x, y, "\x1f")


def _pairs(edges):
    """Deduplicated oriented (a < b) simple pairs, materialized — the
    shared input of the triangle and clustering passes."""
    return grouped_agg(
        edges.map_batches(_oriented_pairs, batch_format="pyarrow"),
        ["a", "b"], []).materialize()


def triangle_counts(edges, pairs=None):
    """Per-node triangle participation over the canonical edges
    Dataset (direction and predicate are ignored: any edge row between
    two distinct nodes makes them adjacent)."""
    if pairs is None:
        pairs = _pairs(edges)

    # two-paths a<b<c: pairs(a,b) ⋈ pairs(b,c) on the middle vertex
    paths = auto_join(
        pairs, pairs.map_batches(
            lambda t: pa.table({"b2": t["a"], "c": t["b"]}),
            batch_format="pyarrow"),
        on="b", right_on="b2")
    # close the wedge: (a, c) must be an edge
    tri = semi_join(
        paths.map_batches(
            lambda t: t.append_column("ac", _key(t["a"], t["c"])),
            batch_format="pyarrow"),
        pairs.map_batches(
            lambda t: pa.table({"ab": _key(t["a"], t["b"])}),
            batch_format="pyarrow"),
        on="ac", right_on="ab")

    def corners(t: pa.Table) -> pa.Table:
        chunks = []
        for c in ("a", "b", "c"):
            col = t[c]
            chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray)
                          else [col])
        return pa.table(
            {"node_id": pa.chunked_array(chunks, pa.string())})
    return grouped_agg(tri.map_batches(corners, batch_format="pyarrow"),
                       "node_id", [("node_id", "count", "n_triangles")])


def clustering_coefficients(edges):
    """Local clustering coefficient per node: 2·T(v) / (d(v)·(d(v)−1))
    over the simple undirected graph (d = distinct-neighbor degree),
    for every node with d ≥ 2 — nodes in no triangle score 0.0.  One
    extra grouped exchange (degree) over the triangle machinery; the
    division runs on identical integers in the engine and the DuckDB
    oracle, so the doubles match bit-for-bit."""
    pairs = _pairs(edges)

    def endpoints(t: pa.Table) -> pa.Table:
        chunks = []
        for c in ("a", "b"):
            col = t[c]
            chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray)
                          else [col])
        return pa.table(
            {"node_id": pa.chunked_array(chunks, pa.string())})
    deg = grouped_agg(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        "node_id", [("node_id", "count", "deg")])
    from .agg import left_lookup_join
    tri = triangle_counts(edges, pairs=pairs)
    out = left_lookup_join(
        deg.map_batches(lambda t: t.filter(pc.greater(t["deg"], 1)),
                        batch_format="pyarrow"),
        tri, on="node_id", right_on="node_id",
        value_col="n_triangles", out="n_tri")

    def coeff(t: pa.Table) -> pa.Table:
        d = pc.cast(t["deg"], pa.float64())
        tr = pc.cast(pc.fill_null(pc.cast(t["n_tri"], pa.int64()), 0),
                     pa.float64())
        return pa.table({
            "node_id": t["node_id"],
            "deg": t["deg"],
            "clustering": pc.divide(
                pc.multiply(pa.scalar(2.0, pa.float64()), tr),
                pc.multiply(d, pc.subtract(
                    d, pa.scalar(1.0, pa.float64()))))})
    return out.map_batches(coeff, batch_format="pyarrow")
