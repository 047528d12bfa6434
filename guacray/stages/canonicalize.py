"""Canonicalize stage: linked triples → deduplicated nodes / edges tables.

GUAC analog: the assembler — noun extraction + first-wins dedup maps
(/root/reference/pkg/assembler/assembler.go:196-547) and the keyvalue
backend's content-hash edge upsert
(backends/keyvalue/isDependency.go:46-56,119-140).  GUAC does this
behind one global server lock; here it is the pipeline's one keyed
shuffle, expressed as a two-phase aggregation:

  phase 1 (combiner, inside ``map_batches``): per-block vectorized
    dedup/partial-aggregate with ``pyarrow.TableGroupBy`` — each block
    emits ≤1 row per key.  This is the skew defence: a head entity
    appearing in 10% of all pages still contributes at most one row per
    block to the shuffle, so no reducer sees the raw hot-key volume.
  phase 2 (exchange): an explicit hash-bucket column
    (``int(key_prefix,16) % B``) + coalesce + ``groupby("bucket").
    map_groups`` — one vectorized merge per bucket, B scaling with the
    cluster.  Using B coarse buckets instead of per-key groups keeps
    the reduce side vectorized (pyarrow group_by inside each bucket)
    rather than one Python call per key; coalescing combiner outputs
    first keeps the sort shuffle from paying #blocks² transfers.
    ``graph_tables`` shares ONE exchange between the nodes and edges
    dedups (kind-tagged rows) — half the passes of running them apart.

All identities are content hashes (functions/keys.py), so the whole
step is idempotent and order-independent: re-running, re-ingesting, or
changing the cluster size yields byte-identical sorted tables.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.keys import edge_id as _edge_id
from ..functions.keys import node_id as _node_id
from ..functions.keys import node_qualifiers
from .agg import agg_by_name

DEFAULT_BUCKETS = 32

# the columns the canonicalization exchange actually consumes — readers
# of the triples checkpoint should prune to these (url / document_ref /
# raw surfaces stay on disk for the evidence view only)
CANON_COLS = ["subj_id", "obj_id", "edge_id",
              "subj_key", "subj_type", "subj_name",
              "obj_key", "obj_type", "obj_name",
              "predicate", "props", "warc_ts"]


def resolve_buckets(num_buckets: int | None) -> int:
    """Shuffle parallelism: scales with the cluster (2×CPUs, min 32).
    On a 256-node cluster this becomes thousands of buckets — the knob
    that keeps reduce-side blocks bounded as data grows."""
    if num_buckets is not None:
        return num_buckets
    import ray
    return max(DEFAULT_BUCKETS, int(ray.cluster_resources().get("CPU", 16)))


def resolve_buckets_pow2(num_buckets: int | None = None) -> int:
    """``resolve_buckets`` rounded up to a power of two, for stages that
    derive the bucket with ``pc.bit_wise_and(key, nb - 1)`` (cheapest
    vectorized modulo for int keys).  Same scaling property: grows with
    the cluster instead of capping reduce parallelism at a literal."""
    b = resolve_buckets(num_buckets)
    return 1 << (b - 1).bit_length()


def _exchange(partials, merge_fn, num_buckets: int,
              coalesce: bool | None = None):
    """Bucketed exchange: coalesce the (small) partial blocks to
    ``num_buckets`` blocks first — the sort shuffle moves #map-blocks ×
    #reduce-blocks objects, so feeding it hundreds of tiny combiner
    outputs costs more than the sort itself (measured 5× on 550k rows).

    ``coalesce``: Round-4 interleaved A/B at 1M pages: the repartition
    wins ~3× at 32 CPUs and ~1.7× at 8 EVEN on an already-compacted
    23-block checkpoint read (12.5s → 4.1s / 19.8s → 11.8s for the full
    exchange) — the old block-count skip heuristic's premise only holds
    for inputs already bucketed BY THE EXCHANGE KEY, which a block
    count cannot detect.  So ``None`` now means repartition (round-5,
    per that measurement); ``False`` is the explicit escape for callers
    that measured a genuinely pre-bucketed layout.
    """
    if coalesce is None:
        coalesce = True
    if coalesce:
        partials = partials.repartition(num_buckets)
    return partials.groupby("bucket").map_groups(merge_fn,
                                                 batch_format="pyarrow")


def _bucket_of(ids: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Deterministic shuffle bucket from an id column — vectorized
    (pandas siphash with a fixed key, stable across runs/processes);
    this runs on every combiner output row, so a Python int(h[:8],16)
    loop here was the exchange's main per-row residue."""
    import numpy as np
    import pandas as pd
    h = pd.util.hash_array(ids.to_numpy(zero_copy_only=False))
    return pa.array((h % num_buckets).astype(np.int32), type=pa.int32())


# Worker-level content-id memo caches: identity hashes are pure
# functions of their key strings, and web-corpus keys repeat heavily
# (head entities; edges average many evidence rows per identity), so
# memoizing turns ~3 blake2b calls per triple into ~3 dict hits.
# Bounded: cleared when they outgrow the cap (keys are unbounded only
# in adversarial inputs; canonical key cardinality ≪ triple count).
_ID_CACHE_CAP = 1_000_000
_node_id_cache: dict[str, str] = {}
_edge_id_cache: dict[tuple, str] = {}


def _node_id_memo(key: str) -> str:
    nid = _node_id_cache.get(key)
    if nid is None:
        if len(_node_id_cache) >= _ID_CACHE_CAP:
            _node_id_cache.clear()
        nid = _node_id_cache[key] = _node_id(key)
    return nid


def edge_ids_memo(subj_ids, preds, obj_ids, props) -> list[str]:
    """Memoized edge-id minting with the canonical min-id orientation
    for symmetric predicates — shared by the bulk ingest path and the
    enrichment delta (enrich.py ``to_edges``), so every producer mints
    identical ids for identical statements."""
    from ..functions.text import SYMMETRIC_PREDICATES
    ecache = _edge_id_cache
    if len(ecache) >= _ID_CACHE_CAP:
        ecache.clear()
    eids = []
    for s, p, o, pr in zip(subj_ids, preds, obj_ids, props):
        ek = (o, p, s, pr) if p in SYMMETRIC_PREDICATES and o < s \
            else (s, p, o, pr)
        eid = ecache.get(ek)
        if eid is None:
            eid = ecache[ek] = _edge_id(*ek)
        eids.append(eid)
    return eids


def add_ids_batch(batch: pa.Table) -> pa.Table:
    """Stamp content-hash subj_id / obj_id / edge_id columns.

    Edge identity covers the typed props string (when present), so
    prop-distinct statements stay distinct edges (assembler InputSpec
    identity, keyvalue/isDependency.go:46-56)."""
    subj_ids = [_node_id_memo(k) for k in batch["subj_key"].to_pylist()]
    obj_ids = [_node_id_memo(k) for k in batch["obj_key"].to_pylist()]
    preds = batch["predicate"].to_pylist()
    props = (batch["props"].to_pylist() if "props" in batch.column_names
             else [""] * batch.num_rows)
    # undirected predicates hash in canonical (min id first) orientation
    # so "A partnered with B" and "B partnered with A" get ONE edge_id
    # (assembler.go:84 equal-edge semantics).  The triple row keeps
    # statement order (provenance); the edges-table combiner
    # (_edge_partial_batch) normalizes the stored orientation.
    eids = edge_ids_memo(subj_ids, preds, obj_ids, props)
    batch = batch.append_column("subj_id", pa.array(subj_ids, type=pa.string()))
    batch = batch.append_column("obj_id", pa.array(obj_ids, type=pa.string()))
    batch = batch.append_column("edge_id", pa.array(eids, type=pa.string()))
    return batch


def _node_rows_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Combiner: one batch of linked+id'd triples → unique node rows."""
    sides = []
    for side in ("subj", "obj"):
        sides.append(pa.table({
            "node_id": batch[f"{side}_id"],
            "node_key": batch[f"{side}_key"],
            "node_type": batch[f"{side}_type"],
            "name": batch[f"{side}_name"],
        }))
    t = pa.concat_tables(sides)
    agg = agg_by_name(t, ["node_id"], [
        ("node_key", "min", "node_key"), ("node_type", "min", "node_type"),
        ("name", "min", "name")])
    # qualifiers: pure projection of the key (no first-wins ordering
    # needed) — the pkg-trie qualifier column of helpers/package.go:26-99
    agg = agg.append_column("qualifiers", pa.array(
        [node_qualifiers(k) for k in agg["node_key"].to_pylist()],
        type=pa.string()))
    return agg.append_column("bucket", _bucket_of(agg["node_id"], num_buckets))


def _node_merge_group(group: pa.Table) -> pa.Table:
    return agg_by_name(group, ["node_id"], [
        ("node_key", "min", "node_key"), ("node_type", "min", "node_type"),
        ("name", "min", "name"), ("qualifiers", "min", "qualifiers")])


def _edge_partial_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Combiner: partial edge aggregate (count evidence, min first_seen)."""
    from ..functions.text import SYMMETRIC_PREDICATES
    props = (batch["props"] if "props" in batch.column_names
             else pa.array([""] * batch.num_rows, type=pa.string()))
    # store undirected edges in canonical (min id first) orientation —
    # vectorized swap; MUST happen before the group_by, otherwise the
    # per-column "min" could pair a subj from one orientation with an
    # obj from the other
    sym = pa.array(sorted(SYMMETRIC_PREDICATES))
    swap = pc.and_(pc.is_in(batch["predicate"], value_set=sym),
                   pc.less(batch["obj_id"], batch["subj_id"]))
    s_col = pc.if_else(swap, batch["obj_id"], batch["subj_id"])
    o_col = pc.if_else(swap, batch["subj_id"], batch["obj_id"])
    t = pa.table({
        "edge_id": batch["edge_id"],
        "subj_id": s_col,
        "predicate": batch["predicate"],
        "obj_id": o_col,
        "props": props,
        "warc_ts": batch["warc_ts"],
    })
    # props is constant within an edge_id group (it is hashed into the
    # id), so "min" is a carry, not a choice
    agg = agg_by_name(t, ["edge_id"], [
        ("subj_id", "min", "subj_id"), ("predicate", "min", "predicate"),
        ("obj_id", "min", "obj_id"), ("props", "min", "props"),
        ("warc_ts", "min", "first_seen"),
        ("edge_id", "count", "n_evidence")])
    agg = agg.set_column(agg.schema.get_field_index("n_evidence"),
                         "n_evidence", pc.cast(agg["n_evidence"], pa.int64()))
    return agg.append_column("bucket", _bucket_of(agg["edge_id"], num_buckets))


def with_undirected(t: pa.Table) -> pa.Table:
    """Append the ``undirected`` flag — a pure projection of the
    predicate, so it never travels through the exchange."""
    from ..functions.text import SYMMETRIC_PREDICATES
    sym = pa.array(sorted(SYMMETRIC_PREDICATES))
    return t.append_column("undirected", pc.is_in(t["predicate"],
                                                  value_set=sym))


def _edge_merge_group(group: pa.Table) -> pa.Table:
    return agg_by_name(group, ["edge_id"], [
        ("subj_id", "min", "subj_id"), ("predicate", "min", "predicate"),
        ("obj_id", "min", "obj_id"), ("props", "min", "props"),
        ("first_seen", "min", "first_seen"),
        ("n_evidence", "sum", "n_evidence")])


def add_ids(ds):
    return ds.map_batches(add_ids_batch, batch_format="pyarrow")


# ---- combined nodes+edges canonicalization (single exchange) ----------
#
# nodes and edges are two keyed dedups over the same triples input; a
# naive plan runs two full executions (read → partial → shuffle → merge
# → write).  Tagging partial rows with a `kind` column and sharing ONE
# exchange halves the passes over the checkpoint and the shuffle count —
# the dedup semantics are unchanged because (kind, key) partitions the
# keyspace.

def _combined_partial(batch: pa.Table, num_buckets: int) -> pa.Table:
    n = _node_rows_batch(batch, num_buckets)
    e = _edge_partial_batch(batch, num_buckets)
    ts_type = e.schema.field("first_seen").type
    nt = pa.table({
        "kind": pa.array([0] * n.num_rows, type=pa.int8()),
        "key": n["node_id"],
        "a": n["node_key"], "b": n["node_type"], "c": n["name"],
        "d": n["qualifiers"],
        "ts": pa.nulls(n.num_rows, type=ts_type),
        "n": pa.nulls(n.num_rows, type=pa.int64()),
        "bucket": n["bucket"],
    })
    et = pa.table({
        "kind": pa.array([1] * e.num_rows, type=pa.int8()),
        "key": e["edge_id"],
        "a": e["subj_id"], "b": e["predicate"], "c": e["obj_id"],
        "d": e["props"],
        "ts": e["first_seen"],
        "n": pc.cast(e["n_evidence"], pa.int64()),
        "bucket": e["bucket"],
    })
    return pa.concat_tables([nt, et])


def _combined_merge(group: pa.Table) -> pa.Table:
    return agg_by_name(group, ["kind", "key"], [
        ("a", "min", "a"), ("b", "min", "b"), ("c", "min", "c"),
        ("d", "min", "d"), ("ts", "min", "ts"), ("n", "sum", "n")])


def graph_tables(linked_ds, num_buckets: int | None = None,
                 coalesce: bool | None = None):
    """One exchange → (nodes Dataset, edges Dataset).

    The combined result is materialized (it is canonical-size — orders
    of magnitude smaller than the triples input), then the two table
    views are cheap in-memory projections.

    ``coalesce`` forwards to ``_exchange``; the ``None`` default
    repartitions (the round-4 A/B measured that winning ~3× even on a
    compacted checkpoint read — compact blocks are still not bucketed
    by the exchange key).  Pass False only for input already bucketed
    by the exchange's own key.
    """
    nb = resolve_buckets(num_buckets)
    # batch_size=None → combiner sees whole blocks; on 1024-row default
    # batches the per-batch dedup collapses almost nothing and the
    # exchange shuffles ~the full triple volume
    partial = linked_ds.map_batches(
        lambda b: _combined_partial(b, nb), batch_format="pyarrow",
        batch_size=None)
    combined = _exchange(partial, _combined_merge, nb,
                         coalesce=coalesce).materialize()

    def to_nodes(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], pa.scalar(0, type=pa.int8())))
        return pa.table({"node_id": t["key"], "node_key": t["a"],
                         "node_type": t["b"], "name": t["c"],
                         "qualifiers": t["d"]})

    def to_edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], pa.scalar(1, type=pa.int8())))
        return with_undirected(pa.table({
            "edge_id": t["key"], "subj_id": t["a"],
            "predicate": t["b"], "obj_id": t["c"],
            "props": t["d"], "first_seen": t["ts"],
            "n_evidence": pc.cast(t["n"], pa.int64())}))

    nodes = combined.map_batches(to_nodes, batch_format="pyarrow")
    edges = combined.map_batches(to_edges, batch_format="pyarrow")
    return nodes, edges


def nodes_table(linked_ds, num_buckets: int | None = None):
    """linked+id'd triples Dataset → canonical nodes Dataset.

    Columns: node_id, node_key, node_type, name.
    """
    nb = resolve_buckets(num_buckets)
    partial = linked_ds.map_batches(
        lambda b: _node_rows_batch(b, nb), batch_format="pyarrow",
        batch_size=None)  # whole blocks: the combiner's collapse ratio
    return _exchange(partial, _node_merge_group, nb)


def edges_table(linked_ds, num_buckets: int | None = None):
    """linked+id'd triples Dataset → canonical edges Dataset.

    Columns: edge_id, subj_id, predicate, obj_id, first_seen, n_evidence.
    """
    nb = resolve_buckets(num_buckets)
    partial = linked_ds.map_batches(
        lambda b: _edge_partial_batch(b, nb), batch_format="pyarrow",
        batch_size=None)
    return _exchange(partial, _edge_merge_group, nb).map_batches(
        with_undirected, batch_format="pyarrow")


def _bucket_of_str(vals, num_buckets: int) -> pa.Array:
    return _bucket_of(vals, num_buckets)


def document_summary(linked_ds, num_buckets: int | None = None):
    """Per-document rollup of what was extracted — the HasSBOM.Includes
    analog (per-document aggregation of all ids emitted by one doc,
    /root/reference/pkg/assembler/clients/helpers/bulk.go:202-210).

    Output: document_ref, url, n_triples, n_distinct_edges, first_ts.
    Exact under any block layout: the combiner emits distinct
    (document_ref, edge_id) pairs with partial triple counts; the
    exchange co-locates by document_ref; the merge re-dedups pairs
    before counting (sum of per-block distincts would double-count an
    edge whose document straddles blocks).
    """
    nb = resolve_buckets(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        pairs = agg_by_name(batch, ["document_ref", "edge_id"], [
            ("url", "min", "url"), ("warc_ts", "min", "first_ts"),
            ("edge_id", "count", "n_triples")])
        pairs = pairs.set_column(
            pairs.schema.get_field_index("n_triples"), "n_triples",
            pc.cast(pairs["n_triples"], pa.int64()))
        return pairs.append_column(
            "bucket", _bucket_of_str(pairs["document_ref"], nb))

    def merge(group: pa.Table) -> pa.Table:
        pairs = agg_by_name(group, ["document_ref", "edge_id"], [
            ("url", "min", "url"), ("first_ts", "min", "first_ts"),
            ("n_triples", "sum", "n_triples")])
        agg = agg_by_name(pairs, ["document_ref"], [
            ("url", "min", "url"), ("first_ts", "min", "first_ts"),
            ("n_triples", "sum", "n_triples"),
            ("document_ref", "count", "n_distinct_edges")])
        for c in ("n_triples", "n_distinct_edges"):
            agg = agg.set_column(agg.schema.get_field_index(c), c,
                                 pc.cast(agg[c], pa.int64()))
        return agg

    return _exchange(linked_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None), merge, nb)


def evidence_table(linked_ds):
    """Append-only provenance: edge_id → (document_ref, url, warc_ts).

    The analog of GUAC's blob store + per-edge Origin/Collector/
    DocumentRef provenance columns.  No shuffle: pure projection.
    """
    return linked_ds.select_columns(
        ["edge_id", "document_ref", "url", "warc_ts"])
