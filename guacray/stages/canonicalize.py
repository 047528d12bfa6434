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
    (``int(key_prefix,16) % B``) + ``groupby("bucket").map_groups`` —
    one vectorized merge per bucket, B ≈ cluster parallelism.  Using B
    coarse buckets instead of per-key groups keeps the reduce side
    vectorized (pyarrow group_by inside each bucket) rather than one
    Python call per key.

All identities are content hashes (functions/keys.py), so the whole
step is idempotent and order-independent: re-running, re-ingesting, or
changing the cluster size yields byte-identical sorted tables.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.keys import edge_id as _edge_id
from ..functions.keys import node_id as _node_id

DEFAULT_BUCKETS = 32


def _bucket_of(ids: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Deterministic shuffle bucket from the first 8 hex chars of an id."""
    return pa.array(
        [int(h[:8], 16) % num_buckets for h in ids.to_pylist()],
        type=pa.int32(),
    )


def add_ids_batch(batch: pa.Table) -> pa.Table:
    """Stamp content-hash subj_id / obj_id / edge_id columns."""
    subj_ids = [_node_id(k) for k in batch["subj_key"].to_pylist()]
    obj_ids = [_node_id(k) for k in batch["obj_key"].to_pylist()]
    preds = batch["predicate"].to_pylist()
    eids = [_edge_id(s, p, o) for s, p, o in zip(subj_ids, preds, obj_ids)]
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
    agg = t.group_by("node_id").aggregate(
        [("node_key", "min"), ("node_type", "min"), ("name", "min")])
    agg = agg.rename_columns(["node_id", "node_key", "node_type", "name"])
    return agg.append_column("bucket", _bucket_of(agg["node_id"], num_buckets))


def _node_merge_group(group: pa.Table) -> pa.Table:
    agg = group.group_by("node_id").aggregate(
        [("node_key", "min"), ("node_type", "min"), ("name", "min")])
    return agg.rename_columns(["node_id", "node_key", "node_type", "name"])


def _edge_partial_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Combiner: partial edge aggregate (count evidence, min first_seen)."""
    t = pa.table({
        "edge_id": batch["edge_id"],
        "subj_id": batch["subj_id"],
        "predicate": batch["predicate"],
        "obj_id": batch["obj_id"],
        "warc_ts": batch["warc_ts"],
    })
    agg = t.group_by("edge_id").aggregate(
        [("subj_id", "min"), ("predicate", "min"), ("obj_id", "min"),
         ("warc_ts", "min"), ("edge_id", "count")])
    agg = agg.rename_columns(
        ["edge_id", "subj_id", "predicate", "obj_id", "first_seen", "n_evidence"])
    agg = agg.set_column(agg.schema.get_field_index("n_evidence"),
                         "n_evidence", pc.cast(agg["n_evidence"], pa.int64()))
    return agg.append_column("bucket", _bucket_of(agg["edge_id"], num_buckets))


def _edge_merge_group(group: pa.Table) -> pa.Table:
    agg = group.group_by("edge_id").aggregate(
        [("subj_id", "min"), ("predicate", "min"), ("obj_id", "min"),
         ("first_seen", "min"), ("n_evidence", "sum")])
    return agg.rename_columns(
        ["edge_id", "subj_id", "predicate", "obj_id", "first_seen", "n_evidence"])


def add_ids(ds):
    return ds.map_batches(add_ids_batch, batch_format="pyarrow")


def nodes_table(linked_ds, num_buckets: int = DEFAULT_BUCKETS):
    """linked+id'd triples Dataset → canonical nodes Dataset.

    Columns: node_id, node_key, node_type, name.
    """
    partial = linked_ds.map_batches(
        lambda b: _node_rows_batch(b, num_buckets), batch_format="pyarrow")
    return partial.groupby("bucket").map_groups(
        _node_merge_group, batch_format="pyarrow")


def edges_table(linked_ds, num_buckets: int = DEFAULT_BUCKETS):
    """linked+id'd triples Dataset → canonical edges Dataset.

    Columns: edge_id, subj_id, predicate, obj_id, first_seen, n_evidence.
    """
    partial = linked_ds.map_batches(
        lambda b: _edge_partial_batch(b, num_buckets), batch_format="pyarrow")
    return partial.groupby("bucket").map_groups(
        _edge_merge_group, batch_format="pyarrow")


def evidence_table(linked_ds):
    """Append-only provenance: edge_id → (document_ref, url, warc_ts).

    The analog of GUAC's blob store + per-edge Origin/Collector/
    DocumentRef provenance columns.  No shuffle: pure projection.
    """
    return linked_ds.select_columns(
        ["edge_id", "document_ref", "url", "warc_ts"])
