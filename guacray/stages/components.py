"""Distributed connected components via min-label propagation.

The scale path for equivalence-class expansion (HashEqual/PkgEqual
class walks, /root/reference/pkg/assembler/assembler.go:84;
retrieveDependencies start-node expansion, guacrest/server/
retrieveDependencies.go:145-260): ``GraphStore.equivalence_class`` BFS
is fine for ONE node's class, but labeling EVERY node's component —
e.g. to canonicalize all partnered_with clusters at once — must not
iterate a driver-side frontier per class.

Classic label propagation, all-distributed per iteration:

  labels(v) ← min(labels(v), min over neighbors u of labels(u))

Each iteration is two hash/broadcast joins (labels onto each edge
endpoint), a union with the current labels, and one two-phase grouped
min — converging in O(component diameter) iterations.  The driver sees
only the per-iteration changed-count (a scalar).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .agg import agg_by_name, auto_join, grouped_agg


_FP_WIDTH = 64  # max label length the fingerprint encoding supports


def _fingerprint_chunk(arr: pa.Array) -> int:
    """Vectorized exact equivalent of
    ``sum(int.from_bytes(lb.encode().ljust(64, b'\\x00'), 'big'))``:
    ``ascii_rpad`` (byte-wise, UTF-8 safe — verified against the
    per-row encoding incl. multi-byte labels) zero-pads every label
    to exactly ``_FP_WIDTH`` bytes in one Arrow kernel, so the value
    buffer reshapes to an (n, 64) uint8 matrix; column-sum it and
    combine the 64 column sums with 256^k weights as Python big
    ints. Measured 2.5x the per-row loop on 1M labels — earlier
    numpy variants (boolean-mask gather, argsort prefix slices,
    bincount keys) all LOST to the per-row loop on this hardware
    because they materialize large intermediate index arrays; the
    rpad route moves the per-byte work into one C++ kernel."""
    import numpy as np

    n = len(arr)
    if n == 0:
        return 0
    assert arr.null_count == 0, "null label in fingerprint input"
    padded = pc.cast(pc.ascii_rpad(arr, _FP_WIDTH, "\x00"),
                     pa.large_binary())
    offs = np.frombuffer(padded.buffers()[1], np.int64)[
        padded.offset:padded.offset + n + 1]
    # a label longer than the width is left un-padded by rpad and
    # breaks the fixed stride — same contract the per-row assert had
    assert offs[-1] - offs[0] == n * _FP_WIDTH, \
        "label too long for fingerprint"
    data = np.frombuffer(padded.buffers()[2], np.uint8)[offs[0]:offs[-1]]
    colsums = data.reshape(n, _FP_WIDTH).sum(axis=0, dtype=np.int64)
    return sum(int(c) << (8 * (_FP_WIDTH - 1 - k))
               for k, c in enumerate(colsums))


def _label_fingerprint(labels_ds) -> int:
    """EXACT change detector without a join: sum over all labels of an
    order-preserving big-int encoding (label bytes right-padded to a
    fixed width).  Valid because propagation moves every label
    monotonically downward in lexicographic order — every per-node
    delta is ≤ 0 under an order-preserving encoding, so the total sum
    strictly decreases iff ANY label changed; deltas cannot cancel.
    Partial sums are arbitrary-precision, shipped as strings."""
    def partial(t: pa.Table) -> pa.Table:
        s = sum(_fingerprint_chunk(c) for c in t["label"].chunks)
        return pa.table({"s": pa.array([str(s)], type=pa.string())})

    parts = labels_ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None).take_all()
    return sum(int(r["s"]) for r in parts)


def connected_components(edges_ds, *, subj_col: str = "subj_id",
                         obj_col: str = "obj_id",
                         max_iters: int = 50):
    """edges Dataset → (node_id, component) Dataset, where component is
    the lexicographic-min node id of the node's connected component
    (edges treated as undirected).

    Deterministic: content-hash node ids make the min-label a stable,
    engine-independent component representative.
    """
    pairs = edges_ds.map_batches(
        lambda t: pa.table({"a": t[subj_col], "b": t[obj_col]}),
        batch_format="pyarrow").materialize()

    # initial labels: every endpoint, label = own id (two-phase dedup)
    def node_rows(t: pa.Table) -> pa.Table:
        both = pa.concat_tables([pa.table({"node_id": t["a"]}),
                                 pa.table({"node_id": t["b"]})])
        return agg_by_name(both, ["node_id"], [])

    labels = pairs.map_batches(node_rows, batch_format="pyarrow",
                               batch_size=None)
    labels = grouped_agg(
        labels.map_batches(
            lambda t: t.append_column("label", t["node_id"]),
            batch_format="pyarrow"),
        ["node_id"], [("label", "min", "label")]).materialize()

    prev = _label_fingerprint(labels)
    for _ in range(max_iters):
        # labels onto each endpoint → per-edge candidate labels in both
        # directions, then min per node including the current label
        la = auto_join(pairs, labels, on="a", right_on="__n",
                       right_rename={"node_id": "__n", "label": "__la"})
        lab = auto_join(la, labels, on="b", right_on="__m",
                        right_rename={"node_id": "__m", "label": "__lb"})

        def candidates(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                pa.table({"node_id": t["a"], "label": t["__lb"]}),
                pa.table({"node_id": t["b"], "label": t["__la"]}),
            ])

        cand = lab.map_batches(
            lambda t: candidates(t.select(["a", "b", "__la", "__lb"])),
            batch_format="pyarrow")
        merged = grouped_agg(cand.union(labels), ["node_id"],
                             [("label", "min", "label")]).materialize()

        # pointer jumping (label(v) ← label(label(v))): shortcuts long
        # chains so convergence is O(log diameter) rounds, not
        # O(diameter) — the standard trick in distributed CC
        hop = auto_join(
            merged, merged, on="label", right_on="__ln",
            right_rename={"node_id": "__ln", "label": "__ll"})
        merged = grouped_agg(
            hop.map_batches(
                lambda t: pa.table({"node_id": t["node_id"],
                                    "label": pc.min_element_wise(
                                        t["label"], t["__ll"])}),
                batch_format="pyarrow"),
            ["node_id"], [("label", "min", "label")]).materialize()

        # convergence: labels are monotonically non-increasing per node,
        # so the SUM of per-label integer prefixes strictly decreases
        # iff any label changed — an exact check from one cheap grouped
        # sum over the (small, materialized) labels table, no join.
        # The previous iteration's fingerprint is CARRIED as a scalar,
        # not recomputed — one fingerprint pass per iteration.
        fp = _label_fingerprint(merged)
        labels = merged
        if fp == prev:
            break
        prev = fp

    return labels.map_batches(
        lambda t: pa.table({"node_id": t["node_id"],
                            "component": t["label"]}),
        batch_format="pyarrow")
