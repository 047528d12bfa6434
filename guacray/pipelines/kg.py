"""Flagship pipeline: pages → nodes / edges / evidence Parquet.

The Ray-Data re-expression of GUAC's collect → process → parse →
assemble lifecycle (/root/reference/cmd/guacone/cmd/files.go:62-191 and
SURVEY.md §3.1), end to end:

    read_parquet(pages)                      # collectors
      → normalize → extract → link+ids       # processor+parsers+scanners
        (fused into ONE actor-pool pass)     #   (content-hash identity)
      → triples checkpoint (compacted parquet)
      → canonicalize (combiner + ONE bucketed exchange → nodes+edges)
      → write_parquet nodes/ edges/          # assembler backend tables
        (evidence = projection view of the checkpoint)

Everything is lazy/streaming until the writes; nothing materializes the
full dataset on the driver.
"""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..stages.canonicalize import edges_table, evidence_table, nodes_table
from ..stages.extract import extract
from ..stages.link import link
from ..stages.normalize import normalize
from ..state.manifest import Manifest
from .. import schemas


def write_table(ds, out_dir: str, empty_schema=None,
                min_rows_per_file: int | None = None,
                partition_cols: list[str] | None = None) -> None:
    """Overwrite-write a Dataset as a parquet dir, atomically.

    ``write_parquet`` appends part files into an existing dir; a rerun
    would silently double the table.  Write to a sibling tmp dir and
    swap via rename — readers never observe a half-written table and
    reruns are idempotent (the resumability contract).

    ``min_rows_per_file`` compacts output (e.g. a checkpoint that will
    be re-read by shuffles: hundreds of tiny files make every
    downstream exchange pay #blocks² object transfers).
    """
    import shutil
    tmp = out_dir.rstrip("/") + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    ds.write_parquet(tmp, **kwargs)
    if not partition_cols and not any(
            f.endswith(".parquet") for f in os.listdir(tmp)):
        # empty dataset: write_parquet emits no files; persist an explicit
        # empty table so readers see a valid (0-row) parquet dir
        import pyarrow as pa
        schema = ds.schema()
        arrow_schema = getattr(schema, "base_schema", None)
        if not isinstance(arrow_schema, pa.Schema):
            arrow_schema = empty_schema
        if arrow_schema is not None:
            pq.write_table(arrow_schema.empty_table(),
                           os.path.join(tmp, "empty.parquet"))
    _commit_dir(tmp, out_dir)


def upsert_sidecar(path: str, new_ds, keys: list[str], ts_col: str,
                   schema) -> None:
    """Keyed keep-latest commit of a small state sidecar (scan_state,
    collect_state): union the live table with ``new_ds``, keep the max
    ``ts_col`` row per ``keys`` via a distributed grouped max, and
    publish atomically through ``write_table``.  One implementation for
    every sidecar so schema handling / atomicity fixes land once.  The
    live table is projected+cast to ``schema`` (so a column ADDED to the
    schema must be migrated by the caller before calling — see
    enrich._migrate_scan_state for the pattern)."""
    import ray.data as rd

    from ..stages.agg import grouped_agg
    if os.path.isdir(path):
        old = rd.read_parquet(path).map_batches(
            lambda t: t.select(schema.names).cast(schema),
            batch_format="pyarrow")
        new_ds = old.union(new_ds)
    st = grouped_agg(new_ds, keys, [(ts_col, "max", ts_col)])
    write_table(st, path, schema)


def _commit_dir(tmp: str, out_dir: str) -> None:
    """Atomically promote a fully-written tmp dir to ``out_dir``."""
    import shutil
    old = out_dir.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(out_dir):
        os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)


def read_parquet_fast(path_or_paths, **kwargs):
    """``read_parquet`` without the decoding-size sampling pass.

    Ray's parquet planner READS sample files at ``read_parquet()`` call
    time to estimate in-memory block size — 3-7 s of driver-side serial
    constant on a 512-shard input, paid identically at every
    parallelism level (it was the single largest non-scaling term in
    the 8→32 study).  The KG pipeline's inputs are its own uniform
    small shards (pages fixture, compacted triples checkpoint), so
    on-disk size is a fine block-sizing proxy; skip the sampling."""
    from ray.data import DataContext
    ctx = DataContext.get_current()
    old = ctx.decoding_size_estimation
    ctx.decoding_size_estimation = False
    try:
        return rd.read_parquet(path_or_paths, **kwargs)
    finally:
        ctx.decoding_size_estimation = old


def _estimate_pages(pages_path: str) -> tuple[int, int]:
    """Cheap (n_files, row estimate): shard count × rows in ONE footer
    (this pipeline writes uniform shards).  (0, 0) = unknown
    (non-local path)."""
    try:
        files = [os.path.join(r, f) for r, _, fs in os.walk(pages_path)
                 for f in fs if f.endswith(".parquet")]
        if os.path.isfile(pages_path):
            files = [pages_path]
        if not files:
            return 0, 0
        return len(files), len(files) * pq.ParquetFile(
            files[0]).metadata.num_rows
    except OSError:
        return 0, 0


def bulk_ingest_knobs(pages_path: str, heavy_pages_per_cpu: int = 16_000,
                      tasks_per_actor: int = 12):
    """(pages Dataset, link_concurrency) tuned to the input size.

    Two knobs flip together on the same pages-per-CPU axis (round-4
    interleaved matrix at 32 CPUs, disk mode):

    - HEAVY (≥ ~16k pages/cpu — the 1M fixture): pool floor 3·cpus/4
      (the cpus/2 floor never ramps past ~16 actors; link phase
      19.2→14.4 s) and the read split to ~12 tasks per actor (finer
      tail; 23.1→19.0 s) — together ~17 → ~15.5 s e2e.
    - LIGHT (the 262k protocol fixture, 8.2k/cpu): both knobs OFF —
      the extra spawn+ramp and per-task overhead cost 1.5-2 s against
      a ~7 s link phase (matrix best 10.7 s with r3 knobs vs 13.0
      with the heavy ones).

    At 8 CPUs the dispatch is inert either way: the floor formulas
    coincide (6 actors) and 12×6=72 tasks never exceeds the shard
    count.  Unknown sizes (non-local paths) stay LIGHT — the safe
    interactive default.
    """
    from ..stages.link import default_pool_size
    n_files, est = _estimate_pages(pages_path)
    # read_parquet auto-inits Ray later; don't force that here just for
    # a CPU count when called before init (tests, planning helpers)
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else (os.cpu_count() or 4)
    if not est or est / max(cpus, 1) < heavy_pages_per_cpu:
        return read_parquet_fast(pages_path), None
    lo, hi = default_pool_size()
    lc = (max(lo, min(3 * cpus // 4, hi)), hi)
    target = tasks_per_actor * hi
    if target > n_files:
        return read_parquet_fast(
            pages_path, override_num_blocks=target), lc
    return read_parquet_fast(pages_path), lc


class _CkptFlushRegistry:
    """Tracks in-flight background checkpoint writes for fused mode.

    Names are content hashes of the block, so the sets are idempotent
    under Ray task retries: a retried task re-registers and rewrites
    the SAME name byte-for-byte, and a first attempt that died between
    ``expect`` and ``mark_done`` is healed when the retry's write
    lands (done is keyed by name, not by attempt)."""

    def __init__(self):
        self._expected: set = set()
        self._done: set = set()
        self._errors: dict = {}

    def expect(self, name: str) -> None:
        self._expected.add(name)

    def mark_done(self, name: str, err: str | None = None) -> None:
        if err is None:
            self._done.add(name)
        else:
            self._errors[name] = err

    def pending(self) -> tuple[list, dict]:
        return sorted(self._expected - self._done), dict(self._errors)


def _await_ckpt_flush(registry, timeout_s: float = 300.0) -> None:
    """Barrier: block until every expected background write landed.

    Sound because ``expect`` is registered SYNCHRONOUSLY inside the map
    task before it returns — once the exchange execution completes,
    every task has returned, hence every enqueued write is in
    ``expected``; polling until the done-set covers it observes the
    complete picture."""
    import ray
    deadline = time.time() + timeout_s
    while True:
        pending, errors = ray.get(registry.pending.remote())
        if errors:
            raise IOError(f"fused checkpoint writes failed: {errors}")
        if not pending:
            return
        if time.time() > deadline:
            # a worker process died AFTER its task returned but BEFORE
            # its background write flushed — outside Ray's lineage, so
            # the block is unrecoverable; fail loudly (rerun = fresh
            # job, the tmp dir was never promoted)
            raise IOError(
                f"fused checkpoint flush timed out; missing: {pending}")
        time.sleep(0.05)


_FUSED_WRITE_POOL = None  # per worker process, lazily created


def _fused_write_pool():
    global _FUSED_WRITE_POOL
    if _FUSED_WRITE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        # 1 thread: writes are ~0.35 s per 200k-row block and blocks
        # arrive slower than that; a single writer keeps at most one
        # compression running beside the UDF instead of oversubscribing
        _FUSED_WRITE_POOL = ThreadPoolExecutor(max_workers=1)
    return _FUSED_WRITE_POOL


def _fused_checkpoint_writer(tmp_dir: str, registry=None):
    """Pass-through block stage: persist each triples block to the
    checkpoint tmp dir AND emit the pruned canonicalize projection.

    This overlaps the checkpoint write with the downstream exchange in
    ONE streaming execution — the disk mode's write-then-re-read pays a
    full executor teardown/startup plus a serial read-back of the whole
    checkpoint between the two, which is the pipeline's largest
    non-scaling term at saturation (BASELINE.md round-3 study).

    With ``registry`` (async mode) the parquet write itself also moves
    OFF the task's critical path onto a per-worker writer thread —
    pyarrow's writer releases the GIL, so compression overlaps the next
    batch's UDF work; ``_await_ckpt_flush`` is the completion barrier
    before the tmp dir is promoted.  Durability is identical to sync
    fused: nothing is promoted until every write landed.

    Idempotent under Ray task retries: the filename is a deterministic
    content hash of the block (vectorized), so a retried task rewrites
    its own file byte-for-byte instead of appending a duplicate.
    """
    from ..stages.canonicalize import CANON_COLS

    def write_and_project(batch):
        import numpy as np
        import pandas as pd
        if batch.num_rows:
            # hash EVERY identity-bearing column, not just edge_id: two
            # blocks can share an identical edge_id sequence yet differ
            # in evidence columns (the same statement extracted from
            # different urls/warc_ts — routine with duplicated web
            # pages); an edge_id-only name would silently overwrite one
            # block's evidence rows with the other's
            h = np.zeros(batch.num_rows, dtype=np.uint64)
            for i, col in enumerate(("edge_id", "document_ref", "url",
                                     "warc_ts", "props")):
                ch = pd.util.hash_array(
                    batch[col].to_numpy(zero_copy_only=False))
                h ^= (ch << np.uint64(i)) | (ch >> np.uint64(64 - i)) \
                    if i else ch
            name = (f"blk-{batch.num_rows}-"
                    f"{np.bitwise_xor.reduce(h):016x}-{h.sum():016x}")
            path = os.path.join(tmp_dir, f"{name}.parquet")
            if registry is None:
                pq.write_table(batch, path)
            else:
                import ray
                # synchronous on purpose: the task must not complete
                # before its name is registered (see _await_ckpt_flush)
                ray.get(registry.expect.remote(name))

                def _bg_write(b=batch, p=path, n=name):
                    try:
                        pq.write_table(b, p)
                        registry.mark_done.remote(n)
                    except Exception as exc:  # surfaced at the barrier
                        registry.mark_done.remote(n, repr(exc))

                _fused_write_pool().submit(_bg_write)
        return batch.select(CANON_COLS)

    return write_and_project


def linked_triples(pages_ds, alias_ref=None, link_concurrency=None):
    """pages Dataset → linked + content-id'd triples Dataset.

    normalize → extract → link fuse into ONE actor-pool operator (id
    stamping happens inside the linker), so each page is touched by
    exactly one Python task chain with no intermediate serialization.
    """
    ds = normalize(pages_ds)
    ds = extract(ds)
    return link(ds, alias_ref=alias_ref, concurrency=link_concurrency)


def kg_datasets(pages_ds, alias_ref=None, num_buckets: int | None = None,
                link_concurrency=None) -> dict:
    """Wire the full pipeline; returns lazy Datasets keyed by table name.

    The triples dataset feeds three consumers; it is NOT materialized —
    each output re-executes the (cheap, deterministic) lineage. Callers
    that consume all three at scale should write triples first and read
    it back (see ``run_kg``).
    """
    triples = linked_triples(pages_ds, alias_ref, link_concurrency)
    return {
        "triples": triples,
        "nodes": nodes_table(triples, num_buckets),
        "edges": edges_table(triples, num_buckets),
        "evidence": evidence_table(triples),
    }


def broadcast_alias_map(seed: int = 42):
    """ray.put the alias dictionary once; actors fetch it in __init__."""
    from ..data.catalog import build_catalog
    return ray.put(build_catalog(seed).alias_map())


def _dir_num_rows(d: str) -> int:
    """Row count from parquet footers (recursive — handles hive
    partitioning) — no Ray job needed."""
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


EVIDENCE_COLS = ["edge_id", "document_ref", "url", "warc_ts"]


def evidence_view(out_dir: str):
    """The evidence table is a pure projection of the triples
    checkpoint — serving it as a pruned read of ``triples/`` avoids a
    whole extra pass and a duplicate copy on disk (the reference keeps
    provenance inline on every edge instead,
    keyvalue/isDependency.go:46-56)."""
    return rd.read_parquet(os.path.join(out_dir, "triples"),
                           columns=EVIDENCE_COLS)


def _auto_checkpoint_mode(pages_path: str, cpu_threshold: int = 8) -> str:
    """Pick disk vs fused checkpointing from cluster width.

    Round-4 interleaved A/Bs (v3 fixtures, run_kg, min-of-2 per fresh
    process, AFTER the substring-gated extraction landed) separate the
    modes purely by CPU count — input size does not flip a single
    cell:

        262k @  8 CPUs: fused 27.3 s  vs disk 35.8 s
        1M   @  8 CPUs: fused 30.9 s  vs disk 39.6 s
        262k @ 16 CPUs: disk  20.1 s  vs fused 27.6 s
        262k @ 32 CPUs: disk  13.0 s  vs fused 16.8 s
        1M   @ 32 CPUs: disk  15.2 s  vs fused 17.0 s

    Narrow deployments are compute-bound: fused's removal of the
    write→teardown→re-read boundary plus the writer-thread overlap
    wins.  At width, the single fused execution packs poorly — the
    actor pool holds nearly every slot while the exchange's task ops
    need them — and the two-execution disk pipeline wins despite the
    boundary.  (Before the extraction pre-filter the heavier UDF hid
    the packing cost and fused also won 1M @ 32; the dispatch was
    re-derived after that change — re-measure if the link kernel's
    cost profile shifts again.)

    ``pages_path`` is unused today (the crossover proved
    size-independent in the measured range) but stays in the signature
    so a future size-sensitive rule doesn't ripple through callers.
    Outputs are byte-identical across modes
    (test_checkpoint_modes_equal_outputs), so the dispatch never
    changes results; disk remains the wide/default choice and the
    resume boundary at 100 TB.
    """
    del pages_path
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return "fused" if cpus <= cpu_threshold else "disk"


def run_kg(pages_path: str, out_dir: str, *, num_buckets: int | None = None,
           link_concurrency=None, seed: int = 42,
           partition_edges_by_predicate: bool = False,
           checkpoint_mode: str | None = None,
           attestations_path: str | None = None,
           public_keys: dict[str, bytes] | None = None) -> dict:
    """One-shot run: pages parquet → out_dir/{triples,nodes,edges}.

    Three executions total in the default ("disk") mode, each streaming
    end-to-end:
      1. read → normalize→extract→link (one fused actor pass) →
         write compacted triples checkpoint (extract runs exactly once)
      2+3. nodes+edges = combiner + ONE kind-tagged bucketed exchange
         over the checkpoint
    The evidence table is a projection view of the checkpoint
    (``evidence_view``) — no extra pass.  Returns row counts per table
    (parquet footers, no extra Ray job).  See the checkpoint-mode
    comment below for the measured "fused"/"mem" A/B variants.
    """
    alias_ref = broadcast_alias_map(seed)
    pages, auto_lc = bulk_ingest_knobs(pages_path)
    triples = linked_triples(pages, alias_ref,
                             link_concurrency or auto_lc)
    if attestations_path is not None:
        # signed-attestation slice (identity propagation,
        # parser/common/types.go:25-41): verified DSSE envelopes emit
        # (identity)-[signed]->(document) statements in the same
        # TRIPLES shape, unioned BEFORE the checkpoint so every
        # downstream consumer (exchange, evidence view, oracles) sees
        # one consistent statement log
        from ..sources.readers import (dsse_identity_triples,
                                       read_binary_docs,
                                       verify_dsse_stage)
        att = dsse_identity_triples(verify_dsse_stage(
            read_binary_docs(attestations_path), public_keys or {}))
        triples = triples.union(att)
    tri_dir = os.path.join(out_dir, "triples")
    # checkpoint mode (explicit arg > env GUACRAY_CHECKPOINT > the
    # size-aware _auto_checkpoint_mode dispatch above):
    #   "disk" — write the durable checkpoint, then re-read it for the
    #            exchange in a second execution.  Wins wide clusters
    #            (auto picks it above 8 CPUs) and is the resume
    #            boundary at 100 TB.
    #   "fused" — ONE streaming execution: each triples block is
    #            persisted to the checkpoint as a side effect of the
    #            same map task that feeds the canonicalize exchange
    #            (``_fused_checkpoint_writer``; same durable artifact,
    #            promoted atomically after the exchange materializes
    #            AND the flush barrier confirms every background write
    #            landed).  The parquet write runs on a per-worker
    #            thread (round 4), so unlike the round-3 sync variant
    #            it no longer stalls the exchange's critical path at
    #            high parallelism.
    #   "fused-sync" — round-3 fused: write inline in the map task.
    #            Measured 31.8s vs disk's 37.7s at 8 CPUs (IO-bound
    #            regime) and ~equal at 1M pages / 32 CPUs; kept for
    #            deployments that must not lose a block to a worker
    #            crash in the post-task flush window (the async barrier
    #            fails loudly, but cannot recover the block).
    #   "mem"  — pin the FULL triples in the object store so the
    #            exchange skips the disk re-read.  Measured 2.5× WORSE
    #            than disk at 1M pages (object-store pressure) — only
    #            sensible at interactive scales.
    mode = checkpoint_mode or os.environ.get("GUACRAY_CHECKPOINT") \
        or _auto_checkpoint_mode(pages_path)
    from ..stages.canonicalize import CANON_COLS, graph_tables
    fused_tmp = flush_registry = None
    if mode == "mem":
        tri = triples.materialize()
        write_table(tri, tri_dir, schemas.TRIPLES, min_rows_per_file=200_000)
    elif mode in ("fused", "fused-sync", "disk-async"):
        import shutil
        fused_tmp = tri_dir.rstrip("/") + ".__tmp__"
        shutil.rmtree(fused_tmp, ignore_errors=True)
        os.makedirs(fused_tmp, exist_ok=True)
        if mode in ("fused", "disk-async"):
            flush_registry = ray.remote(num_cpus=0)(
                _CkptFlushRegistry).remote()
        # batch_size=200k: the writer coalesces the linker's many small
        # output blocks into compacted checkpoint files (same 200k-row
        # target as disk mode's min_rows_per_file) AND hands the
        # downstream combiner big blocks — per-block dedup on small
        # blocks collapses almost nothing and the exchange would
        # shuffle ~the full triple volume (first fused A/B measured
        # 25% SLOWER than disk for exactly this reason)
        tri = triples.map_batches(
            _fused_checkpoint_writer(fused_tmp, flush_registry),
            batch_format="pyarrow", batch_size=200_000)
        if mode == "disk-async":
            # "disk-async" splits disk mode's two executions WITHOUT its
            # boundary costs: execution 1 is the pure linker pass (the
            # actor pool owns every slot — none of fused's packing
            # contention with exchange task ops), whose output is the
            # PRUNED canon projection pinned in the object store;
            # execution 2 runs the exchange from those blocks (no
            # executor-boundary serial checkpoint re-read).  The full
            # checkpoint blocks flush on per-worker writer threads
            # overlapped with BOTH executions; the barrier + atomic
            # promotion happen after the exchange exactly like fused.
            # Memory: only CANON_COLS rides the object store (the heavy
            # evidence columns go straight to disk), unlike "mem" which
            # pinned full triples and lost 2.5× to spill pressure.
            tri = tri.materialize()
    else:
        write_table(triples, tri_dir, schemas.TRIPLES,
                    min_rows_per_file=200_000)
        # pruned re-read: the exchange never touches url/document_ref/
        # raw surfaces — those columns stay on disk for evidence_view
        tri = read_parquet_fast(tri_dir, columns=CANON_COLS)
    nodes, edges = graph_tables(tri, num_buckets)
    if fused_tmp is not None:
        # graph_tables materialized the exchange, so every upstream
        # block (and its side-effect checkpoint file) is complete —
        # promote the tmp dir atomically, exactly like write_table
        if flush_registry is not None:
            _await_ckpt_flush(flush_registry)
            ray.kill(flush_registry)
        if not any(f.endswith(".parquet") for f in os.listdir(fused_tmp)):
            pq.write_table(schemas.TRIPLES.empty_table(),
                           os.path.join(fused_tmp, "empty.parquet"))
        _commit_dir(fused_tmp, tri_dir)
    write_table(nodes, os.path.join(out_dir, "nodes"), schemas.NODES)
    # per-predicate hive partitioning (SURVEY §7.1 step 6) lets
    # predicate-filtered queries prune whole directories; off by default
    # because hive-partitioned dirs change the raw file layout
    write_table(edges, os.path.join(out_dir, "edges"), schemas.EDGES,
                partition_cols=["predicate"]
                if partition_edges_by_predicate else None)
    counts = {name: _dir_num_rows(os.path.join(out_dir, name))
              for name in ("triples", "nodes", "edges")}
    counts["evidence"] = counts["triples"]
    return counts


def run_kg_resumable(pages_files: list[str], out_dir: str, *,
                     num_buckets: int | None = None, link_concurrency=None,
                     seed: int = 42, files_per_partition: int = 8) -> dict:
    """Resumable run: one checkpoint partition per GROUP of input files.

    Phase A (per-partition, embarrassingly parallel, checkpointed): for
    each group of ``files_per_partition`` input files whose partition is
    not yet in the manifest, run normalize→extract→link and write
    ``out_dir/triples/part=<k>/`` + an atomic manifest entry with
    lineage and metrics.  A killed run reruns only missing partitions.
    Grouping matters: each partition is a full (cheap-but-not-free)
    Ray execution, so 10k input shards as 10k partitions would pay 10k
    executor startups; ~8 files per partition keeps restart granularity
    fine while amortizing that overhead.

    Phase B (global shuffle, idempotent): canonicalize from ALL
    completed triple partitions and (re)write nodes/edges.
    Safe to repeat — content-hash identities make it a pure function of
    the triples table.
    """
    tri_root = os.path.join(out_dir, "triples")
    man = Manifest(tri_root)
    alias_ref = broadcast_alias_map(seed)

    files = sorted(pages_files)
    groups = [files[i:i + files_per_partition]
              for i in range(0, len(files), files_per_partition)]
    for i, group in enumerate(groups):
        pid = f"part-{i:05d}"
        # skip only when the committed entry's recorded inputs match
        # THIS group: partition ids are positional, so a changed input
        # list (new file sorting first, different files_per_partition)
        # shifts groups and a bare done() check would silently skip
        # unprocessed files / keep stale outputs
        if man.done_with_inputs(pid, group):
            continue
        started = time.time()
        part_dir = os.path.join(tri_root, f"part={i:05d}")
        pages = rd.read_parquet(group)
        tri = linked_triples(pages, alias_ref, link_concurrency)
        write_table(tri, part_dir, schemas.TRIPLES)  # idempotent even if a prior write died mid-flight
        rows_out = sum(f.metadata.num_rows for f in (
            pq.ParquetFile(os.path.join(part_dir, n))
            for n in os.listdir(part_dir)))
        man.commit(pid, inputs=group, outputs=[part_dir],
                   rows_in=sum(pq.ParquetFile(p).metadata.num_rows
                               for p in group),
                   rows_out=rows_out, started=started)

    # only manifest-committed partitions OF THIS RUN'S GROUPING feed the
    # shuffle phase (stale entries from a previous, differently-grouped
    # run would double-ingest their files)
    valid = {f"part-{i:05d}" for i in range(len(groups))}
    part_dirs = [e["outputs"][0] for pid, e in man.completed().items()
                 if pid in valid]
    # read_parquet expands a single dir, but a LIST of paths must be files
    part_files = [os.path.join(d, f) for d in part_dirs
                  for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    from ..stages.canonicalize import CANON_COLS, graph_tables
    tri = read_parquet_fast(part_files, columns=CANON_COLS)
    counts = {}
    # ONE kind-tagged exchange for both tables (same plan as run_kg);
    # running nodes_table/edges_table separately would re-read the
    # checkpoint and pay the shuffle twice
    nodes, edges = graph_tables(tri, num_buckets)
    write_table(nodes, os.path.join(out_dir, "nodes"), schemas.NODES)
    write_table(edges, os.path.join(out_dir, "edges"), schemas.EDGES)
    for name in ("nodes", "edges"):
        counts[name] = _dir_num_rows(os.path.join(out_dir, name))
    counts["evidence"] = sum(_dir_num_rows(d) for d in part_dirs)
    return counts
