"""Entity-linking stage: surface triples → canonically keyed triples.

GUAC analog: the ingest-time enrichment scanners / deps.dev client — a
stateful stage holding a lookup structure in worker state with a
per-actor cache (/root/reference/pkg/ingestor/parser/common/scanner/
scanner.go:39-63; client cache internal/client/depsdevclient/
deps_dev_client.go:70,585,618).

Ray shape: a callable CLASS passed to ``map_batches(…, concurrency=N)``
— an actor pool.  The alias dictionary is built/deserialized ONCE per
actor in ``__init__`` (broadcast via ``ray.put`` from the driver: one
object-store copy per node, never re-shipped per batch), and lookups
run per batch.  At 100 TB the dictionary would be sharded by alias
hash across a larger pool; the lookup path is identical.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.keys import entity_key, fallback_key


class Linker:
    """Actor-pool batch linker.

    ``alias_ref`` is either a plain dict (tests / small runs) or a Ray
    ObjectRef to one (production: ``ray.put(alias_map)`` on the driver).
    """

    def __init__(self, alias_ref=None, seed: int = 42):
        import ray

        if alias_ref is None:
            from ..data.catalog import build_catalog
            self.alias_map = build_catalog(seed).alias_map()
        elif isinstance(alias_ref, dict):
            self.alias_map = alias_ref
        else:
            self.alias_map = ray.get(alias_ref)
        # memoized surface → (etype, key, name); GUAC's client-cache analog
        self._cache: dict[str, tuple[str, str, str]] = {}

    def _link(self, surface: str) -> tuple[str, str, str]:
        hit = self._cache.get(surface)
        if hit is not None:
            return hit
        m = self.alias_map.get(surface.lower())
        if m is None:
            res = ("unknown", fallback_key(surface), surface.strip().lower())
        else:
            etype, canonical = m
            res = (etype, entity_key(etype, canonical), canonical)
        self._cache[surface] = res
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list[str]] = {
            "subj_type": [], "subj_key": [], "subj_name": [],
            "obj_type": [], "obj_key": [], "obj_name": [],
        }
        for side in ("subj", "obj"):
            for v in batch[f"{side}_surface"].to_pylist():
                etype, key, name = self._link(v)
                cols[f"{side}_type"].append(etype)
                cols[f"{side}_key"].append(key)
                cols[f"{side}_name"].append(name)
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, type=pa.string()))
        # stamp content-hash ids here (fused into the same actor pass —
        # a separate map operator would re-serialize the whole table)
        from .canonicalize import add_ids_batch
        return add_ids_batch(batch)


def link_via_join(ds, alias_table, num_partitions: int | None = None):
    """Scale-path linking: entity resolution as distributed hash joins.

    The broadcast-dictionary actor pool (``link``) assumes the alias
    map fits a worker's heap.  Beyond that (north-star: sharded
    dictionaries), linking is a JOIN problem:

      1. distinct surfaces (two-phase dedup — far smaller than triples)
      2. surfaces ⋈ alias table (hash join; alias table is a Dataset,
         sharded by the join, never held whole anywhere)
      3. resolved (surface → type/key/name) mapping joined back onto
         the triples, once per side

    Produces byte-identical output to the actor-pool path (tested).
    ``alias_table`` columns: surface, etype, canonical.
    """
    import pyarrow.compute as pc

    from ..functions.keys import entity_key, fallback_key
    from ..stages.agg import auto_join

    # 1. distinct surfaces
    def surfaces_batch(t: pa.Table) -> pa.Table:
        s = pa.concat_tables([pa.table({"surface": t["subj_surface"]}),
                              pa.table({"surface": t["obj_surface"]})])
        agg = s.group_by("surface").aggregate([])
        return agg

    surfaces = ds.map_batches(surfaces_batch, batch_format="pyarrow",
                              batch_size=None)
    surfaces = surfaces.map_batches(
        lambda t: t.append_column("lsurface", pc.utf8_lower(t["surface"])),
        batch_format="pyarrow")

    # 2. resolve against the alias table (left side keeps unmatched)
    import pandas as pd
    import ray

    resolved = auto_join(surfaces, alias_table,
                         on="lsurface", right_on="alias")

    def finish_resolution(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"surface": df["surface"]})
        out["rtype"] = df["etype"]
        out["rkey"] = [entity_key(e, c) for e, c in
                       zip(df["etype"], df["canonical"])]
        out["rname"] = df["canonical"]
        return out

    resolved = resolved.map_batches(finish_resolution, batch_format="pandas")
    res_df = resolved.to_pandas()  # resolved mapping: |distinct surfaces|
    # (at extreme scale this collect becomes joins back per side — the
    # auto_join below IS that join; broadcast is the small-side case)
    res_map = {s: (t, k, n) for s, t, k, n in zip(
        res_df["surface"], res_df["rtype"], res_df["rkey"], res_df["rname"])}
    map_ref = ray.put(res_map)

    def apply(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        cols = {f"{side}_{f}": [] for side in ("subj", "obj")
                for f in ("type", "key", "name")}
        for side in ("subj", "obj"):
            for v in t[f"{side}_surface"].to_pylist():
                hit = m.get(v)
                if hit is None:
                    hit = ("unknown", fallback_key(v), v.strip().lower())
                cols[f"{side}_type"].append(hit[0])
                cols[f"{side}_key"].append(hit[1])
                cols[f"{side}_name"].append(hit[2])
        for name, vals in cols.items():
            t = t.append_column(name, pa.array(vals, type=pa.string()))
        from .canonicalize import add_ids_batch
        return add_ids_batch(t)

    return ds.map_batches(apply, batch_format="pyarrow")


def alias_dataset(seed: int = 42):
    """The alias dictionary as a Dataset (surface rows) — the sharded
    form of the linker state."""
    import ray.data as rd

    from ..data.catalog import build_catalog
    rows = [{"alias": a, "etype": t, "canonical": c}
            for a, (t, c) in build_catalog(seed).alias_map().items()]
    return rd.from_items(rows)


def default_pool_size() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster.

    min=1 so the pool can never starve downstream task operators of
    CPUs (a FIXED pool of size == cluster CPUs deadlocks the streaming
    executor: actors hold every slot, the write/shuffle tasks wait
    forever).  max leaves 2 CPUs of headroom for read/write stages.
    """
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # min = half the cluster: the autoscaler ramps from `min`, and a
    # min of 1 leaves 31 CPUs idle for the first seconds of every run;
    # max leaves 2 CPUs of headroom so downstream task operators can
    # always make progress (a pool == cluster size deadlocks).
    return (max(1, cpus // 2), max(2, cpus - 2))


def link(ds, alias_ref=None, concurrency=None, batch_size: int = 512):
    """batch_size is deliberately small: upstream normalize/extract fuse
    into this actor stage, so the batch unit here is PAGES (≈1.5 ms of
    UDF work each) — 512 keeps task granularity high enough that an
    autoscaled pool stays busy instead of 30 actors idling behind 31
    giant tasks."""
    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(Linker, fn_constructor_kwargs={"alias_ref": alias_ref},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)
