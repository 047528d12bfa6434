"""Per-phase profiler for the flagship pipeline — the measure-don't-guess
loop used to tune the engine (results recorded in BASELINE.md).

    python scripts/profile_kg.py [num_cpus] [n_pages]

Runs each phase separately with wall timings and dumps the per-operator
stats of the extract pass.  Fresh process per parallelism level —
compare e.g. `profile_kg.py 8` vs `profile_kg.py 32`.
"""

import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NPAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 262144


def main() -> None:
    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from guacray import schemas
    from guacray.data.pages import write_pages_sharded
    from guacray.pipelines.kg import (broadcast_alias_map, linked_triples,
                                      write_table)
    from guacray.stages.canonicalize import graph_tables

    pages_dir = f"/tmp/guacray_bench/pages_profile_{NPAGES}"
    write_pages_sharded(pages_dir, NPAGES)
    rd.read_parquet(pages_dir).count()  # warm page cache

    out = "/tmp/guacray_profile_out"
    shutil.rmtree(out, ignore_errors=True)

    def phase(name, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{name:<24} {time.perf_counter() - t0:7.2f}s", flush=True)
        return r

    alias_ref = broadcast_alias_map()
    tri_lazy = linked_triples(rd.read_parquet(pages_dir), alias_ref)
    phase("E1 extract+checkpoint", lambda: write_table(
        tri_lazy, out + "/triples", schemas.TRIPLES,
        min_rows_per_file=200_000))
    tri = rd.read_parquet(out + "/triples")
    nodes, edges = phase("E2 canonical exchange",
                         lambda: graph_tables(tri))
    phase("E3 table writes", lambda: (
        write_table(nodes, out + "/nodes", schemas.NODES),
        write_table(edges, out + "/edges", schemas.EDGES)))

    print("\n-- extract-pass operators (span vs summed task wall) --")
    st = tri_lazy.stats()
    for m in re.finditer(
            r"Operator (\d+) (\S{1,70}).*? in ([\d.]+)s\n"
            r"\* Remote wall time: .*?, ([\d.]+m?s) total", st, re.S):
        print(f"op{m.group(1)} {m.group(2)[:56]:<58} "
              f"span {m.group(3):>7}s  task-wall {m.group(4)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
