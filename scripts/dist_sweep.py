"""Distributed-QG scaling sweep over a virtual device mesh.

Mirrors the reference's MPI scaling protocol (scripts/mpi_test.sh:5-25:
mpirun -np {2,4,...,P} per instance with -tree_search=bfs) on the
single-controller sharded pool: for each partition count P in
{1, 2, 4, ..., max}, solve each instance with `DistQGBranchAndBound`
on a P-device mesh and report nodes/s, wall time, rebalances, and
migrated-node counts — the same per-rank accounting
MpiBranchAndBound.cpp:408-436 prints.

Run on the development host (virtual CPU devices):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/dist_sweep.py nvs08 milp minlp_eg0 \
        [--max-parts 8] [--time 120] [--node-batch 32] [--out sweep.csv]

On real multi-chip TPU hardware the same script runs unmodified — the
mesh picks up whatever jax.devices() exposes.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SEARCH_DIRS = [
    "/root/reference/test_instances",
    "/root/reference/src/testing/instances",
]


def find_instance(name: str) -> str:
    if os.path.exists(name):
        return name
    for d in SEARCH_DIRS:
        p = os.path.join(d, name if name.endswith(".nl") else name + ".nl")
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("instances", nargs="+")
    ap.add_argument("--max-parts", type=int, default=0,
                    help="largest partition count (0 = all devices)")
    ap.add_argument("--time", type=float, default=120.0)
    ap.add_argument("--node-batch", type=int, default=32)
    ap.add_argument("--tree-search", default="bfs",
                    help="matches the reference protocol's -tree_search=bfs")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu: this container's sitecustomize registers
    # the axon TPU backend eagerly, so the env var alone is NOT enough
    # (CLAUDE.md); jax.config is the only reliable override
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import Mesh

    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.parallel.dist_bnb import DistQGBranchAndBound
    from minotaur_tpu.utils.environment import Environment

    devs = jax.devices()
    max_parts = args.max_parts or len(devs)
    parts_list = [1]
    while parts_list[-1] * 2 <= min(max_parts, len(devs)):
        parts_list.append(parts_list[-1] * 2)

    rows = []
    hdr = ("instance", "parts", "status", "nodes", "wall_s", "nodes_per_s",
           "ub", "lb", "rebalances", "migrated", "per_part_nodes")
    print(",".join(hdr))
    for name in args.instances:
        path = find_instance(name)
        for parts in parts_list:
            p = read_nl(path)
            env = Environment()
            env.set_option("node_batch", args.node_batch)
            env.set_option("tree_search", args.tree_search)
            env.set_option("bnb_time_limit", args.time)
            env.set_option("log_level", 1)
            mesh = Mesh(np.array(devs[:parts]), ("nodes",))
            bab = DistQGBranchAndBound(p, mesh, env=env)
            t0 = time.monotonic()
            st = bab.solve()
            dt = time.monotonic() - t0
            nodes = bab.stats.nodes_processed
            row = (os.path.basename(path), parts, st.name, nodes,
                   round(dt, 2), round(nodes / max(dt, 1e-9), 2),
                   round(bab.ub, 8), round(bab.lb, 8),
                   bab.stats.rebalances, bab.stats.nodes_migrated,
                   "|".join(str(pool.nodes_processed)
                            for pool in bab.pools))
            rows.append(row)
            print(",".join(str(v) for v in row), flush=True)

    if args.out:
        with open(args.out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(hdr)
            w.writerows(rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
