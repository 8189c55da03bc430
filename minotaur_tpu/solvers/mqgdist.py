"""mqgdist: distributed Quesada-Grossmann branch-and-cut over a device
mesh — the `mqgmpi` equivalent (the reference fork's headline binary).

Reference: src/solvers/{QGMpiMain.cpp,QGMpi.{h,cpp}} +
src/base/MpiBranchAndBound.cpp.  Where the reference MPI_Bcasts the .nl
bytes so every rank parses an identical problem (QGMpiMain.cpp:85-106),
a single JAX controller shares the parsed problem and shards the node
batch over a `jax.sharding.Mesh`; incumbent gossip is the pmin
collective inside the sharded superstep and LoadBalance_ is the periodic
global sort + round-robin deal (parallel/dist_bnb.py).

    python -m minotaur_tpu.solvers.mqgdist instance.nl \
        [--mesh_hosts N] [--options]

`mesh_hosts` picks the number of node-pool partitions (devices).  On a
development host run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to validate the sharded path without TPU hardware.
"""

from __future__ import annotations

import sys

from .base import Solver


class QGDist(Solver):
    name = "mqgdist"

    def solve(self) -> int:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from ..parallel.dist_bnb import DistQGBranchAndBound

        want = int(self.env.options.get("mesh_hosts"))
        devs = jax.devices()
        if want <= 1:
            want = len(devs)
        if want > len(devs):
            self.env.logger.info(
                f"mesh_hosts={want} > {len(devs)} devices; using "
                f"{len(devs)}")
            want = len(devs)
        mesh = Mesh(np.array(devs[:want]), ("nodes",))
        bab = DistQGBranchAndBound(self.problem, mesh, env=self.env)
        status = bab.solve()
        log = self.env.logger
        s = bab.qg_stats
        log.info(f"partitions: {bab.n_parts}  "
                 f"nodes: {bab.stats.nodes_processed}  "
                 f"cuts: {s.cuts_added}  nlp solves: {s.nlp_solves} "
                 f"(feasible {s.nlp_feasible})  "
                 f"rebalances: {bab.stats.rebalances}  "
                 f"time: {bab.stats.time:.2f}s")
        log.info(f"lower bound: {bab.lb:.10g}  upper bound: {bab.ub:.10g}")
        self.write_solution(status, bab.ub, bab.best_x)
        return 0


def main(argv=None) -> int:
    return QGDist().main(argv)


if __name__ == "__main__":
    sys.exit(main())
