"""moa: multi-tree Outer Approximation for convex MINLP.

Reference: src/solvers/OA.cpp (`moa`, commented out of the reference's
CMake but shipped; OA.cpp:457-624).

    python -m minotaur_tpu.solvers.moa instance.nl [--options]
"""

from __future__ import annotations

import sys

from ..bnb.oa import OABranchAndBound
from .base import Solver


class OA(Solver):
    name = "moa"

    def solve(self) -> int:
        bab = OABranchAndBound(self.problem, env=self.env)
        status = bab.solve()
        log = self.env.logger
        s = bab.oa_stats
        log.info(f"major iterations: {s.major_iters}  milp nodes: "
                 f"{s.milp_nodes}  nlp solves: {s.nlp_solves}  "
                 f"cuts: {s.cuts_added}")
        log.info(f"lower bound: {bab.lb:.10g}  upper bound: {bab.ub:.10g}")
        self.write_solution(status, bab.ub, bab.best_x)
        return 0


def main(argv=None) -> int:
    return OA().main(argv)


if __name__ == "__main__":
    sys.exit(main())
