"""mbnb: NLP-relaxation branch-and-bound for (convex) MINLP.

Reference: src/solvers/{BnbMain.cpp,Bnb.{h,cpp}} — the canonical solver
path (SURVEY.md §3.1).  Usage:

    python -m minotaur_tpu.solvers.mbnb instance.nl [--options]
"""

from __future__ import annotations

import sys

from ..bnb.bnb import BranchAndBound
from .base import Solver


class Bnb(Solver):
    name = "mbnb"

    def solve(self) -> int:
        bab = BranchAndBound(self.problem, env=self.env)
        status = bab.solve()
        log = self.env.logger
        log.info(f"nodes processed: {bab.stats.nodes_processed}  "
                 f"created: {bab.stats.nodes_created}  "
                 f"batches: {bab.stats.batches}  "
                 f"time: {bab.stats.time:.2f}s")
        log.info(f"lower bound: {bab.lb:.10g}  upper bound: {bab.ub:.10g}")
        self.write_solution(status, bab.ub, bab.best_x)
        return 0


def main(argv=None) -> int:
    return Bnb().main(argv)


if __name__ == "__main__":
    sys.exit(main())
