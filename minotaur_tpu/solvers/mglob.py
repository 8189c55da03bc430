"""mglob: global optimization of (MI)QCQPs.

Reference: src/solvers/{GlobMain.cpp,Glob.{h,cpp}} — transform to
term-separable standard form, convexity check (convex -> forward to QG,
Glob.cpp:392-400), else spatial B&B over McCormick/secant envelopes.

    python -m minotaur_tpu.solvers.mglob instance.nl [--options]
"""

from __future__ import annotations

import sys

from ..glob.glob_bnb import GlobBranchAndBound
from ..glob.transformer import is_convex_quadratic
from ..utils.types import FunctionType
from .base import Solver


class Glob(Solver):
    name = "mglob"

    def solve(self) -> int:
        log = self.env.logger
        p = self.problem
        has_general_nl = any(
            c.fun.nlf is not None and c.fun.nlf.root >= 0 for c in p.cons) \
            or (p.obj and p.obj.fun.nlf is not None and
                p.obj.fun.nlf.root >= 0)
        if has_general_nl:
            log.info("general nonlinear instance: forwarding to mbnb "
                     "(NLP-based B&B)")
            from ..bnb.bnb import BranchAndBound
            bab = BranchAndBound(p, env=self.env)
            status = bab.solve()
            self.write_solution(status, bab.ub, bab.best_x)
            return 0
        if is_convex_quadratic(p):
            log.info("convex quadratic instance: forwarding to QG "
                     "(reference Glob fwd2QG_)")
            from ..bnb.qg import QGBranchAndBound
            bab = QGBranchAndBound(p, env=self.env)
            status = bab.solve()
            self.write_solution(status, bab.ub, bab.best_x)
            return 0
        bab = GlobBranchAndBound(p, env=self.env)
        status = bab.solve()
        log.info(f"nodes: {bab.nodes_processed}  lb: {bab.lb:.10g}  "
                 f"ub: {bab.ub:.10g}")
        self.write_solution(status, bab.ub, bab.best_x)
        return 0


def main(argv=None) -> int:
    return Glob().main(argv)


if __name__ == "__main__":
    sys.exit(main())
