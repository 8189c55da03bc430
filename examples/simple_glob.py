"""Example: nonconvex bilinear program solved globally.

Reference analogue: examples/simple-glob and examples/bilinear
(bilinear-relax.cpp): McCormick relaxation + spatial branching.  Here
the envelopes are computed inside the jitted superstep from each node's
box, and RLT bound-factor cuts tighten the root.

    python examples/simple_glob.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(node_batch=8, log_level=3):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.glob.glob_bnb import GlobBranchAndBound
    from minotaur_tpu.ir.functions import Function, LinearFunction, \
        QuadraticFunction
    from minotaur_tpu.ir.problem import Problem
    from minotaur_tpu.utils.environment import Environment

    # min -x0*x1 - x2  s.t. x0 + x1 + 2 x2 <= 4,  x in [0, 2]^3
    p = Problem("glob-demo")
    for _ in range(3):
        p.new_variable(0.0, 2.0)
    p.new_constraint(
        Function(lf=LinearFunction({0: 1.0, 1: 1.0, 2: 2.0})),
        -np.inf, 4.0)
    qf = QuadraticFunction()
    qf.add_term(0, 1, -1.0)
    p.new_objective(Function(lf=LinearFunction({2: -1.0}), qf=qf))

    env = Environment()
    env.set_option("node_batch", node_batch)
    env.set_option("log_level", log_level)
    env.set_option("bnb_node_limit", 2000)
    bab = GlobBranchAndBound(p, env)
    status = bab.solve()
    print(f"{status.name}: ub={bab.ub:.8g} lb={bab.lb:.8g} "
          f"x*={bab.best_x} nodes={bab.nodes_processed}")
    return bab


if __name__ == "__main__":
    main()
