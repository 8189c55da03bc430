"""Example: multi-tree outer approximation (OA).

Reference analogue: examples/outer-approx and the moa solver (OA.cpp):
alternate a master MILP over the cut pool with fixed-integer NLP
subproblems.

    python examples/outer_approx.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(node_batch=8, log_level=3):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.bnb.oa import OABranchAndBound
    from minotaur_tpu.ir.functions import Function, LinearFunction, \
        QuadraticFunction
    from minotaur_tpu.ir.problem import Problem
    from minotaur_tpu.utils.environment import Environment
    from minotaur_tpu.utils.types import VarType

    # convex MIQP: min (x0-1.3)^2 + (x1-2.6)^2, x integer in [0,4]^2,
    #              x0 + x1 >= 2
    p = Problem("oa-demo")
    p.new_variable(0.0, 4.0, vtype=VarType.INTEGER)
    p.new_variable(0.0, 4.0, vtype=VarType.INTEGER)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     2.0, np.inf)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    qf.add_term(1, 1, 1.0)
    p.new_objective(Function(
        lf=LinearFunction({0: -2.6, 1: -5.2}), qf=qf), const=1.69 + 6.76)

    env = Environment()
    env.set_option("node_batch", node_batch)
    env.set_option("log_level", log_level)
    bab = OABranchAndBound(p, env)
    status = bab.solve()
    print(f"{status.name}: ub={bab.ub:.8g} x*={bab.best_x}")
    return bab


if __name__ == "__main__":
    main()
