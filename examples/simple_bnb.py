"""Example: hand-built convex MINLP solved by plain B&B.

Reference analogue: examples/simple-bnb/simple-bnb-cg.cpp (build a
Problem in code, wire handlers, run BranchAndBound).  Here the handler
wiring disappears: integrality, FBBT and bounding live inside one fused
superstep.

    python examples/simple_bnb.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(node_batch=8, log_level=3):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.bnb.bnb import BranchAndBound
    from minotaur_tpu.ir.functions import Function, LinearFunction, \
        QuadraticFunction
    from minotaur_tpu.ir.problem import Problem
    from minotaur_tpu.utils.environment import Environment
    from minotaur_tpu.utils.types import VarType

    # min x0^2 + x1^2 - x0 - 2 x1,  x0 + x1 <= 3,  x1 integer in [0, 5]
    p = Problem("simple")
    p.new_variable(0.0, 5.0)
    p.new_variable(0.0, 5.0, vtype=VarType.INTEGER)
    p.new_constraint(Function(lf=LinearFunction({0: 1.0, 1: 1.0})),
                     -np.inf, 3.0)
    qf = QuadraticFunction()
    qf.add_term(0, 0, 1.0)
    qf.add_term(1, 1, 1.0)
    p.new_objective(Function(lf=LinearFunction({0: -1.0, 1: -2.0}), qf=qf))

    env = Environment()
    env.set_option("node_batch", node_batch)
    env.set_option("log_level", log_level)
    bab = BranchAndBound(p, env)
    status = bab.solve()
    print(f"{status.name}: ub={bab.ub:.8g} x*={bab.best_x} "
          f"nodes={bab.stats.nodes_processed}")
    return bab


if __name__ == "__main__":
    main()
