"""Example: building and using the expression DAG directly.

Reference analogue: examples/cguseqflf (hand-built CGraph, eval +
derivatives) — here the DAG stages to jax for eval/grad and to the
interval engine for FBBT, the two roles CGraph plays in the reference
(CGraph.h:54-71,198).

    python examples/expr_dag_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(log=True):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from minotaur_tpu.ir.expr import ExprGraph
    from minotaur_tpu.ops.opcodes import Op
    from minotaur_tpu.ops.interval import stage_fbbt
    from minotaur_tpu.ops.stage import stage_scalar

    # f(x) = exp(0.5 x0) + x1 * sqrt(x2) - x0 * x1
    g = ExprGraph()
    t_exp = g.node(Op.EXP, g.node(Op.MULT, g.num(0.5), g.var(0)))
    t_mix = g.node(Op.MULT, g.var(1), g.node(Op.SQRT, g.var(2)))
    t_bil = g.node(Op.MULT, g.var(0), g.var(1))
    g.set_root(g.node(Op.MINUS, g.node(Op.PLUS, t_exp, t_mix), t_bil))

    f = stage_scalar(g)
    x = jnp.array([1.0, 2.0, 4.0])
    val = float(f(x))
    grad = np.asarray(jax.grad(f)(x))
    expected = np.exp(0.5) + 2 * 2.0 - 2.0
    assert abs(val - expected) < 1e-12

    # vmapped evaluation over a batch (how node batches use the DAG)
    xs = jnp.stack([x, 2 * x, 3 * x])
    vals = np.asarray(jax.vmap(f)(xs))

    # interval FBBT: impose f(x) <= 3 on the box [0,2]x[0,2]x[1,4]
    fb = stage_fbbt(g, 3)
    xlo = jnp.array([0.0, 0.0, 1.0])
    xhi = jnp.array([2.0, 2.0, 4.0])
    nlo, nhi, infeas = fb(xlo, xhi, jnp.array(-np.inf), jnp.array(3.0))
    nlo, nhi = np.asarray(nlo), np.asarray(nhi)
    if log:
        print(f"f(1,2,4) = {val:.12g}   grad = {grad}")
        print(f"batch vals = {vals}")
        print(f"FBBT under f<=3:  lo {nlo}  hi {nhi}  "
              f"infeasible={bool(infeas)}")
    return val, grad, (nlo, nhi)


if __name__ == "__main__":
    main()
