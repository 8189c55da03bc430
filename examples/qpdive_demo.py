"""Example: QP-diving primal heuristic (qpdive analogue).

Reference analogue: examples/qpdive + QPDProcessor.cpp — dive through
integer fixings on a cheap quadratic model of the NLP instead of full
NLP solves.  TPU-native shape: a POPULATION of dives advances one
vmapped QP batch per depth (the reference dives one node at a time).

    python examples/qpdive_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(lanes=8, log=True):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.bnb.qpd import QPDiver
    from minotaur_tpu.engines.ipm import build_batch_solver
    from minotaur_tpu.engines.staging import stage_problem
    from minotaur_tpu.models.generators import convex_miqp

    p = convex_miqp(n_cont=3, n_int=5, seed=0)
    sp = stage_problem(p)

    # root relaxation gives the reference point for the QP model
    solve = build_batch_solver(sp)
    res = solve(sp.A, sp.clb, sp.cub, sp.vlb[None, :], sp.vub[None, :])
    x0 = np.asarray(res.x[0])
    if log:
        print(f"root relaxation obj {float(res.obj[0]):.8g}")

    diver = QPDiver(p, sp, x_ref=x0, lanes=lanes)
    cands = diver.run(sp.vlb, sp.vub, x0)
    if log:
        for x, val in cands[:3]:
            print(f"feasible candidate: obj {val:.8g}")
        if not cands:
            print("no feasible candidate found")
    return cands


if __name__ == "__main__":
    main()
