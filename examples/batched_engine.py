"""Example: direct use of the batched IPM engine.

Reference analogue: examples/simple-base and examples/root-relaxation
(load a problem into an engine, solve the relaxation, inspect duals).
The TPU engine solves a whole BATCH of boxes in one vmapped call — the
unit of work is "many relaxations", not one.

    python examples/batched_engine.py [instance.nl]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT = "/root/reference/test_instances/nvs08.nl"


def main(path=DEFAULT, batch=8):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.engines.ipm import build_batch_solver
    from minotaur_tpu.engines.staging import stage_problem
    from minotaur_tpu.io.nl_reader import read_nl

    p = read_nl(path)
    sp = stage_problem(p)
    solve = build_batch_solver(sp)

    # batch = the root box + progressively shrunk copies (as if branching)
    vlb = np.tile(sp.vlb, (batch, 1))
    vub = np.tile(sp.vub, (batch, 1))
    rng = np.random.default_rng(0)
    for b in range(1, batch):
        lo = np.where(np.isfinite(sp.vlb), sp.vlb, -10.0)
        hi = np.where(np.isfinite(sp.vub), sp.vub, 10.0)
        cut = rng.uniform(0.0, 0.4 * (hi - lo))
        vlb[b] = lo + cut * rng.integers(0, 2, sp.n)
        vub[b] = hi - cut * rng.integers(0, 2, sp.n)
        bad = vlb[b] > vub[b]
        vlb[b][bad], vub[b][bad] = vub[b][bad], vlb[b][bad]

    res = solve(sp.A, sp.clb, sp.cub, vlb, vub)
    print("status:", np.asarray(res.status))
    print("obj   :", np.round(np.asarray(res.obj), 6))
    print("dual  :", np.round(np.asarray(res.dual_bound), 6))
    return res


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [DEFAULT]))
