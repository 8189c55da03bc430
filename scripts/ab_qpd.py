"""A/B: nodeproc=pcb vs nodeproc=qpd (VERDICT r3 weak #5).

The QPD node processor (reference QPDProcessor.{h,cpp}) replaces the
true-model superstep with a PSD-projected QP superstep plus true-model
verification of every prune/incumbent decision.  This harness measures
both processors on nonconvex-objective instances; results are committed
in scripts/AB_QPD.md (measure-before-keeping rule, CLAUDE.md).

Usage: python scripts/ab_qpd.py [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(problem_factory, nodeproc, node_limit=4000, batch=8):
    from minotaur_tpu.bnb.bnb import BranchAndBound
    from minotaur_tpu.utils.environment import Environment
    env = Environment()
    env.set_option("log_level", 0)
    env.set_option("nodeproc", nodeproc)
    env.set_option("node_batch", batch)
    env.set_option("bnb_node_limit", node_limit)
    p = problem_factory()
    bab = BranchAndBound(p, env)
    t0 = time.monotonic()
    st = bab.solve()
    dt = time.monotonic() - t0
    return dict(status=st.name, nodes=bab.stats.nodes_processed,
                wall=round(dt, 2), ub=round(bab.ub, 6),
                lb=round(bab.lb, 6),
                qpd_verified=getattr(bab, "_qpd_verified", 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.models.generators import quadratic_knapsack

    cases = {
        "nvs08": lambda: read_nl(
            "/root/reference/test_instances/nvs08.nl"),
        "qknap12": lambda: quadratic_knapsack(12, density=0.4, seed=3),
        "qknap16": lambda: quadratic_knapsack(16, density=0.3, seed=1),
    }
    print(f"{'instance':10s} {'proc':4s} {'status':22s} {'nodes':>7s} "
          f"{'wall':>8s} {'ub':>12s} {'lb':>12s} {'verified':>8s}")
    for name, mk in cases.items():
        for proc in ("pcb", "qpd"):
            r = run(mk, proc)
            print(f"{name:10s} {proc:4s} {r['status']:22s} "
                  f"{r['nodes']:7d} {r['wall']:8.2f} {r['ub']:12.6g} "
                  f"{r['lb']:12.6g} {r['qpd_verified']:8d}", flush=True)


if __name__ == "__main__":
    main()
