"""Benchmark sweep harness.

Reference: scripts/minlp-test.py (runs a solver binary over an instance
directory against a solutions CSV with a time limit) and
scripts/report.py.  Usage:

    python scripts/run_sweep.py INSTANCE_DIR_OR_GLOB \
        [--solver mbnb|mqg|mglob|mmultistart|moa] [--time 60] \
        [--out results.csv] [--solutions known.csv] [--options "k=v,..."]

Writes one CSV row per instance: name, status, ub, lb, gap, nodes,
wall seconds, and (if a solutions file is given) the deviation from the
known objective.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SOLVERS = {
    "mbnb": ("minotaur_tpu.bnb.bnb", "BranchAndBound"),
    "mqg": ("minotaur_tpu.bnb.qg", "QGBranchAndBound"),
    "moa": ("minotaur_tpu.bnb.oa", "OABranchAndBound"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("instances")
    ap.add_argument("--solver", default="mbnb", choices=sorted(SOLVERS))
    ap.add_argument("--time", type=float, default=60.0)
    ap.add_argument("--nodes", type=int, default=10 ** 7)
    ap.add_argument("--out", default="sweep_results.csv")
    ap.add_argument("--solutions", default="")
    ap.add_argument("--options", default="",
                    help="extra options, comma-separated name=value")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.utils.environment import Environment

    known = {}
    if args.solutions:
        with open(args.solutions) as fh:
            for row in csv.reader(fh):
                if len(row) >= 2:
                    try:
                        known[row[0].strip()] = float(row[1])
                    except ValueError:
                        pass

    if os.path.isdir(args.instances):
        paths = sorted(glob.glob(os.path.join(args.instances, "*.nl")))
    else:
        paths = sorted(glob.glob(args.instances))
    if not paths:
        print(f"no instances match {args.instances}", file=sys.stderr)
        return 1

    mod_name, cls_name = SOLVERS[args.solver]
    import importlib
    cls = getattr(importlib.import_module(mod_name), cls_name)

    rows = []
    for path in paths:
        name = os.path.basename(path).rsplit(".", 1)[0]
        env = Environment()
        env.set_option("bnb_time_limit", args.time)
        env.set_option("bnb_node_limit", args.nodes)
        env.set_option("log_level", 1)
        for kv in filter(None, args.options.split(",")):
            k, v = kv.split("=", 1)
            env.set_option(k.strip(), v.strip())
        t0 = time.monotonic()
        try:
            p = read_nl(path)
            bab = cls(p, env=env)
            status = bab.solve().name
            ub, lb = bab.ub, bab.lb
            nodes = bab.stats.nodes_processed
        except Exception as e:
            status, ub, lb, nodes = f"ERROR:{type(e).__name__}", float("inf"), \
                float("-inf"), 0
        wall = time.monotonic() - t0
        gap = (ub - lb) / max(abs(ub), 1e-10) if ub < 1e19 and lb > -1e19 \
            else float("inf")
        dev = ub - known[name] if name in known else ""
        rows.append([name, status, f"{ub:.10g}", f"{lb:.10g}",
                     f"{gap:.3e}", nodes, f"{wall:.1f}", dev])
        print(f"{name:24s} {status:22s} ub={ub:<14.8g} gap={gap:.2e} "
              f"nodes={nodes:<7d} {wall:.1f}s", flush=True)

    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["instance", "status", "ub", "lb", "gap", "nodes",
                    "wall_s", "dev_from_known"])
        w.writerows(rows)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
