"""Solve-to-gap sweep on real hardware (VERDICT r3 next-step #1).

Mirrors the reference's benchmark harness (scripts/minlp-test.py:36-60:
run the solver over an instance list with a time limit, verify against a
solutions table).  Instances: the two shipped reference .nl files that
close (nvs08) or stress (tls4, color_lab2_4x0) the pipeline, plus the
14 convex-family analogues from models/convex_suite.py — each with an
INDEPENDENT exact optimum (brute force / DP / pattern enumeration) that
the solved ub is verified against.

    python scripts/tpu_sweep.py                      # real TPU (default)
    python scripts/tpu_sweep.py --platform cpu       # rehearsal
    python scripts/tpu_sweep.py --only nvs08,gbd_a   # subset

Outputs: SWEEP CSV (one row per instance) + a markdown table written to
--out / --md.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference/test_instances"

# per-instance plan: (kind, source, solver, node_limit, time_cap,
#                     known/exact optimum or None, note)
PLAN = [
    ("ref", f"{REF}/nvs08.nl", "mbnb", 4000, 420.0, 23.449673,
     "shipped; MINLPLib optimum"),
    ("suite", "ball_mk_10a", "mbnb", 4000, 420.0, None, "ball_mk2_10"),
    ("suite", "ball_mk_16a", "mbnb", 8000, 420.0, None, "ball_mk3_20"),
    ("suite", "normcon_20a", "mbnb", 8000, 420.0, None,
     "cvxnonsep_normcon20"),
    ("suite", "expbudget_8a", "mbnb", 4000, 420.0, None,
     "cvxnonsep_psig20"),
    ("suite", "duopt_8a", "mbnb", 4000, 420.0, None, "du-opt5"),
    ("suite", "meanvar_8a", "mbnb", 4000, 420.0, None, "meanvarx"),
    ("suite", "facloc_4x8a", "mbnb", 4000, 420.0, None, "fac3"),
    ("suite", "gbd_a", "mbnb", 4000, 420.0, None, "gbd"),
    ("suite", "ex1223_a", "mbnb", 4000, 420.0, None, "ex1223a"),
    ("suite", "batchdes_a", "mbnb", 4000, 420.0, None, "batchdes"),
    ("suite", "cknap_30a", "mbnb", 4000, 420.0, None, "correlated knap"),
    ("suite", "layout1d_4a", "mbnb", 8000, 420.0, None, "flay03/slay"),
    ("suite", "uflquad_3x6a", "mbnb", 8000, 420.0, None, "uflquad"),
    ("suite", "synthes_5a", "mbnb", 4000, 420.0, None, "synthes2/rsyn"),
    # stockcycle/rsyn: mbnb, not mqg — the NLP-B&B path closes these
    # exactly (CPU rehearsal: 26-33 s) while the QG master's compile
    # ladder ate the caps at 5-7% gaps in the first r5 pass
    ("suite", "stockcycle_24a", "mbnb", 12000, 420.0, None, "stockcycle"),
    ("suite", "stockcycle_60a", "mbnb", 120000, 420.0, None,
     "stockcycle n=60"),
    ("suite", "sssd_7x3a", "mbnb", 4000, 420.0, None, "sssd08-04"),
    ("suite", "sssd_8x3b", "mbnb", 4000, 420.0, None, "sssd seed5"),
    ("suite", "portcard_8_3a", "mbnb", 4000, 420.0, None,
     "portfol_card/alan"),
    ("suite", "portcard_10_3b", "mbnb", 4000, 420.0, None, "portfol n=10"),
    ("suite", "clay2_3a", "mbnb", 8000, 420.0, None, "clay0203m/slay 2-D"),
    ("suite", "clay2_3b", "mbnb", 8000, 420.0, None, "clay seed6"),
    ("suite", "rsyn_8a", "mbnb", 8000, 420.0, None, "rsyn0805"),
    ("suite", "rsyn_10b", "mbnb", 8000, 420.0, None, "rsyn k=10"),
    ("suite", "st_e14a", "mqg", 2000, 420.0, None, "st_e14"),
    ("suite", "st_e14b", "mqg", 2000, 420.0, None, "st_e14 seed2"),
    # deliberate n >= 1000 dense-wall rows (VERDICT r4 next-step #3/#5)
    ("suite", "cknap_1200a", "mbnb", 3000, 900.0, None,
     "n=1200 MILP knapsack"),
    ("suite", "normcon_1024a", "mqg", 600, 900.0, None,
     "n=1024 int norm-cone"),
    ("suite", "intquad_2048a", "mbnb", 600, 900.0, None,
     "n=2048 separable MIQP"),
    ("ref", f"{REF}/tls4.nl", "mqg", 2000, 600.0, 8.3,
     "shipped; optimum 8.3; implied demand rows lift the root lb"),
    ("ref", f"{REF}/color_lab2_4x0.nl", "mbnb", 32768, 600.0, None,
     "shipped; 300-binary MIQP; no published optimum — gap reported"),
]

# artifact-level regression floor (VERDICT r4 weak #1): tls4's certified
# lb must never fall below the PROVEN continuous-relaxation value.  A
# violation fails the sweep artifact, not just a unit test.
TLS4_LB_FLOOR = 1.70933 - 2e-3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_one(kind, src, solver, node_limit, time_cap, batch, pad_full):
    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.utils.environment import Environment

    if kind == "suite":
        from minotaur_tpu.models.convex_suite import SUITE
        gen, opt, fam = SUITE[src]
        p = gen()
        exact = opt()
    else:
        p = read_nl(src)
        exact = None

    env = Environment()
    env.set_option("log_level", 0)
    if p.n_vars >= 1000:
        # dense-wall rows: (B, n, n) KKT workspaces cap the batch, and
        # a smaller QG cut pool keeps the master (m+pool, n) array from
        # blowing up device memory (the r5 worker crash on the n=1024
        # row happened with the default 2048-row pool)
        batch = min(batch, 4 if p.n_vars <= 1500 else 2)
        env.set_option("qg_max_cuts", 256)
    env.set_option("node_batch", batch)
    env.set_option("pad_full", int(pad_full))
    env.set_option("bnb_node_limit", node_limit)
    env.set_option("bnb_time_limit", time_cap)
    if "color_lab" in src:
        # measured color_lab IPM profile (bench.py provenance)
        env.set_option("ipm_max_iters", 28)
        env.set_option("ipm_tail_kkt_rounds", 4)
        env.set_option("ipm_refine_steps", 0)
        env.set_option("ipm_chol_retry", 0)
        env.set_option("node_batch", 64)
    if solver == "mqg":
        from minotaur_tpu.bnb.qg import QGBranchAndBound as K
    else:
        from minotaur_tpu.bnb.bnb import BranchAndBound as K
    bab = K(p, env)
    t0 = time.monotonic()
    try:
        st = bab.solve()
        status = st.name
    except Exception as e:               # TPU worker hiccups: keep partial
        status = f"ERROR:{type(e).__name__}"
    wall = time.monotonic() - t0
    gap = (bab.ub - bab.lb) / max(1.0, abs(bab.ub)) \
        if bab.ub < 1e19 else float("inf")
    return dict(status=status, wall=round(wall, 1),
                nodes=bab.stats.nodes_processed,
                ub=bab.ub, lb=bab.lb, gap=gap, exact=exact)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pad-full", type=int, default=1)
    ap.add_argument("--only", default="")
    ap.add_argument("--time-scale", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(REPO, "scripts",
                                                  "tpu_sweep_results.csv"))
    ap.add_argument("--md", default=os.path.join(REPO, "SWEEP_r5.md"))
    ap.add_argument("--rows-jsonl", default=os.path.join(
        REPO, "scripts", "sweep_rows.jsonl"),
        help="incremental per-row results (crash-proof; artifacts are "
        "rebuilt from this file)")
    ap.add_argument("--resume", action="store_true",
        help="skip rows already present in --rows-jsonl")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    platform = jax.devices()[0].platform
    log(f"sweep: devices = {jax.devices()}")

    only = set(args.only.split(",")) if args.only else None
    rows = []
    done = {}
    if args.resume and os.path.exists(args.rows_jsonl):
        with open(args.rows_jsonl) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done[r["name"]] = r
                except Exception:
                    pass
        log(f"sweep: resume — {len(done)} rows loaded from "
            f"{args.rows_jsonl}")
    t_sweep = time.monotonic()
    for kind, src, solver, nlim, tcap, known, note in PLAN:
        name = os.path.basename(src).replace(".nl", "")
        if only and name not in only:
            continue
        if name in done:
            rows.append(done[name])
            continue
        log(f"sweep: {name} ({solver}) ...")
        r = run_one(kind, src, solver, nlim, tcap * args.time_scale,
                    args.batch, args.pad_full)
        truth = r["exact"] if r["exact"] is not None else known
        if truth is not None and r["ub"] < 1e19:
            r["ub_vs_truth"] = abs(r["ub"] - truth) / max(1.0, abs(truth))
            r["verified"] = r["ub_vs_truth"] <= 1e-5
        else:
            r["ub_vs_truth"] = None
            r["verified"] = None
        rows.append(dict(name=name, solver=solver, note=note,
                         truth=truth, **r))
        with open(args.rows_jsonl, "a") as f:
            f.write(json.dumps(rows[-1]) + "\n")
        log(f"sweep: {name}: {r['status']} wall={r['wall']}s "
            f"nodes={r['nodes']} ub={r['ub']:.8g} lb={r['lb']:.8g} "
            f"gap={r['gap']:.3g} verified={r['verified']}")

    total = time.monotonic() - t_sweep
    n_opt = sum(1 for r in rows if r["status"] == "SOLVED_OPTIMAL")
    n_ver = sum(1 for r in rows if r["verified"])
    floor_fail = [r for r in rows if r["name"] == "tls4"
                  and r["lb"] < TLS4_LB_FLOOR]
    for r in floor_fail:
        r["note"] += " **LB FLOOR REGRESSION**"
        log(f"sweep: TLS4 LB FLOOR REGRESSION: lb={r['lb']:.6g} < "
            f"{TLS4_LB_FLOOR:.6g} — artifact FAILS")

    with open(args.out, "w") as f:
        f.write("instance,solver,status,wall_s,nodes,ub,lb,rel_gap,"
                "truth,verified,note\n")
        for r in rows:
            f.write(f"{r['name']},{r['solver']},{r['status']},{r['wall']},"
                    f"{r['nodes']},{r['ub']:.10g},{r['lb']:.10g},"
                    f"{r['gap']:.3g},"
                    f"{'' if r['truth'] is None else format(r['truth'], '.10g')},"
                    f"{r['verified']},{r['note']}\n")

    with open(args.md, "w") as f:
        f.write(
            "# Solve-to-gap sweep (round 5)\n\n"
            f"Platform: **{platform}** ({jax.devices()[0]}).  Harness:\n"
            "`scripts/tpu_sweep.py` (mirror of the reference's\n"
            "scripts/minlp-test.py:36-60 protocol: instance list + time\n"
            "caps + solutions verification).  Gap target 1e-6 relative\n"
            "(solAbs/solRel defaults, BranchAndBound.cpp:278-283\n"
            "semantics).  Instances: shipped reference .nl files plus\n"
            "same-family analogues of the convex list\n"
            "(models/convex_suite.py), each with an INDEPENDENT exact\n"
            "optimum (vectorized brute force, DP over a separable\n"
            "budget, or binary-pattern enumeration + active-set QP) the\n"
            "solved ub is checked against.\n\n"
            f"**{n_opt}/{len(rows)} SOLVED_OPTIMAL at 1e-6; "
            f"{n_ver} ubs verified against ground truth; total wall "
            f"{total:.0f}s.**\n\n"
            "| instance | family | solver | status | wall s | nodes | ub"
            " | lb | rel gap | truth | ub==truth |\n"
            "|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            truth = "—" if r["truth"] is None else f"{r['truth']:.8g}"
            ver = {True: "✅", False: "❌", None: "—"}[r["verified"]]
            f.write(f"| {r['name']} | {r['note']} | {r['solver']} | "
                    f"{r['status']} | {r['wall']} | {r['nodes']} | "
                    f"{r['ub']:.8g} | {r['lb']:.8g} | {r['gap']:.3g} | "
                    f"{truth} | {ver} |\n")
        if floor_fail:
            f.write("\n**ARTIFACT FAILURE: tls4 lb fell below the "
                    "proven 1.70933 floor.**\n")
        f.write(
            "\nNotes:\n"
            "- tls4: the trimloss construction supplies the optimum 8.3 "
            "as incumbent at the root (bnb/trimloss.py); the table's lb "
            "is the certified bound reached under the caps — full lb "
            "closure of the convexified tree remains open.\n"
            "- color_lab2_4x0: no published optimum; the row records "
            "best ub / certified lb under the caps (the throughput "
            "headline for this instance lives in bench.py).\n")
    print(json.dumps({"solved_optimal": n_opt, "verified": n_ver,
                      "rows": len(rows), "total_wall_s": round(total, 1),
                      "platform": platform,
                      "tls4_floor_ok": not floor_fail}))
    if floor_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
