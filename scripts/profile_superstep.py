"""Profile ONE B&B superstep on the real TPU (or CPU with JAX_PLATFORMS=cpu).

Times the fused node superstep on a realistic 64-lane batch of color_lab
boxes (root + branched children), cold vs dual-warm-started, and reports
per-superstep wall time + iteration counts.  Use this to rehearse IPM
performance changes before touching bench.py.

Usage:  python scripts/profile_superstep.py [--batch 64] [--iters 36]
"""

import argparse
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INSTANCE = "/root/reference/test_instances/color_lab2_4x0.nl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=36)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--instance", default=INSTANCE)
    ap.add_argument("--ipm", action="append", default=[],
                    help="IPMOptions override, e.g. --ipm tail_kkt_rounds=4")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    print(f"devices = {jax.devices()}", file=sys.stderr)

    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.engines.staging import stage_problem
    from minotaur_tpu.engines.ipm import IPMOptions
    from minotaur_tpu.bnb.step import StepOptions, build_node_step

    p = read_nl(args.instance)
    sp = stage_problem(p)
    B = args.batch
    n, m = sp.n, sp.m
    print(f"instance n={n} m={m} B={B}", file=sys.stderr)

    ipm_kw = {}
    for kv in (args.ipm or []):
        k, v = kv.split("=")
        ipm_kw[k] = {"True": True, "False": False}.get(v) \
            if v in ("True", "False") else (
                int(v) if re.fullmatch(r"-?\d+", v) else float(v))
    step = build_node_step(sp, StepOptions(
        fbbt_rounds=2,
        ipm=IPMOptions(max_iters=args.iters, **ipm_kw)))

    rng = np.random.default_rng(0)
    vlb_b = np.tile(sp.vlb, (B, 1))
    vub_b = np.tile(sp.vub, (B, 1))
    ints = np.where(sp.int_mask)[0]
    # lanes 1.. get progressively more fixed binaries (deeper tree nodes)
    for i in range(1, B):
        k = 1 + (i * 3) % 40
        fix = rng.choice(ints, size=k, replace=False)
        val = rng.integers(0, 2, size=k)
        vlb_b[i, fix] = val
        vub_b[i, fix] = val
    x0_b = np.zeros((B, n))
    y0_b = np.zeros((B, m))

    A = jax.device_put(jnp.asarray(sp.A))
    clb = jax.device_put(jnp.asarray(sp.clb))
    cub = jax.device_put(jnp.asarray(sp.cub))
    dvlb = jax.device_put(jnp.asarray(vlb_b))
    dvub = jax.device_put(jnp.asarray(vub_b))
    dx0 = jax.device_put(jnp.asarray(x0_b))
    dy0 = jax.device_put(jnp.asarray(y0_b))

    def run(tag, x0, y0):
        t0 = time.monotonic()
        res = step(A, clb, cub, dvlb, dvub, x0, y0)
        iters = np.asarray(res.iters)   # device->host sync
        dt = time.monotonic() - t0
        st = np.asarray(res.status)
        kkt = np.asarray(res.kkt_err)
        hist = {int(k): int(v) for k, v in
                zip(*np.unique(st, return_counts=True))}
        print(f"{tag}: {dt:6.2f}s  iters max={iters.max()} "
              f"mean={iters.mean():.1f}  conv={(st == 1).sum()}/{B} "
              f"kkt_max={kkt.max():.2e} status={hist}", file=sys.stderr)
        return res, dt

    t0 = time.monotonic()
    res, _ = run("compile+run", dx0, dy0)
    print(f"first call total {time.monotonic() - t0:.1f}s", file=sys.stderr)

    times = []
    for r in range(args.reps):
        _, dt = run(f"cold rep{r}", dx0, dy0)
        times.append(dt)

    # warm: feed each lane its own solution + duals back (the superstep a
    # child node would see after a 1-variable branch)
    xw = np.asarray(res.x)
    yw = np.asarray(res.y)
    # branch one fractional var per lane to perturb the box
    vlb2 = vlb_b.copy()
    vub2 = vub_b.copy()
    for i in range(B):
        fr = np.where(sp.int_mask, np.abs(xw[i] - np.round(xw[i])), 0.0)
        j = int(np.argmax(fr))
        if fr[j] > 1e-6:
            if i % 2 == 0:
                vub2[i, j] = np.floor(xw[i, j])
            else:
                vlb2[i, j] = np.ceil(xw[i, j])
    dvlb2 = jax.device_put(jnp.asarray(vlb2))
    dvub2 = jax.device_put(jnp.asarray(vub2))
    dxw = jax.device_put(jnp.asarray(xw))
    dyw = jax.device_put(jnp.asarray(yw))

    def run2(tag, x0, y0):
        t0 = time.monotonic()
        r = step(A, clb, cub, dvlb2, dvub2, x0, y0)
        iters = np.asarray(r.iters)
        dt = time.monotonic() - t0
        st = np.asarray(r.status)
        print(f"{tag}: {dt:6.2f}s  iters max={iters.max()} "
              f"mean={iters.mean():.1f}  conv={(st == 1).sum()}/{B}",
              file=sys.stderr)
        return dt

    for r in range(args.reps):
        run2(f"child cold  rep{r}", dx0, dy0)
    for r in range(args.reps):
        run2(f"child primal rep{r}", dxw, dy0)
    for r in range(args.reps):
        run2(f"child warm  rep{r}", dxw, dyw)

    print(f"cold superstep mean {np.mean(times):.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
