"""Microbenchmark: batched SPD factor+inverse alternatives on the TPU.

The IPM's per-iteration cost is dominated by the f32 Cholesky + explicit
inverse of the (B, n, n) condensed KKT matrix (CLAUDE.md numbers).  This
compares XLA primitives for producing an n x n inverse (or equivalent
solve operator) per lane:

  chol+cho_solve   current production path
  lu_inv           jnp.linalg.inv (LU-based)
  solve_eye        jnp.linalg.solve(M, I)
  chol_only        factorization alone (lower bound for chol paths)
  ns_refresh       Newton-Schulz polish of a STALE inverse (2 matmuls/step)

Synchronization through the axon tunnel needs a device->host transfer
(np.asarray), per CLAUDE.md.

Measured (v5e, B=64 n=300 f32, REP=8 amortized inside one jit):
  chol+cho_solve  8.80 ms   chol_only  6.72 ms
  lu_inv         16.58 ms   solve_eye 16.40 ms
  ns_refresh(2)   3.18 ms   (|I-MX| 8e-3 from a 10%-perturbed stale inverse)
Conclusions: (a) Cholesky+explicit-inverse is the RIGHT XLA primitive (LU
paths are 2x worse); (b) at ~9 ms it is NOT the dominant per-iteration
cost of a ~200 ms/iter superstep — the tail is overhead-bound in the many
small f64 correction matvecs (46 MB would move in ~60 us at HBM speed but
each costs ~5-8 ms), so batch-size scaling is strongly sublinear; (c) a
Newton-Schulz refresh of a stale inverse converges too slowly from real
barrier-weight jumps to replace the factorization (8e-3 residual from a
10% perturbation; barrier diagonals move orders of magnitude).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    # NOTE: x64 deliberately NOT enabled — every benchmarked array is f32
    # and host-side np.linalg.inv already runs in f64 regardless
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    B, n = 64, 300
    print(f"devices={jax.devices()} B={B} n={n}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Araw = rng.standard_normal((B, n, n)).astype(np.float32)
    M = np.einsum("bij,bkj->bik", Araw, Araw) / n + \
        np.eye(n, dtype=np.float32)[None] * (1.0 + rng.random((B, 1, 1)).astype(np.float32))
    Md = jax.device_put(jnp.asarray(M))
    # a "stale" inverse: inverse of a nearby matrix (diagonal perturbed 10%)
    Mp = M + np.eye(n, dtype=np.float32)[None] * 0.1
    Minv_stale = np.linalg.inv(Mp.astype(np.float64)).astype(np.float32)
    Xd = jax.device_put(jnp.asarray(Minv_stale))

    import jax.scipy.linalg as jsl

    REP = 8  # loop inside jit to amortize the ~30 ms dispatch

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)           # compile
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.monotonic()
        out = f(*args)
        s = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.monotonic() - t0) / REP
        print(f"{name:18s} {dt*1e3:8.2f} ms/op   checksum={float(np.sum(s)):.4g}",
              flush=True)
        return dt

    def loop(body):
        # REP dependent evaluations inside one jit (amortizes dispatch).
        # The accumulator folds a FULL reduction of the output back into
        # the next iteration's input so every batch lane is data-dependent
        # on the previous output (out[0,0,0] alone would let XLA prune the
        # other 63 lanes), and the perturbation is scaled to stay well
        # above f32 resolution without changing the matrices materially.
        def fn(M, X):
            def it(i, acc):
                out = body(M * (1.0 + acc * 1e-12), X)
                return jnp.float32(jnp.sum(out) * 1e-12)
            return jax.lax.fori_loop(0, REP, it, jnp.float32(0.0))
        return fn

    eye = jnp.eye(n, dtype=jnp.float32)

    def chol_inv(M, X):
        L = jnp.linalg.cholesky(M)
        return jax.vmap(lambda l: jsl.cho_solve((l, True), eye))(L)

    def chol_only(M, X):
        return jnp.linalg.cholesky(M)

    def lu_inv(M, X):
        return jnp.linalg.inv(M)

    def solve_eye(M, X):
        return jnp.linalg.solve(M, jnp.broadcast_to(eye, M.shape))

    def ns2(M, X):
        # two Newton-Schulz steps from the stale inverse
        for _ in range(2):
            X = X @ (2.0 * jnp.broadcast_to(eye, M.shape) - M @ X)
        return X

    timed("chol+cho_solve", loop(chol_inv), Md, Xd)
    timed("chol_only", loop(chol_only), Md, Xd)
    timed("lu_inv", loop(lu_inv), Md, Xd)
    timed("solve_eye", loop(solve_eye), Md, Xd)
    timed("ns_refresh(2)", loop(ns2), Md, Xd)

    # accuracy of ns refresh vs true inverse.  Forced f32 matmul precision:
    # the TPU default (bf16 passes) dominates the residual and made NS
    # look ~350x less converged than it is (CPU f32 gives ~2.3e-05).  The
    # primary argument against NS refresh remains the barrier diagonal's
    # per-iteration swing, not this residual.
    with jax.default_matmul_precision("float32"):
        X2 = np.asarray(jax.jit(ns2)(Md, Xd))
    R = np.eye(n, dtype=np.float32)[None] - \
        np.einsum("bij,bjk->bik", M.astype(np.float64),
                  X2.astype(np.float64))
    print(f"ns2 residual |I-MX| max={np.abs(R).max():.3g} "
          f"(f32-precision matmuls, f64 residual)", flush=True)


if __name__ == "__main__":
    main()
