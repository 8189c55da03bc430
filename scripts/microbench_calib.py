"""Calibrate absolute TPU op costs: peak matmul, per-op overhead floor,
and the split-f32 matvec at HIGHEST precision (accuracy + cost).

Chains iterations via direct data dependence (no full-reduce accumulator)
to separate op cost from reduction/sync artifacts.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    print(f"devices={jax.devices()}", file=sys.stderr)
    HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    dev = jax.device_put

    def timed(name, fn, *args, rep=32, flops=None):
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.monotonic()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.monotonic() - t0) / rep
        extra = f"  {flops/dt/1e12:8.2f} TFLOP/s" if flops else ""
        print(f"{name:34s} {dt*1e3:9.3f} ms/op{extra}", flush=True)
        return dt

    def chain(body, rep=32):
        def fn(*args):
            x = args[-1]
            for _ in range(rep):
                y = body(*args[:-1], x)
                x = x + y * 1e-20
            return x
        return fn

    # 1. peak f32 big matmul
    N = 2048
    Abig = dev(jnp.asarray(rng.standard_normal((N, N)).astype(np.float32)))
    timed("f32 2048^3 matmul DEFAULT", chain(lambda A, x: A @ x),
          Abig, Abig, flops=2 * N**3)
    timed("f32 2048^3 matmul HIGHEST",
          chain(lambda A, x: jnp.matmul(A, x, precision=HI)),
          Abig, Abig, flops=2 * N**3)
    Bb = dev(jnp.asarray(rng.standard_normal((N, N)).astype(jnp.bfloat16)))
    timed("bf16 2048^3 matmul", chain(lambda A, x: A @ x), Bb, Bb,
          flops=2 * N**3)

    # 2. per-op floor: trivial vector op chained
    v = dev(jnp.asarray(rng.standard_normal(256).astype(np.float32)))
    timed("vector add (256,) chain", chain(lambda a, x: x + a, rep=64),
          v, v, rep=64)

    # 3. the shapes that matter: B=64 n=300 m=189
    B, n, m = 64, 300, 189
    W32 = dev(jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)))
    Vb = dev(jnp.asarray(rng.standard_normal((B, n)).astype(np.float32)))
    timed("shared f32 (B,n)@(n,n) HI", chain(
        lambda W, x: jnp.matmul(x, W, precision=HI)), W32, Vb,
        flops=2 * B * n * n)
    Mb = dev(jnp.asarray(rng.standard_normal((B, n, n)).astype(np.float32)))
    timed("batched f32 mv (B,n,n)@(B,n)", chain(
        lambda M, x: jnp.einsum("bij,bj->bi", M, x)), Mb, Vb,
        flops=2 * B * n * n)
    timed("batched f32 mv HIGHEST", chain(
        lambda M, x: jnp.einsum("bij,bj->bi", M, x, precision=HI)), Mb, Vb,
        flops=2 * B * n * n)
    # batched matvec via padding rhs to 128 wide
    Vb128 = dev(jnp.asarray(
        rng.standard_normal((B, n, 128)).astype(np.float32)))
    timed("batched f32 matmat k=128 HI", chain(
        lambda M, X: jnp.matmul(M, X, precision=HI)), Mb, Vb128,
        flops=2 * B * n * n * 128)

    # 4. split-f32 matvec at HIGHEST: cost + accuracy
    W64 = rng.standard_normal((n, n))
    v64 = rng.standard_normal((B, n))
    Wh = W64.astype(np.float32)
    Wl = (W64 - Wh.astype(np.float64)).astype(np.float32)
    Whd, Wld = dev(jnp.asarray(Wh)), dev(jnp.asarray(Wl))
    vd = dev(jnp.asarray(v64))

    def split_mv(hi, lo, x):
        xh = x.astype(jnp.float32)
        xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
        main = jnp.matmul(xh, hi.T, precision=HI)
        corr = jnp.matmul(xl, hi.T, precision=HI) + \
            jnp.matmul(xh, lo.T, precision=HI)
        return main.astype(jnp.float64) + corr.astype(jnp.float64)

    timed("split-f32 HI shared mv", chain(
        lambda hi, lo, x: split_mv(hi, lo, x)), Whd, Wld, vd,
        flops=6 * B * n * n)
    W64d = dev(jnp.asarray(W64))
    timed("true f64 shared mv", chain(lambda W, x: x @ W.T), W64d, vd,
          flops=2 * B * n * n)
    got = np.asarray(jax.jit(split_mv)(Whd, Wld, vd))
    want = v64 @ W64.T
    print(f"split-f32 HI rel err: "
          f"{np.abs(got - want).max() / np.abs(want).max():.3g}",
          flush=True)

    # 5. chol and inverse at bench shapes
    M = np.einsum("bij,bkj->bik", np.asarray(Mb) / n, np.asarray(Mb)) + \
        np.eye(n, dtype=np.float32)[None] * 3.0
    Md = dev(jnp.asarray(M.astype(np.float32)))
    import jax.scipy.linalg as jsl
    eye = jnp.eye(n, dtype=jnp.float32)
    timed("batched f32 cholesky", chain(
        lambda M, x: jnp.linalg.cholesky(M + x * 1e-20), rep=8), Md, Md,
        rep=8, flops=B * n**3 / 3)
    timed("chol + cho_solve(eye)", chain(
        lambda M, x: jax.vmap(lambda l: jsl.cho_solve((l, True), eye))(
            jnp.linalg.cholesky(M + x * 1e-20)), rep=8), Md, Md,
        rep=8, flops=2 * B * n**3)


if __name__ == "__main__":
    main()
