"""Microbenchmark: tail-iteration op alternatives on the TPU.

The IPM tail iteration is dominated by (CLAUDE.md, microbench_inv.py):
  (a) f64 defect-correction matvecs against per-lane masked operators
      (batched (B,n,n) f64 @ (B,n): ~5-8 ms each, emulated f64)
  (b) f32 batched matvecs (B,n,n)@(B,n) for the Minv solves (~3.3 ms)
  (c) the double Cholesky + explicit inverse (~9-15 ms)

This measures the replacements:
  - mask-FACTORED shared matvec: (mask2 . W) @ v == mask . (W @ (mask . v))
    turns the batched f64 matvec into ONE shared (B,n)@(n,n) matmul
  - split-f32 matvec: W = W_hi + W_lo (both f32); W@v to ~1e-7 relative
    via 3 f32 MXU matmuls + f64 vector combines
  - Pallas batched matvec (per-lane M), vs the XLA batched matvec

Run on the real TPU:  python scripts/microbench_tailops.py
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

    B, n, m = 64, 300, 189
    print(f"devices={jax.devices()} B={B} n={n} m={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    W64 = rng.standard_normal((n, n))
    W64 = W64 + W64.T
    A64 = rng.standard_normal((m, n))
    Mb = rng.standard_normal((B, n, n)).astype(np.float32)
    v64 = rng.standard_normal((B, n))
    mask = (rng.random((B, n)) > 0.1)

    dev = jax.device_put
    W64d = dev(jnp.asarray(W64))
    W32 = dev(jnp.asarray(W64.astype(np.float32)))
    Wlo = dev(jnp.asarray((W64 - W64.astype(np.float32).astype(np.float64)
                           ).astype(np.float32)))
    A64d = dev(jnp.asarray(A64))
    Mbd = dev(jnp.asarray(Mb))
    Wb64 = dev(jnp.asarray(np.where(mask[:, :, None] & mask[:, None, :],
                                    W64[None], 0.0)))
    vd = dev(jnp.asarray(v64))
    md = dev(jnp.asarray(mask.astype(np.float64)))

    REP = 16

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.monotonic()
        out = f(*args)
        s = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.monotonic() - t0) / REP
        print(f"{name:26s} {dt*1e3:8.3f} ms/op  checksum={float(np.sum(s)):.6g}",
              flush=True)
        return dt

    def loop(body):
        def fn(*args):
            def it(i, acc):
                out = body(*args, acc)
                return (jnp.sum(out) * 1e-14).astype(jnp.float64)
            return jax.lax.fori_loop(0, REP, it, jnp.float64(0.0))
        return fn

    # (a) current: batched per-lane-masked f64 matvec
    timed("batched f64 (B,n,n)@(B,n)", loop(
        lambda Wb, v, acc: jnp.einsum("bij,bj->bi", Wb, v * (1 + acc))),
        Wb64, vd)
    # mask-factored shared f64 matmul
    timed("shared f64 (B,n)@(n,n)", loop(
        lambda W, v, mk, acc: mk * ((v * mk * (1 + acc)) @ W.T)),
        W64d, vd, md)

    # split-f32: 3 f32 matmuls + f64 combines
    def split_mv(hi, lo, v, mk, acc):
        v = v * mk * (1 + acc)
        vh = v.astype(jnp.float32)
        vl = (v - vh.astype(jnp.float64)).astype(jnp.float32)
        main = vh @ hi.T
        corr = vl @ hi.T + vh @ lo.T
        return mk * (main.astype(jnp.float64) + corr.astype(jnp.float64))
    timed("split-f32 shared matvec", loop(split_mv), W32, Wlo, vd, md)

    # (b) f32 batched matvec: XLA forms
    v32 = dev(jnp.asarray(v64.astype(np.float32)))
    timed("batched f32 einsum mv", loop(
        lambda M, v, acc: jnp.einsum("bij,bj->bi", M, v * (1 + acc))),
        Mbd, v32)
    timed("batched f32 matmul[...,None]", loop(
        lambda M, v, acc: (M @ (v * (1 + acc))[..., None])[..., 0]),
        Mbd, v32)
    # matrix-RHS batched (the MeJ solve shape)
    R32 = dev(jnp.asarray(rng.standard_normal((B, n, 64)).astype(np.float32)))
    timed("batched f32 matmat k=64", loop(
        lambda M, R, acc: M @ (R * (1 + acc))), Mbd, R32)

    # split accuracy check
    f = jax.jit(lambda W, lo, v, mk: split_mv(W, lo, v, mk, 0.0))
    got = np.asarray(f(W32, Wlo, vd, md))
    want = mask * ((v64 * mask) @ W64.T)
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"split-f32 vs f64 rel err: {rel:.3g}", flush=True)

    # (c) elementwise builds
    timed("f64 (B,n,n) masked build", loop(
        lambda W, mk, acc: jnp.where((mk[:, :, None] * mk[:, None, :]) > 0,
                                     W[None] * (1 + acc), 0.0)), W64d, md)
    m32 = dev(jnp.asarray(mask.astype(np.float32)))
    timed("f32 (B,n,n) masked build", loop(
        lambda W, mk, acc: jnp.where(
            (mk[:, :, None] * mk[:, None, :]) > 0,
            W[None] * (1 + acc).astype(jnp.float32), 0.0)), W32, m32)


if __name__ == "__main__":
    main()
