"""Pallas TPU kernels for the IPM hot path.

Profiling on the v5e showed the batched IPM iteration is dominated not by
flops but by the LAUNCH overhead of dozens of small sequential ops in the
direction solves (scale -> cast -> matvec -> scale -> residual matvec ->
... per refinement round).  `refined_spd_solve_f32` fuses the whole
"solve with the factorized inverse + monotone iterative refinement" chain
into ONE kernel per solve: the scaled inverse and the operator stay in
VMEM across all refinement rounds.

Mosaic has no 64-bit types, so this kernel serves the IPM's f32 PHASE
(engines/ipm.py two-phase drive): phase 1 only targets a 1e-4 KKT error,
for which all-f32 refinement against the f32 operator suffices; the f64
tail keeps XLA ops.

Kernel math (f32 throughout):

    x  = dinv * (Minv_s @ (dinv * r))
    repeat k times (keep only improvements):
        res = r - (M @ x + shift_vec * x)
        x'  = x + dinv * (Minv_s @ (dinv * res))
"""

from __future__ import annotations

import functools

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build_kernel(n_pad: int, refine_steps: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(minv_ref, m_ref, dinv_ref, shift_ref, r_ref, x_ref):
        minv = minv_ref[:]                       # (n, n) f32
        mm = m_ref[:]                            # (n, n) f32
        dinv = dinv_ref[:]                       # (1, n) f32
        shift = shift_ref[:]                     # (1, n) f32
        r = r_ref[:]                             # (1, n) f32

        def base_solve(rhs):
            u = rhs * dinv
            v = jax.lax.dot_general(
                u, minv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return v * dinv

        def apply_eff(x):
            mv = jax.lax.dot_general(
                x, mm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return mv + shift * x

        x = base_solve(r)
        res = r - apply_eff(x)
        nrm = jnp.sum(res * res)
        for _ in range(refine_steps):
            x2 = x + base_solve(res)
            res2 = r - apply_eff(x2)
            nrm2 = jnp.sum(res2 * res2)
            better = nrm2 < nrm
            x = jnp.where(better, x2, x)
            res = jnp.where(better, res2, res)
            nrm = jnp.minimum(nrm2, nrm)
        x_ref[:] = x

    def call(minv_s, m_op, dinv, shift_vec, r):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(minv_s, m_op, dinv, shift_vec, r)

    return call


def refined_spd_solve_f32(minv_s, m_op, dinv, shift_vec, r,
                          refine_steps: int = 2, interpret: bool = False):
    """Fused scaled-inverse solve + monotone refinement, all-f32.

    minv_s: (n, n) f32 inverse of the Jacobi-scaled operator
    m_op:   (n, n) operator (cast to f32)
    dinv, shift_vec, r: (n,) (cast to f32)
    Returns x (n,) f32 with M_eff x ~= r to f32 accuracy.
    Traceable; vmap over a leading batch axis works as usual.
    """
    import jax.numpy as jnp

    n = r.shape[-1]
    n_pad = max(_round_up(n, 128), 128)
    pad = n_pad - n

    def pad_mat(a):
        a = a.astype(jnp.float32)
        return jnp.pad(a, ((0, pad), (0, pad)))

    # unit diagonal on the padding keeps the padded system nonsingular
    eye_tail = jnp.pad(jnp.zeros((n,), jnp.float32), (0, pad),
                       constant_values=1.0)
    minv_p = pad_mat(minv_s) + jnp.diag(eye_tail)
    m_p = pad_mat(m_op) + jnp.diag(eye_tail)
    dinv_p = jnp.pad(dinv.astype(jnp.float32), (0, pad))[None, :]
    shift_p = jnp.pad(shift_vec.astype(jnp.float32), (0, pad))[None, :]
    r_p = jnp.pad(r.astype(jnp.float32), (0, pad))[None, :]

    call = _build_kernel(n_pad, refine_steps, interpret)
    # under jax_enable_x64, the vmap batching rule for pallas_call builds
    # i64 grid bookkeeping, which Mosaic cannot legalize ("func.return
    # ... i64") on a real TPU — the kernel itself is all-f32, so trace it
    # in an x64-disabled scope (jax.enable_x64(False) is the jax>=0.8
    # spelling; jax.experimental.enable_x64 the older one)
    import jax
    try:
        ctx = jax.enable_x64(False)
    except AttributeError:
        from jax.experimental import enable_x64
        ctx = enable_x64(False)
    with ctx:
        out = call(minv_p, m_p, dinv_p, shift_p, r_p)
    return out[0, :n]
