"""Pallas TPU kernel: fused batched SPD factorize + explicit inverse.

The IPM factorizes a Jacobi-scaled condensed KKT matrix per lane and
turns it into an explicit inverse so every subsequent direction solve is
one MXU matmul (engines/ipm.py::_make_spd_solver).  The XLA lowering of
that pair — jnp.linalg.cholesky (twice: base + Gershgorin-shift retry)
plus cho_solve against the identity — expands into blocked HLO loops of
many small ops; this v5e environment is LAUNCH-OVERHEAD bound (~0.1-0.2
ms per op at (64,300,300) scale, scripts/microbench_calib.py), so op
count, not flops, sets the cost.  This kernel fuses the whole chain into
ONE pallas_call per lane chunk:

  1. blocked right-looking Cholesky (128-column panels; within-panel
     column steps are MASK-vectorized across the chunk — Mosaic cannot
     prove alignment of dynamic lane-dim indices, so per-column access
     is one read-modify-write of the panel with iota masks)
  2. blocked lower-triangular inverse (forward substitution on the
     diagonal blocks + matmul build-up of the off-diagonal blocks)
  3. Minv = Linv' Linv  (one MXU matmul)

Mosaic constraints that shaped this kernel (all hit in practice):
  - dynamic indices in the lane (last) dim must be provably 128-aligned
    -> panel loops use pl.ds(pl.multiple_of(p*128, 128), 128)
  - scalar boolean reductions (jnp.all) lower through an f64 squeeze
    that does not legalize -> float sums + compares only
  - pl.when with a data-dependent scalar predicate SIGABRTs the backend
    compiler -> NO in-kernel retry.  Unlike the XLA path there is no
    Gershgorin-shifted refactorization: the pallas path only serves the
    f32 LP/PSD-QP factorization (NL Hessians force factor_f32 off), for
    which failures are rare; failed lanes return the identity and
    flag=2 — certificates and the NaN guard keep the solve sound, only
    that lane's convergence suffers (same terminal fallback as XLA).
  - unrolled per-panel code compiles for MINUTES through the remote
    tunnel -> everything is fori_loop'd; one panel body compiles once.

Mosaic has no 64-bit types: everything is f32 — the factor feeds f32
direction solves whose accuracy the IPM recovers with f64 block-level
defect corrections (same contract as the XLA path).

Reference economics this replaces: one warm Clp/Ipopt refactorization
per node behind the reference Engine ABC (OsiLPEngine.cpp:571-591,
IpoptEngine.cpp:668) — here thousands of B&B nodes share one fused
batched factorization per IPM iteration.
"""

from __future__ import annotations

import functools


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build_factor_inv(np_pad: int, ch: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = np_pad // 128
    f32 = jnp.float32

    def kernel(ms_ref, out_ref, work_ref):
        row_i = jax.lax.broadcasted_iota(jnp.int32, (np_pad, 1), 0)[:, 0]
        col128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]
        full_cols = jax.lax.broadcasted_iota(
            jnp.int32, (np_pad, np_pad), 1)

        work_ref[:] = ms_ref[:]

        # ---- blocked Cholesky ------------------------------------------
        def panel_body(p, _):
            base = pl.multiple_of(p * 128, 128)
            pan_rows = jax.lax.broadcasted_iota(
                jnp.int32, (np_pad, 128), 0)
            pan_cols = jax.lax.broadcasted_iota(
                jnp.int32, (np_pad, 128), 1) + base

            # (np,128) selection matrix: row base+c <-> panel slot c
            sel_p = ((row_i[:, None] - base) ==
                     col128[None, :]).astype(f32)

            def col_body(j, _):
                jj = base + j
                pan = work_ref[:, :, pl.ds(base, 128)]   # (ch,np,128)
                onehot = (col128 == j).astype(f32)
                col = jnp.sum(pan * onehot[None, None, :], axis=2)
                diag = jnp.sum(
                    col * (row_i == jj).astype(f32)[None, :], axis=1)
                # non-positive pivot -> NaN (rsqrt of a negative), so a
                # failed factorization poisons the lane and is detected
                # OUTSIDE the kernel (the in-kernel isfinite/flag
                # section SIGABRT'd the Mosaic backend)
                dinv = jax.lax.rsqrt(jnp.where(diag > 0.0, diag, -1.0))
                ls = jnp.where((row_i >= jj)[None, :],
                               col * dinv[:, None], 0.0)  # (ch,np)
                # panel-row segment of the column (MXU contraction with
                # the selection matrix — no dynamic sublane slicing)
                lsp = jax.lax.dot_general(
                    ls, sel_p, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)            # (ch,128)
                upd_mask = (pan_rows > jj) & (pan_cols > jj)
                newpan = pan - jnp.where(
                    upd_mask[None],
                    ls[:, :, None] * lsp[:, None, :], 0.0)
                newpan = jnp.where((pan_cols == jj)[None],
                                   ls[:, :, None], newpan)
                work_ref[:, :, pl.ds(base, 128)] = newpan
                return 0

            jax.lax.fori_loop(0, 128, col_body, 0)

            # trailing update over the FULL width, masked to columns
            # beyond this panel (static full-width slices keep Mosaic's
            # alignment checker happy; the extra flops are MXU-cheap)
            lp = work_ref[:, :, pl.ds(base, 128)]
            upd = jax.lax.dot_general(
                lp, lp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)               # (ch,np,np)
            tmask = (row_i[:, None] > base + 127) & \
                (full_cols > base + 127)
            work_ref[:] = work_ref[:] - jnp.where(tmask[None], upd, 0.0)
            return 0

        jax.lax.fori_loop(0, NB, panel_body, 0)

        # ---- blocked triangular inverse --------------------------------
        def diag_body(p, _):
            base = pl.multiple_of(p * 128, 128)
            out_ref[:, :, pl.ds(base, 128)] = jnp.zeros(
                (ch, np_pad, 128), f32)

            sel_p = ((row_i[:, None] - base) ==
                     col128[None, :]).astype(f32)          # (np,128)

            def row_body(i, _):
                ldd = work_ref[:, :, pl.ds(base, 128)]     # (ch,np,128)
                # row base+i of the diagonal block
                sel = (row_i == base + i).astype(f32)      # (np,)
                lrow = jnp.sum(ldd * sel[None, :, None], axis=1)
                lrow_m = jnp.where((col128 < i)[None], lrow, 0.0)
                x = out_ref[:, :, pl.ds(base, 128)]        # (ch,np,128)
                # expand lrow_m (ch,128) to (ch,np) aligned at the block
                # rows (zero elsewhere): the contraction with x then
                # picks exactly the block rows — no sublane slicing
                lrow_np = jax.lax.dot_general(
                    lrow_m, sel_p, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)            # (ch,np)
                prod = jax.lax.dot_general(
                    lrow_np[:, None, :], x,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)[:, 0, :]   # (ch,128)
                dii = jnp.sum(lrow * (col128 == i).astype(f32)[None],
                              axis=1)
                ei = (col128 == i).astype(f32)
                xrow = (ei[None] - prod) / dii[:, None]
                newx = jnp.where((row_i == base + i)[None, :, None],
                                 xrow[:, None, :], x)
                out_ref[:, :, pl.ds(base, 128)] = newx
                return 0

            jax.lax.fori_loop(0, 128, row_body, 0)
            return 0

        jax.lax.fori_loop(0, NB, diag_body, 0)

        # off-diagonal blocks (static, NB is tiny):
        # Linv[i,j] = -DinvI @ (sum_{j<=k<i} L[i,k] @ Linv[k,j])
        for j in range(NB):
            for i in range(j + 1, NB):
                bi, bj = i * 128, j * 128
                acc = None
                for k in range(j, i):
                    bk = k * 128
                    lik = work_ref[:, bi:bi + 128, bk:bk + 128]
                    xkj = out_ref[:, bk:bk + 128, bj:bj + 128]
                    t = jax.lax.dot_general(
                        lik, xkj, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
                    acc = t if acc is None else acc + t
                dinv_i = out_ref[:, bi:bi + 128, bi:bi + 128]
                out_ref[:, bi:bi + 128, bj:bj + 128] = \
                    -jax.lax.dot_general(
                        dinv_i, acc, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)

        # ---- Minv = Linv' Linv -----------------------------------------
        linv = out_ref[:]
        out_ref[:] = jax.lax.dot_general(
            linv, linv, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)

    def call(ms_pad):
        B = ms_pad.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B // ch,),
            in_specs=[pl.BlockSpec((ch, np_pad, np_pad),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ch, np_pad, np_pad),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, np_pad, np_pad),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((ch, np_pad, np_pad),
                                       jnp.float32)],
            interpret=interpret,
        )(ms_pad)

    return call


def batched_spd_inverse(ms, chunk: int = 4, interpret: bool = False):
    """Fused Cholesky + explicit inverse of a batch of SPD matrices.

    ms: (B, k, k) f32-castable (Jacobi-scaled).  Returns (minv, flag):
    minv (B, k, k) f32; flag (B,) f32 with 0 = clean factorization,
    2 = failed (identity returned; see module docstring — no in-kernel
    Gershgorin retry).  Pads k to a multiple of 128 (identity padding)
    and the batch to a multiple of the lane chunk.
    """
    import jax
    import jax.numpy as jnp

    B, k = ms.shape[0], ms.shape[1]
    np_pad = max(_round_up(k, 128), 128)
    ch = chunk
    while B % ch and ch > 1:
        ch //= 2
    b_pad = _round_up(B, ch)

    pk = np_pad - k
    ms32 = ms.astype(jnp.float32)
    if pk:
        eye_tail = jnp.pad(jnp.zeros((k,), jnp.float32), (0, pk),
                           constant_values=1.0)
        ms32 = jnp.pad(ms32, ((0, 0), (0, pk), (0, pk))) + \
            jnp.diag(eye_tail)[None]
    if b_pad != B:
        ms32 = jnp.concatenate(
            [ms32, jnp.broadcast_to(jnp.eye(np_pad, dtype=jnp.float32),
                                    (b_pad - B, np_pad, np_pad))])

    call = _build_factor_inv(np_pad, ch, interpret)
    # Mosaic cannot legalize the i64 bookkeeping that x64 mode adds to
    # the grid machinery — trace in an x64-disabled scope (all-f32)
    try:
        ctx = jax.enable_x64(False)
    except AttributeError:
        from jax.experimental import enable_x64
        ctx = enable_x64(False)
    with ctx:
        out = call(ms32)
        # failure detection OUTSIDE the kernel (NaN-poisoned lanes):
        # the in-kernel isfinite/flag section aborts the Mosaic backend
        ok = jnp.all(jnp.isfinite(out), axis=(1, 2))
        eye = jnp.eye(np_pad, dtype=jnp.float32)
        out = jnp.where(ok[:, None, None], out, eye[None])
        flag = jnp.where(ok, 0.0, 2.0).astype(jnp.float32)
    return out[:B, :k, :k], flag[:B]


@functools.lru_cache(maxsize=None)
def _spd_inverse_vmappable(chunk: int, interpret: bool):
    """Single-matrix API with a custom vmap rule that maps the batch
    axis onto the kernel's lane-chunk grid (the IPM builds its solver
    inside a vmapped single-lane function)."""
    import jax
    import jax.numpy as jnp
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def spd_inv(ms):
        out, flag = batched_spd_inverse(ms[None], chunk=1,
                                        interpret=interpret)
        return out[0], flag[0]

    @spd_inv.def_vmap
    def _rule(axis_size, in_batched, ms):
        if not in_batched[0]:
            ms = jnp.broadcast_to(ms, (axis_size,) + ms.shape)
        out, flag = batched_spd_inverse(ms, chunk=chunk,
                                        interpret=interpret)
        return (out, flag), (True, True)

    return spd_inv
