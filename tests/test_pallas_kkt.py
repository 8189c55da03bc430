"""Correctness tests for the fused Pallas factor+inverse kernel
(ops/pallas_kkt.py), run in interpreter mode on CPU.

The XLA reference is chol + cho_solve(eye) — the exact pair the kernel
replaces in engines/ipm.py::_make_spd_solver.
"""

import numpy as np
import pytest


def _spd(rng, B, k, scale=1.0):
    A = rng.standard_normal((B, k, k)).astype(np.float32)
    return np.einsum("bij,bkj->bik", A, A) / k + \
        np.eye(k, dtype=np.float32)[None] * scale


@pytest.mark.parametrize("B,k", [(3, 50), (4, 130), (2, 300)])
def test_spd_inverse_matches_xla(B, k):
    from minotaur_tpu.ops.pallas_kkt import batched_spd_inverse
    rng = np.random.default_rng(0)
    M = _spd(rng, B, k, 2.0)
    minv, flag = batched_spd_inverse(np.asarray(M), interpret=True)
    minv = np.asarray(minv)
    assert np.all(np.asarray(flag) == 0.0)
    R = np.eye(k)[None] - np.einsum(
        "bij,bjk->bik", M.astype(np.float64), minv.astype(np.float64))
    # f32 factorization: residual ~ kappa * eps32
    assert np.abs(R).max() < 5e-5


def test_spd_inverse_indefinite_lane_flagged():
    # failed factorizations poison the lane with NaN in-kernel and are
    # flagged OUTSIDE (identity returned) — no in-kernel retry (the
    # isfinite/flag section SIGABRT'd the Mosaic backend, see module
    # docstring); the caller's NaN guard and certificates stay sound
    from minotaur_tpu.ops.pallas_kkt import batched_spd_inverse
    rng = np.random.default_rng(1)
    M = _spd(rng, 2, 64, 2.0)
    M[1] -= 6.0 * np.eye(64, dtype=np.float32)   # indefinite lane
    minv, flag = batched_spd_inverse(np.asarray(M), interpret=True)
    flag = np.asarray(flag)
    assert flag[0] == 0.0
    assert flag[1] == 2.0
    # lane 0 unaffected by lane 1's failure
    R0 = np.eye(64) - M[0].astype(np.float64) @ \
        np.asarray(minv)[0].astype(np.float64)
    assert np.abs(R0).max() < 5e-5
    # failed lane returns the identity (finite)
    assert np.allclose(np.asarray(minv)[1], np.eye(64))


def test_spd_inverse_ill_conditioned_jacobi_scaled():
    # barrier-style ill-conditioning AFTER Jacobi scaling (the kernel's
    # real input): diagonal-dominant with off-diagonal couplings
    from minotaur_tpu.ops.pallas_kkt import batched_spd_inverse
    rng = np.random.default_rng(2)
    k = 200
    M = _spd(rng, 2, k, 1.0).astype(np.float64)
    w = 10.0 ** rng.uniform(-6, 6, size=k)
    M[0] += np.diag(w)
    d = np.sqrt(np.diagonal(M, axis1=1, axis2=2))
    Ms = (M / d[:, :, None] / d[:, None, :]).astype(np.float32)
    minv, flag = batched_spd_inverse(np.asarray(Ms), interpret=True)
    assert np.all(np.asarray(flag) == 0.0)
    R = np.eye(k)[None] - np.einsum(
        "bij,bjk->bik", Ms.astype(np.float64),
        np.asarray(minv).astype(np.float64))
    assert np.abs(R).max() < 1e-2   # kappa(Ms) ~ 1e4-1e5 after scaling


def test_ipm_pallas_flag_is_inert_on_cpu():
    # use_pallas=True must be a no-op on the CPU backend (tests/dryrun)
    import os
    from minotaur_tpu.engines.ipm import IPMOptions, build_batch_solver
    from minotaur_tpu.engines.staging import stage_problem
    from minotaur_tpu.io.nl_reader import read_nl
    from conftest import REF_INSTANCES
    p = read_nl(os.path.join(REF_INSTANCES, "lp0.nl"))
    sp = stage_problem(p)
    res = build_batch_solver(sp, IPMOptions(use_pallas=True))(
        sp.A, sp.clb, sp.cub, sp.vlb[None, :], sp.vub[None, :])
    assert float(res.obj[0]) == pytest.approx(-59.0 / 7.0, abs=1e-6)
