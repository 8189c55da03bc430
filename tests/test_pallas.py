"""Pallas kernel tests (interpret mode on CPU).

The fused SPD-solve kernel must match the XLA path's math; on hardware it
collapses the refinement chain into one kernel launch (see
ops/pallas_kernels.py docstring for the profiling story).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minotaur_tpu.ops.pallas_kernels import refined_spd_solve_f32


def _setup(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    M = jnp.asarray(A @ A.T + n * np.eye(n))
    d = jnp.sqrt(jnp.diagonal(M))
    dinv = 1.0 / d
    Ms = (M * dinv[:, None] * dinv[None, :]).astype(jnp.float32)
    L = jnp.linalg.cholesky(Ms)
    import jax.scipy.linalg as jsl
    Minv_s = jsl.cho_solve((L, True), jnp.eye(n, dtype=jnp.float32))
    return M, Minv_s, dinv


@pytest.mark.parametrize("n", [50, 301])
def test_refined_solve_matches(n):
    M, Minv_s, dinv = _setup(n)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(n))
    x = refined_spd_solve_f32(Minv_s, M, dinv, jnp.zeros(n), r,
                              interpret=True)
    res = float(jnp.linalg.norm(r - M @ jnp.asarray(x, dtype=jnp.float64)) /
                jnp.linalg.norm(r))
    assert res < 1e-5  # f32 accuracy with refinement


def test_refined_solve_vmap_linearity():
    M, Minv_s, dinv = _setup(64)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(64))
    xb = jax.vmap(lambda rr: refined_spd_solve_f32(
        Minv_s, M, dinv, jnp.zeros(64), rr, interpret=True))(
            jnp.stack([r, 2 * r]))
    np.testing.assert_allclose(np.asarray(xb[1]), 2 * np.asarray(xb[0]),
                               rtol=1e-4, atol=1e-6)
