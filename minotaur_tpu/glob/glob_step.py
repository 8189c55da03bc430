"""Fused spatial-B&B superstep for the quadratic global pipeline.

Reference: QuadHandler.{h,cpp} — secant + tangent relaxation of squares
(getNewSqLf_ :771), McCormick envelopes for bilinear terms
(getNewBilLf_ :702), FBBT over terms (propSqrBnds_/propBilBnds_
:1271-1361), spatial branching candidates from violated terms (:473).

TPU-native design: envelope rows are *computed inside the jitted step*
from the node's (vlb, vub) box — 4 static rows per term whose
coefficients are functions of the bounds — so a batch of nodes each gets
its own envelopes without shipping per-node matrices from the host, and
tightening a box automatically tightens its relaxation.  SecantMod — the
reference's mutable secant-update machinery — disappears entirely.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import numpy as np

from ..engines.ipm import IPMOptions, build_single_solver
from ..engines.staging import StagedProblem
from ..ops.interval import _idiv, _imul, linear_fbbt
from .transformer import GlobStaged

_BIG = 1e20


class GlobStepResult(NamedTuple):
    status: "jnp.ndarray"
    obj: "jnp.ndarray"
    dual_bound: "jnp.ndarray"
    x: "jnp.ndarray"            # (B, nz)
    int_feasible: "jnp.ndarray"
    term_feasible: "jnp.ndarray"
    branch_var: "jnp.ndarray"   # int or spatial variable (-1 none)
    branch_val: "jnp.ndarray"
    is_spatial: "jnp.ndarray"   # bool
    new_vlb: "jnp.ndarray"
    new_vub: "jnp.ndarray"
    fbbt_infeas: "jnp.ndarray"


@dataclasses.dataclass(frozen=True)
class GlobStepOptions:
    int_tol: float = 1e-6
    term_tol: float = 1e-6
    fbbt_rounds: int = 2
    ipm: IPMOptions = IPMOptions()


def build_glob_step(gs: GlobStaged, opts: GlobStepOptions = GlobStepOptions()
                    ) -> Callable:
    import jax
    import jax.numpy as jnp

    n_x, n_y, nz = gs.n_x, gs.n_y, gs.n
    m_base = gs.A.shape[0]
    m_env = 4 * n_y
    ti = jnp.asarray(gs.term_i.astype(np.int32))
    tj = jnp.asarray(gs.term_j.astype(np.int32))
    is_sq = jnp.asarray(gs.term_i == gs.term_j)
    int_mask = jnp.asarray(gs.int_mask)
    has_ints = bool(gs.int_mask.any())

    # engine over the extended row space; env rows staged as free rows
    sp_ext = StagedProblem(
        name=gs.name, n=nz, m=m_base + m_env, c=gs.c,
        obj_const=gs.obj_const, Qobj=None, obj_nl=None,
        A=np.vstack([gs.A, np.zeros((m_env, nz))]),
        clb=np.concatenate([gs.clb, np.full(m_env, -np.inf)]),
        cub=np.concatenate([gs.cub, np.full(m_env, np.inf)]),
        vlb=gs.vlb, vub=gs.vub, int_mask=gs.int_mask,
        nl_rows=np.zeros(0, np.int32), con_nl=None, nl_graphs=[])
    solve_one = build_single_solver(sp_ext, opts.ipm)
    A_base = jnp.asarray(gs.A)
    clb_base = jnp.asarray(gs.clb)
    cub_base = jnp.asarray(gs.cub)

    # static scatter indices for the 4 env rows per term:
    # row layout per term t: [4t, 4t+1] lower rows (>= rhs), [4t+2, 4t+3]
    # upper rows (<= rhs)
    rows = np.arange(m_env)
    tidx = rows // 4
    kind = rows % 4
    xi_cols = gs.term_i[tidx]
    xj_cols = gs.term_j[tidx]
    y_cols = gs.n_x + tidx
    rows_j = jnp.asarray(rows)
    tidx_j = jnp.asarray(tidx)
    kind_j = jnp.asarray(kind)
    xi_j = jnp.asarray(xi_cols.astype(np.int32))
    xj_j = jnp.asarray(xj_cols.astype(np.int32))
    y_j = jnp.asarray(y_cols.astype(np.int32))

    def envelopes(vlb, vub):
        """(env_A (m_env, nz), env_lb, env_ub) from the box.

        squares  y = x^2 (li, ui finite where used):
          k=0: tangent at li : -2 li x + y >= -li^2
          k=1: tangent at ui : -2 ui x + y >= -ui^2
          k=2: tangent at mid: -2 t  x + y >= -t^2
          k=3: secant        : -(l+u) x + y <= -l u
        bilinear y = xi xj (McCormick):
          k=0: -lj xi - li xj + y >= -li lj
          k=1: -uj xi - ui xj + y >= -ui uj
          k=2: -uj xi - li xj + y <= -li uj
          k=3: -lj xi - ui xj + y <= -ui lj
        rows touching an infinite bound deactivate ((-inf, inf) range).
        """
        li = vlb[xi_j]
        ui = vub[xi_j]
        lj = vlb[xj_j]
        uj = vub[xj_j]
        fin_li = jnp.abs(li) < _BIG
        fin_ui = jnp.abs(ui) < _BIG
        fin_lj = jnp.abs(lj) < _BIG
        fin_uj = jnp.abs(uj) < _BIG
        cl_li = jnp.clip(li, -1e8, 1e8)
        cl_ui = jnp.clip(ui, -1e8, 1e8)
        mid = 0.5 * (jnp.where(fin_li, cl_li, 0.0) +
                     jnp.where(fin_ui, cl_ui, 0.0))
        sq = is_sq[tidx_j]

        # coefficient on xi
        a_xi_sq = jnp.where(kind_j == 0, -2 * cl_li,
                   jnp.where(kind_j == 1, -2 * cl_ui,
                   jnp.where(kind_j == 2, -2 * mid, -(cl_li + cl_ui))))
        a_xi_bil = jnp.where(kind_j == 0, -lj,
                    jnp.where(kind_j == 1, -uj,
                    jnp.where(kind_j == 2, -uj, -lj)))
        a_xj_bil = jnp.where(kind_j == 0, -li,
                    jnp.where(kind_j == 1, -ui,
                    jnp.where(kind_j == 2, -li, -ui)))
        rhs_sq = jnp.where(kind_j == 0, -cl_li ** 2,
                  jnp.where(kind_j == 1, -cl_ui ** 2,
                  jnp.where(kind_j == 2, -mid ** 2, -cl_li * cl_ui)))
        rhs_bil = jnp.where(kind_j == 0, -li * lj,
                   jnp.where(kind_j == 1, -ui * uj,
                   jnp.where(kind_j == 2, -li * uj, -ui * lj)))

        # validity masks
        ok_sq = jnp.where(kind_j == 0, fin_li,
                 jnp.where(kind_j == 1, fin_ui,
                 jnp.where(kind_j == 2, fin_li | fin_ui, fin_li & fin_ui)))
        ok_bil = jnp.where(kind_j == 0, fin_lj & fin_li,
                  jnp.where(kind_j == 1, fin_uj & fin_ui,
                  jnp.where(kind_j == 2, fin_uj & fin_li, fin_lj & fin_ui)))
        ok = jnp.where(sq, ok_sq, ok_bil)
        lower_row = kind_j < 2  # rows 0,1 are >= rows; 2,3 are <= rows
        # squares: 0,1,2 lower (tangents), 3 upper (secant)
        lower_row = jnp.where(sq, kind_j < 3, lower_row)

        a_xi = jnp.where(sq, a_xi_sq, a_xi_bil)
        a_xj = jnp.where(sq, 0.0, a_xj_bil)
        rhs = jnp.where(sq, rhs_sq, rhs_bil)

        env_A = jnp.zeros((m_env, nz))
        env_A = env_A.at[rows_j, xi_j].add(jnp.where(ok, a_xi, 0.0))
        env_A = env_A.at[rows_j, xj_j].add(jnp.where(ok, a_xj, 0.0))
        env_A = env_A.at[rows_j, y_j].add(jnp.where(ok, 1.0, 0.0))
        env_lb = jnp.where(ok & lower_row, rhs, -jnp.inf)
        env_ub = jnp.where(ok & ~lower_row, rhs, jnp.inf)
        return env_A, env_lb, env_ub

    def term_fbbt(vlb, vub, infeas):
        """Interval propagation through y = xi*xj both ways (reference
        propSqrBnds_/propBilBnds_), vectorized over all terms."""
        li, ui = vlb[ti], vub[ti]
        lj, uj = vlb[tj], vub[tj]
        ylo, yhi = vlb[gs.n_x:], vub[gs.n_x:]
        # forward: y in product interval
        plo, phi = _imul(jnp, li, ui, lj, uj)
        sq_lo = jnp.where((li <= 0) & (ui >= 0), 0.0,
                          jnp.minimum(li * li, ui * ui))
        sq_hi = jnp.maximum(li * li, ui * ui)
        plo = jnp.where(is_sq, sq_lo, plo)
        phi = jnp.where(is_sq, sq_hi, phi)
        nylo = jnp.maximum(ylo, plo)
        nyhi = jnp.minimum(yhi, phi)
        infeas = infeas | jnp.any(nylo > nyhi + 1e-9)

        # backward: xi from y / xj ; xj from y / xi ; squares via sqrt
        bi_lo, bi_hi = _idiv(jnp, nylo, nyhi, lj, uj)
        bj_lo, bj_hi = _idiv(jnp, nylo, nyhi, li, ui)
        s = jnp.sqrt(jnp.maximum(nyhi, 0.0))
        smin = jnp.sqrt(jnp.maximum(nylo, 0.0))
        sq_xlo = jnp.where(li >= 0.0, smin, -s)
        sq_xhi = jnp.where(ui <= 0.0, -smin, s)
        bi_lo = jnp.where(is_sq, sq_xlo, bi_lo)
        bi_hi = jnp.where(is_sq, sq_xhi, bi_hi)

        nvlb, nvub = vlb, vub
        nvlb = nvlb.at[gs.n_x:].set(nylo)
        nvub = nvub.at[gs.n_x:].set(nyhi)
        # scatter-tighten factors (min over terms touching the var)
        nvlb = nvlb.at[ti].max(jnp.where(jnp.isnan(bi_lo), -jnp.inf, bi_lo))
        nvub = nvub.at[ti].min(jnp.where(jnp.isnan(bi_hi), jnp.inf, bi_hi))
        keep = ~is_sq
        nvlb = nvlb.at[tj].max(jnp.where(keep & ~jnp.isnan(bj_lo),
                                         bj_lo, -jnp.inf))
        nvub = nvub.at[tj].min(jnp.where(keep & ~jnp.isnan(bj_hi),
                                         bj_hi, jnp.inf))
        infeas = infeas | jnp.any(nvlb > nvub + 1e-9)
        return nvlb, nvub, infeas

    def step_one(vlb, vub, x0, cutoff):
        infeas = jnp.asarray(False)
        for _ in range(opts.fbbt_rounds):
            vlb, vub, bad = linear_fbbt(A_base, clb_base, cub_base,
                                        vlb, vub)
            infeas = infeas | bad
            if n_y:
                vlb, vub, infeas = term_fbbt(vlb, vub, infeas)
            if has_ints:
                vlb = jnp.where(int_mask, jnp.ceil(vlb - opts.int_tol), vlb)
                vub = jnp.where(int_mask, jnp.floor(vub + opts.int_tol), vub)
                infeas = infeas | jnp.any(vlb > vub + 1e-9)

        env_A, env_lb, env_ub = envelopes(vlb, vub)
        A = jnp.concatenate([A_base, env_A], axis=0)
        clb = jnp.concatenate([clb_base, env_lb])
        cub = jnp.concatenate([cub_base, env_ub])
        svlb = jnp.where(vlb > vub, vub, vlb)
        res = solve_one(A, clb, cub, svlb, vub, x0)

        x = res.x
        if has_ints:
            frac = jnp.where(int_mask, jnp.abs(x - jnp.round(x)), 0.0)
            max_frac = jnp.max(frac)
            int_bvar = jnp.argmax(frac).astype(jnp.int32)
            int_ok = max_frac <= opts.int_tol
        else:
            int_ok = jnp.asarray(True)
            int_bvar = jnp.asarray(-1, dtype=jnp.int32)

        # term violations -> spatial branching candidate
        if n_y:
            viol = jnp.abs(x[gs.n_x + jnp.arange(n_y)] - x[ti] * x[tj])
            worst = jnp.argmax(viol)
            term_ok = jnp.max(viol) <= opts.term_tol * \
                jnp.maximum(1.0, jnp.max(jnp.abs(x)))
            # branch on the factor with the wider box
            wi = jnp.clip(vub[ti[worst]], -1e8, 1e8) - \
                jnp.clip(vlb[ti[worst]], -1e8, 1e8)
            wj = jnp.clip(vub[tj[worst]], -1e8, 1e8) - \
                jnp.clip(vlb[tj[worst]], -1e8, 1e8)
            sp_var = jnp.where(wi >= wj, ti[worst], tj[worst]).astype(jnp.int32)
        else:
            term_ok = jnp.asarray(True)
            sp_var = jnp.asarray(-1, dtype=jnp.int32)

        use_int = has_ints & ~int_ok
        bvar = jnp.where(use_int, int_bvar,
                         jnp.where(term_ok, -1, sp_var)).astype(jnp.int32)
        is_spatial = ~use_int & ~term_ok
        bval_raw = x[jnp.maximum(bvar, 0)]
        # safeguarded spatial branch point (reference keeps it interior)
        lo_b = vlb[jnp.maximum(bvar, 0)]
        hi_b = vub[jnp.maximum(bvar, 0)]
        w = jnp.clip(hi_b, -1e8, 1e8) - jnp.clip(lo_b, -1e8, 1e8)
        bval = jnp.where(
            is_spatial,
            jnp.clip(bval_raw, jnp.clip(lo_b, -1e8, 1e8) + 0.1 * w,
                     jnp.clip(hi_b, -1e8, 1e8) - 0.1 * w),
            bval_raw)

        from ..utils.types import EngineStatus
        status = jnp.where(
            infeas, jnp.asarray(int(EngineStatus.SOLVED_INFEASIBLE),
                                dtype=jnp.int32), res.status)
        db = jnp.where(infeas, _BIG, res.dual_bound)
        return GlobStepResult(
            status=status, obj=res.obj, dual_bound=db, x=x,
            int_feasible=int_ok & ~infeas, term_feasible=term_ok & ~infeas,
            branch_var=bvar, branch_val=bval, is_spatial=is_spatial,
            new_vlb=vlb, new_vub=vub, fbbt_infeas=infeas)

    @functools.partial(jax.jit)
    def step(vlb_b, vub_b, x0_b, cutoff):
        return jax.vmap(step_one, in_axes=(0, 0, 0, None))(
            vlb_b, vub_b, x0_b, cutoff)

    return step
