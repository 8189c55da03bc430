"""Fused spatial-B&B superstep for the global (factorable) pipeline.

Reference: QuadHandler.{h,cpp} — secant + tangent relaxation of squares
(getNewSqLf_ :771), McCormick envelopes for bilinear terms
(getNewBilLf_ :702), FBBT over terms (propSqrBnds_/propBilBnds_
:1271-1361), spatial branching candidates from violated terms (:473) —
plus CxUnivarHandler / kPowHandler (secant over/under-estimators and
tangent cuts for univariate y=f(x) terms).

TPU-native design: envelope rows are *computed inside the jitted step*
from the node's (vlb, vub) box — 4 static rows per term whose
coefficients are functions of the bounds — so a batch of nodes each gets
its own envelopes without shipping per-node matrices from the host, and
tightening a box automatically tightens its relaxation.  SecantMod — the
reference's mutable secant-update machinery — disappears entirely.
Univariate terms carry static curvature metadata (glob/univariate.py);
the in-trace shape selection (convex / concave / none) depends only on
the sign of the box, so S-shaped functions regain full envelopes after
one branch at their inflection.
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
from .univariate import CONCAVE, CONVEX, NOENV, make_uni_fns, term_meta

_BIG = 1e20
_XCAP = 1e8


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
    rlt_cuts: int = 0            # max RLT bound-factor cut candidates
    ipm: IPMOptions = IPMOptions()


def build_envelope_fn(gs: GlobStaged,
                      opts: GlobStepOptions = GlobStepOptions()):
    """Standalone (vlb, vub) -> (env_A, env_lb, env_ub) over ALL terms
    (bilinear + univariate), for callers outside the fused step (root
    OBBT re-uses the node envelopes at the root box)."""
    import jax
    import jax.numpy as jnp
    step_env = _EnvHolder()
    build_glob_step(gs, opts, _env_out=step_env)

    def env_fn(vlb, vub):
        parts_A, parts_lb, parts_ub = [], [], []
        if step_env.envelopes is not None:
            a, lo, hi = step_env.envelopes(vlb, vub)
            parts_A.append(a)
            parts_lb.append(lo)
            parts_ub.append(hi)
        if step_env.uni_envelopes is not None:
            a, lo, hi = step_env.uni_envelopes(vlb, vub)
            parts_A.append(a)
            parts_lb.append(lo)
            parts_ub.append(hi)
        if step_env.rlt_rows is not None:
            a, lo, hi = step_env.rlt_rows(vlb, vub)
            parts_A.append(a)
            parts_lb.append(lo)
            parts_ub.append(hi)
        if step_env.tri_rows is not None:
            a, lo, hi = step_env.tri_rows(vlb, vub)
            parts_A.append(a)
            parts_lb.append(lo)
            parts_ub.append(hi)
        if step_env.quad_rows is not None:
            a, lo, hi = step_env.quad_rows(vlb, vub)
            parts_A.append(a)
            parts_lb.append(lo)
            parts_ub.append(hi)
        if not parts_A:
            return (jnp.zeros((0, gs.n)), jnp.zeros(0), jnp.zeros(0))
        return (jnp.concatenate(parts_A, axis=0),
                jnp.concatenate(parts_lb), jnp.concatenate(parts_ub))

    return jax.jit(env_fn)


class _EnvHolder:
    envelopes = None
    uni_envelopes = None
    rlt_rows = None
    tri_rows = None
    quad_rows = None


def build_glob_step(gs: GlobStaged, opts: GlobStepOptions = GlobStepOptions(),
                    _env_out: "_EnvHolder" = None) -> Callable:
    import jax
    import jax.numpy as jnp

    n_x, n_y, n_u, nz = gs.n_x, gs.n_y, gs.n_u, gs.n
    m_base = gs.A.shape[0]
    m_env = 4 * n_y
    m_uenv = 4 * n_u
    rlt_cand = None
    if opts.rlt_cuts > 0 and n_y:
        from .rlt import build_rlt_rows_fn, enumerate_rlt
        rlt_cand = enumerate_rlt(gs, max_cuts=opts.rlt_cuts)
    m_rlt = 4 * rlt_cand.count if rlt_cand is not None else 0
    rlt_rows = build_rlt_rows_fn(rlt_cand, nz) if rlt_cand is not None \
        else None
    n_t = gs.n_t
    m_tri = 4 * n_t
    n_q = getattr(gs, "n_q", 0)
    m_quad = 5 * n_q
    ti = jnp.asarray(gs.term_i.astype(np.int32))
    tj = jnp.asarray(gs.term_j.astype(np.int32))
    ty = jnp.asarray(gs.term_y.astype(np.int32))
    is_sq = jnp.asarray(gs.term_i == gs.term_j)
    int_mask = jnp.asarray(gs.int_mask)
    has_ints = bool(gs.int_mask.any())

    # ---- univariate static metadata -----------------------------------
    if n_u:
        metas = [term_meta(int(f), float(k))
                 for f, k in zip(gs.uni_f, gs.uni_k)]
        u_dom_lo = jnp.asarray([m["dom_lo"] for m in metas])
        u_dom_hi = jnp.asarray([m["dom_hi"] for m in metas])
        u_sh_neg = jnp.asarray([m["shape_neg"] for m in metas],
                               dtype=jnp.int32)
        u_sh_span = jnp.asarray([m["shape_span"] for m in metas],
                                dtype=jnp.int32)
        u_sh_pos = jnp.asarray([m["shape_pos"] for m in metas],
                               dtype=jnp.int32)
        ux = jnp.asarray(gs.uni_x.astype(np.int32))
        uy = jnp.asarray(gs.uni_y.astype(np.int32))
        fval, fder, frange, fback = make_uni_fns(gs.uni_f, gs.uni_k)

    # engine over the extended row space; env rows staged as free rows
    # the trilinear lambda-hull link rows are STATIC equalities (rhs 0)
    # with traced coefficients: the IPM's equality-row classification
    # happens at build time from these static clb/cub
    m_extra = m_env + m_uenv + m_rlt + m_tri + m_quad
    sp_ext = StagedProblem(
        name=gs.name, n=nz, m=m_base + m_extra, c=gs.c,
        obj_const=gs.obj_const, Qobj=None, obj_nl=None,
        A=np.vstack([gs.A, np.zeros((m_extra, nz))]),
        clb=np.concatenate([gs.clb,
                            np.full(m_extra - m_tri - m_quad, -np.inf),
                            np.zeros(m_tri + m_quad)]),
        cub=np.concatenate([gs.cub,
                            np.full(m_extra - m_tri - m_quad, np.inf),
                            np.zeros(m_tri + m_quad)]),
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
    xi_cols = gs.term_i[tidx] if n_y else np.zeros(0, np.int64)
    xj_cols = gs.term_j[tidx] if n_y else np.zeros(0, np.int64)
    y_cols = gs.term_y[tidx] if n_y else np.zeros(0, np.int64)
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

    def uni_envelopes(vlb, vub):
        """4 rows per univariate term y = f(x): tangents at lo/mid/hi +
        the secant.  Shape (convex/concave/none over this box) selects
        row direction; tangents of a convex (concave) f at any point of
        the box are global under-(over-)estimators on the box, so tangent
        points may be clipped; the secant requires both true endpoints
        finite (reference CxUnivarHandler secant/tangent logic)."""
        lo = jnp.clip(vlb[ux], u_dom_lo, u_dom_hi)
        hi = jnp.clip(vub[ux], u_dom_lo, u_dom_hi)
        shape = jnp.where(lo >= 0.0, u_sh_pos,
                          jnp.where(hi <= 0.0, u_sh_neg, u_sh_span))
        lo_c = jnp.clip(lo, -_XCAP, _XCAP)
        hi_c = jnp.clip(hi, -_XCAP, _XCAP)
        mid = 0.5 * (lo_c + hi_c)
        flo = fval(lo_c)
        fhi = fval(hi_c)
        fmid = fval(mid)
        dlo = fder(lo_c)
        dhi = fder(hi_c)
        dmid = fder(mid)
        width = hi - lo
        sec_ok = jnp.isfinite(lo) & jnp.isfinite(hi) & (jnp.abs(lo) < _BIG) \
            & (jnp.abs(hi) < _BIG) & jnp.isfinite(flo) & jnp.isfinite(fhi) \
            & (jnp.abs(flo) < _BIG) & (jnp.abs(fhi) < _BIG) & (width > 1e-12)
        sec = jnp.where(sec_ok, (fhi - flo) / jnp.maximum(width, 1e-12), 0.0)

        # stack the 4 row kinds: 0=tan@lo, 1=tan@hi, 2=tan@mid, 3=secant
        slope = jnp.stack([dlo, dhi, dmid, sec], axis=1)       # (n_u, 4)
        fv = jnp.stack([flo, fhi, fmid, flo], axis=1)
        pt = jnp.stack([lo_c, hi_c, mid, lo_c], axis=1)
        # row:  -slope * x + y  {>=,<=}  f(pt) - slope*pt
        rhs = fv - slope * pt
        env = shape[:, None] != NOENV
        tan_ok = env & jnp.isfinite(slope) & (jnp.abs(slope) < _BIG) & \
            jnp.isfinite(rhs) & (jnp.abs(rhs) < _BIG)
        ok4 = tan_ok.at[:, 3].set(tan_ok[:, 3] & sec_ok)
        # convex: tangents lower rows, secant upper; concave mirrored
        convex = (shape == CONVEX)[:, None]
        lower = jnp.concatenate(
            [jnp.repeat(convex, 3, axis=1), ~convex], axis=1)

        slope_f = slope.reshape(-1)
        rhs_f = rhs.reshape(-1)
        ok_f = ok4.reshape(-1)
        lower_f = lower.reshape(-1)
        urows = jnp.arange(m_uenv)
        ux4 = jnp.repeat(ux, 4)
        uy4 = jnp.repeat(uy, 4)
        env_A = jnp.zeros((m_uenv, nz))
        env_A = env_A.at[urows, ux4].add(jnp.where(ok_f, -slope_f, 0.0))
        env_A = env_A.at[urows, uy4].add(jnp.where(ok_f, 1.0, 0.0))
        env_lb = jnp.where(ok_f & lower_f, rhs_f, -jnp.inf)
        env_ub = jnp.where(ok_f & ~lower_f, rhs_f, jnp.inf)
        return env_A, env_lb, env_ub

    # ---- trilinear lambda-hull link rows (static equalities) -----------
    if n_t:
        tv = jnp.asarray(gs.tri_vars.astype(np.int32))       # (T, 3)
        tyy = np.asarray(gs.tri_y.astype(np.int64))
        lam_cols = (gs.tri_lam0.astype(np.int64)[:, None] +
                    np.arange(8)[None, :])                    # (T, 8)
        bits = np.array([[(v >> i) & 1 for i in range(3)]
                         for v in range(8)])                  # (8, 3)
        bits_j = jnp.asarray(bits[None, :, :] == 1)
        xrows = np.arange(n_t)[:, None] * 4 + np.arange(3)[None, :]
        yrow = np.arange(n_t) * 4 + 3
        lam_j = jnp.asarray(lam_cols)
        xrows_j = jnp.asarray(xrows)
        yrow_j = jnp.asarray(yrow)
        tvar_np = gs.tri_vars.astype(np.int64)

        tri_static = np.zeros((m_tri, nz))
        tri_static[xrows.reshape(-1),
                   tvar_np.reshape(-1)] += 1.0                # e_{x_i}
        tri_static[yrow, tyy] += 1.0                          # e_y
        tri_static_j = jnp.asarray(tri_static)

        def tri_rows(vlb, vub):
            """x_i = sum_v val_i(v) lam_v and y = sum_v prod(v) lam_v —
            the exact convex hull of a trilinear monomial over the box
            (vertex/lambda formulation).  Equality rhs 0 is static; only
            the lambda coefficients depend on the box."""
            lo = vlb[tv]                                      # (T, 3)
            hi = vub[tv]
            vals = jnp.where(bits_j, hi[:, None, :], lo[:, None, :])
            prod = vals[:, :, 0] * vals[:, :, 1] * vals[:, :, 2]
            tA = tri_static_j
            for i in range(3):
                tA = tA.at[xrows_j[:, i][:, None], lam_j].add(
                    -vals[:, :, i])
            tA = tA.at[yrow_j[:, None], lam_j].add(-prod)
            zeros = jnp.zeros(m_tri)
            return tA, zeros, zeros
    else:
        tri_rows = None

    # ---- quadrilinear lambda-hull link rows (static equalities) --------
    if n_q:
        qv = jnp.asarray(gs.quad_vars.astype(np.int32))       # (Q, 4)
        qyy = np.asarray(gs.quad_y.astype(np.int64))
        qlam_cols = (gs.quad_lam0.astype(np.int64)[:, None] +
                     np.arange(16)[None, :])                   # (Q, 16)
        qbits = np.array([[(v >> i) & 1 for i in range(4)]
                          for v in range(16)])                 # (16, 4)
        qbits_j = jnp.asarray(qbits[None, :, :] == 1)
        qxrows = np.arange(n_q)[:, None] * 5 + np.arange(4)[None, :]
        qyrow = np.arange(n_q) * 5 + 4
        qlam_j = jnp.asarray(qlam_cols)
        qxrows_j = jnp.asarray(qxrows)
        qyrow_j = jnp.asarray(qyrow)
        qvar_np = gs.quad_vars.astype(np.int64)

        quad_static = np.zeros((m_quad, nz))
        quad_static[qxrows.reshape(-1),
                    qvar_np.reshape(-1)] += 1.0               # e_{x_i}
        quad_static[qyrow, qyy] += 1.0                        # e_y
        quad_static_j = jnp.asarray(quad_static)

        def quad_rows(vlb, vub):
            """Vertex/lambda hull of a 4-linear monomial over the box —
            the arity-4 member of the reference's grouped multilinear
            hulls (MultilinearTermsHandler `ml_*`)."""
            lo = vlb[qv]                                      # (Q, 4)
            hi = vub[qv]
            vals = jnp.where(qbits_j, hi[:, None, :], lo[:, None, :])
            prod = (vals[:, :, 0] * vals[:, :, 1] *
                    vals[:, :, 2] * vals[:, :, 3])
            qA = quad_static_j
            for i in range(4):
                qA = qA.at[qxrows_j[:, i][:, None], qlam_j].add(
                    -vals[:, :, i])
            qA = qA.at[qyrow_j[:, None], qlam_j].add(-prod)
            zeros = jnp.zeros(m_quad)
            return qA, zeros, zeros
    else:
        quad_rows = None

    if _env_out is not None:
        _env_out.envelopes = envelopes if n_y else None
        _env_out.uni_envelopes = uni_envelopes if n_u else None
        _env_out.rlt_rows = rlt_rows
        _env_out.tri_rows = tri_rows
        _env_out.quad_rows = quad_rows

    def term_fbbt(vlb, vub, infeas):
        """Interval propagation through y = xi*xj both ways (reference
        propSqrBnds_/propBilBnds_), vectorized over all terms."""
        li, ui = vlb[ti], vub[ti]
        lj, uj = vlb[tj], vub[tj]
        ylo, yhi = vlb[ty], vub[ty]
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
        nvlb = nvlb.at[ty].max(nylo)
        nvub = nvub.at[ty].min(nyhi)
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

    def uni_fbbt(vlb, vub, infeas):
        """Interval propagation through y = f(x) both ways + domain
        clamping (x must lie in dom(f) for the term to be defined)."""
        lo = jnp.maximum(vlb[ux], u_dom_lo)
        hi = jnp.minimum(vub[ux], u_dom_hi)
        infeas = infeas | jnp.any(lo > hi + 1e-9)
        lo_s = jnp.minimum(lo, hi)
        rlo, rhi = frange(lo_s, hi)
        nylo = jnp.maximum(vlb[uy], rlo)
        nyhi = jnp.minimum(vub[uy], rhi)
        infeas = infeas | jnp.any(nylo > nyhi + 1e-9)
        bxlo, bxhi = fback(nylo, nyhi)
        bxlo = jnp.where(jnp.isnan(bxlo), -jnp.inf, bxlo)
        bxhi = jnp.where(jnp.isnan(bxhi), jnp.inf, bxhi)
        nvlb, nvub = vlb, vub
        nvlb = nvlb.at[ux].max(jnp.minimum(jnp.maximum(lo, bxlo), hi))
        nvub = nvub.at[ux].min(jnp.maximum(jnp.minimum(hi, bxhi), lo_s))
        nvlb = nvlb.at[uy].max(nylo)
        nvub = nvub.at[uy].min(nyhi)
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
            if n_u:
                vlb, vub, infeas = uni_fbbt(vlb, vub, infeas)
            if has_ints:
                vlb = jnp.where(int_mask, jnp.ceil(vlb - opts.int_tol), vlb)
                vub = jnp.where(int_mask, jnp.floor(vub + opts.int_tol), vub)
                infeas = infeas | jnp.any(vlb > vub + 1e-9)

        parts_A = [A_base]
        parts_lb = [clb_base]
        parts_ub = [cub_base]
        if n_y:
            eA, elb, eub = envelopes(vlb, vub)
            parts_A.append(eA)
            parts_lb.append(elb)
            parts_ub.append(eub)
        else:
            parts_A.append(jnp.zeros((m_env, nz)))
            parts_lb.append(jnp.full((m_env,), -jnp.inf))
            parts_ub.append(jnp.full((m_env,), jnp.inf))
        if n_u:
            uA, ulb, uub = uni_envelopes(vlb, vub)
            parts_A.append(uA)
            parts_lb.append(ulb)
            parts_ub.append(uub)
        elif m_uenv:
            parts_A.append(jnp.zeros((m_uenv, nz)))
            parts_lb.append(jnp.full((m_uenv,), -jnp.inf))
            parts_ub.append(jnp.full((m_uenv,), jnp.inf))
        if m_rlt:
            rA, rlb, rub = rlt_rows(vlb, vub)
            parts_A.append(rA)
            parts_lb.append(rlb)
            parts_ub.append(rub)
        if m_tri:
            tA, tlb, tub = tri_rows(vlb, vub)
            parts_A.append(tA)
            parts_lb.append(tlb)
            parts_ub.append(tub)
        if m_quad:
            qA, qlb, qub = quad_rows(vlb, vub)
            parts_A.append(qA)
            parts_lb.append(qlb)
            parts_ub.append(qub)
        A = jnp.concatenate(parts_A, axis=0)
        clb = jnp.concatenate(parts_lb)
        cub = jnp.concatenate(parts_ub)
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
        xscale = jnp.maximum(1.0, jnp.max(jnp.abs(x)))
        bil_viol = jnp.asarray(0.0)
        uni_viol = jnp.asarray(0.0)
        sp_var_bil = jnp.asarray(-1, dtype=jnp.int32)
        sp_var_uni = jnp.asarray(-1, dtype=jnp.int32)
        sp_val_uni = jnp.asarray(0.0)
        uni_bias0 = jnp.asarray(False)
        if n_y:
            viol = jnp.abs(x[ty] - x[ti] * x[tj])
            worst = jnp.argmax(viol)
            bil_viol = jnp.max(viol)
            # branch on the factor with the wider box
            wi = jnp.clip(vub[ti[worst]], -1e8, 1e8) - \
                jnp.clip(vlb[ti[worst]], -1e8, 1e8)
            wj = jnp.clip(vub[tj[worst]], -1e8, 1e8) - \
                jnp.clip(vlb[tj[worst]], -1e8, 1e8)
            sp_var_bil = jnp.where(wi >= wj, ti[worst],
                                   tj[worst]).astype(jnp.int32)
        if n_u:
            uviol = jnp.abs(x[uy] - fval(jnp.clip(x[ux], u_dom_lo,
                                                  u_dom_hi)))
            uworst = jnp.argmax(uviol)
            uni_viol = jnp.max(uviol)
            sp_var_uni = ux[uworst].astype(jnp.int32)
            # bias the branch point to the inflection when the box spans
            # it and the spanning shape has no envelope (x^odd, tanh, ...)
            spans = (vlb[sp_var_uni] < -1e-12) & (vub[sp_var_uni] > 1e-12)
            uni_bias0 = spans & (u_sh_span[uworst] == NOENV)
            sp_val_uni = jnp.where(uni_bias0, 0.0, x[sp_var_uni])
        term_ok = jnp.maximum(bil_viol, uni_viol) <= opts.term_tol * xscale
        use_uni = uni_viol > bil_viol
        sp_var = jnp.where(use_uni, sp_var_uni, sp_var_bil)

        use_int = has_ints & ~int_ok
        bvar = jnp.where(use_int, int_bvar,
                         jnp.where(term_ok, -1, sp_var)).astype(jnp.int32)
        is_spatial = ~use_int & ~term_ok
        bval_raw = jnp.where(use_uni & is_spatial, sp_val_uni,
                             x[jnp.maximum(bvar, 0)])
        # safeguarded spatial branch point (reference keeps it interior)
        lo_b = vlb[jnp.maximum(bvar, 0)]
        hi_b = vub[jnp.maximum(bvar, 0)]
        w = jnp.clip(hi_b, -1e8, 1e8) - jnp.clip(lo_b, -1e8, 1e8)
        bval = jnp.where(
            is_spatial,
            jnp.clip(bval_raw, jnp.clip(lo_b, -1e8, 1e8) + 0.1 * w,
                     jnp.clip(hi_b, -1e8, 1e8) - 0.1 * w),
            bval_raw)
        # branch exactly at an interior inflection (restores envelopes in
        # both children for S-shaped univariate terms)
        bval = jnp.where(is_spatial & use_uni & uni_bias0, 0.0, bval)

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
