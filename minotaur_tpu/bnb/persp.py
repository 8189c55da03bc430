"""Perspective reformulation: detection + perspective cuts.

Reference: PerspCon.{h,cpp} (detection of constraints controlled by a
binary "indicator"), PerspCutGenerator.{h,cpp} and PerspCutHandler
(perspective cuts), NlPresHandler perspective detect (:837).

Structure detected (conservative): a nonlinear row  g(x) <= c  whose
variables are ALL semi-continuous on the SAME binary z — i.e. for every
variable v of the row there are linear rows forcing  v <= ub_v * z  and
v >= lb_v * z  (so z = 0 fixes the row's variables at 0).  For convex g
with g(0) <= c, the perspective  z * g(x/z) <= z * c  is the convex hull
of the on/off graph, and its linearization at any point u,

    grad_g(u) . x  +  (g(u) - grad_g(u) . u - c) * z  <=  0,

is globally valid (the perspective cut).  QG swaps these in for plain
gradient cuts on detected rows — strictly tighter at fractional z.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..engines.staging import StagedProblem

_INF = float("inf")


@dataclasses.dataclass
class PerspRow:
    k: int          # index into sp.nl_rows
    row: int        # row index in sp
    z: int          # controlling binary column
    vars: np.ndarray


def detect_perspective(sp: StagedProblem) -> List[PerspRow]:
    """Find nonlinear <=-rows whose variables are all zero-forced by one
    binary via linear indicator rows (reference PerspCon::detect)."""
    out: List[PerspRow] = []
    if not len(sp.nl_rows):
        return out
    n = sp.n
    is_bin = sp.int_mask & (sp.vlb >= -1e-9) & (sp.vub <= 1 + 1e-9)

    # indicator structure per (v, z), from 2-var rows normalized to
    # coefficient +1 on v:  v in [lo - czn*z, hi - czn*z]
    #   upper control (v <= u*z, u >= 0): finite hi <= 0 and czn < 0
    #   lower control (v >= l*z, l <= 0 with v >= 0 at z=0): finite
    #     lo >= 0 ... combined with czn arbitrary gives v >= lo - czn*z
    #     >= 0 at z = 0; the variable's own bound v >= 0 also qualifies
    ub_ctrl: Dict[int, set] = {}
    lb_ctrl: Dict[int, set] = {}
    nl_set = set(int(x) for x in sp.nl_rows)
    for r in range(sp.m):
        if r in nl_set:
            continue
        nz = np.nonzero(sp.A[r])[0]
        if len(nz) != 2:
            continue
        a, b = int(nz[0]), int(nz[1])
        for v, z in ((a, b), (b, a)):
            if not is_bin[z] or is_bin[v]:
                continue
            cv, cz = sp.A[r, v], sp.A[r, z]
            czn = cz / cv
            if cv > 0:
                lo = sp.clb[r] / cv if np.isfinite(sp.clb[r]) else -_INF
                hi = sp.cub[r] / cv if np.isfinite(sp.cub[r]) else _INF
            else:
                lo = sp.cub[r] / cv if np.isfinite(sp.cub[r]) else -_INF
                hi = sp.clb[r] / cv if np.isfinite(sp.clb[r]) else _INF
            if hi <= 1e-12 and czn < 0:
                ub_ctrl.setdefault(v, set()).add(z)
            if lo >= -1e-12:
                lb_ctrl.setdefault(v, set()).add(z)

    for k, r in enumerate(sp.nl_rows):
        r = int(r)
        if not (np.isfinite(sp.cub[r]) and not np.isfinite(sp.clb[r])):
            continue  # perspective cuts derived for <=-rows only
        g = sp.nl_graphs[k] if k < len(sp.nl_graphs) else None
        if g is None:
            continue
        vs = g.vars_used()
        lin_vs = np.nonzero(sp.A[r])[0]
        all_vs = np.unique(np.concatenate([vs, lin_vs])).astype(int)
        cands: Optional[set] = None
        ok = True
        for v in all_vs:
            if is_bin[v]:
                ok = False
                break
            zs = ub_ctrl.get(int(v), set()) & lb_ctrl.get(int(v), set())
            # lower side may come from the variable's own bound v >= 0
            if sp.vlb[v] >= -1e-12:
                zs = ub_ctrl.get(int(v), set())
            if not zs:
                ok = False
                break
            cands = zs if cands is None else (cands & zs)
            if not cands:
                ok = False
                break
        if not ok or not cands:
            continue
        z = sorted(cands)[0]
        # validity needs g(0) <= c: check by evaluation
        x0 = np.zeros(n)
        try:
            g0 = float(g.eval_np(x0)) + float(sp.A[r] @ x0)
        except Exception:
            continue
        if not np.isfinite(g0) or g0 > sp.cub[r] + 1e-9:
            continue
        out.append(PerspRow(k=k, row=r, z=int(z), vars=all_vs))
    return out
