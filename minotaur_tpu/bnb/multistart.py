"""Multistart NLP solving.

Reference: MsProcessor.{h,cpp} (per-node multistart NLP solves with
`msbnb_scheme_id` random/corner start schemes) and NLPMultiStart /
MultiStart.cpp.  TPU version: all restarts of a node solve as ONE vmapped
batch — the reference loops over OpenMP threads (MsProcessor.cpp:166-294).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..engines.ipm import IPMOptions, build_batch_solver
from ..engines.staging import StagedProblem
from ..utils.types import EngineStatus


def sample_starts(vlb: np.ndarray, vub: np.ndarray, n_starts: int,
                  rng: np.random.Generator, box_cap: float = 10.0
                  ) -> np.ndarray:
    """Random interior points; infinite bounds sample in [-box_cap, cap]
    around 0 (reference scheme 0) plus corner-biased points (scheme 4)."""
    n = len(vlb)
    lo = np.where(np.isfinite(vlb), vlb, -box_cap)
    hi = np.where(np.isfinite(vub), vub, box_cap)
    hi = np.maximum(hi, lo + 1e-6)
    u = rng.uniform(size=(n_starts, n))
    starts = lo + u * (hi - lo)
    # bias a third of the starts toward corners
    k = n_starts // 3
    if k:
        corners = np.where(rng.uniform(size=(k, n)) < 0.5, lo, hi)
        starts[:k] = 0.9 * corners + 0.1 * starts[:k]
    return starts


def multistart_solve(sp: StagedProblem, problem, n_starts: int = 32,
                     seed: int = 0, ipm: IPMOptions = IPMOptions(),
                     vlb: Optional[np.ndarray] = None,
                     vub: Optional[np.ndarray] = None,
                     ) -> Tuple[Optional[np.ndarray], float, dict]:
    """Solve min f over the (continuous relaxation of the) box from many
    random starts in one vmapped batch; returns (best_x, best_obj, info).
    Feasibility is verified on the host problem."""
    rng = np.random.default_rng(seed)
    vlb = sp.vlb if vlb is None else vlb
    vub = sp.vub if vub is None else vub
    solve = build_batch_solver(sp, ipm)
    starts = sample_starts(vlb, vub, n_starts, rng)
    res = solve(sp.A, sp.clb, sp.cub,
                np.tile(vlb, (n_starts, 1)), np.tile(vub, (n_starts, 1)),
                starts)
    xs = np.asarray(res.x)
    objs = np.asarray(res.obj)
    sts = np.asarray(res.status)
    best_x, best_obj = None, float("inf")
    n_feas = 0
    for b in range(n_starts):
        if sts[b] in (EngineStatus.SOLVED_OPTIMAL,
                      EngineStatus.ITERATION_LIMIT) and \
                np.all(np.isfinite(xs[b])) and \
                problem.is_feasible(xs[b], atol=1e-5, int_tol=np.inf):
            n_feas += 1
            if objs[b] < best_obj:
                best_obj = float(objs[b])
                best_x = xs[b].copy()
    info = {"n_starts": n_starts, "n_feasible": n_feas,
            "distinct_objs": len(np.unique(np.round(objs[sts == 1], 6)))}
    return best_x, best_obj, info
