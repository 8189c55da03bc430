"""Cut generators.

CoverCutGenerator — reference: src/base/CoverCutGenerator.{h,cpp} (used by
KnapCovHandler): for binary knapsack rows sum(a_j x_j) <= b, a fractional
LP point violating a minimal cover C yields the globally valid cut
sum_{j in C} x_j <= |C| - 1.

Separation is host-side numpy over a handful of LP points per superstep;
the cuts land in the same preallocated pool as the QG linearizations.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def find_knapsack_rows(A: np.ndarray, clb: np.ndarray, cub: np.ndarray,
                       int_mask: np.ndarray, vlb: np.ndarray,
                       vub: np.ndarray) -> List[Tuple[int, np.ndarray, float]]:
    """Rows usable for cover cuts: finite ub, all-nonneg coefficients on
    binary variables only (reference: KnapsackList.cpp).  Returns
    (row, var_indices, b)."""
    out = []
    is_bin = int_mask & (vlb >= -1e-9) & (vub <= 1.0 + 1e-9)
    for r in range(A.shape[0]):
        if not np.isfinite(cub[r]):
            continue
        nz = np.nonzero(A[r])[0]
        if len(nz) < 2:
            continue
        if np.isfinite(clb[r]):
            continue  # ranged/equality rows are not plain knapsacks
        if not np.all(A[r, nz] > 0):
            continue
        if not np.all(is_bin[nz]):
            continue
        out.append((r, nz, float(cub[r]), A[r, nz].copy()))
    return out


def separate_cover_cuts(knap_rows, x: np.ndarray, max_cuts: int = 8,
                        viol_tol: float = 1e-4, extend: bool = True):
    """Greedy minimal-cover separation at x (reference:
    CoverCutGenerator::GNS separation).  Returns [(var_indices, rhs)] for
    cuts sum_{j in C} x_j <= rhs.

    With `extend`, each minimal cover C is grown to the EXTENDED cover
    E(C) = C + {j : a_j >= max_{i in C} a_i} (reference
    CoverCutGenerator cover extension): any |C|-subset of E(C) weighs at
    least as much as C itself (> b), so the same rhs stays valid and the
    cut dominates the plain cover inequality."""
    cuts = []
    for r, nz, b, a in knap_rows:
        xs = x[nz]
        if xs.max() <= viol_tol:
            continue
        order = np.argsort(-xs)
        tot = 0.0
        cover = []
        for o in order:
            cover.append(o)
            tot += a[o]
            if tot > b + 1e-9:
                break
        else:
            continue  # row cannot be violated
        # minimize the cover: drop items whose removal keeps tot > b
        keep = list(cover)
        for o in sorted(cover, key=lambda o: xs[o]):
            if len(keep) > 1 and tot - a[o] > b + 1e-9:
                keep.remove(o)
                tot -= a[o]
        rhs = len(keep) - 1
        members = list(keep)
        if extend:
            amax = max(a[o] for o in keep)
            members += [o for o in range(len(nz))
                        if o not in keep and a[o] >= amax - 1e-12]
        if xs[members].sum() > rhs + viol_tol:
            cuts.append((nz[members], float(rhs)))
            if len(cuts) >= max_cuts:
                break
    return cuts


def find_gub_rows(A: np.ndarray, clb: np.ndarray, cub: np.ndarray,
                  int_mask: np.ndarray, vlb: np.ndarray, vub: np.ndarray
                  ) -> List[Tuple[int, np.ndarray]]:
    """Generalized-upper-bound rows: sum_{j in S} x_j <= 1 over binaries
    (reference: ProbStructure.{h,cpp} GUB detection, feeding the LGCI
    generator).  Returns (row, var_indices)."""
    out = []
    is_bin = int_mask & (vlb >= -1e-9) & (vub <= 1.0 + 1e-9)
    for r in range(A.shape[0]):
        if not np.isfinite(cub[r]) or abs(cub[r] - 1.0) > 1e-12:
            continue
        nz = np.nonzero(A[r])[0]
        if len(nz) < 2 or not np.all(is_bin[nz]):
            continue
        if not np.allclose(A[r, nz], 1.0):
            continue
        out.append((r, nz))
    return out
