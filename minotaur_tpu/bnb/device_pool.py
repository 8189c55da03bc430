"""Device-resident multi-round B&B supersteps.

The round-4 profile showed the per-batch host round-trip (~30 ms dispatch
+ 0.1-0.25 s fetch latency through the device tunnel) as the binding
constraint on nodes/s: every batch of 64 nodes paid one full
host<->device cycle while all tree operations ran on the host.  This
module moves the tree itself onto the device: a fixed-capacity node pool
(bound boxes, inherited bounds, warm starts, pseudocosts) lives in device
memory, and ONE jitted `multiround` program executes T complete B&B
rounds — select best nodes -> fused presolve+solve superstep -> certified
prune / incumbent-candidate / branch -> insert children — before the host
sees a single packed summary vector.  The host tree (`TreeManager`)
remains the overflow store: the pool is a device cache in front of it,
drained/refilled on congestion and at exit.

Reference: the serial loop this compiles away is
BranchAndBound::solve (BranchAndBound.cpp:424-514): processKeepingNode /
branch_ / insertCandidate per node; here T*B of those iterations run per
device dispatch.  Prune semantics mirror PCBProcessor::shouldPrune_
(PCBProcessor.cpp:400-523) exactly as bnb.py::_process_result does.

Soundness argument (the invariants CLAUDE.md pins):
- nodes are pruned only on *certified* dual bounds (the runner is built
  only for `_is_lp_relax or _certified_db` problems) against the
  HOST-VERIFIED cutoff, or on FBBT/Farkas infeasibility proofs;
- a device-accepted incumbent candidate (integral, converged, and
  feasible under a 2x-stricter device-side tolerance than the host
  acceptance test) may tighten the in-device cutoff immediately, but
  every prune that depended on the not-yet-host-verified value is
  tracked in `devrisk_lb`; if the host's `Problem.is_feasible` ever
  rejects the candidate at sync (it cannot, for staged-1:1 LP/QP models,
  but belt and braces), `unresolved_lb` is capped at `devrisk_lb`, which
  restores soundness by forfeiting the optimality claim instead of
  returning a wrong answer;
- anything unresolved (unconverged + no branching candidate) caps
  `unresolved_lb` exactly like the host path.
"""

from __future__ import annotations

import math
import time
from typing import List, Optional

import numpy as np

from ..utils.types import EngineStatus, SolveStatus
from .node import Node
from .step import build_node_step_unjitted

_INF = float("inf")

# state tuple layout (all device arrays):
#  0 vlb   (C, n)   node lower bounds
#  1 vub   (C, n)   node upper bounds
#  2 wx    (C, n)   primal warm start
#  3 wy    (C, m)   dual warm start
#  4 lb    (C,)     inherited certified bound
#  5 depth (C,)     f64 depth (dive key)
#  6 bvar  (C,)     i32 var this node was branched on (-1 root)
#  7 bdir  (C,)     i32 0=down 1=up
#  8 bfrac (C,)     f64 fractional distance of the branch
#  9 pit   (C,)     f64 parent-lane IPM iteration count (difficulty
#                   estimate; the host tree uses Node.pred_iters to
#                   compose iteration-homogeneous batches — a vmapped
#                   superstep runs at its slowest lane's count, so the
#                   device selection must too)
# 10 used  (C,)     bool slot occupancy
# 11 pc_su (n,)     pseudocost up-gain sums
# 12 pc_cu (n,)     pseudocost up counts
# 13 pc_sd (n,)     pseudocost down-gain sums
# 14 pc_cd (n,)     pseudocost down counts
# 15 best_val ()    best device-accepted candidate value
# 16 best_x  (n,)   its point
# 17 scal  (8,)     [unres_lb, unres_cnt, processed, created,
#                    pruned_bound, pruned_infeas, closed_opt, iters]


class DevicePoolRunner:
    """Owns the device pool + the jitted multiround program for one
    BranchAndBound instance.  Use via `run(t0)`: consumes nodes from
    `bab.tm`, executes device-resident rounds until a stop condition or
    exhaustion, pushes any remainder back into `bab.tm`."""

    def __init__(self, bab, cap: int, batch: int, rounds: int):
        import jax
        self.bab = bab
        self.sp = bab.sp
        self.C = int(cap)
        self.B = int(batch)
        self.T = int(rounds)
        n, m = self.sp.n, self.sp.m
        self._n, self._m = n, m
        # summary layout: 12 scalars + best_x (n) + heur_x (n) + 4 pc (n)
        self._nsum = 12 + 6 * n
        self._multiround, self._pack_pool = self._build()
        self._state = None
        self._log = bab._log

    # ------------------------------------------------------------ build
    def _build(self):
        import jax
        import jax.numpy as jnp

        bab, sp = self.bab, self.sp
        n, m, C, B, T = sp.n, sp.m, self.C, self.B, self.T
        step_one = build_node_step_unjitted(sp, bab._step_opts)
        int_tol = float(bab._int_tol)
        abs_tol = float(bab._abs_tol)
        rel_tol = float(bab._rel_tol)
        # device acceptance is 2x stricter than the host test
        # (Problem.is_feasible with atol=max(feasAbs,1e-5)) so a device-
        # accepted point can never fail host verification at sync
        a_feas = 0.5 * max(bab._feas_atol, 1e-5)
        r_feas = 0.5 * max(bab._feas_rtol, 1e-5)
        frac_w = float(bab.env.options.get("br_frac_weight"))
        use_rel = bab._brancher in ("rel", "strong")
        rc_fix = bool(bab._is_lp_relax)
        int_mask = jnp.asarray(sp.int_mask)
        iota_n = jnp.arange(n)
        cvec = jnp.asarray(sp.c)
        Qsym = None
        if sp.Qobj is not None:
            Qs = 0.5 * (sp.Qobj + sp.Qobj.T)
            Qsym = jnp.asarray(Qs)
        obj_const = float(sp.obj_const)
        # dive-mode threshold: above half occupancy, deepest-first
        # selection (children replace parents; dives close leaves), so
        # the pool stabilizes instead of marching into a congestion
        # drain — each drain/refill cycle moves ~2C(3n+m) doubles
        # through the ~20-45 MB/s tunnel (seconds each)
        dive_hi = int(0.50 * C)

        INF = jnp.inf

        def eval_obj(xr):
            v = cvec @ xr + obj_const
            if Qsym is not None:
                v = v + xr @ (Qsym @ xr)
            return v

        def one_round(A, clb, cub, cutoff_host, st, devrisk, hval, hx):
            (vlb, vub, wx, wy, lb, depth, bvar, bdir, bfrac, pit, used,
             pc_su, pc_cu, pc_sd, pc_cd, best_val, best_x, scal) = st
            unres_lb = scal[0]
            cut_cand = best_val - jnp.minimum(abs_tol,
                                              jnp.abs(best_val) * rel_tol)
            cutoff = jnp.minimum(cutoff_host, cut_cand)

            # ---- bulk prune against the freshest cutoff (the host tree
            # analogue is tm.prune_by_cutoff; here it also retires slots
            # cheaply before they cost a solve)
            kill = used & (lb >= cutoff)
            # prunes that relied on the unverified candidate cutoff
            risk0 = jnp.where(kill & (lb < cutoff_host), lb, INF).min()
            devrisk = jnp.minimum(devrisk, risk0)
            n_bulk = kill.sum()
            used = used & ~kill

            # ---- selection: best-then-dive (the host tree's BthenD key
            # (lb, -depth) — best bound first, DEEPER as tie-break so
            # just-created sibling children batch together with their
            # shared warm starts; an easy-first pred_iters policy was
            # measured 2.5x WORSE on the v5e, see tree.py::pop_batch).
            # Under pool pressure switch to pure deepest-first (dives
            # close leaves and shrink the pool).
            occ = used.sum()
            bias = 1.5e-6 * (1.0 + jnp.abs(lb))
            key_best = jnp.where(used, lb - bias * depth, INF)
            key_dive = jnp.where(used, -depth, INF)
            key = jnp.where(occ > dive_hi, key_dive, key_best)
            # approx_max_k: the TPU-native partial reduction — exact
            # top_k/argsort lower to FULL sorts (tens of ms per round on
            # this overhead-bound part, measured r5: C=16384 pools ran
            # 0.52 s/round vs 0.235 host batches with rebalances=0).
            # Approximation is harmless here: any USED slot is valid to
            # process (priority is a heuristic), and `act` masks the
            # rest.
            # f32 keys: the PartialReduce custom call has no X64
            # rewriting; priority is a heuristic, so f32 rounding of the
            # key is harmless (bounds themselves stay f64 everywhere)
            _, idx = jax.lax.approx_max_k(
                jnp.nan_to_num((-key).astype(jnp.float32),
                               neginf=-3e38, posinf=3e38),
                B, recall_target=0.95)
            act = used[idx]
            # inactive lanes get a trivial fixed box (solves in O(1)
            # iterations; all their effects are masked)
            g = lambda P: jnp.where(act[:, None], P[idx], 0.0)
            vlb_s, vub_s = g(vlb), g(vub)
            x0_s = jnp.where(act[:, None], wx[idx], 0.0)
            y0_s = jnp.where(act[:, None], wy[idx], 0.0)
            plb = jnp.where(act, lb[idx], 0.0)
            pdep = jnp.where(act, depth[idx], 0.0)
            pbv = jnp.where(act, bvar[idx], -1)
            pbd = jnp.where(act, bdir[idx], 0)
            pbf = jnp.where(act, bfrac[idx], 0.0)

            res = jax.vmap(step_one,
                           in_axes=(None, None, None, 0, 0, 0, 0))(
                A, clb, cub, vlb_s, vub_s, x0_s, y0_s)
            used = used.at[idx].set(False)

            db = res.dual_bound
            node_bound = jnp.maximum(plb, jnp.where(db > -INF, db, plb))
            nvlb, nvub = res.new_vlb, res.new_vub
            xs, ys = res.x, res.y
            status = res.status

            # ---- pseudocost update from the observed parent->child gain
            # (bnb.py _process_result lines; sums/counts so that
            # pc = sum/count equals the host's running average)
            pc_ok = act & (pbv >= 0) & (plb > -INF) & \
                (node_bound > plb) & (pbf > 1e-9)
            gains = jnp.where(pc_ok, (node_bound - plb) /
                              jnp.maximum(pbf, 1e-12), 0.0)
            jsafe = jnp.maximum(pbv, 0)
            up_m = pc_ok & (pbd == 1)
            dn_m = pc_ok & (pbd == 0)
            pc_su = pc_su.at[jsafe].add(jnp.where(up_m, gains, 0.0))
            pc_cu = pc_cu.at[jsafe].add(jnp.where(up_m, 1.0, 0.0))
            pc_sd = pc_sd.at[jsafe].add(jnp.where(dn_m, gains, 0.0))
            pc_cd = pc_cd.at[jsafe].add(jnp.where(dn_m, 1.0, 0.0))

            # ---- prune decisions (certified bounds only; mirrors
            # _process_result for the certified-db class)
            p_inf = act & ((status == int(EngineStatus.SOLVED_INFEASIBLE))
                           | (node_bound >= 1e15))
            p_bnd = act & ~p_inf & (node_bound >= cutoff)
            risk1 = jnp.where(p_bnd & (node_bound < cutoff_host),
                              node_bound, INF).min()
            devrisk = jnp.minimum(devrisk, risk1)
            live = act & ~p_inf & ~p_bnd

            # ---- incumbent candidates: integral + converged-ish +
            # device-feasible under the stricter tolerance
            int_ok = live & res.int_feasible & (
                (status == int(EngineStatus.SOLVED_OPTIMAL)) |
                (status == int(EngineStatus.ITERATION_LIMIT)))
            xr = jnp.clip(xs, nvlb, nvub)
            xr = jnp.where(int_mask[None, :], jnp.round(xr), xr)
            ax = xr @ A.T                                   # (B, m)
            rtol_lo = a_feas + r_feas * jnp.abs(clb)
            rtol_hi = a_feas + r_feas * jnp.abs(cub)
            rows_ok = jnp.all(
                (ax >= clb[None, :] - rtol_lo[None, :]) &
                (ax <= cub[None, :] + rtol_hi[None, :]), axis=1)
            box_ok = jnp.all((xr >= nvlb - a_feas) &
                             (xr <= nvub + a_feas), axis=1)
            vals = jax.vmap(eval_obj)(xr)
            accept = int_ok & rows_ok & box_ok & jnp.isfinite(vals)
            supported = (status == int(EngineStatus.SOLVED_OPTIMAL)) | \
                (node_bound >= vals - 1e-4 * (1.0 + jnp.abs(vals))) | \
                (res.kkt_err <= 1e-5)
            closed = accept & supported
            unres_new = (live & res.int_feasible & ~accept) | \
                (accept & ~supported) | \
                (live & ~res.int_feasible & (res.branch_var < 0))
            unres_lb = jnp.minimum(
                unres_lb, jnp.where(unres_new, node_bound, INF).min())
            devrisk = jnp.minimum(
                devrisk, jnp.where(closed, node_bound, INF).min())
            # best candidate this round -> pool-level best
            cand_vals = jnp.where(accept, vals, INF)
            bi = jnp.argmin(cand_vals)
            better = cand_vals[bi] < best_val
            best_x = jnp.where(better, xr[bi], best_x)
            best_val = jnp.where(better, cand_vals[bi], best_val)

            branch = live & ~accept & ~unres_new & (res.branch_var >= 0)

            # ---- reduced-cost bound tightening (RCHandler.cpp rc_fix;
            # LP-certified lanes only, identical to bnb.py::_rc_fix)
            if rc_fix:
                r = cvec[None, :] + ys @ A
                gap = cutoff - node_bound
                okl = (status == int(EngineStatus.SOLVED_OPTIMAL)) & \
                    jnp.isfinite(gap) & (gap >= 0)
                at_lo = jnp.abs(xs - nvlb) <= 1e-7 * (1 + jnp.abs(nvlb))
                at_hi = jnp.abs(nvub - xs) <= 1e-7 * (1 + jnp.abs(nvub))
                max_up = jnp.where((r > 1e-9) & at_lo & okl[:, None],
                                   nvlb + gap[:, None] /
                                   jnp.where(r > 1e-9, r, 1.0), INF)
                max_dn = jnp.where((r < -1e-9) & at_hi & okl[:, None],
                                   nvub + gap[:, None] /
                                   jnp.where(r < -1e-9, r, 1.0), -INF)
                max_up = jnp.where(int_mask[None, :],
                                   jnp.floor(max_up + int_tol), max_up)
                max_dn = jnp.where(int_mask[None, :],
                                   jnp.ceil(max_dn - int_tol), max_dn)
                nvub = jnp.minimum(nvub, max_up)
                nvlb = jnp.maximum(nvlb, max_dn)

            # ---- branch variable: pseudocost product rule (the host
            # 'rel' brancher) on device pc arrays, else the step's
            # most-fractional candidate
            bv_dev = res.branch_var
            if use_rel:
                fr = jnp.where((res.frac > int_tol) &
                               (nvub - nvlb > 1e-9), res.frac, 0.0)
                cand_m = fr > 0.0
                obs_u = pc_cu > 0
                obs_d = pc_cd > 0
                avg_u = pc_su / jnp.maximum(pc_cu, 1.0)
                avg_d = pc_sd / jnp.maximum(pc_cd, 1.0)
                mu_u = jnp.where(obs_u.any(),
                                 jnp.where(obs_u, avg_u, 0.0).sum() /
                                 jnp.maximum(obs_u.sum(), 1), 1.0)
                mu_d = jnp.where(obs_d.any(),
                                 jnp.where(obs_d, avg_d, 0.0).sum() /
                                 jnp.maximum(obs_d.sum(), 1), 1.0)
                pu = jnp.where(obs_u, avg_u, mu_u)[None, :]
                pd = jnp.where(obs_d, avg_d, mu_d)[None, :]
                f = xs - jnp.floor(xs)
                score = jnp.maximum(pd * f, 1e-8) * \
                    jnp.maximum(pu * (1.0 - f), 1e-8)
                if frac_w > 0:
                    fr2 = jnp.minimum(f, 1.0 - f)
                    smax = jnp.maximum(
                        jnp.where(cand_m, score, -INF).max(
                            axis=1, keepdims=True), 1e-12)
                    fmax = jnp.maximum(
                        jnp.where(cand_m, fr2, -INF).max(
                            axis=1, keepdims=True), 1e-12)
                    score = (1.0 - frac_w) * score / smax + \
                        frac_w * fr2 / fmax
                score = jnp.where(cand_m, score, -INF)
                j_rel = jnp.argmax(score, axis=1).astype(jnp.int32)
                multi = cand_m.sum(axis=1) > 1
                bv_dev = jnp.where(multi, j_rel, bv_dev)
            bv = jnp.maximum(bv_dev, 0)
            bval = jnp.take_along_axis(xs, bv[:, None], axis=1)[:, 0]
            blo_b = jnp.take_along_axis(nvlb, bv[:, None], axis=1)[:, 0]
            bhi_b = jnp.take_along_axis(nvub, bv[:, None], axis=1)[:, 0]
            lo = jnp.floor(bval + int_tol)
            lo = jnp.maximum(lo, jnp.where(jnp.isfinite(blo_b),
                                           jnp.ceil(blo_b - 1e-9), lo))
            lo = jnp.minimum(lo, jnp.where(jnp.isfinite(bhi_b),
                                           jnp.floor(bhi_b + 1e-9) - 1,
                                           lo))
            onehot = iota_n[None, :] == bv[:, None]
            dn_vub = jnp.where(onehot, lo[:, None], nvub)
            up_vlb = jnp.where(onehot, lo[:, None] + 1.0, nvlb)
            f_dn = jnp.maximum(bval - lo, 0.0)
            f_up = jnp.maximum(lo + 1.0 - bval, 0.0)

            # ---- insert children: flatten (2B) lane-major, route valid
            # children to the first free slots (invalid ones to index C,
            # which jax scatter drops)
            c_vlb = jnp.stack([nvlb, up_vlb], axis=1).reshape(2 * B, n)
            c_vub = jnp.stack([dn_vub, nvub], axis=1).reshape(2 * B, n)
            c_wx = jnp.repeat(xs, 2, axis=0)
            c_wy = jnp.repeat(ys, 2, axis=0)
            c_lb = jnp.repeat(node_bound, 2)
            c_dep = jnp.repeat(pdep, 2) + 1.0
            c_bv = jnp.repeat(bv, 2)
            c_bd = jnp.tile(jnp.asarray([0, 1], dtype=jnp.int32), B)
            c_bf = jnp.stack([f_dn, f_up], axis=1).reshape(2 * B)
            valid = jnp.repeat(branch, 2)
            # sort-free free-slot routing: rank free slots by prefix sum
            # and scatter-invert the first 2B ranks (argsort over C is a
            # full device sort; this is O(C) elementwise + one scatter)
            free_mask = ~used
            frank = jnp.cumsum(free_mask) - 1
            tgt = jnp.where(free_mask & (frank < 2 * B), frank, 2 * B)
            slot_of_rank = jnp.full(2 * B + 1, C, dtype=tgt.dtype
                                    ).at[tgt].set(jnp.arange(C))[:2 * B]
            rank = jnp.cumsum(valid) - 1
            slot = jnp.where(valid,
                             slot_of_rank[jnp.clip(rank, 0, 2 * B - 1)],
                             C)
            vlb = vlb.at[slot].set(c_vlb)
            vub = vub.at[slot].set(c_vub)
            wx = wx.at[slot].set(c_wx)
            wy = wy.at[slot].set(c_wy)
            lb = lb.at[slot].set(c_lb)
            depth = depth.at[slot].set(c_dep)
            bvar = bvar.at[slot].set(c_bv)
            bdir = bdir.at[slot].set(c_bd)
            bfrac = bfrac.at[slot].set(c_bf)
            pit = pit.at[slot].set(jnp.repeat(
                res.iters.astype(jnp.float64), 2))
            used = used.at[slot].set(True)

            scal = scal.at[0].set(unres_lb)
            scal = scal.at[1].add(unres_new.sum())
            scal = scal.at[2].add(act.sum())
            scal = scal.at[3].add(2.0 * branch.sum())
            scal = scal.at[4].add(p_bnd.sum() + n_bulk)
            scal = scal.at[5].add(p_inf.sum())
            scal = scal.at[6].add(closed.sum())
            scal = scal.at[7].add(jnp.where(act, res.iters, 0).sum())
            st = (vlb, vub, wx, wy, lb, depth, bvar, bdir, bfrac, pit,
                  used, pc_su, pc_cu, pc_sd, pc_cd, best_val, best_x,
                  scal)
            # best finite relaxation point ACROSS the call's rounds
            # (host-side rounding heuristics at sync)
            rv = jnp.where(act & jnp.all(jnp.isfinite(xs), axis=1) &
                           (status != int(
                               EngineStatus.SOLVED_INFEASIBLE)),
                           res.obj, INF)
            bi2 = jnp.argmin(rv)
            hbetter = rv[bi2] < hval
            hx = jnp.where(hbetter, xs[bi2], hx)
            hval = jnp.where(hbetter, rv[bi2], hval)
            return st, devrisk, hval, hx

        import functools

        @functools.partial(jax.jit, donate_argnums=(3,))
        def multiround(A, clb, cub, state, cutoff_host):
            # per-call counters: the scal block accumulates WITHIN one
            # multiround call and the host adds the deltas at each sync
            # (carrying totals across calls double-counted every sync)
            state = state[:17] + (
                state[17].at[1:].set(0.0).at[0].set(jnp.inf),)

            def cond(carry):
                st, r, devrisk, hval, hx = carry
                used = st[10]
                free = C - used.sum()
                return (r < T) & used.any() & (free >= 2 * B)

            def body(carry):
                st, r, devrisk, hval, hx = carry
                st, devrisk, hval, hx = one_round(
                    A, clb, cub, cutoff_host, st, devrisk, hval, hx)
                return st, r + 1, devrisk, hval, hx

            hx0 = jnp.zeros(n)
            st, rounds, devrisk, _hval, hx = jax.lax.while_loop(
                cond, body, (state, jnp.asarray(0), jnp.asarray(INF),
                             jnp.asarray(INF), hx0))
            used = st[10]
            lbmin = jnp.where(used, st[4], INF).min()
            summary = jnp.concatenate([
                jnp.stack([
                    rounds.astype(jnp.float64),
                    used.sum().astype(jnp.float64),
                    lbmin, st[15], devrisk,
                    st[17][0], st[17][1], st[17][2], st[17][3],
                    st[17][4], st[17][5], st[17][7]]),
                st[16], hx, st[11], st[12], st[13], st[14]])
            return st, summary

        @jax.jit
        def pack_pool(state):
            (vlb, vub, wx, wy, lb, depth, bvar, bdir, bfrac, pit, used,
             *_rest) = state
            cols = [vlb, vub, wx, wy, lb[:, None], depth[:, None],
                    bvar.astype(jnp.float64)[:, None],
                    bdir.astype(jnp.float64)[:, None], bfrac[:, None],
                    pit[:, None], used.astype(jnp.float64)[:, None]]
            return jnp.concatenate(cols, axis=1)

        return multiround, pack_pool

    # ------------------------------------------------------- host driver
    def _init_state(self, nodes: List[Node]):
        import jax.numpy as jnp
        bab, sp = self.bab, self.sp
        n, m, C = self._n, self._m, self.C
        k = min(len(nodes), C)
        vlb = np.zeros((C, n))
        vub = np.zeros((C, n))
        wx = np.zeros((C, n))
        wy = np.zeros((C, m))
        lb = np.full(C, _INF)
        depth = np.zeros(C)
        bvar = np.full(C, -1, dtype=np.int32)
        bdir = np.zeros(C, dtype=np.int32)
        bfrac = np.zeros(C)
        pit = np.zeros(C)
        used = np.zeros(C, dtype=bool)
        cold = bab._lane_starts(nodes[:k])
        cold_y = bab._lane_duals(nodes[:k])
        for i, nd in enumerate(nodes[:k]):
            vlb[i] = nd.vlb
            vub[i] = nd.vub
            wx[i] = cold[i]
            wy[i] = cold_y[i]
            lb[i] = nd.lb
            depth[i] = nd.depth
            bvar[i] = nd.branch_var
            bdir[i] = 1 if nd.branch_dir else 0
            bfrac[i] = nd.branch_frac
            pit[i] = float(nd.pred_iters)
            used[i] = True
        pc_su = bab._pc_up * np.maximum(bab._pc_up_cnt, 0)
        pc_cu = bab._pc_up_cnt.astype(np.float64)
        pc_sd = bab._pc_down * np.maximum(bab._pc_down_cnt, 0)
        pc_cd = bab._pc_down_cnt.astype(np.float64)
        scal = np.array([_INF, 0, 0, 0, 0, 0, 0, 0], dtype=np.float64)
        return tuple(jnp.asarray(a) for a in (
            vlb, vub, wx, wy, lb, depth, bvar, bdir, bfrac, pit, used,
            pc_su, pc_cu, pc_sd, pc_cd,
            np.float64(_INF), np.zeros(n), scal))

    def _drain_to_host(self, state, keep: int = 0):
        """Fetch the pool (ONE transfer) and move all but the best
        `keep` nodes into the host tree.  Returns the kept nodes."""
        bab = self.bab
        n, m = self._n, self._m
        arr = np.asarray(self._pack_pool(state))
        o = 0
        vlb = arr[:, o:o + n]; o += n
        vub = arr[:, o:o + n]; o += n
        wx = arr[:, o:o + n]; o += n
        wy = arr[:, o:o + m]; o += m
        lb = arr[:, o]; depth = arr[:, o + 1]
        bvar = arr[:, o + 2].astype(np.int32)
        bdir = arr[:, o + 3].astype(np.int32)
        bfrac = arr[:, o + 4]
        pit = arr[:, o + 5]
        used = arr[:, o + 6] > 0.5
        idx = np.where(used)[0]
        idx = idx[np.argsort(lb[idx])]
        nid0 = max((nd.nid for nd in bab.tm.iter_nodes()), default=0) + 1
        nodes = []
        for rank, i in enumerate(idx):
            nd = Node(nid=nid0 + rank, depth=int(depth[i]),
                      lb=float(lb[i]), vlb=vlb[i].copy(),
                      vub=vub[i].copy(), warm_x=wx[i].copy(),
                      warm_y=wy[i].copy(), branch_var=int(bvar[i]),
                      branch_dir=int(bdir[i]),
                      branch_frac=float(bfrac[i]),
                      pred_iters=int(pit[i]))
            nodes.append(nd)
        kept = nodes[:keep]
        for nd in nodes[keep:]:
            bab.tm.insert_candidate(nd)
        return kept

    def run(self, t0: float) -> None:
        """Main device-resident loop; returns when the search is done or
        a stop/congestion condition hands control back to the host.

        The loop keeps TWO multiround calls in flight (dispatch k+1 is
        enqueued before summary k is fetched), so the summary's d2h
        latency and all host bookkeeping overlap device execution — the
        same overlap trick as the host driver's bnb_pipeline.  The
        cutoff a dispatch carries is stale by <=2 syncs, which is sound
        (cutoffs only ever tighten; the in-device candidate cutoff
        covers fresh incumbents immediately)."""
        bab = self.bab
        C, B, T = self.C, self.B, self.T
        A, clb, cub = bab._device_consts()
        # fill the pool with the best nodes (migration, not processing)
        nodes = bab.tm.pop_best_nodes(C // 2)
        if not nodes:
            return
        state = self._init_state(nodes)
        self._t_sync = time.monotonic()
        pend = None
        while True:
            t_d0 = time.monotonic()
            state, summ_dev = self._multiround(
                A, clb, cub, state, np.float64(bab._cutoff()))
            info = None
            if pend is not None:
                info = self._process_summary(np.asarray(pend[0]), t0,
                                             pend[1])
            pend = (summ_dev, t_d0)
            if info is None:
                continue                    # fill the 2-deep pipeline
            stop = bab._should_stop(t0)
            congested = info["rounds"] < T and \
                C - info["pool_used"] < 2 * B
            if stop is None and info["pool_used"] > 0 and not congested:
                continue
            # terminal-ish condition: flush the in-flight call, re-check
            info = self._process_summary(np.asarray(pend[0]), t0,
                                         pend[1])
            pend = None
            stop = bab._should_stop(t0)
            if stop is not None:
                bab.status = stop
                self._drain_to_host(state)
                return
            if info["pool_used"] == 0:
                if len(bab.tm):
                    nodes = bab.tm.pop_best_nodes(C // 2)
                    state = self._init_state(nodes)
                    continue
                return                      # search exhausted
            if info["rounds"] < T and C - info["pool_used"] < 2 * B:
                # congestion: spill the worst half to the host tree and
                # keep diving on the best half
                kept = self._drain_to_host(state, keep=C // 2)
                bab.stats.rebalances += 1
                if not kept:
                    return
                state = self._init_state(kept)

    def _process_summary(self, summ: np.ndarray, t0: float,
                         t_disp: float) -> dict:
        """All host bookkeeping for one multiround summary: stats,
        pseudocost sync, incumbent verification, rounding heuristic,
        global lb, progress log."""
        bab = self.bab
        n = self._n
        bab.stats.t_device += time.monotonic() - t_disp
        t_h0 = time.monotonic()
        (rounds, pool_used, pool_lb, best_val, devrisk, unres_lb,
         unres_cnt, processed, created, pr_bnd, pr_inf,
         iters) = summ[:12]
        best_x = summ[12:12 + n]
        heur_x = summ[12 + n:12 + 2 * n]
        o = 12 + 2 * n
        pc_su = summ[o:o + n]
        pc_cu = summ[o + n:o + 2 * n]
        pc_sd = summ[o + 2 * n:o + 3 * n]
        pc_cd = summ[o + 3 * n:o + 4 * n]
        bab.stats.batches += 1
        bab.stats.solves += int(processed)
        bab.stats.ipm_iters += int(iters)
        bab.tm.nodes_processed += int(processed)
        bab.tm.nodes_created += int(created)
        bab.stats.nodes_processed = bab.tm.nodes_processed
        bab.stats.nodes_created = bab.tm.nodes_created
        bab.stats.unresolved += int(unres_cnt)
        bab.unresolved_lb = min(bab.unresolved_lb, float(unres_lb))
        # host pc arrays track the device values (avg = sum/count)
        with np.errstate(invalid="ignore"):
            bab._pc_up = np.where(pc_cu > 0, pc_su /
                                  np.maximum(pc_cu, 1), 0.0)
            bab._pc_down = np.where(pc_cd > 0, pc_sd /
                                    np.maximum(pc_cd, 1), 0.0)
        bab._pc_up_cnt = pc_cu.astype(np.int64)
        bab._pc_down_cnt = pc_cd.astype(np.int64)
        # candidate verification on the TRUE problem (sync boundary)
        if np.isfinite(best_val) and best_val < bab.ub - 1e-12:
            xb = best_x[:bab.problem.n_vars]
            if bab.problem.is_feasible(
                    xb, atol=max(bab._feas_atol, 1e-5),
                    int_tol=bab._int_tol,
                    rtol=max(bab._feas_rtol, 1e-5)):
                bab._accept_incumbent(
                    xb.copy(), float(bab.problem.eval_objective(xb)))
            else:
                # cannot happen for staged-1:1 LP/QP models (device
                # test is 2x stricter); forfeit optimality soundly
                self._log.info(
                    "device incumbent REJECTED by host verification"
                    " — capping lb at devrisk (sound fallback)")
                bab.unresolved_lb = min(bab.unresolved_lb,
                                        float(devrisk))
        # host-side rounding on the best relaxation point of the call
        if bab.sp.int_mask.any() and np.all(np.isfinite(heur_x)):
            bab._try_round_incumbent(heur_x, bab.sp.vlb, bab.sp.vub)
        # global lb across pool + host tree + unresolved cap
        open_lb = min(float(pool_lb), bab.tm.best_lb(),
                      bab.unresolved_lb)
        bab.lb = min(open_lb, bab.ub)
        bab.stats.t_host += time.monotonic() - t_h0

        now = time.monotonic()
        if now - self._t_sync >= bab._log_interval:
            self._t_sync = now
            self._log.info(
                f"  {now - t0:8.1f}s  nodes "
                f"{bab.stats.nodes_processed:8d} "
                f"pool {int(pool_used):5d} open {len(bab.tm):6d}  "
                f"lb {bab.lb:.8g}  ub {bab.ub:.8g}  gap "
                f"{bab._gap() * 100:.4g}%  [device rounds "
                f"{int(rounds)}]")
        return dict(rounds=int(rounds), pool_used=int(pool_used))
