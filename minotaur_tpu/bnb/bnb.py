"""Branch-and-bound driver with batched node processing.

Reference: BranchAndBound::solve (BranchAndBound.cpp:355-526) — but where
the reference pops ONE node, replays its bound deltas, and solves one
relaxation, this driver pops up to `node_batch` nodes, stacks their bound
boxes, and runs the whole presolve+solve+analyze pipeline as a single
fused device call (bnb/step.py).  Pruning rules mirror
PCBProcessor::shouldPrune_ (PCBProcessor.cpp:400-523); stop tests mirror
BranchAndBound.cpp:274-296 (gap/time/node/sol limits).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import List, Optional

import numpy as np

from ..engines.ipm import IPMOptions
from ..engines.staging import StagedProblem, stage_problem
from ..ir.problem import Problem
from ..utils.environment import Environment
from ..utils.types import EngineStatus, LogLevel, NodeStatus, SolveStatus, \
    TreeSearchOrder
from .node import Node
from .step import StepOptions, build_node_step
from .tree import TreeManager

_INF = float("inf")


@dataclasses.dataclass
class BabStats:
    """(reference: BabStats, BranchAndBound.h:236)"""
    nodes_processed: int = 0
    nodes_created: int = 0
    batches: int = 0
    solves: int = 0
    sols_found: int = 0
    unresolved: int = 0
    time: float = 0.0
    # phase breakdown: device+transfer wall vs host bookkeeping wall
    t_device: float = 0.0
    t_host: float = 0.0
    # distributed: global load-balance rounds (reference: "times balanced"
    # per-rank report, MpiBranchAndBound.cpp:408-436)
    rebalances: int = 0
    nodes_migrated: int = 0
    # total IPM iterations across all lanes (each = one batched KKT
    # factorization + its direction solves) — feeds the BASELINE.json
    # "KKT solves/sec/chip" metric reported by bench.py
    ipm_iters: int = 0
    # strong-branch probe lanes processed (reliability branching)
    probes: int = 0


class BranchAndBound:
    def __init__(self, problem: Problem, env: Optional[Environment] = None,
                 staged: Optional[StagedProblem] = None):
        self.env = env or Environment()
        self.problem_original = problem
        self.postsolve = None
        opts = self.env.options
        if staged is None and opts.get("presolve_subst"):
            # root substitution/elimination presolve (reference:
            # LinearHandler::substVars_ LinearHandler.cpp:1429 +
            # Presolver::getPostSol :288) — runs ONCE before staging, so
            # the eliminated columns shrink every device program and can
            # never trigger a recompile
            from .substitute import substitute_problem
            red = substitute_problem(
                problem, int_tol=float(opts.get("int_tol")))
            if red is not None:
                problem, self.postsolve = red
                self.env.logger.info(
                    f"presolve: substitution eliminated "
                    f"{self.postsolve.n_eliminated} columns "
                    f"(n {self.postsolve.n_orig} -> {problem.n_vars}); "
                    f"postsolve map recorded")
        self.problem = problem
        if staged is None and opts.get("nl_presolve"):
            # structure-rewriting nonlinear presolve (must run BEFORE
            # staging): big-M sum-of-squares rows tighten to their
            # second-order-cone form (reference NlPresHandler::
            # quadConeRef_, NlPresHandler.cpp:1135)
            from .nlpres import quad_cone_reform
            ncr = quad_cone_reform(problem, int_tol=float(
                opts.get("int_tol")) if opts.get("int_tol") else 1e-6)
            if ncr:
                self.env.logger.info(
                    f"presolve: {ncr} big-M sum-of-squares rows "
                    f"reformulated to cone form (quadConeRef)")
            if opts.get("persp_ref"):
                from .persp import perspective_reform
                npr = perspective_reform(problem)
                if npr:
                    self.env.logger.info(
                        f"presolve: {npr} on/off rows perspective-"
                        f"reformulated (perspRef)")
        self.sp = staged or stage_problem(problem)
        order = {"dfs": TreeSearchOrder.DFS, "bfs": TreeSearchOrder.BFS,
                 "BthenD": TreeSearchOrder.BEST_THEN_DIVE}.get(
                     opts.get("tree_search"), TreeSearchOrder.BEST_THEN_DIVE)
        vbc = None
        if opts.get("vbc_file"):
            vbc = open(opts.get("vbc_file"), "w")
        self.tm = self._make_tree(order, vbc)
        self.stats = BabStats()
        self.ub = _INF                      # best incumbent value
        self.best_x: Optional[np.ndarray] = None
        self.lb = -_INF                     # global lower bound
        self.unresolved_lb = _INF           # cap from unresolved leaves
        self.status = SolveStatus.NOT_STARTED
        self._abs_tol = float(opts.get("solAbs_tol"))
        self._rel_tol = float(opts.get("solRel_tol"))
        self._int_tol = float(opts.get("int_tol"))
        self._feas_atol = max(float(opts.get("feasAbs_tol")), 1e-6)
        self._feas_rtol = max(float(opts.get("feasRel_tol")), 1e-6)
        self._obj_gap_pct = float(opts.get("obj_gap_percent"))
        self._eval_within = bool(opts.get("eval_within_bnds"))
        self._node_limit = int(opts.get("bnb_node_limit"))
        self._time_limit = float(opts.get("bnb_time_limit"))
        self._sol_limit = int(opts.get("bnb_sol_limit"))
        self._log_interval = float(opts.get("bnb_log_interval"))
        self._batch = max(1, int(opts.get("node_batch")))
        # reference CLI parity: `threads` sets the parallel width, which
        # on TPU is the node-batch axis (only when node_batch untouched)
        if int(opts.get("threads")) > 0 and \
                not opts.find("node_batch").was_set:
            self._batch = max(1, int(opts.get("threads")))
        self._pad_full = bool(opts.get("pad_full"))
        # dtype policy -> IPM factorization/iteration dtypes: "mixed"
        # (default) = f32 factorizations + f64 block corrections;
        # "f32" = all-f32 iteration arithmetic (light phase, f32 tail
        # corrections); "f64" = full f64 factorizations (slow on TPU,
        # for accuracy triage)
        dt = str(opts.get("dtype"))
        dt_kw = {}
        if dt == "f64":
            dt_kw = dict(factor_f32=False, tail_factor_f32=False)
        elif dt == "f32":
            dt_kw = dict(light_phase1=True, tail_corr_f32=True)
        step_opts = StepOptions(
            int_tol=self._int_tol,
            fbbt_rounds=int(opts.get("fbbt_rounds")) if opts.get("nl_presolve") else 0,
            ipm=IPMOptions(max_iters=int(opts.get("ipm_max_iters")),
                           tol=float(opts.get("ipm_tol")),
                           use_pallas=bool(opts.get("ipm_use_pallas")),
                           chol_retry=bool(opts.get("ipm_chol_retry")),
                           tail_kkt_rounds=int(
                               opts.get("ipm_tail_kkt_rounds")),
                           refine_steps=int(opts.get("ipm_refine_steps")),
                           affine_kkt_rounds=int(
                               opts.get("ipm_affine_kkt_rounds")),
                           **dt_kw))
        self._step = build_node_step(self.sp, step_opts)
        self._step_opts = step_opts
        # QPD node processor (reference QPDProcessor.{h,cpp}, 2136 LoC):
        # nodes are processed on a PSD-projected QP model of the MINLP
        # (one batched QP superstep instead of NLP solves); prune and
        # incumbent decisions are VERIFIED on the true model
        # (_qpd_verify).  FBBT inside the QP step is disabled — interval
        # tightening against LINEARIZED rows is not valid for the true
        # feasible set; verified lanes get true-model FBBT boxes.
        self._qpd_step = None
        self._qpd_dev = None
        self._qpd_verified = 0
        if str(opts.get("nodeproc")) == "qpd" and \
                (len(self.sp.nl_rows) or self.sp.obj_nl is not None):
            from .qpd import build_qp_approx
            xr = 0.5 * (np.where(np.isfinite(self.sp.vlb),
                                 self.sp.vlb, -1.0) +
                        np.where(np.isfinite(self.sp.vub),
                                 self.sp.vub, 1.0))
            self.sp_qp = build_qp_approx(self.sp, xr)
            self._qpd_step = build_node_step(
                self.sp_qp, dataclasses.replace(step_opts, fbbt_rounds=0))
        self._is_lp_relax = self.sp.is_lp_relaxable
        # PSD-QP relaxations also get certified dual bounds from the
        # engine (eigendecomposition-based; engines/ipm.py qp_cert_bound)
        self._certified_db = self._is_lp_relax
        if not self._certified_db and self.sp.Qobj is not None and \
                self.sp.obj_nl is None and not len(self.sp.nl_rows):
            w = np.linalg.eigvalsh(0.5 * (self.sp.Qobj + self.sp.Qobj.T))
            self._certified_db = bool(w.min() >= -1e-9)
        self._log = self.env.logger
        # device-resident constants: shipping A through the device tunnel
        # every superstep costs more than the solve itself
        self._dev_consts: Optional[tuple] = None
        # pseudocosts (reference: ReliabilityBrancher pseudo-cost arrays,
        # ReliabilityBrancher.cpp:161-236; initialized from observed child
        # bound gains instead of serial strong-branch probes)
        self._brancher = str(opts.get("brancher"))
        nn = self.sp.n
        self._pc_up = np.zeros(nn)
        self._pc_down = np.zeros(nn)
        self._pc_up_cnt = np.zeros(nn, dtype=np.int64)
        self._pc_down_cnt = np.zeros(nn, dtype=np.int64)
        self._branch_freq = np.zeros(nn, dtype=np.int64)
        # best-k solution pool (reference: SolutionPool.h:40-89)
        from .solpool import SolutionPool
        self.sol_pool = SolutionPool(int(opts.get("sol_pool_size")))
        self._rng_branch = np.random.default_rng(
            int(opts.get("rand_seed")) + 17)
        # in-tree reliability branching (reference: ReliabilityBrancher::
        # strongBranch_ solves every unreliable candidate with an
        # iteration-limited warm engine, ReliabilityBrancher.cpp:161-236,
        # 469).  TPU translation: probe boxes RIDE ALONG in the padding
        # slots of the next superstep (pad_full pads to a fixed bucket
        # anyway, so probes are nearly free), and their certified dual
        # bounds feed the pseudocosts.  strbr_lane_limit bounds the probe
        # *queue* drained per superstep (cost bounding — per-lane engine
        # iteration caps buy nothing when the vmapped loop runs at the
        # slowest node lane's count anyway).  The old strbr_iter_limit
        # key is honoured as a deprecated alias when the new one is
        # untouched, so configs tuned for the reference keep working.
        # device-resident multi-round supersteps (bnb/device_pool.py):
        # eligible only for the certified-bound class on the TRUE staged
        # model (no auxiliary columns, no nonlinear rows — the in-device
        # incumbent feasibility test must equal the host's), with the
        # plain node processor and no SOS branching
        self._dev_pool = None
        self._dev_pool_ok = (
            bool(opts.get("device_tree")) and
            type(self) is BranchAndBound and
            self._qpd_step is None and
            (self._is_lp_relax or self._certified_db) and
            self.sp.obj_nl is None and not len(self.sp.nl_rows) and
            self.sp.n == problem.n_vars and
            bool(self.sp.int_mask.any()) and
            not problem._sos1 and not problem._sos2 and
            not opts.get("checkpoint_file") and
            # exact strong branching needs the host probe superstep
            str(opts.get("brancher")) != "strong")
        self._dev_warm_batches = max(1, int(opts.get(
            "device_warm_batches")))
        self._rel_thresh = max(0, int(opts.get("rel_thresh")))
        _lane_opt = opts.find("strbr_lane_limit")
        if _lane_opt is not None and not _lane_opt.was_set:
            self._strbr_limit = max(0, int(opts.get("strbr_iter_limit")))
        else:
            self._strbr_limit = max(0, int(opts.get("strbr_lane_limit")))
        self._probe_queue: List[tuple] = []
        self._probe_pending = {}  # (j, side) -> queued count

    # ------------------------------------------------------------- bounds
    def _make_tree(self, order, vbc):
        """Active-node store: the C++ slab store when it builds (option
        `native_tree`, reference NodeHeap analogue), else the Python
        heap."""
        if self.env.options.get("native_tree"):
            try:
                from .tree import NativeTreeManager
                return NativeTreeManager(order, vbc_stream=vbc,
                                         n=self.sp.n, m=self.sp.m)
            except Exception as e:
                self.env.logger.debug(f"native treestore unavailable "
                                      f"({e}); using python heap")
        return TreeManager(order, vbc_stream=vbc)

    @property
    def best_x_original(self) -> Optional[np.ndarray]:
        """Incumbent lifted to the ORIGINAL variable space (postsolve
        replay of the substitution records; reference getPostSol)."""
        if self.best_x is None:
            return None
        if self.postsolve is None:
            return self.best_x
        return self.postsolve.lift(self.best_x)

    def _gap(self) -> float:
        if self.ub >= _INF:
            return _INF
        if self.lb <= -_INF:
            return _INF
        return (self.ub - self.lb) / max(abs(self.ub), 1e-10)

    def _should_stop(self, t0: float) -> Optional[SolveStatus]:
        if self._gap() <= self._rel_tol or \
           self._gap() * 100.0 <= self._obj_gap_pct or \
           (self.ub - self.lb) <= self._abs_tol:
            return SolveStatus.SOLVED_OPTIMAL
        if self.stats.nodes_processed >= self._node_limit:
            return SolveStatus.SOLVED_NODE_LIMIT
        if time.monotonic() - t0 > self._time_limit:
            return SolveStatus.SOLVED_TIME_LIMIT
        if self.stats.sols_found >= self._sol_limit:
            return SolveStatus.SOLVED_SOL_LIMIT
        return None

    def _cutoff(self) -> float:
        # prune nodes whose bound cannot improve the incumbent by > tol
        if self.ub >= _INF:
            return _INF
        return self.ub - min(self._abs_tol, abs(self.ub) * self._rel_tol)

    # ------------------------------------------------------------ solving
    def _root_presolve(self) -> Optional[SolveStatus]:
        """Root FBBT fixpoint + optional OBBT (reference: Presolver +
        postSolveRootNode OBBT hook)."""
        opts = self.env.options
        if not opts.get("presolve"):
            return None
        from .presolve import Presolver
        pre = Presolver(self.problem, self.sp,
                        max_iters=int(opts.get("max_presolve_iters")),
                        int_tol=self._int_tol)
        vlb, vub = self.sp.vlb.copy(), self.sp.vub.copy()
        lin = bool(opts.get("lin_presolve"))
        if lin:
            st, vlb, vub = pre.linear_presolve(vlb, vub)
            if st == SolveStatus.SOLVED_INFEASIBLE:
                self.status = SolveStatus.SOLVED_INFEASIBLE
                return self.status
        st, vlb, vub = pre.presolve(vlb, vub)
        if st == SolveStatus.SOLVED_INFEASIBLE:
            self.status = SolveStatus.SOLVED_INFEASIBLE
            return self.status
        if opts.get("nl_presolve"):
            # nonlinear-row coefficient improvement (reference
            # NlPresHandler::coeffImpr_): after FBBT so the interval
            # bounds feeding it are tight
            pre.nl_coef_improve(vlb, vub)
        if lin:
            st, vlb, vub = pre.linear_presolve(vlb, vub)
            if st == SolveStatus.SOLVED_INFEASIBLE:
                self.status = SolveStatus.SOLVED_INFEASIBLE
                return self.status
        if opts.get("obbt"):
            vlb, vub = pre.obbt(vlb, vub)
        self.sp.vlb[:] = vlb
        self.sp.vub[:] = vub
        s = pre.stats
        if s.bounds_tightened or s.obbt_tightened or s.dup_rows or \
                s.redundant_rows or s.coefs_improved or s.dual_fixed:
            self._log.info(
                f"presolve: {s.rounds} rounds, "
                f"{s.bounds_tightened} FBBT + {s.obbt_tightened} OBBT "
                f"bound changes, {s.dup_rows} dup rows, "
                f"{s.redundant_rows} redundant rows, "
                f"{s.coefs_improved} coefs improved, "
                f"{s.dual_fixed} dual-fixed")
        return None

    def solve(self) -> SolveStatus:
        t0 = time.monotonic()
        last_log = t0
        last_ckpt = t0
        opts = self.env.options
        ckpt_file = opts.get("checkpoint_file")
        ckpt_interval = float(opts.get("checkpoint_interval"))
        self.status = SolveStatus.STARTED
        resumed = False
        if ckpt_file and opts.get("resume"):
            import os
            if os.path.exists(ckpt_file):
                from .checkpoint import load_checkpoint
                load_checkpoint(ckpt_file, self)
                self._log.info(
                    f"resumed from {ckpt_file}: {len(self.tm)} open nodes, "
                    f"ub {self.ub:.8g}")
                resumed = True
        if not resumed and self._root_presolve() is not None:
            return self.status
        n = self.sp.n
        self._strong_branch_done = False
        if not resumed:
            root = Node(nid=0, depth=0, lb=getattr(self, "_root_lb0",
                                                   -_INF),
                        vlb=self.sp.vlb.copy(), vub=self.sp.vub.copy(),
                        warm_x=(self.problem.initial_point.copy()
                                if self.problem.initial_point is not None
                                else None))
            self.tm.insert_root(root)
        next_id = max((nd.nid for nd in self.tm.iter_nodes()),
                      default=-1) + 1

        # pipelined superstep loop: dispatch batch k+1 BEFORE processing
        # batch k's results, so host bookkeeping (tree ops, incumbents,
        # feasibility checks) overlaps device compute of the next batch.
        # Sound because the two batches hold DISJOINT nodes; the only
        # effect is one-batch-stale cutoffs/pseudocosts, and every prune
        # decision is re-made at processing time.  (reference analogue:
        # ParBranchAndBound::parsolveOppor's threads-grab-nodes overlap,
        # ParBranchAndBound.cpp:530 — here the "second thread" is the
        # device.)
        pipeline = bool(opts.get("bnb_pipeline"))
        pending = None        # (batch, probes, handle, t_dispatch)
        self._inflight_nodes = []

        while len(self.tm) or pending is not None:
            stop = self._should_stop(t0)
            if stop is not None:
                self.status = stop
                break
            self.tm.set_cutoff(self._cutoff())
            # hand the tree to the device-resident runner once the warm
            # phase (root processing, strong-branch pc init, first
            # incumbents) is done: T B&B rounds then execute per device
            # dispatch instead of one (VERDICT r4 #1 — the per-batch
            # host round-trip was the binding constraint on nodes/s)
            if self._dev_pool_ok and len(self.tm) >= self._batch and \
                    self.stats.batches >= self._dev_warm_batches and \
                    (self.ub < _INF or
                     self.stats.batches >= 4 * self._dev_warm_batches):
                if pending is not None:
                    next_id = self._finish_batch(pending, next_id)
                    pending = None
                    self._inflight_nodes = []
                if self._dev_pool is None:
                    from .device_pool import DevicePoolRunner
                    opts = self.env.options
                    self._dev_pool = DevicePoolRunner(
                        self, cap=int(opts.get("device_pool_cap")),
                        batch=self._batch,
                        rounds=int(opts.get("device_rounds")))
                self._dev_pool.run(t0)
                next_id = max((nd.nid for nd in self.tm.iter_nodes()),
                              default=next_id - 1) + 1
                if self.status not in (SolveStatus.STARTED,
                                       SolveStatus.NOT_STARTED):
                    break
                continue
            cur = None
            if len(self.tm):
                t_d0 = time.monotonic()
                prep = self._prepare_batch()
                if prep is not None:
                    batch, probes, arrays = prep
                    handle = self._dispatch_step(
                        *arrays, qpd=True,
                        qpd_force=[nd.lb <= -1e19 for nd in batch])
                    cur = (batch, probes, handle, t_d0)
            if not pipeline and cur is not None:
                # serial mode: process immediately, nothing stays in flight
                next_id = self._finish_batch(cur, next_id)
                cur = None
            if pending is not None:
                next_id = self._finish_batch(pending, next_id)
            pending = cur
            self._inflight_nodes = pending[0] if pending is not None else []

            now = time.monotonic()
            if now - last_log >= self._log_interval:
                last_log = now
                self._log.info(
                    f"  {now - t0:8.1f}s  nodes {self.stats.nodes_processed:8d} "
                    f"open {len(self.tm):7d}  lb {self.lb:.8g}  ub {self.ub:.8g} "
                    f" gap {self._gap() * 100:.4g}%")
            if ckpt_file and now - last_ckpt >= ckpt_interval:
                # flush the pipeline first: in-flight nodes are popped
                # from the tree and would be LOST by a resume otherwise
                if pending is not None:
                    next_id = self._finish_batch(pending, next_id)
                    pending = None
                    self._inflight_nodes = []
                last_ckpt = now
                from .checkpoint import save_checkpoint
                save_checkpoint(ckpt_file, self)
        # drain the pipeline on any exit path (results are already
        # computed; discarding them would lose popped subtrees' bounds)
        if pending is not None:
            next_id = self._finish_batch(pending, next_id)
            self._inflight_nodes = []

        if self.status in (SolveStatus.STARTED, SolveStatus.NOT_STARTED):
            # tree exhausted
            if self.unresolved_lb < self._cutoff():
                # unresolved leaves remain: cannot claim optimality
                self.lb = min(self.unresolved_lb, self.ub)
                self.status = SolveStatus.SOLVED_GAP_LIMIT \
                    if self.ub < _INF else SolveStatus.FINISHED
            elif self.ub < _INF:
                self.status = SolveStatus.SOLVED_OPTIMAL
            else:
                self.status = SolveStatus.SOLVED_INFEASIBLE
        if self.status == SolveStatus.SOLVED_OPTIMAL:
            self.lb = self.ub if self.ub < _INF else self.lb
        self.stats.time = time.monotonic() - t0
        return self.status

    def _prepare_batch(self):
        """Pop + expand + pad one superstep batch.  Returns
        (batch, probes, (vlb_b, vub_b, x0_b, y0_b)) or None."""
        # RESERVE lanes for queued strong-branch probes: with pad_full
        # and a full open list, B == bucket left zero probe lanes and
        # probes starved exactly at steady state, when branching quality
        # matters most (reference probes synchronously per node,
        # ReliabilityBrancher.cpp:161-236).  Capped at a quarter of the
        # batch so node throughput keeps priority.
        reserve = 0
        if getattr(self, "_probe_queue", None):
            reserve = min(len(self._probe_queue),
                          self._strbr_limit or self._batch,
                          max(1, self._batch // 4))
        batch = self.tm.pop_batch(max(1, self._batch - reserve))
        if not batch:
            return None
        batch = self._expand_batch(batch)
        B = len(batch)
        # pad to a bucket size to bound recompiles; geometric ladder
        # 1, 4, 16, 64, ... keeps compiles to log4(batch) total, or a
        # single full-size bucket when pad_full is set (TPU supersteps
        # are latency-bound, so padding is nearly free and one compile
        # beats the ladder)
        if getattr(self, "_pad_full", False):
            bucket = self._batch
        else:
            bucket = 1
            while bucket < B:
                bucket *= 4
            bucket = min(bucket, self._batch)
        # strong-branch probes fill otherwise-wasted padding lanes
        probes = self._pop_probes(bucket - B)
        while B + len(probes) < bucket:
            batch.append(batch[0])
            B += 1
        vlb_b = np.stack([nd.vlb for nd in batch] + [p[3] for p in probes])
        vub_b = np.stack([nd.vub for nd in batch] + [p[4] for p in probes])
        x0_b = np.concatenate(
            [self._lane_starts(batch), np.stack([p[5] for p in probes])]) \
            if probes else self._lane_starts(batch)
        m = self.sp.m
        y0_b = np.concatenate(
            [self._lane_duals(batch),
             np.stack([p[6] if p[6] is not None and p[6].shape[0] == m
                       else np.zeros(m) for p in probes])]) \
            if probes else self._lane_duals(batch)
        return batch, probes, (vlb_b, vub_b, x0_b, y0_b)

    def _finish_batch(self, entry, next_id: int) -> int:
        """Fetch one in-flight superstep (blocks on the single d2h
        transfer) and run all host bookkeeping on it."""
        batch, probes, handle, t_d0 = entry
        res = self._fetch_step(handle)
        t_d1 = time.monotonic()
        self.stats.t_device += t_d1 - t_d0
        self.stats.batches += 1
        self.stats.solves += len(batch) + len(probes)
        next_id = self._handle_batch(batch, res, next_id)
        if probes:
            self._process_probes(probes, res, offset=len(batch))
        self.stats.t_host += time.monotonic() - t_d1
        # recompute global lower bound (capped by unresolved leaves and
        # by any nodes still in flight)
        open_lb = min(self.tm.best_lb(), self.unresolved_lb)
        for nd in self._inflight_nodes:
            open_lb = min(open_lb, nd.lb)
        self.lb = min(open_lb, self.ub)
        self.stats.nodes_processed = self.tm.nodes_processed
        self.stats.nodes_created = self.tm.nodes_created
        return next_id

    def _device_consts(self):
        """Device-resident (A, clb, cub): shipping A through the device
        tunnel every superstep costs more than the solve itself."""
        if self._dev_consts is None:
            import jax.numpy as jnp
            self._dev_consts = (jnp.asarray(self.sp.A),
                                jnp.asarray(self.sp.clb),
                                jnp.asarray(self.sp.cub))
        return self._dev_consts

    def _dispatch_step(self, vlb_b, vub_b, x0_b, y0_b=None, qpd=False,
                       qpd_force=None):
        """Launch one superstep asynchronously; returns a handle for
        _fetch_step.  Falls back to synchronous execution for step
        functions without an async surface.  With qpd=True and the QPD
        node processor active, the batch is solved on the QP model and
        verified on the true model at fetch time (heuristic/probe/dive
        callers keep the true model: their semantics assume it)."""
        if y0_b is None:
            y0_b = np.zeros((vlb_b.shape[0], self.sp.m))
        if qpd and self._qpd_step is not None:
            Aq, clbq, cubq = self._qpd_consts()
            return ("qp", self._qpd_step.dispatch(
                Aq, clbq, cubq, vlb_b, vub_b, x0_b, y0_b),
                (vlb_b, vub_b, x0_b, y0_b, qpd_force))
        A, clb, cub = self._device_consts()
        if hasattr(self._step, "dispatch"):
            return ("async", self._step.dispatch(A, clb, cub, vlb_b, vub_b,
                                                 x0_b, y0_b))
        return ("sync", self._step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b))

    def _fetch_step(self, handle):
        kind = handle[0]
        if kind == "qp":
            res_qp = self._qpd_step.unpack(handle[1])
            return self._qpd_verify(res_qp, handle[2])
        payload = handle[1]
        if kind == "async":
            return self._step.unpack(payload)
        return payload

    def _qpd_consts(self):
        if self._qpd_dev is None:
            import jax.numpy as jnp
            self._qpd_dev = (jnp.asarray(self.sp_qp.A),
                             jnp.asarray(self.sp_qp.clb),
                             jnp.asarray(self.sp_qp.cub))
        return self._qpd_dev

    def _qpd_relinearize(self, x_ref: np.ndarray) -> None:
        """Re-linearize the QP model's nonlinear rows at x_ref (the
        reference rebuilds its QP approximation as it descends,
        QPDProcessor.cpp; here rows are TRACED arguments, so the refresh
        never recompiles — only the quadratic objective stays anchored
        at the initial reference point)."""
        from .qpd import qp_row_linearization
        A, clb, cub = qp_row_linearization(self.sp, x_ref)
        self.sp_qp.A[:], self.sp_qp.clb[:], self.sp_qp.cub[:] = A, clb, cub
        self._qpd_dev = None

    def _qpd_verify(self, res, inputs):
        """QPDProcessor prune guard (reference QPDProcessor.cpp:
        processQP_/solveNLP_): the QP model is NOT a relaxation of the
        MINLP, so any lane whose QP result would PRUNE the node
        (infeasible, or bound above the cutoff) or ACCEPT an incumbent
        (integral point) is re-solved on the TRUE model before the
        decision; every other lane keeps the QP point for BRANCHING
        only — status forced to ITERATION_LIMIT with a -inf dual bound,
        which makes _process_result branch from the parent bound and
        never prune on QP data."""
        from .step import StepResult
        vlb_b, vub_b, x0_b, y0_b, force = inputs
        B = vlb_b.shape[0]
        status = np.array(res.status)
        db = np.array(res.dual_bound)
        cutoff = self._cutoff()
        # force: lanes that must resolve on the true model regardless —
        # nodes without a finite inherited bound (the root generation:
        # their true bound seeds the lb cone) and dead-end lanes
        # (bvar < 0: an unverified dead end would cap unresolved_lb at
        # -inf forever)
        need = ((status == EngineStatus.SOLVED_INFEASIBLE) |
                (db >= cutoff) | np.array(res.int_feasible) |
                (np.array(res.branch_var) < 0))
        if force is not None:
            need[:len(force)] |= np.asarray(force, dtype=bool)
        idx = np.where(need)[0]
        fields = {f: np.array(getattr(res, f)) for f in res._fields}
        if len(idx):
            k = len(idx)
            bucket = 1
            while bucket < k:
                bucket *= 4
            pick = np.concatenate([idx, np.full(bucket - k, idx[0],
                                                dtype=idx.dtype)])
            A, clb, cub = self._device_consts()
            r = self._step(A, clb, cub, vlb_b[pick], vub_b[pick],
                           np.array(res.x)[pick], np.array(res.y)[pick])
            self.stats.solves += k
            self._qpd_verified += k
            for fname in res._fields:
                fields[fname][idx] = np.asarray(getattr(r, fname))[:k]
        other = np.setdiff1d(np.arange(B), idx)
        fields["status"][other] = int(EngineStatus.ITERATION_LIMIT)
        fields["dual_bound"][other] = -_INF
        fields["int_feasible"][other] = False
        return StepResult(**fields)

    def _expand_batch(self, batch: List[Node]) -> List[Node]:
        """Lane-expansion hook: MsBranchAndBound replicates each node
        into several restart lanes (reference MsProcessor)."""
        return batch

    def _lane_starts(self, batch: List[Node]) -> np.ndarray:
        """Warm-start vector per lane (hook for multistart lanes).
        Cold NL lanes start at the box midpoint: the zero start lands
        nonconvex models in infeasible merit attractors (luedtke-1
        converges from the midpoint, stalls from zero)."""
        n = self.sp.n
        if self.sp.obj_nl is not None or len(self.sp.nl_rows):
            lo, hi = self.sp.vlb, self.sp.vub
            fl, fu = np.isfinite(lo), np.isfinite(hi)
            lo_s = np.where(fl, lo, 0.0)
            hi_s = np.where(fu, hi, 0.0)
            cold = np.where(fl & fu, 0.5 * (lo_s + hi_s),
                            np.where(fl, lo_s + 1.0,
                                     np.where(fu, hi_s - 1.0, 0.0)))
        else:
            cold = np.zeros(n)
        return np.stack([nd.warm_x if nd.warm_x is not None
                         else cold for nd in batch])

    def _lane_duals(self, batch: List[Node]) -> np.ndarray:
        """Dual warm-start vector per lane (parent row duals or zeros)."""
        m = self.sp.m
        return np.stack([nd.warm_y if nd.warm_y is not None
                         and nd.warm_y.shape[0] == m
                         else np.zeros(m) for nd in batch])

    def _run_step(self, vlb_b, vub_b, x0_b, y0_b=None):
        """Synchronous superstep (heuristics, dives, probes outside the
        pipelined main loop)."""
        return self._fetch_step(self._dispatch_step(vlb_b, vub_b, x0_b,
                                                    y0_b))

    # ---------------------------------------------------------- per batch
    def _handle_batch(self, batch: List[Node], res, next_id: int,
                      seen: Optional[set] = None) -> int:
        """Dispatch one superstep's results to per-node decisions.
        Subclasses (QG) intercept integral lanes here for separation.
        `seen` dedups padding duplicates, shareable across partition
        slices by the distributed driver."""
        status = np.asarray(res.status)
        obj = np.asarray(res.obj)
        db = np.asarray(res.dual_bound)
        xs = np.asarray(res.x)
        int_feas = np.asarray(res.int_feasible)
        bvar = np.asarray(res.branch_var)
        bval = np.asarray(res.branch_val)
        nvlb = np.asarray(res.new_vlb).copy()
        nvub = np.asarray(res.new_vub).copy()
        kkt = np.asarray(res.kkt_err) if hasattr(res, "kkt_err") else             np.full(len(batch), np.inf)
        if self._is_lp_relax and self.ub < _INF and hasattr(res, "y"):
            self._rc_fix(xs, np.asarray(res.y), db, status, nvlb, nvub)
        ys = np.asarray(res.y) if hasattr(res, "y") else None
        its = np.asarray(res.iters) if hasattr(res, "iters") else None
        if its is not None:
            self.stats.ipm_iters += int(its.sum())
            self._log.debug(
                f"  batch {self.stats.batches}: iters max={its.max()} "
                f"mean={its.mean():.1f} conv={(status == 1).sum()}/"
                f"{len(batch)}")
        if seen is None:
            seen = set()
        # first-class exact strong branching (brancher=strong): ONE
        # batched probe superstep solves the down/up children of the
        # top-K fractional candidates of every branching lane in this
        # batch; selection then uses ACTUAL certified child bound gains
        # (reference: ReliabilityBrancher::strongBranch_ solves them
        # serially with an iteration-limited engine,
        # ReliabilityBrancher.cpp:469 — here all 2K·B probes ride one
        # vmapped call)
        self._strong_gains = {}
        if self._brancher == "strong" and self.sp.int_mask.any():
            self._strong_branch_batch(batch, status, db, int_feas,
                                      res.frac if hasattr(res, "frac")
                                      else None, xs, nvlb, nvub, ys)
        # periodic in-tree rounding: every batch while no incumbent
        # exists, every 8th afterwards — one host-side repair+local-search
        # pass on the batch's best finite relaxation point (reference:
        # in-tree divheur/rounding calls, Bnb.cpp:152-169)
        if self.sp.int_mask.any() and \
                (self.ub >= _INF or self.stats.batches % 8 == 0):
            finite = np.all(np.isfinite(xs), axis=1) & \
                (status != EngineStatus.SOLVED_INFEASIBLE)
            if finite.any():
                i_best = int(np.argmin(np.where(finite, obj, np.inf)))
                self._try_round_incumbent(xs[i_best], nvlb[i_best],
                                          nvub[i_best])
                # in-tree QP diving (reference QPDProcessor processes
                # nodes on a QP model of the NLP; here dives launch from
                # tree nodes' boxes, not only the root — `qpdheur`)
                if self.env.options.get("qpdheur") and \
                        not self._is_lp_relax and \
                        self.stats.batches % 24 == 1:
                    self._qpd_dive(xs[i_best], nvlb[i_best], nvub[i_best])
        for i, node in enumerate(batch):
            if id(node) in seen:
                continue  # padding duplicate
            seen.add(id(node))
            self._lane_kkt = float(kkt[i]) if i < len(kkt) else np.inf
            self._lane_y = ys[i] if ys is not None else None
            self._lane_iters = int(its[i]) if its is not None else 0
            next_id = self._process_result(
                node, status[i], obj[i], db[i], xs[i], bool(int_feas[i]),
                int(bvar[i]), float(bval[i]), nvlb[i], nvub[i], next_id)
        return next_id

    def _master_arrays(self):
        """(A, clb, cub) actually used by the step (QG overrides with the
        cut-extended master)."""
        return self.sp.A, self.sp.clb, self.sp.cub

    def _rc_fix(self, xs, ys, db, status, nvlb, nvub) -> None:
        """Reduced-cost bound tightening (reference: RCHandler.cpp,
        `rc_fix`): with incumbent cutoff and certified node bound db, a
        variable at its bound with reduced cost r can move at most
        gap/|r| in any still-improving solution.  Vectorized over the
        whole batch on the host."""
        A, _, _ = self._master_arrays()
        c = self.sp.c
        cutoff = self._cutoff()
        B = xs.shape[0]
        r = c[None, :] + ys @ A            # (B, n); stationarity: r=zl-zu
        gap = cutoff - db                  # (B,)
        ok = (status == EngineStatus.SOLVED_OPTIMAL) & np.isfinite(gap) & \
            (gap >= 0)
        at_lo = np.abs(xs - nvlb) <= 1e-7 * (1 + np.abs(nvlb))
        at_hi = np.abs(nvub - xs) <= 1e-7 * (1 + np.abs(nvub))
        with np.errstate(divide="ignore", invalid="ignore"):
            max_up = np.where((r > 1e-9) & at_lo & ok[:, None],
                              nvlb + gap[:, None] / r, np.inf)
            max_dn = np.where((r < -1e-9) & at_hi & ok[:, None],
                              nvub + gap[:, None] / r, -np.inf)
        ints = self.sp.int_mask
        max_up = np.where(ints[None, :], np.floor(max_up + self._int_tol),
                          max_up)
        max_dn = np.where(ints[None, :], np.ceil(max_dn - self._int_tol),
                          max_dn)
        np.minimum(nvub, max_up, out=nvub)
        np.maximum(nvlb, max_dn, out=nvlb)

    # ---------------------------------------------------------- per node
    def _process_result(self, node: Node, status: int, obj: float, db: float,
                        x: np.ndarray, int_feas: bool, bvar: int, bval: float,
                        nvlb: np.ndarray, nvub: np.ndarray, next_id: int) -> int:
        """Prune/incumbent/branch decision for one node — the semantics of
        PCBProcessor::shouldPrune_ + IntVarHandler feasibility/branching."""
        node_bound = max(node.lb, db if db > -_INF else node.lb)
        # pseudocost update from the observed parent->child bound gain
        if node.branch_var >= 0 and node.lb > -_INF and \
                node_bound > node.lb and node.branch_frac > 1e-9:
            gain = (node_bound - node.lb) / node.branch_frac
            j = node.branch_var
            if node.branch_dir:
                c = self._pc_up_cnt[j]
                self._pc_up[j] = (self._pc_up[j] * c + gain) / (c + 1)
                self._pc_up_cnt[j] = c + 1
            else:
                c = self._pc_down_cnt[j]
                self._pc_down[j] = (self._pc_down[j] * c + gain) / (c + 1)
                self._pc_down_cnt[j] = c + 1
            if self._brancher == "unambrel":
                # PATH-local pseudocost trail (reference UnambRelBrancher:
                # the node's own brCands_/pseudoUp_/pseudoDown_ vectors
                # remove the ambiguity of global averages across distant
                # tree regions).  Copy-on-write: children share the dict
                # until one of them observes a new gain.
                trail = dict(node.pc_trail or {})
                e = list(trail.get(j, (0.0, 0, 0.0, 0)))
                if node.branch_dir:
                    e[2] = (e[2] * e[3] + gain) / (e[3] + 1)
                    e[3] += 1
                else:
                    e[0] = (e[0] * e[1] + gain) / (e[1] + 1)
                    e[1] += 1
                trail[j] = tuple(e)
                node.pc_trail = trail
        if self._is_lp_relax or self._certified_db:
            bound_for_prune = node_bound
        else:
            # NLP relaxation: certified bound only when converged
            bound_for_prune = max(
                node.lb,
                obj if status == EngineStatus.SOLVED_OPTIMAL else node.lb)
            if db > 1e15:
                bound_for_prune = db

        if status == EngineStatus.SOLVED_INFEASIBLE or bound_for_prune >= 1e15:
            node.status = NodeStatus.PRUNED_INFEASIBLE
            return next_id
        if bound_for_prune >= self._cutoff():
            node.status = NodeStatus.PRUNED_BY_BOUND
            return next_id

        # SOS enforcement (reference: SOS1Handler/SOS2Handler set-partition
        # branching): runs before incumbent acceptance
        if int_feas and (self.problem._sos1 or self.problem._sos2):
            sos_branch = self._check_sos(x, nvlb, nvub)
            if sos_branch is not None:
                side_vars_a, side_vars_b = sos_branch
                child_bound = max(node.lb, bound_for_prune)
                children = []
                for side, kill in enumerate((side_vars_a, side_vars_b)):
                    cvlb = nvlb.copy()
                    cvub = nvub.copy()
                    for j in kill:
                        if cvlb[j] <= 0.0 <= cvub[j]:
                            cvlb[j] = 0.0
                            cvub[j] = 0.0
                    children.append(Node(
                        nid=next_id + side, depth=node.depth + 1,
                        lb=child_bound, vlb=cvlb, vub=cvub, warm_x=x.copy(),
                        warm_y=self._lane_warm_y(), vio_val=node.vio_val,
                        pred_iters=self._lane_iters_val(),
                        pc_trail=node.pc_trail))
                node.status = NodeStatus.BRANCHED
                self.tm.branch(children, node)
                return next_id + 2

        if int_feas and status in (EngineStatus.SOLVED_OPTIMAL,
                                   EngineStatus.ITERATION_LIMIT):
            # relaxation solution is MINLP-feasible: candidate incumbent.
            # Clip into the node box (IPM interior tolerance can leave
            # continuous vars epsilon outside) and round the integers.
            xr = np.clip(x, nvlb, nvub) if self._eval_within else x.copy()
            ints = self.sp.int_mask
            xr[ints] = np.round(xr[ints])
            accepted = None
            feas = lambda p: self.problem.is_feasible(
                p, atol=max(self._feas_atol, 1e-5), int_tol=self._int_tol,
                rtol=self._feas_rtol)
            if feas(xr):
                accepted = (xr, float(self.problem.eval_objective(xr)))
            elif feas(x):
                accepted = (x.copy(), float(self.problem.eval_objective(x)))
            if accepted is not None:
                xbest, val = accepted
                self._accept_incumbent(xbest, val)
                # prune as optimal only when a certified bound supports
                # it: an iteration-limited engine that is still diving
                # (e.g. an unbounded NLP) must leave the node unresolved,
                # or a wrong "optimal" claim results
                supported = status == EngineStatus.SOLVED_OPTIMAL or \
                    bound_for_prune >= val - 1e-4 * (1.0 + abs(val)) or \
                    getattr(self, "_lane_kkt", np.inf) <= 1e-5
                if supported:
                    node.status = NodeStatus.PRUNED_OPTIMAL
                else:
                    self.unresolved_lb = min(self.unresolved_lb,
                                             bound_for_prune)
                    self.stats.unresolved += 1
                    node.status = NodeStatus.DOMINATED
                return next_id

        if bvar < 0:
            # No fractional int var, but the solution was not accepted as
            # an incumbent (engine iteration limit / feasibility check
            # failed).  Pruning would be UNSOUND — record the node as an
            # unresolved leaf whose bound caps the final global lb
            # (reference keeps such nodes alive via contOnErr/fixNodeErr,
            # PCBProcessor.cpp:311-338).
            self.unresolved_lb = min(self.unresolved_lb, bound_for_prune)
            self.stats.unresolved += 1
            node.status = NodeStatus.DOMINATED
            return next_id

        # root rounding heuristic (reference divheur-lite): plain and
        # partition-repaired roundings of the root relaxation solution.
        # Runs on ANY finite root point — an ITERATION_LIMIT root (f32
        # tail floor) still carries a perfectly roundable near-solution,
        # and skipping it left the whole tree incumbent-less (round 1).
        if node.nid == 0 and self._qpd_step is not None and \
                np.all(np.isfinite(x)):
            # anchor the QP model at the root relaxation solution (the
            # initial build used the box midpoint); traced rows make
            # this refresh recompile-free
            self._qpd_relinearize(x)
        if node.nid == 0 and self.ub >= _INF and \
                self.sp.int_mask.any() and np.all(np.isfinite(x)):
            self._root_rounding(x, nvlb, nvub)
        # root strong branching initializes pseudocosts (one batched call)
        if not getattr(self, "_strong_branch_done", True) and \
                status == EngineStatus.SOLVED_OPTIMAL:
            self._strong_branch_init(x, nvlb, nvub, float(bound_for_prune))
        # in-tree reliability probes: queue bound probes for unreliable
        # fractional candidates at this node (results land next superstep)
        if self._brancher == "rel" and self._rel_thresh > 0:
            ints = self.sp.int_mask
            fr = np.where(ints, np.abs(x - np.round(x)), 0.0)
            fr = np.where(nvub - nvlb > 1e-9, fr, 0.0)
            cand = np.where(fr > self._int_tol)[0]
            if len(cand) > 1 and np.isfinite(bound_for_prune):
                K = min(int(self.env.options.get("rel_cands")), len(cand))
                top = cand[np.argsort(-fr[cand])[:K]]
                self._enqueue_probes(x, nvlb, nvub, top,
                                     parent_db=float(bound_for_prune))
        # branching variable selection: pseudocost product rule when the
        # brancher is 'rel' and costs are observed; otherwise the device's
        # most-fractional candidate (reference MaxVioBrancher)
        bvar, bval = self._select_branch_var(x, nvlb, nvub, bvar, bval,
                                             node=node)
        self._branch_freq[bvar] += 1
        lo = math.floor(bval + self._int_tol)
        if math.isfinite(nvlb[bvar]):
            lo = max(lo, int(math.ceil(nvlb[bvar] - 1e-9)))
        if math.isfinite(nvub[bvar]):
            lo = min(lo, int(math.floor(nvub[bvar] + 1e-9)) - 1)
        child_bound = max(node.lb, bound_for_prune)
        children = []
        for side in (0, 1):
            cvlb = nvlb.copy()
            cvub = nvub.copy()
            if side == 0:
                cvub[bvar] = lo
                frac = max(bval - lo, 0.0)
            else:
                cvlb[bvar] = lo + 1
                frac = max(lo + 1 - bval, 0.0)
            children.append(Node(
                nid=next_id + side, depth=node.depth + 1, lb=child_bound,
                vlb=cvlb, vub=cvub, warm_x=x.copy(),
                warm_y=self._lane_warm_y(), branch_var=bvar,
                branch_dir=side, branch_frac=frac, vio_val=node.vio_val,
                pred_iters=self._lane_iters_val(),
                pc_trail=node.pc_trail))
        node.status = NodeStatus.BRANCHED
        self.tm.branch(children, node)
        return next_id + 2

    def _lane_iters_val(self) -> int:
        """IPM iteration count of the lane being processed — children
        inherit it as a difficulty estimate for batch composition."""
        return int(getattr(self, "_lane_iters", 0))

    def _lane_warm_y(self) -> Optional[np.ndarray]:
        """Row duals of the lane currently being processed (children
        inherit them as dual warm starts)."""
        y = getattr(self, "_lane_y", None)
        return None if y is None else np.array(y, dtype=np.float64)

    def _accept_incumbent(self, x: np.ndarray, val: float) -> bool:
        """Record a feasible solution: pool it (best-k), and if it beats
        the incumbent update ub/cutoff and prune the open tree."""
        self.sol_pool.add(x, val)
        if val < self.ub - 1e-12:
            self.ub = float(val)
            self.best_x = np.asarray(x, dtype=np.float64).copy()
            self.stats.sols_found += 1
            self.tm.set_cutoff(self._cutoff())
            self.tm.prune_by_cutoff()
            return True
        return False

    def _check_sos(self, x: np.ndarray, nvlb, nvub, tol: float = 1e-6):
        """If an SOS set is violated at x, return the two variable groups
        to zero out in the children (reference: SOS1Handler::getBranches /
        SOS2Handler set-partition branching); else None."""
        for weights, vs in self.problem._sos1:
            nz = [j for j in vs if abs(x[j]) > tol and nvub[j] > tol]
            if len(nz) > 1:
                # split at the weighted midpoint of the nonzeros
                mid = len(nz) // 2
                order = sorted(nz, key=lambda j: weights[vs.index(j)]
                               if j in vs else 0.0)
                return order[mid:], order[:mid]
        for weights, vs in self.problem._sos2:
            nz = [i for i, j in enumerate(vs)
                  if abs(x[j]) > tol and nvub[j] > tol]
            if len(nz) > 2 or (len(nz) == 2 and nz[1] - nz[0] != 1):
                mid = (nz[0] + nz[-1]) // 2
                # SOS2: children forbid vars strictly right/left of mid
                return [vs[i] for i in range(mid + 1, len(vs))], \
                       [vs[i] for i in range(0, mid)]
        return None

    @property
    def _partition_rows(self):
        if not hasattr(self, "_part_rows_cache"):
            from .heuristics import find_partition_rows
            self._part_rows_cache = find_partition_rows(
                self.sp.A, self.sp.clb, self.sp.cub, self.sp.int_mask,
                self.sp.nl_rows)
        return self._part_rows_cache

    def _linear_repair(self, xr: np.ndarray, rounds: int = 8
                       ) -> np.ndarray:
        """Greedy integer repair of rounded points against LINEAR rows
        (the capacity-row analogue of `_monotone_repair`, which only
        sees nonlinear rows): for the worst violated linear row, step
        the integer variable that reduces the violation at the least
        linear-objective damage, one unit per round.  Rounding k-up on
        a `sum s_i k_i <= C` row is exactly the failure mode this fixes
        (stockcycle-class models: nearest-rounding broke capacity and
        the fix-int oracle saw only infeasible lanes)."""
        sp = getattr(self, 'sp_orig', self.sp)
        ints = np.where(sp.int_mask)[0]
        if not len(ints) or not sp.A.shape[0]:
            return xr
        xr = xr.copy()
        c = sp.c
        for b in range(xr.shape[0]):
            for _ in range(rounds):
                ax = sp.A @ xr[b]
                vio_hi = ax - sp.cub
                vio_lo = sp.clb - ax
                vio = np.maximum(np.maximum(vio_hi, vio_lo), 0.0)
                vio[~np.isfinite(vio)] = 0.0
                r = int(np.argmax(vio))
                if vio[r] <= 1e-9:
                    break
                arow = sp.A[r]
                direction = -1.0 if vio_hi[r] >= vio_lo[r] else 1.0
                # candidate int steps that reduce the violation and stay
                # inside the global box
                best_j, best_cost = -1, np.inf
                for j in ints:
                    if abs(arow[j]) < 1e-12:
                        continue
                    step = direction * np.sign(arow[j])
                    nx = xr[b, j] + step
                    if nx < sp.vlb[j] - 1e-9 or nx > sp.vub[j] + 1e-9:
                        continue
                    damage = c[j] * step / max(abs(arow[j]), 1e-12)
                    if damage < best_cost:
                        best_cost, best_j = damage, int(j)
                if best_j < 0:
                    break
                xr[b, best_j] += direction * np.sign(arow[best_j])
        return xr

    def _try_round_incumbent(self, x: np.ndarray, nvlb, nvub) -> bool:
        """Rounding + partition repair + 1-swap local search on one
        relaxation point — host-only, no solves.  Returns True if an
        incumbent was accepted.  (reference analogue: rounding phase of
        MINLPDiving + improvement phase of MultiSolHeur)"""
        from .heuristics import partition_round, swap_local_search
        cands = []
        xr = np.clip(x, nvlb, nvub)
        xr[self.sp.int_mask] = np.round(xr[self.sp.int_mask])
        cands.append(xr)
        # greedy linear-row repair of the plain rounding (rounding up
        # breaks capacity/budget rows; without this, single-knapsack
        # models can run incumbent-less — intquad_2048 measured)
        spr = getattr(self, "sp_orig", self.sp)
        nv = self.problem.n_vars
        if self.sp.int_mask.any() and spr.n == nv:
            rep = self._linear_repair(xr[None, :nv].copy())[0]
            if not np.array_equal(rep, xr[:nv]):
                full = xr.copy()
                full[:nv] = rep
                cands.append(full)
        parts = self._partition_rows
        if parts:
            rng = np.random.default_rng(0)
            for noise in (0.0, 0.2, 0.4):
                cands.append(partition_round(x, parts, self.sp.int_mask,
                                             rng=rng, noise=noise))
            # 1-swap local search on the repaired roundings: on
            # assignment-structured MIQPs (color_lab) this is the
            # difference between a 40%-gap incumbent and a near-optimum
            if self.sp.obj_nl is None and not len(self.sp.nl_rows):
                Qobj = self.sp.Qobj
                for base in list(cands[1:3]):
                    cands.append(swap_local_search(
                        base, parts, self.sp.c, Qobj))
        # staged master/reformulated problems append auxiliary variables
        # (QG/OA epigraph eta, bin2lin binaries) AFTER the original ones;
        # candidates are judged against the original problem only
        nv = self.problem.n_vars
        found = False
        for cand in cands:
            cand = cand[:nv]
            if self.problem.is_feasible(cand,
                                        atol=max(self._feas_atol, 1e-5),
                                        int_tol=self._int_tol,
                                        rtol=self._feas_rtol):
                found |= self._accept_incumbent(
                    cand, float(self.problem.eval_objective(cand)))
        return found

    def _root_dive(self, x: np.ndarray, nvlb: np.ndarray,
                   nvub: np.ndarray, lanes: int = 8, rounds: int = 16
                   ) -> None:
        """Fractional diving at the root (reference: MINLPDiving.cpp,
        `divheur`): each lane progressively fixes its least-fractional
        unfixed integers and re-solves through the fused superstep; the
        FBBT inside the step propagates fixings for free.  Lanes differ
        by tie-break noise.  Fully-fixed feasible lanes become incumbent
        candidates (rounded + repaired)."""
        ints = np.where(self.sp.int_mask)[0]
        if len(ints) == 0 or not np.all(np.isfinite(x)):
            return
        if getattr(self, "_pad_full", False):
            lanes = self._batch   # reuse the single compiled bucket
        from .heuristics import (dive_round, dive_scheme_for_lane,
                                 dive_scores)
        scheme_opt = str(self.env.options.get("divheur_scheme"))
        schemes = [dive_scheme_for_lane(scheme_opt, b) for b in range(lanes)]
        grad_c = self.sp.c.copy()
        if self.sp.Qobj is not None:
            grad_c = grad_c + 2.0 * (self.sp.Qobj @ x)
        ncols = (self.sp.A != 0).sum(axis=0).astype(float)
        avg_rc = np.zeros(self.sp.n)    # filled from lane duals below
        rng = np.random.default_rng(int(self.env.options.get("rand_seed"))
                                    + 23)
        vlb = np.tile(nvlb, (lanes, 1))
        vub = np.tile(nvub, (lanes, 1))
        xs = np.tile(x, (lanes, 1))
        alive = np.ones(lanes, dtype=bool)
        for r in range(rounds):
            unfixed = (vub[:, ints] - vlb[:, ints]) > 0.5
            n_unfixed = unfixed.sum(axis=1)
            for b in np.where(alive)[0]:
                nu = int(n_unfixed[b])
                if nu == 0 or not np.isfinite(xs[b]).all():
                    continue
                k = max(1, nu // max(2, rounds - 1 - r))
                frac = np.abs(xs[b, ints] - np.round(xs[b, ints]))
                score = dive_scores(schemes[b], xs[b], ints, frac,
                                    grad_c, ncols, avg_rc)
                if schemes[b] == "frac" and b:
                    score = score + rng.uniform(0, 0.05, size=len(ints))
                score = np.where(unfixed[b], score, np.inf)
                pick = ints[np.argsort(score)[:k]]
                direction = "nearest" if scheme_opt == "frac" else \
                    ("nearest", "ceil", "floor", "farthest")[(b // 4) % 4]
                v = np.clip(dive_round(direction, xs[b, pick],
                                       self._int_tol),
                            vlb[b, pick], vub[b, pick])
                vlb[b, pick] = v
                vub[b, pick] = v
            res = self._run_step(vlb, vub, xs)
            self.stats.solves += lanes
            status = np.asarray(res.status)
            db = np.asarray(res.dual_bound)
            xs = np.asarray(res.x)
            if any(s == "rcost" for s in schemes):
                # running-average reduced costs over lanes+rounds
                # (reference avgDual_, MINLPDiving.cpp:286-292)
                rc = grad_c[None, :] - np.asarray(res.y) @ self.sp.A
                avg_rc = (avg_rc * r + rc.mean(axis=0)) / (r + 1)
            vlb = np.asarray(res.new_vlb).copy()
            vub = np.asarray(res.new_vub).copy()
            alive &= (status != EngineStatus.SOLVED_INFEASIBLE) & (db < 1e15)
            if not alive.any():
                return
            done = alive & \
                ((vub[:, ints] - vlb[:, ints]) <= 0.5).all(axis=1)
            for b in np.where(done)[0]:
                self._try_round_incumbent(xs[b], vlb[b], vub[b])
                alive[b] = False
            if not alive.any():
                return

    def _root_rounding(self, x: np.ndarray, nvlb, nvub) -> None:
        """Cheap root incumbents from (partition-repaired) roundings —
        no extra solves, just host evaluation."""
        self._try_round_incumbent(x, nvlb, nvub)
        opts = self.env.options
        seed = int(opts.get("rand_seed"))
        if opts.get("trimloss_heur") and self.ub >= _INF:
            from .trimloss import construct_trimloss
            try:
                r = construct_trimloss(self.problem)
            except Exception:
                r = None
            if r is not None:
                self._accept_incumbent(r[0], r[1])
        if opts.get("divheur"):
            self._root_dive(x, nvlb, nvub)
        if opts.get("msheur"):
            # multistart heuristic (reference NLPMultiStart): best of many
            # random-start relaxation solves, rounded+repaired
            from .multistart import multistart_solve
            bx, bobj, _ = multistart_solve(
                self.sp, self.problem, n_starts=16, seed=seed,
                vlb=nvlb, vub=nvub)
            if bx is not None:
                self._try_round_incumbent(bx, nvlb, nvub)
        if opts.get("samplingheur"):
            from .heuristics import SamplingHeur
            for xx, val in SamplingHeur(self.problem, self.sp,
                                        seed=seed).run(
                    nvlb, nvub, around=x, int_tol=self._int_tol):
                self._accept_incumbent(xx, val)
        if opts.get("fixvarsheur"):
            from .heuristics import FixVarsHeur
            from ..engines.ipm import IPMOptions
            fv = FixVarsHeur(self.problem, self.sp,
                             ipm=IPMOptions(
                                 max_iters=int(opts.get("ipm_max_iters")),
                                 tol=float(opts.get("ipm_tol"))),
                             seed=seed)
            for xx, val in fv.run(nvlb, nvub, x, int_tol=self._int_tol):
                self._accept_incumbent(xx, val)
        if opts.get("qpdheur") and not self._is_lp_relax and \
                np.all(np.isfinite(x)):
            self._qpd_dive(x, nvlb, nvub)

    def _qpd_dive(self, x: np.ndarray, nvlb, nvub) -> None:
        """Population QP diving from a relaxation point (reference
        QPDProcessor's QP-model node processing, as an in-tree primal
        heuristic).  The QP model is built once at the first call's
        point and reused (the reference rebuilds per dive; the model
        only seeds fixings, never bounds, so staleness is benign)."""
        if not np.all(np.isfinite(x)):
            return
        opts = self.env.options
        if not hasattr(self, "_qpd"):
            from .qpd import QPDiver
            from ..engines.ipm import IPMOptions
            self._qpd = QPDiver(self.problem, self.sp, x,
                                ipm=IPMOptions(
                                    max_iters=int(opts.get("ipm_max_iters")),
                                    tol=float(opts.get("ipm_tol"))))
        for xx, val in self._qpd.run(nvlb, nvub, x,
                                     int_tol=self._int_tol):
            self._accept_incumbent(xx, val)

    def _strong_branch_init(self, x: np.ndarray, nvlb: np.ndarray,
                            nvub: np.ndarray, obj: float) -> None:
        """Initialize pseudocosts by strong branching at the root: probe
        the top-K fractional candidates with down/up bound-fixed solves in
        ONE batched engine call (reference: ReliabilityBrancher::
        strongBranch_ solves them one at a time with an iteration-limited
        warm engine, ReliabilityBrancher.cpp:469)."""
        if getattr(self, "_strong_branch_done", True):
            return
        self._strong_branch_done = True
        if self._brancher not in ("rel", "strong"):
            return
        ints = self.sp.int_mask
        frac = np.where(ints, np.abs(x - np.round(x)), 0.0)
        frac = np.where(nvub - nvlb > 1e-9, frac, 0.0)
        cand = np.argsort(-frac)
        cand = [int(j) for j in cand if frac[j] > self._int_tol]
        K = min(int(self.env.options.get("rel_cands")), len(cand))
        if K == 0:
            return
        cand = cand[:K]
        boxes_lo, boxes_hi = [], []
        for j in cand:
            lo = math.floor(x[j])
            down_hi = nvub.copy()
            down_hi[j] = lo
            up_lo = nvlb.copy()
            up_lo[j] = lo + 1
            boxes_lo.extend([nvlb.copy(), up_lo])
            boxes_hi.extend([down_hi, nvub.copy()])
        B = len(boxes_lo)
        if getattr(self, "_pad_full", False):
            bucket = max(self._batch, B)   # reuse the compiled bucket
        else:
            bucket = 1
            while bucket < B:
                bucket *= 4
        while len(boxes_lo) < bucket:
            boxes_lo.append(boxes_lo[0])
            boxes_hi.append(boxes_hi[0])
        res = self._run_step(np.stack(boxes_lo), np.stack(boxes_hi),
                             np.tile(x, (bucket, 1)))
        self.stats.solves += B
        dbs = np.asarray(res.dual_bound)[:B]
        sts = np.asarray(res.status)[:B]
        for idx, j in enumerate(cand):
            f = x[j] - math.floor(x[j])
            for side, frac_side in ((0, f), (1, 1.0 - f)):
                db = dbs[2 * idx + side]
                if sts[2 * idx + side] == EngineStatus.SOLVED_INFEASIBLE \
                        or db >= 1e15:
                    gain = 1e3  # infeasible child: very attractive branch
                else:
                    gain = max(0.0, db - obj) / max(frac_side, 1e-6)
                if side == 0:
                    self._pc_down[j] = gain
                    self._pc_down_cnt[j] = 1
                else:
                    self._pc_up[j] = gain
                    self._pc_up_cnt[j] = 1

    def _strong_branch_batch(self, batch, status, db, int_feas, frac_b,
                             xs, nvlb, nvub, ys) -> None:
        """Exact strong branching for one batch: build the 2K child
        boxes of each branching lane's top-K fractional candidates and
        solve them in ONE extra superstep; fills `self._strong_gains`
        (id(node) -> {j: score}) for `_select_branch_var`, and feeds
        the observed gains into the pseudocosts (free reliability
        data).  Probe bounds are used for branching scores only — never
        pruning — so unconverged probes are still useful."""
        if frac_b is None:
            return
        K = max(1, int(self.env.options.get("rel_cands")))
        cutoff = self._cutoff()
        plan = []                      # (node, parent_db, [(j, f)])
        seen_ids = set()
        for i, node in enumerate(batch):
            if id(node) in seen_ids:
                continue
            seen_ids.add(id(node))
            if status[i] == EngineStatus.SOLVED_INFEASIBLE or \
                    bool(int_feas[i]) or db[i] >= min(cutoff, 1e15):
                continue
            fr = np.where(nvub[i] - nvlb[i] > 1e-9, frac_b[i], 0.0)
            cand = np.where(fr > self._int_tol)[0]
            if len(cand) <= 1:
                continue
            top = cand[np.argsort(-fr[cand])[:K]]
            parent = float(db[i]) if db[i] > -_INF else float(node.lb)
            plan.append((node, parent, i,
                         [(int(j), float(xs[i, j])) for j in top]))
        if not plan:
            return
        boxes_lo, boxes_hi, x0s, y0s, tags = [], [], [], [], []
        for node, parent, i, cands in plan:
            for j, xv in cands:
                lo = math.floor(xv)
                dn_hi = nvub[i].copy()
                dn_hi[j] = lo
                up_lo = nvlb[i].copy()
                up_lo[j] = lo + 1
                boxes_lo.extend([nvlb[i].copy(), up_lo])
                boxes_hi.extend([dn_hi, nvub[i].copy()])
                x0s.extend([xs[i].copy(), xs[i].copy()])
                yrow = ys[i] if ys is not None else np.zeros(self.sp.m)
                y0s.extend([yrow, yrow])
                f = xv - lo
                tags.append((id(node), parent, j, max(f, 1e-6),
                             max(1.0 - f, 1e-6)))
        B = len(boxes_lo)
        if getattr(self, "_pad_full", False):
            bucket = max(self._batch, B)
        else:
            bucket = 1
            while bucket < B:
                bucket *= 4
        while len(boxes_lo) < bucket:
            boxes_lo.append(boxes_lo[0])
            boxes_hi.append(boxes_hi[0])
            x0s.append(x0s[0])
            y0s.append(y0s[0])
        r = self._run_step(np.stack(boxes_lo), np.stack(boxes_hi),
                           np.stack(x0s), np.stack(y0s))
        self.stats.solves += B
        self.stats.probes += B
        pdb = np.asarray(r.dual_bound)
        pst = np.asarray(r.status)
        for t, (nid, parent, j, f_dn, f_up) in enumerate(tags):
            dn, up = pdb[2 * t], pdb[2 * t + 1]
            g_dn = 1e3 if (pst[2 * t] == EngineStatus.SOLVED_INFEASIBLE
                           or dn >= 1e15) \
                else max(0.0, float(dn) - parent) / f_dn
            g_up = 1e3 if (pst[2 * t + 1] ==
                           EngineStatus.SOLVED_INFEASIBLE or up >= 1e15) \
                else max(0.0, float(up) - parent) / f_up
            self._strong_gains.setdefault(nid, {})[j] = \
                max(g_dn * f_dn, 1e-8) * max(g_up * f_up, 1e-8)
            for side, gain in ((0, g_dn), (1, g_up)):
                if side == 0:
                    c = self._pc_down_cnt[j]
                    self._pc_down[j] = (self._pc_down[j] * c + gain) / \
                        (c + 1)
                    self._pc_down_cnt[j] = c + 1
                else:
                    c = self._pc_up_cnt[j]
                    self._pc_up[j] = (self._pc_up[j] * c + gain) / (c + 1)
                    self._pc_up_cnt[j] = c + 1

    # ------------------------------------------- reliability branching
    def _pop_probes(self, k: int) -> List[tuple]:
        """Drain up to k queued strong-branch probes (bounded further by
        strbr_lane_limit per superstep)."""
        if k <= 0 or not self._probe_queue:
            return []
        k = min(k, self._strbr_limit) if self._strbr_limit else k
        out = self._probe_queue[:k]
        self._probe_queue = self._probe_queue[k:]
        for p in out:
            key = (p[0], p[1])
            self._probe_pending[key] = max(
                0, self._probe_pending.get(key, 0) - 1)
        return out

    def _enqueue_probes(self, x: np.ndarray, nvlb: np.ndarray,
                        nvub: np.ndarray, cand: np.ndarray,
                        parent_db: float = float("nan")) -> None:
        """Queue down/up bound-probe boxes for unreliable candidates at
        this node (reference: ReliabilityBrancher.cpp:161-236 probes them
        synchronously per node; here they ride the next superstep's
        padding lanes and feed pseudocosts one batch later)."""
        if self._rel_thresh <= 0 or len(self._probe_queue) >= 4 * self._batch:
            return
        warm_y = self._lane_warm_y()
        # most fractional first: the candidates most likely to be branched
        frac = np.abs(x[cand] - np.round(x[cand]))
        for j in cand[np.argsort(-frac)]:
            j = int(j)
            f = x[j] - math.floor(x[j])
            for side in (0, 1):
                cnt = self._pc_down_cnt[j] if side == 0 else self._pc_up_cnt[j]
                pend = self._probe_pending.get((j, side), 0)
                if cnt + pend >= self._rel_thresh:
                    continue
                lo = math.floor(x[j])
                pvlb, pvub = nvlb.copy(), nvub.copy()
                if side == 0:
                    pvub[j] = lo
                    fs = max(f, 1e-6)
                else:
                    pvlb[j] = lo + 1
                    fs = max(1.0 - f, 1e-6)
                self._probe_queue.append(
                    (j, side, fs, pvlb, pvub, x.copy(), warm_y,
                     parent_db))
                self._probe_pending[(j, side)] = pend + 1
                if len(self._probe_queue) >= 4 * self._batch:
                    return

    def _process_probes(self, probes: List[tuple], res, offset: int) -> None:
        """Fold probe-lane results into the pseudocosts.  Probe bounds
        are only ever used for branching scores — never pruning — so an
        unconverged probe is still useful data."""
        db = np.asarray(res.dual_bound)
        status = np.asarray(res.status)
        self.stats.probes += len(probes)
        for i, (j, side, fs, pvlb, pvub, px, py, pdb) in enumerate(probes):
            lane = offset + i
            parent = pdb
            if not np.isfinite(parent):
                parent = self.lb if np.isfinite(self.lb) else 0.0
            d = db[lane]
            if status[lane] == EngineStatus.SOLVED_INFEASIBLE or d >= 1e15:
                gain = 1e3
            elif d > -_INF:
                gain = max(0.0, float(d) - parent) / fs
            else:
                continue
            if side == 0:
                c = self._pc_down_cnt[j]
                self._pc_down[j] = (self._pc_down[j] * c + gain) / (c + 1)
                self._pc_down_cnt[j] = c + 1
            else:
                c = self._pc_up_cnt[j]
                self._pc_up[j] = (self._pc_up[j] * c + gain) / (c + 1)
                self._pc_up_cnt[j] = c + 1

    def _select_branch_var(self, x: np.ndarray, nvlb, nvub,
                           bvar: int, bval: float, node: Optional[Node] = None):
        """Branching-variable selection.  `rel` = pseudocost product rule
        (reference: ReliabilityBrancher score, weighted min/max of up/down
        gains); `lexico` = lowest index (LexicoBrancher); `random` =
        uniform among candidates (RandomBrancher); `maxfreq` = most often
        branched (MaxFreqBrancher); `weak` = reduced-cost bound-change
        scoring (WeakBrancher); `unambrel` = path-local pseudocost
        reliability scoring (UnambRelBrancher); anything else keeps the
        device's most-fractional candidate (MaxVioBrancher)."""
        rule = self._brancher
        if rule not in ("rel", "strong", "lexico", "random", "maxfreq",
                        "weak", "unambrel"):
            return bvar, bval
        ints = self.sp.int_mask
        frac = np.where(ints, np.abs(x - np.round(x)), 0.0)
        frac = np.where(nvub - nvlb > 1e-9, frac, 0.0)
        cand = np.where(frac > self._int_tol)[0]
        if len(cand) <= 1:
            return bvar, bval
        if rule == "strong" and node is not None:
            # exact strong branching: pick by the measured product of
            # certified child bound gains (this batch's probe superstep)
            g = getattr(self, "_strong_gains", {}).get(id(node))
            if g:
                j = max(g, key=g.get)
                return int(j), float(x[j])
        if rule == "lexico":
            j = cand[0]
        elif rule == "random":
            j = cand[self._rng_branch.integers(len(cand))]
        elif rule == "maxfreq":
            freq = self._branch_freq[cand]
            best = freq.max()
            tied = cand[freq == best]
            j = tied[int(np.argmax(frac[tied]))]   # tie-break: most frac
        elif rule == "weak":
            j = self._weak_select(x, nvlb, nvub, cand, frac)
        elif rule == "unambrel":
            j = self._unambrel_select(x, cand, node)
        else:
            avg_up = self._pc_up[self._pc_up_cnt > 0]
            avg_dn = self._pc_down[self._pc_down_cnt > 0]
            mu_up = avg_up.mean() if len(avg_up) else 1.0
            mu_dn = avg_dn.mean() if len(avg_dn) else 1.0
            pu = np.where(self._pc_up_cnt[cand] > 0, self._pc_up[cand],
                          mu_up)
            pd = np.where(self._pc_down_cnt[cand] > 0, self._pc_down[cand],
                          mu_dn)
            f = x[cand] - np.floor(x[cand])
            score = np.maximum(pd * f, 1e-8) * np.maximum(pu * (1 - f),
                                                          1e-8)
            # blend in fractionality (reference brancher fractional
            # weight, `br_frac_weight`): both terms normalized to [0,1]
            # over the candidate set so the weight is scale-free
            w = float(self.env.options.get("br_frac_weight"))
            if w > 0:
                fr2 = np.minimum(f, 1.0 - f)
                score = (1.0 - w) * score / max(score.max(), 1e-12) + \
                    w * fr2 / max(fr2.max(), 1e-12)
            j = cand[int(np.argmax(score))]
        return int(j), float(x[j])

    def _weak_select(self, x: np.ndarray, nvlb, nvub, cand, frac) -> int:
        """WeakBrancher scoring (reference WeakBrancher.cpp:59-116,
        273-350): for each candidate's down/up child, apply the branch
        bound, propagate it with ONE vectorized linear-FBBT sweep (the
        analogue of the handlers' getStrongerMods pass), and price the
        resulting bound changes against the node's reduced costs:
        obj_change = sum_v max(0, rc_v * dlb_v) [rc_v>0]
                   + sum_v max(0, rc_v * dub_v) [rc_v<0]
        Score = 0.8*min(up,down) + 0.2*max (getScore_ :273).  No engine
        solves — this is the whole point of weak branching.  All 2K child
        boxes ride one jitted vmapped sweep.  Deviation from the
        reference: an FBBT-infeasible child scores BIG (the reference
        zeroes it, but an infeasible child means branching there prunes
        half the subtree — strictly better information)."""
        y = getattr(self, "_lane_y", None)
        if y is None:
            return int(cand[int(np.argmax(frac[cand]))])
        sp = self.sp
        gc = sp.c.copy()
        if sp.Qobj is not None:
            gc = gc + 2.0 * (sp.Qobj @ x)
        rc = gc - np.asarray(y, dtype=np.float64) @ sp.A
        K = min(2 * max(1, int(self.env.options.get("rel_cands"))),
                len(cand))
        top = cand[np.argsort(-frac[cand])[:K]]
        B = 2 * K
        lo = np.tile(nvlb, (B, 1))
        hi = np.tile(nvub, (B, 1))
        for i, j in enumerate(top):
            hi[2 * i, j] = math.floor(x[j])        # down child
            lo[2 * i + 1, j] = math.ceil(x[j])     # up child
        fb = getattr(self, "_weak_fbbt_fns", None)
        if fb is None:
            fb = self._weak_fbbt_fns = {}
        if B not in fb:
            import jax
            from ..ops.interval import linear_fbbt
            fb[B] = jax.jit(jax.vmap(
                lambda l, h, A, cl, cu: linear_fbbt(A, cl, cu, l, h),
                in_axes=(0, 0, None, None, None)))
        nlo, nhi, infeas = fb[B](lo, hi, sp.A, sp.clb, sp.cub)
        nlo = np.asarray(nlo)
        nhi = np.asarray(nhi)
        infeas = np.asarray(infeas)
        pos = rc > 1e-7
        neg = rc < -1e-7
        dlb = np.where(np.isfinite(nlo) & np.isfinite(lo), nlo - lo, 0.0)
        dub = np.where(np.isfinite(nhi) & np.isfinite(hi), nhi - hi, 0.0)
        chg = np.maximum(rc[None, :] * dlb, 0.0) * pos[None, :] + \
            np.maximum(rc[None, :] * dub, 0.0) * neg[None, :]
        change = chg.sum(axis=1)
        change = np.where(infeas, 1e12, change)
        dn, up = change[0::2], change[1::2]
        score = 0.8 * np.minimum(dn, up) + 0.2 * np.maximum(dn, up)
        return int(top[int(np.argmax(score))])

    def _unambrel_select(self, x: np.ndarray, cand,
                         node: Optional[Node]) -> int:
        """Unambiguous reliability scoring (reference UnambRelBrancher
        .cpp:83-166, 330-360, 441-470): pseudocosts are read from the
        NODE'S OWN ancestry trail (Node.h:168-259 per-node
        brCands_/pseudoUp_/pseudoDown_), not the global arrays, removing
        cross-region ambiguity.  Candidates with observed up AND down
        gains on the path score 0.8*min+0.2*max of dist*pc; candidates
        seen only partially score times_branched - 1e-5*(pcUp+pcDown)
        - 1e-6*max(dd,ud) (:344-347); unseen candidates score
        -1e-6*max(dd,ud) (:355)."""
        trail = getattr(node, "pc_trail", None) if node is not None else None
        best_j, best_s = int(cand[0]), -_INF
        for j in cand:
            f = x[j] - math.floor(x[j])
            dd, ud = f, 1.0 - f
            e = trail.get(int(j)) if trail else None
            if e is not None and e[1] >= 1 and e[3] >= 1:
                ch_dn = dd * e[0]
                ch_up = ud * e[2]
                s = 0.8 * min(ch_dn, ch_up) + 0.2 * max(ch_dn, ch_up)
            elif e is not None:
                s = (e[1] + e[3]) - 1e-5 * (e[0] + e[2]) \
                    - 1e-6 * max(dd, ud)
            else:
                s = -1e-6 * max(dd, ud)
            if s > best_s:
                best_s, best_j = s, int(j)
        return best_j


def solve_file(path: str, env: Optional[Environment] = None,
               ) -> BranchAndBound:
    """Convenience: read an instance and solve it."""
    from ..io.nl_reader import read_nl
    p = read_nl(path)
    bab = BranchAndBound(p, env=env)
    bab.solve()
    return bab
