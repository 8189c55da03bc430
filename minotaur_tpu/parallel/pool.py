"""Mesh-sharded node-pool processing.

TPU-native re-derivation of the reference's distributed layer
(reference: MpiBranchAndBound.{h,cpp}):

- the MPI fork gossips incumbents with async Isend/Iprobe (tag 1,
  MpiBranchAndBound.cpp:197-208/36-50) -> here a jax.lax.pmin collective
  fuses the global upper bound every superstep, deterministically;
- LoadBalance_ pops the 50*P best nodes, Allgathers their bounds, sorts,
  and deals round-robin (:78-195) -> here the pool lives as a sharded
  (B, n) array batch, so "migration" is a plain resharding of arrays and
  the host-side deal (deal_round_robin) is the same global-sort
  round-robin;
- termination: all-bounds-infinite (:137-140) -> a psum of open-node
  counts.

A node is already a fixed-width (vlb, vub) pair, so the Serializer
(Serializer.h:32-35) has no equivalent here — migration never serializes.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..bnb.step import StepOptions, build_node_step_unjitted
from ..engines.staging import StagedProblem


def build_sharded_step(sp: StagedProblem, opts: StepOptions,
                       mesh, axis: str = "nodes") -> Callable:
    """Returns sharded_step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b, ub_in)
    -> (StepResult with HOST numpy leaves, global_ub float).

    The node batch is sharded across the mesh axis; A/clb/cub replicate.
    After the local vmapped supersteps, the best integer-feasible
    objective is fused across devices with a min-collective — the
    deterministic replacement for the reference's async incumbent gossip
    (MpiBranchAndBound.cpp:197-208).  Row duals warm-start per lane, same
    as the single-controller driver.  All outputs pack into ONE sharded
    array so the superstep costs one device->host transfer (per-field
    fetches through the TPU tunnel cost ~0.1-0.25 s latency each)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..bnb.step import pack_step_result, unpack_step_result

    step_one = build_node_step_unjitted(sp, opts)
    n, m = sp.n, sp.m

    def local_step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b, ub_in):
        res = jax.vmap(step_one, in_axes=(None, None, None, 0, 0, 0, 0))(
            A, clb, cub, vlb_b, vub_b, x0_b, y0_b)
        ok = res.int_feasible & (res.status == 1)
        local_best = jnp.min(jnp.where(ok, res.obj, jnp.inf), initial=jnp.inf)
        global_ub = jnp.minimum(jax.lax.pmin(local_best, axis_name=axis),
                                ub_in)
        return pack_step_result(jnp, res), global_ub

    f = jax.shard_map(local_step, mesh=mesh,
                      in_specs=(P(), P(), P(), P(axis), P(axis), P(axis),
                                P(axis), P()),
                      out_specs=(P(axis), P()), check_vma=False)
    jf = jax.jit(f)

    def sharded_step(A, clb, cub, vlb_b, vub_b, x0_b, y0_b=None,
                     ub_in=np.inf):
        if y0_b is None:
            y0_b = np.zeros((vlb_b.shape[0], m))
        packed, gub = jf(A, clb, cub, vlb_b, vub_b, x0_b, y0_b,
                         jnp.asarray(float(ub_in)))
        return unpack_step_result(np.asarray(packed), n, m), float(gub)

    sharded_step.dispatch = jf
    sharded_step.unpack = lambda packed: unpack_step_result(
        np.asarray(packed), n, m)
    return sharded_step


def deal_round_robin(lbs: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic global deal: sort node bounds ascending, assign
    round-robin to partitions (reference: MpiBranchAndBound.cpp:127-144).
    Returns partition index per node."""
    order = np.argsort(lbs, kind="stable")
    part = np.empty(len(lbs), dtype=np.int32)
    part[order] = np.arange(len(lbs)) % n_parts
    return part
