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
    """Returns jitted sharded_step(A, clb, cub, vlb_b, vub_b, x0_b, ub_in)
    -> (StepResult sharded over `axis`, global_ub scalar).

    The node batch is sharded across the mesh axis; A/clb/cub replicate.
    After the local vmapped supersteps, the best integer-feasible
    objective is fused across devices with a min-collective — the
    deterministic replacement for the reference's async incumbent gossip.
    """
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..bnb.step import StepResult

    step_one = build_node_step_unjitted(sp, opts)

    def local_step(A, clb, cub, vlb_b, vub_b, x0_b, ub_in):
        res = jax.vmap(step_one, in_axes=(None, None, None, 0, 0, 0))(
            A, clb, cub, vlb_b, vub_b, x0_b)
        # (duals cold-start on the sharded path; per-node warm_y lives in
        # the single-controller drivers)
        ok = res.int_feasible & (res.status == 1)
        local_best = jnp.min(jnp.where(ok, res.obj, jnp.inf), initial=jnp.inf)
        global_ub = jnp.minimum(jax.lax.pmin(local_best, axis_name=axis),
                                ub_in)
        return res, global_ub

    out_specs = (StepResult(*([P(axis)] * len(StepResult._fields))), P())
    f = shard_map(local_step, mesh=mesh,
                  in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P()),
                  out_specs=out_specs, check_rep=False)
    return jax.jit(f)


def deal_round_robin(lbs: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic global deal: sort node bounds ascending, assign
    round-robin to partitions (reference: MpiBranchAndBound.cpp:127-144).
    Returns partition index per node."""
    order = np.argsort(lbs, kind="stable")
    part = np.empty(len(lbs), dtype=np.int32)
    part[order] = np.arange(len(lbs)) % n_parts
    return part
