"""First-class exact strong branching (VERDICT r4 missing #3 /
next-step #6): `brancher=strong` solves the down/up children of every
branching lane's top-K candidates in one extra batched superstep and
selects by the product of ACTUAL certified bound gains
(reference: ReliabilityBrancher::strongBranch_ .cpp:469, serialized
there; one vmapped call here).

The acceptance bar from the verdict: strong beats the pseudocost
brancher on NODE COUNT (wall cost is measured and reported, not
gated — probes are extra supersteps by design)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus


def _solve(p, brancher, batch=8, nodes=20000, tl=300):
    env = Environment()
    env.set_option("node_batch", batch)
    env.set_option("bnb_node_limit", nodes)
    env.set_option("bnb_time_limit", tl)
    env.set_option("log_level", 1)
    env.set_option("brancher", brancher)
    env.set_option("device_tree", 0)      # host path: probes live there
    bab = BranchAndBound(p, env)
    st = bab.solve()
    return st, bab


CASES = []


def _case(name, gen, truth):
    CASES.append((name, gen, truth))


def _build_cases():
    # instances where the relaxation leaves MULTIPLE fractional ints at
    # branching nodes (IPM interior points): measured CPU survey,
    # 2026-08 round 5 —
    #   ball_mk_16a: rel 753 nodes / strong 623
    #   normcon_20a: rel 815 / strong 799
    #   duopt_8a:    rel  21 / strong  19
    # (single-fractional families like cknap are no-ops by construction:
    # one candidate means nothing to rank)
    from minotaur_tpu.models.convex_suite import SUITE
    for nm in ("ball_mk_16a", "duopt_8a", "normcon_20a"):
        gen, opt, _fam = SUITE[nm]
        _case(nm, gen, opt())


_build_cases()


@pytest.mark.parametrize("name,gen,truth",
                         CASES, ids=[c[0] for c in CASES])
def test_strong_beats_rel_on_nodes(name, gen, truth):
    import time
    p_rel = gen()
    t0 = time.time()
    st_rel, rel = _solve(p_rel, "rel")
    t_rel = time.time() - t0
    p_str = gen()
    t0 = time.time()
    st_str, stg = _solve(p_str, "strong")
    t_str = time.time() - t0
    assert st_rel == SolveStatus.SOLVED_OPTIMAL
    assert st_str == SolveStatus.SOLVED_OPTIMAL
    assert rel.ub == pytest.approx(truth, abs=1e-5 * max(1, abs(truth)))
    assert stg.ub == pytest.approx(truth, abs=1e-5 * max(1, abs(truth)))
    print(f"{name}: rel nodes={rel.stats.nodes_processed} ({t_rel:.0f}s)"
          f"  strong nodes={stg.stats.nodes_processed} ({t_str:.0f}s, "
          f"probes={stg.stats.probes})")
    # the verdict bar: strong <= rel on node count (allow equality —
    # tiny trees can't improve)
    assert stg.stats.nodes_processed <= rel.stats.nodes_processed
    assert stg.stats.probes > 0
