"""Convex benchmark suite sanity (models/convex_suite.py): generators
build, exact-optimum oracles are deterministic, and the solver matches
the oracle on the two quickest instances (the full 14-row evidence on
real hardware lives in SWEEP_r4.md / scripts/tpu_sweep.py)."""

import numpy as np
import pytest

from minotaur_tpu.models.convex_suite import SUITE
from minotaur_tpu.utils.environment import Environment


def test_suite_registry_complete():
    # 14 original families + 15 round-5 rows (convex_suite2: stockcycle/
    # sssd/portcard/clay/rsyn/st_e14 x2 seeds + 3 dense-wall n>=1000)
    assert len(SUITE) == 29
    for name, (gen, opt, fam) in SUITE.items():
        p = gen()
        assert p.n_vars > 0
        if p.n_vars > 400:
            continue   # n>=1000 oracles (DP over wide budgets) are slow;
            # their determinism + correctness is exercised by the sweep
        v = opt()
        assert np.isfinite(v)
        assert v == pytest.approx(opt(), abs=0.0)   # deterministic


@pytest.mark.parametrize("name", ["gbd_a", "batchdes_a", "uflquad_3x6a"])
def test_solver_matches_oracle(name):
    from minotaur_tpu.bnb.bnb import BranchAndBound
    gen, opt, _fam = SUITE[name]
    env = Environment()
    env.set_option("log_level", 0)
    env.set_option("node_batch", 4)
    bab = BranchAndBound(gen(), env)
    st = bab.solve()
    assert st.name == "SOLVED_OPTIMAL"
    assert bab.ub == pytest.approx(opt(), abs=1e-5)
