"""Native tree store + checkpoint/resume + distributed pool tests.

Reference analogues: NodeHeap ordering tests, SerializeUT round-trip
(SerializeUT.cpp:50-60 — here the 'serializer' is np.savez of dense
arrays), and mpi_test.sh (here: an in-process 8-device mesh)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
from jax.sharding import Mesh

from minotaur_tpu.bnb.bnb import BranchAndBound
from minotaur_tpu.bnb.checkpoint import load_checkpoint, save_checkpoint
from minotaur_tpu.io.nl_reader import read_nl
from minotaur_tpu.parallel.dist_bnb import DistBranchAndBound
from minotaur_tpu.parallel.pool import deal_round_robin
from minotaur_tpu.utils.environment import Environment
from minotaur_tpu.utils.types import SolveStatus

from conftest import REF_INSTANCES, REF_TEST_INSTANCES


def _scal(native, nid, depth, lb, bvar=-1, has_x=0, has_y=0):
    s = np.zeros(native.N_SCALARS)
    s[native.SCAL_NID] = nid
    s[native.SCAL_DEPTH] = depth
    s[native.SCAL_LB] = lb
    s[native.SCAL_BVAR] = bvar
    s[native.SCAL_HAS_X] = has_x
    s[native.SCAL_HAS_Y] = has_y
    return s


def test_native_treestore_roundtrip():
    native = pytest.importorskip("minotaur_tpu.native")
    ts = native.NativeTreeStore(3, m=2, order=2)
    for k in range(10):
        ts.push(_scal(native, k, k % 3, float(10 - k), bvar=k % 2,
                      has_x=1, has_y=1),
                np.full(3, -k), np.full(3, k), np.arange(3.0) * k,
                np.full(2, 0.5 * k))
    assert len(ts) == 10
    assert ts.best_lb() == pytest.approx(1.0)
    got, pruned, scal, vlb, vub, wx, wy = ts.pop_batch(4)
    assert got == 4
    np.testing.assert_allclose(scal[:, native.SCAL_LB],
                               [1.0, 2.0, 3.0, 4.0])      # best-first
    np.testing.assert_allclose(vub[0], 9.0)               # slab contents
    np.testing.assert_allclose(wy[0], 4.5)                # dual slab
    assert ts.prune(8.5) == 2
    got, pruned, *_ = ts.pop_batch(10, cutoff=7.5)
    assert got == 3 and pruned == 1


def test_native_treestore_batch_push():
    native = pytest.importorskip("minotaur_tpu.native")
    n, k = 5, 7
    ts = native.NativeTreeStore(n, m=1)
    scal = np.stack([_scal(native, i, 0, float(k - 1 - i))
                     for i in range(k)])
    ts.push_batch(scal, np.tile(np.arange(n, dtype=float), (k, 1)),
                  np.full((k, n), 9.0), np.zeros((k, n)),
                  np.zeros((k, 1)))
    got, _, scal2, vlb, *_rest = ts.pop_batch(k)
    assert got == k
    np.testing.assert_allclose(vlb[0], np.arange(n))


def test_native_tree_manager_matches_python():
    """Driver equivalence: the native-backed tree and the python heap
    produce the same optimum and node count on nvs08 (the store is a
    drop-in; search order is identical)."""
    from minotaur_tpu.bnb.bnb import BranchAndBound
    results = []
    for native_tree in (0, 1):
        p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
        env = Environment()
        env.set_option("node_batch", 8)
        env.set_option("native_tree", native_tree)
        env.set_option("log_level", 1)
        bab = BranchAndBound(p, env)
        st = bab.solve()
        assert st == SolveStatus.SOLVED_OPTIMAL
        if native_tree:
            from minotaur_tpu.bnb.tree import NativeTreeManager
            assert isinstance(bab.tm, NativeTreeManager)
        results.append((round(bab.ub, 6), bab.stats.nodes_processed))
    assert results[0] == results[1]


def test_checkpoint_roundtrip(tmp_path):
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "color_lab2_4x0.nl"))
    env = Environment()
    env.set_option("node_batch", 8)
    env.set_option("bnb_node_limit", 16)
    env.set_option("log_level", 1)
    bab = BranchAndBound(p, env)
    bab.solve()
    lb1 = bab.lb
    ck = str(tmp_path / "state.npz")
    save_checkpoint(ck, bab)

    env2 = Environment()
    env2.set_option("node_batch", 8)
    env2.set_option("bnb_node_limit", 16)
    env2.set_option("log_level", 1)
    env2.set_option("checkpoint_file", ck)
    env2.set_option("resume", True)
    bab2 = BranchAndBound(
        read_nl(os.path.join(REF_TEST_INSTANCES, "color_lab2_4x0.nl")), env2)
    bab2.solve()
    # resumed search continues: bound monotone, node ids do not clash
    assert bab2.lb >= lb1 - 1e-9


def test_deal_round_robin_balanced():
    lbs = np.array([5.0, 1.0, 3.0, 2.0, 4.0, 0.0, 7.0, 6.0])
    parts = deal_round_robin(lbs, 4)
    # each partition gets 2 nodes; the two best go to different parts
    counts = np.bincount(parts, minlength=4)
    np.testing.assert_array_equal(counts, [2, 2, 2, 2])
    assert parts[np.argmin(lbs)] != parts[np.argsort(lbs)[1]]


def test_distributed_bnb_mesh():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("nodes",))
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "nvs08.nl"))
    env = Environment()
    env.set_option("node_batch", 16)
    env.set_option("log_level", 1)
    bab = DistBranchAndBound(p, mesh, env)
    status = bab.solve()
    assert status == SolveStatus.SOLVED_OPTIMAL
    expected = 2.0 + (4.0 + 5.0 ** (-2.0 / 7.0)) ** 2
    assert bab.ub == pytest.approx(expected, abs=1e-5)


def test_checkpoint_qg_cut_pool(tmp_path):
    """QG checkpoints include the cut pool (SerializeUT analogue for the
    fork's wire format — here cuts round-trip through np.savez)."""
    from minotaur_tpu.bnb.qg import QGBranchAndBound
    p = read_nl(os.path.join(REF_TEST_INSTANCES, "tls4.nl"))
    env = Environment()
    env.set_option("node_batch", 4)
    env.set_option("bnb_node_limit", 2)
    env.set_option("qg_max_cuts", 64)
    env.set_option("log_level", 1)
    bab = QGBranchAndBound(p, env)
    bab.solve()
    assert bab.n_cuts > 0
    ck = str(tmp_path / "qg.npz")
    save_checkpoint(ck, bab)

    env2 = Environment()
    env2.set_option("node_batch", 4)
    env2.set_option("qg_max_cuts", 64)
    env2.set_option("log_level", 1)
    bab2 = QGBranchAndBound(
        read_nl(os.path.join(REF_TEST_INSTANCES, "tls4.nl")), env2)
    load_checkpoint(ck, bab2)
    assert bab2.n_cuts == bab.n_cuts
    np.testing.assert_allclose(
        bab2.mA[bab2._cut_base:bab2._cut_base + bab2.n_cuts],
        bab.mA[bab._cut_base:bab._cut_base + bab.n_cuts])
