"""Multi-controller (multi-process) distributed QG
(reference: MpiBranchAndBound.{h,cpp} + QGMpiMain.cpp; parallel/multihost.py).

The reference never had unit-level MPI tests (SURVEY.md §4) — multi-rank
behavior was tested by actually running mpirun.  Here the controller
processes are real OS processes coordinated over TCP, so the distributed
trajectory is asserted end-to-end on one machine."""

import threading

import numpy as np
import pytest

from minotaur_tpu.parallel.multihost import TcpHostComm, NullComm


def test_null_comm():
    c = NullComm()
    assert c.allgather({"a": 1}) == [{"a": 1}]


def test_tcp_allgather_three_ranks():
    """Star allgather delivers every payload to every rank, in rank
    order, repeatedly (the driver reuses the sockets every round)."""
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    results = {}

    def run(rank):
        comm = TcpHostComm(rank, 3, coord)
        try:
            for rnd in range(3):
                out = comm.allgather((rank, rnd, np.arange(rank + 1)))
                results[(rank, rnd)] = out
        finally:
            comm.close()

    threads = [threading.Thread(target=run, args=(r,)) for r in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for rank in range(3):
        for rnd in range(3):
            out = results[(rank, rnd)]
            assert [o[0] for o in out] == [0, 1, 2]
            assert all(o[1] == rnd for o in out)
            assert np.array_equal(out[2][2], np.arange(3))


@pytest.mark.slow
def test_two_controller_processes_solve_knapsack():
    """Two OS processes, process-local pools, TCP-coordinated balance
    rounds: both reach the DP-verified optimum, both process real work,
    and nodes actually migrate (the LoadBalance_/termination semantics
    of MpiBranchAndBound.cpp:78-195,388-449)."""
    import os
    import tempfile

    from minotaur_tpu.io.nl_writer import write_nl
    from minotaur_tpu.models.generators import (correlated_knapsack,
                                                knapsack_dp_optimum)
    from minotaur_tpu.parallel.multihost import spawn_local

    inst = os.path.join(tempfile.gettempdir(), "mh_cknap30.nl")
    write_nl(correlated_knapsack(30, 1), inst)
    dp = knapsack_dp_optimum(30, 1)
    results = spawn_local(inst, 2, {"log_level": 0, "node_batch": 16,
                                    "lb_frequency": 3})
    assert len(results) == 2
    for r in results:
        assert r["status"] == "SOLVED_OPTIMAL"
        assert r["ub"] == pytest.approx(dp, rel=1e-9)
        assert r["lb"] == pytest.approx(dp, rel=1e-9)
        assert r["processed"] > 0
        assert r["rounds"] >= 1
    # the ranks agree on the global accounting and nodes migrated
    assert results[0]["per_rank"] == results[1]["per_rank"]
    assert sum(r["migrated_in"] for r in results) > 0
