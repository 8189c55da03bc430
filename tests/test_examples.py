"""Smoke-run every example in examples/ (reference ships 22 demo apps;
these are the TPU-native gallery).  Each example exposes main() and is
invoked in-process so conftest's CPU platform pin applies."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_simple_bnb():
    bab = _load("simple_bnb").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19 and bab.best_x is not None


def test_simple_qg():
    bab = _load("simple_qg").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19


def test_simple_glob():
    bab = _load("simple_glob").main(node_batch=4, log_level=1)
    # optimum -4 at (2, 2, 0): -x0*x1 - x2 with x0+x1+2x2 <= 4
    assert bab.ub == pytest.approx(-4.0, abs=1e-4)


def test_outer_approx():
    bab = _load("outer_approx").main(node_batch=4, log_level=1)
    # nearest integer point to (1.3, 2.6) satisfying x0+x1>=2 -> (1, 3)
    assert bab.ub == pytest.approx(0.09 + 0.16, abs=1e-5)


def test_multilinear_demo():
    bab = _load("multilinear_demo").main(node_batch=4, log_level=1)
    assert bab.ub < 1e19


def test_batched_engine():
    res = _load("batched_engine").main(batch=4)
    import numpy as np
    assert np.asarray(res.status).shape == (4,)


def test_nl_roundtrip():
    p2 = _load("nl_roundtrip").main()
    assert p2.n_vars > 0


def test_polynomial_demo():
    poly = _load("polynomial_demo").main()
    assert poly.degree() == 3


def test_checkpoint_resume():
    bab2 = _load("checkpoint_resume").main(log_level=1)
    assert bab2.ub == pytest.approx(23.449673, abs=1e-4)


def test_multistart_demo():
    bab = _load("multistart_demo").main(log_level=1)
    assert bab.ub <= -0.95
