"""Stage an ExprGraph into straight-line jnp code.

This is the TPU replacement for the reference's interpreted DAG walks
(reference: CGraph::eval CGraph.h:57, grad_ :237, evalHessian :63).  The
table is unrolled *once* at trace time into pure jnp ops; XLA fuses the
straight-line code, jax.grad/jax.hessian provide derivatives (instead of
the reference's hand-written forward/reverse sweeps), and everything vmaps
across points — which is how a whole node batch evaluates in one kernel.

Domain guards: unary functions with restricted domains (sqrt, log, acosh,
asin, ...) clamp their argument to the domain.  IPM iterates stay strictly
inside variable bounds, so the clamps only fire on excursions where the
reference would have produced NaN and failed the engine; clamping keeps the
whole vmapped batch healthy (one bad lane must not poison the others).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Sequence

import numpy as np

from .opcodes import Op

_TINY = 1e-300


def _np_powk(a, k):
    if float(k).is_integer():
        return a ** k
    return np.maximum(a, 0.0) ** k


# Host (numpy) evaluation rules — the correctness oracle used by tests and
# by Problem.is_debug_sol_feas.  Signature: (a, b, const) -> value.
NUMPY_RULES: Dict[Op, Callable] = {
    Op.PLUS: lambda a, b, c: a + b,
    Op.MINUS: lambda a, b, c: a - b,
    Op.MULT: lambda a, b, c: a * b,
    Op.DIV: lambda a, b, c: a / b,
    Op.UMINUS: lambda a, b, c: -a,
    Op.ABS: lambda a, b, c: abs(a),
    Op.SQR: lambda a, b, c: a * a,
    Op.SQRT: lambda a, b, c: math.sqrt(max(a, 0.0)),
    Op.POWK: lambda a, b, c: _np_powk(a, c),
    Op.CPOW: lambda a, b, c: c ** a,
    Op.POW: lambda a, b, c: a ** b,
    Op.EXP: lambda a, b, c: math.exp(min(a, 709.0)),
    Op.LOG: lambda a, b, c: math.log(max(a, _TINY)),
    Op.LOG10: lambda a, b, c: math.log10(max(a, _TINY)),
    Op.SIN: lambda a, b, c: math.sin(a),
    Op.COS: lambda a, b, c: math.cos(a),
    Op.TAN: lambda a, b, c: math.tan(a),
    Op.SINH: lambda a, b, c: math.sinh(a),
    Op.COSH: lambda a, b, c: math.cosh(a),
    Op.TANH: lambda a, b, c: math.tanh(a),
    Op.ASIN: lambda a, b, c: math.asin(min(1.0, max(-1.0, a))),
    Op.ACOS: lambda a, b, c: math.acos(min(1.0, max(-1.0, a))),
    Op.ATAN: lambda a, b, c: math.atan(a),
    Op.ASINH: lambda a, b, c: math.asinh(a),
    Op.ACOSH: lambda a, b, c: math.acosh(max(a, 1.0)),
    Op.ATANH: lambda a, b, c: math.atanh(min(1.0 - 1e-15, max(-1.0 + 1e-15, a))),
    Op.ATAN2: lambda a, b, c: math.atan2(a, b),
    Op.FLOOR: lambda a, b, c: math.floor(a),
    Op.CEIL: lambda a, b, c: math.ceil(a),
    Op.INTDIV: lambda a, b, c: math.trunc(a / b),
    Op.MAX2: lambda a, b, c: max(a, b),
    Op.MIN2: lambda a, b, c: min(a, b),
    Op.REM: lambda a, b, c: math.fmod(a, b),
    Op.LESS: lambda a, b, c: max(a - b, 0.0),
}


def _jnp_rules():
    import jax.numpy as jnp
    from jax import lax

    def powk(a, b, c):
        if float(c).is_integer():
            k = int(c)
            if k >= 0:
                return lax.integer_pow(a, k)
            return lax.integer_pow(a, k)  # negative int power
        return jnp.power(jnp.maximum(a, 0.0), c)

    return {
        Op.PLUS: lambda a, b, c: a + b,
        Op.MINUS: lambda a, b, c: a - b,
        Op.MULT: lambda a, b, c: a * b,
        Op.DIV: lambda a, b, c: a / b,
        Op.UMINUS: lambda a, b, c: -a,
        Op.ABS: lambda a, b, c: jnp.abs(a),
        Op.SQR: lambda a, b, c: a * a,
        Op.SQRT: lambda a, b, c: jnp.sqrt(jnp.maximum(a, 0.0)),
        Op.POWK: powk,
        Op.CPOW: lambda a, b, c: jnp.power(c, a),
        Op.POW: lambda a, b, c: jnp.power(a, b),
        Op.EXP: lambda a, b, c: jnp.exp(jnp.minimum(a, 709.0)),
        Op.LOG: lambda a, b, c: jnp.log(jnp.maximum(a, _TINY)),
        Op.LOG10: lambda a, b, c: jnp.log10(jnp.maximum(a, _TINY)),
        Op.SIN: lambda a, b, c: jnp.sin(a),
        Op.COS: lambda a, b, c: jnp.cos(a),
        Op.TAN: lambda a, b, c: jnp.tan(a),
        Op.SINH: lambda a, b, c: jnp.sinh(a),
        Op.COSH: lambda a, b, c: jnp.cosh(a),
        Op.TANH: lambda a, b, c: jnp.tanh(a),
        Op.ASIN: lambda a, b, c: jnp.arcsin(jnp.clip(a, -1.0, 1.0)),
        Op.ACOS: lambda a, b, c: jnp.arccos(jnp.clip(a, -1.0, 1.0)),
        Op.ATAN: lambda a, b, c: jnp.arctan(a),
        Op.ASINH: lambda a, b, c: jnp.arcsinh(a),
        Op.ACOSH: lambda a, b, c: jnp.arccosh(jnp.maximum(a, 1.0)),
        Op.ATANH: lambda a, b, c: jnp.arctanh(jnp.clip(a, -1.0 + 1e-15, 1.0 - 1e-15)),
        Op.ATAN2: lambda a, b, c: jnp.arctan2(a, b),
        Op.FLOOR: lambda a, b, c: jnp.floor(a),
        Op.CEIL: lambda a, b, c: jnp.ceil(a),
        Op.INTDIV: lambda a, b, c: jnp.trunc(a / b),
        Op.MAX2: lambda a, b, c: jnp.maximum(a, b),
        Op.MIN2: lambda a, b, c: jnp.minimum(a, b),
        Op.REM: lambda a, b, c: jnp.fmod(a, b),
        Op.LESS: lambda a, b, c: jnp.maximum(a - b, 0.0),
    }


_JNP_RULES = None


def stage_scalar(graph) -> Callable:
    """graph -> f(x) where x is a length-n vector (jnp or np array traced
    under jit).  Only nodes reachable from the root are emitted."""
    global _JNP_RULES
    if _JNP_RULES is None:
        _JNP_RULES = _jnp_rules()
    rules = _JNP_RULES
    op, arg1, arg2, const, var = graph.tables
    reach = graph.reachable_from_root()
    root = graph.root
    n = len(op)

    def f(x):
        vals: List = [None] * n
        for i in range(n):
            if not reach[i]:
                continue
            o = Op(op[i])
            if o is Op.NUM:
                vals[i] = const[i]
            elif o is Op.VAR:
                vals[i] = x[var[i]]
            else:
                a = vals[arg1[i]] if arg1[i] >= 0 else None
                b = vals[arg2[i]] if arg2[i] >= 0 else None
                vals[i] = rules[o](a, b, const[i])
        return vals[root]

    return f


def stage_stack(graphs: Sequence) -> Callable:
    """Stage several graphs into one f(x) -> vector of values.

    This is how all nonlinear constraint bodies of a problem evaluate in one
    fused kernel — the staged functions share subexpressions only within a
    graph, but XLA CSEs across them."""
    import jax.numpy as jnp
    fns = [stage_scalar(g) for g in graphs]

    def f(x):
        if not fns:
            return jnp.zeros((0,), dtype=x.dtype)
        return jnp.stack([fn(x) for fn in fns])

    return f
