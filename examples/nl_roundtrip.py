"""Example: read a .nl instance, write it back, re-read, compare.

Reference analogue: examples/nlwriter (NlWriter demo).

    python examples/nl_roundtrip.py [instance.nl]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT = "/root/reference/test_instances/nvs08.nl"


def main(path=DEFAULT):
    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.io.nl_writer import write_nl

    p = read_nl(path)
    print("read:", p)
    with tempfile.NamedTemporaryFile(suffix=".nl", delete=False) as f:
        out = f.name
    write_nl(p, out)
    p2 = read_nl(out)
    print("round-tripped:", p2)
    x = np.where(np.isfinite(p.var_bounds()[0]),
                 np.nan_to_num(p.var_bounds()[0]), 0.0) + 0.25
    f1 = p.eval_objective(x)
    f2 = p2.eval_objective(x)
    print(f"objective at a probe point: {f1:.8g} vs {f2:.8g}")
    assert abs(f1 - f2) < 1e-8
    os.unlink(out)
    return p2


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [DEFAULT]))
