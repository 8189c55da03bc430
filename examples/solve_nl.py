"""Example: read a .nl instance and solve it with each solver stack.

    python examples/solve_nl.py /root/reference/test_instances/nvs08.nl
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(path):
    import jax
    jax.config.update("jax_enable_x64", True)
    from minotaur_tpu.io.nl_reader import read_nl
    from minotaur_tpu.utils.environment import Environment
    from minotaur_tpu.bnb.bnb import BranchAndBound

    p = read_nl(path)
    print(p)
    env = Environment()
    env.set_option("node_batch", 32)
    env.set_option("bnb_time_limit", 300)
    bab = BranchAndBound(p, env)
    status = bab.solve()
    print(f"{status.name}: ub={bab.ub:.8g} lb={bab.lb:.8g} "
          f"nodes={bab.stats.nodes_processed} in {bab.stats.time:.1f}s")
    if bab.best_x is not None:
        print("x* =", bab.best_x)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/test_instances/nvs08.nl")
