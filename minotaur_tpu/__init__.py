"""minotaur-tpu: a TPU-native MINLP branch-and-cut framework.

A from-scratch re-design of the capabilities of Minotaur
(ShahPranay/minotaur) for TPU hardware: relaxations solve as batched dense
interior-point KKT systems under vmap/jit, bound tightening is vectorized
interval propagation, and the branch-and-bound node pool is an array batch
that shards across a jax device mesh.
"""

from . import utils  # noqa: F401

__version__ = "0.1.0"


def enable_x64() -> None:
    """Optimization at 1e-6 gaps wants float64; call before any jax use."""
    import jax
    jax.config.update("jax_enable_x64", True)


enable_x64()
