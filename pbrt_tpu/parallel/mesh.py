"""Device-mesh construction and sharding specs for the renderer.

The reference is single-GPU (SURVEY.md §2.7); its only parallel axis is
"paths on one chip". Here the path/pixel lane grid is sharded over a 2D
`jax.sharding.Mesh`:

  axis "dp"  — pixels (data parallel over the image plane / path pool)
  axis "sp"  — samples-per-pixel (independent Monte-Carlo replicates)

The scene pytree is replicated (it is small and read-only per pass); the
film lives replicated too and XLA turns the sharded scatter-adds into a
psum over ICI at the end of the pass — the only cross-chip traffic, as
planned in SURVEY.md §5 (distributed backend row).
"""
import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor2(n):
    """Split n = sp * dp with sp the largest divisor <= sqrt(n)."""
    sp = 1
    for d in range(1, int(math.isqrt(n)) + 1):
        if n % d == 0:
            sp = d
    return sp, n // sp


def make_mesh(devices=None):
    """2D mesh ("sp", "dp") over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    sp, dp = factor2(len(devices))
    import numpy as np

    return Mesh(np.asarray(devices).reshape(sp, dp), ("sp", "dp"))


def lane_sharding(mesh):
    """Sharding for a (S, R) lane grid: samples x pixels."""
    return NamedSharding(mesh, P("sp", "dp"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_scene(scene, mesh):
    """Replicate the scene pytree onto every device of the mesh."""
    rep = replicated(mesh)
    return jax.device_put(scene, rep)
