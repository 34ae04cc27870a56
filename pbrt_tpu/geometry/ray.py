"""Rays as SoA pytrees and robust ray spawning.

Counterpart of reference base/ray.h:30-59. The reference carries interval
FP error bounds (Point3fi) through every interaction to offset spawned rays;
our TPU design instead uses a normal-offset proportional to hit-point
magnitude plus the scene epsilon — cheaper per-lane state (no 6 extra floats
per path) and robust in practice for fp32.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.geometry import vecmath as vm


class Rays(NamedTuple):
    o: jnp.ndarray  # (..., 3)
    d: jnp.ndarray  # (..., 3)


def offset_ray_origin(p, n, w, scale=1e-4):
    """Offset p along ±n to avoid self-intersection; direction of offset
    chosen by the side w leaves on (reference ray.h offset_ray_origin)."""
    mag = jnp.max(jnp.abs(p), axis=-1, keepdims=True)
    eps = scale * jnp.maximum(mag, 1.0)
    n_off = jnp.where(vm.dot(n, w)[..., None] < 0.0, -n, n)
    return p + n_off * eps


def spawn_ray(p, n, w, scale=1e-4):
    return Rays(o=offset_ray_origin(p, n, w, scale), d=w)
