"""Discrete sampling distributions.

Counterpart of reference distribution/ (alias_table.cu, distribution_1d,
distribution_2d): O(1) alias-method sampling. Tables are built on the host
(numpy, Vose's algorithm); device sampling is two gathers — ideal for TPU
(no data-dependent loops, constant work per lane).

The 2D distribution over an env-map image is flattened to a single alias
table over texels (equivalent pmf to the reference's marginal+conditional
pair); the intra-texel jitter reuses the alias draw's conditional remainder,
which stays uniform after the accept/reject split.
"""
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


def alias_table_build(values):
    """Host: weights (N,) -> (q (N,), alias (N,), pdf (N,)) float32/int32.
    Vose's O(N) build (reference alias_table.cu:9-104)."""
    values = np.asarray(values, np.float64).reshape(-1)
    n = values.size
    total = values.sum()
    if total <= 0:
        return (np.ones(n, np.float32), np.arange(n, dtype=np.int32),
                np.full(n, 1.0 / n, np.float32))
    pdf = values / total
    scaled = pdf * n
    q = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        q[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in small + large:
        q[i] = 1.0
        alias[i] = i
    return q.astype(np.float32), alias, pdf.astype(np.float32)


def alias_sample(q, alias, u):
    """Device: u (R,) in [0,1) -> (idx (R,), u_remapped (R,)).

    u_remapped is the conditional remainder, uniform in [0,1) given idx —
    reusable for a downstream continuous jitter without a fresh dimension.
    """
    n = q.shape[0]
    x = u * n
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
    frac = x - i.astype(jnp.float32)
    qi = q[i]
    accept = frac < qi
    idx = jnp.where(accept, i, alias[i])
    u2 = jnp.where(accept, frac / jnp.maximum(qi, 1e-12),
                   (frac - qi) / jnp.maximum(1.0 - qi, 1e-12))
    return idx, jnp.clip(u2, 0.0, 1.0 - 1e-7)


class EnvDistribution(NamedTuple):
    """Flat alias table over env-map texels (one per image-infinite light)."""

    q: jnp.ndarray       # (TOTAL,)
    alias: jnp.ndarray   # (TOTAL,) i32
    pdf: jnp.ndarray     # (TOTAL,) texel pmf


def build_env_distribution(luminance, ignore_ratio=0.001):
    """Host: (H, W) luminance -> alias arrays, thresholding tiny pixels to 0
    (reference image_infinite_light.cu:44-56)."""
    lum = np.asarray(luminance, np.float64)
    thr = ignore_ratio * lum.max()
    lum = np.where(lum < thr, 0.0, lum)
    if lum.sum() <= 0:
        raise ValueError("env map with all-zero luminance")
    q, alias, pdf = alias_table_build(lum.reshape(-1))
    return q, alias, pdf
