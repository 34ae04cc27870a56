"""Samplers: per-lane PCG32 streams seeded like the reference.

IndependentSampler (reference samplers/independent.h:7-38):
  start_pixel_sample: rng.set_sequence(hash(pixel_idx));
                      rng.advance(sample_idx * 65536 + dimension)
StratifiedSampler (reference samplers/stratified.h): adds per-dimension
stratum permutation on top of the same stream.

Masked draws: `draw_1d(rng, mask)` only advances lanes where mask is true so
per-lane streams stay aligned with the reference's conditional draws.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.sampling import rng as prng


def start_pixel_sample(pixel_idx, sample_idx, dimension=0):
    """pixel_idx, sample_idx: (R,) int32 -> Pcg32 lane states."""
    px = jnp.asarray(pixel_idx, jnp.uint32)
    seq = prng.hash_int(px)
    r = prng.from_seed(seq)
    si = jnp.asarray(sample_idx, jnp.uint32)
    # delta = sample_idx * 65536 + dimension (fits: hi = si >> 16)
    delta = prng.U64(si >> 16, (si << 16) + jnp.uint32(dimension))
    return prng.advance(r, delta)


def get_1d(r, mask=None):
    r2, u = prng.uniform_float(r)
    if mask is None:
        return r2, u
    keep = lambda new, old: jnp.where(mask, new, old)
    r3 = prng.Pcg32(
        prng.U64(keep(r2.state.hi, r.state.hi), keep(r2.state.lo, r.state.lo)), r.inc
    )
    return r3, u


def get_2d(r, mask=None):
    r, u1 = get_1d(r, mask)
    r, u2 = get_1d(r, mask)
    return r, jnp.stack([u1, u2], axis=-1)


# ------------------------------------------------------------- stratified


def permutation_element(i, l, p):
    """Correlated-shuffle permutation (reference util/permutation.h), with
    the rejection loop bounded statically: l is a power-of-2-rounded domain
    so w+1 >= l and each do-while iteration lands uniformly in [0, w] —
    iterate a fixed 8 times keeping the first in-range result.

    i: (R,) u32 index; l: scalar int; p: (R,) u32 hash.
    """
    l = jnp.uint32(l)
    w = jnp.uint32(int(l) - 1)
    for shift in [1, 2, 4, 8, 16]:
        w = w | (w >> shift)

    def scramble(i):
        i = i ^ p
        i = i * jnp.uint32(0xE170893D)
        i = i ^ (p >> 16)
        i = i ^ ((i & w) >> 4)
        i = i ^ (p >> 8)
        i = i * jnp.uint32(0x0929EB3F)
        i = i ^ (p >> 23)
        i = i ^ ((i & w) >> 1)
        i = i * (jnp.uint32(1) | (p >> 27))
        i = i * jnp.uint32(0x6935FA69)
        i = i ^ ((i & w) >> 11)
        i = i * jnp.uint32(0x74DCB303)
        i = i ^ ((i & w) >> 2)
        i = i * jnp.uint32(0x9E501CC3)
        i = i ^ ((i & w) >> 2)
        i = i * jnp.uint32(0xC860A3DF)
        i = i & w
        i = i ^ (i >> 5)
        return i

    i = jnp.asarray(i, jnp.uint32)
    done = jnp.zeros(i.shape, bool)
    out = i
    cur = i
    for _ in range(16):  # do-while with expected <2 iterations; 16 covers tails
        cur = scramble(cur)
        ok = (cur < l) & ~done
        out = jnp.where(ok, cur, out)
        done = done | ok
    return (out + p) % l
