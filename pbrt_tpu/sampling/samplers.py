"""Samplers: per-lane PCG32 streams seeded like the reference.

IndependentSampler (reference samplers/independent.h:7-38):
  start_pixel_sample: rng.set_sequence(hash(pixel_idx));
                      rng.advance(sample_idx * 65536 + dimension)
  get_1d/get_2d: raw PCG32 uniforms.

StratifiedSampler (reference samplers/stratified.h:8-70): same PCG32 stream
for jitter, but each dimension picks its stratum with a correlated shuffle
keyed by hash(pixel_idx, dimension); requires square spp.

TPU design: a `Sampler` is a SoA pytree of (R,)-shaped lanes: the PCG32
limbs plus (pixel, sample, dimension) counters needed by the stratified
variant. The *kind* is host-static and passed as a string, so jitted code
specializes per sampler — the reference's tagged-union dispatch
(base/sampler.h:12-71) becomes a compile-time branch.

Masked draws: `get_1d(s, mask=...)` only advances lanes where mask is true
so per-lane streams stay aligned with the reference's conditional draws.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.sampling import rng as prng


class Sampler(NamedTuple):
    state: prng.U64   # PCG32 state limbs, (R,)
    inc: prng.U64     # PCG32 stream limbs, (R,)
    pixel: jnp.ndarray    # (R,) u32
    sample: jnp.ndarray   # (R,) u32
    dim: jnp.ndarray      # (R,) u32
    # primary-sample-space vector for the MLT sampler (samplers/mlt.h):
    # kind == "mlt" reads X[lane, dim] instead of the PCG32 stream; None for
    # the ordinary samplers (a static pytree distinction)
    mlt_x: object = None


def start_pixel_sample(pixel_idx, sample_idx, dimension=0):
    """pixel_idx, sample_idx: (R,) int -> Sampler lanes."""
    px = jnp.asarray(pixel_idx, jnp.uint32)
    seq = prng.hash_int(px)
    r = prng.from_seed(seq)
    si = jnp.asarray(sample_idx, jnp.uint32)
    # delta = sample_idx * 65536 + dimension (fits: hi = si >> 16)
    delta = prng.U64(si >> 16, (si << 16) + jnp.uint32(dimension))
    r = prng.advance(r, delta)
    return Sampler(
        state=r.state,
        inc=r.inc,
        pixel=px,
        sample=si,
        dim=jnp.full_like(px, jnp.uint32(dimension)),
    )


def _masked(s: Sampler, s2: Sampler, mask):
    if mask is None:
        return s2
    keep = lambda new, old: jnp.where(mask, new, old)
    return Sampler(
        state=prng.U64(keep(s2.state.hi, s.state.hi), keep(s2.state.lo, s.state.lo)),
        inc=s.inc,
        pixel=s.pixel,
        sample=s.sample,
        dim=keep(s2.dim, s.dim),
        mlt_x=s.mlt_x,
    )


def from_primary_samples(x):
    """MLT sampler over a mutated primary-sample vector x (R, D). Overflow
    dims (beyond D) fall back to a PCG32 stream keyed by the lane."""
    R = x.shape[0]
    lanes = jnp.arange(R, dtype=jnp.uint32)
    base = start_pixel_sample(lanes, jnp.zeros((R,), jnp.uint32))
    return base._replace(mlt_x=x)


def _uniform(s: Sampler):
    r = prng.Pcg32(s.state, s.inc)
    r2, u = prng.uniform_float(r)
    return s._replace(state=r2.state), u


def get_1d(s: Sampler, mask=None, kind="independent", spp=0):
    if kind == "mlt":
        D = s.mlt_x.shape[1]
        idx = jnp.minimum(s.dim.astype(jnp.int32), D - 1)
        u_x = jnp.take_along_axis(s.mlt_x, idx[:, None], axis=1)[:, 0]
        s2, u_rng = _uniform(s)  # overflow fallback (keeps streams aligned)
        u = jnp.where(s.dim < D, u_x, u_rng)
        s2 = s2._replace(dim=s.dim + jnp.uint32(1))
        return _masked(s, s2, mask), u
    if kind == "independent":
        s2, u = _uniform(s)
        s2 = s2._replace(dim=s.dim + jnp.uint32(1))
    elif kind == "stratified":
        h = prng.hash_2int(s.pixel, s.dim).lo
        stratum = permutation_element(s.sample, spp, h)
        s2, delta = _uniform(s)
        s2 = s2._replace(dim=s.dim + jnp.uint32(1))
        u = (stratum.astype(jnp.float32) + delta) / spp
    else:
        raise ValueError(f"sampler kind {kind!r}")
    return _masked(s, s2, mask), u


def get_2d(s: Sampler, mask=None, kind="independent", spp=0):
    if kind == "mlt":
        s, u1 = get_1d(s, mask, kind, spp)
        s, u2 = get_1d(s, mask, kind, spp)
        return s, jnp.stack([u1, u2], axis=-1)
    if kind == "independent":
        s1, u1 = _uniform(s)
        s2, u2 = _uniform(s1)
        s2 = s2._replace(dim=s.dim + jnp.uint32(2))
        u = jnp.stack([u1, u2], axis=-1)
    elif kind == "stratified":
        # one stratum for both axes (stratified.h get_2d)
        sqrt_spp = int(round(spp ** 0.5))
        h = prng.hash_2int(s.pixel, s.dim).lo
        stratum = permutation_element(s.sample, spp, h)
        s1, dx = _uniform(s)
        s2, dy = _uniform(s1)
        s2 = s2._replace(dim=s.dim + jnp.uint32(2))
        x = (stratum % sqrt_spp).astype(jnp.float32)
        y = (stratum // sqrt_spp).astype(jnp.float32)
        u = jnp.stack([(x + dx) / sqrt_spp, (y + dy) / sqrt_spp], axis=-1)
    else:
        raise ValueError(f"sampler kind {kind!r}")
    return _masked(s, s2, mask), u


def get_pixel_2d(s: Sampler, mask=None, kind="independent", spp=0):
    return get_2d(s, mask, kind, spp)


def validate_spp(kind, spp):
    """stratified requires square spp (stratified.h:13-16)."""
    if kind == "stratified" and int(round(spp ** 0.5)) ** 2 != spp:
        raise ValueError(f"stratified sampler needs square spp, got {spp}")


# ------------------------------------------------------------- stratified


def permutation_element(i, l, p):
    """Correlated-shuffle permutation (reference util/permutation.h), with
    the rejection loop bounded statically: each do-while iteration lands
    uniformly in [0, w] with w+1 >= l rounded to a power of two, so 16
    fixed iterations keeping the first in-range result covers the tail
    with probability 1 - 2^-16 per lane.

    i: (R,) u32 index; l: scalar int; p: (R,) u32 hash.
    """
    l_int = int(l)
    w_int = l_int - 1
    for shift in [1, 2, 4, 8, 16]:
        w_int |= w_int >> shift
    l = jnp.uint32(l_int)
    w = jnp.uint32(w_int)

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
