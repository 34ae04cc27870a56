"""PCG32 as a pure function of per-lane state — bit-exact with the reference
RNG (src/pbrt/util/rng.h:25-68) but expressed TPU-natively: state is a pytree
of `(..., )` uint32 limb arrays (TPU has no native 64-bit ints), and every op
is vectorized over lanes on the VPU.

Also provides MixBits (SplitMix64 finalizer, rng.h:15-22) and MurmurHash64A
for small fixed-size keys (util/hash.h) used for sampler seeding.
"""
from typing import NamedTuple

import jax.numpy as jnp
import jax

U32 = jnp.uint32
MASK16 = jnp.uint32(0xFFFF)


class U64(NamedTuple):
    """64-bit unsigned integer as two uint32 limbs."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def u64(hi, lo):
    return U64(jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def u64_const(v, like=None):
    hi = jnp.uint32((v >> 32) & 0xFFFFFFFF)
    lo = jnp.uint32(v & 0xFFFFFFFF)
    if like is not None:
        hi = jnp.broadcast_to(hi, like.shape)
        lo = jnp.broadcast_to(lo, like.shape)
    return U64(hi, lo)


def u64_from_u32(x):
    x = jnp.asarray(x, U32)
    return U64(jnp.zeros_like(x), x)


def add64(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(U32)
    return U64(a.hi + b.hi + carry, lo)


def mul32_64(a, b):
    """Full 32x32 -> 64 product of uint32 arrays."""
    al, ah = a & MASK16, a >> 16
    bl, bh = b & MASK16, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | ((t & MASK16) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return U64(hi, lo)


def mul64(a: U64, b: U64) -> U64:
    """64x64 -> low 64 bits."""
    p = mul32_64(a.lo, b.lo)
    hi = p.hi + a.lo * b.hi + a.hi * b.lo
    return U64(hi, p.lo)


def xor64(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def shr64(a: U64, n: int) -> U64:
    """Logical right shift by a static amount."""
    if n == 0:
        return a
    if n >= 32:
        return U64(jnp.zeros_like(a.hi), a.hi >> (n - 32) if n > 32 else a.hi)
    return U64(a.hi >> n, (a.lo >> n) | (a.hi << (32 - n)))


def shl64(a: U64, n: int) -> U64:
    if n == 0:
        return a
    if n >= 32:
        return U64(a.lo << (n - 32) if n > 32 else a.lo, jnp.zeros_like(a.lo))
    return U64((a.hi << n) | (a.lo >> (32 - n)), a.lo << n)


def or64(a: U64, b: U64) -> U64:
    return U64(a.hi | b.hi, a.lo | b.lo)


def select64(pred, a: U64, b: U64) -> U64:
    return U64(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def mix_bits(v: U64) -> U64:
    """SplitMix64 finalizer (reference rng.h:15-22)."""
    v = xor64(v, shr64(v, 31))
    v = mul64(v, u64_const(0x7FB5D329728EA185))
    v = xor64(v, shr64(v, 27))
    v = mul64(v, u64_const(0x81DADEF4BC2DD44D))
    v = xor64(v, shr64(v, 33))
    return v


# ----------------------------------------------------------------- PCG32

PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D
ONE_MINUS_EPSILON_F32 = jnp.float32(0.99999994)


class Pcg32(NamedTuple):
    """Per-lane PCG32 state; each field (..., ) uint32."""

    state: U64
    inc: U64


def _step(rng: Pcg32):
    """One PCG32 step; returns (new_rng, uint32 output)."""
    old = rng.state
    new_state = add64(mul64(old, u64_const(PCG32_MULT, like=old.lo)), rng.inc)
    xorshifted64 = shr64(xor64(shr64(old, 18), old), 27)
    xorshifted = xorshifted64.lo
    rot = old.hi >> 27  # == (old >> 59) & 31
    out = (xorshifted >> rot) | (xorshifted << ((-rot.astype(jnp.int32)).astype(U32) & U32(31)))
    return Pcg32(new_state, rng.inc), out


def set_sequence(seq: U64, offset: U64) -> Pcg32:
    """reference rng.h set_sequence(sequenceIndex, offset)."""
    zero = U64(jnp.zeros_like(seq.lo), jnp.zeros_like(seq.lo))
    inc = or64(shl64(seq, 1), u64_const(1, like=seq.lo))
    rng = Pcg32(zero, inc)
    rng, _ = _step(rng)
    rng = Pcg32(add64(rng.state, offset), rng.inc)
    rng, _ = _step(rng)
    return rng


def from_seed(seq: U64) -> Pcg32:
    """set_sequence(seq, MixBits(seq)) (reference rng.h:44-46)."""
    return set_sequence(seq, mix_bits(seq))


def uniform_u32(rng: Pcg32):
    return _step(rng)


def uniform_float(rng: Pcg32):
    """Uniform in [0, 1): u32 * 2^-32, clamped to OneMinusEpsilon."""
    rng, bits = _step(rng)
    f = bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    return rng, jnp.minimum(f, ONE_MINUS_EPSILON_F32)


def uniform_2d(rng: Pcg32):
    rng, u1 = uniform_float(rng)
    rng, u2 = uniform_float(rng)
    return rng, jnp.stack([u1, u2], axis=-1)


def advance(rng: Pcg32, delta: U64) -> Pcg32:
    """Jump the stream forward by delta in O(64) steps (pcg32 advance)."""
    lo = rng.state.lo

    def one(v):
        return u64_const(1, like=lo)

    def zero64():
        return U64(jnp.zeros_like(lo), jnp.zeros_like(lo))

    def body(i, carry):
        acc_mult, acc_plus, cur_mult, cur_plus, d = carry
        bit = (jnp.where(i < 32, d.lo >> jnp.minimum(i, 31), d.hi >> jnp.minimum(i - 32, 31)) & U32(1)) == U32(1)
        acc_mult = select64(bit, mul64(acc_mult, cur_mult), acc_mult)
        acc_plus = select64(bit, add64(mul64(acc_plus, cur_mult), cur_plus), acc_plus)
        cur_plus = mul64(add64(cur_mult, one(None)), cur_plus)
        cur_mult = mul64(cur_mult, cur_mult)
        return (acc_mult, acc_plus, cur_mult, cur_plus, d)

    init = (
        u64_const(1, like=lo),
        zero64(),
        u64_const(PCG32_MULT, like=lo),
        rng.inc,
        delta,
    )
    acc_mult, acc_plus, _, _, _ = jax.lax.fori_loop(0, 64, body, init)
    return Pcg32(add64(mul64(acc_mult, rng.state), acc_plus), rng.inc)


# ------------------------------------------------------------ MurmurHash64A


def _murmur_round(h: U64, k: U64) -> U64:
    m = u64_const(0xC6A4A7935BD1E995, like=h.lo)
    k = mul64(k, m)
    k = xor64(k, shr64(k, 47))
    k = mul64(k, m)
    h = xor64(h, k)
    h = mul64(h, m)
    return h


def murmur64a_u32_words(words, seed=0):
    """MurmurHash64A of a little-endian byte buffer made of 4-byte words
    (reference util/hash.h:10-70). `words`: list of uint32 arrays.

    Matches hashing of N 4-byte ints: length = 4*len(words).
    """
    n = len(words)
    length = 4 * n
    lo0 = jnp.asarray(words[0], U32)
    h = xor64(u64_const(seed, like=lo0), mul64(u64_const(length, like=lo0), u64_const(0xC6A4A7935BD1E995, like=lo0)))
    m = u64_const(0xC6A4A7935BD1E995, like=lo0)
    i = 0
    while i + 2 <= n:
        k = U64(jnp.asarray(words[i + 1], U32), jnp.asarray(words[i], U32))
        h = _murmur_round(h, k)
        i += 2
    if i < n:  # 4 trailing bytes
        h = xor64(h, u64_from_u32(words[i]))
        h = mul64(h, m)
    h = xor64(h, shr64(h, 47))
    h = mul64(h, m)
    h = xor64(h, shr64(h, 47))
    return h


def hash_int(x):
    """pbrt::hash(int) (util/hash.h:73-80)."""
    return murmur64a_u32_words([x])


def hash_2int(x, y):
    """pbrt::hash(int, int)."""
    return murmur64a_u32_words([x, y])
