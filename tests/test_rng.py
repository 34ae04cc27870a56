"""Bit-exactness tests for the limb-based PCG32 / MurmurHash (SURVEY §4:
'PCG32 bit-exactness')."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.sampling import rng as prng

M64 = (1 << 64) - 1


class PyPcg32:
    """Straightforward python-int PCG32 (O'Neill reference semantics,
    matching src/pbrt/util/rng.h)."""

    MULT = 0x5851F42D4C957F2D

    def __init__(self):
        self.state = 0x853C49E6748FEA9B
        self.inc = 0xDA3E39CB94B95BDB

    def set_sequence(self, seq, offset):
        self.state = 0
        self.inc = ((seq << 1) | 1) & M64
        self.u32()
        self.state = (self.state + offset) & M64
        self.u32()

    def u32(self):
        old = self.state
        self.state = (old * self.MULT + self.inc) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def advance(self, delta):
        acc_mult, acc_plus = 1, 0
        cur_mult, cur_plus = self.MULT, self.inc
        while delta > 0:
            if delta & 1:
                acc_mult = (acc_mult * cur_mult) & M64
                acc_plus = (acc_plus * cur_mult + cur_plus) & M64
            cur_plus = ((cur_mult + 1) * cur_plus) & M64
            cur_mult = (cur_mult * cur_mult) & M64
            delta >>= 1
        self.state = (acc_mult * self.state + acc_plus) & M64


def py_mixbits(v):
    v ^= v >> 31
    v = (v * 0x7FB5D329728EA185) & M64
    v ^= v >> 27
    v = (v * 0x81DADEF4BC2DD44D) & M64
    v ^= v >> 33
    return v


def py_murmur64a_words(words, seed=0):
    m = 0xC6A4A7935BD1E995
    r = 47
    n = len(words)
    length = 4 * n
    h = (seed ^ ((length * m) & M64)) & M64
    i = 0
    while i + 2 <= n:
        k = words[i] | (words[i + 1] << 32)
        k = (k * m) & M64
        k ^= k >> r
        k = (k * m) & M64
        h ^= k
        h = (h * m) & M64
        i += 2
    if i < n:
        h ^= words[i]
        h = (h * m) & M64
    h ^= h >> r
    h = (h * m) & M64
    h ^= h >> r
    return h


def to_int(u64):
    return (np.asarray(u64.hi, dtype=np.uint64).astype(object) << 32) | np.asarray(
        u64.lo, dtype=np.uint64
    ).astype(object)


def test_mixbits_matches():
    vals = [0, 1, 12345, 0xDEADBEEFCAFEBABE, M64]
    hi = jnp.asarray([v >> 32 for v in vals], jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], jnp.uint32)
    got = prng.mix_bits(prng.U64(hi, lo))
    expect = [py_mixbits(v) for v in vals]
    assert list(to_int(got)) == expect


def test_pcg32_stream_matches_reference():
    seqs = [0, 1, 777, 0xABCDEF]
    offs = [py_mixbits(s) for s in seqs]
    hi = jnp.asarray([s >> 32 for s in seqs], jnp.uint32)
    lo = jnp.asarray([s & 0xFFFFFFFF for s in seqs], jnp.uint32)
    r = prng.from_seed(prng.U64(hi, lo))
    outs = []
    for _ in range(16):
        r, o = prng.uniform_u32(r)
        outs.append(np.asarray(o))
    outs = np.stack(outs, axis=1)  # (4, 16)

    for i, (s, off) in enumerate(zip(seqs, offs)):
        py = PyPcg32()
        py.set_sequence(s, off)
        expect = [py.u32() for _ in range(16)]
        assert list(outs[i].astype(int)) == expect


def test_pcg32_advance_matches():
    py = PyPcg32()
    py.set_sequence(42, py_mixbits(42))
    py.advance(3 * 65536 + 7)
    expect = [py.u32() for _ in range(4)]

    seq = prng.u64_const(42)
    r = prng.from_seed(prng.U64(jnp.broadcast_to(seq.hi, (1,)), jnp.broadcast_to(seq.lo, (1,))))
    r = prng.advance(r, prng.u64_const(3 * 65536 + 7, like=r.state.lo))
    got = []
    for _ in range(4):
        r, o = prng.uniform_u32(r)
        got.append(int(np.asarray(o)[0]))
    assert got == expect


def test_uniform_float_range():
    r = prng.from_seed(prng.u64(jnp.zeros(1024, jnp.uint32), jnp.arange(1024, dtype=jnp.uint32)))
    r, f = prng.uniform_float(r)
    f = np.asarray(f)
    assert f.min() >= 0.0 and f.max() < 1.0
    assert 0.4 < f.mean() < 0.6


def test_murmur_matches():
    xs = [0, 1, 54321, 0xFFFFFFFF]
    got1 = prng.hash_int(jnp.asarray(xs, jnp.uint32))
    expect1 = [py_murmur64a_words([x]) for x in xs]
    assert list(to_int(got1)) == expect1

    got2 = prng.hash_2int(
        jnp.asarray(xs, jnp.uint32), jnp.asarray([9, 8, 7, 6], jnp.uint32)
    )
    expect2 = [py_murmur64a_words([x, y]) for x, y in zip(xs, [9, 8, 7, 6])]
    assert list(to_int(got2)) == expect2
