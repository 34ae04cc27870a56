"""Gather strategies tuned for TPU.

Random row gathers (`table[idx]`) lower to the scalar unit on TPU
(~30 ns/element measured on v5e — see tools/bench_gather.py), which makes
per-lane record assembly the hot spot of the whole renderer. For SMALL
tables (materials, lights, the handful of scene spectra) a one-hot
contraction runs on the MXU/VPU instead and is orders of magnitude faster
at 10^5+ lanes.

Exactness: the one-hot matrix holds only 0.0/1.0, which are exact in every
TPU matmul pass scheme, so float rows come back bit-identical under
Precision.HIGHEST; integer/bool rows round-trip exactly through f32 for
values < 2^24 (indices and flags always are).
"""
import jax
import jax.numpy as jnp

# above this many rows the one-hot contraction's R x N x W work loses to the
# scalar gather; hit-record assembly for big tables packs rows instead
ONE_HOT_MAX_ROWS = 128


def take_rows(table, idx):
    """table (N, ...) indexed by idx (...,) -> table[idx], one-hot-contracted
    when N is small. idx must already be clipped to [0, N)."""
    N = table.shape[0]
    if N == 0 or N > ONE_HOT_MAX_ROWS:
        return table[idx]
    tail_shape = table.shape[1:]
    flat = table.reshape(N, -1)
    dtype = table.dtype
    is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
    vals = flat.astype(jnp.float32)
    idx_flat = idx.reshape(-1)
    oh = (idx_flat[:, None] == jnp.arange(N, dtype=idx_flat.dtype)).astype(
        jnp.float32
    )
    out = jnp.dot(oh, vals, precision=jax.lax.Precision.HIGHEST)
    if is_int:
        out = jnp.round(out)
    out = out.astype(dtype).reshape(idx.shape + tail_shape)
    return out
