"""Microbenchmark: TPU gather throughput vs batch size, row width, table size.

Informs the BVH memory layout (accel/bvh.py): random row gathers on TPU are
scalar-unit bound, so the traversal wants FEW, WIDE gathers (packed node and
leaf-chunk rows) rather than many 3-float gathers. Writes one line per
config: R (indices), W (row f32s), N (table rows), ms/gather inside a
100-iteration fori_loop (dispatch excluded).
"""
import sys
import time

sys.path.insert(0, ".")
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def bench(R, W, N, iters=100):
    table = jnp.asarray(np.random.rand(N, W).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, N, R).astype(np.int32))

    @jax.jit
    def loop(idx):
        def body(i, acc):
            j = (idx + i) % N
            return acc + table[j].sum(-1)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(R))

    jax.block_until_ready(loop(idx))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(idx))
    dt = (time.perf_counter() - t0) / iters
    gb = R * W * 4 / dt / 1e9
    print(f"R={R:7d} W={W:3d} N={N:7d}  {dt * 1e3:8.4f} ms/gather  {gb:7.2f} GB/s",
          flush=True)


def main():
    print(f"devices {jax.devices()}", flush=True)
    for R in (8192, 65536, 262144):
        for W in (4, 16, 64):
            bench(R, W, 16384)
    # table-size sensitivity at fixed R/W
    for N in (1024, 131072, 1048576):
        bench(65536, 16, N)
    # dense (R, C) slab-test analogue: R rays x C boxes, pure VPU
    R, C = 262144, 1024
    boxes = jnp.asarray(np.random.rand(C, 6).astype(np.float32))
    o = jnp.asarray(np.random.rand(R, 3).astype(np.float32))
    inv = jnp.asarray(np.random.rand(R, 3).astype(np.float32))

    @jax.jit
    def slab_block(o, inv):
        t0 = (boxes[None, :, :3] - o[:, None]) * inv[:, None]
        t1 = (boxes[None, :, 3:] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        return jnp.sum((tn <= tf) & (tf > 0), -1)

    jax.block_until_ready(slab_block(o, inv))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(slab_block(o, inv))
    dt = (time.perf_counter() - t0) / 5
    print(f"dense slab R={R} C={C}: {dt * 1e3:.2f} ms "
          f"({R * C / dt / 1e9:.1f} G tests/s)", flush=True)


if __name__ == "__main__":
    main()
