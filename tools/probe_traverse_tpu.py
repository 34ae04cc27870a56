"""TPU wall-clock decomposition of one BVH traversal (tools/probe_bvh.py
measures iteration COUNTS on CPU; this measures SECONDS on the chip).

Times, at render-scale lane count:
  A. full _traverse, coherent camera rays
  B. full _traverse, first-bounce cosine rays (the in-loop population)
  C. full _traverse any-hit, shadow-style rays (finite t_max)
  D. fixed N-iteration full-width body loops at the ladder widths
     (isolates per-iteration cost from iteration count)

Usage: python tools/probe_traverse_tpu.py [levels] [R]
"""
import sys
import time

sys.path.insert(0, ".")
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.scene import testscenes as ts
from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.cameras import perspective
from pbrt_tpu.utils.math import INFINITY

from probe_bvh import setup, bounce_rays, init_state


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main(levels, R):
    scene, rows, n_int, depth, o, d = setup(levels, R)
    t_inf = jnp.full((R,), INFINITY)

    trav = jax.jit(lambda o, d, t: bvhlib._traverse(
        rows, n_int, depth, bvhlib.LEAF_K, o, d, t))
    trav_any = jax.jit(lambda o, d, t: bvhlib._traverse(
        rows, n_int, depth, bvhlib.LEAF_K, o, d, t, any_hit=True))

    dt, (tA, pA, _) = timeit(trav, o, d, t_inf)
    print(f"A coherent closest: {dt*1e3:8.1f} ms "
          f"({R/dt/1e6:.2f} Mrays/s) hit={float((pA>=0).mean()):.2f}",
          flush=True)

    ob, db = bounce_rays(scene, rows, n_int, depth, o, d, R)
    dt, (tB, pB, _) = timeit(trav, ob, db, t_inf)
    print(f"B bounce   closest: {dt*1e3:8.1f} ms "
          f"({R/dt/1e6:.2f} Mrays/s) hit={float((pB>=0).mean()):.2f}",
          flush=True)

    # shadow-style: from bounce origins toward a fixed point (light-ish),
    # finite t_max
    target = jnp.array([0.0, 1.9, 0.0])
    dsh = target[None, :] - ob
    dist = jnp.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = dsh / jnp.maximum(dist, 1e-9)
    dt, _ = timeit(trav_any, ob, dsh, dist[:, 0] * 0.999)
    print(f"C shadow   any-hit: {dt*1e3:8.1f} ms ({R/dt/1e6:.2f} Mrays/s)",
          flush=True)

    # D: fixed-iteration cost per width
    SD = depth + 2
    make_ctx = bvhlib.make_stepper(rows, n_int, bvhlib.LEAF_K, SD)
    N = 16
    for div in (1, 4, 16, 64):
        W = R // div
        ow, dw = ob[:W], db[:W]

        @jax.jit
        def fixed(ow, dw):
            body = make_ctx(ow, dw)
            st = init_state(W, SD, jnp.full((W,), INFINITY))
            return jax.lax.fori_loop(0, N, lambda i, s: body(s), st)

        dt, _ = timeit(fixed, ow, dw)
        print(f"D width R/{div:<3d} ({W:7d}): {N} iters {dt*1e3:8.1f} ms "
              f"-> {dt/N*1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    main(levels, R)
