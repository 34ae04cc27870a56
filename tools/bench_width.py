"""Sweep BVH node width / leaf K on the chip (terrain + cornell-mesh).

Run: PBRT_TPU_BVH_WIDTH=16 PBRT_TPU_BVH_LEAF_K=4 python tools/bench_width.py
(the env must be set before import — WIDTH is baked into the module).
Measures closest-hit and any-hit on camera-coherent AND bounce-style rays,
the populations a real render traces (tools/probe_bvh.py rationale).
"""
import os
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


def timeit(fn, *a, reps=3):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / reps, out


def main():
    R = 1 << 18
    W, K = bvhlib.WIDTH, bvhlib.LEAF_K
    print(f"WIDTH={W} LEAF_K={K} R={R} devices={jax.devices()}", flush=True)
    for name, make in [("mesh16k", lambda: ts.cornell_mesh(res=512, spp=1, levels=5)),
                       ("terrain", lambda: ts.terrain(res=512, spp=1))]:
        scene, meta = make()
        depth = scene.bvh_depth.shape[0]
        pix = jnp.arange(R, dtype=jnp.int32) % (512 * 512)
        px = (pix % 512).astype(jnp.float32)
        py = (pix // 512).astype(jnp.float32)
        p_film = jnp.stack([px, py], -1) + 0.5
        rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
        t_max = jnp.full((R,), INFINITY)

        fn = jax.jit(lambda o, d, sc=scene: bvhlib.closest_hit_tris(sc, o, d, t_max))
        occ = jax.jit(lambda o, d, sc=scene: bvhlib.any_hit_tris(sc, o, d, t_max))

        dt, h = timeit(fn, rays.o, rays.d)
        hitf = float(jnp.mean((h.prim >= 0).astype(jnp.float32)))
        print(f"{name} tris={meta.n_tris:7d} depth={depth:2d} coherent closest "
              f"{dt*1e3:8.1f} ms {R/dt/1e6:6.2f} Mrays/s hit={hitf:.2f}", flush=True)

        # bounce rays: cosine hemisphere from first hits
        ok = h.prim >= 0
        t = jnp.where(ok, h.t, 1.0)
        p = rays.o + rays.d * t[:, None] * 0.999
        rng = np.random.default_rng(0)
        u = rng.uniform(size=(R, 2)).astype(np.float32)
        r_ = np.sqrt(u[:, 0]); phi = 2 * np.pi * u[:, 1]
        local = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                          np.sqrt(np.maximum(1 - u[:, 0], 0.0))], -1)
        db = jnp.asarray(local / np.linalg.norm(local, axis=-1, keepdims=True))
        dt, h2 = timeit(fn, p, db)
        print(f"{name} bounce   closest {dt*1e3:8.1f} ms {R/dt/1e6:6.2f} Mrays/s",
              flush=True)
        dt, _ = timeit(occ, p, db)
        print(f"{name} bounce   any-hit {dt*1e3:8.1f} ms {R/dt/1e6:6.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
