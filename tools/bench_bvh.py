"""BVH traversal throughput on the chip: Mrays/s vs scene size.

Uses camera-coherent rays (a real render's primary distribution) plus an
incoherent random set — divergence costs real money in masked-dense
traversal and both numbers matter.
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
from pbrt_tpu.accel import bvh as bvhlib, dispatch
from pbrt_tpu.cameras import perspective
from pbrt_tpu.utils.math import INFINITY


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    print(f"devices {jax.devices()} R={R}", flush=True)
    for levels in (5, 7):
        scene, meta = ts.cornell_mesh(res=512, spp=1, levels=levels)
        # camera rays (coherent)
        pix = jnp.arange(R, dtype=jnp.int32) % (512 * 512)
        px = (pix % 512).astype(jnp.float32)
        py = (pix // 512).astype(jnp.float32)
        p_film = jnp.stack([px, py], -1) + 0.5
        rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
        # incoherent rays
        rng = np.random.default_rng(0)
        o2 = jnp.asarray(rng.uniform(50, 500, (R, 3)).astype(np.float32)
                         - np.array([278, 273, -800], np.float32))
        d2 = rng.normal(0, 1, (R, 3))
        d2 = jnp.asarray((d2 / np.linalg.norm(d2, axis=-1, keepdims=True)).astype(np.float32))
        t_max = jnp.full((R,), INFINITY)

        fn = jax.jit(lambda o, d, sc=scene: bvhlib.closest_hit_tris(sc, o, d, t_max))
        occ = jax.jit(lambda o, d, sc=scene: bvhlib.any_hit_tris(sc, o, d, t_max))
        for name, (o, d) in [("coherent", (rays.o, rays.d)), ("random", (o2, d2))]:
            h = jax.block_until_ready(fn(o, d))
            t0 = time.perf_counter()
            for _ in range(5):
                h = jax.block_until_ready(fn(o, d))
            dt = (time.perf_counter() - t0) / 5
            hits = float(jnp.mean((h.prim >= 0).astype(jnp.float32)))
            print(f"levels={levels} tris={meta.n_tris:7d} {name:9s} closest "
                  f"{dt * 1e3:8.2f} ms  {R / dt / 1e6:7.2f} Mrays/s  hit={hits:.2f}",
                  flush=True)
        ob = jax.block_until_ready(occ(rays.o, rays.d))
        t0 = time.perf_counter()
        for _ in range(5):
            ob = jax.block_until_ready(occ(rays.o, rays.d))
        dt = (time.perf_counter() - t0) / 5
        print(f"levels={levels} tris={meta.n_tris:7d} coherent  any-hit "
              f"{dt * 1e3:8.2f} ms  {R / dt / 1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
