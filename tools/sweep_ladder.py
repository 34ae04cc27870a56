"""Sweep BVH ladder shapes + dense budgets on the chip with the TRUE cost
model (probe_gather2: per-dispatch ~21 ms is tunnel overhead, on-device
iterations cost ~width x 6 ns with NO floor — narrow rungs are nearly
free, so the old 2e8-test dense budget overpays by ~20 ms/traversal).

Measures full _traverse on bounce rays (the in-loop population) at
R=262144, closest + any-hit, for each config. Env knobs re-read at trace
time; a fresh lambda per config defeats the jit cache.

Usage: python tools/sweep_ladder.py [mesh|terrain] [R]
"""
import os
import sys
import time

sys.path.insert(0, ".")
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.utils.math import INFINITY

from probe_bvh import setup, bounce_rays


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


CONFIGS = [
    ("A 4,16,64 2e7", "4:2,16:2,64:2", "2e7"),
    ("B 4,16,32,64 2e7", "4:2,16:2,32:2,64:2", "2e7"),
    ("C 4,8,16,32,64,128 2e7", "4:2,8:2,16:2,32:2,64:2,128:2", "2e7"),
    ("D 4,16,32,64 5e7", "4:2,16:2,32:2,64:2", "5e7"),
    ("E 4,16,32,64,128 5e6", "4:2,16:2,32:2,64:2,128:2", "5e6"),
    ("F 4,16,64,256 1e6", "4:2,16:2,64:2,256:1073741824", "1e6"),
]


def main(which, R):
    levels = "terrain" if which == "terrain" else 5
    scene, rows, n_int, depth, o, d = setup(levels, R)
    ob, db = bounce_rays(scene, rows, n_int, depth, o, d, R)
    t_inf = jnp.full((R,), INFINITY)

    for label, ladder, budget in CONFIGS:
        os.environ["PBRT_TPU_BVH_LADDER"] = ladder
        os.environ["PBRT_TPU_BVH_DENSE_BUDGET"] = budget
        trav = jax.jit(lambda o, d, t: bvhlib._traverse(
            rows, n_int, depth, bvhlib.LEAF_K, o, d, t))
        trav_any = jax.jit(lambda o, d, t: bvhlib._traverse(
            rows, n_int, depth, bvhlib.LEAF_K, o, d, t, any_hit=True))
        dt, (tA, pA, _) = timeit(trav, ob, db, t_inf)
        dta, _ = timeit(trav_any, ob, db, t_inf)
        print(f"{label:18s} closest {dt*1e3:7.1f} ms ({R/dt/1e6:5.2f} Mr/s) "
              f"hit={float((pA>=0).mean()):.3f} | any {dta*1e3:7.1f} ms "
              f"({R/dta/1e6:5.2f} Mr/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "mesh"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    main(which, R)
