"""BVH traversal diagnostics.

Mode `iters` (CPU ok): per-lane iteration statistics of the masked-dense
loop — the quantity that gates cost (PROFILE §3 worst-lane economics).
Mode `steptime` (run on the chip): wall-clock of N fixed full-width body
iterations, isolating per-iteration cost from iteration count.

Usage: python tools/probe_bvh.py iters|steptime [levels] [R]
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


def setup(levels, R):
    if levels == "terrain":
        scene, meta = ts.terrain(res=512, spp=1)
    else:
        scene, meta = ts.cornell_mesh(res=512, spp=1, levels=levels)
    stride = max(1, (512 * 512) // R)
    pix = (jnp.arange(R, dtype=jnp.int32) * stride) % (512 * 512)
    px = (pix % 512).astype(jnp.float32)
    py = (pix // 512).astype(jnp.float32)
    p_film = jnp.stack([px, py], -1) + 0.5
    rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
    rows = scene.bvh_rows
    n_int = scene.bvh_nint.shape[0]
    depth = scene.bvh_depth.shape[0]
    print(f"tris={meta.n_tris} rows={rows.shape} n_int={n_int} depth={depth}",
          flush=True)
    return scene, rows, n_int, depth, rays.o, rays.d


def init_state(R, SD, t_max):
    return bvhlib._St(
        cur=jnp.zeros((R,), jnp.int32),
        cmask=jnp.full((R,), bvhlib._FRESH, jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        stack_n=jnp.zeros((R, SD), jnp.int32),
        stack_m=jnp.zeros((R, SD), jnp.int32),
        t_best=t_max,
        prim=jnp.full((R,), -1, jnp.int32),
        it=jnp.int32(0),
    )


def bounce_rays(scene, rows, n_int, depth, o, d, R):
    """Turn camera rays into realistic BOUNCE rays: trace to the first hit,
    then leave from the hit point in a cosine-weighted hemisphere direction
    around the geometric normal — the ray population the in-loop traversal
    actually sees at depth >= 1."""
    t, prim, _ = bvhlib._traverse(rows, n_int, depth, bvhlib.LEAF_K, o, d,
                                  jnp.full((R,), INFINITY))
    hit = prim >= 0
    pc = jnp.maximum(prim, 0)
    p = o + d * jnp.where(hit, t, 1.0)[:, None]
    e1 = scene.tri_p1[pc] - scene.tri_p0[pc]
    e2 = scene.tri_p2[pc] - scene.tri_p0[pc]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.where((jnp.sum(n * d, -1) > 0)[:, None], -n, n)
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (R, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    loc = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                     jnp.sqrt(1 - u[:, 0])], -1)
    up = jnp.where((jnp.abs(n[:, 2]) < 0.9)[:, None],
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    tx = jnp.cross(up, n)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
    ty = jnp.cross(n, tx)
    d2 = loc[:, 0:1] * tx + loc[:, 1:2] * ty + loc[:, 2:3] * n
    o2 = p + n * 1e-3
    # lanes that missed keep their camera ray (small fraction)
    o2 = jnp.where(hit[:, None], o2, o)
    d2 = jnp.where(hit[:, None], d2, d)
    return o2, d2


def mode_iters(levels, R, bounce=False):
    scene, rows, n_int, depth, o, d = setup(levels, R)
    if bounce:
        o, d = bounce_rays(scene, rows, n_int, depth, o, d, R)
    SD = depth + 2
    make_ctx = bvhlib.make_stepper(rows, n_int, bvhlib.LEAF_K, SD)
    body = make_ctx(o, d)
    st0 = init_state(R, SD, jnp.full((R,), INFINITY))

    def wrapped(carry):
        st, iters, leafv = carry
        live = st.cur != bvhlib._DONE
        nid = jnp.maximum(st.cur, 0)
        leafv = leafv + (live & (nid >= n_int)).astype(jnp.int32)
        iters = iters + live.astype(jnp.int32)
        return body(st), iters, leafv

    def cond(carry):
        st, _, _ = carry
        return jnp.any(st.cur != bvhlib._DONE) & (st.it < 100000)

    z = jnp.zeros((R,), jnp.int32)
    st, iters, leafv = jax.lax.while_loop(cond, wrapped, (st0, z, z))
    it = np.asarray(iters)
    lv = np.asarray(leafv)
    print(f"total loop iterations run: {int(st.it)}")
    for name, v in [("iters", it), ("leaf-visits", lv)]:
        print(f"{name}: mean={v.mean():.1f} p50={np.percentile(v,50):.0f} "
              f"p90={np.percentile(v,90):.0f} p99={np.percentile(v,99):.0f} "
              f"max={v.max()}")
    # live-lane decay: lanes still unfinished after k iterations
    for k in (8, 12, 16, 24, 32, 48, 64, 96, 128, 256, 512):
        print(f"  live after {k:4d}: {(it > k).sum():7d} "
              f"({100.0*(it>k).mean():.2f}%)")


def mode_steptime(levels, R, n_steps=32):
    scene, rows, n_int, depth, o, d = setup(levels, R)
    SD = depth + 2
    make_ctx = bvhlib.make_stepper(rows, n_int, bvhlib.LEAF_K, SD)
    st0 = init_state(R, SD, jnp.full((R,), INFINITY))

    @jax.jit
    def fixed(o, d, st):
        body = make_ctx(o, d)
        return jax.lax.fori_loop(0, n_steps, lambda i, s: body(s), st)

    st = jax.block_until_ready(fixed(o, d, st0))
    t0 = time.perf_counter()
    for _ in range(5):
        st = jax.block_until_ready(fixed(o, d, st0))
    dt = (time.perf_counter() - t0) / 5
    print(f"R={R} {n_steps} steps: {dt*1e3:.1f} ms -> {dt/n_steps*1e3:.3f} "
          f"ms/step ({dt/n_steps/R*1e9:.2f} ns/lane-step)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "iters"
    levels = sys.argv[2] if len(sys.argv) > 2 else 5
    if levels != "terrain":
        levels = int(levels)
    R = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 14)
    if mode == "iters":
        mode_iters(levels, R)
    elif mode == "iters-bounce":
        mode_iters(levels, R, bounce=True)
    else:
        mode_steptime(levels, R)
