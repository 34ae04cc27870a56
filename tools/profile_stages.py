"""Per-stage timing harness — the SURVEY §5 `Timer` analogue.

Times each stage of one path-tracing bounce as its own jit (compile excluded,
block_until_ready around each) on a representative lane batch, plus the full
fused li() loop, so optimization is measurement-driven (VERDICT r1 item 3).
Reference per-stage breakdown: integrators/wavefront_path.cu:732-734.

Usage:  python tools/profile_stages.py [R] [scene]
        scene in {cornell, mesh5, mesh7}; writes PROFILE-friendly lines.
"""
import sys
import time

sys.path.insert(0, ".")

from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.cameras import perspective
from pbrt_tpu.accel import dispatch
from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators import path as path_integrator
from pbrt_tpu.materials import materials
from pbrt_tpu.sampling import samplers
from pbrt_tpu.spectral import sampled
from pbrt_tpu.utils.math import INFINITY


def timed(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:10.3f} ms", flush=True)
    return out, dt


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    which = sys.argv[2] if len(sys.argv) > 2 else "cornell"
    from pbrt_tpu.scene import testscenes as ts

    if which == "cornell":
        scene, meta = ts.cornell(res=256, spp=4)
    elif which == "mesh5":
        scene, meta = ts.cornell_mesh(res=256, spp=4, levels=5)
    elif which == "terrain":
        scene, meta = ts.terrain(res=256, spp=4)
    else:
        scene, meta = ts.cornell_mesh(res=256, spp=4, levels=7)
    print(f"scene={which} R={R} tris={meta.n_tris} "
          f"bvh_nodes={scene.bvh_rows.shape[0]} dev={jax.devices()}", flush=True)

    n_pixels = 256 * 256
    pixel_ids = jnp.arange(R, dtype=jnp.int32) % n_pixels
    sample_ids = jnp.arange(R, dtype=jnp.int32) // n_pixels

    # ---- stage inputs (camera sample -> primary rays)
    @jax.jit
    def raygen(pixel_ids, sample_ids):
        r = samplers.start_pixel_sample(pixel_ids, sample_ids)
        r, u_pixel = samplers.get_2d(r)
        px = (pixel_ids % 256).astype(jnp.float32)
        py = (pixel_ids // 256).astype(jnp.float32)
        p_film = jnp.stack([px, py], axis=-1) + u_pixel
        r, u_lam = samplers.get_1d(r)
        wl = sampled.sample_visible(u_lam)
        rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
        return rays, wl, r

    (rays, wl, r), _ = timed("raygen+sampler+lambda", raygen, pixel_ids, sample_ids)

    t_max = jnp.full((R,), INFINITY)

    @jax.jit
    def closest(o, d):
        return dispatch.intersect(scene, o, d, t_max)

    hit, dt_int = timed("intersect (closest-hit)", closest, rays.o, rays.d)

    @jax.jit
    def shadow(o, d):
        return dispatch.occluded(scene, o, d, t_max * 0.5)

    _ = timed("occluded (any-hit)", shadow, hit.p, rays.d)

    @jax.jit
    def bsdf_build(hit, wl):
        mat = materials.resolve_mix(scene, hit.mat, hit.p, hit.wo)
        return materials.make_bsdf(scene, mat, hit.ns, wl, hit.uv)

    (bsdf, wl2), _ = timed("make_bsdf (gather+textures)", bsdf_build, hit, wl)

    u2 = jnp.stack([jnp.linspace(0, 1, R), jnp.linspace(0, 1, R)], -1)
    uc = jnp.linspace(0, 1, R)

    @jax.jit
    def bsdf_smp(bsdf, wo):
        return materials.bsdf_sample(bsdf, wo, uc, u2)

    _ = timed("bsdf_sample (all lobes)", bsdf_smp, bsdf, hit.wo)

    @jax.jit
    def nee(hit, bsdf):
        return path_integrator.sample_ld(
            scene, hit, path_integrator.BsdfCtx(bsdf=bsdf, wl=wl),
            uc, u2, scene.ray_offset_scale,
        )

    _ = timed("sample_ld (NEE w/o shadow)", nee, hit, bsdf)

    film = filmlib.new_film((256, 256))

    @jax.jit
    def film_add(film, L):
        return filmlib.add_samples(
            film, pixel_ids, L, wl.lam, wl.pdf, jnp.ones((R,))
        )

    _ = timed("film scatter-add", film_add, film, jnp.ones((R, 4)))

    @jax.jit
    def one_bounce(rays, wl, r):
        state = _init_state(rays, wl, r)
        return path_integrator.bounce_step(scene, state)

    def _init_state(rays, wl, r):
        return path_integrator.PathState(
            o=rays.o, d=rays.d,
            L=jnp.zeros((R, 4)), beta=jnp.ones((R, 4)),
            lam=wl.lam, lam_pdf=wl.pdf, smp=r,
            active=jnp.ones((R,), bool), specular=jnp.zeros((R,), bool),
            depth=jnp.zeros((R,)), rr_next=jnp.full((R,), 8.0),
            prev_pdf=jnp.ones((R,)), prev_p=rays.o, prev_ns=jnp.zeros((R, 3)),
            medium=jnp.full((R,), -1, jnp.int32), trans_pdf=jnp.ones((R, 4)),
            n_closest=jnp.float32(0.0), n_shadow=jnp.float32(0.0),
        )

    _, dt_bounce = timed("bounce_step (full, depth1)", one_bounce, rays, wl, r)

    @jax.jit
    def full_li(rays, wl, r):
        return path_integrator.li(scene, rays, wl, r, meta.max_depth)

    _, dt_li = timed(f"li (full loop, depth{meta.max_depth})", full_li, rays, wl, r)
    print(f"-> li rays/s (R paths x depth x 2): "
          f"{R * meta.max_depth * 2 / dt_li / 1e6:.2f} M (upper-bound count)",
          flush=True)


if __name__ == "__main__":
    main()
