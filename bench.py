"""Benchmark: rays/sec on the Cornell-box config (BASELINE.json config 1).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed engineering target of 100 Mrays/s/chip — the
order of magnitude a single modern accelerator sustains on this scene in
the reference's class of renderer.

Ray accounting: the dense megakernel executes, per camera path, max_depth
bounce steps of one closest-hit + one shadow query each — that is the work
actually performed, so rays = paths * max_depth * 2. When queue compaction
lands, this switches to summed compacted queue sizes.
"""
import json
import time

from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators.render import render_sample_batch
from pbrt_tpu.scene.testscenes import cornell

RES = 256
SPP = 16
TARGET_RAYS_PER_SEC = 100e6


def main():
    scene, meta = cornell(res=RES, spp=SPP)
    film = filmlib.new_film((RES, RES))
    n_pixels = RES * RES
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.int32)

    # evaluate K samples per launch: pixels replicated K times with distinct
    # sample indices — bigger batches keep the VPU fed and amortize dispatch
    K = 4
    ids_k = jnp.tile(pixel_ids, K)

    def k_samples(film, s0):
        sample_ids = jnp.repeat(jnp.arange(s0, s0 + K), n_pixels)
        return render_sample_batch(
            scene, film, ids_k, sample_ids,
            max_depth=meta.max_depth, integrator="path", use_lens=False, res_x=RES,
        )

    # warmup/compile
    film = k_samples(film, 0)
    film.rgb_sum.block_until_ready()

    t0 = time.perf_counter()
    for s in range(1, SPP // K):
        film = k_samples(film, s * K)
    film.rgb_sum.block_until_ready()
    dt = time.perf_counter() - t0

    paths = n_pixels * (SPP - K)
    rays = paths * meta.max_depth * 2  # closest-hit + shadow per bounce
    rays_per_sec = rays / dt
    print(json.dumps({
        "metric": "rays/sec/chip cornell-box 256x256 path mdepth=5",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / TARGET_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
