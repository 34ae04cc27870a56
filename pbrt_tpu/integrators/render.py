"""Render orchestration: pixels x samples -> film -> image.

Counterpart of reference base/megakernel_integrator.cu:16-179 (the
evaluate_pixel_sample driver) and scene_builder.cu render dispatch.
One jitted `render_sample_batch` evaluates one sample index for a tile of
pixels; the host loop walks samples (and tiles if the resolution is large),
all accumulation staying on device.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.cameras import perspective
from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators import path as path_integrator
from pbrt_tpu.integrators import aov
from pbrt_tpu.filters import filters
from pbrt_tpu.sampling import samplers
from pbrt_tpu.spectral import sampled


def _li_fn(integrator):
    if integrator in ("path", "volpath", "megakernelpath"):
        return path_integrator.li
    if integrator == "ambientocclusion":
        return aov.ao_li
    if integrator == "surfacenormal":
        return aov.surface_normal_li
    raise ValueError(f"integrator {integrator!r} not implemented yet")


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "integrator", "use_lens", "res_x", "sampler_kind", "spp",
        "filter_kind", "env_ids", "volumetric",
    ),
)
def render_sample_batch(
    scene, film, pixel_ids, sample_idx, *, max_depth, integrator, use_lens, res_x,
    sampler_kind="independent", spp=0, filter_kind="box", env_ids=(),
    volumetric=False,
):
    """Trace one sample for pixels pixel_ids (R,) and accumulate into film."""
    r = samplers.start_pixel_sample(pixel_ids, jnp.full_like(pixel_ids, sample_idx))

    # camera sample: filter-sampled pixel offset (2d), lambda (1d), lens (2d,
    # only if lens). Draw order matches reference evaluate_pixel_sample
    # (base/megakernel_integrator.cu:17-37) + Sampler::get_camera_sample
    # (base/sampler.cu:167-171): p_film = pixel + 0.5 + filter_sample.p.
    r, u_pixel = samplers.get_pixel_2d(r, None, sampler_kind, spp)
    fp, weight = filters.sample(scene.filt, filter_kind, u_pixel)
    px = (pixel_ids % res_x).astype(jnp.float32)
    py = (pixel_ids // res_x).astype(jnp.float32)
    p_film = jnp.stack([px, py], axis=-1) + 0.5 + fp

    r, u_lam = samplers.get_1d(r, None, sampler_kind, spp)
    wl = sampled.sample_visible(u_lam)

    if use_lens:
        r, u_lens = samplers.get_2d(r, None, sampler_kind, spp)
    else:
        u_lens = jnp.zeros((pixel_ids.shape[0], 2))

    rays = perspective.generate_rays(scene, p_film, u_lens)
    li = _li_fn(integrator)
    if integrator in ("path", "volpath", "megakernelpath"):
        L, wl_out = li(scene, rays, wl, r, max_depth, skind=sampler_kind, spp=spp,
                       env_ids=env_ids, volumetric=volumetric,
                       camera_medium=scene.camera_medium)
    else:
        L, wl_out = li(scene, rays, wl, r, max_depth, skind=sampler_kind, spp=spp)
    return filmlib.add_samples(film, pixel_ids, L, wl_out.lam, wl_out.pdf, weight)


def render(scene, meta, tile_rays=1 << 20, verbose=False):
    """Full render -> (H, W, 3) linear RGB jnp array."""
    res_x, res_y = meta.resolution
    n_pixels = res_x * res_y
    film = filmlib.new_film(meta.resolution)
    use_lens = float(np.asarray(scene.camera_lens_radius)) > 0.0

    n_tiles = max(1, -(-n_pixels // tile_rays))
    tile = -(-n_pixels // n_tiles)
    for s in range(meta.spp):
        for t0 in range(0, n_pixels, tile):
            ids = jnp.arange(t0, min(t0 + tile, n_pixels), dtype=jnp.int32)
            film = render_sample_batch(
                scene,
                film,
                ids,
                s,
                max_depth=meta.max_depth,
                integrator=meta.integrator,
                use_lens=use_lens,
                res_x=res_x,
                sampler_kind=meta.sampler,
                spp=meta.spp,
                filter_kind=meta.filter_kind,
                env_ids=meta.env_light_ids,
                volumetric=meta.volumetric,
            )
        if verbose:
            film.rgb_sum.block_until_ready()
            print(f"sample {s + 1}/{meta.spp}")
    return filmlib.develop(film, meta.resolution)


def render_to_png(scene, meta, out_path=None, **kw):
    from pbrt_tpu.film import png

    img = render(scene, meta, **kw)
    rgb8 = filmlib.to_srgb8(img)
    path = out_path or meta.filename
    png.write_png(path, rgb8)
    return path
