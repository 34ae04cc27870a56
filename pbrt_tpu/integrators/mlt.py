"""Metropolis light transport over primary sample space (Kelemen-style).

Counterpart of reference integrators/mlt_path.{h,cu} (341 LoC) + the MLT
sampler (samplers/mlt.{h,cu}): thousands of parallel Markov chains mutate a
primary-sample vector; the path integrator's Li re-runs from the mutated
vector each step; expected-value splatting writes both current and proposed
states; global brightness b comes from a bootstrap phase.

TPU design: chains = lanes. The whole mutation-evaluate-accept step is one
jitted function; the MLT sampler is the `kind=="mlt"` branch of the shared
Sampler (primary samples consumed by dimension index).

mlt-bdpt ("mlt"/"mltbdpt"): the same Kelemen chains drive the STAGED BDPT
estimator (reference integrators/mlt_bdpt.cu:251-447). Design difference,
on purpose: the reference mutates ONE (s,t) strategy per mutation chosen
from the sampler (mlt_bdpt.cu:169-199, 3 interleaved sample streams
samplers/mlt.h:62-63) because a CUDA thread wants one code path; our lanes
evaluate the COMPLETE BDPT estimator per mutation (all strategies, each
t=1 splat landing at its own raster position) and use its total luminance
as the scalar target — the classic multi-contribution PSS-MLT formulation.
Stream alignment falls out for free: the evaluation is one static trace,
so primary-sample dimension k always feeds the same decision, which is
exactly what the reference's 3-stream interleaving exists to guarantee.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.cameras import perspective
from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators import path as path_integrator
from pbrt_tpu.sampling import samplers, rng as prng
from pbrt_tpu.spectral import sampled

P_LARGE = 0.3     # large-step probability (mlt_path.cu:163)
SIGMA = 0.01      # small-step mutation size (mlt_path.cu:164)
N_CHAINS = 8192   # parallel Markov chains (mlt_path.cu:16)


def _erfinv(x):
    """Winitzki approximation (reference util/math.h erfinv)."""
    x = jnp.clip(x, -0.99999, 0.99999)
    a = 0.147
    ln1mx2 = jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-30))
    term = 2.0 / (jnp.pi * a) + ln1mx2 / 2.0
    return jnp.sign(x) * jnp.sqrt(
        jnp.sqrt(jnp.maximum(term * term - ln1mx2 / a, 0.0)) - term
    )


def mutate(x, key, sigma=SIGMA, p_large=P_LARGE):
    """One Kelemen mutation of the primary-sample matrix x (R, D).
    key: jax PRNG key. Large step: fresh uniforms; small step: gaussian
    perturbation with wrap-around (samplers/mlt.cu:4-88)."""
    R, D = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    is_large = jax.random.uniform(k1, (R,)) < p_large
    fresh = jax.random.uniform(k2, (R, D))
    u = jax.random.uniform(k3, (R, D))
    perturbed = x + sigma * jnp.sqrt(2.0) * _erfinv(2.0 * u - 1.0)
    perturbed = perturbed - jnp.floor(perturbed)  # wrap to [0,1)
    out = jnp.where(is_large[:, None], fresh, perturbed)
    return jnp.clip(out, 0.0, 1.0 - 1e-7)


def _luminance(L, lam, pdf):
    rgb = filmlib.to_sensor_rgb(L, lam, pdf)
    y = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    return jnp.maximum(y, 0.0)


@functools.partial(
    jax.jit, static_argnames=("max_depth", "res_x", "res_y", "env_ids", "volumetric")
)
def eval_x(scene, x, *, max_depth, res_x, res_y, env_ids=(), volumetric=False):
    """Evaluate the path-space Li from a primary-sample vector x (R, D).
    Dims 0-1: film position; 2: wavelength; rest feed the path integrator.
    Returns (rgb (R,3), luminance y (R,), pixel ids (R,))."""
    R = x.shape[0]
    px = x[:, 0] * res_x
    py = x[:, 1] * res_y
    p_film = jnp.stack([px, py], axis=-1)
    wl = sampled.sample_visible(x[:, 2])
    smp = samplers.from_primary_samples(x)
    smp = smp._replace(dim=jnp.full((R,), 3, jnp.uint32))
    rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
    L, wl_out = path_integrator.li(
        scene, rays, wl, smp, max_depth, skind="mlt", spp=0,
        env_ids=env_ids, volumetric=volumetric,
        camera_medium=scene.camera_medium,
    )
    rgb = filmlib.to_sensor_rgb(L, wl_out.lam, wl_out.pdf)
    rgb = jnp.where(jnp.isfinite(rgb), rgb, 0.0)
    y = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    y = jnp.maximum(y, 0.0)
    pix = (
        jnp.clip(py.astype(jnp.int32), 0, res_y - 1) * res_x
        + jnp.clip(px.astype(jnp.int32), 0, res_x - 1)
    )
    return rgb, y, pix


@jax.jit
def _accept_and_splat(splat, heat, x_cur, x_prop, rgb_cur, rgb_prop, y_cur, y_prop,
                      pix_cur, pix_prop, u_accept):
    """Metropolis accept/reject + expected-value splats of both states
    (mlt_path.cu:90-151) + sampling-density heatmap (GreyScaleFilm,
    film/grey_scale_film.h:7-24; fed per splat like mlt_path.cu:267-285)."""
    a = jnp.where(y_cur > 0, jnp.minimum(1.0, y_prop / jnp.maximum(y_cur, 1e-12)), 1.0)
    w_prop = a / jnp.maximum(y_prop, 1e-12)
    w_cur = (1.0 - a) / jnp.maximum(y_cur, 1e-12)
    splat = splat.at[pix_prop].add(
        jnp.where((y_prop > 0)[:, None], rgb_prop * w_prop[:, None], 0.0)
    )
    splat = splat.at[pix_cur].add(
        jnp.where((y_cur > 0)[:, None], rgb_cur * w_cur[:, None], 0.0)
    )
    heat = heat.at[pix_prop].add(jnp.where(y_prop > 0, a, 0.0))
    heat = heat.at[pix_cur].add(jnp.where(y_cur > 0, 1.0 - a, 0.0))
    accept = u_accept < a
    x_new = jnp.where(accept[:, None], x_prop, x_cur)
    rgb_new = jnp.where(accept[:, None], rgb_prop, rgb_cur)
    y_new = jnp.where(accept, y_prop, y_cur)
    pix_new = jnp.where(accept, pix_prop, pix_cur)
    return splat, heat, x_new, rgb_new, y_new, pix_new, a


def eval_x_bdpt(scene, x, *, max_depth, res_x, res_y, env_ids=()):
    """Evaluate the FULL staged-BDPT estimator from a primary-sample vector
    x (R, D) (mlt-bdpt target; reference integrators/mlt_bdpt.cu:120-200).
    Returns (pix (C, R), rgb (C, R, 3), y_total (R,)) — C static
    contributions: the camera-pixel sum plus one per t=1 splat strategy.
    Media handling needs no flag: bdpt._walk creates in-medium phase
    vertices whenever the scene's media tables are non-empty (static)."""
    from pbrt_tpu.integrators import bdpt as bdpt_mod

    R = x.shape[0]
    px = x[:, 0] * res_x
    py = x[:, 1] * res_y
    p_film = jnp.stack([px, py], axis=-1)
    wl = sampled.sample_visible(x[:, 2])
    smp = samplers.from_primary_samples(x)
    smp = smp._replace(dim=jnp.full((R,), 3, jnp.uint32))
    L, splats = bdpt_mod.li_bdpt_staged(
        scene, p_film, smp, wl, max_depth, "mlt", 0, (res_x, res_y),
        env_ids=env_ids,
    )
    pix_main = (
        jnp.clip(py.astype(jnp.int32), 0, res_y - 1) * res_x
        + jnp.clip(px.astype(jnp.int32), 0, res_x - 1)
    )

    def to_rgb(Ls):
        rgb = filmlib.to_sensor_rgb(Ls, wl.lam, wl.pdf)
        return jnp.where(jnp.isfinite(rgb), rgb, 0.0)

    pix = jnp.stack([pix_main] + [p for p, _ in splats])        # (C, R)
    rgb = jnp.stack([to_rgb(L)] + [to_rgb(Ls) for _, Ls in splats])
    y = jnp.maximum(
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2], 0.0
    ).sum(0)                                                     # (R,)
    return pix, rgb, y


@jax.jit
def _accept_and_splat_multi(splat, heat, x_cur, x_prop, pix_cur, pix_prop,
                            rgb_cur, rgb_prop, y_cur, y_prop, u_accept):
    """Metropolis accept/reject with expected-value splatting of every
    contribution of both states (multi-contribution PSS-MLT)."""
    a = jnp.where(y_cur > 0, jnp.minimum(1.0, y_prop / jnp.maximum(y_cur, 1e-12)), 1.0)
    w_prop = jnp.where(y_prop > 0, a / jnp.maximum(y_prop, 1e-12), 0.0)
    w_cur = jnp.where(y_cur > 0, (1.0 - a) / jnp.maximum(y_cur, 1e-12), 0.0)
    splat = splat.at[pix_prop.reshape(-1)].add(
        (rgb_prop * w_prop[None, :, None]).reshape(-1, 3)
    )
    splat = splat.at[pix_cur.reshape(-1)].add(
        (rgb_cur * w_cur[None, :, None]).reshape(-1, 3)
    )
    heat = heat.at[pix_prop[0]].add(jnp.where(y_prop > 0, a, 0.0))
    heat = heat.at[pix_cur[0]].add(jnp.where(y_cur > 0, 1.0 - a, 0.0))
    accept = u_accept < a
    x_new = jnp.where(accept[:, None], x_prop, x_cur)
    pix_new = jnp.where(accept[None, :], pix_prop, pix_cur)
    rgb_new = jnp.where(accept[None, :, None], rgb_prop, rgb_cur)
    y_new = jnp.where(accept, y_prop, y_cur)
    return splat, heat, x_new, pix_new, rgb_new, y_new, a


def render_mlt_bdpt(scene, meta, n_chains=N_CHAINS, n_bootstrap=None, seed=0,
                    verbose=False, return_heatmap=False):
    """MLT over BDPT ("mlt"/"mltbdpt"; reference mlt_bdpt.cu:251-447).
    Returns (H, W, 3) linear RGB."""
    res_x, res_y = meta.resolution
    n_pixels = res_x * res_y
    # dims: film(2) + lambda(1) + camera walk + light walk + per-strategy
    # connection draws; generous so overflow dims (PCG fallback) stay unused.
    # Volumetric walks consume ~9 dims/step (4 hop distance samples + bsdf
    # 3 + phase 2) instead of 3, so media scenes get a larger budget.
    D = 16 + (40 if meta.volumetric else 16) * (meta.max_depth + 2)
    n_bootstrap = n_bootstrap or max(n_chains * 4, 1 << 16)
    key = jax.random.PRNGKey(seed)
    kw = dict(max_depth=meta.max_depth, res_x=res_x, res_y=res_y,
              env_ids=tuple(meta.env_light_ids))

    ys, xs = [], []
    for _ in range(max(1, n_bootstrap // n_chains)):
        key, k = jax.random.split(key)
        x = jax.random.uniform(k, (n_chains, D))
        _, _, y = eval_x_bdpt(scene, x, **kw)
        ys.append(y)
        xs.append(x)
    y_boot = jnp.concatenate(ys)
    x_boot = jnp.concatenate(xs)
    b = float(jnp.mean(y_boot))
    if b <= 0:
        raise ValueError("MLT-BDPT bootstrap found no light-carrying paths")

    from pbrt_tpu.distribution import distributions as dist

    q, alias, _ = dist.alias_table_build(np.asarray(y_boot))
    key, k = jax.random.split(key)
    pick, _ = dist.alias_sample(
        jnp.asarray(q), jnp.asarray(alias), jax.random.uniform(k, (n_chains,))
    )
    x_cur = x_boot[pick]
    pix_cur, rgb_cur, y_cur = eval_x_bdpt(scene, x_cur, **kw)

    total_mutations = meta.mutations_per_pixel * n_pixels
    n_passes = max(1, total_mutations // n_chains)
    splat = jnp.zeros((n_pixels, 3))
    heat = jnp.zeros((n_pixels,))
    for i in range(n_passes):
        key, k1, k2 = jax.random.split(key, 3)
        x_prop = mutate(x_cur, k1)
        pix_prop, rgb_prop, y_prop = eval_x_bdpt(scene, x_prop, **kw)
        u_acc = jax.random.uniform(k2, (n_chains,))
        splat, heat, x_cur, pix_cur, rgb_cur, y_cur, a = _accept_and_splat_multi(
            splat, heat, x_cur, x_prop, pix_cur, pix_prop, rgb_cur, rgb_prop,
            y_cur, y_prop, u_acc,
        )
        if verbose and (i % 16 == 0):
            print(f"pass {i + 1}/{n_passes} accept={float(a.mean()):.2f}")

    scale = b * n_pixels / (n_passes * n_chains)
    img = splat * scale

    out = _develop_mlt(img, meta, res_x, res_y)
    if return_heatmap:
        return out, heat.reshape(res_y, res_x)
    return out


def _develop_mlt(img, meta, res_x, res_y):
    """XYZ splat sums -> output RGB honoring the PixelSensor exactly like
    film.develop (imaging ratio + white-balanced out matrix; reference
    rgb_film.cu get_pixel_rgb applies the sensor to splats too)."""
    from pbrt_tpu.spectral import colorspace

    m = (jnp.asarray(meta.film_out_matrix) if meta.film_out_matrix is not None
         else colorspace.srgb().rgb_from_xyz)
    out = colorspace.apply_matrix(m, img * meta.film_imaging_ratio)
    return out.reshape(res_y, res_x, 3)


def render_mlt(scene, meta, n_chains=N_CHAINS, n_bootstrap=None, seed=0,
               verbose=False, return_heatmap=False):
    """Full PSS-MLT render (mlt_path.cu:198-296). Returns (H, W, 3) RGB, or
    (rgb, heatmap (H, W)) when return_heatmap (the GreyScaleFilm
    sampling-density output the reference writes alongside MLT renders)."""
    if meta.integrator in ("mlt", "mltbdpt"):
        return render_mlt_bdpt(scene, meta, n_chains, n_bootstrap, seed, verbose,
                               return_heatmap=return_heatmap)
    res_x, res_y = meta.resolution
    n_pixels = res_x * res_y
    D = 16 + 10 * meta.max_depth
    n_bootstrap = n_bootstrap or max(n_chains * 4, 1 << 16)
    key = jax.random.PRNGKey(seed)

    kw = dict(max_depth=meta.max_depth, res_x=res_x, res_y=res_y,
              env_ids=meta.env_light_ids, volumetric=meta.volumetric)

    # --- bootstrap: global brightness b + chain seeds (mlt_path.cu:198-238)
    ys = []
    xs = []
    n_rounds = max(1, n_bootstrap // n_chains)
    for i in range(n_rounds):
        key, k = jax.random.split(key)
        x = jax.random.uniform(k, (n_chains, D))
        _, y, _ = eval_x(scene, x, **kw)
        ys.append(y)
        xs.append(x)
    y_boot = jnp.concatenate(ys)
    x_boot = jnp.concatenate(xs)
    b = float(jnp.mean(y_boot))
    if b <= 0:
        raise ValueError("MLT bootstrap found no light-carrying paths")

    # chain initial states ~ bootstrap luminance (alias table, host build)
    from pbrt_tpu.distribution import distributions as dist

    q, alias, _ = dist.alias_table_build(np.asarray(y_boot))
    key, k = jax.random.split(key)
    u_pick = jax.random.uniform(k, (n_chains,))
    pick, _ = dist.alias_sample(jnp.asarray(q), jnp.asarray(alias), u_pick)
    x_cur = x_boot[pick]
    rgb_cur, y_cur, pix_cur = eval_x(scene, x_cur, **kw)

    # --- mutation passes
    total_mutations = meta.mutations_per_pixel * n_pixels
    n_passes = max(1, total_mutations // n_chains)
    splat = jnp.zeros((n_pixels, 3))
    heat = jnp.zeros((n_pixels,))
    acc_sum = 0.0
    for i in range(n_passes):
        key, k1, k2 = jax.random.split(key, 3)
        x_prop = mutate(x_cur, k1)
        rgb_prop, y_prop, pix_prop = eval_x(scene, x_prop, **kw)
        u_acc = jax.random.uniform(k2, (n_chains,))
        splat, heat, x_cur, rgb_cur, y_cur, pix_cur, a = _accept_and_splat(
            splat, heat, x_cur, x_prop, rgb_cur, rgb_prop, y_cur, y_prop,
            pix_cur, pix_prop, u_acc,
        )
        if verbose and (i % 16 == 0):
            acc_sum = float(a.mean())
            print(f"pass {i + 1}/{n_passes} accept={acc_sum:.2f}")

    # final scale: b / mutations_per_pixel (scene_builder.cu:1021)
    mutations_done = n_passes * n_chains
    scale = b * n_pixels / mutations_done
    img = splat * scale

    out = _develop_mlt(img, meta, res_x, res_y)
    if return_heatmap:
        return out, heat.reshape(res_y, res_x)
    return out
