"""RGBFilm: spectral samples -> sensor RGB accumulation -> image.

Counterpart of reference film/rgb_film.h/.cu + pixel_sensor: per-pixel
(rgb_sum, weight_sum, splat) with the CIE-XYZ sensor and rgb_from_xyz output
matrix (rgb_film.cu:20-49). Accumulation is a scatter-add (`.at[].add`) —
the TPU-native replacement for the reference's sorted ping-pong framebuffer
(wavefront_path.cu:216-234): XLA makes the adds deterministic, so the
determinism machinery disappears.
"""
import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.spectral import cie, colorspace


class Film(NamedTuple):
    rgb_sum: jnp.ndarray     # (H*W, 3) sensor rgb
    weight_sum: jnp.ndarray  # (H*W,)
    splat: jnp.ndarray       # (H*W, 3) for BDPT/MLT


def new_film(resolution):
    w, h = resolution
    n = w * h
    return Film(
        rgb_sum=jnp.zeros((n, 3), jnp.float32),
        weight_sum=jnp.zeros((n,), jnp.float32),
        splat=jnp.zeros((n, 3), jnp.float32),
    )


@functools.lru_cache(None)
def _cie_xyz_dense():
    return np.stack([cie.X(), cie.Y(), cie.Z()]).astype(np.float32)


def to_sensor_rgb(L, lam, pdf):
    return colorspace.to_sensor_rgb(L, lam, pdf, jnp.asarray(_cie_xyz_dense()))


def add_samples(film: Film, pixel_idx, L, lam, pdf, weight):
    """Weighted add (reference rgb_film.cu:64-80). pixel_idx: (R,)."""
    rgb = to_sensor_rgb(L, lam, pdf)
    rgb = jnp.where(jnp.isfinite(rgb), rgb, 0.0)  # NaN guard like DEBUG_MODE checks
    return film._replace(
        rgb_sum=film.rgb_sum.at[pixel_idx].add(weight[..., None] * rgb),
        weight_sum=film.weight_sum.at[pixel_idx].add(weight),
    )


def add_samples_tiled(film: Film, pixel_idx, L, lam, pdf, weight, k):
    """add_samples for a lane grid that is `k` tiled replicates of
    pixel_idx (R = k * n). The scatter-add is scalar-unit bound on TPU
    (~30 ns/element); reducing the k replicates with a reshape-sum first
    shrinks the scatter k-fold for free."""
    rgb = to_sensor_rgb(L, lam, pdf)
    rgb = jnp.where(jnp.isfinite(rgb), rgb, 0.0)
    n = pixel_idx.shape[0]
    rgb_w = (weight[..., None] * rgb).reshape(k, n, 3).sum(0)
    w = weight.reshape(k, n).sum(0)
    return film._replace(
        rgb_sum=film.rgb_sum.at[pixel_idx].add(rgb_w),
        weight_sum=film.weight_sum.at[pixel_idx].add(w),
    )


def add_splats(film: Film, pixel_idx, L, lam, pdf, weight):
    rgb = to_sensor_rgb(L, lam, pdf)
    rgb = jnp.where(jnp.isfinite(rgb), rgb, 0.0)
    return film._replace(splat=film.splat.at[pixel_idx].add(weight[..., None] * rgb))


def develop(film: Film, resolution, splat_scale=0.0, out_matrix=None,
            imaging_ratio=1.0):
    """-> (H, W, 3) linear output-RGB (reference rgb_film.cu:108-122 +
    output_rgb_from_sensor_rgb matrix). out_matrix defaults to plain sRGB
    rgb_from_xyz; pass SceneMeta.film_out_matrix for the PixelSensor's
    white-balanced matrix; imaging_ratio scales the sensor response
    (exposure * iso / 100, pixel_sensor.h to_sensor_rgb)."""
    w, h = resolution
    # divide by weight_sum when nonzero (rgb_film.cu:114-116). Mitchell's
    # filter-importance-sampled weights are SIGNED, so a pixel's weight_sum
    # can land arbitrarily close to 0 at low spp while its rgb_sum doesn't
    # — the raw ratio then explodes to ~1e6 fireflies (observed on terrain:
    # ~0.1% of pixels at 8 spp). Bound the divisor's magnitude (keeping
    # sign) — a pixel whose |weight_sum| is far below one sample's filter
    # norm has a meaningless ratio estimate anyway, and the clamp keeps it
    # on the order of its neighbors instead of +-1e6.
    ws = film.weight_sum[:, None]
    mag = jnp.maximum(jnp.abs(ws), 0.25)
    safe = jnp.where(ws < 0, -mag, mag)
    rgb = film.rgb_sum / safe
    rgb = (rgb + splat_scale * film.splat) * imaging_ratio
    m = colorspace.srgb().rgb_from_xyz if out_matrix is None else jnp.asarray(out_matrix)
    out = colorspace.apply_matrix(m, rgb)
    return out.reshape(h, w, 3)


def save_checkpoint(path, film: Film, spp_done: int):
    """Snapshot the film + sample counter (SURVEY §5 failure detection /
    checkpoint-resume: per-pass accumulation makes renders naturally
    resumable; the reference has no equivalent)."""
    import os

    # write-then-rename: a crash mid-write (the scenario checkpoints exist
    # for) must leave either the old or the new complete snapshot, never a
    # truncated npz. Writing through a file object also stops np.savez from
    # appending '.npz' to the temp name.
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            rgb_sum=np.asarray(film.rgb_sum),
            weight_sum=np.asarray(film.weight_sum),
            splat=np.asarray(film.splat),
            spp_done=np.int64(spp_done),
        )
    os.replace(tmp, path)


def load_checkpoint(path):
    """-> (Film, spp_done) from save_checkpoint."""
    z = np.load(path)
    film = Film(
        rgb_sum=jnp.asarray(z["rgb_sum"]),
        weight_sum=jnp.asarray(z["weight_sum"]),
        splat=jnp.asarray(z["splat"]),
    )
    return film, int(z["spp_done"])


def to_srgb8(linear_rgb):
    enc = colorspace.srgb_encode(jnp.clip(linear_rgb, 0.0, 1.0))
    return np.asarray(jnp.round(enc * 255.0).astype(jnp.uint8))
