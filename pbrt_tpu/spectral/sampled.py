"""Sampled spectra on the device: a SampledSpectrum is just a `(..., 4)` jnp
array; SampledWavelengths is the pair `(lambda, pdf)` of `(..., 4)` arrays.

TPU-native counterpart of reference spectrum_util/sampled_spectrum.h and
sampled_wavelengths.h. N_SPECTRUM_SAMPLES = 4 wavelengths ride along each
path as a dense vector lane — ideal VPU shape.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.spectral import cie
from pbrt_tpu.utils.math import safe_div

N = cie.N_SPECTRUM_SAMPLES


class Wavelengths(NamedTuple):
    """(λ, pdf) carried per path; both (..., 4)."""

    lam: jnp.ndarray
    pdf: jnp.ndarray


def visible_wavelengths_pdf(lam):
    """pdf of the visible-importance distribution
    (reference util/sampling.h:296-302)."""
    p = 0.0039398042 / jnp.square(jnp.cosh(0.0072 * (lam - 538.0)))
    return jnp.where((lam < cie.LAMBDA_MIN) | (lam > cie.LAMBDA_MAX), 0.0, p)


def sample_visible_wavelengths(u):
    """Warp u in [0,1) to a visible wavelength
    (reference util/sampling.h:305-307)."""
    return 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)


def sample_visible(u):
    """Stratified 4-wavelength visible sampling from one uniform sample
    (reference sampled_wavelengths.h:61-78). u: (...,) -> Wavelengths (..., 4)."""
    i = jnp.arange(N, dtype=u.dtype)
    up = u[..., None] + i / N
    up = jnp.where(up > 1.0, up - 1.0, up)
    lam = sample_visible_wavelengths(up)
    return Wavelengths(lam=lam, pdf=visible_wavelengths_pdf(lam))


def sample_uniform(u, lam_min=float(cie.LAMBDA_MIN), lam_max=float(cie.LAMBDA_MAX)):
    """Uniform-stratified wavelength sampling (pbrt-v4 SampleUniform semantics)."""
    rng = lam_max - lam_min
    lam0 = lam_min + u[..., None] * rng
    delta = jnp.arange(N, dtype=u.dtype) * (rng / N)
    lam = lam0 + delta
    lam = jnp.where(lam > lam_max, lam_min + (lam - lam_max), lam)
    pdf = jnp.full_like(lam, 1.0 / rng)
    return Wavelengths(lam=lam, pdf=pdf)


def terminate_secondary(wl: Wavelengths):
    """Collapse to the hero wavelength (dispersion); returns new Wavelengths
    (reference sampled_wavelengths.h:119-131). Idempotent."""
    already = jnp.all(wl.pdf[..., 1:] == 0.0, axis=-1, keepdims=True)
    pdf0 = jnp.where(already[..., 0], wl.pdf[..., 0], wl.pdf[..., 0] / N)
    new_pdf = jnp.concatenate(
        [pdf0[..., None], jnp.zeros_like(wl.pdf[..., 1:])], axis=-1
    )
    return Wavelengths(lam=wl.lam, pdf=new_pdf)


def secondary_terminated(wl: Wavelengths):
    return jnp.all(wl.pdf[..., 1:] == 0.0, axis=-1)


# --------------------------------------------------------------------------
# SampledSpectrum helpers ((..., 4) arrays)


def average(s):
    return jnp.mean(s, axis=-1)


def spectrum_safe_div(a, b):
    return safe_div(a, b)


def y(s, wl: Wavelengths, cie_y_at):
    """Luminance of a sampled spectrum (reference sampled_spectrum y()):
    average(Y(λ)·s / pdf) / CIE_Y_integral. `cie_y_at` samples the CIE Y
    curve at λ (see spectra.sample_dense)."""
    ys = cie_y_at(wl.lam)
    return average(safe_div(ys * s, wl.pdf)) / cie.CIE_Y_INTEGRAL


def clamp_zero(s):
    return jnp.maximum(s, 0.0)


def is_black(s):
    return jnp.all(s == 0.0, axis=-1)


def max_component(s):
    return jnp.max(s, axis=-1)
