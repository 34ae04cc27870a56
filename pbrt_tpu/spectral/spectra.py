"""Spectrum representations.

TPU-native redesign of the reference's 7-way tagged-union Spectrum
(reference base/spectrum.h:24-123): instead of runtime polymorphism, the
scene compiler **type-erases every non-RGB spectrum into a dense 1nm table**
(shape (471,)) at build time — blackbody, constant, piecewise-linear and
densely-sampled spectra all become rows of one `(n_spectra, 471)` float32
array. Device evaluation is then a single gather, identical for all of them.

RGB-fitted spectra (albedo/unbounded/illuminant) stay parametric on device:
3 sigmoid-polynomial coefficients per texel (see rgb2spec.py), since baking
them dense per-texel would blow up memory.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.spectral import cie


# ----------------------------------------------------------------- host build


def constant(c):
    return np.full(cie.LAMBDA_RANGE, float(c), dtype=np.float64)


def blackbody_radiance(lam_nm, T):
    """Planck's law, W/(m^2 sr m) (reference spectra/black_body_spectrum.h)."""
    lam = np.asarray(lam_nm, dtype=np.float64) * 1e-9
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    return (2.0 * h * c * c) / (lam**5 * (np.exp((h * c) / (lam * kb * T)) - 1.0))


def blackbody(T):
    """Normalized blackbody: peak value is 1 (reference BlackBodySpectrum:
    normalization_factor = 1 / planck(lambda_max(T))). Dense (471,)."""
    lambda_max_nm = 2.8977721e-3 / T * 1e9  # Wien displacement
    norm = 1.0 / blackbody_radiance(lambda_max_nm, T)
    return blackbody_radiance(cie.lambdas(), T) * norm


def from_interleaved(samples, normalize):
    """Piecewise-linear from interleaved [λ0, v0, λ1, v1, ...] with optional
    photometric normalization (reference base/spectrum.cu:101,
    piecewise_linear_spectrum.cu:6-39). Dense (471,)."""
    samples = np.asarray(samples, dtype=np.float64)
    dense = cie.dense_from_interleaved(samples[0::2], samples[1::2])
    if normalize:
        dense = dense * (cie.CIE_Y_INTEGRAL / cie.inner_product(dense, cie.Y()))
    return dense


# --------------------------------------------------------------- device eval

# Per-lane gathers from the 471-bin tables lower to the TPU scalar unit
# (~tens of ns per element — tools/bench_gather.py); at 10^5+ lanes x 4
# wavelengths they dominate make_bsdf / light emission / sensor conversion.
# The decomposed one-hot below is EXACT (one-hot matmuls select, never
# blend: exactly one 1.0 per row under Precision.HIGHEST) and runs on the
# MXU/VPU instead: bin = hi*32 + lo, a (R, 15) one-hot contracts the table
# reshaped (15, 32) on the MXU, then a (R, 32) one-hot selects the lane on
# the VPU. Measured ~4-8x faster than the native gather at 262k lanes.
_OH_LO = 32
_OH_HI = -(-cie.LAMBDA_RANGE // _OH_LO)           # 15
# above this many table rows the unrolled row-select loses to the gather
_OH_MAX_ROWS = 16


def _lam_bins(lam):
    return jnp.clip(
        jnp.round(lam).astype(jnp.int32) - cie.LAMBDA_MIN, 0, cie.LAMBDA_RANGE - 1
    )


def _bin_onehots(lam):
    b = _lam_bins(lam)
    hi_oh = (
        (b // _OH_LO)[..., None] == jnp.arange(_OH_HI, dtype=jnp.int32)
    ).astype(jnp.float32)
    lo_oh = (
        (b % _OH_LO)[..., None] == jnp.arange(_OH_LO, dtype=jnp.int32)
    ).astype(jnp.float32)
    return hi_oh, lo_oh


def _pad_rows(values):
    """(..., 471) -> (..., 15, 32) zero-padded."""
    values = jnp.asarray(values, jnp.float32)
    pad = _OH_HI * _OH_LO - cie.LAMBDA_RANGE
    padded = jnp.concatenate(
        [values, jnp.zeros(values.shape[:-1] + (pad,), values.dtype)], axis=-1
    )
    return padded.reshape(values.shape[:-1] + (_OH_HI, _OH_LO))


def _oh_eval(v_hl, hi_oh, lo_oh):
    """v_hl (15, 32); hi_oh (..., 15); lo_oh (..., 32) -> (...,)."""
    tmp = jnp.einsum("...h,hl->...l", hi_oh, v_hl,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(tmp * lo_oh, axis=-1)


def sample_dense(values, lam):
    """Sample a dense 1nm spectrum at wavelengths λ.

    values: (471,) or (..., 471); lam: (..., N). Nearest-neighbour lookup to
    match the reference DenselySampledSpectrum (round to the 1nm bin).
    """
    values = jnp.asarray(values)
    if values.ndim == 1:
        hi_oh, lo_oh = _bin_onehots(lam)
        return _oh_eval(_pad_rows(values), hi_oh, lo_oh)
    idx = _lam_bins(lam)
    return jnp.take_along_axis(values, idx, axis=-1)


def sample_dense_stack(values, lam):
    """Sample C dense spectra at shared λ: values (C, 471), lam (..., N)
    -> (..., N, C). The bin one-hots are built once and shared across the
    C curves (the film sensor's X/Y/Z triple)."""
    hi_oh, lo_oh = _bin_onehots(lam)
    v = _pad_rows(jnp.asarray(values))                      # (C, 15, 32)
    tmp = jnp.einsum("...h,chl->...cl", hi_oh, v,
                     precision=jax.lax.Precision.HIGHEST)   # (..., C, 32)
    return jnp.sum(tmp * lo_oh[..., None, :], axis=-1)      # (..., C)


def sample_table(table, spec_idx, lam):
    """Sample row `spec_idx` of a `(n_spectra, 471)` table at λ.

    spec_idx: (...) int32; lam: (..., N) -> (..., N).
    """
    S = int(table.shape[0])
    if 0 < S <= _OH_MAX_ROWS:
        # unrolled row select sharing ONE pair of bin one-hots: S small
        # matmuls + masked accumulate, all MXU/VPU (XLA fuses the chain)
        hi_oh, lo_oh = _bin_onehots(lam)
        v = _pad_rows(jnp.asarray(table))                   # (S, 15, 32)
        out = jnp.zeros(lam.shape, jnp.float32)
        for s in range(S):
            val_s = _oh_eval(v[s], hi_oh, lo_oh)
            out = out + jnp.where(
                (spec_idx == s)[..., None], val_s, 0.0
            )
        return out
    bin_idx = _lam_bins(lam)
    # flat 1D gather: the 2D advanced-index form lowers to a much slower
    # multi-dim gather on TPU (scalar-unit bound either way, but the flat
    # form vectorizes the address math)
    flat = table.reshape(-1)
    return flat[spec_idx[..., None] * table.shape[1] + bin_idx]


def sigmoid(x):
    """Jakob–Hanika sigmoid (reference rgb_to_spectrum_data.cu:24-26),
    with the ±inf -> 0/1 limits of rgb_sigmoid_polynomial.h."""
    # |x| beyond ~1e15 overflows x*x to inf in f32 (x/inf -> 0 -> s=0.5):
    # saturate explicitly so the ±1e30 ideal-black/white coeffs hit 0/1
    xc = jnp.clip(x, -1e15, 1e15)
    s = 0.5 * xc / jnp.sqrt(1.0 + xc * xc) + 0.5
    return jnp.where(x >= 1e15, 1.0, jnp.where(x <= -1e15, 0.0, s))


def sigmoid_polynomial(c, lam):
    """Evaluate sigmoid(c0·λ² + c1·λ + c2) at λ.

    c: (..., 3) coefficients in *wavelength space* (the table stores them
    pre-substituted, reference rgb_to_spectrum_data.cu:319-327);
    lam: (..., N) -> (..., N).
    """
    x = (c[..., 0:1] * lam + c[..., 1:2]) * lam + c[..., 2:3]
    return sigmoid(x)
