"""rgb2spec table roundtrip validation (SURVEY §4 (a): 'rgb2spec')."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.spectral import cie, rgb2spec, spectra, colorspace


def reflectance_to_srgb_d65(s_dense):
    """Integrate reflectance * D65 against CIE, convert to linear sRGB.

    s_dense: (..., 471) reflectance in [0,1].
    """
    d65 = cie.illum_d65()
    cs = colorspace.srgb()
    illum = s_dense * d65
    xyz = np.stack(
        [
            (illum * cie.X()).sum(-1),
            (illum * cie.Y()).sum(-1),
            (illum * cie.Z()).sum(-1),
        ],
        axis=-1,
    )
    # normalize by illuminant luminance so reflectance 1 -> rgb 1
    xyz /= (d65 * cie.Y()).sum(-1)
    return xyz @ cs.rgb_from_xyz.T


def test_rgb2spec_roundtrip():
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0.05, 0.95, size=(64, 3))
    c = rgb2spec.rgb_to_coefficients(jnp.asarray(rgb, jnp.float32))
    lam = jnp.asarray(cie.lambdas(), jnp.float32)
    s = spectra.sigmoid_polynomial(c, jnp.broadcast_to(lam, (64, 471)))
    s = np.asarray(s, np.float64)
    assert s.min() >= 0.0 and s.max() <= 1.0
    back = reflectance_to_srgb_d65(s)
    err = np.abs(back - rgb)
    assert err.max() < 0.02, f"max rgb roundtrip err {err.max()}"


def test_rgb2spec_uniform_grey():
    rgb = jnp.asarray([[0.5, 0.5, 0.5], [0.73, 0.73, 0.73]], jnp.float32)
    c = rgb2spec.rgb_to_coefficients(rgb)
    lam = jnp.asarray(cie.lambdas(), jnp.float32)
    s = np.asarray(spectra.sigmoid_polynomial(c, jnp.broadcast_to(lam, (2, 471))))
    # constant spectra
    assert np.allclose(s[0], 0.5, atol=1e-5)
    assert np.allclose(s[1], 0.73, atol=1e-5)


def test_rgb2spec_primaries_saturated():
    """Saturated primaries map to in-gamut spectra whose roundtrip keeps hue."""
    rgb = np.array([[0.9, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.85]])
    c = rgb2spec.rgb_to_coefficients(jnp.asarray(rgb, jnp.float32))
    lam = jnp.asarray(cie.lambdas(), jnp.float32)
    s = np.asarray(spectra.sigmoid_polynomial(c, jnp.broadcast_to(lam, (3, 471))), np.float64)
    back = reflectance_to_srgb_d65(s)
    assert np.argmax(back[0]) == 0
    assert np.argmax(back[1]) == 1
    assert np.argmax(back[2]) == 2
    assert np.abs(back - rgb).max() < 0.06


def test_rgb2spec_gradient_flows():
    import jax

    def lum(rgb):
        c = rgb2spec.rgb_to_coefficients(rgb)
        lam = jnp.asarray(cie.lambdas(), jnp.float32)
        s = spectra.sigmoid_polynomial(c[None, :], lam[None, :])
        return jnp.sum(s * jnp.asarray(cie.Y(), jnp.float32)) / cie.CIE_Y_INTEGRAL

    g = jax.grad(lum)(jnp.asarray([0.2, 0.6, 0.3], jnp.float32))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.all(g > 0)  # brighter albedo -> brighter reflectance
