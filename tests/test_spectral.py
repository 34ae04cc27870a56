"""Spectral core unit tests (SURVEY.md §4 recommendation (a))."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.spectral import cie, colorspace, sampled, spectra


def test_cie_tables_shape_and_norm():
    assert cie.lambdas().shape == (471,)
    assert cie.lambdas()[0] == 360 and cie.lambdas()[-1] == 830
    # CIE_Y_integral constant matches the dataset (reference
    # spectrum_constants_cie.h:12)
    assert abs(np.sum(cie.Y()) - cie.CIE_Y_INTEGRAL) < 1e-3


def test_d65_photometric_normalization():
    # reference normalizes D65 so <D65, Y> == CIE_Y_integral
    d65 = cie.illum_d65()
    assert abs(cie.inner_product(d65, cie.Y()) - cie.CIE_Y_INTEGRAL) < 1e-6


def test_visible_wavelength_sampling_pdf_integrates_to_one():
    lam = np.linspace(360.0, 830.0, 100000)
    pdf = np.asarray(sampled.visible_wavelengths_pdf(jnp.asarray(lam)))
    integral = np.trapezoid(pdf, lam)
    assert abs(integral - 1.0) < 1e-3


def test_sample_visible_inverts_pdf():
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, size=(128,)))
    wl = sampled.sample_visible(u)
    assert wl.lam.shape == (128, 4)
    assert np.all(np.asarray(wl.lam) >= 360.0 - 1e-3)
    assert np.all(np.asarray(wl.lam) <= 830.0 + 1e-3)
    assert np.all(np.asarray(wl.pdf) > 0)
    # pdf really is the density of the warp: check via histogram
    u2 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, size=(200000,)))
    lam = np.asarray(sampled.sample_visible_wavelengths(u2))
    hist, edges = np.histogram(lam, bins=50, range=(380, 750), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf_c = np.asarray(sampled.visible_wavelengths_pdf(jnp.asarray(centers)))
    assert np.allclose(hist, pdf_c, rtol=0.1, atol=5e-4)


def test_terminate_secondary():
    u = jnp.asarray(np.array([0.3]))
    wl = sampled.sample_visible(u)
    wl2 = sampled.terminate_secondary(wl)
    assert np.all(np.asarray(wl2.pdf[..., 1:]) == 0)
    assert np.allclose(np.asarray(wl2.pdf[..., 0]), np.asarray(wl.pdf[..., 0]) / 4)
    # idempotent
    wl3 = sampled.terminate_secondary(wl2)
    assert np.allclose(np.asarray(wl3.pdf), np.asarray(wl2.pdf))


def test_blackbody_peak_normalized():
    s = spectra.blackbody(6000.0)
    assert s.max() <= 1.0 + 1e-6
    assert s.max() > 0.99  # Wien peak ~483nm is inside [360, 830]


def test_srgb_colorspace_matrices():
    cs = colorspace.srgb()
    # canonical sRGB/D65 matrix, loose tolerance (whitepoint from data)
    expect = np.array(
        [[0.4124, 0.3576, 0.1805], [0.2126, 0.7152, 0.0722], [0.0193, 0.1192, 0.9505]]
    )
    assert np.allclose(cs.xyz_from_rgb, expect, atol=5e-3)
    assert np.allclose(cs.rgb_from_xyz @ cs.xyz_from_rgb, np.eye(3), atol=1e-10)


def test_dense_sampling_nearest():
    vals = np.arange(471.0)
    lam = jnp.asarray(np.array([[360.0, 360.4, 400.6, 830.0]]))
    out = np.asarray(spectra.sample_dense(jnp.asarray(vals), lam))
    assert np.allclose(out, [[0.0, 0.0, 41.0, 470.0]])


def test_spectrum_table_gather():
    table = jnp.asarray(np.stack([np.full(471, 2.0), np.arange(471.0)]))
    lam = jnp.asarray(np.array([[400.0, 500.0, 600.0, 700.0]]))
    idx = jnp.asarray(np.array([1]))
    out = np.asarray(spectra.sample_table(table, idx, lam))
    assert np.allclose(out, [[40.0, 140.0, 240.0, 340.0]])


def test_srgb_encode_roundtrip():
    x = jnp.asarray(np.linspace(0, 1, 64))
    rt = np.asarray(colorspace.srgb_decode(colorspace.srgb_encode(x)))
    assert np.allclose(rt, np.asarray(x), atol=1e-6)


def test_luminance_of_d65_equals_one():
    """y() of the normalized D65 illuminant sampled at visible wavelengths
    should be ~1 in expectation (it was normalized to CIE_Y_integral)."""
    u = jnp.asarray(np.random.default_rng(3).uniform(0, 1, size=(4096,)))
    wl = sampled.sample_visible(u)
    d65 = jnp.asarray(cie.illum_d65())
    L = spectra.sample_dense(d65, wl.lam)
    ys = sampled.y(L, wl, lambda lam: spectra.sample_dense(jnp.asarray(cie.Y()), lam))
    assert abs(float(jnp.mean(ys)) - 1.0) < 0.02
