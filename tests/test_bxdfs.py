"""BxDF correctness: energy conservation (furnace), sample/pdf consistency,
reciprocity (SURVEY §4 (a): sampling warps, Fresnel)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials import bxdfs, scattering as sc
from pbrt_tpu.sampling import warps


def mk_params(R, kind, refl=0.8, eta=1.5, ax=0.001, ay=0.001, eta_re=0.2, eta_im=3.9, trans=0.0):
    ones = jnp.ones((R,), jnp.float32)
    ones4 = jnp.ones((R, 4), jnp.float32)
    return bxdfs.BxdfParams(
        kind=jnp.full((R,), kind, jnp.int32),
        refl=refl * ones4,
        trans=trans * ones4,
        eta_re=eta_re * ones4,
        eta_im=eta_im * ones4,
        eta=eta * ones,
        ax=ax * ones,
        ay=ay * ones,
    )


def wo_fixed(R, z=0.6):
    x = np.sqrt(1 - z * z)
    return jnp.asarray(np.tile([x, 0.0, z], (R, 1)), jnp.float32)


def test_diffuse_furnace():
    """E[f cos / pdf] over sampled directions == reflectance."""
    R = 65536
    rng = np.random.default_rng(0)
    p = mk_params(R, bxdfs.K_DIFFUSE, refl=1.0)
    wo = wo_fixed(R)
    s = bxdfs.sample(
        p, wo, jnp.asarray(rng.uniform(size=R), jnp.float32),
        jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32),
    )
    est = np.asarray(s.f[:, 0] * np.abs(np.asarray(s.wi[:, 2])) / np.asarray(s.pdf))
    est = np.where(np.asarray(s.valid), est, 0.0)
    assert abs(est.mean() - 1.0) < 0.01


def test_diffuse_f_pdf_consistency():
    R = 4096
    rng = np.random.default_rng(1)
    p = mk_params(R, bxdfs.K_DIFFUSE, refl=0.73)
    wo = wo_fixed(R)
    wi = jnp.asarray(warps.sample_uniform_sphere(jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32)))
    f = np.asarray(bxdfs.f(p, wo, wi))
    pdf = np.asarray(bxdfs.pdf(p, wo, wi))
    same = np.asarray(wi[:, 2]) * 0.6 > 0
    assert np.allclose(f[same, 0], 0.73 / np.pi, atol=1e-5)
    assert np.allclose(f[~same, 0], 0.0)
    assert np.allclose(pdf[same], np.abs(np.asarray(wi[:, 2]))[same] / np.pi, atol=1e-5)


def test_rough_conductor_energy_bounded_and_consistent():
    """Monte Carlo: integral of f cos via BSDF sampling <= 1 and matches
    integral via uniform sampling."""
    R = 200000
    rng = np.random.default_rng(2)
    p = mk_params(R, bxdfs.K_CONDUCTOR, ax=0.3, ay=0.3, eta_re=0.2, eta_im=3.9)
    wo = wo_fixed(R)
    s = bxdfs.sample(
        p, wo, jnp.asarray(rng.uniform(size=R), jnp.float32),
        jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32),
    )
    valid = np.asarray(s.valid)
    est_b = np.where(
        valid, np.asarray(s.f[:, 0]) * np.abs(np.asarray(s.wi[:, 2])) / np.asarray(s.pdf), 0.0
    ).mean()
    # uniform-sphere integration of f cos
    wi_u = jnp.asarray(
        warps.sample_uniform_sphere(jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32))
    )
    f_u = np.asarray(bxdfs.f(p, wo, wi_u)[:, 0])
    est_u = (f_u * np.abs(np.asarray(wi_u[:, 2])) * 4 * np.pi).mean()
    assert est_b <= 1.01
    assert abs(est_b - est_u) < 0.03, (est_b, est_u)


def test_rough_conductor_sample_pdf_matches_pdf_fn():
    R = 8192
    rng = np.random.default_rng(3)
    p = mk_params(R, bxdfs.K_CONDUCTOR, ax=0.4, ay=0.2)
    wo = wo_fixed(R, z=0.4)
    s = bxdfs.sample(
        p, wo, jnp.asarray(rng.uniform(size=R), jnp.float32),
        jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32),
    )
    pdf2 = np.asarray(bxdfs.pdf(p, wo, s.wi))
    valid = np.asarray(s.valid)
    assert np.allclose(np.asarray(s.pdf)[valid], pdf2[valid], rtol=2e-3, atol=1e-5)
    f2 = np.asarray(bxdfs.f(p, wo, s.wi))
    assert np.allclose(np.asarray(s.f)[valid], f2[valid], rtol=2e-3, atol=1e-5)


def test_smooth_dielectric_energy():
    """Specular dielectric: R+T splits sum to 1 in expectation (f*cos/pdf)."""
    R = 200000
    rng = np.random.default_rng(4)
    p = mk_params(R, bxdfs.K_DIELECTRIC, eta=1.5, ax=0.0, ay=0.0)
    wo = wo_fixed(R, z=0.8)
    s = bxdfs.sample(
        p, wo, jnp.asarray(rng.uniform(size=R), jnp.float32),
        jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32),
    )
    valid = np.asarray(s.valid)
    assert valid.mean() > 0.99
    w = np.where(
        valid, np.asarray(s.f[:, 0]) * np.abs(np.asarray(s.wi[:, 2])) / np.asarray(s.pdf), 0.0
    )
    # radiance transport: reflected contributes R, refracted T/eta^2 * eta^2
    # compensation on return... one-way estimate equals R + T/eta_p^2 * |...|;
    # instead check the split probabilities match Fresnel and f is finite
    Fd, _, _ = sc.fr_dielectric(jnp.asarray([0.8]), jnp.asarray([1.5]))
    frac_refl = (np.asarray(s.wi[:, 2]) > 0).mean()
    assert abs(frac_refl - float(Fd[0])) < 0.01
    assert np.isfinite(w).all()


def test_smooth_dielectric_refraction_direction():
    p = mk_params(1, bxdfs.K_DIELECTRIC, eta=1.5)
    wo = jnp.asarray([[0.6, 0.0, 0.8]], jnp.float32)
    # force transmission with uc ~ 1
    s = bxdfs.sample(p, wo, jnp.asarray([0.999], jnp.float32), jnp.asarray([[0.5, 0.5]], jnp.float32))
    wi = np.asarray(s.wi)[0]
    # Snell: sin_t = sin_i / eta
    sin_i = 0.6
    sin_t = sin_i / 1.5
    assert wi[2] < 0
    assert abs(np.hypot(wi[0], wi[1]) - sin_t) < 1e-3  # fp32
    # eta event reported
    assert abs(float(s.eta[0]) - 1.5) < 1e-6


def test_rough_dielectric_consistency():
    R = 8192
    rng = np.random.default_rng(5)
    p = mk_params(R, bxdfs.K_DIELECTRIC, eta=1.5, ax=0.2, ay=0.2)
    wo = wo_fixed(R, z=0.5)
    s = bxdfs.sample(
        p, wo, jnp.asarray(rng.uniform(size=R), jnp.float32),
        jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32),
    )
    valid = np.asarray(s.valid)
    assert valid.mean() > 0.9
    pdf2 = np.asarray(bxdfs.pdf(p, wo, s.wi))
    f2 = np.asarray(bxdfs.f(p, wo, s.wi))
    ok = valid & (pdf2 > 1e-6)
    assert np.allclose(np.asarray(s.pdf)[ok], pdf2[ok], rtol=5e-3, atol=1e-4)
    assert np.allclose(np.asarray(s.f)[ok], f2[ok], rtol=5e-3, atol=1e-4)


def test_fresnel_complex_matches_real_limit():
    """FrComplex with k=0 equals FrDielectric."""
    cos_i = jnp.asarray(np.linspace(0.05, 1.0, 32), jnp.float32)
    eta = 1.5
    f_c = np.asarray(sc.fr_complex(cos_i, jnp.full_like(cos_i, eta), jnp.zeros_like(cos_i)))
    f_d = np.asarray(sc.fr_dielectric(cos_i, jnp.full_like(cos_i, eta))[0])
    assert np.allclose(f_c, f_d, atol=1e-5)


def test_trowbridge_reitz_d_integrates_to_one():
    """∫ D(wm) cos(wm) dwm = 1 (NDF normalization)."""
    rng = np.random.default_rng(6)
    R = 400000
    wm = jnp.asarray(
        warps.sample_uniform_hemisphere(jnp.asarray(rng.uniform(size=(R, 2)), jnp.float32))
    )
    ax = ay = 0.35
    d = np.asarray(sc.tr_d(wm, ax, ay))
    integral = (d * np.asarray(wm[:, 2])).mean() * 2 * np.pi
    assert abs(integral - 1.0) < 0.02
