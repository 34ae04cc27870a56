"""White-furnace and energy-conservation tests (VERDICT r1 item 7).

BxDF level: hemispherical albedo rho = E[f |cos| / pdf] over importance
samples must be <= 1 (energy conservation) and == 1 for perfect reflectors.
Integrator level: under a constant uniform-infinite light with Le = 1 and a
perfectly white diffuse surface, every path escapes with beta = 1, so every
pixel of the render must equal 1 exactly (analytic closed form) — this
gates the NEE + MIS + RR weight bookkeeping end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import bxdfs


R = 1 << 14


def _rho(params, seed=0, wo_z=0.6):
    """MC hemispherical albedo at a fixed wo via the bxdf's own sampler.

    Refraction carries a 1/eta^2 radiance-compression factor that is
    transport, not absorption — undo it with the event's eta so the energy
    identity reads 1 for lossless interfaces."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    wo = jnp.broadcast_to(
        jnp.array([np.sqrt(1 - wo_z**2), 0.0, wo_z], jnp.float32), (R, 3)
    )
    uc = jax.random.uniform(k1, (R,))
    u2 = jax.random.uniform(k2, (R, 2))
    s = bxdfs.sample(params, wo, uc, u2)
    w = jnp.where(
        s.valid & (s.pdf > 0),
        jnp.mean(s.f, -1) * jnp.abs(s.wi[..., 2]) / jnp.maximum(s.pdf, 1e-12)
        * s.eta ** 2,
        0.0,
    )
    return float(jnp.mean(w))


def _params(kind, **kw):
    ones = jnp.ones((R, 4))
    p = dict(
        kind=jnp.full((R,), kind, jnp.int32),
        refl=ones,
        trans=jnp.zeros((R, 4)),
        eta_re=ones * 0.01,
        eta_im=ones * 1e4,     # near-perfect conductor: F -> 1
        eta=jnp.full((R,), 1.5),
        ax=jnp.full((R,), 1e-4),
        ay=jnp.full((R,), 1e-4),
    )
    p.update({k: jnp.asarray(v) * jnp.ones_like(p[k]) for k, v in kw.items()})
    return bxdfs.BxdfParams(**p)


def test_furnace_diffuse():
    rho = _rho(_params(bxdfs.K_DIFFUSE))
    assert abs(rho - 1.0) < 0.01, rho


def test_furnace_smooth_conductor():
    rho = _rho(_params(bxdfs.K_CONDUCTOR))
    assert abs(rho - 1.0) < 0.02, rho


def test_furnace_rough_conductor():
    # single-scattering GGX loses energy to masking; must stay within (0.7, 1]
    rho = _rho(_params(bxdfs.K_CONDUCTOR, ax=0.3, ay=0.3))
    assert 0.7 < rho <= 1.005, rho


def test_furnace_smooth_dielectric():
    # R + T must carry all energy
    rho = _rho(_params(bxdfs.K_DIELECTRIC))
    assert abs(rho - 1.0) < 0.02, rho


def test_furnace_rough_dielectric():
    rho = _rho(_params(bxdfs.K_DIELECTRIC, ax=0.25, ay=0.25))
    assert 0.75 < rho <= 1.01, rho


def test_furnace_diffuse_transmission():
    p = _params(bxdfs.K_DIFF_TRANS, refl=0.5, trans=0.5)
    rho = _rho(p)
    assert abs(rho - 1.0) < 0.02, rho


def test_furnace_grazing_angles():
    # energy conservation must hold at grazing incidence too
    for wo_z in (0.05, 0.95):
        rho = _rho(_params(bxdfs.K_DIFFUSE), wo_z=wo_z)
        assert abs(rho - 1.0) < 0.02, (wo_z, rho)


FURNACE_SCENE = """
Integrator "path" "integer maxdepth" [6]
Sampler "independent" "integer pixelsamples" [64]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
PixelFilter "box"
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "diffuse" "rgb reflectance" [1 1 1]
Shape "sphere" "float radius" [1]
"""


def test_integrator_white_furnace():
    """Closed form: white sphere under a unit furnace -> every pixel's
    expectation is exactly 1 (the sphere is convex, so every cosine-sampled
    bounce escapes; NEE + MIS weights must telescope to Le). Gates the
    NEE + MIS + RR weight bookkeeping through the full path loop."""
    from pbrt_tpu.scene import builder as bd, lexer as lx
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.integrators.render import render

    b = bd.SceneBuilder()
    b.parse_tokens(lx.tokenize(FURNACE_SCENE))
    scene, meta = compile_scene(b)
    img = np.asarray(render(scene, meta))
    assert np.isfinite(img).all()
    # per-pixel MC noise from the NEE/BSDF MIS split; the MEAN is tight
    np.testing.assert_allclose(img, 1.0, atol=0.18)
    assert abs(img.mean() - 1.0) < 0.015, img.mean()
