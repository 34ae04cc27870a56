"""Layered (coated) BxDF + mix material tests (reference bxdfs/layered_bxdf.h,
materials/coated_*.cu, materials/mix_material.cu)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import bxdfs, layered


def _params(R, bottom_kind=bxdfs.K_DIFFUSE, refl=0.8, coat_rough=1e-4,
            albedo=0.0, thickness=0.01, g=0.0):
    ones4 = jnp.ones((R, 4))
    top = bxdfs.BxdfParams(
        kind=jnp.full((R,), bxdfs.K_DIELECTRIC, jnp.int32),
        refl=ones4 * 0.0, trans=ones4 * 0.0,
        eta_re=ones4, eta_im=ones4 * 0.0,
        eta=jnp.full((R,), 1.5),
        ax=jnp.full((R,), coat_rough), ay=jnp.full((R,), coat_rough),
    )
    bottom = top._replace(
        kind=jnp.full((R,), bottom_kind, jnp.int32),
        refl=ones4 * refl,
        eta_re=ones4 * 0.2, eta_im=ones4 * 3.0,  # metallic if conductor
        ax=jnp.full((R,), 1e-4), ay=jnp.full((R,), 1e-4),
    )
    return layered.LayeredParams(
        top=top, bottom=bottom,
        thickness=jnp.full((R,), thickness), g=jnp.full((R,), g),
        albedo=jnp.ones((R, 4)) * albedo,
        max_depth=10, n_samples=1,
    )


def _wo(R, v=(0.3, 0.1, 0.95)):
    w = jnp.tile(jnp.asarray([list(v)]), (R, 1))
    return w / jnp.linalg.norm(w, axis=-1, keepdims=True)


def test_coated_diffuse_energy_consistency():
    """Hemispherical reflectance from f-integration and from sampling agree
    and stay below 1 (energy conservation)."""
    R = 1 << 14
    rng = np.random.default_rng(0)
    p = _params(R)
    wo = _wo(R)
    u = rng.uniform(size=(R, 2)).astype(np.float32)
    rr = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    wi = np.stack([rr * np.cos(phi), rr * np.sin(phi), np.sqrt(1 - u[:, 0])], -1)
    rho_f = float(np.pi * np.asarray(layered.layered_f(p, wo, jnp.asarray(wi))).mean())

    s = layered.layered_sample(
        p, wo,
        jnp.asarray(rng.uniform(size=(R,)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(R, 2)).astype(np.float32)),
    )
    est = jnp.where(
        s.valid[..., None],
        s.f * jnp.abs(s.wi[..., 2:3]) / jnp.maximum(s.pdf, 1e-12)[..., None],
        0.0,
    )
    rho_s = float(np.asarray(est).mean())
    # sampling includes the ~4% specular entrance reflection that f() (being
    # a smooth-coat delta) cannot report
    assert 0.4 < rho_f < 0.75, rho_f
    assert 0.45 < rho_s < 0.8, rho_s
    assert abs(rho_s - rho_f) < 0.1


def test_coated_reflectance_below_bottom_albedo():
    """The coat can only lose energy vs the bare diffuse bottom."""
    R = 1 << 13
    rng = np.random.default_rng(1)
    for refl in (0.3, 0.9):
        p = _params(R, refl=refl)
        s = layered.layered_sample(
            p, _wo(R),
            jnp.asarray(rng.uniform(size=(R,)).astype(np.float32)),
            jnp.asarray(rng.uniform(size=(R, 2)).astype(np.float32)),
        )
        est = jnp.where(
            s.valid[..., None],
            s.f * jnp.abs(s.wi[..., 2:3]) / jnp.maximum(s.pdf, 1e-12)[..., None],
            0.0,
        )
        rho = float(np.asarray(est).mean())
        assert rho < refl + 0.06, (refl, rho)
        assert rho > 0.25 * refl


def test_coated_conductor_reflects():
    R = 1 << 13
    rng = np.random.default_rng(2)
    p = _params(R, bottom_kind=bxdfs.K_CONDUCTOR)
    s = layered.layered_sample(
        p, _wo(R),
        jnp.asarray(rng.uniform(size=(R,)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(R, 2)).astype(np.float32)),
    )
    assert float(jnp.mean(s.valid)) > 0.5
    # all exits are reflections for an opaque bottom
    up = np.asarray(s.wi[..., 2])[np.asarray(s.valid)]
    assert (up > 0).mean() > 0.99


def test_scattering_medium_in_coat():
    """Albedo > 0 in the coat adds volumetric scattering; still finite/valid."""
    R = 1 << 12
    rng = np.random.default_rng(3)
    p = _params(R, albedo=0.6, thickness=0.5, g=0.3)
    wo = _wo(R)
    wi = _wo(R, v=(-0.4, 0.2, 0.89))
    fv = np.asarray(layered.layered_f(p, wo, wi))
    assert np.isfinite(fv).all() and (fv >= 0).all()
    assert fv.mean() > 0.0
    s = layered.layered_sample(
        p, wo,
        jnp.asarray(rng.uniform(size=(R,)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(R, 2)).astype(np.float32)),
    )
    assert np.isfinite(np.asarray(s.f)).all()


def test_layered_pdf_positive_and_finite():
    R = 1 << 12
    p = _params(R, coat_rough=0.1)
    wo = _wo(R)
    wi = _wo(R, v=(-0.2, 0.5, 0.84))
    pv = np.asarray(layered.layered_pdf(p, wo, wi))
    assert np.isfinite(pv).all()
    assert (pv > 0).all()  # includes the 0.1 uniform-sphere blend


def test_mix_material_resolution():
    """Scene-level: mix material resolves stochastically to its members."""
    from pbrt_tpu.scene import builder as bd
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.materials import materials
    import tempfile, os

    pbrt = """
    Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
    Camera "perspective" "float fov" [45]
    WorldBegin
    MakeNamedMaterial "red" "string type" "diffuse" "rgb reflectance" [0.8 0.1 0.1]
    MakeNamedMaterial "blue" "string type" "diffuse" "rgb reflectance" [0.1 0.1 0.8]
    Material "mix" "string materials" ["red" "blue"] "float amount" [0.25]
    Shape "trianglemesh" "integer indices" [0 1 2]
      "point3 P" [0 0 0  1 0 0  0 1 0]
    """
    d = tempfile.mkdtemp()
    path = os.path.join(d, "mix.pbrt")
    open(path, "w").write(pbrt)
    b = bd.SceneBuilder().parse_file(path)
    scene, meta = compile_scene(b)
    assert int(scene.mix_marker.shape[0]) == 1

    N = 4096
    rng = np.random.default_rng(4)
    mat = jnp.asarray(np.full(N, np.asarray(scene.tri_mat)[0], np.int32))
    pos = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    wo = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    resolved = np.asarray(materials.resolve_mix(scene, mat, pos, wo))
    m1 = np.asarray(scene.mat_mix_m1)[np.asarray(scene.tri_mat)[0]]
    m2 = np.asarray(scene.mat_mix_m2)[np.asarray(scene.tri_mat)[0]]
    assert set(resolved.tolist()) == {int(m1), int(m2)}
    frac_m1 = (resolved == m1).mean()
    assert abs(frac_m1 - 0.25) < 0.03, frac_m1
