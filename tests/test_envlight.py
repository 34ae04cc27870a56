"""Image-infinite (env map) light + alias table tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.distribution import distributions as dist
from pbrt_tpu.sampling import warps


def test_alias_table_statistics():
    rng = np.random.default_rng(0)
    w = rng.uniform(0.0, 1.0, 64)
    w[rng.uniform(size=64) < 0.3] = 0.0
    q, alias, pdf = dist.alias_table_build(w)
    u = jnp.asarray(rng.uniform(size=(400000,)).astype(np.float32))
    idx, u2 = dist.alias_sample(jnp.asarray(q), jnp.asarray(alias), u)
    counts = np.bincount(np.asarray(idx), minlength=64) / 400000
    assert np.allclose(counts, pdf, atol=5e-3)
    # remapped u stays uniform
    uu = np.asarray(u2)
    assert abs(uu.mean() - 0.5) < 5e-3 and abs(uu.var() - 1 / 12) < 5e-3


def test_alias_table_zero_rows_never_sampled():
    w = np.array([0.0, 1.0, 0.0, 2.0])
    q, alias, pdf = dist.alias_table_build(w)
    u = jnp.linspace(0.0, 0.9999, 10001)
    idx, _ = dist.alias_sample(jnp.asarray(q), jnp.asarray(alias), u)
    got = set(np.asarray(idx).tolist())
    assert got == {1, 3}


def _write_pfm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(f"PF\n{w} {h}\n-1.0\n".encode())
        fh.write(np.flipud(img).astype("<f4").tobytes())


@pytest.fixture(scope="module")
def env_scene(tmp_path_factory):
    """Octahedral env map: bright patch in the +z hemisphere."""
    from pbrt_tpu.scene import builder as bd
    from pbrt_tpu.scene.compile import compile_scene

    d = tmp_path_factory.mktemp("env")
    H = W = 32
    img = np.full((H, W, 3), 0.05, np.float32)
    # center of the octahedral square = +z pole
    img[12:20, 12:20] = [8.0, 7.0, 5.0]
    _write_pfm(str(d / "env.pfm"), img)
    pbrt = """
    Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "independent" "integer pixelsamples" [16]
    Integrator "path" "integer maxdepth" [3]
    LookAt 0 1 -4   0 1 0   0 1 0
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "infinite" "string filename" ["env.pfm"]
    Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
    Shape "sphere" "float radius" [1]
    """
    (d / "scene.pbrt").write_text(pbrt)
    b = bd.SceneBuilder().parse_file(str(d / "scene.pbrt"))
    return compile_scene(b)


def test_env_scene_renders(env_scene):
    from pbrt_tpu.integrators import render as R

    scene, meta = env_scene
    assert meta.env_light_ids == (0,)
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    # background shows the env map (bright patch is at +z behind the sphere)
    assert img.max() > 1.0
    assert img.mean() > 0.01


def test_env_le_matches_map(env_scene):
    """Escaped-ray radiance toward +z equals the bright patch."""
    from pbrt_tpu.lights import lights

    scene, meta = env_scene
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    li = jnp.zeros((4,), jnp.int32)
    lam = jnp.tile(jnp.asarray([[460.0, 550.0, 600.0, 650.0]]), (4, 1))
    Le_bright = np.asarray(lights.env_le(scene, li, d, lam))
    d2 = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (4, 1))
    Le_dim = np.asarray(lights.env_le(scene, li, d2, lam))
    assert Le_bright.mean() > 10 * Le_dim.mean()
    assert Le_dim.mean() > 0


def test_env_sample_li_pdf_consistency(env_scene):
    """E[f(w)/pdf(w)] over alias samples == integral of Le over sphere
    (validated against a uniform-direction estimate)."""
    from pbrt_tpu.lights import lights

    scene, meta = env_scene
    N = 1 << 16
    rng = np.random.default_rng(1)
    u2 = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    li = jnp.zeros((N,), jnp.int32)
    lam = jnp.tile(jnp.asarray([[550.0, 550.0, 550.0, 550.0]]), (N, 1))
    p_ref = jnp.zeros((N, 3))

    L, wi, pdf, _ = lights.env_sample_li(scene, li, p_ref, u2, lam, scene.scene_radius)
    est_importance = float((L[:, 0] / jnp.maximum(pdf, 1e-12)).mean())

    # cross-check pdf_li agrees with the sampling pdf at the sampled dirs
    pdf2 = lights.env_pdf_li(scene, li, wi)
    ok = np.asarray(jnp.abs(pdf - pdf2) / jnp.maximum(pdf, 1e-9))
    assert np.quantile(ok, 0.95) < 0.05  # bilerp-vs-texel edges allowed

    # uniform-direction reference estimate
    du = np.asarray(warps.sample_uniform_sphere(
        jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))))
    Lu = np.asarray(lights.env_le(scene, li, jnp.asarray(du), lam))[:, 0]
    est_uniform = float(Lu.mean() * 4 * np.pi)
    assert abs(est_importance - est_uniform) < 0.05 * est_uniform, (
        est_importance, est_uniform)
