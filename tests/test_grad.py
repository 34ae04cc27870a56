"""Differentiability tests (SURVEY.md §7 Phase 3): autodiff through the
full bounce loop must be finite and match finite differences on the
continuous parameters (light scale, albedo coefficients)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene.testscenes import cornell
from pbrt_tpu.parallel import train


@pytest.fixture(scope="module")
def small():
    scene, meta = cornell(res=16, spp=1)
    return scene, meta


def _loss_fn(scene, params, res=16, max_depth=3):
    n_pixels = res * res
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.int32)[None]
    sample_ids = jnp.zeros_like(pixel_ids)
    sc = train.apply_params(scene, params)
    img = train.render_image_diff(
        sc, pixel_ids, sample_ids, max_depth=max_depth, res_x=res, n_pixels=n_pixels
    )
    return jnp.mean(img ** 2)


def test_grads_all_finite_depth5(small):
    scene, meta = small
    params = train.get_params(scene)
    g = jax.grad(lambda p: _loss_fn(scene, p, max_depth=5))(params)
    for name, leaf in g._asdict().items():
        assert np.isfinite(np.asarray(leaf)).all(), f"{name} grad not finite"
    assert float(jnp.abs(g.lt_scale).sum()) > 0.0
    assert float(jnp.abs(g.mat_refl_c).sum()) > 0.0


def test_camera_pose_grads_finite_and_alive(small):
    """Pose gradients flow through the primary-ray geometry and must be
    finite and nonzero on the full scene (spheres included: the silhouette
    Jacobians are exactly where they used to NaN)."""
    scene, meta = small
    params = train.get_params(scene)
    g = np.asarray(jax.grad(lambda p: _loss_fn(scene, p))(params).cam_pose)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0, "camera pose gradient is dead"


def test_camera_pose_grad_matches_fd():
    """FD check on a silhouette-FREE scene (cornell without the spheres):
    interior AD cannot represent visibility boundary terms, so the FD
    comparison needs a scene where translating the camera only slides hit
    points within smooth walls (SURVEY §7 Phase 3)."""
    from pbrt_tpu.scene import builder as bd, lexer as lx, testscenes as ts
    from pbrt_tpu.scene.compile import compile_scene

    txt = ts.CORNELL_PBRT
    i = txt.index('AttributeBegin\n  Material "conductor"')
    b = bd.SceneBuilder()
    b.parse_tokens(lx.tokenize(txt[:i]))
    b.film["xresolution"] = b.film["yresolution"] = 16
    scene, meta = compile_scene(b, spp_override=1)
    params = train.get_params(scene)
    f = lambda p: _loss_fn(scene, p, max_depth=2)  # inner jit caches
    g = np.asarray(
        jax.grad(lambda p: _loss_fn(scene, p, max_depth=2))(params).cam_pose
    )
    assert np.isfinite(g).all()
    # dominant translation entry (scene units ~500; eps scaled accordingly)
    trans = [(0, 3), (1, 3), (2, 3)]
    i, j = max(trans, key=lambda ij: abs(g[ij]))
    eps = 0.25
    e = jnp.zeros_like(params.cam_pose).at[i, j].set(eps)
    fp = f(params._replace(cam_pose=params.cam_pose + e))
    fm = f(params._replace(cam_pose=params.cam_pose - e))
    fd = float((fp - fm) / (2 * eps))
    ad = float(g[i, j])
    assert np.isclose(ad, fd, rtol=0.25, atol=3e-7), (ad, fd)


def test_texture_texel_grads(tmp_path):
    """Texel gradients: loss wrt the image atlas is finite, nonzero, and
    FD-matched on the dominant texel."""
    from pbrt_tpu.scene import builder as bd
    from pbrt_tpu.scene.compile import compile_scene

    img8 = (np.arange(12).reshape(2, 2, 3) * 20 + 30).astype(np.uint8)
    from tests.test_textures import _write_png

    _write_png(str(tmp_path / "t.png"), img8)
    pbrt = """
    Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
    Sampler "independent" "integer pixelsamples" [1]
    Integrator "path" "integer maxdepth" [2]
    LookAt 0 3 4   0 0 0   0 1 0
    Camera "perspective" "float fov" [45]
    WorldBegin
    Texture "tex" "spectrum" "imagemap" "string filename" ["t.png"]
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [10 10 10]
      Translate 0 4 0
      Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
        "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    AttributeEnd
    Material "diffuse" "texture reflectance" "tex"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point3 P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2]
      "point2 uv" [0 0  1 0  1 1  0 1]
    """
    p = tmp_path / "tex.pbrt"
    p.write_text(pbrt)
    b = bd.SceneBuilder().parse_file(str(p))
    scene, meta = compile_scene(b)
    params = train.get_params(scene)
    f = lambda pp: _loss_fn(scene, pp, res=12, max_depth=2)  # inner jit caches
    g = np.asarray(jax.grad(lambda pp: _loss_fn(scene, pp, res=12, max_depth=2))(params).tex_data)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0, "texture texel gradient is dead"
    i = int(np.argmax(np.abs(g).sum(-1)))
    c = int(np.argmax(np.abs(g[i])))
    eps = 1e-2
    e = jnp.zeros_like(params.tex_data).at[i, c].set(eps)
    fp = f(params._replace(tex_data=params.tex_data + e))
    fm = f(params._replace(tex_data=params.tex_data - e))
    fd = float((fp - fm) / (2 * eps))
    ad = float(g[i, c])
    assert np.isclose(ad, fd, rtol=5e-2), (ad, fd)


def test_lt_scale_grad_matches_fd(small):
    """The light-emission scale is linear in radiance: central differences
    must agree closely (same RNG stream on both sides)."""
    scene, meta = small
    params = train.get_params(scene)
    f = lambda p: _loss_fn(scene, p)  # inner jit caches
    g = jax.grad(lambda p: _loss_fn(scene, p))(params).lt_scale

    eps = 1e-3
    i = int(np.argmax(np.abs(np.asarray(g))))
    e = jnp.zeros_like(params.lt_scale).at[i].set(eps)
    fp = f(params._replace(lt_scale=params.lt_scale + e))
    fm = f(params._replace(lt_scale=params.lt_scale - e))
    fd = float((fp - fm) / (2 * eps))
    ad = float(g[i])
    assert np.isclose(ad, fd, rtol=2e-2), (ad, fd)


def test_albedo_grad_matches_fd(small):
    scene, meta = small
    params = train.get_params(scene)
    f = lambda p: _loss_fn(scene, p)  # inner jit caches
    g = jax.grad(lambda p: _loss_fn(scene, p))(params).mat_refl_c

    gnp = np.asarray(g)
    # perturb the sigmoid-polynomial CONSTANT term only: the quadratic term
    # is multiplied by lambda^2 ~ 2.5e5, so any useful eps leaves the linear
    # regime and the FD stencil saturates the sigmoid
    m = int(np.argmax(np.abs(gnp[:, 2])))
    c = 2
    eps = 1e-3
    e = jnp.zeros_like(params.mat_refl_c).at[m, c].set(eps)
    fp = f(params._replace(mat_refl_c=params.mat_refl_c + e))
    fm = f(params._replace(mat_refl_c=params.mat_refl_c - e))
    fd = float((fp - fm) / (2 * eps))
    ad = float(gnp[m, c])
    # discrete decisions (lobe choice, RR) can flip inside the stencil;
    # the dominant continuous coefficient still has to agree to ~5%
    assert np.isclose(ad, fd, rtol=5e-2), (ad, fd)
