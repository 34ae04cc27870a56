"""Scene frontend tests: lexer, params, builder on the bundled cornell scene."""
import numpy as np

from pbrt_tpu.scene import lexer as lx
from pbrt_tpu.scene.params import parse_parameters
from pbrt_tpu.scene.compile import load_scene
from pbrt_tpu.scene import builder as bd

CORNELL = "/root/reference/example/cornell-box-specular.pbrt"


def test_lexer_basics():
    toks = lx.tokenize('Shape "trianglemesh" "integer indices" [0 1 2] # comment\nScale 1 2 3')
    kinds = [t.kind for t in toks]
    assert kinds == [lx.KEYWORD, lx.STRING, lx.STRING, lx.LBRACKET, lx.NUMBER,
                     lx.NUMBER, lx.NUMBER, lx.RBRACKET, lx.KEYWORD, lx.NUMBER,
                     lx.NUMBER, lx.NUMBER]
    assert toks[1].value == "trianglemesh"


def test_parameter_dict():
    toks = lx.tokenize('"float fov" [37.5] "rgb L" [1 0.5 0.25] "bool up" true "string name" "x" Shape')
    pd, i = parse_parameters(toks, 0)
    assert toks[i].value == "Shape"
    assert pd.get_float("fov") == 37.5
    assert np.allclose(pd.get_rgb("L"), [1, 0.5, 0.25])
    assert pd.get_bool("up") is True
    assert pd.get_string("name") == "x"
    assert pd.get_float("missing", 9.0) == 9.0


def test_cornell_scene_builds():
    arrays, meta = load_scene(CORNELL)
    assert meta.resolution == (1080, 1080)
    assert meta.integrator == "path"
    # 2 light tris + 2+2+2+2+2 wall tris + 5*2 block tris = 22 triangles
    assert meta.n_tris == 22
    assert meta.n_spheres == 1
    assert meta.n_lights == 2  # one per light triangle
    # materials: default grey, grey, red, green, dielectric, conductor
    assert arrays.mat_type.shape[0] == 6
    mt = np.asarray(arrays.mat_type)
    assert (mt == bd.MAT_DIFFUSE).sum() == 4
    assert (mt == bd.MAT_DIELECTRIC).sum() == 1
    assert (mt == bd.MAT_CONDUCTOR).sum() == 1
    # sphere placed at Translate 186 90 168 in render space (camera at
    # 278 273 -800, render space = world - cam_pos)
    assert np.allclose(
        np.asarray(arrays.sph_center[0]), np.array([186, 90, 168]) - np.array([278, 273, -800]),
        atol=1e-3,
    )
    assert abs(float(arrays.sph_radius[0]) - 90.0) < 1e-4
    # light emission: L=(1,1,1) scale=20 -> emission = D65n, scale = 20/CIE_Y_integral
    from pbrt_tpu.spectral import cie

    assert np.allclose(float(arrays.lt_scale[0]), 20.0 / cie.CIE_Y_INTEGRAL, rtol=1e-4)
    em = np.asarray(arrays.lt_emission[0])
    d65 = cie.illum_d65()
    assert np.allclose(em, d65, rtol=2e-2, atol=2e-2)
    # pmf sums to 1
    assert abs(float(arrays.lt_pmf.sum()) - 1.0) < 1e-5


def test_camera_ray_through_center():
    """A ray through the raster center must go towards 'look' (278,273,0)."""
    import jax.numpy as jnp
    from pbrt_tpu.geometry import transform as tf

    arrays, meta = load_scene(CORNELL)
    p_raster = jnp.asarray([[540.0, 540.0, 0.0]], jnp.float32)
    p_cam = tf.xform_point(arrays.camera_from_raster, p_raster)
    d_cam = np.asarray(p_cam / np.linalg.norm(p_cam))
    assert np.allclose(d_cam[0], [0, 0, 1], atol=1e-5)
    d_render = np.asarray(tf.xform_vector(arrays.render_from_camera, jnp.asarray(d_cam, jnp.float32)))
    # camera looks from (278,273,-800) to (278,273,0): +z in world
    assert np.allclose(d_render[0], [0, 0, 1], atol=1e-5)


def test_camera_fov_edge():
    """Rays at the raster edge span the fov (37.5 deg across the x axis)."""
    import jax.numpy as jnp
    from pbrt_tpu.geometry import transform as tf

    arrays, meta = load_scene(CORNELL)
    p = tf.xform_point(arrays.camera_from_raster, jnp.asarray([[0.0, 540.0, 0.0]], jnp.float32))
    d = np.asarray(p)[0]
    angle = np.rad2deg(np.arctan2(abs(d[0]), d[2]))
    assert abs(angle - 37.5 / 2) < 0.05
