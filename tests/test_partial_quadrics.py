"""Partial quadrics: sphere zmin/zmax/phimax and disk phimax
(reference shapes/sphere.cu:15-26, shapes/disk.cu) + sphere uv."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import builder as bd, lexer as lx
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.accel import dispatch
from pbrt_tpu.utils.math import INFINITY

HEAD = """
Integrator "path" "integer maxdepth" [2]
Sampler "independent" "integer pixelsamples" [1]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
LookAt 0 0 -5  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [5 5 5]
  Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-1 3 0  1 3 0  0 3 1]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]
"""


def _scene(shape_txt):
    b = bd.SceneBuilder()
    b.parse_tokens(lx.tokenize(HEAD + shape_txt))
    return compile_scene(b, spp_override=1)


def _trace(scene, o, d):
    R = o.shape[0]
    return dispatch.intersect(
        scene, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.full((R,), INFINITY)
    )


def test_sphere_z_clip():
    # hemisphere: keep z >= 0 in object space (object z == world z here)
    scene, _ = _scene('Shape "sphere" "float radius" [1] "float zmin" [0]')
    o = np.array([[0.2, 0.0, -5.0], [0.2, 0.0, -5.0]], np.float32)
    # object frame == camera-world frame: camera looks +z, so a ray through
    # the center hits the z<0 (clipped-away) front... probe along +z and -z
    d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], np.float32)
    h = _trace(scene, o, d)
    # the front face (z=-1 side) is clipped away; the ray passes through and
    # hits the BACK (interior) face at z >= 0
    assert bool(h.valid[0])
    p = np.asarray(h.p[0])
    assert p[2] >= -1e-3, p


def test_sphere_phimax():
    scene_full, _ = _scene('Shape "sphere" "float radius" [1]')
    scene_half, _ = _scene('Shape "sphere" "float radius" [1] "float phimax" [180]')
    # phi in object space measured from +x toward +y; probe two rays aimed at
    # +y and -y halves
    o = np.array([[0.0, 0.5, -5.0], [0.0, -0.5, -5.0]], np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    hf = _trace(scene_full, o, d)
    hh = _trace(scene_half, o, d)
    assert bool(hf.valid[0]) and bool(hf.valid[1])
    v0, v1 = bool(hh.valid[0]), bool(hh.valid[1])
    assert v0 != v1, (v0, v1)  # exactly one half survives


def test_sphere_uv_in_range():
    scene, _ = _scene('Shape "sphere" "float radius" [1]')
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (64, 1))
    tgt = rng.normal(0, 0.3, (64, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = _trace(scene, o, d)
    uv = np.asarray(h.uv)[np.asarray(h.valid)]
    assert len(uv) > 30
    assert (uv >= -1e-4).all() and (uv <= 1.0 + 1e-4).all()


def test_disk_phimax():
    full = 'Shape "disk" "float radius" [1]'
    half = 'Shape "disk" "float radius" [1] "float phimax" [180]'
    scene_f, _ = _scene(full)
    scene_h, _ = _scene(half)
    o = np.array([[0.5, 0.2, -5.0], [0.5, -0.2, -5.0]], np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    hf = _trace(scene_f, o, d)
    hh = _trace(scene_h, o, d)
    assert bool(hf.valid[0]) and bool(hf.valid[1])
    assert bool(hh.valid[0]) != bool(hh.valid[1])


def test_full_sphere_render_unchanged():
    """Adding the clip machinery must not change full-sphere scenes: the
    clip code is statically absent (marker) and results identical."""
    from pbrt_tpu.scene.testscenes import cornell
    scene, meta = cornell(res=8, spp=1)
    assert scene.sph_partial_marker.shape[0] == 0
