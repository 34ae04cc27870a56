"""Disk shape, sphere/disk emitters, loop subdivision tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators import render as R


def _compile(pbrt, tmp, spp=None):
    import os

    path = os.path.join(str(tmp), "s.pbrt")
    open(path, "w").write(pbrt)
    b = bd.SceneBuilder().parse_file(path)
    return compile_scene(b, spp_override=spp)


def test_disk_intersection_and_render(tmp_path):
    scene, meta = _compile("""
    Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "independent" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [3]
    LookAt 0 0 -4   0 0 0   0 1 0
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [10 10 10]
      Translate 0 3 -1
      Rotate 90 1 0 0
      Shape "disk" "float radius" [1]
    AttributeEnd
    Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
    Shape "disk" "float radius" [1.2]
    """, tmp_path)
    assert meta.n_disks == 2
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    # the lit front disk occupies the image center
    assert img[12:20, 12:20].mean() > 0.02
    # corners (miss everything, no infinite light) stay black
    assert abs(img[:3, :3].mean()) < 1e-3


def test_sphere_emitter_illuminates(tmp_path):
    """A sphere area light via cone sampling (NEE) lights a floor."""
    scene, meta = _compile("""
    Film "rgb" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "independent" "integer pixelsamples" [32]
    Integrator "path" "integer maxdepth" [2]
    LookAt 0 2 -5   0 0 0   0 1 0
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [20 20 20]
      Translate 0 3 0
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    Material "diffuse" "rgb reflectance" [0.7 0.7 0.7]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point3 P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
    """, tmp_path)
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    floor = img[16:22, 8:16].mean()
    assert floor > 0.05, floor


def test_sphere_cone_sampling_estimator(tmp_path):
    """NEE estimate with cone sampling matches a brute-force uniform-sphere
    direction estimate of direct light from a sphere emitter."""
    from pbrt_tpu.lights import lights
    from pbrt_tpu.sampling import warps
    from pbrt_tpu.geometry import vecmath as vm

    scene, meta = _compile("""
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    Camera "perspective" "float fov" [45]
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [5 5 5]
      Translate 0 4 0
      Shape "sphere" "float radius" [1]
    AttributeEnd
    """, tmp_path)
    N = 1 << 16
    rng = np.random.default_rng(0)
    c = np.asarray(scene.sph_center)[0]
    p_ref = jnp.asarray(np.tile(c + [0, -4.0, 0], (N, 1)), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    li = jnp.zeros((N,), jnp.int32)

    p_l, n_l, pdf, valid = lights.sample_sphere_light_li(scene, li, p_ref, u2)
    wi = vm.normalize(p_l - p_ref)
    # integrand: 1 per unit solid angle over the visible cap
    est_cone = float(jnp.where(valid, 1.0 / jnp.maximum(pdf, 1e-12), 0.0).mean())
    # solid angle of sphere r=1 at distance 4: 2*pi*(1 - sqrt(1 - 1/16))
    expected = 2 * np.pi * (1 - np.sqrt(1 - 1 / 16))
    assert abs(est_cone - expected) < 0.02 * expected
    # pdf_li at sampled directions matches
    pdf2 = lights.sphere_light_pdf_li(scene, li, p_ref, p_l, n_l, wi)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)


def test_loop_subdivide_refines():
    from pbrt_tpu.scene.subdivide import loop_subdivide

    # octahedron -> subdivide towards a sphere-ish limit
    P = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
                 np.float64)
    F = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    P2, F2, N2 = loop_subdivide(P, F, 3)
    assert len(F2) == len(F) * 4 ** 3
    r = np.linalg.norm(P2, axis=-1)
    # closed Loop limit of an octahedron is smooth and strictly inside
    assert 0.25 < r.min() and r.max() <= 1.0 + 1e-9
    assert r.std() < 0.08
    assert np.allclose(np.linalg.norm(N2, axis=-1), 1.0, atol=1e-6)
    # normals point mostly outward
    cosns = np.sum(N2 * (P2 / np.maximum(r[:, None], 1e-12)), -1)
    assert (cosns > 0.8).mean() > 0.99


def test_loopsubdiv_shape_in_scene(tmp_path):
    scene, meta = _compile("""
    Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
    Camera "perspective" "float fov" [45]
    WorldBegin
    Material "diffuse"
    Shape "loopsubdiv" "integer levels" [2]
      "integer indices" [0 2 4  2 1 4  1 3 4  3 0 4  2 0 5  1 2 5  3 1 5  0 3 5]
      "point3 P" [1 0 0  -1 0 0  0 1 0  0 -1 0  0 0 1  0 0 -1]
    """, tmp_path)
    assert meta.n_tris == 8 * 16  # 2 levels: x16
