"""Homogeneous medium + volumetric path tests (reference medium/,
integrators/megakernel_path.cu volume branches, integrator_base.cu
compute_transmittance)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators import render as R


FOG_SPHERE = """
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
Sampler "independent" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [8]
LookAt 0 0 -6   0 0 0   0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
MakeNamedMedium "fog" "string type" "homogeneous"
    "rgb sigma_a" [%(sa)s %(sa)s %(sa)s] "rgb sigma_s" [%(ss)s %(ss)s %(ss)s]
    "float g" [0.0]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [12 12 12]
  Translate 0 4 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-1.5 0 -1.5  1.5 0 -1.5  1.5 0 1.5  -1.5 0 1.5]
AttributeEnd
AttributeBegin
  Material "interface"
  MediumInterface "fog" ""
  Shape "sphere" "float radius" [1.5]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-8 -2 -8  8 -2 -8  8 -2 8  -8 -2 8]
"""


def _scene(sa, ss, spp=8):
    import tempfile, os

    d = tempfile.mkdtemp()
    path = os.path.join(d, "fog.pbrt")
    with open(path, "w") as fh:
        fh.write(FOG_SPHERE % {"sa": sa, "ss": ss})
    b = bd.SceneBuilder().parse_file(path)
    return b, compile_scene(b, spp_override=spp)


def test_builder_parses_media():
    b, (scene, meta) = _scene(0.5, 0.3)
    assert len(b.media) == 1
    assert meta.volumetric
    med = np.asarray(scene.tri_med)
    assert (med == -1).all()  # walls have no interface
    sph_med = np.asarray(scene.sph_med)
    assert sph_med[0, 0] == 0 and sph_med[0, 1] == -1
    sa = np.asarray(scene.med_sigma_a)[0]
    assert abs(sa.mean() - 0.5) < 0.05


def test_transmittance_through_absorbing_sphere():
    """exp(-sigma_t * chord) through an interface sphere (Beer-Lambert)."""
    from pbrt_tpu.integrators.path import compute_transmittance

    b, (scene, meta) = _scene(0.8, 0.0)
    N = 8
    p0 = jnp.tile(jnp.asarray([[0.0, 0.0, -5.0]]), (N, 1)) - jnp.asarray(
        np.zeros((N, 3), np.float32))
    # render space: camera at origin -> the sphere sits at lookat-relative pos
    # use points straight through the sphere center in render space
    center = np.asarray(scene.sph_center)[0]
    radius = float(np.asarray(scene.sph_radius)[0])
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (N, 1)), jnp.float32)
    p_start = jnp.asarray(np.tile(center + [0, 0, -4.0], (N, 1)), jnp.float32)
    p_end = jnp.asarray(np.tile(center + [0, 0, 4.0], (N, 1)), jnp.float32)
    ng = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (N, 1)), jnp.float32)
    lam = jnp.full((N, 4), 550.0)
    medium = jnp.full((N,), -1, jnp.int32)
    trans = np.asarray(compute_transmittance(
        scene, p_start, ng, d, p_end, medium, scene.ray_offset_scale, lam))
    sigma_t = float(np.asarray(scene.med_sigma_a)[0].mean())  # flat spectrum
    expected = np.exp(-sigma_t * 2 * radius)
    assert np.allclose(trans, expected, rtol=0.05), (trans[0], expected)


def test_transmittance_blocked_by_real_surface():
    from pbrt_tpu.integrators.path import compute_transmittance

    b, (scene, meta) = _scene(0.1, 0.0)
    N = 4
    # path crossing the diffuse floor (y=-2 plane in world, shifted in render)
    floor_y = float(np.asarray(scene.tri_p0)[-1][1])
    p_start = jnp.asarray(np.tile([[0.5, floor_y + 1.0, 2.0]], (N, 1)), jnp.float32)
    p_end = jnp.asarray(np.tile([[0.5, floor_y - 1.0, 2.0]], (N, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (N, 1)), jnp.float32)
    ng = -d
    lam = jnp.full((N, 4), 550.0)
    medium = jnp.full((N,), -1, jnp.int32)
    trans = np.asarray(compute_transmittance(
        scene, p_start, ng, d, p_end, medium, scene.ray_offset_scale, lam))
    assert np.allclose(trans, 0.0)


def test_volumetric_render_darkens_with_absorption():
    _, (scene0, meta0) = _scene(0.0, 0.0)
    _, (scene1, meta1) = _scene(1.2, 0.0)
    img0 = np.asarray(R.render(scene0, meta0))
    img1 = np.asarray(R.render(scene1, meta1))
    assert np.isfinite(img0).all() and np.isfinite(img1).all()
    # center of image looks through the absorbing sphere at the floor
    c0 = img0[20:28, 12:20].mean()
    c1 = img1[20:28, 12:20].mean()
    assert c1 < 0.7 * c0, (c0, c1)


def test_scattering_medium_glows():
    """A purely scattering medium in front of a light picks up in-scattered
    radiance (the fog volume is visibly non-black)."""
    _, (scene, meta) = _scene(0.0, 0.8, spp=32)
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    # pixels that look through the fog sphere but NOT at light/floor
    fog = img[10:16, 12:20].mean()
    assert fog > 0.005, fog


def test_hg_sampling_statistics():
    from pbrt_tpu.sampling import warps

    rng = np.random.default_rng(0)
    for g in (0.3, -0.5):
        u = jnp.asarray(rng.uniform(size=(200000, 2)).astype(np.float32))
        wo = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (200000, 1)), jnp.float32)
        wi, pdf = warps.sample_henyey_greenstein(wo, jnp.full((200000,), g), u)
        # reference convention (sampling.cu:7-40): E[wo.wi] = -g
        cos = np.asarray(jnp.sum(wi * wo, axis=-1))
        assert abs(cos.mean() + g) < 0.01, (g, cos.mean())
        # pdf matches HG density at the sampled angle: pdf == HG(wo.wi)
        dens = np.asarray(warps.henyey_greenstein(jnp.asarray(cos), g))
        assert np.allclose(np.asarray(pdf), dens, rtol=1e-4)
