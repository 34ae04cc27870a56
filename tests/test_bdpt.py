"""BDPT tests: strategy machinery + agreement with the forward path tracer
(the strongest consistency check: two independent estimators of the same
integral must agree)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators import render as R

CORNELL = "/root/reference/example/cornell-box-specular.pbrt"


def _scene(res, spp, integrator):
    b = bd.SceneBuilder().parse_file(CORNELL)
    b.film["xresolution"] = b.film["yresolution"] = res
    b.sampler["type"] = "independent"
    return compile_scene(b, spp_override=spp, integrator_override=integrator)


@pytest.fixture(scope="module")
def pair():
    res = 32
    scene_p, meta_p = _scene(res, 48, "path")
    scene_b, meta_b = _scene(res, 48, "bdpt")
    img_p = np.asarray(R.render(scene_p, meta_p))
    img_b = np.asarray(R.render(scene_b, meta_b))
    return img_p, img_b


def test_bdpt_finite_and_positive(pair):
    img_p, img_b = pair
    assert np.isfinite(img_b).all()
    assert img_b.max() > 1.0  # sees the light


def test_bdpt_matches_path_mean(pair):
    """Global brightness agreement between the two estimators."""
    img_p, img_b = pair
    # exclude the light region (hard emission peak dominates noise)
    mask = np.ones((32, 32), bool)
    mask[:8, 10:22] = False
    m_p = img_p[mask].mean()
    m_b = img_b[mask].mean()
    assert abs(m_b - m_p) < 0.15 * m_p, (m_p, m_b)


def test_bdpt_matches_path_regions(pair):
    """Per-region agreement (walls, floor)."""
    img_p, img_b = pair
    regions = [
        (slice(12, 20), slice(2, 6)),    # left wall
        (slice(12, 20), slice(26, 30)),  # right wall
        (slice(26, 31), slice(10, 22)),  # floor
    ]
    for ys, xs in regions:
        a = img_p[ys, xs].mean()
        b = img_b[ys, xs].mean()
        assert abs(b - a) < 0.25 * max(a, 0.02), (ys, xs, a, b)


def test_bdpt_light_subpath_valid():
    from pbrt_tpu.integrators import bdpt
    from pbrt_tpu.sampling import samplers
    from pbrt_tpu.spectral import sampled

    scene, meta = _scene(16, 4, "bdpt")
    N = 256
    smp = samplers.start_pixel_sample(
        jnp.arange(N, dtype=jnp.int32), jnp.zeros(N, jnp.int32)
    )
    wl = sampled.sample_visible(jnp.full((N,), 0.5))
    lvs, smp, _ = bdpt.light_path(scene, smp, wl, meta.max_depth, "independent", 0)
    v0 = lvs[0]
    assert bool(jnp.all(v0.vtype == bdpt.VT_LIGHT))
    assert float(jnp.mean(jnp.any(v0.beta > 0, -1))) > 0.99
    # first bounce hits the scene for most lanes (light faces down into box)
    v1 = lvs[1]
    frac_hit = float(jnp.mean(v1.vtype == bdpt.VT_SURFACE))
    assert frac_hit > 0.8, frac_hit


# ------------------------------------------------------------------ round 3:
# infinite/distant light subpaths + media on connections (VERDICT r2 next-4)

ENV_GLASS = """
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
Sampler "independent" "integer pixelsamples" [4]
Integrator "bdpt" "integer maxdepth" [5]
LookAt 0 1.2 -5.5   0 0.6 0   0 1 0
Camera "perspective" "float fov" [42]
WorldBegin
LightSource "infinite" "rgb L" [0.45 0.55 0.75]
%(extra_lights)s
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [28 24 18]
  Translate 0 3.4 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-0.6 0 -0.6  0.6 0 -0.6  0.6 0 0.6  -0.6 0 0.6]
AttributeEnd
AttributeBegin
  Material "dielectric" "float eta" [1.5]
  Translate 0 0.75 0
  Shape "sphere" "float radius" [0.75]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.65 0.62 0.58]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-6 0 -6  6 0 -6  6 0 6  -6 0 6]
"""

FOG_GLASS = """
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
Sampler "independent" "integer pixelsamples" [4]
Integrator "bdpt" "integer maxdepth" [5]
LookAt 0 1.2 -5.5   0 0.6 0   0 1 0
Camera "perspective" "float fov" [42]
WorldBegin
MakeNamedMedium "haze" "string type" "homogeneous"
    "rgb sigma_a" [0.22 0.22 0.22] "rgb sigma_s" [0 0 0] "float g" [0.0]
LightSource "infinite" "rgb L" [0.45 0.55 0.75]
%(extra_lights)s
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [28 24 18]
  Translate 0 3.4 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-0.6 0 -0.6  0.6 0 -0.6  0.6 0 0.6  -0.6 0 0.6]
AttributeEnd
AttributeBegin
  Material "interface"
  MediumInterface "haze" ""
  Translate 0 0.75 0
  Shape "sphere" "float radius" [1.4]
AttributeEnd
AttributeBegin
  Material "dielectric" "float eta" [1.5]
  Translate 0 0.75 0
  Shape "sphere" "float radius" [0.75]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.65 0.62 0.58]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-6 0 -6  6 0 -6  6 0 6  -6 0 6]
"""


SCATTER_FOG = """
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
Sampler "independent" "integer pixelsamples" [4]
Integrator "bdpt" "integer maxdepth" [4]
LookAt 0 1.2 -5.5   0 0.6 0   0 1 0
Camera "perspective" "float fov" [42]
WorldBegin
MakeNamedMedium "fog" "string type" "homogeneous"
    "rgb sigma_a" [0.05 0.05 0.05] "rgb sigma_s" [0.55 0.55 0.55]
    "float g" [0.3]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [30 28 24]
  Translate 0 3.4 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-0.6 0 -0.6  0.6 0 -0.6  0.6 0 0.6  -0.6 0 0.6]
AttributeEnd
AttributeBegin
  Material "interface"
  MediumInterface "fog" ""
  Translate 0 0.75 0
  Shape "sphere" "float radius" [1.4]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.65 0.62 0.58]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-6 0 -6  6 0 -6  6 0 6  -6 0 6]
"""


def _text_scene(text, spp, integrator, **fmt):
    import os
    import tempfile

    d = tempfile.mkdtemp()
    path = os.path.join(d, "scene.pbrt")
    with open(path, "w") as fh:
        fh.write(text % fmt if fmt else text)
    b = bd.SceneBuilder().parse_file(path)
    b.sampler["type"] = "independent"
    return compile_scene(b, spp_override=spp, integrator_override=integrator)


@pytest.mark.parametrize("extra", ["", 'LightSource "distant" "rgb L" '
                                   '[2.5 2.2 1.8] "point3 from" [2 5 -3] '
                                   '"point3 to" [0 0 0]'])
def test_bdpt_env_matches_path_mean(extra):
    """Glass sphere + area light + infinite sky (+ distant): the two
    estimators must agree — this exercises light subpaths started from
    infinite/distant lights and escaped-ray s=0 vertices."""
    scene_p, meta_p = _text_scene(ENV_GLASS, 64, "path", extra_lights=extra)
    scene_b, meta_b = _text_scene(ENV_GLASS, 64, "bdpt", extra_lights=extra)
    img_p = np.asarray(R.render(scene_p, meta_p))
    img_b = np.asarray(R.render(scene_b, meta_b))
    assert np.isfinite(img_b).all()
    m_p, m_b = img_p.mean(), img_b.mean()
    assert abs(m_b - m_p) < 0.15 * m_p, (m_p, m_b)


def test_bdpt_medium_matches_path_mean():
    """Absorbing haze around the glass sphere: connection segments and
    subpath walks must attenuate by the medium transmittance (with
    sigma_s = 0 both estimators integrate the same RTE)."""
    scene_p, meta_p = _text_scene(FOG_GLASS, 64, "path", extra_lights="")
    scene_b, meta_b = _text_scene(FOG_GLASS, 64, "bdpt", extra_lights="")
    assert meta_b.volumetric
    img_p = np.asarray(R.render(scene_p, meta_p))
    img_b = np.asarray(R.render(scene_b, meta_b))
    assert np.isfinite(img_b).all()
    m_p, m_b = img_p.mean(), img_b.mean()
    assert abs(m_b - m_p) < 0.18 * m_p, (m_p, m_b)


def test_sample_le_all_types():
    """sample_le emits valid rays for every light type in the scene
    (area + infinite + distant here; reference sample_le impls)."""
    from pbrt_tpu.lights import lights
    from pbrt_tpu.spectral import sampled

    scene, meta = _text_scene(
        ENV_GLASS, 4, "bdpt",
        extra_lights='LightSource "distant" "rgb L" [2 2 2] '
                     '"point3 from" [2 5 -3] "point3 to" [0 0 0]',
    )
    N = 512
    rng = np.random.default_rng(0)
    wl = sampled.sample_visible(jnp.full((N,), 0.5))
    for li in range(int(scene.lt_pmf.shape[0])):
        idx = jnp.full((N,), li, jnp.int32)
        u1 = jnp.asarray(rng.random((N, 2), np.float32))
        u2 = jnp.asarray(rng.random((N, 2), np.float32))
        Le, p, ng, w, pdf_pos, pdf_dir, ok = lights.sample_le(
            scene, idx, u1, u2, wl.lam
        )
        assert float(jnp.mean(ok)) > 0.99, li
        assert bool(jnp.all(jnp.isfinite(p))) and bool(jnp.all(jnp.isfinite(w)))
        assert float(jnp.min(jnp.where(ok, pdf_pos, 1.0))) > 0.0
        assert float(jnp.min(jnp.where(ok, pdf_dir, 1.0))) > 0.0
        # emitted rays from finite scenes must point INTO the scene: rays
        # from the bounding-disk origin toward the center make progress
        r_lim = float(scene.scene_radius) * 4.1
        assert float(jnp.max(jnp.linalg.norm(
            p - scene.scene_center[None, :], axis=-1))) <= r_lim


def test_bdpt_scattering_medium_matches_path():
    """SCATTERING fog (sigma_s-dominated, g=0.3) around the light: the
    in-scattered glow comes from in-medium phase vertices — without them
    (VERDICT r4 missing #1) BDPT renders the fog region structurally dark.
    Both estimators integrate the same RTE, so region means must agree.
    Reference: bdpt.cu:431-472 VertexType::medium."""
    scene_p, meta_p = _text_scene(SCATTER_FOG, 48, "path")
    scene_b, meta_b = _text_scene(SCATTER_FOG, 24, "bdpt")
    assert meta_b.volumetric
    img_p = np.asarray(R.render(scene_p, meta_p))
    img_b = np.asarray(R.render(scene_b, meta_b))
    assert np.isfinite(img_b).all()
    # fog-only region (upper half looks through the fog ball at the sky-less
    # background): BDPT must see the glow at all
    fog_p = img_p[8:16, 10:22].mean()
    fog_b = img_b[8:16, 10:22].mean()
    assert fog_b > 0.25 * fog_p, (fog_p, fog_b)
    m_p, m_b = img_p.mean(), img_b.mean()
    assert abs(m_b - m_p) < 0.2 * m_p, (m_p, m_b)


def test_bdpt_light_subpath_has_medium_vertices():
    """The light random walk must actually create VT_MEDIUM vertices inside
    a thick scattering fog (plumbing check independent of estimates)."""
    from pbrt_tpu.integrators import bdpt as bdpt_mod
    from pbrt_tpu.sampling import samplers
    from pbrt_tpu.spectral import sampled

    scene, meta = _text_scene(SCATTER_FOG, 8, "bdpt")
    R_ = 256
    smp = samplers.start_pixel_sample(
        jnp.arange(R_, dtype=jnp.int32), jnp.zeros((R_,), jnp.int32))
    smp, u = samplers.get_1d(smp)
    wl = sampled.sample_visible(u)
    vs, smp, _n = bdpt_mod.light_path(scene, smp, wl, meta.max_depth,
                                      "independent", 0)
    n_med = sum(int((np.asarray(v.vtype) == bdpt_mod.VT_MEDIUM).sum())
                for v in vs)
    assert n_med > 0
    # medium vertices must be connectible and carry their medium id
    for v in vs:
        vt = np.asarray(v.vtype)
        if (vt == bdpt_mod.VT_MEDIUM).any():
            m = vt == bdpt_mod.VT_MEDIUM
            assert (np.asarray(v.med)[m] >= 0).all()
            assert (~np.asarray(v.delta)[m]).all()
