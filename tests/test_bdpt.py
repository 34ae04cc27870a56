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
    lvs, smp = bdpt.light_path(scene, smp, wl, meta.max_depth, "independent", 0)
    v0 = lvs[0]
    assert bool(jnp.all(v0.vtype == bdpt.VT_LIGHT))
    assert float(jnp.mean(jnp.any(v0.beta > 0, -1))) > 0.99
    # first bounce hits the scene for most lanes (light faces down into box)
    v1 = lvs[1]
    frac_hit = float(jnp.mean(v1.vtype == bdpt.VT_SURFACE))
    assert frac_hit > 0.8, frac_hit
