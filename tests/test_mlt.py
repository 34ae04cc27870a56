"""PSS-MLT tests (reference integrators/mlt_path.cu + samplers/mlt.h)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators import render as R, mlt

CORNELL = "/root/reference/example/cornell-box-specular.pbrt"


def test_mutate_distributions():
    key = jax.random.PRNGKey(0)
    x = jnp.full((4096, 8), 0.5)
    out = np.asarray(mlt.mutate(x, key))
    assert ((out >= 0) & (out < 1)).all()
    # large steps (p=0.3) resample uniformly; small steps stay near 0.5
    far = np.abs(out - 0.5) > 0.2
    frac_far = far.any(-1).mean()
    assert 0.2 < frac_far < 0.45, frac_far
    near = out[~far.any(-1)]
    assert np.abs(near - 0.5).mean() < 0.05


def test_mlt_sampler_reads_primary_samples():
    from pbrt_tpu.sampling import samplers

    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4) / 12.0)
    s = samplers.from_primary_samples(x)
    s, u0 = samplers.get_1d(s, None, "mlt", 0)
    s, u1 = samplers.get_1d(s, None, "mlt", 0)
    assert np.allclose(np.asarray(u0), np.asarray(x[:, 0]))
    assert np.allclose(np.asarray(u1), np.asarray(x[:, 1]))
    # overflow dims fall back to rng but stay in [0,1)
    for _ in range(4):
        s, u = samplers.get_1d(s, None, "mlt", 0)
    assert ((np.asarray(u) >= 0) & (np.asarray(u) < 1)).all()


@pytest.mark.slow
def test_mltbdpt_matches_path_mean():
    """mlt-bdpt (Kelemen chains over the full staged BDPT estimator) must
    agree with the plain path integrator's image mean (reference
    integrators/mlt_bdpt.cu cross-check)."""
    b = bd.SceneBuilder().parse_file(CORNELL)
    b.film["xresolution"] = b.film["yresolution"] = 24
    b.integrator["maxdepth"] = 3
    b.integrator["mutations"] = 48
    scene, meta = compile_scene(b, integrator_override="mltbdpt")
    img_m = np.asarray(R.render(scene, meta))
    b2 = bd.SceneBuilder().parse_file(CORNELL)
    b2.film["xresolution"] = b2.film["yresolution"] = 24
    b2.integrator["maxdepth"] = 3
    b2.sampler["type"] = "independent"
    scene2, meta2 = compile_scene(b2, spp_override=32, integrator_override="path")
    img_p = np.asarray(R.render(scene2, meta2))
    assert np.isfinite(img_m).all()
    m, p = img_m.mean(), img_p.mean()
    assert abs(m - p) < 0.2 * p, (m, p)
    # spatial structure agrees: bright light region in both
    assert img_m[:6, 8:16].mean() > 2 * img_m[12:20, 8:16].mean()


@pytest.mark.slow
def test_mlt_matches_path_mean():
    b = bd.SceneBuilder().parse_file(CORNELL)
    b.film["xresolution"] = b.film["yresolution"] = 24
    b.integrator["maxdepth"] = 3
    b.integrator["mutations"] = 64
    scene, meta = compile_scene(b, integrator_override="mltpath")
    img_m = np.asarray(R.render(scene, meta))
    b2 = bd.SceneBuilder().parse_file(CORNELL)
    b2.film["xresolution"] = b2.film["yresolution"] = 24
    b2.integrator["maxdepth"] = 3
    b2.sampler["type"] = "independent"
    scene2, meta2 = compile_scene(b2, spp_override=32, integrator_override="path")
    img_p = np.asarray(R.render(scene2, meta2))
    assert np.isfinite(img_m).all()
    m, p = img_m.mean(), img_p.mean()
    assert abs(m - p) < 0.15 * p, (m, p)
    # spatial structure agrees: bright light region in both
    assert img_m[:6, 8:16].mean() > 2 * img_m[12:20, 8:16].mean()
