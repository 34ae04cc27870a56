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


def test_lt_scale_grad_matches_fd(small):
    """The light-emission scale is linear in radiance: central differences
    must agree closely (same RNG stream on both sides)."""
    scene, meta = small
    params = train.get_params(scene)
    f = jax.jit(lambda p: _loss_fn(scene, p))
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
    f = jax.jit(lambda p: _loss_fn(scene, p))
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
