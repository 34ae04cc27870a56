"""Filter sampling + stratified sampler tests (SURVEY §4 (a): unit tests per
kernel vs numpy references — filters/, samplers/stratified.h)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.filters import filters
from pbrt_tpu.sampling import samplers


def _u2(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(size=(n, 2)).astype(np.float32))


def test_box_filter_sample():
    _, params, t = filters.build_filter({"type": "box"})
    p, w = filters.sample(t, "box", _u2(4096))
    p = np.asarray(p)
    assert np.all(np.abs(p) <= 0.5 + 1e-6)
    assert np.allclose(np.asarray(w), 1.0)
    # uniform: mean ~0, var = (2r)^2/12
    assert abs(p.mean()) < 0.02
    assert abs(p.var() - 1.0 / 12.0) < 0.01


def test_triangle_filter_sample():
    _, params, t = filters.build_filter({"type": "triangle"})
    p, w = filters.sample(t, "triangle", _u2(200000, 1))
    p = np.asarray(p)
    r = 2.0
    assert np.all(np.abs(p) <= r + 1e-5)
    assert np.allclose(np.asarray(w), 1.0)
    # tent distribution on [-r, r]: var = r^2/6
    assert abs(p[:, 0].var() - r * r / 6) < 0.02 * r * r


def _check_tabulated(kind, spec, seed):
    kind2, params, t = filters.build_filter(spec)
    assert kind2 == kind
    n = 400000
    p, w = filters.sample(t, kind, _u2(n, seed))
    p, w = np.asarray(p), np.asarray(w)
    rx, ry = params["radius"]
    assert np.all(np.abs(p[:, 0]) <= rx + 1e-4)
    assert np.all(np.abs(p[:, 1]) <= ry + 1e-4)
    # E[f/pdf] over samples = integral of f
    integral = float(np.asarray(t.integral))
    assert abs(w.mean() - integral) < 0.02 * max(abs(integral), 1.0), (w.mean(), integral)
    # f at sampled points from table should match analytic evaluate
    f_analytic = filters.evaluate_np(kind, p.astype(np.float64), params)
    # weight sign matches f sign where |f| significant
    big = np.abs(f_analytic) > 0.05 * np.abs(f_analytic).max()
    assert np.all(np.sign(w[big]) == np.sign(f_analytic[big]))


def test_gaussian_filter_sampler():
    _check_tabulated("gaussian", {"type": "gaussian"}, 2)


def test_mitchell_filter_sampler():
    _check_tabulated("mitchell", {"type": "mitchell"}, 3)


def test_mitchell_has_negative_weights():
    _, params, t = filters.build_filter({"type": "mitchell"})
    _, w = filters.sample(t, "mitchell", _u2(100000, 4))
    assert float(jnp.min(w)) < 0.0


# ------------------------------------------------------------- stratified


def test_stratified_1d_covers_strata():
    spp = 16
    pix = jnp.zeros((spp,), jnp.int32)
    smp = jnp.arange(spp, dtype=jnp.int32)
    s = samplers.start_pixel_sample(pix, smp)
    _, u = samplers.get_1d(s, None, "stratified", spp)
    strata = np.sort((np.asarray(u) * spp).astype(int))
    assert np.array_equal(strata, np.arange(spp)), strata


def test_stratified_2d_covers_grid():
    spp = 16
    pix = jnp.full((spp,), 7, jnp.int32)
    smp = jnp.arange(spp, dtype=jnp.int32)
    s = samplers.start_pixel_sample(pix, smp)
    _, u = samplers.get_2d(s, None, "stratified", spp)
    u = np.asarray(u)
    cells = set(zip((u[:, 0] * 4).astype(int), (u[:, 1] * 4).astype(int)))
    assert len(cells) == spp  # every 4x4 cell hit exactly once


def test_stratified_differs_by_dimension():
    spp = 16
    pix = jnp.zeros((spp,), jnp.int32)
    smp = jnp.arange(spp, dtype=jnp.int32)
    s = samplers.start_pixel_sample(pix, smp)
    s, u1 = samplers.get_1d(s, None, "stratified", spp)
    _, u2 = samplers.get_1d(s, None, "stratified", spp)
    # both stratified but different permutations (hash includes dimension)
    order1 = np.argsort(np.asarray(u1))
    order2 = np.argsort(np.asarray(u2))
    assert not np.array_equal(order1, order2)


def test_permutation_element_is_permutation():
    for l in (4, 16, 100):
        p = jnp.full((l,), 12345, jnp.uint32)
        out = np.asarray(samplers.permutation_element(jnp.arange(l, dtype=jnp.uint32), l, p))
        assert sorted(out.tolist()) == list(range(l))


def test_masked_draw_freezes_lanes():
    pix = jnp.arange(8, dtype=jnp.int32)
    s0 = samplers.start_pixel_sample(pix, jnp.zeros(8, jnp.int32))
    mask = jnp.asarray([True, False] * 4)
    s1, _ = samplers.get_1d(s0, mask)
    # masked-off lanes keep identical state and dimension
    assert np.array_equal(np.asarray(s1.state.lo)[1::2], np.asarray(s0.state.lo)[1::2])
    assert np.array_equal(np.asarray(s1.dim)[1::2], np.asarray(s0.dim)[1::2])
    assert np.all(np.asarray(s1.dim)[0::2] == 1)
