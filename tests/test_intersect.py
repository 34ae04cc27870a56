"""Intersection kernels vs numpy Möller–Trumbore brute force (SURVEY §4 (a))."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.geometry import intersect as ix
from pbrt_tpu.utils.math import INFINITY


def moller_brute(o, d, tmax, tris):
    """Scalar numpy reference: closest-hit via Möller–Trumbore."""
    R = o.shape[0]
    t_best = np.full(R, np.inf)
    idx_best = np.full(R, -1, dtype=int)
    for ti, (p0, p1, p2) in enumerate(tris):
        e1, e2 = p1 - p0, p2 - p0
        h = np.cross(d, e2)
        a = np.einsum("ij,j->i", h, e1)
        mask = np.abs(a) > 1e-12
        f = np.where(mask, 1.0 / np.where(a == 0, 1, a), 0.0)
        s = o - p0
        u = f * np.einsum("ij,ij->i", s, h)
        q = np.cross(s, e1)
        v = f * np.einsum("ij,ij->i", d, q)
        t = f * (q @ e2)
        hit = mask & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < tmax)
        better = hit & (t < t_best)
        t_best = np.where(better, t, t_best)
        idx_best = np.where(better, ti, idx_best)
    return t_best, idx_best


def random_scene(rng, T=40, scale=1.0):
    base = rng.uniform(-scale, scale, size=(T, 3))
    p1 = base + rng.uniform(-0.5, 0.5, size=(T, 3)) * scale
    p2 = base + rng.uniform(-0.5, 0.5, size=(T, 3)) * scale
    return np.stack([base, p1, p2], axis=1)


def test_triangle_intersect_matches_brute_force(rng):
    tris = random_scene(rng)
    R = 256
    o = rng.uniform(-2, 2, size=(R, 3))
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(R, 1e9)

    soa = ix.TriangleSoA(
        jnp.asarray(tris[:, 0], jnp.float32),
        jnp.asarray(tris[:, 1], jnp.float32),
        jnp.asarray(tris[:, 2], jnp.float32),
    )
    hit = ix.intersect_tris_dense(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), jnp.asarray(tmax, jnp.float32), soa
    )
    t_ref, idx_ref = moller_brute(o, d, tmax, tris)

    got_t = np.asarray(hit.t)
    got_idx = np.asarray(hit.prim)
    miss_ref = idx_ref < 0
    # agreement on hit/miss except borderline grazers
    agree = (got_idx < 0) == miss_ref
    assert agree.mean() > 0.98
    both = (~miss_ref) & (got_idx >= 0)
    assert np.allclose(got_t[both], t_ref[both], rtol=2e-3, atol=2e-4)
    # barycentric reconstruction: p = b0*p0+b1*p1+b2*p2 == o + t*d
    b = np.asarray(hit.b)[both]
    tri_hit = tris[got_idx[both]]
    p_rec = (b[:, :, None] * tri_hit).sum(axis=1)
    p_ray = o[both] + got_t[both, None] * d[both]
    assert np.allclose(p_rec, p_ray, atol=2e-3)


def test_triangle_respects_tmax(rng):
    tris = np.array([[[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0]]])
    soa = ix.TriangleSoA(*(jnp.asarray(tris[:, i], jnp.float32) for i in range(3)))
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit_far = ix.intersect_tris_dense(o, d, jnp.asarray([10.0], jnp.float32), soa)
    hit_near = ix.intersect_tris_dense(o, d, jnp.asarray([1.5], jnp.float32), soa)
    assert np.asarray(hit_far.prim)[0] == 0
    assert abs(float(hit_far.t[0]) - 2.0) < 1e-5
    assert np.asarray(hit_near.prim)[0] == -1


def test_occlusion_matches_intersect(rng):
    tris = random_scene(rng, T=20)
    soa = ix.TriangleSoA(*(jnp.asarray(tris[:, i], jnp.float32) for i in range(3)))
    R = 128
    o = rng.uniform(-2, 2, size=(R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(R, 1e9, np.float32)
    hit = ix.intersect_tris_dense(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), soa)
    occ = ix.occluded_tris_dense(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), soa)
    assert np.array_equal(np.asarray(occ), np.asarray(hit.prim) >= 0)


def test_watertight_shared_edge():
    """A ray aimed exactly at the shared edge of two triangles must hit one
    of them (the watertight property the reference's shear transform gives,
    triangle.cu:213-323)."""
    quad = np.array(
        [
            [[0, 0, 1.0], [1, 0, 1.0], [1, 1, 1.0]],
            [[1, 1, 1.0], [0, 1, 1.0], [0, 0, 1.0]],
        ]
    )
    soa = ix.TriangleSoA(*(jnp.asarray(quad[:, i], jnp.float32) for i in range(3)))
    # rays through many points on the diagonal x == y
    ts = np.linspace(0.01, 0.99, 97)
    o = np.stack([ts, ts, np.zeros_like(ts)], axis=-1).astype(np.float32)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (len(ts), 1))
    hit = ix.intersect_tris_dense(
        jnp.asarray(o), jnp.asarray(d), jnp.full((len(ts),), 10.0, jnp.float32), soa
    )
    assert np.all(np.asarray(hit.prim) >= 0)


def test_sphere_intersect():
    spheres = ix.SphereSoA(
        center=jnp.asarray([[0.0, 0.0, 5.0], [3.0, 0.0, 5.0]], jnp.float32),
        radius=jnp.asarray([1.0, 0.5], jnp.float32),
    )
    o = jnp.zeros((3, 3), jnp.float32)
    d = jnp.asarray(
        [[0, 0, 1.0], [0.6, 0, 0.8], [1.0, 0, 0]], jnp.float32
    )
    t, idx, p, n = ix.intersect_spheres_dense(o, d, jnp.full((3,), 100.0, jnp.float32), spheres)
    t = np.asarray(t)
    idx = np.asarray(idx)
    assert idx[0] == 0 and abs(t[0] - 4.0) < 1e-4
    assert idx[2] == -1
    # normals unit length, point on sphere
    assert abs(np.linalg.norm(np.asarray(n)[0]) - 1.0) < 1e-5
    assert abs(np.linalg.norm(np.asarray(p)[0] - np.array([0, 0, 5.0])) - 1.0) < 1e-5


def test_sphere_inside_hit():
    spheres = ix.SphereSoA(
        center=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        radius=jnp.asarray([2.0], jnp.float32),
    )
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    t, idx, p, n = ix.intersect_spheres_dense(o, d, jnp.full((1,), 100.0, jnp.float32), spheres)
    assert np.asarray(idx)[0] == 0
    assert abs(float(t[0]) - 2.0) < 1e-4
