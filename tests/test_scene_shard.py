"""Scene-sharding ("TP" axis) exactness: geometry split over 8 virtual
devices must reproduce the single-tree closest hit (SURVEY §2.7 TP row)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.parallel import scene_shard
from pbrt_tpu.utils.math import INFINITY


def _soup(rng, T=3000):
    base = rng.uniform(-4, 4, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (T, 3)).astype(np.float32)
    return base, base + e1, base + e2


def test_sharded_matches_single_tree(rng):
    p0, p1, p2 = _soup(rng)
    T = p0.shape[0]
    R = 512
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), INFINITY)

    # single tree (original-id reference result)
    b = bvhlib.build_bvh(p0, p1, p2)
    t1, prim1, _ = bvhlib._traverse(
        jnp.asarray(b.rows), b.n_int, b.max_depth, bvhlib.LEAF_K,
        o, d, t_max)
    orig1 = np.where(np.asarray(prim1) >= 0,
                     b.src[np.clip(np.asarray(prim1), 0, b.src.size - 1)], -1)

    geom = scene_shard.build_sharded(p0, p1, p2, 8)
    t8, prim8 = scene_shard.closest_hit_sharded(
        geom, o, d, t_max, devices=jax.devices()[:8])

    hit1 = orig1 >= 0
    hit8 = np.asarray(prim8) >= 0
    np.testing.assert_array_equal(hit1, hit8)
    np.testing.assert_allclose(
        np.asarray(t8)[hit8], np.asarray(t1)[hit1], rtol=1e-5)
    # same winning triangle except exact-t ties
    same = np.asarray(prim8) == orig1
    ties = ~same & hit8
    if ties.any():
        np.testing.assert_allclose(np.asarray(t8)[ties],
                                   np.asarray(t1)[ties], rtol=1e-6)
    assert same[hit8].mean() > 0.99


def test_sharded_memory_scales(rng):
    """Per-part row tables must actually shrink ~n_parts-fold."""
    p0, p1, p2 = _soup(rng, T=8000)
    b = bvhlib.build_bvh(p0, p1, p2)
    geom = scene_shard.build_sharded(p0, p1, p2, 8)
    per_part = geom.rows.shape[1]
    assert per_part < b.rows.shape[0] / 4, (per_part, b.rows.shape[0])


def test_sharded_mixed_chunk_sizes(rng):
    """ADVICE r4 medium: chunks small enough to build LEAF-ONLY BVHs
    (n_int=0) must still be reachable — T=68 over 8 parts mixes chunk
    sizes 8 and 9 (both <= LEAF_K*2), which lost hits before the
    synthesized one-child-root fix."""
    p0, p1, p2 = _soup(rng, T=68)
    T = p0.shape[0]
    R = 256
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), INFINITY)

    b = bvhlib.build_bvh(p0, p1, p2)
    t1, prim1, _ = bvhlib._traverse(
        jnp.asarray(b.rows), b.n_int, b.max_depth, bvhlib.LEAF_K,
        o, d, t_max)
    orig1 = np.where(np.asarray(prim1) >= 0,
                     b.src[np.clip(np.asarray(prim1), 0, b.src.size - 1)], -1)

    geom = scene_shard.build_sharded(p0, p1, p2, 8)
    t8, prim8 = scene_shard.closest_hit_sharded(
        geom, o, d, t_max, devices=jax.devices()[:8])

    hit1 = orig1 >= 0
    hit8 = np.asarray(prim8) >= 0
    np.testing.assert_array_equal(hit1, hit8)
    np.testing.assert_allclose(
        np.asarray(t8)[hit8], np.asarray(t1)[hit1], rtol=1e-5)
