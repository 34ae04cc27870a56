"""BVH correctness: traversal must agree with the dense all-pairs kernel
(VERDICT r1 item 2: "BVH vs dense produce identical SceneHits on randomized
scenes"), and occlusion queries must match."""
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.geometry import intersect as ix
from pbrt_tpu.utils.math import INFINITY


def _soup(rng, T, spread=10.0, size=0.7):
    base = rng.uniform(-spread, spread, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, size, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, size, (T, 3)).astype(np.float32)
    return base, base + e1, base + e2


def _scene_of(p0, p1, p2):
    build = bvhlib.build_bvh(p0, p1, p2)

    def pad(v):
        return bvhlib.reorder_pad(build, v, 0.0)

    return SimpleNamespace(
        tri_p0=jnp.asarray(pad(p0)),
        tri_p1=jnp.asarray(pad(p1)),
        tri_p2=jnp.asarray(pad(p2)),
        bvh_rows=jnp.asarray(build.rows),
        bvh_nint=jnp.zeros((build.n_int, 0)),
        bvh_depth=jnp.zeros((build.max_depth, 0)),
        bvh_ninst=jnp.zeros((0, 0)),
        bvh_iterb=jnp.zeros((0, 0)),
    )


@pytest.mark.parametrize("T", [70, 333, 2048])
def test_bvh_matches_dense(rng, T):
    p0, p1, p2 = _soup(rng, T)
    scene = _scene_of(p0, p1, p2)

    R = 512
    o = rng.uniform(-15, 15, (R, 3)).astype(np.float32)
    # aim at random triangle centroids (+ jitter) so most rays hit something
    cent = ((p0 + p1 + p2) / 3.0)[rng.integers(0, T, R)]
    d = cent + rng.normal(0, 0.3, (R, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), INFINITY)

    hb = bvhlib.closest_hit_tris(scene, o, d, t_max)
    hd = ix.intersect_tris_dense(
        o, d, t_max, ix.TriangleSoA(scene.tri_p0, scene.tri_p1, scene.tri_p2)
    )

    hit_b = np.asarray(hb.prim >= 0)
    hit_d = np.asarray(hd.prim >= 0)
    np.testing.assert_array_equal(hit_b, hit_d)
    tb = np.asarray(hb.t)[hit_b]
    td = np.asarray(hd.t)[hit_d]
    # identical winner => bit-identical t (same watertight arithmetic); ties
    # may pick a different but equally-near prim
    np.testing.assert_allclose(tb, td, rtol=1e-6)
    frac_hit = hit_b.mean()
    assert frac_hit > 0.15, "test soup too sparse to be meaningful"


def test_bvh_occluded_matches_dense(rng):
    p0, p1, p2 = _soup(rng, 500)
    scene = _scene_of(p0, p1, p2)

    R = 512
    o = rng.uniform(-15, 15, (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.asarray(rng.uniform(0.5, 40.0, (R,)).astype(np.float32))

    occ_b = np.asarray(bvhlib.any_hit_tris(scene, o, d, t_max))
    occ_d = np.asarray(
        ix.occluded_tris_dense(
            o, d, t_max, ix.TriangleSoA(scene.tri_p0, scene.tri_p1, scene.tri_p2)
        )
    )
    np.testing.assert_array_equal(occ_b, occ_d)


def test_bvh_respects_t_max(rng):
    p0, p1, p2 = _soup(rng, 200)
    scene = _scene_of(p0, p1, p2)
    R = 256
    o = rng.uniform(-15, 15, (R, 3)).astype(np.float32)
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    far = bvhlib.closest_hit_tris(scene, o, d, jnp.full((R,), INFINITY))
    t_cut = jnp.where(far.prim >= 0, far.t * 0.5, 1.0)
    near = bvhlib.closest_hit_tris(scene, o, d, t_cut)
    # every reported hit must respect the cut
    ok = np.asarray((near.prim < 0) | (near.t <= t_cut))
    assert ok.all()


def test_bvh_used_in_compiled_scene():
    from pbrt_tpu.scene.testscenes import cornell, cornell_mesh

    scene, meta = cornell(res=8, spp=1)
    assert scene.bvh_rows.shape[0] == 0  # small scene stays dense
    scene2, meta2 = cornell_mesh(res=8, spp=1, levels=3)
    assert scene2.bvh_rows.shape[0] > 0
    assert meta2.n_tris >= 1000


def test_bvh_render_matches_dense_render():
    """Full render through the path integrator: the compiled BVH scene and
    the same scene with the BVH stripped (dense kernel over the identical
    padded/leaf-ordered triangle arrays) must produce the same image."""
    import jax.numpy as jnp
    from pbrt_tpu.scene.testscenes import cornell_mesh
    from pbrt_tpu.integrators.render import render_sample_batch
    from pbrt_tpu.film import film as filmlib

    res = 16
    scene, meta = cornell_mesh(res=res, spp=1, levels=3)
    scene_dense = scene._replace(bvh_rows=jnp.zeros((0, scene.bvh_rows.shape[1])))
    pix = jnp.arange(res * res, dtype=jnp.int32)

    def render(sc):
        film = filmlib.new_film((res, res))
        film = render_sample_batch(
            sc, film, pix, 0, max_depth=3, integrator="path",
            use_lens=False, res_x=res,
        )
        return np.asarray(filmlib.develop(film, (res, res)))

    img_b = render(scene)
    img_d = render(scene_dense)
    assert np.isfinite(img_b).all()
    # identical RNG streams + identical winners => near-bit-equal; ties on
    # shared edges may route to a different-but-equal prim, so allow a few
    # ulps rather than exact equality
    np.testing.assert_allclose(img_b, img_d, rtol=1e-4, atol=1e-5)


def test_bvh_ladder_exact_at_scale():
    """Regression for the dense-finish dynamic_slice clamp bug (round 4):
    at small R the compaction ladder's rungs and the exact dense sweep never
    execute (R//divisor < 64 skips them), so exactness must also be gated at
    a lane count where EVERY ladder stage runs. 16k lanes on the 16k-tri
    mesh hands a real tail to dense_finish."""
    from pbrt_tpu.scene import testscenes as ts
    from pbrt_tpu.cameras import perspective

    R = 1 << 14
    scene, meta = ts.cornell_mesh(res=512, spp=1, levels=5)
    pix = (jnp.arange(R, dtype=jnp.int32) * 16) % (512 * 512)
    px = (pix % 512).astype(jnp.float32)
    py = (pix // 512).astype(jnp.float32)
    rays = perspective.generate_rays(
        scene, jnp.stack([px, py], -1) + 0.5, jnp.zeros((R, 2)))
    t_max = jnp.full((R,), INFINITY)
    h = bvhlib.closest_hit_tris(scene, rays.o, rays.d, t_max)

    tb = jnp.full((R,), INFINITY)
    pb = jnp.full((R,), -1, jnp.int32)
    TB = 4096
    for i in range(0, scene.tri_p0.shape[0], TB):
        t_b, _, hit_b = ix.intersect_tri_block(
            rays.o, rays.d, tb, scene.tri_p0[i:i + TB],
            scene.tri_p1[i:i + TB], scene.tri_p2[i:i + TB])
        t_b = jnp.where(hit_b, t_b, jnp.inf)
        best = jnp.argmin(t_b, -1)
        rr = jnp.arange(R)
        tbb = t_b[rr, best]
        better = tbb < tb
        tb = jnp.where(better, tbb, tb)
        pb = jnp.where(better, (i + best).astype(jnp.int32), pb)
    assert int((h.prim != pb).sum()) == 0
