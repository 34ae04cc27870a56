"""Camera differential tests (reference camera_base.h:110-139 +
texture_mapping_2d.cu footprints) — verified against closed forms the
reference never checks its own plumbing against."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.cameras import differentials, perspective
from pbrt_tpu.scene.testscenes import cornell


def _scene(res=64):
    return cornell(res=res, spp=1)


def test_dpdxy_matches_pixel_footprint_on_plane():
    """A wall perpendicular-ish to the view at distance z: the hit-point
    motion for a one-pixel step must equal the actual hit-point difference
    of the two real camera rays (first order)."""
    res = 64
    scene, meta = _scene(res)
    deltas = differentials.pixel_ray_deltas(scene, res)

    # central pixels, analytic plane z = 2 units in front of the camera
    px = jnp.asarray([[32.5, 32.5], [33.5, 32.5], [32.5, 33.5]])
    rays = perspective.generate_rays(scene, px, jnp.zeros((3, 2)))
    # plane: normal = -view direction, through o + 2*d of the center ray
    n = -rays.d[0:1]
    p_plane = rays.o[0] + rays.d[0] * 2.0

    def hit(o, d):
        t = jnp.sum((p_plane - o) * n[0]) / jnp.sum(d * n[0])
        return o + d * t

    p0 = hit(rays.o[0], rays.d[0])
    p1 = hit(rays.o[1], rays.d[1])
    p2 = hit(rays.o[2], rays.d[2])

    dpdx, dpdy = differentials.approximate_dp_dxy(
        p0[None], n, rays.o[0:1], rays.d[0:1], deltas, spp=1)
    np.testing.assert_allclose(np.asarray(dpdx[0]), np.asarray(p1 - p0),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dpdy[0]), np.asarray(p2 - p0),
                               rtol=5e-3, atol=1e-5)


def test_spp_scale_matches_reference_rule():
    """sppScale = max(0.125, 1/sqrt(spp)) (camera_base.h:131-133)."""
    res = 16
    scene, meta = _scene(res)
    deltas = differentials.pixel_ray_deltas(scene, res)
    p = jnp.asarray([[0.0, 0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    a1, _ = differentials.approximate_dp_dxy(p, n, o, d, deltas, spp=1)
    a16, _ = differentials.approximate_dp_dxy(p, n, o, d, deltas, spp=16)
    a1000, _ = differentials.approximate_dp_dxy(p, n, o, d, deltas, spp=1000)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a1) / 4.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a1000), np.asarray(a1) * 0.125,
                               rtol=1e-5)


def test_duv_dxy_recovers_known_jacobian():
    """With dpdu/dpdv an orthogonal frame and dpdx = a*dpdu + b*dpdv the
    least-squares solve must recover (a, b) exactly."""
    R = 4
    rng = np.random.default_rng(3)
    dpdu = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    # orthogonalize dpdv against dpdu
    dpdv = rng.normal(size=(R, 3)).astype(np.float32)
    dpdu_n = np.asarray(dpdu)
    dpdv = dpdv - (dpdv * dpdu_n).sum(-1, keepdims=True) * dpdu_n / (
        (dpdu_n * dpdu_n).sum(-1, keepdims=True))
    dpdv = jnp.asarray(dpdv)
    a = jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
    dpdx = a[:, None] * dpdu + b[:, None] * dpdv
    dudx, dvdx, _, _ = differentials.duv_dxy(dpdx, dpdx * 0, dpdu, dpdv)
    np.testing.assert_allclose(np.asarray(dudx), np.asarray(a), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dvdx), np.asarray(b), rtol=1e-4)
