"""Approximate camera differentials without ray differentials.

Counterpart of the reference `CameraBase::approximate_dp_dxy`
(cameras/camera_base.h:110-139) and the texture-mapping footprint chain
(textures/texture_mapping_2d.cu dsdx/dtdx, texture_eval_context.h:10-44).

Design notes (and an honesty note): the reference computes dpdx/dpdy at
every intersection and threads duv/dxy into `TextureEvalContext`, but its
MIPMap is a single-level bilerp that ignores the footprint entirely
(textures/mipmap.cu:22-25) — the differentials are plumbing with no image
effect. We mirror that capability with a cleaner construction: instead of
rotating into a down-z frame and intersecting pre-stored origin-space
min-differential rays, we intersect the ACTUAL neighbouring-pixel rays
(one-pixel-offset origin/direction deltas, computed per scene at setup)
with the tangent plane of the hit — algebraically the same first-order
estimate, no stored state. `render()` does not call this in the hot path
(matching the reference's no-op filtering); inverse-rendering and any
future footprint-aware filtering consume it from here.
"""
import jax.numpy as jnp

from pbrt_tpu.cameras import perspective
from pbrt_tpu.geometry import vecmath as vm


def pixel_ray_deltas(scene, res_x):
    """First-order per-pixel ray deltas: (do_dx, dd_dx, do_dy, dd_dy),
    each (3,) — the change of the camera ray origin/direction per +1 pixel
    step in x and y (the analogue of the reference's
    minPosDifferentialX/minDirDifferentialX, camera_base.h:96-97).
    Evaluated at the image centre; exact for the pinhole perspective
    camera whose direction field is affine in raster coordinates up to
    normalization."""
    cx, cy = res_x * 0.5, res_x * 0.5
    p = jnp.asarray([[cx, cy], [cx + 1.0, cy], [cx, cy + 1.0]])
    lens = jnp.zeros((3, 2))
    rays = perspective.generate_rays(scene, p, lens)
    do_dx = rays.o[1] - rays.o[0]
    dd_dx = rays.d[1] - rays.d[0]
    do_dy = rays.o[2] - rays.o[0]
    dd_dy = rays.d[2] - rays.d[0]
    return do_dx, dd_dx, do_dy, dd_dy


def approximate_dp_dxy(p, n, ray_o, ray_d, deltas, spp):
    """First-order hit-point motion per pixel step (camera_base.h:110-139).

    p (R,3) hit points; n (R,3) surface normals; ray_o/ray_d (R,3) the
    generating camera rays; deltas from `pixel_ray_deltas`. Returns
    (dpdx, dpdy) (R,3), scaled by max(0.125, 1/sqrt(spp)) exactly like the
    reference (fewer samples per pixel -> wider reconstruction footprint).
    """
    do_dx, dd_dx, do_dy, dd_dy = deltas

    def shift(do, dd):
        o2 = ray_o + do
        d2 = ray_d + dd
        # intersect the offset ray with the tangent plane (p, n)
        denom = vm.dot(d2, n)
        t2 = vm.dot(p - o2, n) / jnp.where(
            jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom
        )
        return o2 + d2 * t2[..., None] - p

    spp_scale = jnp.maximum(0.125, 1.0 / jnp.sqrt(jnp.float32(spp)))
    return shift(do_dx, dd_dx) * spp_scale, shift(do_dy, dd_dy) * spp_scale


def duv_dxy(dpdx, dpdy, dpdu, dpdv):
    """Screen-space UV derivatives from positional derivatives: solve
    dpdx ~= dpdu * dudx + dpdv * dvdx in least squares per lane (the
    reference's UVMapping dsdp/dtdp contraction,
    texture_mapping_2d.cu:8-26). Returns (dudx, dvdx, dudy, dvdy) (R,).
    Degenerate parameterizations (|dpdu x dpdv| ~ 0) return zeros."""
    # normal-equation 2x2 solve: G = [[uu, uv], [uv, vv]]
    uu = vm.dot(dpdu, dpdu)
    uv = vm.dot(dpdu, dpdv)
    vv = vm.dot(dpdv, dpdv)
    det = uu * vv - uv * uv
    ok = jnp.abs(det) > 1e-18
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

    def solve(dp):
        bu = vm.dot(dp, dpdu)
        bv = vm.dot(dp, dpdv)
        du = (vv * bu - uv * bv) * inv_det
        dv = (uu * bv - uv * bu) * inv_det
        return du, dv

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    return dudx, dvdx, dudy, dvdy
