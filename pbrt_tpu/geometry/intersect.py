"""Ray-primitive intersection kernels.

TPU-native redesign of reference shapes/triangle.cu:213-323 (watertight
test) and shapes/sphere.cu: instead of one thread chasing one ray through
a BVH, these kernels evaluate **dense (ray x primitive) tiles** on the VPU —
every op is a fused elementwise op over a (R, T) block, which is how a TPU
wants to intersect rays. The BVH layer (pbrt_tpu.accel) decides which tiles
to evaluate.

All functions broadcast: rays (..., 3) against triangles (T, 3) produce
(..., T) candidate hits which are min-reduced here.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY, clamp_mag, clip_grad, gamma, safe_sqrt
from pbrt_tpu.geometry import vecmath as vm


class TriangleSoA(NamedTuple):
    """Flat triangle soup: world-space vertex positions per corner (T, 3)
    (counterpart of reference TriangleMesh SoA, shapes/triangle_mesh.h:9-32)."""

    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray


class TriHit(NamedTuple):
    t: jnp.ndarray        # (...,) hit distance (INFINITY if miss)
    prim: jnp.ndarray     # (...,) int32 triangle index (-1 if miss)
    b: jnp.ndarray        # (..., 3) barycentrics
    inst: jnp.ndarray = None  # (...,) int32 instance id (-1 = world/static;
                              # only the two-level BVH path sets this)


def _max_dim(v):
    return jnp.argmax(jnp.abs(v), axis=-1)


def _permute_by_kz(v, kz):
    """Cyclic component permutation (v[kz+1], v[kz+2], v[kz]) as branchless
    selects. A take_along_axis here lowers to a per-element gather, which on
    TPU runs on the scalar unit (~30 ns/element — measured 0.5 s per bounce
    at 256k lanes); three jnp.where chains are pure VPU and effectively free.
    v: (..., 3); kz broadcastable to v[..., 0]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    is0 = kz == 0
    is1 = kz == 1
    px = jnp.where(is0, y, jnp.where(is1, z, x))
    py = jnp.where(is0, z, jnp.where(is1, x, y))
    pz = jnp.where(is0, x, jnp.where(is1, y, z))
    return px, py, pz


def _ray_shear(d):
    """Per-ray permutation axis kz + shear constants (sx, sy, sz) so |d_z|
    is the largest component after permuting (triangle.cu:220-247)."""
    kz = _max_dim(d)
    dx, dy, dz = _permute_by_kz(d, kz)
    dz_safe = clamp_mag(dz, 1e-12)
    sx = -dx / dz_safe
    sy = -dy / dz_safe
    sz = 1.0 / dz_safe
    return kz, sx, sy, sz


def _watertight_core(a, b, c, sx, sy, sz, t_max):
    """Shared watertight test given translated+permuted vertices a/b/c
    (..., 3) and shear constants broadcastable to (...,). Returns
    (t, bary, hit) of shape (...,) / (..., 3).

    Same math as reference triangle.cu:213-323 (shear-transform +
    edge functions + conservative t bounds), minus the double-precision
    edge fallback (fp64 is not a TPU-native type; the shear form is already
    watertight along shared edges in fp32 for equal vertices).
    """
    ax = a[..., 0] + sx * a[..., 2]
    ay = a[..., 1] + sy * a[..., 2]
    bx = b[..., 0] + sx * b[..., 2]
    by = b[..., 1] + sy * b[..., 2]
    cx = c[..., 0] + sx * c[..., 2]
    cy = c[..., 1] + sy * c[..., 2]

    e0 = cx * by - cy * bx
    e1 = ax * cy - ay * cx
    e2 = bx * ay - by * ax

    hit = ~(((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    det = e0 + e1 + e2
    hit &= det != 0.0

    az = sz * a[..., 2]
    bz = sz * b[..., 2]
    cz = sz * c[..., 2]
    t_scaled = e0 * az + e1 * bz + e2 * cz
    neg_det = det < 0
    hit &= jnp.where(
        neg_det,
        (t_scaled < 0) & (t_scaled > t_max * det),
        (t_scaled > 0) & (t_scaled < t_max * det),
    )

    # clamp_mag with a RELATIVE floor: an absolute floor (1e-18) keeps the
    # primal finite but lets grazing-sliver Jacobians reach t_scaled/det^2 ~
    # 1e40 = inf, which NaNs every ray-geometry gradient (camera pose) summed
    # through such a lane. Scaling the floor by the edge magnitude bounds
    # d(t)/d(e_i) = (z_i - t)/det by ~1e8/|coords| — real hits never have
    # det below 1e-8 of their edge scale.
    max_e0 = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    inv_det = 1.0 / clamp_mag(det, 1e-8 * max_e0 + 1e-30)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det

    # Conservative t error bound (reference triangle.cu:299-320)
    max_z = jnp.maximum(jnp.maximum(jnp.abs(az), jnp.abs(bz)), jnp.abs(cz))
    max_x = jnp.maximum(jnp.maximum(jnp.abs(ax), jnp.abs(bx)), jnp.abs(cx))
    max_y = jnp.maximum(jnp.maximum(jnp.abs(ay), jnp.abs(by)), jnp.abs(cy))
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_z = gamma(3) * max_z
    delta_x = gamma(5) * (max_x + max_z)
    delta_y = gamma(5) * (max_y + max_z)
    delta_e = 2 * (gamma(2) * max_x * max_y + delta_y * max_x + delta_x * max_y)
    delta_t = 3 * (
        gamma(3) * max_e * max_z + delta_e * max_z + delta_z * max_e
    ) * jnp.abs(inv_det)
    hit &= t > delta_t

    bary = jnp.stack([b0, b1, b2], axis=-1)
    return t, bary, hit


def intersect_tri_block(o, d, t_max, p0, p1, p2):
    """Watertight ray/triangle test over a full (R, T) block.

    o, d: (R, 3); t_max: (R,); p0/p1/p2: (T, 3).
    Returns (t (R, T), b (R, T, 3), hit (R, T)).
    """
    kz, sx, sy, sz = _ray_shear(d)

    # Translate + permute triangle vertices: (R, T, 3)
    def prep(pv):
        rel = pv[None, :, :] - o[:, None, :]  # (R, T, 3)
        return jnp.stack(_permute_by_kz(rel, kz[:, None]), axis=-1)

    return _watertight_core(
        prep(p0), prep(p1), prep(p2),
        sx[:, None], sy[:, None], sz[:, None], t_max[:, None],
    )


def ray_shear(d):
    """Public per-ray shear transform for loop-hoisting: the BVH traversal
    computes (kz, sx, sy, sz) ONCE per ray (d is loop-invariant) instead of
    per leaf visit. Returns (kz, sx, sy, sz), each (...,)."""
    return _ray_shear(d)


def intersect_tri_lanes_presheared(o, kz, sx, sy, sz, t_max, p0, p1, p2):
    """Per-lane watertight test with a precomputed ray shear (see ray_shear).

    o, p0, p1, p2: (R, 3); kz/sx/sy/sz/t_max: (R,). Returns (t, bary, hit).
    This is the BVH leaf kernel: the shear constants are hoisted out of the
    traversal loop, so a leaf test is only translate + permute + edges.
    """

    def prep(pv):
        return jnp.stack(_permute_by_kz(pv - o, kz), axis=-1)

    return _watertight_core(prep(p0), prep(p1), prep(p2), sx, sy, sz, t_max)


def leaf_block_presheared(row, K, o, kz, sx, sy, sz, t_best, prim, is_leaf,
                          chunk):
    """BVH leaf kernel: test each lane's K gathered triangles as ONE (R, K)
    watertight block (identical math to intersect_tri_lanes_presheared,
    batched over the leaf axis — on TPU the K separate scalar-shaped tests
    lowered to hundreds of tiny ops, ~4x slower than this block form).

    row: (R, >= K*9) gathered leaf rows [p0 p1 p2] x K; o (R,3); shear
    (R,); t_best/prim (R,); is_leaf/chunk (R,). Returns updated
    (t_best, prim) with prim = chunk*K + k of the winning slot."""
    R = row.shape[0]
    tri = row[:, : K * 9].reshape(R, K, 3, 3)
    kzb = kz[:, None]

    def prep(pv):                                        # (R, K, 3)
        rel = pv - o[:, None, :]
        return jnp.stack(_permute_by_kz(rel, kzb), axis=-1)

    t, _, hit = _watertight_core(
        prep(tri[:, :, 0]), prep(tri[:, :, 1]), prep(tri[:, :, 2]),
        sx[:, None], sy[:, None], sz[:, None], t_best[:, None],
    )                                                    # (R, K)
    t = jnp.where(hit & is_leaf[:, None], t, INFINITY)
    k_best = jnp.argmin(t, axis=-1)
    onehot = jnp.arange(K)[None, :] == k_best[:, None]
    t_k = jnp.sum(jnp.where(onehot, t, 0.0), axis=-1)
    better = t_k < t_best
    t_new = jnp.where(better, t_k, t_best)
    prim_new = jnp.where(better, chunk * K + k_best.astype(jnp.int32), prim)
    return t_new, prim_new


def intersect_tri_lanes(o, d, t_max, p0, p1, p2):
    """Per-lane watertight test: ray i against triangle i.

    o, d, p0, p1, p2: (R, 3); t_max: (R,). Returns (t, bary, hit) of
    shape (R,) / (R, 3). This is the BVH leaf kernel (each ray has
    gathered its own candidate triangle) and the differentiable refit
    kernel after traversal.
    """
    kz, sx, sy, sz = _ray_shear(d)

    def prep(pv):
        return jnp.stack(_permute_by_kz(pv - o, kz), axis=-1)

    return _watertight_core(prep(p0), prep(p1), prep(p2), sx, sy, sz, t_max)


def intersect_tris_dense(o, d, t_max, tris: TriangleSoA) -> TriHit:
    """Closest hit against ALL triangles — one dense block reduce.

    o, d: (R, 3); t_max: (R,). This is the whole-scene intersector for
    small scenes and the per-leaf-cluster kernel for BVH scenes.
    """
    t, bary, hit = intersect_tri_block(o, d, t_max, tris.p0, tris.p1, tris.p2)
    t = jnp.where(hit, t, INFINITY)
    best = jnp.argmin(t, axis=-1)  # (R,)
    r = jnp.arange(o.shape[0])
    t_best = t[r, best]
    found = t_best < INFINITY
    return TriHit(
        t=t_best,
        prim=jnp.where(found, best.astype(jnp.int32), -1),
        b=bary[r, best],
        inst=jnp.full(o.shape[:1], -1, jnp.int32),
    )


def occluded_tris_dense(o, d, t_max, tris: TriangleSoA):
    """Any-hit shadow query: True where some triangle blocks (R,)."""
    _, _, hit = intersect_tri_block(o, d, t_max, tris.p0, tris.p1, tris.p2)
    return jnp.any(hit, axis=-1)


# ----------------------------------------------------------------- spheres


class SphereSoA(NamedTuple):
    """Spheres: center (S, 3), radius (S,). The optional clip fields enable
    PARTIAL spheres (reference shapes/sphere.cu:15-26 zmin/zmax/phimax):
    rot is the object-frame rotation, z window and phi tested in that frame.
    None => full spheres, and the clip code is statically absent."""

    center: jnp.ndarray
    radius: jnp.ndarray
    rot: object = None       # (S,3,3) or None
    zmin: object = None      # (S,)
    zmax: object = None
    phimax: object = None


def intersect_spheres_dense(o, d, t_max, spheres: SphereSoA):
    """Closest hit against all spheres. Returns (t (R,), idx (R,), p (R,3),
    n (R,3)) with idx == -1 on miss.

    Stable quadratic (Press et al. / reference sphere.cu interval version's
    fp32 counterpart) + hit-point reprojection onto the sphere.
    """
    # clip_grad on the INPUTS sanitizes the ray cotangents as they leave this
    # kernel's backward: the quadratic's silhouette Jacobians (1/q^2, 1/sqrt
    # (disc)) overflow to inf at tangency, and an inf minted inside would
    # otherwise ride out through d(o)/d(d) into the camera-pose gradient
    o = clip_grad(o)
    d = clip_grad(d)
    oc = o[:, None, :] - spheres.center[None, :, :]  # (R, S, 3)
    dd = d[:, None, :]
    a = jnp.sum(dd * dd, axis=-1)
    b = 2.0 * jnp.sum(oc * dd, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - (spheres.radius**2)[None, :]
    disc = b * b - 4 * a * c
    ok = disc >= 0.0
    sq = safe_sqrt(disc)
    q = -0.5 * (b + jnp.where(b < 0, -sq, sq))
    a_safe = clamp_mag(a, 1e-12)
    t0 = q / a_safe
    t1 = c / clamp_mag(q, 1e-12)
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    eps = 1e-3  # min-t epsilon in units of scene scale; callers offset origins
    if spheres.rot is not None:
        # partial spheres: each quadratic root must also pass the z/phi
        # window; take the nearest PASSING root (sphere.cu:75-101 retry)
        def passes(t):
            p = o[:, None, :] + t[..., None] * dd
            rel = p - spheres.center[None, :, :]
            # local = R^T rel (rot maps object->world)
            local = jnp.einsum("sji,rsj->rsi", spheres.rot, rel)
            z = local[..., 2]
            phi = jnp.arctan2(local[..., 1], local[..., 0])
            phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
            zeps = 1e-4 * spheres.radius[None, :]
            return (
                (z >= spheres.zmin[None, :] - zeps)
                & (z <= spheres.zmax[None, :] + zeps)
                & (phi <= spheres.phimax[None, :])
            )
        ok_n = (tn > eps) & passes(tn)
        ok_f = (tf > eps) & passes(tf)
        t = jnp.where(ok_n, tn, tf)
        ok &= jnp.where(ok_n, True, ok_f)
        ok &= (t > eps) & (t < t_max[:, None])
    else:
        t = jnp.where(tn > eps, tn, tf)
        ok &= (t > eps) & (t < t_max[:, None])
    t = jnp.where(ok, t, INFINITY)
    best = jnp.argmin(t, axis=-1)
    r = jnp.arange(o.shape[0])
    t_best = t[r, best]
    found = t_best < INFINITY
    center = spheres.center[best]
    radius = spheres.radius[best]
    # miss lanes must not build p from t = INFINITY: |p| ~ 3e38 makes the
    # reprojection's VJP overflow (inf * 0-cotangent = NaN in shared params)
    p = o + jnp.where(found, t_best, 1.0)[:, None] * d
    # reproject for robustness (reference sphere.cu refinement)
    rel = p - center
    p = center + rel * (radius / jnp.maximum(vm.length(rel), 1e-12))[:, None]
    n = vm.normalize(p - center)
    # silhouette Jacobians (d t / d ray at tangency) are unbounded — clip
    # the cotangents at the primitive boundary (see utils.math.clip_grad)
    return (
        clip_grad(jnp.where(found, t_best, INFINITY)),
        jnp.where(found, best.astype(jnp.int32), -1),
        clip_grad(p),
        clip_grad(n),
    )


class DiskSoA(NamedTuple):
    """Disks as (center, unit normal, radius, inner_radius) in render space
    (reference shapes/disk.{h,cu}). Optional in-plane frame enables
    phimax < 360 (partial disks); None => full disks, clip code absent."""

    center: jnp.ndarray   # (D,3)
    normal: jnp.ndarray   # (D,3)
    radius: jnp.ndarray   # (D,)
    inner: jnp.ndarray    # (D,)
    xaxis: object = None  # (D,3)
    yaxis: object = None
    phimax: object = None # (D,)


def intersect_disks_dense(o, d, t_max, disks: DiskSoA):
    """Closest hit against all disks: plane hit + annulus test
    (disk.cu intersect). Returns (t, idx, p, n), idx == -1 on miss."""
    oc = o[:, None, :] - disks.center[None, :, :]       # (R, D, 3)
    n = disks.normal[None, :, :]
    denom = jnp.sum(d[:, None, :] * n, axis=-1)
    dist = jnp.sum(oc * n, axis=-1)
    t = -dist / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    p = o[:, None, :] + t[..., None] * d[:, None, :]
    r2 = jnp.sum((p - disks.center[None]) ** 2, axis=-1)
    eps = 1e-3
    ok = (
        (jnp.abs(denom) > 1e-9)
        & (t > eps)
        & (t < t_max[:, None])
        & (r2 <= (disks.radius**2)[None, :])
        & (r2 >= (disks.inner**2)[None, :])
    )
    if disks.xaxis is not None:
        rel = p - disks.center[None]
        phi = jnp.arctan2(
            jnp.sum(rel * disks.yaxis[None], -1),
            jnp.sum(rel * disks.xaxis[None], -1),
        )
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        ok &= phi <= disks.phimax[None, :]
    t = jnp.where(ok, t, INFINITY)
    best = jnp.argmin(t, axis=-1)
    rr = jnp.arange(o.shape[0])
    t_best = t[rr, best]
    found = t_best < INFINITY
    p_best = o + t_best[..., None] * d
    n_best = disks.normal[best]
    return (
        clip_grad(jnp.where(found, t_best, INFINITY)),
        jnp.where(found, best, -1).astype(jnp.int32),
        clip_grad(p_best),
        n_best,
    )
