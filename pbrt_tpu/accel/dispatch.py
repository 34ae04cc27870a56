"""Scene-level closest-hit / any-hit queries.

Counterpart of reference accelerator/hlbvh.h intersect/fast_intersect
(traversal) + base/interaction.h (hit record assembly). v0 strategy: dense
ray x primitive blocks — for scenes up to a few thousand primitives this
saturates the VPU far better than divergent per-ray traversal would, and is
exactly the per-leaf kernel once the BVH layer (pbrt_tpu.accel.bvh) routes
ray packets to leaf clusters for big scenes.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.geometry import intersect as ix
from pbrt_tpu.accel import bvh
from pbrt_tpu.utils.gather import take_rows


class SceneHit(NamedTuple):
    valid: jnp.ndarray   # (R,)
    t: jnp.ndarray       # (R,)
    p: jnp.ndarray       # (R,3)
    ng: jnp.ndarray      # (R,3) geometric normal (faceforwarded to ns side rules)
    ns: jnp.ndarray      # (R,3) shading normal
    uv: jnp.ndarray      # (R,2)
    mat: jnp.ndarray     # (R,) i32 material (-1 interface)
    light: jnp.ndarray   # (R,) i32 area light (-1 none)
    med_in: jnp.ndarray  # (R,) i32 interior medium (-1 vacuum)
    med_out: jnp.ndarray  # (R,) i32 exterior medium
    wo: jnp.ndarray      # (R,3)
    dpdu: jnp.ndarray    # (R,3) surface uv-parameterization derivatives
    dpdv: jnp.ndarray    # (R,3) (zeros on dense-path/quadric hits;
                         # footprint-aware texture lookups only)


def _tris(scene):
    return ix.TriangleSoA(scene.tri_p0, scene.tri_p1, scene.tri_p2)


def _spheres(scene):
    """SphereSoA with clip fields only when a partial sphere exists (static
    marker), so full-sphere scenes compile none of the clip code."""
    if scene.sph_partial_marker.shape[0] > 0:
        return ix.SphereSoA(
            scene.sph_center, scene.sph_radius,
            rot=scene.sph_rot, zmin=scene.sph_zmin,
            zmax=scene.sph_zmax, phimax=scene.sph_phimax,
        )
    return ix.SphereSoA(scene.sph_center, scene.sph_radius)


def _disks(scene):
    if scene.dsk_partial_marker.shape[0] > 0:
        return ix.DiskSoA(
            scene.dsk_center, scene.dsk_normal, scene.dsk_radius,
            scene.dsk_inner, xaxis=scene.dsk_xaxis, yaxis=scene.dsk_yaxis,
            phimax=scene.dsk_phimax,
        )
    return ix.DiskSoA(scene.dsk_center, scene.dsk_normal,
                      scene.dsk_radius, scene.dsk_inner)


def intersect(scene, o, d, t_max) -> SceneHit:
    from pbrt_tpu.utils.math import clip_grad

    # bound the geometry cotangents in BOTH directions at the dispatch
    # boundary: grazing-configuration Jacobians inside every intersection
    # kernel are huge, and their cross-bounce products overflow f32 (see the
    # SceneHit clip below). Primal unchanged.
    o = clip_grad(o)
    d = clip_grad(d)
    R = o.shape[0]
    have_tris = scene.tri_p0.shape[0] > 0
    have_sph = scene.sph_center.shape[0] > 0
    have_dsk = scene.dsk_center.shape[0] > 0

    use_bvh = scene.bvh_rows.shape[0] > 0  # static shape switch
    use_shard = scene.shard is not None    # sharded-geometry render path

    t_tri = jnp.full((R,), INFINITY)
    if have_tris and use_shard:
        # scene-sharded traversal (parallel/scene_shard.py): local sub-BVH
        # + one all_gather over the ("tp",) axis; the winning record and
        # vertices arrive with the hit, so no per-lane global-table
        # gathers happen at all. Not differentiable w.r.t. geometry (the
        # sharded copies are detached) — the TP path is a forward-render
        # memory feature.
        from pbrt_tpu.parallel import scene_shard as ss

        t_sh, rec_sh, p0_sh, p1_sh, p2_sh, valid_sh = ss.closest_hit_local(
            scene.shard, o, d, t_max)
        t_ref, b_sh, hit_ref = ix.intersect_tri_lanes(
            o, d, t_max, p0_sh, p1_sh, p2_sh)
        ok_sh = valid_sh & hit_ref
        t_tri = jnp.where(ok_sh, t_ref, INFINITY)
    elif have_tris:
        if use_bvh:
            th = bvh.closest_hit_tris(scene, o, d, t_max)
        else:
            th = ix.intersect_tris_dense(o, d, t_max, _tris(scene))
        t_tri = th.t
    if have_sph:
        t_s, idx_s, p_s, n_s = ix.intersect_spheres_dense(
            o, d, t_max, _spheres(scene)
        )
    else:
        t_s = jnp.full((R,), INFINITY)

    if have_dsk:
        t_d, idx_d, p_d, n_d = ix.intersect_disks_dense(o, d, t_max, _disks(scene))
    else:
        t_d = jnp.full((R,), INFINITY)

    use_sphere = (t_s < t_tri) & (t_s <= t_d)
    use_disk = (t_d < t_tri) & (t_d < t_s)
    t = jnp.minimum(jnp.minimum(t_tri, t_s), t_d)
    valid = t < INFINITY

    # triangle hit record
    if have_tris and use_shard:
        b = b_sh
        p_t = (b[..., 0:1] * p0_sh + b[..., 1:2] * p1_sh
               + b[..., 2:3] * p2_sh)
        ng_t = vm.normalize(vm.cross(p1_sh - p0_sh, p2_sh - p0_sh))
        # rec layout identical to tri_rec (compile._pack_rec)
        n0, n1, n2 = rec_sh[:, 0:3], rec_sh[:, 3:6], rec_sh[:, 6:9]
        uv0, uv1, uv2 = rec_sh[:, 9:11], rec_sh[:, 11:13], rec_sh[:, 13:15]
        mat_t = rec_sh[:, 15].astype(jnp.int32)
        light_t = rec_sh[:, 16].astype(jnp.int32)
        rev = rec_sh[:, 17] > 0.5
        has_n = rec_sh[:, 18] > 0.5
        med_t = rec_sh[:, 19:21].astype(jnp.int32)
        dpdu_t = rec_sh[:, 21:24]
        dpdv_t = rec_sh[:, 24:27]
        ng_t = jnp.where(rev[..., None], -ng_t, ng_t)
        ns_t = vm.normalize(
            b[..., 0:1] * n0 + b[..., 1:2] * n1 + b[..., 2:3] * n2
        )
        ng_adj = jnp.where(
            has_n[..., None], vm.face_forward(ng_t, ns_t), ng_t
        )
        ns_t = jnp.where(has_n[..., None], ns_t, ng_adj)
        uv_t = b[..., 0:1] * uv0 + b[..., 1:2] * uv1 + b[..., 2:3] * uv2
    elif have_tris:
        tri = jnp.maximum(th.prim, 0)
        p0, p1, p2 = take_rows(scene.tri_p0, tri), take_rows(scene.tri_p1, tri), take_rows(scene.tri_p2, tri)
        b = th.b
        p_t = b[..., 0:1] * p0 + b[..., 1:2] * p1 + b[..., 2:3] * p2
        ng_t = vm.normalize(vm.cross(p1 - p0, p2 - p0))
        has_inst = use_bvh and scene.bvh_ninst.shape[0] > 0
        if has_inst:
            # instanced hits: vertices/normals are the prototype's OBJECT
            # space — map the record to world with the instance transform
            # (reference TransformedPrimitive::intersect re-expression).
            # Positions use o2w; normals use (w2o)^T = o2w^{-T}. The swap
            # (mirroring) flip applies to shading normals; the geometric
            # cross-product normal needs only the stored def-space rev
            # because the world-vert-cross sign(det) and the rev^swap
            # composition cancel (see builder _emit_instance).
            is_i = th.inst >= 0
            iw = jnp.maximum(th.inst, 0)
            o2w = take_rows(scene.inst_o2w, iw).reshape(-1, 3, 4)
            w2o = take_rows(scene.inst_w2o, iw).reshape(-1, 3, 4)
            i_swap = take_rows(scene.inst_swap, iw) > 0.5

            def _xform_p(p):
                return jnp.einsum("rij,rj->ri", o2w[:, :, :3], p) + o2w[:, :, 3]

            def _xform_n(n):
                # (M^{-T} n)_i = sum_j w2o[j,i] n_j
                return jnp.einsum("rji,rj->ri", w2o[:, :, :3], n)

            p_t = jnp.where(is_i[..., None], _xform_p(p_t), p_t)
            ng_t = jnp.where(
                is_i[..., None], vm.normalize(_xform_n(ng_t)), ng_t
            )
        if use_bvh:
            # big table: ONE wide row gather for the whole hit record
            # (gathers cost per row on TPU; see tri_rec layout in compile.py)
            rec = scene.tri_rec[tri]                       # (R, 24)
            n0, n1, n2 = rec[:, 0:3], rec[:, 3:6], rec[:, 6:9]
            uv0, uv1, uv2 = rec[:, 9:11], rec[:, 11:13], rec[:, 13:15]
            mat_t = rec[:, 15].astype(jnp.int32)
            light_t = rec[:, 16].astype(jnp.int32)
            rev = rec[:, 17] > 0.5
            has_n = rec[:, 18] > 0.5
            med_t = rec[:, 19:21].astype(jnp.int32)
            dpdu_t = rec[:, 21:24]
            dpdv_t = rec[:, 24:27]
        else:
            n0 = take_rows(scene.tri_n0, tri)
            n1 = take_rows(scene.tri_n1, tri)
            n2 = take_rows(scene.tri_n2, tri)
            uv0 = take_rows(scene.tri_uv0, tri)
            uv1 = take_rows(scene.tri_uv1, tri)
            uv2 = take_rows(scene.tri_uv2, tri)
            mat_t = take_rows(scene.tri_mat, tri)
            light_t = take_rows(scene.tri_light, tri)
            rev = take_rows(scene.tri_rev, tri)
            has_n = take_rows(scene.tri_has_n, tri)
            med_t = take_rows(scene.tri_med, tri)
            dpdu_t = jnp.zeros((R, 3))
            dpdv_t = jnp.zeros((R, 3))
        ng_t = jnp.where(rev[..., None], -ng_t, ng_t)
        ns_t = vm.normalize(
            b[..., 0:1] * n0 + b[..., 1:2] * n1 + b[..., 2:3] * n2
        )
        if has_inst:
            ns_w = vm.normalize(_xform_n(ns_t))
            ns_w = jnp.where(i_swap[..., None], -ns_w, ns_w)
            ns_t = jnp.where(is_i[..., None], ns_w, ns_t)
        # faceforward geometric normal onto shading normal side (pbrt)
        ng_adj = jnp.where(
            has_n[..., None], vm.face_forward(ng_t, ns_t), ng_t
        )
        ns_t = jnp.where(has_n[..., None], ns_t, ng_adj)
        uv_t = b[..., 0:1] * uv0 + b[..., 1:2] * uv1 + b[..., 2:3] * uv2
    else:
        p_t = jnp.zeros((R, 3))
        ng_adj = jnp.zeros((R, 3))
        ns_t = jnp.zeros((R, 3))
        uv_t = jnp.zeros((R, 2))
        mat_t = jnp.full((R,), -1, jnp.int32)
        light_t = jnp.full((R,), -1, jnp.int32)
        med_t = jnp.full((R, 2), -1, jnp.int32)
        dpdu_t = jnp.zeros((R, 3))
        dpdv_t = jnp.zeros((R, 3))

    if have_sph:
        sph = jnp.maximum(idx_s, 0)
        mat_s = take_rows(scene.sph_mat, sph)
        light_s = take_rows(scene.sph_light, sph)
        # sphere uv (reference sphere.h:74-81): u = phi/phimax,
        # v = (theta - theta_zmin) / (theta_zmax - theta_zmin) in the
        # object frame
        rot_s = take_rows(scene.sph_rot, sph)            # (R,3,3)
        rad_s = jnp.maximum(take_rows(scene.sph_radius, sph), 1e-12)
        rel_s = p_s - take_rows(scene.sph_center, sph)
        local = jnp.einsum("rji,rj->ri", rot_s, rel_s)
        phi_s = jnp.arctan2(local[:, 1], local[:, 0])
        phi_s = jnp.where(phi_s < 0.0, phi_s + 2.0 * jnp.pi, phi_s)
        from pbrt_tpu.utils.math import safe_acos

        theta = safe_acos(jnp.clip(local[:, 2] / rad_s, -1.0, 1.0))
        th_min = safe_acos(jnp.clip(take_rows(scene.sph_zmax, sph) / rad_s, -1.0, 1.0))
        th_max = safe_acos(jnp.clip(take_rows(scene.sph_zmin, sph) / rad_s, -1.0, 1.0))
        u_s = phi_s / jnp.maximum(take_rows(scene.sph_phimax, sph), 1e-6)
        v_s = (theta - th_min) / jnp.maximum(th_max - th_min, 1e-6)
        uv_s = jnp.stack([u_s, v_s], axis=-1)
        p_hit = jnp.where(use_sphere[..., None], p_s, p_t)
        ng = jnp.where(use_sphere[..., None], n_s, ng_adj)
        ns = jnp.where(use_sphere[..., None], n_s, ns_t)
        uv = jnp.where(use_sphere[..., None], uv_s, uv_t)
        mat = jnp.where(use_sphere, mat_s, mat_t)
        light = jnp.where(use_sphere, light_s, light_t)
        med = jnp.where(use_sphere[..., None], take_rows(scene.sph_med, sph), med_t)
        dpdu_t = jnp.where(use_sphere[..., None], 0.0, dpdu_t)
        dpdv_t = jnp.where(use_sphere[..., None], 0.0, dpdv_t)
    else:
        p_hit, ng, ns, uv, mat, light = p_t, ng_adj, ns_t, uv_t, mat_t, light_t
        med = med_t

    if have_dsk:
        dk = jnp.maximum(idx_d, 0)
        p_hit = jnp.where(use_disk[..., None], p_d, p_hit)
        ng = jnp.where(use_disk[..., None], n_d, ng)
        ns = jnp.where(use_disk[..., None], n_d, ns)
        mat = jnp.where(use_disk, take_rows(scene.dsk_mat, dk), mat)
        light = jnp.where(use_disk, take_rows(scene.dsk_light, dk), light)
        med = jnp.where(use_disk[..., None], take_rows(scene.dsk_med, dk), med)

    # Sanitize miss lanes: a huge/inf position (t = "INFINITY" * d) would
    # poison reverse-mode gradients downstream — a zero cotangent through a
    # product with an inf primal is NaN, and that NaN adds into the bars of
    # real path quantities. Keep every lane's record finite.
    # clip_grad: geometry Jacobians at grazing/silhouette configurations are
    # huge (bounded only by the det/q floors); across several bounces their
    # PRODUCTS overflow f32 and NaN the camera-pose gradient. Re-bounding the
    # cotangents once per intersection keeps every factor tame (primal
    # untouched; the true silhouette derivative is a boundary term interior
    # AD cannot represent anyway).
    from pbrt_tpu.utils.math import clip_grad

    zaxis = jnp.zeros_like(ng).at[..., 2].set(1.0)
    return SceneHit(
        valid=valid,
        t=clip_grad(jnp.where(valid, t, 1.0)),
        p=clip_grad(jnp.where(valid[..., None], p_hit, o)),
        ng=clip_grad(jnp.where(valid[..., None], ng, zaxis)),
        ns=clip_grad(jnp.where(valid[..., None], ns, zaxis)),
        uv=clip_grad(jnp.where(valid[..., None], uv, 0.0)),
        mat=jnp.where(valid, mat, -1),
        light=jnp.where(valid, light, -1),
        med_in=jnp.where(valid, med[..., 0], -1),
        med_out=jnp.where(valid, med[..., 1], -1),
        wo=clip_grad(-d),
        dpdu=jnp.where(valid[..., None], dpdu_t, 0.0),
        dpdv=jnp.where(valid[..., None], dpdv_t, 0.0),
    )


def occluded(scene, o, d, t_max):
    """Any-hit between o and o + t_max*d (reference integrator_base unoccluded)."""
    from pbrt_tpu.utils.math import clip_grad

    o = clip_grad(o)
    d = clip_grad(d)
    occ = jnp.zeros(o.shape[:1], bool)
    if scene.tri_p0.shape[0] > 0:
        if scene.shard is not None:
            from pbrt_tpu.parallel import scene_shard as ss

            occ |= ss.any_hit_local(scene.shard, o, d, t_max)
        elif scene.bvh_rows.shape[0] > 0:
            occ |= bvh.any_hit_tris(scene, o, d, t_max)
        else:
            occ |= ix.occluded_tris_dense(o, d, t_max, _tris(scene))
    if scene.sph_center.shape[0] > 0:
        t_s, idx_s, _, _ = ix.intersect_spheres_dense(o, d, t_max, _spheres(scene))
        occ |= idx_s >= 0
    if scene.dsk_center.shape[0] > 0:
        t_d, idx_d, _, _ = ix.intersect_disks_dense(o, d, t_max, _disks(scene))
        occ |= idx_d >= 0
    return occ
