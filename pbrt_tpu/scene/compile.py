"""Scene compiler: host SceneBuilder output -> flat `SceneArrays` pytree.

This is the TPU replacement for the reference's managed-memory object graph
(SURVEY.md §7: 'host-side scene compiler emitting flat device arrays').
Everything the jitted renderer needs is a leaf of one NamedTuple: triangle
SoA, material table, dense-spectra table, light table, camera matrices.

All geometry is emitted in RENDER space = camera-world (world translated so
the camera sits at the origin), matching the reference default
(cameras/camera_base.h:34-39 CameraWorldCoordSystem) — this keeps fp32
catastrophic cancellation away from the camera.
"""
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.filters import filters as filterlib
from pbrt_tpu.textures import textures as texlib
from pbrt_tpu.geometry import transform as tf
from pbrt_tpu.scene import builder as bd
from pbrt_tpu.spectral import cie, rgb2spec


class SceneArrays(NamedTuple):
    # triangles (render space)
    tri_p0: jnp.ndarray
    tri_p1: jnp.ndarray
    tri_p2: jnp.ndarray
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_has_n: jnp.ndarray
    tri_uv0: jnp.ndarray
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_mat: jnp.ndarray
    tri_light: jnp.ndarray
    tri_rev: jnp.ndarray
    # BVH over triangles (accel/bvh.py): SAH-built 8-wide tree; empty rows
    # when the scene is small enough for the dense kernel
    bvh_rows: jnp.ndarray        # (n_int [+ n_inst] + P, ROW_W) unified
                                 # node/instance/leaf table
    bvh_nint: jnp.ndarray        # (n_int, 0) zero-byte shape marker: the
                                 # internal-row count as a STATIC value
    bvh_depth: jnp.ndarray       # (max_depth, 0) zero-byte shape marker
    # two-level BVH instancing (reference TransformedPrimitive + sub-BVH,
    # primitives/transformed_primitive.h:7-33): empty on flattened scenes
    bvh_ninst: jnp.ndarray       # (n_inst, 0) zero-byte shape marker
    bvh_iterb: jnp.ndarray       # (iter_bound, 0) zero-byte shape marker
    inst_w2o: jnp.ndarray        # (I, 12) render->object affine, row-major
    inst_o2w: jnp.ndarray        # (I, 12) object->render affine
    inst_swap: jnp.ndarray       # (I,) 1.0 where the instance transform
                                 # mirrors (flips handedness)
    tri_rec: jnp.ndarray         # (T, 27) f32 packed per-tri hit record
                                 # [n0 n1 n2 uv0 uv1 uv2 mat light rev has_n
                                 #  med_in med_out dpdu dpdv] (BVH scenes
                                 #  only; ids as exact small floats)
    # spheres
    sph_center: jnp.ndarray
    sph_radius: jnp.ndarray
    sph_mat: jnp.ndarray
    sph_light: jnp.ndarray
    sph_rot: jnp.ndarray         # (S,3,3) object-frame rotation (uv + clip)
    sph_zmin: jnp.ndarray        # (S,)
    sph_zmax: jnp.ndarray
    sph_phimax: jnp.ndarray      # (S,) radians
    sph_partial_marker: jnp.ndarray  # (0 or 1,) static clip-code switch
    # disks
    dsk_center: jnp.ndarray      # (D,3)
    dsk_normal: jnp.ndarray      # (D,3)
    dsk_radius: jnp.ndarray      # (D,)
    dsk_inner: jnp.ndarray       # (D,)
    dsk_mat: jnp.ndarray         # (D,) i32
    dsk_light: jnp.ndarray       # (D,) i32
    dsk_med: jnp.ndarray         # (D,2) i32
    dsk_xaxis: jnp.ndarray       # (D,3) in-plane frame for phi clipping
    dsk_yaxis: jnp.ndarray
    dsk_phimax: jnp.ndarray      # (D,) radians
    dsk_partial_marker: jnp.ndarray  # (0 or 1,)
    # materials
    mat_type: jnp.ndarray        # (M,) i32
    mat_refl_c: jnp.ndarray      # (M,3) sigmoid coeffs of reflectance/albedo
    mat_trans_c: jnp.ndarray     # (M,3) transmittance coeffs
    mat_urough: jnp.ndarray      # (M,)
    mat_vrough: jnp.ndarray
    mat_remap: jnp.ndarray       # (M,) bool
    mat_eta: jnp.ndarray         # (M,) dielectric eta (float mode)
    mat_eta_spec: jnp.ndarray    # (M,) i32 row into spec_table or -1
    mat_k_spec: jnp.ndarray
    mat_refl_mode: jnp.ndarray   # (M,) bool: conductor uses reflectance mode
    # layered (coated) material columns; lay_marker is a 0/1-length static
    # presence flag so texture-free jits skip the layered code path entirely
    mat_thickness: jnp.ndarray   # (M,)
    mat_ieta: jnp.ndarray        # (M,) interface (coat) eta
    mat_lay_g: jnp.ndarray       # (M,)
    mat_albedo_c: jnp.ndarray    # (M,3) medium albedo sigmoid coeffs
    mat_crough_u: jnp.ndarray    # (M,) conductor (bottom) roughness
    mat_crough_v: jnp.ndarray
    lay_marker: jnp.ndarray      # (0 or 1,)
    # mix material columns
    mat_mix_m1: jnp.ndarray      # (M,) i32
    mat_mix_m2: jnp.ndarray
    mat_mix_amount: jnp.ndarray  # (M,)
    mix_marker: jnp.ndarray      # (0 or 1,)
    # material texture slots (-1 = constant from the columns above)
    mat_refl_tex: jnp.ndarray    # (M,) i32 node into tex
    mat_trans_tex: jnp.ndarray
    mat_urough_tex: jnp.ndarray
    mat_vrough_tex: jnp.ndarray
    # texture node table + image atlas
    tex: texlib.TexArrays
    # spectra
    spec_table: jnp.ndarray      # (NS, 471) f32
    # homogeneous media (medium/homogeneous_medium.h)
    med_sigma_a: jnp.ndarray     # (NM, 471) f32
    med_sigma_s: jnp.ndarray     # (NM, 471) f32
    med_g: jnp.ndarray           # (NM,) f32
    tri_med: jnp.ndarray         # (T, 2) i32 (inside, outside) or -1
    sph_med: jnp.ndarray         # (S, 2) i32
    camera_medium: jnp.ndarray   # () i32
    # lights
    lt_type: jnp.ndarray         # (L,) i32
    lt_emission: jnp.ndarray     # (L, 471) f32 radiance spectrum
    lt_scale: jnp.ndarray        # (L,) f32 differentiable multiplier
    lt_twosided: jnp.ndarray     # (L,) bool
    lt_medium: jnp.ndarray       # (L,) i32 creation-state medium (light
                                 # subpaths start in it; base/light.cu ctors)
    lt_tri: jnp.ndarray          # (L,) i32
    lt_sph: jnp.ndarray          # (L,) i32 sphere emitter index (-1)
    lt_dsk: jnp.ndarray          # (L,) i32 disk emitter index (-1)
    lt_direction: jnp.ndarray    # (L, 3) distant/spot
    lt_position: jnp.ndarray     # (L, 3) spot
    lt_cos_start: jnp.ndarray    # (L,)
    lt_cos_end: jnp.ndarray
    lt_pmf: jnp.ndarray          # (L,) sampling pmf
    lt_alias_rows: jnp.ndarray   # (L,3) packed [q, alias, pmf] — O(1)
                                 # alias-table light pick in TWO row gathers
                                 # (reference power_light_sampler.cu:7-63)
    # image-infinite lights: env atlas + flat alias tables (distribution/)
    lt_env_off: jnp.ndarray      # (L,) i32 offset into env atlas (-1 none)
    lt_env_w: jnp.ndarray        # (L,) i32
    lt_env_h: jnp.ndarray        # (L,) i32
    lt_l_from_r: jnp.ndarray     # (L,3,3) light-from-render rotation
    lt_r_from_l: jnp.ndarray     # (L,3,3)
    env_data: jnp.ndarray        # (TOTAL,3) f32 linear rgb
    env_q: jnp.ndarray           # (TOTAL,) alias accept prob
    env_alias: jnp.ndarray       # (TOTAL,) i32 alias target (segment-relative)
    env_pdf: jnp.ndarray         # (TOTAL,) texel pmf within its light
    # pixel reconstruction filter (tabulated sampler; filters/filters.py)
    filt: filterlib.FilterTables
    # camera (render space)
    camera_from_raster: jnp.ndarray   # (4,4)
    render_from_camera: jnp.ndarray   # (4,4)
    camera_lens_radius: jnp.ndarray   # ()
    camera_focal_distance: jnp.ndarray
    camera_A: jnp.ndarray             # () image plane area at z=1 (pdf_we)
    camera_cos_total: jnp.ndarray     # () cos of the frustum corner angle
    camera_res: jnp.ndarray           # (2,) i32 (we() raster bounds test)
    # constants
    scene_radius: jnp.ndarray    # ()
    scene_center: jnp.ndarray    # (3,) bounding-sphere center (sample_le
                                 # disk origin for distant/infinite lights)
    ray_offset_scale: jnp.ndarray  # () epsilon used to offset spawned rays
    cam_ray_deltas: jnp.ndarray = None  # (4,3) one-pixel camera ray
                                 # origin/direction deltas (do_dx, dd_dx,
                                 # do_dy, dd_dy) for footprint-aware
                                 # texture lookups (camera_base.h:96-97)
    # scene sharding ("TP" axis): normally None; the sharded render path
    # injects each device's parallel.scene_shard.SceneShard slice here
    # (inside its ("tp",) shard_map), which reroutes dispatch.intersect /
    # occluded onto the sharded traversal + collectives
    shard: object = None


@dataclass
class SceneMeta:
    """Static (non-traced) scene config."""

    resolution: tuple
    spp: int
    sampler: str
    integrator: str
    max_depth: int
    filename: str
    n_tris: int
    n_spheres: int
    n_lights: int
    n_disks: int
    filter: dict
    filter_kind: str = "mitchell"
    # PixelSensor (reference film/pixel_sensor.h): imaging ratio =
    # exposure * iso / 100; out matrix = rgb_from_xyz @ white-balance
    film_imaging_ratio: float = 1.0
    film_out_matrix: object = None  # (3,3) np array or None (-> plain sRGB)
    mutations_per_pixel: int = 100
    env_light_ids: tuple = ()   # static indices of image-infinite lights
    volumetric: bool = False    # scene has media or material-less interfaces
    open_scene: bool = False    # has infinite lights -> rays can escape
                                # (drives the wavefront-vs-batched choice)


def build_perspective_matrices(fov, resolution):
    """camera_from_raster per reference cameras/perspective.cu:20-41."""
    resx, resy = resolution
    aspect = resx / resy
    if aspect > 1.0:
        x0, x1, y0, y1 = -aspect, aspect, -1.0, 1.0
    else:
        x0, x1, y0, y1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect
    ndc_from_screen = tf.scale(1.0 / (x1 - x0), 1.0 / (y1 - y0), 1.0) @ tf.translate(
        -x0, -y1, 0.0
    )
    raster_from_ndc = tf.scale(resx, -resy, 1.0)
    raster_from_screen = raster_from_ndc @ ndc_from_screen
    screen_from_camera = tf.perspective(fov, 1e-2, 1000.0)
    camera_from_raster = np.linalg.inv(screen_from_camera) @ np.linalg.inv(raster_from_screen)
    return camera_from_raster


def compile_scene(b: bd.SceneBuilder, spp_override=None, integrator_override=None):
    """-> (SceneArrays, SceneMeta)."""
    f32 = np.float32

    # ---- camera / render space
    camera_from_world = b.camera["camera_from_world"]
    world_from_camera = np.linalg.inv(camera_from_world)
    cam_pos = world_from_camera[:3, 3]
    world_from_render = tf.translate(*cam_pos)
    render_from_world = np.linalg.inv(world_from_render)
    render_from_camera = render_from_world @ world_from_camera
    resolution = (b.film["xresolution"], b.film["yresolution"])
    camera_from_raster = build_perspective_matrices(b.camera["fov"], resolution)

    def to_render_p(p):
        return np.asarray(p) - cam_pos

    # ---- triangles
    T = len(b.tri_p)
    if T:
        tp = np.stack(b.tri_p)  # (T,3,3)
        tp = tp - cam_pos
        has_n = np.array([n is not None for n in b.tri_n])
        tn = np.stack([
            n if n is not None else np.zeros((3, 3)) for n in b.tri_n
        ])
        has_uv = [u is not None for u in b.tri_uv]
        tuv = np.stack([
            u if u is not None else np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
            for u in b.tri_uv
        ])
    else:
        tp = np.zeros((0, 3, 3))
        tn = np.zeros((0, 3, 3))
        tuv = np.zeros((0, 3, 2))
        has_n = np.zeros((0,), bool)
    tri_mat = np.asarray(b.tri_mat, np.int32).reshape(T)
    tri_light = np.asarray(b.tri_light, np.int32).reshape(T)
    tri_rev = np.asarray(b.tri_rev, bool).reshape(T)
    tri_med_arr = (
        np.asarray(b.tri_med, np.int32).reshape(T, 2) if T else np.zeros((0, 2), np.int32)
    )

    # ---- BVH over the triangle soup (pbrt_tpu/accel/bvh.py): reorder all
    # per-triangle columns into morton/leaf order and pad with degenerate
    # never-hit rows; lt_tri indices are remapped below via tri_newpos.
    from pbrt_tpu.accel import bvh as bvhlib

    tri_newpos = np.arange(T, dtype=np.int32)  # old index -> row in emitted SoA
    protos = getattr(b, "protos", [])
    instances = getattr(b, "instances", [])
    n_inst = len(instances)
    inst_w2o = np.zeros((0, 12), f32)
    inst_o2w = np.zeros((0, 12), f32)
    inst_swap = np.zeros((0,), f32)
    bvh_ninst = np.zeros((0, 0), f32)
    bvh_iterb = np.zeros((0, 0), f32)
    inst_bounds_pts = []

    def _dpduv(tp_, tuv_):
        """Per-triangle dpdu/dpdv from vertex uv deltas (pbrt partial
        derivatives; constant per triangle, so precomputed into the hit
        record for footprint-aware texture lookups). Degenerate uv
        parameterizations get zeros (point-sampled fallback)."""
        n = tp_.shape[0]
        dp1 = tp_[:, 1] - tp_[:, 0]
        dp2 = tp_[:, 2] - tp_[:, 0]
        duv1 = tuv_[:, 1] - tuv_[:, 0]
        duv2 = tuv_[:, 2] - tuv_[:, 0]
        det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
        dpdu = (duv2[:, 1:2] * dp1 - duv1[:, 1:2] * dp2) * inv
        dpdv = (-duv2[:, 0:1] * dp1 + duv1[:, 0:1] * dp2) * inv
        return (dpdu.astype(np.float32), dpdv.astype(np.float32))

    def _pack_rec(n_pad, tp_, tn_, tuv_, mat_, light_, rev_, hasn_, med_):
        # one wide row per triangle for hit-record assembly: a single gather
        # instead of ~14 (gathers cost per ROW on TPU, width nearly free)
        dpdu_, dpdv_ = _dpduv(tp_.reshape(n_pad, 3, 3),
                              tuv_.reshape(n_pad, 3, 2))
        return np.concatenate(
            [
                tn_.reshape(n_pad, 9).astype(np.float32),
                tuv_.reshape(n_pad, 6).astype(np.float32),
                mat_[:, None].astype(np.float32),
                light_[:, None].astype(np.float32),
                rev_[:, None].astype(np.float32),
                hasn_[:, None].astype(np.float32),
                med_.astype(np.float32),
                dpdu_,
                dpdv_,
            ],
            axis=1,
        )

    if n_inst:
        # ---- two-level BVH: TLAS over [static tris | instance AABBs],
        # one shared BLAS per prototype in OBJECT space (reference keeps a
        # sub-BVH per ObjectBegin definition, scene_builder.cu:809-876)
        proto_P = [p["P"] for p in protos]
        cat = lambda s, ps: np.concatenate([s] + list(ps), axis=0)
        tp_all = cat(tp, [p["P"] for p in protos])        # protos stay
        tn_all = cat(tn, [p["N"] for p in protos])        # object-space
        tuv_all = cat(tuv, [p["UV"] for p in protos])
        hasn_all = cat(has_n, [p["has_n"] for p in protos])
        mat_all = cat(tri_mat, [p["mat"] for p in protos])
        light_all = cat(tri_light,
                        [np.full(len(p["mat"]), -1, np.int32) for p in protos])
        rev_all = cat(tri_rev, [p["rev"] for p in protos])
        med_all = cat(tri_med_arr, [p["med"] for p in protos])

        inst_proto = [ins["proto"] for ins in instances]
        o2w_r = []
        for ins in instances:
            m = np.asarray(ins["o2w"], np.float64).reshape(3, 4).copy()
            m[:, 3] -= cam_pos                       # render space
            o2w_r.append(m)
        o2w_r = np.stack(o2w_r)
        bvh = bvhlib.build_two_level(tp, proto_P, inst_proto, o2w_r)
        n_pad = int(bvh.n_padded)

        def reorder_pad(a, fill):
            return bvhlib.reorder_pad(bvh, a, fill)

        live = bvh.src >= 0
        static_rows = live & (bvh.src < T)
        tri_newpos = np.empty(T, np.int32)
        tri_newpos[bvh.src[static_rows]] = np.nonzero(static_rows)[0].astype(np.int32)

        tp = reorder_pad(tp_all, 0.0)
        tn = reorder_pad(tn_all, 0.0)
        tuv = reorder_pad(tuv_all, 0.0)
        has_n = reorder_pad(hasn_all, False)
        tri_mat = reorder_pad(mat_all, -1)
        tri_light = reorder_pad(light_all, -1)
        tri_rev = reorder_pad(rev_all, False)
        tri_med_arr = reorder_pad(med_all, -1)
        bvh_rows = bvh.rows
        bvh_nint = np.zeros((bvh.n_int, 0), np.float32)
        bvh_depth = np.zeros((bvh.max_depth, 0), np.float32)
        bvh_ninst = np.zeros((bvh.n_inst, 0), np.float32)
        bvh_iterb = np.zeros((min(bvh.iter_bound, 2**24), 0), np.float32)
        tri_rec = _pack_rec(n_pad, tp, tn, tuv, tri_mat, tri_light, tri_rev,
                            has_n, tri_med_arr)

        w2o_l, o2w_l, swap_l = [], [], []
        for i, ins in enumerate(instances):
            m4 = np.eye(4)
            m4[:3, :4] = o2w_r[i]
            w2o_l.append(np.linalg.inv(m4)[:3, :4].reshape(-1))
            o2w_l.append(o2w_r[i].reshape(-1))
            swap_l.append(1.0 if ins["swap"] else 0.0)
        inst_w2o = np.asarray(w2o_l, f32)
        inst_o2w = np.asarray(o2w_l, f32)
        inst_swap = np.asarray(swap_l, f32)
        # scene bounds must include instanced geometry (world AABBs)
        for i, ins in enumerate(instances):
            P = protos[inst_proto[i]]["P"].reshape(-1, 3)
            lo, hi = P.min(0), P.max(0)
            wlo, whi = bvhlib._transform_aabb(lo, hi, o2w_r[i])
            inst_bounds_pts.append(np.stack([wlo, whi]))
    elif T >= bvhlib.MIN_TRIS_FOR_BVH:
        bvh = bvhlib.build_bvh(tp[:, 0], tp[:, 1], tp[:, 2])
        n_pad = int(bvh.n_padded)
        tri_newpos = np.empty(T, np.int32)
        live = bvh.src >= 0
        tri_newpos[bvh.src[live]] = np.nonzero(live)[0].astype(np.int32)

        def reorder_pad(a, fill):
            return bvhlib.reorder_pad(bvh, a, fill)

        tp = reorder_pad(tp, 0.0)
        tn = reorder_pad(tn, 0.0)
        tuv = reorder_pad(tuv, 0.0)
        has_n = reorder_pad(has_n, False)
        tri_mat = reorder_pad(tri_mat, -1)
        tri_light = reorder_pad(tri_light, -1)
        tri_rev = reorder_pad(tri_rev, False)
        tri_med_arr = reorder_pad(tri_med_arr, -1)
        bvh_rows = bvh.rows
        bvh_nint = np.zeros((bvh.n_int, 0), np.float32)
        bvh_depth = np.zeros((bvh.max_depth, 0), np.float32)
        tri_rec = _pack_rec(n_pad, tp, tn, tuv, tri_mat, tri_light, tri_rev,
                            has_n, tri_med_arr)
    else:
        bvh_rows = np.zeros((0, bvhlib.ROW_W), np.float32)
        bvh_nint = np.zeros((0, 0), np.float32)
        bvh_depth = np.zeros((0, 0), np.float32)
        tri_rec = np.zeros((0, 27), np.float32)

    # ---- spheres
    S = len(b.spheres)
    sph_center = np.stack([to_render_p(s["center"]) for s in b.spheres]) if S else np.zeros((0, 3))
    sph_radius = np.array([s["radius"] for s in b.spheres]) if S else np.zeros((0,))
    sph_mat = np.array([s["mat"] for s in b.spheres], np.int32) if S else np.zeros((0,), np.int32)
    sph_light = np.array([s["light"] for s in b.spheres], np.int32) if S else np.zeros((0,), np.int32)
    # partial-sphere clipping (reference shapes/sphere.cu:15-26): object
    # frame rotation + z window + phi_max; any_partial gates the clip code
    sph_rot = (np.stack([s.get("rot", np.eye(3)) for s in b.spheres])
               if S else np.zeros((0, 3, 3)))
    sph_zmin = np.array([s.get("zmin", -s["radius"]) for s in b.spheres], f32) if S else np.zeros((0,), f32)
    sph_zmax = np.array([s.get("zmax", s["radius"]) for s in b.spheres], f32) if S else np.zeros((0,), f32)
    sph_phimax = np.array([s.get("phimax", 2 * np.pi) for s in b.spheres], f32) if S else np.zeros((0,), f32)
    any_partial_sph = any(s.get("partial", False) for s in b.spheres)

    # ---- materials
    M = len(b.materials)
    mat_type = np.array([m.type for m in b.materials], np.int32)

    def coeffs_of(rgb):
        if rgb is None:
            return np.zeros(3, f32)
        return rgb2spec.rgb_to_coefficients_np(np.clip(rgb, 0.0, 1.0))

    mat_refl_c = np.stack([coeffs_of(m.reflectance_rgb) for m in b.materials])
    mat_trans_c = np.stack([coeffs_of(m.transmittance_rgb) for m in b.materials])
    mat_urough = np.array([m.uroughness for m in b.materials], f32)
    mat_vrough = np.array([m.vroughness for m in b.materials], f32)
    mat_remap = np.array([m.remap_roughness for m in b.materials])
    mat_eta = np.array([m.eta_float for m in b.materials], f32)
    mat_eta_spec = np.array([m.eta_spec for m in b.materials], np.int32)
    mat_k_spec = np.array([m.k_spec for m in b.materials], np.int32)
    mat_refl_mode = np.array(
        [m.type == bd.MAT_CONDUCTOR and m.reflectance_rgb is not None for m in b.materials]
    )
    mat_thickness = np.array([m.thickness for m in b.materials], f32)
    mat_ieta = np.array([m.interface_eta for m in b.materials], f32)
    mat_lay_g = np.array([m.g for m in b.materials], f32)
    mat_albedo_c = np.stack([coeffs_of(m.albedo_rgb) for m in b.materials])
    mat_crough_u = np.array([m.crough_u for m in b.materials], f32)
    mat_crough_v = np.array([m.crough_v for m in b.materials], f32)
    any_coated = any(m.type in (bd.MAT_COATED_DIFFUSE, bd.MAT_COATED_CONDUCTOR)
                     for m in b.materials)
    mat_mix_m1 = np.array([m.mix_m1 for m in b.materials], np.int32)
    mat_mix_m2 = np.array([m.mix_m2 for m in b.materials], np.int32)
    mat_mix_amount = np.array([m.mix_amount for m in b.materials], f32)
    any_mix = any(m.type == bd.MAT_MIX for m in b.materials)
    mat_refl_tex = np.array([m.refl_tex for m in b.materials], np.int32)
    mat_trans_tex = np.array([m.trans_tex for m in b.materials], np.int32)
    mat_urough_tex = np.array([m.urough_tex for m in b.materials], np.int32)
    mat_vrough_tex = np.array([m.vrough_tex for m in b.materials], np.int32)
    tex_arrays = texlib.build_tex_arrays(b.textures, getattr(b, "_search_dir", "."), cam_pos=cam_pos)

    # ---- spectra table
    NS = max(1, len(b.spectra_rows))
    spec_table = np.zeros((NS, cie.LAMBDA_RANGE), f32)
    for i, row in enumerate(b.spectra_rows):
        spec_table[i] = row

    # ---- disks
    D = len(b.disks)
    if D:
        dsk_center = np.stack([to_render_p(dk["center"]) for dk in b.disks])
        dsk_normal = np.stack([dk["normal"] for dk in b.disks])
        dsk_radius = np.array([dk["radius"] for dk in b.disks], f32)
        dsk_inner = np.array([dk["inner"] for dk in b.disks], f32)
        dsk_mat = np.array([dk["mat"] for dk in b.disks], np.int32)
        dsk_light = np.array([dk["light"] for dk in b.disks], np.int32)
        dsk_med = np.array([dk.get("med", (-1, -1)) for dk in b.disks], np.int32)
        dsk_xaxis = np.stack([dk.get("xaxis", np.array([1.0, 0, 0])) for dk in b.disks])
        dsk_yaxis = np.stack([dk.get("yaxis", np.array([0.0, 1, 0])) for dk in b.disks])
        dsk_phimax = np.array([dk.get("phimax", 2 * np.pi) for dk in b.disks], f32)
    else:
        dsk_center = np.zeros((0, 3))
        dsk_normal = np.zeros((0, 3))
        dsk_radius = np.zeros((0,), f32)
        dsk_inner = np.zeros((0,), f32)
        dsk_mat = np.zeros((0,), np.int32)
        dsk_light = np.zeros((0,), np.int32)
        dsk_med = np.zeros((0, 2), np.int32)
        dsk_xaxis = np.zeros((0, 3))
        dsk_yaxis = np.zeros((0, 3))
        dsk_phimax = np.zeros((0,), f32)

    # ---- media
    NM = len(b.media)
    med_sigma_a = np.stack([m["sigma_a"] for m in b.media]).astype(f32) if NM else np.zeros((0, cie.LAMBDA_RANGE), f32)
    med_sigma_s = np.stack([m["sigma_s"] for m in b.media]).astype(f32) if NM else np.zeros((0, cie.LAMBDA_RANGE), f32)
    med_g = np.array([m["g"] for m in b.media], f32) if NM else np.zeros((0,), f32)
    tri_med = tri_med_arr
    sph_med = (np.asarray([sp.get("med", (-1, -1)) for sp in b.spheres], np.int32).reshape(S, 2)
               if S else np.zeros((0, 2), np.int32))

    # ---- lights
    L = len(b.lights)
    if L:
        lt_type = np.array([l.type for l in b.lights], np.int32)
        lt_emission = np.stack([l.emission_dense for l in b.lights]).astype(f32)
        lt_scale = np.array([l.scale for l in b.lights], f32)
        lt_twosided = np.array([l.two_sided for l in b.lights])
        lt_medium = np.array([l.medium for l in b.lights], np.int32)
        lt_tri = np.array(
            [tri_newpos[l.tri_index] if l.tri_index >= 0 else -1 for l in b.lights],
            np.int32,
        )
        lt_sph = np.array([l.sphere_index for l in b.lights], np.int32)
        lt_dsk = np.array([getattr(l, "disk_index", -1) for l in b.lights], np.int32)
        lt_direction = np.stack(
            [l.direction if l.direction is not None else np.zeros(3) for l in b.lights]
        )
        lt_position = np.stack(
            [to_render_p(l.position) if l.position is not None else np.zeros(3) for l in b.lights]
        )
        lt_cos_start = np.array([l.cos_falloff_start for l in b.lights], f32)
        lt_cos_end = np.array([l.cos_falloff_end for l in b.lights], f32)
    else:
        lt_type = np.zeros((0,), np.int32)
        lt_emission = np.zeros((0, cie.LAMBDA_RANGE), f32)
        lt_scale = np.zeros((0,), f32)
        lt_twosided = np.zeros((0,), bool)
        lt_medium = np.zeros((0,), np.int32)
        lt_tri = np.zeros((0,), np.int32)
        lt_sph = np.zeros((0,), np.int32)
        lt_dsk = np.zeros((0,), np.int32)
        lt_direction = np.zeros((0, 3))
        lt_position = np.zeros((0, 3))
        lt_cos_start = np.zeros((0,), f32)
        lt_cos_end = np.zeros((0,), f32)

    # power-proportional light pmf (reference PowerLightSampler,
    # light_samplers/power_light_sampler.cu): phi ~ pi*(1|2)*area*<Le,1>;
    # uniform fallback if all-zero.
    power = np.zeros(L)
    for i, l in enumerate(b.lights):
        le = float(np.mean(l.emission_dense)) * l.scale
        if l.type == bd.LIGHT_AREA and l.tri_index >= 0:
            p = tp[tri_newpos[l.tri_index]]
            area = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
            power[i] = np.pi * (2.0 if l.two_sided else 1.0) * area * le
        elif l.type == bd.LIGHT_AREA and l.sphere_index >= 0:
            r = b.spheres[l.sphere_index]["radius"]
            area = 4 * np.pi * r * r
            power[i] = np.pi * (2.0 if l.two_sided else 1.0) * area * le
        elif l.type == bd.LIGHT_AREA and getattr(l, "disk_index", -1) >= 0:
            dk = b.disks[l.disk_index]
            area = np.pi * (dk["radius"] ** 2 - dk["inner"] ** 2)
            power[i] = np.pi * (2.0 if l.two_sided else 1.0) * area * le
        else:
            power[i] = le  # scene-radius scaling applied uniformly; fine for pmf
    # ---- image-infinite env maps -> atlas + alias tables
    from pbrt_tpu.distribution import distributions as dist

    lt_env_off = np.full(L, -1, np.int32)
    lt_env_w = np.zeros(L, np.int32)
    lt_env_h = np.zeros(L, np.int32)
    lt_l_from_r = np.tile(np.eye(3, dtype=f32), (max(L, 1), 1, 1))[:L]
    lt_r_from_l = np.tile(np.eye(3, dtype=f32), (max(L, 1), 1, 1))[:L]
    env_datas, env_qs, env_aliases, env_pdfs = [], [], [], []
    env_total = 0
    for i, l in enumerate(b.lights):
        if l.type == bd.LIGHT_IMAGE_INFINITE:
            img = np.asarray(l.image, f32)
            h_i, w_i, _ = img.shape
            lt_env_off[i] = env_total
            lt_env_w[i] = w_i
            lt_env_h[i] = h_i
            lt_r_from_l[i] = np.asarray(l.render_from_light)[:3, :3]
            lt_l_from_r[i] = np.asarray(l.light_from_render)[:3, :3]
            lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
            q, alias, pdf = dist.build_env_distribution(lum)
            env_datas.append(img.reshape(-1, 3))
            env_qs.append(q)
            env_aliases.append(alias)
            env_pdfs.append(pdf)
            env_total += h_i * w_i
            # power for the light sampler pmf ~ scale * mean luminance
            power[i] = float(lum.mean()) * l.scale * np.pi
    if not env_datas:
        env_datas = [np.zeros((1, 3), f32)]
        env_qs = [np.ones(1, f32)]
        env_aliases = [np.zeros(1, np.int32)]
        env_pdfs = [np.ones(1, f32)]

    if power.sum() <= 0:
        power = np.ones(L)
    lt_pmf = (power / power.sum()).astype(f32) if L else np.zeros((0,), f32)
    # O(1) alias-table light pick (PowerLightSampler's Distribution1D): pack
    # [q, alias, pmf] in one row so a pick costs two row gathers, not a
    # per-lane CDF scan
    if L:
        lt_q, lt_alias, _ = dist.alias_table_build(lt_pmf)
        lt_alias_rows = np.stack(
            [lt_q, lt_alias.astype(f32), lt_pmf], axis=1
        ).astype(f32)
    else:
        lt_alias_rows = np.zeros((0, 3), f32)

    # ---- scene bounds -> epsilon (reference scene_builder.cu:914-918)
    # tp[:T]: BVH padding rows are degenerate zeros, not scene geometry
    # (on instanced scenes tp is in MIXED spaces; use the static prefix via
    # tri_newpos plus the instances' world AABBs instead)
    if n_inst:
        all_pts = [tp[tri_newpos].reshape(-1, 3)] if T else []
        all_pts += inst_bounds_pts
    else:
        all_pts = [tp[:T].reshape(-1, 3)] if T else []
    if S:
        all_pts.append(sph_center + sph_radius[:, None])
        all_pts.append(sph_center - sph_radius[:, None])
    if D:
        all_pts.append(dsk_center + dsk_radius[:, None])
        all_pts.append(dsk_center - dsk_radius[:, None])
    pts = np.concatenate(all_pts) if all_pts else np.zeros((1, 3))
    center = 0.5 * (pts.min(0) + pts.max(0))
    radius = float(np.linalg.norm(pts - center, axis=-1).max()) if len(pts) else 1.0

    filter_kind, filter_params, filt_tables = filterlib.build_filter(b.filter)

    # ---- PixelSensor (reference rgb_film.cu:27-48): imaging ratio +
    # white-balance adaptation from the CIE-D illuminant at the requested
    # temperature to the output color space's white point
    from pbrt_tpu.spectral import colorspace as cspace

    iso = float(b.film.get("iso", 100.0))
    exposure = float(b.film.get("exposuretime", 1.0))
    wb_temp = float(b.film.get("whitebalance", 0.0))
    imaging_ratio = exposure * iso / 100.0
    out_space = cspace.srgb()
    xyz_from_sensor = np.eye(3)
    if wb_temp > 0.0:
        d_illum = cie.cie_d(wb_temp)
        src_xyz = cie.to_xyz(d_illum)
        src_xy = src_xyz[:2] / max(src_xyz.sum(), 1e-12)
        xyz_from_sensor = cspace.white_balance_matrix(src_xy, out_space.w)
    film_out_matrix = np.asarray(out_space.rgb_from_xyz @ xyz_from_sensor, np.float32)

    # camera importance constants (reference perspective.cu:43-63): area of
    # the image rectangle projected to the z=1 plane + corner cosine
    corners_raster = np.array(
        [[0, 0, 0], [resolution[0], 0, 0], [0, resolution[1], 0],
         [resolution[0], resolution[1], 0]], np.float64
    )
    corners_cam = (camera_from_raster[:3, :3] @ corners_raster.T).T + camera_from_raster[:3, 3]
    corners_z1 = corners_cam[:, :2] / corners_cam[:, 2:3]
    cam_A = float(
        abs((corners_z1[1, 0] - corners_z1[0, 0]) * (corners_z1[2, 1] - corners_z1[0, 1]))
    )
    corner_dirs = corners_cam / np.linalg.norm(corners_cam, axis=-1, keepdims=True)
    cos_total = float(corner_dirs[:, 2].min())

    arrays = SceneArrays(
        filt=filt_tables,
        tri_p0=jnp.asarray(tp[:, 0], jnp.float32),
        tri_p1=jnp.asarray(tp[:, 1], jnp.float32),
        tri_p2=jnp.asarray(tp[:, 2], jnp.float32),
        tri_n0=jnp.asarray(tn[:, 0], jnp.float32),
        tri_n1=jnp.asarray(tn[:, 1], jnp.float32),
        tri_n2=jnp.asarray(tn[:, 2], jnp.float32),
        tri_has_n=jnp.asarray(has_n),
        tri_uv0=jnp.asarray(tuv[:, 0], jnp.float32),
        tri_uv1=jnp.asarray(tuv[:, 1], jnp.float32),
        tri_uv2=jnp.asarray(tuv[:, 2], jnp.float32),
        tri_mat=jnp.asarray(tri_mat),
        tri_light=jnp.asarray(tri_light),
        tri_rev=jnp.asarray(tri_rev),
        bvh_rows=jnp.asarray(bvh_rows),
        bvh_nint=jnp.asarray(bvh_nint),
        bvh_depth=jnp.asarray(bvh_depth),
        bvh_ninst=jnp.asarray(bvh_ninst),
        bvh_iterb=jnp.asarray(bvh_iterb),
        inst_w2o=jnp.asarray(inst_w2o, jnp.float32),
        inst_o2w=jnp.asarray(inst_o2w, jnp.float32),
        inst_swap=jnp.asarray(inst_swap, jnp.float32),
        tri_rec=jnp.asarray(tri_rec),
        sph_center=jnp.asarray(sph_center, jnp.float32),
        sph_radius=jnp.asarray(sph_radius, jnp.float32),
        sph_mat=jnp.asarray(sph_mat),
        sph_light=jnp.asarray(sph_light),
        sph_rot=jnp.asarray(sph_rot, jnp.float32),
        sph_zmin=jnp.asarray(sph_zmin),
        sph_zmax=jnp.asarray(sph_zmax),
        sph_phimax=jnp.asarray(sph_phimax),
        sph_partial_marker=jnp.zeros((1 if any_partial_sph else 0,), jnp.float32),
        dsk_center=jnp.asarray(dsk_center, jnp.float32),
        dsk_normal=jnp.asarray(dsk_normal, jnp.float32),
        dsk_radius=jnp.asarray(dsk_radius),
        dsk_inner=jnp.asarray(dsk_inner),
        dsk_mat=jnp.asarray(dsk_mat),
        dsk_light=jnp.asarray(dsk_light),
        dsk_med=jnp.asarray(dsk_med),
        dsk_xaxis=jnp.asarray(dsk_xaxis, jnp.float32),
        dsk_yaxis=jnp.asarray(dsk_yaxis, jnp.float32),
        dsk_phimax=jnp.asarray(dsk_phimax),
        dsk_partial_marker=jnp.zeros(
            (1 if any(dk.get("partial", False) for dk in b.disks) else 0,),
            jnp.float32,
        ),
        mat_type=jnp.asarray(mat_type),
        mat_refl_c=jnp.asarray(mat_refl_c, jnp.float32),
        mat_trans_c=jnp.asarray(mat_trans_c, jnp.float32),
        mat_urough=jnp.asarray(mat_urough),
        mat_vrough=jnp.asarray(mat_vrough),
        mat_remap=jnp.asarray(mat_remap),
        mat_eta=jnp.asarray(mat_eta),
        mat_eta_spec=jnp.asarray(mat_eta_spec),
        mat_k_spec=jnp.asarray(mat_k_spec),
        mat_refl_mode=jnp.asarray(mat_refl_mode),
        mat_thickness=jnp.asarray(mat_thickness),
        mat_ieta=jnp.asarray(mat_ieta),
        mat_lay_g=jnp.asarray(mat_lay_g),
        mat_albedo_c=jnp.asarray(mat_albedo_c, jnp.float32),
        mat_crough_u=jnp.asarray(mat_crough_u),
        mat_crough_v=jnp.asarray(mat_crough_v),
        lay_marker=jnp.zeros((1 if any_coated else 0,), jnp.float32),
        mat_mix_m1=jnp.asarray(mat_mix_m1),
        mat_mix_m2=jnp.asarray(mat_mix_m2),
        mat_mix_amount=jnp.asarray(mat_mix_amount),
        mix_marker=jnp.zeros((1 if any_mix else 0,), jnp.float32),
        mat_refl_tex=jnp.asarray(mat_refl_tex),
        mat_trans_tex=jnp.asarray(mat_trans_tex),
        mat_urough_tex=jnp.asarray(mat_urough_tex),
        mat_vrough_tex=jnp.asarray(mat_vrough_tex),
        tex=tex_arrays,
        spec_table=jnp.asarray(spec_table),
        med_sigma_a=jnp.asarray(med_sigma_a),
        med_sigma_s=jnp.asarray(med_sigma_s),
        med_g=jnp.asarray(med_g),
        tri_med=jnp.asarray(tri_med),
        sph_med=jnp.asarray(sph_med),
        camera_medium=jnp.asarray(b.camera_medium, jnp.int32),
        lt_type=jnp.asarray(lt_type),
        lt_emission=jnp.asarray(lt_emission),
        lt_scale=jnp.asarray(lt_scale),
        lt_twosided=jnp.asarray(lt_twosided),
        lt_medium=jnp.asarray(lt_medium),
        lt_tri=jnp.asarray(lt_tri),
        lt_sph=jnp.asarray(lt_sph),
        lt_dsk=jnp.asarray(lt_dsk),
        lt_direction=jnp.asarray(lt_direction, jnp.float32),
        lt_position=jnp.asarray(lt_position, jnp.float32),
        lt_cos_start=jnp.asarray(lt_cos_start),
        lt_cos_end=jnp.asarray(lt_cos_end),
        lt_pmf=jnp.asarray(lt_pmf),
        lt_alias_rows=jnp.asarray(lt_alias_rows),
        lt_env_off=jnp.asarray(lt_env_off),
        lt_env_w=jnp.asarray(lt_env_w),
        lt_env_h=jnp.asarray(lt_env_h),
        lt_l_from_r=jnp.asarray(lt_l_from_r, jnp.float32),
        lt_r_from_l=jnp.asarray(lt_r_from_l, jnp.float32),
        env_data=jnp.asarray(np.concatenate(env_datas)),
        env_q=jnp.asarray(np.concatenate(env_qs)),
        env_alias=jnp.asarray(np.concatenate(env_aliases)),
        env_pdf=jnp.asarray(np.concatenate(env_pdfs)),
        camera_from_raster=jnp.asarray(camera_from_raster, jnp.float32),
        render_from_camera=jnp.asarray(render_from_camera, jnp.float32),
        camera_lens_radius=jnp.asarray(b.camera.get("lensradius", 0.0), jnp.float32),
        camera_focal_distance=jnp.asarray(b.camera.get("focaldistance", 1e6), jnp.float32),
        camera_A=jnp.asarray(cam_A, jnp.float32),
        camera_cos_total=jnp.asarray(cos_total, jnp.float32),
        camera_res=jnp.asarray(np.array(resolution, np.int32)),
        scene_radius=jnp.asarray(radius, jnp.float32),
        scene_center=jnp.asarray(center, jnp.float32),
        ray_offset_scale=jnp.asarray(min(radius * 1e-5, 1e-3) / max(radius, 1e-6), jnp.float32),
    )
    # camera differentials for footprint-aware texture lookups
    # (cameras/differentials.pixel_ray_deltas; evaluated once per scene)
    from pbrt_tpu.cameras import differentials as _dif

    deltas = _dif.pixel_ray_deltas(arrays, resolution[0])
    arrays = arrays._replace(
        cam_ray_deltas=jnp.stack([jnp.asarray(x) for x in deltas]))
    spp = spp_override or b.sampler["pixelsamples"]
    if b.sampler["type"] == "stratified" and int(round(spp ** 0.5)) ** 2 != spp:
        # reference REPORT_FATAL_ERRORs (stratified.h:13-16); we round down to
        # the nearest square so CLI --spp overrides stay usable
        spp = max(1, int(spp ** 0.5)) ** 2
    meta = SceneMeta(
        resolution=resolution,
        spp=spp,
        sampler=b.sampler["type"],
        integrator=integrator_override or b.integrator["type"],
        max_depth=b.integrator.get("maxdepth", 5),
        filename=b.film["filename"],
        n_tris=T,
        n_spheres=S,
        n_disks=D,
        n_lights=L,
        filter=filter_params,
        filter_kind=filter_kind,
        film_imaging_ratio=imaging_ratio,
        film_out_matrix=film_out_matrix,
        env_light_ids=tuple(
            i for i, l in enumerate(b.lights) if l.type == bd.LIGHT_IMAGE_INFINITE
        ),
        open_scene=any(
            l.type in (bd.LIGHT_UNIFORM_INFINITE, bd.LIGHT_IMAGE_INFINITE)
            for l in b.lights
        ),
        volumetric=bool(
            len(b.media) > 0
            or any(m < 0 for m in b.tri_mat)
            or any(sp["mat"] < 0 for sp in b.spheres)
        ),
        mutations_per_pixel=b.integrator.get("mutations", 100),
    )
    return arrays, meta


def load_scene(path, spp=None, integrator=None):
    b = bd.SceneBuilder().parse_file(path)
    return compile_scene(b, spp_override=spp, integrator_override=integrator)
