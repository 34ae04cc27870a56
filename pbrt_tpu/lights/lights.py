"""Light sampling, vectorized over lanes.

Counterpart of reference lights/ (796 LoC) + light_samplers/: every lane
carries a sampled light index; emission/Li-sampling gathers the light table
row and switches on type with jnp.where.

Area lights are triangle emitters (reference base/light.cu:56-75 creates one
DiffuseAreaLight per mesh triangle). sample_li/pdf_li reproduce the
reference Triangle::sample(ctx,u)/pdf(ctx,wi) logic (shapes/triangle.cu:
25-211): spherical-triangle sampling with bilinear cos warp inside the
[MIN,MAX] solid-angle window, uniform-area sampling outside it.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.utils.gather import take_rows
from pbrt_tpu.sampling import warps
from pbrt_tpu.spectral import spectra
from pbrt_tpu.scene import builder as bd

MIN_SPHERICAL_SAMPLE_AREA = 3e-4
MAX_SPHERICAL_SAMPLE_AREA = 6.22


class LightLiSample(NamedTuple):
    L: jnp.ndarray        # (R,4)
    wi: jnp.ndarray       # (R,3)
    pdf: jnp.ndarray      # (R,) solid-angle pdf
    p_light: jnp.ndarray  # (R,3)
    n_light: jnp.ndarray  # (R,3)
    valid: jnp.ndarray    # (R,)
    is_delta: jnp.ndarray  # (R,) delta direction/position light
    is_distant: jnp.ndarray  # (R,) at-infinity light (shadow ray semantics)


def emission(scene, light_idx, lam):
    """Emission spectrum of light light_idx at λ: (R,4).
    scale * Lemit(λ) (reference diffuse_area_light.cu:35-42 minus the
    one-sided test, applied by callers)."""
    li = jnp.maximum(light_idx, 0)
    em = spectra.sample_table(scene.lt_emission, li, lam)
    return em * take_rows(scene.lt_scale, li)[..., None]


def area_light_le(scene, light_idx, n, w, lam):
    """Radiance leaving an emissive surface hit: zero from the back side
    unless two-sided."""
    li = jnp.maximum(light_idx, 0)
    em = emission(scene, light_idx, lam)
    front = vm.dot(n, w) > 0.0
    ok = front | take_rows(scene.lt_twosided, li)
    return jnp.where((ok & (light_idx >= 0))[..., None], em, 0.0)


def _tri_verts(scene, tri_idx):
    t = jnp.maximum(tri_idx, 0)
    return take_rows(scene.tri_p0, t), take_rows(scene.tri_p1, t), take_rows(scene.tri_p2, t)


def _tri_solid_angle(p0, p1, p2, p):
    return vm.spherical_triangle_area(
        vm.normalize(p0 - p), vm.normalize(p1 - p), vm.normalize(p2 - p)
    )


def _tri_area_normal(p0, p1, p2):
    cr = vm.cross(p1 - p0, p2 - p0)
    area = 0.5 * vm.length(cr)
    n = cr / jnp.maximum(2.0 * area, 1e-12)[..., None]
    return area, n


def sample_area_light_li(scene, light_idx, p_ref, ns_ref, u2):
    """Triangle-emitter Li sampling for lanes with an area light.

    Returns (p_light (R,3), n_light (R,3), pdf_sa (R,), valid)."""
    tri = take_rows(scene.lt_tri, jnp.maximum(light_idx, 0))
    p0, p1, p2 = _tri_verts(scene, tri)
    area, n_geo = _tri_area_normal(p0, p1, p2)
    sa = _tri_solid_angle(p0, p1, p2, p_ref)
    use_area = (sa < MIN_SPHERICAL_SAMPLE_AREA) | (sa > MAX_SPHERICAL_SAMPLE_AREA)

    # --- path A: uniform-area sampling, pdf converted to solid angle
    b_area = warps.sample_uniform_triangle(u2)
    pA = (
        b_area[..., 0:1] * p0 + b_area[..., 1:2] * p1 + b_area[..., 2:3] * p2
    )
    wiA = pA - p_ref
    dist2A = vm.length_squared(wiA)
    wiA_n = wiA / jnp.sqrt(jnp.maximum(dist2A, 1e-24))[..., None]
    cosA = vm.absdot(n_geo, -wiA_n)
    pdfA = (1.0 / jnp.maximum(area, 1e-12)) * dist2A / jnp.maximum(cosA, 1e-9)
    validA = (dist2A > 0.0) & (cosA > 1e-7) & jnp.isfinite(pdfA)

    # --- path B: spherical triangle with bilinear cos warp at receiver
    has_ns = vm.length_squared(ns_ref) > 0.0
    wi0 = vm.normalize(p0 - p_ref)
    wi1 = vm.normalize(p1 - p_ref)
    wi2 = vm.normalize(p2 - p_ref)
    w_corner = jnp.stack(
        [
            jnp.maximum(0.01, vm.absdot(ns_ref, wi1)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi1)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi0)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi2)),
        ],
        axis=-1,
    )
    u_warp = jnp.where(has_ns[..., None], warps.sample_bilinear(u2, w_corner), u2)
    pdf_warp = jnp.where(has_ns, warps.bilinear_pdf(u_warp, w_corner), 1.0)
    b_sph, pdf_tri = warps.sample_spherical_triangle(p0, p1, p2, p_ref, u_warp)
    pB = (
        b_sph[..., 0:1] * p0 + b_sph[..., 1:2] * p1 + b_sph[..., 2:3] * p2
    )
    pdfB = pdf_tri * pdf_warp
    validB = pdf_tri > 0.0

    p_light = jnp.where(use_area[..., None], pA, pB)
    pdf = jnp.where(use_area, pdfA, pdfB)
    valid = jnp.where(use_area, validA, validB)
    return p_light, n_geo, pdf, valid


def area_light_pdf_li(scene, light_idx, p_ref, ns_ref, wi, hit_p, hit_n):
    """pdf (solid angle) that sample_area_light_li would generate direction
    wi towards the known hit point on the light (reference triangle.cu:25-72).

    hit_p/hit_n: the intersection point and geometric normal on the light
    (we already have them from the ray cast, so no re-intersection needed)."""
    out = jnp.zeros(p_ref.shape[:-1])
    li2 = jnp.maximum(light_idx, 0)
    if int(scene.sph_center.shape[0]) > 0:
        out = jnp.where(
            take_rows(scene.lt_sph, li2) >= 0,
            sphere_light_pdf_li(scene, light_idx, p_ref, hit_p, hit_n, wi),
            out,
        )
    if int(scene.dsk_center.shape[0]) > 0:
        out = jnp.where(
            take_rows(scene.lt_dsk, li2) >= 0,
            disk_light_pdf_li(scene, light_idx, p_ref, hit_p, hit_n, wi),
            out,
        )
    if int(scene.tri_p0.shape[0]) == 0:
        return out
    tri = take_rows(scene.lt_tri, jnp.maximum(light_idx, 0))
    p0, p1, p2 = _tri_verts(scene, tri)
    area, _ = _tri_area_normal(p0, p1, p2)
    sa = _tri_solid_angle(p0, p1, p2, p_ref)
    use_area = (sa < MIN_SPHERICAL_SAMPLE_AREA) | (sa > MAX_SPHERICAL_SAMPLE_AREA)

    dist2 = vm.length_squared(hit_p - p_ref)
    cos_l = vm.absdot(hit_n, -wi)
    pdfA = dist2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    pdfA = jnp.where(jnp.isfinite(pdfA), pdfA, 0.0)

    pdfB = 1.0 / jnp.maximum(sa, 1e-12)
    has_ns = vm.length_squared(ns_ref) > 0.0
    u_inv = warps.invert_spherical_triangle_sample(p0, p1, p2, p_ref, wi)
    wi0 = vm.normalize(p0 - p_ref)
    wi1 = vm.normalize(p1 - p_ref)
    wi2 = vm.normalize(p2 - p_ref)
    w_corner = jnp.stack(
        [
            jnp.maximum(0.01, vm.absdot(ns_ref, wi1)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi1)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi0)),
            jnp.maximum(0.01, vm.absdot(ns_ref, wi2)),
        ],
        axis=-1,
    )
    pdfB = pdfB * jnp.where(has_ns, warps.bilinear_pdf(u_inv, w_corner), 1.0)
    tri_pdf = jnp.where(use_area, pdfA, pdfB)
    return jnp.where(take_rows(scene.lt_tri, jnp.maximum(light_idx, 0)) >= 0, tri_pdf, out)


def sample_li(scene, light_idx, p_ref, ns_ref, u2, lam, scene_radius):
    """Dispatch Li sampling over light type; light_idx (R,) into the table."""
    li = jnp.maximum(light_idx, 0)
    ltype = take_rows(scene.lt_type, li)
    em = emission(scene, light_idx, lam)

    # area emitters: triangles, spheres, disks (lt_tri/lt_sph/lt_dsk pick
    # the shape; static skips for shape kinds absent from the scene)
    if int(scene.tri_p0.shape[0]) > 0:
        p_a, n_a, pdf_a, valid_a = sample_area_light_li(scene, light_idx, p_ref, ns_ref, u2)
    else:
        p_a = p_ref
        n_a = jnp.zeros_like(p_ref).at[..., 2].set(1.0)
        pdf_a = jnp.zeros(p_ref.shape[:-1])
        valid_a = jnp.zeros(p_ref.shape[:-1], bool)
    if int(scene.sph_center.shape[0]) > 0:
        is_sph_l = take_rows(scene.lt_sph, li) >= 0
        p_s2, n_s2, pdf_s2, valid_s2 = sample_sphere_light_li(scene, light_idx, p_ref, u2)
        p_a = jnp.where(is_sph_l[..., None], p_s2, p_a)
        n_a = jnp.where(is_sph_l[..., None], n_s2, n_a)
        pdf_a = jnp.where(is_sph_l, pdf_s2, pdf_a)
        valid_a = jnp.where(is_sph_l, valid_s2, valid_a)
    if int(scene.dsk_center.shape[0]) > 0:
        is_dsk_l = take_rows(scene.lt_dsk, li) >= 0
        p_d2, n_d2, pdf_d2, valid_d2 = sample_disk_light_li(scene, light_idx, p_ref, u2)
        p_a = jnp.where(is_dsk_l[..., None], p_d2, p_a)
        n_a = jnp.where(is_dsk_l[..., None], n_d2, n_a)
        pdf_a = jnp.where(is_dsk_l, pdf_d2, pdf_a)
        valid_a = jnp.where(is_dsk_l, valid_d2, valid_a)
    wi_a = vm.normalize(p_a - p_ref)
    L_a = jnp.where(
        (vm.dot(n_a, -wi_a) > 0.0) | take_rows(scene.lt_twosided, li), 1.0, 0.0
    )[..., None] * em

    # distant: wi = light direction, pseudo-position 2*radius away
    wi_d = take_rows(scene.lt_direction, li)
    p_d = p_ref + wi_d * (2.0 * scene_radius)

    # uniform infinite: uniform sphere direction
    wi_u = warps.sample_uniform_sphere(u2)
    pdf_u = jnp.full_like(pdf_a, warps.UNIFORM_SPHERE_PDF)
    p_u = p_ref + wi_u * (2.0 * scene_radius)

    # spot: delta position; wi towards light position
    to_spot = take_rows(scene.lt_position, li) - p_ref
    d2_spot = vm.length_squared(to_spot)
    wi_s = to_spot / jnp.sqrt(jnp.maximum(d2_spot, 1e-24))[..., None]
    cos_spot = vm.dot(-wi_s, take_rows(scene.lt_direction, li))
    from pbrt_tpu.utils.math import smoothstep

    falloff = smoothstep(cos_spot, take_rows(scene.lt_cos_end, li), take_rows(scene.lt_cos_start, li))
    L_s = em * (falloff / jnp.maximum(d2_spot, 1e-12))[..., None]

    is_area = ltype == bd.LIGHT_AREA
    is_distant = ltype == bd.LIGHT_DISTANT
    is_uniform = ltype == bd.LIGHT_UNIFORM_INFINITE
    is_spot = ltype == bd.LIGHT_SPOT
    is_env = ltype == bd.LIGHT_IMAGE_INFINITE

    # image-infinite: alias-table env direction (only evaluated when the
    # scene has env maps at all — static shape check keeps small scenes lean)
    if int(scene.env_data.shape[0]) > 1:
        L_e, wi_e, pdf_e, p_e = env_sample_li(scene, li, p_ref, u2, lam, scene_radius)
    else:
        L_e, wi_e, pdf_e, p_e = em, wi_u, pdf_u, p_u

    wi = jnp.where(
        is_area[..., None],
        wi_a,
        jnp.where(
            is_distant[..., None],
            wi_d,
            jnp.where(is_spot[..., None], wi_s, jnp.where(is_env[..., None], wi_e, wi_u)),
        ),
    )
    L = jnp.where(
        is_area[..., None],
        L_a,
        jnp.where(is_spot[..., None], L_s, jnp.where(is_env[..., None], L_e, em)),
    )
    pdf = jnp.where(
        is_area, pdf_a, jnp.where(is_uniform, pdf_u, jnp.where(is_env, pdf_e, 1.0))
    )
    p_light = jnp.where(
        is_area[..., None],
        p_a,
        jnp.where(
            is_spot[..., None],
            take_rows(scene.lt_position, li),
            jnp.where(
                is_distant[..., None], p_d, jnp.where(is_env[..., None], p_e, p_u)
            ),
        ),
    )
    valid = jnp.where(is_area, valid_a, True) & (light_idx >= 0) & (pdf > 0.0)
    is_delta = is_distant | is_spot
    at_infinity = is_distant | is_uniform | is_env
    return LightLiSample(
        L=L,
        wi=wi,
        pdf=pdf,
        p_light=p_light,
        n_light=jnp.where(is_area[..., None], n_a, -wi),
        valid=valid,
        is_delta=is_delta,
        is_distant=at_infinity,
    )


def uniform_infinite_pdf_li():
    return warps.UNIFORM_SPHERE_PDF


# --------------------------------------------------- image-infinite lights
# (reference lights/image_infinite_light.{h,cu}: equal-area octahedral env
# map with alias-table importance sampling)


def _env_fetch(scene, li, px, py):
    """Octahedral-wrap texel fetch from the env atlas
    (gpu_image.cu:20-50 OctahedralSphere remap)."""
    w = take_rows(scene.lt_env_w, li)
    h = take_rows(scene.lt_env_h, li)
    off = jnp.maximum(take_rows(scene.lt_env_off, li), 0)
    # mirror across edges
    neg_x = px < 0
    big_x = px >= w
    px = jnp.where(neg_x, -px, jnp.where(big_x, 2 * w - 1 - px, px))
    py = jnp.where(neg_x | big_x, h - 1 - py, py)
    neg_y = py < 0
    big_y = py >= h
    py = jnp.where(neg_y, -py, jnp.where(big_y, 2 * h - 1 - py, py))
    px = jnp.where(neg_y | big_y, w - 1 - px, px)
    px = jnp.clip(px, 0, jnp.maximum(w - 1, 0))
    py = jnp.clip(py, 0, jnp.maximum(h - 1, 0))
    return scene.env_data[off + py * w + px]


def env_bilerp_rgb(scene, li, uv):
    """Bilinear env-map fetch at octahedral uv (R,2) -> rgb (R,3)."""
    w = take_rows(scene.lt_env_w, li).astype(jnp.float32)
    h = take_rows(scene.lt_env_h, li).astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    dx = (x - xi.astype(jnp.float32))[..., None]
    dy = (y - yi.astype(jnp.float32))[..., None]
    v00 = _env_fetch(scene, li, xi, yi)
    v10 = _env_fetch(scene, li, xi + 1, yi)
    v01 = _env_fetch(scene, li, xi, yi + 1)
    v11 = _env_fetch(scene, li, xi + 1, yi + 1)
    return ((1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v10
            + (1 - dx) * dy * v01 + dx * dy * v11)


def env_image_le(scene, li, uv, lam):
    """rgb -> illuminant-uplifted spectral radiance * light scale
    (ImageLe, image_infinite_light.cu:147-154)."""
    from pbrt_tpu.spectral import rgb2spec, spectra, cie

    rgb = jnp.clip(env_bilerp_rgb(scene, li, uv), 0.0, None)
    m = jnp.max(rgb, axis=-1)
    s = 2.0 * m
    rgb_n = jnp.where(s[..., None] > 0, rgb / jnp.maximum(s[..., None], 1e-24), 0.0)
    c = rgb2spec.rgb_to_coefficients(rgb_n)
    sig = spectra.sigmoid_polynomial(c, lam)
    illum = spectra.sample_dense(jnp.asarray(cie.illum_d65(), jnp.float32), lam)
    return sig * s[..., None] * illum * take_rows(scene.lt_scale, li)[..., None]


def env_le(scene, li, d_render, lam):
    """Escaped-ray radiance for image-infinite light li (R,) given ray
    direction (R,3) (le(), image_infinite_light.cu:88-94)."""
    from pbrt_tpu.sampling import warps

    w_light = vm.normalize(
        jnp.einsum("rij,rj->ri", take_rows(scene.lt_l_from_r, li), d_render)
    )
    uv = warps.equal_area_sphere_to_square(w_light)
    return env_image_le(scene, li, uv, lam)


def env_sample_li(scene, li, p_ref, u2, lam, scene_radius):
    """Alias-table direction sample (sample_li, image_infinite_light.cu:96-114).
    Returns (L, wi, pdf, p_light)."""
    from pbrt_tpu.sampling import warps

    w = take_rows(scene.lt_env_w, li)
    h = take_rows(scene.lt_env_h, li)
    off = jnp.maximum(take_rows(scene.lt_env_off, li), 0)
    n = jnp.maximum(w * h, 1)

    # segment-aware alias sample (distribution/distributions.py logic inline
    # because offsets vary per lane)
    x = u2[..., 0] * n.astype(jnp.float32)
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
    frac = x - i.astype(jnp.float32)
    qi = scene.env_q[off + i]
    accept = frac < qi
    texel = jnp.where(accept, i, scene.env_alias[off + i])
    jx = jnp.where(accept, frac / jnp.maximum(qi, 1e-12),
                   (frac - qi) / jnp.maximum(1.0 - qi, 1e-12))
    jx = jnp.clip(jx, 0.0, 1.0 - 1e-7)
    pmf = scene.env_pdf[off + texel]

    tx = texel % jnp.maximum(w, 1)
    ty = texel // jnp.maximum(w, 1)
    uv = jnp.stack(
        [(tx.astype(jnp.float32) + jx) / w.astype(jnp.float32),
         (ty.astype(jnp.float32) + u2[..., 1]) / h.astype(jnp.float32)], -1
    )
    map_pdf = pmf * n.astype(jnp.float32)       # density in uv
    pdf = map_pdf / (4.0 * jnp.pi)              # solid-angle density

    w_light = warps.equal_area_square_to_sphere(uv)
    wi = vm.normalize(jnp.einsum("rij,rj->ri", take_rows(scene.lt_r_from_l, li), w_light))
    L = env_image_le(scene, li, uv, lam)
    p_light = p_ref + wi * (2.0 * scene_radius)
    return L, wi, pdf, p_light


def env_pdf_li(scene, li, w_render):
    """pdf of sampling direction w via light li (pdf_li,
    image_infinite_light.cu:134-141)."""
    from pbrt_tpu.sampling import warps

    w = take_rows(scene.lt_env_w, li)
    h = take_rows(scene.lt_env_h, li)
    off = jnp.maximum(take_rows(scene.lt_env_off, li), 0)
    n = jnp.maximum(w * h, 1)
    w_light = vm.normalize(jnp.einsum("rij,rj->ri", take_rows(scene.lt_l_from_r, li), w_render))
    uv = warps.equal_area_sphere_to_square(w_light)
    tx = jnp.clip((uv[..., 0] * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip((uv[..., 1] * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    pmf = scene.env_pdf[off + ty * w + tx]
    return pmf * n.astype(jnp.float32) / (4.0 * jnp.pi)


# ------------------------------------------------- sphere / disk emitters
# (reference shapes/sphere.cu sample(ctx): cone sampling outside, area
# sampling inside; shapes/disk.cu sample(ctx): uniform area -> solid angle)


def sample_sphere_light_li(scene, light_idx, p_ref, u2):
    """-> (p_light, n_light, pdf (solid angle), valid)."""
    li = jnp.maximum(light_idx, 0)
    sph = jnp.maximum(take_rows(scene.lt_sph, li), 0)
    c = take_rows(scene.sph_center, sph)
    rad = take_rows(scene.sph_radius, sph)
    to_c = c - p_ref
    dist2 = vm.length_squared(to_c)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    inside = dist2 <= rad * rad

    # --- outside: uniform cone (sphere.cu:188-240 / pbrt-v4)
    sin2_max = (rad * rad) / jnp.maximum(dist2, 1e-24)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    one_minus_cos_max = jnp.where(
        sin2_max < 0.00068523, sin2_max / 2.0, 1.0 - cos_max
    )
    cos_t = (cos_max - 1.0) * u2[..., 0] + 1.0
    sin2_t = 1.0 - cos_t * cos_t
    small = sin2_max < 0.00068523
    sin2_t = jnp.where(small, sin2_max * u2[..., 0], sin2_t)
    cos_t = jnp.where(small, jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0)), cos_t)
    sin_max = jnp.sqrt(jnp.maximum(sin2_max, 1e-24))
    cos_alpha = sin2_t / sin_max + cos_t * jnp.sqrt(
        jnp.maximum(1.0 - sin2_t / jnp.maximum(sin2_max, 1e-24), 0.0)
    )
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha * cos_alpha, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    # frame around the axis from the sphere center towards the reference
    axis = vm.normalize(p_ref - c)
    fx, fy, fz = vm.frame_from_z(axis)
    n_local = vm.spherical_direction(sin_alpha, cos_alpha, phi)
    n_out = vm.from_local(fx, fy, fz, n_local)
    p_out = c + rad[..., None] * n_out
    pdf_out = 1.0 / jnp.maximum(2.0 * jnp.pi * one_minus_cos_max, 1e-12)

    # --- inside: uniform area sample -> solid angle
    from pbrt_tpu.sampling import warps

    n_in = warps.sample_uniform_sphere(u2)
    p_in = c + rad[..., None] * n_in
    wi_in = vm.normalize(p_in - p_ref)
    d2_in = vm.length_squared(p_in - p_ref)
    area = 4.0 * jnp.pi * rad * rad
    cos_l = vm.absdot(n_in, -wi_in)
    pdf_in = d2_in / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)

    p_l = jnp.where(inside[..., None], p_in, p_out)
    n_l = jnp.where(inside[..., None], n_in, n_out)
    pdf = jnp.where(inside, pdf_in, pdf_out)
    valid = jnp.isfinite(pdf) & (pdf > 0.0)
    return p_l, n_l, pdf, valid


def sphere_light_pdf_li(scene, light_idx, p_ref, hit_p, hit_n, wi):
    li = jnp.maximum(light_idx, 0)
    sph = jnp.maximum(take_rows(scene.lt_sph, li), 0)
    c = take_rows(scene.sph_center, sph)
    rad = take_rows(scene.sph_radius, sph)
    dist2 = vm.length_squared(c - p_ref)
    inside = dist2 <= rad * rad
    sin2_max = (rad * rad) / jnp.maximum(dist2, 1e-24)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    one_minus_cos_max = jnp.where(sin2_max < 0.00068523, sin2_max / 2.0, 1.0 - cos_max)
    pdf_out = 1.0 / jnp.maximum(2.0 * jnp.pi * one_minus_cos_max, 1e-12)
    d2 = vm.length_squared(hit_p - p_ref)
    area = 4.0 * jnp.pi * rad * rad
    cos_l = vm.absdot(hit_n, -wi)
    pdf_in = d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    return jnp.where(inside, pdf_in, pdf_out)


def sample_disk_light_li(scene, light_idx, p_ref, u2):
    """Uniform-area disk sample converted to solid angle (disk.cu:42-85)."""
    from pbrt_tpu.sampling import warps

    li = jnp.maximum(light_idx, 0)
    dk = jnp.maximum(take_rows(scene.lt_dsk, li), 0)
    c = take_rows(scene.dsk_center, dk)
    n = take_rows(scene.dsk_normal, dk)
    rad = take_rows(scene.dsk_radius, dk)
    pd = warps.sample_uniform_disk_concentric(u2)
    fx, fy, fz = vm.frame_from_z(n)
    p_l = c + fx * (pd[..., 0] * rad)[..., None] + fy * (pd[..., 1] * rad)[..., None]
    area = jnp.pi * (rad * rad - take_rows(scene.dsk_inner, dk) ** 2)
    wi = vm.normalize(p_l - p_ref)
    d2 = vm.length_squared(p_l - p_ref)
    cos_l = vm.absdot(n, -wi)
    pdf = d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    valid = jnp.isfinite(pdf) & (pdf > 0.0) & (d2 > 0.0)
    return p_l, n, pdf, valid


def disk_light_pdf_li(scene, light_idx, p_ref, hit_p, hit_n, wi):
    li = jnp.maximum(light_idx, 0)
    dk = jnp.maximum(take_rows(scene.lt_dsk, li), 0)
    rad = take_rows(scene.dsk_radius, dk)
    area = jnp.pi * (rad * rad - take_rows(scene.dsk_inner, dk) ** 2)
    d2 = vm.length_squared(hit_p - p_ref)
    cos_l = vm.absdot(hit_n, -wi)
    pdf = d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    return jnp.where(jnp.isfinite(pdf), pdf, 0.0)


# ------------------------------------------------------ light-path emission
# (reference diffuse_area_light.cu:76-128 sample_le / pdf_le; BDPT light
# subpath start. Only area emitters produce light subpaths here — other
# light types yield valid=False and their transport flows through the
# camera-path (s=0) strategies.)


def _area_shape_sample(scene, light_idx, u2):
    """Uniform-by-area point on the emitter shape -> (p, ng, area, valid)."""
    li = jnp.maximum(light_idx, 0)
    R = u2.shape[0]
    p = jnp.zeros((R, 3))
    n = jnp.zeros((R, 3)).at[..., 2].set(1.0)
    area = jnp.ones((R,))
    valid = jnp.zeros((R,), bool)
    if int(scene.tri_p0.shape[0]) > 0:
        tri = take_rows(scene.lt_tri, li)
        p0, p1, p2 = _tri_verts(scene, tri)
        a_t, n_t = _tri_area_normal(p0, p1, p2)
        b = warps.sample_uniform_triangle(u2)
        p_t = b[..., 0:1] * p0 + b[..., 1:2] * p1 + b[..., 2:3] * p2
        is_t = tri >= 0
        p = jnp.where(is_t[..., None], p_t, p)
        n = jnp.where(is_t[..., None], n_t, n)
        area = jnp.where(is_t, a_t, area)
        valid = valid | is_t
    if int(scene.sph_center.shape[0]) > 0:
        sph = take_rows(scene.lt_sph, li)
        sph_c = jnp.maximum(sph, 0)
        n_s = warps.sample_uniform_sphere(u2)
        c = take_rows(scene.sph_center, sph_c)
        rad = take_rows(scene.sph_radius, sph_c)
        p_s = c + rad[..., None] * n_s
        a_s = 4.0 * jnp.pi * rad * rad
        is_s = sph >= 0
        p = jnp.where(is_s[..., None], p_s, p)
        n = jnp.where(is_s[..., None], n_s, n)
        area = jnp.where(is_s, a_s, area)
        valid = valid | is_s
    if int(scene.dsk_center.shape[0]) > 0:
        dk = take_rows(scene.lt_dsk, li)
        dk_c = jnp.maximum(dk, 0)
        c = take_rows(scene.dsk_center, dk_c)
        nd = take_rows(scene.dsk_normal, dk_c)
        rad = take_rows(scene.dsk_radius, dk_c)
        pd = warps.sample_uniform_disk_concentric(u2)
        fx, fy, fz = vm.frame_from_z(nd)
        p_d = c + fx * (pd[..., 0] * rad)[..., None] + fy * (pd[..., 1] * rad)[..., None]
        a_d = jnp.pi * (rad * rad - take_rows(scene.dsk_inner, dk_c) ** 2)
        is_d = dk >= 0
        p = jnp.where(is_d[..., None], p_d, p)
        n = jnp.where(is_d[..., None], nd, n)
        area = jnp.where(is_d, a_d, area)
        valid = valid | is_d
    return p, n, area, valid


def sample_le(scene, light_idx, u_pos, u_dir, lam):
    """Emit a photon ray from light light_idx (BDPT light-subpath start).
    -> (Le (R,4), p (R,3), ng (R,3), w (R,3), pdf_pos (R,), pdf_dir (R,),
        valid (R,)).

    Covers every light type the builder emits (reference sample_le impls:
    diffuse_area_light.cu, distant_light.cu, uniform/image_infinite_light.cu,
    spot_light.cu). Distant/infinite rays start on a disk of the scene's
    bounding sphere perpendicular to the emission direction (pdf_pos =
    1/(pi r^2)); delta quantities (distant direction, spot position) report
    pdf 1 so betas divide cleanly, with the delta handled by the caller's
    MIS flags."""
    li = jnp.maximum(light_idx, 0)
    ltype = take_rows(scene.lt_type, li)
    is_area = ltype == bd.LIGHT_AREA
    is_distant = ltype == bd.LIGHT_DISTANT
    is_uniform = ltype == bd.LIGHT_UNIFORM_INFINITE
    is_env = ltype == bd.LIGHT_IMAGE_INFINITE
    is_spot = ltype == bd.LIGHT_SPOT
    em = emission(scene, light_idx, lam)
    radius = scene.scene_radius
    center = scene.scene_center
    disk_pdf = 1.0 / (jnp.pi * jnp.maximum(radius * radius, 1e-12))

    # ---- area emitters (cosine-hemisphere emission off the shape)
    p, ng, area, shape_ok = _area_shape_sample(scene, light_idx, u_pos)
    pdf_pos_a = 1.0 / jnp.maximum(area, 1e-12)

    two = take_rows(scene.lt_twosided, li)
    u0 = u_dir[..., 0]
    flipside = two & (u0 >= 0.5)
    u0r = jnp.where(two, jnp.where(u0 < 0.5, u0 * 2.0, (u0 - 0.5) * 2.0), u0)
    u0r = jnp.minimum(u0r, 1.0 - 1e-7)
    w_local = warps.sample_cosine_hemisphere(
        jnp.stack([u0r, u_dir[..., 1]], axis=-1)
    )
    w_local = jnp.where(flipside[..., None], w_local * jnp.asarray([1.0, 1.0, -1.0]), w_local)
    pdf_dir_a = warps.cosine_hemisphere_pdf(jnp.abs(w_local[..., 2]))
    pdf_dir_a = jnp.where(two, pdf_dir_a / 2.0, pdf_dir_a)
    fx, fy, fz = vm.frame_from_z(ng)
    w_a = vm.from_local(fx, fy, fz, w_local)
    front = w_local[..., 2] > 0.0
    Le_a = jnp.where((front | two)[..., None], em, 0.0)

    # ---- emission direction for the non-area types
    # distant: fixed -lt_direction; uniform-inf: uniform sphere; image-inf:
    # alias-table env direction (negated); spot: uniform cone around axis
    wi_toward = take_rows(scene.lt_direction, li)        # distant: toward light
    w_dist = -wi_toward
    w_unif = warps.sample_uniform_sphere(u_dir)
    if int(scene.env_data.shape[0]) > 1:
        L_e, wi_e, pdf_e, _ = env_sample_li(
            scene, li, jnp.zeros_like(p), u_dir, lam, radius
        )
    else:
        L_e, wi_e, pdf_e = em, -w_unif, jnp.full_like(u0, warps.UNIFORM_SPHERE_PDF)
    w_env = -wi_e
    # spot cone (uniform in [cos_end, 1], reference spot_light.cu sample_le)
    cos_end = take_rows(scene.lt_cos_end, li)
    cos_t = (1.0 - u_dir[..., 0]) + u_dir[..., 0] * cos_end
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u_dir[..., 1]
    axis = take_rows(scene.lt_direction, li)
    ax_x, ax_y, ax_z = vm.frame_from_z(axis)
    w_spot = (ax_x * (sin_t * jnp.cos(phi))[..., None]
              + ax_y * (sin_t * jnp.sin(phi))[..., None]
              + ax_z * cos_t[..., None])
    pdf_cone = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_end, 1e-9))
    from pbrt_tpu.utils.math import smoothstep

    falloff = smoothstep(cos_t, cos_end, take_rows(scene.lt_cos_start, li))
    Le_spot = em * falloff[..., None]

    w = jnp.where(
        is_area[..., None], w_a,
        jnp.where(is_distant[..., None], w_dist,
                  jnp.where(is_env[..., None], w_env,
                            jnp.where(is_spot[..., None], w_spot, w_unif))))

    # ---- origin: area shapes sample the shape; distant/infinite sample a
    # disk of the bounding sphere facing the emission direction; spot is
    # the (delta) light position
    dx, dy, dz = vm.frame_from_z(w)
    cd = warps.sample_uniform_disk_concentric(u_pos)
    p_disk = (center[None, :] + radius * (-w)
              + radius * (dx * cd[..., 0:1] + dy * cd[..., 1:2]))
    p = jnp.where(is_area[..., None], p,
                  jnp.where(is_spot[..., None],
                            take_rows(scene.lt_position, li), p_disk))
    ng = jnp.where(is_area[..., None], ng, w)

    Le = jnp.where(
        is_area[..., None], Le_a,
        jnp.where(is_spot[..., None], Le_spot,
                  jnp.where(is_env[..., None], L_e, em)))
    pdf_pos = jnp.where(is_area, pdf_pos_a,
                        jnp.where(is_spot, 1.0, disk_pdf))
    pdf_dir = jnp.where(
        is_area, pdf_dir_a,
        jnp.where(is_distant, 1.0,
                  jnp.where(is_uniform, warps.UNIFORM_SPHERE_PDF,
                            jnp.where(is_env, pdf_e, pdf_cone))))
    valid = (light_idx >= 0) & (pdf_dir > 0.0) & jnp.where(
        is_area, shape_ok & (pdf_dir_a > 0.0), True
    )
    return Le, p, ng, w, pdf_pos, pdf_dir, valid


def pdf_le(scene, light_idx, ng, w):
    """(pdf_pos, pdf_dir) for an emitted ray (reference pdf_le impls:
    diffuse_area_light.cu:123-128; distant/infinite lights use the
    bounding-disk positional density, delta quantities pdf 0)."""
    li = jnp.maximum(light_idx, 0)
    ltype = take_rows(scene.lt_type, li)
    is_area = ltype == bd.LIGHT_AREA
    is_distant = ltype == bd.LIGHT_DISTANT
    is_uniform = ltype == bd.LIGHT_UNIFORM_INFINITE
    is_env = ltype == bd.LIGHT_IMAGE_INFINITE
    is_spot = ltype == bd.LIGHT_SPOT
    radius = scene.scene_radius
    disk_pdf = 1.0 / (jnp.pi * jnp.maximum(radius * radius, 1e-12))

    _, _, area, _ = _area_shape_sample(
        scene, light_idx, jnp.full(ng.shape[:-1] + (2,), 0.5)
    )
    pdf_pos_a = 1.0 / jnp.maximum(area, 1e-12)
    two = take_rows(scene.lt_twosided, li)
    cosw = vm.dot(ng, w)
    pdf_dir_a = jnp.where(
        two,
        warps.cosine_hemisphere_pdf(jnp.abs(cosw)) / 2.0,
        warps.cosine_hemisphere_pdf(jnp.maximum(cosw, 0.0)),
    )
    # image-infinite: env density of the direction TOWARD the light (-w)
    if int(scene.env_data.shape[0]) > 1:
        pdf_env = env_pdf_li(scene, li, -w)
    else:
        pdf_env = jnp.full_like(pdf_dir_a, warps.UNIFORM_SPHERE_PDF)
    cos_end = take_rows(scene.lt_cos_end, li)
    cos_spot = vm.dot(take_rows(scene.lt_direction, li), w)
    pdf_cone = jnp.where(
        cos_spot >= cos_end,
        1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_end, 1e-9)), 0.0,
    )

    pdf_pos = jnp.where(is_area, pdf_pos_a,
                        jnp.where(is_spot, 0.0, disk_pdf))
    pdf_dir = jnp.where(
        is_area, pdf_dir_a,
        jnp.where(is_distant, 0.0,
                  jnp.where(is_uniform, warps.UNIFORM_SPHERE_PDF,
                            jnp.where(is_env, pdf_env, pdf_cone))))
    return pdf_pos, pdf_dir


def infinite_light_density(scene, env_ids, w_toward):
    """Sum over infinite lights of pmf * pdf_li(w_toward) (reference
    bdpt.cu:67-76 infinite_light_density; w_toward points AT the lights,
    i.e. along the escaping ray)."""
    R = w_toward.shape[:-1]
    pdf = jnp.zeros(R)
    if int(scene.lt_type.shape[0]) > 0:
        is_uinf = scene.lt_type == bd.LIGHT_UNIFORM_INFINITE
        pmf_uinf = jnp.sum(jnp.where(is_uinf, scene.lt_pmf, 0.0))
        pdf = pdf + pmf_uinf * uniform_infinite_pdf_li()
    for env_id in env_ids:
        li_arr = jnp.full(R, env_id, jnp.int32)
        pdf = pdf + scene.lt_pmf[env_id] * env_pdf_li(scene, li_arr, w_toward)
    return pdf


def infinite_le(scene, env_ids, d, lam):
    """Total radiance from all infinite lights along escaped direction d
    (reference Vertex::Le infinite branch, bdpt.cu:192-203)."""
    R = d.shape[:-1]
    from pbrt_tpu.spectral import spectra

    Le = jnp.zeros(R + lam.shape[-1:])
    if int(scene.lt_type.shape[0]) > 0:
        is_uinf = scene.lt_type == bd.LIGHT_UNIFORM_INFINITE
        em_all = scene.lt_emission * scene.lt_scale[:, None]
        uinf_dense = jnp.sum(jnp.where(is_uinf[:, None], em_all, 0.0), axis=0)
        Le = Le + spectra.sample_dense(uinf_dense, lam)
    for env_id in env_ids:
        li_arr = jnp.full(R, env_id, jnp.int32)
        Le = Le + env_le(scene, li_arr, d, lam)
    return Le
