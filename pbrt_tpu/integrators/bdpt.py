"""Bidirectional path tracing.

TPU-native re-expression of reference integrators/bdpt.{h,cu} (1,212 LoC,
pbrt-v4's BDPT): camera and light subpaths are random walks over dense lane
batches; vertices live in per-slot SoA records (the (s,t) strategy loops are
static, so vertex indexing is compile-time); the MIS weight's ScopedAssignment
pdf-rewrites (bdpt.cu:288-380) become functional recomputation of the four
junction pdf_revs per strategy.

Strategy coverage (connect_bdpt, bdpt.cu:612-721):
  s=0      camera path hits an emitter OR escapes to infinite lights
           (escaped rays become light vertices, bdpt.cu:475-483)
  t=1      light path connected to a sampled lens point -> film splat
  s=1      camera vertex connected to a sampled light point (NEE-like)
  s>1,t>1  general vertex-to-vertex connection with G and visibility

Light subpaths start from EVERY light type via lights.sample_le
(bdpt.cu:531-610 generate_light_subpath), with the reference's
infinite-area-light density corrections (bdpt.cu:593-609: v0 pdf_fwd =
infinite_light_density, v1 pdf_fwd = pdf_pos * |cos|) and MIS special
cases (pdf_light / pdf_light_origin infinite branches, bdpt.cu:86-92,
221-223). Connection segments run compute_transmittance through
material-less interfaces and homogeneous media (compute_G,
bdpt.cu:280-286; base->compute_transmittance at :652,:695), and subpath
walks pass through interfaces with deterministic transmittance.

Media (bdpt.cu:431-472 VertexType::medium): when the scene has media,
every subpath segment distance-samples sigma_t (exponential vs the
average channel, matching path.bounce_step) and a scatter event creates a
VT_MEDIUM vertex whose f/pdf are the HG phase function — connectible,
non-delta, cos-free in density conversions (bdpt.h:51,78,136). Interface
hops cross without attenuation (the reference's pass-through at
bdpt.cu:410-427; medium transmittance is carried by the distance
sampling itself under the spectrally-uniform-sigma convention shared
with path.py). Connection segments still use deterministic
compute_transmittance (compute_G, bdpt.cu:280-286).
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY, power_heuristic
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.geometry.ray import offset_ray_origin
from pbrt_tpu.accel import dispatch
from pbrt_tpu.cameras import perspective
from pbrt_tpu.materials import materials, bxdfs
from pbrt_tpu.lights import lights
from pbrt_tpu.sampling import samplers
from pbrt_tpu.spectral import sampled

VT_NONE = 0
VT_CAMERA = 1
VT_LIGHT = 2
VT_SURFACE = 3
VT_LIGHT_INF = 4   # escaped camera ray captured as an infinite-light vertex
                   # (reference bdpt.cu:475-483 Vertex::create_light(ray))
VT_MEDIUM = 5      # in-medium phase-scatter vertex (bdpt.cu:431-472
                   # Vertex::create_medium; f/pdf = HG phase, no cosine)


class V(NamedTuple):
    """One vertex slot, SoA over lanes (bdpt.h:50-279 Vertex)."""

    vtype: jnp.ndarray    # (R,) i32
    p: jnp.ndarray        # (R,3)
    ng: jnp.ndarray       # (R,3)
    ns: jnp.ndarray       # (R,3)
    uv: jnp.ndarray       # (R,2)
    beta: jnp.ndarray     # (R,4)
    pdf_fwd: jnp.ndarray  # (R,) area-measure pdf from the previous vertex
    pdf_rev: jnp.ndarray  # (R,) area-measure pdf from the next vertex
    delta: jnp.ndarray    # (R,) bool (specular connection)
    light: jnp.ndarray    # (R,) i32 light id (emitter surface or endpoint)
    mat: jnp.ndarray      # (R,) i32 material (surface vertices)
    med: jnp.ndarray      # (R,) i32 medium of the ARRIVAL segment (-1 none)
    med_in: jnp.ndarray   # (R,) i32 interior medium of the hit surface
    med_out: jnp.ndarray  # (R,) i32 exterior medium (interface selection
                          # for connection transmittance, cf. _medium_after)
    wo: jnp.ndarray       # (R,3) direction towards the previous vertex
    # cached BSDF (built once during the walk; connections/pdfs reuse it —
    # rebuilding via make_bsdf per strategy made the traced graph explode)
    bx: object            # bxdfs.BxdfParams or None
    fx: jnp.ndarray       # shading frame
    fy: jnp.ndarray
    fz: jnp.ndarray


def _empty_vertex(R):
    zero_bx = bxdfs.BxdfParams(
        kind=jnp.zeros((R,), jnp.int32),
        refl=jnp.zeros((R, 4)),
        trans=jnp.zeros((R, 4)),
        eta_re=jnp.ones((R, 4)),
        eta_im=jnp.zeros((R, 4)),
        eta=jnp.ones((R,)),
        ax=jnp.full((R,), 1e-4),
        ay=jnp.full((R,), 1e-4),
    )
    z = jnp.zeros((R, 3))
    return V(
        vtype=jnp.zeros((R,), jnp.int32),
        p=jnp.zeros((R, 3)),
        ng=jnp.zeros((R, 3)).at[..., 2].set(1.0),
        ns=jnp.zeros((R, 3)).at[..., 2].set(1.0),
        uv=jnp.zeros((R, 2)),
        beta=jnp.zeros((R, 4)),
        pdf_fwd=jnp.zeros((R,)),
        pdf_rev=jnp.zeros((R,)),
        delta=jnp.zeros((R,), bool),
        light=jnp.full((R,), -1, jnp.int32),
        mat=jnp.full((R,), -1, jnp.int32),
        med=jnp.full((R,), -1, jnp.int32),
        med_in=jnp.full((R,), -1, jnp.int32),
        med_out=jnp.full((R,), -1, jnp.int32),
        wo=jnp.zeros((R, 3)),
        bx=zero_bx,
        fx=z.at[..., 0].set(1.0),
        fy=z.at[..., 1].set(1.0),
        fz=z.at[..., 2].set(1.0),
    )


def _exists(v: V):
    return v.vtype != VT_NONE


def _is_connectible(v: V):
    # camera/light endpoints + non-delta surfaces (bdpt.h is_connectible)
    return _exists(v) & ~v.delta


def _dir_to(a_p, b_p):
    d = b_p - a_p
    dist2 = vm.length_squared(d)
    return d / jnp.sqrt(jnp.maximum(dist2, 1e-24))[..., None], dist2


def _convert_density(pdf_dir, from_p, to: V):
    """Solid-angle pdf at from_p towards `to` -> area density at `to`
    (bdpt.h convert_density)."""
    w, dist2 = _dir_to(from_p, to.p)
    cos = vm.absdot(to.ng, w)
    # endpoints without geometry (camera pinhole) keep cos factor 1
    cos = jnp.where(to.vtype == VT_SURFACE, cos, jnp.maximum(cos, 1.0))
    return pdf_dir * cos / jnp.maximum(dist2, 1e-24)


def _vertex_bsdf(scene, v: V, wl):
    """Cached-lobe Bsdf for the vertex. Coated (layered) kinds are
    approximated as their bottom diffuse lobe in BDPT connections (the
    layered walk is too heavy to re-trace per strategy)."""
    kind = v.bx.kind
    kind = jnp.where(
        (kind == bxdfs.K_COATED_DIFFUSE) | (kind == bxdfs.K_COATED_CONDUCTOR),
        bxdfs.K_DIFFUSE,
        kind,
    )
    return materials.Bsdf(params=v.bx._replace(kind=kind), fx=v.fx, fy=v.fy, fz=v.fz,
                          lay=None)


def _vertex_f(scene, v: V, to: V, wl):
    """BSDF (or phase-function) value at v towards `to` (bdpt.h Vertex::f),
    zero for endpoints. Medium vertices evaluate the HG phase of v's medium
    (bdpt.h:78 f() medium branch; phase value is wavelength-flat)."""
    wi, _ = _dir_to(v.p, to.p)
    b = _vertex_bsdf(scene, v, wl)
    f = materials.bsdf_f(b, v.wo, wi)
    if int(scene.med_g.shape[0]) > 0:
        from pbrt_tpu.sampling import warps

        g = scene.med_g[jnp.maximum(v.med, 0)]
        p_hg = warps.henyey_greenstein(vm.dot(v.wo, wi), g)
        f = jnp.where((v.vtype == VT_MEDIUM)[..., None], p_hg[..., None], f)
    ok = (v.vtype == VT_SURFACE) | (v.vtype == VT_MEDIUM)
    return jnp.where(ok[..., None], f, 0.0)


def _vertex_pdf(scene, v: V, prev: V, nxt: V, wl, prev_valid):
    """Directional pdf at v from prev towards nxt, converted to area at nxt
    (bdpt.h Vertex::pdf)."""
    wn, _ = _dir_to(v.p, nxt.p)
    wp, _ = _dir_to(v.p, prev.p)
    wp_eff = jnp.where(prev_valid[..., None], wp, v.wo)
    # surface: bsdf pdf
    b = _vertex_bsdf(scene, v, wl)
    pdf_surf = materials.bsdf_pdf(b, wp_eff, wn)
    if int(scene.med_g.shape[0]) > 0:
        # medium: HG phase pdf of the vertex's medium (bdpt.h:136 pdf()
        # medium branch)
        from pbrt_tpu.sampling import warps

        g = scene.med_g[jnp.maximum(v.med, 0)]
        p_hg = warps.henyey_greenstein(vm.dot(wp_eff, wn), g)
        pdf_surf = jnp.where(v.vtype == VT_MEDIUM, p_hg, pdf_surf)
    # camera: pdf_we directional
    _, pdf_cam = perspective.pdf_we(scene, v.p, wn)
    # light endpoint: emission direction pdf
    _, pdf_light_dir = lights.pdf_le(scene, v.light, v.ng, wn)
    pdf_dir = jnp.where(
        v.vtype == VT_CAMERA,
        pdf_cam,
        jnp.where(v.vtype == VT_LIGHT, pdf_light_dir, pdf_surf),
    )
    return _convert_density(pdf_dir, v.p, nxt)


def _is_inf_vertex(scene, v: V):
    """Escaped-ray vertices and light endpoints of infinite lights
    (bdpt.cu is_infinite_light: type==light with no ei.light, or an
    infinite-typed light)."""
    from pbrt_tpu.scene import builder as bd

    lt = lights.take_rows(scene.lt_type, jnp.maximum(v.light, 0))
    is_inf_type = (v.light >= 0) & (
        (lt == bd.LIGHT_UNIFORM_INFINITE) | (lt == bd.LIGHT_IMAGE_INFINITE)
    )
    return (v.vtype == VT_LIGHT_INF) | ((v.vtype == VT_LIGHT) & is_inf_type)


def _is_delta_light_v(scene, v: V):
    """Light endpoints of delta lights (distant direction / spot position)
    — bdpt.cu:369 is_delta_light()."""
    from pbrt_tpu.scene import builder as bd

    lt = lights.take_rows(scene.lt_type, jnp.maximum(v.light, 0))
    return (v.vtype == VT_LIGHT) & (v.light >= 0) & (
        (lt == bd.LIGHT_DISTANT) | (lt == bd.LIGHT_SPOT)
    )


def _vertex_pdf_light(scene, v: V, nxt: V):
    """pdf of light at v emitting towards nxt, area measure at nxt
    (bdpt.cu:79-122 Vertex::pdf_light). Infinite lights use the planar
    bounding-disk density 1/(pi r^2) (bdpt.cu:86-92)."""
    w, dist2 = _dir_to(v.p, nxt.p)
    _, pdf_dir = lights.pdf_le(scene, v.light, v.ng, w)
    pdf = pdf_dir / jnp.maximum(dist2, 1e-24)
    disk_pdf = 1.0 / (jnp.pi * jnp.maximum(scene.scene_radius ** 2, 1e-12))
    pdf = jnp.where(_is_inf_vertex(scene, v), disk_pdf, pdf)
    cos = vm.absdot(nxt.ng, w)
    cos = jnp.where(nxt.vtype == VT_SURFACE, cos, jnp.maximum(cos, 1.0))
    return pdf * cos


def _vertex_pdf_light_origin(scene, v: V, prev: V, env_ids=()):
    """pmf(light) * positional pdf; infinite vertices use the summed
    escaped-direction density (bdpt.cu:212-240 Vertex::pdf_light_origin)."""
    from pbrt_tpu.scene import builder as bd

    li = jnp.maximum(v.light, 0)
    pmf = scene.lt_pmf[li]
    lt = lights.take_rows(scene.lt_type, li)
    _, _, area, ok = lights._area_shape_sample(
        scene, v.light, jnp.full(v.p.shape[:-1] + (2,), 0.5)
    )
    pdf_pos_area = 1.0 / jnp.maximum(area, 1e-12)
    w, _ = _dir_to(v.p, prev.p)
    # non-area types: positional density from pdf_le (delta positions
    # report 0, remap0 handles them — bdpt.cu:226-239)
    pdf_pos_other, _ = lights.pdf_le(scene, v.light, v.ng, w)
    is_area = lt == bd.LIGHT_AREA
    pdf_pos = jnp.where(is_area, pdf_pos_area, pdf_pos_other)
    base = jnp.where((v.light >= 0) & (ok | ~is_area), pmf * pdf_pos, 0.0)
    # infinite: density of sampling the escape direction (toward the light)
    inf_pdf = lights.infinite_light_density(scene, env_ids, -w)
    return jnp.where(_is_inf_vertex(scene, v), inf_pdf, base)


def _remap0(f):
    return jnp.where(f != 0.0, f, 1.0)


# ---------------------------------------------------------------- walks


def _walk(scene, o, d, beta0, pdf_dir0, wl, smp, skind, spp, n_steps,
          mode_radiance, medium0=None):
    """Random walk (bdpt.cu:394-520 random_walk) as a lax.scan — the body
    compiles once regardless of depth (an unrolled version sent XLA:CPU's
    optimizer superlinear). Returns (list of per-step V slots,
    (endpoint_rev_dir, first_vertex), smp).

    Media handling (bdpt.cu:431-472): each segment leg distance-samples
    sigma_t against the leg length; a scatter event stops the segment and
    emits a VT_MEDIUM vertex (beta *= sigma_s/sigma_t, path.py's
    spectrally-uniform convention), continuation resamples the HG phase
    and both fwd/rev densities use the phase pdf. Interface crossings pass
    through WITHOUT attenuation (reference bdpt.cu:410-427 — medium
    transmittance is carried by the distance sampling); escaped camera
    rays become VT_LIGHT_INF vertices (bdpt.cu:475-483).

    Known approximation: a segment crosses at most 4 consecutive
    material-less interfaces; a lane still on an interface after the 4th
    hop dies (neither found nor escaped), losing its energy. The reference
    loops until a real surface (integrator_base.cu:22-71); deeper nesting
    than 4 dielectric shells between two real surfaces is the only case
    affected."""
    R = o.shape[0]
    has_media = int(scene.med_sigma_a.shape[0]) > 0
    med0 = (jnp.broadcast_to(jnp.asarray(medium0, jnp.int32), (R,))
            if medium0 is not None else jnp.full((R,), -1, jnp.int32))

    from pbrt_tpu.integrators.path import _medium_after
    from pbrt_tpu.spectral import spectra as _spectra
    from pbrt_tpu.sampling import warps as _warps

    def body(carry, _):
        beta, pdf_fwd_dir, active, prev_p, cur_o, cur_d, medium, n_rays, smp = carry
        n_rays = n_rays + jnp.sum(active.astype(jnp.float32))
        scat = jnp.zeros((R,), bool)
        p_scat = cur_o
        if has_media:
            # segment walk: cross up to 4 material-less interfaces; inside
            # a medium each leg samples an exponential scatter distance
            # (bdpt.cu:431-443; exponential vs the average sigma_t channel
            # exactly like path.bounce_step so the two estimators agree)
            o_h = cur_o
            med_h = medium
            done = ~active
            hit = None
            for _hop in range(4):
                t_cap = jnp.where(done, 0.0, INFINITY)
                h = dispatch.intersect(scene, o_h, cur_d, t_cap)
                seg = jnp.where(h.valid, h.t, INFINITY)
                in_med = ~done & (med_h >= 0)
                smp, u_dist = samplers.get_1d(smp, in_med, skind, spp)
                m_c = jnp.maximum(med_h, 0)
                sig_a = _spectra.sample_table(scene.med_sigma_a, m_c, wl.lam)
                sig_s = _spectra.sample_table(scene.med_sigma_s, m_c, wl.lam)
                sig_t = sig_a + sig_s
                sig_t_avg = jnp.mean(sig_t, axis=-1)
                t_samp = -jnp.log1p(
                    -jnp.clip(u_dist, 0.0, 1.0 - 1e-7)
                ) / jnp.maximum(sig_t_avg, 1e-12)
                scat_now = in_med & (t_samp < seg)
                beta = jnp.where(
                    scat_now[..., None],
                    beta * sig_s / jnp.maximum(sig_t, 1e-12),
                    beta,
                )
                p_scat = jnp.where(
                    scat_now[..., None], o_h + t_samp[..., None] * cur_d, p_scat
                )
                scat = scat | scat_now
                hit = h if hit is None else jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        done.reshape(done.shape + (1,) * (a.ndim - 1)), a, b),
                    hit, h,
                )
                is_iface = h.valid & (h.mat < 0) & ~done & ~scat_now
                o_h = jnp.where(
                    is_iface[..., None],
                    offset_ray_origin(h.p, h.ng, cur_d, scene.ray_offset_scale),
                    o_h,
                )
                med_h = jnp.where(is_iface, _medium_after(h, cur_d, med_h), med_h)
                done = done | ~is_iface | scat_now
            medium = med_h
        else:
            hit = dispatch.intersect(
                scene, cur_o, cur_d, jnp.where(active, INFINITY, 0.0)
            )
        found = active & ~scat & hit.valid & (hit.mat >= 0)
        esc = active & ~scat & ~hit.valid

        mat_r = materials.resolve_mix(scene, hit.mat, hit.p, hit.wo)
        b_full, _ = materials.make_bsdf(scene, mat_r, hit.ns, wl, hit.uv, hit.p)

        v_p = jnp.where(scat[..., None], p_scat, hit.p) if has_media else hit.p
        w_in, dist2 = _dir_to(prev_p, v_p)
        cosv = vm.absdot(hit.ng, w_in)
        # medium vertices convert density without a cosine (bdpt.h:166-171
        # convert_density: cos only when the target is on a surface)
        cos_eff = jnp.where(scat, 1.0, cosv) if has_media else cosv
        pdf_fwd = jnp.where(
            found | scat, pdf_fwd_dir * cos_eff / jnp.maximum(dist2, 1e-24), 0.0
        )

        smp, uc = samplers.get_1d(smp, found, skind, spp)
        smp, u2 = samplers.get_2d(smp, found, skind, spp)
        bs = materials.bsdf_sample(b_full, hit.wo, uc, u2)
        pdf_dir_mis = materials.mis_direction_pdf(b_full, hit.wo, bs)
        spec = bxdfs.is_specular(bs.flags)

        if has_media:
            # medium continuation: HG phase resample (bdpt.cu:456-466);
            # rho/pdf == 1 for HG so beta is unchanged, and the reverse
            # density equals the forward one (phase depends only on the
            # angle between the two directions)
            smp, u_ph = samplers.get_2d(smp, scat, skind, spp)
            g_m = scene.med_g[jnp.maximum(medium, 0)]
            wi_med, pdf_med = _warps.sample_henyey_greenstein(-cur_d, g_m, u_ph)
        else:
            wi_med = cur_d
            pdf_med = jnp.zeros((R,))

        cos_term = vm.absdot(bs.wi, hit.ns)
        beta_next = beta * bs.f * (cos_term / jnp.maximum(bs.pdf, 1e-20))[..., None]
        cont = found & bs.valid & jnp.any(beta_next > 0, -1)
        cont_med = scat & (pdf_med > 0.0)

        # reverse-directional pdf towards the previous vertex (cached lobes)
        kind = b_full.params.kind
        kind = jnp.where(
            (kind == bxdfs.K_COATED_DIFFUSE) | (kind == bxdfs.K_COATED_CONDUCTOR),
            bxdfs.K_DIFFUSE, kind,
        )
        b_cheap = materials.Bsdf(params=b_full.params._replace(kind=kind),
                                 fx=b_full.fx, fy=b_full.fy, fz=b_full.fz, lay=None)
        rev_dir = jnp.where(spec, 0.0, materials.bsdf_pdf(b_cheap, bs.wi, hit.wo))
        if has_media:
            rev_dir = jnp.where(scat, pdf_med, rev_dir)

        # escaped camera rays become infinite-light vertices: position far
        # along the ray, pdf_fwd kept in the SOLID-ANGLE measure
        # (bdpt.cu:475-483 + the infinite-vertex MIS conventions)
        esc_v = esc & bool(mode_radiance)
        vtype = jnp.where(
            found, VT_SURFACE,
            jnp.where(scat, VT_MEDIUM,
                      jnp.where(esc_v, VT_LIGHT_INF, VT_NONE)),
        ).astype(jnp.int32)
        p_esc = cur_o + cur_d * (4.0 * scene.scene_radius)
        zero3 = jnp.zeros((R, 3))
        vtx = V(
            vtype=vtype,
            p=jnp.where(esc_v[..., None], p_esc, v_p),
            ng=jnp.where(esc_v[..., None], -cur_d,
                         jnp.where(scat[..., None], zero3, hit.ng)),
            ns=jnp.where(esc_v[..., None], -cur_d,
                         jnp.where(scat[..., None], zero3, hit.ns)),
            uv=hit.uv,
            beta=jnp.where((found | esc_v | scat)[..., None], beta, 0.0),
            pdf_fwd=jnp.where(esc_v, pdf_fwd_dir, pdf_fwd),
            pdf_rev=jnp.zeros((R,)),
            delta=found & spec,
            light=jnp.where(found, hit.light, -1),
            mat=jnp.where(found, hit.mat, -1),
            med=jnp.where(found | scat, medium, -1),
            med_in=jnp.where(found, hit.med_in, -1),
            med_out=jnp.where(found, hit.med_out, -1),
            wo=jnp.where((esc_v | scat)[..., None], -cur_d, hit.wo),
            bx=b_full.params,
            fx=b_full.fx,
            fy=b_full.fy,
            fz=b_full.fz,
        )

        med_next = jnp.where(cont, _medium_after(hit, bs.wi, medium), medium)
        cont_any = cont | cont_med
        new_o = jnp.where(
            scat[..., None], p_scat,
            offset_ray_origin(hit.p, hit.ng, bs.wi, scene.ray_offset_scale),
        )
        new_carry = (
            jnp.where(cont[..., None], beta_next, beta),
            # MIS pdf: re-estimated for coated lanes whose sample pdf is
            # only proportional (bdpt.cu:509 pdf_is_proportional); medium
            # lanes carry the phase pdf (bdpt.cu:459)
            jnp.where(scat, pdf_med, jnp.where(spec, 0.0, pdf_dir_mis)),
            cont_any,
            v_p,
            new_o,
            jnp.where(scat[..., None], wi_med, bs.wi),
            med_next,
            n_rays,
            smp,
        )
        return new_carry, (vtx, rev_dir)

    active0 = jnp.any(beta0 > 0, -1) & (pdf_dir0 > 0)
    carry0 = (beta0, pdf_dir0, active0, o, o, d, med0, jnp.float32(0.0), smp)
    carry, (stacked, rev_dirs) = jax.lax.scan(body, carry0, None, length=n_steps)
    smp = carry[-1]
    n_rays = carry[-2]

    # fill pdf_rev from the successor's reverse-directional pdf (vectorized
    # over the step axis: slot i gets slot i+1's rev_dir converted to area)
    nxt = jax.tree_util.tree_map(lambda x: x[1:], stacked)
    cur_p = stacked.p[:-1]
    cur_ng = stacked.ng[:-1]
    w = cur_p - nxt.p
    dist2 = jnp.sum(w * w, axis=-1)
    w = w / jnp.sqrt(jnp.maximum(dist2, 1e-24))[..., None]
    cos = jnp.abs(jnp.sum(cur_ng * w, axis=-1))
    # the receiving vertex's cosine applies only when IT is a surface
    # (convert_density; a medium receiver has ng=0 which would wrongly
    # zero the density)
    cos = jnp.where(stacked.vtype[:-1] == VT_SURFACE, cos, 1.0)
    # SURFACE/MEDIUM successors contribute a bsdf/phase reverse pdf;
    # escape slots carry garbage bs state (the s=0 MIS recomputes endpoint
    # revs itself)
    pdf_rev_fill = jnp.where(
        (nxt.vtype == VT_SURFACE) | (nxt.vtype == VT_MEDIUM),
        rev_dirs[1:] * cos / jnp.maximum(dist2, 1e-24), 0.0
    )
    pdf_rev = jnp.concatenate([pdf_rev_fill, jnp.zeros((1, R))], axis=0)
    stacked = stacked._replace(pdf_rev=pdf_rev)

    out = [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n_steps)]
    first_v = out[0] if out else None
    endpoint_rev = rev_dirs[0] if n_steps > 0 else jnp.zeros((R,))
    return out, (endpoint_rev, first_v), smp, n_rays


def camera_path(scene, p_film, smp, wl, max_depth, skind, spp):
    """Camera subpath: [camera vertex] + up to max_depth+1 surface vertices
    (escaped rays append a VT_LIGHT_INF endpoint)."""
    R = p_film.shape[0]
    rays = perspective.generate_rays(scene, p_film, jnp.zeros((R, 2)))
    cam_v = _empty_vertex(R)._replace(
        vtype=jnp.full((R,), VT_CAMERA, jnp.int32),
        p=rays.o,
        beta=jnp.ones((R, 4)),
        pdf_fwd=jnp.ones((R,)),
        med=jnp.broadcast_to(jnp.asarray(scene.camera_medium, jnp.int32), (R,)),
    )
    _, pdf_dir = perspective.pdf_we(scene, rays.o, rays.d)
    surf, (ep_rev, first_v), smp, n_rays = _walk(
        scene, rays.o, rays.d, jnp.ones((R, 4)), pdf_dir, wl, smp,
        skind, spp, max_depth + 1, True, medium0=scene.camera_medium,
    )
    if first_v is not None:
        w, dist2 = _dir_to(first_v.p, cam_v.p)
        cam_v = cam_v._replace(
            pdf_rev=jnp.where(_exists(first_v), ep_rev / jnp.maximum(dist2, 1e-24), 0.0)
        )
    return [cam_v] + surf, smp, n_rays


def light_path(scene, smp, wl, max_depth, skind, spp, env_ids=()):
    """Light subpath: [light vertex] + up to max_depth surface vertices
    (bdpt.cu:531-610 generate_light_subpath, EVERY light type via
    sample_le, with the infinite-area density corrections of :593-609)."""
    from pbrt_tpu.scene import builder as bd

    # O(1) alias-table pick shared with the path integrator and the s=1
    # strategy (PowerLightSampler, power_light_sampler.cu:7-63) — one
    # sampler, no CDF scans anywhere in the integrators
    from pbrt_tpu.integrators.path import _pick_light

    smp, u_pick = samplers.get_1d(smp, None, skind, spp)
    li, pmf = _pick_light(scene, u_pick)
    smp, u_pos = samplers.get_2d(smp, None, skind, spp)
    smp, u_dir = samplers.get_2d(smp, None, skind, spp)
    Le, p, ng, w, pdf_pos, pdf_dir, ok = lights.sample_le(scene, li, u_pos, u_dir, wl.lam)

    R = p.shape[0]
    lt = lights.take_rows(scene.lt_type, li)
    is_inf = (lt == bd.LIGHT_UNIFORM_INFINITE) | (lt == bd.LIGHT_IMAGE_INFINITE)
    # infinite starts: v0's spatial density is the summed escape-direction
    # density (bdpt.cu:603-609)
    pdf_fwd0 = jnp.where(
        is_inf,
        lights.infinite_light_density(scene, env_ids, -w),
        pmf * pdf_pos,
    )
    light_v = _empty_vertex(R)._replace(
        vtype=jnp.where(ok, VT_LIGHT, VT_NONE).astype(jnp.int32),
        p=p,
        ng=ng,
        ns=ng,
        beta=jnp.where(ok[..., None], Le / jnp.maximum(pmf * pdf_pos, 1e-20)[..., None], 0.0),
        pdf_fwd=jnp.where(ok, pdf_fwd0, 0.0),
        light=jnp.where(ok, li, -1),
    )
    beta0 = (
        Le
        * vm.absdot(ng, w)[..., None]
        / jnp.maximum(pmf * pdf_pos * pdf_dir, 1e-20)[..., None]
    )
    beta0 = jnp.where(ok[..., None], beta0, 0.0)
    o = offset_ray_origin(p, ng, w, scene.ray_offset_scale)
    # light rays start in the light's creation-state medium (reference
    # base/light.cu ctors carry the graphics-state medium; without this a
    # whole-world fog scene would never scatter light subpaths)
    med0 = lights.take_rows(scene.lt_medium, li)
    surf, (ep_rev, first_v), smp, n_rays = _walk(
        scene, o, w, beta0, jnp.where(ok, pdf_dir, 0.0), wl, smp,
        skind, spp, max_depth, False, medium0=med0,
    )
    if first_v is not None:
        w_b, dist2 = _dir_to(first_v.p, light_v.p)
        cos_l = vm.absdot(light_v.ng, w_b)
        light_v = light_v._replace(
            pdf_rev=jnp.where(
                _exists(first_v), ep_rev * cos_l / jnp.maximum(dist2, 1e-24), 0.0
            )
        )
        # infinite starts: v1's spatial density is planar, pdf_pos * |cos|
        # (bdpt.cu:595-601), not the distance-squared conversion
        pdf1_inf = pdf_pos * vm.absdot(w, first_v.ng)
        surf[0] = first_v._replace(
            pdf_fwd=jnp.where(
                is_inf & _exists(first_v), pdf1_inf, first_v.pdf_fwd
            )
        )
    return [light_v] + surf, smp, n_rays


# ---------------------------------------------------------------- MIS


def _mis_weight(scene, light_vs, cam_vs, s, t, wl, sampled_v=None, env_ids=()):
    """MIS weight for strategy (s,t) (bdpt.cu:288-380): recompute the
    junction pdf_revs functionally, then the ri pdf-ratio walks."""
    if s + t == 2:
        return jnp.ones(cam_vs[0].p.shape[:-1])

    # working copies of the endpoints with strategy-updated pdf_rev
    qs = sampled_v if (s == 1 and sampled_v is not None) else (light_vs[s - 1] if s > 0 else None)
    pt = sampled_v if (t == 1 and sampled_v is not None) else cam_vs[t - 1]
    qs_minus = light_vs[s - 2] if s > 1 else None
    pt_minus = cam_vs[t - 2] if t > 1 else None

    R = pt.p.shape[0]
    tru = jnp.ones((R,), bool)

    # pt.pdf_rev
    if s > 0:
        pt_rev = _vertex_pdf(scene, qs, qs_minus if qs_minus is not None else qs,
                             pt, wl, jnp.full((R,), qs_minus is not None))
        pt_rev = jnp.where(
            qs.vtype == VT_LIGHT, _vertex_pdf_light(scene, qs, pt), pt_rev
        )
    else:
        pt_rev = _vertex_pdf_light_origin(scene, pt, pt_minus, env_ids)
    pt = pt._replace(pdf_rev=pt_rev)

    # pt_minus.pdf_rev
    if pt_minus is not None:
        if s > 0:
            ptm_rev = _vertex_pdf(scene, pt, qs, pt_minus, wl, tru)
        else:
            ptm_rev = _vertex_pdf_light(scene, pt, pt_minus)
        pt_minus = pt_minus._replace(pdf_rev=ptm_rev)

    # qs.pdf_rev / qs_minus.pdf_rev
    if s > 0:
        qs = qs._replace(
            pdf_rev=_vertex_pdf(scene, pt, pt_minus if pt_minus is not None else pt,
                                qs, wl, jnp.full((R,), pt_minus is not None))
        )
        if qs_minus is not None:
            qs_minus = qs_minus._replace(
                pdf_rev=_vertex_pdf(scene, qs, pt, qs_minus, wl, tru)
            )

    # assemble effective vertex lists for the walks
    cam_eff = list(cam_vs[:t])
    cam_eff[t - 1] = pt
    if t > 1:
        cam_eff[t - 2] = pt_minus
    light_eff = list(light_vs[:s])
    if s > 0:
        light_eff[s - 1] = qs
    if s > 1:
        light_eff[s - 2] = qs_minus

    sum_ri = jnp.zeros((R,))
    # camera walk: i = t-1 .. 1
    ri = jnp.ones((R,))
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(cam_eff[i].pdf_rev) / _remap0(cam_eff[i].pdf_fwd)
        prev_delta = cam_eff[i - 1].delta if i - 1 > 0 else jnp.zeros((R,), bool)
        usable = ~cam_eff[i].delta & ~prev_delta & _exists(cam_eff[i])
        sum_ri = sum_ri + jnp.where(usable, ri, 0.0)
    # light walk: i = s-1 .. 0 (i == 0 checks the ENDPOINT's delta-light
    # flag: distant/spot starts admit no hypothetical hit — bdpt.cu:367-373)
    ri = jnp.ones((R,))
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(light_eff[i].pdf_rev) / _remap0(light_eff[i].pdf_fwd)
        prev_delta = (light_eff[i - 1].delta if i - 1 >= 0
                      else _is_delta_light_v(scene, light_eff[0]))
        usable = ~light_eff[i].delta & ~prev_delta & _exists(light_eff[i])
        sum_ri = sum_ri + jnp.where(usable, ri, 0.0)

    return 1.0 / (1.0 + sum_ri)


# ---------------------------------------------------------------- connect


def _conn_medium(a: V, w):
    """Medium on the w side of vertex a (interaction spawn_ray_to medium
    selection, mirroring path._medium_after)."""
    has_iface = a.med_in != a.med_out
    chosen = jnp.where(vm.dot(w, a.ng) > 0.0, a.med_out, a.med_in)
    return jnp.where(has_iface, chosen, a.med)


def _segment_throughput(scene, a: V, p_to, wl, mask=None):
    """Visibility OR transmittance of the segment a -> p_to: (R,4)
    (reference compute_G's base->compute_transmittance, bdpt.cu:285;
    integrator_base.cu:22-71). Without media this is the binary any-hit.
    `mask` lanes that cannot contribute trace a t_max=0 ray (one-iteration
    BVH exit; also keeps the honest ray count honest)."""
    w, dist2 = _dir_to(a.p, p_to)
    if int(scene.med_sigma_a.shape[0]) > 0:
        from pbrt_tpu.integrators.path import compute_transmittance

        return compute_transmittance(
            scene, a.p, a.ng, w, p_to, _conn_medium(a, w),
            scene.ray_offset_scale, wl.lam,
        )
    o_sh = offset_ray_origin(a.p, a.ng, w, scene.ray_offset_scale)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    t_sh = dist * (1.0 - 1e-3)
    if mask is not None:
        t_sh = jnp.where(mask, t_sh, 0.0)
    occ = dispatch.occluded(scene, o_sh, w, t_sh)
    return jnp.where(occ[..., None], 0.0, 1.0)


def _g_term(scene, a: V, b_v: V, wl, mask=None):
    """Geometry term with visibility/transmittance (bdpt.cu:271-286
    compute_G). Returns (R,4)."""
    w, dist2 = _dir_to(a.p, b_v.p)
    cos_a = vm.absdot(a.ns, w)
    cos_b = vm.absdot(b_v.ns, w)
    cos_a = jnp.where(a.vtype == VT_SURFACE, cos_a, 1.0)
    cos_b = jnp.where(b_v.vtype == VT_SURFACE, cos_b, 1.0)
    g = cos_a * cos_b / jnp.maximum(dist2, 1e-24)
    return g[..., None] * _segment_throughput(scene, a, b_v.p, wl, mask=mask)


def connect(scene, light_vs, cam_vs, s, t, wl, smp, skind, spp, env_ids=()):
    """One (s,t) strategy (bdpt.cu connect_bdpt:612-721).
    Returns (L (R,4), splat_raster (R,2) or None, smp, n_shadow_rays ())."""
    R = cam_vs[0].p.shape[0]
    zero = jnp.zeros((R, 4))
    raster = None

    if s == 0:
        # camera path alone: pt is an emitter surface OR an escaped
        # infinite-light vertex (bdpt.cu:629-637 + Vertex::Le:180-209)
        pt = cam_vs[t - 1]
        prev = cam_vs[t - 2]
        w_out, _ = _dir_to(pt.p, prev.p)
        Le = lights.area_light_le(scene, pt.light, pt.ng, w_out, wl.lam)
        if env_ids or int(scene.lt_type.shape[0]) > 0:
            Le_inf = lights.infinite_le(scene, env_ids, -w_out, wl.lam)
            Le = jnp.where((pt.vtype == VT_LIGHT_INF)[..., None], Le_inf, Le)
        L = pt.beta * Le
        ok = _exists(pt) & ((pt.light >= 0) | (pt.vtype == VT_LIGHT_INF))
        L = jnp.where(ok[..., None], L, 0.0)
        weight = _mis_weight(scene, light_vs, cam_vs, s, t, wl, env_ids=env_ids)
        return L * weight[..., None], None, smp, jnp.float32(0.0)

    if t == 1:
        # connect light subpath to a lens sample -> splat
        qs = light_vs[s - 1]
        smp, u_lens = samplers.get_2d(smp, None, skind, spp)
        wi, wv, pdf, p_raster, p_lens, cam_ok = perspective.sample_wi(scene, qs.p, u_lens)
        f_qs = _vertex_f(scene, qs, _empty_vertex(R)._replace(p=p_lens), wl)
        # the endpoint cosine applies only to surface vertices (medium
        # vertices have no normal; pbrt connect_bdpt t==1 is_on_surface)
        ns_cos = jnp.where(qs.vtype == VT_SURFACE, vm.absdot(qs.ns, wi), 1.0)
        L = qs.beta * f_qs * (wv / jnp.maximum(pdf, 1e-12))[..., None] * ns_cos[..., None]
        # visibility / transmittance along the lens segment (bdpt.cu:652)
        attempt = _is_connectible(qs) & cam_ok & jnp.any(f_qs > 0, -1)
        trans = _segment_throughput(scene, qs, p_lens, wl, mask=attempt)
        L = L * trans
        ok = attempt
        L = jnp.where(ok[..., None], L, 0.0)
        cam_sampled = _empty_vertex(R)._replace(
            vtype=jnp.full((R,), VT_CAMERA, jnp.int32),
            p=p_lens,
            beta=(wv / jnp.maximum(pdf, 1e-12))[..., None] * jnp.ones((R, 4)),
            pdf_fwd=jnp.ones((R,)),
        )
        weight = _mis_weight(scene, light_vs, cam_vs, s, t, wl,
                             sampled_v=cam_sampled, env_ids=env_ids)
        return (L * weight[..., None], p_raster, smp,
                jnp.sum(attempt.astype(jnp.float32)))

    if s == 1:
        # sample a light point from the camera vertex (NEE-like); the light
        # pick reuses the O(1) alias rows shared with the path integrator
        # (PowerLightSampler, power_light_sampler.cu:7-63)
        from pbrt_tpu.integrators.path import _pick_light

        pt = cam_vs[t - 1]
        smp, u_pick = samplers.get_1d(smp, None, skind, spp)
        li, pmf = _pick_light(scene, u_pick)
        smp, u2 = samplers.get_2d(smp, None, skind, spp)
        ls = lights.sample_li(scene, li, pt.p, pt.ns, u2, wl.lam, scene.scene_radius)
        f_pt = _vertex_f(scene, pt, _empty_vertex(R)._replace(p=ls.p_light), wl)
        # surface-only cosine (pbrt connect_bdpt s==1 is_on_surface)
        cos_pt = jnp.where(pt.vtype == VT_SURFACE, vm.absdot(pt.ns, ls.wi), 1.0)
        L = (
            pt.beta
            * f_pt
            * cos_pt[..., None]
            * ls.L
            / jnp.maximum(pmf * ls.pdf, 1e-20)[..., None]
        )
        # visibility / transmittance along the light segment (bdpt.cu:695);
        # dead lanes trace t_max=0 rays (mask) like the other branches
        attempt = _is_connectible(pt) & ls.valid & (ls.pdf > 0) & jnp.any(f_pt > 0, -1)
        trans = _segment_throughput(scene, pt, ls.p_light, wl, mask=attempt)
        L = L * trans
        ok = attempt
        L = jnp.where(ok[..., None], L, 0.0)
        light_sampled = _empty_vertex(R)._replace(
            vtype=jnp.full((R,), VT_LIGHT, jnp.int32),
            p=ls.p_light,
            ng=ls.n_light,
            ns=ls.n_light,
            beta=ls.L / jnp.maximum(pmf * ls.pdf, 1e-20)[..., None],
            light=li,
        )
        light_sampled = light_sampled._replace(
            pdf_fwd=_vertex_pdf_light_origin(scene, light_sampled, pt, env_ids),
        )
        weight = _mis_weight(scene, light_vs, cam_vs, s, t, wl,
                             sampled_v=light_sampled, env_ids=env_ids)
        return (L * weight[..., None], None, smp,
                jnp.sum(attempt.astype(jnp.float32)))

    # general s>1, t>1 connection
    qs = light_vs[s - 1]
    pt = cam_vs[t - 1]
    f_qs = _vertex_f(scene, qs, pt, wl)
    f_pt = _vertex_f(scene, pt, qs, wl)
    attempt = (_is_connectible(qs) & _is_connectible(pt)
               & jnp.any(f_qs > 0, -1) & jnp.any(f_pt > 0, -1))
    g = _g_term(scene, qs, pt, wl, mask=attempt)
    L = qs.beta * f_qs * f_pt * pt.beta * g
    L = jnp.where(attempt[..., None], L, 0.0)
    weight = _mis_weight(scene, light_vs, cam_vs, s, t, wl, env_ids=env_ids)
    return (L * weight[..., None], None, smp,
            jnp.sum(attempt.astype(jnp.float32)))


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "skind", "spp", "env_ids"))
def _jit_paths(scene, p_film, smp, wl, *, max_depth, skind, spp, env_ids=()):
    cam_vs, smp, n_c = camera_path(scene, p_film, smp, wl, max_depth, skind, spp)
    light_vs, smp, n_l = light_path(scene, smp, wl, max_depth, skind, spp, env_ids)
    return cam_vs, light_vs, smp


@functools.partial(jax.jit,
                   static_argnames=("s", "t", "skind", "spp", "env_ids"))
def _jit_connect(scene, light_vs, cam_vs, wl, smp, *, s, t, skind, spp,
                 env_ids=()):
    return connect(scene, light_vs, cam_vs, s, t, wl, smp, skind, spp, env_ids)


def li_bdpt_staged(scene, p_film, smp, wl, max_depth, skind, spp, res,
                   env_ids=()):
    """BDPT estimate with per-stage jits: one compiled artifact per (s,t)
    strategy instead of one monolithic graph (XLA:CPU's optimization passes
    go superlinear on the merged version). Arrays stay on device between
    stages."""
    cam_vs, light_vs, smp = _jit_paths(
        scene, p_film, smp, wl, max_depth=max_depth, skind=skind, spp=spp,
        env_ids=tuple(env_ids),
    )
    R = p_film.shape[0]
    L = jnp.zeros((R, 4))
    splats = []
    for t in range(1, len(cam_vs) + 1):
        for st in range(0, len(light_vs) + 1):
            depth = st + t - 2
            if (st == 1 and t == 1) or depth < 0 or depth > max_depth:
                continue
            if t == 1 and st < 2:
                continue
            Lst, raster, smp, _n = _jit_connect(
                scene, light_vs, cam_vs, wl, smp, s=st, t=t, skind=skind,
                spp=spp, env_ids=tuple(env_ids),
            )
            if t == 1:
                px = jnp.clip(raster[..., 0].astype(jnp.int32), 0, res[0] - 1)
                py = jnp.clip(raster[..., 1].astype(jnp.int32), 0, res[1] - 1)
                splats.append((py * res[0] + px, Lst))
            else:
                L = L + Lst
    return L, splats


def li_bdpt(scene, p_film, pixel_ids, smp, wl, max_depth, skind, spp, res,
            env_ids=()):
    """Full BDPT estimate for a batch of film positions.
    Returns (L (R,4), splats [(pix ids, L)], n_rays ()) — splats are
    returned per-strategy for the caller to scatter-add; n_rays is the
    honest traced-ray count (subpath segments + attempted connections)."""
    cam_vs, smp, n_cam = camera_path(scene, p_film, smp, wl, max_depth, skind, spp)
    light_vs, smp, n_light = light_path(scene, smp, wl, max_depth, skind, spp, env_ids)
    n_rays = n_cam + n_light

    R = p_film.shape[0]
    L = jnp.zeros((R, 4))
    splats = []
    n_cam = len(cam_vs)
    n_light = len(light_vs)
    for t in range(1, n_cam + 1):
        for s in range(0, n_light + 1):
            depth = s + t - 2
            if (s == 1 and t == 1) or depth < 0 or depth > max_depth:
                continue
            if t == 1 and s < 2:
                continue  # t=1,s<2 covered by other strategies
            Lst, raster, smp, n_c = connect(
                scene, light_vs, cam_vs, s, t, wl, smp, skind, spp, env_ids
            )
            n_rays = n_rays + n_c
            if t == 1:
                px = jnp.clip(raster[..., 0].astype(jnp.int32), 0, res[0] - 1)
                py = jnp.clip(raster[..., 1].astype(jnp.int32), 0, res[1] - 1)
                splats.append((py * res[0] + px, Lst))
            else:
                L = L + Lst
    return L, splats, n_rays
