"""Spectral path tracer with NEE + MIS + russian roulette.

TPU-native re-expression of the reference radiance core
(integrators/megakernel_path.cu:13-264 evaluate_Li_volume + sample_Ld):
the per-thread while-loop becomes a masked dense `lax.fori_loop` over
bounces; every lane carries full path state (SoA pytree) and inactive lanes
ride along as no-ops. The wavefront integrator reuses `bounce_step` with
compaction between stages.

Semantics (cross-checked against the reference, for parity):
  - RR from depth 8, survive = min(beta.max, 0.95), counter increments per
    check (util/russian_roulette.h:5-29)
  - NEE skipped for specular-flag BSDFs; MIS power heuristic both ways
  - area-light MIS pdf = light-sampler pmf * triangle pdf_li(ctx, wi)
  - emission: depth==0 or specular bounce -> unweighted
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY, power_heuristic
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.utils.gather import take_rows
from pbrt_tpu.geometry.ray import offset_ray_origin
from pbrt_tpu.accel import dispatch
from pbrt_tpu.materials import materials, bxdfs, scattering as sc
from pbrt_tpu.lights import lights
from pbrt_tpu.sampling import samplers
from pbrt_tpu.spectral import sampled
from pbrt_tpu.scene import builder as bd

RR_START_DEPTH = 8.0
RR_CLAMP = 0.95


INTERFACE_BOUNCE_COST = 0.3  # base/integrator_base.h:20


class PathState(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    L: jnp.ndarray          # (R,4)
    beta: jnp.ndarray       # (R,4)
    lam: jnp.ndarray        # (R,4)
    lam_pdf: jnp.ndarray    # (R,4)
    smp: samplers.Sampler
    active: jnp.ndarray     # (R,)
    specular: jnp.ndarray   # (R,)
    depth: jnp.ndarray      # (R,) float (interface bounces cost 0.3)
    rr_next: jnp.ndarray    # (R,) next RR depth
    prev_pdf: jnp.ndarray   # (R,)
    prev_p: jnp.ndarray     # (R,3)
    prev_ns: jnp.ndarray    # (R,3)
    medium: jnp.ndarray     # (R,) i32 current medium (-1 vacuum)
    trans_pdf: jnp.ndarray  # (R,4) accumulated transmittance pdf since last
                            # real scatter (megakernel_path.cu multi_transmittance_pdf)
    n_closest: jnp.ndarray  # () f32 closest-hit rays actually traced (stats)
    n_shadow: jnp.ndarray   # () f32 shadow rays actually traced (stats)


def _pick_light(scene, u):
    """Sample a light index proportional to lt_pmf in O(1) via the packed
    alias table (PowerLightSampler, power_light_sampler.cu:7-63 +
    alias_table.cu sample): two row gathers per lane instead of a CDF scan.
    Returns (idx, pmf)."""
    rows = scene.lt_alias_rows                       # (L,3) [q, alias, pmf]
    n = rows.shape[0]
    x = u * n
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
    frac = x - i.astype(jnp.float32)
    row = take_rows(rows, i)
    accept = frac < row[:, 0]
    idx = jnp.where(accept, i, row[:, 1].astype(jnp.int32))
    pmf = jnp.where(accept, row[:, 2], take_rows(rows, idx)[:, 2])
    return idx, pmf


def _sigma_t(scene, medium, lam):
    """sigma_a + sigma_s at λ for medium rows (R,) (-1 -> 0)."""
    from pbrt_tpu.spectral import spectra

    m = jnp.maximum(medium, 0)
    sig = spectra.sample_table(scene.med_sigma_a, m, lam) + spectra.sample_table(
        scene.med_sigma_s, m, lam
    )
    return jnp.where((medium >= 0)[..., None], sig, 0.0)


def _medium_after(hit: dispatch.SceneHit, d, current):
    """Medium on the far side of a hit when continuing along d (reference
    interaction spawn_ray medium selection: dot(d, ng) > 0 -> exterior)."""
    has_iface = hit.med_in != hit.med_out
    chosen = jnp.where(vm.dot(d, hit.ng) > 0.0, hit.med_out, hit.med_in)
    return jnp.where(hit.valid & has_iface, chosen, current)


def compute_transmittance(scene, p0, ng0, wi, p1, medium0, eps_scale, lam, max_hops=8):
    """Transmittance along the segment p0 -> p1 walking through material-less
    interfaces and homogeneous media (integrator_base.cu:22-71). Returns
    (R,4); 0 where a real (material) surface blocks. max_hops bounds the
    interface crossings (reference MAX_VOLUME_BOUNCES fail-safe).
    """
    o = offset_ray_origin(p0, ng0, wi, eps_scale)
    trans = jnp.ones(lam.shape)
    done = jnp.zeros(o.shape[:1], bool)
    medium = medium0

    def body(i, carry):
        o, medium, trans, done = carry
        dist = vm.distance(o, p1)
        hit = dispatch.intersect(scene, o, wi, dist * (1.0 - 1e-3))
        seg = jnp.where(hit.valid, hit.t, dist)
        sig_t = _sigma_t(scene, medium, lam)
        att = jnp.exp(-sig_t * jnp.minimum(seg, 1e20)[..., None])
        trans = jnp.where(done[..., None], trans, trans * att)
        blocked = hit.valid & (hit.mat >= 0)
        trans = jnp.where((blocked & ~done)[..., None], 0.0, trans)
        new_done = done | ~hit.valid | blocked
        step = hit.valid & (hit.mat < 0) & ~done
        o2 = offset_ray_origin(hit.p, hit.ng, wi, eps_scale)
        o = jnp.where(step[..., None], o2, o)
        medium = jnp.where(step, _medium_after(hit, wi, medium), medium)
        return (o, medium, trans, new_done)

    o, medium, trans, done = jax.lax.fori_loop(0, max_hops, body, (o, medium, trans, done))
    return trans


def sample_ld(scene, hit: dispatch.SceneHit, bsdf, u_light, u2, eps_scale,
              medium=None, in_medium=None, u_phase=None, volumetric=False,
              mask=None):
    """Direct lighting with MIS (reference sample_Ld_volume,
    megakernel_path.cu:186-264). Surface lanes evaluate the BSDF; medium
    lanes (in_medium mask) use the HG phase function exactly like the
    reference: rho/pdf come from a *fresh* phase-function sample (u_phase),
    not from evaluating at the light direction — reproducing
    megakernel_path.cu:248-263 behavior. Returns (R,4) contribution (no beta).
    """
    light_idx, pmf = _pick_light(scene, u_light)
    ls = lights.sample_li(
        scene, light_idx, hit.p, hit.ns, u2, bsdf.wl.lam, scene.scene_radius
    )
    f = materials.bsdf_f(bsdf.bsdf, hit.wo, ls.wi) * vm.absdot(ls.wi, hit.ns)[..., None]
    pdf_bsdf = materials.bsdf_pdf(bsdf.bsdf, hit.wo, ls.wi)

    if in_medium is not None and int(scene.med_sigma_a.shape[0]) > 0:
        from pbrt_tpu.sampling import warps

        g = scene.med_g[jnp.maximum(medium, 0)]
        wi_ph, pdf_ph = warps.sample_henyey_greenstein(hit.wo, g, u_phase)
        rho = pdf_ph  # HG: rho == pdf (media_util.h:29-30)
        f = jnp.where(in_medium[..., None], rho[..., None] * jnp.ones_like(f), f)
        pdf_bsdf = jnp.where(in_medium, pdf_ph, pdf_bsdf)
    f_pos = jnp.any(f > 0.0, axis=-1)

    pdf_light = pmf * ls.pdf
    if volumetric:
        # shadow ray's starting medium: unchanged for in-medium lanes, the
        # wi-side medium for surface lanes (interaction spawn_ray_to)
        med_sh = _medium_after(hit, ls.wi, medium)
        if in_medium is not None:
            med_sh = jnp.where(in_medium, medium, med_sh)
        trans = compute_transmittance(
            scene, hit.p, hit.ng, ls.wi, ls.p_light, med_sh, eps_scale, bsdf.wl.lam
        )
        visible = jnp.any(trans > 0.0, axis=-1)
        contrib = f * ls.L * trans / jnp.maximum(pdf_light, 1e-20)[..., None]
        pdf_dir = pdf_bsdf * jnp.mean(trans, axis=-1)
    else:
        o_sh = offset_ray_origin(hit.p, hit.ng, ls.wi, eps_scale)
        dist = vm.distance(o_sh, ls.p_light)
        # lanes not running NEE this bounce get t_max = 0: the shadow-ray
        # BVH walk fails the root slab immediately (worst-LIVE-lane gating)
        t_sh = dist * (1.0 - 1e-3)
        if mask is not None:
            t_sh = jnp.where(mask, t_sh, 0.0)
        visible = ~dispatch.occluded(scene, o_sh, ls.wi, t_sh)
        contrib = f * ls.L / jnp.maximum(pdf_light, 1e-20)[..., None]
        pdf_dir = pdf_bsdf
    w = jnp.where(
        ls.is_delta, 1.0, power_heuristic(1.0, pdf_light, 1.0, pdf_dir)
    )
    ok = ls.valid & f_pos & visible & (pdf_light > 0.0)
    return jnp.where(ok[..., None], w[..., None] * contrib, 0.0)


class BsdfCtx(NamedTuple):
    bsdf: materials.Bsdf
    wl: sampled.Wavelengths


def bounce_step(scene, state: PathState, regularize=False, skind="independent", spp=0,
                env_ids=(), volumetric=False, max_depth=None,
                footprints=False):
    """One bounce for all lanes. Returns the updated PathState.

    volumetric=True enables the homogeneous-media / material-less-interface
    code paths of evaluate_Li_volume (megakernel_path.cu:13-176): exponential
    distance sampling vs t_hit, HG scattering, interface pass-through at 0.3
    depth cost, and transmittance-weighted MIS pdfs.
    """
    r = state.smp
    active = state.active
    if max_depth is not None:
        # the loop may run extra iterations for fractional interface bounces;
        # the reference's `while depth < max_depth` guard lives here
        active = active & (state.depth < max_depth)

    # --- russian roulette (before intersection, reference loop head)
    rr_due = active & (state.depth >= state.rr_next)
    r, u_rr = samplers.get_1d(r, rr_due, skind, spp)
    survive = jnp.minimum(jnp.max(state.beta, axis=-1), RR_CLAMP)
    killed = rr_due & (u_rr > survive)
    beta = jnp.where(
        (rr_due & ~killed)[..., None], state.beta / jnp.maximum(survive, 1e-9)[..., None], state.beta
    )
    active = active & ~killed
    rr_next = jnp.where(rr_due, state.rr_next + 1.0, state.rr_next)

    # --- intersect (honest ray accounting: only live lanes trace).
    # Dead lanes get t_max = 0 so BVH traversal fails the root slab and
    # finishes in ONE iteration instead of re-walking the tree — the
    # masked-dense loop is gated by the worst LIVE lane only.
    n_closest = state.n_closest + jnp.sum(active.astype(jnp.float32))
    t_max = jnp.where(active, INFINITY, 0.0)
    hit = dispatch.intersect(scene, state.o, state.d, t_max)
    t_hit = jnp.where(hit.valid, hit.t, INFINITY)

    wl = sampled.Wavelengths(lam=state.lam, pdf=state.lam_pdf)
    L = state.L
    medium = state.medium
    trans_pdf = state.trans_pdf

    # --- medium: exponential distance sample vs t_hit
    has_media = volumetric and int(scene.med_sigma_a.shape[0]) > 0
    med_scatter = jnp.zeros_like(active)
    p_scat = state.o
    if has_media:
        from pbrt_tpu.spectral import spectra as _spectra

        in_medium = active & (medium >= 0)
        m_c = jnp.maximum(medium, 0)
        sig_a = _spectra.sample_table(scene.med_sigma_a, m_c, wl.lam)
        sig_s = _spectra.sample_table(scene.med_sigma_s, m_c, wl.lam)
        sig_t = sig_a + sig_s
        sig_t_avg = jnp.mean(sig_t, axis=-1)
        r, u_dist = samplers.get_1d(r, in_medium, skind, spp)
        t_samp = -jnp.log1p(-jnp.clip(u_dist, 0.0, 1.0 - 1e-7)) / jnp.maximum(
            sig_t_avg, 1e-12
        )
        med_scatter = in_medium & (t_samp < t_hit)
        pass_thru = in_medium & ~med_scatter
        att = jnp.exp(-sig_t * jnp.minimum(t_hit, 1e20)[..., None])
        trans_pdf = jnp.where(pass_thru[..., None], trans_pdf * att, trans_pdf)
        p_scat = state.o + t_samp[..., None] * state.d
        beta = jnp.where(
            med_scatter[..., None],
            beta * sig_s / jnp.maximum(sig_t, 1e-12),
            beta,
        )

    # direction pdf carrying accumulated transmittance
    # (megakernel_path.cu: dir_pdf = prev_pdf * multi_transmittance_pdf.average())
    dir_pdf_prev = state.prev_pdf * jnp.mean(trans_pdf, axis=-1)

    # --- escaped rays: infinite lights
    escaped = active & ~hit.valid & ~med_scatter
    if scene.lt_type.shape[0] > 0:
        is_uinf = scene.lt_type == bd.LIGHT_UNIFORM_INFINITE
        # all uniform-infinite lights contribute their emission
        em_all = scene.lt_emission * scene.lt_scale[:, None]  # (L, 471)
        uinf_dense = jnp.sum(jnp.where(is_uinf[:, None], em_all, 0.0), axis=0)
        from pbrt_tpu.spectral import spectra

        Le_inf = spectra.sample_dense(uinf_dense, wl.lam)
        n_uinf = jnp.sum(is_uinf)
        pmf_uinf = jnp.sum(jnp.where(is_uinf, scene.lt_pmf, 0.0))
        pdf_light_inf = pmf_uinf * lights.uniform_infinite_pdf_li()
        w_inf = jnp.where(
            (state.depth == 0.0) | state.specular,
            1.0,
            power_heuristic(1.0, dir_pdf_prev, 1.0, pdf_light_inf),
        )
        L = jnp.where(
            (escaped & (n_uinf > 0))[..., None], L + beta * w_inf[..., None] * Le_inf, L
        )
    # image-infinite lights (static id list; reference wavefront_path.cu
    # escaped-ray loop over infinite_lights with per-light MIS)
    for env_id in env_ids:
        li_arr = jnp.full(state.o.shape[:1], env_id, jnp.int32)
        Le_env = lights.env_le(scene, li_arr, state.d, wl.lam)
        pdf_env = scene.lt_pmf[env_id] * lights.env_pdf_li(scene, li_arr, state.d)
        w_env = jnp.where(
            (state.depth == 0.0) | state.specular,
            1.0,
            power_heuristic(1.0, dir_pdf_prev, 1.0, pdf_env),
        )
        L = jnp.where(escaped[..., None], L + beta * w_env[..., None] * Le_env, L)
    active = active & (hit.valid | med_scatter)

    # --- emissive surface hit (MIS)
    hit_light = active & ~med_scatter & (hit.light >= 0)
    Le = lights.area_light_le(scene, hit.light, hit.ng, hit.wo, wl.lam)
    pdf_li = lights.area_light_pdf_li(
        scene, hit.light, state.prev_p, state.prev_ns, state.d, hit.p, hit.ng
    )
    pmf_l = take_rows(scene.lt_pmf, jnp.maximum(hit.light, 0))
    w_area = jnp.where(
        (state.depth == 0.0) | state.specular,
        1.0,
        power_heuristic(1.0, dir_pdf_prev, 1.0, pmf_l * pdf_li),
    )
    L = jnp.where(hit_light[..., None], L + beta * w_area[..., None] * Le, L)

    # --- material: interface (mat == -1) passes through costing 0.3 depth
    is_interface = active & ~med_scatter & hit.valid & (hit.mat < 0)

    shade = active & ~med_scatter & (hit.mat >= 0)

    mat_resolved = materials.resolve_mix(scene, hit.mat, hit.p, hit.wo)
    duv4 = None
    if footprints and int(scene.tex.type.shape[0]) > 0:
        # camera-approximated differentials at the hit, threaded into
        # image-texture lookups (reference interaction.cu:9-39
        # compute_differentials + TextureEvalContext duv/dxy; static flag
        # so plain renders compile none of this)
        from pbrt_tpu.cameras import differentials as dif

        deltas = tuple(scene.cam_ray_deltas[i] for i in range(4))
        dpdx, dpdy = dif.approximate_dp_dxy(
            hit.p, hit.ns, state.o, state.d, deltas, max(spp, 1))
        duv4 = jnp.stack(
            dif.duv_dxy(dpdx, dpdy, hit.dpdu, hit.dpdv), axis=-1)
    bsdf, wl2 = materials.make_bsdf(scene, mat_resolved, hit.ns, wl, hit.uv,
                                    hit.p, duv=duv4)
    if regularize:
        ax, ay = sc.tr_regularize(bsdf.params.ax, bsdf.params.ay)
        bsdf = bsdf._replace(params=bsdf.params._replace(ax=ax, ay=ay))
    wl = sampled.Wavelengths(
        lam=wl.lam, pdf=jnp.where(shade[..., None], wl2.pdf, wl.pdf)
    )

    # --- NEE (skip for specular-only lobes)
    spec_only = (
        ((bsdf.params.kind == bxdfs.K_CONDUCTOR) | (bsdf.params.kind == bxdfs.K_DIELECTRIC))
        & sc.effectively_smooth(bsdf.params.ax, bsdf.params.ay)
    )
    nee = shade & ~spec_only & (scene.lt_pmf.shape[0] > 0)
    nee_any = nee | med_scatter
    # draws masked by `nee_any`: the reference only consumes these dimensions
    # when sample_Ld runs (non-specular bsdf or medium scatter)
    r, u_l = samplers.get_1d(r, nee_any, skind, spp)
    r, u_l2 = samplers.get_2d(r, nee_any, skind, spp)
    u_phase = None
    if has_media:
        # sample_Ld_volume's internal phase sample (megakernel_path.cu:248-249)
        r, u_phase = samplers.get_2d(r, med_scatter, skind, spp)
    if scene.lt_pmf.shape[0] > 0:
        zero3 = jnp.zeros_like(hit.ng)
        hit_nee = hit._replace(
            p=jnp.where(med_scatter[..., None], p_scat, hit.p),
            ns=jnp.where(med_scatter[..., None], zero3, hit.ns),
            ng=jnp.where(med_scatter[..., None], zero3, hit.ng),
        )
        ld = sample_ld(
            scene,
            hit_nee,
            BsdfCtx(bsdf=bsdf, wl=wl),
            u_l,
            u_l2,
            scene.ray_offset_scale,
            medium=medium if volumetric else None,
            in_medium=med_scatter if has_media else None,
            u_phase=u_phase,
            volumetric=volumetric,
            mask=nee_any,
        )
        L = jnp.where(nee_any[..., None], L + beta * ld, L)
        n_shadow = state.n_shadow + jnp.sum(nee_any.astype(jnp.float32))
    else:
        n_shadow = state.n_shadow

    # --- medium continuation: HG phase resample (megakernel_path.cu:63-80)
    if has_media:
        from pbrt_tpu.sampling import warps as _warps

        r, u_ph2 = samplers.get_2d(r, med_scatter, skind, spp)
        g_m = scene.med_g[jnp.maximum(medium, 0)]
        wi_med, pdf_med = _warps.sample_henyey_greenstein(-state.d, g_m, u_ph2)
    else:
        wi_med = state.d
        pdf_med = jnp.ones(state.o.shape[:1])

    # --- BSDF sampling
    r, uc = samplers.get_1d(r, shade, skind, spp)
    r, u2 = samplers.get_2d(r, shade, skind, spp)
    bs = materials.bsdf_sample(bsdf, hit.wo, uc, u2)
    # coated lanes: MIS pdf is re-estimated, not the proportional walk pdf
    # (megakernel_path.cu:162; see materials.mis_direction_pdf)
    pdf_mis = materials.mis_direction_pdf(bsdf, hit.wo, bs)
    cos_term = vm.absdot(bs.wi, hit.ns)
    beta_new = beta * bs.f * (cos_term / jnp.maximum(bs.pdf, 1e-20))[..., None]

    cont_surface = shade & bs.valid & jnp.any(beta_new > 0.0, axis=-1)
    continues = cont_surface | med_scatter | is_interface
    o_surface = offset_ray_origin(hit.p, hit.ng, bs.wi, scene.ray_offset_scale)
    o_iface = offset_ray_origin(hit.p, hit.ng, state.d, scene.ray_offset_scale)
    new_o = jnp.where(
        med_scatter[..., None],
        p_scat,
        jnp.where(is_interface[..., None], o_iface, o_surface),
    )
    new_d = jnp.where(
        med_scatter[..., None],
        wi_med,
        jnp.where(is_interface[..., None], state.d, bs.wi),
    )
    if volumetric:
        med_after_surface = _medium_after(hit, bs.wi, medium)
        med_after_iface = _medium_after(hit, state.d, medium)
        medium = jnp.where(
            cont_surface,
            med_after_surface,
            jnp.where(is_interface, med_after_iface, medium),
        )
    real_scatter = cont_surface | med_scatter
    depth_cost = jnp.where(
        shade | med_scatter,
        1.0,
        jnp.where(is_interface, INTERFACE_BOUNCE_COST, 0.0),
    )

    state2 = state._replace(
        o=jnp.where(continues[..., None], new_o, state.o),
        d=jnp.where(continues[..., None], new_d, state.d),
        L=L,
        beta=jnp.where(cont_surface[..., None], beta_new, beta),
        lam=wl.lam,
        lam_pdf=wl.pdf,
        active=continues,
        specular=jnp.where(
            cont_surface,
            bxdfs.is_specular(bs.flags),
            jnp.where(med_scatter, False, state.specular),
        ),
        depth=state.depth + depth_cost,
        rr_next=rr_next,
        prev_pdf=jnp.where(
            cont_surface, pdf_mis, jnp.where(med_scatter, pdf_med, state.prev_pdf)
        ),
        prev_p=jnp.where(
            shade[..., None],
            hit.p,
            jnp.where(med_scatter[..., None], p_scat, state.prev_p),
        ),
        prev_ns=jnp.where(
            shade[..., None],
            hit.ns,
            jnp.where(med_scatter[..., None], jnp.zeros_like(hit.ns), state.prev_ns),
        ),
        medium=medium,
        trans_pdf=jnp.where(real_scatter[..., None], 1.0, trans_pdf),
        n_closest=n_closest,
        n_shadow=n_shadow,
    )
    return state2._replace(smp=r)


def li(scene, rays, wl: sampled.Wavelengths, r, max_depth, regularize=False,
       skind="independent", spp=0, env_ids=(), volumetric=False, camera_medium=None,
       return_stats=False, footprints=False):
    """Radiance for a batch of camera rays. Returns (L (R,4), wl), plus a
    {"closest", "shadow"} actually-traced ray-count dict if return_stats."""
    R = rays.o.shape[0]
    medium0 = (
        jnp.broadcast_to(jnp.asarray(camera_medium, jnp.int32), (R,))
        if camera_medium is not None
        else jnp.full((R,), -1, jnp.int32)
    )
    state = PathState(
        o=rays.o,
        d=rays.d,
        L=jnp.zeros((R, 4)),
        beta=jnp.ones((R, 4)),
        lam=wl.lam,
        lam_pdf=wl.pdf,
        smp=r,
        active=jnp.ones((R,), bool),
        specular=jnp.zeros((R,), bool),
        depth=jnp.zeros((R,)),
        rr_next=jnp.full((R,), RR_START_DEPTH),
        prev_pdf=jnp.ones((R,)),
        prev_p=rays.o,
        prev_ns=jnp.zeros((R, 3)),
        medium=medium0,
        trans_pdf=jnp.ones((R, 4)),
        n_closest=jnp.float32(0.0),
        n_shadow=jnp.float32(0.0),
    )

    def body(i, s):
        return bounce_step(scene, s, regularize, skind, spp, env_ids,
                           volumetric, max_depth, footprints)

    # reference loops while depth < max_depth; depth += 1 per real bounce,
    # 0.3 per material-less interface crossing — volumetric scenes need
    # extra iterations for the fractional bounces (bounded by the explicit
    # depth guard in bounce_step)
    n_iters = max_depth if not volumetric else max_depth * 2 + 4
    state = jax.lax.fori_loop(0, n_iters, body, state)
    final_wl = sampled.Wavelengths(lam=state.lam, pdf=state.lam_pdf)
    if return_stats:
        return state.L, final_wl, {"closest": state.n_closest, "shadow": state.n_shadow}
    return state.L, final_wl
