"""Material evaluation: material table rows + hit context -> BxdfParams.

Counterpart of reference materials/*.cu get_bxdf() (texture eval -> concrete
BxDF): here a gather from the SceneArrays material table plus spectral
sampling, fully vectorized over lanes.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.utils.gather import take_rows
from pbrt_tpu.materials import bxdfs, scattering as sc
from pbrt_tpu.spectral import spectra, sampled
from pbrt_tpu.scene import builder as bd


class Bsdf(NamedTuple):
    """Shading frame + per-lane bxdf parameters (+ layered-coat params when
    the scene contains coated materials; None otherwise — a static pytree
    distinction, so plain scenes compile none of the layered code)."""

    params: bxdfs.BxdfParams
    fx: jnp.ndarray  # frame axes (R,3)
    fy: jnp.ndarray
    fz: jnp.ndarray
    lay: object = None  # layered.LayeredParams or None


def resolve_mix(scene, mat_idx, p, wo):
    """Stochastically resolve mix materials to a concrete material
    (reference base/interaction.cu:49-52: u = hash_float(pi, wo);
    mix_material.cu:18-21: u < amount ? m1 : m2)."""
    if int(scene.mix_marker.shape[0]) == 0:
        return mat_idx
    import jax

    from pbrt_tpu.sampling import rng as prng

    m = jnp.maximum(mat_idx, 0)
    is_mix = scene.mat_type[m] == bd.MAT_MIX
    bits = [jax.lax.bitcast_convert_type(p[..., i], jnp.uint32) for i in range(3)]
    bits += [jax.lax.bitcast_convert_type(wo[..., i], jnp.uint32) for i in range(3)]
    h = prng.murmur64a_u32_words(bits)
    u = h.lo.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    chosen = jnp.where(u < scene.mat_mix_amount[m], scene.mat_mix_m1[m], scene.mat_mix_m2[m])
    return jnp.where(is_mix & (mat_idx >= 0), chosen, mat_idx)


def make_bsdf(scene, mat_idx, ns, wl: sampled.Wavelengths, uv=None, p=None,
              duv=None):
    """Gather material mat_idx (R,) and build lane BxdfParams + shading frame
    around ns. Returns (Bsdf, new_wavelengths) — dielectric dispersion may
    terminate secondary wavelengths (reference dielectric_material.cu:40-47).

    uv (R,2): surface parameterization for texture-slot evaluation
    (reference materials eval textures via TextureEvalContext); duv (R,4)
    optional screen-space uv footprints (TextureEvalContext dudx..dvdy,
    texture_eval_context.h:10-44) for footprint-aware image lookups.
    """
    mat_idx_c = jnp.maximum(mat_idx, 0)
    mtype = take_rows(scene.mat_type, mat_idx_c)
    refl_c = take_rows(scene.mat_refl_c, mat_idx_c)       # (R,3)
    trans_c = take_rows(scene.mat_trans_c, mat_idx_c)
    urough = take_rows(scene.mat_urough, mat_idx_c)
    vrough = take_rows(scene.mat_vrough, mat_idx_c)
    remap = take_rows(scene.mat_remap, mat_idx_c)
    eta_f = take_rows(scene.mat_eta, mat_idx_c)
    eta_spec = take_rows(scene.mat_eta_spec, mat_idx_c)
    k_spec = take_rows(scene.mat_k_spec, mat_idx_c)
    refl_mode = take_rows(scene.mat_refl_mode, mat_idx_c)

    # floor alpha at 1e-4: below the effectively_smooth threshold (1e-3) so
    # the specular branch still wins, but the unselected rough-lobe formulas
    # stay finite — otherwise their NaNs leak into d(loss)/d(roughness)
    # through jnp.where's 0*NaN cotangents.
    refl = jnp.clip(spectra.sigmoid_polynomial(refl_c, wl.lam), 0.0, 1.0)
    trans = jnp.clip(spectra.sigmoid_polynomial(trans_c, wl.lam), 0.0, 1.0)

    # texture-slot overrides (node -1 keeps the constant columns)
    if uv is not None and scene.tex.type.shape[0] > 0:
        from pbrt_tpu.textures import textures as texlib

        rt = take_rows(scene.mat_refl_tex, mat_idx_c)
        tt = take_rows(scene.mat_trans_tex, mat_idx_c)
        ut = take_rows(scene.mat_urough_tex, mat_idx_c)
        vt = take_rows(scene.mat_vrough_tex, mat_idx_c)
        refl_t = jnp.clip(texlib.eval_spectrum(scene.tex, rt, uv, ns, wl.lam, p, duv=duv), 0.0, 1.0)
        trans_t = jnp.clip(texlib.eval_spectrum(scene.tex, tt, uv, ns, wl.lam, p, duv=duv), 0.0, 1.0)
        refl = jnp.where((rt >= 0)[..., None], refl_t, refl)
        trans = jnp.where((tt >= 0)[..., None], trans_t, trans)
        urough = jnp.where(ut >= 0, texlib.eval_float(scene.tex, ut, uv, p=p, duv=duv), urough)
        vrough = jnp.where(vt >= 0, texlib.eval_float(scene.tex, vt, uv, p=p, duv=duv), vrough)

    ax = jnp.maximum(jnp.where(remap, sc.roughness_to_alpha(urough), urough), 1e-4)
    ay = jnp.maximum(jnp.where(remap, sc.roughness_to_alpha(vrough), vrough), 1e-4)

    # conductor spectral IOR
    eta_rows = spectra.sample_table(scene.spec_table, jnp.maximum(eta_spec, 0), wl.lam)
    k_rows = spectra.sample_table(scene.spec_table, jnp.maximum(k_spec, 0), wl.lam)
    # reflectance mode: eta=1, k = 2 sqrt(r)/sqrt(1-r) (conductor_material.cu:73-78)
    r_clamped = jnp.clip(refl, 0.0, 0.9999)
    k_from_r = 2.0 * jnp.sqrt(jnp.maximum(r_clamped, 1e-12)) / jnp.sqrt(jnp.clip(1.0 - r_clamped, 1e-7, 1.0))
    eta_re = jnp.where(refl_mode[..., None], jnp.ones_like(eta_rows), eta_rows)
    eta_im = jnp.where(refl_mode[..., None], k_from_r, k_rows)

    # dielectric eta: float mode or spectral (hero wavelength + dispersion);
    # the hero-λ value is eta_rows' first channel — no extra table pass
    eta_hero = eta_rows[..., 0]
    has_eta_spec = eta_spec >= 0
    eta_d = jnp.where(has_eta_spec, eta_hero, eta_f)
    eta_d = jnp.where(eta_d == 0.0, 1.0, eta_d)

    # dispersion terminates secondary wavelengths for spectral-eta dielectrics
    is_dispersive = (mtype == bd.MAT_DIELECTRIC) & has_eta_spec
    wl_term = sampled.terminate_secondary(wl)
    new_pdf = jnp.where(is_dispersive[..., None], wl_term.pdf, wl.pdf)
    new_wl = sampled.Wavelengths(lam=wl.lam, pdf=new_pdf)

    kind = jnp.where(
        mtype == bd.MAT_DIFFUSE,
        bxdfs.K_DIFFUSE,
        jnp.where(
            mtype == bd.MAT_CONDUCTOR,
            bxdfs.K_CONDUCTOR,
            jnp.where(
                mtype == bd.MAT_DIELECTRIC,
                bxdfs.K_DIELECTRIC,
                jnp.where(
                    mtype == bd.MAT_COATED_DIFFUSE,
                    bxdfs.K_COATED_DIFFUSE,
                    jnp.where(
                        mtype == bd.MAT_COATED_CONDUCTOR,
                        bxdfs.K_COATED_CONDUCTOR,
                        bxdfs.K_DIFF_TRANS,
                    ),
                ),
            ),
        ),
    ).astype(jnp.int32)

    params = bxdfs.BxdfParams(
        kind=kind,
        refl=refl,
        trans=trans,
        eta_re=eta_re,
        eta_im=eta_im,
        eta=eta_d,
        ax=ax,
        ay=ay,
    )

    lay = None
    if int(scene.lay_marker.shape[0]) > 0:
        from pbrt_tpu.materials import layered

        # top interface: smooth/rough dielectric with the coat's eta +
        # interface roughness (the material's u/v roughness columns)
        top = bxdfs.BxdfParams(
            kind=jnp.full_like(kind, bxdfs.K_DIELECTRIC),
            refl=refl,
            trans=trans,
            eta_re=eta_re,
            eta_im=eta_im,
            eta=take_rows(scene.mat_ieta, mat_idx_c),
            ax=ax,
            ay=ay,
        )
        # bottom: diffuse (reflectance) or conductor (eta/k + crough)
        is_cc = mtype == bd.MAT_COATED_CONDUCTOR
        cax = jnp.maximum(
            jnp.where(remap, sc.roughness_to_alpha(take_rows(scene.mat_crough_u, mat_idx_c)),
                      take_rows(scene.mat_crough_u, mat_idx_c)), 1e-4)
        cay = jnp.maximum(
            jnp.where(remap, sc.roughness_to_alpha(take_rows(scene.mat_crough_v, mat_idx_c)),
                      take_rows(scene.mat_crough_v, mat_idx_c)), 1e-4)
        bottom = bxdfs.BxdfParams(
            kind=jnp.where(is_cc, bxdfs.K_CONDUCTOR, bxdfs.K_DIFFUSE).astype(jnp.int32),
            refl=refl,
            trans=trans,
            eta_re=eta_rows,
            eta_im=k_rows,
            eta=eta_d,
            ax=cax,
            ay=cay,
        )
        albedo = jnp.clip(
            spectra.sigmoid_polynomial(take_rows(scene.mat_albedo_c, mat_idx_c), wl.lam), 0.0, 1.0
        )
        lay = layered.LayeredParams(
            top=top,
            bottom=bottom,
            thickness=take_rows(scene.mat_thickness, mat_idx_c),
            g=take_rows(scene.mat_lay_g, mat_idx_c),
            albedo=albedo,
            max_depth=10,
            n_samples=1,
        )

    fx, fy, fz = vm.frame_from_z(ns)
    return Bsdf(params=params, fx=fx, fy=fy, fz=fz, lay=lay), new_wl


def _is_coated(kind):
    return (kind == bxdfs.K_COATED_DIFFUSE) | (kind == bxdfs.K_COATED_CONDUCTOR)


def bsdf_f(b: Bsdf, wo_w, wi_w):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    wi = vm.to_local(b.fx, b.fy, b.fz, wi_w)
    out = bxdfs.f(b.params, wo, wi)
    if b.lay is not None:
        from pbrt_tpu.materials import layered

        f_lay = layered.layered_f(b.lay, wo, wi)
        out = jnp.where(_is_coated(b.params.kind)[..., None], f_lay, out)
    return out


def bsdf_pdf(b: Bsdf, wo_w, wi_w):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    wi = vm.to_local(b.fx, b.fy, b.fz, wi_w)
    out = bxdfs.pdf(b.params, wo, wi)
    if b.lay is not None:
        from pbrt_tpu.materials import layered

        p_lay = layered.layered_pdf(b.lay, wo, wi)
        out = jnp.where(_is_coated(b.params.kind), p_lay, out)
    return out


def bsdf_sample(b: Bsdf, wo_w, uc, u2):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    s = bxdfs.sample(b.params, wo, uc, u2)
    if b.lay is not None:
        from pbrt_tpu.materials import layered

        s_lay = layered.layered_sample(b.lay, wo, uc, u2)
        coat = _is_coated(b.params.kind)
        s = bxdfs.BSDFSample(
            f=jnp.where(coat[..., None], s_lay.f, s.f),
            wi=jnp.where(coat[..., None], s_lay.wi, s.wi),
            pdf=jnp.where(coat, s_lay.pdf, s.pdf),
            flags=jnp.where(coat, s_lay.flags, s.flags),
            eta=jnp.where(coat, s_lay.eta, s.eta),
            valid=jnp.where(coat, s_lay.valid, s.valid),
        )
    wi_w = vm.from_local(b.fx, b.fy, b.fz, s.wi)
    return s._replace(wi=wi_w)


def mis_direction_pdf(b: Bsdf, wo_w, bs: "bxdfs.BSDFSample"):
    """Directional pdf to carry into the NEXT bounce's MIS weight.

    The stochastic LayeredBxDF sample's pdf is only PROPORTIONAL
    (layered_bxdf.h:269 pdf_is_proportional); the reference integrators
    replace it with the (stochastic but consistent) BSDF::pdf estimate
    before using it in MIS (megakernel_path.cu:162, wavefront_path.cu:469,
    bdpt.cu:509) — feeding the proportional value in inflates MIS weights
    on coated materials. Non-coated lanes keep bs.pdf. No-op (and no
    layered walk compiled) for scenes without coated materials."""
    if b.lay is None:
        return bs.pdf
    est = bsdf_pdf(b, wo_w, bs.wi)
    return jnp.where(_is_coated(b.params.kind), est, bs.pdf)
