"""Material evaluation: material table rows + hit context -> BxdfParams.

Counterpart of reference materials/*.cu get_bxdf() (texture eval -> concrete
BxDF): here a gather from the SceneArrays material table plus spectral
sampling, fully vectorized over lanes.
"""
from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.materials import bxdfs, scattering as sc
from pbrt_tpu.spectral import spectra, sampled
from pbrt_tpu.scene import builder as bd


class Bsdf(NamedTuple):
    """Shading frame + per-lane bxdf parameters."""

    params: bxdfs.BxdfParams
    fx: jnp.ndarray  # frame axes (R,3)
    fy: jnp.ndarray
    fz: jnp.ndarray


def make_bsdf(scene, mat_idx, ns, wl: sampled.Wavelengths, uv=None):
    """Gather material mat_idx (R,) and build lane BxdfParams + shading frame
    around ns. Returns (Bsdf, new_wavelengths) — dielectric dispersion may
    terminate secondary wavelengths (reference dielectric_material.cu:40-47).

    uv (R,2): surface parameterization for texture-slot evaluation
    (reference materials eval textures via TextureEvalContext).
    """
    mat_idx_c = jnp.maximum(mat_idx, 0)
    mtype = scene.mat_type[mat_idx_c]
    refl_c = scene.mat_refl_c[mat_idx_c]       # (R,3)
    trans_c = scene.mat_trans_c[mat_idx_c]
    urough = scene.mat_urough[mat_idx_c]
    vrough = scene.mat_vrough[mat_idx_c]
    remap = scene.mat_remap[mat_idx_c]
    eta_f = scene.mat_eta[mat_idx_c]
    eta_spec = scene.mat_eta_spec[mat_idx_c]
    k_spec = scene.mat_k_spec[mat_idx_c]
    refl_mode = scene.mat_refl_mode[mat_idx_c]

    # floor alpha at 1e-4: below the effectively_smooth threshold (1e-3) so
    # the specular branch still wins, but the unselected rough-lobe formulas
    # stay finite — otherwise their NaNs leak into d(loss)/d(roughness)
    # through jnp.where's 0*NaN cotangents.
    refl = jnp.clip(spectra.sigmoid_polynomial(refl_c, wl.lam), 0.0, 1.0)
    trans = jnp.clip(spectra.sigmoid_polynomial(trans_c, wl.lam), 0.0, 1.0)

    # texture-slot overrides (node -1 keeps the constant columns)
    if uv is not None and scene.tex.type.shape[0] > 0:
        from pbrt_tpu.textures import textures as texlib

        rt = scene.mat_refl_tex[mat_idx_c]
        tt = scene.mat_trans_tex[mat_idx_c]
        ut = scene.mat_urough_tex[mat_idx_c]
        vt = scene.mat_vrough_tex[mat_idx_c]
        refl_t = jnp.clip(texlib.eval_spectrum(scene.tex, rt, uv, ns, wl.lam), 0.0, 1.0)
        trans_t = jnp.clip(texlib.eval_spectrum(scene.tex, tt, uv, ns, wl.lam), 0.0, 1.0)
        refl = jnp.where((rt >= 0)[..., None], refl_t, refl)
        trans = jnp.where((tt >= 0)[..., None], trans_t, trans)
        urough = jnp.where(ut >= 0, texlib.eval_float(scene.tex, ut, uv), urough)
        vrough = jnp.where(vt >= 0, texlib.eval_float(scene.tex, vt, uv), vrough)

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

    # dielectric eta: float mode or spectral (hero wavelength + dispersion)
    eta_hero = spectra.sample_table(
        scene.spec_table, jnp.maximum(eta_spec, 0), wl.lam[..., 0:1]
    )[..., 0]
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
            jnp.where(mtype == bd.MAT_DIELECTRIC, bxdfs.K_DIELECTRIC, bxdfs.K_DIFF_TRANS),
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
    fx, fy, fz = vm.frame_from_z(ns)
    return Bsdf(params=params, fx=fx, fy=fy, fz=fz), new_wl


def bsdf_f(b: Bsdf, wo_w, wi_w):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    wi = vm.to_local(b.fx, b.fy, b.fz, wi_w)
    return bxdfs.f(b.params, wo, wi)


def bsdf_pdf(b: Bsdf, wo_w, wi_w):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    wi = vm.to_local(b.fx, b.fy, b.fz, wi_w)
    return bxdfs.pdf(b.params, wo, wi)


def bsdf_sample(b: Bsdf, wo_w, uc, u2):
    wo = vm.to_local(b.fx, b.fy, b.fz, wo_w)
    s = bxdfs.sample(b.params, wo, uc, u2)
    wi_w = vm.from_local(b.fx, b.fy, b.fz, s.wi)
    return s._replace(wi=wi_w)
