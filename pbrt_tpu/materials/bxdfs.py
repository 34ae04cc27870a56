"""BxDFs, vectorized and branchless.

TPU-native redesign of reference bxdfs/ (1,299 LoC): instead of a
`cuda::std::variant` dispatched per thread (reference base/bxdf.h:11-48),
every lane carries a `kind` code plus a superset of parameters, and
f/pdf/sample are evaluated for ALL kinds with `jnp.where` selection. With 4
cheap lobes this trades a little arithmetic for zero divergence — the right
trade on a VPU. (The wavefront integrator can instead sort lanes by kind and
evaluate only the needed lobe per tile.)

All directions are in the local shading frame (z = shading normal).
Conventions follow PBRT-v4 / the reference:
  - wo, wi point away from the surface
  - f() includes no cosine; radiance transport
  - smooth (specular) lobes return f=pdf=0 from f()/pdf() and only
    scatter via sample() with pdf=1 and the SPECULAR flag
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.utils.math import PI, INV_PI, sqr
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.materials import scattering as sc
from pbrt_tpu.sampling import warps

# kinds
K_DIFFUSE = 0
K_CONDUCTOR = 1
K_DIELECTRIC = 2
K_DIFF_TRANS = 3
K_COATED_DIFFUSE = 4   # layered: dielectric over diffuse (materials/layered.py)
K_COATED_CONDUCTOR = 5  # layered: dielectric over conductor

# flags (reference bxdfs/bxdf_util.h BxDFFlags)
F_REFLECTION = 1
F_TRANSMISSION = 2
F_DIFFUSE = 4
F_GLOSSY = 8
F_SPECULAR = 16


class BxdfParams(NamedTuple):
    kind: jnp.ndarray      # (R,) i32
    refl: jnp.ndarray      # (R,4) reflectance (diffuse/difftrans)
    trans: jnp.ndarray     # (R,4) transmittance (difftrans)
    eta_re: jnp.ndarray    # (R,4) conductor eta
    eta_im: jnp.ndarray    # (R,4) conductor k
    eta: jnp.ndarray       # (R,) dielectric relative IOR (hero lambda)
    ax: jnp.ndarray        # (R,)
    ay: jnp.ndarray


class BSDFSample(NamedTuple):
    f: jnp.ndarray         # (R,4)
    wi: jnp.ndarray        # (R,3)
    pdf: jnp.ndarray       # (R,)
    flags: jnp.ndarray     # (R,) i32
    eta: jnp.ndarray       # (R,) relative eta of the event (1 unless refracted)
    valid: jnp.ndarray     # (R,) bool


def _same_hemisphere(wo, wi):
    return wo[..., 2] * wi[..., 2] > 0.0


def _safe_alphas(p: BxdfParams):
    """Double-where on the roughness: effectively-smooth lanes select the
    specular branch, but the UNSELECTED rough-lobe formulas still run with
    the 1e-4 alpha floor, whose 1/alpha^2-scale Jacobians overflow in
    reverse mode and NaN shared gradients through jnp.where's 0-cotangent.
    Feeding those lanes a tame stand-in alpha changes no primal (their
    rough results are never selected)."""
    smooth = sc.effectively_smooth(p.ax, p.ay)
    ax = jnp.where(smooth, 0.25, p.ax)
    ay = jnp.where(smooth, 0.25, p.ay)
    return smooth, ax, ay


# ----------------------------------------------------------------- evaluate


def f(p: BxdfParams, wo, wi):
    """(R,4) BSDF value. Smooth specular lobes contribute 0 here."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    same = _same_hemisphere(wo, wi)

    # diffuse
    f_diff = jnp.where(same[..., None], p.refl * INV_PI, 0.0)

    # diffuse transmission (two-sided lambertian R/T)
    f_dt = jnp.where(same[..., None], p.refl * INV_PI, p.trans * INV_PI)

    # rough conductor
    smooth, ax_s, ay_s = _safe_alphas(p)
    wm_r = wo + wi
    wm_len = vm.length(wm_r)
    wm = wm_r / jnp.maximum(wm_len, 1e-12)[..., None]
    wm = jnp.where((wm[..., 2] < 0.0)[..., None], -wm, wm)
    Fc = sc.fr_complex(vm.absdot(wo, wm)[..., None], p.eta_re, p.eta_im)
    denom = 4.0 * jnp.abs(cos_o * cos_i)
    d_term = sc.tr_d(wm, ax_s, ay_s) * sc.tr_g(wo, wi, ax_s, ay_s)
    f_cond = jnp.where(
        (same & ~smooth & (wm_len > 1e-9) & (denom > 1e-12))[..., None],
        Fc * (d_term / jnp.maximum(denom, 1e-12))[..., None],
        0.0,
    )

    # rough dielectric (reflection + transmission)
    eta_d = jnp.where(cos_i > 0.0, 1.0, 1.0) * p.eta  # relative eta
    # generalized half vector: wo + wi*eta_t (pbrt: wm = wi*etap + wo)
    refl_case = same
    etap = jnp.where(refl_case, 1.0, jnp.where(cos_o > 0.0, p.eta, 1.0 / p.eta))
    wm_d = wi * etap[..., None] + wo
    wm_d_len2 = vm.length_squared(wm_d)
    wm_dn = wm_d / jnp.sqrt(jnp.maximum(wm_d_len2, 1e-24))[..., None]
    wm_dn = jnp.where((wm_dn[..., 2] < 0.0)[..., None], -wm_dn, wm_dn)
    backfacing = (vm.dot(wm_dn, wi) * cos_i < 0.0) | (vm.dot(wm_dn, wo) * cos_o < 0.0)
    Fd, _, _ = sc.fr_dielectric(vm.dot(wo, wm_dn), p.eta)
    D = sc.tr_d(wm_dn, ax_s, ay_s)
    G = sc.tr_g(wo, wi, ax_s, ay_s)
    f_diel_r = D * Fd * G / jnp.maximum(4.0 * jnp.abs(cos_o * cos_i), 1e-12)
    denom_t = sqr(vm.dot(wi, wm_dn) + vm.dot(wo, wm_dn) / etap)
    f_diel_t = (
        D
        * (1.0 - Fd)
        * G
        * jnp.abs(vm.dot(wi, wm_dn) * vm.dot(wo, wm_dn))
        / jnp.maximum(jnp.abs(cos_i * cos_o) * denom_t, 1e-12)
        / sqr(etap)
    )
    f_diel = jnp.where(refl_case, f_diel_r, f_diel_t)
    f_diel = jnp.where(smooth | backfacing | (wm_d_len2 < 1e-18), 0.0, f_diel)
    f_diel4 = f_diel[..., None] * jnp.ones_like(p.refl)

    out = jnp.where(
        (p.kind == K_DIFFUSE)[..., None],
        f_diff,
        jnp.where(
            (p.kind == K_CONDUCTOR)[..., None],
            f_cond,
            jnp.where((p.kind == K_DIELECTRIC)[..., None], f_diel4, f_dt),
        ),
    )
    degen = (cos_o == 0.0) | (cos_i == 0.0)
    return jnp.where(degen[..., None], 0.0, out)


def pdf(p: BxdfParams, wo, wi, allow_refl=True, allow_trans=True):
    """(R,) solid-angle pdf of sample() for non-specular lobes.
    allow_* restrict the dielectric lobe choice (BxDFReflTransFlags)."""
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    same = _same_hemisphere(wo, wi)

    pdf_diff = jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)

    pr = jnp.max(p.refl, axis=-1)
    pt = jnp.max(p.trans, axis=-1)
    tot = jnp.maximum(pr + pt, 1e-12)
    pdf_dt = jnp.where(same, pr / tot, pt / tot) * jnp.abs(cos_i) * INV_PI

    smooth, ax_s, ay_s = _safe_alphas(p)
    wm_r = wo + wi
    wm_len = vm.length(wm_r)
    wm = wm_r / jnp.maximum(wm_len, 1e-12)[..., None]
    wm_f = jnp.where((wm[..., 2] < 0.0)[..., None], -wm, wm)
    pdf_cond = jnp.where(
        same & ~smooth & (wm_len > 1e-9),
        sc.tr_pdf(wo, wm_f, ax_s, ay_s) / jnp.maximum(4.0 * vm.absdot(wo, wm_f), 1e-12),
        0.0,
    )

    # rough dielectric pdf
    refl_case = same
    etap = jnp.where(refl_case, 1.0, jnp.where(cos_o > 0.0, p.eta, 1.0 / p.eta))
    wm_d = wi * etap[..., None] + wo
    wm_d_len2 = vm.length_squared(wm_d)
    wm_dn = wm_d / jnp.sqrt(jnp.maximum(wm_d_len2, 1e-24))[..., None]
    wm_dn = jnp.where((wm_dn[..., 2] < 0.0)[..., None], -wm_dn, wm_dn)
    backfacing = (vm.dot(wm_dn, wi) * cos_i < 0.0) | (vm.dot(wm_dn, wo) * cos_o < 0.0)
    Fd, _, _ = sc.fr_dielectric(vm.dot(wo, wm_dn), p.eta)
    R = Fd if allow_refl else jnp.zeros_like(Fd)
    Tt = (1.0 - Fd) if allow_trans else jnp.zeros_like(Fd)
    tot_d = jnp.maximum(R + Tt, 1e-12)
    pdf_d_r = sc.tr_pdf(wo, wm_dn, ax_s, ay_s) / jnp.maximum(
        4.0 * vm.absdot(wo, wm_dn), 1e-12
    ) * (R / tot_d)
    denom_t = sqr(vm.dot(wi, wm_dn) + vm.dot(wo, wm_dn) / etap)
    dwm_dwi = vm.absdot(wi, wm_dn) / jnp.maximum(denom_t, 1e-12)
    pdf_d_t = sc.tr_pdf(wo, wm_dn, ax_s, ay_s) * dwm_dwi * (Tt / tot_d)
    pdf_diel = jnp.where(refl_case, pdf_d_r, pdf_d_t)
    pdf_diel = jnp.where(smooth | backfacing | (wm_d_len2 < 1e-18), 0.0, pdf_diel)

    out = jnp.where(
        p.kind == K_DIFFUSE,
        pdf_diff,
        jnp.where(
            p.kind == K_CONDUCTOR,
            pdf_cond,
            jnp.where(p.kind == K_DIELECTRIC, pdf_diel, pdf_dt),
        ),
    )
    if not allow_refl:
        out = jnp.where(p.kind == K_DIELECTRIC, out, 0.0)
    return jnp.where((cos_o == 0.0) | (cos_i == 0.0), 0.0, out)


# ------------------------------------------------------------------- sample


def sample(p: BxdfParams, wo, uc, u2, allow_refl=True, allow_trans=True,
           mode_radiance=True):
    """Sample an outgoing direction. uc: (R,) lobe choice; u2: (R,2).

    allow_refl/allow_trans restrict the dielectric's lobe choice like the
    reference BxDFReflTransFlags (bxdf_util.h) — used by the layered engine
    to force entry/exit transmission. Reflection-only kinds (diffuse,
    conductor) become invalid under allow_refl=False.

    Returns BSDFSample; for specular events pdf=1 and flags has F_SPECULAR.
    """
    cos_o = wo[..., 2]
    smooth, ax_s, ay_s = _safe_alphas(p)

    # ---- diffuse / diffuse-transmission
    wi_cos = warps.sample_cosine_hemisphere(u2)
    wi_diff = jnp.where((cos_o < 0.0)[..., None], wi_cos * jnp.array([1.0, 1.0, -1.0]), wi_cos)
    pdf_diff = jnp.abs(wi_diff[..., 2]) * INV_PI
    f_diff = p.refl * INV_PI

    pr = jnp.max(p.refl, axis=-1)
    pt = jnp.max(p.trans, axis=-1)
    tot_dt = jnp.maximum(pr + pt, 1e-12)
    dt_reflect = uc < pr / tot_dt
    wi_dt = jnp.where(
        dt_reflect[..., None] ^ (cos_o < 0.0)[..., None],
        wi_cos,
        wi_cos * jnp.array([1.0, 1.0, -1.0]),
    )
    f_dt = jnp.where(dt_reflect[..., None], p.refl, p.trans) * INV_PI
    pdf_dt = jnp.abs(wi_dt[..., 2]) * INV_PI * jnp.where(dt_reflect, pr / tot_dt, pt / tot_dt)

    # ---- conductor
    wi_spec = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    abs_cos_spec = jnp.maximum(vm.abs_cos_theta(wi_spec), 1e-9)
    F_spec = sc.fr_complex(abs_cos_spec[..., None], p.eta_re, p.eta_im)
    f_cond_smooth = F_spec / abs_cos_spec[..., None]

    wm = sc.tr_sample_wm(jnp.where((cos_o < 0.0)[..., None], -wo, wo), u2, ax_s, ay_s)
    wm = jnp.where((cos_o < 0.0)[..., None], -wm, wm)
    wi_rough = sc.reflect(wo, wm)
    same_r = _same_hemisphere(wo, wi_rough)
    Fc = sc.fr_complex(vm.absdot(wo, wm)[..., None], p.eta_re, p.eta_im)
    d_g = sc.tr_d(wm, ax_s, ay_s) * sc.tr_g(wo, wi_rough, ax_s, ay_s)
    denom = 4.0 * jnp.abs(cos_o * wi_rough[..., 2])
    f_cond_rough = Fc * (d_g / jnp.maximum(denom, 1e-12))[..., None]
    pdf_cond_rough = sc.tr_pdf(wo, wm, ax_s, ay_s) / jnp.maximum(
        4.0 * vm.absdot(wo, wm), 1e-12
    )
    wi_cond = jnp.where(smooth[..., None], wi_spec, wi_rough)
    f_cond = jnp.where(smooth[..., None], f_cond_smooth, f_cond_rough)
    pdf_cond = jnp.where(smooth, 1.0, pdf_cond_rough)
    valid_cond = jnp.where(smooth, cos_o != 0.0, same_r & (cos_o != 0.0))
    flags_cond = jnp.where(
        smooth, F_SPECULAR | F_REFLECTION, F_GLOSSY | F_REFLECTION
    ).astype(jnp.int32)

    # ---- dielectric
    # smooth case
    Fsd, _, _ = sc.fr_dielectric(cos_o, p.eta)
    Rs = Fsd if allow_refl else jnp.zeros_like(Fsd)
    Ts = (1.0 - Fsd) if allow_trans else jnp.zeros_like(Fsd)
    choose_refl_s = uc < Rs / jnp.maximum(Rs + Ts, 1e-12)
    wi_d_refl = wi_spec
    f_d_refl = Fsd / jnp.maximum(vm.abs_cos_theta(wi_spec), 1e-9)
    pdf_d_refl = Rs / jnp.maximum(Rs + Ts, 1e-12)
    n_local = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wo.shape)
    wt, refr_valid, etap_s = sc.refract(wo, n_local, p.eta)
    f_d_trans = (1.0 - Fsd) / jnp.maximum(vm.abs_cos_theta(wt), 1e-9)
    if mode_radiance:  # radiance transport: 1/eta^2 radiance scaling
        f_d_trans = f_d_trans / sqr(etap_s)
    pdf_d_trans = Ts / jnp.maximum(Rs + Ts, 1e-12)
    wi_d_smooth = jnp.where(choose_refl_s[..., None], wi_d_refl, wt)
    f_d_smooth = jnp.where(choose_refl_s, f_d_refl, f_d_trans)
    pdf_d_smooth = jnp.where(choose_refl_s, pdf_d_refl, pdf_d_trans)
    valid_d_smooth = jnp.where(choose_refl_s, cos_o != 0.0, refr_valid)
    eta_event_smooth = jnp.where(choose_refl_s, 1.0, etap_s)
    flags_d_smooth = jnp.where(
        choose_refl_s, F_SPECULAR | F_REFLECTION, F_SPECULAR | F_TRANSMISSION
    ).astype(jnp.int32)

    # rough case: sample wm, Fresnel split, reflect/refract about wm
    Frd, _, _ = sc.fr_dielectric(vm.dot(wo, wm), p.eta)
    Rr = Frd if allow_refl else jnp.zeros_like(Frd)
    Tr = (1.0 - Frd) if allow_trans else jnp.zeros_like(Frd)
    choose_refl_r = uc < Rr / jnp.maximum(Rr + Tr, 1e-12)
    wi_r_refl = sc.reflect(wo, wm)
    same_rr = _same_hemisphere(wo, wi_r_refl)
    D = sc.tr_d(wm, ax_s, ay_s)
    G_r = sc.tr_g(wo, wi_r_refl, ax_s, ay_s)
    f_r_refl = D * G_r * Frd / jnp.maximum(
        4.0 * jnp.abs(cos_o * wi_r_refl[..., 2]), 1e-12
    )
    pdf_r_refl = sc.tr_pdf(wo, wm, ax_s, ay_s) / jnp.maximum(
        4.0 * vm.absdot(wo, wm), 1e-12
    ) * (Rr / jnp.maximum(Rr + Tr, 1e-12))
    wt_r, refr_valid_r, etap_r = sc.refract(wo, wm, p.eta)
    same_tt = _same_hemisphere(wo, wt_r)
    cos_i_t = wt_r[..., 2]
    denom_t = sqr(vm.dot(wt_r, wm) + vm.dot(wo, wm) / etap_r)
    G_t = sc.tr_g(wo, wt_r, ax_s, ay_s)
    f_r_trans = (
        D
        * (1.0 - Frd)
        * G_t
        * jnp.abs(
            vm.dot(wt_r, wm) * vm.dot(wo, wm)
            / jnp.maximum(jnp.abs(cos_i_t * cos_o) * denom_t, 1e-12)
        )
    )
    if mode_radiance:
        f_r_trans = f_r_trans / sqr(etap_r)
    dwm_dwi = vm.absdot(wt_r, wm) / jnp.maximum(denom_t, 1e-12)
    pdf_r_trans = sc.tr_pdf(wo, wm, ax_s, ay_s) * dwm_dwi * (
        Tr / jnp.maximum(Rr + Tr, 1e-12)
    )
    wi_d_rough = jnp.where(choose_refl_r[..., None], wi_r_refl, wt_r)
    f_d_rough = jnp.where(choose_refl_r, f_r_refl, f_r_trans)
    pdf_d_rough = jnp.where(choose_refl_r, pdf_r_refl, pdf_r_trans)
    valid_d_rough = jnp.where(choose_refl_r, same_rr, refr_valid_r & ~same_tt)
    eta_event_rough = jnp.where(choose_refl_r, 1.0, etap_r)
    flags_d_rough = jnp.where(
        choose_refl_r, F_GLOSSY | F_REFLECTION, F_GLOSSY | F_TRANSMISSION
    ).astype(jnp.int32)

    wi_diel = jnp.where(smooth[..., None], wi_d_smooth, wi_d_rough)
    f_diel = (jnp.where(smooth, f_d_smooth, f_d_rough))[..., None] * jnp.ones_like(p.refl)
    pdf_diel = jnp.where(smooth, pdf_d_smooth, pdf_d_rough)
    valid_diel = jnp.where(smooth, valid_d_smooth, valid_d_rough)
    eta_diel = jnp.where(smooth, eta_event_smooth, eta_event_rough)
    flags_diel = jnp.where(smooth, flags_d_smooth, flags_d_rough)

    # ---- combine by kind
    kind = p.kind
    wi = jnp.where(
        (kind == K_DIFFUSE)[..., None],
        wi_diff,
        jnp.where(
            (kind == K_CONDUCTOR)[..., None],
            wi_cond,
            jnp.where((kind == K_DIELECTRIC)[..., None], wi_diel, wi_dt),
        ),
    )
    f_out = jnp.where(
        (kind == K_DIFFUSE)[..., None],
        f_diff,
        jnp.where(
            (kind == K_CONDUCTOR)[..., None],
            f_cond,
            jnp.where((kind == K_DIELECTRIC)[..., None], f_diel, f_dt),
        ),
    )
    pdf_out = jnp.where(
        kind == K_DIFFUSE,
        pdf_diff,
        jnp.where(
            kind == K_CONDUCTOR,
            pdf_cond,
            jnp.where(kind == K_DIELECTRIC, pdf_diel, pdf_dt),
        ),
    )
    flags = jnp.where(
        kind == K_DIFFUSE,
        F_DIFFUSE | F_REFLECTION,
        jnp.where(
            kind == K_CONDUCTOR,
            flags_cond,
            jnp.where(
                kind == K_DIELECTRIC,
                flags_diel,
                F_DIFFUSE | F_REFLECTION | F_TRANSMISSION,
            ),
        ),
    ).astype(jnp.int32)
    valid = jnp.where(
        kind == K_DIFFUSE,
        cos_o != 0.0,
        jnp.where(
            kind == K_CONDUCTOR,
            valid_cond,
            jnp.where(kind == K_DIELECTRIC, valid_diel, cos_o != 0.0),
        ),
    )
    if not allow_refl:
        # reflection-only kinds cannot produce transmission samples
        valid &= kind == K_DIELECTRIC
    if not allow_trans:
        pass  # all kinds can reflect
    eta_event = jnp.where(kind == K_DIELECTRIC, eta_diel, 1.0)
    valid &= pdf_out > 0.0
    # Detached sampling (Zeltner et al. 2021 style): the sampled DIRECTION is
    # treated as a constant of the differentiation — gradients w.r.t.
    # roughness/albedo flow through f and pdf evaluated at the fixed wi, not
    # through the warp. Differentiating the warp would chain d(wi)/d(alpha)
    # into the *next bounce's* intersection geometry, whose Jacobians blow up
    # at grazing configurations (sqrt of ~0 discriminants, ~0 triangle
    # determinants) and NaN every shared-parameter gradient. Primal unchanged.
    wi = jax.lax.stop_gradient(wi)
    return BSDFSample(f=f_out, wi=wi, pdf=pdf_out, flags=flags, eta=eta_event, valid=valid)


def is_specular(flags):
    return (flags & F_SPECULAR) != 0


def is_transmission(flags):
    return (flags & F_TRANSMISSION) != 0
