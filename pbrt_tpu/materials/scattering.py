"""Microfacet distribution + Fresnel functions.

Counterpart of reference util/scattering.h (229 LoC): Trowbridge–Reitz
(GGX) with visible-normal sampling, dielectric and complex-conductor
Fresnel. All functions operate on `(...,)` lanes in the local shading frame
(z up); spectral quantities carry a trailing (..., 4) axis.
"""
import jax.numpy as jnp

from pbrt_tpu.utils.math import PI, safe_sqrt, sqr, lerp
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.sampling import warps


def roughness_to_alpha(roughness):
    # max with a tiny positive keeps d(sqrt)/dr finite at r == 0
    return jnp.sqrt(jnp.maximum(roughness, 1e-8))


def effectively_smooth(ax, ay):
    return jnp.maximum(ax, ay) < 1e-3


def tr_d(wm, ax, ay):
    """GGX NDF D(wm), ellipsoid form: 1 / (pi ax ay (x^2/ax^2 + y^2/ay^2
    + z^2)^2). Equivalent to the tan/phi decomposition but with bounded
    partials near wm = z (the phi terms have exploding derivatives there,
    which poisons d/d(roughness) even through unselected jnp.where lanes)."""
    x, y, z = wm[..., 0], wm[..., 1], wm[..., 2]
    k = sqr(x / ax) + sqr(y / ay) + sqr(z)
    return 1.0 / (PI * ax * ay * jnp.maximum(sqr(k), 1e-16))


def tr_lambda(w, ax, ay):
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    t = (sqr(ax * x) + sqr(ay * y)) / jnp.maximum(sqr(z), 1e-12)
    return (safe_sqrt(1.0 + t) - 1.0) / 2.0


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_d_visible(w, wm, ax, ay):
    """Visible-normal density for pdf."""
    return (
        tr_g1(w, ax, ay)
        / jnp.maximum(vm.abs_cos_theta(w), 1e-9)
        * tr_d(wm, ax, ay)
        * vm.absdot(w, wm)
    )


def tr_pdf(wo, wm, ax, ay):
    return tr_d_visible(wo, wm, ax, ay)


def tr_sample_wm(w, u, ax, ay):
    """Sample a visible microfacet normal (Heitz 2018 VNDF warp)."""
    wh = vm.normalize(jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1))
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wh.shape)
    xaxis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wh.shape)
    # double-where: normalize() of a near-zero cross has an unbounded VJP;
    # feed the unselected lanes a safe vector BEFORE normalizing, or the
    # 0-cotangent x inf-Jacobian product NaNs every geometry gradient
    not_polar = (wh[..., 2] < 0.999)[..., None]
    c = jnp.where(not_polar, vm.cross(up, wh), xaxis)
    t1 = jnp.where(not_polar, vm.normalize(c), xaxis)
    t2 = vm.cross(wh, t1)
    p = warps.sample_uniform_disk_polar(u)  # (..., 2)
    h = safe_sqrt(1.0 - sqr(p[..., 0]))
    ph_y = lerp((1.0 + wh[..., 2]) / 2.0, h, p[..., 1])
    pz = safe_sqrt(1.0 - sqr(p[..., 0]) - sqr(ph_y))
    nh = p[..., 0][..., None] * t1 + ph_y[..., None] * t2 + pz[..., None] * wh
    wm = jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])], axis=-1
    )
    return vm.normalize(wm)


def tr_regularize(ax, ay):
    """reference scattering.h regularize: widen near-specular lobes."""
    def reg(a):
        return jnp.where(a < 0.3, jnp.clip(2.0 * a, 0.1, 0.3), a)

    return reg(ax), reg(ay)


# ------------------------------------------------------------------ Fresnel


def fr_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance, real eta. cos_theta_i may be negative
    (entering from below: eta inverted). Returns (F, cos_theta_t, eta_eff)."""
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    flip = cos_theta_i < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_theta_i)
    sin2_i = 1.0 - sqr(cos_i)
    sin2_t = sin2_i / sqr(eta_eff)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_parl = (eta_eff * cos_i - cos_t) / jnp.maximum(eta_eff * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta_eff * cos_t) / jnp.maximum(cos_i + eta_eff * cos_t, 1e-12)
    F = (sqr(r_parl) + sqr(r_perp)) / 2.0
    return jnp.where(tir, 1.0, F), cos_t, eta_eff


def fr_complex(cos_theta_i, eta_re, eta_im):
    """Fresnel for conductors with complex IOR; spectral: all args (..., 4)
    or broadcastable (reference util/scattering.h FrComplex via complex.h)."""
    cos_i = jnp.clip(cos_theta_i, 0.0, 1.0)
    sin2_i = 1.0 - sqr(cos_i)
    # |eta| == 0 (non-conductor lanes carry an all-zero placeholder spectrum
    # row) would divide by zero below: the NaN PRIMAL in this unselected
    # branch then poisons reverse-mode through every jnp.where that masks it
    degenerate = sqr(eta_re) + sqr(eta_im) < 1e-12
    eta_re = jnp.where(degenerate, 1.0, eta_re)
    eta = eta_re + 1j * eta_im
    sin2_t = sin2_i / (eta * eta)
    cos_t = jnp.sqrt(1.0 + 0j - sin2_t)
    r_parl = (eta * cos_i - cos_t) / (eta * cos_i + cos_t)
    r_perp = (cos_i - eta * cos_t) / (cos_i + eta * cos_t)
    return (jnp.abs(r_parl) ** 2 + jnp.abs(r_perp) ** 2) / 2.0


# ---------------------------------------------------------------- refract


def reflect(wo, n):
    return -wo + 2.0 * vm.dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction. wi points AWAY from surface; n on same side as wi
    after flip. Returns (wt, valid, eta_eff)."""
    cos_i = vm.dot(n, wi)
    flip = cos_i < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    cos_i_a = jnp.abs(cos_i)
    n_f = jnp.where(flip[..., None], -n, n)
    sin2_i = jnp.maximum(0.0, 1.0 - sqr(cos_i_a))
    sin2_t = sin2_i / sqr(eta_eff)
    valid = sin2_t < 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = -wi / eta_eff[..., None] + (cos_i_a / eta_eff - cos_t)[..., None] * n_f
    return wt, valid, eta_eff
