"""Sampling warps: [0,1)^n -> distributions on disks/spheres/triangles etc.

Counterpart of reference util/sampling.h/.cu (352+175 LoC), vectorized over
`(...,)` sample batches. Every warp returns (value, pdf) or documents its pdf.
"""
import jax.numpy as jnp

from pbrt_tpu.utils.math import PI, INV_PI, INV_2PI, INV_4PI, PI_OVER_2, PI_OVER_4, safe_sqrt
from pbrt_tpu.geometry import vecmath as vm


def sample_uniform_disk_concentric(u):
    """Shirley–Chiu concentric disk warp (reference sampling.h)."""
    u_offset = 2.0 * u - 1.0
    ux, uy = u_offset[..., 0], u_offset[..., 1]
    zero = (ux == 0.0) & (uy == 0.0)
    cond = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(cond, ux, uy)
    theta = jnp.where(
        cond,
        PI_OVER_4 * jnp.where(ux != 0, uy / jnp.where(ux == 0, 1.0, ux), 0.0),
        PI_OVER_2 - PI_OVER_4 * jnp.where(uy != 0, ux / jnp.where(uy == 0, 1.0, uy), 0.0),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def sample_uniform_disk_polar(u):
    r = jnp.sqrt(jnp.maximum(u[..., 0], 1e-12))
    theta = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_cosine_hemisphere(u):
    """Cosine-weighted hemisphere about +z; pdf = cosθ/π."""
    d = sample_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = INV_4PI
UNIFORM_HEMISPHERE_PDF = INV_2PI


def sample_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_uniform_triangle(u):
    """Barycentric (b0, b1, b2) uniform on a triangle (reference
    sampling.h sample_uniform_triangle, sqrt-free formulation)."""
    u0, u1 = u[..., 0], u[..., 1]
    flip = u0 < u1
    b0 = jnp.where(flip, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(flip, u1 - b0, u1 / 2.0)
    return jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def sample_exponential(u, a):
    """t ~ a·exp(-a t); pdf(t) = a·exp(-a t) (reference sampling.h)."""
    return -jnp.log(jnp.maximum(1.0 - u, 1e-38)) / a


def henyey_greenstein(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / (denom * safe_sqrt(denom))


def sample_henyey_greenstein(wo, g, u):
    """Sample HG phase function about -wo convention matching reference
    sampling.cu:7-40; returns (wi, pdf)."""
    g = jnp.where(jnp.abs(g) < 1e-3, jnp.where(g < 0, -1e-3, 1e-3), g)
    sqr_term = (1.0 - g * g) / (1.0 + g - 2.0 * g * u[..., 0])
    cos_theta = -(1.0 + g * g - sqr_term * sqr_term) / (2.0 * g)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * PI * u[..., 1]
    x, y, z = vm.frame_from_z(wo)
    wi_local = vm.spherical_direction(sin_theta, cos_theta, phi)
    wi = vm.from_local(x, y, z, wi_local)
    pdf = henyey_greenstein(cos_theta, g)
    return wi, pdf


def sample_spherical_triangle(v0, v1, v2, p, u):
    """Sample a direction towards the spherical projection of triangle
    (v0,v1,v2) seen from p, uniformly in solid angle
    (reference util/sampling.h:167 `sample_spherical_triangle`, PBRT-v4
    §A.5.5 Arvo's method). Returns (barycentric (..., 3), pdf = 1/solid_angle).
    """
    a = vm.normalize(v0 - p)
    b = vm.normalize(v1 - p)
    c = vm.normalize(v2 - p)
    n_ab = vm.cross(a, b)
    n_bc = vm.cross(b, c)
    n_ca = vm.cross(c, a)
    degenerate = (
        (vm.length_squared(n_ab) < 1e-18)
        | (vm.length_squared(n_bc) < 1e-18)
        | (vm.length_squared(n_ca) < 1e-18)
    )
    n_ab_n = vm.normalize(n_ab)
    n_bc_n = vm.normalize(n_bc)
    n_ca_n = vm.normalize(n_ca)
    alpha = vm.angle_between(n_ab_n, -n_ca_n)
    beta = vm.angle_between(n_bc_n, -n_ab_n)
    gamma = vm.angle_between(n_ca_n, -n_bc_n)

    A_pi = alpha + beta + gamma
    Ap_pi = (1.0 - u[..., 0]) * PI + u[..., 0] * A_pi
    A = A_pi - PI
    pdf = jnp.where(A <= 0.0, 0.0, 1.0 / jnp.maximum(A, 1e-12))

    # Find cos beta' for the sub-triangle (reference sampling.h:207-216)
    cos_alpha = jnp.cos(alpha)
    sin_alpha = jnp.sin(alpha)
    sin_phi = jnp.sin(Ap_pi) * cos_alpha - jnp.cos(Ap_pi) * sin_alpha
    cos_phi = jnp.cos(Ap_pi) * cos_alpha + jnp.sin(Ap_pi) * sin_alpha
    k1 = cos_phi + cos_alpha
    k2 = sin_phi - sin_alpha * vm.dot(a, b)
    denom = (k2 * sin_phi + k1 * cos_phi) * sin_alpha
    cos_bp = (k2 + (k2 * cos_phi - k1 * sin_phi) * cos_alpha) / jnp.where(
        jnp.abs(denom) < 1e-20, 1.0, denom
    )
    cos_bp = jnp.clip(cos_bp, -1.0, 1.0)
    sin_bp = safe_sqrt(1.0 - cos_bp * cos_bp)
    cp = cos_bp[..., None] * a + sin_bp[..., None] * vm.normalize(
        vm.gram_schmidt(c, a)
    )
    # Sample along the arc from b to c'
    cos_theta = 1.0 - u[..., 1] * (1.0 - vm.dot(cp, b))
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    w = cos_theta[..., None] * b + sin_theta[..., None] * vm.normalize(
        vm.gram_schmidt(cp, b)
    )
    # Barycentrics by intersecting ray (p, w) with the planar triangle
    e1 = v1 - v0
    e2 = v2 - v0
    s1 = vm.cross(w, e2)
    div = vm.dot(s1, e1)
    div_safe = jnp.where(jnp.abs(div) < 1e-12, 1.0, div)
    s = p - v0
    b1 = vm.dot(s, s1) / div_safe
    b2 = vm.dot(w, vm.cross(s, e1)) / div_safe
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0)
    over = (b1 + b2) > 1.0
    norm = jnp.where(over, b1 + b2, 1.0)
    b1 = jnp.where(over, b1 / norm, b1)
    b2 = jnp.where(over, b2 / norm, b2)
    bary = jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)
    bad = degenerate | (jnp.abs(div) < 1e-12)
    bary = jnp.where(bad[..., None], jnp.array([1 / 3, 1 / 3, 1 / 3]), bary)
    pdf = jnp.where(bad, 0.0, pdf)
    return bary, pdf


def sample_linear(u, a, b):
    """Sample x in [0,1] with density proportional to lerp(x, a, b)."""
    denom = a + jnp.sqrt(jnp.maximum((1.0 - u) * a * a + u * b * b, 1e-24))
    x = jnp.where(denom > 0.0, u * (a + b) / jnp.maximum(denom, 1e-12), u)
    return jnp.minimum(x, 0.99999994)


def sample_bilinear(u, w):
    """Sample (x, y) in [0,1]^2 with bilinear corner weights w (..., 4)
    ordered (w00, w10, w01, w11) (pbrt SampleBilinear)."""
    y = sample_linear(u[..., 1], w[..., 0] + w[..., 1], w[..., 2] + w[..., 3])
    x = sample_linear(
        u[..., 0],
        (1.0 - y) * w[..., 0] + y * w[..., 2],
        (1.0 - y) * w[..., 1] + y * w[..., 3],
    )
    return jnp.stack([x, y], axis=-1)


def bilinear_pdf(p, w):
    x, y = p[..., 0], p[..., 1]
    s = jnp.sum(w, axis=-1)
    interp = (
        (1 - x) * (1 - y) * w[..., 0]
        + x * (1 - y) * w[..., 1]
        + (1 - x) * y * w[..., 2]
        + x * y * w[..., 3]
    )
    inside = (x >= 0) & (x <= 1) & (y >= 0) & (y <= 1)
    return jnp.where(inside, jnp.where(s == 0.0, 1.0, 4.0 * interp / jnp.maximum(s, 1e-12)), 0.0)


def invert_spherical_triangle_sample(v0, v1, v2, p, w):
    """Invert Arvo sampling: direction w -> the (u0, u1) that generates it
    (reference util/sampling.cu:42-103 InvertSphericalTriangleSample)."""
    a = vm.normalize(v0 - p)
    b = vm.normalize(v1 - p)
    c = vm.normalize(v2 - p)
    n_ab = vm.cross(a, b)
    n_bc = vm.cross(b, c)
    n_ca = vm.cross(c, a)
    bad = (
        (vm.length_squared(n_ab) < 1e-18)
        | (vm.length_squared(n_bc) < 1e-18)
        | (vm.length_squared(n_ca) < 1e-18)
    )
    n_ab_n = vm.normalize(n_ab)
    n_bc_n = vm.normalize(n_bc)
    n_ca_n = vm.normalize(n_ca)
    alpha = vm.angle_between(n_ab_n, -n_ca_n)
    beta = vm.angle_between(n_bc_n, -n_ab_n)
    gamma = vm.angle_between(n_ca_n, -n_bc_n)

    cp = vm.cross(vm.cross(b, w), vm.cross(c, a))
    cp = vm.normalize(
        jnp.where((vm.length_squared(cp) < 1e-18)[..., None], a, cp)
    )
    cp = jnp.where((vm.dot(cp, a + c) < 0.0)[..., None], -cp, cp)

    n_cpb = vm.cross(cp, b)
    n_acp = vm.cross(a, cp)
    degen2 = (vm.length_squared(n_cpb) < 1e-18) | (vm.length_squared(n_acp) < 1e-18)
    n_cpb_n = vm.normalize(jnp.where(degen2[..., None], a, n_cpb))
    n_acp_n = vm.normalize(jnp.where(degen2[..., None], b, n_acp))
    Ap = alpha + vm.angle_between(n_ab_n, n_cpb_n) + vm.angle_between(n_acp_n, -n_cpb_n) - PI
    A = alpha + beta + gamma - PI
    u0 = jnp.where(
        vm.dot(a, cp) > 0.99999847691,
        0.0,
        jnp.clip(Ap / jnp.maximum(A, 1e-12), 0.0, 1.0),
    )
    u1 = jnp.clip(
        (1.0 - vm.dot(w, b)) / jnp.maximum(1.0 - vm.dot(cp, b), 1e-12), 0.0, 1.0
    )
    u = jnp.stack([u0, u1], axis=-1)
    return jnp.where((bad | degen2)[..., None], 0.5, u)


def spherical_triangle_pdf(v0, v1, v2, p, wi):
    """pdf (solid angle) of sampling direction wi towards the triangle =
    1 / spherical area (uniform)."""
    a = vm.normalize(v0 - p)
    b = vm.normalize(v1 - p)
    c = vm.normalize(v2 - p)
    A = vm.spherical_triangle_area(a, b, c)
    return jnp.where(A <= 0.0, 0.0, 1.0 / jnp.maximum(A, 1e-12))


# ---------------------------------------------------- equal-area octahedral
# (reference util/sampling.cu:104-175, from Clarberg's SIMD (hemi)sphere map)


def equal_area_square_to_sphere(p):
    """p (...,2) in [0,1]^2 -> unit direction (...,3)
    (EqualAreaSquareToSphere, sampling.cu:155-175)."""
    u = 2.0 * p[..., 0] - 1.0
    v = 2.0 * p[..., 1] - 1.0
    up = jnp.abs(u)
    vp = jnp.abs(v)
    signed_dist = 1.0 - (up + vp)
    d = jnp.abs(signed_dist)
    r = 1.0 - d
    phi = jnp.where(r == 0.0, 1.0, (vp - up) / jnp.maximum(r, 1e-12) + 1.0) * (PI / 4.0)
    z = jnp.sign(signed_dist + jnp.where(signed_dist == 0, 1.0, 0.0)) * (1.0 - r * r)
    cos_phi = jnp.where(u >= 0, jnp.cos(phi), -jnp.cos(phi))
    sin_phi = jnp.where(v >= 0, jnp.sin(phi), -jnp.sin(phi))
    s = r * jnp.sqrt(jnp.maximum(2.0 - r * r, 0.0))
    return jnp.stack([cos_phi * s, sin_phi * s, z], axis=-1)


def equal_area_sphere_to_square(dvec):
    """unit direction (...,3) -> p (...,2) in [0,1]^2
    (EqualAreaSphereToSquare, sampling.cu:104-150; exact atan instead of the
    reference's minimax polynomial — same map, tighter)."""
    x = jnp.abs(dvec[..., 0])
    y = jnp.abs(dvec[..., 1])
    z = jnp.abs(dvec[..., 2])
    r = jnp.sqrt(jnp.maximum(1.0 - z, 0.0))
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0.0, 0.0, b / jnp.maximum(a, 1e-24))
    phi = jnp.arctan(b) * (2.0 / PI)
    phi = jnp.where(x < y, 1.0 - phi, phi)
    v = phi * r
    u = r - v
    south = dvec[..., 2] < 0
    u2 = jnp.where(south, 1.0 - v, u)
    v2 = jnp.where(south, 1.0 - u, v)
    u2 = jnp.where(dvec[..., 0] >= 0, u2, -u2)
    v2 = jnp.where(dvec[..., 1] >= 0, v2, -v2)
    return jnp.stack([0.5 * (u2 + 1.0), 0.5 * (v2 + 1.0)], axis=-1)
