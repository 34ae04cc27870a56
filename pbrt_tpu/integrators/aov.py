"""Debug integrators: ambient occlusion + surface normal.

Counterparts of reference integrators/ambient_occlusion.cu:10-54 and
integrators/surface_normal.cu:6-21.
"""
import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY, PI
from pbrt_tpu.accel import dispatch
from pbrt_tpu.geometry import vecmath as vm
from pbrt_tpu.geometry.ray import offset_ray_origin
from pbrt_tpu.sampling import samplers, warps
from pbrt_tpu.spectral import sampled, cie, spectra


def ao_li(scene, rays, wl, r, max_depth, skind="independent", spp=0):
    """Cosine-weighted AO against the D65 illuminant
    (reference ambient_occlusion.cu: illuminant scaled by 1/CIE_Y_integral)."""
    R = rays.o.shape[0]
    hit = dispatch.intersect(scene, rays.o, rays.d, jnp.full((R,), INFINITY))
    ns = vm.face_forward(hit.ns, -rays.d)

    r, u = samplers.get_2d(r, None, skind, spp)
    local = warps.sample_cosine_hemisphere(u)
    fx, fy, fz = vm.frame_from_z(ns)
    wi = vm.from_local(fx, fy, fz, local)
    pdf = warps.cosine_hemisphere_pdf(local[..., 2])

    o2 = offset_ray_origin(hit.p, hit.ng, wi, scene.ray_offset_scale)
    occ = dispatch.occluded(scene, o2, wi, jnp.full((R,), INFINITY) * 0.5)

    illum = spectra.sample_dense(
        jnp.asarray(cie.illum_d65() / cie.CIE_Y_INTEGRAL, jnp.float32), wl.lam
    )
    contrib = illum * (vm.dot(wi, ns) / (PI * jnp.maximum(pdf, 1e-9)))[..., None]
    L = jnp.where((hit.valid & ~occ & (pdf > 0))[..., None], contrib, 0.0)
    return L, wl


def surface_normal_li(scene, rays, wl, r, max_depth, skind="independent", spp=0):
    """Shading-normal debug view: rgb = softmax-ish |n| mapped to a flat
    spectrum (reference surface_normal.cu maps n -> color)."""
    R = rays.o.shape[0]
    hit = dispatch.intersect(scene, rays.o, rays.d, jnp.full((R,), INFINITY))
    n = vm.face_forward(hit.ns, -rays.d)
    rgb = (n + 1.0) * 0.5
    # encode rgb via uplift at the sampled wavelengths
    from pbrt_tpu.spectral import rgb2spec

    c = rgb2spec.rgb_to_coefficients(rgb)
    s = spectra.sigmoid_polynomial(c, wl.lam)
    d65 = spectra.sample_dense(jnp.asarray(cie.illum_d65() / cie.CIE_Y_INTEGRAL, jnp.float32), wl.lam)
    L = jnp.where(hit.valid[..., None], s * d65, 0.0)
    return L, wl
