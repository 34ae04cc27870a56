"""Perspective camera ray generation (render space).

Counterpart of reference cameras/perspective.cu:66-86: raster point ->
camera_from_raster -> unit direction, thin-lens defocus, then
render_from_camera. Matrices precomputed by the scene compiler.
"""
import jax.numpy as jnp

from pbrt_tpu.geometry import transform as tf, vecmath as vm
from pbrt_tpu.geometry.ray import Rays
from pbrt_tpu.sampling import warps


def generate_rays(scene, p_film, u_lens):
    """p_film: (R,2) raster positions; u_lens: (R,2) for defocus. -> Rays."""
    R = p_film.shape[0]
    p_raster = jnp.concatenate([p_film, jnp.zeros((R, 1), p_film.dtype)], axis=-1)
    p_cam = tf.xform_point(scene.camera_from_raster, p_raster)
    d = vm.normalize(p_cam)
    o = jnp.zeros_like(d)

    lens_r = scene.camera_lens_radius
    p_lens2 = lens_r * warps.sample_uniform_disk_concentric(u_lens)
    ft = scene.camera_focal_distance / jnp.maximum(d[..., 2], 1e-9)
    p_focus = d * ft[..., None]
    o_lens = jnp.concatenate([p_lens2, jnp.zeros((R, 1), p_film.dtype)], axis=-1)
    d_lens = vm.normalize(p_focus - o_lens)
    use_lens = lens_r > 0.0
    o = jnp.where(use_lens, o_lens, o)
    d = jnp.where(use_lens, d_lens, d)

    o_r = tf.xform_point(scene.render_from_camera, o)
    d_r = vm.normalize(tf.xform_vector(scene.render_from_camera, d))
    # clip_grad: catch-all sanitization of camera-pose cotangents — any
    # inf/NaN minted in downstream geometry/shading Jacobians (grazing
    # configurations, spherical-triangle trig) is zeroed/bounded here before
    # it reaches d(loss)/d(render_from_camera). Primal unchanged.
    from pbrt_tpu.utils.math import clip_grad

    return Rays(o=clip_grad(o_r), d=clip_grad(d_r))


# --------------------------------------------------- light-tracing support
# (reference perspective.cu:89-176 pdf_we / we / sample_wi, used by BDPT)


def _camera_z_render(scene):
    return vm.normalize(tf.xform_vector(scene.render_from_camera,
                                        jnp.asarray([0.0, 0.0, 1.0])))


def we(scene, o_r, d_r):
    """Importance carried by ray (o,d) leaving the lens -> (we (R,), raster
    (R,2), valid (R,))."""
    z = _camera_z_render(scene)
    cos_t = vm.dot(d_r, z)
    fwd = cos_t > scene.camera_cos_total
    cos_safe = jnp.maximum(cos_t, 1e-6)
    focus_t = jnp.where(scene.camera_lens_radius > 0, scene.camera_focal_distance, 1.0)
    p_focus = o_r + d_r * (focus_t / cos_safe)[..., None]
    cam_from_render = jnp.linalg.inv(scene.render_from_camera)
    raster_from_cam = jnp.linalg.inv(scene.camera_from_raster)
    p_cam = tf.xform_point(cam_from_render, p_focus)
    p_raster = tf.xform_point(raster_from_cam, p_cam)
    rx = scene.camera_res[0].astype(jnp.float32)
    ry = scene.camera_res[1].astype(jnp.float32)
    inb = (
        (p_raster[..., 0] >= 0.0) & (p_raster[..., 0] < rx)
        & (p_raster[..., 1] >= 0.0) & (p_raster[..., 1] < ry)
    )
    lens_area = jnp.where(
        scene.camera_lens_radius > 0, jnp.pi * scene.camera_lens_radius**2, 1.0
    )
    val = 1.0 / (scene.camera_A * lens_area * cos_safe**4)
    valid = fwd & inb
    return jnp.where(valid, val, 0.0), p_raster[..., :2], valid


def pdf_we(scene, o_r, d_r):
    """-> (pdf_pos (R,), pdf_dir (R,))."""
    wval, _, valid = we(scene, o_r, d_r)
    z = _camera_z_render(scene)
    cos_t = jnp.maximum(vm.dot(d_r, z), 1e-6)
    lens_area = jnp.where(
        scene.camera_lens_radius > 0, jnp.pi * scene.camera_lens_radius**2, 1.0
    )
    pdf_pos = jnp.where(valid, 1.0 / lens_area, 0.0)
    pdf_dir = jnp.where(valid, 1.0 / (scene.camera_A * cos_t**3), 0.0)
    return pdf_pos, pdf_dir


def sample_wi(scene, p_ref, u2):
    """Sample a lens point seen from p_ref (t=1 BDPT strategies).
    -> (wi (R,3), we (R,), pdf (R,), p_raster (R,2), p_lens (R,3), valid)."""
    lens_r = scene.camera_lens_radius
    p_lens2 = lens_r * warps.sample_uniform_disk_concentric(u2)
    R = p_ref.shape[0]
    p_lens_cam = jnp.concatenate([p_lens2, jnp.zeros((R, 1), p_ref.dtype)], axis=-1)
    p_lens = tf.xform_point(scene.render_from_camera, p_lens_cam)
    n = _camera_z_render(scene)
    to_lens = p_lens - p_ref
    dist2 = vm.length_squared(to_lens)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    wi = to_lens / dist[..., None]
    lens_area = jnp.where(lens_r > 0, jnp.pi * lens_r**2, 1.0)
    pdf = dist2 / jnp.maximum(vm.absdot(n, wi) * lens_area, 1e-12)
    wv, p_raster, valid = we(scene, p_lens, -wi)
    valid &= dist2 > 0
    return wi, wv, pdf, p_raster, p_lens, valid
