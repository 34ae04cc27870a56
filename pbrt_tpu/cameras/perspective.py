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
    return Rays(o=o_r, d=d_r)
