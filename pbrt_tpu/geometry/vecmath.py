"""Vector math over `(..., 3)` jnp arrays — the SoA replacement for the
reference's Vector3f/Point3f/Normal3f classes (src/pbrt/euclidean_space/).

There are no vector *types*: points, vectors and normals are all `(..., 3)`
float arrays, and transforms distinguish them by which function you call
(`xform_point` / `xform_vector` / `xform_normal`). This keeps everything a
plain pytree leaf that vmap/jit/pallas handle natively.
"""
import jax.numpy as jnp

from pbrt_tpu.utils.math import safe_sqrt, safe_acos, safe_asin


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return dot(v, v)


def length(v):
    # safe_sqrt: same primal (arg is >= 0) but with the derivative clamped
    # at 0 — a zero-length masked lane must not NaN gradients via 0 * inf
    return safe_sqrt(length_squared(v))


def normalize(v):
    # guard 1e-12, not 1e-30: the VJP of 1/m contains 1/m^2, which must
    # not overflow f32 when a degenerate zero vector comes through
    return v / jnp.maximum(length(v), 1e-12)[..., None]


def distance(a, b):
    return length(a - b)


def face_forward(n, v):
    """Flip n to the hemisphere of v (reference euclidean_space/vector3.h)."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def abs_components(v):
    return jnp.abs(v)


def max_component_index(v):
    return jnp.argmax(v, axis=-1)


def permute(v, idx):
    """Gather components of v by integer index array idx (..., 3)."""
    return jnp.take_along_axis(v, idx, axis=-1)


def coordinate_system(v1):
    """Build an orthonormal basis around unit v1 (Duff et al. 2017;
    reference euclidean_space/vector3.h `coordinate_system`)."""
    z = v1[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack(
        [1.0 + sign * v1[..., 0] ** 2 * a, sign * b, -sign * v1[..., 0]], axis=-1
    )
    v3 = jnp.stack([b, sign + v1[..., 1] ** 2 * a, -v1[..., 1]], axis=-1)
    return v2, v3


def gram_schmidt(v, w):
    return v - dot(v, w)[..., None] * w


def angle_between(a, b):
    """Numerically-stable angle between unit vectors."""
    small = dot(a, b) < 0
    val = jnp.where(
        small,
        jnp.pi - 2.0 * safe_asin(length(a + b) / 2.0),
        2.0 * safe_asin(length(b - a) / 2.0),
    )
    return val


def spherical_triangle_area(a, b, c):
    return jnp.abs(
        2.0 * jnp.arctan2(dot(a, cross(b, c)), 1.0 + dot(a, b) + dot(a, c) + dot(b, c))
    )


# ----------------------------------------------------------------------------
# Spherical coordinates


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack(
        [
            jnp.clip(sin_theta, -1.0, 1.0) * jnp.cos(phi),
            jnp.clip(sin_theta, -1.0, 1.0) * jnp.sin(phi),
            jnp.clip(cos_theta, -1.0, 1.0),
        ],
        axis=-1,
    )


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] ** 2


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return safe_sqrt(sin2_theta(w))


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-12)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, 1e-12), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, 1e-12), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


# ----------------------------------------------------------------------------
# Frames (reference euclidean_space/frame.h)


def frame_from_z(z):
    """Orthonormal frame with given unit z; returns (x, y, z)."""
    z = normalize(z)
    x, y = coordinate_system(z)
    return x, y, z


def frame_from_xz(x, z):
    y = cross(z, x)
    return x, y, z


def to_local(x, y, z, v):
    return jnp.stack([dot(v, x), dot(v, y), dot(v, z)], axis=-1)


def from_local(x, y, z, v):
    return v[..., 0:1] * x + v[..., 1:2] * y + v[..., 2:3] * z
