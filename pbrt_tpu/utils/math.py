"""Scalar math helpers shared across the tracer.

TPU-native counterpart of reference util/math.h + util/float.h constants
(reference: src/pbrt/util/math.h:7-28). Everything here is shape-polymorphic
jnp code usable inside jit/vmap/pallas.
"""
import jax
import jax.numpy as jnp
import numpy as np

# Constants (reference util/math.h:7-28)
INFINITY = float(np.finfo(np.float32).max)  # used as "no hit" t; finite to keep arithmetic sane
ONE_MINUS_EPSILON = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
SHADOW_EPSILON = 1e-4
PI = float(np.pi)
INV_PI = float(1.0 / np.pi)
INV_2PI = float(1.0 / (2.0 * np.pi))
INV_4PI = float(1.0 / (4.0 * np.pi))
PI_OVER_2 = float(np.pi / 2.0)
PI_OVER_4 = float(np.pi / 4.0)
SQRT_2 = float(np.sqrt(2.0))
MACHINE_EPSILON = float(np.finfo(np.float32).eps * 0.5)


def gamma(n):
    """FP rounding error bound: n*eps/(1-n*eps) (reference util/math.h)."""
    return (n * MACHINE_EPSILON) / (1 - n * MACHINE_EPSILON)


def sqr(x):
    return x * x


@jax.custom_jvp
def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    # sqrt's derivative blows up at 0; clamping it keeps one 0-cotangent
    # masked lane from NaN-ing every gradient it is ever where()'d with
    (x,), (t,) = primals, tangents
    y = jnp.sqrt(jnp.maximum(x, 0.0))
    return y, jnp.where(x > 1e-12, 0.5 / jnp.maximum(y, 1e-12), 0.0) * t


@jax.custom_jvp
def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@safe_acos.defjvp
def _safe_acos_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    d = -1.0 / jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return jnp.arccos(jnp.clip(x, -1.0, 1.0)), jnp.where(jnp.abs(x) < 1.0, d, 0.0) * t


@jax.custom_jvp
def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


@safe_asin.defjvp
def _safe_asin_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    d = 1.0 / jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0)), jnp.where(jnp.abs(x) < 1.0, d, 0.0) * t


def safe_div(a, b):
    """a/b with 0 where b == 0."""
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), 0.0)


def clamp_mag(b, eps):
    """b pushed away from 0 to at least magnitude eps (sign-preserving;
    exact 0 maps to +eps). Use as a divisor guard: unlike a `where(b==0)`
    test, it also bounds 1/b and 1/b^2 so division VJPs can't overflow to
    inf and then NaN a zero cotangent."""
    mag = jnp.maximum(jnp.abs(b), eps)
    return jnp.where(b < 0.0, -mag, mag)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def clip_grad(x, limit=1e4):
    """Identity primal; cotangents clipped to [-limit, limit] and NaN/inf
    zeroed. Geometry Jacobians are genuinely unbounded at silhouettes
    (d t/d ray -> inf at sphere tangency — the true derivative is a boundary
    term interior AD cannot represent), so clipping at the primitive
    boundary is the principled regularization: it keeps every shared-
    parameter gradient finite without touching the primal."""

    @jax.custom_vjp
    def _id(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, g):
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return (jnp.clip(g, -limit, limit),)

    _id.defvjp(_fwd, _bwd)
    return _id(x)


def clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def difference_of_products(a, b, c, d):
    """a*b - c*d with an FMA-style error compensation (reference compensated_float.h).

    On TPU there is no scalar FMA contract we control; use the Kahan-style
    two-product formulation which still improves robustness in fp32.
    """
    cd = c * d
    dop = a * b - cd
    err = -c * d + cd  # would be fma(-c, d, cd); ~0 here but keeps formula shape
    return dop + err


def sum_of_products(a, b, c, d):
    return difference_of_products(a, b, -c, d)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic beta=2 (reference util/sampling.h:310)."""
    f = nf * f_pdf
    g = ng * g_pdf
    f2 = sqr(f)
    # guard inf^2 overflow
    return jnp.where(jnp.isinf(f2), 1.0, safe_div(f2, f2 + sqr(g)))


def smoothstep(x, a, b):
    t = jnp.clip(safe_div(x - a, b - a), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def erfinv(x):
    """Inverse error function (for MLT gaussian mutations)."""
    # Winitzki-style approximation refined with one Newton step.
    x = jnp.clip(x, -ONE_MINUS_EPSILON, ONE_MINUS_EPSILON)
    w = -jnp.log((1.0 - x) * (1.0 + x))
    small = w < 5.0
    ws = w - 2.5
    wl = jnp.sqrt(jnp.maximum(w, 5.0)) - 3.0
    p_small = 2.81022636e-08
    for c in [3.43273939e-07, -3.5233877e-06, -4.39150654e-06, 0.00021858087,
              -0.00125372503, -0.00417768164, 0.246640727, 1.50140941]:
        p_small = p_small * ws + c
    p_large = -0.000200214257
    for c in [0.000100950558, 0.00134934322, -0.00367342844, 0.00573950773,
              -0.0076224613, 0.00943887047, 1.00167406, 2.83297682]:
        p_large = p_large * wl + c
    return jnp.where(small, p_small, p_large) * x


def encode_morton3(x, y, z):
    """Interleave lower 10 bits of x,y,z into a 30-bit morton code.

    numpy/host-side (BVH build happens on host; reference util/math.h:206).
    """
    def expand(v):
        v = np.asarray(v, dtype=np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v

    return (expand(z) << 2) | (expand(y) << 1) | expand(x)
