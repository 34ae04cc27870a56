"""RGB -> sigmoid-polynomial spectrum fitting (Jakob & Hanika 2019).

Counterpart of reference spectrum_util/rgb_to_spectrum_data.cu:63-426, which
computes the table at every startup on a CPU thread pool. We instead fit it
once with batched-numpy Gauss–Newton (same algorithm: CIE-quadrature
residual in Lab space, finite-difference Jacobian, z-continuation) and cache
the result to pbrt_tpu/data/rgb2spec_srgb.npz.

The device-side lookup (`rgb_to_coefficients`) is differentiable jnp so
gradients flow from rendered pixels back to material RGB values.
"""
import functools
import pathlib

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.spectral import cie

RES = 64
CIE_SAMPLES = 95
CIE_FINE_SAMPLES = (CIE_SAMPLES - 1) * 3 + 1  # 283
LAMBDA_MIN, LAMBDA_MAX = 360.0, 830.0
_DATA = pathlib.Path(__file__).resolve().parent.parent / "data"
_CACHE = _DATA / "rgb2spec_srgb.npz"

XYZ_TO_SRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ]
)
SRGB_TO_XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)


def _smoothstep(x):
    return x * x * (3.0 - 2.0 * x)


def _sigmoid(x):
    return 0.5 * x / np.sqrt(1.0 + x * x) + 0.5


def _cie_5nm():
    """The 5nm CIE + D65 tables the fit integrates against — slices of our
    1nm data (values coincide with reference rgb_to_spectrum_data.h tables)."""
    x = cie.X()[::5]
    y = cie.Y()[::5]
    z = cie.Z()[::5]
    inter = np.load(_DATA / "cie.npz")["illum_d6500_interleaved"]
    lam_d, val_d = inter[0::2], inter[1::2]
    d65 = np.interp(cie.lambdas()[::5], lam_d, val_d)
    assert x.shape == (CIE_SAMPLES,)
    return x, y, z, d65


def _init_tables():
    """rgb_tbl (3, 283) and whitepoint, Simpson-3/8 quadrature
    (reference rgb_to_spectrum_data.cu:161-212)."""
    cx, cy, cz, d65 = _cie_5nm()
    h = (LAMBDA_MAX - LAMBDA_MIN) / (CIE_FINE_SAMPLES - 1)
    lam = LAMBDA_MIN + np.arange(CIE_FINE_SAMPLES) * h

    def interp5(tbl, x):
        xi = (x - LAMBDA_MIN) * (CIE_SAMPLES - 1) / (LAMBDA_MAX - LAMBDA_MIN)
        off = np.clip(xi.astype(int), 0, CIE_SAMPLES - 2)
        w = xi - off
        return (1 - w) * tbl[off] + w * tbl[off + 1]

    i = np.arange(CIE_FINE_SAMPLES)
    ratio = np.where(
        (i == 0) | (i == CIE_FINE_SAMPLES - 1), 1.0, np.where((i - 1) % 3 == 2, 2.0, 3.0)
    )
    weight = 3.0 / 8.0 * h * ratio

    xyz = np.stack([interp5(cx, lam), interp5(cy, lam), interp5(cz, lam)])  # (3, 283)
    I = interp5(d65, lam)
    rgb_tbl = XYZ_TO_SRGB @ (xyz * I * weight)  # (3, 283)
    whitepoint = (xyz * I * weight).sum(axis=1)  # (3,)
    # Normalize illuminant so whitepoint Y == 1 (the reference divides its
    # D65 table by a constant achieving the same; cu:213 N(x) macro).
    rgb_tbl /= whitepoint[1]
    whitepoint /= whitepoint[1]
    return lam, rgb_tbl, whitepoint


def _cie_lab(p_rgb, whitepoint):
    """Batched RGB -> Lab (reference cu:134-159). p_rgb: (..., 3)."""
    xyz = p_rgb @ SRGB_TO_XYZ.T
    t = xyz / whitepoint
    delta = 6.0 / 29.0
    f = np.where(t > delta**3, np.cbrt(np.maximum(t, 1e-300)), t / (3 * delta**2) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def _residual(coeffs, rgb, lam01, rgb_tbl, whitepoint):
    """Batched residual in Lab (reference cu:215-248). coeffs,rgb: (B,3)."""
    x = (coeffs[:, 0:1] * lam01 + coeffs[:, 1:2]) * lam01 + coeffs[:, 2:3]  # (B, 283)
    s = _sigmoid(x)
    out = s @ rgb_tbl.T  # (B, 3)
    return _cie_lab(rgb, whitepoint) - _cie_lab(out, whitepoint)


def _gauss_newton(coeffs, rgb, lam01, rgb_tbl, whitepoint, iters=15, eps=1e-4):
    """Batched GN with FD Jacobian (reference cu:251-305)."""
    B = coeffs.shape[0]
    for _ in range(iters):
        r = _residual(coeffs, rgb, lam01, rgb_tbl, whitepoint)  # (B,3)
        J = np.empty((B, 3, 3))
        for ci in range(3):
            cp = coeffs.copy()
            cp[:, ci] += eps
            cm = coeffs.copy()
            cm[:, ci] -= eps
            J[:, :, ci] = (
                _residual(cp, rgb, lam01, rgb_tbl, whitepoint)
                - _residual(cm, rgb, lam01, rgb_tbl, whitepoint)
            ) / (2 * eps)
        # Regularize rare singular systems instead of aborting.
        J += 1e-12 * np.eye(3)
        dx = np.linalg.solve(J, r[..., None])[..., 0]
        coeffs = coeffs - dx
        cmax = coeffs.max(axis=1, keepdims=True)
        scale = np.where(cmax > 200.0, 200.0 / np.maximum(cmax, 1e-300), 1.0)
        coeffs = coeffs * scale
    return coeffs


def fit_table(verbose=False):
    """Fit the full 3x64^3x3 coefficient table (reference cu:307-385)."""
    lam, rgb_tbl, whitepoint = _init_tables()
    lam01 = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    z_nodes = _smoothstep(_smoothstep(np.arange(RES) / (RES - 1)))

    # wavelength-space re-substitution constants (cu:319-327)
    c0, c1 = LAMBDA_MIN, 1.0 / (LAMBDA_MAX - LAMBDA_MIN)

    out = np.zeros((3, RES, RES, RES, 3))
    ij = np.stack(
        np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij"), axis=-1
    ).reshape(-1, 2)  # rows: (j, i)
    y_flat = ij[:, 0] / (RES - 1)
    x_flat = ij[:, 1] / (RES - 1)
    B = ij.shape[0]
    start = RES // 5

    for l in range(3):
        for sweep in (range(start, RES), range(start, -1, -1)):
            coeffs = np.zeros((B, 3))
            for k in sweep:
                b = z_nodes[k]
                rgb = np.empty((B, 3))
                rgb[:, l] = b
                rgb[:, (l + 1) % 3] = x_flat * b
                rgb[:, (l + 2) % 3] = y_flat * b
                coeffs = _gauss_newton(coeffs, rgb, lam01, rgb_tbl, whitepoint)
                A_, B_, C_ = coeffs[:, 0], coeffs[:, 1], coeffs[:, 2]
                packed = np.stack(
                    [
                        A_ * c1 * c1,
                        B_ * c1 - 2 * A_ * c0 * c1 * c1,
                        C_ - B_ * c0 * c1 + A_ * (c0 * c1) ** 2,
                    ],
                    axis=-1,
                )
                out[l, k, ij[:, 0], ij[:, 1]] = packed
            if verbose:
                print(f"l={l} sweep done")
    return z_nodes, out


def ensure_table():
    if not _CACHE.exists():
        z_nodes, coeffs = fit_table(verbose=True)
        np.savez_compressed(
            _CACHE, z_nodes=z_nodes.astype(np.float32), coeffs=coeffs.astype(np.float32)
        )
    return _CACHE


@functools.lru_cache(None)
def load_table():
    """(z_nodes (64,), coeffs (3, 64, 64, 64, 3)) float32 numpy."""
    ensure_table()
    d = np.load(_CACHE)
    return d["z_nodes"], d["coeffs"]


# ------------------------------------------------------------ numpy lookup


def rgb_to_coefficients_np(rgb):
    """Host-side (numpy) version of rgb_to_coefficients for the scene
    compiler: eager jnp here would dispatch dozens of tiny ops (and the 3MB
    table) through the TPU tunnel per call, taking seconds per material."""
    z_nodes, coeffs = load_table()
    rgb = np.clip(np.asarray(rgb, np.float32), 0.0, None)
    single = rgb.ndim == 1
    rgb = np.atleast_2d(rgb)

    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = np.where(r > g, np.where(r > b, 0, 2), np.where(g > b, 1, 2))
    z = np.take_along_axis(rgb, maxc[..., None], axis=-1)[..., 0]
    zsafe = np.maximum(z, 1e-12)
    x = np.take_along_axis(rgb, ((maxc + 1) % 3)[..., None], axis=-1)[..., 0] * (RES - 1) / zsafe
    y = np.take_along_axis(rgb, ((maxc + 2) % 3)[..., None], axis=-1)[..., 0] * (RES - 1) / zsafe

    xi = np.minimum(x.astype(np.int32), RES - 2)
    yi = np.minimum(y.astype(np.int32), RES - 2)
    zi = np.clip(np.searchsorted(z_nodes, z, side="left") - 1, 0, RES - 2)
    dx = x - xi
    dy = y - yi
    dz = (z - z_nodes[zi]) / np.maximum(z_nodes[zi + 1] - z_nodes[zi], 1e-12)

    def co(ddx, ddy, ddz):
        return coeffs[maxc, zi + ddz, yi + ddy, xi + ddx]

    def lerp(t, a, bb):
        return (1.0 - t[..., None]) * a + t[..., None] * bb

    c = lerp(
        dz,
        lerp(dy, lerp(dx, co(0, 0, 0), co(1, 0, 0)), lerp(dx, co(0, 1, 0), co(1, 1, 0))),
        lerp(dy, lerp(dx, co(0, 0, 1), co(1, 0, 1)), lerp(dx, co(0, 1, 1), co(1, 1, 1))),
    )
    uniform = (r == g) & (g == b)
    denom = np.sqrt(np.maximum(r * (1.0 - r), 1e-12))
    c_uniform = np.stack([np.zeros_like(r), np.zeros_like(r), (r - 0.5) / denom], axis=-1)
    c_uniform = np.where(
        (r <= 0.0)[..., None],
        np.array([0.0, 0.0, -1e30]),
        np.where((r >= 1.0)[..., None], np.array([0.0, 0.0, 1e30]), c_uniform),
    )
    out = np.where(uniform[..., None], c_uniform, c).astype(np.float32)
    return out[0] if single else out


# --------------------------------------------------------------- jnp lookup


def rgb_to_coefficients(rgb, z_nodes=None, coeffs=None):
    """RGB (..., 3) in [0, inf) -> sigmoid-poly coefficients (..., 3).

    Differentiable trilinear lookup (reference cu:388-426). Uniform-RGB
    special case handled exactly.
    """
    if z_nodes is None or coeffs is None:
        z_nodes, coeffs = load_table()
    z_nodes = jnp.asarray(z_nodes)
    coeffs = jnp.asarray(coeffs)
    rgb = jnp.clip(rgb, 0.0, None)

    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.where(r > g, jnp.where(r > b, 0, 2), jnp.where(g > b, 1, 2))
    z = jnp.take_along_axis(rgb, maxc[..., None], axis=-1)[..., 0]
    zsafe = jnp.maximum(z, 1e-12)
    x = jnp.take_along_axis(rgb, ((maxc + 1) % 3)[..., None], axis=-1)[..., 0] * (
        RES - 1
    ) / zsafe
    y = jnp.take_along_axis(rgb, ((maxc + 2) % 3)[..., None], axis=-1)[..., 0] * (
        RES - 1
    ) / zsafe

    xi = jnp.minimum(x.astype(jnp.int32), RES - 2)
    yi = jnp.minimum(y.astype(jnp.int32), RES - 2)
    zi = jnp.clip(jnp.searchsorted(z_nodes, z, side="left") - 1, 0, RES - 2)

    dx = x - xi
    dy = y - yi
    dz = (z - z_nodes[zi]) / jnp.maximum(z_nodes[zi + 1] - z_nodes[zi], 1e-12)

    def co(ddx, ddy, ddz):
        return coeffs[maxc, zi + ddz, yi + ddy, xi + ddx]  # (..., 3)

    def lerp(t, a, bb):
        return (1.0 - t[..., None]) * a + t[..., None] * bb

    c = lerp(
        dz,
        lerp(dy, lerp(dx, co(0, 0, 0), co(1, 0, 0)), lerp(dx, co(0, 1, 0), co(1, 1, 0))),
        lerp(dy, lerp(dx, co(0, 0, 1), co(1, 0, 1)), lerp(dx, co(0, 1, 1), co(1, 1, 1))),
    )

    # Uniform rgb: exact constant spectrum (reference cu:389-392)
    uniform = (r == g) & (g == b)
    denom = jnp.sqrt(jnp.maximum(r * (1.0 - r), 1e-12))
    c_uniform = jnp.stack(
        [jnp.zeros_like(r), jnp.zeros_like(r), (r - 0.5) / denom], axis=-1
    )
    # r==0 or r==1 -> +-inf c2 in the reference; clamp to huge finite
    c_uniform = jnp.where(
        (r <= 0.0)[..., None],
        jnp.array([0.0, 0.0, -1e30]),
        jnp.where((r >= 1.0)[..., None], jnp.array([0.0, 0.0, 1e30]), c_uniform),
    )
    return jnp.where(uniform[..., None], c_uniform, c)
