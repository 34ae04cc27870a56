"""Pixel reconstruction filters: box, triangle, gaussian, mitchell.

Counterpart of reference filters/ (box.h, triangle.h, gaussian.cu,
mitchell.cu) + filter_sampler.{h,cu} + distribution/piecewise_constant_{1,2}d.h.

TPU design: the FilterSampler's piecewise-constant 2D distribution is
tabulated and CDF-integrated on the host at scene-compile time (numpy);
the device side is a pair of vectorized `searchsorted` inversions — no
per-lane control flow. Box and triangle have closed-form samplers
(weight == 1), matching the reference (box.cu / triangle.cu sample()).

Mitchell's kernel goes negative, so the table keeps the *signed* f while
the CDFs are built over |f| (piecewise_constant_1d.h:24); the returned
weight is f[pi]/pdf (filter_sampler.h:24-30) and can be negative.
"""
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

FILTER_DEFAULT_RADIUS = {
    "box": 0.5,
    "triangle": 2.0,
    "gaussian": 1.5,
    "mitchell": 2.0,
}


class FilterTables(NamedTuple):
    """Device-side filter data (all shapes host-static)."""

    radius: jnp.ndarray     # (2,) f32
    f: jnp.ndarray          # (ny, nx) signed filter values at cell centers
    cond_cdf: jnp.ndarray   # (ny, nx+1)
    cond_func: jnp.ndarray  # (ny, nx) |f|
    cond_int: jnp.ndarray   # (ny,) row integrals
    marg_cdf: jnp.ndarray   # (ny+1,)
    marg_int: jnp.ndarray   # ()
    integral: jnp.ndarray   # () filter integral (for film scaling if needed)


def _mitchell_1d(x, b, c):
    x = np.abs(x)
    y1 = ((12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2 + (6 - 2 * b)) / 6.0
    y2 = ((-b - 6 * c) * x**3 + (6 * b + 30 * c) * x**2 + (-12 * b - 48 * c) * x
          + (8 * b + 24 * c)) / 6.0
    return np.where(x <= 1, y1, np.where(x <= 2, y2, 0.0))


def _gaussian(x, sigma):
    return np.exp(-(x * x) / (2 * sigma * sigma)) / np.sqrt(2 * np.pi * sigma * sigma)


def _gaussian_integral(x0, x1, sigma):
    from math import erf
    s = sigma * np.sqrt(2.0)
    return 0.5 * (erf(-x0 / s) - erf(-x1 / s))


def evaluate_np(kind, p, params):
    """Host filter evaluation at (..., 2) points (reference evaluate())."""
    rx, ry = params["radius"]
    x, y = p[..., 0], p[..., 1]
    if kind == "box":
        return ((np.abs(x) <= rx) & (np.abs(y) <= ry)).astype(np.float64)
    if kind == "triangle":
        return np.maximum(0.0, rx - np.abs(x)) * np.maximum(0.0, ry - np.abs(y))
    if kind == "gaussian":
        s = params["sigma"]
        ex, ey = _gaussian(rx, s), _gaussian(ry, s)
        return np.maximum(0.0, _gaussian(x, s) - ex) * np.maximum(0.0, _gaussian(y, s) - ey)
    if kind == "mitchell":
        b, c = params["b"], params["c"]
        return _mitchell_1d(2 * x / rx, b, c) * _mitchell_1d(2 * y / ry, b, c)
    raise ValueError(kind)


def _pc1d_cdf(func_abs, lo, hi):
    """PiecewiseConstant1D CDF build (piecewise_constant_1d.h:27-46).
    func_abs: (..., n) -> (cdf (..., n+1), func_int (...,))."""
    n = func_abs.shape[-1]
    steps = func_abs * (hi - lo) / n
    cdf = np.concatenate(
        [np.zeros(func_abs.shape[:-1] + (1,)), np.cumsum(steps, axis=-1)], axis=-1
    )
    func_int = cdf[..., -1].copy()
    uniform = np.linspace(0.0, 1.0, n + 1)
    zero = func_int <= 0
    cdf = np.where(
        zero[..., None], np.broadcast_to(uniform, cdf.shape), cdf / np.maximum(func_int, 1e-30)[..., None]
    )
    return cdf, func_int


def build_filter(spec: dict):
    """Host: filter spec dict (from SceneBuilder) -> (kind, params, FilterTables).

    Table resolution = 32 samples per unit radius (filter_sampler.cu:9-11).
    """
    kind = spec.get("type", "mitchell")
    if kind not in FILTER_DEFAULT_RADIUS:
        raise ValueError(f"unknown filter {kind!r}")
    default_r = FILTER_DEFAULT_RADIUS[kind]
    # the builder stores None for absent radius params — treat as default
    rx = float(spec.get("xradius") if spec.get("xradius") is not None else default_r)
    ry = float(spec.get("yradius") if spec.get("yradius") is not None else default_r)
    params = {"radius": (rx, ry)}
    if kind == "gaussian":
        params["sigma"] = float(spec.get("sigma", 0.5))
    if kind == "mitchell":
        params["b"] = float(spec.get("B", 1.0 / 3.0))
        params["c"] = float(spec.get("C", 1.0 / 3.0))

    if kind in ("box", "triangle"):
        # analytic samplers; emit 1x1 dummy tables so SceneArrays stays uniform
        f = np.ones((1, 1))
        cond_cdf = np.array([[0.0, 1.0]])
        cond_func = np.ones((1, 1))
        cond_int = np.ones((1,))
        marg_cdf = np.array([0.0, 1.0])
        marg_int = 1.0
        integral = {"box": 4 * rx * ry, "triangle": rx * rx * ry * ry}[kind]
    else:
        nx, ny = max(int(32 * rx), 2), max(int(32 * ry), 2)
        xs = -rx + (np.arange(nx) + 0.5) / nx * (2 * rx)
        ys = -ry + (np.arange(ny) + 0.5) / ny * (2 * ry)
        p = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (ny, nx, 2)
        f = evaluate_np(kind, p, params)
        cond_func = np.abs(f)
        cond_cdf, cond_int = _pc1d_cdf(cond_func, -rx, rx)
        marg_cdf, marg_int = _pc1d_cdf(cond_int[None], -ry, ry)
        marg_cdf, marg_int = marg_cdf[0], float(marg_int[0])
        if kind == "gaussian":
            s = params["sigma"]
            ex, ey = _gaussian(rx, s), _gaussian(ry, s)
            integral = (_gaussian_integral(-rx, rx, s) - 2 * rx * ex) * (
                _gaussian_integral(-ry, ry, s) - 2 * ry * ey
            )
        else:
            integral = rx * ry / 4.0  # mitchell.h get_integral

    tables = FilterTables(
        radius=jnp.asarray([rx, ry], jnp.float32),
        f=jnp.asarray(f, jnp.float32),
        cond_cdf=jnp.asarray(cond_cdf, jnp.float32),
        cond_func=jnp.asarray(cond_func, jnp.float32),
        cond_int=jnp.asarray(cond_int, jnp.float32),
        marg_cdf=jnp.asarray(marg_cdf, jnp.float32),
        marg_int=jnp.asarray(marg_int, jnp.float32),
        integral=jnp.asarray(integral, jnp.float32),
    )
    return kind, params, tables


# ------------------------------------------------------------------ device


def _sample_tent(u, r):
    """Inverse-CDF tent sample on [-r, r] (pbrt SampleTent semantics)."""
    below = u < 0.5
    u0 = jnp.clip(2.0 * u, 1e-9, 1.0)
    u1 = jnp.clip(2.0 * (u - 0.5), 0.0, 1.0 - 1e-9)
    return jnp.where(below, -r + r * jnp.sqrt(u0), r * (1.0 - jnp.sqrt(1.0 - u1)))


def _pc1d_sample(cdf, func, func_int, u, lo, hi):
    """Vectorized PiecewiseConstant1D::sample (piecewise_constant_1d.h:54-76).
    cdf: (n+1,) or (R, n+1); func: (n,) or (R, n). Returns (x, pdf, idx)."""
    n = func.shape[-1]
    if cdf.ndim == 1:
        o = jnp.searchsorted(cdf, u, side="right") - 1
    else:
        # per-row searchsorted via comparison-count (n is small: <=64ish)
        o = jnp.sum(cdf <= u[..., None], axis=-1) - 1
    o = jnp.clip(o, 0, n - 1)
    c0 = jnp.take_along_axis(cdf, o[..., None], axis=-1)[..., 0] if cdf.ndim > 1 else cdf[o]
    c1 = jnp.take_along_axis(cdf, o[..., None] + 1, axis=-1)[..., 0] if cdf.ndim > 1 else cdf[o + 1]
    du = jnp.where(c1 - c0 > 0, (u - c0) / jnp.maximum(c1 - c0, 1e-30), 0.0)
    fo = jnp.take_along_axis(func, o[..., None], axis=-1)[..., 0] if func.ndim > 1 else func[o]
    pdf = jnp.where(func_int > 0, fo / jnp.maximum(func_int, 1e-30), 0.0)
    x = lo + (o + du) / n * (hi - lo)
    return x, pdf, o


def sample(tables: FilterTables, kind: str, u2):
    """Device: u2 (R,2) in [0,1)^2 -> (p (R,2), weight (R,)).

    Mirrors Filter::sample for each variant; kind is host-static.
    """
    rx, ry = tables.radius[0], tables.radius[1]
    if kind == "box":
        p = jnp.stack([(2.0 * u2[..., 0] - 1.0) * rx, (2.0 * u2[..., 1] - 1.0) * ry], -1)
        return p, jnp.ones(u2.shape[:-1])
    if kind == "triangle":
        p = jnp.stack([_sample_tent(u2[..., 0], rx), _sample_tent(u2[..., 1], ry)], -1)
        return p, jnp.ones(u2.shape[:-1])
    # tabulated 2D inversion (piecewise_constant_2d.h sample): marginal in y,
    # conditional in x
    y, pdf_y, yi = _pc1d_sample(
        tables.marg_cdf, tables.cond_int, tables.marg_int, u2[..., 1], -ry, ry
    )
    row_cdf = tables.cond_cdf[yi]        # (R, nx+1)
    row_func = tables.cond_func[yi]      # (R, nx)
    row_int = tables.cond_int[yi]
    x, pdf_x, xi = _pc1d_sample(row_cdf, row_func, row_int, u2[..., 0], -rx, rx)
    pdf = pdf_x * pdf_y
    f_signed = tables.f[yi, xi]
    w = jnp.where(pdf > 0, f_signed / jnp.maximum(pdf, 1e-30), 0.0)
    return jnp.stack([x, y], -1), w
