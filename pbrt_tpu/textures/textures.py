"""Texture system: flat node tables + branchless device evaluation.

Counterpart of reference textures/ + base/float_texture.cu + base/
spectrum_texture.cu. The reference dispatches through tagged-union virtual
calls per hit; here every texture is a row in a fixed SoA node table and
evaluation is a masked dense combine over the (few) node types — the same
lane-dispatch pattern as the BxDF layer.

Node graph: combinator nodes (scale/mix/checkerboard/directionmix) reference
*leaf* children (constant or imagemap). Deeper nests of combinators are
rejected at build time — no known pbrt scene nests them, and a fixed depth
keeps device evaluation a straight-line program.

Images live in one flat atlas `(total_texels, 3)` + per-image
(offset, width, height, wrap): bilerp = 4 gathers (gpu_image.cu:272-294).
RGB->spectrum uplift happens after bilerp like the reference
(spectrum_image_texture.cu:20-28: scale, invert, clamp, RGBAlbedoSpectrum).
"""
import os
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

# node types
TEX_CONST = 0
TEX_IMAGE = 1
TEX_SCALE = 2
TEX_MIX = 3
TEX_CHECKER = 4
TEX_DIRMIX = 5

# wrap modes (gpu_image.cu remap_pixel_coord)
WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_BLACK = 2
WRAP_OCTAHEDRAL = 3

_WRAP_NAMES = {"repeat": WRAP_REPEAT, "clamp": WRAP_CLAMP, "black": WRAP_BLACK,
               "octahedralsphere": WRAP_OCTAHEDRAL}


# ------------------------------------------------------------- host specs


@dataclass
class TexSpec:
    """One texture node as parsed by the SceneBuilder (host only)."""

    kind: str                       # constant/imagemap/scale/mix/checkerboard/directionmix
    is_spectrum: bool
    # constant
    rgb: Optional[np.ndarray] = None     # spectrum constant
    value: float = 0.0                   # float constant
    # imagemap
    filename: str = ""
    image_scale: float = 1.0
    invert: bool = False
    wrap: str = "repeat"
    # mapping (reference textures/texture_mapping_2d: uv/spherical/
    # cylindrical/planar; non-uv mappings derive (u,v) from the hit position
    # in texture space)
    mapping: str = "uv"
    uscale: float = 1.0
    vscale: float = 1.0
    udelta: float = 0.0
    vdelta: float = 0.0
    v1: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.0, 0.0]))
    v2: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    tex_from_world: np.ndarray = field(default_factory=lambda: np.eye(4))
    # combinators: children are indices into the same spec list (or -1)
    tex1: int = -1
    tex2: int = -1
    amount: float = 0.5
    amount_tex: int = -1            # float texture for mix amount / scale
    dir: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))


class ImageAtlas(NamedTuple):
    data: jnp.ndarray     # (TOTAL, 3) f32 linear rgb
    offset: jnp.ndarray   # (NI,) i32
    width: jnp.ndarray    # (NI,) i32
    height: jnp.ndarray   # (NI,) i32
    wrap: jnp.ndarray     # (NI,) i32


class TexArrays(NamedTuple):
    """Device texture node table (spectrum + float nodes share the table;
    spectrum-ness is a property of the referencing slot)."""

    type: jnp.ndarray      # (NT,) i32
    coeffs: jnp.ndarray    # (NT,3) sigmoid coeffs (spectrum const)
    cscale: jnp.ndarray    # (NT,) const scale (unbounded rgb) / float value
    img: jnp.ndarray       # (NT,) i32 image index or -1
    img_scale: jnp.ndarray  # (NT,)
    img_invert: jnp.ndarray  # (NT,) bool
    child: jnp.ndarray     # (NT,2) i32
    amount: jnp.ndarray    # (NT,)
    amount_tex: jnp.ndarray  # (NT,) i32 float-texture node for amount
    uvmap: jnp.ndarray     # (NT,4) su, sv, du, dv
    mapkind: jnp.ndarray   # (NT,) i32: 0 uv, 1 spherical, 2 cylindrical, 3 planar
    tex_from_render: jnp.ndarray  # (NT,4,4) position -> texture space
    map_v1: jnp.ndarray    # (NT,3) planar s axis
    map_v2: jnp.ndarray    # (NT,3) planar t axis
    dir: jnp.ndarray       # (NT,3)
    imgs: ImageAtlas


MAP_UV = 0
MAP_SPHERICAL = 1
MAP_CYLINDRICAL = 2
MAP_PLANAR = 3
_MAP_NAMES = {"uv": MAP_UV, "spherical": MAP_SPHERICAL,
              "cylindrical": MAP_CYLINDRICAL, "planar": MAP_PLANAR}


def build_tex_arrays(specs, scene_root, cam_pos=None):
    """Host: list[TexSpec] -> TexArrays. Loads images, fits rgb coeffs.
    cam_pos: render-space origin in world coords (geometry is emitted in
    camera-world space; the texture transform must map FROM that space)."""
    from pbrt_tpu.spectral import rgb2spec
    from pbrt_tpu.textures.image import load_image

    NT = len(specs)  # 0-length table = static 'no textures' marker
    f32 = np.float32
    ttype = np.zeros(NT, np.int32)
    coeffs = np.zeros((NT, 3), f32)
    cscale = np.zeros(NT, f32)
    img = np.full(NT, -1, np.int32)
    img_scale = np.ones(NT, f32)
    img_invert = np.zeros(NT, bool)
    child = np.full((NT, 2), -1, np.int32)
    amount = np.full(NT, 0.5, f32)
    amount_tex = np.full(NT, -1, np.int32)
    uvmap = np.tile(np.array([1.0, 1.0, 0.0, 0.0], f32), (NT, 1))
    tdir = np.tile(np.array([0.0, 1.0, 0.0], f32), (NT, 1))
    mapkind = np.zeros(NT, np.int32)
    tex_from_render = np.tile(np.eye(4, dtype=f32), (max(NT, 1), 1, 1))[:NT]
    map_v1 = np.tile(np.array([1.0, 0.0, 0.0], f32), (NT, 1))
    map_v2 = np.tile(np.array([0.0, 1.0, 0.0], f32), (NT, 1))
    world_from_render = np.eye(4)
    if cam_pos is not None:
        world_from_render[:3, 3] = np.asarray(cam_pos)

    # image files -> atlas
    files = []
    file_index = {}

    def image_id(fn):
        path = fn if os.path.isabs(fn) else os.path.join(scene_root, fn)
        if path not in file_index:
            file_index[path] = len(files)
            files.append(path)
        return file_index[path]

    kind_codes = {"constant": TEX_CONST, "imagemap": TEX_IMAGE, "scale": TEX_SCALE,
                  "mix": TEX_MIX, "checkerboard": TEX_CHECKER, "directionmix": TEX_DIRMIX}
    wraps = []
    for i, s in enumerate(specs):
        ttype[i] = kind_codes[s.kind]
        uvmap[i] = [s.uscale, s.vscale, s.udelta, s.vdelta]
        mapkind[i] = _MAP_NAMES[getattr(s, "mapping", "uv")]
        tex_from_render[i] = (s.tex_from_world @ world_from_render).astype(f32)
        map_v1[i] = s.v1
        map_v2[i] = s.v2
        if s.kind == "constant":
            if s.is_spectrum and s.rgb is not None:
                rgb = np.asarray(s.rgb, np.float64)
                m = float(rgb.max())
                if m <= 1.0:
                    coeffs[i] = rgb2spec.rgb_to_coefficients_np(np.clip(rgb, 0, 1))
                    cscale[i] = 1.0
                else:
                    # unbounded rgb: normalize by 2*max (rgb_unbounded_spectrum)
                    coeffs[i] = rgb2spec.rgb_to_coefficients_np(rgb / (2 * m))
                    cscale[i] = 2 * m
            else:
                cscale[i] = s.value
        elif s.kind == "imagemap":
            img[i] = image_id(s.filename)
            img_scale[i] = s.image_scale
            img_invert[i] = s.invert
        else:
            child[i] = [s.tex1, s.tex2]
            amount[i] = s.amount
            amount_tex[i] = s.amount_tex
            tdir[i] = np.asarray(s.dir) / max(np.linalg.norm(s.dir), 1e-9)
            for c in (s.tex1, s.tex2, s.amount_tex):
                if c >= 0 and ttype[c] not in (TEX_CONST, TEX_IMAGE) and c < i:
                    raise ValueError(
                        "nested combinator textures unsupported (combinators may "
                        "only reference constant/imagemap leaves)"
                    )

    # load + pack images
    datas, offsets, widths, heights = [], [], [], []
    total = 0
    for i, s in enumerate(specs):
        if s.kind == "imagemap":
            wraps.append(_WRAP_NAMES.get(s.wrap, WRAP_REPEAT))
    wrap_by_file = np.zeros(max(1, len(files)), np.int32)
    for i, s in enumerate(specs):
        if s.kind == "imagemap":
            wrap_by_file[img[i]] = _WRAP_NAMES.get(s.wrap, WRAP_REPEAT)
    for path in files:
        im = load_image(path)
        h, w, _ = im.shape
        datas.append(im.reshape(-1, 3))
        offsets.append(total)
        widths.append(w)
        heights.append(h)
        total += h * w
    if not files:
        datas = [np.zeros((1, 3), f32)]
        offsets, widths, heights = [0], [1], [1]

    atlas = ImageAtlas(
        data=jnp.asarray(np.concatenate(datas), jnp.float32),
        offset=jnp.asarray(np.array(offsets, np.int32)),
        width=jnp.asarray(np.array(widths, np.int32)),
        height=jnp.asarray(np.array(heights, np.int32)),
        wrap=jnp.asarray(wrap_by_file),
    )
    return TexArrays(
        type=jnp.asarray(ttype),
        coeffs=jnp.asarray(coeffs),
        cscale=jnp.asarray(cscale),
        img=jnp.asarray(img),
        img_scale=jnp.asarray(img_scale),
        img_invert=jnp.asarray(img_invert),
        child=jnp.asarray(child),
        amount=jnp.asarray(amount),
        amount_tex=jnp.asarray(amount_tex),
        uvmap=jnp.asarray(uvmap),
        mapkind=jnp.asarray(mapkind),
        tex_from_render=jnp.asarray(tex_from_render),
        map_v1=jnp.asarray(map_v1),
        map_v2=jnp.asarray(map_v2),
        dir=jnp.asarray(tdir),
        imgs=atlas,
    )


# ------------------------------------------------------------- device


def _wrap_coord(c, n, wrap):
    """Integer pixel coord wrap (gpu_image.cu:20-75). c,(R,) i32; n (R,) i32."""
    rep = jnp.mod(c, jnp.maximum(n, 1))
    clp = jnp.clip(c, 0, n - 1)
    out = jnp.where(wrap == WRAP_REPEAT, rep, clp)
    oob = (c < 0) | (c >= n)
    black = (wrap == WRAP_BLACK) & oob
    return out, black


def image_bilerp(imgs: ImageAtlas, img_idx, st):
    """Bilinear fetch (gpu_image.cu:272-294). img_idx (R,), st (R,2) -> (R,3)."""
    idx = jnp.maximum(img_idx, 0)
    w = imgs.width[idx]
    h = imgs.height[idx]
    off = imgs.offset[idx]
    wrap = imgs.wrap[idx]

    x = st[..., 0] * w.astype(jnp.float32) - 0.5
    y = st[..., 1] * h.astype(jnp.float32) - 0.5
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    dx = (x - xi.astype(jnp.float32))[..., None]
    dy = (y - yi.astype(jnp.float32))[..., None]

    def fetch(cx, cy):
        px, bx = _wrap_coord(cx, w, wrap)
        py, by = _wrap_coord(cy, h, wrap)
        v = imgs.data[off + py * w + px]
        return jnp.where((bx | by)[..., None], 0.0, v)

    v00 = fetch(xi, yi)
    v10 = fetch(xi + 1, yi)
    v01 = fetch(xi, yi + 1)
    v11 = fetch(xi + 1, yi + 1)
    return ((1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v10
            + (1 - dx) * dy * v01 + dx * dy * v11)


def _mapped_uv(tex: TexArrays, node, uv, p=None):
    """(u, v) per the node's mapping (reference texture_mapping_2d):
    uv (scaled/offset surface uv), or spherical/cylindrical/planar derived
    from the hit position p mapped into the node's texture space."""
    m = tex.uvmap[node]
    st = jnp.stack(
        [uv[..., 0] * m[..., 0] + m[..., 2], uv[..., 1] * m[..., 1] + m[..., 3]], -1
    )
    if p is None:
        return st
    mk = tex.mapkind[node]
    M = tex.tex_from_render[node]                    # (R,4,4)
    pt = jnp.einsum("rij,rj->ri", M[:, :3, :3], p) + M[:, :3, 3]
    r_len = jnp.sqrt(jnp.maximum(jnp.sum(pt * pt, -1), 1e-20))
    theta = jnp.arccos(jnp.clip(pt[..., 2] / r_len, -1.0, 1.0))
    phi = jnp.arctan2(pt[..., 1], pt[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    sph = jnp.stack([theta / jnp.pi, phi / (2.0 * jnp.pi)], -1)
    cyl = jnp.stack([phi / (2.0 * jnp.pi), pt[..., 2]], -1)
    pla = jnp.stack(
        [jnp.sum(pt * tex.map_v1[node], -1) + m[..., 2],
         jnp.sum(pt * tex.map_v2[node], -1) + m[..., 3]], -1)
    out = jnp.where((mk == MAP_SPHERICAL)[..., None], sph, st)
    out = jnp.where((mk == MAP_CYLINDRICAL)[..., None], cyl, out)
    out = jnp.where((mk == MAP_PLANAR)[..., None], pla, out)
    return out


def _leaf_rgb_or_value(tex: TexArrays, node, uv, p=None, duv=None):
    """Evaluate a leaf node to (rgb (R,3), const_coeffs (R,3), cscale (R,),
    is_image (R,)). Combinators must not reach here (build-time checked).

    duv (R,4) = (dudx, dvdx, dudy, dvdy) screen-space uv footprints
    (cameras/differentials.duv_dxy): image fetches average FOUR bilerp
    taps over the footprint parallelogram — a real (single-level) box
    filter where the reference's MIPMap parses but ignores the footprint
    entirely (textures/mipmap.cu:22-25). uv-mapped nodes only; derived
    mappings (spherical/planar) stay point-sampled."""
    node_c = jnp.maximum(node, 0)
    t = tex.type[node_c]
    st = _mapped_uv(tex, node_c, uv, p)
    st = st.at[..., 1].set(1.0 - st[..., 1])  # flip v (spectrum_image_texture.cu:18)

    def img_at(st_):
        rgb_ = (tex.img_scale[node_c][..., None]
                * image_bilerp(tex.imgs, tex.img[node_c], st_))
        rgb_ = jnp.where(tex.img_invert[node_c][..., None], 1.0 - rgb_, rgb_)
        return jnp.clip(rgb_, 0.0, None)

    if duv is None:
        rgb = img_at(st)
    else:
        m = tex.uvmap[node_c]
        is_uv = (tex.mapkind[node_c] == MAP_UV)[..., None].astype(jnp.float32)
        gx = jnp.stack([duv[..., 0] * m[..., 0],
                        duv[..., 1] * m[..., 1]], -1) * is_uv
        gy = jnp.stack([duv[..., 2] * m[..., 0],
                        duv[..., 3] * m[..., 1]], -1) * is_uv
        rgb = 0.25 * (img_at(st + 0.25 * gx + 0.25 * gy)
                      + img_at(st + 0.25 * gx - 0.25 * gy)
                      + img_at(st - 0.25 * gx + 0.25 * gy)
                      + img_at(st - 0.25 * gx - 0.25 * gy))
    return t, rgb, tex.coeffs[node_c], tex.cscale[node_c]


def _leaf_spectrum(tex: TexArrays, node, uv, lam, p=None, duv=None):
    """Leaf -> spectral values (R,4). Missing node (<0) -> 0."""
    from pbrt_tpu.spectral import rgb2spec, spectra

    t, rgb, coeffs, cscale = _leaf_rgb_or_value(tex, node, uv, p, duv)
    img_coeffs = rgb2spec.rgb_to_coefficients(jnp.clip(rgb, 0.0, 1.0))
    c = jnp.where((t == TEX_IMAGE)[..., None], img_coeffs, coeffs)
    scale = jnp.where(t == TEX_IMAGE, 1.0, cscale)
    val = spectra.sigmoid_polynomial(c, lam) * scale[..., None]
    return jnp.where((node < 0)[..., None], 0.0, val)


def _leaf_float(tex: TexArrays, node, uv, default=0.0, p=None, duv=None):
    t, rgb, _, cscale = _leaf_rgb_or_value(tex, node, uv, p, duv)
    v = jnp.where(t == TEX_IMAGE, rgb[..., 0], cscale)
    return jnp.where(node < 0, default, v)


def eval_spectrum(tex: TexArrays, node, uv, ns, lam, p=None, duv=None):
    """Evaluate spectrum texture node per lane.

    node (R,) i32; uv (R,2); ns (R,3) shading normal (directionmix);
    lam (R,4); p (R,3) hit position (non-uv mappings); duv (R,4) optional
    screen-space uv footprints. -> (R,4).
    """
    node_c = jnp.maximum(node, 0)
    t = tex.type[node_c]
    self_val = _leaf_spectrum(tex, node_c, uv, lam, p, duv)

    c1 = tex.child[node_c, 0]
    c2 = tex.child[node_c, 1]
    v1 = _leaf_spectrum(tex, c1, uv, lam, p, duv)
    v2 = _leaf_spectrum(tex, c2, uv, lam, p, duv)

    # scale: tex1 * amount (float texture or const)
    amt_f = jnp.where(
        tex.amount_tex[node_c] >= 0,
        _leaf_float(tex, tex.amount_tex[node_c], uv, p=p),
        tex.amount[node_c],
    )
    scale_val = v1 * amt_f[..., None]

    # mix: (1-amt)*tex1 + amt*tex2 (spectrum_mix_texture.cu:27-39)
    mix_val = (1.0 - amt_f)[..., None] * v1 + amt_f[..., None] * v2

    # checkerboard (point-sampled: filter width r->0 limit of
    # spectrum_checkerboard_texture.cu:7-33)
    st = _mapped_uv(tex, node_c, uv, p)
    parity = (jnp.floor(st[..., 0]) + jnp.floor(st[..., 1])).astype(jnp.int32) & 1
    checker_val = jnp.where((parity == 0)[..., None], v1, v2)

    # directionmix: amt = |n . dir| (spectrum_direction_mix_texture.cu:27-40)
    amt_d = jnp.abs(jnp.sum(ns * tex.dir[node_c], axis=-1))
    dirmix_val = amt_d[..., None] * v1 + (1.0 - amt_d)[..., None] * v2

    out = self_val
    out = jnp.where((t == TEX_SCALE)[..., None], scale_val, out)
    out = jnp.where((t == TEX_MIX)[..., None], mix_val, out)
    out = jnp.where((t == TEX_CHECKER)[..., None], checker_val, out)
    out = jnp.where((t == TEX_DIRMIX)[..., None], dirmix_val, out)
    return jnp.where((node < 0)[..., None], 0.0, out)


def eval_float(tex: TexArrays, node, uv, default=0.0, p=None, duv=None):
    """Evaluate float texture node per lane (base/float_texture.cu:11-24:
    constant / imagemap / scale)."""
    node_c = jnp.maximum(node, 0)
    t = tex.type[node_c]
    self_val = _leaf_float(tex, node_c, uv, p=p, duv=duv)
    c1 = tex.child[node_c, 0]
    v1 = _leaf_float(tex, c1, uv, p=p, duv=duv)
    amt_f = jnp.where(
        tex.amount_tex[node_c] >= 0,
        _leaf_float(tex, tex.amount_tex[node_c], uv, p=p),
        tex.amount[node_c],
    )
    out = jnp.where(t == TEX_SCALE, v1 * amt_f, self_val)
    return jnp.where(node < 0, default, out)
