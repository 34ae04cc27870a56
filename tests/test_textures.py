"""Texture system + image IO + PLY loader tests."""
import os
import struct
import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.textures import textures as tx
from pbrt_tpu.textures.textures import TexSpec
from pbrt_tpu.textures.image import load_png, load_exr
from pbrt_tpu.scene.ply import read_ply


def _write_png(path, img8):
    h, w, _ = img8.shape

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img8[y].tobytes() for y in range(h))
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    open(path, "wb").write(data)


def _srgb_lin(u8):
    v = u8.astype(np.float64) / 255.0
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def test_exr_none_and_zip(tmp_path):
    """Synthesize minimal EXRs (NONE + ZIP) and read them back."""
    h, w = 4, 6
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 4, (h, w, 3)).astype(np.float32)

    def attr(name, atype, payload):
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + struct.pack(
            "<I", len(payload)) + payload

    def chan(name):
        return name.encode() + b"\x00" + struct.pack("<IiII", 2, 0, 1, 1)

    for comp, tag in ((0, "none"), (3, "zip")):
        chans = chan("B") + chan("G") + chan("R") + b"\x00"
        header = (attr("channels", "chlist", chans)
                  + attr("compression", "compression", bytes([comp]))
                  + attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
                  + attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
                  + attr("lineOrder", "lineOrder", b"\x00")
                  + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
                  + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
                  + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
                  + b"\x00")
        lines_per_block = 16 if comp == 3 else 1
        n_blocks = (h + lines_per_block - 1) // lines_per_block
        head = b"\x76\x2f\x31\x01" + struct.pack("<I", 2) + header
        table_pos = len(head)
        data_start = table_pos + 8 * n_blocks
        blocks = []
        pos = data_start
        offsets = []
        for b0 in range(n_blocks):
            y0 = b0 * lines_per_block
            nlines = min(lines_per_block, h - y0)
            raw = b""
            for y in range(y0, y0 + nlines):
                # channels alphabetical: B, G, R
                raw += img[y, :, 2].tobytes() + img[y, :, 1].tobytes() + img[y, :, 0].tobytes()
            if comp == 3:
                a = np.frombuffer(raw, np.uint8)
                half = (len(a) + 1) // 2
                inter = np.empty(len(a), np.uint8)
                inter[:half] = a[0::2]
                inter[half:] = a[1::2]
                d = inter.astype(np.int16)
                d[1:] = ((d[1:] - d[:-1].copy()) + 128) & 0xFF
                payload = zlib.compress(d.astype(np.uint8).tobytes())
                if len(payload) >= len(raw):
                    payload = raw
            else:
                payload = raw
            offsets.append(pos)
            blk = struct.pack("<iI", y0, len(payload)) + payload
            blocks.append(blk)
            pos += len(blk)
        out = head + b"".join(struct.pack("<Q", o) for o in offsets) + b"".join(blocks)
        path = tmp_path / f"t_{tag}.exr"
        path.write_bytes(out)
        got = load_exr(str(path))
        assert np.allclose(got, img, atol=1e-6), tag


def test_ply_binary_quads(tmp_path):
    P = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 1\n"
              b"property list uchar int vertex_indices\n"
              b"end_header\n")
    body = P.astype("<f4").tobytes() + bytes([4]) + np.array([0, 1, 2, 3], "<i4").tobytes()
    f = tmp_path / "quad.ply"
    f.write_bytes(header + body)
    P2, idx, N, UV = read_ply(str(f))
    assert P2.shape == (4, 3) and np.allclose(P2, P)
    assert idx.shape == (2, 3)  # quad split into 2 tris
    assert N is None and UV is None


def test_ply_ascii_with_normals(tmp_path):
    f = tmp_path / "tri.ply"
    f.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float u\nproperty float v\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0 0 1 0 0\n1 0 0 0 0 1 1 0\n0 1 0 0 0 1 0 1\n"
        "3 0 1 2\n"
    )
    P, idx, N, UV = read_ply(str(f))
    assert np.allclose(N, [[0, 0, 1]] * 3)
    assert np.allclose(UV, [[0, 0], [1, 0], [0, 1]])
    assert idx.tolist() == [[0, 1, 2]]


def _uv(vals):
    return jnp.asarray(np.asarray(vals, np.float32))


def test_constant_and_scale_nodes(tmp_path):
    specs = [
        TexSpec(kind="constant", is_spectrum=True, rgb=np.array([0.8, 0.2, 0.2])),
        TexSpec(kind="constant", is_spectrum=False, value=0.25),
        TexSpec(kind="scale", is_spectrum=True, tex1=0, amount=0.5),
    ]
    t = tx.build_tex_arrays(specs, str(tmp_path))
    uv = _uv([[0.3, 0.7]] * 2)
    ns = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    lam = jnp.full((2, 4), 600.0)
    base = tx.eval_spectrum(t, jnp.asarray([0, 0], jnp.int32), uv, ns, lam)
    scaled = tx.eval_spectrum(t, jnp.asarray([2, 2], jnp.int32), uv, ns, lam)
    assert np.allclose(np.asarray(scaled), 0.5 * np.asarray(base), atol=1e-6)
    fv = tx.eval_float(t, jnp.asarray([1, 1], jnp.int32), uv)
    assert np.allclose(np.asarray(fv), 0.25)


def test_checkerboard_node(tmp_path):
    specs = [
        TexSpec(kind="constant", is_spectrum=True, rgb=np.array([0.0, 0.0, 0.0])),
        TexSpec(kind="constant", is_spectrum=True, rgb=np.array([0.9, 0.9, 0.9])),
        TexSpec(kind="checkerboard", is_spectrum=True, tex1=0, tex2=1,
                uscale=2.0, vscale=2.0),
    ]
    t = tx.build_tex_arrays(specs, str(tmp_path))
    lam = jnp.full((4, 4), 550.0)
    ns = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    # (0.25,0.25)->cell(0,0) even->tex1(black); (0.75,0.25)->cell(1,0) odd->tex2
    uv = _uv([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    v = np.asarray(tx.eval_spectrum(t, jnp.full((4,), 2, jnp.int32), uv, ns, lam))
    assert v[0].max() < 0.05 and v[3].max() < 0.05      # even cells -> black
    assert v[1].min() > 0.5 and v[2].min() > 0.5         # odd cells -> white


def test_imagemap_node(tmp_path):
    img8 = np.zeros((2, 2, 3), np.uint8)
    img8[0, 0] = [255, 0, 0]
    img8[0, 1] = [0, 255, 0]
    img8[1, 0] = [0, 0, 255]
    img8[1, 1] = [255, 255, 255]
    _write_png(str(tmp_path / "t.png"), img8)
    specs = [TexSpec(kind="imagemap", is_spectrum=True, filename="t.png")]
    t = tx.build_tex_arrays(specs, str(tmp_path))
    # v flipped: uv (0.25, 0.75) -> st y=0.25 -> row 0 (top) -> red texel
    uv = _uv([[0.25, 0.75], [0.75, 0.75]])
    ns = jnp.zeros((2, 3)).at[:, 2].set(1.0)
    lam = jnp.tile(jnp.asarray([460.0, 550.0, 620.0, 700.0]), (2, 1))
    v = np.asarray(tx.eval_spectrum(t, jnp.zeros((2,), jnp.int32), uv, ns, lam))
    # lane 0 red texel: long wavelengths dominate
    assert v[0, 2] > 3 * v[0, 1] and v[0, 2] > 3 * v[0, 0]
    # lane 1 green texel: 550nm dominates
    assert v[1, 1] > 3 * v[1, 0] and v[1, 1] > 3 * v[1, 2]


def test_textured_scene_renders(tmp_path):
    """End-to-end: checkerboard floor in a tiny scene."""
    from pbrt_tpu.scene import builder as bd
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.integrators import render as R

    pbrt = """
    Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "independent" "integer pixelsamples" [16]
    Integrator "path" "integer maxdepth" [3]
    LookAt 0 3 4   0 0 0   0 1 0
    Camera "perspective" "float fov" [45]
    WorldBegin
    Texture "check" "spectrum" "checkerboard"
        "rgb tex1" [0.05 0.05 0.05] "rgb tex2" [0.9 0.9 0.9]
        "float uscale" [4] "float vscale" [4]
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [10 10 10]
      Translate 0 4 0
      Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
        "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    AttributeEnd
    Material "diffuse" "texture reflectance" "check"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point3 P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2]
      "point2 uv" [0 0  1 0  1 1  0 1]
    """
    path = tmp_path / "checker.pbrt"
    path.write_text(pbrt)
    b = bd.SceneBuilder().parse_file(str(path))
    scene, meta = compile_scene(b)
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    lum = img.mean(-1)
    # floor region shows alternating bright/dark cells with real contrast
    floor = lum[18:30, 4:28]
    assert floor.max() > 3 * max(floor.min(), 1e-4)


def test_texture_mappings(tmp_path):
    """spherical/cylindrical/planar mappings (reference texture_mapping_2d):
    (u, v) derived from the hit position in texture space."""
    import jax.numpy as jnp
    from pbrt_tpu.textures import textures as txl

    specs = [
        TexSpec(kind="constant", is_spectrum=True, rgb=np.array([0.0, 0.0, 0.0])),
        TexSpec(kind="constant", is_spectrum=True, rgb=np.array([1.0, 1.0, 1.0])),
        TexSpec(kind="checkerboard", is_spectrum=True, tex1=0, tex2=1,
                mapping="planar", v1=np.array([1.0, 0, 0]), v2=np.array([0.0, 1, 0])),
        TexSpec(kind="checkerboard", is_spectrum=True, tex1=0, tex2=1,
                mapping="spherical"),
        TexSpec(kind="checkerboard", is_spectrum=True, tex1=0, tex2=1,
                mapping="cylindrical"),
    ]
    t = txl.build_tex_arrays(specs, str(tmp_path), cam_pos=np.zeros(3))
    lam = jnp.full((4, 4), 550.0)
    ns = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    uv = jnp.zeros((4, 2))  # non-uv mappings must ignore surface uv

    # planar: u = p.x, v = p.y -> cells alternate along x
    p = jnp.asarray([[0.5, 0.5, 0.0], [1.5, 0.5, 0.0],
                     [0.5, 1.5, 0.0], [1.5, 1.5, 0.0]], jnp.float32)
    v = np.asarray(txl.eval_spectrum(t, jnp.full((4,), 2, jnp.int32), uv, ns, lam, p))
    assert v[0].max() < 0.05 and v[3].max() < 0.05
    assert v[1].min() > 0.5 and v[2].min() > 0.5

    # spherical: u = theta/pi flips between northern/southern hemisphere
    # (scale 2x in v... default scales 1: theta/pi in [0,1] -> floor 0
    # everywhere, so use phi variation instead via uscale=1: cells split at
    # phi = pi). Probe +x vs -x directions:
    p2 = jnp.asarray([[1.0, 0.1, 0.0], [-1.0, -0.1, 0.0],
                      [1.0, 0.1, 0.0], [-1.0, -0.1, 0.0]], jnp.float32)
    v2 = np.asarray(txl.eval_spectrum(t, jnp.full((4,), 3, jnp.int32), uv, ns, lam, p2))
    # phi/2pi differs by ~0.5 -> same cell parity at scale 1; just check
    # evaluation is finite and INDEPENDENT of the surface uv
    v2b = np.asarray(txl.eval_spectrum(
        t, jnp.full((4,), 3, jnp.int32), uv + 0.37, ns, lam, p2))
    np.testing.assert_allclose(v2, v2b)

    # cylindrical: v = z -> alternates along z
    p3 = jnp.asarray([[1.0, 0.0, 0.5], [1.0, 0.0, 1.5],
                      [1.0, 0.0, 2.5], [1.0, 0.0, 3.5]], jnp.float32)
    v3 = np.asarray(txl.eval_spectrum(t, jnp.full((4,), 4, jnp.int32), uv, ns, lam, p3))
    par = v3.max(-1) > 0.5
    assert par[0] != par[1] and par[1] != par[2] and par[2] != par[3]
