"""Object instancing + named coordinate systems (reference
scene_builder.cu:809-876 ObjectBegin/End/Instance, :308-317
CoordSysTransform). The flattened-instancing contract (VERDICT r1 item 6):
an instanced scene must parse, render, and match a manually-flattened
version of itself."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene import lexer as lx
from pbrt_tpu.scene.compile import compile_scene

HEAD = """
Integrator "path" "integer maxdepth" [3]
Sampler "independent" "integer pixelsamples" [1]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
LookAt 0 0 -6  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 10 10]
  Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-1 2.9 0   1 2.9 0   0 2.9 1]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.6 0.5 0.4]
"""

QUAD = ('Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point3 P" [-0.5 -0.5 0   0.5 -0.5 0   0.5 0.5 0   -0.5 0.5 0]')

INSTANCED = HEAD + f"""
ObjectBegin "card"
  Translate 0 0 0.25
  {QUAD}
ObjectEnd
ObjectInstance "card"
Translate 1.2 0 0
ObjectInstance "card"
Translate -2.4 0 0
Scale 2 2 2
ObjectInstance "card"
"""

FLATTENED = HEAD + f"""
Translate 0 0 0.25
{QUAD}
Identity
Translate 1.2 0 0
Translate 0 0 0.25
{QUAD}
Identity
Translate 1.2 0 0
Translate -2.4 0 0
Scale 2 2 2
Translate 0 0 0.25
{QUAD}
"""


def _build(txt, instancing="auto"):
    b = bd.SceneBuilder()
    b.instancing = instancing    # must be set BEFORE parse (routing happens
    b.parse_tokens(lx.tokenize(txt))  # at ObjectInstance emission)
    b.filter = {"type": "box"}  # mitchell's negative lobes are noise at 2 spp
    return b


def test_instances_match_flattened_geometry():
    bi = _build(INSTANCED)
    bf = _build(FLATTENED)
    assert len(bi.tri_p) == len(bf.tri_p) == 7  # light + 3 x 2-tri cards
    pi = np.sort(np.stack(bi.tri_p).reshape(-1, 3), axis=0)
    pf = np.sort(np.stack(bf.tri_p).reshape(-1, 3), axis=0)
    np.testing.assert_allclose(pi, pf, atol=1e-6)
    assert bi.tri_mat == bf.tri_mat


def test_instanced_scene_renders_and_matches():
    from pbrt_tpu.integrators.render import render

    scene_i, meta_i = compile_scene(_build(INSTANCED), spp_override=2)
    scene_f, meta_f = compile_scene(_build(FLATTENED), spp_override=2)
    img_i = np.asarray(render(scene_i, meta_i))
    img_f = np.asarray(render(scene_f, meta_f))
    assert np.isfinite(img_i).all()
    assert img_i.mean() > 0
    np.testing.assert_allclose(img_i, img_f, rtol=1e-4, atol=1e-5)


def test_two_level_bvh_matches_flattened():
    """Force the shared-prototype (two-level BVH) path on the same scene:
    the instanced render must match the hand-flattened one (reference
    TransformedPrimitive + per-definition sub-BVH semantics,
    scene_builder.cu:809-876)."""
    from pbrt_tpu.integrators.render import render

    bi = _build(INSTANCED, instancing="bvh")  # share protos regardless of size
    scene_i, meta_i = compile_scene(bi, spp_override=2)
    assert scene_i.bvh_ninst.shape[0] == 3
    assert scene_i.inst_w2o.shape == (3, 12)
    scene_f, meta_f = compile_scene(_build(FLATTENED), spp_override=2)
    img_i = np.asarray(render(scene_i, meta_i))
    img_f = np.asarray(render(scene_f, meta_f))
    assert np.isfinite(img_i).all()
    assert img_i.mean() > 0
    np.testing.assert_allclose(img_i, img_f, rtol=1e-4, atol=1e-4)


def test_two_level_bvh_mirrored_instance():
    """A reflecting (negative-determinant) instance transform must shade
    identically through the two-level path and the flatten path (the
    rev^swap composition and the object-space geometric normal's sign(det)
    must cancel — see accel/dispatch.py)."""
    from pbrt_tpu.integrators.render import render

    MIRROR = HEAD + f"""
ObjectBegin "card"
  Translate 0.1 0 0.25
  {QUAD}
ObjectEnd
Scale -1 1 1
ObjectInstance "card"
"""
    bi = _build(MIRROR, instancing="bvh")
    scene_i, meta_i = compile_scene(bi, spp_override=4)
    bf = _build(MIRROR, instancing="flatten")
    scene_f, meta_f = compile_scene(bf, spp_override=4)
    img_i = np.asarray(render(scene_i, meta_i))
    img_f = np.asarray(render(scene_f, meta_f))
    assert np.isfinite(img_i).all()
    np.testing.assert_allclose(img_i, img_f, rtol=1e-4, atol=1e-4)


def test_instance_keeps_definition_material():
    txt = HEAD + f"""
ObjectBegin "card"
  {QUAD}
ObjectEnd
Material "conductor" "float roughness" [0.2]
Translate 1 0 0
ObjectInstance "card"
"""
    b = _build(txt)
    # instanced tris keep the DIFFUSE material captured at definition time
    assert all(b.materials[m].type == bd.MAT_DIFFUSE for m in b.tri_mat[1:])


def test_coord_sys_transform():
    txt = HEAD + f"""
CoordinateSystem "saved"
Translate 5 0 0
CoordSysTransform "saved"
{QUAD}
"""
    b = _build(txt)
    # CTM restored: quad centered at origin z=0, not at x=5
    q = np.stack(b.tri_p[1:]).reshape(-1, 3)
    assert abs(q[:, 0].mean()) < 1e-6
