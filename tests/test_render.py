"""End-to-end render tests on the cornell scene (SURVEY §4 (b) analogue:
golden statistical properties; pixel-exact goldens need the CUDA reference
binary which cannot run here)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import builder as bd
from pbrt_tpu.scene.compile import compile_scene
from pbrt_tpu.integrators import render as R

CORNELL = "/root/reference/example/cornell-box-specular.pbrt"


def small_scene(res=48, spp=16, integrator=None):
    b = bd.SceneBuilder().parse_file(CORNELL)
    b.film["xresolution"] = b.film["yresolution"] = res
    return compile_scene(b, spp_override=spp, integrator_override=integrator)


@pytest.fixture(scope="module")
def cornell_img():
    scene, meta = small_scene()
    return np.asarray(R.render(scene, meta))


def test_cornell_renders_sane(cornell_img):
    img = cornell_img
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    # negatives: mitchell filter ringing around the bright light (same as
    # pbrt) + out-of-gamut spectral noise; bounded relative to peak
    assert img.min() > -0.2 * img.max()
    mean = img.mean()
    assert 0.15 < mean < 0.5, f"scene brightness {mean} out of expected band"


def test_cornell_light_is_brightest(cornell_img):
    img = cornell_img
    # the ceiling light (emission ~20) is the max region
    assert img.max() > 5.0
    ys, xs, _ = np.unravel_index(np.argmax(img), img.shape)
    assert ys < 10  # near the top of the image


def test_cornell_wall_tints(cornell_img):
    img = cornell_img
    left = img[20:28, 1:4].mean((0, 1))   # green wall at x=0 -> screen left
    right = img[20:28, 44:47].mean((0, 1))  # red wall at x=552 -> screen right
    assert left[1] > 1.5 * left[0] and left[1] > 1.5 * left[2], f"left not green {left}"
    assert right[0] > 1.5 * right[1] and right[0] > 1.5 * right[2], f"right not red {right}"


def test_cornell_color_bleeding(cornell_img):
    """Indirect light: floor areas adjacent to colored walls pick up tint."""
    img = cornell_img
    floor_left = img[40:44, 6:12].mean((0, 1))
    floor_right = img[40:44, 36:42].mean((0, 1))
    assert floor_left[1] >= floor_left[0] * 0.95  # greenish side
    assert floor_right[0] >= floor_right[1] * 0.95  # reddish side


def test_ao_integrator_runs():
    scene, meta = small_scene(res=32, spp=16, integrator="ambientocclusion")
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    assert img.max() > 0.2
    # mitchell ringing allows bounded negatives at hard visibility edges
    assert img.min() > -0.5 * img.max()


def test_surface_normal_integrator_runs():
    scene, meta = small_scene(res=32, spp=16, integrator="surfacenormal")
    img = np.asarray(R.render(scene, meta))
    assert np.isfinite(img).all()
    # floor normals point up (+y): greenish region at bottom
    floor = img[28:31, 12:20].mean((0, 1))
    assert floor[1] > floor[0] and floor[1] > floor[2]


def test_nee_and_bsdf_estimators_agree():
    """Direct lighting via NEE == via BSDF sampling at a fixed floor point
    (validates light pdf / sampling / Le / occlusion consistency)."""
    import jax
    from pbrt_tpu.accel import dispatch
    from pbrt_tpu.materials import materials
    from pbrt_tpu.lights import lights
    from pbrt_tpu.geometry import vecmath as vm
    from pbrt_tpu.geometry.ray import offset_ray_origin
    from pbrt_tpu.sampling import samplers, rng as prng
    from pbrt_tpu.spectral import sampled
    from pbrt_tpu.utils.math import INFINITY

    scene, meta = small_scene()
    Rn = 1 << 16
    p = jnp.tile(jnp.asarray([[0.0, -223.0, 1050.0]]), (Rn, 1))
    ns = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (Rn, 1))
    wo = vm.normalize(jnp.tile(jnp.asarray([[0.3, 0.8, -0.5]]), (Rn, 1)))

    r = samplers.start_pixel_sample(jnp.arange(Rn, dtype=jnp.int32), jnp.zeros(Rn, jnp.int32))
    r, u_lam = samplers.get_1d(r)
    wl = sampled.sample_visible(u_lam)
    mat = jnp.full((Rn,), 1, jnp.int32)
    bsdf, wl = materials.make_bsdf(scene, mat, ns, wl)

    r, u1 = samplers.get_1d(r)
    r, u2 = samplers.get_2d(r)
    cdf = jnp.cumsum(scene.lt_pmf)
    li_idx = jnp.clip(
        jnp.searchsorted(cdf, u1, side="right").astype(jnp.int32), 0, scene.lt_pmf.shape[0] - 1
    )
    pmf = scene.lt_pmf[li_idx]
    ls = lights.sample_li(scene, li_idx, p, ns, u2, wl.lam, scene.scene_radius)
    f = materials.bsdf_f(bsdf, wo, ls.wi) * vm.absdot(ls.wi, ns)[..., None]
    o_sh = offset_ray_origin(p, ns, ls.wi, scene.ray_offset_scale)
    dist = vm.distance(o_sh, ls.p_light)
    occ = dispatch.occluded(scene, o_sh, ls.wi, dist * (1 - 1e-3))
    pdf_l = pmf * ls.pdf
    est_nee = jnp.where(
        (ls.valid & ~occ & (pdf_l > 0))[..., None],
        f * ls.L / jnp.maximum(pdf_l, 1e-20)[..., None],
        0.0,
    ).mean(0)

    r, uc = samplers.get_1d(r)
    r, u2b = samplers.get_2d(r)
    bs = materials.bsdf_sample(bsdf, wo, uc, u2b)
    o2 = offset_ray_origin(p, ns, bs.wi, scene.ray_offset_scale)
    hit = dispatch.intersect(scene, o2, bs.wi, jnp.full((Rn,), INFINITY))
    Le = lights.area_light_le(scene, hit.light, hit.ng, hit.wo, wl.lam)
    est_b = jnp.where(
        (bs.valid & hit.valid & (hit.light >= 0))[..., None],
        bs.f * vm.absdot(bs.wi, ns)[..., None] / jnp.maximum(bs.pdf, 1e-20)[..., None] * Le,
        0.0,
    ).mean(0)

    a, b2 = np.asarray(est_nee), np.asarray(est_b)
    assert np.all(a > 0)
    assert np.allclose(a, b2, rtol=0.1), (a, b2)


def test_checkpoint_resume(tmp_path):
    """A render killed mid-way resumes from the film snapshot and produces
    the SAME image as an uninterrupted run (same RNG streams per sample)."""
    import os
    import jax.numpy as jnp
    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.scene.testscenes import cornell
    from pbrt_tpu.integrators import render as R

    scene, meta = cornell(res=16, spp=4)
    ck = str(tmp_path / "film.npz")
    full = np.asarray(R.render(scene, meta))

    # simulate an interrupted run: render only the first 2 spp, snapshot
    film = filmlib.new_film((16, 16))
    pix = jnp.arange(16 * 16, dtype=jnp.int32)
    film, _ = R.render_spp_fused(
        scene, film, pix, 0, n_spp=2, lanes_spp=2, max_depth=meta.max_depth,
        use_lens=False, res_x=16, sampler_kind=meta.sampler, spp=meta.spp,
        filter_kind=meta.filter_kind,
    )
    filmlib.save_checkpoint(ck, film, 2)

    resumed = np.asarray(R.render(scene, meta, checkpoint_path=ck,
                                  checkpoint_every=2))
    np.testing.assert_allclose(resumed, full, rtol=1e-4, atol=1e-5)


def test_progressive_preview(tmp_path):
    """--preview-every: in-progress PNGs appear during the render (VERDICT
    r3 item 9 — the reference GL preview's role, gui/gl_helper.h:9-192)."""
    import os
    from pbrt_tpu.integrators.render import render_to_png
    from pbrt_tpu.scene.testscenes import cornell

    scene, meta = cornell(res=16, spp=4)
    out = str(tmp_path / "out.png")
    prev = str(tmp_path / "prev.png")

    seen = []
    import pbrt_tpu.film.png as pnglib

    orig = pnglib.write_png

    def spy(path, rgb8):
        seen.append(os.path.basename(path))
        return orig(path, rgb8)

    pnglib.write_png = spy
    try:
        render_to_png(scene, meta, out_path=out, preview_path=prev,
                      preview_every=1)
    finally:
        pnglib.write_png = orig
    # 4 spp at preview_every=1 -> 3 intermediate previews + final out
    assert seen.count("prev.png") == 3, seen
    assert "out.png" in seen
    assert os.path.exists(prev) and os.path.exists(out)
