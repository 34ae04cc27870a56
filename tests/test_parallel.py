"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(d): multi-host logic testable without a pod)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_mesh_factoring():
    from pbrt_tpu.parallel import mesh as meshlib

    assert meshlib.factor2(8) == (2, 4)
    assert meshlib.factor2(1) == (1, 1)
    assert meshlib.factor2(6) == (2, 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_sharded_render_matches_single_device():
    """The sharded forward render must produce the same image as the
    unsharded one (pure data parallelism — no semantic drift allowed)."""
    from pbrt_tpu.parallel import mesh as meshlib, train
    from pbrt_tpu.scene.testscenes import cornell

    res = 16
    n_pixels = res * res
    scene, meta = cornell(res=res, spp=1)
    pixel_ids = jnp.tile(jnp.arange(n_pixels, dtype=jnp.int32)[None], (2, 1))
    sample_ids = jnp.tile(jnp.arange(2, dtype=jnp.int32)[:, None], (1, n_pixels))

    img_single = train.render_image_diff(
        scene, pixel_ids, sample_ids, max_depth=3, res_x=res, n_pixels=n_pixels
    )

    mesh = meshlib.make_mesh(jax.devices()[:8])
    lane = meshlib.lane_sharding(mesh)
    img_sharded = train.render_image_diff(
        meshlib.shard_scene(scene, mesh),
        jax.device_put(pixel_ids, lane),
        jax.device_put(sample_ids, lane),
        max_depth=3,
        res_x=res,
        n_pixels=n_pixels,
    )
    np.testing.assert_allclose(
        np.asarray(img_single), np.asarray(img_sharded), rtol=1e-4, atol=1e-5
    )


def test_sharded_production_render_matches():
    """VERDICT r3 item 3: the PRODUCTION render path (render_spp_fused) must
    shard over the device mesh and produce the bit-same image as one device
    — sample streams key on absolute (pixel, sample) ids, so partitioning
    is invisible to the estimator."""
    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.integrators.render import (
        render_spp_fused, render_spp_fused_sharded)
    from pbrt_tpu.scene.testscenes import cornell_mesh

    res = 16
    n_pixels = res * res
    scene, meta = cornell_mesh(res=res, spp=2, levels=3)  # BVH path, not dense
    pixel_ids = jnp.arange(n_pixels, dtype=jnp.int32)
    kw = dict(n_spp=2, lanes_spp=2, max_depth=3, use_lens=False, res_x=res)

    f1, n1 = render_spp_fused(scene, filmlib.new_film((res, res)),
                              pixel_ids, 0, **kw)
    f8, n8 = render_spp_fused_sharded(scene, filmlib.new_film((res, res)),
                                      pixel_ids, 0,
                                      devices=jax.devices()[:8], **kw)
    assert float(n1) == float(n8), (float(n1), float(n8))
    np.testing.assert_allclose(np.asarray(f1.rgb_sum), np.asarray(f8.rgb_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1.weight_sum),
                               np.asarray(f8.weight_sum), rtol=1e-5, atol=1e-6)


def test_render_entrypoint_uses_mesh():
    """render() itself (the CLI path) must produce a finite, sane image when
    >1 device exists — exercising the sharded branch end-to-end."""
    from pbrt_tpu.integrators.render import render
    from pbrt_tpu.scene.testscenes import cornell

    scene, meta = cornell(res=16, spp=2)
    img = render(scene, meta)
    a = np.asarray(img)
    assert a.shape == (16, 16, 3)
    assert np.isfinite(a).all()
    assert a.max() > 0.01


def test_wavefront_matches_batched():
    """The wavefront lane-recycling loop must reproduce the batched loop's
    estimator exactly (same sample streams, same honest ray count)."""
    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.integrators.render import (
        render_spp_fused, render_wavefront_fused)
    from pbrt_tpu.scene.testscenes import cornell_mesh

    res = 16
    n_pix = res * res
    scene, meta = cornell_mesh(res=res, spp=2, levels=3)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    kw = dict(n_spp=2, max_depth=3, use_lens=False, res_x=res)
    f1, n1 = render_spp_fused(scene, filmlib.new_film((res, res)), pixel_ids,
                              0, lanes_spp=2, **kw)
    f2, n2, d2 = render_wavefront_fused(scene, filmlib.new_film((res, res)),
                                        jnp.int32(0), n_pix, 0, pool=128, **kw)
    assert float(n1) == float(n2)
    assert int(d2) == 0
    np.testing.assert_allclose(np.asarray(f1.rgb_sum), np.asarray(f2.rgb_sum),
                               rtol=2e-4, atol=1e-5)


def test_wavefront_sharded_matches():
    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.integrators.render import (
        render_wavefront_fused, render_wavefront_sharded)
    from pbrt_tpu.scene.testscenes import cornell_mesh

    res = 16
    n_pix = res * res
    scene, meta = cornell_mesh(res=res, spp=2, levels=3)
    kw = dict(n_spp=2, max_depth=3, use_lens=False, res_x=res)
    f1, n1, d1 = render_wavefront_fused(scene, filmlib.new_film((res, res)),
                                        jnp.int32(0), n_pix, 0, pool=256, **kw)
    f8, n8, d8 = render_wavefront_sharded(scene, filmlib.new_film((res, res)),
                                          0, n_pix, 0, pool=32,
                                          devices=jax.devices()[:8], **kw)
    assert float(n1) == float(n8)
    assert int(d1) == 0 and int(d8) == 0
    np.testing.assert_allclose(np.asarray(f1.rgb_sum), np.asarray(f8.rgb_sum),
                               rtol=2e-4, atol=1e-5)


def test_wavefront_bound_deep_queue():
    """ADVICE r4 high: when ceil(total/pool) >> 2*max_depth the old
    iteration bound tripped with lanes in flight and silently dropped
    samples (weight_sum 7951 vs 8192 on this exact config). The corrected
    bound must schedule every work item and report dropped == 0."""
    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.integrators.render import (
        render_spp_fused, render_wavefront_fused)
    from pbrt_tpu.scene.testscenes import cornell_mesh

    res = 16
    n_pix = res * res
    scene, meta = cornell_mesh(res=res, spp=32, levels=3)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    kw = dict(n_spp=32, max_depth=3, use_lens=False, res_x=res)
    f1, n1 = render_spp_fused(scene, filmlib.new_film((res, res)), pixel_ids,
                              0, lanes_spp=4, **kw)
    f2, n2, d2 = render_wavefront_fused(scene, filmlib.new_film((res, res)),
                                        jnp.int32(0), n_pix, 0, pool=64, **kw)
    assert int(d2) == 0
    assert float(n1) == float(n2)
    np.testing.assert_allclose(float(jnp.sum(f1.weight_sum)),
                               float(jnp.sum(f2.weight_sum)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f1.rgb_sum), np.asarray(f2.rgb_sum),
                               rtol=2e-4, atol=1e-5)
