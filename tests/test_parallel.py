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
