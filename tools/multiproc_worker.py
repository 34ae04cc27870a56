"""One process of the multi-process (N-host logic) render test.

SURVEY §4(d) / VERDICT r4 missing #2: multi-host logic must be testable
without a pod. This worker is launched N times by tools/run_multiproc.py;
each process owns 4 virtual CPU devices and joins a jax.distributed
coordinator, forming a global 8-device ("dp",) mesh across 2 OS processes
— the same code path a real multi-host TPU slice uses (DCN-coordinated
process group + per-process addressable device shards).

The render is `render_wavefront_sharded` (replicated inputs, psum'd film:
every process feeds identical host values, device_put as fully-replicated
global arrays), so no per-process array slicing is needed. Process 0
writes a JSON artifact comparing the distributed image to the
single-process reference computed beforehand by the launcher.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU + 4 virtual devices per process BEFORE jax initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    proc_id = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    coord = sys.argv[3]
    out_path = sys.argv[4]

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_procs, process_id=proc_id
    )
    assert jax.process_count() == n_procs, jax.process_count()
    n_dev = len(jax.devices())
    n_loc = len(jax.local_devices())
    assert n_dev == 4 * n_procs, n_dev

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pbrt_tpu.film import film as filmlib
    from pbrt_tpu.integrators.render import render_wavefront_sharded
    from pbrt_tpu.parallel import train
    from pbrt_tpu.scene.testscenes import cornell_mesh

    res = 16
    n_pix = res * res
    scene, meta = cornell_mesh(res=res, spp=2, levels=3)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("dp",))
    repl = NamedSharding(mesh, P())

    def put(tree):
        return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), repl), tree)

    scene_g = put(scene)
    film_g = put(filmlib.new_film((res, res)))

    film, nrays, dropped = render_wavefront_sharded(
        scene_g, film_g, 0, n_pix, 0, devices=jax.devices(),
        n_spp=2, pool=64, max_depth=3, use_lens=False, res_x=res,
    )
    rgb = np.asarray(jax.device_get(film.rgb_sum))
    wsum = np.asarray(jax.device_get(film.weight_sum))

    # one optimization step of the differentiable trainer over the same
    # global mesh (SURVEY §2.7 distributed-backend row: gradients ride the
    # same collectives as the film)
    pixel_ids = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32)[None], (2, 1))
    sample_ids = jnp.tile(jnp.arange(2, dtype=jnp.int32)[:, None], (1, n_pix))
    img = train.render_image_diff(
        put(scene), put(pixel_ids), put(sample_ids),
        max_depth=3, res_x=res, n_pixels=n_pix,
    )
    img = np.asarray(jax.device_get(img))

    if proc_id == 0:
        ref = np.load(out_path + ".ref.npz")
        max_diff = float(np.abs(rgb - ref["rgb"]).max())
        max_wdiff = float(np.abs(wsum - ref["wsum"]).max())
        img_diff = float(np.abs(img - ref["img"]).max())
        result = {
            "n_processes": n_procs,
            "devices_global": n_dev,
            "devices_local": n_loc,
            "rays": float(nrays),
            "dropped": int(dropped),
            "max_abs_diff_rgb_vs_single_process": max_diff,
            "max_abs_diff_weight_vs_single_process": max_wdiff,
            "max_abs_diff_diffrender_vs_single_process": img_diff,
            "ok": bool(max_diff < 1e-4 and max_wdiff < 1e-4
                       and img_diff < 1e-4 and int(dropped) == 0),
        }
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
