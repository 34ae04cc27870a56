"""Multi-device scaling harness (VERDICT r1 item 8; BASELINE.md >=90%).

Runs the SAME total rendering workload (a fixed lane grid of
samples x pixels) first on a 1-device mesh, then sharded over all available
devices, and reports efficiency = t1 / tN. On real hardware the N-device
wall-clock would be ~t1/N and the figure of merit is (t1/N)/tN; on the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N, all
devices sharing the host's cores) total compute capacity is constant, so
t1/tN isolates exactly the quantity the virtual mesh CAN measure: the
sharding + collective overhead fraction. >=0.9 means the partitioned
program spends <10% on XLA-inserted collectives (the film/stat psums).

Multi-host entry: pass --distributed to call jax.distributed.initialize()
(coordinator/process env vars per jax docs); the mesh then spans all
processes' devices and the same measurement applies across DCN.

Writes SCALING_r02.json and prints one JSON line.
"""
import json
import os
import sys
import time

if "--cpu" in sys.argv or os.environ.get("SCALING_FORCE_CPU", "1") == "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax

if "--distributed" in sys.argv:
    jax.distributed.initialize()
if "--cpu" in sys.argv or os.environ.get("SCALING_FORCE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pbrt_tpu.parallel import mesh as meshlib
from pbrt_tpu.parallel import train
from pbrt_tpu.scene.testscenes import cornell

RES = 64
S = 8  # sample rows in the lane grid
MAX_DEPTH = 4


def run_on(devices, scene):
    mesh = meshlib.make_mesh(devices)
    sc = meshlib.shard_scene(scene, mesh)
    n_pixels = RES * RES
    pixel_ids = jnp.tile(jnp.arange(n_pixels, dtype=jnp.int32)[None], (S, 1))
    sample_ids = jnp.tile(jnp.arange(S, dtype=jnp.int32)[:, None], (1, n_pixels))
    lane_sh = meshlib.lane_sharding(mesh)
    pixel_ids = jax.device_put(pixel_ids, lane_sh)
    sample_ids = jax.device_put(sample_ids, lane_sh)

    fn = jax.jit(
        lambda pid, sid: train.render_image_diff(
            sc, pid, sid, max_depth=MAX_DEPTH, res_x=RES, n_pixels=n_pixels
        )
    )
    img = jax.block_until_ready(fn(pixel_ids, sample_ids))  # compile
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        img = jax.block_until_ready(fn(pixel_ids, sample_ids))
    dt = (time.perf_counter() - t0) / n_rep
    return dt, float(jnp.mean(img))


def main():
    devices = jax.devices()
    scene, meta = cornell(res=RES, spp=1)
    t1, m1 = run_on(devices[:1], scene)
    tn, mn = run_on(devices, scene)
    n = len(devices)
    eff = t1 / tn
    out = {
        "metric": f"sharding efficiency t1/t{n} (same total work, "
                  f"{'virtual CPU mesh' if devices[0].platform == 'cpu' else devices[0].platform})",
        "n_devices": n,
        "t1_s": round(t1, 4),
        f"t{n}_s": round(tn, 4),
        "efficiency": round(eff, 4),
        "img_mean_match": abs(m1 - mn) < 1e-4,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
