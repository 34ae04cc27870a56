"""Multi-device scaling harness (BASELINE.md: >=90% efficiency to N hosts).

Methodology (VERDICT r3 item 3 — honest accounting):

  * workload: the PRODUCTION sharded render path
    (`render_spp_fused_sharded`, the same code `render()` dispatches to)
    on the 16k-triangle cornell-mesh BVH scene.
  * **weak scaling, fixed work per device**: t_1 = time for ONE device to
    render W samples; t_N = time for N devices to render N*W samples
    (each device gets exactly W). efficiency = t_1 / t_N (ideal 1.0).
  * On REAL multi-chip hardware that ratio is the true scaling efficiency:
    per-device work is constant and the only extra cost at N devices is
    the film psum over ICI (n_pixels * 7 floats per chunk — KBs, vs
    seconds of compute).
  * On the VIRTUAL CPU mesh (xla_force_host_platform_device_count=N, all
    devices time-sharing one host's cores) t_N inevitably includes N-way
    compute contention, so t_1/t_N UNDERSTATES real efficiency; the
    number reported here is a LOWER BOUND under that caveat, recorded as
    "virtual_mesh": true. Real-chip numbers require an actual pod — this
    environment exposes one chip (see MULTICHIP artifacts for the
    correctness half of the story).

Multi-host entry: pass --distributed to call jax.distributed.initialize()
(coordinator env vars per jax docs); the mesh then spans all processes.

Writes SCALING_r04.json and prints one JSON line.
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

from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators.render import render_spp_fused_sharded
from pbrt_tpu.scene.testscenes import cornell_mesh

RES = 64          # pixels per device row-block is RES*RES/N
SPP = 2
MAX_DEPTH = 4


def time_sharded(scene, meta, devices, pixel_ids, reps=3):
    """Render SPP samples of `pixel_ids` sharded over `devices`."""
    n = len(devices)
    kw = dict(n_spp=SPP, lanes_spp=SPP, max_depth=MAX_DEPTH,
              use_lens=False, res_x=RES)

    def go():
        film = filmlib.new_film((RES, RES))
        f, nr = render_spp_fused_sharded(
            scene, film, pixel_ids, 0, devices=devices, **kw)
        jax.block_until_ready(f.rgb_sum)
        return f, nr

    f, nr = go()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        f, nr = go()
    dt = (time.perf_counter() - t0) / reps
    return dt, float(nr), float(jnp.sum(f.weight_sum))


def main():
    devices = jax.devices()
    n = len(devices)
    scene, meta = cornell_mesh(res=RES, spp=SPP, levels=5)
    n_pixels = RES * RES

    # fixed work per device: 1 device renders W pixels' samples; N devices
    # render N*W (= the whole image, W = n_pixels // n each)
    assert n_pixels % n == 0
    w_per_dev = n_pixels // n
    ids_1 = jnp.arange(w_per_dev, dtype=jnp.int32)
    ids_n = jnp.arange(n_pixels, dtype=jnp.int32)

    t1, rays1, _ = time_sharded(scene, meta, devices[:1], ids_1)
    tn, raysn, _ = time_sharded(scene, meta, devices, ids_n)
    eff = t1 / tn
    virtual = devices[0].platform == "cpu"
    out = {
        "metric": "weak-scaling efficiency t_1/t_N, fixed work/device, "
                  "production sharded render, 16k-tri BVH scene",
        "n_devices": n,
        "platform": devices[0].platform,
        "virtual_mesh": virtual,
        "work_per_device_lanes": int(w_per_dev * SPP),
        "t1_s": round(t1, 4),
        f"t{n}_s": round(tn, 4),
        "rays_1dev": rays1,
        f"rays_{n}dev": raysn,
        "efficiency_lower_bound" if virtual else "efficiency": round(eff, 4),
        # on a time-shared host the compute-conserving ideal is t_N = N*t1,
        # so N*t1/t_N isolates the partitioning+collective overhead (1.0 =
        # sharding itself costs nothing; >1 = per-shard work got cheaper,
        # e.g. narrower compaction ladders)
        "virtual_partition_overhead_factor": (
            round(n * t1 / tn, 4) if virtual else None),
        "note": ("virtual CPU mesh: N devices time-share one host, so t_N "
                 "includes N-way compute contention and this UNDERSTATES "
                 "real-hardware efficiency") if virtual else "",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
