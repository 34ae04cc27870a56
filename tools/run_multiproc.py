"""Launch the 2-process x 4-virtual-device distributed render test.

Computes the single-process reference image first (8 devices in ONE
process), then launches 2 coordinated worker processes forming the same
8-device global mesh and asserts the distributed image matches. Writes
MULTIPROC_r05.json (VERDICT r4 missing #2 artifact).

Usage: python tools/run_multiproc.py [out.json]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_reference(out_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from pbrt_tpu.film import film as filmlib
from pbrt_tpu.integrators.render import render_wavefront_fused
from pbrt_tpu.parallel import train
from pbrt_tpu.scene.testscenes import cornell_mesh
res = 16
n_pix = res * res
scene, meta = cornell_mesh(res=res, spp=2, levels=3)
film, nrays, dropped = render_wavefront_fused(
    scene, filmlib.new_film((res, res)), jnp.int32(0), n_pix, 0,
    n_spp=2, pool=512, max_depth=3, use_lens=False, res_x=res)
assert int(dropped) == 0
pixel_ids = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32)[None], (2, 1))
sample_ids = jnp.tile(jnp.arange(2, dtype=jnp.int32)[:, None], (1, n_pix))
img = train.render_image_diff(scene, pixel_ids, sample_ids,
                              max_depth=3, res_x=res, n_pixels=n_pix)
np.savez({out_path!r} + ".ref.npz", rgb=np.asarray(film.rgb_sum),
         wsum=np.asarray(film.weight_sum), img=np.asarray(img))
print("reference written")
"""
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=900)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "MULTIPROC_r05.json")
    make_reference(out_path)
    coord = "127.0.0.1:8476"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multiproc_worker.py"),
             str(pid), "2", coord, out_path],
            env=env,
        ))
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    with open(out_path) as f:
        print(f.read())


if __name__ == "__main__":
    main()
