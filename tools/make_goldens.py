"""Generate the committed golden renders for tests/test_parity.py.

Run on the CPU backend (deterministic across hosts); the parity tests use
tolerances wide enough to absorb CPU/TPU float-order differences but tight
enough to catch estimator regressions.
"""
import sys

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def _box(b):
    # mitchell's negative lobes divide by ~zero weight sums at low spp
    # (reference rgb_film.cu has the same firefly behavior) — goldens use box
    b.filter = {"type": "box"}
    return b


def main():
    from pbrt_tpu.scene import builder as bd, lexer as lx, testscenes as ts
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.integrators.render import render

    out = {}

    scene, meta = compile_scene(_box(ts.cornell_builder(res=64)), spp_override=8)
    out["cornell_path_64_spp8"] = np.asarray(render(scene, meta)).astype(np.float32)

    b = bd.SceneBuilder()
    b.parse_tokens(lx.tokenize(ts.cornell_mesh_pbrt(levels=3)))
    b.film["xresolution"] = b.film["yresolution"] = 48
    scene, meta = compile_scene(_box(b), spp_override=4)
    out["cornell_mesh_l3_48_spp4"] = np.asarray(render(scene, meta)).astype(np.float32)

    scene, meta = compile_scene(
        _box(ts.cornell_builder(res=24)), spp_override=8, integrator_override="bdpt"
    )
    out["cornell_bdpt_24_spp8"] = np.asarray(render(scene, meta)).astype(np.float32)

    np.savez_compressed("tests/goldens.npz", **out)
    for k, v in out.items():
        print(k, v.shape, "mean", v.mean())


if __name__ == "__main__":
    main()
