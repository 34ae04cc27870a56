"""Command-line driver: `pbrt-tpu scene.pbrt --spp N --integrator path
--outfile out.png` (counterpart of reference main.cu +
scene/command_line_option.h:8-79)."""
import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pbrt-tpu", description="TPU-native spectral path tracer")
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--spp", type=int, default=None, help="samples per pixel (overrides scene)")
    ap.add_argument("--integrator", default=None, help="path|ambientocclusion|surfacenormal|...")
    ap.add_argument("--outfile", default=None, help="output PNG path")
    ap.add_argument("--resolution", default=None, help="WxH override, e.g. 256x256")
    ap.add_argument("--checkpoint", default=None, metavar="FILE.npz",
                    help="film snapshot path; resumes from it if present")
    ap.add_argument("--checkpoint-every", type=int, default=0, metavar="SPP",
                    help="snapshot the film every N spp (needs --checkpoint)")
    ap.add_argument("--preview-every", type=int, default=0, metavar="SPP",
                    help="write the in-progress film PNG every N spp "
                         "(progressive preview; path-family integrators)")
    ap.add_argument("--preview-file", default=None, metavar="FILE.png",
                    help="preview output path (default: the outfile)")
    ap.add_argument("--shard-scene", type=int, default=0, metavar="N",
                    help="partition the scene geometry over N devices "
                         "(TP axis; for scenes larger than one chip's HBM)")
    ap.add_argument("--heatmap", default=None, metavar="FILE.png",
                    help="MLT integrators: write the sampling-density "
                         "heatmap PNG (reference GreyScaleFilm)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    from pbrt_tpu.utils.jaxcfg import enable_compile_cache

    enable_compile_cache()
    import jax

    from pbrt_tpu.scene.compile import load_scene
    from pbrt_tpu.integrators.render import render_to_png

    t0 = time.time()
    scene, meta = load_scene(args.scene, spp=args.spp, integrator=args.integrator)
    if args.resolution:
        w, h = (int(x) for x in args.resolution.lower().split("x"))
        from pbrt_tpu.scene import builder as bd
        from pbrt_tpu.scene.compile import compile_scene

        b = bd.SceneBuilder().parse_file(args.scene)
        b.film["xresolution"], b.film["yresolution"] = w, h
        scene, meta = compile_scene(b, spp_override=args.spp, integrator_override=args.integrator)
    if not args.quiet:
        print(
            f"scene: {meta.n_tris} tris, {meta.n_spheres} spheres, {meta.n_lights} lights; "
            f"{meta.resolution[0]}x{meta.resolution[1]} @ {meta.spp} spp, "
            f"integrator={meta.integrator} (devices: {jax.devices()})"
        )
    t1 = time.time()
    if args.shard_scene:
        from pbrt_tpu.film import film as filmlib, png as pnglib
        from pbrt_tpu.integrators.render import render_scene_sharded

        img = render_scene_sharded(scene, meta, n_parts=args.shard_scene)
        path = args.outfile or meta.filename
        pnglib.write_png(path, filmlib.to_srgb8(img))
        t2 = time.time()
        if not args.quiet:
            print(f"parse+compile {t1 - t0:.2f}s, scene-sharded render "
                  f"x{args.shard_scene} {t2 - t1:.2f}s -> {path}")
        return 0
    out = render_to_png(
        scene, meta, out_path=args.outfile, verbose=not args.quiet,
        checkpoint_path=args.checkpoint, checkpoint_every=args.checkpoint_every,
        heatmap_path=args.heatmap,
        preview_path=args.preview_file, preview_every=args.preview_every,
    )
    t2 = time.time()
    if not args.quiet:
        n_rays = meta.resolution[0] * meta.resolution[1] * meta.spp
        print(f"parse+compile {t1 - t0:.2f}s, render {t2 - t1:.2f}s "
              f"({n_rays / max(t2 - t1, 1e-9) / 1e6:.2f} Mpaths/s) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
