"""Command-line renderer.

The reference has no CLI — scenes are configured by editing main.cpp and
rebuilding (README.md:19-20). Every knob catalogued in SURVEY.md §5 is a
flag here.

Usage:
    python -m yart_tpu.cli scene.glb -o out.png --spp 256 --size 1280x720
    python -m yart_tpu.cli cornell -o out.ppm --spp 64 --estimator gmon
    python -m yart_tpu.cli spheres --env-hdr sky.hdr --look golden
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="yart-tpu", description=__doc__)
    p.add_argument("scene", help=".gltf/.glb path or procedural name "
                               "(cornell | cornell-mat | spheres | furnace | "
                               "atrium | atrium-ivy | atrium-inst | roadster | luxball)")
    p.add_argument("--config", default=None,
                   help="JSON file of flag defaults (a config system — the "
                        "reference's knobs are compile-time edits, "
                        "README.md:19-20); explicit flags win")
    p.add_argument("-o", "--output", default="out.png", help="output image (.png/.ppm)")
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--size", default="512x512", help="WxH")
    p.add_argument("--max-depth", type=int, default=30)
    p.add_argument("--integrator", choices=["mis", "naive"], default="mis")
    p.add_argument(
        "--sampler", default="zsobol",
        help="zsobol | stratified | hash | zsobol:<scrambler> with "
             "scrambler in {null, binary, fastowen, owen} "
             "(config.py sampler choices; default zsobol = "
             "zsobol:fastowen, the reference's production pick, "
             "src/main.cpp:16)",
    )
    p.add_argument("--estimator", choices=["gmon", "gmonb", "mon", "mean"], default="gmon")
    p.add_argument("--tonemap", choices=["agx", "none"], default="agx")
    p.add_argument("--look", choices=["none", "golden", "punchy"], default="none")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--exposure", type=float, default=None,
                   help="EV stops (default: per-scene; the reference's "
                        "flagship config uses +5 EV, src/main.cpp:34)")
    p.add_argument("--focal", type=float, default=35.0, help="focal length mm")
    p.add_argument("--fnumber", type=float, default=0.0, help="aperture f-number, 0 = no DoF")
    p.add_argument("--aperture-sides", type=int, default=0)
    p.add_argument("--camera-pos", default=None, help="x,y,z")
    p.add_argument("--camera-target", default=None, help="x,y,z")
    p.add_argument("--env-hdr", default=None, help="octahedral HDR env map path")
    p.add_argument("--env-scale", type=float, default=1.0)
    p.add_argument("--background", default="0,0,0")
    p.add_argument("--first-wave", type=int, default=8,
                   help="first progressive wave sample count (reference "
                        "default 64; smaller = faster first preview)")
    p.add_argument("--max-wave", type=int, default=128)
    p.add_argument("--regularize-specular", type=int, default=None,
                   metavar="K",
                   help="roughen lobes from the K-th specular vertex on "
                        "(specular-chain path regularization; kills "
                        "glass/chrome caustic fireflies without clamping; "
                        "K=1 roughens the second specular vertex)")
    p.add_argument("--clamp", type=float, default=None,
                   help="per-sample radiance clamp (pre-exposure), firefly "
                        "suppression; biased, off by default")
    p.add_argument("--chunk-pixels", type=int, default=None,
                   help="pixels per device dispatch (memory knob)")
    p.add_argument("--shade-kernel", choices=["off", "xla", "pallas"],
                   default="off",
                   help="fused per-bounce shade path (kernels/pallas_shade"
                        ".py): one Pallas kernel replaces the post-intersect"
                        " small-op tail; 'xla' is the equivalence-tested "
                        "fallback assembly")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file; resume if present, save per wave")
    p.add_argument("--preview", default=None,
                   help="write a tonemapped preview PNG after every wave "
                        "(the live-view analog of the reference's Metal viewer)")
    p.add_argument("--serve", type=int, default=None, metavar="PORT",
                   help="serve a live progressive view over HTTP with "
                        "pan/zoom (the headless analog of the reference's "
                        "Metal+SDL2 viewer, src/frontend/metal-sdl2)")
    p.add_argument("--serve-host", type=str, default="127.0.0.1",
                   help="bind address for --serve (default loopback-only; "
                        "pass 0.0.0.0 to expose on all interfaces)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace into DIR "
                        "(the TPU analog of the reference's Mrays/s prints, "
                        "SURVEY.md §5)")
    p.add_argument("--debug-nan", action="store_true",
                   help="enable jax_debug_nans (functional analog of "
                        "TSan/race checks; the reference silently drops NaN "
                        "samples, estimator.hpp:35)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--devices", default=None,
                   help="shard pixel lanes over a device mesh: an integer "
                        "count or 'all' (default: single device)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed first (multi-host: run "
                        "the same command on every host; implies "
                        "--devices all)")
    args = p.parse_args(argv)
    # Validate the open-form sampler spec HERE (argparse choices can't
    # express the zsobol:<scrambler> family) so a typo fails at parse
    # time, not after minutes of scene compilation.
    s = args.sampler
    base = s.split(":", 1)[0]
    scramblers = ("null", "binary", "fastowen", "owen")
    if not (
        s in ("hash", "stratified", "zsobol")
        or (base == "zsobol" and ":" in s
            and s.split(":", 1)[1] in scramblers)
    ):
        p.error(
            f"invalid --sampler {s!r}: expected zsobol | stratified | "
            f"hash | zsobol:{{{','.join(scramblers)}}}"
        )
    return args


def build_scene(args):
    from yart_tpu.scene import procedural

    if args.scene == "cornell":
        b = procedural.cornell_box()
    elif args.scene == "cornell-mat":
        b = procedural.cornell_box(extra_materials=True)
    elif args.scene == "spheres":
        b = procedural.material_test_spheres()
    elif args.scene == "furnace":
        b = procedural.furnace()
    elif args.scene in ("atrium", "atrium-ivy", "atrium-inst"):
        from yart_tpu.scene.showcase import atrium

        b = atrium(ivy=args.scene.endswith("ivy"),
                   instanced=args.scene.endswith("inst"))
    elif args.scene == "luxball":
        from yart_tpu.scene.showcase import luxball

        b = luxball()
    elif args.scene == "roadster":
        from yart_tpu.scene.showcase import roadster

        b = roadster()
    else:
        from yart_tpu.scene.gltf import load

        b = load(args.scene)

    if args.env_hdr:
        from yart_tpu.io.image import load_hdr

        b.set_env(load_hdr(args.env_hdr), args.env_scale)
    b.set_background([float(x) for x in args.background.split(",")])
    return b.compile()


def default_camera(args, name):
    defaults = {
        "cornell": ((0, 1.0, 3.4), (0, 1.0, 0)),
        "cornell-mat": ((0, 1.0, 3.4), (0, 1.0, 0)),
        "spheres": ((0, 2.2, 5.5), (0, 0.4, -0.6)),
        "furnace": ((0, 0, 3.5), (0, 0, 0)),
        "atrium": ((-10.0, 1.8, 0.0), (8.0, 2.6, 0.0)),
        "atrium-ivy": ((-10.0, 1.8, 0.0), (8.0, 2.6, 0.0)),
        "atrium-inst": ((-10.0, 1.8, 0.0), (8.0, 2.6, 0.0)),
        "roadster": ((4.4, 1.7, 5.0), (0.0, 0.5, 0.0)),
        # Reference LuxBall camera (src/main.cpp:37).
        "luxball": ((0.12, 0.28, 0.35), (0.0, 0.06, 0.0)),
    }
    # Interior scenes under a sky env need positive EV (the reference's
    # Sponza config runs at +5 EV, src/main.cpp:34).
    exposure = {"atrium": 3.0, "atrium-ivy": 3.0, "atrium-inst": 3.0,
                "roadster": 1.0, "luxball": 1.0}
    if args.exposure is None:
        args.exposure = exposure.get(name, 0.0)
    pos, target = defaults.get(name, ((0, 1, 4), (0, 1, 0)))
    if args.camera_pos:
        pos = tuple(float(x) for x in args.camera_pos.split(","))
    if args.camera_target:
        target = tuple(float(x) for x in args.camera_target.split(","))
    fwd = tuple(t - p for p, t in zip(pos, target))
    return pos, fwd


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.config:
        import json

        with open(args.config) as f:
            defaults = json.load(f)
        # Re-parse so explicit command-line flags override file values.
        p2 = parse_args([args.scene])
        for k, v in defaults.items():
            k = k.replace("-", "_")
            if not hasattr(p2, k):
                raise SystemExit(f"unknown config key: {k}")
        import sys as _sys

        given = {a.split("=")[0].lstrip("-").replace("-", "_")
                 for a in (argv if argv is not None else _sys.argv[1:])
                 if a.startswith("--")}
        for k, v in defaults.items():
            k2 = k.replace("-", "_")
            if k2 not in given:
                setattr(args, k2, v)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )

    from yart_tpu.cache import enable_compile_cache
    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.io.image import write_png, write_ppm
    from yart_tpu.render.renderer import Renderer

    enable_compile_cache()

    if args.debug_nan:
        import jax

        jax.config.update("jax_debug_nans", True)

    w, h = (int(x) for x in args.size.lower().split("x"))
    scene, meta = build_scene(args)
    pos, fwd = default_camera(args, args.scene)

    cam = CameraConfig(
        image_size=(w, h),
        focal_length=args.focal,
        f_number=args.fnumber,
        position=pos,
        forward=fwd,
        exposure=args.exposure,
        aperture_sides=args.aperture_sides,
    )
    cfg = RenderConfig(
        samples=args.spp,
        max_depth=args.max_depth,
        integrator=args.integrator,
        sampler=args.sampler,
        estimator=args.estimator,
        tonemap=args.tonemap,
        agx_look=args.look,
        seed=args.seed,
        first_wave_samples=args.first_wave,
        max_wave_samples=args.max_wave,
        lane_chunk=args.chunk_pixels,
        shade_kernel=args.shade_kernel,
        clamp=args.clamp,
        regularize_specular=args.regularize_specular,
    )

    if not args.quiet:
        print(
            f"scene: {args.scene} ({meta.n_tris} tris, {meta.n_lights} lights, "
            f"env={meta.has_env}); {w}x{h} @ {args.spp}spp"
        )

    devices = args.devices
    if args.distributed:
        from yart_tpu.parallel.distributed import init_distributed

        init_distributed()
        devices = "all"
    elif devices is not None and devices != "all":
        devices = int(devices)
    r = Renderer(scene, meta, cam, cfg, devices=devices)
    if not args.quiet and r.n_devices > 1:
        print(f"mesh: {r.n_devices} devices")

    server = None
    if args.serve is not None:
        from yart_tpu.io.preview import PreviewServer

        server = PreviewServer(args.serve, host=args.serve_host)
        if not args.quiet:
            print(f"live view: http://localhost:{server.port}/")

    def on_wave(wd, preview):
        if not args.quiet:
            mrays = wd.rays / max(wd.time, 1e-9) / 1e6
            print(
                f"wave {wd.wave}: {wd.samples_taken}/{wd.total_samples} spp, "
                f"{mrays:.2f} Mrays/s, {wd.time:.1f}s"
            )
        if args.preview:
            write_png(args.preview, preview, gamma_encode=False)
        if server is not None:
            server.update(preview, wd)

    # Within-wave progress (the reference blits finished tiles live,
    # frontend/metal-sdl2/main.cpp:205-217): throttled partial previews to
    # the live view + preview PNG, so flagship waves (minutes each) show
    # motion. Only wired when someone is watching.
    on_chunk = None
    if server is not None or args.preview:
        from yart_tpu.ops.tonemap import tonemap as _tonemap

        last = [0.0]

        def on_chunk(cd, merged_hdr):
            import time as _time

            if cd.chunk + 1 >= cd.n_chunks:  # on_wave covers the last chunk
                return
            now = _time.monotonic()
            if now - last[0] < 2.0:
                return
            last[0] = now
            import jax.numpy as _jnp
            import numpy as _npx

            img = _npx.asarray(
                _tonemap(_jnp.asarray(merged_hdr()), cfg.tonemap,
                         cfg.agx_look)
            )
            if server is not None:
                server.update(img)
            if args.preview:
                write_png(args.preview, img, gamma_encode=False)

    if args.profile:
        import contextlib

        import jax

        profile_cm = jax.profiler.trace(args.profile)
    else:
        import contextlib

        profile_cm = contextlib.nullcontext()
    with profile_cm:
        res = r.render(
            on_wave=on_wave, on_chunk=on_chunk, checkpoint=args.checkpoint
        )
    if server is not None:
        server.update(res.display, done=True)

    out = args.output
    if out.endswith(".ppm"):
        write_ppm(out, res.display)
    else:
        write_png(out, res.display, gamma_encode=False)
    if not args.quiet:
        print(
            f"wrote {out}: {res.samples_taken}spp, {res.total_rays / 1e6:.1f} Mrays, "
            f"{res.total_time:.1f}s "
            f"({res.total_rays / max(res.total_time, 1e-9) / 1e6:.2f} Mrays/s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
