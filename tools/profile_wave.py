"""Profile one integrator wave on the real chip and print device-op time
aggregated by op name (the TPU analog of a CPU sampling profile; SURVEY.md
§5 tracing).

    python -u tools/profile_wave.py [scene] > /tmp/prof.txt 2>&1

Scene: any CLI procedural name (default atrium). Renders one small wave
under jax.profiler.trace and aggregates the XLA trace events.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def aggregate(trace_dir: str, top: int = 40):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Keep only device-lane complete events (phase X with a duration).
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        if name.startswith(("$", "process_")):
            continue
        pid_name = ev.get("pid")
        # Heuristic: XLA op events carry args with long_name or tf_op.
        args = ev.get("args") or {}
        if not ("long_name" in args or "tf_op" in args or "hlo" in name
                or re.match(r"^(fusion|copy|while|custom-call|dynamic|"
                            r"convert|transpose|reduce|scatter|gather|sort|"
                            r"select|broadcast|iota|bitcast|concatenate|"
                            r"all-|dot|pad|slice|rsqrt|add|multiply|cmp|"
                            r"tuple)", name)):
            continue_ok = True
        # Aggregate by base name (strip .N suffixes).
        base = re.sub(r"\.\d+$", "", name)
        dur[base] += ev["dur"]
        cnt[base] += 1
        total += ev["dur"]
    print(f"trace: {path}")
    print(f"total event time: {total/1e3:.1f} ms (may double-count host+device rows)")
    for name, us in dur.most_common(top):
        print(f"  {us/1e3:9.2f} ms  x{cnt[name]:<6d} {name[:90]}")


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "atrium"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    side = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import CameraConfig, RenderConfig
    from yart_tpu.ops.qmc import make_sampler
    from yart_tpu.render.camera import build_camera
    from yart_tpu.render.integrator import render_wave
    from yart_tpu import cli as _cli

    class _A:
        scene = scene_name
        env_hdr = None
        env_scale = 1.0
        background = "0,0,0"
    scene, meta = _cli.build_scene(_A)

    class _B:
        camera_pos = None
        camera_target = None
        exposure = None
    pos, fwd = _cli.default_camera(_B, scene_name)
    cam = build_camera(CameraConfig(
        image_size=(side, side), focal_length=28.0, position=pos,
        forward=fwd, exposure=_B.exposure or 0.0,
    ))
    cfg = RenderConfig(samples=spp, max_depth=8)
    sampler = make_sampler(cfg.sampler, cfg.samples, (side, side), cfg.seed)

    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
    py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
    sidx = jnp.asarray(np.tile(np.arange(spp), side * side), jnp.uint32)

    fn = jax.jit(lambda s, px, py, si: render_wave(
        s, meta, cam, sampler, cfg, px, py, si))
    out, rays = fn(scene, px, py, sidx)
    print("warm:", float(jnp.sum(out[:8])), "rays", float(rays), flush=True)

    trace_dir = "/tmp/yart_prof"
    os.system(f"rm -rf {trace_dir}")
    import time
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        out, rays = fn(scene, px, py, sidx)
        s = float(jnp.sum(out[:8]))
        dt = time.time() - t0
    print(f"wave: {dt*1e3:.1f} ms, {float(rays)/dt/1e6:.2f} Mrays/s "
          f"({side}x{side}x{spp})", flush=True)
    aggregate(trace_dir)


if __name__ == "__main__":
    main()
