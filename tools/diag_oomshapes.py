"""Census of large/oddly-shaped intermediates in the cornell fwd+bwd jaxpr.

The round-5 TPU compile of cornell_fwdbwd (256^2 x 8spp, compact (4,2))
OOM'd on f32[524288,16,1] broadcasts padded 128x by T(8,128) layouts
inside the backward while body. This traces the EXACT bench loss on CPU
and lists every jaxpr intermediate whose shape matches the offenders, to
find the producing op.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box

size = (256, 256); spp = 8
scene, meta = cornell_box(extra_materials=True).compile()
cam = build_camera(CameraConfig(image_size=size, focal_length=28.0,
                                position=(0, 1.0, 3.4), forward=(0, 0, -1)))
cfg = RenderConfig(samples=spp, max_depth=6, rr_start_depth=99,
                   compact_depth=4, compact_factor=2)
sampler = make_sampler(cfg.sampler, cfg.samples, size, cfg.seed)
w, h = size
yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
px = jnp.asarray(np.repeat(xx.reshape(-1), spp), jnp.int32)
py = jnp.asarray(np.repeat(yy.reshape(-1), spp), jnp.int32)
sidx = jnp.asarray(np.tile(np.arange(spp), h * w), jnp.uint32)

def loss(base_color, scene, px, py, sidx):
    s = scene._replace(materials=scene.materials._replace(base_color=base_color))
    radiance, rays = render_wave(s, meta, cam, sampler, cfg, px, py, sidx,
                                 differentiable=True)
    return jnp.mean(radiance), rays

vg = jax.value_and_grad(loss, has_aux=True)
print("tracing...", flush=True)
jaxpr = jax.make_jaxpr(vg)(scene.materials.base_color, scene, px, py, sidx)

n = 524288
TARGETS = {(n,16,1), (n,16,16), (n,1,16), (n,32)}
hits = {}
def walk(jx, path):
    for eqn in jx.eqns:
        for v in eqn.outvars:
            shp = tuple(getattr(v.aval, "shape", ()))
            if shp in TARGETS:
                key = (shp, eqn.primitive.name, path)
                hits[key] = hits.get(key, 0) + 1
        for pname in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr", "branches"):
            sub = eqn.params.get(pname)
            if sub is None: continue
            subs = sub if isinstance(sub, (list, tuple)) else [sub]
            for s2 in subs:
                core = getattr(s2, "jaxpr", s2)
                if hasattr(core, "eqns"):
                    walk(core, path + "/" + eqn.primitive.name)
walk(jaxpr.jaxpr, "")
for (shp, prim, path), c in sorted(hits.items(), key=lambda kv: -kv[1]):
    print(f"{c:5d}x  {shp}  {prim:24s} {path}")
print("done")
