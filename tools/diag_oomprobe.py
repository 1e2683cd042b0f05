"""AOT compile-probe of the cornell fwd+bwd bench shape on the axon TPU
target (compile only, no execution): verifies the flattened fetch_3d
retires the round-5 HBM OOM and prints the program's memory analysis."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax, jax.numpy as jnp
from yart_tpu.cache import enable_compile_cache
from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.render.camera import build_camera
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.procedural import cornell_box

enable_compile_cache()
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

@jax.jit
def gk(bc, scene, px, py, sidx):
    total = jnp.zeros((), jnp.float32)
    g = None
    for _ in range(3):
        bci = bc if g is None else bc + g * 1e-30
        (val, rays), g = vg(bci, scene, px, py, sidx)
        total = total + rays.astype(jnp.float32)
    return g, total

print("lowering...", flush=True)
lowered = gk.lower(scene.materials.base_color, scene, px, py, sidx)
print("compiling...", flush=True)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print("COMPILE OK")
print("temp_size:", getattr(ma, "temp_size_in_bytes", None))
print("argument_size:", getattr(ma, "argument_size_in_bytes", None))
