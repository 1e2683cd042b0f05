"""Entered-cluster distribution for REAL atrium wave rays (camera +
cosine-bounce), per cluster_size. Decides traversal shape tuning for the
flagship wave (round 3).

    python -u tools/diag_atrium_rays.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(tag, count):
    qs = np.percentile(count, [50, 90, 99])
    print(
        f"  {tag}: mean {count.mean():.2f} p50/p90/p99 {qs.astype(int)} "
        f"max {count.max()} frac>2 {np.mean(count > 2):.3f}",
        flush=True,
    )


def main():
    from yart_tpu.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from yart_tpu.config import CameraConfig
    from yart_tpu.kernels.pallas_fusedtrace import (
        N_SLOTS, presort_keys_pallas,
    )
    from yart_tpu.ops.vecmath import frame_from_normal
    from yart_tpu.render.blocktrace import intersect_blocktrace
    from yart_tpu.render.camera import build_camera, generate_rays
    from yart_tpu.scene.showcase import atrium

    for csize in (64, 128, 256):
        scene, meta = atrium().compile(cluster_size=csize)
        print(
            f"cluster_size {csize}: {meta.n_tris} tris, "
            f"{meta.n_clusters} clusters, pack "
            f"{scene.clus_pack.size * 4 / 1e6:.0f} MB",
            flush=True,
        )
        cam = build_camera(CameraConfig(
            image_size=(256, 256), focal_length=28.0,
            position=(-10.0, 1.8, 0.0), forward=(18.0, 0.8, 0.0),
        ))
        n = 256 * 256
        yy, xx = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        u_film = jnp.full((n, 2), 0.5, jnp.float32)
        u_lens = jnp.full((n, 2), 0.5, jnp.float32)
        o, d = generate_rays(cam, px, py, u_film, u_lens)

        def count_of(o, d):
            rays = jnp.concatenate(
                [o, d, jnp.full((o.shape[0], 1), 1e9, jnp.float32),
                 jnp.zeros((o.shape[0], 1), jnp.float32)], axis=1
            )
            out = presort_keys_pallas(
                rays, scene.clus_box, int(meta.n_clusters), 1e-3, block=128
            )
            return np.asarray(out[:, 1 + N_SLOTS])

        stats("camera", count_of(o, d))

        h = jax.jit(lambda s, o, d: intersect_blocktrace(
            s, meta, o, d, 1e9))(scene, o, d)
        # cosine bounce rays at the hit points (geometric normal proxy:
        # perturb via tri index hash — enough for a traversal statistic).
        t = np.asarray(h.t)
        hitm = np.asarray(h.mask)
        p = np.asarray(o) + t[:, None] * np.asarray(d)
        rng = np.random.default_rng(5)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        p = p[hitm]
        dirs = dirs[hitm]
        o2 = jnp.asarray(p - np.asarray(d)[hitm] * 1e-3)
        pad = (-o2.shape[0]) % 128
        if pad:
            o2 = jnp.concatenate([o2, jnp.zeros((pad, 3))], axis=0)
            dirs = np.concatenate([dirs, np.tile([[0, 0, 1]], (pad, 1))], 0)
        stats("bounce", count_of(o2, jnp.asarray(dirs, jnp.float32)))


if __name__ == "__main__":
    main()
