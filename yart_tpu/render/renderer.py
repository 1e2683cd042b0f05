"""Progressive wave renderer — the TPU analog of TileRenderer.

The reference (src/cpu/tile-renderer.hpp) splits the image into 64px tiles
pulled from a mutex-guarded queue by N OS threads, renders progressive
"waves" of samples (1, 2, 4, ... max) with a condvar barrier between waves,
and merges each wave into the HDR buffer by sample-count weights.

Here the whole image is a dense SoA wavefront: tiles become jit-shaped pixel
chunks (static shapes, one compile per wave size), threads become VPU lanes,
the wave barrier is the device-step boundary, and the weighted merge
(tile-renderer.hpp:220-232) is an elementwise lerp. Estimator semantics match
the reference: the estimator reduces WITHIN a wave, waves merge linearly
(integrator.cpp:17-25 + tile-renderer.hpp:220-232).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yart_tpu.config import CameraConfig, RenderConfig
from yart_tpu.ops.qmc import make_sampler
from yart_tpu.ops.tonemap import tonemap
from yart_tpu.render.camera import build_camera
from yart_tpu.render.estimator import estimate
from yart_tpu.render.integrator import render_wave
from yart_tpu.scene.types import CompiledScene, SceneMeta


@dataclasses.dataclass
class WaveData:
    """Progress callback payload (src/core/renderer.hpp:30-43)."""

    wave: int
    wave_samples: int
    samples_taken: int
    total_samples: int
    rays: float
    time: float
    # Effective staged-compaction setting this wave ran with: None (off),
    # or (split, factor). Records the per-wave autotune's choice.
    compact: object = None
    # Per-depth live-lane counts measured across the wave (numpy array).
    live: object = None


@dataclasses.dataclass
class ChunkData:
    """Within-wave progress payload — the tile-complete analog
    (src/core/renderer.hpp:45-50, src/cpu/tile-renderer.hpp:243-262).
    A chunk is the jit-shaped pixel batch the wave loop dispatches; at
    flagship sizes a wave is minutes, so per-chunk callbacks are what
    makes progress visible."""

    wave: int
    wave_samples: int
    chunk: int
    n_chunks: int
    lanes_done: int
    lanes_total: int
    rays: float
    time: float


@dataclasses.dataclass
class RenderResult:
    """Final render state (src/core/renderer.hpp:22-28)."""

    hdr: np.ndarray  # [H, W, 3] linear
    display: np.ndarray  # [H, W, 3] tonemapped linear (PPM-encodable)
    samples_taken: int
    total_rays: float
    total_time: float


def choose_compaction(live, n: int, max_depth: int):
    """Pick (split, factor) for staged wavefront compaction from MEASURED
    per-depth live-lane counts (round-5 replacement for the single-bit
    `has_env` heuristic — an env-lit but mostly-enclosed interior keeps
    too many survivors and used to get compaction guessed "on").

    Cost model (BASELINE.md measured laws): a bounce costs ~its lane
    width (shade fusions + traversal scheduling scale with wavefront
    width); the compaction itself (argsort + state gathers both ways)
    costs ~0.75 bounce-width-equivalents. A factor is feasible at a
    split only with >=20% headroom below the cap (live <= 0.8 * n/f):
    overflow drains are exact but run real full-width bounces. Adopt
    only a >=20% predicted win — switching the choice re-jits the wave
    function, so marginal wins are not worth a recompile.

    Returns (split, factor) or None (= run uncompacted).
    """
    live = np.asarray(live, np.float64)
    n = float(max(n, 1))
    ran = np.nonzero(live > 0)[0]
    if ran.size == 0:
        return None
    d_max = int(ran[-1]) + 1  # bounces the while_loop actually ran
    best = None
    for split in range(1, d_max):
        frac = live[split] / n
        for factor in (8, 6, 4, 3, 2):
            if frac <= 0.8 / factor:
                cost = split + (d_max - split) / factor + 0.75
                if best is None or cost < best[0]:
                    best = (cost, split, factor)
                break  # keep the LARGEST feasible factor for this split
    if best is not None and best[0] <= 0.8 * d_max:
        return int(best[1]), int(best[2])
    return None


def wave_plan(total: int, first: int, max_wave: int):
    """Progressive wave sample counts (tile-renderer.hpp:104-108,284-289):
    first wave `first` (1 if multi-wave), then doubling to max_wave."""
    waves = []
    left = total
    w = first if total > first else total
    while left > 0:
        w = min(w, left, max_wave)
        waves.append(w)
        left -= w
        w *= 2
    return waves


class Renderer:
    """Progressive renderer over one device or a device mesh.

    `devices`: None/0/1 = single default device; N = 1D mesh over the first
    N local devices; "all" = every device (all hosts' devices under
    jax.distributed). Pixel lanes shard over the mesh, the scene replicates,
    and the ray counter psums — the TPU analog of the reference's tile queue
    over hardware_concurrency() threads (src/cpu/tile-renderer.hpp:37,
    150-197). Sampling is a pure function of (pixel, sample, dim), so the
    image is bit-identical for every mesh shape (tests/test_sharding.py).
    """

    def __init__(
        self,
        scene: CompiledScene,
        meta: SceneMeta,
        cam_cfg: CameraConfig,
        cfg: RenderConfig = RenderConfig(),
        devices=None,
    ):
        self.scene = scene
        self.meta = meta
        self.cfg = cfg
        self.cam = build_camera(cam_cfg)
        self.width, self.height = cam_cfg.image_size
        res = max(self.width, self.height)
        self.sampler = make_sampler(cfg.sampler, cfg.samples, (res, res), cfg.seed)
        self._wave_fns = {}

        self.mesh = None
        if devices == "all":
            n_dev = len(jax.devices())
        else:
            n_dev = int(devices or 0)
        if n_dev > 1:
            from yart_tpu.parallel.sharding import (
                device_put_replicated,
                make_mesh,
            )

            self.mesh = make_mesh(None if devices == "all" else n_dev)
            # Replicate the scene once up front (not per wave call). Under
            # jax.distributed the mesh spans processes: device_put of a
            # committed single-device array to a multi-process sharding is
            # rejected, so hand numpy host buffers (identical on every
            # process — scene compilation is deterministic) to device_put.
            tree = self.scene
            if jax.process_count() > 1:
                tree = jax.tree_util.tree_map(np.asarray, tree)
            self.scene = device_put_replicated(self.mesh, tree)
        self.n_devices = self.mesh.devices.size if self.mesh is not None else 1

    def _wave_fn(self, k: int, compact=None):
        """Jitted wave chunk: [P] pixels x k samples -> estimator-reduced
        [P, 3] + ray count + per-depth live counts. One compile per
        distinct (wave size, compaction override). `compact`: None = use
        cfg as-is; "off" = force uncompacted; (split, factor) = explicit
        staged compaction (the per-wave autotune's measured choice)."""
        key = (k, compact)
        if key not in self._wave_fns:
            meta, cam, sampler, cfg = (self.meta, self.cam, self.sampler, self.cfg)
            if compact == "off":
                cfg = dataclasses.replace(cfg, compact_depth=None)
            elif isinstance(compact, tuple):
                cfg = dataclasses.replace(
                    cfg, compact_depth=compact[0], compact_factor=compact[1]
                )

            # `scene` is a jit ARGUMENT, not a closure constant: embedding a
            # multi-MB scene as constants bloats compile time enormously.
            def fn(scene, px, py, sample_base):
                p = px.shape[0]
                lane_px = jnp.repeat(px, k)
                lane_py = jnp.repeat(py, k)
                sidx = (
                    jnp.tile(jnp.arange(k, dtype=jnp.uint32), (p,))
                    + sample_base.astype(jnp.uint32)
                )
                radiance, rays, live = render_wave(
                    scene, meta, cam, sampler, cfg, lane_px, lane_py, sidx,
                    return_live=True,
                )
                samples = radiance.reshape(p, k, 3)
                est = estimate(samples, cfg.estimator, cfg.estimator_buckets)
                return est, rays, live

            if self.mesh is None:
                self._wave_fns[key] = jax.jit(fn)
            else:
                from yart_tpu.parallel.sharding import replicate, shard_lanes

                lanes = shard_lanes(self.mesh)
                rep = replicate(self.mesh)
                # Pixel chunks shard across the mesh; the estimator image
                # comes back sharded and the ray counter + live counts are
                # psums XLA inserts for the replicated outputs.
                self._wave_fns[key] = jax.jit(
                    fn,
                    in_shardings=(rep, lanes, lanes, rep),
                    out_shardings=(rep, rep, rep),
                )
        return self._wave_fns[key]

    def render(
        self,
        on_wave: Optional[Callable[[WaveData, np.ndarray], None]] = None,
        on_chunk: Optional[Callable[[ChunkData, Callable], None]] = None,
        chunk_pixels: Optional[int] = None,
        checkpoint: Optional[str] = None,
        max_waves: Optional[int] = None,
        should_abort: Optional[Callable[[], bool]] = None,
    ) -> RenderResult:
        """Render progressively; `checkpoint` enables elastic resume: the HDR
        accumulator + samples-taken count fully determine renderer state
        because the sampler is stateless given the sample offset (SURVEY.md
        §5; reference waves already merge onto a partial image,
        tile-renderer.hpp:220-232).

        The chunk loop is PIPELINED: jax dispatch is async, so up to
        `cfg.chunk_inflight` chunks stay in flight and chunk k+1 is
        dispatched before blocking on chunk k's transfer — multi-chunk
        waves cost compute, not compute + per-chunk dispatch latency
        (~26 ms on the axon runtime). `on_chunk(cd, merged_hdr)` fires as
        each chunk completes (the reference's tile-complete callback,
        tile-renderer.hpp:243-262); `merged_hdr()` lazily builds the
        current partial [H, W, 3] HDR image (wave-merged over completed
        lanes, previous waves elsewhere) for live previews."""
        cfg = self.cfg
        h, w = self.height, self.width
        n_pix = h * w
        # Pixel chunk bounds memory AND lets chunks whose lanes all
        # terminate early (misses, shallow paths) exit their bounce loops
        # sooner than the global worst lane — the tile analog. The
        # DEFAULT is a LANE budget (~1M rays per dispatch), so big waves
        # shrink their pixel chunks: a fixed pixel chunk at wave k=32 is
        # 4.2M lanes in one dispatch, which overflows HBM on big scenes
        # (measured: atrium-ivy 512^2 first-wave 32 OOM'd at 17 GB).
        # Explicit chunk_pixels / cfg.lane_chunk stay absolute.
        fixed = chunk_pixels or cfg.lane_chunk

        def chunk_for(k: int) -> int:
            c = fixed or max(1, (1 << 20) // max(k, 1))
            c = min(c, n_pix)
            # Chunks must split evenly over the mesh.
            return -(-c // self.n_devices) * self.n_devices

        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # Host buffers: identical on every process, so device_put can shard
        # them over a multi-process mesh (chunk loop below).
        px_all = np.ascontiguousarray(xx.reshape(-1).astype(np.int32))
        py_all = np.ascontiguousarray(yy.reshape(-1).astype(np.int32))

        hdr = jnp.zeros((n_pix, 3), jnp.float32)
        samples_taken = 0
        total_rays = 0.0
        if checkpoint and os.path.exists(checkpoint):
            with np.load(checkpoint) as z:
                if z["hdr"].shape == (n_pix, 3) and int(z["seed"]) == cfg.seed:
                    hdr = jnp.asarray(z["hdr"])
                    samples_taken = int(z["samples_taken"])
                    total_rays = float(z["rays"])
        t0 = time.time()

        plan = wave_plan(cfg.samples, cfg.first_wave_samples, cfg.max_wave_samples)
        # Skip waves already covered by a resumed checkpoint.
        done = samples_taken
        remaining_plan = []
        for k in plan:
            if done >= k:
                done -= k
            else:
                remaining_plan.append(k - done)
                done = 0
        if max_waves is not None:
            remaining_plan = remaining_plan[:max_waves]
        aborted = False
        # Per-wave compaction autotune: the first rendered wave measures
        # per-depth live-lane counts; choose_compaction() then replaces
        # the static has_env guess for every later wave. Only active for
        # compact_depth="auto" (explicit settings are respected verbatim);
        # persists across render() calls so compiled fns are reused.
        autotune = self.cfg.compact_depth == "auto"
        auto_static = (2, self.cfg.compact_factor) if self.meta.has_env else None
        for wave_i, k in enumerate(remaining_plan):
            if should_abort is not None and should_abort():
                # Wave-granular cancellation (the reference polls an abort
                # flag per tile, tile-renderer.hpp:182-185).
                break
            override = getattr(self, "_compact_override", None)
            fn = self._wave_fn(k, override)
            if override is not None:
                effective = None if override == "off" else override
            elif autotune:
                effective = auto_static
            elif self.cfg.compact_depth:
                effective = (self.cfg.compact_depth, self.cfg.compact_factor)
            else:
                effective = None
            chunk = chunk_for(k)
            wave_live = np.zeros((cfg.max_depth,), np.float64)
            # Host-side wave accumulator: wave results come back replicated
            # over the mesh (XLA all_gathers — the only display-path
            # collective, SURVEY.md §2.6), so numpy assembly works on every
            # host under jax.distributed.
            wave_img = np.zeros((n_pix, 3), np.float32)
            n_chunks = -(-n_pix // chunk)
            inflight = []  # [(chunk_idx, start, end, est, rays)]
            lanes_done = 0

            def merged_hdr():
                # Partial merged image for previews: wave-merged where this
                # wave has landed, previous-waves HDR elsewhere.
                cur = np.asarray(hdr)
                if samples_taken == 0:
                    out = wave_img.copy()
                else:
                    wc = samples_taken / (samples_taken + k)
                    wn = k / (samples_taken + k)
                    out = cur * wc + wave_img * wn
                out[lanes_done:] = cur[lanes_done:]
                return out.reshape(h, w, 3)

            def drain_one():
                nonlocal total_rays, lanes_done
                ci, start, end, est, rays, live = inflight.pop(0)
                wave_img[start:end] = np.asarray(est)[: end - start]
                total_rays += float(rays)
                wave_live[:] += np.asarray(live)
                lanes_done = end
                if on_chunk is not None:
                    on_chunk(
                        ChunkData(
                            wave=wave_i, wave_samples=k, chunk=ci,
                            n_chunks=n_chunks, lanes_done=end,
                            lanes_total=n_pix, rays=total_rays,
                            time=time.time() - t0,
                        ),
                        merged_hdr,
                    )

            keep = max(1, int(cfg.chunk_inflight))
            for ci, start in enumerate(range(0, n_pix, chunk)):
                if ci > 0 and should_abort is not None and should_abort():
                    # Per-chunk abort poll from the second chunk on (the
                    # reference polls per tile but finishes the tile in
                    # hand, tile-renderer.hpp:182-185); the partial wave
                    # is DISCARDED — only whole waves merge.
                    aborted = True
                    break
                end = min(start + chunk, n_pix)
                if end - start < chunk:  # pad to static shape
                    sl = np.arange(start, start + chunk) % n_pix
                else:
                    sl = np.arange(start, end)
                px_c, py_c = px_all[sl], py_all[sl]
                base = np.uint32(samples_taken)
                if self.mesh is not None:
                    from yart_tpu.parallel.sharding import (
                        device_put_lanes,
                        replicate,
                    )

                    # Explicit placement from host buffers: valid both for a
                    # local mesh and a multi-process (multi-host) one.
                    px_c, py_c = device_put_lanes(self.mesh, px_c, py_c)
                    base = jax.device_put(base, replicate(self.mesh))
                est, rays, live = fn(self.scene, px_c, py_c, base)
                inflight.append((ci, start, end, est, rays, live))
                if len(inflight) >= keep:
                    drain_one()
            while inflight:
                drain_one()
            if aborted:
                break
            wave_img = jnp.asarray(wave_img)

            if autotune and not getattr(self, "_compact_decided", False):
                # Decide from the first wave's measured retirement curve;
                # only a choice DIFFERENT from the static guess costs a
                # re-jit (the next wave size compiles fresh anyway).
                choice = choose_compaction(
                    wave_live, n_pix * k, cfg.max_depth
                )
                self._compact_decided = True
                if choice != auto_static:
                    self._compact_override = (
                        choice if choice is not None else "off"
                    )

            # Weighted running merge (tile-renderer.hpp:220-232).
            w_cur = samples_taken / (samples_taken + k)
            w_new = k / (samples_taken + k)
            hdr = hdr * w_cur + wave_img * w_new
            samples_taken += k

            if checkpoint:
                # Atomic: a kill mid-write must never corrupt the resume
                # state (the exact scenario checkpointing exists for), so
                # write a sibling temp file and os.replace() it in.
                tmp = checkpoint + ".tmp"
                np.savez(
                    tmp,
                    hdr=np.asarray(hdr),
                    samples_taken=samples_taken,
                    rays=total_rays,
                    seed=cfg.seed,
                )
                # np.savez appends .npz when the name lacks it.
                if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
                    tmp = tmp + ".npz"
                os.replace(tmp, checkpoint)

            if on_wave is not None:
                preview = np.asarray(
                    tonemap(hdr.reshape(h, w, 3), cfg.tonemap, cfg.agx_look)
                )
                on_wave(
                    WaveData(
                        wave=wave_i,
                        wave_samples=k,
                        samples_taken=samples_taken,
                        total_samples=cfg.samples,
                        rays=total_rays,
                        time=time.time() - t0,
                        compact=effective,
                        live=wave_live.copy(),
                    ),
                    preview,
                )

        hdr_img = np.asarray(hdr).reshape(h, w, 3)
        display = np.asarray(
            tonemap(jnp.asarray(hdr_img), cfg.tonemap, cfg.agx_look)
        )
        return RenderResult(
            hdr=hdr_img,
            display=display,
            samples_taken=samples_taken,
            total_rays=total_rays,
            total_time=time.time() - t0,
        )
