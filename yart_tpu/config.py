"""Configuration dataclasses.

The reference has no config system — every knob is a public field or macro
edited in ``src/main.cpp`` (README.md:19-20). Here each knob catalogued in
SURVEY.md §5 becomes a config field.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Thin-lens physical camera (src/core/camera.hpp:10-165)."""

    image_size: Tuple[int, int] = (512, 512)  # (width, height) pixels
    focal_length: float = 35.0  # mm
    f_number: float = 0.0  # 0 disables depth of field
    sensor_size: Tuple[float, float] = (36.0, 24.0)  # mm, 35mm full frame
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    forward: Tuple[float, float, float] = (0.0, 0.0, -1.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    exposure: float = 0.0  # EV stops, applied as 2**exposure to samples
    aperture_sides: int = 0  # 0 = circular aperture, >=3 = bladed


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render/integrator/scheduler knobs.

    Defaults mirror the reference's hardcoded values:
    - max_depth=30 (src/cpu/ray-integrator.hpp:14)
    - GMoN m_max=15 (src/cpu/integrator.cpp:17)
    - regularization threshold 0.5 (src/cpu/mis-integrator.cpp:3)
    - waves double from first_wave_samples up to max_wave_samples
      (src/cpu/tile-renderer.hpp:104-108)
    """

    samples: int = 64
    max_depth: int = 30
    integrator: str = "mis"  # "mis" | "naive"
    sampler: str = "zsobol"  # "zsobol" | "hash" | "stratified"
    estimator: str = "gmon"  # "gmon" | "gmonb" | "mon" | "mean"
    light_sampler: str = "power"  # "power" | "uniform" (light-sampler.cpp)
    estimator_buckets: int = 15
    regularize_threshold: float = 0.5
    # Specular-chain path regularization (round 5; no reference analog —
    # the reference regularizes on ACCUMULATED roughness only,
    # mis-integrator.cpp:90-92, which a pure specular chain never
    # triggers: camera -> glass -> chrome caustics stay unregularized
    # and speckle the roadster canopy). k = lanes with >= k prior
    # specular scatters sample with roughen()ed lobes; k=1 roughens the
    # SECOND specular vertex onward (the standard path-regularization
    # move). None (default) = reference-parity behavior. Biased the way
    # all path regularization is; --regularize-specular on the CLI.
    regularize_specular: Optional[int] = None
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Reference defaults (DEFAULT_FIRST_WAVE_SAMPLES/MAX, tile-renderer.hpp:13-14);
    # GMoN bucketing needs >= ~15 samples per wave to engage.
    first_wave_samples: int = 64
    max_wave_samples: int = 128
    tonemap: str = "agx"  # "agx" | "none"
    agx_look: str = "none"  # "none" | "golden" | "punchy"
    rr_start_depth: int = 2  # roulette from depth 2 (mis-integrator.cpp:98)
    # Per-sample radiance clamp (pre-exposure), None = off. A standard
    # production firefly-suppression knob the reference lacks; biased.
    clamp: Optional[float] = None
    # Staged wavefront compaction: after `compact_depth` bounces,
    # surviving lanes compact into n / compact_factor lanes and later
    # bounces run at reduced width (overflow lanes drain exactly at full
    # width — exact for any cap). Bit-identical images for any setting
    # (counter-based sampling). "auto" = 2 for env-lit scenes (escape
    # paths retire early: measured atrium +50%, roadster +78%, ivy +44%),
    # off for closed scenes (a cornell box keeps >1/factor of its lanes
    # alive past the split and the overflow drain costs ~-28% —
    # BASELINE.md round 4). Round 5: also applied to the DIFFERENTIABLE
    # scan (full-width stage, differentiable gather, compacted stage,
    # cond-gated overflow drain) — gradients flow through the gathers;
    # see li()'s staged-scan block.
    compact_depth: object = "auto"  # "auto" | int | None
    compact_factor: int = 4
    # TPU execution knobs (no reference analog):
    lane_chunk: Optional[int] = None  # rays per device dispatch; None = whole wave
    # Pixel chunks kept in flight by the wave loop: jax dispatch is async,
    # so >= 2 overlaps chunk k+1's compute with chunk k's host transfer
    # (the per-dispatch latency is ~26 ms on the axon runtime).
    chunk_inflight: int = 2
    seed: int = 0
    # Fused shade path: "off" = the classic jnp bounce body; "xla" = the
    # shared component-form shade math (kernels/shade_math.py) assembled by
    # XLA — numerically equivalent, used for validation/fallback; "pallas" =
    # the fused per-bounce shade kernel (kernels/pallas_shade.py).
    # STATUS (round 5): "pallas" is an EXPERIMENT, kept for its measured
    # record (+4.6% cornell, -4% atrium, forward-only): the wave profile
    # is traversal-bound, so the shade tail is not where the time is.
    # Production and differentiable rendering use "off"/"xla".
    shade_kernel: str = "off"
    # Differentiable-mode knob: re-solve each hit's (t, u, v) from the
    # vertex positions (Moller-Trumbore as an implicit function) so
    # gradients flow to scene.positions — the interior (shading) term of
    # geometry derivatives; visibility stays detached (render/diff.py).
    diff_geometry: bool = False
    # Backward-pass remat policy: "trace" saves traversal outputs across
    # the per-bounce checkpoint; "trace_lut" also saves LUT/texture
    # fetches; "all" saves everything (no re-forward, HBM-bound).
    # Measured (tools/diag_bwd.py, chip): trace_lut cuts the cornell
    # backward overhead 17.1 -> 11.2 ms on an 18 ms forward (+20%
    # fwd+bwd throughput) and also wins on the atrium; "all" is 3x
    # WORSE (the saved-residual HBM traffic dominates). Residual cost:
    # ~20 f32/lane/bounce.
    remat: str = "trace_lut"


@dataclasses.dataclass(frozen=True)
class BVHConfig:
    """SAH build knobs (src/core/bvh.hpp:14,283)."""

    max_leaf_size: int = 8
    n_bins: int = 20
    branching: int = 4  # flattened wide-BVH arity for the TPU traversal
