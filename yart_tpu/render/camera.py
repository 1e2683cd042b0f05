"""Thin-lens physical camera.

Re-design of the reference camera (src/core/camera.hpp:10-165): derived
properties (viewport, pixel deltas, aperture radius) are computed host-side
into a small pytree of device scalars; ray generation is a pure batched
function over pixel coordinates — one call generates the whole wavefront.

Conventions preserved:
- image plane placed AT the focus plane; focus distance = |forward|
  (camera.hpp:31-44).
- aspect crop of the sensor (camera.hpp:27-29).
- aperture radius = (focalLength/2000)/fNumber in scene units (camera.hpp:57-59).
- Gaussian pixel jitter sigma=0.3, disk or bladed-polygon lens sampling
  (camera.hpp:138-164).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from yart_tpu.config import CameraConfig
from yart_tpu.ops import warps


class CameraParams(NamedTuple):
    """Device-side derived camera state (camera.hpp:20-23 analogs)."""

    position: jnp.ndarray  # [3]
    top_left_pixel: jnp.ndarray  # [3]
    pixel_delta_u: jnp.ndarray  # [3]
    pixel_delta_v: jnp.ndarray  # [3]
    frame_x: jnp.ndarray  # [3] camera frame (u)
    frame_y: jnp.ndarray  # [3] camera frame (v)
    aperture_radius: jnp.ndarray  # []
    exposure_scale: jnp.ndarray  # [] 2**EV, applied by the integrator
    aperture_sides: int  # static: 0 = circular
    image_size: tuple  # static (width, height)


def build_camera(cfg: CameraConfig) -> CameraParams:
    """Host-side calcDerivedProperties (camera.hpp:25-59)."""
    w_px, h_px = cfg.image_size
    aspect = float(w_px) / float(h_px)
    sensor_w, sensor_h = cfg.sensor_size
    sensor_aspect = sensor_w / sensor_h
    cropped_h = sensor_w / max(sensor_aspect, aspect)

    position = np.asarray(cfg.position, np.float64)
    forward = np.asarray(cfg.forward, np.float64)
    up = np.asarray(cfg.up, np.float64)

    focus_distance = float(np.linalg.norm(forward))
    vh = focus_distance * cropped_h / cfg.focal_length
    vw = vh * aspect

    up = up / np.linalg.norm(up)
    wv = -forward / focus_distance
    u = np.cross(up, wv)
    u = u / np.linalg.norm(u)
    v = np.cross(wv, u)

    viewport_u = u * vw
    viewport_v = -v * vh
    viewport_top_left = position - wv * focus_distance - (viewport_u + viewport_v) * 0.5
    pixel_delta_u = viewport_u / w_px
    pixel_delta_v = viewport_v / h_px
    top_left_pixel = viewport_top_left + (pixel_delta_u + pixel_delta_v) * 0.5

    aperture_radius = (
        (cfg.focal_length / 2000.0) / cfg.f_number if cfg.f_number else 0.0
    )

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return CameraParams(
        position=f32(position),
        top_left_pixel=f32(top_left_pixel),
        pixel_delta_u=f32(pixel_delta_u),
        pixel_delta_v=f32(pixel_delta_v),
        frame_x=f32(u),
        frame_y=f32(v),
        aperture_radius=f32(aperture_radius),
        exposure_scale=f32(2.0 ** cfg.exposure),
        aperture_sides=int(cfg.aperture_sides),
        image_size=(int(w_px), int(h_px)),
    )


def generate_rays(cam: CameraParams, px, py, u_film, u_lens):
    """Batched Camera::getRay (camera.hpp:138-164).

    px, py: [...] integer pixel coords; u_film, u_lens: [..., 2] uniforms.
    Returns (origin [..., 3], direction [..., 3] normalized).
    """
    jitter = warps.pixel_jitter_gaussian(u_film, 0.3)
    jx = jitter[..., 0] + px.astype(jnp.float32)
    jy = jitter[..., 1] + py.astype(jnp.float32)
    pixel = (
        cam.top_left_pixel
        + jx[..., None] * cam.pixel_delta_u
        + jy[..., None] * cam.pixel_delta_v
    )

    origin = jnp.broadcast_to(cam.position, pixel.shape)
    if cam.aperture_sides == 0:
        ap = warps.sample_disk_uniform(u_lens)
    else:
        ap = warps.sample_poly_uniform(u_lens, cam.aperture_sides)
    lens_offset = (
        ap[..., 0:1] * cam.frame_x + ap[..., 1:2] * cam.frame_y
    ) * cam.aperture_radius
    # aperture_radius == 0 keeps origin exact (no DoF).
    origin = origin + lens_offset

    d = pixel - origin
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return origin, d
