"""Image output (PPM/PNG) and HDR input.

PPM mirrors the reference writer exactly: P6 binary, gamma-1/2.2 encode,
clamp (src/output/ppm.cpp:5-21), applied to the already-tonemapped display
buffer. PNG is a dependency-free encoder (zlib + struct). HDR loading reads
Radiance .hdr RGBE files (the reference uses stb's loadf,
src/core/texture.cpp:5-19).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _encode_gamma22(img: np.ndarray) -> np.ndarray:
    out = np.clip(img, 0.0, 1.0) ** (1.0 / 2.2)
    return (out * 255.0 + 0.5).astype(np.uint8)


def write_ppm(path: str, display: np.ndarray) -> None:
    """P6 writer (src/output/ppm.cpp:7-21); display is [H, W, 3] linear."""
    h, w = display.shape[:2]
    data = _encode_gamma22(display[..., :3])
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())


def encode_png(display: np.ndarray, gamma_encode: bool = True,
               keep_alpha: bool = False) -> bytes:
    """Minimal RGB8/RGBA8 PNG encoder; display is [H, W, 3|4] linear (or
    already encoded if gamma_encode=False). `keep_alpha` writes a 4th
    channel (straight, linear) when present — used by the GLB exporter
    for alpha-tested base-color textures. Returns the PNG bytes."""
    h, w = display.shape[:2]
    nc = 4 if (keep_alpha and display.shape[-1] >= 4) else 3
    if gamma_encode:
        data = _encode_gamma22(display[..., :3])
        if nc == 4:
            a = np.clip(display[..., 3:4] * 255.0 + 0.5, 0, 255)
            data = np.concatenate([data, a.astype(np.uint8)], axis=-1)
    else:
        data = np.clip(display[..., :nc] * 255.0 + 0.5, 0, 255).astype(
            np.uint8
        )

    raw = b"".join(
        b"\x00" + data[y].tobytes() for y in range(h)
    )

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if nc == 3 else 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(path: str, display: np.ndarray, gamma_encode: bool = True) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(display, gamma_encode))


def load_hdr(path: str) -> np.ndarray:
    """Radiance RGBE (.hdr) loader -> [H, W, 3] float32 linear."""
    with open(path, "rb") as f:
        data = f.read()

    # Header
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad HDR header")
    header_end = pos + 2
    dims_end = data.find(b"\n", header_end)
    dims = data[header_end:dims_end].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation: {dims}")
    h, w = int(dims[1]), int(dims[3])

    rgbe = np.zeros((h, w, 4), np.uint8)
    p = dims_end + 1
    buf = np.frombuffer(data, np.uint8)
    for y in range(h):
        # New-style RLE scanline?
        if w >= 8 and w < 32768 and buf[p] == 2 and buf[p + 1] == 2:
            if (int(buf[p + 2]) << 8 | int(buf[p + 3])) != w:
                raise ValueError("HDR scanline width mismatch")
            p += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[p])
                    p += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = buf[p]
                        x += count - 128
                        p += 1
                    else:  # literal
                        rgbe[y, x : x + count, c] = buf[p : p + count]
                        x += count
                        p += count
        else:
            flat = buf[p : p + w * 4].reshape(w, 4)
            rgbe[y] = flat
            p += w * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def save_hdr(path: str, image: np.ndarray) -> None:
    """Radiance RGBE (.hdr) writer, uncompressed scanlines; [H, W, 3] linear."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w, 3), np.uint8)
    nz = maxc > 1e-32
    # frexp: maxc = f * 2^e with f in [0.5, 1)
    f, e = np.frexp(np.where(nz, maxc, 1.0))
    scale = np.where(nz, f * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    mant = np.clip(img * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    exp = np.where(nz, e + 128, 0).astype(np.uint8)
    rgbe = np.concatenate([mant, exp[..., None]], axis=-1)
    with open(path, "wb") as fo:
        fo.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fo.write(f"-Y {h} +X {w}\n".encode())
        fo.write(rgbe.tobytes())
