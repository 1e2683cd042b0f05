"""Live HTTP preview server (yart_tpu/io/preview.py) — the headless analog
of the reference's Metal+SDL2 viewer (src/frontend/metal-sdl2/main.cpp).

Drives the real server over a socket: page, frame PNG, and status JSON all
update as waves arrive.
"""

from __future__ import annotations

import json
import urllib.request

import numpy as np

from yart_tpu.io.preview import PreviewServer
from yart_tpu.render.renderer import WaveData


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read(), r.headers.get("Content-Type")


def test_preview_server_serves_frames_and_status():
    srv = PreviewServer(port=0, host="127.0.0.1")
    try:
        # Landing page before any frame.
        body, ctype = _get(srv.port, "/")
        assert ctype == "text/html"
        assert b"yart-tpu live view" in body

        # Push two waves; frame counter and stats must advance.
        img = np.zeros((8, 8, 3), np.float32)
        img[..., 0] = 0.5
        wd = WaveData(wave=0, wave_samples=4, samples_taken=4,
                      total_samples=16, rays=1e6, time=2.0)
        srv.update(img, wd)

        png1, ctype = _get(srv.port, "/frame.png")
        assert ctype == "image/png"
        assert png1[:8] == b"\x89PNG\r\n\x1a\n"

        st, ctype = _get(srv.port, "/status")
        assert ctype == "application/json"
        st = json.loads(st)
        assert st["samples_taken"] == 4 and st["total_samples"] == 16
        assert st["frame"] == 1 and not st["done"]
        assert abs(st["mrays"] - 0.5) < 1e-6

        img[..., 1] = 1.0
        srv.update(img, WaveData(wave=1, wave_samples=4, samples_taken=8,
                                 total_samples=16, rays=2e6, time=3.0),
                   done=True)
        png2, _ = _get(srv.port, "/frame.png")
        st2 = json.loads(_get(srv.port, "/status")[0])
        assert st2["frame"] == 2 and st2["done"]
        assert st2["samples_taken"] == 8
        assert png2 != png1

        # The served PNG decodes back to the pushed image.
        from PIL import Image
        import io as _io

        arr = np.asarray(Image.open(_io.BytesIO(png2)))
        assert arr.shape[:2] == (8, 8)
    finally:
        srv.close()
