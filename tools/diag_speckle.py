"""Firefly/speckle comparison of two HDR renders at equal spp.

Usage: python tools/diag_speckle.py base.npz regspec.npz

Reads the renderer checkpoint npz (field `hdr`, the merged linear HDR
buffer) and reports tail luminance statistics — the roadster canopy
speckle (VERDICT r4 #6) shows up as a heavy p99.9+ tail, so a real
(unbiased) mitigation must lower the tail percentiles without moving the
median/mean (energy preserved; bias would show as a mean shift).
"""

from __future__ import annotations

import sys

import numpy as np


def stats(path: str) -> dict:
    with np.load(path) as z:
        hdr = z["hdr"]
    lum = (0.2126 * hdr[..., 0] + 0.7152 * hdr[..., 1]
           + 0.0722 * hdr[..., 2]).reshape(-1)
    med = float(np.median(lum))
    return {
        "path": path,
        "mean": float(lum.mean()),
        "median": med,
        "p99": float(np.percentile(lum, 99.0)),
        "p99.9": float(np.percentile(lum, 99.9)),
        "p99.99": float(np.percentile(lum, 99.99)),
        "max": float(lum.max()),
        "frac>32xmed": float((lum > 32.0 * max(med, 1e-8)).mean()),
    }


def main() -> None:
    rows = [stats(p) for p in sys.argv[1:]]
    keys = ["mean", "median", "p99", "p99.9", "p99.99", "max", "frac>32xmed"]
    for r in rows:
        print(r["path"])
        print("  " + "  ".join(f"{k}={r[k]:.5g}" for k in keys))
    if len(rows) == 2:
        a, b = rows
        print("ratios (second/first):")
        print("  " + "  ".join(
            f"{k}={b[k] / a[k]:.3f}" if a[k] else f"{k}=n/a" for k in keys))


if __name__ == "__main__":
    main()
