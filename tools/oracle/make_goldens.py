"""Render the oracle's parity images and store them for tests/test_parity.py.

Runs the reference-compiled oracle (build.sh) at high spp on the two
analytic scenes and saves the full per-pixel HDR buffers to
tests/goldens/oracle_images.npz. Committed as numeric golden data (derived
measurements, not reference code).

Usage: python tools/oracle/make_goldens.py [oracle_dir] [spp]
"""

import os
import subprocess
import sys

import numpy as np


def read_dump(path):
    with open(path) as f:
        w, h = (int(x) for x in f.readline().split())
        data = np.loadtxt(f, dtype=np.float32)
    return data.reshape(h, w, 3)


def main():
    oracle = os.path.join(sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle", "oracle")
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    out = {}
    jobs = [
        ("cornell_mis", ["mis", str(spp), "1", "0", "cornell"]),
        ("cornell_naive", ["naive", str(spp), "1", "0", "cornell"]),
        ("furnace_mis", ["mis", str(spp), "1", "0", "furnace"]),
        ("furnace_naive", ["naive", str(spp), "1", "0", "furnace"]),
    ]
    for name, args in jobs:
        dump = f"/tmp/oracle_{name}.txt"
        cmd = [oracle] + args + [dump, "16"]
        print(" ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, capture_output=True)
        out[name] = read_dump(dump)
        print(f"  {name}: mean {out[name].mean():.4f}", flush=True)
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "goldens", "oracle_images.npz",
    )
    np.savez_compressed(dst, spp=np.int32(spp), **out)
    print("wrote", dst)


if __name__ == "__main__":
    main()
