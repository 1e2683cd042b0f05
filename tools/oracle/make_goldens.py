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
        # Per-lobe furnaces (extra args: transmission clearcoat ccR thin
        # ior): the dielectric / thin / clearcoat / rough-metal paths the
        # reference's McLaren flagship config exercises.
        ("glass_mis", ["mis", str(spp), "0.2", "0", "furnace", "@", "16",
                       "1", "0", "0", "0", "1.5"]),
        ("glass_naive", ["naive", str(spp), "0.2", "0", "furnace", "@",
                         "16", "1", "0", "0", "0", "1.5"]),
        ("thinglass_mis", ["mis", str(spp), "0.2", "0", "furnace", "@",
                           "16", "1", "0", "0", "1", "1.5"]),
        ("clearcoat_mis", ["mis", str(spp), "0.6", "0", "furnace", "@",
                           "16", "0", "1", "0.1", "0", "1.5"]),
        ("metal_mis", ["mis", str(spp), "0.3", "1", "furnace"]),
        ("aniso_mis", ["mis", str(spp), "0.35", "1", "furnace", "@", "16",
                       "0", "0", "0", "0", "1.5", "0.8", "0.7"]),
        # Full multi-lobe MIS interplay: diffuse walls + metal tall box +
        # near-specular glass short box + area light + shadows.
        ("cornellmat_mis", ["mis", str(spp), "1", "0", "cornell-mat"]),
    ]
    # Lane-level BSDF probes: f/pdf on a deterministic direction grid
    # (identity frame), one isotropic-free config per quirk class. Columns:
    # wo(3) wi(3) f(3) pdf pad. Consumed by test_parity.py probe tests.
    probes = {
        "probe_aniso": ["0.35", "1", "0", "0", "0", "0", "1.5", "0.8", "0.7"],
        "probe_mixed": ["0.4", "0.3", "0.5", "0.6", "0.2", "0", "1.4",
                        "0.6", "1.1"],
        "probe_thin": ["0.2", "0", "1", "0", "0", "1", "1.5", "0", "0"],
    }
    # Raw sampler draw stream (bit-level: our ZSobol must reproduce the
    # reference's SobolSampler<FastOwenScrambler> EXACTLY).
    res = subprocess.run([oracle, "probedraws", "8", "512"], check=True,
                         capture_output=True)
    out["probe_draws"] = np.loadtxt(res.stdout.decode().splitlines(),
                                    dtype=np.float32)
    print(f"  probe_draws: {out['probe_draws'].shape}", flush=True)

    for name, args in probes.items():
        for mode, key in (("probe", name), ("probesample", name + "_smp")):
            res = subprocess.run([oracle, mode] + args, check=True,
                                 capture_output=True)
            out[key] = np.loadtxt(res.stdout.decode().splitlines(),
                                  dtype=np.float32)
        out[name + "_args"] = np.asarray([float(a) for a in args],
                                         np.float32)
        print(f"  {name}: {out[name].shape} smp {out[name+'_smp'].shape}",
              flush=True)

    for name, args in jobs:
        dump = f"/tmp/oracle_{name}.txt"
        if "@" in args:
            args = list(args)
            args[args.index("@")] = dump
            cmd = [oracle] + args
        else:
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
