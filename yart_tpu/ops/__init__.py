"""Device-side compute ops: vector math, sampling warps, GGX, BSDF, QMC."""
