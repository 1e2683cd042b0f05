# Wavefront rendering: camera, intersection, BSDF, integrators, estimators.
