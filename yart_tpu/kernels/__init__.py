# Pallas TPU kernels for the hot paths (with XLA fallbacks in render/).
