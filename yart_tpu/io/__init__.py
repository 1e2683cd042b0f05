# Image I/O: PPM/PNG output, HDR input.
