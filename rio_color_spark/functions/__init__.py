"""NumPy kernels: color math, colorspace conversion, spatial encodings."""
