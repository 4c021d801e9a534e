"""DataFrame-level operators: color correction, spatial joins, kNN,
rasterization, dedup, text analysis."""
