"""Compute ops: SH evaluation, projection (EWA), binning, rasterization kernels."""
