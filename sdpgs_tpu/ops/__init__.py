"""Compute ops: rasterization, k-NN, SSIM, segment reductions."""
