"""Vectorized scalar kernels (Arrow-batched; never per-row Python in hot paths)."""
