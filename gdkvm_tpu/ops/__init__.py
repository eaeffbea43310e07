"""Pallas TPU kernels (hot ops) with pure-JAX fallbacks."""
