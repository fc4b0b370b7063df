"""Pallas TPU kernels for the hot ops (ViT windowed/global attention with
decomposed relative-position bias)."""
