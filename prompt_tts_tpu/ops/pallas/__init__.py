"""Pallas TPU kernels for the hot ops (attention, RVQ codebook search)."""
